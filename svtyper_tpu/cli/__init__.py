"""Command lines (reference L5, SURVEY.md §1).

- ``classic``: drop-in ``svtyper`` (``classic.py::main`` parity).
- ``sso``: drop-in ``svtyper-sso`` (``singlesample.py::main`` parity —
  process-pool batching is replaced by device batching; ``--core`` and
  ``--batch_size`` are accepted and mapped onto chunking).
"""
