"""Multi-host orchestration: contiguous variant sharding + ordered merge.

Design per SURVEY.md §2.1/§5: one process per host
(``jax.distributed.initialize``), host *i* genotypes the contiguous
variant slice ``shard_slices(n, n_hosts)[i]`` against its local BAM
copy, results travel as fixed-width record rows through
``multihost_utils.process_allgather`` (DCN), and host 0 writes the
single ordered VCF. Determinism: the slice map is a pure function of
(n, n_hosts), so any shard is idempotently re-runnable (SURVEY.md §5
failure-recovery plan).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def shard_slices(n: int, n_shards: int) -> List[Tuple[int, int]]:
    """Contiguous [start, end) per shard; sizes differ by at most 1."""
    base, extra = divmod(n, n_shards)
    out = []
    lo = 0
    for i in range(n_shards):
        hi = lo + base + (1 if i < extra else 0)
        out.append((lo, hi))
        lo = hi
    return out


def merge_ordered(
    rows_per_shard: Sequence[np.ndarray], slices: Sequence[Tuple[int, int]]
) -> np.ndarray:
    """Reassemble result rows into input variant order.

    Each shard's rows are already in its slice's order; slices are
    contiguous and disjoint, so a plain concatenation in shard order is
    the global order — asserted here rather than assumed.
    """
    total = slices[-1][1] if slices else 0
    lo_seen = 0
    parts = []
    for rows, (lo, hi) in zip(rows_per_shard, slices):
        assert lo == lo_seen, "non-contiguous shard slices"
        assert len(rows) == hi - lo, "shard row count mismatch"
        parts.append(rows)
        lo_seen = hi
    assert lo_seen == total
    if not parts:
        return np.zeros((0,))
    return np.concatenate(parts, axis=0)


def initialize_from_env(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """jax.distributed bootstrap; returns (process_id, num_processes).

    No-ops to (0, 1) when unconfigured so single-host runs need no flags.
    """
    import jax

    if coordinator is None and num_processes is None:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def allgather_rows(rows: np.ndarray) -> List[np.ndarray]:
    """Cross-host gather of this host's fixed-width result rows.

    Shards differ in length by up to one variant, so lengths are
    allgathered first and every shard pads to the max before the array
    gather (``multihost_utils.process_allgather`` needs equal shapes;
    the collective rides DCN). Returns one unpadded array per process,
    in process order. Single process degenerates to the identity.
    """
    import jax

    if jax.process_count() == 1:
        return [rows]
    from jax.experimental import multihost_utils

    n_mine = np.asarray(rows.shape[0], dtype=np.int64)
    ns = np.asarray(
        multihost_utils.process_allgather(n_mine, tiled=False)
    ).reshape(-1)
    m = int(ns.max()) if len(ns) else 0
    padded = np.zeros((m,) + rows.shape[1:], dtype=rows.dtype)
    padded[: rows.shape[0]] = rows
    gathered = np.asarray(
        multihost_utils.process_allgather(padded, tiled=False)
    )
    return [gathered[i, : int(ns[i])] for i in range(len(ns))]
