"""Batched device genotyping engine (reference L4, SURVEY.md §1)."""

from svtyper_tpu.gt.engine import TpuEngine  # noqa: F401
