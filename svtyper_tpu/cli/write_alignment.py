"""``-w/--write_alignment``: dump evidence reads to a BAM
(parity of ``classic.py::write_alignment``, SURVEY.md §2.2).

Collects the raw records of every read gathered for any genotyped
variant (deduplicated), then writes them coordinate-sorted with an
index. Reference names/lengths come from the first sample's header.
"""

from __future__ import annotations

from typing import List, Set, Tuple

from svtyper_tpu.bamio.writer import BamWriter
from svtyper_tpu.breakpoints import Breakpoint
from svtyper_tpu.oracle.engine import gather_reads
from svtyper_tpu.stats.library import Sample


class EvidenceWriter:
    def __init__(self, path: str, samples: List[Sample]) -> None:
        self.path = path
        self.samples = samples
        # (sample_idx, voffset) → dedup; row = (tid, pos, ref_end, flag, si, vo)
        self._seen: Set[Tuple[int, int]] = set()
        self._rows: List[Tuple[int, int, int, int, int, int]] = []

    def add(self, bp: Breakpoint) -> None:
        for si, sample in enumerate(self.samples):
            batch, _ = gather_reads(sample, bp)
            for i in range(batch.n):
                key = (si, int(batch.voffset[i]))
                if key in self._seen:
                    continue
                self._seen.add(key)
                self._rows.append(
                    (int(batch.tid[i]), int(batch.pos[i]),
                     int(batch.ref_end[i]), int(batch.flag[i]), si,
                     int(batch.voffset[i]))
                )

    def close(self) -> None:
        header = self.samples[0].bam.header
        w = BamWriter(self.path, header.refs, header.text)
        self._rows.sort(key=lambda r: (r[0], r[1]))
        # stream row by row (bounded memory for large cohorts); the
        # coordinate sort clusters CRAM rows per container, which the
        # reader's one-container raw_records memo turns into
        # O(containers) decode work rather than O(rows)
        for tid, pos, ref_end, flag, si, vo in self._rows:
            raw = self.samples[si].bam.raw_records([vo])[0]
            w.write_record(raw, tid, pos, ref_end, flag)
        w.close()
