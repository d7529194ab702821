"""Planner-lite: pipeline configuration replacing the reference's trained
SmartPDFParser decision tree (lib/SmartPDFParser.js:195-305, rules in
lib/smart-parser-rules.json).

Ray's dynamic scheduler subsumes the reference's engine-selection rules
(J1-J3 in SURVEY §2.4): work-stealing replaces the worker pools, streaming
backpressure replaces the chunked GC machinery.  What survives is the small
set of knobs that genuinely shape the physical plan, derived from the same
inputs the reference's planner used (size, pages, CPUs):

- ``page_threshold`` / ``page_chunk``: the skew split — the Ray analogue of
  the cpuNormalizedThreshold(1000)→processes rule
  (lib/smart-parser-rules.json:102-123): docs above the threshold become
  page-range units that extract in parallel and re-join by media_ref.
- ``size_threshold``: bytes-based early split trigger for docs whose page
  count is unknown without a probe (analyzePDF complexity = bytes/page,
  lib/SmartPDFParser.js:337-349).
- ``batch_size``: work-unit rows per extract task — the adaptiveBatchSize
  analogue (lib/SmartPDFParser.js:483-502).
- ``n_partitions``: lineage/checkpoint partition count (resume granularity).
- ``broadcast_media_rows`` / ``broadcast_media_bytes``: join-strategy
  pivot — below both bounds the extracted media table ships once via
  ray.put (driver memory is bounded by ``broadcast_media_bytes``), above
  either a distributed hash join runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional


@dataclass(frozen=True)
class ExtractionConfig:
    n_partitions: int = 32
    size_threshold: int = 100 * 1024
    page_threshold: int = 200
    page_chunk: int = 100
    batch_size: int = 64
    broadcast_media_rows: int = 200_000
    # driver-memory bound of the broadcast plan: the extracted chunk table
    # is pulled to the driver for assembly + ray.put, so the gate must be
    # on BYTES of extracted text, not rows (200k rows of long documents
    # could be tens of GB).  Above either bound the hash/cogroup path runs.
    broadcast_media_bytes: int = 1 << 30
    compute: str = "tasks"  # tasks | actors
    join_strategy: str = "auto"  # auto | broadcast | hash
    concurrency: Optional[tuple] = None
    resume: bool = True
    # reference verbosityLevel (lib/pdf-parse.js:51, index.d.ts:35) mapped
    # onto the pdf.js scale: 0 errors-only (silent absorb), 1 warnings per
    # absorbed doc error, 5 infos per absorbed page — emitted through the
    # 'pdf_parse_new_ray.extract' logger on every extract worker
    verbosity: int = 0

    def for_cluster(self, cpus: int, avg_doc_bytes: int = 64 * 1024) -> "ExtractionConfig":
        """Adapt the shape knobs to a cluster size + corpus density —
        the fast-path analogue of SmartPDFParser.quickCheck/selectMethod:
        batch sizes shrink as docs grow so batch × bytes stays bounded,
        partitions track parallelism so resume granularity matches the
        cluster."""
        # keep one extract batch under ~64 MB of input bytes
        batch = max(4, min(256, (64 << 20) // max(1, avg_doc_bytes)))
        return replace(
            self,
            batch_size=batch,
            n_partitions=max(16, cpus * 2),
        )
