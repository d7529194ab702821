"""Span explode / reassemble stages (vectorized Arrow kernels).

The interleaved table stores one row per document with a
list<struct<kind,text,media_ref,offset>> column; the pipeline works on
exploded span rows and reassembles per doc_id at the end — the
"offset-keyed sort within each doc_id" reassembly from the north rule
(reference analogue: slot-indexed results array, lib/pdf-parse-workers.js:
118,179; SURVEY §2.4 'Reassembly join').
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures.corpus import SPAN_TYPE


def explode_spans(batch: pa.Table) -> pa.Table:
    """docs rows → span rows (doc_id, kind, text, media_ref, offset).
    Zero-copy where Arrow allows: list flatten + parent-index take."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    parents = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id"), parents)
    cols = {
        "doc_id": doc_ids,
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    return pa.table(cols)


def assemble_media_parts(group: pa.Table) -> pa.Table:
    """Per-media_ref group of extracted page-range chunks → one media row.
    Chunk order restored by page_start sort (reference: results[currentIndex]
    slot addressing); chunk texts carry their own leading separators, so the
    doc text is their direct concatenation."""
    order = pc.sort_indices(group, sort_keys=[("page_start", "ascending")])
    g = group.take(order)
    ref = g.column("media_ref")[0].as_py()
    texts = g.column("chunk_text").to_pylist()
    errors = [e for e in g.column("error").to_pylist() if e]
    numpages = max(g.column("numpages").to_pylist() or [0])
    return pa.table({
        "media_ref": pa.array([ref], pa.string()),
        "text": pa.array(["".join(t or "" for t in texts)], pa.string()),
        "numpages": pa.array([numpages], pa.int32()),
        "error": pa.array([errors[0] if errors else None], pa.string()),
    })
