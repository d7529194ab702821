"""Skew handling: page-range splitting of large documents.

Reference analogue: chunked page distribution (chunkSize=500,
lib/pdf-parse-workers.js:92-99) gated by a size fast-path (default 100 KB ≈ page_threshold pages at a
conservative 0.5 KB/page floor, so page-heavy-but-byte-light docs still
get probed; reference analogue: SmartPDFParser quickCheck)
(<0.5 MB → never split, lib/SmartPDFParser.js:86-115).  Ray mapping per
SURVEY §4: a flat_map producing (media_ref, page_start, page_end, n_chunks)
work units; only docs over `size_threshold` bytes pay the numpages probe,
and only docs over `page_threshold` pages split at all.
"""

from __future__ import annotations

import pyarrow as pa

from ..pdfkernel import PDFDocument

# ceiling on page-range units per document (object-store byte-amplification
# bound: a split unit row duplicates the doc's bytes)
MAX_UNITS_PER_DOC = 64


def make_split_units(size_threshold: int = 100 * 1024, page_threshold: int = 200,
                     page_chunk: int = 100):
    """Returns a map_batches UDF: media batch → work-unit batch.

    Output columns: media_ref, bytes, page_start, page_end, n_chunks.
    page_end is exclusive; for unsplit docs it is a large sentinel so the
    extractor clamps to the real page count without a probe parse.
    """

    def split(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        o_ref, o_bytes, o_ps, o_pe, o_nc = [], [], [], [], []
        for ref, blob in zip(refs, blobs):
            npages = None
            if blob is not None and len(blob) >= size_threshold:
                try:
                    npages = PDFDocument(blob).num_pages
                except Exception:
                    npages = None  # let the extractor surface the error row
            if npages is None or npages <= page_threshold:
                o_ref.append(ref)
                o_bytes.append(blob)
                o_ps.append(0)
                o_pe.append(1 << 30)  # clamped to numpages by the extractor
                o_nc.append(1)
            else:
                # cap units per doc: every unit row carries the full PDF
                # bytes, so fan-out multiplies object-store traffic by
                # n_chunks × doc_bytes — 64 units bounds the amplification
                # while still giving a 10k-page doc 64-way parallelism
                chunk = max(page_chunk, -(-npages // MAX_UNITS_PER_DOC))
                n_chunks = (npages + chunk - 1) // chunk
                for c in range(n_chunks):
                    o_ref.append(ref)
                    o_bytes.append(blob)
                    o_ps.append(c * chunk)
                    o_pe.append(min((c + 1) * chunk, npages))
                    o_nc.append(n_chunks)
        return pa.table({
            "media_ref": pa.array(o_ref, pa.string()),
            "bytes": pa.array(o_bytes, pa.binary()),
            "page_start": pa.array(o_ps, pa.int32()),
            "page_end": pa.array(o_pe, pa.int64()),
            "n_chunks": pa.array(o_nc, pa.int32()),
        })

    return split
