"""Skew handling: page-range splitting of large documents.

Reference analogue: chunked page distribution (chunkSize=500,
lib/pdf-parse-workers.js:92-99) gated by the SmartPDFParser size fast-path
(<0.5 MB → never split, lib/SmartPDFParser.js:86-115).  Ray mapping per
SURVEY §4: a flat_map producing (media_ref, page_start, page_end, n_chunks)
work units; only docs over `size_threshold` bytes pay the numpages probe,
and only docs over `page_threshold` pages split at all.
"""

from __future__ import annotations

import pyarrow as pa

from ..pdfkernel import PDFDocument


def make_split_units(size_threshold: int = 512 * 1024, page_threshold: int = 200,
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
                n_chunks = (npages + page_chunk - 1) // page_chunk
                for c in range(n_chunks):
                    o_ref.append(ref)
                    o_bytes.append(blob)
                    o_ps.append(c * page_chunk)
                    o_pe.append(min((c + 1) * page_chunk, npages))
                    o_nc.append(n_chunks)
        return pa.table({
            "media_ref": pa.array(o_ref, pa.string()),
            "bytes": pa.array(o_bytes, pa.binary()),
            "page_start": pa.array(o_ps, pa.int32()),
            "page_end": pa.array(o_pe, pa.int64()),
            "n_chunks": pa.array(o_nc, pa.int32()),
        })

    return split
