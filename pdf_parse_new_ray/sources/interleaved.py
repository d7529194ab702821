"""Source readers for the interleaved corpus (BASELINE.json input_hint).

The production layout is a Lance table of interleaved text+media documents
(`doc_id, spans: list<struct<kind,text,media_ref,offset>>`) plus a media
table (`media_ref, bytes`).  This container has no `lance` package, so the
readers prefer `ray.data.read_lance` when importable and fall back to the
parquet twin layout the fixture generator writes — same schema, same
pipeline downstream (reference analogue: S1 file read, SURVEY §2.1).

Column pruning happens AT THE READ: pass ``columns`` so only requested
columns leave storage (at 100 TB a full-width read for a 2-column
transform is wrong).
"""

from __future__ import annotations

import os
from typing import Optional

import ray.data as rd


def _is_lance(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table(path: str, *, columns: Optional[list[str]] = None,
               override_num_blocks: Optional[int] = None) -> rd.Dataset:
    """Read a corpus table: Lance if the dataset is Lance-format and the
    reader is available, else parquet."""
    if _is_lance(path):
        try:
            return rd.read_lance(path, columns=columns)
        except (ImportError, AttributeError):
            raise ImportError(
                "lance dataset at %s but the 'lance' package is not installed" % path)
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, **kwargs)


def write_table(ds: rd.Dataset, path: str, *, format: Optional[str] = None,
                **kwargs):
    """Write-side mirror of :func:`read_table`'s dispatch (VERDICT r4
    item 8): ``format='lance'`` or a ``.lance`` path routes to
    ``Dataset.write_lance`` (streaming, fragment-per-block — the same
    resume-friendly layout as the parquet sink), anything else to
    partitioned ``write_parquet``.  This container has no `lance`
    package, so the Lance branch raises ImportError when the writer is
    missing; the stub-injection test proves path+kwargs reach
    write_lance unchanged."""
    fmt = format or ("lance" if path.endswith(".lance") else "parquet")
    if fmt == "lance":
        writer = getattr(ds, "write_lance", None)
        if writer is None:
            raise ImportError(
                "lance sink at %s but Dataset.write_lance is unavailable "
                "(the 'lance' package is not installed)" % path)
        return writer(path, **kwargs)
    return ds.write_parquet(path, **kwargs)


def read_documents(base: str, *, columns: Optional[list[str]] = None) -> rd.Dataset:
    """The interleaved documents table of a corpus directory."""
    return read_table(os.path.join(base, "documents_interleaved"), columns=columns)


def read_media(base: str, *, columns: Optional[list[str]] = None,
               override_num_blocks: Optional[int] = None) -> rd.Dataset:
    """The media side table (media_ref, bytes, ...)."""
    return read_table(os.path.join(base, "media"), columns=columns,
                      override_num_blocks=override_num_blocks)
