"""Partitioned output + per-partition lineage/metrics + resume.

North-rule requirement: "every partition records lineage + extraction
metrics to a checkpoint store so a killed job resumes without re-parsing
completed partitions."  The reference has no analogue (its closest is the
benchmark collector's incremental save, benchmark/collect-benchmarks.js:
199-202) — this is scale-path engineering the Ray build adds.

Layout:
    out_dir/part=<k>/data.parquet      one file per partition
    out_dir/_lineage/part-<k>.json     written AFTER the data file (atomic
                                       tmp+rename) → presence == completed
Partition key = blake2b(doc_id) % n_partitions — stable across runs and
processes (never Python's salted hash()).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq


def partition_of(doc_id: str, n_partitions: int) -> int:
    h = hashlib.blake2b(doc_id.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") % n_partitions


def partition_column(doc_ids: pa.Array, n_partitions: int) -> pa.Array:
    """Vectorized stable partition key (pandas siphash with its fixed
    default key — deterministic across processes and runs, unlike Python's
    salted hash()).  NOTE: a different function than ``partition_of`` —
    both are stable, but checkpoints written by one keying must be resumed
    by the same keying (the pipeline uses only this one)."""
    import numpy as np
    import pandas as pd

    vals = doc_ids.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(vals, categorize=False) % np.uint64(n_partitions)
    return pa.array(h.astype(np.int32), pa.int32())


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


# bump when the partition keying changes — a checkpoint written under one
# keying must never be resumed under another
KEYING_VERSION = "siphash-v1"


def manifest_path(out_dir: str) -> str:
    return os.path.join(lineage_dir(out_dir), "manifest.json")


def ensure_manifest(out_dir: str, meta: dict) -> dict:
    """First-writer-wins run manifest: records the inputs + partitioning
    config of the run that owns this checkpoint directory.  A resume whose
    config disagrees would silently skip the wrong documents, so a mismatch
    raises instead."""
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir)
    meta = {**meta, "keying": KEYING_VERSION}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        for k in ("docs_path", "media_path", "n_partitions", "keying"):
            if existing.get(k) != meta.get(k):
                raise ValueError(
                    f"checkpoint manifest mismatch for {k!r}: "
                    f"existing={existing.get(k)!r} requested={meta.get(k)!r} — "
                    f"resume must use the original run's inputs and partitioning "
                    f"(or point out_dir at a fresh directory)")
        return existing
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)
    return meta


def update_manifest(out_dir: str, **extra) -> dict:
    """Merge extra keys into the run manifest (atomic rewrite).  Used to
    record measured gate stats (extracted rows/bytes) so a RE-RUN can
    pre-size its physical plan without re-materializing the chunk
    dataset."""
    path = manifest_path(out_dir)
    with open(path) as f:
        meta = json.load(f)
    meta.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)
    return meta


def manifest(out_dir: str) -> dict:
    try:
        with open(manifest_path(out_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def completed_partitions(out_dir: str) -> set[int]:
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
                if rec.get("status") == "complete":
                    done.add(int(rec["partition"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return done


def write_partition(out_dir: str, k: int, table: pa.Table, metrics: dict) -> dict:
    """Write part=<k>/data.parquet then its lineage record (atomic rename).
    Returns the lineage record."""
    part_dir = os.path.join(out_dir, f"part={k}")
    os.makedirs(part_dir, exist_ok=True)
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    data_path = os.path.join(part_dir, "data.parquet")
    tmp_path = data_path + ".tmp"
    pq.write_table(table, tmp_path)
    os.replace(tmp_path, data_path)
    content_hash = hashlib.blake2b(digest_size=16)
    for col in ("doc_id",):
        if col in table.column_names:
            for v in table.column(col).to_pylist():
                content_hash.update(str(v).encode())
    rec = {
        "partition": k,
        "status": "complete",
        "rows": table.num_rows,
        "bytes": os.path.getsize(data_path),
        "content_hash": content_hash.hexdigest(),
        "completed_at": time.time(),
        **metrics,
    }
    lpath = os.path.join(lineage_dir(out_dir), f"part-{k}.json")
    with open(lpath + ".tmp", "w") as f:
        json.dump(rec, f)
    os.replace(lpath + ".tmp", lpath)
    return rec


def write_fragment(out_dir: str, k: int, run_id: str, table: pa.Table) -> str:
    """Streaming-write mode: append one fragment file to part=<k> under a
    run-unique name.  Fragments become part of the committed output ONLY
    when commit_partitions() later writes a lineage record listing them —
    a crashed run leaves orphan fragments that every reader ignores (the
    classic write-fragments/commit-at-end layout).  Returns the fragment
    file name."""
    part_dir = os.path.join(out_dir, f"part={k}")
    os.makedirs(part_dir, exist_ok=True)
    name = f"frag-{run_id}-{uuid.uuid4().hex[:12]}.parquet"
    path = os.path.join(part_dir, name)
    pq.write_table(table, path + ".tmp")
    os.replace(path + ".tmp", path)
    return name


def commit_partitions(out_dir: str, run_id: str,
                      metrics_by_part: dict[int, dict]) -> list[dict]:
    """Commit a streaming-write run: for each partition, list THIS run's
    fragments and write the lineage record (atomic rename) marking it
    complete.  The driver-side tail of the fragment layout — O(partitions)
    work, independent of data volume."""
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    recs = []
    for k in sorted(metrics_by_part):
        m = dict(metrics_by_part[k])
        part_dir = os.path.join(out_dir, f"part={k}")
        files = sorted(
            f for f in (os.listdir(part_dir) if os.path.isdir(part_dir) else [])
            if f.startswith(f"frag-{run_id}-") and f.endswith(".parquet"))
        rec = {
            "partition": k,
            "status": "complete",
            "rows": int(m.pop("rows", m.get("n_docs", 0))),
            "bytes": sum(os.path.getsize(os.path.join(part_dir, f))
                         for f in files),
            "files": files,
            "content_hash": m.pop("content_hash", ""),
            "completed_at": time.time(),
            **m,
        }
        lpath = os.path.join(lineage_dir(out_dir), f"part-{k}.json")
        with open(lpath + ".tmp", "w") as f:
            json.dump(rec, f)
        os.replace(lpath + ".tmp", lpath)
        recs.append(rec)
    return recs


def partition_files(out_dir: str, k: int) -> list[str]:
    """Data files of a COMPLETED partition: the lineage 'files' list for
    fragment-layout partitions, else the classic single data.parquet."""
    lpath = os.path.join(lineage_dir(out_dir), f"part-{k}.json")
    try:
        with open(lpath) as f:
            rec = json.load(f)
        files = rec.get("files")
    except (OSError, ValueError):
        files = None
    part_dir = os.path.join(out_dir, f"part={k}")
    if files:
        return [os.path.join(part_dir, f) for f in files]
    p = os.path.join(part_dir, "data.parquet")
    return [p] if os.path.exists(p) else []


def read_output(out_dir: str) -> pa.Table:
    """Read back all completed partitions (driver-side convenience for
    tests/small results)."""
    parts = []
    for k in sorted(completed_partitions(out_dir)):
        for p in partition_files(out_dir, k):
            parts.append(pq.read_table(p))
    if not parts:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    return pa.concat_tables(parts)


def compact_partitions_inplace(out_dir: str, min_files: int = 2) -> dict:
    """Opt-in post-job hygiene (VERDICT r4 item 6): rewrite each completed
    partition's fragment files as ONE file, atomically repointing the
    partition's LINEAGE record at it — completion status, metrics and
    content_hash survive, so a resume still skips the partition and
    readers see identical rows.  Crash-safe ordering: new file first,
    atomic lineage rename second (readers switch here), fragment deletes
    last — a crash at any point leaves only orphan files that every
    reader already ignores.  Driver-side, one partition in memory at a
    time; O(completed partitions) work."""
    done = sorted(completed_partitions(out_dir))
    n_compacted = files_removed = 0
    rows = 0
    for k in done:
        files = partition_files(out_dir, k)
        if len(files) < min_files:
            continue
        t = pa.concat_tables([pq.read_table(p) for p in files])
        part_dir = os.path.join(out_dir, f"part={k}")
        name = f"compact-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(part_dir, name)
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)
        lpath = os.path.join(lineage_dir(out_dir), f"part-{k}.json")
        with open(lpath) as f:
            rec = json.load(f)
        rec["files"] = [name]
        rec["bytes"] = os.path.getsize(path)
        rec["compacted_from"] = rec.get("compacted_from", 0) + len(files)
        with open(lpath + ".tmp", "w") as f:
            json.dump(rec, f)
        os.replace(lpath + ".tmp", lpath)
        for p in files:
            try:
                os.remove(p)
                files_removed += 1
            except OSError:
                pass  # orphan — ignored by readers
        rows += t.num_rows
        n_compacted += 1
    return {"n_partitions_compacted": n_compacted,
            "n_files_removed": files_removed, "rows": rows}


def compact_partitions(out_dir: str, target_bytes: int = 64 * 1024 * 1024,
                       compacted_dir: str | None = None) -> dict:
    """Small-file compaction for a completed partitioned output: greedily
    bin-packs adjacent completed partitions (ascending partition id, so
    any partition-order guarantee survives) into files of ~target_bytes,
    written to ``compacted_dir`` (default: <out_dir>_compacted) with a
    fresh manifest + lineage so the compacted store is itself resumable.
    The classic post-job hygiene step: a 10^12-doc run at fine partition
    granularity (needed for resume) leaves far more files than any
    reader wants; compaction trades the completed run's granularity for
    read efficiency WITHOUT a Ray job (pure driver-side streaming merge,
    one input partition in memory at a time).  Returns
    {n_input_partitions, n_output_files, rows_in, rows_out} and asserts
    nothing is lost (rows_in == rows_out)."""
    import glob as _glob

    dst = compacted_dir or out_dir.rstrip("/") + "_compacted"
    os.makedirs(dst, exist_ok=True)
    done = sorted(completed_partitions(out_dir))
    rows_in = 0
    rows_out = 0
    group: list[pa.Table] = []
    group_bytes = 0
    out_k = 0

    def flush():
        nonlocal group, group_bytes, out_k, rows_out
        if not group:
            return
        merged = pa.concat_tables(group)
        rec = write_partition(dst, out_k, merged,
                              {"compacted_from": len(group)})
        rows_out += rec["rows"]
        out_k += 1
        group, group_bytes = [], 0

    for k in done:
        files = partition_files(out_dir, k)
        if not files:
            continue
        t = pa.concat_tables([pq.read_table(p) for p in files])
        rows_in += t.num_rows
        sz = sum(os.path.getsize(p) for p in files)
        if group and group_bytes + sz > target_bytes:
            flush()
        group.append(t)
        group_bytes += sz
    flush()
    ensure_manifest(dst, {"compacted_from": out_dir,
                          "n_inputs": len(done)})
    assert rows_in == rows_out, (rows_in, rows_out)
    n_files = len(_glob.glob(os.path.join(dst, "part=*", "data.parquet")))
    return {"n_input_partitions": len(done), "n_output_files": n_files,
            "rows_in": rows_in, "rows_out": rows_out}
