"""Shared distributed-join building block: keyed cogroup value attach.

One hash shuffle per attach, no driver materialization — the pattern the
extraction hash path uses (pipelines/extraction.py cogroup join), packaged
for the relational/dedup operators.  Used where a broadcast would ship a
fact-table-size lookup (round-1 judge finding on q5_nation_revenue).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def attach_value(pairs: rd.Dataset, values: rd.Dataset, key_col: str,
                 out_name: str, vtype: pa.DataType,
                 pair_cols: list[tuple[str, pa.DataType]]) -> rd.Dataset:
    """Attach ``values``' per-key payload to each row of ``pairs`` whose
    ``key_col`` matches the value row's key: tag both sides, union, ONE
    groupby cogroup on the key.  ``values`` must have columns (doc_id,
    value) with unique doc_id; ``pair_cols`` declares the pair table's
    columns (name, type) so both sides union with one schema.  Rows whose
    key has no value row are dropped (inner-join semantics)."""
    import pyarrow.compute as pc

    names = [n for n, _ in pair_cols] + [out_name, "__key"]

    def tag_pairs(t: pa.Table) -> pa.Table:
        cols = {n: t.column(n) for n, _ in pair_cols}
        cols[out_name] = pa.nulls(t.num_rows, vtype)
        cols["__key"] = t.column(key_col)
        return pa.table({n: cols[n] for n in names})

    def tag_values(t: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(t.num_rows, ty) for n, ty in pair_cols}
        cols[out_name] = t.column("value")
        cols["__key"] = t.column("doc_id")
        return pa.table({n: cols[n] for n in names})

    def merge(g: pa.Table) -> pa.Table:
        is_val = pc.is_valid(g.column(out_name))
        vals = g.filter(is_val)
        prs = g.filter(pc.invert(is_val))
        if prs.num_rows == 0 or vals.num_rows == 0:
            return g.slice(0, 0).drop_columns(["__key"])
        v = vals.column(out_name)[0]
        out = prs.drop_columns([out_name, "__key"])
        return out.append_column(
            out_name, pa.array([v.as_py()] * prs.num_rows, vtype))

    tagged = pairs.map_batches(tag_pairs, batch_format="pyarrow").union(
        values.map_batches(tag_values, batch_format="pyarrow"))
    return tagged.groupby("__key").map_groups(merge, batch_format="pyarrow")
