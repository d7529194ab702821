"""Iterative graph algorithms over edge Datasets — the compute class
(repeated shuffles over a fixed edge relation with an evolving vertex
state) that one-pass relational operators don't cover.

Scale plan shared by the operators here: the EDGE relation is the big
side and never moves after its one materialization; per iteration the
vertex state attaches to edge sources (broadcast when it fits the
byte gate, bucketed cogroup otherwise — the same duality as every
lookup in functions/joins.py) and new vertex state comes back as
per-batch PARTIAL sums merged by a small groupby.  Float iteration
order varies with partitioning, so these are rows-only driver checks;
pytest locks them against a naive single-process reference on the
same edges (np.allclose) plus exact invariants (rank mass = 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 10

# above this many vertices the per-iteration rank attach must cogroup
# instead of broadcast (same role as relational.BROADCAST_DIM_ROWS)
PAGERANK_BROADCAST_VERTICES = 5_000_000


def pagerank_edges(edges: rd.Dataset, damping: float = PAGERANK_DAMPING,
                   n_iters: int = PAGERANK_ITERS) -> pd.DataFrame:
    """PageRank over a directed edge Dataset with int64 columns
    (src, dst) — duplicate edges count as parallel edges.  Returns
    (node, rank), rank mass summing to 1 over all nodes.

    Per iteration: ONE pass over the (never re-shuffled) edge blocks —
    each batch looks up src ranks from the broadcast rank map and emits
    per-batch PARTIAL dst sums via an Arrow group_by; the partials merge
    into the next rank vector with a driver-side sum bounded by the
    vertex count.  Dangling-node mass (nodes with no out-edges)
    redistributes uniformly, keeping total mass exactly 1 like the
    textbook formulation."""
    edges = edges.materialize()

    def degrees(t: pa.Table) -> pa.Table:
        g = t.group_by("src").aggregate([("src", "count")])
        return g.rename_columns(
            ["deg" if c == "src_count" else "node" for c in g.column_names])

    deg = edges.map_batches(degrees, batch_format="pyarrow").to_pandas() \
        .groupby("node", as_index=False)["deg"].sum()

    def dsts(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("dst").combine_chunks())
        return pa.table({"node": u})

    dst_nodes = edges.map_batches(dsts, batch_format="pyarrow") \
        .to_pandas()["node"].unique()
    nodes = np.union1d(deg["node"].to_numpy(), dst_nodes).astype(np.int64)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="float64")})
    if n > PAGERANK_BROADCAST_VERTICES:  # pragma: no cover — corpus scale
        raise NotImplementedError(
            "vertex state exceeds the broadcast gate; the cogroup-attach "
            "iteration (joins.attach_value per round) is the scale path")
    out_deg = np.zeros(n, np.float64)
    idx = np.searchsorted(nodes, deg["node"].to_numpy())
    out_deg[idx] = deg["deg"].to_numpy().astype(np.float64)
    rank = np.full(n, 1.0 / n)

    def contribs_for(rank_ref):
        def contribs(t: pa.Table) -> pa.Table:
            node_arr, share_arr = ray.get(rank_ref)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            w = share_arr[np.searchsorted(node_arr, src)]
            g = pa.table({"dst": pa.array(dst, pa.int64()),
                          "w": pa.array(w, pa.float64())}) \
                .group_by("dst").aggregate([("w", "sum")])
            return g.rename_columns(
                ["w" if c == "w_sum" else c for c in g.column_names])

        return contribs

    for _ in range(n_iters):
        share = np.divide(rank, out_deg, out=np.zeros_like(rank),
                          where=out_deg > 0)
        rank_ref = ray.put((nodes, share))
        part = edges.map_batches(contribs_for(rank_ref),
                                 batch_format="pyarrow").to_pandas()
        agg = part.groupby("dst", as_index=False)["w"].sum()
        incoming = np.zeros(n, np.float64)
        incoming[np.searchsorted(nodes, agg["dst"].to_numpy())] = \
            agg["w"].to_numpy()
        dangling = float(rank[out_deg == 0].sum())
        rank = ((1.0 - damping) / n
                + damping * (incoming + dangling / n))
    return pd.DataFrame({"node": nodes, "rank": rank})


def g_pagerank_copurchase(sf_dir: str) -> pd.DataFrame:
    """PageRank over the co-purchase graph (parts as nodes, one directed
    edge each way per same-order part pair — the q_copurchase_pairs
    relation made symmetric).  Top-20 parts by rank; rows-only checked
    (iterative float), locked against the naive reference in pytest."""
    from .joins import _bucket_of  # noqa: F401  (documented pairing)
    from .relational import _rp

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n_buckets = 256

    def tag(t: pa.Table) -> pa.Table:
        from .joins import _bucket_of as bk

        return t.append_column("__bk", bk(t.column("l_orderkey"), n_buckets))

    def pairs_sym(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("l_orderkey", "ascending"),
                                              ("l_partkey", "ascending")])
        g = g.take(order)
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        n = len(ok)
        a_l, b_l = [], []
        k = 1
        while True:
            same = ok[:-k] == ok[k:] if k < n else np.zeros(0, bool)
            if not same.any():
                break
            a, b = pk[:-k][same], pk[k:][same]
            neq = a != b
            a_l.append(a[neq])
            b_l.append(b[neq])
            k += 1
        if not a_l:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        a = np.concatenate(a_l)
        b = np.concatenate(b_l)
        return pa.table({
            "src": pa.array(np.concatenate((a, b)), pa.int64()),
            "dst": pa.array(np.concatenate((b, a)), pa.int64()),
        })

    edges = li.map_batches(tag, batch_format="pyarrow") \
        .groupby("__bk").map_groups(pairs_sym, batch_format="pyarrow")
    pr = pagerank_edges(edges)
    pr = pr.sort_values(["rank", "node"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)
    pr["rank"] = pr["rank"].round(8)
    return pr
