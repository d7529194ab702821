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


# ---------------------------------------------------------------------------
# exact triangle counting (degree-oriented wedge join, MR-classic)
# ---------------------------------------------------------------------------

TRIANGLE_BROADCAST_NODES = 5_000_000

# below this many distinct oriented edges the sorted edge-key array
# (8 B/edge — 20M edges = 160 MB) broadcasts via ray.put and wedge
# closure is counted INSIDE the per-source-bucket group function
# (searchsorted membership, one int64 partial per bucket), eliminating
# the wedge-table materialization + wkey cogroup entirely; above it the
# classic MR wedge-join (emit wedges, cogroup with edges) is the scale
# path — the same broadcast-vs-cogroup duality as functions/joins.py
TRIANGLE_BROADCAST_EDGES = 20_000_000


def g_triangle_count(sf_dir: str, n_buckets: int = 256) -> pd.DataFrame:
    """Exact triangle count of the co-purchase graph (distinct part
    pairs sharing an order) — the Suri–Vassilvitskii MR shape with
    degree orientation, so every triangle is counted at exactly ONE
    node and wedge fan-out is O(m^1.5) instead of sum(deg^2):

      1. distinct edges: orderkey-bucketed shift-k pair generation
         (q_copurchase_pairs stage 1) + a pair-bucketed global dedupe
      2. degrees: per-batch endpoint partials -> node-bounded groupby;
         the (node -> degree) map broadcasts under
         TRIANGLE_BROADCAST_NODES, else it attaches by TWO bucketed
         cogroups (forced in pytest)
      3. wedges: edges oriented low->high (degree, id) rank, bucketed
         by source, per-bucket sorted shift-k emits each wedge (v, w)
         with rank(v) < rank(w), pre-aggregated per bucket
      4. close: wedge multiplicities attach to the oriented-edge set by
         ONE cogroup on the encoded pair key (v*2^32+w — partkeys are
         assumed < 2^31, the repo-wide pair-encode convention); matched
         multiplicities sum to the triangle count

    Returns (n_nodes, n_edges, n_triangles) — all exact int64, oracled
    against DuckDB's three-way self-join."""
    from .joins import _bucket_of, attach_value, rename_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    li = li.map_batches(
        lambda t: t.append_column(
            "__bk", _bucket_of(t.column("l_orderkey"), n_buckets)),
        batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("l_orderkey", "ascending"),
                                              ("l_partkey", "ascending")])
        g = g.take(order)
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        n = len(ok)
        pa_l, pb_l = [], []
        k = 1
        while True:
            same = ok[:-k] == ok[k:] if k < n else np.zeros(0, bool)
            if not same.any():
                break
            a, b = pk[:-k][same], pk[k:][same]
            neq = a != b
            pa_l.append(a[neq])
            pb_l.append(b[neq])
            k += 1
        if not pa_l:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "__pk": pa.array([], pa.int32())})
        t2 = pa.table({"a": pa.array(np.concatenate(pa_l), pa.int64()),
                       "b": pa.array(np.concatenate(pb_l), pa.int64())})
        t2 = t2.group_by(["a", "b"]).aggregate([])  # local distinct
        key = pc.add(pc.multiply(t2["a"], pa.scalar(1 << 32, pa.int64())),
                     t2["b"])
        return t2.append_column("__pk", _bucket_of(key, n_buckets))

    def dedupe(g: pa.Table) -> pa.Table:
        return g.drop_columns(["__pk"]).group_by(["a", "b"]).aggregate([])

    edges = li.groupby("__bk").map_groups(pairs, batch_format="pyarrow") \
        .materialize() \
        .groupby("__pk").map_groups(dedupe, batch_format="pyarrow") \
        .materialize()
    n_edges = edges.count()

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t["a"].combine_chunks(),
                                  t["b"].combine_chunks()])
        g = pa.table({"node": nodes}).group_by("node") \
            .aggregate([("node", "count")])
        return rename_agg(g, {"node_count": "deg"}, ["node", "deg"])

    from ray.data.aggregate import Sum as _Sum

    deg_ds = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(_Sum("deg", alias_name="deg")) \
        .materialize()
    n_nodes = deg_ds.count()

    # rank key for orientation: degree-major, id-minor (ids < 2^31)
    def rank_key(dd: np.ndarray, ii: np.ndarray) -> np.ndarray:
        return dd.astype(np.int64) * (1 << 32) + ii.astype(np.int64)

    if n_nodes <= TRIANGLE_BROADCAST_NODES:
        deg = deg_ds.to_pandas()
        nid = deg["node"].to_numpy().astype(np.int64)
        o = np.argsort(nid)
        nid = nid[o]
        rk = rank_key(deg["deg"].to_numpy()[o], nid)
        ref = ray.put((nid, rk))

        class Orient:
            def __init__(self, ref):
                self.nid, self.rk = (ray.get(ref)
                                     if isinstance(ref, ray.ObjectRef)
                                     else ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                a = t.column("a").to_numpy(zero_copy_only=False)
                b = t.column("b").to_numpy(zero_copy_only=False)
                ra = self.rk[np.searchsorted(self.nid, a)]
                rb = self.rk[np.searchsorted(self.nid, b)]
                src = np.where(ra < rb, a, b)
                dst = np.where(ra < rb, b, a)
                dstr = np.where(ra < rb, rb, ra)
                out = pa.table({
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                    "dst_rank": pa.array(dstr, pa.int64())})
                return out.append_column(
                    "__sb", _bucket_of(out["src"], n_buckets))

        oriented = edges.map_batches(
            Orient, fn_constructor_kwargs={"ref": ref},
            batch_format="pyarrow", concurrency=(1, 8))
    else:
        # scale path: degree attaches by two cogroups (deg_a then deg_b);
        # the degree table never lands on the driver
        deg_vals = deg_ds.map_batches(
            lambda t: pa.table({"doc_id": t["node"],
                                "value": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow")
        withda = attach_value(
            edges, deg_vals, "a", "deg_a", pa.int64(),
            [("a", pa.int64()), ("b", pa.int64())]).materialize()
        withdb = attach_value(
            withda, deg_vals, "b", "deg_b", pa.int64(),
            [("a", pa.int64()), ("b", pa.int64()),
             ("deg_a", pa.int64())]).materialize()

        def orient(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            ra = rank_key(t.column("deg_a").to_numpy(zero_copy_only=False), a)
            rb = rank_key(t.column("deg_b").to_numpy(zero_copy_only=False), b)
            src = np.where(ra < rb, a, b)
            dst = np.where(ra < rb, b, a)
            dstr = np.where(ra < rb, rb, ra)
            out = pa.table({"src": pa.array(src, pa.int64()),
                            "dst": pa.array(dst, pa.int64()),
                            "dst_rank": pa.array(dstr, pa.int64())})
            return out.append_column(
                "__sb", _bucket_of(out["src"], n_buckets))

        oriented = withdb.map_batches(orient, batch_format="pyarrow")

    oriented = oriented.materialize()

    if n_edges <= TRIANGLE_BROADCAST_EDGES:
        # broadcast closure path: one sorted int64 key per oriented edge
        # (src*2^32+dst); each __sb group emits wedges per shift-k and
        # counts membership hits immediately — constant memory per k,
        # no wedge row ever leaves the worker
        ek_parts = oriented.map_batches(
            lambda t: pa.table({"k": pc.add(
                pc.multiply(t["src"], pa.scalar(1 << 32, pa.int64())),
                t["dst"])}),
            batch_format="pyarrow").to_pandas()
        ekeys = np.sort(ek_parts["k"].to_numpy().astype(np.int64))
        ek_ref = ray.put(ekeys)

        def wedge_close(g: pa.Table) -> pa.Table:
            ek = ray.get(ek_ref)
            if len(ek) == 0:
                return pa.table({"tri": pa.array([0], pa.int64())})
            order = pc.sort_indices(g, sort_keys=[("src", "ascending"),
                                                  ("dst_rank", "ascending")])
            g = g.take(order)
            s = g.column("src").to_numpy(zero_copy_only=False)
            d = g.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(s)
            total = 0
            k = 1
            while True:
                same = s[:-k] == s[k:] if k < n else np.zeros(0, bool)
                if not same.any():
                    break
                wk = d[:-k][same] * (1 << 32) + d[k:][same]
                idx = np.searchsorted(ek, wk)
                idx[idx == len(ek)] = 0
                total += int((ek[idx] == wk).sum())
                k += 1
            return pa.table({"tri": pa.array([total], pa.int64())})

        tri = oriented.groupby("__sb").map_groups(
            wedge_close, batch_format="pyarrow").sum("tri")
        return pd.DataFrame({"n_nodes": [int(n_nodes)],
                             "n_edges": [int(n_edges)],
                             "n_triangles": [int(tri or 0)]})

    def wedges(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("src", "ascending"),
                                              ("dst_rank", "ascending")])
        g = g.take(order)
        s = g.column("src").to_numpy(zero_copy_only=False)
        d = g.column("dst").to_numpy(zero_copy_only=False)
        n = len(s)
        va, vb = [], []
        k = 1
        while True:
            same = s[:-k] == s[k:] if k < n else np.zeros(0, bool)
            if not same.any():
                break
            va.append(d[:-k][same])   # rank(v) < rank(w) by dst_rank sort
            vb.append(d[k:][same])
            k += 1
        if not va:
            return pa.table({"wkey": pa.array([], pa.int64()),
                             "mult": pa.array([], pa.int64())})
        v = np.concatenate(va).astype(np.int64)
        w = np.concatenate(vb).astype(np.int64)
        t2 = pa.table({"wkey": pa.array(v * (1 << 32) + w, pa.int64()),
                       "mult": pa.array(np.ones(len(v), np.int64))})
        g2 = t2.group_by("wkey").aggregate([("mult", "sum")])
        return rename_agg(g2, {"mult_sum": "mult"}, ["wkey", "mult"])

    wedge_ds = oriented.groupby("__sb").map_groups(
        wedges, batch_format="pyarrow").materialize()

    edge_keys = oriented.map_batches(
        lambda t: pa.table({
            "doc_id": pc.add(pc.multiply(t["src"],
                                         pa.scalar(1 << 32, pa.int64())),
                             t["dst"]),
            "value": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")

    def count_hits(t: pa.Table) -> pa.Table:
        s = pc.sum(t["mult"])
        return pa.table({"tri": pa.array([int(s.as_py() or 0)],
                                         pa.int64())})

    tri = attach_value(
        wedge_ds, edge_keys, "wkey", "present", pa.int64(),
        [("wkey", pa.int64()), ("mult", pa.int64())],
        post=count_hits).sum("tri")

    return pd.DataFrame({"n_nodes": [int(n_nodes)],
                         "n_edges": [int(n_edges)],
                         "n_triangles": [int(tri or 0)]})
