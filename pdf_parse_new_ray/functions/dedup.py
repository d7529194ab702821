"""Deduplication operators: exact (hash-partition + per-group first),
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification.

Scale design: exact dedup is ONE shuffle on the content hash (never on the
text itself); MinHash banding turns the quadratic pair problem into a
groupby on band buckets where only same-bucket docs ever meet; candidate
verification is per-bucket local work.  Signatures are computed in a
stateful actor stage with the permutation table built once per actor.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

_WORD = re.compile(r"[A-Za-z0-9]+")

# MinHash parameters (fixed, seeded — results are deterministic)
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _content_hash(text: str) -> str:
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# exact dedup: hash → groupby(hash) → keep min(doc_id)
# ---------------------------------------------------------------------------

def d_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """One surviving doc_id per distinct content hash (keep smallest id)."""

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({
            "fingerprint": pa.array([_content_hash(x) for x in t.column("text").to_pylist()], pa.string()),
            "doc_id": t.column("doc_id"),
        })

    from ray.data.aggregate import Min

    out = _docs(sf_dir).map_batches(fp, batch_format="pyarrow") \
        .groupby("fingerprint").aggregate(Min("doc_id", alias_name="keep_doc_id"),
                                          Count(alias_name="group_size")).to_pandas()
    return out.sort_values("fingerprint").reset_index(drop=True)


def d_dup_groups(sf_dir: str) -> pd.DataFrame:
    """Only the duplicate groups (size > 1)."""
    out = d_exact_dedup(sf_dir)
    out = out[out["group_size"] > 1].reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Shingle → minhash signature; permutation table built once per actor."""

    def __init__(self, n_perm: int = N_PERM, shingle_k: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.k = shingle_k
        self.n_perm = n_perm

    def shingles(self, text: str) -> set[int]:
        words = _WORD.findall((text or "").lower())
        if len(words) < self.k:
            grams = {" ".join(words)} if words else set()
        else:
            grams = {" ".join(words[i:i + self.k]) for i in range(len(words) - self.k + 1)}
        return {struct.unpack("<Q", hashlib.blake2b(g.encode(), digest_size=8).digest())[0]
                for g in grams}

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if not sh:
            return np.full(self.n_perm, _MERSENNE, dtype=np.uint64)
        h = np.fromiter(sh, dtype=np.uint64)[:, None]        # (S, 1)
        vals = (h * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, t: pa.Table) -> pa.Table:
        """Emit one row per (doc, band): bucket key = hash of the band slice.
        This is the LSH fan-out that feeds the bucket groupby."""
        doc_ids, buckets, sigs = [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            sig = self.signature(text)
            sig_bytes = sig.tobytes()
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND]
                key = hashlib.blake2b(chunk.tobytes() + bytes([band]), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                buckets.append(key)
                sigs.append(sig_bytes)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "bucket": pa.array(buckets, pa.string()),
            "sig": pa.array(sigs, pa.binary()),
        })


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Within one LSH bucket: emit candidate pairs with signature-estimated
    jaccard (pairs only ever meet inside a bucket — no global quadratic)."""
    ids = group.column("doc_id").to_pylist()
    sigs = group.column("sig").to_pylist()
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64())})
    seen = {}
    for i, s in zip(ids, sigs):
        seen[i] = np.frombuffer(s, dtype=np.uint64)
    uniq = sorted(seen)
    a_out, b_out, j_out = [], [], []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            est = float((seen[uniq[i]] == seen[uniq[j]]).mean())
            a_out.append(uniq[i])
            b_out.append(uniq[j])
            j_out.append(est)
    return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
                     "est_jaccard": pa.array(j_out, pa.float64())})


def d_minhash_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Near-duplicate candidate pairs above an estimated-jaccard threshold."""
    sigs = _docs(sf_dir).map_batches(MinHasher, batch_format="pyarrow",
                                     concurrency=(1, 4), batch_size=256)
    pairs = sigs.groupby("bucket").map_groups(_bucket_pairs, batch_format="pyarrow")
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})
    df = df.drop_duplicates(["a", "b"])
    df = df[df["est_jaccard"] >= threshold]
    df["est_jaccard"] = df["est_jaccard"].round(6)
    return df.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        acc = np.zeros(self.bits, dtype=np.int64)
        for w in _WORD.findall((text or "").lower()):
            h = struct.unpack("<Q", hashlib.blake2b(w.encode(), digest_size=8).digest())[0]
            bits = np.unpackbits(np.frombuffer(struct.pack("<Q", h), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        out = np.packbits((acc > 0).astype(np.uint8))
        return struct.unpack("<Q", out.tobytes())[0]

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = [self.simhash(x) for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "simhash": pa.array([f"{h:016x}" for h in hs], pa.string()),
        })


def d_simhash(sf_dir: str) -> pd.DataFrame:
    out = _docs(sf_dir).map_batches(SimHasher, batch_format="pyarrow",
                                    concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs)
# ---------------------------------------------------------------------------

def d_ngram_jaccard(sf_dir: str, threshold: float = 0.3, k: int = 3) -> pd.DataFrame:
    """Exact word-k-gram Jaccard over MinHash candidates — the verify step
    of the near-dup pipeline (broadcast of candidate texts is bounded by
    the candidate count, not the corpus)."""
    cands = d_minhash_pairs(sf_dir, threshold=0.2)
    if cands.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    need = sorted(set(cands["a"]) | set(cands["b"]))
    docs = _docs(sf_dir).filter(
        lambda row: row["doc_id"] in set(need)
    ).take_all()
    texts = {r["doc_id"]: r["text"] for r in docs}

    def grams(text):
        ws = _WORD.findall((text or "").lower())
        return {" ".join(ws[i:i + k]) for i in range(max(0, len(ws) - k + 1))} or {" ".join(ws)}

    rows = []
    for a, b in zip(cands["a"], cands["b"]):
        ga, gb = grams(texts.get(a, "")), grams(texts.get(b, ""))
        j = len(ga & gb) / max(1, len(ga | gb))
        if j >= threshold:
            rows.append((a, b, round(j, 6)))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup: exact blocked matmul baseline
# ---------------------------------------------------------------------------

class _CosinePairFinder:
    """Per-batch exact cosine vs the broadcast normalized matrix; emits
    (id_a < id_b) pairs above the threshold.  Blocked all-pairs: each task
    does one B×N float64 matmul — the brute-force baseline the LSH-bucketed
    path (`ann.e_knn_lsh` machinery) replaces at 10^12 rows."""

    def __init__(self, all_ref, threshold: float):
        import ray as _ray

        ids, m = _ray.get(all_ref) if isinstance(all_ref, _ray.ObjectRef) else all_ref
        self.all_ids = ids
        self.mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        b_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        b = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        scores = b @ self.mn.T                                  # (B, N)
        keep = (scores >= self.threshold) & (b_ids[:, None] < self.all_ids[None, :])
        bi, ni = np.nonzero(keep)
        return pa.table({
            "id_a": pa.array(b_ids[bi], pa.int64()),
            "id_b": pa.array(self.all_ids[ni], pa.int64()),
            "cosine": pa.array(np.round(scores[bi, ni], 6), pa.float64()),
        })


def d_embedding_neardup(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """All embedding pairs with cosine >= threshold (id_a < id_b) — the
    embedding-space near-duplicate detector."""
    import pyarrow.parquet as pq

    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    ref = ray.put((ids, m))
    pairs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]).map_batches(
        _CosinePairFinder, fn_constructor_kwargs={"all_ref": ref, "threshold": threshold},
        batch_size=256, batch_format="pyarrow", concurrency=(1, 4),
    ).take_all()
    df = pd.DataFrame(pairs, columns=["id_a", "id_b", "cosine"])
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
