"""Memory-bounded scale proof (VERDICT r4 item #2): run the flagship
pipeline and a distributed query sample at ~10x the driver's largest
test scale, recording peak driver RSS and object-store spill, with
CORRECTNESS-style value oracles green at that scale.

Two legs:

1. **Corpus leg** — generate (cached) the sf1.0 interleaved corpus
   (200k docs, ~900k pages — 10x the bench corpus) and run
   ``extract_documents`` end-to-end WRITING partitioned parquet to /tmp
   (the streaming fragment-write path, no driver materialization), plus
   the x_extract_corpus planted-truth spot check at sf0.01.
2. **Tables leg** — build sf1.0-scale relational tables by replicating
   the driver's sf0.1 parquet 10x with deterministic key offsets
   (one row-group per replica; join keys offset consistently so
   per-key cardinalities stay realistic instead of 10x-ing hot keys),
   then run a 10-query distributed sample (every driver-fold /
   broadcast gate zeroed — the plans that execute at 100x) and
   value-compare each against DuckDB over the SAME files.

Usage: python tools/scale_proof.py [--sf 1.0] [--skip-corpus]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10
# key offsets: far above any sf0.1 key range
KO, KC, KU, KD = 10_000_000, 1_000_000, 1_000_000, 10_000_000

SAMPLE_QUERIES = [
    # one per plan family: groupby, cogroup-attach, broadcast chain,
    # window shuffle, self-join census, hash dedup, LSH, text kernels,
    # sketch merge, keyed fold
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q_sessionization", "q_copurchase_pairs", "d_exact_dedup",
    "d_minhash_pairs", "t_token_stats", "q_hll_distinct",
    "q_top_orders_per_customer",
]


def _vm_hwm_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def _spill_mb() -> float:
    try:
        from ray._private.internal_api import memory_summary

        txt = memory_summary(stats_only=True)
        for line in txt.splitlines():
            if "Spilled" in line:
                # "Spilled 1234 MiB, ..."
                return float(line.split("Spilled", 1)[1].split("MiB")[0])
    except Exception:  # noqa: BLE001
        pass
    return 0.0


def build_tables(out_dir: str, replicas: int = REPLICAS) -> None:
    """Replicate the sf0.1 tables with per-replica key offsets, one
    row group per replica (so reads parallelize like real shards)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    offsets = {
        "lineitem": {"l_orderkey": KO},
        "orders": {"o_orderkey": KO, "o_custkey": KC},
        "customer": {"c_custkey": KC},
        "events": {"event_id": KD, "user_id": KU},
        "documents": {"doc_id": KD},
        "embeddings": {"vec_id": KD},
    }
    for t in ("region", "nation", "part", "supplier"):  # dims: copy as-is
        shutil.copy(f"{SRC_SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keycols in offsets.items():
        src = pq.read_table(f"{SRC_SF_DIR}/{t}.parquet")
        writer = pq.ParquetWriter(f"{out_dir}/{t}.parquet", src.schema)
        for k in range(replicas):
            rep = src
            for col, off in keycols.items():
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(rep.column(col), pa.scalar(k * off, pa.int64()))
                rep = rep.set_column(idx, col, shifted.cast(rep.schema.field(col).type))
            writer.write_table(rep)
        writer.close()


def run_corpus_leg(sf: float) -> dict:
    import ray

    from pdf_parse_new_ray.fixtures.corpus import corpus_dir_for
    from pdf_parse_new_ray.pipelines.extraction import extract_documents

    t0 = time.time()
    base = corpus_dir_for(sf)
    gen_s = time.time() - t0

    out = f"/tmp/scale_proof_out_sf{sf:g}"
    shutil.rmtree(out, ignore_errors=True)
    rss_before = _vm_hwm_mb()
    t0 = time.time()
    ds = extract_documents(
        f"{base}/documents_interleaved", f"{base}/media", out_dir=out)
    stats = ds.materialize() if hasattr(ds, "materialize") else ds
    extract_s = time.time() - t0
    import pyarrow.dataset as pads

    written = pads.dataset(out, format="parquet",
                           ignore_prefixes=[".", "_"]).count_rows()
    n_parts = sum(1 for _ in os.scandir(out) if _.is_dir())
    del stats
    return {
        "corpus_sf": sf,
        "corpus_gen_s": round(gen_s, 1),
        "extract_wall_s": round(extract_s, 1),
        "docs_written": written,
        "out_partitions": n_parts,
        "driver_vm_hwm_mb_before": round(rss_before, 1),
        "driver_vm_hwm_mb_after": round(_vm_hwm_mb(), 1),
        "object_store_spilled_mb": _spill_mb(),
    }


def run_tables_leg(tables_dir: str) -> dict:
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "check_queries",
        pathlib.Path(__file__).resolve().parent / "check_queries.py")
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)

    import bench

    saved = bench._force_distributed_gates()
    timings, t0 = {}, time.time()
    try:
        n_ok, n_bad, failures = cq.run_checks(
            tables_dir, only=set(SAMPLE_QUERIES), verbose=True)
    finally:
        bench._restore_gates(saved)
    return {
        "tables_dir": tables_dir,
        "sample_ok": n_ok,
        "sample_bad": n_bad,
        "failures": failures[:5],
        "sample_wall_s": round(time.time() - t0, 1),
        "driver_vm_hwm_mb_final": round(_vm_hwm_mb(), 1),
        "object_store_spilled_mb": _spill_mb(),
    }


def main() -> None:
    import ray

    sf = 1.0
    if "--sf" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--sf") + 1])
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    result = {"num_cpus": cpus}
    if "--skip-corpus" not in sys.argv:
        result["corpus"] = run_corpus_leg(sf)

    tables_dir = f"/tmp/graft_tables_sf{REPLICAS}x"
    if not os.path.exists(f"{tables_dir}/_SUCCESS"):
        t0 = time.time()
        build_tables(tables_dir)
        with open(f"{tables_dir}/_SUCCESS", "w") as f:
            f.write("ok")
        result["tables_build_s"] = round(time.time() - t0, 1)
    result["tables"] = run_tables_leg(tables_dir)
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
