"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the flagship image+caption near-dup pipeline (MinHash bands ∪
SimHash bands ∪ exact ∪ substring → pairs → components) over the
deterministic synthetic F1 corpus (BASELINE.json input_hint schema),
cached as parquet under /tmp. Also reports signatures/sec (north-rule
throughput metric) and per-query wall times over $GRAFT_SF_DIR.

    python bench.py              # single run at $RAY_GRAFT_CPUS (def. 32)
    python bench.py --scaling    # fresh 8-CPU and 32-CPU processes on the
                                 # same input → throughputs + efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_N = int(os.environ.get("RAYDEDUP_BENCH_N", "30000"))

BENCH_QUERIES = [
    "exact_dedup_docs",
    "minhash_dedup_docs",
    "substring_pairs_docs",
    "ngram_jaccard_docs",
    "embedding_near_dup",
    "ann_topk",
    "token_counts",
    "doc_quality",
    "lineitem_agg",
    "window_counts",
    "hll_users_per_type",
    "top_terms",
]


def ensure_bench_table(n_base: int) -> str:
    """Generate-and-cache the synthetic image corpus (deterministic)."""
    path = f"/tmp/raydedup_bench/images_{n_base}.parquet"
    if not os.path.exists(path):
        os.makedirs("/tmp/raydedup_bench", exist_ok=True)
        import pyarrow.parquet as pq

        from raydedup.synth import make_images_table

        table, _ = make_images_table(n_base=n_base)
        pq.write_table(table, path + ".tmp")
        os.rename(path + ".tmp", path)
    return path


def consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += len(b)
    return n


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from raydedup.pipeline import DedupConfig, dedup_pipeline
    from raydedup.stages.signatures import SignatureStage

    img_path = ensure_bench_table(BENCH_N)
    # warm page cache (untimed) so we measure compute+shuffle, not first IO
    consume(rd.read_parquet(img_path, columns=["image_id"]))

    sig_cols = ["image_id", "caption", "phash"]
    pool = max(2, NUM_CPUS - 2)

    # signatures/sec (north-rule throughput metric): signature stage alone
    t0 = time.perf_counter()
    sig_ds = rd.read_parquet(img_path, columns=sig_cols).map_batches(
        SignatureStage,
        fn_constructor_kwargs=dict(num_perm=128, seed=1, shingle="word3"),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, pool),
        num_cpus=1,
    )
    n_rows = consume(sig_ds)
    sig_sec = time.perf_counter() - t0

    # headline: full fused pipeline (signatures recomputed inside)
    t0 = time.perf_counter()
    cfg = DedupConfig(signature_concurrency=pool, num_partitions=max(8, NUM_CPUS))
    ds = rd.read_parquet(img_path, columns=sig_cols + ["w", "h", "fmt"])
    out = dedup_pipeline(ds, cfg)
    clusters = out["clusters"]
    n_clustered = clusters.num_rows if hasattr(clusters, "num_rows") else clusters.count()
    flagship_sec = time.perf_counter() - t0

    # per-query timings over the shared sf tables
    from raydedup.queries import QUERIES

    qtimes = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "iter_batches"):
            consume(res)
        qtimes[name] = round(time.perf_counter() - t0, 3)

    return {
        "metric": "flagship_image_dedup_sec",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_rows": n_rows,
        "n_clustered": int(n_clustered),
        "signatures_per_sec": round(n_rows / sig_sec, 1),
        "signature_stage_sec": round(sig_sec, 3),
    }


def run_scaling() -> dict:
    """Same job in fresh processes at 8 and 32 CPUs (sandbox protocol for
    the two-cluster-size criterion — see BASELINE.md)."""
    ensure_bench_table(BENCH_N)  # shared cache; generation cost excluded

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "signatures_per_sec_8": lo["signatures_per_sec"],
        "signatures_per_sec_32": hi["signatures_per_sec"],
        "sig_stage_eff": round((lo["signature_stage_sec"] / hi["signature_stage_sec"]) / 4, 3),
        "bench_rows": hi["bench_rows"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        print(json.dumps(result))
        import ray

        ray.shutdown()
