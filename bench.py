"""Bench harness — prints ONE JSON line.

Times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus an end-to-end
rollup-throughput measure (sequences/sec) over a materialized synthetic
token table (the engine's real input shape, read from parquet like the
Iceberg table it models).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SYNTH_ROWS = int(os.environ.get("SBSE_BENCH_SYNTH_ROWS", "2000000"))

HEADLINE = [
    "q01_decode",
    "q03_state_final",
    "q04_sessions_gap30",
    "q06_rollup_1m",
    "q07_rollup_1h",
    "q08_rollup_1d",
    "q09_gapfill_1h",
    "q11_validation_gate",
    "q13_archive_daily",
    "q20_dedup_exact",
    "q22_minhash_lsh",
    "q25_text_quality",
    "q26_ann_topk",
    "q30_simhash_candidates",
    "q31_ann_ivf",
    "q33_rollup_quantiles",
]


def main() -> None:
    from sbse.pipeline import run_pipeline
    from sbse.queries import all_queries
    from sbse.session import get_spark
    from sbse.tokens import synth

    spark = get_spark(app_name="sbse-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    qtimes: dict[str, float] = {}
    qs = all_queries()
    # Steady-state protocol (same as the pipeline warm-up below): drive the
    # same query shapes once at the smallest sf so the timed loop measures
    # execution, not first-query JVM/codegen/Python-worker start-up — those
    # are per-process costs that amortize to ~0 on a long-running cluster.
    warm_sf = "/root/testdata/sf0.001"
    for name in ("q01_decode", "q22_minhash_lsh", "q26_ann_topk",
                 "q30_simhash_candidates", "q31_ann_ivf"):
        qs[name](spark, warm_sf).count()
    for name in HEADLINE:
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).count()
        qtimes[name] = round(time.monotonic() - t0, 3)

    # throughput: full pipeline (decode -> LOCF -> sessionize -> 3 tiers ->
    # gapfill -> metrics) over a parquet token table of SYNTH_ROWS sequences
    tok_path = f"/tmp/sbse_bench_tokens_{SYNTH_ROWS}"
    if not os.path.exists(tok_path):
        synth(spark, SYNTH_ROWS).write.mode("overwrite").parquet(tok_path)
    tok = spark.read.parquet(tok_path)
    # warm-up with the same plan shapes (JIT + codegen compile are
    # per-process costs that amortize to ~0 in a long-running job)
    warm = run_pipeline(tok.limit(100_000), decode_mode="expr",
                        with_gorilla=False, cache_tiers=True)
    for k in ("sessions", "rollup_1m", "rollup_1d", "gapfill_1h"):
        warm[k].count()
    warm["rollup_1m"].unpersist(True)
    warm["rollup_1h"].unpersist(True)
    t0 = time.monotonic()
    out = run_pipeline(tok, decode_mode="expr", with_gorilla=False,
                       cache_tiers=True)
    # force the full DAG: tiers + sessions + metrics
    counts = {
        "sessions": out["sessions"].count(),
        "rollup_1m": out["rollup_1m"].count(),
        "rollup_1d": out["rollup_1d"].count(),
        "gapfill_1h": out["gapfill_1h"].count(),
    }
    pipe_s = time.monotonic() - t0
    total = round(sum(qtimes.values()) + pipe_s, 3)
    qtimes["pipeline_e2e"] = round(pipe_s, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_pipeline_wall",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "rollup_throughput_seq_per_s": round(SYNTH_ROWS / pipe_s, 1),
                "pipeline_rows": SYNTH_ROWS,
                "pipeline_out_counts": counts,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
            }
        )
    )


if __name__ == "__main__":
    main()
