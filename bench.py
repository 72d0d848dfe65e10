"""Bench harness — prints ONE JSON line.

Times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus an end-to-end
rollup-throughput measure (sequences/sec) over a materialized synthetic
token table (the engine's real input shape, read from parquet like the
Iceberg table it models).

Measurement discipline (round-3 lesson: a contended host silently poisoned
BENCH_r03 with 3-10x inflated numbers):
* every timed segment samples /proc/stat around itself and records the
  hypervisor-steal percentage for exactly that window;
* each query runs SBSE_BENCH_RUNS times (default 3) and reports the
  best-of-N (the run least hurt by transient contention); the pipeline runs
  SBSE_BENCH_PIPE_RUNS times (default 2, caches unpersisted between runs);
* the JSON carries a ``host`` block — steal lo/hi over all segments,
  load averages, and a ``contended`` flag (any segment steal > 2%) — so a
  poisoned artifact is self-identifying instead of silently wrong.
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
N_RUNS = int(os.environ.get("SBSE_BENCH_RUNS", "3"))
N_PIPE_RUNS = int(os.environ.get("SBSE_BENCH_PIPE_RUNS", "2"))
STEAL_CONTENDED_PCT = 2.0

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
    "q34_sessions_bigkey",
    "q35_quantile_cascade",
]


def _proc_stat() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from the aggregate cpu line."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), steal


def _timed(fn) -> tuple[float, float]:
    """Run fn; return (wall seconds, steal%% of host cpu over that window)."""
    t_a, s_a = _proc_stat()
    t0 = time.monotonic()
    fn()
    dt = time.monotonic() - t0
    t_b, s_b = _proc_stat()
    steal_pct = 100.0 * (s_b - s_a) / max(t_b - t_a, 1)
    return dt, steal_pct


def main() -> None:
    from sbse.pipeline import run_pipeline
    from sbse.queries import all_queries
    from sbse.session import get_spark
    from sbse.tokens import synth

    spark = get_spark(app_name="sbse-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    load_start = os.getloadavg()

    qtimes: dict[str, float] = {}
    qruns: dict[str, list[float]] = {}
    steals: list[float] = []
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
        runs = []
        for _ in range(N_RUNS):
            dt, st = _timed(lambda: qs[name](spark, SF_DIR).count())
            runs.append(round(dt, 3))
            steals.append(round(st, 2))
        qruns[name] = runs
        qtimes[name] = min(runs)

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

    counts: dict[str, int] = {}
    pipe_runs: list[float] = []
    for _ in range(N_PIPE_RUNS):
        out = run_pipeline(tok, decode_mode="expr", with_gorilla=False,
                           cache_tiers=True)

        def drive(out=out):
            # force the full DAG: tiers + sessions + metrics
            counts.update(
                {
                    "sessions": out["sessions"].count(),
                    "rollup_1m": out["rollup_1m"].count(),
                    "rollup_1d": out["rollup_1d"].count(),
                    "gapfill_1h": out["gapfill_1h"].count(),
                }
            )

        dt, st = _timed(drive)
        pipe_runs.append(round(dt, 3))
        steals.append(round(st, 2))
        # drop this run's tier caches so the next timed run (or a rerun of
        # bench) cannot hit them: identical analyzed plans WOULD cache-hit
        out["rollup_1m"].unpersist(True)
        out["rollup_1h"].unpersist(True)
    pipe_s = min(pipe_runs)
    total = round(sum(qtimes.values()) + pipe_s, 3)
    qtimes["pipeline_e2e"] = pipe_s
    qruns["pipeline_e2e"] = pipe_runs
    load_end = os.getloadavg()

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
                "query_runs": qruns,
                "host": {
                    "steal_pct_min": min(steals),
                    "steal_pct_max": max(steals),
                    "loadavg_start": round(load_start[0], 2),
                    "loadavg_end": round(load_end[0], 2),
                    "runs_per_query": N_RUNS,
                    "pipeline_runs": N_PIPE_RUNS,
                    "contended": max(steals) > STEAL_CONTENDED_PCT,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
