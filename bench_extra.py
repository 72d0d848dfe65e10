"""Focused per-query measurement harness (round 6 optimization work).

NOT the official bench (bench.py is frozen for the driver): this file
isolates single queries with the noop sink (guide §1.4 — forces every
column of every row, write cost excluded), labels jobs, optionally dumps
``explain("formatted")`` to plans/<tag>/<query>.txt, and prints one JSON
line per query so before/after numbers land in OPTIMIZATION_r06.md with a
reproducible command.

Usage:
    python bench_extra.py --sf /root/testdata/sf1.0 --runs 3 \
        --plans plans/r06 --tag before q30_simhash_candidates q36_...
    (no query args = the full bench.py HEADLINE list)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
if HERE not in sys.path:
    sys.path.insert(0, HERE)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: bench HEADLINE)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to dump explain('formatted') per query")
    ap.add_argument("--count", action="store_true",
                    help="drive with .count() like bench.py instead of the "
                         "noop sink (column-pruned — matches the frozen "
                         "bench's methodology)")
    ap.add_argument("--tag", default="", help="suffix for plan files, e.g. before/after")
    ap.add_argument("--warm", action="store_true", default=True)
    ap.add_argument("--no-warm", dest="warm", action="store_false")
    args = ap.parse_args()

    from sbse.queries import all_queries
    from sbse.session import get_spark

    spark = get_spark(app_name="sbse-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = args.queries or [
        n for n in (
            "q01_decode", "q03_state_final", "q04_sessions_gap30",
            "q06_rollup_1m", "q07_rollup_1h", "q08_rollup_1d",
            "q09_gapfill_1h", "q11_validation_gate", "q13_archive_daily",
            "q20_dedup_exact", "q22_minhash_lsh", "q25_text_quality",
            "q26_ann_topk", "q30_simhash_candidates", "q31_ann_ivf",
            "q33_rollup_quantiles", "q34_sessions_bigkey",
            "q35_quantile_cascade", "q36_simhash_multiblock",
            "q37_contamination", "q38_shuffle_shard",
            "q39_stratified_sample", "q40_pack_sequences",
            "q41_counter_increase", "q42_counter_cascade",
            "q43_counter_bigkey", "q44_curation_e2e",
        )
    ]

    results = {}
    for name in names:
        fn = qs[name]
        drive = (lambda df: df.count()) if args.count else noop
        if args.warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            drive(fn(spark, "/root/testdata/sf0.001"))
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            suffix = f"_{args.tag}" if args.tag else ""
            with open(os.path.join(args.plans, f"{name}{suffix}.txt"), "w") as f:
                f.write(fn(spark, args.sf)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}:run{i}")
            t0 = time.monotonic()
            drive(fn(spark, args.sf))
            runs.append(round(time.monotonic() - t0, 3))
        results[name] = {"best": min(runs), "runs": runs}
        print(json.dumps({"query": name, "sf_dir": args.sf, "best": min(runs),
                          "runs": runs}), flush=True)
    print(json.dumps({"summary": {k: v["best"] for k, v in results.items()},
                      "sf_dir": args.sf}), flush=True)


if __name__ == "__main__":
    main()
