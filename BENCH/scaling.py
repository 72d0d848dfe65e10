"""Scaling-efficiency evidence (north_rule: >=0.8 from N to 4N executors).

No real cluster exists in this sandbox, so — per BASELINE.md — the proxy is
the same job, same input, at local[8] vs local[32]. Each measurement runs in
a fresh subprocess (fresh JVM) and times the full pipeline over the same
materialized token parquet. Results are written to BENCH/BASELINE.md.

Usage: python BENCH/scaling.py [--rows 4000000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from sbse.session import get_spark
from sbse.pipeline import run_pipeline

spark = get_spark(master="local[{cores}]", shuffle_partitions={shuffle},
                  app_name="sbse-scaling-{cores}")
spark.sparkContext.setLogLevel("ERROR")
tok = spark.read.parquet({tok_path!r})
# warm-up: JVM/codegen, not measured
tok.limit(1000).count()
t0 = time.monotonic()
out = run_pipeline(tok, decode_mode="expr", with_gorilla=False,
                   cache_tiers=True)
n_sessions = out["sessions"].count()
n_1m = out["rollup_1m"].count()
n_1d = out["rollup_1d"].count()
wall = time.monotonic() - t0
print("RESULT " + json.dumps({{"cores": {cores}, "wall_s": wall,
      "sessions": n_sessions, "r1m": n_1m, "r1d": n_1d}}))
"""


def run_at(cores: int, tok_path: str, rows: int) -> dict:
    code = _CHILD.format(repo=REPO, cores=cores, shuffle=max(cores * 2, 8),
                         tok_path=tok_path)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["throughput_seq_per_s"] = rows / r["wall_s"]
            return r
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    tok_path = f"/tmp/sbse_scaling_tokens_{args.rows}"
    if not os.path.exists(tok_path):
        from sbse.session import get_spark  # noqa: PLC0415
        from sbse.tokens import synth

        sys.path.insert(0, REPO)
        spark = get_spark(app_name="sbse-scaling-gen")
        synth(spark, args.rows).write.mode("overwrite").parquet(tok_path)
        spark.stop()

    lows = [run_at(args.low, tok_path, args.rows) for _ in range(args.repeats)]
    highs = [run_at(args.high, tok_path, args.rows) for _ in range(args.repeats)]
    lo = min(lows, key=lambda r: r["wall_s"])
    hi = min(highs, key=lambda r: r["wall_s"])
    assert (lo["sessions"], lo["r1m"], lo["r1d"]) == (
        hi["sessions"], hi["r1m"], hi["r1d"]), "outputs differ across cluster sizes!"
    factor = args.high / args.low
    speedup = lo["wall_s"] / hi["wall_s"]
    eff = speedup / factor
    result = {
        "rows": args.rows,
        "low": lo,
        "high": hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(result, indent=1))

    md = f"""# BENCH/BASELINE.md — measured numbers

Scaling-efficiency evidence (sandbox proxy for N -> 4N executors,
BASELINE.md row 3): same pipeline, same {args.rows:,}-row token parquet.

| parallelism | wall (s) | throughput (seq/s) | sessions | 1m rows | 1d rows |
|---|---|---|---|---|---|
| local[{args.low}] | {lo['wall_s']:.1f} | {lo['throughput_seq_per_s']:,.0f} | {lo['sessions']} | {lo['r1m']} | {lo['r1d']} |
| local[{args.high}] | {hi['wall_s']:.1f} | {hi['throughput_seq_per_s']:,.0f} | {hi['sessions']} | {hi['r1m']} | {hi['r1d']} |

speedup {args.low}->{args.high}: **{speedup:.2f}x** over a {factor:.0f}x core factor
=> scaling efficiency **{eff:.3f}** (target >= 0.8).
Outputs at both sizes are identical (row counts asserted; operators are
deterministic and partitioning-invariant — tests/test_sessionize.py::test_partition_invariance).
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
