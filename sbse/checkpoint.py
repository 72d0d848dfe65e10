"""Per-partition checkpointing with lineage + metrics manifests.

Re-expression of the reference's durability machinery — the migrations
applied-ledger (internal/db/migrations/migrations.go:112-135: ordered,
idempotent, skip-if-applied) and the periodic stats persistence (tracker
main.go:90) — as a partition-grain resume protocol:

* input is split into N deterministic content-hash partitions
  (``pmod(xxhash64(doc_id), N)`` — stable across runs AND cluster sizes);
* each partition runs the full pipeline and atomically writes its outputs
  under ``<warehouse>/<table>/ck_part=<p>/`` plus a JSON manifest
  ``<warehouse>/_manifests/<run_id>/part-<p>.json`` recording lineage
  (input fingerprint, row counts) and metrics (duration, outputs);
* a resumed run skips every partition whose manifest exists and whose input
  fingerprint still matches — zero recomputation (BASELINE.md resumability
  row), byte-identical results since all operators are deterministic.

At cluster scale each "partition" is a coarse unit of work (e.g. a day of
data, thousands of Spark tasks), so the driver-side loop is control-plane
only.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sbse.skew import checkpoint_partition


def input_fingerprint(df: DataFrame, id_col: str = "doc_id") -> tuple[int, int]:
    """Order-insensitive content fingerprint: (row_count, xor-ish hash sum).

    bit_xor of xxhash64(doc_id, n_tok) is commutative — identical no matter
    how the data is partitioned."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({id_col}, n_tok))").alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] if row["h"] is not None else 0)


def _manifest_path(warehouse: str, run_id: str, part: int) -> str:
    return os.path.join(warehouse, "_manifests", run_id, f"part-{part}.json")


def run_partitioned(
    token_df: DataFrame,
    pipeline_fn: Callable[[DataFrame], dict[str, DataFrame]],
    warehouse: str,
    run_id: str,
    n_parts: int = 4,
) -> dict:
    """Run ``pipeline_fn`` per checkpoint partition; resume-safe.

    Returns a summary dict {partition: 'computed'|'skipped'}."""
    os.makedirs(os.path.join(warehouse, "_manifests", run_id), exist_ok=True)
    labeled = checkpoint_partition(token_df, n_parts)
    summary: dict[int, str] = {}
    for p in range(n_parts):
        mpath = _manifest_path(warehouse, run_id, p)
        subset = labeled.filter(F.col("ck_part") == p).drop("ck_part")
        n, h = input_fingerprint(subset)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest["input_rows"] == n and manifest["input_hash"] == h:
                summary[p] = "skipped"
                continue
        t0 = time.monotonic()
        outputs = pipeline_fn(subset)
        out_meta = {}
        for table, df in outputs.items():
            path = os.path.join(warehouse, table, f"ck_part={p}")
            df.write.mode("overwrite").parquet(path)
            out_meta[table] = {
                "path": path,
                "rows": df.sparkSession.read.parquet(path).count(),
            }
        manifest = {
            "run_id": run_id,
            "partition": p,
            "input_rows": n,
            "input_hash": h,
            "outputs": out_meta,
            "duration_s": round(time.monotonic() - t0, 3),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, mpath)  # atomic: manifest exists only if outputs do
        summary[p] = "computed"
    return summary
