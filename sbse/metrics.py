"""Run counters/metrics — re-expression of internal/stats/stats.go:69-154
and the system_stats hypertable (schema.sql:49-66).

One row per run (or per checkpoint partition): monotone counters, distinct
gauges, and the per-msg-type histogram as ``array<long>`` length 10
(index = msg_type; out-of-range types silently dropped, stats.go:89-93).
uint64->int64 clamp semantics preserved (db/client.go:131-139)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

I64_MAX = (1 << 63) - 1


def clamp_u64(col):
    """uint64 -> int64 persist clamp (db/client.go:131-139). Comparison in
    decimal(38,0) so values beyond int64 clamp instead of overflowing in
    the cast (the Go code compares in uint64 for the same reason)."""
    return F.least(
        col.cast("decimal(38,0)"), F.lit(I64_MAX).cast("decimal(38,0)")
    ).cast("bigint")


def clamp_read(col):
    """negative -> 0 read-back clamp (db/client.go:227-235)."""
    return F.greatest(col.cast("bigint"), F.lit(0))


def run_metrics(decoded: DataFrame, sessions: DataFrame | None = None,
                proc_ms: int | None = None) -> DataFrame:
    hist = F.array(
        *[
            F.sum(
                F.when(F.col("ok") & (F.col("msg_type") == i), 1).otherwise(0)
            ).cast("bigint")
            for i in range(10)
        ]
    ).alias("msg_type_counts")
    aggs = [
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("parsed_rows"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).cast("bigint").alias("failed_rows"),
        F.sum(F.when(F.col("ok") & F.col("key").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("stored_states"),
        F.countDistinct(
            F.when(
                F.col("ok") & F.col("key").isNotNull(),
                F.concat_ws("|", "source", F.col("key").cast("string")),
            )
        ).alias("active_keys"),
        hist,
    ]
    m = decoded.agg(*aggs)
    if proc_ms is not None:
        # A5 processing-time counter (stats.go:128-132; persisted via the
        # same u64 clamp as every counter, db/client.go:131-139). Callers
        # pass measured wall time — nondeterministic, so this column stays
        # out of oracle-checked outputs (checkpoint manifests carry it too).
        # lit(str) -> decimal: a uint64-scale literal overflows a LongType lit
        m = m.withColumn("proc_time_ms",
                         clamp_u64(F.lit(str(proc_ms)).cast("decimal(38,0)")))
    if sessions is not None:
        s = sessions.agg(
            F.count(F.lit(1)).alias("created_sessions"),
            F.sum(F.when(F.col("ended_at").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("ended_sessions"),
            F.sum(F.when(F.col("is_open"), 1).otherwise(0))
            .cast("bigint")
            .alias("active_sessions"),
        )
        m = m.crossJoin(s)
    return m
