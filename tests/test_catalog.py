"""Partitioned warehouse: date-partitioned writes + snapshot manifests,
O(1) partition expiry without rewriting survivors, partition-pruned range
reads (plan-checked), and dirty-window continuous-aggregate refresh."""

import datetime as dt
import os

from pyspark.sql import functions as F

STATE_SCHEMA = ("source string, key bigint, ts timestamp, seq bigint, "
                "n_tok int, tokens array<int>")


def _states(spark, days, per_day=24):
    rows = []
    seq = 0
    for d in days:
        base = dt.datetime.fromisoformat(f"{d} 00:00:00")
        for h in range(per_day):
            rows.append(("s0", 1, base + dt.timedelta(hours=h), seq,
                         10 + h, [1, 2, h]))
            seq += 1
    return spark.createDataFrame(rows, STATE_SCHEMA)


def _mtimes(path):
    out = {}
    for root, _, files in os.walk(path):
        if "_snapshots" in root:
            continue
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


def test_write_read_snapshot_roundtrip(spark, tmp_path):
    from sbse import catalog

    df = _states(spark, ["2024-01-01", "2024-01-02", "2024-01-03"])
    path = str(tmp_path / "t")
    snap = catalog.write_partitioned(df, path, date_col="ts")
    assert snap["total_rows"] == 72
    assert sorted(snap["partitions"]) == ["2024-01-01", "2024-01-02",
                                          "2024-01-03"]
    assert snap["ts_max"].startswith("2024-01-03 23")
    got = catalog.read_partitioned(spark, path)
    assert got.count() == 72
    # partition dirs exist on disk
    assert sorted(e for e in os.listdir(path) if e.startswith("log_date=")) \
        == [f"log_date=2024-01-0{i}" for i in (1, 2, 3)]


def test_range_read_is_partition_pruned(spark, tmp_path):
    from sbse import catalog

    df = _states(spark, ["2024-01-01", "2024-01-02", "2024-01-03",
                         "2024-01-04"])
    path = str(tmp_path / "t")
    catalog.write_partitioned(df, path, date_col="ts")
    pruned = catalog.read_partitioned(spark, path, start="2024-01-02",
                                      end="2024-01-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "log_date" in plan, plan
    # the date range must land in PartitionFilters, not PushedFilters
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "log_date" in pf and (">=" in pf and "<=" in pf), pf
    assert pruned.count() == 48


def test_expire_drops_without_rewrite(spark, tmp_path):
    from sbse import catalog

    df = _states(spark, [f"2024-01-0{i}" for i in range(1, 6)])
    path = str(tmp_path / "t")
    catalog.write_partitioned(df, path, date_col="ts")
    before = _mtimes(os.path.join(path, "log_date=2024-01-04"))
    dropped = catalog.expire_partitions(path, keep_from="2024-01-04")
    assert dropped == ["2024-01-01", "2024-01-02", "2024-01-03"]
    # survivors byte-untouched (no rewrite — chunk-drop semantics)
    assert _mtimes(os.path.join(path, "log_date=2024-01-04")) == before
    snap = catalog.current_snapshot(path)
    assert snap["op"] == "expire"
    assert sorted(snap["partitions"]) == ["2024-01-04", "2024-01-05"]
    assert catalog.read_partitioned(spark, path).count() == 48


def test_expire_handles_nested_ck_part_layout(spark, tmp_path):
    from sbse import catalog

    df = _states(spark, ["2024-01-01", "2024-01-02"])
    path = str(tmp_path / "t")
    (
        df.withColumn("ck_part", (F.col("seq") % 2).cast("int"))
        .withColumn("log_date", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("ck_part", "log_date").parquet(path)
    )
    dropped = catalog.expire_partitions(path, keep_from="2024-01-02")
    assert dropped == ["2024-01-01"]
    left = spark.read.parquet(path)
    assert left.count() == 24
    assert left.select("log_date").distinct().collect()[0][0] != "2024-01-01"


def test_write_partitioned_refuses_null_dates(spark, tmp_path):
    """ADVICE r2: a NULL time value would land in __HIVE_DEFAULT_PARTITION__
    and silently vanish from every range read — write_partitioned must
    refuse it loudly (detected inside the stats job, no extra scan)."""
    import datetime as dt

    import pytest

    from sbse import catalog

    df = _states(spark, ["2024-01-01"]).unionByName(
        spark.createDataFrame([("s0", 2, None, 999, 5, [1])], STATE_SCHEMA)
    )
    with pytest.raises(ValueError, match="NULL 'ts'"):
        catalog.write_partitioned(df, str(tmp_path / "t"), date_col="ts")


def test_refresh_tier_dirty_window_only(spark, tmp_path):
    from sbse import catalog
    from sbse.rollup import bucket_rollup

    path = str(tmp_path / "tier_1h")
    d1 = _states(spark, ["2024-01-01", "2024-01-02"])
    catalog.write_partitioned(bucket_rollup(d1, "hour"), path,
                              date_col="bucket_start")
    day1_before = _mtimes(os.path.join(path, "log_date=2024-01-01"))

    # new data lands: day 3 plus LATE day-2 rows -> dirty window is d2..d3
    late = spark.createDataFrame(
        [("s0", 1, dt.datetime.fromisoformat("2024-01-02 05:30:00"),
          999, 77, [9, 9, 9])], STATE_SCHEMA)
    all_states = d1.unionByName(_states(spark, ["2024-01-03"])).unionByName(late)
    snap = catalog.refresh_tier(all_states, path, "hour",
                                dirty_start="2024-01-02",
                                dirty_end="2024-01-03")
    assert snap["op"] == "refresh"
    # day 1 not rewritten
    assert _mtimes(os.path.join(path, "log_date=2024-01-01")) == day1_before
    # stored tier == full recompute
    got = catalog.read_partitioned(spark, path).drop("log_date")
    want = bucket_rollup(all_states, "hour")
    cols = sorted(want.columns)
    g = sorted(map(tuple, got.select(*cols).collect()))
    w = sorted(map(tuple, want.select(*cols).collect()))
    assert g == w
    # snapshot partition stats reflect the refreshed dates
    # the late row merges into the existing 05:00 bucket (still 24 buckets;
    # the full-recompute equality above proves its cnt went to 2)
    assert snap["partitions"]["2024-01-02"]["rows"] == 24
    assert snap["partitions"]["2024-01-03"]["rows"] == 24
