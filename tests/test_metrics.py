"""F5 run-metrics fixtures (stats.go:69-154 semantics) with counters
recomputed independently in Python."""

from pyspark.sql import functions as F

from tests.ref_decoder import decode_row


def test_counters_match_independent_decode(spark):
    from sbse.decode import decode
    from sbse.metrics import run_metrics
    from sbse.tokens import synth

    tok = synth(spark, 1000)
    rows = tok.collect()
    ref = [decode_row(r.doc_id, list(r.tokens), r.n_tok, r.source) for r in rows]
    exp_parsed = sum(1 for r in ref if r["ok"])
    exp_failed = sum(1 for r in ref if not r["ok"])
    exp_stored = sum(1 for r in ref if r["ok"] and r["key"] is not None)
    exp_hist = [
        sum(1 for r in ref if r["ok"] and r["msg_type"] == i) for i in range(10)
    ]
    exp_keys = len({(r["source"], r["key"]) for r in ref
                    if r["ok"] and r["key"] is not None})

    m = run_metrics(decode(tok, "expr")).collect()[0]
    assert m.total_rows == 1000
    assert m.parsed_rows == exp_parsed
    assert m.failed_rows == exp_failed
    assert m.stored_states == exp_stored
    assert m.active_keys == exp_keys
    assert list(m.msg_type_counts) == exp_hist
    # msg types 10..12 exist but are dropped from the histogram
    # (stats.go:89-93: index out of [0,10) silently ignored)
    assert sum(exp_hist) < exp_parsed


def test_session_counters(spark):
    from sbse.decode import decode
    from sbse.metrics import run_metrics
    from sbse.pipeline import run_pipeline
    from sbse.tokens import synth

    tok = synth(spark, 500)
    out = run_pipeline(tok, decode_mode="expr", close_trailing=False,
                       with_gorilla=False)
    m = run_metrics(out["decoded"], out["sessions"]).collect()[0]
    s = out["sessions"]
    assert m.created_sessions == s.count()
    assert m.ended_sessions == s.filter(F.col("ended_at").isNotNull()).count()
    assert m.active_sessions == s.filter(F.col("is_open")).count()
    assert m.ended_sessions + m.active_sessions >= m.created_sessions


def test_clamps(spark):
    """uint64->int64 persist clamp and negative->0 read clamp
    (db/client.go:131-139, 227-235; edge vectors client_test.go:1017-1057)."""
    from sbse.metrics import I64_MAX, clamp_read, clamp_u64

    df = spark.createDataFrame(
        [(0,), (999999999,), (-5,), (I64_MAX,)], "v bigint"
    ).select(
        clamp_u64(F.col("v")).alias("persisted"),
        clamp_read(F.col("v")).alias("read_back"),
    )
    got = sorted((r.persisted, r.read_back) for r in df.collect())
    assert got == [(-5, 0), (0, 0), (999999999, 999999999), (I64_MAX, I64_MAX)]


def test_run_metrics_proc_time_clamped(spark):
    """A5 processing-time counter, persisted through the u64 clamp
    (stats.go:128-132 + db/client.go:131-139): a uint64-scale duration
    clamps to 2^63-1; a sane one passes through."""
    from sbse.decode import decode
    from sbse.metrics import I64_MAX, run_metrics
    from sbse.tokens import synth

    d = decode(synth(spark, 200), "expr")
    m = run_metrics(d, proc_ms=12345).collect()[0]
    assert m.proc_time_ms == 12345
    m2 = run_metrics(d, proc_ms=(1 << 64) - 1).collect()[0]
    assert m2.proc_time_ms == I64_MAX


def test_distinct_scale_twin_accuracy(spark):
    """q02's active_keys is an EXACT countDistinct (shuffles the distinct
    set). The 100 TB scale twin is approx_count_distinct (HyperLogLog++:
    one pass, mergeable, fixed memory); the exact value pins its error
    within the configured 2% rsd."""
    from pyspark.sql import functions as F

    from sbse.decode import decode
    from sbse.tokens import token_table_from_events

    tok = token_table_from_events(spark, "/root/testdata/sf0.01")
    d = decode(tok.localCheckpoint(eager=False), mode="expr")
    keyed = d.filter(F.col("ok") & F.col("key").isNotNull()).select(
        F.concat("source", F.lit("|"), F.col("key").cast("string")).alias("k")
    )
    row = keyed.agg(
        F.countDistinct("k").alias("exact"),
        F.approx_count_distinct("k", 0.02).alias("approx"),
    ).collect()[0]
    assert row.exact > 0
    assert abs(row.approx - row.exact) <= max(3, 0.05 * row.exact), row
