"""Focused tests for sbse.joins — the round-6 as-of fast path of the
interval join must be row-identical to the generic join whenever sessions
are disjoint (always true for gap sessionization)."""

from tests.conftest import SF_DIR


def test_interval_join_asof_mode_equals_generic_on_gap_sessions(spark):
    from sbse.joins import attribute_events_to_sessions
    from sbse.queries import _merged
    from sbse.sessionize import session_rollup, sessionize

    m = _merged(spark, SF_DIR)
    sessions = session_rollup(sessionize(m, gap_ms=30_000,
                                         close_trailing=True))
    ev = m.select("source", "key", "ts", "seq")
    cols = ["source", "key", "ts", "seq", "session_id", "started_at",
            "ended_at"]
    generic = {tuple(r) for r in
               attribute_events_to_sessions(ev, sessions)
               .select(*cols).collect()}
    asof = {tuple(r) for r in
            attribute_events_to_sessions(ev, sessions, assume_disjoint=True)
            .select(*cols).collect()}
    assert generic == asof
    assert len(generic) > 0


def test_interval_join_generic_keeps_overlap_semantics(spark):
    """The default mode emits one row per CONTAINING session — overlapping
    sessions both match; the disjoint fast path is opt-in exactly because
    it would pick only the latest-starting one here."""
    from pyspark.sql import functions as F

    from sbse.joins import attribute_events_to_sessions

    ev = spark.createDataFrame(
        [("s", 1, "2024-01-01 00:00:05", 1)],
        "source string, key bigint, ts string, seq bigint",
    ).withColumn("ts", F.to_timestamp("ts"))
    sess = spark.createDataFrame(
        [
            ("a", "s", 1, "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
            ("b", "s", 1, "2024-01-01 00:00:03", "2024-01-01 00:00:07"),
        ],
        "session_id string, source string, key bigint, started_at string, "
        "ended_at string",
    ).withColumn("started_at", F.to_timestamp("started_at")) \
     .withColumn("ended_at", F.to_timestamp("ended_at"))
    got = {r.session_id for r in
           attribute_events_to_sessions(ev, sess).collect()}
    assert got == {"a", "b"}
    got_disjoint = {r.session_id for r in
                    attribute_events_to_sessions(
                        ev, sess, assume_disjoint=True).collect()}
    assert got_disjoint == {"b"}  # latest start only — why it is opt-in
