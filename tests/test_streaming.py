"""Structured Streaming skin: session_window/tumbling aggregates over a
file-source stream must agree with the batch engine on the same input."""

from pyspark.sql import functions as F

from tests.test_sessionize import mk
from tests.conftest import make_token_rows


def _write_tokens(spark, tmp_path, rows):
    path = str(tmp_path / "tok")
    make_token_rows(spark, rows).write.parquet(path)
    return path


def test_streaming_sessions_match_batch(spark, tmp_path):
    from sbse.decode import decode
    from sbse.sessionize import locf_merge, session_rollup, sessionize, states_only
    from sbse.streaming.stream import read_token_stream, streaming_sessions

    rows = [mk(i, s, key=k) for i, (s, k) in enumerate(
        [(s, k) for k in (1, 2) for s in (0, 10, 100, 110, 400)])]
    path = _write_tokens(spark, tmp_path, rows)

    stream = read_token_stream(spark, path)
    assert stream.isStreaming
    sess_stream = streaming_sessions(stream, gap_ms=30_000)
    q = (
        sess_stream.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.source, r.key, r.started_at, r.ended_at, r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }

    batch = session_rollup(
        sessionize(
            locf_merge(states_only(decode(spark.read.parquet(path), "expr"))),
            gap_ms=30_000,
        )
    )
    want = {
        (r.source, r.key, r.started_at, r.ended_at, r.n_events)
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 6  # 2 keys x sessions {0,10},{100,110},{400}


def test_streaming_rollup_1m_matches_batch(spark, tmp_path):
    from sbse.decode import decode
    from sbse.rollup import bucket_rollup
    from sbse.sessionize import states_only
    from sbse.streaming.stream import read_token_stream, streaming_rollup_1m

    rows = [mk(i, s, key=1) for i, s in enumerate([0, 30, 70, 200])]
    path = _write_tokens(spark, tmp_path, rows)
    q = (
        streaming_rollup_1m(read_token_stream(spark, path))
        .writeStream.format("memory")
        .queryName("r1m_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.source, r.key, r.bucket_start, r.cnt, r.n_tok_sum)
        for r in spark.sql("SELECT * FROM r1m_out").collect()
    }
    want = {
        (r.source, r.key, r.bucket_start, r.cnt, r.n_tok_sum)
        for r in bucket_rollup(
            states_only(decode(spark.read.parquet(path), "expr")), "minute"
        ).collect()
    }
    assert got == want
