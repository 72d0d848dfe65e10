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


def test_bus_decode_equivalent_to_file_source(spark):
    """S4 bus-source value decode: serializing token rows to Kafka-shaped
    (value: binary JSON) frames and projecting them back through
    decode_bus_tokens yields rows identical to the native token table —
    token arrays included — so the Kafka reader (which shares this exact
    projection) is semantics-equivalent to the file source without needing
    a broker in the sandbox."""
    from sbse.streaming.stream import decode_bus_tokens

    rows = [mk(i, i * 7, key=i % 3) for i in range(50)]
    tok = make_token_rows(spark, rows)
    wire = tok.select(
        F.to_json(F.struct("doc_id", "tokens", "n_tok", "source"))
        .cast("binary").alias("value")
    )
    back = decode_bus_tokens(wire)
    assert back.schema == tok.schema
    want = sorted(map(str, tok.collect()))
    got = sorted(map(str, back.collect()))
    assert got == want


def test_bus_decode_poison_message(spark):
    """A malformed payload becomes an all-NULL row (PERMISSIVE from_json) —
    the bus handler's poison-message tolerance, never an exception."""
    from sbse.streaming.stream import decode_bus_tokens

    raw = spark.createDataFrame(
        [(bytearray(b"{not json"),), (bytearray(b'{"doc_id":"d1","tokens":[1,2],"n_tok":2,"source":"s"}'),)],
        "value binary",
    )
    out = decode_bus_tokens(raw).collect()
    assert len(out) == 2
    ok = [r for r in out if r.doc_id == "d1"]
    bad = [r for r in out if r.doc_id is None]
    assert len(ok) == 1 and ok[0].tokens == [1, 2]
    assert len(bad) == 1 and bad[0].tokens is None


def test_kafka_reader_construction(spark):
    """read_token_stream_kafka wires format('kafka') + the shared decode
    projection. The connector jar is not bundled in this sandbox; the
    reader must then fail with Spark's standard missing-data-source error
    (not an engine bug) — and if a connector IS present, the constructed
    stream must be a streaming token-schema frame."""
    import pytest

    from sbse.streaming.stream import read_token_stream_kafka
    from sbse.tokens import TOKEN_SCHEMA_DDL

    try:
        s = read_token_stream_kafka(spark, "localhost:9092", "tokens")
    except Exception as e:  # connector absent in sandbox
        msg = str(e)
        assert "kafka" in msg.lower(), msg
        assert "Failed to find data source" in msg or "DATA_SOURCE" in msg, msg
    else:
        assert s.isStreaming
        assert s.schema.simpleString() == f"struct<{TOKEN_SCHEMA_DDL.replace(', ', ',').replace(' ', ':')}>"


def test_bus_encode_decode_roundtrip(spark):
    """S4 sink wire projection: encode_bus_tokens -> decode_bus_tokens is
    the identity on token rows, and the Kafka frame carries a doc_id key
    for stable partition routing."""
    from sbse.streaming.stream import decode_bus_tokens, encode_bus_tokens

    rows = [mk(i, i * 3, key=i % 5) for i in range(30)]
    tok = make_token_rows(spark, rows)
    wire = encode_bus_tokens(tok)
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert bytes(wire.select("key").first()[0]).decode().startswith("d")
    back = decode_bus_tokens(wire.select("value"))
    assert back.schema == tok.schema
    assert sorted(map(str, back.collect())) == sorted(map(str, tok.collect()))
