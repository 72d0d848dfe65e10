"""Behavioral tests for sbse.datapipe.curate (the oracle parity test covers
engine-vs-DuckDB equivalence; these pin the semantics themselves)."""

from pyspark.sql import Row

from sbse.datapipe import curate as cu


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang, source="s0", n_chars=len(t))
         for i, t, lang in rows]
    )


def test_contamination_planted_leak(spark):
    # doc 0 is the benchmark (0 % 97 == 0); doc 5 copies a benchmark
    # sentence verbatim, doc 6 shares no 8-gram.
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean = "one two three four five six seven eight nine ten"
    out = {
        r["doc_id"]: r
        for r in cu.contamination_screen(
            _docs(spark, [(0, leak, "en"), (5, leak, "en"), (6, clean, "en")])
        ).collect()
    }
    assert set(out) == {5, 6}  # benchmark doc excluded from the corpus
    assert out[5]["n_hits"] == out[5]["n_grams"] > 0
    assert out[5]["contaminated"] is True
    assert out[6]["n_hits"] == 0 and out[6]["contaminated"] is False


def test_contamination_short_docs_yield_no_rows(spark):
    out = cu.contamination_screen(
        _docs(spark, [(0, "a b c d e f g h i", "en"), (1, "too short", "en")])
    ).collect()
    assert out == []  # doc 1 has < 8 words -> no grams -> not screened


def test_shuffle_shard_partition_and_order(spark):
    docs = _docs(spark, [(i, "x", "en") for i in range(1, 300)])
    out = cu.shuffle_shard(docs).collect()
    assert len(out) == 299
    for r in out:
        # shard is the top nibble of the key -> range partitioning
        assert r["shard_id"] == int(r["shuffle_key"][0], 16)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos_in_shard"])
        assert [r["pos_in_shard"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [r["shuffle_key"] for r in rows]
        assert keys == sorted(keys)  # loader order == shuffled-key order


def test_shuffle_shard_two_nibbles(spark):
    docs = _docs(spark, [(i, "x", "en") for i in range(1, 50)])
    out = cu.shuffle_shard(docs, shard_nibbles=2).collect()
    for r in out:
        assert r["shard_id"] == int(r["shuffle_key"][:2], 16)


def test_stratified_sample_append_stable_and_deterministic(spark):
    rows = [(i, "doc text", ["en", "de", "fr"][i % 3]) for i in range(1, 400)]
    full = cu.stratified_sample(_docs(spark, rows))
    first = {r["doc_id"]: r for r in full.collect()}
    again = {r["doc_id"]: r for r in full.collect()}
    assert first == again  # deterministic
    # append stability: sampling a prefix subset selects exactly the
    # subset's members of the full sample — no reshuffling of decisions
    prefix = {r["doc_id"] for r in
              cu.stratified_sample(_docs(spark, rows[:200])).collect()}
    assert prefix == {d for d in first if d <= rows[199][0]}
    # per-stratum rates applied: en keeps ~2x the de rate
    for r in first.values():
        assert r["rate"] == {"en": 0.5, "de": 0.25, "fr": 0.125}[r["lang"]]
        assert r["samp_hex"] < cu._rate_hex4(r["rate"])


def test_pack_sequences_contiguous_stream(spark):
    docs = _docs(spark, [(i, " ".join(["tok"] * (i % 7 + 1)), "en")
                         for i in range(1, 200)])
    out = cu.pack_sequences(docs, seq_len=16).collect()
    assert len(out) == 199
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos_in_shard"])
        # docs are laid end-to-end: each starts where the previous ended
        off = 0
        for r in rows:
            assert r["start_offset"] == off
            off += r["n_tok"]
            assert r["seq_first"] == r["start_offset"] // 16
            last_tok = r["start_offset"] + max(r["n_tok"], 1) - 1
            assert r["seq_last"] == last_tok // 16
            assert r["seq_last"] >= r["seq_first"]


def test_pack_sequences_empty_doc_spans_nothing(spark):
    docs = _docs(spark, [(1, "", "en"), (2, "a b c", "en")])
    out = {r["doc_id"]: r for r in cu.pack_sequences(docs, seq_len=4).collect()}
    assert out[1]["n_tok"] == 0
    assert out[1]["seq_first"] == out[1]["seq_last"]


def test_stratified_sample_rate_zero_and_one(spark):
    rows = [(i, "t", "en") for i in range(1, 100)]
    none = cu.stratified_sample(_docs(spark, rows), rates={"en": 0.0})
    assert none.count() == 0
    everything = cu.stratified_sample(_docs(spark, rows), rates={"en": 1.0})
    assert everything.count() == 99


def test_contamination_minimal_benchmark_frame(spark):
    # the documented contract: benchmark is any frame with (doc_id, text)
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = spark.createDataFrame([(1000, leak)], "doc_id long, text string")
    out = cu.contamination_screen(
        _docs(spark, [(5, leak, "en")]), benchmark=bench).collect()
    assert len(out) == 1 and out[0]["contaminated"] is True


def test_write_packed_corpus_file_layout_and_loader_read(spark, tmp_path):
    """The materialized manifest: every parquet file holds a contiguous,
    sorted slice of one shard range; the loader's single-sequence read
    returns exactly the docs overlapping that sequence, with its range
    predicates pushed into the parquet scan."""
    import glob
    import os

    docs = _docs(spark, [(i, " ".join(["tok"] * (i % 9 + 1)), "en")
                         for i in range(1, 500)])
    path = str(tmp_path / "packed")
    cu.write_packed_corpus(docs, path, seq_len=32)

    # per-file: sorted by (shard_id, start_offset), ranges non-overlapping
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        pf = spark.read.parquet(f).collect()
        if not pf:
            continue
        keys = [(r["shard_id"], r["start_offset"]) for r in pf]
        assert keys == sorted(keys)
        spans.append((keys[0], keys[-1]))
    spans.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        # strict: keys are unique, so a shared boundary key would mean the
        # same key landed in two files — the exact overlap this guards
        assert hi_a < lo_b

    # whole-manifest read equals the logical plan
    want = {tuple(sorted(r.asDict().items()))
            for r in cu.pack_sequences(docs, seq_len=32).collect()}
    got = {tuple(sorted(r.asDict().items()))
           for r in spark.read.parquet(path).collect()}
    assert got == want

    # loader read: exactly the docs overlapping (shard, seq), filters pushed
    any_row = next(iter(want))
    shard = dict(any_row)["shard_id"]
    sl = cu.read_packed_slice(spark, path, shard_id=shard, seq=1)
    # widen the metadata render so the PushedFilters list isn't truncated
    old_len = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = sl._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old_len)
    # ALL the range predicates must reach the scan — footer-level pruning is
    # the point of the materialized manifest
    assert f"EqualTo(shard_id,{shard})" in plan
    assert "LessThanOrEqual(seq_first,1)" in plan
    assert "GreaterThanOrEqual(seq_last,1)" in plan
    rows = sl.collect()
    manifest = [dict(t) for t in want]
    expect = {r["doc_id"] for r in manifest
              if r["shard_id"] == shard and r["seq_first"] <= 1 <= r["seq_last"]}
    assert {r["doc_id"] for r in rows} == expect
    # the slice is a contiguous run of the shard stream
    if rows:
        pos = sorted(r["pos_in_shard"] for r in rows)
        assert pos == list(range(pos[0], pos[0] + len(pos)))
