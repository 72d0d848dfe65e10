"""DuckDB oracle SQL for every SQL-expressible engine query.

The driver registers the sf-dir parquet tables as DuckDB views
(``events``, ``documents``, ``embeddings``, ...) and compares each
``queries()[name]`` Spark result against ``oracle_sql()[name]`` by
row-count + schema + order-insensitive value hash. Column names and types
here must match the Spark side exactly.

The core-pipeline oracles rebuild the whole chain (token projection ->
decode -> LOCF merge -> sessionize -> rollups) in portable SQL, generated
from the same templates as the engine (sbse.dialect).
"""

from __future__ import annotations

from sbse.dialect import DUCK, decode_sql, ord_expr, token_table_sql

_EPOCH_MS = DUCK["epoch_ms"]
_SHA = DUCK["sha256"]


def _core_prelude(gap_ms: int) -> str:
    """CTE chain: tokens -> decode -> states -> LOCF merge -> sessionized."""
    tok = token_table_sql(DUCK, "events")
    dec = decode_sql(DUCK, "sbse_tok")
    ord_ = ord_expr(DUCK)
    ts_ms = _EPOCH_MS.format(x="ts")
    prev_ms = _EPOCH_MS.format(x="prev_ts")
    sstart_ms = _EPOCH_MS.format(x="s_start")
    sid = _SHA.format(
        x="concat_ws('|', source, CAST(key AS STRING), "
          f"CAST({sstart_ms} AS STRING), CAST(sidx AS STRING))"
    )
    return f"""
WITH sbse_tok AS ({tok}),
dec AS ({dec}),
st AS (SELECT * FROM dec WHERE ok AND key IS NOT NULL),
o AS (SELECT *, {ord_} AS ord FROM st),
m AS (
  SELECT *,
    COALESCE(last_value(nullif(callsign, '') IGNORE NULLS) OVER w, '') AS callsign_m,
    COALESCE(last_value(nullif(altitude, 0) IGNORE NULLS) OVER w, 0) AS altitude_m,
    COALESCE(last_value(nullif(ground_speed, 0) IGNORE NULLS) OVER w, 0) AS ground_speed_m,
    COALESCE(last_value(nullif(track, 0) IGNORE NULLS) OVER w, 0) AS track_m,
    COALESCE(last_value(nullif(lat, 0) IGNORE NULLS) OVER w, 0) AS lat_m,
    COALESCE(last_value(nullif(lon, 0) IGNORE NULLS) OVER w, 0) AS lon_m,
    COALESCE(last_value(nullif(vertical_rate, 0) IGNORE NULLS) OVER w, 0) AS vertical_rate_m,
    COALESCE(last_value(nullif(squawk, '') IGNORE NULLS) OVER w, '') AS squawk_m
  FROM o
  WINDOW w AS (PARTITION BY source, key ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s1 AS (
  SELECT *, lag(ts) OVER (PARTITION BY source, key ORDER BY ord) AS prev_ts FROM m
),
s2 AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR {ts_ms} - {prev_ms} > {gap_ms}
                 THEN 1 ELSE 0 END AS new_sess
  FROM s1
),
s3 AS (
  SELECT *,
    sum(new_sess) OVER (PARTITION BY source, key ORDER BY ord
                        ROWS UNBOUNDED PRECEDING) AS sidx
  FROM s2
),
s4 AS (
  SELECT *,
    min(ts) OVER (PARTITION BY source, key, sidx) AS s_start,
    max(sidx) OVER (PARTITION BY source, key) AS max_sidx
  FROM s3
),
sess_events AS (
  SELECT *, {sid} AS session_id, (sidx = max_sidx) AS is_trailing FROM s4
)
""".strip()


_SESSION_SELECT = """
SELECT session_id, source, key,
  min(ts) AS started_at,
  {ended_at} AS ended_at,
  count(*) AS n_events,
  max_by(callsign_m, ord) AS callsign,
  min_by(lat_m, ord) AS first_lat,
  min_by(lon_m, ord) AS first_lon,
  max_by(lat_m, ord) AS last_lat,
  max_by(lon_m, ord) AS last_lon,
  max(altitude_m) AS max_altitude,
  max(ground_speed_m) AS max_ground_speed,
  CAST(round_even(max(ground_speed_m), 0) AS BIGINT) AS max_ground_speed_i,
  bool_or(is_trailing) AS is_open
FROM sess_events
GROUP BY session_id, source, key
"""

_ROLLUP_FROM_STATES = """
SELECT source, key, date_trunc('{unit}', ts) AS bucket_start,
  count(*) AS cnt,
  CAST(sum(n_tok) AS BIGINT) AS n_tok_sum,
  min(n_tok) AS n_tok_min,
  max(n_tok) AS n_tok_max,
  min_by(n_tok, ord) AS first_ntok,
  max_by(n_tok, ord) AS last_ntok
FROM o
GROUP BY source, key, date_trunc('{unit}', ts)
"""


def oracles() -> dict[str, str]:
    p30 = _core_prelude(30_000)
    p300 = _core_prelude(300_000)
    q: dict[str, str] = {}

    q["q01_decode"] = (
        f"{p30}\n"
        "SELECT doc_id, source, CAST(n_tok AS INT) AS n_tok, seq, prefix, ok, "
        "CAST(mt_raw AS INT) AS mt_raw, CAST(msg_type AS INT) AS msg_type, ts, "
        "key, callsign, altitude, ground_speed, track, lat, lon, "
        "vertical_rate, squawk, on_ground FROM dec"
    )

    hist = ",\n  ".join(
        f"CAST(sum(CASE WHEN ok AND msg_type = {i} THEN 1 ELSE 0 END) AS BIGINT) AS h{i}"
        for i in range(10)
    )
    q["q02_metrics"] = f"""{p30}
SELECT count(*) AS total_rows,
  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS parsed_rows,
  CAST(sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS failed_rows,
  CAST(sum(CASE WHEN ok AND key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stored_states,
  CAST(count(DISTINCT CASE WHEN ok AND key IS NOT NULL
             THEN concat(source, '|', CAST(key AS STRING)) END) AS BIGINT) AS active_keys,
  {hist}
FROM dec"""

    q["q03_state_final"] = f"""{p30}
SELECT source, key, max(ts) AS last_ts,
  max_by(callsign_m, ord) AS callsign,
  max_by(altitude_m, ord) AS altitude,
  max_by(ground_speed_m, ord) AS ground_speed,
  max_by(track_m, ord) AS track,
  max_by(lat_m, ord) AS lat,
  max_by(lon_m, ord) AS lon,
  max_by(vertical_rate_m, ord) AS vertical_rate,
  max_by(squawk_m, ord) AS squawk,
  max_by(on_ground, ord) AS on_ground,
  count(*) AS n_states
FROM m GROUP BY source, key"""

    q["q04_sessions_gap30"] = p30 + _SESSION_SELECT.format(ended_at="max(ts)")
    # q34 is the monster-key-safe chunked engine path; its contract is exact
    # equality with the plain window path, so its oracle IS q04's SQL.
    q["q34_sessions_bigkey"] = q["q04_sessions_gap30"]
    q["q05_sessions_gap300"] = p300 + _SESSION_SELECT.format(ended_at="max(ts)")

    # Reset-aware counter increase (PromQL increase() analog): the lag
    # chain is global per (source, key); buckets sum the contributions.
    # q41 = hourly from raw; q42's engine path goes THROUGH the mergeable
    # hourly tier (counter_cascade), while its oracle computes the day
    # grain directly from raw — equality proves lossless tier merging.
    _COUNTER_INC = """
SELECT source, key, bucket_start,
  count(*) AS n_samples,
  CAST(sum(CASE WHEN prev_tok IS NULL THEN 0
                WHEN n_tok >= prev_tok THEN n_tok - prev_tok
                ELSE n_tok END) AS BIGINT) AS tok_increase,
  CAST(sum(CASE WHEN prev_tok IS NOT NULL AND n_tok < prev_tok
                THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
FROM (
  SELECT source, key, date_trunc('{unit}', ts) AS bucket_start, n_tok,
    lag(n_tok) OVER (PARTITION BY source, key ORDER BY ord) AS prev_tok
  FROM o
)
GROUP BY source, key, bucket_start"""
    q["q41_counter_increase"] = p30 + _COUNTER_INC.format(unit="hour")
    q["q42_counter_cascade"] = p30 + _COUNTER_INC.format(unit="day")
    # q43 is the monster-key chunked engine path; its contract is exact
    # equality with the plain window path, so its oracle IS q41's SQL.
    q["q43_counter_bigkey"] = q["q41_counter_increase"]

    q["q06_rollup_1m"] = p30 + _ROLLUP_FROM_STATES.format(unit="minute")
    q["q07_rollup_1h"] = p30 + _ROLLUP_FROM_STATES.format(unit="hour")
    q["q08_rollup_1d"] = p30 + _ROLLUP_FROM_STATES.format(unit="day")

    q["q09_gapfill_1h"] = f"""{p30},
r AS ({_ROLLUP_FROM_STATES.format(unit="hour")}),
k AS (SELECT source, key, min(bucket_start) AS b0, max(bucket_start) AS b1
      FROM r GROUP BY source, key),
spine AS (SELECT source, key,
            unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket_start
          FROM k),
j AS (SELECT s.source, s.key, s.bucket_start, r.cnt, r.n_tok_sum, r.last_ntok
      FROM spine s LEFT JOIN r USING (source, key, bucket_start))
SELECT source, key, bucket_start,
  COALESCE(cnt, 0) AS cnt,
  COALESCE(n_tok_sum, 0) AS n_tok_sum,
  (cnt IS NULL) AS is_gap,
  last_value(last_ntok IGNORE NULLS) OVER (
    PARTITION BY source, key ORDER BY bucket_start
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ntok_locf
FROM j"""

    # Retention: keep only buckets younger than the horizon (analog of
    # TimescaleDB add_retention_policy chunk drops, migrations/002:7-11).
    q["q10_retention_1h"] = f"""{p30},
r AS ({_ROLLUP_FROM_STATES.format(unit="hour")}),
mx AS (SELECT max(bucket_start) AS bmax FROM r)
SELECT r.* FROM r, mx WHERE r.bucket_start >= mx.bmax - INTERVAL 240 HOUR"""

    # Validation gate (tracker main.go:118-123): broadcast dim of valid keys;
    # here the dim is the deterministic rule key % 10 <> 7.
    q["q11_validation_gate"] = f"""{p30}
SELECT source, count(*) AS cnt, CAST(sum(n_tok) AS BIGINT) AS n_tok_sum
FROM st WHERE key % 10 <> 7 GROUP BY source"""

    # Active sessions (flights WHERE ended_at IS NULL, db/client.go:32-63):
    # with close_trailing=false only trailing sessions stay open.
    q["q12_active_sessions"] = f"""{p30}
SELECT session_id, source, key, min(ts) AS started_at, count(*) AS n_events
FROM sess_events WHERE is_trailing GROUP BY session_id, source, key"""

    # Daily raw-archive partitions (logger daily files, cmd/logger/main.go:122-231).
    q["q13_archive_daily"] = f"""{p30}
SELECT date_trunc('day', ts) AS log_date, source,
  count(*) AS cnt, CAST(sum(n_tok) * 4 AS BIGINT) AS raw_bytes
FROM dec WHERE ts IS NOT NULL GROUP BY date_trunc('day', ts), source"""

    # J1 re-attribution: interval join of states to session ranges.
    q["q15_interval_join"] = f"""{p30},
sess AS ({_SESSION_SELECT.format(ended_at="max(ts)")})
SELECT s.session_id, count(*) AS n_attributed
FROM o e JOIN sess s
  ON e.source = s.source AND e.key = s.key
 AND e.ts BETWEEN s.started_at AND s.ended_at
GROUP BY s.session_id"""

    # As-of join: latest session open at-or-before each state's ts.
    q["q16_asof_join"] = f"""{p30},
sess AS ({_SESSION_SELECT.format(ended_at="max(ts)")})
SELECT e.doc_id, max(s.started_at) AS asof_session_start
FROM o e JOIN sess s
  ON e.source = s.source AND e.key = s.key AND s.started_at <= e.ts
GROUP BY e.doc_id"""

    # Metrics range scan (GetSystemStats BETWEEN, db/client.go:167-257).
    q["q14_range_scan"] = f"""{p30}
SELECT key, count(*) AS cnt, max(altitude_m) AS max_altitude
FROM m
WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' AND TIMESTAMP '2024-01-05 00:00:00'
GROUP BY key"""

    # Clamp semantics (q17): DuckDB computes the pre-clamp values in
    # HUGEINT (exact, like Spark's decimal(38,0)), clamps with LEAST/GREATEST
    # and casts back — identical math to metrics.clamp_u64/clamp_read.
    i64max = "9223372036854775807"
    q["q17_metrics_clamped"] = f"""{p30}
SELECT source, count(*) AS cnt,
  CAST(LEAST(CAST(sum(n_tok) AS HUGEINT) * CAST({1 << 48} AS HUGEINT),
             CAST({i64max} AS HUGEINT)) AS BIGINT) AS tok_scaled_clamped,
  CAST(LEAST(CAST('9223372036854775808' AS HUGEINT),
             CAST({i64max} AS HUGEINT)) AS BIGINT) AS clamp_over_edge,
  CAST(LEAST(CAST({i64max} AS HUGEINT),
             CAST({i64max} AS HUGEINT)) AS BIGINT) AS clamp_max_identity,
  CAST(GREATEST(0, 0) AS BIGINT) AS clamp_zero_edge,
  CAST(GREATEST(CAST(min(n_tok) - 1000000 AS BIGINT), 0) AS BIGINT)
    AS neg_gauge_read
FROM st GROUP BY source"""

    # Desc-ordered range scan (q18): LIMIT under a deterministic total order
    # (ts desc, doc_id asc) — the compare is set-wise, the order pins the set.
    q["q18_recent_states"] = f"""{p30}
SELECT doc_id, source, key, ts, altitude_m
FROM m ORDER BY ts DESC, doc_id ASC LIMIT 100"""

    # Gorilla round-trip: the engine encodes the 1h tier into blobs and
    # decodes it back; the oracle is the plain rollup (value as double) —
    # matching hashes prove the codec is lossless inside the engine.
    q["q19_gorilla_roundtrip"] = f"""{p30}
SELECT source, key, date_trunc('hour', ts) AS bucket_start,
  CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE) AS n_tok_sum
FROM o GROUP BY source, key, date_trunc('hour', ts)"""

    # Exact per-bucket quantiles by integer rank selection (q33) — mirrors
    # queries.q33_rollup_quantiles; // is DuckDB's integer division (Spark
    # DIV). Value-at-rank is tie-order-invariant, so no secondary sort key
    # is needed.
    q["q33_rollup_quantiles"] = f"""{p30},
base AS (
  SELECT source, date_trunc('hour', ts) AS bucket_start, n_tok FROM st
),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY source, bucket_start ORDER BY n_tok) AS rn,
    count(*) OVER (PARTITION BY source, bucket_start) AS cnt
  FROM base
)
SELECT source, bucket_start, count(*) AS cnt,
  max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN n_tok END) AS ntok_p50,
  max(CASE WHEN rn = (19 * (cnt - 1)) // 20 + 1 THEN n_tok END) AS ntok_p95
FROM r GROUP BY source, bucket_start"""

    # q35: the engine cascades mergeable value-frequency sketches 1m -> 1h;
    # the oracle computes the same per-(source, key, hour) quantiles
    # straight from states with q33's integer rank math — equality proves
    # the sketch cascade is lossless.
    q["q35_quantile_cascade"] = f"""{p30},
base AS (
  SELECT source, key, date_trunc('hour', ts) AS bucket_start, n_tok FROM st
),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY source, key, bucket_start ORDER BY n_tok) AS rn,
    count(*) OVER (PARTITION BY source, key, bucket_start) AS cnt
  FROM base
)
SELECT source, key, bucket_start, count(*) AS cnt,
  max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN n_tok END) AS ntok_p50,
  max(CASE WHEN rn = (19 * (cnt - 1)) // 20 + 1 THEN n_tok END) AS ntok_p95
FROM r GROUP BY source, key, bucket_start"""

    q.update(_datapipe_oracles())
    return q


def _frame_sample_oracle(n_frames: int = 4, frame_bytes: int = 64) -> str:
    """q32: uniform frame sampling with EXACT integer half-up index
    selection — mirrors multimodal.sample_frames. The engine slices binary
    payloads; the corpus is ASCII so slicing the VARCHAR text yields the
    same bytes, and md5(varchar) == md5(blob) over them."""
    fb = frame_bytes
    return f"""
WITH d AS (
  SELECT doc_id, text, length(text) // {fb} AS total FROM documents
),
k AS (
  SELECT doc_id, text, total, LEAST({n_frames}, total) AS take
  FROM d WHERE total >= 1
),
idx AS (
  SELECT doc_id, text, total,
    CASE WHEN take = 1 THEN 0
         ELSE (2 * i * (total - 1) + (take - 1)) // (2 * (take - 1)) END
      AS frame_idx
  FROM k, unnest(generate_series(0, take - 1)) AS g(i)
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
  CAST(total AS BIGINT) AS n_frames_total,
  md5(substring(text, CAST(frame_idx * {fb} + 1 AS BIGINT), {fb}))
    AS frame_md5
FROM idx"""


# ---------------------------------------------------------------------------
# Training-data pipeline oracles (documents / embeddings tables).
# ---------------------------------------------------------------------------

def _datapipe_oracles() -> dict[str, str]:
    q: dict[str, str] = {}

    q["q20_dedup_exact"] = """
SELECT md5(text) AS text_hash,
  min(doc_id) AS keeper_doc_id,
  count(*) AS n_copies,
  CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM documents GROUP BY md5(text)"""

    # Word 3-gram shingles + exact Jaccard on candidate pairs that share at
    # least one shingle within the same lang. Shingles with document
    # frequency > 1000 are dropped (identical cap engine-side:
    # dedup.cap_shingle_df — bounds the self-join group sizes at scale).
    shingles = """
w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id, lang,
    concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS shingle
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
),
shd AS (SELECT shingle, count(*) AS sh_df FROM sh0 GROUP BY shingle),
sh AS (SELECT sh0.* FROM sh0 JOIN shd USING (shingle) WHERE sh_df <= 1000),
card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
"""
    q["q21_ngram_jaccard"] = f"""WITH {shingles},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
       AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
  CAST(p.inter AS DOUBLE) / (ca.n_sh + cb.n_sh - p.inter) AS jaccard
FROM pairs p JOIN card ca ON p.doc_a = ca.doc_id
             JOIN card cb ON p.doc_b = cb.doc_id
WHERE CAST(p.inter AS DOUBLE) / (ca.n_sh + cb.n_sh - p.inter) >= 0.2"""

    # MinHash (lexicographic md5-min per seed) + 4x2 LSH bands; candidates =
    # pairs sharing a band; verified with exact Jaccard >= 0.2.
    mh_cols = ", ".join(
        f"min(md5(concat(CAST({s} AS STRING), '|', shingle))) AS mh{s}"
        for s in range(8)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5(concat(mh{2*b}, mh{2*b+1})) AS band "
        f"FROM sig" for b in range(4)
    )
    q["q22_minhash_lsh"] = f"""WITH {shingles},
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band = b.band AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
  CAST(i.inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.inter) AS jaccard
FROM inter i JOIN card ca ON i.doc_a = ca.doc_id
             JOIN card cb ON i.doc_b = cb.doc_id
WHERE CAST(i.inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.inter) >= 0.2"""

    # Embedding near-duplicate pairs: exact cosine via ordered fold; ids only
    # (floats kept out of the hashed output; threshold margin asserted in
    # tests).
    q["q24_embedding_neardup"] = """
WITH n AS (
  SELECT vec_id, embedding AS e,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.e, b.e),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (a.nrm * b.nrm) >= 0.4"""

    # SimHash64 — word bits from md5 hex digits (bit b = bit (b%4) of digit
    # b//4 of md5(word)[:16]), pure integer arithmetic, so the DuckDB mirror
    # is bit-exact (see dedup.simhash64). Bit 63 is the int64 min literal;
    # disjoint bits make addition == OR.
    digit_cols = ",\n    ".join(
        f"strpos('0123456789abcdef', substr(m16, {i + 1}, 1)) - 1 AS d{i}"
        for i in range(16)
    )
    vote_cols = ",\n    ".join(
        f"sum(CAST(floor(d{b // 4} / {1 << (b % 4)}) AS INT) % 2) AS s{b}"
        for b in range(64)
    )
    sim_terms = " + ".join(
        f"(CASE WHEN 2*s{b} > nw THEN CAST({(1 << b) if b < 63 else '-9223372036854775807 - 1'} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(64)
    )
    simhash_sql = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
d AS (SELECT doc_id, substr(md5(word), 1, 16) AS m16 FROM w),
dg AS (
  SELECT doc_id,
    {digit_cols}
  FROM d
),
v AS (
  SELECT doc_id, count(*) AS nw,
    {vote_cols}
  FROM dg GROUP BY doc_id
)
SELECT doc_id, CAST({sim_terms} AS BIGINT) AS simhash FROM v"""
    q["q23_simhash"] = simhash_sql

    # SimHash band candidates (q30): 8 width-8 bands. Band extraction
    # `(simhash >> s) & 255` is portable: DuckDB's >> is arithmetic, but the
    # mask keeps only the low 8 bits of the shifted value, which are
    # identical under arithmetic and logical shift for s > 0 (and for s = 56
    # the masked byte IS the top byte) — matching Spark's
    # shiftrightunsigned + bitwiseAND. xor/bit_count are two's-complement in
    # both engines (bit_count(-1) = 64 in each).
    n_sim_bands, sim_width = 8, 8
    sim_mask = (1 << sim_width) - 1
    sim_band_union = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_id, "
        f"(simhash >> {b * sim_width}) & {sim_mask} AS band FROM s"
        for b in range(n_sim_bands)
    )
    q["q30_simhash_candidates"] = f"""
WITH s AS ({simhash_sql}),
banded AS ({sim_band_union}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 7"""

    # Multi-block simhash candidates (q36): the engine's C(10,3)-table
    # banding is pigeonhole-COMPLETE for hamming <= 7, so its output is
    # exactly the radius-7 pair set — the oracle is the brute-force pair
    # scan, deliberately NOT mirroring the banding: equality proves the
    # completeness claim, not just that two implementations of the same
    # bucketing agree.
    q["q36_simhash_multiblock"] = f"""
WITH s AS ({simhash_sql})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 7"""

    # Language heuristic — same stopword tables (text.LANG_WORDS), same
    # left-to-right score sums, same greatest + explicit en > de > es
    # tie priority as the engine.
    from sbse.datapipe.text import LANG_WORDS

    score_sql = {}
    for lang, words in LANG_WORDS.items():
        terms = [
            f"(length(text) - length(replace(text, ' {w} ', ''))) / {len(w) + 2}"
            for w in words
        ]
        score_sql[lang] = "(" + " + ".join(terms) + ")"
    best = "greatest(" + ", ".join(score_sql[lg] for lg in LANG_WORDS) + ")"
    prio = " ".join(
        f"WHEN {score_sql[lg]} = best THEN '{lg}'" for lg in LANG_WORDS
    )
    q["q29_lang_guess"] = f"""
WITH s AS (SELECT doc_id, lang, text, {best} AS best FROM documents)
SELECT doc_id, lang,
  CASE WHEN best <= 0 THEN 'und' {prio} ELSE 'und' END AS lang_guess
FROM s"""

    # ANN top-k via MULTI-BAND hyperplane LSH — the SAME md5-derived ±1
    # plane rows as the engine (sbse.datapipe.similarity.band_plane_signs),
    # ordered folds for projections/cosines, candidates = DISTINCT pairs
    # sharing ANY band's bucket, row_number tiebreak on vec_id. Bucket ids
    # and ranks are therefore bit-identical across engines.
    from sbse.datapipe.similarity import band_plane_signs

    n_planes, n_bands, dim, k = 6, 3, 64, 5
    bands = band_plane_signs(n_planes, n_bands, dim)
    bucket_cols = []
    for b in range(n_bands):
        plane_terms = []
        for p in range(n_planes):
            arr = "[" + ", ".join(f"{float(s):.1f}" for s in bands[b][p]) + "]"
            comp = (
                f"list_sum(list_transform(list_zip(embedding, {arr}), "
                f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
            )
            plane_terms.append(f"(CASE WHEN {comp} > 0 THEN {1 << p} ELSE 0 END)")
        bucket_cols.append(" + ".join(plane_terms) + f" AS bucket{b}")
    buckets = ",\n    ".join(bucket_cols)
    band_union = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_id, bucket{b} AS bucket FROM n"
        for b in range(n_bands)
    )
    q["q26_ann_topk"] = f"""
WITH n AS (
  SELECT vec_id, embedding AS e,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm,
    {buckets}
  FROM embeddings
),
bands AS ({band_union}),
cand AS (
  SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS neighbor_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
)
SELECT q_id, neighbor_id, rank FROM (
  SELECT c.q_id, c.neighbor_id,
    CAST(row_number() OVER (
      PARTITION BY c.q_id
      ORDER BY (list_sum(list_transform(list_zip(qa.e, nb.e),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                / (qa.nrm * nb.nrm)) DESC, c.neighbor_id ASC) AS INT) AS rank
  FROM cand c JOIN n qa ON qa.vec_id = c.q_id
              JOIN n nb ON nb.vec_id = c.neighbor_id
) WHERE rank <= {k}"""

    # IVF probe ANN (q31) — same deterministic centroid sampling
    # (md5(vec_id) order), same ordered-fold cosines for assignment and
    # ranking, same (cos DESC, id ASC) tie-breaks as the engine — so cells,
    # probes and ranks are bit-identical across engines.
    ivf_cells, ivf_nprobe, ivf_k = 16, 2, 5
    fold = ("list_sum(list_transform(list_zip({a}, {b}), "
            "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")
    q["q31_ann_ivf"] = f"""
WITH n AS (
  SELECT vec_id, embedding AS e,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
),
co AS (
  SELECT vec_id AS cvid, e AS ce, nrm AS cn
  FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ivf_cells}
),
c AS (
  SELECT *, CAST(row_number() OVER (
    ORDER BY md5(CAST(cvid AS VARCHAR)), cvid) - 1 AS INT) AS cell
  FROM co
),
asg AS (
  SELECT v.vec_id, v.e, v.nrm, c.cell,
    row_number() OVER (
      PARTITION BY v.vec_id
      ORDER BY ({fold.format(a='v.e', b='c.ce')} / (v.nrm * c.cn)) DESC,
               c.cell ASC) AS rn
  FROM n v CROSS JOIN c
),
home AS (SELECT vec_id, e, nrm, cell FROM asg WHERE rn = 1),
probe AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
          FROM asg WHERE rn <= {ivf_nprobe})
SELECT q_id, neighbor_id, rank FROM (
  SELECT p.q_id, h.vec_id AS neighbor_id,
    CAST(row_number() OVER (
      PARTITION BY p.q_id
      ORDER BY ({fold.format(a='p.qe', b='h.e')} / (p.qn * h.nrm)) DESC,
               h.vec_id ASC) AS INT) AS rank
  FROM probe p JOIN home h ON h.cell = p.cell AND h.vec_id <> p.q_id
) WHERE rank <= {ivf_k}"""

    # Text quality / language heuristics + token counting. The BPE-ish
    # tokenizer regex is imported from text.py (single source of truth,
    # shared with the q40 packing oracle below).
    from sbse.datapipe.text import BPE_ISH_RE

    q["q25_text_quality"] = f"""
SELECT doc_id, lang, source,
  length(text) AS n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words_ws,
  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS BIGINT) AS n_bpe_ish,
  CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS n_the,
  CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
  (length(text) BETWEEN 100 AND 500
   AND len(string_split(text, ' ')) >= 20) AS quality_pass
FROM documents"""

    # Rolling-hash document fingerprint — same 32-bit polynomial window hash
    # as text.doc_fingerprint (exact int64 arithmetic on both engines;
    # corpus texts are ASCII so ascii(char) == utf-8 byte, and every doc is
    # longer than the window so the short-doc fallback never fires).
    from sbse.datapipe.text import FP_MOD, FP_WINDOW, fp_powers

    P = fp_powers(FP_WINDOW)
    terms = " + ".join(
        f"CAST(ascii(substr(text, i + {t}, 1)) AS BIGINT) * {P[t]}"
        for t in range(FP_WINDOW)
    )
    q["q27_doc_fingerprint"] = f"""
WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
win AS (
  SELECT doc_id, ({terms}) % {FP_MOD} AS h
  FROM d, unnest(generate_series(1, L - {FP_WINDOW - 1})) AS t(i)
)
SELECT doc_id, CAST(min(h) AS BIGINT) AS fingerprint FROM win GROUP BY doc_id"""

    # Multimodal binary plumbing: byte-level features computed Spark-side via
    # Arrow mapInPandas over binary payloads; oracle recomputes from chars
    # (texts are ASCII, so code point == byte).
    q["q28_multimodal_features"] = """
WITH s AS (
  SELECT doc_id, CAST(sum(ascii(substr(text, i, 1))) AS BIGINT) AS byte_sum
  FROM documents, unnest(generate_series(1, length(text))) AS t(i)
  GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(length(d.text) AS BIGINT) AS n_bytes,
  s.byte_sum,
  CAST(s.byte_sum % 997 AS BIGINT) AS fake_feature
FROM documents d JOIN s USING (doc_id)"""

    q["q32_frame_sample"] = _frame_sample_oracle()

    # Curation ops (sbse.datapipe.curate) — contamination screen, shuffle-
    # shard, stratified sample. Constants mirrored from curate.py.
    from sbse.datapipe.curate import (
        BENCH_STRIDE, CONTAM_NGRAM, DEFAULT_RATE, STRATA_RATES, _rate_hex4,
    )

    ng = CONTAM_NGRAM
    gram_cols = " || ' ' || ".join(f"ws[i+{t}]" for t in range(ng))
    q["q37_contamination"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, {gram_cols} AS shingle
  FROM w, unnest(generate_series(1, len(ws) - {ng - 1})) AS t(i)
),
bg AS (SELECT DISTINCT shingle FROM g WHERE doc_id % {BENCH_STRIDE} = 0),
cg AS (SELECT * FROM g WHERE doc_id % {BENCH_STRIDE} <> 0),
s AS (
  SELECT cg.doc_id, count(*) AS n_grams,
    CAST(count(bg.shingle) AS BIGINT) AS n_hits
  FROM cg LEFT JOIN bg USING (shingle) GROUP BY cg.doc_id
)
SELECT doc_id, n_grams, n_hits,
  CAST(n_hits AS DOUBLE) / n_grams AS contam_frac,
  (CAST(n_hits AS DOUBLE) / n_grams) >= 0.05 AS contaminated
FROM s"""

    q["q38_shuffle_shard"] = """
WITH d AS (
  SELECT doc_id,
    md5(concat('shard|', CAST(doc_id AS VARCHAR))) AS shuffle_key
  FROM documents
),
s AS (
  SELECT doc_id, shuffle_key,
    CAST(strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1 AS INT)
      AS shard_id
  FROM d
)
SELECT doc_id, shuffle_key, shard_id,
  CAST(row_number() OVER (
    PARTITION BY shard_id ORDER BY shuffle_key, doc_id) AS BIGINT)
    AS pos_in_shard
FROM s"""

    rate_case = " ".join(
        f"WHEN '{lang}' THEN CAST({r} AS DOUBLE)"
        for lang, r in STRATA_RATES.items()
    )
    thresh_case = " ".join(
        f"WHEN '{lang}' THEN '{_rate_hex4(r)}'"
        for lang, r in STRATA_RATES.items()
    )
    q["q39_stratified_sample"] = f"""
WITH d AS (
  SELECT doc_id, lang, source,
    substr(md5(concat('samp|', CAST(doc_id AS VARCHAR))), 1, 4) AS samp_hex,
    CASE lang {rate_case} ELSE CAST({DEFAULT_RATE} AS DOUBLE) END AS rate,
    CASE lang {thresh_case} ELSE '{_rate_hex4(DEFAULT_RATE)}' END AS thresh
  FROM documents
)
SELECT doc_id, lang, source, samp_hex, rate
FROM d WHERE samp_hex < thresh"""

    q["q40_pack_sequences"] = f"""
WITH d AS (
  SELECT doc_id,
    md5(concat('shard|', CAST(doc_id AS VARCHAR))) AS shuffle_key,
    CAST(len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS BIGINT) AS n_tok
  FROM documents
),
s AS (
  SELECT doc_id, shuffle_key, n_tok,
    CAST(strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1 AS INT)
      AS shard_id
  FROM d
),
p AS (
  SELECT doc_id, shard_id,
    CAST(row_number() OVER w AS BIGINT) AS pos_in_shard,
    n_tok,
    CAST(sum(n_tok) OVER (
      PARTITION BY shard_id ORDER BY shuffle_key, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS BIGINT)
      AS start_offset
  FROM s
  WINDOW w AS (PARTITION BY shard_id ORDER BY shuffle_key, doc_id)
)
SELECT doc_id, shard_id, pos_in_shard, n_tok, start_offset,
  CAST(start_offset // 512 AS BIGINT) AS seq_first,
  CAST((start_offset + greatest(n_tok, 1) - 1) // 512 AS BIGINT) AS seq_last
FROM p"""

    # End-to-end curation chain (q44): quality gate -> exact dedup keeper ->
    # contamination drop (benchmark docs dropped too) -> stratified sample
    # -> packing manifest, mirroring curate.curation_pipeline stage for
    # stage over the SAME constants bound above.
    q["q44_curation_e2e"] = f"""
WITH base AS (
  SELECT * FROM documents
  WHERE length(text) BETWEEN 100 AND 500
    AND len(string_split(text, ' ')) >= 20
),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
      AS rn
    FROM base
  ) WHERE rn = 1
),
w44 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
g44 AS (
  SELECT DISTINCT doc_id, {gram_cols} AS shingle
  FROM w44, unnest(generate_series(1, len(ws) - {ng - 1})) AS t(i)
),
bg44 AS (SELECT DISTINCT shingle FROM g44 WHERE doc_id % {BENCH_STRIDE} = 0),
cg44 AS (SELECT * FROM g44 WHERE doc_id % {BENCH_STRIDE} <> 0),
flagged AS (
  SELECT cg44.doc_id
  FROM cg44 LEFT JOIN bg44 USING (shingle)
  GROUP BY cg44.doc_id
  HAVING CAST(count(bg44.shingle) AS DOUBLE) / count(*) >= 0.05
),
corpus AS (
  SELECT k.* FROM kept k
  WHERE k.doc_id % {BENCH_STRIDE} <> 0
    AND k.doc_id NOT IN (SELECT doc_id FROM flagged)
),
sampled AS (
  SELECT * FROM (
    SELECT *,
      substr(md5(concat('samp|', CAST(doc_id AS VARCHAR))), 1, 4)
        AS samp_hex,
      CASE lang {thresh_case} ELSE '{_rate_hex4(DEFAULT_RATE)}' END
        AS thresh
    FROM corpus
  ) WHERE samp_hex < thresh
),
d44 AS (
  SELECT doc_id,
    md5(concat('shard|', CAST(doc_id AS VARCHAR))) AS shuffle_key,
    CAST(len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS BIGINT) AS n_tok
  FROM sampled
),
s44 AS (
  SELECT doc_id, shuffle_key, n_tok,
    CAST(strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1 AS INT)
      AS shard_id
  FROM d44
),
p44 AS (
  SELECT doc_id, shard_id,
    CAST(row_number() OVER w AS BIGINT) AS pos_in_shard,
    n_tok,
    CAST(sum(n_tok) OVER (
      PARTITION BY shard_id ORDER BY shuffle_key, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS BIGINT)
      AS start_offset
  FROM s44
  WINDOW w AS (PARTITION BY shard_id ORDER BY shuffle_key, doc_id)
)
SELECT doc_id, shard_id, pos_in_shard, n_tok, start_offset,
  CAST(start_offset // 512 AS BIGINT) AS seq_first,
  CAST((start_offset + greatest(n_tok, 1) - 1) // 512 AS BIGINT) AS seq_last
FROM p44"""

    return q
