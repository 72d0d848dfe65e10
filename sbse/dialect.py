"""Dialect-shimmed SQL shared between the Spark engine and the DuckDB oracle.

Two pieces of SQL must be *textually generated from one template* so the
driver's Spark-vs-DuckDB correctness gate compares identical computations:

1. the deterministic token-table projection (events parquet -> the engine's
   canonical input shape ``doc_id, tokens:array<int32>, n_tok, source``), and
2. the SBS-1-style decode over token arrays (the re-target of
   reference parser.go:32-211, including its +1-shifted field indexes —
   SURVEY.md §1.3 / §7.1).

Everything here is plain ANSI-ish SQL with a tiny shim table for the handful
of functions the dialects name differently.
"""

from __future__ import annotations

from sbse import EPOCH0_S, SENTINEL

SPARK = {
    "name": "spark",
    "epoch_s": "unix_timestamp({x})",          # seconds, floor
    "epoch_ms": "unix_millis({x})",
    "arr": "array",
    "slice": "slice",
    "tok": "try_element_at(tokens, {i})",      # 1-based, NULL out of bounds
    "ts_from_ms": "timestamp_millis({x})",
    "sha256": "sha2({x}, 256)",
}

DUCK = {
    "name": "duckdb",
    "epoch_s": "CAST(floor(epoch({x})) AS BIGINT)",
    "epoch_ms": "epoch_ms({x})",
    "arr": "list_value",
    "slice": "list_slice",
    "tok": "list_extract(tokens, {i})",        # 1-based, NULL out of bounds
    "ts_from_ms": "make_timestamp(({x}) * 1000)",
    "sha256": "sha256({x})",
}


def tok(d: dict, i0: int) -> str:
    """Accessor for the 0-based token index ``i0`` (CSV field i0, §1.3)."""
    return d["tok"].format(i=i0 + 1)


# ---------------------------------------------------------------------------
# Token table: deterministic projection of the harness `events` table into the
# engine's input shape. The row mix mirrors FIXTURES.md F1 (MSG/STA/ID blend,
# malformed arity, invalid msg types, keep-zero sentinels, skewed source).
# ---------------------------------------------------------------------------

def token_table_sql(d: dict, events_rel: str = "events") -> str:
    """SELECT producing (doc_id, tokens, n_tok, source) from ``events_rel``.

    Token layout (0-based index = SBS CSV field, SURVEY.md §7.1):
      t0 prefix-class (mod 4: 0 MSG, 1 STA, 2 AIR, 3 ID)   t1 msg_type
      t2 event seconds since 2023-01-01Z                    t3 millis
      t4 key (STA/AIR/ID path)                              t5 key (MSG path)
      t9 callsign (STA path)     t11 callsign   t12 altitude t13 ground_speed
      t14 track  t15 lat  t16 lon  t17 vertical_rate  t18 squawk  t22 on_ground
    """
    base = (
        f"SELECT event_id AS i, value AS v, user_id AS u, "
        f"{d['epoch_s'].format(x='ts')} AS s0 FROM {events_rel}"
    )
    return f"""
SELECT
  concat('d', lpad(CAST(i AS STRING), 12, '0')) AS doc_id,
  {d['slice']}(
    {d['arr']}(
      CAST(CASE WHEN m = 98 THEN 1 WHEN m = 99 THEN 3 ELSE (i % 2) * 4 END AS INT),
      CAST(mt AS INT),
      CAST(secs AS INT),
      CAST(i % 1000 AS INT),
      CAST(k AS INT),
      CAST(k AS INT),
      CAST(i % 7 AS INT),
      CAST(i % 13 AS INT),
      0,
      CAST(1000 + i % 9000 AS INT),
      0,
      CAST(CASE WHEN i % 17 = 0 THEN 0 ELSE 1000 + i % 9000 END AS INT),
      CAST(CASE WHEN i % 25 = 0 THEN {SENTINEL} WHEN i % 11 = 0 THEN 0 ELSE a % 40000 END AS INT),
      CAST(CASE WHEN i % 23 = 0 THEN {SENTINEL} ELSE a % 600 END AS INT),
      CAST(a % 360 AS INT),
      CAST(CASE WHEN i % 11 = 0 THEN 0 ELSE a % 180 - 90 END AS INT),
      CAST(a % 360 - 180 AS INT),
      CAST(a % 4000 - 2000 AS INT),
      CAST(a % 10000 AS INT),
      0, 0, 0,
      CAST(CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END AS INT)
    ), 1, n_tok) AS tokens,
  CAST(n_tok AS INT) AS n_tok,
  concat('src-0', CAST(CASE WHEN i % 2 = 0 THEN 0 ELSE i % 7 + 1 END AS STRING)) AS source
FROM (
  SELECT i, m, a, k, secs,
    CASE WHEN m < 70 THEN 8 WHEN m < 80 THEN 4 WHEN m < 84 THEN 5 WHEN m < 88 THEN 6
         WHEN m < 90 THEN 7 WHEN m < 92 THEN 3 WHEN m < 94 THEN 1 WHEN m < 95 THEN 2
         WHEN m < 97 THEN 8 WHEN m < 98 THEN 99 ELSE 5 END AS mt,
    CASE WHEN m < 70 THEN (CASE WHEN i % 3 = 0 THEN 22 ELSE 23 END)
         WHEN m < 95 THEN 23 WHEN m < 97 THEN 12 WHEN m < 98 THEN 23 ELSE 10 END AS n_tok
  FROM (
    SELECT i, i % 100 AS m, abs(CAST(floor(v * 10) AS BIGINT)) AS a,
           u % 100 AS k, s0 - {EPOCH0_S} AS secs
    FROM ({base}) AS base_rows
  ) AS attrs
) AS shaped
""".strip()


# ---------------------------------------------------------------------------
# Decode: the SBS-1-style field extraction over token arrays.
# Re-target of /root/reference/internal/parser/parser.go:32-211 — preserving:
#   * prefix dispatch MSG/STA/AIR/ID (parser.go:44-78),
#   * arity rules (MSG >= 22 fields parser.go:47-49; STA/AIR/ID >= 10 :54-56),
#   * msg_type validity 1..12 (parser.go:81-84,141-142),
#   * the +1-shifted field indexes (parser.go:103-197; SURVEY.md §1.3),
#   * keep-zero on unparseable numerics — SENTINEL token (parser.go:150-193),
#   * squawk %04d zero-padding without truncation (parser.go:184-186),
#   * MSG types 1,2 produce no key (parser.go:103-110),
#   * STA/AIR/ID early-return with msg_type 10/11/12 (parser.go:200-211).
# ---------------------------------------------------------------------------

def decode_sql(d: dict, token_rel: str) -> str:
    def fz(i0: int) -> str:  # sentinel -> keep zero
        t = tok(d, i0)
        return f"(CASE WHEN {t} = {SENTINEL} THEN 0 ELSE COALESCE({t}, 0) END)"

    def cs(i0: int) -> str:  # callsign: zero-value token -> '' (Go zero string)
        t = tok(d, i0)
        return (
            f"(CASE WHEN COALESCE({t}, 0) IN (0, {SENTINEL}) THEN '' "
            f"ELSE CAST({t} AS STRING) END)"
        )

    sq = tok(d, 18)
    sq_str = f"CAST({sq} AS STRING)"
    return f"""
WITH sbse_b AS (
  SELECT doc_id, source, tokens, n_tok,
    CAST(substr(doc_id, 2) AS BIGINT) AS seq,
    COALESCE({tok(d, 0)}, 0) % 4 AS pc,
    {tok(d, 1)} AS mt_raw,
    {tok(d, 2)} AS t_secs,
    COALESCE({tok(d, 3)}, 0) AS t_ms
  FROM {token_rel}
),
sbse_c AS (
  SELECT *,
    CASE WHEN pc = 0 THEN 'MSG' WHEN pc = 1 THEN 'STA' WHEN pc = 2 THEN 'AIR' ELSE 'ID' END AS prefix,
    CASE WHEN pc = 0 THEN (n_tok >= 22 AND mt_raw BETWEEN 1 AND 12) ELSE n_tok >= 10 END AS ok,
    CASE WHEN pc = 0 THEN mt_raw WHEN pc = 1 THEN 10 WHEN pc = 2 THEN 11 ELSE 12 END AS mt
  FROM sbse_b
)
SELECT
  doc_id, source, tokens, CAST(n_tok AS INT) AS n_tok, seq, prefix, ok,
  CAST(mt_raw AS INT) AS mt_raw,
  CASE WHEN ok THEN CAST(mt AS INT) END AS msg_type,
  CASE WHEN t_secs IS NOT NULL THEN {d['ts_from_ms'].format(x=f'(CAST({EPOCH0_S} AS BIGINT) + t_secs) * 1000 + t_ms')} END AS ts,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt IN (1, 2) THEN NULL
       WHEN pc = 0 THEN CAST({tok(d, 5)} AS BIGINT)
       ELSE CAST({tok(d, 4)} AS BIGINT) END AS key,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND (mt = 4 OR (mt IN (10, 11, 12) AND n_tok > 11)) THEN {cs(11)}
       WHEN pc <> 0 THEN {cs(9)}
       ELSE '' END AS callsign,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt IN (5, 8) THEN CAST({fz(12)} AS BIGINT)
       ELSE 0 END AS altitude,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt IN (6, 8) THEN CAST({fz(13)} AS DOUBLE)
       ELSE CAST(0 AS DOUBLE) END AS ground_speed,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt IN (7, 8) THEN CAST({fz(14)} AS DOUBLE)
       ELSE CAST(0 AS DOUBLE) END AS track,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt = 8 THEN CAST({fz(15)} AS DOUBLE)
       ELSE CAST(0 AS DOUBLE) END AS lat,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt = 8 THEN CAST({fz(16)} AS DOUBLE)
       ELSE CAST(0 AS DOUBLE) END AS lon,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt = 8 THEN CAST({fz(17)} AS BIGINT)
       ELSE 0 END AS vertical_rate,
  CASE WHEN NOT ok THEN NULL
       WHEN pc = 0 AND mt = 8 AND {sq} IS NOT NULL AND {sq} <> {SENTINEL}
         THEN (CASE WHEN length({sq_str}) >= 4 THEN {sq_str} ELSE lpad({sq_str}, 4, '0') END)
       ELSE '' END AS squawk,
  CASE WHEN NOT ok THEN NULL
       ELSE (pc = 0 AND mt IN (8, 9) AND n_tok > 22 AND COALESCE({tok(d, 22)}, 0) = 1) END AS on_ground
FROM sbse_c
""".strip()


def ord_expr(d: dict, ts_col: str = "ts", seq_col: str = "seq") -> str:
    """Lexicographic (ts, seq) order key — identical string ordering in both
    engines; used for deterministic first/last (arrival-order semantics,
    tracker main.go:159-186)."""
    ms = d["epoch_ms"].format(x=ts_col)
    return (
        f"concat(lpad(CAST({ms} AS STRING), 14, '0'), "
        f"lpad(CAST({seq_col} AS STRING), 12, '0'))"
    )
