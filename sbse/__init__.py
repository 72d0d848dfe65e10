"""sbse — a PySpark-native time-series rollup + downsample + retention engine.

A from-scratch rebuild of the analytics semantics of ``saviobatista/sbs-logger``
(reference at /root/reference, Go microservices over NATS/TimescaleDB/Redis),
re-targeted at tables of pre-tokenized training sequences
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``.

Pipeline (see SURVEY.md §3 E2 for the reference lifecycle this re-expresses):

    token table -> decode (vectorized, SBS-1-style field layout over tokens)
                -> validation gate (broadcast join)
                -> LOCF state merge (window, "zero = missing")
                -> gap sessionization (lag + cumulative sum)
                -> session rollups  (groupBy session)
                -> 1m/1h/1d continuous-aggregate tiers + LOCF gap-fill
                -> Gorilla-compressed point blobs (delta-of-delta + XOR)
                -> retention / partition expiry
                -> per-partition checkpoint manifests (resume without recompute)

Everything is DataFrame/Catalyst-first; the only Python on the hot path is
Arrow-vectorized (pandas UDF / mapInPandas / applyInPandas), never per-row.
"""

__version__ = "0.1.0"

EPOCH0_S = 1672531200  # 2023-01-01T00:00:00Z — event-time origin for token ts
SENTINEL = -999999     # "unparseable numeric" token -> keep-zero (parser.go:150-193)
GAP_MS_NORTH = 30_000  # canonical session gap (north_star; ingestor main.go:103)
GAP_MS_REFERENCE = 300_000  # reference tracker close rule (tracker main.go:235)
