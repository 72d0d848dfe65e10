"""Custom stateful streaming operator: per-key gap sessionization with
``applyInPandasWithState`` — the streaming analog of the reference tracker's
in-memory session map with Redis TTL expiry (redis/client.go:57-149: state
keys live for a TTL and expire when a key goes quiet; tracker
main.go:234-252: a session closes when its key is silent for the gap).

The group state carries the OPEN session's accumulator (ordinal, start,
last-seen, counters); each microbatch folds its rows into it, emitting every
session the batch closes, and arms an EVENT-TIME timeout at last_seen + gap
— when the watermark (fed by other keys' traffic) passes that point, the
quiet key's trailing session is emitted and its state dropped, exactly the
Redis-TTL lifecycle. Event-time (not processing-time) timeouts keep the
operator deterministic AND let availableNow drain-and-stop (a
processing-time timeout keeps the microbatch loop alive forever).

Within a batch the sessionization is vectorized (numpy diff/reduceat over
the sorted rows — no per-row Python); only the state handoff at the batch
boundary is scalar. Session ids are the same sha256 surrogates the batch
engine derives, so outputs are comparable row-for-row
(test_streaming_stateful asserts equality with batch session_rollup).

Assumes per-key event-time order across microbatches (the file/NATS replay
shape) — and ENFORCES it: a batch row older than the carried session's end
raises instead of silently mis-placing a boundary; the batch engine remains
the authority for out-of-order reprocessing.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sbse import GAP_MS_NORTH

OUT_SCHEMA = ("session_id string, source string, key bigint, "
              "started_at timestamp, ended_at timestamp, n_events bigint, "
              "max_altitude bigint")
STATE_SCHEMA = ("sidx bigint, s_start_ms bigint, last_ts_ms bigint, "
                "n_events bigint, max_altitude bigint")


def stateful_sessions(states: DataFrame, gap_ms: int = GAP_MS_NORTH,
                      watermark: str = "1 second") -> DataFrame:
    """Apply the stateful sessionizer to a streaming states frame with
    columns (source, key, ts, seq, altitude_m). ``watermark`` is the allowed
    lateness (the NATS MaxAge analog) — the TTL timeout fires when the
    watermark passes last_seen + gap."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        source, k = key

        def sid(start_ms: int, sidx: int) -> str:
            raw = f"{source}|{k}|{start_ms}|{sidx}"
            return hashlib.sha256(raw.encode()).hexdigest()

        def emit(rows):
            if not rows:
                return iter([])
            df = pd.DataFrame(
                rows, columns=["session_id", "source", "key", "s_ms", "e_ms",
                               "n_events", "max_altitude"])
            df["started_at"] = pd.to_datetime(df.pop("s_ms"), unit="ms")
            df["ended_at"] = pd.to_datetime(df.pop("e_ms"), unit="ms")
            return iter([df[["session_id", "source", "key", "started_at",
                             "ended_at", "n_events", "max_altitude"]]])

        if state.hasTimedOut:
            # Redis-TTL expiry: the key went silent for >= gap — close and
            # emit the held session, drop the state.
            closed = []
            if state.exists:
                sidx, s_start, last, n, mx = state.get
                closed.append((sid(s_start, sidx), source, k, s_start, last,
                               n, mx))
                state.remove()
            return emit(closed)

        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "seq"])
        ts = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
        alt = pdf["altitude_m"].to_numpy().astype("int64")

        # vectorized within-batch split: segment starts where gap exceeded
        new_seg = np.ones(len(ts), dtype=bool)
        new_seg[1:] = np.diff(ts) > gap_ms
        starts = np.nonzero(new_seg)[0]
        seg_start = ts[starts]
        seg_end = ts[np.append(starts[1:] - 1, len(ts) - 1)]
        seg_n = np.diff(np.append(starts, len(ts)))
        seg_max = np.maximum.reduceat(alt, starts)

        if state.exists:
            sidx, s_start, last, n, mx = state.get
        else:
            sidx, s_start, last, n, mx = 0, None, None, 0, None

        closed = []
        i0 = 0
        if s_start is not None:
            if int(ts[0]) < last:
                # The operator assumes per-key event-time order ACROSS
                # microbatches (file/NATS replay shape). A row older than
                # the carried session's end would silently mis-place the
                # session boundary — fail the query loudly instead; the
                # batch engine is the authority for out-of-order replays.
                raise ValueError(
                    f"out-of-order replay for key ({source}, {k}): batch "
                    f"starts at {int(ts[0])} ms but carried session ends at "
                    f"{last} ms; re-run through the batch sessionizer"
                )
            if int(ts[0]) - last <= gap_ms:
                # first segment continues the carried session
                last = int(seg_end[0])
                n += int(seg_n[0])
                mx = max(mx, int(seg_max[0]))
                i0 = 1
            else:
                closed.append((sid(s_start, sidx), source, k, s_start, last,
                               n, mx))
                s_start = None
        for i in range(i0, len(starts)):  # per-SESSION loop, not per-row
            if s_start is not None:
                closed.append((sid(s_start, sidx), source, k, s_start, last,
                               n, mx))
            sidx += 1
            s_start, last = int(seg_start[i]), int(seg_end[i])
            n, mx = int(seg_n[i]), int(seg_max[i])
        state.update((sidx, s_start, last, n, mx))
        # TTL re-armed on every touch; must stay ahead of the watermark
        state.setTimeoutTimestamp(
            max(last + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        return emit(closed)

    return (
        states.select("source", "key", "ts", "seq", "altitude_m")
        .withWatermark("ts", watermark)
        .groupBy("source", "key")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
