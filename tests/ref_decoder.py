"""Independent pure-Python re-implementation of the decode spec
(SURVEY.md §7.1 / reference parser.go:32-211) used as a third oracle in
tests — deliberately written row-at-a-time, from the spec text, not from the
engine code."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

EPOCH0 = datetime(2023, 1, 1, tzinfo=timezone.utc)
SENT = -999999


def decode_row(doc_id: str, tokens: list[int], n_tok: int, source: str) -> dict:
    def tok(i):
        return tokens[i] if i < len(tokens) else None

    def fz(i):
        v = tok(i)
        if v is None or v == SENT:
            return 0
        return v

    out = {
        "doc_id": doc_id,
        "source": source,
        "n_tok": n_tok,
        "seq": int(doc_id[1:]),
    }
    pc = (tok(0) or 0) % 4
    out["prefix"] = ["MSG", "STA", "AIR", "ID"][pc]
    mt_raw = tok(1)
    t_secs, t_ms = tok(2), tok(3) or 0
    out["mt_raw"] = mt_raw
    if pc == 0:
        ok = n_tok >= 22 and mt_raw is not None and 1 <= mt_raw <= 12
        mt = mt_raw
    else:
        ok = n_tok >= 10
        mt = 9 + pc
    out["ok"] = ok
    out["ts"] = (
        EPOCH0 + timedelta(seconds=t_secs, milliseconds=t_ms)
        if t_secs is not None
        else None
    )
    if not ok:
        for c in ("msg_type", "key", "callsign", "altitude", "ground_speed",
                  "track", "lat", "lon", "vertical_rate", "squawk", "on_ground"):
            out[c] = None
        return out
    out["msg_type"] = mt

    def cs(i):
        v = tok(i)
        if v is None or v in (0, SENT):
            return ""
        return str(v)

    if pc == 0:
        out["key"] = None if mt in (1, 2) else tok(5)
        out["callsign"] = (
            cs(11) if (mt == 4 or (mt in (10, 11, 12) and n_tok > 11)) else ""
        )
        out["altitude"] = fz(12) if mt in (5, 8) else 0
        out["ground_speed"] = float(fz(13)) if mt in (6, 8) else 0.0
        out["track"] = float(fz(14)) if mt in (7, 8) else 0.0
        out["lat"] = float(fz(15)) if mt == 8 else 0.0
        out["lon"] = float(fz(16)) if mt == 8 else 0.0
        out["vertical_rate"] = fz(17) if mt == 8 else 0
        sq = tok(18)
        out["squawk"] = (
            ("%04d" % sq) if (mt == 8 and sq is not None and sq != SENT) else ""
        )
        out["on_ground"] = bool(mt in (8, 9) and n_tok > 22 and tok(22) == 1)
    else:
        out["key"] = tok(4)
        out["callsign"] = cs(9)
        out["altitude"] = 0
        out["ground_speed"] = 0.0
        out["track"] = 0.0
        out["lat"] = 0.0
        out["lon"] = 0.0
        out["vertical_rate"] = 0
        out["squawk"] = ""
        out["on_ground"] = False
    return out
