"""Spark-engine vs DuckDB-oracle parity for every oracle-checked query —
a local replica of the driver's correctness gate (row count + schema names +
order-insensitive values)."""

import math

import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith(("float", "Float")):
            df[c] = s.astype("float64").round(9)
        elif str(s.dtype).startswith(("int", "Int", "uint", "UInt")):
            df[c] = s.astype("Int64")
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]")
        elif str(s.dtype) in ("bool", "boolean", "object"):
            df[c] = s.astype("object").where(s.notna(), None)
    return df.sort_values(list(df.columns), ignore_index=True)


def _pairs():
    from sbse.oracle import oracles
    from sbse.queries import all_queries

    o = oracles()
    q = all_queries()
    assert set(o) <= set(q), f"oracle without query: {set(o) - set(q)}"
    return sorted(o)


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(spark, duck, name):
    from sbse.oracle import oracles
    from sbse.queries import all_queries

    got = all_queries()[name](spark, SF_DIR).toPandas()
    want = duck.execute(oracles()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False,
                                  rtol=1e-9, atol=1e-12, obj=name)


def test_all_queries_run(spark):
    """Engine-only queries (no oracle) still execute and return rows."""
    from sbse.oracle import oracles
    from sbse.queries import all_queries

    engine_only = set(all_queries()) - set(oracles())
    for name in sorted(engine_only):
        df = all_queries()[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert not math.isnan(n)
