import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SBSE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from sbse.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4, app_name="sbse-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def make_token_rows(spark, rows):
    """Build a token DataFrame from (doc_id, tokens, source) fixtures."""
    data = [(d, list(map(int, t)), len(t), s) for d, t, s in rows]
    return spark.createDataFrame(
        data, "doc_id string, tokens array<int>, n_tok int, source string"
    )
