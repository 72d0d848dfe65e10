"""Explicit skew handling (north_rule): salted repartitioning on
(source, salt) — one hot ``source`` (src-00 carries ~50% of rows) must not
pin a whole stage on one task.

AQE's skew-join splitting covers joins but NOT window-partition skew; for
windows the partition key is (source, key), whose cardinality already
spreads load — the salt below is for the scan/decode/write stages that would
otherwise inherit the input's source clustering."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, num_partitions: int,
                       salt_buckets: int = 64, id_col: str = "doc_id") -> DataFrame:
    """Repartition on (source, salt) where salt = xxhash64(id) % buckets —
    deterministic, spreads a hot source over ``salt_buckets`` tasks."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    return salted.repartition(num_partitions, "source", "_salt").drop("_salt")


def checkpoint_partition(df: DataFrame, n_parts: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic partition label for checkpoint/resume: stable across
    runs and cluster sizes (content-derived, not task-derived)."""
    return df.withColumn(
        "ck_part", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts)).cast("int")
    )
