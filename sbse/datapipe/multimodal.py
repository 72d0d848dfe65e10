"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode/feature-extraction runs as Arrow-batched ``mapInPandas``. The actual
media decode is STUBBED (no codec libs in this container) behind
``decode_media`` — the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) is real and tested with deterministic fake features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a media table: payload = utf-8 bytes of text (stand-in for
    image/audio bytes), plus typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col("text")).cast("bigint").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake features (length + byte-sum) exercise the real
    batch shape; swap the body for a real decoder where codec libs exist."""

    def feat_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                                  count=len(pdf))
            byte_sum = np.fromiter(
                (int(np.frombuffer(p, dtype=np.uint8).sum()) for p in payloads),
                dtype=np.int64, count=len(pdf),
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": n_bytes,
                    "byte_sum": byte_sum,
                    "fake_feature": byte_sum % 997,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        feat_batches,
        schema="doc_id bigint, n_bytes bigint, byte_sum bigint, fake_feature bigint",
    )


def decode_media(media: DataFrame, kind: str) -> DataFrame:
    """Real media decode entry point — stubbed in this environment."""
    raise NotImplementedError(
        f"media decode for {kind!r} requires codec libraries not present in "
        "this container; use extract_features for the plumbing path"
    )
