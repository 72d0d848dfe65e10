"""Deduplication operators for document tables at 100 TB scale.

* ``exact_dedup`` — hash-groupBy; one shuffle on the text hash, map-side
  partial aggregation.
* ``ngram_jaccard_pairs`` — exact word-3-gram Jaccard via a shingle
  self-join. Quadratic in shingle-group size; intended for verification and
  small candidate sets, not the 100 TB scale path.
* ``minhash_lsh_pairs`` — the scale path: MinHash signatures (k=8,
  lexicographic min of md5(seed|shingle) — portable across engines) banded
  4x2; candidate pairs share a band bucket, then get exact-Jaccard verified.
  At scale the band join touches only same-bucket rows (banding defeats the
  quadratic blowup), and both joins shuffle on band/shingle keys.
* ``simhash64`` — 64-bit SimHash over word xxhash64s, computed with
  bit-arithmetic aggregates (no UDF); near-dup candidates = small Hamming
  distance, via multi-probe on 16-bit bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc (matches the oracle SQL shape:
    1-based sequence over split(' '))."""
    ws = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("ws")
    )
    idx = F.explode(F.sequence(F.lit(1), F.size("ws") - (n - 1))).alias("i")
    e = ws.select("doc_id", "lang", "ws", idx)
    gram = F.concat_ws(
        " ", *[F.element_at("ws", F.col("i") + k) for k in range(n)]
    )
    return e.select("doc_id", "lang", gram.alias("shingle")).distinct()


def exact_dedup(docs: DataFrame) -> DataFrame:
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"),
    )


def _jaccard_from_pairs(pairs: DataFrame, card: DataFrame, threshold: float) -> DataFrame:
    ca = card.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
    cb = card.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
    j = (
        pairs.join(ca, "doc_a").join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.2, n: int = 3) -> DataFrame:
    sh = shingles(docs, n)
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "lang", "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
                  F.col("shingle").alias("shingle_b"))
    pairs = (
        a.join(
            b,
            (F.col("shingle") == F.col("shingle_b"))
            & (F.col("lang") == F.col("lang_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_pairs(pairs, card, threshold)


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.2, k: int = 8, bands: int = 4
) -> DataFrame:
    """MinHash + LSH banding; candidates verified with exact Jaccard.

    Hash = md5(seed|shingle), min taken lexicographically — deterministic
    and portable (identical in the DuckDB oracle)."""
    rows = k // bands
    sh = shingles(docs, 3)
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(str(s)), F.lit("|"), F.col("shingle")))
            ).alias(f"mh{s}")
            for s in range(k)
        ]
    )
    band_frames = [
        sig.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            F.md5(F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
                "band"
            ),
        )
        for b in range(bands)
    ]
    all_bands = band_frames[0]
    for bf in band_frames[1:]:
        all_bands = all_bands.unionByName(bf)
    left = all_bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band")
    right = all_bands.select(F.col("doc_id").alias("doc_b"),
                             F.col("band_id").alias("band_id_b"),
                             F.col("band").alias("band_b"))
    cand = (
        left.join(
            right,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("band") == F.col("band_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b2"),
                    F.col("shingle").alias("shingle_b"))
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, (F.col("doc_b") == F.col("doc_b2"))
              & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_pairs(inter, card, threshold)


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash from word-level xxhash64 — pure bit-arithmetic
    aggregation, no UDF: for each bit b, sign = (#words with bit set) -
    (#words with bit clear); simhash bit b = sign > 0."""
    w = docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word"))
    w = w.withColumn("h", F.xxhash64("word"))
    bit_votes = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    votes = w.groupBy("doc_id").agg(*bit_votes)
    sim_expr = None
    for b in range(64):
        bit = F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sim_expr = bit if sim_expr is None else sim_expr.bitwiseOR(bit)
    return votes.select("doc_id", sim_expr.alias("simhash"))


def simhash_candidates(sims: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates via 16-bit band collision (any identical quarter
    of the simhash) then exact Hamming filter via bit_count(xor)."""
    banded = None
    for b in range(4):
        part = sims.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
                      "band_id", "band")
    b_ = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
                       F.col("band_id").alias("band_id_b"), F.col("band").alias("band_b"))
    cand = (
        a.join(b_, (F.col("band_id") == F.col("band_id_b")) & (F.col("band") == F.col("band_b"))
               & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")
