"""Text analysis over a documents table: token counting, quality
scoring, language identification, fingerprinting.

Everything except the winnowing fingerprint is pure JVM expressions.
Each operator's semantics are deliberately chosen to be expressible in
ANSI SQL so the DuckDB oracle can replay them bit-for-bit (the driver's
correctness gate): tokenization = split on ``\\s+`` after trim/lower,
hashing = md5-prefix (see ``hash64``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# ---- shared hashing: identical in Spark and DuckDB ----
# hash64(s) = int(md5(s)[0:15], 16)  ∈ [0, 16^15) — fits int64.
# Spark:  conv(substr(md5(s), 1, 15), 16, 10) :: long
# DuckDB: cast(concat('0x', substr(md5(s), 1, 15)) as bigint)


def hash64(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lower(trim(text)); [] for blank."""
    t = F.lower(F.trim(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens) — whitespace tokenization."""
    return df.select(
        F.col(id_col), F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens")
    )


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sub-word-ish counting: split on word boundaries AND digit/letter
    transitions (a BPE-flavored regex; an estimate of LLM token counts)."""
    pieces = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]|[^a-z0-9\s]"), 0
    )
    return df.select(F.col(id_col), F.size(pieces).cast("long").alias("n_pieces"))


_EN_STOP = ["the", "and", "of", "to", "in", "a", "is", "that", "for", "it"]


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, punct_ratio, stop_ratio,
    score) — length/punctuation/stopword heuristics (the standard
    pretraining quality-filter family).  All ratios rounded to 6 so the
    SQL oracle hashes identically."""
    t = F.lower(F.trim(F.col(text_col)))
    toks = tokens_col(F.col(text_col))
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(t, r"[^.,!?;:]", ""))
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    avg_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("score"),
    )


# language marker lists (tiny n-gram-free heuristic; identical inline
# VALUES table in the SQL oracle)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "that"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "et", "une", "dans"],
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang) — marker-token voting; argmax votes with lang-asc
    tie-break; 'und' when no marker hits."""
    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws], "lang string, tok string"
    )
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    votes = (
        toks.join(F.broadcast(markers), "tok")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    # argmax votes, lang-asc tie-break: min over (-votes, lang)
    best = votes.groupBy(id_col).agg(
        F.expr("min_by(lang, struct(-votes, lang)) as pred_lang")
    )
    return df.select(F.col(id_col)).join(best, id_col, "left").select(
        F.col(id_col), F.coalesce("pred_lang", F.lit("und")).alias("pred_lang")
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprint) exploded — winnowing document fingerprints
    (Schleimer et al.): rolling hash over character k-grams, keep the
    minimum of each sliding window (rightmost of equals).  Vectorized
    pandas UDF over Arrow batches (rolling windows aren't expressible as
    Spark built-ins); no SQL oracle — verified against a NumPy oracle in
    tests."""
    import pyspark.sql.types as T

    def fp_batch(it):
        for pdf in it:
            ids, fps = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                s = (txt or "").lower()
                if len(s) < k:
                    continue
                arr = np.frombuffer(s.encode("utf-8", "ignore")[: len(s)], dtype=np.uint8)
                n = len(arr) - k + 1
                if n <= 0:
                    continue
                # polynomial rolling hash, vectorized via stride tricks
                weights = (31 ** np.arange(k - 1, -1, -1, dtype=np.uint64)).astype(np.uint64)
                win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
                h = (win * weights).sum(axis=1) & np.uint64(0x7FFFFFFF)
                if len(h) >= window:
                    hw = np.lib.stride_tricks.sliding_window_view(h, window)
                    sel = np.unique(hw.min(axis=1))
                else:
                    sel = np.array([h.min()])
                ids.extend([did] * len(sel))
                fps.extend(sel.astype(np.int64))
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("fingerprint", T.LongType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(fp_batch, schema)
