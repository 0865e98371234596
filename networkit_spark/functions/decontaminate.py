"""Benchmark decontamination — an LLM-training-pipeline operator with
no reference analog (the graph reference has none; this follows the
published n-gram-overlap protocol used by GPT-3 / PaLM / Llama data
cards: a training document is contaminated when it shares at least one
(or ``min_hits``) token n-grams with any benchmark text).

Spark shape: shingle both sides with the SAME ``dedup.shingles``
expression (JVM-side transform, no UDF), hash the shingles to longs,
and join doc-shingles against the (deduplicated) benchmark-shingle
set.  The benchmark side is tiny relative to the corpus — it is
broadcast, so the scan of the 100-TB document table never shuffles:
filter + project + broadcast-hash-join + partial count.  Outputs are
per-document hit counts, so the same pass powers both flagging and
the anti-join that drops contaminated docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.functions.dedup import shingles
from networkit_spark.functions.text import hash64


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_hits, n_shingles, hit_frac) for every document with
    at least one n-gram shared with the benchmark set.

    ``n = 13`` is the published GPT-3 window; tests use smaller n.
    The benchmark shingle set is distinct-ed and broadcast.
    """
    bcol = bench_text_col or text_col
    bench_sh = (
        shingles(
            benchmark.select(F.lit(0).alias("doc_id"), F.col(bcol).alias("text")),
            text_col="text",
            id_col="doc_id",
            n=n,
        )
        .select(hash64(F.col("shingle")).alias("h"))
        .distinct()
    )
    doc_sh = shingles(docs, text_col=text_col, id_col=id_col, n=n).select(
        F.col(id_col), hash64(F.col("shingle")).alias("h")
    )
    totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return hits.join(totals, id_col).select(
        id_col,
        "n_hits",
        "n_shingles",
        (F.col("n_hits") / F.col("n_shingles")).alias("hit_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """The input ``docs`` rows minus documents with ≥ ``min_hits``
    shared n-grams — one broadcast join + one anti-join; the document
    table is scanned once per side and never shuffled on its own key."""
    flagged = contamination_hits(
        docs, benchmark, n=n, text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col,
    ).where(F.col("n_hits") >= min_hits).select(id_col)
    return docs.join(flagged, id_col, "left_anti")
