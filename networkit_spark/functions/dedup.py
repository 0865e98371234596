"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (the 100 TB story):

- **exact**: hash-groupBy on md5(text) — one shuffle on a 32-char key.
- **n-gram Jaccard**: explode token shingles → self-join on shingle →
  per-pair intersection counts.  A DF-frequency cap drops shingles that
  occur in more than ``max_df`` docs before the join (ubiquitous
  shingles contribute O(df²) candidate pairs and almost no Jaccard
  signal) — without it the join is quadratic in the hottest shingle.
- **MinHash+LSH**: k md5-keyed min-hashes per doc, banded into
  ``k/band_size`` buckets; candidate pairs share ≥1 bucket; candidates
  are verified with exact Jaccard.  Join cost is bounded by bucket
  sizes, not corpus size.
- **SimHash**: 32-bit weighted-majority fingerprint; near-dups share
  the fingerprint (or differ in ≤ a few bits via multi-probe on bands).

All hashing is md5-prefix based (``text.hash64``) so every operator has
an exact DuckDB-SQL oracle (no engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.functions.text import hash64, tokens_col


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_md5, dup_count, keep_id) for groups with >1 member; the
    kept representative is the smallest id (deterministic survivorship)."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
    return (
        h.groupBy("content_md5")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .where(F.col("dup_count") > 1)
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) distinct token n-grams (space-joined)."""
    toks = tokens_col(F.col(text_col))
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda j: F.concat_ws(" ", *[F.element_at(toks, (j + i + 1).cast("int")) for i in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, jaccard) exact token-n-gram Jaccard ≥ threshold.

    ``max_df`` caps shingle document frequency before the self-join
    (skew defuser; identical cap in the oracle).  Jaccard uses FULL
    shingle-set sizes, so the cap only prunes candidate generation —
    a pair whose every shared shingle is ubiquitous is missed by design
    (documented sampling bound, mirrored by the oracle).
    """
    s = shingles(df, text_col, id_col, n)
    sizes = s.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    freq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = s.join(freq.where(F.col("df") <= max_df), "shingle", "leftsemi")
    a = kept.select(F.col(id_col).alias("id_a"), "shingle")
    b = kept.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 12,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, h (hash index), minhash) — minhash_i = min over shingles of
    hash64(i || ':' || shingle).  md5-keyed hash family ⇒ oracle-exact."""
    s = shingles(df, text_col, id_col, n)
    idx = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h")
    expanded = s.select(F.col(id_col), "shingle", idx)
    return expanded.groupBy(id_col, "h").agg(
        F.min(hash64(F.concat_ws(":", F.col("h").cast("string"), "shingle"))).alias("minhash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 12,
    band_size: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard) — LSH candidates (≥1 shared band bucket)
    verified with exact n-gram Jaccard ≥ threshold.

    Bands of ``band_size`` rows: bucket key = md5 of the band's minhash
    vector.  With k=12, b=4, r=3 the S-curve crosses ~0.5 — pairs well
    below threshold are rarely candidates, so the verify join is small.

    ``max_bucket`` drops band buckets with more than that many members
    from candidate generation — a degenerate corpus (one giant bucket of
    boilerplate) would otherwise revert the self-join to O(|bucket|²).
    Members of an over-cap bucket are near-identical by construction and
    are the exact-dedup path's job (``exact_duplicate_groups``).  The
    identical cap appears in the DuckDB oracle (HAVING COUNT(*) <= cap).
    """
    # All num_hashes mins in ONE grouped aggregation (wide columns) —
    # the long form (explode ×num_hashes then groupBy (id, h)) shuffles
    # num_hashes·|shingles| rows, this shuffles |shingles| once with
    # map-side combine on num_hashes min columns.  Bucket strings are
    # byte-identical to the long form's (same "h:minhash" elements,
    # same sort_array), so the md5 bucket keys — and the DuckDB oracle —
    # are unchanged.
    s0 = shingles(df, text_col, id_col, n)
    wide = s0.groupBy(id_col).agg(
        *[
            F.min(
                hash64(F.concat_ws(":", F.lit(str(i)), "shingle"))
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )
    band_ids = range((num_hashes + band_size - 1) // band_size)
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.array(
                            *[
                                F.concat_ws(
                                    ":", F.lit(str(h)), F.col(f"mh{h}").cast("string")
                                )
                                for h in range(
                                    j * band_size,
                                    min((j + 1) * band_size, num_hashes),
                                )
                            ]
                        )
                    ),
                )
            ).alias("bucket"),
        )
        for j in band_ids
    ]
    buckets = wide.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if max_bucket is not None:
        # window count, NOT groupBy+join-back: the aggregate/join form
        # recomputes the whole signature pipeline for both join inputs
        # (measured +72% on the sf0.1 bench), while the window computes
        # ``buckets`` once and leaves it hash-partitioned on
        # (band, bucket) — exactly the partitioning the candidate
        # self-join below needs, so the exchange is reused.
        from pyspark.sql import Window

        bw = Window.partitionBy("band", "bucket")
        buckets = (
            buckets.withColumn("_bsz", F.count(F.lit(1)).over(bw))
            .where(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    l = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    r = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        l.join(r, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact verification on candidates only, ONE fused job: the
    # candidate side is consumed exactly once, so no persist/checkpoint
    # is needed, and the broadcast decision is left to AQE's runtime
    # size statistics.  A driver-side count-then-hint variant (round 2)
    # was measured +8-10 s at sf0.1 in a same-window interleaved A/B —
    # the extra materialization job cost more than the hint saved.
    s = shingles(df, text_col, id_col, n)
    sizes = s.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = s.select(F.col(id_col).alias("id_a"), "shingle")
    b = s.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash32(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 32-bit weighted-majority simhash over tokens.

    bit b set ⇔ Σ_tokens count(tok) · (2·((hash64(tok)>>b)&1) − 1) > 0.
    32 bits keeps every intermediate in int64 range in BOTH engines
    (no overflow-semantics divergence with the SQL oracle).
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tf = tf.withColumn("th", hash64(F.col("tok")))
    bits = tf.select(
        F.col(id_col),
        "cnt",
        "th",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    sums = bits.groupBy(id_col, "b").agg(
        F.sum(F.expr("cnt * (2 * (shiftright(th, b) & 1) - 1)")).alias("s")
    )
    return sums.groupBy(id_col).agg(
        F.sum(
            F.expr("case when s > 0 then shiftleft(cast(1 as bigint), b) else cast(0 as bigint) end")
        ).alias("simhash")
    )


def simhash_dup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id_a, id_b) — documents with IDENTICAL simhash (strong near-dup
    signal).  Hamming-ball probing (≤k differing bits) composes by
    re-joining on simhash with each band masked out."""
    sh = simhash32(df, text_col, id_col)
    a = sh.select(F.col(id_col).alias("id_a"), "simhash")
    b = sh.select(F.col(id_col).alias("id_b"), "simhash")
    return a.join(b, "simhash").where(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", "simhash"
    )
