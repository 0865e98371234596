"""Deterministic synthetic Iceberg-shaped source table.

Shape per BASELINE.json ``input_hint``: ``(repo: string, path: string,
commit: string, lang: string, content: string)`` — the source-code
repository table the link graph derives from.  At production scale this
is an Iceberg table at 10^12 files; here we synthesize it with PURE
Spark SQL expressions (``spark.range`` + hash functions — no driver-side
data, no RNG state), so the same rows come out at any parallelism and
any scale factor:

- repo sizes follow a power law (Zipf-ish) → hub repos that exercise the
  engine's salting / skew handling;
- path basenames draw from a shared vocabulary → cross-repo co-naming
  links;
- ``content`` is deterministic text expanded from
  ``sha256(repo|path|commit)`` — the per-row invariant is
  ``sha256(content)`` equality against this rule (FIXTURES.md §1).

The analog of the reference's seed-fixed generators
(``cpp/generators/``, RNG via ``setSeed(seed, useThreadId)`` pyx:239-252);
power-law shape per ``PowerlawDegreeSequence`` (pyx:2591).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_LANGS = [("py", "python"), ("cpp", "cpp"), ("java", "java"), ("rs", "rust"), ("go", "go")]


def source_files(
    spark: SparkSession,
    num_repos: int = 100,
    max_files: int = 400,
    basename_vocab: int = 200,
    seed: int = 42,
) -> DataFrame:
    """The synthetic source table, one row per (repo, path, commit).

    ``files(repo r) = max(3, max_files / (r+1)^0.75)`` — repo 0 is the
    hub.  Commits per file: 1-3, keyed by a hash.  All columns derive
    from ``xxhash64``/``sha2`` of (seed, repo, file, commit) — fully
    deterministic and partition-count independent.
    """
    repos = spark.range(num_repos).select(
        F.col("id").alias("rid"),
        F.format_string("repo%05d", F.col("id")).alias("repo"),
        F.greatest(
            F.lit(3),
            (F.lit(float(max_files)) / F.pow(F.col("id") + 1, F.lit(0.75))).cast("int"),
        ).alias("nfiles"),
    )
    files = repos.select(
        "rid",
        "repo",
        F.explode(F.sequence(F.lit(0), F.col("nfiles") - 1)).alias("fidx"),
    )
    h = F.abs(F.xxhash64(F.lit(seed), "rid", "fidx"))
    files = files.select(
        "rid",
        "repo",
        "fidx",
        (h % F.lit(basename_vocab)).alias("nameid"),
        (F.abs(F.xxhash64(F.lit(seed + 1), "rid", "fidx")) % F.lit(len(_LANGS))).alias("extid"),
        (F.abs(F.xxhash64(F.lit(seed + 2), "rid", "fidx")) % F.lit(3) + 1).alias("ncommits"),
        (F.abs(F.xxhash64(F.lit(seed + 3), "rid", "fidx")) % F.lit(8)).alias("modid"),
    )
    idx = (F.col("extid") + 1).cast("int")
    ext = F.element_at(F.array(*[F.lit(e) for e, _ in _LANGS]), idx)
    lang = F.element_at(F.array(*[F.lit(l) for _, l in _LANGS]), idx)
    files = files.select(
        "rid",
        "repo",
        "fidx",
        "ncommits",
        F.format_string("src/mod%02d/", F.col("modid")).alias("dir"),
        F.concat(F.format_string("name%04d.", F.col("nameid")), ext).alias("basename"),
        lang.alias("lang"),
    ).select(
        "rid",
        "repo",
        "fidx",
        "ncommits",
        F.concat("dir", "basename").alias("path"),
        "lang",
    )
    rows = files.select(
        "repo",
        "path",
        "lang",
        F.explode(F.sequence(F.lit(0), F.col("ncommits") - 1)).alias("k"),
    )
    commit = F.substring(F.sha2(F.concat_ws(":", "repo", F.col("k").cast("string")), 256), 1, 12)
    # content: 4 sha256 chunks of the row key, hex text — deterministic,
    # ~256 chars; the sha256-of-content invariant checks this rule.
    key = F.concat_ws("|", "repo", "path", commit)
    content = F.concat_ws(
        " ",
        F.sha2(key, 256),
        F.sha2(F.concat(key, F.lit("#1")), 256),
        F.sha2(F.concat(key, F.lit("#2")), 256),
        F.sha2(F.concat(key, F.lit("#3")), 256),
    )
    return rows.select("repo", "path", commit.alias("commit"), "lang", content.alias("content"))


def content_hashes(table: DataFrame) -> DataFrame:
    """Per-row invariant column: sha256 of content (input_hint)."""
    return table.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("content_sha256")
    )
