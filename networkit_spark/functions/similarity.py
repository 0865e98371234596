"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products stay JVM-side (``aggregate(zip_with(...))``) inside
  whole-stage codegen; no Python in the loop.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic md5-derived hyperplanes), candidates from bucket
  collisions (multi-table), exact re-rank of candidates only.  At 100 TB
  the bucket join replaces the O(N·Q) cross product with O(Σ bucket²).
- ``embedding_near_dup_pairs``: all pairs above a cosine threshold via
  the same LSH candidate generation (embedding near-dup dedup).

Ties: ordering is (rounded sim desc, neighbor id asc) — rounding to 6
decimals before ranking makes Spark and the DuckDB oracle rank
identically despite summation-order float noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — exact brute-force cosine
    top-k; self-matches excluded.  ``queries`` defaults to ``emb``
    (all-pairs); pass a small query set to broadcast it."""
    base = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        _norm(F.col(vec_col)).alias("nnorm"),
    )
    q = (queries or emb).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    sims = (
        q.crossJoin(base)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 bytes (no RNG
    state; reproducible across driver restarts and cluster sizes)."""
    import hashlib

    out = np.zeros((num_planes, dim))
    for p in range(num_planes):
        vals = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            vals.extend(b - 127.5 for b in h)
            ctr += 1
        out[p] = np.array(vals[:dim])
    return out / np.linalg.norm(out, axis=1, keepdims=True)


def lsh_buckets(
    emb: DataFrame,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """(id, table, bucket) — sign-pattern buckets per hash table.
    Vectorized pandas UDF: one matmul per Arrow batch."""
    import pyspark.sql.types as T

    dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(dim, num_planes * num_tables, seed)

    def bucketize(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf[vec_col].to_numpy())
            signs = (M @ planes.T) > 0  # (n, planes*tables)
            rows = {id_col: [], "table": [], "bucket": []}
            pows = 1 << np.arange(num_planes)
            for t in range(num_tables):
                block = signs[:, t * num_planes : (t + 1) * num_planes]
                codes = (block * pows).sum(axis=1)
                rows[id_col].extend(pdf[id_col].tolist())
                rows["table"].extend([t] * len(pdf))
                rows["bucket"].extend(codes.astype(np.int64))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    return emb.select(id_col, vec_col).mapInPandas(bucketize, schema)


def _cap_buckets(buckets: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop (table, bucket) groups larger than ``max_bucket`` before the
    bucket self-join — a degenerate corpus (many identical or near-zero
    vectors hashing to one bucket) would otherwise revert it to
    O(|bucket|²).  Members of an over-cap bucket are near-identical by
    construction: exact duplicates are the exact-dedup path's job, and
    genuinely similar pairs still collide in the other hash tables.
    Mirrors ``dedup.minhash_lsh_pairs``'s cap."""
    if max_bucket is None:
        return buckets
    # window count, not groupBy+join-back: computes the (mapInPandas-
    # produced) bucket table ONCE and leaves it partitioned on
    # (table, bucket) — the key the candidate self-join needs, so the
    # exchange is reused (same rationale as dedup.minhash_lsh_pairs)
    from pyspark.sql import Window

    bw = Window.partitionBy("table", "bucket")
    return (
        buckets.withColumn("_bsz", F.count(F.lit(1)).over(bw))
        .where(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — approximate top-k: bucket
    collisions across any table → exact cosine re-rank of candidates.
    ``max_bucket`` bounds each (table, bucket) group (see
    :func:`_cap_buckets`)."""
    # eager localCheckpoint instead of persist: blocks are released by the
    # ContextCleaner when the frame is GC'd — no cache leak across calls
    b = lsh_buckets(emb, num_planes, num_tables, id_col, vec_col).localCheckpoint(
        eager=True
    )
    b = _cap_buckets(b, max_bucket)
    l = b.select(F.col(id_col).alias("query_id"), "table", "bucket")
    r = b.select(F.col(id_col).alias("neighbor_id"), "table", "bucket")
    cand = (
        l.join(r, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vecs = emb.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("norm")
    )
    sims = (
        cand.join(vecs.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("norm").alias("qnorm")), "query_id")
        .join(vecs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"), F.col("norm").alias("nnorm")), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, sim) pairs with cosine ≥ threshold.  ``exact=True``
    brute-forces (oracle-checkable); False routes through LSH candidates
    (the 100 TB path — same verify step, bounded join; per-bucket size
    capped at ``max_bucket``, see :func:`_cap_buckets`)."""
    if exact:
        vecs = emb.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("norm"))
        a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("avec"), F.col("norm").alias("anorm"))
        b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("bvec"), F.col("norm").alias("bnorm"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        bk = _cap_buckets(lsh_buckets(emb, id_col=id_col, vec_col=vec_col), max_bucket)
        l = bk.select(F.col(id_col).alias("id_a"), "table", "bucket")
        r = bk.select(F.col(id_col).alias("id_b"), "table", "bucket")
        cand = l.join(r, ["table", "bucket"]).where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
        vecs = emb.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("norm"))
        pairs = (
            cand.join(vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("avec"), F.col("norm").alias("anorm")), "id_a")
            .join(vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("bvec"), F.col("norm").alias("bnorm")), "id_b")
        )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(_dot(F.col("avec"), F.col("bvec")) / (F.col("anorm") * F.col("bnorm")), 6).alias("sim"),
    ).where(F.col("sim") >= threshold)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _ivf_centroids(
    emb: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    lloyd_iters: int = 2,
    seed: int = 7,
) -> np.ndarray:
    """Deterministic coarse quantizer: seed centroids = the
    ``n_centroids`` vectors first in md5(id) order (a distributed
    TakeOrdered — no RNG state), then ``lloyd_iters`` k-means rounds
    with the ASSIGN step distributed (one Arrow matmul per batch,
    centroid matrix broadcast) and the UPDATE step a groupBy mean.
    Centroid count is a driver-sized object by design (√N at scale)."""
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.md5(F.concat(F.lit(f"ivf:{seed}:"), F.col(id_col).cast("string"))))
        .limit(n_centroids)
        .collect()
    )
    C = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    for _ in range(lloyd_iters):
        assigned = _ivf_assign(emb, C, 1, id_col, vec_col).select(
            F.col("cell"), F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        newC = C.copy()
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for cell, comps in by_cell.items():
            vec = np.array([comps[i] for i in range(C.shape[1])])
            nrm = np.linalg.norm(vec)
            if nrm > 1e-12:
                newC[cell] = vec / nrm
        C = newC
    return C


def _ivf_assign(
    emb: DataFrame, centroids: np.ndarray, nprobe: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec, cell, probe) — each vector's ``nprobe`` nearest
    centroids by cosine; probe 0 is the home cell.  ``nprobe`` clamps
    to the actual centroid count (a corpus smaller than ``n_centroids``
    trains fewer)."""
    import pyspark.sql.types as T

    C = centroids
    nprobe = min(nprobe, C.shape[0])

    def assign(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = (M / nrm) @ C.T  # (n, n_centroids)
            order = np.argsort(-sims, axis=1)[:, :nprobe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), nprobe),
                    vec_col: [v for v in pdf[vec_col] for _ in range(nprobe)],
                    "cell": order.reshape(-1).astype(np.int32),
                    "probe": np.tile(np.arange(nprobe, dtype=np.int32), n),
                }
            )

    elem = T.FloatType() if "float" in emb.schema[vec_col].dataType.simpleString() else T.DoubleType()
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(elem)),
            T.StructField("cell", T.IntegerType()),
            T.StructField("probe", T.IntegerType()),
        ]
    )
    return emb.select(id_col, vec_col).mapInPandas(assign, schema)


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    seed: int = 7,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — IVF approximate top-k: the
    corpus is partitioned into ``n_centroids`` coarse cells (home cell
    only), each query probes its ``nprobe`` nearest cells, candidates
    get an exact cosine re-rank.  The 100-TB shape: the cell id is a
    partition key — the candidate join shuffles each query to nprobe
    cells instead of the full corpus, and ``n_centroids ~ √N`` keeps
    cells executor-sized.  Complements ``lsh_topk`` (hash buckets):
    IVF adapts to the data's density at the cost of the small
    centroid-training pass."""
    C = _ivf_centroids(emb, n_centroids, id_col, vec_col, lloyd_iters, seed)
    home = _ivf_assign(emb, C, 1, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        _norm(F.col(vec_col)).alias("nnorm"),
        "cell",
    )
    probes = _ivf_assign(emb, C, nprobe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
        "cell",
    )
    sims = (
        probes.join(home, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm")), 6
            ).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank"))
    )
