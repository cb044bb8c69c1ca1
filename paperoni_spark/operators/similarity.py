"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force baseline: broadcast the (small) query
  set against the corpus, compute cosine with built-in higher-order
  functions (``zip_with`` + ``aggregate`` — JVM-side, no Python), rank with a
  per-query window.  One broadcast, one shuffle (the window's partition by
  query).  At 100 TB this is the verification path for sampled queries.
* :func:`lsh_sign_buckets` / :func:`ann_lsh_topk` — the scale path:
  random-hyperplane (sign) LSH with hyperplanes derived deterministically
  from md5, materialized as literal ±1 coefficient arrays so bucketing is a
  pure map-side expression (zero shuffle to bucket 10^12 vectors; the only
  shuffle is the tiny bucket-histogram agg / within-bucket ranking).

Scores are rounded before ranking with a vec_id tie-break, making the
ordering deterministic and engine-portable for the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMBED_DIM = 64
N_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id < n_queries)
    the k nearest other vectors."""
    from pyspark.sql.window import Window

    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("emb"))
                / (_norm(F.col("qemb")) * _norm(F.col("emb"))),
                3,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def hyperplane(plane: int, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic ±1 hyperplane coefficients from md5 parity."""
    coefs = []
    for i in range(dim):
        digest = hashlib.md5(f"{plane}:{i}".encode()).hexdigest()
        coefs.append(1.0 if int(digest[0], 16) % 2 == 1 else -1.0)
    return coefs


def _bucket_col(emb_col, n_planes: int = N_PLANES):
    bits = []
    for p in range(n_planes):
        coefs = F.array(*[F.lit(c) for c in hyperplane(p)])
        bit = F.when(_dot(emb_col, coefs) > 0, F.lit("1")).otherwise(F.lit("0"))
        bits.append(bit)
    return F.concat(*bits)


def lsh_sign_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Sign-LSH bucket histogram — map-side bucketing, one tiny agg shuffle."""
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    return (
        base.select(_bucket_col(F.col("emb"), n_planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, n_planes: int = N_PLANES
) -> DataFrame:
    """Embedding-cosine near-duplicate detection, sign-LSH blocked: only
    pairs sharing an LSH bucket are compared (the bucket join shuffles
    bucket keys, never a cross join), then exact cosine gates at
    ``threshold``.  Rounded + ordered for engine portability."""
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    ).withColumn("bucket", _bucket_col(F.col("emb"), n_planes))
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"), "bucket"
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (_norm(F.col("emb_a")) * _norm(F.col("emb_b"))),
                3,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


IVF_ROUND = 6  # decimals: distances + centroid means (engine portability)


def _sq_dist(cent):
    """Rounded squared distance |e|² − 2e·c + |c|² to a literal centroid.
    Rounding before any argmin/sort makes assignment identical across
    engines despite FP summation-order differences."""
    return F.round(
        _dot(F.col("emb"), F.col("emb"))
        - F.lit(2.0) * _dot(F.col("emb"), F.array(*[F.lit(c) for c in cent]))
        + F.lit(sum(x * x for x in cent)),
        IVF_ROUND,
    )


def ivf_assignments(
    embeddings: DataFrame, n_centroids: int = 16, iters: int = 2
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: deterministic k-means over the corpus.

    Centroids live on the driver (k × dim floats — tiny) and are shipped as
    literal arrays, so each Lloyd iteration is one pruned scan + one
    partial-aggregated groupBy; assignment of 10^12 vectors is pure map-side
    work.  Init is deterministic (the k lowest vec_ids) — no RNG state.
    Distances and per-iteration centroid means are rounded (IVF_ROUND) so
    every assignment — and hence the DuckDB oracle twin — is FP-order
    independent; argmin ties break to the lowest centroid id.
    """
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    seed_rows = (
        base.orderBy("vec_id").limit(n_centroids).select("emb").collect()
    )
    centroids = [list(r["emb"]) for r in seed_rows]

    def assign_col(cents):
        dists = F.array(*[_sq_dist(cent) for cent in cents])
        # array_position returns the FIRST index holding the min — ties
        # break to the lowest centroid id, matching the oracle's (d, cid)
        # ordering.
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    for _ in range(iters):
        assigned = base.withColumn("centroid", assign_col(centroids))
        # element-wise mean per cluster: explode dims once, partial-agg
        means = (
            assigned.select("centroid", F.posexplode("emb").alias("dim", "val"))
            .groupBy("centroid", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for row in means:
            new_centroids[row["centroid"]][row["dim"]] = round(row["mean"], IVF_ROUND)
        centroids = new_centroids

    return base.withColumn("centroid", assign_col(centroids)), centroids


def ann_ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN: rank candidates only within the query's ``nprobe`` nearest
    clusters.  The corpus side is assigned map-side and joined on the
    cluster id — at scale the assigned table is written bucketed by
    centroid so probes become partition-pruned scans."""
    from pyspark.sql.window import Window

    assigned, centroids = ivf_assignments(embeddings, n_centroids)
    queries = assigned.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )

    def dist_to(cent):
        return F.round(
            _dot(F.col("qemb"), F.col("qemb"))
            - F.lit(2.0) * _dot(F.col("qemb"), F.array(*[F.lit(c) for c in cent]))
            + F.lit(sum(x * x for x in cent)),
            IVF_ROUND,
        )

    # sort (distance, centroid-id) structs so probe selection is total-order
    # deterministic even under distance ties (array_position on a sorted
    # distance array would duplicate probes on ties)
    pairs = F.array_sort(
        F.array(
            *[
                F.struct(dist_to(c).alias("d"), F.lit(i).alias("cid"))
                for i, c in enumerate(centroids)
            ]
        )
    )
    probe_cols = [pairs[p]["cid"].cast("int") for p in range(nprobe)]
    queries = queries.withColumn("probes", F.array(*probe_cols))

    scored = (
        assigned.join(
            F.broadcast(queries),
            F.array_contains(F.col("probes"), F.col("centroid")),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("emb"))
                / (_norm(F.col("qemb")) * _norm(F.col("emb"))),
                3,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def ann_lsh_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = N_PLANES
) -> DataFrame:
    """ANN: rank candidates only within the query's LSH bucket.  The
    candidate join is an equi-join on the bucket key — the 10^12-row side is
    shuffled by bucket once and reused for all queries."""
    from pyspark.sql.window import Window

    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    ).withColumn("bucket", _bucket_col(F.col("emb"), n_planes))
    queries = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        base.join(
            F.broadcast(queries), F.col("bucket") == F.col("qbucket"), "inner"
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("emb"))
                / (_norm(F.col("qemb")) * _norm(F.col("emb"))),
                3,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
