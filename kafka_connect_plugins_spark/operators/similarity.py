"""Similarity search over embedding columns (``array<float>``).

Three strategies, ordered by scale:

- **Brute-force top-k** — the correctness baseline. Broadcast the (small)
  query side; dot products run as native ``zip_with``/``aggregate`` array
  math inside the candidate scan, so the only shuffle is the per-query
  top-k window at the very end.
- **Random-hyperplane LSH (SimHash for vectors)** — the sub-linear path:
  sign-bit signature w.r.t. deterministic hyperplanes; candidates = bucket
  collisions (equi-join on the signature), exact cosine re-rank inside the
  bucket only.
- **IVF (inverted-file)** — coarse quantization: assign every vector to its
  nearest centroid (broadcast the centroid table), search only the probed
  centroid's posting list. Centroid choice here is deterministic (first K
  vectors) — a k-means trainer would slot in without changing the plan.

Hyperplanes derive from sha2 (functions/text.stable_hash60), so an
independent SQL oracle reproduces the exact buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.plans.parallelism import spread


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    query_vec: str = "qe",
    cand_vec: str = "ce",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x partitioned candidates.

    The plan a 1000-executor cluster wants: the candidate side never moves;
    each task scores its candidate partition against the broadcast queries;
    the final per-query top-k is the single (tiny) shuffle. Norms are
    materialized ONCE per row on each side before the join — Catalyst does
    not common-subexpression-eliminate the higher-order ``aggregate`` lambda,
    so an inline ``cosine`` would recompute both norms per PAIR (k×|C|
    sqrt-folds instead of |Q|+|C|)."""
    qn = queries.withColumn("__qn", l2_norm(F.col(query_vec)))
    cn = spread(candidates).withColumn("__cn", l2_norm(F.col(cand_vec)))
    sims = cn.crossJoin(F.broadcast(qn)).withColumn(
        "sim",
        dot(F.col(query_vec), F.col(cand_vec)) / (F.col("__qn") * F.col("__cn")),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            cand_id,
            F.col("rank").cast("int").alias("rank"),
            F.round("sim", 6).alias("sim_r"),
        )
    )


def hyperplane_components(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane, computed driver-side:
    component i of plane p is ``(sha256-hash60("plane{p}:{i}") % 2001 - 1000)
    / 1000`` ∈ [-1, 1] — bit-identical to the SQL-oracle formulation
    (``conv(substring(sha2(...), 1, 15), 16, 10) % 2001 - 1000) / 1000``),
    so buckets reproduce in any engine with sha256."""
    return [
        (int(hashlib.sha256(f"plane{plane}:{i}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
        / 1000.0
        for i in range(dim)
    ]


def hyperplane(plane: int, dim: int) -> Column:
    """Literal hyperplane array.

    The planes are constants, but Catalyst does not constant-fold inside
    higher-order-function lambdas — an expression-side sha2 formulation costs
    ``n_planes × dim`` sha256 calls PER ROW in ``rhp_bucket`` (512/row at the
    defaults), which dominates at 10^9 vectors. So compute the (identical)
    values once on the driver and embed them as literals, exactly as
    ``ivf_assign`` does for its codebook."""
    return F.array(
        *[F.lit(x).cast("double") for x in hyperplane_components(plane, dim)]
    )


def rhp_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket: ``sum(2^p for planes with v·h_p > 0)``."""
    acc = F.lit(0).cast("long")
    out = acc
    for p in range(n_planes):
        out = out + F.when(
            dot(F.transform(vec, lambda x: x.cast("double")), hyperplane(p, dim)) > 0,
            F.lit(1 << p).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return out


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    query_vec: str = "qe",
    cand_vec: str = "ce",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the RHP bucket.

    Recall is tunable via ``n_planes`` (fewer planes = bigger buckets =
    higher recall, more work). At cluster scale the bucket equi-join shuffles
    both sides on the bucket key once; bucket skew is bounded by 2^n_planes.
    """
    qb = queries.withColumn("__bucket", rhp_bucket(F.col(query_vec), n_planes, dim)).withColumn(
        "__qn", l2_norm(F.col(query_vec))
    )
    cb = spread(candidates).withColumn(
        "__bucket", rhp_bucket(F.col(cand_vec), n_planes, dim)
    ).withColumn("__cn", l2_norm(F.col(cand_vec)))
    # norms precomputed per ROW (not per pair) — see brute_force_topk
    sims = qb.join(cb, "__bucket").withColumn(
        "sim",
        dot(F.col(query_vec), F.col(cand_vec)) / (F.col("__qn") * F.col("__cn")),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            cand_id,
            F.col("rank").cast("int").alias("rank"),
            F.round("sim", 6).alias("sim_r"),
        )
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    out_col: str = "list_id",
) -> DataFrame:
    """Nearest-centroid assignment as a MAP-ONLY argmax — zero shuffle.

    ``centroids`` is the small trained codebook ``[(id, vector), ...]``
    (collected driver-side exactly like any broadcast dim table would be).
    It compiles into a literal array of (sim, id) structs; ``array_max``
    picks the best by sim (struct ordering, id as deterministic tiebreak),
    all inside whole-stage codegen over the scan. At 10^9 vectors this is
    the linear-scan quantizer every IVF build runs, with no wide exchange.
    """
    import math

    # Centroid norms are constants — fold them driver-side (same sequential
    # IEEE-double sum as the SQL oracle's list_sum, so values are
    # bit-identical); the row's own norm is materialized once in a prior
    # projection instead of 8x inside the argmax lambda (Catalyst does not
    # CSE across higher-order-function lambdas).
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    with_norm = df.withColumn("__vn", l2_norm(vec_d))
    entries = F.array(
        *[
            F.struct(
                (
                    dot(vec_d, F.array(*[F.lit(float(x)).cast("double") for x in cvec]))
                    / (
                        F.col("__vn")
                        # plain sequential sum == Spark's aggregate fold ==
                        # the oracle's list_sum: bit-identical doubles
                        * F.lit(math.sqrt(sum(float(x) * float(x) for x in cvec)))
                    )
                ).alias("sim"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cvec in centroids
        ]
    )
    return with_norm.withColumn(out_col, F.array_max(entries)["cid"]).drop("__vn")


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    query_vec: str = "qe",
    cand_vec: str = "ce",
) -> DataFrame:
    """IVF search (n_probe=1): exact cosine within the query's posting list."""
    qa = ivf_assign(queries, centroids, query_vec).withColumn(
        "__qn", l2_norm(F.col(query_vec))
    )
    ca = ivf_assign(spread(candidates), centroids, cand_vec).withColumn(
        "__cn", l2_norm(F.col(cand_vec))
    )
    # norms precomputed per ROW (not per pair) — see brute_force_topk
    sims = qa.join(ca, "list_id").withColumn(
        "sim",
        dot(F.col(query_vec), F.col(cand_vec)) / (F.col("__qn") * F.col("__cn")),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(cand_id))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            cand_id,
            F.col("rank").cast("int").alias("rank"),
            F.round("sim", 6).alias("sim_r"),
        )
    )
