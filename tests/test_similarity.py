"""Similarity search: brute-force top-k, RHP-LSH, IVF assignment/search."""

import math

from pyspark.sql import functions as F

from kafka_connect_plugins_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    lsh_topk,
    rhp_bucket,
)


def _vec(angle: float, scale: float = 1.0) -> list[float]:
    return [scale * math.cos(angle), scale * math.sin(angle)]


def _frames(spark):
    # queries at angles 0 and pi/2; candidates fan out between them
    q = spark.createDataFrame(
        [(0, _vec(0.0)), (1, _vec(math.pi / 2))], "query_id long, qe array<double>"
    )
    c = spark.createDataFrame(
        [(10, _vec(0.05)), (11, _vec(0.4)), (12, _vec(1.2)), (13, _vec(1.5, 3.0))],
        "neighbor_id long, ce array<double>",
    )
    return q, c


def test_brute_force_topk_ranking(spark):
    q, c = _frames(spark)
    out = brute_force_topk(q, c, k=2).collect()
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out}
    # cosine ignores scale: 13 (angle 1.5, len 3) is closest to query 1 (pi/2)
    assert got[(0, 1)] == 10 and got[(0, 2)] == 11
    assert got[(1, 1)] == 13 and got[(1, 2)] == 12
    sims = {r["neighbor_id"]: r["sim_r"] for r in out if r["query_id"] == 0}
    assert abs(sims[10] - math.cos(0.05)) < 1e-6


def test_lsh_bucket_deterministic_and_identical_vector_found(spark):
    q = spark.createDataFrame([(0, _vec(0.3))], "query_id long, qe array<double>")
    c = spark.createDataFrame(
        [(5, _vec(0.3)), (6, _vec(0.31)), (7, _vec(2.9))],
        "neighbor_id long, ce array<double>",
    )
    out = lsh_topk(q, c, n_planes=6, dim=2, k=3).collect()
    ids = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ids[0] == 5  # identical vector: same bucket by construction, rank 1
    # bucket function is a pure deterministic column
    b = (
        spark.range(1)
        .select(rhp_bucket(F.array(F.lit(0.5), F.lit(0.5)), 6, 2).alias("b"))
        .first()["b"]
    )
    b2 = (
        spark.range(1)
        .select(rhp_bucket(F.array(F.lit(0.5), F.lit(0.5)), 6, 2).alias("b"))
        .first()["b"]
    )
    assert b == b2 and 0 <= b < 64


def test_ivf_assign_is_map_only_argmax(spark):
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(
        [(0, _vec(0.1)), (1, _vec(1.4)), (2, _vec(0.7))], "vid long, e array<double>"
    )
    out = ivf_assign(df, cents, "e")
    got = {r["vid"]: r["list_id"] for r in out.collect()}
    # 0.7 rad: cos(0.7)=0.765 to centroid 0 beats cos(0.87)=0.645 to centroid 1
    assert got == {0: 0, 1: 1, 2: 0}
    # map-only: the physical plan must contain no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ivf_topk_matches_bruteforce_within_list(spark):
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    q, c = _frames(spark)
    out = ivf_topk(q, c, cents, k=10)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    # query 0 probes list 0 = {10, 11}; query 1 probes list 1 = {12, 13}
    assert got[(0, 1)] == 10 and got[(0, 2)] == 11
    assert got[(1, 1)] == 13 and got[(1, 2)] == 12
    assert (0, 3) not in got  # other list never scanned (n_probe=1)


# ----------------------------------------------------------------------
# NumPy-vs-Column engine parity (the measured-split contract): the Arrow
# matmul hot paths must agree decision-for-decision with the Column
# reference formulations that the SQL oracles reproduce.
# ----------------------------------------------------------------------

def _random_vecs(spark, n=256, dim=16, seed=7):
    import random

    rnd = random.Random(seed)
    rows = [(i, [rnd.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, e array<double>"), dim


def test_rhp_bucket_numpy_matches_column_reference(spark):
    from kafka_connect_plugins_spark.operators.similarity import rhp_bucket_column

    df, dim = _random_vecs(spark)
    out = df.select(
        "vec_id",
        rhp_bucket(F.col("e"), 8, dim).alias("np_bucket"),
        rhp_bucket_column(F.col("e"), 8, dim).alias("col_bucket"),
    ).collect()
    assert len(out) == 256
    for r in out:
        assert r["np_bucket"] == r["col_bucket"], r["vec_id"]


def test_ivf_assign_numpy_matches_column_argmax(spark):
    df, dim = _random_vecs(spark, n=200, seed=11)
    cents = [
        (int(r["vec_id"]), list(r["e"]))
        for r in df.filter(F.col("vec_id") < 6).collect()
    ]
    got = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assign(df, cents, "e").collect()
    }
    # Column argmax reference: score every centroid, pick max sim with
    # ties to the highest centroid id — the oracle's ORDER BY sim DESC,
    # cid DESC.
    from kafka_connect_plugins_spark.operators.similarity import cosine

    scored = df
    for cid, cvec in cents:
        cv = F.array(*[F.lit(x).cast("double") for x in cvec])
        scored = scored.withColumn(f"s{cid}", cosine(F.col("e"), cv))
    pairs = F.array(
        *[F.struct(F.col(f"s{cid}").alias("sim"), F.lit(cid).cast("long").alias("cid"))
          for cid, _ in cents]
    )
    ref = {
        r["vec_id"]: r["ref_id"]
        for r in scored.select(
            "vec_id", F.array_max(pairs).getField("cid").alias("ref_id")
        ).collect()
    }
    assert got == ref
    # LongType output: a centroid id >= 2**31 must survive un-wrapped
    big = 2**33 + 5
    cents_big = [(big, cents[0][1]), (1, cents[1][1])]
    vals = {r["list_id"] for r in ivf_assign(df, cents_big, "e").collect()}
    assert vals <= {big, 1} and big in vals


def test_np_dot_and_norm_match_column_folds(spark):
    from kafka_connect_plugins_spark.operators.similarity import (
        dot,
        l2_norm,
        np_dot,
        np_l2_norm,
    )

    df, _ = _random_vecs(spark, n=128, seed=3)
    other = F.reverse(F.col("e"))
    out = df.select(
        np_dot(F.col("e"), other).alias("nd"),
        dot(F.col("e"), other).alias("cd"),
        np_l2_norm(F.col("e")).alias("nn"),
        l2_norm(F.col("e")).alias("cn"),
    ).collect()
    for r in out:
        assert abs(r["nd"] - r["cd"]) < 1e-9
        assert abs(r["nn"] - r["cn"]) < 1e-9


def test_ivf_multi_probe_improves_recall_and_is_superset(spark):
    from kafka_connect_plugins_spark.operators.similarity import ivf_topk

    df, dim = _random_vecs(spark, n=300, seed=23)
    cents = [
        (int(r["vec_id"]), list(r["e"]))
        for r in df.filter(F.col("vec_id") < 6).collect()
    ]
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    c = df.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, c, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(q, c, cents, k=5, n_probe=n_probe).collect()
        }
        return len(got & truth) / len(truth), got

    r1, got1 = recall(1)
    r6, got6 = recall(6)  # probe every list == exact search
    assert r6 == 1.0
    assert r6 >= r1
    # no duplicate (query, neighbor) pairs under multi-probe
    rows = ivf_topk(q, c, cents, k=300, n_probe=3).collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_train_ivf_centroids_deterministic_and_better_than_first_k(spark):
    import numpy as np

    from kafka_connect_plugins_spark.operators.similarity import (
        train_ivf_centroids,
    )

    df, dim = _random_vecs(spark, n=400, seed=31)
    a = train_ivf_centroids(df, "e", k=8, iters=8, id_col="vec_id")
    b = train_ivf_centroids(df, "e", k=8, iters=8, id_col="vec_id")
    assert a == b  # byte-identical codebooks on re-runs
    assert [cid for cid, _ in a] == list(range(8))

    x = np.array([list(r["e"]) for r in df.orderBy("vec_id").collect()])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    def mean_best_sim(cents):
        c = np.array([v for _, v in cents])
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
        return (xn @ c.T).max(axis=1).mean()

    first_k = [(i, list(x[i])) for i in range(8)]
    # training must not be worse than the untrained codebook it started from
    assert mean_best_sim(a) >= mean_best_sim(first_k) - 1e-12


def test_rhp_buckets_multi_matches_per_table_reference(spark):
    from kafka_connect_plugins_spark.operators.similarity import (
        rhp_bucket_column,
        rhp_buckets_multi,
    )

    df, dim = _random_vecs(spark, n=64, seed=41)
    n_tables, b = 4, 3
    cols = [rhp_buckets_multi(F.col("e"), b, dim, n_tables).alias("multi")]
    cols += [
        rhp_bucket_column(F.col("e"), b, dim, table=t).alias(f"ref{t}")
        for t in range(n_tables)
    ]
    for r in df.select(*cols).collect():
        assert list(r["multi"]) == [r[f"ref{t}"] for t in range(n_tables)]


def test_lsh_topk_multi_table_dedups_and_boosts_recall(spark):
    from kafka_connect_plugins_spark.operators.similarity import lsh_topk

    df, dim = _random_vecs(spark, n=300, seed=47)
    q = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    c = df.filter(F.col("vec_id") >= 8).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, c, k=5).collect()
    }

    def got(n_tables, n_planes):
        rows = lsh_topk(q, c, n_planes=n_planes, dim=dim, k=5, n_tables=n_tables).collect()
        pairs = [(r["query_id"], r["neighbor_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))  # multi-table collisions deduped
        return set(pairs)

    r1 = len(got(1, 4) & truth) / len(truth)
    r8 = len(got(8, 4) & truth) / len(truth)
    assert r8 >= r1  # more tables never lose candidates (same plane count)
