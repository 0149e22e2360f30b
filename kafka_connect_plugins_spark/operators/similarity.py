"""Similarity search over embedding columns (``array<float>``).

Three strategies, ordered by scale:

- **Brute-force top-k** — the correctness baseline. Broadcast the (small)
  query side; each task scores its candidate partition in place, so the
  only shuffle is the per-query top-k window at the very end.
- **Random-hyperplane LSH (SimHash for vectors)** — the sub-linear path:
  sign-bit signature w.r.t. deterministic hyperplanes; candidates = bucket
  collisions (equi-join on the signature), exact cosine re-rank inside the
  bucket only.
- **IVF (inverted-file)** — coarse quantization: assign every vector to its
  nearest centroid (literal codebook), search only the probed centroid's
  posting list. Centroid choice here is deterministic (first K vectors) — a
  k-means trainer would slot in without changing the plan.

**Arithmetic engine — measured split.** MULTI-dot row operators (the
8-plane bucket signature, the K-centroid argmax) run as NumPy matmuls in
Arrow-batched ``pandas_udf``s: Spark evaluates higher-order-function
lambdas interpreted per element (measured 17.7 µs/row for the 8x64 bucket
— ~39 core-hours per 10^9 vectors), while the batched matmul does it at
~0.7 µs/row. SINGLE dot products per row (pair scoring after a join, row
norms) stay native Column expressions: one interpreted 64-dim fold costs
~2 µs/row — comparable to the Arrow round trip's per-row transfer — and
keeping them JVM-side avoids an extra Python stage per query (measured:
a pandas_udf pair-scorer REGRESSED knn 0.65→1.34 s at sf0.1). The Column
forms double as the oracle-parity reference (bit-identical sequential
folds); unit tests assert the NumPy path agrees.

Hyperplanes derive from sha2 (functions/text.stable_hash60), so an
independent SQL oracle reproduces the exact buckets.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from kafka_connect_plugins_spark.plans.parallelism import spread


# ----------------------------------------------------------------------
# Column reference implementations (oracle parity; NOT the hot path)
# ----------------------------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — bit-identical to the SQL oracle's
    ``list_sum``; reference implementation for parity tests."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ----------------------------------------------------------------------
# NumPy / Arrow vectorized hot path
# ----------------------------------------------------------------------

_BLAS_PINNED: set = set()


def _pin_blas_single_thread() -> None:
    """Cap OpenBLAS at one thread in this (worker) process.

    OpenBLAS spawns its own pool inside EVERY Python worker; with 32
    workers per host the per-bucket gemms oversubscribe the box and
    intermittently stall 5-10x (measured: 2.4 s passes spiking to 20 s on
    embedding_neardup_lsh; OPENBLAS_NUM_THREADS=1 removes the spikes).
    Spark owns the parallelism here — one task per core — so BLAS must be
    sequential. Env vars are too late (the worker imports numpy before
    user code runs), so call the runtime API on the already-loaded
    library. Per-process, idempotent, silently a no-op for non-OpenBLAS
    builds. Values are unaffected — only thread count changes."""
    import ctypes
    import glob
    import os

    if os.getpid() in _BLAS_PINNED:
        return
    _BLAS_PINNED.add(os.getpid())
    for path in glob.glob(
        os.path.join(os.path.dirname(np.__file__) + ".libs", "libopenblas*")
    ) + glob.glob(os.path.join(os.path.dirname(np.__file__), "..", "numpy.libs", "libopenblas*")):
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        for sym in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
            if hasattr(lib, sym):
                getattr(lib, sym)(1)
                return


def _mat(s: pd.Series) -> np.ndarray:
    """Stack one Arrow batch of array cells into a (rows, dim) float64
    matrix. float64 regardless of the storage type, so sign/ordering
    decisions match the double-precision oracle."""
    _pin_blas_single_thread()
    return np.stack(s.to_numpy()).astype(np.float64, copy=False)


# UDF construction is LAZY (factory + cache), never at module import:
# workers re-import this module to unpickle the inner functions, and
# creating a pandas_udf there (no active SparkSession) would fail — the
# same reason these use DataType instances, not DDL strings.

@lru_cache(maxsize=1)
def _np_dot_udf():
    @pandas_udf(T.DoubleType())
    def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        return pd.Series(np.einsum("ij,ij->i", _mat(a), _mat(b)))

    return dot_udf


@lru_cache(maxsize=1)
def _np_l2_norm_udf():
    @pandas_udf(T.DoubleType())
    def norm_udf(a: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        x = _mat(a)
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", x, x)))

    return norm_udf


def np_dot(a: Column, b: Column) -> Column:
    """Batched dot product: one einsum per Arrow batch."""
    return _np_dot_udf()(a, b)


def np_l2_norm(a: Column) -> Column:
    """Batched L2 norm: one einsum per Arrow batch."""
    return _np_l2_norm_udf()(a)


def hyperplane_components(plane: int, dim: int, table: int = 0) -> list[float]:
    """Deterministic pseudo-random hyperplane, computed driver-side:
    component i of plane p is ``(sha256-hash60("plane{p}:{i}") % 2001 - 1000)
    / 1000`` ∈ [-1, 1] — bit-identical to the SQL-oracle formulation
    (``conv(substring(sha2(...), 1, 15), 16, 10) % 2001 - 1000) / 1000``),
    so buckets reproduce in any engine with sha256. ``table`` salts the
    seed (``t{T}:plane{p}:{i}``) for independent multi-table LSH planes;
    table 0 keeps the original seed for backward compatibility."""
    seed = f"plane{plane}:" if table == 0 else f"t{table}:plane{plane}:"
    return [
        (int(hashlib.sha256(f"{seed}{i}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
        / 1000.0
        for i in range(dim)
    ]


@lru_cache(maxsize=32)
def _rhp_bucket_udf(n_planes: int, dim: int, table: int = 0):
    planes_t = np.array(
        [hyperplane_components(p, dim, table) for p in range(n_planes)],
        dtype=np.float64,
    ).T  # (dim, n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="int64")
        return pd.Series((_mat(v) @ planes_t > 0) @ weights)

    return bucket


def rhp_bucket(vec: Column, n_planes: int, dim: int, table: int = 0) -> Column:
    """Random-hyperplane LSH bucket: ``sum(2^p for planes with v·h_p > 0)``.

    One (batch × dim) @ (dim × planes) matmul + a sign-bit pack per Arrow
    batch — map-only, no shuffle, no per-row Python."""
    return _rhp_bucket_udf(n_planes, dim, table)(vec)


@lru_cache(maxsize=32)
def _rhp_buckets_multi_udf(n_planes: int, dim: int, n_tables: int):
    planes_t = np.array(
        [
            hyperplane_components(p, dim, t)
            for t in range(n_tables)
            for p in range(n_planes)
        ],
        dtype=np.float64,
    ).T  # (dim, n_tables * n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="object")
        bits = _mat(v) @ planes_t > 0  # (rows, T*b) in ONE matmul
        packed = bits.reshape(len(v), n_tables, n_planes) @ weights
        return pd.Series(list(packed))

    return buckets


def rhp_buckets_multi(vec: Column, n_planes: int, dim: int, n_tables: int) -> Column:
    """All ``n_tables`` independent LSH bucket signatures in ONE matmul per
    Arrow batch — the multi-table recall amplifier (candidate if ANY table's
    bucket collides: P(hit) = 1 - (1 - p^b)^T for per-plane agreement p).
    Returns ``array<long>`` of length ``n_tables``; table t's planes are
    salted with ``t{t}:`` so the SQL oracle reproduces every table."""
    return _rhp_buckets_multi_udf(n_planes, dim, n_tables)(vec)


def rhp_bucket_column(vec: Column, n_planes: int, dim: int, table: int = 0) -> Column:
    """Pure-Column reference formulation of :func:`rhp_bucket` (literal
    hyperplanes folded driver-side). Interpreted HOF lambdas — keep it for
    parity tests, never on the hot path."""
    planes = [
        F.array(*[F.lit(x).cast("double") for x in hyperplane_components(p, dim, table)])
        for p in range(n_planes)
    ]
    vec_d = F.transform(vec, lambda x: x.cast("double"))
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        out = out + F.when(
            dot(vec_d, plane) > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def cosine_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_cols: list[str],
    threshold: float,
    margin: float = 1e-6,
    row_block: int = 2048,
    emit_sim: bool = False,
) -> DataFrame:
    """Within-block cosine pair mining as one dgemm per row-block — the
    candidate half of a pair-similarity query, replacing a JVM self-join
    that would materialize every within-block ORDERED PAIR as a row.

    For each block (``groupBy(block_cols)``) the group's vectors stack into
    a matrix once, the normalized gram matrix is computed blockwise
    (``row_block`` rows at a time, bounding memory at
    ``row_block × n_block`` doubles), and only ordered pairs with cosine
    ``>= threshold - margin`` are emitted as ``(id_a, id_b)``. At sf1.0 the
    multi-table LSH query's bucket collisions are 253M JVM join rows; the
    same work here is 80 dgemms (~64 GFLOP total) emitting the ~1.5M
    survivors (guide §4.2: batch the math, move decisions not payloads).

    Without ``emit_sim`` this is a conservative PREFILTER, not the
    verifier: BLAS reorders the dot-product sums, so a pair within ~1e-13
    of the threshold could round differently from the sequential fold.
    ``margin`` keeps every exact match in the candidate set; the caller
    re-scores candidates with the bit-exact Column fold (:func:`dot` /
    :func:`l2_norm`) and applies the exact threshold, so final results are
    identical to the pure-JVM plan (and to the SQL oracle's ``list_sum``).
    Zero-norm vectors emit with a norm of 1 here and are resolved by the
    exact re-score.

    With ``emit_sim=True`` the group VERIFIES its own candidates and emits
    ``(id_a, id_b, sim)`` where ``sim`` is bit-identical to
    ``dot(a,b)/(l2_norm(a)*l2_norm(b))``: per-element products round
    identically in IEEE float64, and ``np.add.accumulate`` sums them in the
    same strict left-to-right order as the Column fold / the oracle's
    ``list_reduce`` (the fold's leading ``0.0 +`` differs only on an
    all-±0.0 dot product, which sits below any positive threshold and is
    never emitted). The exact threshold is applied in-group, so no
    join-back, no second pass over the vectors, and the margin slop never
    leaves the group (guide §2.3: move decisions, not payloads).
    """
    cut = float(threshold) - float(margin)
    fields = [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    if emit_sim:
        fields.append(T.StructField("sim", T.DoubleType()))
    out_schema = T.StructType(fields)

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        _pin_blas_single_thread()  # Spark owns parallelism; see helper
        pdf = pdf.sort_values(id_col)  # index order below IS id order
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        nrm = np.linalg.norm(x, axis=1)
        nrm[nrm == 0] = 1.0
        xn = x / nrm[:, None]
        n = len(ids)
        if emit_sim:
            # exact per-row norms, sequential-fold order (see docstring)
            seq_norm = np.sqrt(np.add.accumulate(x * x, axis=1)[:, -1])
            seq_norm_safe = np.where(seq_norm == 0, 1.0, seq_norm)
        outs_a, outs_b, outs_s = [], [], []
        for i0 in range(0, n, row_block):
            s = xn[i0 : i0 + row_block] @ xn.T
            r, c = np.nonzero(s >= cut)
            gi = r + i0
            keep = c > gi  # ordered pairs only: column id > row id
            if not keep.any():
                continue
            gik, ck = gi[keep], c[keep]
            if emit_sim:
                prod = x[gik] * x[ck]
                dots = np.add.accumulate(prod, axis=1)[:, -1]
                sims = dots / (seq_norm_safe[gik] * seq_norm_safe[ck])
                ok = (sims >= float(threshold)) & (seq_norm[gik] != 0) & (
                    seq_norm[ck] != 0
                )
                if ok.any():
                    outs_a.append(ids[gik[ok]])
                    outs_b.append(ids[ck[ok]])
                    outs_s.append(sims[ok])
            else:
                outs_a.append(ids[gik])
                outs_b.append(ids[ck])
        if not outs_a:
            cols = {"id_a": np.array([], dtype=np.int64),
                    "id_b": np.array([], dtype=np.int64)}
            if emit_sim:
                cols["sim"] = np.array([], dtype=np.float64)
            return pd.DataFrame(cols)
        cols = {"id_a": np.concatenate(outs_a), "id_b": np.concatenate(outs_b)}
        if emit_sim:
            cols["sim"] = np.concatenate(outs_s)
        return pd.DataFrame(cols)

    return df.groupBy(*[F.col(c) for c in block_cols]).applyInPandas(
        emit, out_schema
    )


# ----------------------------------------------------------------------
# Operators
# ----------------------------------------------------------------------

def _topk(sims: DataFrame, k: int, query_id: str, cand_id: str) -> DataFrame:
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
    materialized ONCE per row on each side before the join, so the per-pair
    work is one batched dot product."""
    qn = queries.withColumn("__qn", l2_norm(F.col(query_vec)))
    cn = spread(candidates).withColumn("__cn", l2_norm(F.col(cand_vec)))
    sims = cn.crossJoin(F.broadcast(qn)).withColumn(
        "sim",
        dot(F.col(query_vec), F.col(cand_vec)) / (F.col("__qn") * F.col("__cn")),
    )
    return _topk(sims, k, query_id, cand_id)


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
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within colliding RHP
    buckets.

    Two recall knobs, the classic LSH geometry:

    - ``n_planes`` (bits per table): fewer planes = bigger buckets = higher
      recall per table, more candidates. Bucket count is ``2^n_planes``.
    - ``n_tables`` (independent tables): a pair is a candidate if ANY
      table's bucket collides — recall ``1 - (1 - p^b)^T`` for per-plane
      agreement ``p = 1 - θ/π``. For moderate-similarity neighbors (cosine
      ~0.4 → p ≈ 0.63) a single 8-plane table catches ~2% of true
      neighbors; 6 tables × 3 planes catch ~85% (measured sweep in
      BENCH.md). Memory/scan cost grows linearly in T, the standard trade.

    All ``T × b`` signatures come from ONE matmul per Arrow batch
    (:func:`rhp_buckets_multi`). The candidate side never shuffles: it
    probes the broadcast query side per (table, bucket); pairs colliding in
    several tables are deduped AFTER scoring (exact sim is deterministic,
    so the dedup is a small exchange over candidate pairs only).
    """
    if n_tables <= 1:
        qb = queries.withColumn(
            "__bucket", rhp_bucket(F.col(query_vec), n_planes, dim)
        ).withColumn("__qn", l2_norm(F.col(query_vec)))
        cb = spread(candidates).withColumn(
            "__bucket", rhp_bucket(F.col(cand_vec), n_planes, dim)
        ).withColumn("__cn", l2_norm(F.col(cand_vec)))
        # ANN serving shape: the query batch is small — broadcast it and the
        # candidate side NEVER moves (no bucket shuffle of the corpus; each
        # task probes its own splits). For corpus-x-corpus pair mining use
        # the symmetric bucket equi-join instead (q_embedding_neardup_lsh).
        # Norms precomputed per ROW (not per pair) — see brute_force_topk.
        sims = cb.join(F.broadcast(qb), "__bucket").withColumn(
            "sim",
            dot(F.col(query_vec), F.col(cand_vec)) / (F.col("__qn") * F.col("__cn")),
        )
        return _topk(sims, k, query_id, cand_id)
    qb = queries.select(
        "*",
        F.posexplode(
            rhp_buckets_multi(F.col(query_vec), n_planes, dim, n_tables)
        ).alias("__tbl", "__bucket"),
    ).withColumn("__qn", l2_norm(F.col(query_vec)))
    cb = spread(candidates).select(
        "*",
        F.posexplode(
            rhp_buckets_multi(F.col(cand_vec), n_planes, dim, n_tables)
        ).alias("__tbl", "__bucket"),
    ).withColumn("__cn", l2_norm(F.col(cand_vec)))
    sims = (
        cb.join(F.broadcast(qb), ["__tbl", "__bucket"])
        .withColumn(
            "sim",
            dot(F.col(query_vec), F.col(cand_vec)) / (F.col("__qn") * F.col("__cn")),
        )
        # a pair colliding in several tables appears once per table; its
        # exact sim is identical, so any-row dedup is correct
        .dropDuplicates([query_id, cand_id])
    )
    return _topk(sims, k, query_id, cand_id)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    out_col: str = "list_id",
) -> DataFrame:
    """Nearest-centroid assignment as a MAP-ONLY batched argmax — zero
    shuffle.

    ``centroids`` is the small trained codebook ``[(id, vector), ...]``
    (collected driver-side exactly like any broadcast dim table would be).
    Each Arrow batch pays ONE (batch × dim) @ (dim × K) matmul; ties go to
    the highest centroid id (matching the oracle's ``ORDER BY sim DESC,
    cid DESC``) by ordering the codebook columns by descending id and
    taking the first argmax hit. At 10^9 vectors this is the linear-scan
    quantizer every IVF build runs, with no wide exchange.
    """
    ordered = sorted(centroids, key=lambda c: -int(c[0]))
    # int64 end-to-end: centroid ids are caller-chosen (often row ids), and
    # an int32 output would silently wrap ids >= 2**31.
    cids = np.array([int(c) for c, _ in ordered], dtype=np.int64)
    cmat = np.array([v for _, v in ordered], dtype=np.float64)  # (K, dim)
    cmat_t = (cmat / np.linalg.norm(cmat, axis=1, keepdims=True)).T  # (dim, K)

    @pandas_udf(T.LongType())
    def assign(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="int64")
        x = _mat(v)
        sims = (x @ cmat_t) / np.linalg.norm(x, axis=1, keepdims=True)
        return pd.Series(cids[np.argmax(sims, axis=1)])

    return df.withColumn(out_col, assign(F.col(vec_col)))


def ivf_assign_probes(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    n_probe: int,
    out_col: str = "list_id",
) -> DataFrame:
    """Top-``n_probe`` nearest-centroid assignment, EXPLODED to one row per
    probed list — the query-side multi-probe of an IVF search. Map-only:
    one matmul + one partial argsort per Arrow batch, then a generator
    explode (no shuffle). Probe order ties break to the higher centroid id,
    matching :func:`ivf_assign` and the SQL oracle's ``ORDER BY sim DESC,
    cid DESC``."""
    n_probe = min(n_probe, len(centroids))
    ordered = sorted(centroids, key=lambda c: -int(c[0]))
    cids = np.array([int(c) for c, _ in ordered], dtype=np.int64)
    cmat = np.array([v for _, v in ordered], dtype=np.float64)
    cmat_t = (cmat / np.linalg.norm(cmat, axis=1, keepdims=True)).T

    @pandas_udf(T.ArrayType(T.LongType()))
    def probes(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="object")
        x = _mat(v)
        sims = (x @ cmat_t) / np.linalg.norm(x, axis=1, keepdims=True)
        # argsort descending is stable on the id-descending column order,
        # reproducing the (sim DESC, cid DESC) tiebreak
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(cids[top]))

    return df.withColumn(out_col, F.explode(probes(F.col(vec_col))))


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    k: int,
    iters: int = 10,
    sample_limit: int = 65536,
    id_col: str | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's k-means codebook over a bounded sample.

    The codebook is a DIM TABLE (k × dim floats): training collects a
    driver-side sample — ordered by ``id_col`` when given so the sample is
    reproducible — and runs spherical k-means (cosine assignment, mean
    update, renormalize) in NumPy. At 10^9 vectors the sample bound keeps
    the collect constant-size; the expensive part of an IVF build is the
    full-corpus ASSIGNMENT, which stays the map-only batched argmax of
    :func:`ivf_assign`. Initialization is the first ``k`` sample vectors —
    deterministic, no RNG — so repeated builds (and resumed pipelines)
    produce byte-identical codebooks. Returns ``[(0, vec), ..., (k-1, vec)]``.
    """
    if k < 1:
        raise ValueError(f"train_ivf_centroids: k must be >= 1, got {k}")
    q = df.select(F.col(vec_col).alias("v"))
    if id_col is not None:
        q = df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v")).orderBy("i")
    rows = q.limit(sample_limit).collect()
    if len(rows) < k:
        raise ValueError(
            f"train_ivf_centroids: k={k} centroids need at least k sample "
            f"vectors, but the corpus sample has only {len(rows)} row(s) "
            f"(sample_limit={sample_limit}) — lower k or grow the corpus"
        )
    x = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    xn = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
    cent = xn[:k].copy()
    for _ in range(iters):
        sims = xn @ cent.T
        asg = np.argmax(sims, axis=1)
        for j in range(k):
            members = xn[asg == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    cent[j] = m / n
    return [(j, list(cent[j])) for j in range(k)]


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
    query_vec: str = "qe",
    cand_vec: str = "ce",
    n_probe: int = 1,
) -> DataFrame:
    """IVF search: exact cosine within the query's ``n_probe`` nearest
    posting lists. Candidates live in exactly ONE list (standard IVF), so
    multi-probe never duplicates a (query, neighbor) pair — recall rises
    with ``n_probe`` at proportional scan cost, the classic IVF knob."""
    qa = ivf_assign_probes(queries, centroids, query_vec, n_probe).withColumn(
        "__qn", l2_norm(F.col(query_vec))
    )
    ca = ivf_assign(spread(candidates), centroids, cand_vec).withColumn(
        "__cn", l2_norm(F.col(cand_vec))
    )
    # ANN serving shape: broadcast the small query batch; the posting lists
    # stay partitioned in place (no corpus shuffle) — see lsh_topk.
    # Norms precomputed per ROW (not per pair) — see brute_force_topk.
    sims = ca.join(F.broadcast(qa), "list_id").withColumn(
        "sim",
        dot(F.col(query_vec), F.col(cand_vec)) / (F.col("__qn") * F.col("__cn")),
    )
    return _topk(sims, k, query_id, cand_id)
