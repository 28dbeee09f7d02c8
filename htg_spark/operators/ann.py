"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. Dot products are computed
  with JVM higher-order functions (zip_with + aggregate) in strict
  left-to-right double precision, so results are bit-reproducible across
  engines (the DuckDB oracle uses list_reduce with the same fold order).
- LSH-bucketed ANN (the scale path): sign-bit buckets from fixed random
  hyperplanes; candidates searched within the query's bucket only. At
  10^12 rows the bucketed variant turns the O(N*Q) cross join into a
  bucket-equi-join; plane constants are deterministic (seeded) and shared
  with the SQL oracle.
- embedding near-dup: pairs above a cosine threshold (bit-reproducible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 16 sign bits -> 65,536 buckets per table. At corpus size N the bucket
# self-join is ~N^2/2^n_planes rows, so n_planes must grow with log2(N):
# 16 is sized for ~10^6-10^7 rows/table; at 10^9+ raise to 24-28. Recall is
# recovered by OR-ing several independent tables (hyperplane_tables), not by
# fewer bits.
N_PLANES = 16


def hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes; values quantized to 3
    decimals so literal embedding in SQL text is exact."""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 3) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def hyperplane_tables(
    dim: int, n_planes: int = 8, n_tables: int = 4, seed: int = 42
) -> list[list[list[float]]]:
    """Independent plane sets for multi-table LSH: a pair is a candidate if
    it collides in ANY table — P(miss) = (1 - p^r)^T drops geometrically in
    T while each table's bucket join stays selective."""
    if n_planes > 31:
        raise ValueError(
            f"hyperplane_tables: n_planes={n_planes} overflows the int32 "
            "bucket pack (max 31 sign bits per table)"
        )
    return [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]


def dot_expr(a: str, b: str) -> Column:
    """Strict left-to-right double dot product of two array columns.
    0.0 + x == x exactly, so a 0.0-seeded fold equals a first-element-seeded
    fold — this matches DuckDB's list_reduce bit-for-bit."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query row, the k nearest
    corpus rows (excluding self), ranked by cosine desc, ties by id asc."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    j = q.crossJoin(c).where(F.col("q_id") != F.col("n_id"))
    cos = (dot_expr("q_vec", "n_vec") / (norm_expr("q_vec") * norm_expr("n_vec"))).alias("cosine")
    scored = j.select("q_id", "n_id", cos)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Bucket id = sum over planes of (dot(vec, plane) > 0) << j."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    The bucket join replaces the cross join — this is the 100TB shape."""
    b = lsh_bucket_expr(vec_col, planes)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), b.alias("bucket"))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), b.alias("bucket"))
    j = q.join(c, "bucket").where(F.col("q_id") != F.col("n_id"))
    cos = (dot_expr("q_vec", "n_vec") / (norm_expr("q_vec") * norm_expr("n_vec"))).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        j.select("q_id", "n_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


def lsh_topk_multi(
    emb: DataFrame,
    queries: DataFrame,
    tables: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table approximate top-k: candidates from ANY table's bucket
    collision (union + dedup), exact cosine rank on candidates only. Recall
    rises geometrically with table count at constant per-table join cost.

    Hot path is Arrow-batched (lsh_buckets_udf computes all T buckets in
    one vectorized call; cosine_udf ranks candidates) — bit-identical to
    the retained expression forms (lsh_bucket_expr / dot_expr), which stay
    as the SQL-oracle parity reference. T x planes inlined HOF folds were
    both a Catalyst planning cliff and interpreted per row at execution
    (CodegenFallback, no CSE)."""
    bkcol = lsh_buckets_udf(tables)
    # ONE posexplode into (table, bucket) keys + a single equi-join on
    # (t, bk) replaces T unioned self-join branches (the band_keys /
    # simhash restructure): shuffle volume is identical — each vector
    # crosses T times either way — but the plan has one join stage
    # instead of T, and each side is referenced exactly once, so the
    # bucket UDF needs no checkpoint to avoid re-scanning the corpus.
    qk = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.posexplode(bkcol(F.col(vec_col))).alias("t", "bk"),
    )
    ck = emb.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        F.posexplode(bkcol(F.col(vec_col))).alias("t", "bk"),
    )
    cand = (
        qk.join(ck, ["t", "bk"])
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_vec", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
    )
    cos = cosine_udf()(F.col("q_vec"), F.col("n_vec")).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        cand.select("q_id", "n_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


N_CENTROIDS = 16


def ivf_centroids(dim: int, k: int = N_CENTROIDS, seed: int = 7) -> list[list[float]]:
    """Deterministic IVF 'coarse quantizer' centroids. Seeded and quantized
    to 3 decimals so the SQL oracle can embed them as literals. (With a
    trained model you would plug train_centroids() output here; the routing,
    bucketing and probe plumbing below is identical either way.)"""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 3) for x in rng.standard_normal(dim)] for _ in range(k)]


def train_centroids(
    sample: np.ndarray, k: int = N_CENTROIDS, iters: int = 10, seed: int = 7
) -> list[list[float]]:
    """Lloyd's k-means on a driver-side SAMPLE (bound the sample, not the
    corpus: at 100 TB you train on ~100k sampled rows and broadcast the
    centroids — the cluster-side cost is only the assignment pass).
    Deterministic: seeded init, fixed iteration count, values quantized to
    3 decimals so they can be embedded as SQL literals."""
    x = np.asarray(sample, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return [[round(float(v), 3) for v in c] for c in cents]


def ivf_assign_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """Assigned list = argmax over centroids of dot(vec, centroid); ties go
    to the lowest centroid index (deterministic, SQL-mirrorable)."""
    dots = _centroid_dots(vec_col, centroids)
    best = F.greatest(*dots)
    assigned = F.lit(None).cast("int")
    for i in reversed(range(len(centroids))):
        assigned = F.when(dots[i] == best, F.lit(i)).otherwise(assigned)
    return assigned


def _centroid_dots(vec_col: str, centroids: list[list[float]]) -> list[Column]:
    dots = []
    for c in centroids:
        arr = F.array(*[F.lit(float(v)) for v in c])
        dots.append(
            F.aggregate(
                F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return dots


def ivf_probe_expr(vec_col: str, centroids: list[list[float]], nprobe: int) -> Column:
    """The `nprobe` centroid indices with the highest dots, ties by lowest
    index (array<int>, deterministic, SQL-mirrorable via row_number)."""
    dots = _centroid_dots(vec_col, centroids)
    # sort desc on (dot, -idx): dot desc, then idx asc on exact ties
    entries = F.array(
        *[F.struct(d.alias("d"), F.lit(-i).alias("ni")) for i, d in enumerate(dots)]
    )
    top = F.slice(F.sort_array(entries, asc=False), 1, nprobe)
    return F.transform(top, lambda s: -s["ni"])


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus rows are bucketed by nearest centroid (inverted
    lists = partitioned layout); each query probes its `nprobe` nearest
    lists. The list equi-join is the 100TB shape — probing more lists
    multiplies candidates by nprobe/C, never by N.

    Hot path is Arrow-batched (ivf_assign_udf / ivf_probe_udf /
    cosine_udf) — bit-identical to the retained expression forms
    (ivf_assign_expr / ivf_probe_expr / dot_expr), which stay as the
    SQL-oracle parity reference; k inlined centroid-dot HOF folds were a
    Catalyst planning cliff AND interpreted per corpus row at execution
    (CodegenFallback) — minutes at k=128 over 10^5 rows, where the
    vectorized assignment is sub-second."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(ivf_probe_udf(centroids, nprobe)(F.col(vec_col))).alias("lst"),
    )
    c = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        ivf_assign_udf(centroids)(F.col(vec_col)).alias("lst"),
    )
    j = q.join(c, "lst").where(F.col("q_id") != F.col("n_id"))
    cos = cosine_udf()(F.col("q_vec"), F.col("n_vec")).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        j.select("q_id", "n_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


# -- product quantization (IVF-PQ, asymmetric distance) ----------------------

N_PQ_SUB = 8  # subspaces: dim 64 -> 8 dims per sub-codebook
# codes per sub-codebook: 16 (4-bit) keeps the fixture-scale SQL oracle
# tractable; the classic at-scale setting is 256 (8-bit) — params_for's rule.
N_PQ_CODES = 16


def pq_codebooks(
    dim: int, m: int = N_PQ_SUB, k: int = N_PQ_CODES, seed: int = 11
) -> list[list[list[float]]]:
    """Deterministic per-subspace codebooks (m x k x dim/m), quantized to 3
    decimals for SQL-literal parity (same convention as ivf_centroids).
    Plug train_pq() output for a data-trained quantizer — the encode/ADC
    plumbing is identical either way."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} must divide evenly into m={m} subspaces")
    rng = np.random.default_rng(seed)
    d = dim // m
    return [
        [[round(float(x), 3) for x in rng.standard_normal(d)] for _ in range(k)]
        for _ in range(m)
    ]


def train_pq(
    sample: np.ndarray, m: int = N_PQ_SUB, k: int = N_PQ_CODES, iters: int = 10, seed: int = 11
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means on a driver-side SAMPLE (the same
    bounded-sample contract as train_centroids: at 100 TB you train on
    ~100k sampled rows and broadcast m*k tiny sub-centroids)."""
    x = np.asarray(sample, dtype=np.float64)
    if x.shape[1] % m != 0:
        raise ValueError(f"dim={x.shape[1]} must divide evenly into m={m} subspaces")
    d = x.shape[1] // m
    return [
        train_centroids(x[:, j * d : (j + 1) * d], k=k, iters=iters, seed=seed + j)
        for j in range(m)
    ]


def _sub_sqdist(vec_col: str, j: int, d: int, centroid: list[float]) -> Column:
    """Squared L2 distance between subvector j of `vec_col` and a centroid
    literal; strict left-to-right double fold (bit-reproducible vs DuckDB
    list_reduce — 0.0 + x == x)."""
    sub = F.slice(F.col(vec_col), j * d + 1, d)
    arr = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(
            sub, arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode_expr(vec_col: str, codebooks: list[list[list[float]]]) -> Column:
    """PQ codes as array<int> of length m: per subspace, the index of the
    nearest sub-centroid (first index on exact ties — array_position of
    array_min, bit-identical to DuckDB list_position/list_min). The encoded
    corpus carries m small ints per vector instead of the full embedding —
    the memory step that makes 10^9+-row search feasible."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    codes = []
    for j in range(m):
        darr = F.array(*[_sub_sqdist(vec_col, j, d, c) for c in codebooks[j]])
        codes.append((F.array_position(darr, F.array_min(darr)) - 1).cast("int"))
    return F.array(*codes)


def pq_lut_expr(vec_col: str, codebooks: list[list[list[float]]]) -> Column:
    """Flattened m*k ADC lookup table for a QUERY vector:
    lut[j*k + i] = ||query_sub_j - codebook[j][i]||^2 (0-based layout)."""
    d = len(codebooks[0][0])
    return F.array(
        *[
            _sub_sqdist(vec_col, j, d, c)
            for j, book in enumerate(codebooks)
            for c in book
        ]
    )


def _np_pair_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-paired dot products (n,) accumulated with an EXPLICIT
    left-to-right loop over the dimension — bit-identical to dot_expr's
    0.0-seeded fold (NumPy .sum()/einsum would pairwise-reorder the
    adds)."""
    acc = np.zeros(len(a), dtype=np.float64)
    for t in range(a.shape[1]):
        acc += a[:, t] * b[:, t]
    return acc


def cosine_udf():
    """Arrow-batched cosine of two array columns — bit-identical to
    dot_expr/norm_expr (explicit left-to-right folds, same division
    order). The vectorized rank path for candidate sets large enough that
    interpreted HOF folds dominate (HOFs are CodegenFallback)."""

    @F.pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.stack([np.asarray(x, dtype=np.float64) for x in va])
        b = np.stack([np.asarray(x, dtype=np.float64) for x in vb])
        dot = _np_pair_dot(a, b)
        na = np.sqrt(_np_pair_dot(a, a))
        nb = np.sqrt(_np_pair_dot(b, b))
        return pd.Series(dot / (na * nb))

    return cos


def lsh_buckets_udf(tables: list[list[list[float]]]):
    """Arrow-batched multi-table LSH bucket ids: array<int> of one bucket
    per table — bit-identical to lsh_bucket_expr per table (the sign test
    uses the same left-to-right dot; the bit-pack is exact integer math).
    One UDF call replaces T x planes inlined fold expressions."""
    mats = [np.asarray(p, dtype=np.float64) for p in tables]
    # >31 planes would silently wrap the int32 bit-pack here while the
    # lsh_bucket_expr parity reference raises on the ANSI int cast — make
    # the divergence impossible rather than silent (params_for caps at 28)
    for m in mats:
        if m.shape[0] > 31:
            raise ValueError(
                f"lsh_buckets_udf: {m.shape[0]} planes in one table "
                "overflows the int32 bucket pack (max 31)"
            )

    @F.pandas_udf("array<int>")
    def bk(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(a, dtype=np.float64) for a in v])
        cols = []
        for m in mats:
            d = _np_dots(x, m)
            bits = ((d > 0) * (1 << np.arange(m.shape[0]))[None, :]).sum(axis=1)
            cols.append(bits.astype(np.int32))
        arr = np.stack(cols, axis=1)
        return pd.Series(list(arr))

    return bk


def _np_dots(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) dot products accumulated with an EXPLICIT left-to-right loop
    over the dimension — same order as the _centroid_dots fold expressions
    and the DuckDB list_reduce (a BLAS matmul would reorder the adds)."""
    acc = np.zeros((mat.shape[0], cents.shape[0]), dtype=np.float64)
    for t in range(cents.shape[1]):
        acc += mat[:, None, t] * cents[None, :, t]
    return acc


def ivf_assign_udf(centroids: list[list[float]]):
    """Arrow-batched IVF list assignment (argmax dot, first index on ties)
    — bit-identical to ivf_assign_expr; the vectorized path for plans that
    would otherwise pay Catalyst seconds compiling k inlined fold
    expressions (see pq_encode_udf)."""
    c = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack([np.asarray(a, dtype=np.float64) for a in v])
        return pd.Series(_np_dots(x, c).argmax(axis=1).astype(np.int32))

    return assign


def ivf_probe_udf(centroids: list[list[float]], nprobe: int):
    """Arrow-batched probe lists: the nprobe centroid indices with the
    highest dots, ties by lowest index — bit-identical to
    ivf_probe_expr."""
    c = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(a, dtype=np.float64) for a in v])
        d = _np_dots(x, c)
        idx = np.arange(c.shape[0])
        out = []
        for row in d:
            order = np.lexsort((idx, -row))  # dot desc, index asc on ties
            out.append(order[:nprobe].astype(np.int32))
        return pd.Series(out)

    return probe


def _np_sub_sqdists(mat: np.ndarray, book: np.ndarray) -> np.ndarray:
    """(n, k) squared distances between n subvectors and k sub-centroids,
    accumulated with an EXPLICIT left-to-right loop over the sub-dimension
    so every float add happens in the same order as the Spark/DuckDB fold
    expressions (NumPy's .sum() would use pairwise summation and could
    diverge by an ulp)."""
    acc = np.zeros((mat.shape[0], book.shape[0]), dtype=np.float64)
    for t in range(book.shape[1]):
        diff = mat[:, None, t] - book[None, :, t]
        acc += diff * diff
    return acc


def pq_encode_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched PQ encoder: vectorized NumPy argmin per subspace.

    Why a pandas UDF and not pq_encode_expr: the expression form inlines
    m*k aggregate lambdas (argmin doubles that), and Catalyst's
    planning/codegen time on that tree is ~10 s PER QUERY regardless of
    row count — at the k=256 scale setting it would be 2048 lambdas and
    unplannable. This is the brief's sanctioned pandas-UDF case: the
    built-in expression language cannot express a k-way argmin without
    materializing k folds. Bit-identical to pq_encode_expr (asserted in
    tests) and to the DuckDB oracle (explicit-order accumulation)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(a, dtype=np.float64) for a in v])
        d = books[0].shape[1]
        codes = np.stack(
            [
                _np_sub_sqdists(x[:, j * d : (j + 1) * d], books[j]).argmin(axis=1)
                for j in range(len(books))
            ],
            axis=1,
        ).astype(np.int32)
        return pd.Series(list(codes))

    return enc


def pq_lut_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched ADC lookup-table builder for query vectors: flattened
    m*k array, lut[j*k + i] = ||q_sub_j - codebook[j][i]||^2 (same layout
    and accumulation order as pq_lut_expr / the SQL oracle)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @F.pandas_udf("array<double>")
    def lut(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(a, dtype=np.float64) for a in v])
        d = books[0].shape[1]
        flat = np.concatenate(
            [
                _np_sub_sqdists(x[:, j * d : (j + 1) * d], books[j])
                for j in range(len(books))
            ],
            axis=1,
        )
        return pd.Series(list(flat))

    return lut


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search with Asymmetric Distance Computation (Jegou et al.,
    'Product Quantization for Nearest Neighbor Search'): corpus rows carry
    only (inverted-list id, m PQ codes); each query probes its `nprobe`
    lists and ranks candidates by ADC = sum over subspaces of
    lut[j*k + code_j] — per-candidate cost is m table lookups, no vector
    math, and the corpus side of the join is ~m bytes/vector. This is the
    complement of ivf_topk for the regime where even the raw embedding
    column is too wide to shuffle. Output: (q_id, rank, n_id, adc) ranked
    by ascending approximate squared L2 distance, ties by n_id."""
    m = len(codebooks)
    kk = len(codebooks[0])
    c = emb.select(
        F.col(id_col).alias("n_id"),
        ivf_assign_udf(centroids)(F.col(vec_col)).alias("lst"),
        pq_encode_udf(codebooks)(F.col(vec_col)).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        pq_lut_udf(codebooks)(F.col(vec_col)).alias("lut"),
        F.explode(ivf_probe_udf(centroids, nprobe)(F.col(vec_col))).alias("lst"),
    )
    j = q.join(c, "lst").where(F.col("q_id") != F.col("n_id"))
    adc = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.col("codes"),
            lambda jj, cc: F.element_at(F.col("lut"), jj * kk + cc + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("n_id").asc())
    return (
        j.select("q_id", "n_id", adc.alias("adc"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "adc")
    )


def near_dup_pairs(
    emb: DataFrame,
    tables: list[list[list[float]]],
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= thr)
    via multi-table LSH candidate generation — the 100-TB shape.

    Candidates = union over tables of same-bucket self-equi-joins (never a
    cross join); the exact cosine threshold then runs on candidates only.
    At threshold ~0.999 the per-plane collision probability is ~0.986, so
    4 tables x 8 planes give P(miss) = (1 - 0.986^8)^4 ~ 1e-4; exact scalar
    multiples collide in every table. Recall vs the brute-force baseline is
    asserted in tests/test_pipeline_ops.py.

    Hot path follows lsh_topk_multi: ONE Arrow-batched lsh_buckets_udf call
    computes all T buckets and the frame is lazily localCheckpoint'ed —
    both self-join sides of every table branch (2T references, and Spark
    has no cross-branch subtree reuse) read the materialized blocks instead
    of re-running the bucket computation over the corpus per branch, and
    cosine_udf ranks candidates vectorized. Both UDFs are bit-identical to
    the retained expression forms (lsh_bucket_expr / dot_expr — the SQL-
    oracle parity references); the interleaved A/B at sf0.1 read 4.47 ->
    1.18 s with the identical pair set."""
    bkcol = lsh_buckets_udf(tables)
    # ONE posexplode into (table, bucket) keys + a single self-equi-join
    # on (t, bk) replaces the T unioned branches (see lsh_topk_multi) —
    # one join stage, both sides reading one checkpoint of the single
    # Arrow-batched bucket computation (2 references, so the checkpoint
    # still pays for itself).
    base = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        bkcol(F.col(vec_col)).alias("bks"),
    ).localCheckpoint(eager=False)  # pre-explode: stored rows stay 1x, not Tx
    basek = base.select(
        "_id", "_v", F.posexplode("bks").alias("t", "bk")
    )
    a = basek.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"), "t", "bk"
    )
    b = basek.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "t", "bk"
    )
    cand = (
        a.join(b, ["t", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = cosine_udf()(F.col("va"), F.col("vb")).alias("cosine")
    return cand.select("id_a", "id_b", cos).where(F.col("cosine") >= threshold)


def semdedup(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 1024,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, 'SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication'): semantic near-duplicate
    PRUNING over an embedding corpus — cluster every vector to its nearest
    centroid (max dot product, the IVF coarse quantizer), then within each
    cluster drop any vector that has an EARLIER (lower-id) cluster member
    with cosine >= threshold. Greedy by id order, exactly the published
    keep-one-per-duplicate-neighborhood rule made deterministic: the
    lowest-id member of every dup neighborhood survives, and a dropped
    member still shadows later ones (no transitive-closure pass — matching
    the reference algorithm, which prunes per pairwise check, not per
    connected component).

    Scale shape (the published one): the pairwise pass runs WITHIN clusters
    only — k centroids cut the O(N^2) global matrix to sum over clusters of
    c_i^2, with E[c] = N/k (k from params_for grows ~sqrt(N)). One hash
    Exchange on the cluster id is the only shuffle; the embedding column
    crosses it exactly once, pair rows NEVER materialize in any shuffle —
    each cluster's pairwise cosines are computed inside applyInPandas as a
    blocked (block x cluster) NumPy accumulation (memory bounded by
    block*c doubles, not c^2) and only the per-member verdict row leaves
    the worker. A pathologically skewed cluster is the algorithm's own
    limit (the matrix needs the whole cluster); the centroid count is the
    knob, exactly as in the paper.

    Bit parity: dots and norms accumulate left-to-right over the dimension
    (same order as dot_expr / cosine_udf / DuckDB list_reduce) and the
    cosine divides dot by (norm_a * norm_b) — so every cosine is
    bit-identical across engines and the threshold compare cannot straddle
    an ulp. Centroid assignment is ivf_assign_udf (argmax dot, first index
    wins ties) — the ann_ivf_topk-oracled kernel.

    Output: (vec_id, cluster, n_earlier_dups, max_earlier_cos, is_kept)
    where n_earlier_dups counts lower-id same-cluster members with cosine
    >= threshold, max_earlier_cos is the max cosine to ANY lower-id member
    (NULL for the cluster's first member), is_kept = n_earlier_dups == 0.
    """
    thr = float(threshold)
    id_type = dict(emb.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, cluster int, n_earlier_dups long, "
        "max_earlier_cos double, is_kept boolean"
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        c = len(pdf)
        if c == 0:
            return pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": pdf["cluster"],
                    "n_earlier_dups": pd.Series([], dtype="int64"),
                    "max_earlier_cos": pd.Series([], dtype="float64"),
                    "is_kept": pd.Series([], dtype="bool"),
                }
            )
        x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.sqrt(_np_pair_dot(x, x))
        n_dups = np.zeros(c, dtype=np.int64)
        max_cos = np.full(c, np.nan)
        for i0 in range(1, c, block):
            i1 = min(i0 + block, c)
            # dots of rows [i0, i1) against ALL rows [0, i1) — explicit
            # left-to-right accumulation over the dimension (see _np_dots)
            acc = np.zeros((i1 - i0, i1), dtype=np.float64)
            for t in range(x.shape[1]):
                acc += x[i0:i1, None, t] * x[None, :i1, t]
            cos = acc / (norms[i0:i1, None] * norms[None, :i1])
            # member i compares against j < i only (strictly earlier ids)
            mask = np.arange(i1)[None, :] < np.arange(i0, i1)[:, None]
            n_dups[i0:i1] = ((cos >= thr) & mask).sum(axis=1)
            max_cos[i0:i1] = np.where(mask, cos, -np.inf).max(axis=1)
        out = pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["cluster"],
                "n_earlier_dups": n_dups,
                "max_earlier_cos": max_cos,
                "is_kept": n_dups == 0,
            }
        )
        return out

    assigned = emb.select(
        id_col,
        vec_col,
        ivf_assign_udf(centroids)(F.col(vec_col)).alias("cluster"),
    )
    return assigned.groupBy("cluster").applyInPandas(prune, schema)


def near_dup_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact baseline (O(N^2) crossJoin) — for recall assertions
    on small fixtures ONLY; never run this at corpus scale."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    j = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = (dot_expr("va", "vb") / (norm_expr("va") * norm_expr("vb"))).alias("cosine")
    return j.select("id_a", "id_b", cos).where(F.col("cosine") >= threshold)
