"""Deduplication operators for web-scale corpora.

- exact dedup: md5 hash-groupBy (one shuffle on the 16-byte hash, not the text)
- MinHash + LSH: word-bigram shingles -> k md5-derived min-hashes -> banded
  signatures -> candidate pairs via band-bucket self-join -> exact Jaccard
  verification. Every hash is md5-based so the pipeline is engine-portable
  (the DuckDB oracles in driver_queries recompute it identically).
- SimHash: 60-bit signature from per-token md5 nibbles, majority vote per
  bit — near-dup candidates = identical signatures (or small hamming radius).

Scale notes: the minhash/LSH stages are shuffle-on-small-keys — text leaves
the scan only as shingle hashes there. The exact-verify stage is the one
deliberate exception: it moves each CANDIDATE doc's distinct raw shingles
(~2x its text bytes, see jaccard_verify) so the Jaccard contract stays
collision-free. At 10^12 rows the band-bucket join is the classic skew
point — bucket sizes are capped by construction (identical boilerplate
shingles collapse to one hash per doc), and the verify join runs on
candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_MINHASH = 4  # 2 bands x 2 rows

# MinHash affine family h_j(x) = (a_j * x + b_j) mod P over ONE base hash
# per shingle reduced into [0, P) (the Spark MLlib MinHashLSH
# construction). P is the Mersenne prime 2^31-1: with x < P and a_j < P
# the product stays under 2^62 (no ANSI long overflow in Spark, no BIGINT
# overflow in DuckDB; `%` on the positive sum equals pmod in both
# engines), and a_j*x wraps the modulus ~2^31 times, so each h_j is a
# well-mixed permutation. A first attempt used P = 2^61-1 with a 32-bit
# x: a_j*x+b_j then wraps AT MOST TWICE, the map is piecewise
# order-preserving in x, the argmin shingle correlates across all j — and
# the LSH candidate count doubled at sf0.01. x must live in [0, P) for
# the family to mix.
MINHASH_PRIME = (1 << 31) - 1


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the affine MinHash family —
    md5-seeded so any engine (the DuckDB oracles included) can re-derive
    or inline them as literals; a_j in [1, P-1], b_j in [0, P-1]."""
    import hashlib

    p = MINHASH_PRIME
    out = []
    for j in range(k):
        a = int(hashlib.md5(f"a{j}".encode()).hexdigest()[:8], 16) % (p - 1) + 1
        b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:8], 16) % p
        out.append((a, b))
    return out


def bigrams_expr(toks: Column) -> Column:
    """Word-bigram shingles from an ALREADY-MATERIALIZED token array column.

    The token array must be projected once (e.g. `.select(split(text))`)
    before this expression: higher-order-function lambdas are interpreted
    with no common-subexpression elimination, so inlining `split(text)`
    inside the lambda re-tokenizes the document for every element —
    O(tokens^2) per doc (this was an 80x slowdown at 5k docs). Delegates
    to the general n-gram builder (ONE home for the slice/zip_with
    construction)."""
    from .text import ngram_expr

    return ngram_expr(toks, 2)


def _shingles(
    df: DataFrame, id_col: str, text_col: str, distinct: bool = True
) -> DataFrame:
    """Word-bigram shingles per document; distinct=True gives SET semantics
    (needed wherever shingles are COUNTED, e.g. Jaccard). Min-hash callers
    pass distinct=False: min(md5) over the multiset equals min over the set,
    so the distinct's full-shingle shuffle is pure waste there."""
    toks = df.select(id_col, F.split(F.col(text_col), " ").alias("_toks"))
    out = toks.select(id_col, F.explode(bigrams_expr(F.col("_toks"))).alias("shingle"))
    return out.dropDuplicates([id_col, "shingle"]) if distinct else out


def shingle_stream(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Public multiset (id, shingle) stream for composed pipelines: build
    it ONCE and pass it to minhash_signatures AND jaccard_verify via their
    `shingles` parameter so the corpus is scanned and tokenized once
    instead of once per consumer. The lazy localCheckpoint lives HERE so
    the sharing contract cannot be silently lost at a call site — the
    first consumer's action materializes it, every later consumer reads
    the blocks (Spark has no cross-branch subtree reuse)."""
    return _shingles(df, id_col, text_col, distinct=False).localCheckpoint(eager=False)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (id, grp_hash, grp_size, is_canonical).
    Canonical = lowest id in the group."""
    h = F.md5(F.encode(F.col(text_col), "UTF-8")).alias("grp_hash")
    w = Window.partitionBy("grp_hash")
    return (
        df.select(id_col, h)
        .withColumn("grp_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(w))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = N_MINHASH,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """k min-hash values per document over bigram shingles, from the
    affine family h_j(x) = (a_j * x + b_j) mod (2^31 - 1) where x is ONE
    md5-prefix base hash per shingle (conv of the first 8 hex chars —
    exact, 16^8 < 2^63 — reduced mod P); signature_j = min over shingles.

    Hashing cost is FLAT in k: one md5 per shingle plus k integer affine
    transforms. The previous family h_j(s) = md5(j || ':' || s) paid k
    full md5s per shingle — at params_for's production sizes (k = 16 at
    10^6-10^12 rows, 36 beyond) that is a 16-36x multiplier on the
    dominant hashing stage; this is the same construction Spark MLlib's
    MinHashLSH uses (one base hash, k affine perturbations). Plan: ONE
    shuffle (the map-side-combined min agg); no distinct pass — min over
    repeated shingles equals min over the shingle set.

    `shingles` lets a composed pipeline share ONE (id, shingle) explosion
    (multiset semantics, e.g. dedup.shingle_stream) between this and
    jaccard_verify — otherwise each derives its own and the corpus subtree
    is scanned+tokenized once per consumer (Spark has no cross-branch
    subtree reuse). Default None recomputes: at 10^12-row scale
    materializing ~2x the corpus bytes is a storage trade the caller must
    opt into."""
    sh = shingles if shingles is not None else _shingles(df, id_col, text_col, distinct=False)
    x = F.pmod(
        F.conv(F.substring(F.md5(F.encode(F.col("shingle"), "UTF-8")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(MINHASH_PRIME),
    )
    shx = sh.select(id_col, x.alias("x"))
    aggs = [
        F.min(
            F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(MINHASH_PRIME))
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(minhash_coeffs(k))
    ]
    return shx.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", k: int = N_MINHASH, band_rows: int = 2
) -> DataFrame:
    """Banded LSH: docs sharing any full band of min-hashes become a
    candidate pair (id_a < id_b, deduped across bands).

    Plan shape: ONE band_keys explode into (id, band_id, band_key) rows
    and a single self-equi-join on BOTH key columns — the same candidate
    set as the previous n_bands unioned self-join branches (a pair shares
    band b iff its rows join at band_id = b) at one join stage instead of
    n_bands, with the same shuffle volume (n_bands rows per doc either
    way). Same restructure as ann.lsh_topk_multi's posexplode form.

    The signature frame feeds both self-join sides through the explode
    and Spark SQL has no cross-branch subtree reuse, so without
    materialization the minhash aggregation (and the document scan under
    it) executes twice. A LAZY localCheckpoint makes both sides share one
    computation — no extra job (the first action materializes it) and the
    blocks are GC-released with the frame; checkpointing the compact
    signatures (k longs/doc) rather than the exploded band rows keeps the
    materialized state minimal, the explode re-runs as a narrow map per
    side."""
    sigs = sigs.localCheckpoint(eager=False)
    bands = band_keys(sigs, id_col=id_col, k=k, band_rows=band_rows)
    a = bands.select(F.col(id_col).alias("id_a"), "band_id", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact bigram-set Jaccard for candidate pairs:
    (id_a, id_b, inter, union_n, jaccard, is_dup). `shingles` shares one
    multiset (id, shingle) explosion with minhash_signatures — see there.

    Plan shape: each doc's DISTINCT shingles are pre-aggregated into one
    array row, and the pair frame hash-joins that array table twice (by
    id_a, then id_b); the intersection is computed per pair in-operator
    with array_intersect (hash-set build, O(|A|+|B|)) and the set sizes
    come free as size(arr). This replaces the exploded pairs-x-shingles
    intermediate (sum over pairs of |shingles(id_a)| rows, shuffled AGAIN
    for its groupBy) that a join-count formulation pays — benched 1.4x
    faster end-to-end at sf0.1 with bit-identical output. Shuffle volume
    is the same bytes (pair rows carry the arrays instead), but one whole
    shuffle + aggregate disappears and `pairs` is referenced exactly ONCE,
    so the upstream LSH band self-join subtree needs no checkpoint here.

    Scale notes: the array table is one row per doc (corpus-sized, the
    same scale as the signature table) and a doc's shingle array holds its
    RAW distinct bigram strings — each token appears in ~2 bigrams, so the
    row payload is ~2x the doc's text bytes (a 10 MB outlier doc becomes a
    ~20 MB row through the pair join; exact verification deliberately
    keeps strings, not hashes, so the Jaccard contract stays collision-
    free and oracle-portable). Intersections stay candidate-driven, never
    shingle-driven, so a high-document-frequency boilerplate shingle
    cannot quadratically explode the join the way a shingle-keyed
    self-join would. The set semantics come from collect_set over the
    NON-distinct shingle stream — dedup happens in the map-side partial
    aggregate, so the exploded shingles are shuffled once (by id), not
    twice (a dropDuplicates([id, shingle]) pre-pass costs a second
    corpus-wide shuffle for nothing). `arrs` feeds both join sides and
    Spark SQL has no cross-branch subtree reuse, hence the lazy
    localCheckpoint (see lsh_candidate_pairs)."""
    sh = shingles if shingles is not None else _shingles(df, id_col, text_col, distinct=False)
    arrs = sh.groupBy(id_col).agg(
        F.collect_set("shingle").alias("arr")
    ).localCheckpoint(eager=False)
    a = arrs.select(F.col(id_col).alias("id_a"), F.col("arr").alias("arr_a"))
    b = arrs.select(F.col(id_col).alias("id_b"), F.col("arr").alias("arr_b"))
    inter = F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b"))).cast("long")
    n_a = F.size(F.col("arr_a")).cast("long")
    n_b = F.size(F.col("arr_b")).cast("long")
    jac = inter.cast("double") / (n_a + n_b - inter).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            (n_a + n_b - inter).alias("union_n"),
            jac.alias("jaccard"),
            (jac >= threshold).alias("is_dup"),
        )
    )


def band_keys(
    sigs: DataFrame, id_col: str = "doc_id", k: int = N_MINHASH, band_rows: int = 2
) -> DataFrame:
    """(id, band_id, band_key) — the banded-LSH index rows for a signature
    frame, as ONE exploded plan branch (an array-of-structs explode, the
    simhash_near_dup restructure) instead of n_bands unioned branches.
    This is the frame a production pipeline PERSISTS as the corpus's dedup
    index (bucketed by (band_id, band_key), points_store.write_bucketed)
    so each incoming batch joins it with zero index-side shuffle."""
    if k % band_rows != 0:
        raise ValueError(
            f"k={k} must be divisible by band_rows={band_rows} — a remainder "
            "would silently drop the trailing minhash columns and reduce recall"
        )
    n_bands = k // band_rows
    entries = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "|", *[f"mh{j}" for j in range(b * band_rows, (b + 1) * band_rows)]
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return sigs.select(
        id_col, F.explode(F.array(*entries)).alias("_b")
    ).select(id_col, F.col("_b.band_id").alias("band_id"), F.col("_b.band_key").alias("band_key"))


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = N_MINHASH,
    band_rows: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental ingestion dedup: flag each NEW-batch document against an
    EXISTING corpus without ever comparing corpus x corpus — the production
    shape for continuous crawl ingestion, where the corpus is already
    deduped and only the increment needs verdicts.

    Output, one row per batch doc:
      (id, exact_dup_of, near_dup_of, near_jaccard, is_novel)
    - exact_dup_of: lowest corpus id with byte-identical text (md5 join)
    - near_dup_of: lowest corpus id among LSH band-collision candidates
      whose exact bigram-set Jaccard >= threshold (NULL if none)
    - near_jaccard: the Jaccard of that chosen pair (deterministic: the
      pick is by lowest corpus id, via a struct-min — no tie ambiguity)
    - is_novel: neither verdict fired

    Scale shape: every corpus-sized stage here (md5 exact index, minhash
    signatures, band keys, shingle arrays) is WRITE-ONCE state in a real
    deployment — maintained incrementally as batches are admitted, stored
    bucketed on its join key (band_keys docstring) so the per-batch cost
    is batch-sized: batch bands equi-join the index, candidates are
    (batch x colliding-corpus) pairs only, and the exact verify moves
    shingle arrays for candidate ids alone (semi-join prune on the corpus
    array table). Nothing in the plan is quadratic in the corpus, and
    re-submitting an already-admitted batch is idempotent: every row
    resolves to an exact dup of its corpus canonical, never a novel."""
    bid, cid = f"b_{id_col}", f"c_{id_col}"
    # exact index: one row per distinct corpus text (min id = canonical)
    ex_idx = (
        corpus.select(
            F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_h"), F.col(id_col)
        )
        .groupBy("_h")
        .agg(F.min(id_col).alias("exact_dup_of"))
    )
    bex = batch.select(
        F.col(id_col).alias(bid), F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_h")
    ).join(ex_idx, "_h", "left").select(bid, "exact_dup_of")

    # near index: corpus signatures -> band keys; batch side mirrors it
    sh_c = shingle_stream(corpus, id_col=id_col, text_col=text_col)
    sh_b = shingle_stream(batch, id_col=id_col, text_col=text_col)
    bands_c = band_keys(
        minhash_signatures(corpus, id_col=id_col, shingles=sh_c, k=k),
        id_col=id_col, k=k, band_rows=band_rows,
    ).select(F.col(id_col).alias(cid), "band_id", "band_key")
    bands_b = band_keys(
        minhash_signatures(batch, id_col=id_col, shingles=sh_b, k=k),
        id_col=id_col, k=k, band_rows=band_rows,
    ).select(F.col(id_col).alias(bid), "band_id", "band_key")
    cand = (
        bands_b.join(bands_c, ["band_id", "band_key"])
        .select(bid, cid)
        .dropDuplicates([bid, cid])
    )

    # exact verify on candidates: per-doc distinct shingle arrays, batch
    # side joined by batch id, corpus side semi-pruned to candidate ids
    arr_c = (
        sh_c.join(cand.select(cid).distinct(), sh_c[id_col] == F.col(cid), "leftsemi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("arr_c"))
        .select(F.col(id_col).alias(cid), "arr_c")
    )
    arr_b = sh_b.groupBy(id_col).agg(F.collect_set("shingle").alias("arr_b")).select(
        F.col(id_col).alias(bid), "arr_b"
    )
    inter = F.size(F.array_intersect(F.col("arr_b"), F.col("arr_c"))).cast("long")
    n_b = F.size(F.col("arr_b")).cast("long")
    n_c = F.size(F.col("arr_c")).cast("long")
    jac = inter.cast("double") / (n_b + n_c - inter).cast("double")
    verified = (
        cand.join(arr_b, bid)
        .join(arr_c, cid)
        .select(bid, cid, jac.alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    near = verified.groupBy(bid).agg(
        F.min(F.struct(F.col(cid), F.col("jaccard"))).alias("_pick")
    ).select(
        bid,
        F.col(f"_pick.{cid}").alias("near_dup_of"),
        F.col("_pick.jaccard").alias("near_jaccard"),
    )

    out = (
        batch.select(F.col(id_col).alias(bid))
        .join(bex, bid, "left")
        .join(near, bid, "left")
    )
    return out.select(
        F.col(bid).alias(id_col),
        "exact_dup_of",
        "near_dup_of",
        "near_jaccard",
        (F.col("exact_dup_of").isNull() & F.col("near_dup_of").isNull()).alias(
            "is_novel"
        ),
    )


def jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    threshold_num: int = 3,
    threshold_den: int = 5,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard similarity join via document-frequency-
    ordered prefix filtering (the AllPairs/PPJoin family — Bayardo WWW'07,
    Xiao WWW'08): returns EVERY pair (id_a < id_b) whose word n-gram SETS
    have Jaccard >= threshold_num/threshold_den, with no probabilistic miss.
    The deterministic complement to MinHash-LSH (`lsh_candidate_pairs`
    recalls ~threshold pairs with banding probability < 1): same contract,
    zero false negatives, the right tool when the dedup policy must be
    auditable ("ALL pairs above t were found").

    Prefix-filtering principle: under any global total order on n-grams, if
    J(A, B) >= t then the (|A| - ceil(t*|A|) + 1)-prefix of A and the
    corresponding prefix of B share at least one n-gram (J >= t implies
    |A inter B| >= ceil(t*|A|), and a set of that size cannot avoid the
    prefix by pigeonhole). Ordering by ASCENDING document frequency puts the
    RAREST n-grams in the prefixes, so the candidate equi-join fans out by
    prefix-df, not corpus size.

    Plan shape (the 100-TB contract): (1) distinct (id, n-gram) stream —
    per-row array_distinct, ZERO shuffle (ids are unique, one row per doc,
    so within-row dedup IS the global dedup); (2) vocabulary-sized df
    table — one map-side-combined groupBy; (3) df join-back + ONE window pass ranks each doc's n-grams
    rarest-first (row_number and the size count share one Exchange+Sort on
    id); (4) prefix rows self-equi-join on the n-gram — candidate volume =
    sum over n-grams of (prefix-df)^2, bounded by the df tail, never
    |docs|^2; a length filter (min size >= t * max size, exact integers)
    prunes inside the join; (5) exact verify via jaccard_verify's per-doc
    array join. Raw text never shuffles except as each doc's distinct-
    n-gram array in the verify stage (same trade as jaccard_verify).

    The threshold is a RATIONAL num/den and every filter compares exact
    integers (den*inter >= num*union), so no engine can disagree at the
    boundary; the reported `jaccard` double is one IEEE division, bit-equal
    across engines. n >= 2 recommended: over a small vocabulary, larger n
    keeps the n-gram df distribution heavy-tailed (prefix filtering's
    selectivity assumption). Docs with fewer than n tokens have no n-grams
    and never pair (Jaccard with an empty set is undefined, excluded).

    Output: (id_a, id_b, inter, union_n, jaccard), one row per qualifying
    pair.
    """
    from .text import ngram_expr

    t_num, t_den = int(threshold_num), int(threshold_den)
    if not 0 < t_num <= t_den:
        raise ValueError(f"threshold must be in (0, 1]: {t_num}/{t_den}")
    toks = df.select(id_col, F.split(F.col(text_col), " ").alias("_toks"))
    sh = (
        # (id, shingle) duplicates can only arise WITHIN one document row
        # (ids are unique — one row per doc), so a per-row array_distinct
        # before the explode gives the exact distinct stream with zero
        # shuffle; dropDuplicates([id, shingle]) here paid a corpus-wide
        # Exchange for the same result.
        toks.select(
            id_col,
            F.explode(F.array_distinct(ngram_expr(F.col("_toks"), n))).alias("shingle"),
        )
        # consumed by the df table, the ranked prefix, AND the verify stage
        # (no cross-branch subtree reuse in Spark SQL)
        .localCheckpoint(eager=False)
    )
    df_tab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w_rank = Window.partitionBy(id_col).orderBy(F.col("_df").asc(), F.col("shingle").asc())
    ranked = (
        sh.join(df_tab, "shingle")
        .withColumn("_rk", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    # prefix length |S| - ceil(t*|S|) + 1 in exact integer arithmetic
    ceil_tn = F.expr(f"(({t_num} * _n) + {t_den} - 1) div {t_den}")
    prefix = (
        ranked.where(F.col("_rk") <= F.col("_n") - ceil_tn + F.lit(1))
        .select(id_col, "shingle", "_n")
        # both sides of the candidate self-join read this frame
        .localCheckpoint(eager=False)
    )
    a = prefix.select(F.col(id_col).alias("id_a"), "shingle", F.col("_n").alias("_na"))
    b = prefix.select(F.col(id_col).alias("id_b"), "shingle", F.col("_n").alias("_nb"))
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # J >= t forces min(|A|,|B|) >= t * max(|A|,|B|) — exact ints
            & (
                F.lit(t_den) * F.least("_na", "_nb")
                >= F.lit(t_num) * F.greatest("_na", "_nb")
            )
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = jaccard_verify(df, cand, id_col=id_col, text_col=text_col, shingles=sh)
    return verified.where(
        F.lit(t_den) * F.col("inter") >= F.lit(t_num) * F.col("union_n")
    ).select("id_a", "id_b", "inter", "union_n", "jaccard")


def _cc_collect(
    pairs_thin: DataFrame, vertices: DataFrame, id_col: str, stats: dict | None
) -> DataFrame:
    """Driver-side solve for connected_components when the edge list fits
    under collect_threshold: the identical min-label + pointer-doubling
    iteration, vectorized over NumPy index arrays. See the caller's
    docstring for the strategy rationale and the exact-parity contract."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = pairs_thin.sparkSession
    # drop null endpoints SPARK-side, matching the loop path where a null
    # join key conducts nothing: a null surviving into toPandas would
    # coerce the whole int64 column to float64, breaking the LongType
    # round-trip outright and silently losing precision for ids >= 2^53
    pdf = pairs_thin.na.drop().toPandas()
    a = pdf["id_a"].to_numpy()
    b = pdf["id_b"].to_numpy()
    id_type = vertices.schema[id_col].dataType
    rounds = 0
    lmap_pdf = pd.DataFrame({"v": a[:0], "glabel": b[:0]})
    if len(a):
        # contract parity with the loop: an endpoint absent from `vertices`
        # neither receives nor conducts labels — drop such edges. The
        # endpoint list is tiny by construction, so this is one map-only
        # broadcast semi-join scan of the corpus, no shuffle. All driver-
        # side construction goes through pandas/Arrow, never per-element
        # Python loops (works for long AND string ids, and keeps the
        # near-threshold case off single-threaded Row materialization).
        ids = np.unique(np.concatenate([a, b]))
        ep_df = spark.createDataFrame(
            pd.DataFrame({"v": ids}), T.StructType([T.StructField("v", id_type)])
        )
        present = (
            vertices.select(F.col(id_col).alias("v"))
            .join(F.broadcast(ep_df), "v", "leftsemi")
            .toPandas()["v"]
            .to_numpy()
        )
        keep = np.isin(a, present) & np.isin(b, present)
        a, b = a[keep], b[keep]
    if len(a):
        ids = np.unique(np.concatenate([a, b]))
        ia = np.searchsorted(ids, a)
        ib = np.searchsorted(ids, b)
        # min-label propagation + pointer doubling over index arrays; ids
        # is sorted, so index order == id order and the converged per-
        # component minimum index IS the minimum id (for strings, numpy's
        # code-point sort equals Spark's binary UTF8 ordering — UTF-8
        # preserves code-point order). minimum.at is the unbuffered
        # scatter-min (duplicate indices accumulate correctly).
        parent = np.arange(len(ids))
        while True:
            rounds += 1
            if rounds > 64:  # log2(diameter) bound; 2^64 vertices cannot exist
                raise AssertionError("driver CC failed to converge — bug")
            prev = parent.copy()
            np.minimum.at(parent, ia, prev[ib])
            np.minimum.at(parent, ib, prev[ia])
            parent = parent[parent]
            if np.array_equal(parent, prev):
                break
        nonid = parent != np.arange(len(ids))
        lmap_pdf = pd.DataFrame({"v": ids[nonid], "glabel": ids[parent[nonid]]})
    if stats is not None:
        stats["rounds"] = rounds
        stats["strategy"] = "collect"
    lmap = spark.createDataFrame(
        lmap_pdf,
        T.StructType([T.StructField("v", id_type), T.StructField("glabel", id_type)]),
    )
    grp = F.coalesce(F.col("glabel"), F.col("v"))
    return (
        vertices.select(F.col(id_col).alias("v"))
        .join(F.broadcast(lmap), "v", "left")
        .select(
            F.col("v").alias(id_col),
            grp.alias("group_id"),
            (F.col("v") == grp).alias("is_canonical"),
        )
    )


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "cid",
    max_iter: int = 50,
    stats: dict | None = None,
    collect_threshold: int | None = 2_000_000,
) -> DataFrame:
    """Near-duplicate GROUPING: connected components over the verified
    pair graph, via min-label propagation WITH pointer doubling. Returns
    one row per vertex: (id_col, group_id, is_canonical) where group_id =
    the lowest id reachable and the canonical member is the lowest id in
    its group — the keep/drop decision a dedup pipeline applies after pair
    finding (the file-level analog is the reference's '.hgt wins' dedupe
    pick, htg/src/service.rs:626-650).

    SIZE-ADAPTIVE physical strategy (the broadcast-hash-join trade applied
    to an iterative algorithm): when the verified pair count is at most
    `collect_threshold` (default 2M edges ~ 32 MB of longs — dup pairs are
    a sliver of any real corpus), the edge list is collected and the SAME
    min-label + pointer-doubling algorithm runs vectorized in NumPy, and
    only the non-identity labels are broadcast-joined back onto `vertices`.
    The corpus then never crosses a shuffle at all — two map-only
    broadcast-join scans replace O(log diameter) rounds that each shuffle
    a corpus-sized label table. Above the threshold (or with
    collect_threshold=None) the distributed loop below runs unchanged —
    it remains the 10^9+-edge scale path, and `max_iter` bounds only it
    (the driver solve always converges).

    Distributed-loop scale shape: each round shuffles only (vertex, label)
    longs joined against the symmetrized edge list — never materializes
    the transitive closure. From round 2 on, a pointer-doubling shortcut
    (label(v) <- label(label(v)), the Shiloach-Vishkin shortcut) rides the
    same round, so convergence is O(log diameter) rounds, not O(diameter):
    a 1000-vertex path converges in ~11 rounds instead of 999. Round 1
    skips the shortcut because labels are still the identity map there
    (label(label(v)) == label(v) — a guaranteed no-op join). Dup cliques
    still converge in 2 rounds with zero extra joins on round 1.

    Cost shape per round: ONE Spark job — the label frame is lazily
    localCheckpoint'ed and the convergence count() both materializes the
    checkpoint and returns the changed-row count in the same job (an eager
    checkpoint + separate count was 2 jobs/round and benched 1.8x slower).
    Genuinely iterative, hence driver-verified against a recursive-CTE
    oracle (both strategies produce identical labels; a pytest asserts it
    on a random graph).

    Contract: `vertices` defines the universe — pair endpoints absent from
    it do not appear in the output and neither receive nor conduct labels
    (the collect path filters such edges explicitly to match the loop's
    join semantics), so pass the full corpus. `stats`, if given, receives
    {"rounds": n, "strategy": "collect"|"loop"} on return."""
    # no distinct(): duplicate edges cannot change a min() and the upstream
    # pair finders already dedupe — a distinct here is one wasted shuffle
    pairs_thin = pairs.select("id_a", "id_b")
    thin_ckpt = None
    if collect_threshold is not None:
        # the count materializes the (possibly expensive) upstream pair
        # chain ONCE into checkpoint blocks; both strategies reuse them
        pairs_thin = thin_ckpt = pairs_thin.localCheckpoint(eager=False)
        if pairs_thin.count() <= collect_threshold:
            return _cc_collect(pairs_thin, vertices, id_col, stats)
    edges = pairs_thin.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.unionByName(
        pairs_thin.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # lazy: round 1's convergence count materializes both in its own job
    edges = edges.localCheckpoint(eager=False)
    if stats is not None:
        stats["strategy"] = "loop"
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=False)
    converged = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        nbr = (
            edges.join(labels, edges["dst"] == labels["v"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        l1 = labels.join(nbr, labels["v"] == nbr["src"], "left").select(
            labels["v"],
            F.least(
                labels["label"], F.coalesce(F.col("nbr_min"), labels["label"])
            ).alias("label"),
            (F.coalesce(F.col("nbr_min"), labels["label"]) < labels["label"]).alias(
                "chg"
            ),
        )
        if rounds == 1:
            new = l1
        else:
            # pointer doubling: follow the new label one hop through the
            # PREVIOUS round's (already-materialized) label table — hopping
            # through l1 itself would self-join an uncheckpointed subtree and
            # recompute the neighbor join twice per round. prev(w) <= w for
            # every w, so new(v) <= prev(l1(v)) <= l1(l1-ish(v)): still the
            # Shiloach-Vishkin halving, hence O(log diameter) rounds. Label
            # targets are always present vertices (labels are mins over
            # present-vertex ids), so the left join never misses.
            hop = labels.select(F.col("v").alias("pv"), F.col("label").alias("plabel"))
            new = (
                l1.join(hop, l1["label"] == hop["pv"], "left")
                .select(
                    l1["v"],
                    F.coalesce(F.col("plabel"), l1["label"]).alias("label"),
                    (
                        F.col("chg")
                        | (F.coalesce(F.col("plabel"), l1["label"]) < l1["label"])
                    ).alias("chg"),
                )
            )
        # lazy checkpoint + full count = ONE job that materializes the new
        # label frame AND returns the changed count (the chg filter runs
        # over every partition, so the checkpoint is fully materialized)
        new = new.localCheckpoint(eager=False)
        changed = new.where(F.col("chg")).count()
        if rounds == 1 and thin_ckpt is not None:
            # round 1's job just materialized the symmetrized `edges`
            # checkpoint, so the thin pair frame's blocks are dead — don't
            # pin a third edge-list copy through the remaining rounds
            thin_ckpt.unpersist()
        # `new` is materialized, so the previous round's blocks are dead —
        # release them instead of pinning max_iter label-table copies
        labels.unpersist()
        labels = new.drop("chg")
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            "(component diameter exceeds max_iter) — returning partial labels "
            "would silently split components; raise max_iter"
        )
    return labels.select(
        F.col("v").alias(id_col),
        F.col("label").alias("group_id"),
        (F.col("v") == F.col("label")).alias("is_canonical"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 2,
) -> DataFrame:
    """Corpus-wide LINE-level dedup — the boilerplate-removal gate
    (Gopher/RefinedWeb style): drop every line whose exact content appears
    in MORE than `max_docs` distinct documents (navigation chrome, cookie
    banners, signatures), keep per-document order for the survivors.

    Scale shape: explode to (doc, pos, line) -> one groupBy on the line
    content with a map-side-combined distinct-doc count (the line-count
    table is vocabulary-sized, far smaller than the corpus) -> hash join
    back (ALL lines, kept or not) -> ONE groupBy(doc) that computes
    n_lines, n_kept, and the ordered rebuild together. Every document has
    at least one exploded line, so no doc can drop out — the drop-flag is
    folded into the aggregates instead of a pre-filter + third scan +
    left join (collect_list skips the NULLs the when() leaves for dropped
    lines). The document text never crosses a shuffle twice (lines do,
    once each way).

    Output: (id, n_lines, n_kept, cleaned_text) — one row per input
    document, empty cleaned_text when every line was boilerplate."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    counts = lines.groupBy("line").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    is_kept = F.col("n_docs") <= max_docs
    return (
        lines.join(counts, "line")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.count(F.when(is_kept, F.lit(1))).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(is_kept, F.struct("pos", "line")))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("cleaned_text"),
        )
    )


def simhash_near_dup_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int | None = None,
    sig_bits: int = 60,
    interleave: bool = False,
) -> DataFrame:
    """SimHash near-duplicate pairs via block banding (the Manku-style
    hamming-distance index): split the signature into `n_blocks` blocks; a
    pair within hamming distance h differs in at most h blocks, so it
    agrees on SOME (n_blocks - h)-block combination — keying a self-join on
    every such combination is pigeonhole-complete, and the exact hamming
    distance then filters false candidates.

    n_blocks is the CORPUS-SIZE knob (params.params_for): the default
    h+1 blocks joins on single 15-bit blocks (right at ~10^3-10^6 docs);
    larger corpora raise n_blocks so each join key concatenates
    (n_blocks - h) blocks — e.g. 8 blocks at 10^9 rows gives 35-bit keys
    (expected bucket occupancy << 1) at the cost of C(8,3) = 56 combo
    keys per row. Combo count grows polynomially; key selectivity grows
    exponentially — the right trade at scale.

    Plan shape: the C(b, h) combinations are NOT unioned self-join
    branches (at the b=12 cap that is 220 branches — a Catalyst planning
    cliff and 220 separate exchanges); each row instead EXPLODES into one
    (combo_id, packed_key) row per combination and a single self-equi-join
    on (combo_id, key) covers every combination at once. Shuffle volume is
    identical (each signature crosses C(b, h) times either way) but the
    plan stays O(1) wide.

    `interleave=True` assigns bit position p to block p % n_blocks instead
    of contiguous runs. The pigeonhole guarantee is partition-agnostic (any
    disjoint cover of the bit positions works), but the BUCKET BALANCE is
    not: signatures whose entropy concentrates in a few bit ranges (real
    perceptual hashes with correlated bit planes; any encoded/structured
    id) leave some contiguous block nearly constant, and that block's
    self-join degenerates toward all-pairs — measured: the geotag-encoded
    image phash corpus OOM'd a 107k-row join through contiguous blocks
    (top-15-bit block had ~300 distinct values) and runs in seconds
    interleaved. Striding spreads every correlated bit range across ALL
    blocks, so each key keeps ~sig_bits/n_blocks worth of whatever entropy
    the signature has. Uniform signatures (text SimHash) are indifferent,
    so the default stays contiguous for plan stability.

    Output: (id_a, id_b, hamming) for pairs with hamming <= max_hamming.
    No cross join anywhere at any parameterization.
    """
    from itertools import combinations

    h = max_hamming
    b = n_blocks if n_blocks is not None else h + 1
    if b <= h:
        raise ValueError(f"n_blocks={b} must exceed max_hamming={h} (pigeonhole)")
    # exact integer bit extraction: a floor-divide through double would lose
    # the low bits of any signature >= 2^53 and silently drop pairs
    if interleave:
        positions = [
            [p for p in range(sig_bits) if p % b == i] for i in range(b)
        ]
        widths = [len(ps) for ps in positions]

        def _block(i: int):
            expr = F.lit(0).cast("long")
            for t, p in enumerate(positions[i]):
                bit = F.shiftright(F.col("simhash"), p).bitwiseAND(F.lit(1))
                expr = expr + F.shiftleft(bit.cast("long"), t)
            return expr

        block_cols = [_block(i).alias(f"blk{i}") for i in range(b)]
    else:
        base, rem = divmod(sig_bits, b)
        widths = [base + (1 if i < rem else 0) for i in range(b)]
        offs = [sum(widths[:i]) for i in range(b)]
        block_cols = [
            F.shiftright(F.col("simhash"), offs[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            .alias(f"blk{i}")
            for i in range(b)
        ]
    # lazy checkpoint BEFORE the explode (stored rows stay 1x, not C(b,h)x):
    # both self-join sides reference this subtree and Spark has no
    # cross-branch reuse — without it the signature computation runs twice.
    blocks = sigs.select(
        F.col(id_col), F.col("simhash"), *block_cols
    ).localCheckpoint(eager=False)
    # Signature tables routinely arrive in 1-2 scan partitions at bench
    # scale (one parquet file); the checkpoint pins that layout, so the
    # C(b,h) explode and the join-side shuffle write would run on 1-2
    # cores. Spread ONLY under-parallel inputs — at production partition
    # counts this is a no-op branch. The partition count is read off the
    # CHECKPOINTED frame (its RDD already exists), never off `sigs`: a
    # pre-checkpoint .rdd probe on a plan containing shuffles triggers a
    # second AQE execution of the whole upstream pipeline (measured 1.7s
    # -> 4.1s on the video-frame near-dup chain).
    parallelism = sigs.sparkSession.sparkContext.defaultParallelism
    if blocks.rdd.getNumPartitions() < parallelism:
        blocks = blocks.repartition(parallelism)
    combo_keys = []
    for ci, combo in enumerate(combinations(range(b), b - h)):
        # pack the combo's blocks into ONE long key (total <= sig_bits bits)
        key = F.lit(0).cast("long")
        shift = 0
        for i in combo:
            key = key + F.shiftleft(F.col(f"blk{i}").cast("long"), shift)
            shift += widths[i]
        combo_keys.append(
            F.struct(F.lit(ci).alias("combo"), key.cast("long").alias("ck"))
        )
    kdf = blocks.select(
        id_col, "simhash", F.explode(F.array(*combo_keys)).alias("k")
    ).select(id_col, "simhash", F.col("k.combo").alias("combo"), F.col("k.ck").alias("ck"))
    a = kdf.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "combo", "ck"
    )
    bb = kdf.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "combo", "ck"
    )
    # exact-hamming filter BEFORE the pair dedup: every duplicate of a
    # (id_a, id_b) candidate carries the same two signatures, so filtering
    # commutes with dropDuplicates — but the filter runs inside the join
    # stage (codegen xor+bit_count) while the dedup is a shuffle. Measured
    # at 107k phash rows: the candidate join emits ~4.3M rows and deduping
    # them first shuffled ~124 MB to keep 5,250; filtering first shrinks
    # that shuffle to the (tiny) surviving pair set.
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        a.join(bb, ["combo", "ck"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash over tokens: per-token md5 -> 15 hex nibbles -> 60 bits;
    per bit, majority vote across the document's tokens (+1/-1, ties -> 0);
    signature = sum(bit_b << b). Near-dups share signatures (or are within a
    small hamming distance).

    Plan shape: tokens are NOT exploded per bit (the naive tokens x 60-row
    blowup is 60x the shuffle bytes); instead one groupBy carries 60 map-side
    partial-agg set-bit counters plus the token count, and the signature is
    assembled from the counters with exact integer shifts. Majority vote
    sum(2*bit - 1) > 0 is equivalent to 2*set_count > n_tokens.

    The 15 hex digits are parsed with ONE conv() into a packed 60-bit long
    (16^15 - 1 < 2^63, so the cast is exact) and every bit counter is a
    shift/AND of that long — a per-digit conv(substring(h,p,1)) formulation
    pays 15 string slices + radix parses per token and benched 1.5x slower
    at sf0.1 with the identical signature (hex digit p, MSB-first 0-based,
    sits at packed bits 4*(14-p)..4*(14-p)+3, so the original per-digit bit
    b maps to packed shift 4*(14 - b//4) + b%4)."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).select(id_col, F.md5(F.encode(F.col("tok"), "UTF-8")).alias("h"))
    packed = toks.select(
        id_col,
        F.conv(F.substring(F.col("h"), 1, 15), 16, 10).cast("long").alias("L"),
    )
    shifts = [4 * (14 - b // 4) + (b % 4) for b in range(60)]
    aggs = [F.count("*").alias("n_toks")] + [
        F.sum(F.shiftright(F.col("L"), shifts[b]).bitwiseAND(F.lit(1))).alias(f"s{b}")
        for b in range(60)
    ]
    counts = packed.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(60):
        sig = sig + F.when(
            F.col(f"s{b}") * 2 > F.col("n_toks"), F.lit(1 << b)
        ).otherwise(F.lit(0))
    return counts.select(id_col, sig.cast("long").alias("simhash"))
