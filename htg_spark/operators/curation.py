"""Training-data curation operators: benchmark decontamination, deterministic
stratified sampling, and temperature-based mixture weights.

These are the corpus-assembly steps that run AFTER cleaning/dedup
(operators/text.py, operators/dedup.py) and decide what actually enters a
training mix:

- `decontaminate`: flag corpus documents that verbatim-contain an n-gram
  from a held-out evaluation set (the GPT-3 appendix-C / PaLM / Llama
  "13-gram decontamination" step, here parameterized).
- `stratified_sample`: keep/drop per document by comparing a salted
  md5-derived uniform in [0,1) against a per-stratum rate — exactly
  reproducible on any engine and any cluster size (no RNG state, no
  partition dependence).
- `mixture_weights`: per-source sampling weights proportional to
  n_docs^alpha (the multilingual "temperature" mix, alpha = 1/T); the
  default alpha = 0.5 uses sqrt, which IEEE 754 requires to be correctly
  rounded, so the weights are bit-identical across engines.

Everything is built from `pyspark.sql.functions` primitives. Scale shapes:
decontamination broadcast-joins the (small) eval n-gram set so the corpus
never shuffles — only matching (doc_id, gram) hits reach the one aggregation;
stratified sampling is a zero-shuffle codegen projection; mixture weights
aggregate to ≤ n_strata rows before any float math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import ngram_expr, tokens_col

# Denominator for the md5-derived uniform: first 8 hex chars -> [0, 2^32).
HASH_DENOM = 4294967296.0  # 2^32


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0,1): u = int(md5(salt||key)[:8], 16) / 2^32.

    md5 over UTF-8 bytes is identical in Spark and DuckDB; `conv` parses the
    8 hex chars into an exact integer < 2^32, and the single division is the
    same IEEE op on both engines — bit-for-bit reproducible, independent of
    partitioning, task retries, and cluster size (unlike `rand(seed)`, which
    is per-partition-seeded and NOT stable under repartitioning)."""
    h = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return F.conv(h, 16, 10).cast("long").cast("double") / F.lit(HASH_DENOM)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.5,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    salt: str = "sample:",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash-uniform
    is below the stratum's rate. Output keeps EVERY row with its draw and
    decision so downstream stages (and the correctness oracle) can audit
    the gate; a pipeline would `.where("keep")`.

    Scale shape: pure projection — zero shuffle, no RNG state, trivially
    re-runnable. Rates are plan literals (a CASE chain over ≤ dozens of
    strata); for thousands of strata, broadcast-join a rates table instead.

    Output: (id, stratum, rate, u, keep).
    """
    rate = F.lit(float(default_rate))
    for name in sorted(rates):
        rate = F.when(F.col(stratum_col) == name, float(rates[name])).otherwise(rate)
    u = hash_uniform(F.col(id_col), salt)
    return df.select(
        id_col,
        stratum_col,
        rate.alias("rate"),
        u.alias("u"),
        (u < rate).alias("keep"),
    )


def mixture_weights(
    df: DataFrame, stratum_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Temperature-based mixture weights: w_s = n_s^0.5 / sum_t n_t^0.5
    (alpha = 0.5, i.e. sampling temperature T = 2 — the standard
    multilingual rebalance, e.g. mBERT/XLM-R exponent-smoothed sampling).

    Bit-parity note: sqrt is correctly rounded by IEEE 754, and the
    normalizing sum is folded LEFT-TO-RIGHT over the sqrt values sorted
    ascending (F.aggregate seeded 0.0 == DuckDB list_reduce seeded with the
    first element, since 0.0 + x == x), so both engines produce identical
    doubles. A naive SUM() OVER () would depend on partition order.

    Scale shape: one partial-aggregated groupBy down to ≤ n_strata rows;
    the sort+fold and the broadcast-back join touch only that tiny frame.

    Output: (stratum, n_docs, sqrt_n, weight), weights summing to ~1.
    """
    counts = df.groupBy(stratum_col).agg(F.count(id_col).alias("n_docs"))
    # counts feeds TWO branches (the denominator fold and the final select);
    # without materialization Spark re-runs the full corpus aggregation per
    # branch — lazily checkpoint the ≤ n_strata-row frame instead
    counts = counts.select(
        stratum_col, "n_docs", F.sqrt(F.col("n_docs").cast("double")).alias("sqrt_n")
    ).localCheckpoint(eager=False)
    denom = counts.agg(
        F.aggregate(
            F.sort_array(F.collect_list("sqrt_n")),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("_denom")
    )
    return F.broadcast(denom).crossJoin(counts).select(
        stratum_col,
        "n_docs",
        "sqrt_n",
        (F.col("sqrt_n") / F.col("_denom")).alias("weight"),
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenation-style sequence packing (the GPT-style "pack then cut
    every `capacity` tokens" step that turns a cleaned corpus into
    fixed-length training sequences): within each output shard, documents
    are concatenated in doc-id order (each contributing token_count + 1
    separator tokens) and the stream is cut every `capacity` tokens, so a
    document occupies sequences floor((cum - tc) / cap) .. floor((cum - 1)
    / cap) of its shard.

    Scale shape: ONE Exchange on the shard key serves the per-shard
    running-sum window; everything after is integer projection. Sharding is
    how real pipelines bound this — each shard is an independent output
    file, so no global total order is ever required; `n_shards` scales with
    the corpus while the per-shard window stays a single narrow sort. All
    arithmetic is exact int64 (`div`, no float division), so any engine
    agrees bit-for-bit.

    Output: (doc_id, shard, tok_count, cum_tokens, start_seq, end_seq,
    n_seqs) — which training sequences each document lands in and whether
    it straddles a cut (n_seqs > 1).
    """
    from pyspark.sql import Window

    base = docs.select(
        id_col,
        (F.col(id_col) % n_shards).alias("shard"),
        (F.size(tokens_col(F.col(text_col))) + 1).cast("long").alias("tok_count"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = base.select(
        id_col,
        "shard",
        "tok_count",
        F.sum("tok_count").over(w).alias("cum_tokens"),
    )
    start = F.expr(f"(cum_tokens - tok_count) div {capacity}")
    end = F.expr(f"(cum_tokens - 1) div {capacity}")
    return cum.select(
        id_col,
        "shard",
        "tok_count",
        "cum_tokens",
        start.alias("start_seq"),
        end.alias("end_seq"),
        (end - start + F.lit(1)).alias("n_seqs"),
    )


def sequence_fill(packed: DataFrame, capacity: int = 256) -> DataFrame:
    """Per-sequence rollup of `pack_sequences` output: how many documents
    touch each (shard, seq) slot, how many of those continue past the
    slot's cut boundary, and the exact token fill — the packing-efficiency
    audit (fill < capacity only in each shard's final partial sequence).

    Scale shape: each doc explodes to its n_seqs spanned slots (almost
    always 1-2 — fan-out is corpus_tokens / capacity bounded, never
    quadratic), then a groupBy on (shard, seq) that REUSES the window's
    hash(shard) Exchange (partitioning keys ⊆ grouping keys satisfies the
    clustered distribution), so pack + fill is ONE total shuffle
    (plan-gated in explain_audit). Tokens-in-slot is pure interval
    intersection in exact int64: min(cum, (seq+1)*cap) - max(cum - tc,
    seq*cap).
    """
    seq = F.explode(F.sequence(F.col("start_seq"), F.col("end_seq"))).alias("seq")
    spans = packed.select(
        "shard", "tok_count", "cum_tokens", "start_seq", "end_seq", seq
    )
    cap = F.lit(capacity).cast("long")
    tok_in = F.least(
        F.col("cum_tokens"), (F.col("seq") + 1) * cap
    ) - F.greatest(F.col("cum_tokens") - F.col("tok_count"), F.col("seq") * cap)
    return (
        spans.select(
            "shard",
            "seq",
            tok_in.alias("_tok_in"),
            (F.col("cum_tokens") > (F.col("seq") + 1) * cap)
            .cast("long")
            .alias("_continues"),
        )
        .groupBy("shard", "seq")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_continues").alias("n_continued"),
            F.sum("_tok_in").alias("fill_tokens"),
        )
    )


def derive_eval_ngrams(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic held-out eval set for the decontamination fixture:
    every 17th document (doc_id % 17 == 3) contributes ONE verbatim n-token
    snippet starting at token offset doc_id % 5 (skipped if the document is
    too short). Real pipelines load benchmark task files here; the contract
    is just (eval_id, eval_ngram) with space-joined tokens."""
    k = (F.col(id_col) % 5).cast("int")
    base = docs.where(F.col(id_col) % 17 == 3).select(
        F.col(id_col).alias("eval_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
        k.alias("_k"),
    )
    return base.where(F.size("_toks") >= F.col("_k") + n).select(
        "eval_id",
        F.concat_ws(" ", F.slice("_toks", F.col("_k") + 1, n)).alias("eval_ngram"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_ngrams: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents containing any eval-set n-gram as a verbatim
    consecutive token run (GPT-3-style n-gram decontamination; n=13 there,
    parameterized here).

    Scale shape: the eval n-gram set is benchmark-sized (MBs), so it is
    DISTINCT-ed and broadcast; corpus n-grams are a zero-shuffle array
    projection (ngram_expr — O(tokens), no-CSE rule respected) exploded
    into the broadcast hash join, where non-matching grams die map-side.
    Only actual hits — a vanishing fraction of a clean corpus — reach the
    single groupBy(doc_id), so the corpus text itself never crosses an
    Exchange. The final flag joins hit counts back to the (doc_id)-only
    projection of the corpus.

    Output: (doc_id, n_hits, n_eval_hits, contaminated) — total matching
    gram instances, distinct eval grams matched, and the gate.
    """
    ev = F.broadcast(eval_ngrams.select(F.col("eval_ngram").alias("_g")).distinct())
    grams = corpus.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    ).select(id_col, F.explode(ngram_expr(F.col("_toks"), n)).alias("gram"))
    hits = (
        grams.join(ev, grams.gram == ev._g)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hits"),
            F.countDistinct("gram").alias("n_eval_hits"),
        )
    )
    ids = corpus.select(id_col)
    return (
        ids.join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce(F.col("n_eval_hits"), F.lit(0)).cast("long").alias("n_eval_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def exact_percentiles(
    df: DataFrame,
    col: str,
    fractions: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4), (9, 10), (99, 100)),
) -> DataFrame:
    """EXACT corpus-wide order statistics — the distribution audit behind
    every "p50/p99 document length" dashboard, without approx_percentile's
    engine-specific sketch: percentile (num, den) is the element at sorted
    index ((n-1) * num) // den, the same pure-integer definition as
    terrain.tile_quantiles, so Spark and DuckDB can never disagree on
    interpolation or rounding.

    Scale shape: the corpus collapses FIRST to (value, count) — ONE
    map-side-combined shuffle bounded by the number of DISTINCT values,
    not rows (doc-length-like columns have at most ~10^6 distinct values
    at any corpus size). The cumulative walk then runs over that bounded
    frame; its single-partition window is over distinct values only — the
    mixture_weights precedent, justified the same way — and emits one row
    per requested fraction via a range join on the cumulative bounds.

    Output: (num, den, idx, value) with n_rows carried on every row."""
    # percentiles are over NON-NULL values: a NULL group would otherwise
    # enter n_rows and the cumulative walk, and Spark orders NULLS FIRST
    # ascending while DuckDB orders them LAST — the two engines would
    # silently return different percentile values instead of failing
    counts = df.where(F.col(col).isNotNull()).groupBy(
        F.col(col).alias("value")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql.window import Window

    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "value",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("value").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_rows"),
    )
    fr = df.sparkSession.createDataFrame(
        [(num, den) for num, den in fractions], "num int, den int"
    )
    # idx = ((n-1)*num) div den; the percentile value is the unique distinct
    # value whose cumulative range [cum-cnt, cum) contains idx
    j = fr.crossJoin(cum)  # |fractions| x |distinct values| — both bounded
    # exact int64 `div` (the sequence_pack convention) — a double divide +
    # floor would misround once (n-1)*num grows past the 2^53 mantissa
    idx = F.expr("(n_rows - 1) * num div den").cast("long")
    return (
        j.where((idx >= F.col("cum") - F.col("cnt")) & (idx < F.col("cum")))
        .select(
            "num",
            "den",
            idx.alias("idx"),
            "value",
            "n_rows",
        )
    )
