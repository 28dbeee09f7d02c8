"""Text analysis operators: tokenization stats, quality scoring, language
ID, document fingerprinting.

Everything is built from `pyspark.sql.functions` primitives (split /
explode / md5 / aggregations) so it runs JVM-side under whole-stage codegen
— by design each operator also has a closed-form SQL mirror (see
driver_queries) for cross-engine verification. Determinism over ML-ness:
the language ID is a stopword-profile argmax, the fingerprints are
md5-based — reproducible at any scale and on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal stopword profiles for the deterministic language-ID heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "que"],
    "fr": ["le", "la", "les", "et", "est", "de", "que", "un"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}
LANGS = sorted(LANG_STOPWORDS)  # deterministic tie order: de, en, es, fr, zh


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (the corpus is single-space separated)."""
    return F.split(text, " ")


# BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs —
# the GPT-2-style coarse split. The whitespace class is spelled out
# explicitly instead of \s because Java's \s includes vertical tab (\x0B)
# while RE2/DuckDB's does not — the one ASCII character where the engines
# disagree; an explicit class makes Java and RE2 tokenize identically
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]+"


def bpe_tokens_col(text: Column) -> Column:
    # idx=0 = full match (Spark's default is group 1, which this pattern
    # does not have; DuckDB's regexp_extract_all defaults to 0)
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting under the BPE-ish regex tokenizer: 'don't stop2!' ->
    [don, ', t, stop, 2, !] (6 tokens vs 2 whitespace tokens). All array
    expressions — no explode, no shuffle, pure codegen projection."""
    toks = bpe_tokens_col(F.col(text_col))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    return df.select(
        id_col,
        n.cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_bpe_distinct"),
        F.when(n > 0, total_len.cast("double") / n.cast("double")).alias(
            "avg_bpe_token_len"
        ),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: token count, distinct tokens,
    char count, average token length, type-token ratio (quality proxy).

    All array expressions over the per-row token array — no explode, no
    shuffle, pure projection (the bpe_token_stats shape). The previous
    explode + groupBy(id) form paid an Exchange whose countDistinct
    partial phase shuffled every distinct (id, token) pair corpus-wide
    for numbers the row already contains: per-row array_distinct IS the
    per-document distinct (one row per doc). split() always yields at
    least one element for non-null text, so no doc drops out (the
    exploded form never produced an empty group either); NULL-text rows
    are filtered to mirror the exploded form exactly (explode of a NULL
    array emitted nothing, so those docs were absent from the output)."""
    df = df.where(F.col(text_col).isNotNull())
    toks = tokens_col(F.col(text_col))
    n = F.size(toks).cast("long")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    return df.select(
        id_col,
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (total_len.cast("double") / n.cast("double")).alias("avg_token_len"),
        (n_distinct.cast("double") / n.cast("double")).alias("type_token_ratio"),
    )


def ngram_expr(toks: Column, n: int) -> Column:
    """Word n-grams from an ALREADY-MATERIALIZED token array column —
    same no-CSE-in-lambdas rule as dedup.bigrams_expr (project the token
    array once, then build n-grams from n one-off slices; O(tokens))."""
    sz = F.size(toks)
    out = F.slice(toks, F.lit(1), sz - (n - 1))
    for i in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, F.lit(i + 1), sz - (n - 1)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(sz < n, F.array().cast("array<string>")).otherwise(out)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, Table A1): the
    fraction of word n-grams that duplicate an earlier occurrence,
    1 - distinct/total, for n = 2 and 3 — the standard cheap
    boilerplate/spam gate a pretraining pipeline applies before any model
    scoring. Pure array projection: no explode, no shuffle. The n-gram
    arrays are MATERIALIZED in an intermediate select before the fraction
    arithmetic reads them three times each — higher-order-function
    expressions are CodegenFallback with no reliable common-subexpression
    elimination, so inlining would rebuild each n-gram array up to 3x per
    row (same rule as dedup.bigrams_expr)."""
    base = df.select(id_col, tokens_col(F.col(text_col)).alias("_toks"))
    grams = base.select(
        id_col,
        F.size(F.col("_toks")).cast("long").alias("n_tokens"),
        ngram_expr(F.col("_toks"), 2).alias("_g2"),
        ngram_expr(F.col("_toks"), 3).alias("_g3"),
    )

    def dup_frac(col: str) -> Column:
        tot = F.size(F.col(col))
        return F.when(
            tot > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(F.col(col))).cast("double") / tot.cast("double"),
        ).otherwise(F.lit(0.0))

    return grams.select(
        id_col,
        "n_tokens",
        dup_frac("_g2").alias("dup_bigram_frac"),
        dup_frac("_g3").alias("dup_trigram_frac"),
    )


# PII patterns, written to behave identically under Java regex (Spark) and
# RE2 (DuckDB): explicit character classes only — no \d, \w, or \b (whose
# Unicode/word-char semantics are the dialect divergence points)
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_redact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII scrubbing — the standard pre-training privacy gate: count and
    redact emails, IPv4 addresses, and phone-shaped numbers. Counts come
    from the ORIGINAL text; the redaction chain applies email -> ipv4 ->
    phone in that fixed order (an email's domain must not be half-eaten by
    the IP pass). Pure codegen projection — regexp_replace/extract_all are
    JVM-side, zero shuffle, trivially scale-parallel.

    Output: (id, n_emails, n_ipv4, n_phones, redacted)."""
    t = F.col(text_col)

    def count(pat: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")

    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return df.select(
        id_col,
        count(PII_EMAIL).alias("n_emails"),
        count(PII_IPV4).alias("n_ipv4"),
        count(PII_PHONE).alias("n_phones"),
        red.alias("redacted"),
    )


def line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """C4-style line-level filtering (Raffel et al. 2020, §2.2 — the two
    load-bearing rules): keep only lines that end in terminal punctuation
    (. ! ? ") AND contain at least `min_words` non-empty words; rejoin the
    survivors. Array HOFs over one split — zero shuffle. The filtered
    array is materialized in its OWN projection step before being
    referenced by n_kept and kept_text: HOFs are CodegenFallback with no
    CSE, so inlining the filter into multiple output expressions re-runs
    the whole regex line filter per reference (plan-verified: the inlined
    form carried 3 copies of the filter tree).

    The terminal-punctuation anchor is `[.!?"]\\r?$`, CRLF-tolerant on
    BOTH regex dialects: Java's bare `$` matches before a trailing \\r,
    RE2's does not — the one place the engines would disagree on a
    CRLF-split corpus.

    Output: (id, n_lines, n_kept, kept_text)."""
    t = F.col(text_col)
    passthrough = [c for c in df.columns if c != text_col]
    staged = df.select(*passthrough, F.split(t, "\n").alias("_lines")).select(
        *passthrough,
        "_lines",
        F.filter(
            F.col("_lines"),
            lambda x: F.regexp_like(x, F.lit('[.!?"]\\r?$'))
            & (
                F.size(F.filter(F.split(x, " "), lambda w: w != F.lit("")))
                >= F.lit(min_words)
            ),
        ).alias("_keep"),
    )
    return staged.select(
        id_col,
        F.size(F.col("_lines")).cast("long").alias("n_lines"),
        F.size(F.col("_keep")).cast("long").alias("n_kept"),
        F.array_join(F.col("_keep"), "\n").alias("kept_text"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality score: blend of length band, type-token ratio
    and mean token length (the classic cheap pretraining-quality gates)."""
    s = token_stats(df, id_col, text_col)
    n = F.col("n_tokens").cast("double")
    len_band = F.when((n >= 20) & (n <= 1000), 1.0).otherwise(0.5)
    score = (
        len_band * 0.4
        + F.least(F.col("type_token_ratio") * F.lit(1.25), F.lit(1.0)) * 0.4
        + F.least(F.col("avg_token_len") / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return s.select(id_col, "n_tokens", "type_token_ratio", score.alias("quality"))


def top_terms(
    df: DataFrame,
    n_docs: int,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """tf-idf keyword extraction: the k highest-scoring terms per document,
    score = tf * (N+1)/(df+1) — a RATIONAL idf variant chosen over ln()
    because integer-ratio double arithmetic is bit-identical across
    engines, while libm ln() can differ by an ulp between JVM and DuckDB
    and break the value oracle (a deliberate portability trade, monotone
    in df like the log form though not order-equivalent across terms with
    different tf).

    Scale shape: tf is one shuffle on (doc, term) with map-side combine;
    the document-frequency table is vocabulary-sized and BROADCAST back,
    so the corpus never shuffles twice; the top-k window repartitions by
    doc id only. N is the corpus document count, supplied by the caller
    (one cheap count action, cacheable)."""
    from pyspark.sql.window import Window

    toks = df.select(id_col, F.explode(tokens_col(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfc = tf.groupBy("term").agg(F.count("*").alias("df_count"))
    score = F.col("tf").cast("double") * (
        F.lit(float(n_docs + 1)) / (F.col("df_count") + 1).cast("double")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        tf.join(F.broadcast(dfc), "term")
        .select(id_col, "term", "tf", "df_count", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df_count", "score")
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language stopword hit
    counts; ties and zero-hit rows resolve to the alphabetically-first
    language ('de' ... then 'en' wins only by actual hits). Deterministic."""
    toks = df.select(id_col, F.explode(tokens_col(F.col(text_col))).alias("tok"))
    aggs = [
        F.sum(F.when(F.col("tok").isin(LANG_STOPWORDS[lang]), 1).otherwise(0)).alias(f"s_{lang}")
        for lang in LANGS
    ]
    scored = toks.groupBy(id_col).agg(*aggs)
    # argmax with deterministic tie order = LANGS order
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    pred = F.lit(None).cast("string")
    for lang in reversed(LANGS):
        pred = F.when(F.col(f"s_{lang}") == best, lang).otherwise(pred)
    return scored.select(
        id_col, *[f"s_{lang}" for lang in LANGS], pred.alias("pred_lang")
    )


def rolling_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base: int = 131,
    mod: int = 2147483647,
) -> DataFrame:
    """Position-sensitive rolling-hash document fingerprint (Rabin-Karp
    style): per-token 28-bit hash h = int(md5(tok)[:7], 16), folded in
    order as acc = (acc * base + h) % mod. Unlike the min-shingle
    fingerprint this changes under ANY token reorder — the classic
    polynomial fingerprint of the dedup literature.

    Cross-engine exactness: h < 2^28 < mod, so a 0-seeded Spark fold equals
    DuckDB's first-element-seeded list_reduce (step 1: (0*B + h1) % M = h1);
    every intermediate fits well inside int64 (acc*131 + h < 2^39) so both
    engines compute identical exact integers. Runs fully JVM-side."""
    toks = F.split(F.col(text_col), " ")
    th = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(F.encode(t, "UTF-8")), 1, 7), 16, 10).cast(
            "long"
        ),
    )
    fp = F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(base) + v) % F.lit(mod),
    )
    return df.select(id_col, fp.alias("rolling_fp"))


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5 plus a winnowing-style shingle
    fingerprint (min md5 over word-bigram shingles — the rolling-hash
    analog, stable under token reordering-free edits)."""
    from .dedup import bigrams_expr

    t = F.col(text_col)
    # materialize the token array once, then shingle over the array column
    # (inlining split() in the lambda is O(tokens^2) — see dedup.bigrams_expr).
    # The min is a per-row fact of the shingle array, so take it with
    # array_min over the hashed array — pure projection, no explode, no
    # groupBy Exchange (the token_stats/bpe_token_stats shape). A doc with
    # < 2 tokens has an empty shingle array: array_min(empty) is NULL,
    # exactly what min() over the old explode_outer's single NULL row gave;
    # both forms compare md5 hex strings with the same string ordering.
    pre = df.select(
        id_col,
        F.md5(F.encode(t, "UTF-8")).alias("md5_fp"),
        F.split(t, " ").alias("_toks"),
    )
    return pre.select(
        id_col,
        "md5_fp",
        F.array_min(
            F.transform(
                bigrams_expr(F.col("_toks")),
                lambda s: F.md5(F.encode(s, "UTF-8")),
            )
        ).alias("min_shingle_fp"),
    )
