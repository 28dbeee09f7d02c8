"""Driver-contract queries for the corpus-curation operators
(operators/curation.py): benchmark decontamination, deterministic
stratified sampling, temperature-based mixture weights.

Cross-engine parity rules (same family as pipeline_queries):
- the sampling uniform is md5-derived — Spark parses the first 8 hex chars
  with `conv`, the oracle folds them with the strpos trick proven in
  pipeline_queries._sigs_sql; both give the exact integer < 2^32 and ONE
  identical IEEE division.
- the mixture normalizer folds sqrt values in ASCENDING sorted order on
  both engines (F.aggregate seeded 0.0 == DuckDB list_reduce seeded with
  the first element) — sqrt itself is correctly rounded by IEEE 754.
- decontamination is pure string/int equality — no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import curation

# per-language sampling rates — exact binary fractions (plan literals on
# both engines, no representation drift)
SAMPLE_RATES = {"en": 0.75, "de": 0.5, "es": 0.25, "fr": 0.125, "zh": 0.0625}
DEFAULT_RATE = 0.5
DECONTAM_N = 8
PACK_CAPACITY = 256
PACK_SHARDS = 8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    ev = curation.derive_eval_ngrams(docs, n=DECONTAM_N)
    return curation.decontaminate(docs, ev, n=DECONTAM_N)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.stratified_sample(
        _docs(spark, sf_dir), SAMPLE_RATES, default_rate=DEFAULT_RATE
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.pack_sequences(
        _docs(spark, sf_dir), capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
    )


def q_sequence_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = curation.pack_sequences(
        _docs(spark, sf_dir), capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
    )
    return curation.sequence_fill(packed, capacity=PACK_CAPACITY)


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stratify by lang: the fixture's per-source counts are all equal (25
    # docs each -> degenerate uniform weights), per-lang counts are not
    return curation.mixture_weights(_docs(spark, sf_dir), stratum_col="lang")


def q_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide percentiles (p25/p50/p75/p90/p99) of the documents'
    whitespace token count — the distribution audit every curation run
    starts from, via curation.exact_percentiles (pure-integer order-statistic
    indices, no sketch, no interpolation)."""
    from pyspark.sql import functions as F

    toks = _docs(spark, sf_dir).select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return curation.exact_percentiles(toks, "n_tokens")


_SQL_LENGTH_PERCENTILES = """
WITH toks AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS value FROM documents
),
cnts AS (SELECT value, count(*) AS cnt FROM toks GROUP BY value),
cum AS (
  SELECT value, cnt,
    CAST(sum(cnt) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER () AS BIGINT) AS n_rows
  FROM cnts
),
fr AS (
  SELECT unnest([1, 1, 3, 9, 99]) AS num, unnest([4, 2, 4, 10, 100]) AS den
)
SELECT fr.num, fr.den, (cum.n_rows - 1) * fr.num // fr.den AS idx,
  cum.value, cum.n_rows
FROM fr, cum
WHERE (cum.n_rows - 1) * fr.num // fr.den >= cum.cum - cum.cnt
  AND (cum.n_rows - 1) * fr.num // fr.den < cum.cum
"""


# --- DuckDB oracles ---------------------------------------------------------


def _hash_u32_sql(arg: str) -> str:
    """Exact BIGINT from the first 8 md5 hex chars of `arg` — the strpos
    fold (mirrors curation.hash_uniform's conv(substring(md5, 1, 8)))."""
    digit = f"CAST(strpos('0123456789abcdef', substr(md5({arg}), {{p}}, 1)) - 1 AS BIGINT)"
    return (
        "("
        + " + ".join(digit.format(p=p) + f" * {16 ** (8 - p)}" for p in range(1, 9))
        + ")"
    )


def _stratified_sample_sql() -> str:
    x = _hash_u32_sql("'sample:' || CAST(doc_id AS VARCHAR)")
    # mirror curation.stratified_sample's when-chain (order irrelevant —
    # strata names are distinct equality cases)
    # CAST each literal: bare 0.0625 parses as DECIMAL in DuckDB, which would
    # both change the comparison type and mismatch Spark's double schema
    cases = " ".join(
        f"WHEN lang = '{name}' THEN CAST({SAMPLE_RATES[name]!r} AS DOUBLE)"
        for name in sorted(SAMPLE_RATES)
    )
    return f"""
WITH drawn AS (
  SELECT doc_id, lang,
    CASE {cases} ELSE CAST({DEFAULT_RATE!r} AS DOUBLE) END AS rate,
    CAST({x} AS DOUBLE) / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, lang, rate, u, u < rate AS keep FROM drawn
"""


_SQL_MIXTURE = """
WITH counts AS (
  SELECT lang, count(doc_id) AS n_docs,
         sqrt(CAST(count(doc_id) AS DOUBLE)) AS sqrt_n
  FROM documents GROUP BY lang
),
denom AS (
  SELECT list_reduce(list_sort(list(sqrt_n)), (a, b) -> a + b) AS d FROM counts
)
SELECT lang, n_docs, sqrt_n, sqrt_n / d AS weight FROM counts, denom
"""


_SQL_PACK_CUM = f"""
WITH base AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS tok_count
  FROM documents
),
cum AS (
  SELECT doc_id, shard, tok_count,
         -- CAST: DuckDB widens the window sum to HUGEINT, which fetchdf
         -- would degrade to float64 (Spark stays long)
         CAST(sum(tok_count) OVER (PARTITION BY shard ORDER BY doc_id)
              AS BIGINT) AS cum_tokens
  FROM base
)"""

# all-integer: `//` truncation == floor here because every operand is >= 0
_SQL_SEQUENCE_PACK = f"""
{_SQL_PACK_CUM}
SELECT doc_id, shard, tok_count, cum_tokens,
       (cum_tokens - tok_count) // {PACK_CAPACITY} AS start_seq,
       (cum_tokens - 1) // {PACK_CAPACITY} AS end_seq,
       (cum_tokens - 1) // {PACK_CAPACITY}
         - (cum_tokens - tok_count) // {PACK_CAPACITY} + 1 AS n_seqs
FROM cum
"""

# CAST the integer sums: DuckDB widens sum(BIGINT) to HUGEINT, Spark stays long
_SQL_SEQUENCE_FILL = f"""
{_SQL_PACK_CUM},
spans AS (
  SELECT shard, tok_count, cum_tokens,
         unnest(generate_series((cum_tokens - tok_count) // {PACK_CAPACITY},
                                (cum_tokens - 1) // {PACK_CAPACITY})) AS seq
  FROM cum
)
SELECT shard, seq,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN cum_tokens > (seq + 1) * {PACK_CAPACITY}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_continued,
       CAST(sum(least(cum_tokens, (seq + 1) * {PACK_CAPACITY})
                - greatest(cum_tokens - tok_count, seq * {PACK_CAPACITY}))
            AS BIGINT) AS fill_tokens
FROM spans GROUP BY shard, seq
"""


def _decontamination_sql(n: int = DECONTAM_N) -> str:
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n)).replace(
        "toks[i + 0]", "toks[i]"
    )
    return f"""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ev AS (
  SELECT DISTINCT array_to_string(
           list_slice(toks, CAST(doc_id % 5 AS INT) + 1, CAST(doc_id % 5 AS INT) + {n}),
           ' ') AS g
  FROM tk WHERE doc_id % 17 = 3 AND len(toks) >= doc_id % 5 + {n}
),
grams AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(toks) - {n - 1}), i -> {gram})) AS gram
  FROM tk
),
hits AS (
  SELECT g2.doc_id, count(*) AS n_hits, count(DISTINCT gram) AS n_eval_hits
  FROM grams g2 JOIN ev ON g2.gram = ev.g GROUP BY g2.doc_id
)
SELECT d.doc_id,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_eval_hits, 0) AS n_eval_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def queries():
    return {
        "decontamination": q_decontamination,
        "stratified_sample": q_stratified_sample,
        "mixture_weights": q_mixture_weights,
        "sequence_pack": q_sequence_pack,
        "sequence_fill": q_sequence_fill,
        "length_percentiles": q_length_percentiles,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "decontamination": _decontamination_sql(),
        "stratified_sample": _stratified_sample_sql(),
        "mixture_weights": _SQL_MIXTURE,
        "sequence_pack": _SQL_SEQUENCE_PACK,
        "sequence_fill": _SQL_SEQUENCE_FILL,
        "length_percentiles": _SQL_LENGTH_PERCENTILES,
    }
