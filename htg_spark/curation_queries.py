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


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stratify by lang: the fixture's per-source counts are all equal (25
    # docs each -> degenerate uniform weights), per-lang counts are not
    return curation.mixture_weights(_docs(spark, sf_dir), stratum_col="lang")


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
    }


def oracle_sql() -> dict[str, str]:
    return {
        "decontamination": _decontamination_sql(),
        "stratified_sample": _stratified_sample_sql(),
        "mixture_weights": _SQL_MIXTURE,
    }
