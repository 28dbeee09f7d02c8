"""Distributed BPE vocabulary training (Sennrich et al. 2016, the
word-frequency formulation every production tokenizer trainer uses).

The trick that makes BPE distributable: after ONE corpus-wide word-count
shuffle, every merge iteration runs over the WORD VOCABULARY (weighted by
word frequency), never over the corpus again — at 100 TB the corpus is
scanned once, and the loop state is a vocabulary-sized frame (10^5-10^7
rows regardless of corpus size). Each iteration is:

  1. pair counts: explode each word's adjacent symbol pairs, ONE
     map-side-combined weighted sum (vocabulary-sized shuffle)
  2. argmax pair with a total-order tiebreak (count DESC, left ASC,
     right ASC) — a 1-row bounded collect, never a driver-side loop
     over data
  3. apply the merge to every word's symbol array — greedy left-to-right
     (the BPE contract: "aaa" under merge (a,a) becomes ["aa","a"]),
     a sequential scan per word, so a vectorized pandas UDF over the
     vocabulary frame (Arrow-batched; the corpus never sees Python)

Iteration state crosses rounds through a LAZY localCheckpoint (the next
round's pair-count action materializes it) so the plan never grows with
the merge count and no branch recomputes the chain — the same one-job-per-
round shape as dedup.connected_components.

No SQL oracle: BPE is an iterative argmax fixpoint (not expressible as a
DuckDB query); correctness is pinned by tests/test_pipeline_ops.py against
an independently-written pure-Python reference trainer on the same corpus,
plus invariant tests (merge determinism, greedy overlap handling).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_OF_WORD = "</w>"


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(syms: array<string>, n: long) — the frequency-weighted word
    vocabulary, each word split into single-character symbols with the
    end-of-word marker appended (so merges can learn suffixes)."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")), lambda i: F.substring("word", i, 1)
    )
    return words.select(
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("syms"), "n"
    )


def _merge_applier(left: str, right: str):
    """Greedy left-to-right merge of one (left, right) pair inside a symbol
    sequence — the sequential-scan kernel, vectorized over the vocabulary
    via Arrow batches."""
    merged = left + right

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(s):
            out, i, m = [], 0, len(s)
            while i < m:
                if i + 1 < m and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(one)

    return apply_merge


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_count: int = 2,
) -> list[dict]:
    """Learn up to `n_merges` BPE merges from the corpus. Returns the merge
    table as a list of dicts (step, left, right, merged, pair_count) —
    driver-sized by construction (one row per merge), which is why this
    returns Python data rather than a DataFrame: the merge table IS the
    model artifact a tokenizer ships with.

    Stops early when the best remaining pair's weighted count falls below
    `min_count` (a pair seen once cannot generalize)."""
    vocab = _word_symbols(df, text_col).localCheckpoint(eager=False)
    merges: list[dict] = []
    for step in range(n_merges):
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not best or best[0]["cnt"] < min_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append(
            {"step": step, "left": l, "right": r, "merged": l + r, "pair_count": cnt}
        )
        vocab = vocab.withColumn(
            "syms", _merge_applier(l, r)(F.col("syms"))
        ).localCheckpoint(eager=False)
    return merges


def bpe_encode(df: DataFrame, merges: list[dict], text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with a learned merge table: per-word greedy
    application of every merge IN LEARNED ORDER (the BPE inference
    contract). The merge list is a broadcast-sized closure constant; the
    corpus pass is one Arrow-batched map — no shuffle at all. Output: the
    input plus `bpe_tokens` (array<string>) and `n_bpe_tokens`."""
    seq = [(m["left"], m["right"], m["merged"]) for m in merges]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        def one(t):
            out = []
            for w in t.split(" "):
                if not w:
                    continue
                s = list(w) + [END_OF_WORD]
                for left, right, merged in seq:
                    i, res, m = 0, [], len(s)
                    while i < m:
                        if i + 1 < m and s[i] == left and s[i + 1] == right:
                            res.append(merged)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    s = res
                    m = len(s)
                out.extend(s)
            return out

        return texts.map(one)

    out = df.withColumn("bpe_tokens", encode(F.col(text_col)))
    return out.withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))
