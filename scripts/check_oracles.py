"""Mimic the driver's correctness gate: run each __spark_entry__ query on
Spark and its oracle SQL on DuckDB at sf0.01, compare row count, schema
(loosely), and order-insensitive values (exact, incl. float bits).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from htg_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        # pandas quirk: .agg(axis=1) on an EMPTY frame returns a (0, n)
        # DataFrame instead of a Series, and iloc[argsort] then crashes —
        # hit by legitimately-empty results at sf0.001 (e.g. a near-dup
        # corpus too small to contain any pair)
        return df.reset_index(drop=True)
    # canonical sort by all columns stringified for order-insensitive compare
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def compare(name, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
        return problems
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        return problems
    a, b = normalize(sdf), normalize(ddf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            an = av.to_numpy(dtype="float64", na_value=np.nan)
            bn = bv.to_numpy(dtype="float64", na_value=np.nan)
            if not (
                np.array_equal(np.isnan(an), np.isnan(bn))
                and np.array_equal(an[~np.isnan(an)], bn[~np.isnan(bn)])
            ):
                bad = np.nonzero(~((an == bn) | (np.isnan(an) & np.isnan(bn))))[0][:5]
                problems.append(f"col {c} float mismatch at rows {bad.tolist()}: "
                                f"spark={an[bad].tolist()} duck={bn[bad].tolist()}")
        else:
            ae = av.astype(str).where(~av.isna(), "<NULL>")
            be = bv.astype(str).where(~bv.isna(), "<NULL>")
            if not ae.equals(be):
                bad = np.nonzero((ae != be).to_numpy())[0][:5]
                problems.append(f"col {c} mismatch at rows {bad.tolist()}: "
                                f"spark={ae.iloc[bad].tolist()} duck={be.iloc[bad].tolist()}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name} ({len(sdf)} rows)")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
