"""Per-round benchmark: headline elevation-join queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ..., "rows": {...}, "rows_per_sec": {...}}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from htg_spark.bench_queries import bench_engine, bench_points, run_join
from htg_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="htg-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    eng = bench_engine(spark)
    eng._broadcast_blobs()  # catalog prep out of the timed region (preload, A4)
    pts = bench_points(spark, sf_dir, replicate=replicate).persist()
    n_rows = pts.count()  # materialize input out of the timed region
    # warm-up: pay one-time python-worker startup + broadcast unpickle outside
    # the timed region (steady-state throughput is the metric; the one-time
    # cost is reported separately below)
    t0 = time.perf_counter()
    run_join(eng, pts, mode="nearest", strategy="broadcast")
    warmup_sec = round(time.perf_counter() - t0, 3)

    queries = {
        "nearest_broadcast": dict(mode="nearest", strategy="broadcast"),
        "floor_broadcast": dict(mode="floor", strategy="broadcast"),
        "bilinear_broadcast": dict(mode="bilinear", strategy="broadcast"),
        "nearest_knn": dict(mode="nearest", strategy="broadcast", knn_fallback=True),
        "nearest_cogroup_salted": dict(mode="nearest", strategy="cogroup", n_salts=16),
    }
    # the host's per-process bandwidth throttle swings wall-clock 2-4x
    # between sessions (BENCH_SCALING.md protocol): run every query twice,
    # report the min — steady-state throughput, not the noise draw
    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))

    def time_joins(points, trials):
        t, r, rp = {}, {}, {}
        for name, kw in queries.items():
            best, n = None, 0
            for _ in range(trials):
                t0 = time.perf_counter()
                n, chk, found = run_join(eng, points, **kw)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            t[name] = round(best, 3)
            r[name] = n
            rp[name] = round(n / best)
        return t, r, rp

    times, rows, rps = time_joins(pts, n_trials)
    total = sum(times.values())

    # pipeline ops over the driver tables at this sf (dedup / ANN / text)
    from pyspark.sql import functions as F

    from htg_spark import pipeline_queries as pq

    def materialize(df):
        """Force computation of EVERY output column: a bare .count() lets
        Catalyst prune the workload being timed (verified: the counted
        props_stats plan contained no get_json_object at all — it timed a
        distinct-count of event_type). Hashing all columns per row keeps
        the full projection alive through the aggregate."""
        row = df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
        ).agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("chk")).collect()[0]
        # max, not sum: ANSI mode raises on long-sum overflow of hash values
        return row["n"]

    for name, fn in (
        ("dedup_exact", pq.q_dedup_exact),
        ("minhash_signatures", pq.q_minhash_signatures),
        ("lsh_dedup_pairs", pq.q_lsh_dedup_pairs),
        ("neardup_groups", pq.q_neardup_groups),
        ("simhash", pq.q_simhash),
        ("ann_topk", pq.q_ann_topk),
        ("ann_pq_topk", pq.q_ann_pq_topk),
        ("embedding_near_dup", pq.q_embedding_near_dup),
        ("text_quality", pq.q_text_quality),
        ("line_dedup", pq.q_line_dedup),
        ("props_stats", pq.q_props_stats),
        ("user_sessions", pq.q_user_sessions),
    ):
        best, n = None, 0
        for _ in range(n_trials):
            t0 = time.perf_counter()
            n = materialize(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        rows[name] = n
        rps[name] = round(n / best) if best > 0 else 0
        total += best

    # sf1 section: the same five geospatial queries at 10x the point volume
    # (replicate scaled so input rows = one order of magnitude up) — catches
    # constant factors the sf0.1 numbers hide. Same min-of-N protocol as the
    # sf0.1 block (the host-noise rule applies to ANY cross-config ratio,
    # CLAUDE.md); opt out with SPARK_GRAFT_SF1=0.
    sf1 = None
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        sf1_trials = int(os.environ.get("SPARK_GRAFT_SF1_TRIALS", "2"))
        pts1 = bench_points(spark, sf_dir, replicate=replicate * 10).persist()
        n_rows1 = pts1.count()
        run_join(eng, pts1, mode="nearest", strategy="broadcast")  # warm
        t1, r1, rp1 = time_joins(pts1, trials=sf1_trials)
        pts1.unpersist()
        sf1 = {
            "replicate": replicate * 10,
            "input_rows": n_rows1,
            "queries": t1,
            "rows": r1,
            "rows_per_sec": rp1,
            # steady-state check: rows/s at 10x volume vs the sf0.1 rate
            "rps_ratio_vs_sf": {
                k: round(rp1[k] / rps[k], 3) for k in rp1 if rps.get(k)
            },
        }

    # ANN recall at one order above fixture scale (VERDICT r3 item 10):
    # parameter-rule regressions surface as recall numbers, not just
    # fixture-pinned pytest constants. Opt out with SPARK_GRAFT_RECALL=0.
    ann_recall = None
    if os.environ.get("SPARK_GRAFT_RECALL", "1") != "0":
        from htg_spark.bench_queries import ann_recall_at_scale

        t0 = time.perf_counter()
        ann_recall = ann_recall_at_scale(spark)
        ann_recall["elapsed_sec"] = round(time.perf_counter() - t0, 3)

    # Per-query regression gate: compare against the best reproducible
    # minima on record (BENCH_BASELINE.json). Only armed in a CLEAN host
    # window (the warmup canary is a fixed workload, so it measures the
    # host's per-process throttle, not the queries) — flagging in a dirty
    # window would just re-report host noise.
    regressions = {}
    canary_clean = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_BASELINE.json")) as f:
            base = json.load(f)
        canary_clean = warmup_sec <= base.get("clean_canary_sec", 4.0)
        if canary_clean:
            for qname, t in times.items():
                b = base.get("queries", {}).get(qname)
                if b and t > base.get("ratio", 1.5) * b:
                    regressions[qname] = {
                        "sec": t, "baseline_sec": b, "ratio": round(t / b, 2)
                    }
        if regressions:
            print(
                "REGRESSION GATE (clean canary "
                f"{warmup_sec}s): {json.dumps(regressions)}",
                file=sys.stderr,
            )
    except FileNotFoundError:
        pass
    except Exception as e:  # the gate is advisory — never lose the run's JSON
        print(f"regression gate skipped (bad baseline file?): {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "elevation-join + pipeline-ops wall-clock (17 headline queries, min of 2 trials)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "input_rows": n_rows,
                "rows": rows,
                "rows_per_sec": rps,
                "cpus": cpus,
                "replicate": replicate,
                "warmup_sec": warmup_sec,
                "sf1": sf1,
                "ann_recall": ann_recall,
                "canary_clean": canary_clean,
                "regressions": regressions or None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
