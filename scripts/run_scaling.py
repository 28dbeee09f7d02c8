"""Scaling-efficiency evidence (BASELINE.md protocol): run the identical
spark-submit job at local[8] and local[32] on identical input; report
throughput at both plus efficiency = (T32/T8) / (32/8).

Usage: python scripts/run_scaling.py [--replicate 16] [--mode nearest]
Writes BENCH_SCALING.md and prints the JSON result.
"""

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    zpath = os.path.join(REPO, "htg_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        pkg = os.path.join(REPO, "htg_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def run_one(cores: int, zpath: str, args) -> dict:
    # taskset pins the WHOLE process tree (JVM task threads + python workers)
    # to exactly `cores` CPUs — otherwise a local[8] run borrows extra host
    # cores for its python workers and the "8-core" baseline is dishonest.
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.host=127.0.0.1",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "elevation_job.py"),
        "--sf-dir", args.sf_dir,
        "--replicate", str(args.replicate),
        "--mode", args.mode,
        "--strategy", args.strategy,
        "--repeats", str(args.repeats),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--mode", default="nearest")
    ap.add_argument("--strategy", default="broadcast")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    args = ap.parse_args()

    zpath = build_zip()
    r_small = run_one(args.small, zpath, args)
    r_large = run_one(args.large, zpath, args)
    speedup = r_small["best_sec"] / r_large["best_sec"]
    ideal = args.large / args.small
    eff = speedup / ideal
    result = {
        "protocol": f"local[{args.small}] vs local[{args.large}], identical input, spark-submit --py-files",
        "mode": args.mode,
        "strategy": args.strategy,
        "rows": r_small["rows"],
        f"t{args.small}_sec": r_small["best_sec"],
        f"t{args.large}_sec": r_large["best_sec"],
        f"rows_per_sec_{args.small}": r_small["rows_per_sec"],
        f"rows_per_sec_{args.large}": r_large["rows_per_sec"],
        "speedup": round(speedup, 3),
        "ideal": ideal,
        "scaling_efficiency": round(eff, 3),
        "checksum_match": r_small["checksum"] == r_large["checksum"],
    }
    print(json.dumps(result))

    md = f"""# BENCH_SCALING — N vs 4N parallelism evidence

Protocol (BASELINE.md): the identical `spark-submit --py-files htg_spark.zip
jobs/elevation_job.py` job on identical input ({r_small['rows']:,} points,
{args.mode} kernel, {args.strategy} strategy, best of {args.repeats} timed
repeats after warm-up) at two parallelism levels, each run `taskset`-pinned
to exactly N CPUs so the core count is honest (JVM task threads AND python
workers share the pinned set).

| cores | best wall (s) | rows/sec |
|---|---|---|
| local[{args.small}] | {r_small['best_sec']} | {r_small['rows_per_sec']:,} |
| local[{args.large}] | {r_large['best_sec']} | {r_large['rows_per_sec']:,} |

- speedup {args.small}->{args.large}: **{speedup:.2f}x** (ideal {ideal:.0f}x)
- scaling efficiency: **{eff:.3f}** (target >= 0.8)
- result checksums match across runs: **{result['checksum_match']}**

All times from `jobs/elevation_job.py`; raw JSON:

```json
{json.dumps(r_small)}
{json.dumps(r_large)}
```
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
