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


def gen_points_parquet(sf_dir: str, replicate: int, out_dir: str, files: int = 64) -> int:
    """Materialize the bench points once (pure NumPy/pyarrow, unpinned) so
    both pinned runs scan the identical parquet input."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    )
    ok = t["l_orderkey"].to_numpy().astype(np.int64)
    pk = t["l_partkey"].to_numpy().astype(np.int64)
    sk = t["l_suppkey"].to_numpy().astype(np.int64)
    ln = t["l_linenumber"].to_numpy().astype(np.int64)
    os.makedirs(out_dir, exist_ok=True)
    n_total = 0
    reps_per_file = max(1, replicate // files)
    file_idx = 0
    rep = 0
    while rep < replicate:
        chunk_reps = min(reps_per_file, replicate - rep)
        ks, ms, pids = [], [], []
        for r in range(rep, rep + chunk_reps):
            k = ok * 13 + ln * 7 + r
            m = pk * 11 + sk * 3 + r
            ks.append(k)
            ms.append(m)
            pids.append(np.arange(len(k), dtype=np.int64) + r * 10_000_000)
        k = np.concatenate(ks)
        m = np.concatenate(ms)
        pid = np.concatenate(pids)
        lat = np.where(
            k % 37 == 0, 75.0 + (k % 1000) / 1000.0,
            np.where(k % 11 == 0, 50.0 + (k % 900) / 1000.0,
                     np.where(k % 3 == 0, 36.42 + (k % 100) / 10000.0,
                              35.0 + (k % 6000) / 1000.0)))
        lon = np.where(
            k % 37 == 0, 10.0 + (m % 1000) / 1000.0,
            np.where(k % 11 == 0, 50.0 + (m % 900) / 1000.0,
                     np.where(k % 3 == 0, 139.77 + (m % 100) / 10000.0,
                              138.0 + (m % 6000) / 1000.0)))
        tbl = pa.table({"point_id": pid, "lat": lat, "lon": lon})
        pq.write_table(tbl, os.path.join(out_dir, f"part-{file_idx:05d}.parquet"))
        n_total += len(k)
        file_idx += 1
        rep += chunk_reps
    return n_total


def gen_tile_dir(out_dir: str, replicate: int) -> int:
    """Materialize `replicate` distinct-key HGT tiles (all carrying the
    deterministic gradient+void grid) so both pinned raster runs scan the
    identical directory. Keys stay inside SRTM coverage."""
    sys.path.insert(0, REPO)
    from htg_spark import hgt
    from htg_spark.driver_queries import gradient_void_grid

    payload = hgt.encode_tile(gradient_void_grid())
    os.makedirs(out_dir, exist_ok=True)
    for k in range(replicate):
        name = hgt.coords_to_filename(k % 50, k // 50)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(payload)
    return replicate


SPARK_SBIN = "/opt/spark/sbin"
MASTER_URL = "spark://127.0.0.1:7077"


def _daemon_env():
    env = dict(os.environ)
    env.update(
        SPARK_LOG_DIR="/tmp/spark-logs",
        SPARK_PID_DIR="/tmp/spark-pids",
        SPARK_MASTER_HOST="127.0.0.1",
        SPARK_MASTER_PORT="7077",
        SPARK_MASTER_WEBUI_PORT="18080",
        SPARK_WORKER_WEBUI_PORT="18081",
        SPARK_WORKER_CORES="32",
        SPARK_WORKER_MEMORY="96g",
        PYSPARK_PYTHON=sys.executable,
    )
    return env


def start_master():
    env = _daemon_env()
    subprocess.run([f"{SPARK_SBIN}/start-master.sh"], env=env, check=True, capture_output=True)


def start_worker(cores: int):
    """Start the worker pinned to exactly `cores` CPUs; executors and their
    python workers inherit the affinity, so the whole 'cluster side' of the
    run is capped at N cores — but split across N/4 executor JVMs, each with
    its own per-process memory-bandwidth quota (the sandbox throttles BW per
    process, which is what makes multi-JVM the honest multi-executor shape)."""
    env = _daemon_env()
    env["SPARK_WORKER_CORES"] = str(cores)
    subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", f"{SPARK_SBIN}/start-worker.sh", MASTER_URL],
        env=env,
        check=True,
        capture_output=True,
    )


def stop_worker():
    subprocess.run([f"{SPARK_SBIN}/stop-worker.sh"], env=_daemon_env(), capture_output=True)


def stop_cluster():
    env = _daemon_env()
    subprocess.run([f"{SPARK_SBIN}/stop-worker.sh"], env=env, capture_output=True)
    subprocess.run([f"{SPARK_SBIN}/stop-master.sh"], env=env, capture_output=True)


def run_one(cores: int, zpath: str, args) -> dict:
    if getattr(args, "standalone", False):
        # N vs 4N EXECUTORS: separate executor JVMs (4 cores each), the true
        # multi-executor analog of the north rule — and on this sandbox the
        # only honest shape, since the host throttles memory bandwidth per
        # PROCESS, so a single local-mode JVM caps at one process's quota no
        # matter how many task threads it runs. Worker (and thus executors +
        # their python workers) pinned to exactly `cores` CPUs; driver pinned
        # to the same set.
        stop_worker()
        start_worker(cores)
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            "spark-submit",
            "--master", MASTER_URL,
            "--deploy-mode", "client",
            "--executor-cores", "4",
            "--executor-memory", "6g",
            "--total-executor-cores", str(cores),
            "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
            "--conf", "spark.driver.memory=6g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.host=127.0.0.1",
            "--conf", f"spark.pyspark.python={sys.executable}",
        ]
    else:
        # taskset pins the WHOLE process tree (JVM task threads + python
        # workers) to exactly `cores` CPUs — otherwise a local[8] run borrows
        # extra host cores for its python workers.
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            "spark-submit",
            "--master", f"local[{cores}]",
            "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
            "--conf", "spark.driver.memory=8g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.host=127.0.0.1",
        ]
    cmd += [
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "elevation_job.py"),
        "--sf-dir", args.sf_dir,
        "--points-path", args.points_path,
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
    ap.add_argument("--trials", type=int, default=2, help="interleaved A/B trials; min per config wins")
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument(
        "--standalone",
        action="store_true",
        help="run against a localhost standalone cluster: N vs 4N executor "
        "JVMs (4 cores each) instead of local[N] threads",
    )
    args = ap.parse_args()

    zpath = build_zip()
    args.points_path = "/tmp/scaling_points"
    import shutil

    if args.mode in ("dedup", "pip"):
        # these jobs build their own workload (documents corpus / replicated
        # PIP points) and never read the points table — generating
        # replicate x 600k points here would be pure wasted minutes/GB at
        # the large replicates the CPU-bound workloads need
        print(f"{args.mode} mode: skipping points generation", flush=True)
    elif args.mode == "raster":
        shutil.rmtree(args.points_path, ignore_errors=True)
        n = gen_tile_dir(args.points_path, args.replicate)
        print(f"generated {n} hgt tiles at {args.points_path}", flush=True)
    else:
        shutil.rmtree(args.points_path, ignore_errors=True)
        n = gen_points_parquet(args.sf_dir, args.replicate, args.points_path)
        print(f"generated {n:,} points at {args.points_path}", flush=True)
    if args.standalone:
        stop_cluster()
        start_master()
    try:
        # the sandbox host is noisy (shared tenancy): interleave the two
        # configurations and take the minimum per config across trials so a
        # noisy window cannot bias one side
        r_small = r_large = None
        for trial in range(args.trials):
            a = run_one(args.small, zpath, args)
            b = run_one(args.large, zpath, args)
            print(
                f"trial {trial}: t{args.small}={a['best_sec']}s t{args.large}={b['best_sec']}s",
                flush=True,
            )
            if r_small is None or a["best_sec"] < r_small["best_sec"]:
                r_small = a
            if r_large is None or b["best_sec"] < r_large["best_sec"]:
                r_large = b
    finally:
        if args.standalone:
            stop_cluster()
    speedup = r_small["best_sec"] / r_large["best_sec"]
    ideal = args.large / args.small
    eff = speedup / ideal
    if args.standalone:
        proto = (
            f"standalone cluster, {args.small // 4} vs {args.large // 4} executor JVMs "
            f"(4 cores each), identical input, spark-submit --py-files"
        )
        lbl_small = f"{args.small // 4} executors ({args.small} cores)"
        lbl_large = f"{args.large // 4} executors ({args.large} cores)"
    else:
        proto = f"local[{args.small}] vs local[{args.large}] (taskset-pinned), identical input, spark-submit --py-files"
        lbl_small = f"local[{args.small}]"
        lbl_large = f"local[{args.large}]"
    result = {
        "protocol": proto,
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
repeats after warm-up) at two cluster sizes: {proto}.

| configuration | best wall (s) | rows/sec |
|---|---|---|
| {lbl_small} | {r_small['best_sec']} | {r_small['rows_per_sec']:,} |
| {lbl_large} | {r_large['best_sec']} | {r_large['rows_per_sec']:,} |

- speedup {args.small}->{args.large}: **{speedup:.2f}x** (ideal {ideal:.0f}x)
- scaling efficiency: **{eff:.3f}** (target >= 0.8)
- result checksums match across runs: **{result['checksum_match']}**

All times from `jobs/elevation_job.py`; raw JSON:

```json
{json.dumps(r_small)}
{json.dumps(r_large)}
```
"""
    # write the per-run snapshot; BENCH_SCALING.md is the curated multi-session
    # report and is maintained by hand
    with open(os.path.join(REPO, "BENCH_SCALING_last.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
