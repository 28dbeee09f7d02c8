"""Per-partition checkpoint lineage + resume for long elevation-join runs.

North-rule requirement: "the job checkpoints per-partition lineage and
metrics so a killed run resumes without recomputing completed tile-join
partitions." The reference has no analog (its only retry is the download
backoff, htg/src/download.rs:354-367) — this is batch-job orchestration,
not Structured Streaming (SURVEY.md §2.7).

Design: input rows are hashed into `n_buckets` stable buckets
(xxhash64(id) — content-addressed, so resume works even if the input frame
is re-read). Buckets are processed in waves; each completed bucket commits
(a) its output under out_dir/data/bucket=N/ (idempotent overwrite) and
(b) a manifest JSON under out_dir/_manifest/ recording row counts, null
counts, wall time and run id — the per-partition lineage + metrics record.
On restart, completed buckets are skipped by anti-joining the manifest.
Writes are idempotent per bucket directory, so a bucket interrupted
mid-write is simply rewritten by the next run (speculative/duplicate task
safety: last complete overwrite wins, manifest is written only after the
data commit returns).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CheckpointedJob:
    def __init__(self, out_dir: str, n_buckets: int = 16, id_col: str = "image_id"):
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        self.data_dir = os.path.join(out_dir, "data")

    # -- lineage -----------------------------------------------------------

    def _manifest_path(self, bucket: int) -> str:
        return os.path.join(self.manifest_dir, f"bucket-{bucket:05d}.json")

    def completed_buckets(self) -> dict[int, dict]:
        done = {}
        if os.path.isdir(self.manifest_dir):
            for name in os.listdir(self.manifest_dir):
                if name.startswith("bucket-") and name.endswith(".json"):
                    with open(os.path.join(self.manifest_dir, name)) as f:
                        m = json.load(f)
                    # resuming with a different bucketing would leave stale
                    # bucket=N dirs in place while rehashed rows land in the
                    # low buckets -> duplicated rows on read; fail fast
                    for field, mine in (("n_buckets", self.n_buckets), ("id_col", self.id_col)):
                        if field in m and m[field] != mine:
                            raise ValueError(
                                f"checkpoint at {self.out_dir} was written with "
                                f"{field}={m[field]!r}; resume requested {mine!r} — "
                                "refusing to mix bucketings (wipe out_dir or match it)"
                            )
                    done[m["bucket"]] = m
        return done

    def bucket_col(self):
        return F.pmod(F.xxhash64(F.col(self.id_col)), F.lit(self.n_buckets)).cast("int")

    # -- run ----------------------------------------------------------------

    def run(
        self,
        points: DataFrame,
        transform,
        fail_after: int | None = None,
        wave_size: int = 4,
    ) -> dict:
        """Process all not-yet-completed buckets.

        transform: DataFrame -> DataFrame (e.g. engine.elevation_join).
        fail_after: test hook — raise after N buckets committed this run.
        Returns summary {run_id, processed, skipped}.
        """
        run_id = uuid.uuid4().hex[:12]
        os.makedirs(self.manifest_dir, exist_ok=True)
        done = self.completed_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        src = points.withColumn("_bucket", self.bucket_col())
        processed = 0
        for i in range(0, len(todo), wave_size):
            wave = todo[i : i + wave_size]
            wave_df = src.where(F.col("_bucket").isin(wave))
            out = transform(wave_df.drop("_bucket")).withColumn("_bucket", self.bucket_col())
            out = out.persist()
            try:
                stats = (
                    out.groupBy("_bucket")
                    .agg(
                        F.count("*").alias("rows"),
                        F.sum(F.col("elevation").isNull().cast("long")).alias("elev_nulls"),
                        F.sum(F.col("tile_found").cast("long")).alias("tiles_found"),
                    )
                    .collect()
                )
                stats = {r["_bucket"]: r for r in stats}
                for b in wave:
                    t0 = time.perf_counter()
                    (
                        out.where(F.col("_bucket") == b)
                        .drop("_bucket")
                        .write.mode("overwrite")
                        .parquet(os.path.join(self.data_dir, f"bucket={b}"))
                    )
                    r = stats.get(b)
                    manifest = {
                        "bucket": b,
                        "n_buckets": self.n_buckets,
                        "id_col": self.id_col,
                        "rows": int(r["rows"]) if r else 0,
                        "elev_nulls": int(r["elev_nulls"]) if r else 0,
                        "tiles_found": int(r["tiles_found"]) if r else 0,
                        "run_id": run_id,
                        "wall_s": round(time.perf_counter() - t0, 3),
                        "ts": time.time(),
                    }
                    tmp = self._manifest_path(b) + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump(manifest, f)
                    os.replace(tmp, self._manifest_path(b))  # atomic commit
                    processed += 1
                    if fail_after is not None and processed >= fail_after:
                        raise RuntimeError(f"injected failure after {processed} buckets")
            finally:
                out.unpersist()
        return {"run_id": run_id, "processed": processed, "skipped": len(done)}

    def read_output(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.data_dir, "bucket=*"))
