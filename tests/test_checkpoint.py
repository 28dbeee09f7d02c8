"""Kill/resume semantics for the checkpointed elevation-join run
(FIXTURES.md §7): a run killed after M buckets must resume without
recomputing them, and the final output must equal the uninterrupted run."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from htg_spark import fixtures
from htg_spark.checkpoint import CheckpointedJob
from htg_spark.engine import ElevationEngine


@pytest.fixture(scope="module")
def engine(spark):
    return ElevationEngine(spark, grids=fixtures.default_catalog_grids())


@pytest.fixture()
def points(spark):
    rng = np.random.default_rng(99)
    n = 1200
    pdf = pd.DataFrame(
        {
            "image_id": [f"im{i:05d}" for i in range(n)],
            "lat": 35.0 + rng.random(n) * 2,
            "lon": 138.0 + rng.random(n) * 2,
        }
    )
    return spark.createDataFrame(pdf)


def test_kill_resume(spark, engine, points, tmp_path):
    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "clean")
    transform = lambda df: engine.elevation_join(df, mode="nearest", strategy="broadcast")

    job = CheckpointedJob(out_a, n_buckets=8, id_col="image_id")
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(points, transform, fail_after=3, wave_size=2)
    done_after_kill = job.completed_buckets()
    assert len(done_after_kill) == 3
    first_run_ids = {b: m["run_id"] for b, m in done_after_kill.items()}

    # resume: completed buckets skipped, remaining processed
    summary = job.run(points, transform)
    assert summary["skipped"] == 3
    assert summary["processed"] == 5
    done = job.completed_buckets()
    assert len(done) == 8
    for b, rid in first_run_ids.items():
        assert done[b]["run_id"] == rid  # not recomputed

    # equality with an uninterrupted run
    job_b = CheckpointedJob(out_b, n_buckets=8, id_col="image_id")
    job_b.run(points, transform)
    a = job.read_output(spark).orderBy("image_id").toPandas()
    b = job_b.read_output(spark).orderBy("image_id").toPandas()
    assert len(a) == len(b) == 1200
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True)[sorted(a.columns)],
        b.reset_index(drop=True)[sorted(b.columns)],
    )

    # lineage metrics present and consistent
    total_rows = sum(m["rows"] for m in done.values())
    assert total_rows == 1200
    assert all("elev_nulls" in m and "wall_s" in m for m in done.values())


def test_resume_rejects_mismatched_bucketing(spark, engine, points, tmp_path):
    """Resuming with a different n_buckets (or id_col) would duplicate rows
    (stale bucket=N dirs + rehashed low buckets) — must fail fast."""
    out = str(tmp_path / "job")
    transform = lambda df: engine.elevation_join(df, mode="nearest", strategy="broadcast")
    job = CheckpointedJob(out, n_buckets=4, id_col="image_id")
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run(points, transform, fail_after=1, wave_size=1)

    with pytest.raises(ValueError, match="n_buckets"):
        CheckpointedJob(out, n_buckets=8, id_col="image_id").run(points, transform)
    with pytest.raises(ValueError, match="id_col"):
        CheckpointedJob(out, n_buckets=4, id_col="other").completed_buckets()
    # matching bucketing resumes cleanly
    summary = CheckpointedJob(out, n_buckets=4, id_col="image_id").run(points, transform)
    assert summary["skipped"] == 1 and summary["processed"] == 3
