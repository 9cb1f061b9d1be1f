"""Checkpoint/resume: per-bucket manifests, orphan cleanup, idempotent
re-runs (north rule ops contract)."""

import json
import os
import shutil

import pandas as pd
import pytest
import ray.data as rd

from recipys_ray import Accumulator, Recipe, StepHistorical, all_of
from recipys_ray.io import (
    BUCKET,
    DATA_DIR,
    MANIFEST_DIR,
    completed_buckets,
    write_resumable,
)
from recipys_ray.pipelines.transcripts import make_transcripts

OUT = "/tmp/test_resume_out"


def pipeline(ds):
    rec = Recipe(
        ds,
        predictors=["n_chars"],
        groups=["conv_id"],
        sequences=["turn_idx"],
        partitions=2,
    )
    rec.add_step(StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MAX))
    return rec.prep()


@pytest.fixture
def input_ds(tmp_path):
    tbl = make_transcripts(n_turns=2000, seed=21)
    path = str(tmp_path / "in.parquet")
    import pyarrow.parquet as pq

    pq.write_table(tbl, path)
    return rd.read_parquet(path)


def read_all() -> pd.DataFrame:
    out = rd.read_parquet(os.path.join(OUT, DATA_DIR)).to_pandas()
    if BUCKET in out.columns:
        out = out.drop(columns=[BUCKET])
    return out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def test_full_run_then_resume_noop(input_ds):
    shutil.rmtree(OUT, ignore_errors=True)
    s1 = write_resumable(pipeline, input_ds, OUT, ["conv_id"], num_buckets=8,
                         metrics_cols=["n_chars_max"])
    assert len(s1["written"]) == 8 and not s1["skipped"]
    full = read_all()
    assert len(full) == input_ds.count()
    # manifests carry lineage + metrics
    done = completed_buckets(OUT)
    assert len(done) == 8
    assert all("input_fingerprint" in m and "rows" in m for m in done.values())
    assert sum(m["rows"] for m in done.values()) == len(full)
    # second run: everything skipped
    s2 = write_resumable(pipeline, input_ds, OUT, ["conv_id"], num_buckets=8)
    assert not s2["written"] and len(s2["skipped"]) == 8
    pd.testing.assert_frame_equal(full, read_all())


def test_resume_recomputes_only_missing(input_ds):
    shutil.rmtree(OUT, ignore_errors=True)
    write_resumable(pipeline, input_ds, OUT, ["conv_id"], num_buckets=8)
    full = read_all()
    # simulate a crash: bucket 3 lost its manifest (data dir is orphaned),
    # bucket 5 lost both
    os.remove(os.path.join(OUT, MANIFEST_DIR, "bucket-3.json"))
    os.remove(os.path.join(OUT, MANIFEST_DIR, "bucket-5.json"))
    shutil.rmtree(os.path.join(OUT, DATA_DIR, f"{BUCKET}=5"))
    s = write_resumable(pipeline, input_ds, OUT, ["conv_id"], num_buckets=8)
    assert sorted(s["written"]) == [3, 5]
    assert len(s["skipped"]) == 6
    pd.testing.assert_frame_equal(full, read_all())
