"""Checkpoint/resume: per-bucket manifests, orphan cleanup, idempotent
re-runs (north rule ops contract)."""

import json
import os
import shutil

import numpy as np
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


class TestWriteWebdataset:
    def _docs(self):
        rng = np.random.RandomState(5)
        return pd.DataFrame({
            "__key__": [f"{i:06d}" for i in range(40)],
            "img": [rng.bytes(50 + i) for i in range(40)],
            "txt": [f"caption {i}" if i % 5 else None for i in range(40)],
        })

    def test_round_trip_and_resume(self, ray_session, tmp_path):
        import ray.data as rd

        from recipys_ray.io import write_webdataset
        from recipys_ray.ops.multimodal import read_webdataset

        pdf = self._docs()
        out = str(tmp_path / "wds")
        r1 = write_webdataset(
            rd.from_pandas(pdf).repartition(3), out,
            payload_cols=["img"], meta_cols=["txt"], num_shards=4,
        )
        assert sorted(r1["written"]) == [0, 1, 2, 3]
        assert r1["rows"] == 40
        # rerun: everything skipped
        r2 = write_webdataset(
            rd.from_pandas(pdf).repartition(3), out,
            payload_cols=["img"], meta_cols=["txt"], num_shards=4,
        )
        assert r2["written"] == [] and sorted(r2["skipped"]) == [0, 1, 2, 3]
        # round trip through the reader
        import glob

        back = read_webdataset(sorted(glob.glob(f"{out}/shards/*.tar")))
        bdf = back.to_pandas().sort_values("__key__", ignore_index=True)
        assert len(bdf) == 40
        ref = pdf.sort_values("__key__", ignore_index=True)
        assert bdf["__key__"].tolist() == ref["__key__"].tolist()
        assert [bytes(b) for b in bdf["img"]] == [bytes(b) for b in ref["img"]]
        got_txt = [t if t is not None else None for t in bdf["txt"]]
        assert got_txt == [t for t in ref["txt"]]
        # delete one manifest -> only that shard recomputes, byte-identical
        import json as _json
        import os as _os

        with open(f"{out}/_manifest/bucket-2.json") as fh:
            _json.load(fh)
        before = open(f"{out}/shards/shard-00002.tar", "rb").read()
        _os.unlink(f"{out}/_manifest/bucket-2.json")
        r3 = write_webdataset(
            rd.from_pandas(pdf).repartition(3), out,
            payload_cols=["img"], meta_cols=["txt"], num_shards=4,
        )
        assert r3["written"] == [2]
        after = open(f"{out}/shards/shard-00002.tar", "rb").read()
        assert before == after  # idempotent resume: byte-identical shard

    def test_orphan_tar_cleaned_and_recomputed(self, ray_session, tmp_path):
        """A tar without a manifest is a crashed in-flight shard: the
        re-run must remove it and recompute byte-identically."""
        import glob

        import ray.data as rd

        from recipys_ray.io import write_webdataset

        pdf = self._docs()
        out = str(tmp_path / "wds2")
        write_webdataset(
            rd.from_pandas(pdf), out,
            payload_cols=["img"], meta_cols=["txt"], num_shards=3,
        )
        good = open(f"{out}/shards/shard-00001.tar", "rb").read()
        # simulate a crash: manifest gone, tar corrupted mid-write
        os.unlink(f"{out}/_manifest/bucket-1.json")
        with open(f"{out}/shards/shard-00001.tar", "wb") as fh:
            fh.write(b"GARBAGE")
        r = write_webdataset(
            rd.from_pandas(pdf), out,
            payload_cols=["img"], meta_cols=["txt"], num_shards=3,
        )
        assert r["written"] == [1]
        assert open(f"{out}/shards/shard-00001.tar", "rb").read() == good
        assert len(glob.glob(f"{out}/shards/*.tar")) == 3
