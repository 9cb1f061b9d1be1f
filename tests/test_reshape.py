"""ops/reshape.py — pivot / melt / group_concat vs pandas reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from recipys_ray.ops.reshape import group_concat, melt, pivot


def _norm(df):
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True
    )


def _events_frame(seed=0, n=2000, n_users=40):
    rs = np.random.RandomState(seed)
    return pd.DataFrame({
        "uid": rs.randint(0, n_users, n).astype(np.int64),
        "etype": rs.choice(["a", "b", "c", "d"], n, p=[0.4, 0.3, 0.2, 0.1]),
        "ts": rs.randint(0, 10**6, n).astype(np.int64),
        "eid": np.arange(n, dtype=np.int64),
        "v": rs.normal(size=n),
    })


class TestPivot:
    def test_count_matches_crosstab_and_partition_invariance(self, ray_session):
        pdf = _events_frame(1)
        pdf.loc[pdf.sample(frac=0.05, random_state=0).index, "v"] = np.nan
        exp = (
            pdf.groupby(["uid", "etype"])["v"]
            .count()
            .unstack()
            .reindex(columns=list("abcd"))
            .fillna(0)
            .astype(np.int64)
            .reset_index()
        )
        outs = []
        for p in (3, 9):
            out = pivot(
                rd.from_pandas(pdf).repartition(5), "uid", "etype", "v",
                agg="count", num_partitions=p,
            ).to_pandas()
            assert list(out.columns) == ["uid", "a", "b", "c", "d"]
            assert all(out[c].dtype == np.int64 for c in "abcd")
            outs.append(_norm(out))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], _norm(exp))

    def test_sum_null_when_absent_and_explicit_keys(self, ray_session):
        pdf = _events_frame(2, n=500, n_users=10)
        out = pivot(
            rd.from_pandas(pdf), "uid", "etype", "v", agg="sum",
            keys=["a", "b", "c", "d", "zzz"],  # key with no rows
        ).to_pandas()
        assert out["zzz"].isna().all()
        exp = pdf[pdf.etype == "a"].groupby("uid")["v"].sum()
        got = out.set_index("uid")["a"].dropna()
        pd.testing.assert_series_equal(
            got.sort_index(), exp.sort_index(), check_names=False
        )

    def test_key_collision_and_bad_agg(self, ray_session):
        pdf = _events_frame(3, n=50)
        with pytest.raises(ValueError):
            pivot(rd.from_pandas(pdf), "uid", "etype", "v", agg="median")
        with pytest.raises(ValueError):
            pivot(rd.from_pandas(pdf), "uid", "etype", "v",
                  keys=["uid", "a"])


class TestMelt:
    def test_matches_pandas_melt(self, ray_session):
        pdf = _events_frame(4, n=300)
        out = melt(
            rd.from_pandas(pdf).repartition(4), ["eid"], ["v", "ts"],
        ).to_pandas()
        assert len(out) == 2 * len(pdf)
        exp = pdf.melt(
            id_vars=["eid"], value_vars=["v", "ts"],
            var_name="variable", value_name="value",
        )
        exp["value"] = exp["value"].astype(np.float64)
        pd.testing.assert_frame_equal(_norm(out), _norm(exp))

    def test_nulls_kept(self, ray_session):
        pdf = pd.DataFrame({"id": [1, 2], "x": [1.0, np.nan]})
        out = melt(rd.from_pandas(pdf), "id", "x").to_pandas()
        assert len(out) == 2 and out.value.isna().sum() == 1


class TestGroupConcat:
    def test_matches_pandas_ordered_join(self, ray_session):
        pdf = _events_frame(5)
        outs = []
        for p in (2, 7):
            out = group_concat(
                rd.from_pandas(pdf).repartition(6), "uid", ["ts", "eid"],
                "etype", sep=",", out_col="path", num_partitions=p,
            ).to_pandas()
            outs.append(_norm(out))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        exp = (
            pdf.sort_values(["uid", "ts", "eid"])
            .groupby("uid")["etype"]
            .agg(",".join)
            .rename("path")
            .reset_index()
        )
        pd.testing.assert_frame_equal(outs[0], _norm(exp))

    def test_null_values_skipped_allnull_group_null(self, ray_session):
        pdf = pd.DataFrame({
            "g": ["a", "a", "a", "b", "b"],
            "o": [1, 2, 3, 1, 2],
            "s": ["x", None, "y", None, None],
        })
        out = group_concat(
            rd.from_pandas(pdf), "g", "o", "s", out_col="c",
            num_partitions=2,
        ).to_pandas().sort_values("g", ignore_index=True)
        assert out.c.tolist()[0] == "x,y"
        assert pd.isna(out.c.tolist()[1])  # group survives with NULL
