"""ops/join.py — distributed equi-join: broadcast ≡ shuffle ≡ pandas."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from recipys_ray.ops.join import hash_join


def _tables(seed=0, n_left=2000, n_keys=150):
    rs = np.random.RandomState(seed)
    left = pd.DataFrame({
        "k": rs.randint(0, n_keys * 2, n_left),  # half the keys unmatched
        "lv": rs.normal(size=n_left),
        "tag": rs.choice(list("abc"), n_left),
    })
    right = pd.DataFrame({
        "rk": np.arange(n_keys),
        "rv": rs.normal(size=n_keys),
        "tag": rs.choice(list("xy"), n_keys),  # collides with left "tag"
    })
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True
    )


def _expected(left, right, how):
    exp = left.merge(
        right.rename(columns={"tag": "tag_r"}),
        how=how, left_on="k", right_on="rk", sort=False,
    ).drop(columns=["rk"])
    return _norm(exp)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_matches_pandas(ray_session, strategy, how):
    left, right = _tables()
    out = hash_join(
        rd.from_pandas(left).repartition(6),
        rd.from_pandas(right).repartition(3),
        on="k", right_on="rk", how=how, strategy=strategy,
        num_partitions=5,
    ).to_pandas()
    assert list(out.columns) == ["k", "lv", "tag", "rv", "tag_r"]
    pd.testing.assert_frame_equal(
        _norm(out), _expected(left, right, how), check_dtype=False
    )


def test_duplicate_right_keys_multiply(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10.0, 20.0, 30.0]})
    right = pd.DataFrame({"k": [1, 1, 3], "rv": [0.1, 0.2, 0.3]})
    for strategy in ("broadcast", "shuffle"):
        out = _norm(hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", strategy=strategy, num_partitions=3,
        ).to_pandas())
        exp = _norm(left.merge(right, on="k", sort=False))
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_multi_key_join(ray_session):
    rs = np.random.RandomState(4)
    left = pd.DataFrame({
        "a": rs.randint(0, 10, 500), "b": rs.randint(0, 5, 500),
        "lv": rs.normal(size=500),
    })
    right = pd.DataFrame({
        "a": np.repeat(np.arange(10), 5), "b": np.tile(np.arange(5), 10),
        "rv": rs.normal(size=50),
    })
    exp = _norm(left.merge(right, on=["a", "b"], sort=False))
    for strategy in ("broadcast", "shuffle"):
        out = _norm(hash_join(
            rd.from_pandas(left).repartition(4), rd.from_pandas(right),
            on=["a", "b"], strategy=strategy, num_partitions=4,
        ).to_pandas())
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_partition_count_invariance(ray_session):
    left, right = _tables(seed=2)
    outs = []
    for p in (1, 7):
        outs.append(_norm(hash_join(
            rd.from_pandas(left).repartition(3), rd.from_pandas(right),
            on="k", right_on="rk", strategy="shuffle", num_partitions=p,
        ).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_broadcast_guard(ray_session):
    left, right = _tables()
    with pytest.raises(ValueError, match="broadcast_max_bytes"):
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", strategy="broadcast",
            broadcast_max_bytes=16,
        )


def test_bad_args(ray_session):
    left, right = _tables()
    with pytest.raises(ValueError, match="how"):
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", how="cross")
    with pytest.raises(ValueError, match="same length"):
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on=["k"], right_on=["rk", "rv"])


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_null_keys_never_match(ray_session, strategy):
    """SQL equi-join semantics: NULL = NULL is not a match. pandas merge
    matches NaN against NaN, so the joiners must drop null right keys."""
    left = pd.DataFrame({
        "k": [1.0, 2.0, np.nan, np.nan],
        "lv": [10, 20, 30, 40],
    })
    right = pd.DataFrame({
        "k": [1.0, np.nan, 5.0],
        "rv": [0.1, 0.2, 0.5],
    })
    ld, rdd = rd.from_pandas(left).repartition(2), rd.from_pandas(right)

    def run(how):
        return _norm(hash_join(
            ld, rdd, on="k", how=how, strategy=strategy, num_partitions=3,
        ).to_pandas())

    # semi: only k=1 EXISTS in right (nulls never match)
    assert run("semi")["lv"].tolist() == [10]
    # anti: k=2 and both null-key rows survive NOT EXISTS
    assert sorted(run("anti")["lv"].tolist()) == [20, 30, 40]
    # inner: the single non-null match
    inner = run("inner")
    assert inner["lv"].tolist() == [10]
    assert inner["rv"].tolist() == [0.1]
    # left: all 4 rows, null-key rows padded not NaN-matched
    lj = run("left")
    assert sorted(lj["lv"].tolist()) == [10, 20, 30, 40]
    assert lj["rv"].notna().sum() == 1


class TestOuterJoin:
    def test_full_outer_with_null_keys(self, ray_session):
        from recipys_ray.ops.join import hash_join

        left = pd.DataFrame({
            "k": pd.array([1, 2, None, 4], dtype="Int64"),
            "lv": [10, 20, 30, 40],
        })
        right = pd.DataFrame({
            "k2": pd.array([2, 3, None], dtype="Int64"),
            "rv": [200, 300, 999],
        })
        out = (
            hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="k", right_on="k2", how="outer")
            .to_pandas()
            .sort_values(["lv", "rv"], na_position="last",
                         ignore_index=True)
        )
        # SQL FULL OUTER: null keys never match; every row survives once
        assert len(out) == 6
        got = {
            (None if pd.isna(r.k) else int(r.k),
             None if pd.isna(r.lv) else int(r.lv),
             None if pd.isna(r.rv) else int(r.rv))
            for r in out.itertuples()
        }
        assert got == {
            (1, 10, None), (2, 20, 200), (None, 30, None), (4, 40, None),
            (3, None, 300), (None, None, 999),
        }

    def test_outer_rejects_broadcast(self, ray_session):
        from recipys_ray.ops.join import hash_join

        l = rd.from_pandas(pd.DataFrame({"k": [1]}))
        r = rd.from_pandas(pd.DataFrame({"k": [1]}))
        with pytest.raises(ValueError, match="broadcast"):
            hash_join(l, r, on="k", how="outer", strategy="broadcast")
