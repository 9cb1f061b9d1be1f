"""kernels/duckdb_parity must reproduce DuckDB 1.0's windowed prefix
SUM/AVG/VAR_SAMP bit-for-bit (the driver's value-hash contract)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from recipys_ray.kernels.duckdb_parity import (
    duckdb_hash_group,
    finalize_mean,
    finalize_sum,
    finalize_var_samp,
    murmurhash64,
    offsets_from_counts,
    prefix_agg_duckdb,
)


def _validate(df):
    """df: columns p (int partition key), i (order), v — returns mismatch
    counts per aggregate vs duckdb."""
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        """SELECT p, v, sum(v) OVER w AS s, avg(v) OVER w AS m,
                  var_samp(v) OVER w AS va
           FROM t WINDOW w AS (PARTITION BY p ORDER BY i
                               ROWS UNBOUNDED PRECEDING)
           ORDER BY p, i"""
    ).df()
    keys_arr = ref["p"].to_numpy()
    change = np.r_[True, keys_arr[1:] != keys_arr[:-1]]
    codes = np.cumsum(change) - 1
    ukeys = keys_arr[np.flatnonzero(change)]
    counts = np.bincount(codes)
    offs = offsets_from_counts(ukeys, counts)
    o_g = np.array([offs[int(k)] for k in ukeys], dtype=np.int64)
    cnt, s, mean, dsq = prefix_agg_duckdb(
        ref["v"].to_numpy(), codes, o_g, True
    )
    bad = {}
    for name, ours in [
        ("s", finalize_sum(cnt, s)),
        ("m", finalize_mean(cnt, s)),
        ("va", finalize_var_samp(cnt, dsq)),
    ]:
        b = ref[name].to_numpy()
        bad[name] = int(
            np.sum(~((ours == b) | (np.isnan(ours) & np.isnan(b))))
        )
    return bad


def test_hash_matches_duckdb():
    con = duckdb.connect()
    h = con.execute(
        "SELECT k, hash(k) AS h FROM (SELECT unnest(range(-500, 5000)) AS k)"
    ).df()
    got = murmurhash64(h["k"].to_numpy().astype(np.int64))
    assert np.array_equal(got, h["h"].to_numpy().astype(np.uint64))


def test_varchar_hash_matches_duckdb():
    import pyarrow as pa

    from recipys_ray.kernels.duckdb_parity import duckdb_hash_varchar

    rng = np.random.default_rng(7)
    alpha = list("abcdefghijklmnop qrstuvwxyz0123_ÄÖüé漢字")
    words = ["", "a", "abcdefg", "abcdefgh", "abcdefghi", "x" * 200] + [
        "".join(rng.choice(alpha, rng.integers(0, 30)))
        for _ in range(1000)
    ]
    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(words)}))
    exp = con.execute("SELECT hash(s) FROM t").df().iloc[:, 0].to_numpy(
        np.uint64
    )
    got = duckdb_hash_varchar(pa.array(words))
    assert np.array_equal(got, exp)
    # large_string, sliced, and null inputs hash identically ('' for null)
    arr = pa.array(words + [None], pa.large_string()).slice(3)
    got2 = duckdb_hash_varchar(arr)
    exp2 = duckdb_hash_varchar(pa.array(words[3:] + [""]))
    assert np.array_equal(got2, exp2)


def test_bit_exact_multi_partition():
    rng = np.random.default_rng(42)
    P, G = 60, 85
    n = P * G
    v = rng.standard_normal(n) * (10.0 ** rng.integers(-6, 6, n))
    v[rng.random(n) < 0.14] = np.nan
    df = pd.DataFrame(
        {"p": np.repeat(np.arange(P), G), "i": np.tile(np.arange(G), P),
         "v": v}
    )
    assert _validate(df) == {"s": 0, "m": 0, "va": 0}


def test_bit_exact_size_torture():
    rng = np.random.default_rng(9)
    rows = []
    for p, sz in enumerate([1, 15, 16, 17, 255, 256, 257, 4096, 50]):
        vv = rng.standard_normal(sz) * (10.0 ** rng.integers(-5, 5, sz))
        vv[rng.random(sz) < 0.3] = np.nan
        if p == 3:
            vv[:] = np.nan  # all-NULL partition
        rows.append(pd.DataFrame({"p": p, "i": np.arange(sz), "v": vv}))
    df = pd.concat(rows, ignore_index=True)
    assert _validate(df) == {"s": 0, "m": 0, "va": 0}


def test_bit_exact_same_hash_group_offsets():
    """Two keys landing in the same duckdb hash group: the second partition
    starts at an unaligned offset, exercising left fragments."""
    ks = np.arange(200)
    g = duckdb_hash_group(ks)
    same = [int(k) for k in ks if g[k] == g[0]][:3]
    assert len(same) >= 3
    rng = np.random.default_rng(3)
    sizes = [137, 2003, 77]
    rows = []
    for k, sz in zip(same, sizes):
        vv = rng.standard_normal(sz) * (10.0 ** rng.integers(-5, 5, sz))
        vv[rng.random(sz) < 0.2] = np.nan
        rows.append(pd.DataFrame({"p": k, "i": np.arange(sz), "v": vv}))
    df = pd.concat(rows, ignore_index=True)
    assert _validate(df) == {"s": 0, "m": 0, "va": 0}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_bit_exact_events(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('/root/testdata/{sf}/events.parquet')"
    )
    df = con.execute(
        """SELECT user_id AS p, ts, event_id AS i,
                  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
           FROM events ORDER BY user_id, ts, event_id"""
    ).df()
    # _validate re-orders by (p, i); use a synthetic strictly-increasing i
    df["i"] = df.groupby("p", sort=False).cumcount()
    assert _validate(df[["p", "i", "v"]]) == {"s": 0, "m": 0, "va": 0}


def _chunked_roundtrip(v, o, bounds):
    from recipys_ray.kernels.duckdb_parity import (
        chunk_parity_payload,
        eval_chunk_with_ctx,
        fold_parity_payloads,
    )

    payloads = [
        chunk_parity_payload(v[bounds[i]:bounds[i + 1]], o, int(bounds[i]))
        for i in range(len(bounds) - 1)
    ]
    ctxs = fold_parity_payloads(payloads, o)
    parts = [
        eval_chunk_with_ctx(
            v[bounds[i]:bounds[i + 1]], o, int(bounds[i]), ctxs[i], True
        )
        for i in range(len(bounds) - 1)
    ]
    return tuple(np.concatenate([p[k] for p in parts]) for k in range(4))


def test_chunked_parity_equals_whole_group():
    """The salted chunk-merge parity path (payload → driver fold → carried
    tree ctx → per-chunk eval) must BIT-match the whole-group kernel for
    random groups, offsets, and chunkings — including all-NaN groups and
    degenerate 1-row chunks."""
    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(2, 1500))
        o = int(rng.integers(0, 5000))
        v = rng.standard_normal(n) * (10.0 ** rng.integers(-5, 5, n))
        v[rng.random(n) < 0.25] = np.nan
        if trial % 7 == 0:
            v[:] = np.nan
        nch = int(rng.integers(1, min(12, n) + 1))
        cuts = (
            np.sort(rng.choice(np.arange(1, n), size=nch - 1, replace=False))
            if nch > 1 else np.array([], dtype=int)
        )
        bounds = np.r_[0, cuts, n]
        if trial % 5 == 0 and n > 8:
            bounds = np.unique(np.r_[0, 1, 2, 4, bounds])
        codes = np.zeros(n, dtype=np.int64)
        cnt, s, mean, dsq = prefix_agg_duckdb(v, codes, np.array([o]), True)
        c2, s2, m2, d2 = _chunked_roundtrip(v, o, bounds)
        for a, b in [(c2, cnt), (s2, s), (d2, dsq)]:
            assert np.all(
                (a == b) | (np.isnan(a) & np.isnan(b))
            ), f"trial {trial} n={n} o={o} bounds={bounds.tolist()}"


def test_chunk_eval_vec_matches_scalar():
    """The vectorized eval_chunk_with_ctx must BIT-match the scalar
    reference (eval_chunk_with_ctx_ref) on every state component across
    random groups/offsets/chunkings — same coverage shapes as the
    whole-group torture, compared chunk-by-chunk."""
    from recipys_ray.kernels.duckdb_parity import (
        chunk_parity_payload,
        eval_chunk_with_ctx,
        eval_chunk_with_ctx_ref,
        fold_parity_payloads,
    )

    rng = np.random.default_rng(77)
    for trial in range(40):
        n = int(rng.integers(2, 1500))
        o = int(rng.integers(0, 5000))
        v = rng.standard_normal(n) * (10.0 ** rng.integers(-5, 5, n))
        v[rng.random(n) < 0.25] = np.nan
        if trial % 9 == 0:
            v[:] = np.nan
        nch = int(rng.integers(1, min(12, n) + 1))
        cuts = (
            np.sort(rng.choice(np.arange(1, n), size=nch - 1, replace=False))
            if nch > 1 else np.array([], dtype=int)
        )
        bounds = np.r_[0, cuts, n]
        if trial % 5 == 0 and n > 8:
            bounds = np.unique(np.r_[0, 1, 2, 4, bounds])
        payloads = [
            chunk_parity_payload(v[bounds[i]:bounds[i + 1]], o,
                                 int(bounds[i]))
            for i in range(len(bounds) - 1)
        ]
        ctxs = fold_parity_payloads(payloads, o)
        for i in range(len(bounds) - 1):
            vv = v[bounds[i]:bounds[i + 1]]
            got = eval_chunk_with_ctx(vv, o, int(bounds[i]), ctxs[i], True)
            ref = eval_chunk_with_ctx_ref(vv, o, int(bounds[i]), ctxs[i],
                                          True)
            for a, b in zip(got, ref):
                assert np.all((a == b) | (np.isnan(a) & np.isnan(b))), (
                    f"trial {trial} chunk {i} n={n} o={o} "
                    f"bounds={bounds.tolist()}"
                )


def test_chunked_parity_deep_tree():
    """Large group (multi-level tree) across many chunks."""
    rng = np.random.default_rng(5)
    n, o = 30_000, 12345
    v = rng.standard_normal(n) * (10.0 ** rng.integers(-5, 5, n))
    v[rng.random(n) < 0.15] = np.nan
    cuts = np.sort(rng.choice(np.arange(1, n), size=60, replace=False))
    bounds = np.r_[0, 1, 3, cuts[cuts > 3], n]
    codes = np.zeros(n, dtype=np.int64)
    cnt, s, mean, dsq = prefix_agg_duckdb(v, codes, np.array([o]), True)
    c2, s2, m2, d2 = _chunked_roundtrip(v, o, np.unique(bounds))
    assert np.all((c2 == cnt))
    assert np.all((s2 == s) | (np.isnan(s2) & np.isnan(s)))
    assert np.all((d2 == dsq) | (np.isnan(d2) & np.isnan(dsq)))


def test_salted_parity_mixed_hot_cold_bit_exact(ray_session):
    """The chunked salted parity path with BOTH salted (hot) and unsalted
    (cold) groups in the same partitions must be bit-exact vs duckdb:
    hot chunks evaluate from carried tree contexts, cold groups take the
    whole-group parity transform in the defer branch."""
    import ray.data as rd

    import recipys_ray as rr
    from recipys_ray.kernels.salted import SaltConfig
    from recipys_ray.selector import all_of
    from recipys_ray.steps.historical import Accumulator

    rng = np.random.default_rng(21)
    rows = []
    sizes = {1: 400, 2: 350, 3: 20, 4: 15, 5: 8, 6: 300}  # hot: >60 rows
    for g, sz in sizes.items():
        v = rng.standard_normal(sz) * (10.0 ** rng.integers(-4, 4, sz))
        v[rng.random(sz) < 0.2] = np.nan
        rows.append(pd.DataFrame({
            "g": g, "t": np.arange(sz, dtype=np.int64), "v": v
        }))
    pdf_in = pd.concat(rows, ignore_index=True)

    rec = rr.Recipe(
        rd.from_pandas(pdf_in), predictors=["v"], groups=["g"],
        sequences=["t"], partitions=4,
        salt=SaltConfig(threshold=60, chunk_span=50),
    )
    rec.add_step(rr.StepHistorical(
        sel=all_of(["v"]), fun=Accumulator.MEAN, duckdb_parity=True))
    rec.add_step(rr.StepHistorical(
        sel=all_of(["v"]), fun=Accumulator.VAR, duckdb_parity=True))
    rec.add_step(rr.StepHistorical(
        sel=all_of(["v"]), fun=Accumulator.SUM, duckdb_parity=True))
    out = rec.prep().to_pandas().sort_values(
        ["g", "t"], ignore_index=True
    )

    con = duckdb.connect()
    con.register("t_in", pdf_in)
    ref = con.execute("""
        SELECT g, t, avg(v) OVER w AS v_mean, var_samp(v) OVER w AS v_var,
               sum(v) OVER w AS v_sum
        FROM t_in WINDOW w AS (PARTITION BY g ORDER BY t
                               ROWS UNBOUNDED PRECEDING)
        ORDER BY g, t""").df()
    for col in ["v_mean", "v_var", "v_sum"]:
        a = out[col].to_numpy()
        b = ref[col].to_numpy()
        assert np.all((a == b) | (np.isnan(a) & np.isnan(b))), col
