"""Deterministic hash-based sampling, splitting and source mixing.

The primitives every large training-data pipeline needs and that must be
REPRODUCIBLE across runs, engines and machines: assignment is a pure
function of the key — ``murmurhash64(key)`` (bit-identical to DuckDB's
``hash()``, verified in kernels/duckdb_parity.py), compared against integer
thresholds ``floor(fraction * 2^64)``. No RNG state, no order dependence,
no shuffle: every stage is a stateless vectorized ``map_batches`` filter,
so the ops stream at any scale and re-runs / retries / different
partitionings always select the same rows.

- ``hash_sample``:   keep a deterministic ``fraction`` of rows by key.
- ``hash_split``:    label rows train/val/test/... by consecutive hash
  ranges (a row's split never changes when other fractions are edited
  upstream of it in the dict order).
- ``mix_sources``:   per-stratum sampling rates (data-mixture control:
  e.g. keep 100% of wiki, 25% of crawl) via one vectorized rate lookup.
- ``mix_temperature``: per-stratum sample sizes ∝ n_i^alpha (temperature
  rebalancing toward rare sources) with integer-exact targets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from recipys_ray.kernels.duckdb_parity import murmurhash64

_U64 = float(2**64)


def _threshold(fraction: float) -> np.uint64:
    f = min(max(float(fraction), 0.0), 1.0)
    return np.uint64(min(int(f * _U64), 2**64 - 1))


def hash_sample(ds, key_col: str, fraction: float):
    """Keep rows with ``hash(key) < fraction * 2^64`` — deterministic,
    order-independent, engine-reproducible (DuckDB: the same predicate)."""
    thr = _threshold(fraction)

    def pick(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        keep = murmurhash64(keys) < thr
        return tbl.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")


def hash_split(ds, key_col: str, fractions: dict,
               out_col: str = "split"):
    """Append a split label by consecutive hash ranges. ``fractions`` maps
    label -> fraction; they must sum to ≤ 1 (any remainder gets the last
    label). Dict order defines the ranges, so a row's assignment is stable
    under changes to LATER entries."""
    labels = list(fractions)
    if not labels:
        raise ValueError("fractions must not be empty")
    cum = np.cumsum([float(fractions[k]) for k in labels])
    if cum[-1] > 1.0 + 1e-12:
        raise ValueError(f"fractions sum to {cum[-1]} > 1")
    bounds = np.array(
        [np.uint64(min(int(c * _U64), 2**64 - 1)) for c in cum],
        dtype=np.uint64,
    )
    bounds[-1] = np.uint64(2**64 - 1)  # remainder → last label
    lab_arr = np.array(labels, dtype=object)

    def assign(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        h = murmurhash64(keys)
        idx = np.searchsorted(bounds, h, side="right")
        idx = np.minimum(idx, len(labels) - 1)
        return tbl.append_column(
            out_col, pa.array(lab_arr[idx], pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def mix_sources(ds, key_col: str, strata_col: str, rates: dict,
                default_rate: float = 1.0):
    """Per-stratum deterministic sampling (data-mixture control): keep a
    row iff ``hash(key) < rate[stratum] * 2^64``. Rates are a small
    broadcast dict; unknown strata use ``default_rate``."""
    thr = {k: _threshold(v) for k, v in rates.items()}
    dthr = _threshold(default_rate)

    def pick(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        svals = tbl.column(strata_col).to_numpy(zero_copy_only=False)
        # masked assignment per stratum: uint64 thresholds must never pass
        # through a float (2^64-1 would round and wrap)
        lim = np.full(len(svals), dthr, dtype=np.uint64)
        for k, t in thr.items():
            lim[svals == k] = t
        keep = murmurhash64(keys) < lim
        return tbl.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow")


def sample_per_group(ds, group_cols: list[str], key_col: str, n: int):
    """Deterministic per-group sample: the ``n`` rows with the SMALLEST
    ``murmurhash64(key)`` per group (tie-break key asc) — statistically a
    uniform without-replacement sample per group (the hash is a fixed
    random permutation of keys), but exactly reproducible across runs,
    layouts and engines (``hash()`` parity with DuckDB), resumable, and
    shuffle-light via the :func:`recipys_ray.ops.topk.top_k_per_group`
    combiner (≤ n rows per (group, block) move). The 0-based ``rank``
    column is the sample order, so a smaller sample is always a prefix of
    a larger one (coordinated sampling)."""
    from recipys_ray.ops.topk import top_k_per_group

    H = "__skey__"

    def stamp(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        return tbl.append_column(
            H, pa.array(murmurhash64(keys), pa.uint64())
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    out = top_k_per_group(
        stamped, group_cols, H, k=n, descending=False, tie_cols=[key_col]
    )
    return out.map_batches(
        lambda t: t.drop_columns([H]), batch_format="pyarrow"
    )


def mix_temperature(
    ds,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
):
    """Temperature-based source rebalancing: draw a deterministic
    without-replacement sample whose per-stratum sizes follow
    ``n_i^alpha`` (alpha < 1 flattens the mixture toward rare sources —
    the multilingual-LM "temperature sampling" rule, e.g. mT5 §3.1),
    totalling ~``budget`` rows (default: half the corpus).

    Exactness contract: per-stratum targets are PURE INTEGER arithmetic —
    ``w_i = floor(n_i^alpha)`` (for the default alpha=0.5 this is
    floor(sqrt), correctly rounded IEEE sqrt, identical in every engine),
    ``t_i = min(n_i, budget * w_i // Σw)`` with python-int multiply and
    floor division (no float ratio anywhere) — so an oracle can restate
    the formula verbatim in SQL. Row selection is the coordinated
    smallest-``hash(key)``-first rule of :func:`sample_per_group`
    (murmur ≡ DuckDB ``hash()``), so a re-run, a different layout or a
    bigger budget always yields a superset prefix per stratum.

    Distributed shape: one combiner counts pass (distinct stratum
    partials only), targets fold on the driver (#strata rows), then the
    ``top_k_per_group`` combiner bounds every (stratum, block) to the
    max target — no payload shuffle of unsampled rows.
    """
    import math

    from recipys_ray.ops.topk import top_k_per_group

    def partial_counts(tbl: pa.Table) -> pa.Table:
        return tbl.select([strata_col]).group_by([strata_col]).aggregate(
            [([], "count_all")]
        )

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(strata_col)
        .sum("count_all")
        .to_pandas()
    )
    n_by = {
        s: int(n)
        for s, n in zip(counts[strata_col], counts["sum(count_all)"])
    }
    total = sum(n_by.values())
    if budget is None:
        budget = total // 2
    budget = int(budget)
    # w_i = floor(n^alpha) via libm pow on python floats (glibc pow is
    # correctly rounded; alpha=0.5 ≡ sqrt exactly)
    w_by = {s: int(math.floor(math.pow(n, alpha))) for s, n in n_by.items()}
    sw = sum(w_by.values())
    if sw == 0:
        raise ValueError("all strata have zero weight (empty input?)")
    targets = {
        s: min(n_by[s], budget * w_by[s] // sw) for s in n_by
    }
    max_t = max(targets.values())
    if max_t == 0:
        return ds.filter(lambda row: False)

    H = "__skey__"

    def stamp(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        return tbl.append_column(
            H, pa.array(murmurhash64(keys), pa.uint64())
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    ranked = top_k_per_group(
        stamped, [strata_col], H, k=max_t, descending=False,
        tie_cols=[key_col],
    )

    def cut(tbl: pa.Table) -> pa.Table:
        strat = tbl.column(strata_col).to_numpy(zero_copy_only=False)
        lim = (
            pd.Series(strat).map(targets).fillna(0).to_numpy(np.int64)
        )
        rank = tbl.column("rank").to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array(rank < lim)).drop_columns([H])

    return ranked.map_batches(cut, batch_format="pyarrow")


def weighted_sample(ds, key_col: str, weight_col: str, k: int):
    """Deterministic weighted sample WITHOUT replacement of size ``k``:
    priority sampling (Duffield-Lund-Thorup) — keep the k rows with the
    largest priority ``w / u`` where ``u = (hash(key)+1) / 2^64`` is the
    row's fixed uniform draw. Inclusion probability rises with weight; the
    sample is exactly reproducible across runs, layouts and engines:
    ``murmurhash64 ≡ DuckDB hash()``, and the priority uses only IEEE
    mul/div (correctly rounded everywhere) — never log/pow, whose last
    ulp differs between libms (the Efraimidis-Spirakis ``u^(1/w)`` form
    would not hash-reproduce across engines).

    Rows with weight ≤ 0 or null weight/key are excluded. Shuffle-free:
    per-block top-k combiner (≤ k rows leave each block), single small
    finish task. Ties (equal priority) break by key ascending."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    P = "__prio__"

    def combine(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        w = tbl.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        u = (murmurhash64(keys).astype(np.float64) + 1.0) / _U64
        with np.errstate(invalid="ignore", divide="ignore"):
            prio = w / u
        ok = (w > 0) & ~pd.isna(keys)
        tbl = tbl.append_column(P, pa.array(np.where(ok, prio, -np.inf)))
        tbl = tbl.filter(pa.array(ok))
        if len(tbl) <= k:
            return tbl
        idx = pc.sort_indices(
            tbl, sort_keys=[(P, "descending"), (key_col, "ascending")]
        )
        return tbl.take(idx[:k])

    def finish(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[(P, "descending"), (key_col, "ascending")]
        )
        return tbl.take(idx[: min(k, len(tbl))]).drop_columns([P])

    partials = ds.map_batches(
        combine, batch_format="pyarrow", batch_size=262_144
    )
    # survivors are ≤ k per block — a single finish task is bounded
    return partials.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def time_split(
    ds,
    ts_col: str,
    train_frac: float = 0.8,
    label_col: str = "split",
    labels: tuple[str, str] = ("train", "test"),
    bins: int = 1024,
):
    """Leakage-free TEMPORAL train/test split: the cutoff is the exact
    ``quantile_disc(ts, train_frac)`` order statistic, rows with
    ``ts <= cutoff`` are labelled ``labels[0]``, later rows ``labels[1]``
    (null timestamps label as test — SQL ``ts <= x`` is NULL-false). The
    standard protocol for evaluating on the future rather than a random
    shuffle (which leaks future behavior into training).

    Exactness: the quantile runs on the int64 epoch-MICROSECOND view of
    the column via :func:`~recipys_ray.ops.quantiles.exact_quantiles`
    (iterative counting selection, no sort); epoch-us values for any
    plausible date are < 2^53 so the float brackets represent them
    exactly, and the final comparison is integer-exact. One stats pass +
    a few skinny counting rounds + one streaming stamp — the corpus
    never shuffles."""
    import pyarrow.compute as pc

    from recipys_ray.ops.quantiles import exact_quantiles

    from recipys_ray.kernels.grouped import _lazy_size_bytes

    if not 0.0 < float(train_frac) < 1.0:
        raise ValueError(f"train_frac must be in (0, 1), got {train_frac}")

    # multi-pass (quantile rounds + stamp): pin DERIVED inputs once, let
    # pure parquet reads re-stream (standard policy, ROUND5_NOTES.md)
    if _lazy_size_bytes(ds) is None:
        ds = ds.materialize()

    def as_epoch(tbl: pa.Table) -> pa.Table:
        arr = tbl.column(ts_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        us = pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
        return pa.table({"__epoch_us__": us})

    cut = exact_quantiles(
        ds.map_batches(as_epoch, batch_format="pyarrow"),
        "__epoch_us__", qs=[float(train_frac)], bins=bins, pin=False,
    )["value"].iloc[0]
    if np.isnan(cut):
        raise ValueError(f"time_split: column {ts_col!r} is all null")
    cutoff = int(cut)

    def stamp(tbl: pa.Table) -> pa.Table:
        arr = tbl.column(ts_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        us = pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
        is_train = pc.and_kleene(
            pc.is_valid(us), pc.less_equal(us, pa.scalar(cutoff))
        )
        lab = pc.if_else(
            pc.fill_null(is_train, False), labels[0], labels[1]
        )
        return tbl.append_column(label_col, lab)

    return ds.map_batches(stamp, batch_format="pyarrow")


def balanced_sample(
    ds,
    class_col: str,
    id_col: str,
    boundary_cap: int = 2_000_000,
    _bucket_bits: int = 12,
):
    """Exact class rebalancing: downsample every class to the SMALLEST
    class's row count, keeping each class's ``n_min`` rows with the
    lowest ``(murmurhash64(id), id)`` — deterministic, order- and
    partition-independent, engine-reproducible (DuckDB: ``row_number()
    OVER (PARTITION BY class ORDER BY hash(id), id) <= n_min``).

    NO payload shuffle at any class size — per-class counting selection
    over the hash domain instead of a sort:

    1. one combiner pass folds (class, hash-top-bits bucket) counts —
       ≤ classes · 2^bits tiny rows on the driver;
    2. each class's cutoff bucket is located by cumulative count; ONLY
       that bucket's members (expected n_class / 2^bits rows, capped by
       ``boundary_cap``) are collected to rank the exact cutoff
       ``(hash, id)`` pair — classes already at ``n_min`` skip straight
       to keep-all;
    3. one streaming stamp filter keeps rows strictly below the cutoff
       (ties broken by id, mirroring the SQL ORDER BY).

    Rows with a null class or id are dropped. Returns the kept rows with
    all input columns.
    """
    from recipys_ray.kernels.duckdb_parity import murmurhash64

    shift = np.uint64(64 - _bucket_bits)

    def bucket_counts(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(class_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = cls.notna() & ids.notna()
        h = murmurhash64(ids[ok].to_numpy())
        pdf = pd.DataFrame({
            "cls": cls[ok].to_numpy(),
            "b": (h >> shift).astype(np.int64),
        })
        out = (
            pdf.groupby(["cls", "b"], sort=False, observed=True)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (
        ds.select_columns([class_col, id_col])
        .map_batches(bucket_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby(["cls", "b"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    if not len(parts):
        return ds.limit(0)
    totals = parts.groupby("cls")["n"].sum()
    n_min = int(totals.min())

    # locate each class's cutoff bucket: first bucket where cum >= n_min
    boundary: dict = {}  # cls -> (bucket, rank_within_bucket)
    keep_all = set()
    for cls, grp in parts.groupby("cls", sort=False):
        if int(totals[cls]) == n_min:
            keep_all.add(cls)
            continue
        cum = grp["n"].cumsum()
        i = int(np.searchsorted(cum.to_numpy(), n_min, side="left"))
        before = int(cum.iloc[i - 1]) if i else 0
        boundary[cls] = (int(grp["b"].iloc[i]), n_min - before)

    def collect_boundary(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(class_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = cls.notna() & ids.notna()
        idv = ids[ok].to_numpy()
        clv = cls[ok].to_numpy()
        h = murmurhash64(idv)
        b = (h >> shift).astype(np.int64)
        bmap = pd.Series({c: v[0] for c, v in boundary.items()})
        wantb = pd.Series(clv).map(bmap).to_numpy(np.float64)
        want = wantb == b.astype(np.float64)  # NaN (keep-all cls) -> False
        return pa.table({
            "cls": pa.array(clv[want]),
            "h": pa.array(h[want], pa.uint64()),
            "id": pa.array(idv[want]),
        })

    if boundary:
        bdf = (
            ds.select_columns([class_col, id_col])
            .map_batches(collect_boundary, batch_format="pyarrow")
            .to_pandas()
        )
        if len(bdf) > boundary_cap:
            raise ValueError(
                f"boundary buckets hold {len(bdf)} rows > boundary_cap="
                f"{boundary_cap}; raise _bucket_bits"
            )
        cuts: dict = {}
        for cls, grp in bdf.groupby("cls", sort=False):
            grp = grp.sort_values(["h", "id"], kind="stable")
            _, rank = boundary[cls]
            row = grp.iloc[rank - 1]
            cuts[cls] = (np.uint64(row["h"]), row["id"])
    else:
        cuts = {}

    def stamp(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(class_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = (cls.notna() & ids.notna()).to_numpy()
        idv = ids.to_numpy()
        clv = cls.to_numpy()
        h = murmurhash64(idv)
        keep = np.zeros(len(tbl), dtype=bool)
        for c in np.unique(clv[ok]):
            m = ok & (clv == c)
            if c in keep_all:
                keep[m] = True
                continue
            cut_h, cut_id = cuts[c]
            hm = h[m]
            keep[m] = (hm < cut_h) | ((hm == cut_h) & (idv[m] <= cut_id))
        return tbl.filter(pa.array(keep))

    return ds.map_batches(stamp, batch_format="pyarrow")


def oversample_minority(
    ds,
    class_col: str,
    id_col: str,
    copy_col: str = "copy_idx",
    boundary_cap: int = 2_000_000,
    _bucket_bits: int = 12,
):
    """Exact minority OVERSAMPLING to the largest class's row count —
    the step_upsample analog and :func:`balanced_sample`'s mirror. Every
    class ends with exactly ``T = max(n_c)`` rows: each row replicates
    ``base = T // n_c`` times, and the ``rem = T mod n_c`` rows with the
    lowest ``(murmurhash64(id), id)`` get one extra copy — deterministic,
    order/partition independent, engine-reproducible (DuckDB:
    ``rn <= rem`` over ``row_number() ... ORDER BY hash(id), id``).
    ``copy_col`` numbers each row's copies 1..k, mirroring the oracle's
    ``unnest(generate_series(...))``.

    NO payload shuffle at any class size: the remainder cutoff per class
    comes from the same hash-domain counting selection as
    :func:`balanced_sample` (bucket-count combiner → one boundary-bucket
    collection ≤ ``boundary_cap`` → streaming replicate stamp). Rows
    with a null class or id are dropped."""
    from recipys_ray.kernels.duckdb_parity import murmurhash64

    shift = np.uint64(64 - _bucket_bits)

    def bucket_counts(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(class_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = cls.notna() & ids.notna()
        h = murmurhash64(ids[ok].to_numpy())
        pdf = pd.DataFrame({
            "cls": cls[ok].to_numpy(),
            "b": (h >> shift).astype(np.int64),
        })
        out = (
            pdf.groupby(["cls", "b"], sort=False, observed=True)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (
        ds.select_columns([class_col, id_col])
        .map_batches(bucket_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby(["cls", "b"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    if not len(parts):
        return ds.limit(0)
    totals = parts.groupby("cls")["n"].sum()
    target = int(totals.max())

    base: dict = {}
    boundary: dict = {}  # cls -> (bucket, rank_within_bucket) for rem
    for cls, grp in parts.groupby("cls", sort=False):
        n_c = int(totals[cls])
        base[cls] = target // n_c
        rem = target % n_c
        if rem == 0:
            continue
        cum = grp["n"].cumsum()
        i = int(np.searchsorted(cum.to_numpy(), rem, side="left"))
        before = int(cum.iloc[i - 1]) if i else 0
        boundary[cls] = (int(grp["b"].iloc[i]), rem - before)

    def collect_boundary(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(class_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = cls.notna() & ids.notna()
        idv = ids[ok].to_numpy()
        clv = cls[ok].to_numpy()
        h = murmurhash64(idv)
        b = (h >> shift).astype(np.int64)
        bmap = pd.Series({c: v[0] for c, v in boundary.items()})
        wantb = pd.Series(clv).map(bmap).to_numpy(np.float64)
        want = wantb == b.astype(np.float64)
        return pa.table({
            "cls": pa.array(clv[want]),
            "h": pa.array(h[want], pa.uint64()),
            "id": pa.array(idv[want]),
        })

    cuts: dict = {}
    if boundary:
        bdf = (
            ds.select_columns([class_col, id_col])
            .map_batches(collect_boundary, batch_format="pyarrow")
            .to_pandas()
        )
        if len(bdf) > boundary_cap:
            raise ValueError(
                f"boundary buckets hold {len(bdf)} rows > boundary_cap="
                f"{boundary_cap}; raise _bucket_bits"
            )
        for cls, grp in bdf.groupby("cls", sort=False):
            grp = grp.sort_values(["h", "id"], kind="stable")
            _, rank = boundary[cls]
            row = grp.iloc[rank - 1]
            cuts[cls] = (np.uint64(row["h"]), row["id"])

    def stamp(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(class_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = (cls.notna() & ids.notna()).to_numpy()
        idv = ids.to_numpy()
        clv = cls.to_numpy()
        h = murmurhash64(idv)
        copies = np.zeros(len(tbl), dtype=np.int64)
        for c in np.unique(clv[ok]):
            m = ok & (clv == c)
            k = base[c]
            if c in cuts:
                cut_h, cut_id = cuts[c]
                hm = h[m]
                extra = (hm < cut_h) | (
                    (hm == cut_h) & (idv[m] <= cut_id)
                )
                copies[m] = k + extra.astype(np.int64)
            else:
                copies[m] = k
        idx = np.repeat(np.arange(len(tbl)), copies)
        out = tbl.take(pa.array(idx, pa.int64()))
        # copy index 1..k per source row via offset arithmetic
        ends = np.cumsum(copies)
        starts = ends - copies
        ci = np.arange(len(idx), dtype=np.int64) - starts[idx] + 1
        return out.append_column(copy_col, pa.array(ci, pa.int64()))

    return ds.map_batches(stamp, batch_format="pyarrow")


def stratified_split(
    ds,
    strata_col: str,
    id_col: str,
    test_frac: float,
    label_col: str = "split",
    boundary_cap: int = 2_000_000,
    _bucket_bits: int = 12,
):
    """Deterministic stratified train/test split: within every stratum,
    EXACTLY ``floor(test_frac · n)`` rows are labeled ``'test'`` — the
    rows with the lowest ``(murmurhash64(id), id)`` — and the rest
    ``'train'``. Order-, partition- and engine-reproducible (DuckDB:
    ``row_number() OVER (PARTITION BY s ORDER BY hash(id), id) <=
    floor(test_frac · count(*) OVER (PARTITION BY s))``).

    Same counting-selection protocol as :func:`balanced_sample` — NO
    payload shuffle at any stratum size: one (stratum, hash-bucket)
    count combiner to the driver, only each stratum's single cutoff
    bucket is collected to rank the exact boundary pair, then one
    streaming stamp. Per-stratum targets use one double multiply +
    floor, matching the SQL expression bit-for-bit. Rows with a null
    stratum or id are labeled ``'train'`` (they never enter the hash
    ranking)."""
    from recipys_ray.kernels.duckdb_parity import murmurhash64

    if not (0.0 <= test_frac <= 1.0):
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    shift = np.uint64(64 - _bucket_bits)

    def bucket_counts(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(strata_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = cls.notna() & ids.notna()
        h = murmurhash64(ids[ok].to_numpy())
        pdf = pd.DataFrame({
            "cls": cls[ok].to_numpy(),
            "b": (h >> shift).astype(np.int64),
        })
        out = (
            pdf.groupby(["cls", "b"], sort=False, observed=True)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (
        ds.select_columns([strata_col, id_col])
        .map_batches(bucket_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby(["cls", "b"], sort=True)["n"]
        .sum()
        .reset_index()
    )

    def add_label(tbl: pa.Table, labels: np.ndarray) -> pa.Table:
        return tbl.append_column(
            label_col, pa.array(labels, pa.string())
        )

    if not len(parts):
        return ds.map_batches(
            lambda t: add_label(
                t, np.full(t.num_rows, "train", dtype=object)
            ),
            batch_format="pyarrow",
        )

    totals = parts.groupby("cls")["n"].sum()
    # n_test per stratum: ONE double multiply + floor — the SQL
    # floor(test_frac * n) expression verbatim
    n_test = {
        c: int(np.floor(test_frac * np.float64(int(n))))
        for c, n in totals.items()
    }

    boundary: dict = {}  # cls -> (bucket, rank_within_bucket)
    all_test = set()
    all_train = set()
    for cls, grp in parts.groupby("cls", sort=False):
        t = n_test[cls]
        if t == 0:
            all_train.add(cls)
            continue
        if t == int(totals[cls]):
            all_test.add(cls)
            continue
        cum = grp["n"].cumsum()
        i = int(np.searchsorted(cum.to_numpy(), t, side="left"))
        before = int(cum.iloc[i - 1]) if i else 0
        boundary[cls] = (int(grp["b"].iloc[i]), t - before)

    def collect_boundary(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(strata_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = cls.notna() & ids.notna()
        idv = ids[ok].to_numpy()
        clv = cls[ok].to_numpy()
        h = murmurhash64(idv)
        b = (h >> shift).astype(np.int64)
        bmap = pd.Series({c: v[0] for c, v in boundary.items()})
        wantb = pd.Series(clv).map(bmap).to_numpy(np.float64)
        want = wantb == b.astype(np.float64)
        return pa.table({
            "cls": pa.array(clv[want]),
            "h": pa.array(h[want], pa.uint64()),
            "id": pa.array(idv[want]),
        })

    cuts: dict = {}
    if boundary:
        bdf = (
            ds.select_columns([strata_col, id_col])
            .map_batches(collect_boundary, batch_format="pyarrow")
            .to_pandas()
        )
        if len(bdf) > boundary_cap:
            raise ValueError(
                f"boundary buckets hold {len(bdf)} rows > boundary_cap="
                f"{boundary_cap}; raise _bucket_bits"
            )
        for cls, grp in bdf.groupby("cls", sort=False):
            grp = grp.sort_values(["h", "id"], kind="stable")
            _, rank = boundary[cls]
            row = grp.iloc[rank - 1]
            cuts[cls] = (np.uint64(row["h"]), row["id"])

    def stamp(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(strata_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        ok = (cls.notna() & ids.notna()).to_numpy()
        idv = ids.to_numpy()
        clv = cls.to_numpy()
        h = murmurhash64(idv)
        is_test = np.zeros(len(tbl), dtype=bool)
        for c in np.unique(clv[ok]):
            m = ok & (clv == c)
            if c in all_test:
                is_test[m] = True
            elif c in all_train:
                continue
            else:
                cut_h, cut_id = cuts[c]
                hm = h[m]
                is_test[m] = (hm < cut_h) | (
                    (hm == cut_h) & (idv[m] <= cut_id)
                )
        labels = np.where(is_test, "test", "train").astype(object)
        return add_label(tbl, labels)

    return ds.map_batches(stamp, batch_format="pyarrow")


def budget_sample(
    ds,
    strata_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    boundary_cap: int = 2_000_000,
    _bucket_bits: int = 12,
):
    """Per-stratum TOKEN-BUDGET selection — the data-mixing primitive
    "keep documents from each source until its token budget is spent":
    within every stratum, walk rows in ``(murmurhash64(id), id)`` order
    and keep each row while the running weight total (inclusive) stays
    ≤ ``budget``. Deterministic, order/partition/engine-reproducible
    (DuckDB: ``sum(w) OVER (PARTITION BY s ORDER BY hash(id), id) <=
    budget``).

    Same counting-selection shape as :func:`stratified_split`, folded
    over WEIGHTS instead of row counts — NO payload shuffle at any
    stratum size: one (stratum, hash-bucket) weight-sum combiner to the
    driver, only each stratum's cutoff bucket is collected to locate the
    exact last-kept ``(hash, id)`` pair by prefix sum, then one
    streaming filter. Weights must be non-negative integers (null
    weight/stratum/id rows are dropped). Per-stratum Σw must stay
    < 2⁶³."""
    from recipys_ray.kernels.duckdb_parity import murmurhash64

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    shift = np.uint64(64 - _bucket_bits)

    def bucket_weights(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(strata_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        w = tbl.column(weight_col).to_pandas()
        ok = cls.notna() & ids.notna() & w.notna()
        h = murmurhash64(ids[ok].to_numpy())
        pdf = pd.DataFrame({
            "cls": cls[ok].to_numpy(),
            "b": (h >> shift).astype(np.int64),
            "w": w[ok].to_numpy().astype(np.int64),
        })
        out = (
            pdf.groupby(["cls", "b"], sort=False, observed=True)["w"]
            .sum()
            .reset_index(name="w")
        )
        out["w"] = out["w"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (
        ds.select_columns([strata_col, id_col, weight_col])
        .map_batches(bucket_weights, batch_format="pyarrow")
        .to_pandas()
        .groupby(["cls", "b"], sort=True)["w"]
        .sum()
        .reset_index()
    )
    if not len(parts):
        return ds.limit(0)

    totals = parts.groupby("cls")["w"].sum()
    keep_all = set()
    boundary: dict = {}  # cls -> (bucket, weight_before_bucket)
    for cls, grp in parts.groupby("cls", sort=False):
        if int(totals[cls]) <= budget:
            keep_all.add(cls)
            continue
        cum = grp["w"].cumsum().to_numpy()
        # first bucket whose inclusive weight total exceeds the budget
        i = int(np.searchsorted(cum, budget, side="right"))
        before = int(cum[i - 1]) if i else 0
        boundary[cls] = (int(grp["b"].iloc[i]), before)

    def collect_boundary(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(strata_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        w = tbl.column(weight_col).to_pandas()
        ok = cls.notna() & ids.notna() & w.notna()
        idv = ids[ok].to_numpy()
        clv = cls[ok].to_numpy()
        wv = w[ok].to_numpy().astype(np.int64)
        h = murmurhash64(idv)
        b = (h >> shift).astype(np.int64)
        bmap = pd.Series({c: v[0] for c, v in boundary.items()})
        wantb = pd.Series(clv).map(bmap).to_numpy(np.float64)
        want = wantb == b.astype(np.float64)
        return pa.table({
            "cls": pa.array(
                clv[want], type=tbl.schema.field(strata_col).type
            ),
            "h": pa.array(h[want], pa.uint64()),
            "id": pa.array(
                idv[want], type=tbl.schema.field(id_col).type
            ),
            "w": pa.array(wv[want], pa.int64()),
        })

    # cls -> (cut_bucket, cut_h, cut_id) — rows of the cut bucket at or
    # below the pair are kept; earlier buckets are kept wholesale. A
    # boundary bucket whose very first row busts the budget keeps
    # nothing from that bucket (cutpair None).
    cuts: dict = {}
    if boundary:
        bdf = (
            ds.select_columns([strata_col, id_col, weight_col])
            .map_batches(collect_boundary, batch_format="pyarrow")
            .to_pandas()
        )
        if len(bdf) > boundary_cap:
            raise ValueError(
                f"boundary buckets hold {len(bdf)} rows > boundary_cap="
                f"{boundary_cap}; raise _bucket_bits"
            )
        for cls, grp in bdf.groupby("cls", sort=False):
            grp = grp.sort_values(["h", "id"], kind="stable")
            bkt, before = boundary[cls]
            cw = before + grp["w"].cumsum().to_numpy()
            n_keep = int(np.searchsorted(cw, budget, side="right"))
            if n_keep == 0:
                cuts[cls] = (bkt, None, None)
            else:
                row = grp.iloc[n_keep - 1]
                cuts[cls] = (bkt, np.uint64(row["h"]), row["id"])

    def stamp(tbl: pa.Table) -> pa.Table:
        cls = tbl.column(strata_col).to_pandas()
        ids = tbl.column(id_col).to_pandas()
        w = tbl.column(weight_col).to_pandas()
        ok = (cls.notna() & ids.notna() & w.notna()).to_numpy()
        idv = ids.to_numpy()
        clv = cls.to_numpy()
        h = murmurhash64(idv)
        b = (h >> shift).astype(np.int64)
        keep = np.zeros(len(tbl), dtype=bool)
        for c in np.unique(clv[ok]):
            m = ok & (clv == c)
            if c in keep_all:
                keep[m] = True
                continue
            bkt, cut_h, cut_id = cuts[c]
            keep[m] = b[m] < bkt
            if cut_h is not None:
                hm = h[m]
                keep[m] |= (b[m] == bkt) & (
                    (hm < cut_h) | ((hm == cut_h) & (idv[m] <= cut_id))
                )
        return tbl.filter(pa.array(keep))

    return ds.map_batches(stamp, batch_format="pyarrow")


def negative_samples(
    ds,
    key_col: str,
    items,
    k: int = 1,
    out_col: str = "neg_item",
    j_col: str = "neg_j",
    max_items: int = 50_000_000,
):
    """Deterministic negative sampling for contrastive / ranking training
    data: for every input row, emit ``k`` rows whose ``out_col`` is a
    pseudo-random pick from the item universe — reproducible across runs,
    engines and partitionings because the pick is a pure function of the
    row key: ``items_sorted[murmurhash64(key·k + j) mod n_items]``
    (murmur ≡ DuckDB ``hash()``, so a SQL oracle states the same pick).

    ``items``: the item universe — a sequence/array, or a Dataset with a
    single column to collect (driver-bounded by ``max_items``; a product
    catalog / vocab fits by construction — this op is NOT for sampling
    from the event stream itself). The universe is sorted ascending and
    broadcast once with ``ray.put``; sampling is one vectorized
    hash+gather per batch, no shuffle, no RNG state.

    Standard caveat (documented, not hidden): a negative can collide with
    the row's positive — at realistic universe sizes the collision rate
    is k/n and downstream losses either tolerate or filter it.

    ``key_col`` must be int64 (row keys). Output: input columns + j_col
    (0..k-1, int64) + out_col — k rows per input row.
    """
    import ray

    from recipys_ray.kernels.duckdb_parity import murmurhash64

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if hasattr(items, "to_pandas"):
        icol = items.schema().names[0]
        idf = items.to_pandas()
        vals = idf[icol].dropna().unique()
    else:
        vals = pd.Series(list(items)).dropna().unique()
    if len(vals) > max_items:
        raise ValueError(
            f"item universe {len(vals)} > max_items={max_items}; "
            "negative sampling broadcasts the universe — use a bounded "
            "catalog/vocab"
        )
    if len(vals) == 0:
        raise ValueError("item universe is empty")
    universe = np.sort(vals)
    n_items = np.uint64(len(universe))
    uref = ray.put(universe)
    kk = np.int64(k)

    def sample(tbl: pa.Table) -> pa.Table:
        uni = ray.get(uref)  # zero-copy plasma read per task
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        # k rows per input row, j fastest-varying (mirrors the SQL
        # CROSS JOIN range(k) expansion)
        rep = np.repeat(np.arange(n, dtype=np.int64), k)
        j = np.tile(np.arange(k, dtype=np.int64), n)
        h = murmurhash64(keys[rep] * kk + j)
        idx = (h % n_items).astype(np.int64)
        out = tbl.take(pa.array(rep))
        out = out.append_column(j_col, pa.array(j, pa.int64()))
        return out.append_column(out_col, pa.array(uni[idx]))

    return ds.map_batches(sample, batch_format="pyarrow")
