"""Privacy suppression ops — k-anonymity over quasi-identifier columns.

``k_anonymize`` drops every row whose quasi-identifier (QI) combination has
fewer than ``k`` occurrences in the corpus — the standard suppression step
before releasing training data keyed on demographic-ish columns.

Distributed shape (designed for the 100-TB case):
1. Count pass: per-block combiner (one local groupby per batch emits
   partial (QI, n) rows) → tiny global groupby sum. Only the QI columns'
   DISTINCT partials move — never payload rows.
2. Filter pass:
   - qualifying-set ≤ ``max_driver_groups`` → the qualifying QI keys are
     broadcast once (``ray.put``) and every batch filters locally with one
     vectorized hash join — ZERO payload shuffle (the common case: QI
     spaces are small by construction, that's why k-anonymity works);
   - larger → explicit error telling the caller to coarsen the QI or raise
     the cap: silently shuffling the full payload on a "privacy filter" is
     a scale bug, not a fallback (the co-partitioned route exists as
     ``ops.join.hash_join`` semi mode if a caller truly wants it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def k_anonymize(
    ds,
    qi_cols: list[str],
    k: int,
    max_driver_groups: int = 2_000_000,
):
    """Keep only rows whose ``qi_cols`` tuple occurs at least ``k`` times.

    NULL handling matches SQL ``GROUP BY``: NULL QI values form their own
    group (NULLs are equal to each other for counting purposes).
    """
    import ray

    if k < 1:
        raise ValueError("k must be >= 1")
    qi_cols = list(qi_cols)

    def partial_counts(tbl: pa.Table) -> pa.Table:
        return tbl.select(qi_cols).group_by(qi_cols).aggregate(
            [([], "count_all")]
        )

    counts = ds.map_batches(partial_counts, batch_format="pyarrow")
    agg = counts.groupby(qi_cols).sum("count_all")

    def at_least_k(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.greater_equal(tbl.column("sum(count_all)"), k)
        return tbl.filter(mask).select(qi_cols)

    # qualifying set is bounded by the QI space, not the corpus — a tiny
    # driver pull; the guard makes the bound explicit
    qual = agg.map_batches(at_least_k, batch_format="pyarrow").to_pandas()
    if len(qual) > max_driver_groups:
        raise ValueError(
            f"{len(qual)} qualifying QI groups exceeds max_driver_groups="
            f"{max_driver_groups}; coarsen the quasi-identifier or raise "
            "the cap"
        )
    keys = qual[qi_cols].reset_index(drop=True)
    keys_ref = ray.put(keys)

    def keep_rows(tbl: pa.Table) -> pa.Table:
        kdf = ray.get(keys_ref)
        left = tbl.select(qi_cols).to_pandas()
        # one vectorized hash join per batch; indicator via index stamp
        kdf2 = kdf.assign(__keep__=np.True_)
        merged = left.merge(kdf2, on=qi_cols, how="left")
        mask = merged["__keep__"].notna().to_numpy()
        return tbl.filter(pa.array(mask))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def l_diversify(
    ds,
    qi_cols: list[str],
    sensitive_col: str,
    l: int,  # noqa: E741 — the literature's name
    max_driver_groups: int = 2_000_000,
):
    """Keep only rows whose QI group contains at least ``l`` DISTINCT
    values of ``sensitive_col`` (distinct l-diversity, Machanavajjhala
    2007 §3) — k-anonymity's sibling against homogeneity attacks.

    Count pass reuses :func:`recipys_ray.ops.distinct.distinct_per_group`
    (exact per-block (QI, sensitive) pair combiner — only distinct pairs
    move); qualifying QI keys broadcast once, then the same zero-shuffle
    per-batch filter as :func:`k_anonymize`.
    """
    import ray

    from recipys_ray.ops.distinct import distinct_per_group

    if l < 1:
        raise ValueError("l must be >= 1")
    qi_cols = list(qi_cols)
    per_qi = distinct_per_group(ds, qi_cols, sensitive_col)

    def at_least_l(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.greater_equal(tbl.column("n_distinct"), l)
        return tbl.filter(mask).select(qi_cols)

    qual = per_qi.map_batches(at_least_l, batch_format="pyarrow").to_pandas()
    if len(qual) > max_driver_groups:
        raise ValueError(
            f"{len(qual)} qualifying QI groups exceeds max_driver_groups="
            f"{max_driver_groups}; coarsen the quasi-identifier or raise "
            "the cap"
        )
    keys_ref = ray.put(qual.reset_index(drop=True))

    def keep_rows(tbl: pa.Table) -> pa.Table:
        kdf = ray.get(keys_ref).assign(__keep__=np.True_)
        left = tbl.select(qi_cols).to_pandas()
        merged = left.merge(kdf, on=qi_cols, how="left")
        return tbl.filter(pa.array(merged["__keep__"].notna().to_numpy()))

    return ds.map_batches(keep_rows, batch_format="pyarrow")
