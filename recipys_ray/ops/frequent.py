"""Exact frequent items (heavy hitters) WITHOUT a full groupby shuffle.

``frequent_items(ds, col, min_fraction)``: all values of ``col`` whose
global count ≥ ``ceil(min_fraction · n)``, with exact counts. A full
``groupby(col).count()`` is an all-to-all exchange keyed on a long-tail
column (for tokens, billions of singleton keys move just to be discarded);
the two-pass sketch-then-verify plan moves only bounded summaries:

1. **Misra-Gries combiner pass** — each block computes exact local counts
   (bounded by the block's distinct values) and compresses them to at most
   ``k = ceil(1/min_fraction)`` counters by the Misra-Gries decrement (drop
   the (k+1)-largest count from every counter). MG guarantee: any item with
   global count > n/k keeps a positive counter in the merged sketch, so the
   candidate set is a SUPERSET of the true heavy hitters. Driver holds
   ≤ k·blocks counters (skinny pass: only ``col`` is read).
2. **Exact verify pass** — the candidate set (≤ k after re-compression) is
   broadcast; one streaming pass counts ONLY candidates per block; the
   driver sums and filters by the exact threshold. Both passes are
   shuffle-free; the result is exact, not approximate.

Returns a pandas DataFrame (item, count) sorted by (count desc, item asc) —
a driver-bounded result (≤ k rows), like exact_quantiles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _mg_compress(items: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries: keep at most k counters, decrementing all by the
    (k+1)-largest count. Exact-in, superset-guarantee-out."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(counts)[::-1]
    cut = counts[order[k]]
    keep = order[:k]
    dec = counts[keep] - cut
    pos = dec > 0
    return items[keep][pos], dec[pos]


def frequent_items(
    ds,
    col: str,
    min_fraction: float,
    k: int | None = None,
) -> pd.DataFrame:
    """Exact items with count ≥ ceil(min_fraction · n) (module docstring).
    ``k`` (sketch width) defaults to ``ceil(1/min_fraction)`` — the minimum
    giving the MG superset guarantee; raise it to shrink the candidate set
    the verify pass counts."""
    if not 0 < min_fraction <= 1:
        raise ValueError(f"min_fraction must be in (0, 1], got {min_fraction}")
    if k is None:
        k = math.ceil(1.0 / min_fraction)

    # ---- pass 1: per-block MG sketches + row counts (skinny) ---------- #
    def sketch(tbl: pa.Table) -> pa.Table:
        item_t = tbl.schema.field(col).type
        vc = tbl.column(col).to_pandas().value_counts()  # nulls dropped
        items, counts = _mg_compress(
            vc.index.to_numpy(), vc.to_numpy().astype(np.int64), k
        )
        # one extra row carries the block's TOTAL row count (item = null);
        # the explicit type keeps empty blocks from emitting a null-typed
        # column that would break cross-block schema unification
        return pa.table({
            "item": pa.array(list(items) + [None], type=item_t),
            "n": pa.array(list(counts) + [int(len(tbl))], pa.int64()),
        })

    parts = (
        ds.select_columns([col])
        .map_batches(sketch, batch_format="pyarrow")
        .to_pandas()
    )
    n_total = int(parts.loc[parts["item"].isna(), "n"].sum())
    threshold = math.ceil(min_fraction * n_total)
    merged = parts.dropna(subset=["item"]).groupby("item")["n"].sum()
    items, counts = _mg_compress(
        merged.index.to_numpy(), merged.to_numpy().astype(np.int64), k
    )
    if len(items) == 0 or n_total == 0:
        return pd.DataFrame({"item": [], "count": []}).astype(
            {"count": np.int64}
        )
    candidates = set(items.tolist())

    # ---- pass 2: exact counts for the candidate set only -------------- #
    def count_candidates(tbl: pa.Table) -> pa.Table:
        s = tbl.column(col).to_pandas()
        vc = s[s.isin(candidates)].value_counts()
        return pa.table({
            "item": pa.array(vc.index.to_numpy()),
            "n": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
        })

    exact = (
        ds.select_columns([col])
        .map_batches(count_candidates, batch_format="pyarrow")
        .to_pandas()
        .groupby("item")["n"]
        .sum()
        .reset_index()
        .rename(columns={"n": "count"})
    )
    out = exact[exact["count"] >= threshold]
    return (
        out.sort_values(["count", "item"], ascending=[False, True],
                        kind="stable")
        .reset_index(drop=True)
    )


_CMS_SEED_STRIDE = 1099511628211  # FNV-ish odd stride: distinct row seeds


def cms_counts(
    ds,
    col: str,
    items,
    width: int = 512,
    depth: int = 4,
    est_col: str = "est",
) -> pd.DataFrame:
    """Count-min sketch point estimates (Cormode-Muthukrishnan 2005) for
    the given query ``items`` over an integer column — the mergeable
    approximate-counting scale path beside :func:`frequent_items`'s exact
    plan: at 100 TB the whole pass moves only a ``depth × width`` int64
    grid per block, merged by elementwise ADDITION (associative and
    integer-exact, so the sketch — and every estimate — is bit-identical
    under any block layout, partition count or merge order; no golden
    file needed).

    Row j hashes ``v`` with DuckDB-parity ``murmurhash64(v XOR
    j·stride) % width``; the estimate is ``min_j grid[j][h_j(v)]`` —
    ≥ the true count always, ≤ true + εN w.h.p. (ε ≈ e/width). The whole
    construction is SQL-expressible (GROUP BY over the same hash), so the
    driver oracle states it verbatim.

    Null values are not counted and null items not estimated (SQL
    aggregate/join semantics). Returns a driver-bounded pandas DataFrame
    (col, est_col), one row per distinct non-null query item, est int64.
    """
    from recipys_ray.kernels.duckdb_parity import murmurhash64

    w = int(width)
    d = int(depth)
    if w <= 0 or d <= 0:
        raise ValueError(f"width/depth must be positive, got {width}/{depth}")
    seeds = (np.arange(d, dtype=np.int64) * np.int64(_CMS_SEED_STRIDE))

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = tbl.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        grid = np.zeros((d, w), np.int64)
        for j in range(d):
            b = (murmurhash64(vals ^ seeds[j]) % np.uint64(w)).astype(
                np.int64
            )
            np.add.at(grid[j], b, 1)
        jj, bb = np.nonzero(grid)
        return pa.table({
            "j": pa.array(jj.astype(np.int64), pa.int64()),
            "b": pa.array(bb.astype(np.int64), pa.int64()),
            "cnt": pa.array(grid[jj, bb], pa.int64()),
        })

    parts = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # driver-bounded: ≤ depth·width rows per block
    )
    grid = np.zeros((d, w), np.int64)
    if len(parts):
        np.add.at(
            grid,
            (parts["j"].to_numpy(np.int64), parts["b"].to_numpy(np.int64)),
            parts["cnt"].to_numpy(np.int64),
        )
    q = np.asarray(
        [x for x in items if x is not None], np.int64
    )
    est = np.full(len(q), np.iinfo(np.int64).max, np.int64)
    for j in range(d):
        b = (murmurhash64(q ^ seeds[j]) % np.uint64(w)).astype(np.int64)
        np.minimum(est, grid[j, b], out=est)
    return pd.DataFrame({col: q, est_col: est})
