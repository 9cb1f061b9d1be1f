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
