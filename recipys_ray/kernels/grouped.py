"""The engine's shuffle core: hash-partition by group key, then one
per-partition sorted, vectorized scan.

Order/group-dependent steps (grouped ffill, expanding/historical aggregates,
lag/lead, sessionization, as-of resampling — reference step.py:138-139,
319-355, 537-563) all share ONE physical plan:

1. ``map_batches`` stamps ``__part__ = hash(group_key) % P`` (vectorized,
   deterministic across processes via pandas' stable hash).
2. ``groupby("__part__").map_groups`` — Ray Data's hash/range shuffle
   co-locates each partition; every conversation lands entirely in exactly one
   partition.
3. Inside the partition: one stable pandas sort by (group_cols + sort_cols),
   a contiguous integer group-id column ``__gid__``, then the fused chain of
   frame kernels — each a *vectorized* pandas/numpy segmented operation
   (``groupby(gid).cummax()`` etc.), never a Python loop over groups.

This plans the shuffle ONCE for a whole chain of order-dependent steps: the
flagship pipeline (ffill → historical × k → lag → sessionize) costs a single
all-to-all exchange.

Scale notes (100 TB / 256 nodes): P is chosen so a partition ≈
``target_partition_bytes`` (default 256 MiB) and should be >> cluster cores;
skewed mega-groups are bounded by the largest single conversation, not by key
frequency, because partitioning is by conv hash and kernels are vectorized
across all groups in the partition. A single conversation larger than a
partition would need salted sub-partitioning with boundary-carry merge —
planned (SURVEY.md §4) but not required at transcript-shaped group sizes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

GID = "__gid__"
PART = "__part__"

FrameFn = Callable[[pd.DataFrame, list[str]], pd.DataFrame]


def choose_partitions(
    ds,
    target_partition_bytes: int = 256 * 1024 * 1024,
    lo: int = 8,
    hi: int = 2048,
) -> int:
    """Pick a partition count from the dataset's (estimated) size."""
    try:
        nbytes = ds.size_bytes()
    except Exception:
        nbytes = None
    if not nbytes:
        return 32
    return int(np.clip(-(-nbytes // target_partition_bytes), lo, hi))


def _hash_mod(pdf: pd.DataFrame, group_cols: list[str], p: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(pdf[group_cols], index=False).to_numpy()
    return (h % np.uint64(p)).astype(np.int32)


class _StampPartition:
    def __init__(self, group_cols: list[str], p: int):
        self.group_cols = group_cols
        self.p = p

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if not self.group_cols:
            part = np.zeros(len(tbl), dtype=np.int32)
        else:
            pdf = tbl.select(self.group_cols).to_pandas()
            part = _hash_mod(pdf, self.group_cols, self.p)
        return tbl.append_column(PART, pa.array(part, pa.int32()))


def assign_gid(pdf: pd.DataFrame, group_cols: list[str]) -> pd.DataFrame:
    """Contiguous int64 group ids for a frame already sorted by group_cols."""
    if not group_cols:
        pdf[GID] = np.zeros(len(pdf), dtype=np.int64)
    else:
        pdf[GID] = pdf.groupby(group_cols, sort=False, observed=True).ngroup()
    return pdf


class _PartitionRunner:
    def __init__(
        self,
        group_cols: list[str],
        sort_cols: list[str],
        frame_fns: Sequence[FrameFn],
    ):
        self.group_cols = group_cols
        self.sort_cols = sort_cols
        self.frame_fns = list(frame_fns)

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        by = self.group_cols + self.sort_cols
        if by:
            pdf = pdf.sort_values(by, kind="stable", ignore_index=True)
        pdf = assign_gid(pdf, self.group_cols)
        for fn in self.frame_fns:
            pdf = fn(pdf, self.group_cols)
        return pdf.drop(columns=[c for c in (PART, GID) if c in pdf.columns])


def run_grouped_chain(
    ds,
    group_cols: list[str],
    sort_cols: list[str],
    frame_fns: Sequence[FrameFn],
    num_partitions: Optional[int] = None,
):
    """Apply a fused chain of order-dependent frame kernels.

    Each ``frame_fn(pdf, group_cols)`` receives one hash partition as a
    pandas DataFrame, stably sorted by (group_cols + sort_cols), with a
    contiguous ``__gid__`` int64 column; it must keep the sort order (a
    row-count-changing kernel like resampling must re-sort and call
    :func:`assign_gid` before returning).
    """
    p = num_partitions or choose_partitions(ds)
    if not group_cols:
        # global order-dependent op: single partition (documented limitation —
        # a global sequential scan is inherently serial; at scale callers
        # should always carry a group role).
        p = 1
    stamped = ds.map_batches(
        _StampPartition(group_cols, p), batch_format="pyarrow"
    )
    runner = _PartitionRunner(group_cols, sort_cols, frame_fns)

    # map_groups wants a plain function (it reads fn.__name__)
    def run_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        return runner(pdf)

    return stamped.groupby(PART).map_groups(run_partition, batch_format="pandas")
