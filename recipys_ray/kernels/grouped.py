"""The engine's shuffle core: hash-partition by group key, then one
per-partition sorted, vectorized scan.

Order/group-dependent steps (grouped ffill, expanding/historical aggregates,
lag/lead, sessionization, as-of resampling — reference step.py:138-139,
319-355, 537-563) all share ONE physical plan:

1. ``map_batches`` stamps ``__part__ = hash(group_key) % P`` (vectorized,
   deterministic across processes via pandas' stable hash). The stamp stage
   doubles as the block coalescer: ``batch_size=262144`` merges the reader's
   many small blocks into few large ones inside the same data pass — Ray's
   sort-shuffle pays a fixed cost per source block (measured 3× slowdown
   with ~200 tiny blocks vs ~32 large ones), and a separate ``repartition``
   pass would burn memory bandwidth moving the data an extra time.
2. ``groupby("__part__").map_groups`` — Ray Data's shuffle co-locates each
   partition; every conversation lands entirely in exactly one partition.
3. Inside the partition: an ARROW-first runner — stable multi-key
   ``pyarrow.compute.sort_indices`` + ``take`` (wide payload columns like
   ``text`` are never boxed into Python objects), then ONLY the columns the
   step kernels actually read are converted to pandas, the fused chain of
   vectorized frame kernels runs (``groupby(gid).cummax()`` etc. — never a
   Python loop over groups), and new/modified columns are appended back to
   the Arrow table. Row-count-changing kernels (resampling) and
   whole-frame user functions fall back to a full pandas path.

This plans the shuffle ONCE for a whole chain of order-dependent steps: the
flagship pipeline (ffill → historical × k → lag → sessionize) costs a single
all-to-all exchange.

Scale notes (100 TB / 256 nodes): P is chosen from the data size
(~256 MiB per partition) with a floor of 2× cluster CPUs; skew is bounded by
the largest single conversation, not key frequency, because partitioning is
by conv hash and kernels are vectorized across all groups in a partition. A
single conversation larger than a partition would need salted
sub-partitioning with boundary-carry merge (SURVEY.md §4) — not required at
transcript-shaped group sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

GID = "__gid__"
PART = "__part__"


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    return 8


def choose_partitions(
    ds,
    target_partition_bytes: int = 256 * 1024 * 1024,
    hi: int = 4096,
) -> int:
    """Partition count: ≥ 2× cluster CPUs, scaled up by data size."""
    lo = 2 * _cluster_cpus()
    try:
        nbytes = ds.size_bytes()
    except Exception:
        nbytes = None
    if not nbytes:
        return lo
    return int(np.clip(-(-nbytes // target_partition_bytes), lo, max(lo, hi)))


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


class GroupedStage:
    """One fused chain entry: the step plus its declared column footprint."""

    def __init__(self, step):
        self.step = step
        self.inputs = list(step.frame_inputs())
        self.outputs = list(step.frame_outputs())
        self.needs_all = step.frame_needs_all or step.changes_rowcount


class _PartitionRunner:
    def __init__(
        self,
        group_cols: list[str],
        sort_cols: list[str],
        stages: Sequence[GroupedStage],
    ):
        self.group_cols = group_cols
        self.sort_cols = sort_cols
        self.stages = list(stages)
        self.full_path = any(s.needs_all for s in self.stages)
        # columns the pandas frame must start with: every stage input that an
        # earlier stage in the chain doesn't produce, plus group columns
        produced: set[str] = set()
        needed: list[str] = []
        for s in self.stages:
            for c in s.inputs:
                if c not in produced and c not in needed:
                    needed.append(c)
            produced.update(s.outputs)
        for c in group_cols + sort_cols:
            if c not in needed:
                needed.append(c)
        self.needed = needed

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if PART in tbl.column_names:
            tbl = tbl.drop_columns([PART])
        by = self.group_cols + self.sort_cols
        if by:
            idx = pc.sort_indices(
                tbl, sort_keys=[(c, "ascending") for c in by]
            )
            tbl = tbl.take(idx)
        if self.full_path:
            return self._run_full(tbl)
        return self._run_projected(tbl)

    # -------------------- full pandas fallback -------------------- #
    def _run_full(self, tbl: pa.Table) -> pa.Table:
        pdf = tbl.to_pandas()
        pdf = assign_gid(pdf, self.group_cols)
        for s in self.stages:
            pdf = s.step.transform_frame(pdf, self.group_cols)
        pdf = pdf.drop(columns=[c for c in (PART, GID) if c in pdf.columns])
        return pa.Table.from_pandas(pdf, preserve_index=False)

    # -------------------- arrow-first projected path -------------------- #
    def _run_projected(self, tbl: pa.Table) -> pa.Table:
        cols = [c for c in self.needed if c in tbl.column_names]
        pdf = tbl.select(cols).to_pandas()
        pdf = assign_gid(pdf, self.group_cols)
        for s in self.stages:
            pdf = s.step.transform_frame(pdf, self.group_cols)
        for s in self.stages:
            for name in s.outputs:
                if name not in pdf.columns:
                    continue
                arr = pa.array(pdf[name], from_pandas=True)
                if name in tbl.column_names:
                    tbl = tbl.set_column(
                        tbl.column_names.index(name), name, arr
                    )
                else:
                    tbl = tbl.append_column(name, arr)
        return tbl


def run_grouped_chain(
    ds,
    group_cols: list[str],
    sort_cols: list[str],
    steps: Sequence,
    num_partitions: Optional[int] = None,
    stamp_batch_rows: int = 262_144,
):
    """Apply a fused chain of order-dependent steps (see module docstring).

    ``steps`` are Step objects exposing ``transform_frame(pdf, group_cols)``
    plus the column-footprint protocol (frame_inputs/frame_outputs/
    frame_needs_all, changes_rowcount).
    """
    p = num_partitions or choose_partitions(ds)
    if not group_cols:
        # global order-dependent op: single partition (documented limitation —
        # a global sequential scan is inherently serial; at scale callers
        # should always carry a group role).
        p = 1
    stamped = ds.map_batches(
        _StampPartition(group_cols, p),
        batch_format="pyarrow",
        batch_size=stamp_batch_rows,
    )
    stages = [GroupedStage(s) for s in steps]
    runner = _PartitionRunner(group_cols, sort_cols, stages)

    # map_groups wants a plain function (it reads fn.__name__)
    def run_partition(tbl: pa.Table) -> pa.Table:
        return runner(tbl)

    return stamped.groupby(PART).map_groups(
        run_partition, batch_format="pyarrow"
    )
