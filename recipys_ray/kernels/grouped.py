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


def _lazy_size_bytes(ds):
    """Dataset size from plan metadata ONLY — never executes the plan.
    ``Dataset.size_bytes()`` materializes derived datasets to answer, which
    would silently break streaming when sizing an exchange mid-pipeline.
    Known for reads / from_pandas / repartition / materialized datasets;
    None after a map/select (callers should size from the pre-map input)."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def choose_partitions(
    ds,
    target_partition_bytes: int = 256 * 1024 * 1024,
    hi: int = 4096,
) -> int:
    """Partition count: ≥ 2× cluster CPUs, scaled up by data size."""
    lo = 2 * _cluster_cpus()
    nbytes = _lazy_size_bytes(ds)
    if not nbytes:
        return lo
    return int(np.clip(-(-nbytes // target_partition_bytes), lo, max(lo, hi)))


def adaptive_stamp_rows(ds, requested: int = 262_144) -> int:
    """Stamp/coalesce batch size: the stamp stage's output block count sets
    the sorted-scan kernel stage's parallelism, so small inputs need smaller
    batches (2M rows at 262k-row batches = 8 blocks on 32 CPUs = a 4×
    under-parallelized kernel stage). Measured sweet spots (BASELINE.md):
    2M rows → 16 blocks, 8M → 30, 20M+ → the 262k default. Rule: at least
    16 blocks when the row count is knowable from metadata (pure reads);
    derived datasets keep the requested value."""
    try:
        n = ds._meta_count()
    except Exception:
        n = None
    if not n:
        return requested
    return int(np.clip(n // 16, 16_384, requested))


def cheap_count(ds) -> int:
    """Row count from plan metadata when knowable (pure reads, from_pandas,
    materialized datasets) — falls back to one full count pass otherwise.
    Saves the extra pass that ``ds.count()`` costs before sampling stages."""
    try:
        n = ds._meta_count()
    except Exception:
        n = None
    return int(n) if n else ds.count()


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
    shuffle: str = "sort",
):
    """Apply a fused chain of order-dependent steps (see module docstring).

    ``steps`` are Step objects exposing ``transform_frame(pdf, group_cols)``
    plus the column-footprint protocol (frame_inputs/frame_outputs/
    frame_needs_all, changes_rowcount).

    ``shuffle`` picks the exchange implementation:
    - "sort" (default): Ray's ``groupby().map_groups`` — range-sorts blocks
      by the partition id. The sort is redundant (the runner re-sorts each
      partition by (group, sequence) anyway) but the operator overlaps with
      the upstream read in the streaming executor.
    - "raw": a textbook two-phase hash split/merge on raw Ray tasks (one
      split task per map block with ``num_returns=P``, one merge+run task
      per partition). No sort, blocks move exactly twice — but
      ``to_arrow_refs`` is a barrier that forfeits read/shuffle overlap;
      measured ≈5% slower single-node at 20M rows, kept as the explicit
      fallback for environments where Ray's sort shuffle misbehaves.
      Results are identical (cross-checked in tests).
    """
    p = num_partitions or choose_partitions(ds)
    stamp_batch_rows = adaptive_stamp_rows(ds, stamp_batch_rows)
    if not group_cols:
        if (
            sort_cols
            and p > 1
            and all(getattr(s, "chunk_mergeable", False) for s in steps)
        ):
            # global order-dependent chain, parallelized: range-chunk on the
            # first sort column + driver-folded carry states — the whole
            # dataset is one mega-group (kernels/chunked.py)
            from recipys_ray.kernels.chunked import run_global_chunked

            return run_global_chunked(
                ds, sort_cols, steps, num_partitions=p,
                stamp_batch_rows=stamp_batch_rows,
            )
        # non-mergeable global chain: single partition (a global sequential
        # scan of e.g. an expanding MEDIAN is inherently serial)
        p = 1
    stamped = ds.map_batches(
        _StampPartition(group_cols, p),
        batch_format="pyarrow",
        batch_size=stamp_batch_rows,
    )
    stages = [GroupedStage(s) for s in steps]
    runner = _PartitionRunner(group_cols, sort_cols, stages)

    if shuffle == "raw":
        return _raw_shuffle_run(stamped, runner, p)

    # map_groups wants a plain function (it reads fn.__name__)
    def run_partition(tbl: pa.Table) -> pa.Table:
        return runner(tbl)

    return stamped.groupby(PART).map_groups(
        run_partition, batch_format="pyarrow"
    )


def _raw_shuffle_run(stamped, runner: "_PartitionRunner", p: int):
    """Two-phase hash shuffle on raw Ray tasks (Dataset in, Dataset out).

    Phase 1 (split): one task per map block slices it into P sub-tables by
    the pre-computed ``__part__`` column (arrow take — zero-copy views).
    Phase 2 (merge+run): one task per partition concatenates its shards and
    runs the fused partition kernel. Blocks move through the object store
    exactly twice — no global sort, no sampling pass.
    """
    import ray
    import ray.data as rd

    @ray.remote
    def split_block(tbl: pa.Table, p: int):
        part = tbl.column(PART).to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        sorted_tbl = tbl.take(pa.array(order))
        sorted_part = part[order]
        bounds = np.searchsorted(sorted_part, np.arange(p + 1))
        return [
            sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
            for i in range(p)
        ]

    @ray.remote
    def merge_run(runner_obj, *shards):
        shards = [s for s in shards if s is not None and len(s)]
        if not shards:
            return None
        tbl = pa.concat_tables(shards, promote_options="default")
        return runner_obj(tbl)

    @ray.remote
    def nonempty(t) -> bool:
        return t is not None and len(t) > 0

    block_refs = stamped.to_arrow_refs()
    if not block_refs:
        return stamped  # fully empty dataset — nothing to do
    runner_ref = ray.put(runner)
    if p == 1:
        out_refs = [merge_run.remote(runner_ref, *block_refs)]
    else:
        split_opts = split_block.options(num_returns=p)
        shard_refs = [split_opts.remote(b, p) for b in block_refs]
        out_refs = [
            merge_run.remote(
                runner_ref, *[shard_refs[j][i] for j in range(len(shard_refs))]
            )
            for i in range(p)
        ]
    # filter empty partitions WITHOUT fetching the tables to the driver:
    # tiny boolean probes read each output in-place in the object store
    flags = ray.get([nonempty.remote(r) for r in out_refs])
    done = [r for r, f in zip(out_refs, flags) if f]
    if not done:
        return rd.from_arrow(runner(ray.get(block_refs[0])))  # zero rows
    return rd.from_arrow_refs(done)
