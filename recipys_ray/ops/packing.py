"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget bins.

``pack_sequences`` uses offset-quantized packing: documents are laid out in
a deterministic global order (the sort key), and a document starting at
cumulative-token offset ``o`` goes to bin ``o // budget``. This is the
prefix-sum formulation of packing — unlike greedy first-fit it is exactly
parallelizable (the running offset is a chunk-mergeable cumulative SUM, so
the global-chunked carry machinery computes it without a sequential scan)
and exactly SQL-expressible (one window sum), at the cost of bins that may
overflow by at most one straddling document (standard "document straddles
the boundary" variants: downstream consumers truncate or drop the
straddler; the bin id tells them where).

Emits: ``bin_id`` (int64) and ``bin_offset`` (int64 — the document's token
start offset within its bin).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_sequences(
    ds,
    token_col: str,
    budget: int,
    sort_cols: list[str],
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
    num_partitions: int | None = None,
):
    """Assign each row to a token-budget bin by offset quantization.

    The global running token offset is computed with the parallel
    chunk-carry machinery (ungrouped cumulative SUM over the sort order —
    kernels/chunked.run_global_chunked); the bin math is then a stateless
    vectorized map.
    """
    from recipys_ray.ingredients import Ingredients
    from recipys_ray.kernels.grouped import choose_partitions, run_grouped_chain
    from recipys_ray.selector import all_of
    from recipys_ray.steps.historical import Accumulator, StepHistorical

    step = StepHistorical(
        sel=all_of([token_col]), fun=Accumulator.SUM, suffix="__packsum__"
    )
    ing = Ingredients(ds, roles={}, check_roles=False)
    for c in sort_cols:
        ing.update_role(c, "sequence")
    ing.update_role(token_col, "predictor")
    step.resolve(ing)
    p = num_partitions or choose_partitions(ds)
    summed = run_grouped_chain(ds, [], list(sort_cols), [step],
                               num_partitions=p)

    cum_name = f"{token_col}___packsum__"

    def binify(tbl: pa.Table) -> pa.Table:
        cum = tbl.column(cum_name).to_numpy(zero_copy_only=False)
        tok = tbl.column(token_col).to_numpy(zero_copy_only=False)
        start = cum - tok  # token offset where this document begins
        bin_id = (start // budget).astype(np.int64)
        offset = (start - bin_id * budget).astype(np.int64)
        tbl = tbl.append_column(bin_col, pa.array(bin_id))
        tbl = tbl.append_column(offset_col, pa.array(offset))
        return tbl.drop_columns([cum_name])

    return summed.map_batches(binify, batch_format="pyarrow")
