"""Iterative graph algorithms over edge Datasets.

:func:`pagerank` — fixed-point INTEGER PageRank. Classic float PageRank
is summation-order-sensitive (Σ of doubles over shuffled in-edges), which
breaks cross-engine bit-parity; this variant does every step in integer
arithmetic, so results are exact and identical under ANY block layout,
partitioning or engine:

    r⁰(v)   = SCALE // n
    s(v)    = Σ_{(u→v) ∈ E}  r(u) // deg(u)        (per-EDGE floor div,
                                                    parallel edges count)
    rᵗ⁺¹(v) = (SCALE·15 // 100) // n  +  (85·s(v)) // 100

Dangling nodes (out-degree 0) simply leak their mass — the standard
simplification, stated in the oracle too. Companion op:
``connected_components`` (ops/dedup.py) for the undirected reachability
shape; PageRank adds the *iterative broadcast* shape — each sweep is one
streaming pass over the (aggregated) edge dataset with the rank vector
broadcast via ``ray.put``.

Scale contract: EDGES stay distributed (one combiner pass folds parallel
edges to (src, dst, mult) so each sweep moves multiplicities, not raw
edges); only per-NODE state (degree + rank, ≤ ``driver_cap``) lives on
the driver. Above the cap a co-partitioned rank-join iteration is the
route — the raise is explicit, mirroring grouped_zscore's policy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(
    ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    scale: int = 10**12,
    rank_col: str = "rank",
    driver_cap: int = 5_000_000,
):
    """Fixed-point integer PageRank over a directed edge Dataset.

    Returns a Dataset of ``(node:int64, rank_col:int64)`` — one row per
    distinct node (appearing as src OR dst), ranks after ``iters``
    damped sweeps of the integer recurrence above. Null-keyed edges are
    dropped."""
    import ray
    import ray.data as rd

    from recipys_ray.ops.dedup import partitioned_groupby_map

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    def edge_partial(tbl: pa.Table) -> pa.Table:
        pdf = tbl.select([src_col, dst_col]).to_pandas()
        pdf = pdf[pdf[src_col].notna() & pdf[dst_col].notna()]
        agg = (
            pdf.groupby([src_col, dst_col], sort=False)
            .size()
            .reset_index(name="mult")
        )
        return pa.table(
            {
                "src": pa.array(agg[src_col].to_numpy(np.int64),
                                pa.int64()),
                "dst": pa.array(agg[dst_col].to_numpy(np.int64),
                                pa.int64()),
                "mult": pa.array(agg["mult"].to_numpy(np.int64),
                                 pa.int64()),
            }
        )

    def edge_finish(pdf: pd.DataFrame) -> pd.DataFrame:
        out = (
            pdf.groupby(["src", "dst"], sort=False)["mult"]
            .sum()
            .reset_index()
        )
        out["mult"] = out["mult"].astype(np.int64)
        return out

    raw = ds.select_columns([src_col, dst_col]).map_batches(
        edge_partial, batch_format="pyarrow"
    )
    # multi-pass consumer: pin the aggregated edge dataset ONCE (the
    # materialize-pin policy — each sweep re-reads blocks, never re-runs
    # the combiner); object store spills as needed
    edges = partitioned_groupby_map(raw, ["src"], edge_finish).materialize()

    # per-node out-degree (WITH edge multiplicity) + node universe —
    # skinny driver state, capped
    def deg_partial(tbl: pa.Table) -> pa.Table:
        pdf = tbl.select(["src", "dst", "mult"]).to_pandas()
        d = pdf.groupby("src", sort=False)["mult"].sum().reset_index()
        return pa.table(
            {
                "node": pa.array(d["src"].to_numpy(np.int64), pa.int64()),
                "deg": pa.array(d["mult"].to_numpy(np.int64), pa.int64()),
                "seen_dst": pa.array(
                    np.zeros(len(d), dtype=np.int64), pa.int64()
                ),
            }
        )

    deg_parts = edges.map_batches(deg_partial, batch_format="pyarrow")
    ddf = deg_parts.to_pandas()
    dst_nodes = (
        edges.select_columns(["dst"])
        .map_batches(
            lambda t: pa.table({"node": pc.unique(t.column("dst"))}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    deg = ddf.groupby("node")["deg"].sum()
    nodes = np.union1d(
        deg.index.to_numpy(np.int64), dst_nodes["node"].to_numpy(np.int64)
    )
    n = int(len(nodes))
    if n == 0:
        return rd.from_pandas(
            pd.DataFrame(
                {"node": np.array([], np.int64),
                 rank_col: np.array([], np.int64)}
            )
        )
    if n > driver_cap:
        raise ValueError(
            f"{n} nodes exceeds driver_cap={driver_cap}; use a "
            "co-partitioned rank-join iteration instead of the broadcast"
        )
    deg_full = pd.Series(
        np.zeros(n, dtype=np.int64), index=nodes, name="deg"
    )
    deg_full.loc[deg.index] = deg.to_numpy(np.int64)

    base = ((scale * 15) // 100) // n
    r = pd.Series(np.full(n, scale // n, dtype=np.int64), index=nodes)

    for _ in range(iters):
        ref = ray.put((r, deg_full))

        def sweep(tbl: pa.Table) -> pa.Table:
            rk, dg = ray.get(ref)
            src = tbl.column("src").to_numpy(zero_copy_only=False)
            dst = tbl.column("dst").to_numpy(zero_copy_only=False)
            mult = tbl.column("mult").to_numpy(zero_copy_only=False)
            contrib = (
                rk.loc[src].to_numpy(np.int64)
                // dg.loc[src].to_numpy(np.int64)
            ) * mult
            part = (
                pd.DataFrame({"node": dst, "s": contrib})
                .groupby("node", sort=False)["s"]
                .sum()
                .reset_index()
            )
            return pa.table(
                {
                    "node": pa.array(part["node"].to_numpy(np.int64),
                                     pa.int64()),
                    "s": pa.array(part["s"].to_numpy(np.int64),
                                  pa.int64()),
                }
            )

        sdf = edges.map_batches(sweep, batch_format="pyarrow").to_pandas()
        s = sdf.groupby("node")["s"].sum()
        s_full = s.reindex(nodes, fill_value=0).to_numpy(np.int64)
        r = pd.Series(base + (85 * s_full) // 100, index=nodes)

    return rd.from_pandas(
        pd.DataFrame({"node": nodes, rank_col: r.to_numpy(np.int64)})
    )
