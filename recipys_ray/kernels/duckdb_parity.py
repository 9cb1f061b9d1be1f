"""Bit-exact replication of DuckDB 1.0 windowed prefix aggregates.

The driver's correctness gate hashes float values at a granularity finer than
the natural cross-engine drift of expanding SUM/AVG/VAR_SAMP, so the
``historical`` oracle can only go green if the engine reproduces DuckDB's
EXACT float64 operation order. This module replicates, in vectorized numpy,
what DuckDB 1.0.0 does for ``agg(v) OVER (PARTITION BY g ORDER BY s ROWS
UNBOUNDED PRECEDING)`` (reverse-engineered empirically and from the public
duckdb source, src/execution/window_segment_tree.cpp):

1. Partitions are radix-grouped into 16 hash groups by bits [44, 48) of
   ``murmurhash64(key)`` (verified empirically: the unique 4-bit extraction
   of duckdb's ``hash()`` that reproduces the observed grouping); within a
   hash group partitions are ordered by key ascending and their rows
   CONCATENATED, so a partition's rows start at a global offset ``o`` = sum
   of same-group predecessors' row counts.
2. Over each hash group a segment tree with fanout 16 is built: leaf-level
   nodes aggregate 16 input rows via sequential ``update`` (nulls skipped);
   upper levels combine 16 children via sequential ``combine`` (Chan's
   formula for VAR — the exact op order of duckdb's
   STDDevBaseOperation::Combine), built up to a single root.
3. A frame [o, o+e) is evaluated as: ragged left leaf rows first
   (sequential updates), then upper-level left fragments ascending, the top
   fragment, right fragments DESCENDING (duckdb's right_stack flush), and
   ragged right leaf rows last.

Frames never cross partition boundaries, so a partition's outputs depend on
other partitions ONLY through the offset ``o`` (node-boundary alignment).
The kernel therefore needs just a per-key offset map, computed with one tiny
distributed count pass (``compute_duckdb_offsets``).

Validated bit-exact (10000/10000, 60000/60000 rows) against DuckDB 1.0.0 on
events sf0.001/sf0.01 and lineitem sf0.01; all-prefix sweeps on synthetic
118-partition and 100k-row single-partition corpora.

This is a PARITY mode used by the driver-contract queries; the default
production kernel uses higher-precision longdouble cumulative sums (better
numerics than the segment tree, fewer passes) — see steps/historical.py.

Scale note: parity mode's offset map is O(#groups) driver state and the
kernel is O(rows x tree depth) vectorized work; it exists to pin float
rounding for verification, not as the 100-TB hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

F = 16  # duckdb TREE_FANOUT
_MUL = np.uint64(0xD6E8FEB86659FD93)
_S32 = np.uint64(32)


def murmurhash64(x: np.ndarray) -> np.ndarray:
    """duckdb::Hash for integer types (verified == SQL hash())."""
    x = np.asarray(x).astype(np.int64).view(np.uint64).copy()
    x ^= x >> _S32
    x *= _MUL
    x ^= x >> _S32
    x *= _MUL
    x ^= x >> _S32
    return x


def duckdb_hash_group(keys: np.ndarray) -> np.ndarray:
    """Hash-group id (0..15) duckdb's window sink assigns to a partition."""
    return ((murmurhash64(keys) >> np.uint64(44)) & np.uint64(15)).astype(
        np.int64
    )


def offsets_from_counts(keys: np.ndarray, counts: np.ndarray) -> dict:
    """key -> row offset of the partition inside its duckdb hash group."""
    keys = np.asarray(keys)
    counts = np.asarray(counts, dtype=np.int64)
    g = duckdb_hash_group(keys)
    order = np.lexsort((keys, g))
    sg, sc = g[order], counts[order]
    csum = np.cumsum(sc) - sc
    starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
    base = np.repeat(csum[starts], np.diff(np.r_[starts, len(sc)]))
    off_sorted = csum - base
    off = np.empty(len(keys), dtype=np.int64)
    off[order] = off_sorted
    return dict(zip(keys.tolist(), off.tolist()))


def compute_duckdb_offsets(ds, key_col: str) -> dict:
    """One skinny distributed count pass -> key -> offset map.

    Driver state is O(#distinct keys) — parity mode is for oracle-scale
    validation runs, not the 100-TB default path.
    """
    import pyarrow as pa

    def part_counts(tbl: "pa.Table") -> "pa.Table":
        vc = tbl.column(key_col).value_counts()
        return pa.table(
            {"k": vc.field("values"), "n": vc.field("counts")}
        )

    pdf = (
        ds.select_columns([key_col])
        .map_batches(part_counts, batch_format="pyarrow")
        .to_pandas()
    )
    tot = pdf.groupby("k", sort=False)["n"].sum()
    return offsets_from_counts(tot.index.to_numpy(), tot.to_numpy())


class _States:
    """SoA state vectors for duckdb's sum and var aggregate states."""

    __slots__ = ("cnt", "s", "mean", "dsq", "var")

    def __init__(self, n: int, var: bool):
        self.cnt = np.zeros(n, dtype=np.float64)
        self.s = np.zeros(n, dtype=np.float64)
        self.var = var
        if var:
            self.mean = np.zeros(n, dtype=np.float64)
            self.dsq = np.zeros(n, dtype=np.float64)

    def update(self, idx: np.ndarray, x: np.ndarray) -> None:
        """Sequential aggregate update with one value per selected state.
        idx must not contain duplicates. NaNs must be pre-filtered."""
        self.cnt[idx] += 1.0
        self.s[idx] += x
        if self.var:
            c = self.cnt[idx]
            m = self.mean[idx]
            delta = x - m
            m = m + delta / c
            self.dsq[idx] += delta * (x - m)
            self.mean[idx] = m

    def combine_from(self, idx, src: "_States", sidx) -> None:
        """target[idx] = Combine(target[idx], src[sidx]) — duckdb order."""
        scnt = src.cnt[sidx]
        nz = scnt > 0
        if not nz.any():
            return
        idx = idx[nz]
        sidx = sidx[nz] if isinstance(sidx, np.ndarray) else sidx
        scnt = scnt[nz]
        ss = src.s[sidx]
        tcnt = self.cnt[idx]
        tz = tcnt == 0
        self.s[idx] = np.where(tz, ss, self.s[idx] + ss)
        if self.var:
            smean = src.mean[sidx]
            sdsq = src.dsq[sidx]
            tmean = self.mean[idx]
            tdsq = self.dsq[idx]
            c = tcnt + scnt
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = (scnt * smean + tcnt * tmean) / c
                delta = smean - tmean
                dsq = tdsq + sdsq + delta * delta * scnt * tcnt / c
            self.mean[idx] = np.where(tz, smean, mean)
            self.dsq[idx] = np.where(tz, sdsq, dsq)
        self.cnt[idx] = tcnt + scnt

    def copy_rows(self, idx) -> "_States":
        out = _States(0, self.var)
        out.cnt = self.cnt[idx].copy()
        out.s = self.s[idx].copy()
        if self.var:
            out.mean = self.mean[idx].copy()
            out.dsq = self.dsq[idx].copy()
        return out


def prefix_agg_duckdb(
    v: np.ndarray,
    codes: np.ndarray,
    group_offsets: np.ndarray,
    want_var: bool = True,
):
    """Bit-exact duckdb prefix aggregates.

    v            float64 values (NaN = NULL), rows sorted by (group, seq)
    codes        contiguous non-decreasing group codes (0..G-1)
    group_offsets int64 per-GROUP global offset inside its duckdb hash group
    returns (cnt, s, mean, dsq) per row — finalize outside.
    """
    v = np.ascontiguousarray(v, dtype=np.float64)
    codes = np.asarray(codes, dtype=np.int64)
    N = len(v)
    if N == 0:
        z = np.zeros(0)
        return z, z, z, z
    G = int(codes[-1]) + 1
    n_g = np.bincount(codes, minlength=G).astype(np.int64)
    row0_g = np.cumsum(n_g) - n_g  # first local row of each group
    o_g = np.asarray(group_offsets, dtype=np.int64)
    rank = np.arange(N, dtype=np.int64) - row0_g[codes]
    gpos = o_g[codes] + rank  # global position of each row

    # ---------------- left-leaf prefix state per group ------------------- #
    # rows [o, A) with A = min(16*ceil(o/16), o+n): the ragged head before
    # the first node boundary; updated sequentially, shared by all blocks
    A_g = np.minimum(-(-o_g // F) * F, o_g + n_g)
    SL = _States(G, want_var)
    head = A_g - o_g  # ≤ 15 rows
    for k in range(int(head.max()) if G else 0):
        sel = np.flatnonzero(head > k)
        rows = row0_g[sel] + k
        x = v[rows]
        ok = ~np.isnan(x)
        SL.update(sel[ok], x[ok])

    # ---------------- level-1 nodes -------------------------------------- #
    levels = []  # dicts: j0 (per group), cnt of nodes per group, base, states
    j0 = -(-o_g // F)
    j1 = (o_g + n_g) // F
    nb = np.maximum(j1 - j0, 0)
    base = np.cumsum(nb) - nb
    total = int(nb.sum())
    st = _States(total, want_var)
    if total:
        node_grp = np.repeat(np.arange(G), nb)
        node_j = np.arange(total) - base[node_grp] + j0[node_grp]
        loc0 = node_j * F - o_g[node_grp] + row0_g[node_grp]
        for k in range(F):
            x = v[loc0 + k]
            ok = ~np.isnan(x)
            if ok.any():
                st.update(np.flatnonzero(ok), x[ok])
    levels.append({"j0": j0, "nb": nb, "base": base, "st": st})

    # ---------------- upper levels (combine 16 children) ------------------ #
    while int(levels[-1]["nb"].sum()) > 0:
        pj0, pnb, pbase = (
            levels[-1]["j0"], levels[-1]["nb"], levels[-1]["base"],
        )
        pst = levels[-1]["st"]
        pj1 = pj0 + pnb
        j0u = -(-pj0 // F)
        j1u = pj1 // F
        nbu = np.maximum(j1u - j0u, 0)
        if int(nbu.sum()) == 0:
            break
        baseu = np.cumsum(nbu) - nbu
        totu = int(nbu.sum())
        stu = _States(totu, want_var)
        node_grp = np.repeat(np.arange(G), nbu)
        node_j = np.arange(totu) - baseu[node_grp] + j0u[node_grp]
        child0 = node_j * F - pj0[node_grp] + pbase[node_grp]
        idx = np.arange(totu)
        for k in range(F):
            stu.combine_from(idx, pst, child0 + k)
        levels.append({"j0": j0u, "nb": nbu, "base": baseu, "st": stu})
    if int(levels[-1]["nb"].sum()) == 0:
        levels.pop()
    L = len(levels)

    # ---------------- phase 1: block base states -------------------------- #
    # block J of group p holds rows [max(16J, o), min(16J+16, o+n));
    # base state = eval of frame [o, 16J) = left-leaf + upper fragments.
    # A row at g with (g+1) % 16 == 0 has an ALIGNED frame end: duckdb
    # evaluates it with NO ragged right leaf (pure node combines) — its value
    # is the NEXT block's base state, so when the group's end is itself
    # aligned we materialize one extra (row-less) block to serve its last row.
    Jmin = o_g // F
    Jmax = (o_g + n_g - 1) // F
    end_aligned = (o_g + n_g) % F == 0
    nblk = Jmax - Jmin + 1 + end_aligned.astype(np.int64)
    bbase = np.cumsum(nblk) - nblk
    B = int(nblk.sum())
    blk_grp = np.repeat(np.arange(G), nblk)
    blk_J = np.arange(B) - bbase[blk_grp] + Jmin[blk_grp]

    bst = _States(B, want_var)
    nonfirst = blk_J > Jmin[blk_grp]
    if nonfirst.any():
        nf = np.flatnonzero(nonfirst)
        bst.combine_from(nf, SL, blk_grp[nf])

    # op-range collection: per block, ranges (level, lo, hi) of node combines
    # in evaluation order: left fragments ascending level, top, right
    # fragments descending level.
    left_ops = [[] for _ in range(L + 1)]   # per level: (block, lo, hi)
    right_ops = [[] for _ in range(L + 1)]
    top_ops = []  # (block, level, lo, hi)
    b_cur = o_g[blk_grp].copy()   # level-0 begin index (rows)
    e_cur = blk_J * F              # level-0 end
    active = nonfirst.copy()       # first block of a group has no upper ops
    lvl = 0
    while active.any() and lvl < L + 1:
        pb = b_cur // F
        pe = e_cur // F
        top_m = active & (pb == pe)
        if lvl > 0:
            t = np.flatnonzero(top_m & (b_cur < e_cur))
            if len(t):
                top_ops.append((t, lvl, b_cur[t], e_cur[t]))
        active = active & ~top_m
        if not active.any():
            break
        if lvl > 0:
            lm = active & (b_cur % F != 0)
            l_idx = np.flatnonzero(lm)
            if len(l_idx):
                left_ops[lvl].append(
                    (l_idx, b_cur[l_idx], (b_cur[l_idx] // F) * F + F)
                )
            rm = active & (e_cur % F != 0)
            r_idx = np.flatnonzero(rm)
            if len(r_idx):
                right_ops[lvl].append(
                    (r_idx, (e_cur[r_idx] // F) * F, e_cur[r_idx])
                )
        b_cur = np.where(b_cur % F != 0, b_cur // F + 1, b_cur // F)
        e_cur = e_cur // F
        lvl += 1

    def apply_ranges(entries, level):
        """Combine node ranges [lo, hi) at `level` into block states, nodes
        ascending; vectorized across blocks via ≤15 sub-iterations."""
        lv = levels[level - 1]
        for (blks, lo, hi) in entries:
            width = hi - lo
            for k in range(int(width.max()) if len(width) else 0):
                m = width > k
                bsel = blks[m]
                j = lo[m] + k
                sidx = lv["base"][blk_grp[bsel]] + (
                    j - lv["j0"][blk_grp[bsel]]
                )
                bst.combine_from(bsel, lv["st"], sidx)

    for lvl_i in range(1, L + 1):
        apply_ranges(left_ops[lvl_i], lvl_i)
    for (t, lvl_i, lo, hi) in top_ops:
        apply_ranges([(t, lo, hi)], lvl_i)
    for lvl_i in range(L, 0, -1):
        apply_ranges(right_ops[lvl_i], lvl_i)

    # ---------------- phase 2: ragged right-leaf emission ------------------ #
    # aligned-end rows (g % 16 == 15) snapshot the NEXT block's base state
    # (no leaf updates in duckdb's eval); other rows take the evolving state.
    base_cnt = bst.cnt.copy()
    base_s = bst.s.copy()
    if want_var:
        base_mean = bst.mean.copy()
        base_dsq = bst.dsq.copy()
    out_cnt = np.empty(N)
    out_s = np.empty(N)
    out_mean = np.empty(N) if want_var else None
    out_dsq = np.empty(N) if want_var else None
    # row start of each block (global): max(16J, o); row count in block
    brow_lo = np.maximum(blk_J * F, o_g[blk_grp])
    brow_hi = np.minimum(blk_J * F + F, o_g[blk_grp] + n_g[blk_grp])
    width = brow_hi - brow_lo
    loc0 = brow_lo - o_g[blk_grp] + row0_g[blk_grp]
    for k in range(int(width.max()) if B else 0):
        m = width > k
        bsel = np.flatnonzero(m)
        rows = loc0[bsel] + k
        x = v[rows]
        ok = ~np.isnan(x)
        if ok.any():
            bst.update(bsel[ok], x[ok])
        g_here = brow_lo[bsel] + k
        aligned = g_here % F == F - 1
        ub = bsel[~aligned]
        ur = rows[~aligned]
        out_cnt[ur] = bst.cnt[ub]
        out_s[ur] = bst.s[ub]
        if want_var:
            out_mean[ur] = bst.mean[ub]
            out_dsq[ur] = bst.dsq[ub]
        if aligned.any():
            nb_idx = bsel[aligned] + 1  # next block of same group (exists)
            ar = rows[aligned]
            out_cnt[ar] = base_cnt[nb_idx]
            out_s[ar] = base_s[nb_idx]
            if want_var:
                out_mean[ar] = base_mean[nb_idx]
                out_dsq[ar] = base_dsq[nb_idx]
    return out_cnt, out_s, out_mean, out_dsq


def finalize_sum(cnt, s):
    return np.where(cnt > 0, s, np.nan)


def finalize_mean(cnt, s):
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(cnt > 0, s / cnt, np.nan)


def finalize_var_samp(cnt, dsq):
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(cnt > 1, dsq / (cnt - 1), np.nan)


def prefix_frame_duckdb(
    pdf: "pd.DataFrame",
    cols: list,
    gid: "pd.Series",
    key_series: "pd.Series",
    offsets: dict,
    funs: list,
):
    """Apply the parity kernel to columns of a sorted partition frame.

    funs entries in {"sum", "mean", "var"}; returns {(col, fun): ndarray}.
    Group codes must be contiguous runs (frame sorted by group) — guaranteed
    by the grouped-chain partition runner.
    """
    codes_raw = gid.to_numpy()
    # contiguity: map to dense run codes
    change = np.r_[True, codes_raw[1:] != codes_raw[:-1]]
    codes = np.cumsum(change) - 1
    first_rows = np.flatnonzero(change)
    keys = key_series.to_numpy()[first_rows]
    o_g = np.array(
        [offsets.get(k, 0) for k in keys.tolist()], dtype=np.int64
    )
    want_var = "var" in funs
    out = {}
    for c in cols:
        x = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
        cnt, s, mean, dsq = prefix_agg_duckdb(x, codes, o_g, want_var)
        for f in funs:
            if f == "sum":
                out[(c, f)] = finalize_sum(cnt, s)
            elif f == "mean":
                out[(c, f)] = finalize_mean(cnt, s)
            else:
                out[(c, f)] = finalize_var_samp(cnt, dsq)
    return out
