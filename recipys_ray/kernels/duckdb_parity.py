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


_MM64A_MUL = np.uint64(0xC6A4A7935BD1E995)
_MM64A_SEED = np.uint64(0xE17A1465)
_R47 = np.uint64(47)


def duckdb_hash_varchar(strings) -> np.ndarray:
    """duckdb::Hash for VARCHAR (verified == SQL ``hash(<varchar>)``):
    MurmurHash64A with seed 0xe17a1465 over the UTF-8 bytes (probed against
    DuckDB 1.0 across lengths 0..13+; the 8-byte chunk loads use an explicit
    ``<u8`` little-endian dtype view, so results are host-endianness-free).

    Vectorized across the whole array: one zero-padded byte matrix, then
    ``ceil(Lmax/8)`` masked rounds of uint64 numpy ops — no per-string
    Python. Because the pad is zeros, the padded chunk at a string's last
    partial 8-byte window IS MurmurHash64A's tail accumulator value, so the
    tail needs no separate byte loop. Accepts a ``pa.StringArray`` /
    ``large_string`` / ChunkedArray or an iterable of str; nulls hash
    as '' (callers tokenizing text never produce nulls).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(
            [s if s is not None else "" for s in strings], pa.large_string()
        )
    arr = strings
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pa.types.is_string(arr.type):
        otype = np.int32
    elif pa.types.is_large_string(arr.type):
        otype = np.int64
    else:
        arr = pc.cast(arr, pa.large_string())
        otype = np.int64
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    off = (
        np.frombuffer(arr.buffers()[1], otype)[arr.offset : arr.offset + n + 1]
        .astype(np.int64)
    )
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, np.uint8) if buf is not None else np.zeros(0, np.uint8)
    lens = off[1:] - off[:-1]
    lmax = int(lens.max())
    ncols = max((lmax + 7) // 8, 1)
    mat = np.zeros((n, ncols * 8), np.uint8)
    if lmax:
        flat = data[off[0] : off[-1]]
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(len(flat)) - np.repeat(off[:-1] - off[0], lens)
        mat[rows, cols] = flat
    chunks = mat.view("<u8")
    m = _MM64A_MUL
    h = _MM64A_SEED ^ (lens.astype(np.uint64) * m)
    n8 = lens // 8
    for c in range(ncols):
        active = n8 > c
        if not active.any():
            break
        k = chunks[:, c].copy()
        k *= m
        k ^= k >> _R47
        k *= m
        h = np.where(active, (h ^ k) * m, h)
    tail = lens % 8 > 0
    if tail.any():
        k = chunks[np.arange(n), np.minimum(n8, ncols - 1)]
        h = np.where(tail, (h ^ k) * m, h)
    h ^= h >> _R47
    h *= m
    h ^= h >> _R47
    return h


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


# ===================================================================== #
# Chunked (salted) parity: bit-exact duckdb prefix aggregates when a hot
# group is split into bounded salt chunks (kernels/chunked.py).
#
# A chunk holding group rows [r0, r1) can evaluate every frame [o, o+e'),
# e' in [r0, r1), from a BOUNDED carried context:
#   - raws:  raw values at positions [max(o, 16*floor((o+r0)/16)), o+r0) —
#     the ragged tail of the previous chunks (≤15 values). Prepending them
#     makes the chunk's extended rows start 16-ALIGNED, so every node that
#     straddles the chunk boundary is rebuilt LOCALLY by the ordinary
#     level build — no special straddler logic at eval time.
#   - win[l]: the "spine window" — complete level-l nodes with index in
#     [16*floor(n0/16), n0), n0 = floor((o+r0)/16^l) (≤15 states). These
#     are exactly the completed children of the open level-(l+1) parent,
#     which by induction makes every higher straddler locally buildable.
#   - sl: the group's ragged-head state over rows [o, A) (left leaf).
#   - lf[l]: the begin-side left-fragment nodes [b_l, parent_end) near o.
# Fragments reference ONLY win ∪ lf ∪ locally-built nodes (proof sketch in
# round-3 notes); the driver fold walks chunks in salt order maintaining
# rolling raws + windows, completing boundary-straddling nodes from each
# chunk's shipped edge nodes and head raws.
# ===================================================================== #


def _z() -> tuple:
    return (0.0, 0.0, 0.0, 0.0)


def _upd(st: tuple, x: float) -> tuple:
    """duckdb aggregate update (sum state + Welford var state)."""
    if np.isnan(x):
        return st
    cnt, s, mean, dsq = st
    cnt = cnt + 1.0
    s = s + x
    delta = x - mean
    mean = mean + delta / cnt
    dsq = dsq + delta * (x - mean)
    return (cnt, s, mean, dsq)


def _comb(t: tuple, o: tuple) -> tuple:
    """target ∘ source in duckdb Combine order (STDDevBaseOperation)."""
    if o[0] == 0.0:
        return t
    if t[0] == 0.0:
        return o
    tc, ts, tm, td = t
    oc, os_, om, od = o
    c = tc + oc
    mean = (oc * om + tc * tm) / c
    delta = om - tm
    dsq = td + od + delta * delta * oc * tc / c
    return (c, ts + os_, mean, dsq)


def _build_single(v: np.ndarray, o_ext: int, win: dict):
    """Levels of complete nodes over one extended row run starting at
    global position o_ext. win[l] = (start_j, list_of_states) prepends
    carried spine nodes before building level l+1. Returns
    [(j0, [states...]), ...] (level 1 first). States are 4-tuples."""
    n = len(v)
    levels = []
    j0 = -(-o_ext // F)
    j1 = (o_ext + n) // F
    nodes = []
    for j in range(j0, j1):
        st = _z()
        lo = j * F - o_ext
        for x in v[lo:lo + F]:
            st = _upd(st, x)
        nodes.append(st)
    if 1 in win and win[1][1]:
        ws, wst = win[1]
        if ws + len(wst) != j0:
            raise RuntimeError(
                f"parity ctx: level-1 spine [{ws},{ws + len(wst)}) not "
                f"contiguous with local j0={j0}"
            )
        j0 = ws
        nodes = list(wst) + nodes
    levels.append((j0, nodes))
    max_win = max((l for l in win if win[l][1]), default=0)
    while len(levels) < 16:
        pj0, pnodes = levels[-1]
        lvl = len(levels) + 1
        cj0 = -(-pj0 // F)
        cj1 = (pj0 + len(pnodes)) // F
        cur = []
        for j in range(cj0, max(cj1, cj0)):
            st = _z()
            for ch in pnodes[j * F - pj0:(j + 1) * F - pj0]:
                st = _comb(st, ch)
            cur.append(st)
        if lvl in win and win[lvl][1]:
            ws, wst = win[lvl]
            if ws + len(wst) != cj0:
                raise RuntimeError(
                    f"parity ctx: level-{lvl} spine [{ws},{ws + len(wst)}) "
                    f"not contiguous with local j0={cj0}"
                )
            cj0 = ws
            cur = list(wst) + cur
        if not cur and lvl > max_win:
            break
        levels.append((cj0, cur))
    return levels


def _eval_rows(v_local, o, o2, levels, sl, lf, raws, want_var):
    """Per-row duckdb eval for one chunk: rows at global [o2, o2+len).
    levels from _build_single over raws+v_local; sl = group head state;
    lf[l] = (b_l, [states]); raws prepended values. Row-sequential python
    over ≤16-node fragments — parity/verification mode, not the hot path.
    Returns (cnt, s, mean, dsq) arrays per local row."""
    nloc = len(v_local)
    out = np.empty((4, nloc))
    A = (o // F) * F + F if o % F else o

    def node(lv, j):
        if lv in lf:
            b_l, sts = lf[lv]
            if b_l <= j < b_l + len(sts):
                st = sts[j - b_l]
                if st is not None:
                    return st
        j0, sts = levels[lv - 1]
        if j0 <= j < j0 + len(sts):
            return sts[j - j0]
        raise KeyError(f"parity chunk eval: missing node level={lv} j={j}")

    ext = np.concatenate([raws, v_local]) if len(raws) else v_local
    ext_lo = o2 - len(raws)
    if sl is None:
        if ext_lo != o:
            raise RuntimeError("parity chunk eval: missing head state")
        # group head [o, A) still inside the carried raws + local rows
        st0 = _z()
        for x in ext[: max(0, min(A, o2 + nloc) - o)]:
            st0 = _upd(st0, x)
        sl = st0
    # block-shared base states: for each leaf block J touched by this
    # chunk, base = eval [o, 16J); rows then update sequentially.
    Jlo = o2 // F
    Jhi = (o2 + nloc - 1) // F + 1  # + possible aligned-end extra block
    bases = {}
    for J in range(Jlo, Jhi + 1):
        e = J * F
        if e <= o or e > o2 + nloc:
            continue
        if J == o // F:
            bases[J] = None  # frame [o, 16J) empty or sub-head
            continue
        st = sl if sl is not None else _z()
        # digit loop: begin=o, end=16J
        b, en = o, e
        lvl = 0
        lefts, rights, top = [], [], None
        while True:
            pb, pe = b // F, en // F
            if pb == pe:
                if lvl > 0 and b < en:
                    top = (lvl, b, en)
                break
            if b % F:
                if lvl > 0:
                    lefts.append((lvl, b, (b // F) * F + F))
                pb += 1
            if en % F:
                if lvl > 0:
                    rights.append((lvl, (en // F) * F, en))
            b, en = pb, en // F
            lvl += 1
        for (lv, lo, hi) in lefts:
            for j in range(lo, hi):
                st = _comb(st, node(lv, j))
        if top is not None:
            lv, lo, hi = top
            for j in range(lo, hi):
                st = _comb(st, node(lv, j))
        for (lv, lo, hi) in reversed(rights):
            for j in range(lo, hi):
                st = _comb(st, node(lv, j))
        bases[J] = st

    for i in range(nloc):
        g = o2 + i          # global row position
        e = g + 1           # frame end
        if e % F == 0 and (e // F) in bases and bases[e // F] is not None:
            st = bases[e // F]
        else:
            J = g // F
            base = bases.get(J)
            if base is None:
                # frame [o, e) entirely within the ragged head block:
                # sequential from o
                st = _z()
                lo = o - ext_lo
            else:
                st = base
                lo = J * F - ext_lo
            for x in ext[lo:e - ext_lo]:
                st = _upd(st, x)
        out[0, i], out[1, i], out[2, i], out[3, i] = st
    return out[0], out[1], out[2], out[3]


def _states_from_tuples(tups: list) -> "_States":
    st = _States(len(tups), True)
    for i, t in enumerate(tups):
        st.cnt[i], st.s[i], st.mean[i], st.dsq[i] = t
    return st


def _concat_states(a: "_States", b: "_States") -> "_States":
    out = _States(0, True)
    out.cnt = np.concatenate([a.cnt, b.cnt])
    out.s = np.concatenate([a.s, b.s])
    out.mean = np.concatenate([a.mean, b.mean])
    out.dsq = np.concatenate([a.dsq, b.dsq])
    return out


def _build_levels_vec(ext: np.ndarray, ext_lo: int, win: dict) -> list:
    """Vectorized `_build_single`: complete segment-tree levels over one
    extended row run starting at global position ext_lo, win[l] spine
    states prepended before building level l+1. Returns [(j0, _States),
    ...] (level 1 first) — bit-identical states to the scalar builder
    (same update/combine op order, k = 0..15 across all nodes)."""
    n = len(ext)
    levels = []
    j0 = -(-ext_lo // F)
    j1 = (ext_lo + n) // F
    m = max(j1 - j0, 0)
    st = _States(m, True)
    if m:
        base = j0 * F - ext_lo + np.arange(m, dtype=np.int64) * F
        for k in range(F):
            x = ext[base + k]
            ok = ~np.isnan(x)
            if ok.any():
                st.update(np.flatnonzero(ok), x[ok])
    if 1 in win and win[1][1]:
        ws, wst = win[1]
        if ws + len(wst) != j0:
            raise RuntimeError(
                f"parity ctx: level-1 spine [{ws},{ws + len(wst)}) not "
                f"contiguous with local j0={j0}"
            )
        st = _concat_states(_states_from_tuples(wst), st)
        j0 = ws
    levels.append((j0, st))
    max_win = max((l for l in win if win[l][1]), default=0)
    while len(levels) < 16:
        pj0, pst = levels[-1]
        pn = len(pst.cnt)
        lvl = len(levels) + 1
        cj0 = -(-pj0 // F)
        cj1 = (pj0 + pn) // F
        mm = max(cj1 - cj0, 0)
        cur = _States(mm, True)
        if mm:
            child0 = cj0 * F - pj0 + np.arange(mm, dtype=np.int64) * F
            idx = np.arange(mm)
            for k in range(F):
                cur.combine_from(idx, pst, child0 + k)
        if lvl in win and win[lvl][1]:
            ws, wst = win[lvl]
            if ws + len(wst) != cj0:
                raise RuntimeError(
                    f"parity ctx: level-{lvl} spine [{ws},{ws + len(wst)}) "
                    f"not contiguous with local j0={cj0}"
                )
            cur = _concat_states(_states_from_tuples(wst), cur)
            cj0 = ws
        if len(cur.cnt) == 0 and lvl > max_win:
            break
        levels.append((cj0, cur))
    return levels


def chunk_parity_payload(v_local: np.ndarray, o: int, r0: int) -> dict:
    """What a chunk ships to the driver fold: head/tail raws and the
    per-level edge-node states the walk needs (≤ ~32 states per level)."""
    n = len(v_local)
    o2 = o + r0
    o3 = o2 + n
    head = v_local[: min(F, n)].copy()
    tail_lo = max((o3 // F) * F, o2)
    tail = v_local[tail_lo - o2:].copy()
    levels = _build_levels_vec(
        np.ascontiguousarray(v_local, dtype=np.float64), o2, {}
    )
    nodes = {}
    for li, (j0, sts) in enumerate(levels):
        lv = li + 1
        nst = len(sts.cnt)
        if not nst:
            continue
        step = F ** lv
        keep = {}
        # head-side: from the first complete node to the end of its parent
        # window (all inner children of the boundary-straddling parent)
        h_hi = ((j0 // F) + 1) * F
        # tail-side: the spine window of the chunk's end
        n1 = o3 // step
        t_lo = (n1 // F) * F
        for j in range(j0, j0 + nst):
            if j < h_hi or t_lo <= j < n1:
                i = j - j0
                keep[j] = (float(sts.cnt[i]), float(sts.s[i]),
                           float(sts.mean[i]), float(sts.dsq[i]))
        if keep:
            nodes[lv] = keep
    return {"n": n, "head": head, "tail": tail, "tail_lo": tail_lo,
            "nodes": nodes}


def fold_parity_payloads(payloads: list, o: int) -> list:
    """Driver walk over one group's chunk payloads (salt order) → carried
    context per chunk (None for the first). O(#chunks × levels × 16)."""
    A = (o // F) * F + F if o % F else o
    pos = o
    raw_lo = o
    raws: list = []
    sl = _z()
    cand: dict = {}          # level -> {j: state}
    lf_spec: dict = {}       # level -> (b_l, width)
    b_l = o
    lvl = 1
    while True:
        b_l = -(-b_l // F)
        if b_l % F:
            lf_spec[lvl] = (b_l, F - (b_l % F))
        lvl += 1
        if b_l < F and b_l % F == 0:
            break
        if lvl > 16:
            break
    ctxs = []
    for p in payloads:
        n = p["n"]
        o2 = pos
        if o2 == o:
            ctxs.append(None)
        else:
            win = {}
            maxlv = 1
            while F ** maxlv <= max(o2, 1):
                maxlv += 1
            for lv in range(1, maxlv + 1):
                step = F ** lv
                n0 = o2 // step
                lo = max((n0 // F) * F, -(-o // step))
                states = []
                okwin = True
                for j in range(lo, n0):
                    st = cand.get(lv, {}).get(j)
                    if st is None:
                        okwin = False
                        break
                    states.append(st)
                if not okwin:
                    raise RuntimeError(
                        f"parity fold: spine hole at level {lv} "
                        f"pos={o2} lo={lo} n0={n0}"
                    )
                if states:
                    win[lv] = (lo, states)
            lf = {}
            for lv, (b0, width) in lf_spec.items():
                sts = [cand.get(lv, {}).get(j) for j in
                       range(b0, b0 + width)]
                if any(s is not None for s in sts):
                    lf[lv] = (b0, sts)
            ctxs.append({
                "raws": np.asarray(raws, dtype=np.float64),
                "raw_lo": raw_lo,
                "sl": sl if o2 >= A else None,
                "win": win,
                "lf": lf,
            })
        # ---------------- advance past this chunk ------------------------ #
        head = p["head"]
        if pos < A:
            take = min(A, pos + n) - pos
            for x in head[:take]:
                sl = _upd(sl, x)
        cand.setdefault(1, {})
        for lv, nd in p["nodes"].items():
            cand.setdefault(lv, {}).update(nd)
        # complete the leaf node straddling this boundary from rolling raws
        jb = pos // F
        if pos % F and jb * F >= o and (jb + 1) * F <= pos + n \
                and jb not in cand[1]:
            vals = list(raws[jb * F - raw_lo:]) + list(
                head[: (jb + 1) * F - pos]
            )
            st = _z()
            for x in vals:
                st = _upd(st, x)
            cand[1][jb] = st
        # upward completion of straddling parents
        chlv = 1
        while chlv in cand and cand[chlv]:
            step_up = F ** (chlv + 1)
            parents = sorted({j // F for j in cand[chlv]})
            done_any = False
            for pj in parents:
                if pj in cand.get(chlv + 1, {}):
                    continue
                if pj * step_up < o or (pj + 1) * step_up > pos + n:
                    continue
                kids = [cand[chlv].get(j) for j in
                        range(pj * F, pj * F + F)]
                if any(k is None for k in kids):
                    continue
                st = _z()
                for k in kids:
                    st = _comb(st, k)
                cand.setdefault(chlv + 1, {})[pj] = st
                done_any = True
            if not done_any and chlv + 1 not in cand:
                break
            chlv += 1
        pos += n
        # rolling raws for the next boundary: positions [new_lo, pos)
        new_lo = max((pos // F) * F, o)
        tail_lo = p["tail_lo"]  # global position of the first tail value
        new_raws = []
        for q in range(new_lo, pos):
            if q < o2:
                new_raws.append(float(raws[q - raw_lo]))
            elif q >= tail_lo:
                new_raws.append(float(p["tail"][q - tail_lo]))
            elif q - o2 < len(head):
                new_raws.append(float(head[q - o2]))
            else:
                raise RuntimeError(
                    f"parity fold: raw value at {q} not shipped "
                    f"(chunk [{o2},{o2 + n}), tail_lo={tail_lo})"
                )
        raws = new_raws
        raw_lo = new_lo
    return ctxs


def eval_chunk_with_ctx_ref(v_local: np.ndarray, o: int, r0: int, ctx,
                            want_var: bool = True):
    """Scalar reference for `eval_chunk_with_ctx` (row-sequential python,
    kept as the bit-exactness oracle for the vectorized path)."""
    v_local = np.ascontiguousarray(v_local, dtype=np.float64)
    if ctx is None:
        codes = np.zeros(len(v_local), dtype=np.int64)
        return prefix_agg_duckdb(
            v_local, codes, np.array([o], dtype=np.int64), want_var
        )
    raws = ctx["raws"]
    o2 = o + r0
    win = ctx["win"]
    levels = _build_single(
        np.concatenate([raws, v_local]) if len(raws) else v_local,
        o2 - len(raws), win,
    )
    return _eval_rows(
        v_local, o, o2, levels, ctx["sl"], ctx.get("lf", {}), raws, want_var
    )


def _apply_frag_vec(bst: "_States", bidx: np.ndarray, lv: int,
                    lo: np.ndarray, hi: np.ndarray, merged: dict) -> None:
    """Combine nodes [lo, hi) at level lv into bst rows bidx, node index
    ascending — vectorized across blocks via ≤15 sub-iterations."""
    ent = merged.get(lv)
    if ent is None:
        raise KeyError(f"parity chunk eval: missing node level={lv}")
    mj0, mst, mval = ent
    width = hi - lo
    wmax = int(width.max()) if len(width) else 0
    for k in range(wmax):
        m = width > k
        bs = bidx[m]
        sidx = lo[m] + k - mj0
        if len(sidx) and (
            sidx.min() < 0 or sidx.max() >= len(mval) or not mval[sidx].all()
        ):
            raise KeyError(f"parity chunk eval: missing node level={lv}")
        bst.combine_from(bs, mst, sidx)


def eval_chunk_with_ctx(v_local: np.ndarray, o: int, r0: int, ctx,
                        want_var: bool = True):
    """Bit-exact duckdb prefix aggregates for one chunk given its carried
    context (None → plain whole-prefix evaluation).

    Vectorized re-expression of the scalar `_eval_rows` protocol with the
    same `_States` SoA machinery as `prefix_agg_duckdb`: one level build
    over raws+local rows (carried spine windows prepended), block base
    states assembled from the identical fragment decomposition (left
    fragments ascending level → top → right fragments descending), then
    per-row emission evolving one state per leaf block. Op order matches
    the scalar reference exactly — see test_chunk_eval_vec_matches_scalar."""
    v_local = np.ascontiguousarray(v_local, dtype=np.float64)
    if ctx is None:
        codes = np.zeros(len(v_local), dtype=np.int64)
        return prefix_agg_duckdb(
            v_local, codes, np.array([o], dtype=np.int64), want_var
        )
    nloc = len(v_local)
    if nloc == 0:
        z = np.zeros(0)
        return z, z.copy(), z.copy(), z.copy()
    raws = np.asarray(ctx["raws"], dtype=np.float64)
    o2 = o + r0
    ext = np.concatenate([raws, v_local]) if len(raws) else v_local
    ext_lo = o2 - len(raws)
    levels = _build_levels_vec(ext, ext_lo, ctx["win"])
    lf = ctx.get("lf", {})
    A = (o // F) * F + F if o % F else o
    sl = ctx["sl"]
    if sl is None:
        if ext_lo != o:
            raise RuntimeError("parity chunk eval: missing head state")
        st0 = _z()
        for x in ext[: max(0, min(A, o2 + nloc) - o)]:
            st0 = _upd(st0, x)
        sl = st0

    # merged per-level node lookup: built levels overlaid by lf (lf wins,
    # matching the scalar node() resolution order); validity tracked so a
    # genuinely missing node still raises instead of silently no-opping.
    merged: dict = {}
    for li, (j0, st) in enumerate(levels):
        lv = li + 1
        if lv in lf:
            b0, sts = lf[lv]
            lo_j = min(b0, j0)
            hi_j = max(b0 + len(sts), j0 + len(st.cnt))
            big = _States(hi_j - lo_j, True)
            bval = np.zeros(hi_j - lo_j, dtype=bool)
            s0 = j0 - lo_j
            nst = len(st.cnt)
            big.cnt[s0:s0 + nst] = st.cnt
            big.s[s0:s0 + nst] = st.s
            big.mean[s0:s0 + nst] = st.mean
            big.dsq[s0:s0 + nst] = st.dsq
            bval[s0:s0 + nst] = True
            for t, tup in enumerate(sts):
                if tup is not None:
                    p = b0 - lo_j + t
                    big.cnt[p], big.s[p], big.mean[p], big.dsq[p] = tup
                    bval[p] = True
            merged[lv] = (lo_j, big, bval)
        else:
            merged[lv] = (j0, st, np.ones(len(st.cnt), dtype=bool))
    for lv, (b0, sts) in lf.items():
        if lv not in merged:
            big = _States(len(sts), True)
            bval = np.zeros(len(sts), dtype=bool)
            for t, tup in enumerate(sts):
                if tup is not None:
                    big.cnt[t], big.s[t], big.mean[t], big.dsq[t] = tup
                    bval[t] = True
            merged[lv] = (b0, big, bval)

    # ---------------- phase 1: block base states ----------------------- #
    # Js covers every leaf block touched by the chunk plus the possible
    # aligned-end extra block whose base serves the last aligned row.
    Jlo = o2 // F
    Jhi = (o2 + nloc - 1) // F + 1
    Js = np.arange(Jlo, Jhi + 1, dtype=np.int64)
    nB = len(Js)
    e_blk = Js * F
    has_base = (e_blk > o) & (e_blk <= o2 + nloc) & (Js != o // F)
    bst = _States(nB, True)
    hb = np.flatnonzero(has_base)
    bst.cnt[hb], bst.s[hb], bst.mean[hb], bst.dsq[hb] = sl

    if len(hb):
        # fragment decomposition, identical digit loop to the scalar path,
        # vectorized across blocks (begin = o for all, end = 16J).
        b_cur = np.full(len(hb), o, dtype=np.int64)
        e_cur = e_blk[hb].copy()
        active = np.ones(len(hb), dtype=bool)
        lvl = 0
        left_ops, top_ops, right_ops = [], [], []
        while active.any():
            pb = b_cur // F
            pe = e_cur // F
            top_m = active & (pb == pe)
            if lvl > 0:
                t = np.flatnonzero(top_m & (b_cur < e_cur))
                if len(t):
                    top_ops.append((lvl, t, b_cur[t].copy(), e_cur[t].copy()))
            active = active & ~top_m
            if not active.any():
                break
            if lvl > 0:
                lsel = np.flatnonzero(active & (b_cur % F != 0))
                if len(lsel):
                    left_ops.append((lvl, lsel, b_cur[lsel].copy(),
                                     (b_cur[lsel] // F) * F + F))
                rsel = np.flatnonzero(active & (e_cur % F != 0))
                if len(rsel):
                    right_ops.append((lvl, rsel, (e_cur[rsel] // F) * F,
                                      e_cur[rsel].copy()))
            b_cur = np.where(b_cur % F != 0, b_cur // F + 1, b_cur // F)
            e_cur = e_cur // F
            lvl += 1
            if lvl > 24:
                raise RuntimeError("parity chunk eval: digit loop runaway")
        for (lv, sel, lo, hi) in left_ops:
            _apply_frag_vec(bst, hb[sel], lv, lo, hi, merged)
        for (lv, sel, lo, hi) in top_ops:
            _apply_frag_vec(bst, hb[sel], lv, lo, hi, merged)
        for (lv, sel, lo, hi) in reversed(right_ops):
            _apply_frag_vec(bst, hb[sel], lv, lo, hi, merged)

    # aligned-end rows snapshot the NEXT block's base (pre-phase-2 copy)
    base_cnt = bst.cnt.copy()
    base_s = bst.s.copy()
    base_mean = bst.mean.copy()
    base_dsq = bst.dsq.copy()

    # first block starting mid-block: advance its state through the carried
    # raw values [16*Jlo, o2) before the chunk's own rows (≤ 15 values).
    if has_base[0] and Js[0] * F < o2:
        st = (bst.cnt[0], bst.s[0], bst.mean[0], bst.dsq[0])
        for x in ext[Js[0] * F - ext_lo: o2 - ext_lo]:
            st = _upd(st, x)
        bst.cnt[0], bst.s[0], bst.mean[0], bst.dsq[0] = st

    # ---------------- phase 2: per-row emission ------------------------ #
    out = np.empty((4, nloc))
    nRB = nB - 1  # row blocks are Js[:-1]
    rb = np.arange(nRB, dtype=np.int64)
    row_lo = np.maximum(Js[:-1] * F, o2)
    row_hi = np.minimum(Js[:-1] * F + F, o2 + nloc)
    width = row_hi - row_lo
    head_rows = []
    for k in range(int(width.max()) if nRB else 0):
        m = width > k
        bsel = rb[m]
        g = row_lo[m] + k
        li = g - o2
        x = v_local[li]
        headm = ~has_base[bsel]
        upd = np.flatnonzero(~headm)
        if len(upd):
            xu = x[upd]
            ok = ~np.isnan(xu)
            if ok.any():
                bst.update(bsel[upd][ok], xu[ok])
        aligned = (g % F) == (F - 1)
        if aligned.any():
            nb_idx = bsel[aligned] + 1
            if not has_base[nb_idx].all():
                raise RuntimeError(
                    "parity chunk eval: aligned row missing next base"
                )
            r = li[aligned]
            out[0, r] = base_cnt[nb_idx]
            out[1, r] = base_s[nb_idx]
            out[2, r] = base_mean[nb_idx]
            out[3, r] = base_dsq[nb_idx]
        rest = ~aligned & ~headm
        if rest.any():
            br = bsel[rest]
            r = li[rest]
            out[0, r] = bst.cnt[br]
            out[1, r] = bst.s[br]
            out[2, r] = bst.mean[br]
            out[3, r] = bst.dsq[br]
        hrest = ~aligned & headm
        if hrest.any():
            head_rows.extend(li[hrest].tolist())
    # rows whose frame [o, g+1) lies inside the group's ragged head block:
    # sequential from o over ext (≤ 16 rows × ≤ 16 values)
    for i in sorted(head_rows):
        st = _z()
        for x in ext[o - ext_lo: (o2 + i + 1) - ext_lo]:
            st = _upd(st, x)
        out[0, i], out[1, i], out[2, i], out[3, i] = st
    return out[0], out[1], out[2], out[3]


# --------------------------------------------------------------------- #
# GROUPED/GLOBAL AGGREGATE parity (plain GROUP BY / full-partition window)
# --------------------------------------------------------------------- #
# Empirically verified against DuckDB 1.0.0 (single-morsel inputs, i.e.
# one parquet row group / <=122880 rows — the oracle-verification scale):
#   - sum()/avg() accumulate PLAIN SEQUENTIAL float64 in scan order
#     (all 1500 sf0.1 groups bit-exact; Kahan and pairwise both differ);
#   - avg(x) OVER (PARTITION BY k) == GROUP BY avg bit-for-bit;
#   - var_pop()/stddev_pop() are one sequential Welford pass (m2/n).
# Production paths keep longdouble partials (tighter numerics, fully
# distributed); these helpers exist for opt-in duckdb-parity fit stats.

def seq_sum(x: np.ndarray) -> float:
    """Strict left-to-right float64 sum, NaN-skipped. np.cumsum is a
    sequential C loop, so its last element IS the plain sequential sum."""
    x = np.asarray(x, np.float64)
    x = x[~np.isnan(x)]
    if not len(x):
        return float("nan")
    return float(np.cumsum(x)[-1])


def seq_var_pop(x: np.ndarray) -> float:
    """Sequential Welford population variance (duckdb var_pop). Python
    loop over the values — parity verification mode only, callers bound n."""
    x = np.asarray(x, np.float64)
    x = x[~np.isnan(x)]
    n = 0
    mean = 0.0
    m2 = 0.0
    for v in x.tolist():
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
    return m2 / n if n else float("nan")


def seq_group_sums(v: np.ndarray, gid: np.ndarray):
    """Plain sequential per-group float64 sums, vectorized ACROSS groups:
    compact the non-NaN values (order preserved), then iterate position
    j = 0..max_group_len-1 adding each group's j-th value — every group's
    accumulation order is exactly its scan order, every iteration is one
    vectorized gather+add. Requires rows sorted by gid with within-group
    scan order preserved. Returns (group_first_row_index, sums, counts)
    where group_first_row_index indexes the ORIGINAL (uncompacted) rows."""
    v = np.asarray(v, np.float64)
    gid = np.asarray(gid)
    orig_starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
    mask = ~np.isnan(v)
    vv = v[mask]
    gg = gid[mask]
    if not len(vv):
        return (
            orig_starts,
            np.full(len(orig_starts), np.nan),
            np.zeros(len(orig_starts), np.int64),
        )
    starts = np.flatnonzero(np.r_[True, gg[1:] != gg[:-1]])
    lens = np.diff(np.r_[starts, len(gg)])
    acc = np.zeros(len(starts), np.float64)
    for j in range(int(lens.max())):
        sel = lens > j
        acc[sel] += vv[starts[sel] + j]
    # re-align to ALL groups (groups that are entirely NaN get nan/0)
    out_s = np.full(len(orig_starts), np.nan)
    out_n = np.zeros(len(orig_starts), np.int64)
    present = np.searchsorted(gid[orig_starts], gg[starts])
    out_s[present] = acc
    out_n[present] = lens
    return orig_starts, out_s, out_n
