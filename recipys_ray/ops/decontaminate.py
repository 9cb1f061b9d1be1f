"""Benchmark decontamination — drop/flag training documents that overlap an
evaluation set by word n-grams (the GPT-3 / PaLM 13-gram-overlap protocol;
here the n is a parameter).

Ray-Data-first shape:

1. The BENCHMARK side is small by definition (eval sets): one
   ``map_batches`` pass emits each benchmark doc's distinct n-gram hashes
   (64-bit ``pd.util.hash_array`` over the space-joined word n-gram — the
   same public primitive the jaccard/minhash ops use), the driver unions
   them into ONE sorted uint64 array and ``ray.put``s it — a broadcast
   lookup side, never a shuffle join.
2. The TRAINING side streams: per batch, every document's n-gram hashes are
   computed batch-flattened (one regex pass per doc, one hash call per
   batch) and membership is a vectorized ``np.searchsorted`` against the
   broadcast array; a segmented ``np.add.reduceat`` marks contaminated
   docs. ``mode="flag"`` appends a ``contaminated`` column,
   ``mode="drop"`` filters the rows out.

Documents shorter than n words contribute their whole text as one gram
(mirrors ops/jaccard.py's shingle convention). A benchmark larger than
``max_benchmark_grams`` raises instead of silently broadcasting gigabytes —
at that size the right tool is a hash-partitioned anti-join (ops/dedup.py's
Bloom + anti-join pattern), not decontamination-by-broadcast.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _doc_grams(texts, n: int):
    """Per-doc word n-grams (space-joined strings) + per-doc counts."""
    grams: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = _WORD_RE.findall((t or "").lower())
        if len(ws) < n:
            g = [" ".join(ws)]
        else:
            g = [" ".join(ws[k:k + n]) for k in range(len(ws) - n + 1)]
        counts[i] = len(g)
        grams.extend(g)
    return grams, counts


def _gram_hashes(grams: list) -> np.ndarray:
    if not grams:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(np.array(grams, dtype=object)).astype(
        np.uint64
    )


def benchmark_gram_set(
    benchmark_ds,
    text_col: str,
    n: int,
    max_benchmark_grams: int = 50_000_000,
):
    """Sorted unique uint64 n-gram hashes of the benchmark corpus."""

    def partial(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pandas().fillna("")
        grams, _ = _doc_grams(texts, n)
        h = np.unique(_gram_hashes(grams))
        return pa.table({"h": pa.array(h)})

    parts = (
        benchmark_ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = np.unique(parts["h"].to_numpy().astype(np.uint64))
    if len(out) > max_benchmark_grams:
        raise ValueError(
            f"benchmark has {len(out)} distinct {n}-grams > "
            f"max_benchmark_grams={max_benchmark_grams}; a benchmark that "
            f"size should use a hash-partitioned anti-join, not a broadcast"
        )
    return out


class _Contaminated:
    """Broadcast-membership stage. Works as a plain task function (the
    ray.get of the broadcast array is a zero-copy plasma read per task) or
    as an actor class via map_batches(concurrency=(lo, hi)) when payloads
    are large enough to amortize actor startup."""

    def __init__(self, text_col: str, n: int, bench_ref):
        self.text_col = text_col
        self.n = n
        self._bench_ref = bench_ref
        self._bench = None

    @property
    def bench(self):
        if self._bench is None:
            import ray

            self._bench = ray.get(self._bench_ref)
        return self._bench

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column(self.text_col).to_pandas().fillna("")
        if not len(texts):
            return tbl.append_column(
                "contaminated", pa.array([], pa.bool_())
            )
        grams, counts = _doc_grams(texts, self.n)
        h = _gram_hashes(grams)
        pos = np.searchsorted(self.bench, h)
        pos = np.minimum(pos, max(len(self.bench) - 1, 0))
        hit = (
            (self.bench[pos] == h).astype(np.float64)
            if len(self.bench)
            else np.zeros(len(h))
        )
        offsets = np.r_[0, np.cumsum(counts)[:-1]]
        flagged = np.add.reduceat(hit, offsets) > 0
        return tbl.append_column("contaminated", pa.array(flagged))


def decontaminate(
    ds,
    benchmark_ds,
    text_col: str = "text",
    n: int = 13,
    mode: str = "flag",
    concurrency=(2, 8),
    max_benchmark_grams: int = 50_000_000,
    bench_ref: Optional[object] = None,
):
    """Flag (or drop) documents sharing any word n-gram with the benchmark."""
    import ray

    if mode not in ("flag", "drop"):
        raise ValueError("mode must be 'flag' or 'drop'")
    if bench_ref is None:
        bench = benchmark_gram_set(
            benchmark_ds, text_col, n, max_benchmark_grams
        )
        bench_ref = ray.put(bench)
    out = ds.map_batches(
        _Contaminated(text_col, n, bench_ref),
        batch_format="pyarrow",
    )
    _ = concurrency  # kept for API compatibility; tasks amortize better
    # than a fresh actor pool until batches are large (actor path: pass the
    # class via map_batches(_Contaminated, fn_constructor_args=...))
    if mode == "drop":
        def keep(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return tbl.filter(
                pc.invert(tbl.column("contaminated"))
            ).drop_columns(["contaminated"])

        out = out.map_batches(keep, batch_format="pyarrow")
    return out
