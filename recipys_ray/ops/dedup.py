"""Deduplication operators for large-scale corpora.

All variants follow the same shuffle-lean shape:

1. a stateless/actor-pool ``map_batches`` pass computes per-document keys or
   sketches (hashes, minhash signatures, simhash bits) — vectorized, no data
   motion;
2. ONE ``groupby`` on the small key column co-locates collision candidates;
3. per-group logic picks survivors / emits candidate pairs;
4. (near-dup only) connected components over the candidate-pair set — the
   pair set is orders of magnitude smaller than the corpus, so a driver-side
   union-find is used here; the documented scale path is iterative min-label
   propagation (a few ``groupby`` rounds) when pairs no longer fit the
   driver.

Only hashes/ids are shuffled — never the text payload.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# Mersenne prime 2^61-1 — universal hashing for minhash permutations
_MERSENNE = (1 << 61) - 1


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #
class _ContentHash:
    def __init__(self, text_col: str):
        self.text_col = text_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column(self.text_col).to_pandas().fillna("").to_numpy(object)
        h = pd.util.hash_array(texts).astype(np.int64)
        return tbl.append_column("__content_hash__", pa.array(h))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the row with the smallest ``id_col`` per exact text content.

    hash-partition + per-group first: one vectorized hash pass, one groupby
    on the 8-byte hash (text never shuffles beyond its own block), min-id
    survivor per group.
    """
    hashed = ds.map_batches(_ContentHash(text_col), batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(id_col, kind="stable").head(1).copy()
        out["n_dups"] = len(g)
        return out.drop(columns=["__content_hash__"])

    return hashed.groupby("__content_hash__").map_groups(
        keep_first, batch_format="pandas"
    )


# --------------------------------------------------------------------- #
# minhash + LSH near-dup
# --------------------------------------------------------------------- #
def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


class _MinHashBands:
    """Per-batch: shingle → minhash signature → one row per (doc, band)."""

    def __init__(self, text_col, id_col, num_perm, bands, shingle_k, seed=7):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.a, self.b = _minhash_params(num_perm, seed)
        self.word_re = _WORD_RE

    def signature(self, text: str) -> np.ndarray:
        ws = self.word_re.findall(text.lower())
        k = self.shingle_k
        if len(ws) < k:
            shingles = np.array([" ".join(ws)], dtype=object)
        else:
            shingles = np.array(
                [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)],
                dtype=object,
            )
        h = (pd.util.hash_array(shingles) & np.uint64(_MERSENNE)).astype(np.int64)
        # (num_perm, n_shingles) universal hashes → min along shingles
        vals = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column(self.text_col).to_pandas().fillna("")
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        n = len(texts)
        band_ids = np.empty(n * self.bands, dtype=np.int32)
        band_hashes = np.empty(n * self.bands, dtype=np.int64)
        doc_ids = np.repeat(ids, self.bands)
        r = self.rows_per_band
        for i, t in enumerate(texts):
            sig = self.signature(t)
            for bnd in range(self.bands):
                chunk = sig[bnd * r : (bnd + 1) * r]
                band_ids[i * self.bands + bnd] = bnd
                band_hashes[i * self.bands + bnd] = (
                    int(pd.util.hash_array(np.ascontiguousarray(chunk)).sum())
                    & 0x7FFFFFFFFFFFFFFF
                )
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hashes),
                self.id_col: pa.array(doc_ids),
            }
        )


def minhash_candidate_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
):
    """(a, b) candidate pairs (a < b) sharing at least one LSH band bucket.

    With num_perm=64, bands=16 (r=4) the collision threshold is
    s ≈ (1/16)^(1/4) ≈ 0.5 Jaccard.
    """
    exploded = ds.map_batches(
        _MinHashBands(text_col, id_col, num_perm, bands, shingle_k),
        batch_format="pyarrow",
    )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        # pair every member with the group min — enough for connected
        # components (star expansion), O(n) not O(n²)
        return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0]), "b": ids[1:]})

    return exploded.groupby(["band", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )


def _safe_pairs(pairs) -> pd.DataFrame:
    if pairs is None or len(pairs) == 0 or "a" not in getattr(pairs, "columns", []):
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64)})
    return pairs


def _connected_components(pairs: pd.DataFrame) -> dict:
    """Driver-side union-find over the (small) candidate-pair set.

    Scale path (documented): when pairs outgrow the driver, run iterative
    min-label propagation — repeat `label[b] = min(label[a], label[b])` via
    groupby rounds until fixpoint; each round is one small shuffle over the
    pair set only.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
):
    """Drop near-duplicates: keep the min-id representative per component."""
    pairs = _safe_pairs(minhash_candidate_pairs(
        ds, text_col, id_col, num_perm, bands, shingle_k
    ).to_pandas())
    roots = _connected_components(pairs)
    losers = {doc for doc, root in roots.items() if root != doc}

    def keep(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, np.fromiter(losers, dtype=ids.dtype, count=len(losers))) if losers else np.ones(len(ids), bool)
        return tbl.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------- #
# simhash near-dup
# --------------------------------------------------------------------- #
class _SimHash:
    def __init__(self, text_col: str, nbits: int = 64):
        self.text_col = text_col
        self.nbits = nbits
        self.word_re = _WORD_RE

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column(self.text_col).to_pandas().fillna("")
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = np.array(self.word_re.findall(t.lower()) or [""], dtype=object)
            h = pd.util.hash_array(ws)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            sim = np.uint64(0)
            for j in np.flatnonzero(votes > 0):
                sim |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sim & np.uint64(0x7FFFFFFFFFFFFFFF))
        return tbl.append_column("simhash", pa.array(out))


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  hamming_threshold: int = 3):
    """SimHash near-dup: 4×16-bit band buckets, verify Hamming distance
    in-bucket, min-id survivor per component."""
    hashed = ds.map_batches(_SimHash(text_col), batch_format="pyarrow")

    def explode(tbl: pa.Table) -> pa.Table:
        sim = tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        n = len(sim)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        key = np.empty(n * 4, dtype=np.int64)
        for b in range(4):
            key[b::4] = ((sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band),
                "band_key": pa.array(key),
                id_col: pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(sim.astype(np.int64), 4)),
            }
        )

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    thr = hamming_threshold

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        g = g.sort_values(id_col)
        sims = g["simhash"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy()
        x = sims[:, None] ^ sims[None, :]
        # vectorized popcount via uint8 view
        ham = np.unpackbits(x.view(np.uint8).reshape(len(g), len(g), 8), axis=2).sum(axis=2)
        ii, jj = np.nonzero((ham <= thr) & (np.arange(len(g))[:, None] < np.arange(len(g))[None, :]))
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs = _safe_pairs(exploded.groupby(["band", "band_key"]).map_groups(
        emit_pairs, batch_format="pandas"
    ).to_pandas()).drop_duplicates()
    roots = _connected_components(pairs)
    losers = {doc for doc, root in roots.items() if root != doc}

    def keep(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, np.fromiter(losers, dtype=ids.dtype, count=len(losers))) if losers else np.ones(len(ids), bool)
        return tbl.filter(pa.array(mask))

    return hashed.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------- #
# n-gram Jaccard verification (for candidate pairs)
# --------------------------------------------------------------------- #
def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    wa = _WORD_RE.findall(text_a.lower())
    wb = _WORD_RE.findall(text_b.lower())
    sa = {" ".join(wa[i : i + k]) for i in range(max(1, len(wa) - k + 1))}
    sb = {" ".join(wb[i : i + k]) for i in range(max(1, len(wb) - k + 1))}
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(ds, pairs: pd.DataFrame, text_col="text",
                         id_col="doc_id", k: int = 3, threshold: float = 0.5):
    """Exact n-gram Jaccard on candidate pairs: broadcast the candidate id
    set, stream only those texts to the driver (candidates ≪ corpus), verify.
    """
    cand_ids = np.unique(np.r_[pairs["a"].to_numpy(), pairs["b"].to_numpy()])

    def pick(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array(np.isin(ids, cand_ids)))

    texts = (
        ds.map_batches(pick, batch_format="pyarrow")
        .select_columns([id_col, text_col])
        .to_pandas()
        .set_index(id_col)[text_col]
        .to_dict()
    )
    keep = [
        ngram_jaccard(texts.get(a, ""), texts.get(b, ""), k) >= threshold
        for a, b in zip(pairs["a"], pairs["b"])
    ]
    return pairs[np.array(keep, dtype=bool)] if len(pairs) else pairs


# --------------------------------------------------------------------- #
# embedding cosine near-dup
# --------------------------------------------------------------------- #
def embedding_dedup(
    ds,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.98,
    n_planes: int = 12,
    seed: int = 5,
):
    """Near-dup by embedding cosine: random-hyperplane LSH buckets, exact
    in-bucket pairwise cosine, min-id survivor per component."""
    first = ds.take(1)[0]
    dim = len(first[emb_col])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes))

    def bucketize(tbl: pa.Table) -> pa.Table:
        emb = np.stack(tbl.column(emb_col).to_pandas().to_numpy())
        signs = (emb @ planes) > 0
        key = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        return pa.table(
            {
                "bucket": pa.array(key),
                id_col: tbl.column(id_col),
                "__unit__": pa.array(list((emb / norm[:, None]).astype(np.float32))),
            }
        )

    exploded = ds.map_batches(bucketize, batch_format="pyarrow")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        g = g.sort_values(id_col)
        U = np.stack(g["__unit__"].to_numpy())
        ids = g[id_col].to_numpy()
        sims = U @ U.T
        ii, jj = np.nonzero(
            (sims >= threshold)
            & (np.arange(len(g))[:, None] < np.arange(len(g))[None, :])
        )
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs = _safe_pairs(exploded.groupby("bucket").map_groups(
        emit_pairs, batch_format="pandas"
    ).to_pandas()).drop_duplicates()
    roots = _connected_components(pairs)
    losers = {doc for doc, root in roots.items() if root != doc}

    def keep(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, np.fromiter(losers, dtype=ids.dtype, count=len(losers))) if losers else np.ones(len(ids), bool)
        return tbl.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
