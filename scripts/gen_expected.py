"""Generate golden-expected survivor sets for the probabilistic dedup ops.

INDEPENDENT single-process reference implementations of MinHash+LSH and
SimHash dedup — straightforward per-document loops, no Ray, no shared code
with recipys_ray.ops.dedup beyond the public hash primitive
(pd.util.hash_array) and the published parameters. The distributed pipelines
must reproduce these survivor sets exactly; the driver's DuckDB oracle reads
the emitted parquet (keyed by corpus row count, so one static SQL string
serves every sf directory).

Regenerate after any parameter change:
    python scripts/gen_expected.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "expected")

MERSENNE = (1 << 61) - 1
NUM_PERM, BANDS, SHINGLE_K, SEED = 64, 16, 3, 7
SIMHASH_THR = 3

import re

WORD_RE = re.compile(r"\w+", re.UNICODE)


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        while self.parent.get(x, x) != x:
            self.parent[x] = self.parent.get(self.parent[x], self.parent[x])
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def survivors_from_buckets(doc_ids, bucket_lists) -> np.ndarray:
    """bucket_lists: iterable of lists of doc ids that pairwise merge."""
    uf = UnionFind()
    for members in bucket_lists:
        for m in members[1:]:
            uf.union(members[0], m)
    losers = {d for d in uf.parent if uf.find(d) != d}
    return np.array(sorted(d for d in doc_ids if d not in losers), dtype=np.int64)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ws = WORD_RE.findall(text.lower())
    if len(ws) < SHINGLE_K:
        shingles = [" ".join(ws)]
    else:
        shingles = [" ".join(ws[i : i + SHINGLE_K]) for i in range(len(ws) - SHINGLE_K + 1)]
    h = pd.util.hash_array(np.array(shingles, dtype=object)).astype(np.uint64)
    vals = a[:, None] * h[None, :] + b[:, None]  # uint64 wraparound
    return vals.min(axis=1)


def _minhash_merge_sets(docs: pd.DataFrame) -> list:
    rng = np.random.RandomState(SEED)
    a = rng.randint(1, MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
    r = NUM_PERM // BANDS
    prime = np.uint64(1099511628211)
    buckets: dict = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"].fillna("")):
        sig = minhash_signature(text, a, b)
        for band in range(BANDS):
            mixed = np.uint64(0)
            for j in range(r):
                mixed = mixed * prime + sig[band * r + j]
            key = (band, int(mixed & np.uint64(0x7FFFFFFFFFFFFFFF)))
            buckets.setdefault(key, []).append(int(doc_id))
    return [sorted(v) for v in buckets.values() if len(v) > 1]


def minhash_expected(docs: pd.DataFrame) -> np.ndarray:
    merge_sets = _minhash_merge_sets(docs)
    return survivors_from_buckets(docs["doc_id"].tolist(), merge_sets)


def minhash_clusters_expected(docs: pd.DataFrame) -> pd.DataFrame:
    """Per-doc cluster root (component min id) + size, singletons incl."""
    merge_sets = _minhash_merge_sets(docs)
    uf = UnionFind()
    for members in merge_sets:
        for m in members[1:]:
            uf.union(members[0], m)
    ids = [int(d) for d in docs["doc_id"]]
    roots = {d: uf.find(d) for d in ids}
    sizes: dict = {}
    for d in ids:
        sizes[roots[d]] = sizes.get(roots[d], 0) + 1
    return pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "root": np.array([roots[d] for d in ids], dtype=np.int64),
            "cluster_size": np.array(
                [sizes[roots[d]] for d in ids], dtype=np.int64
            ),
        }
    )


def simhash_value(text: str) -> int:
    ws = WORD_RE.findall(text.lower()) or [""]
    h = pd.util.hash_array(np.array(ws, dtype=object)).astype(np.uint64)
    sim = 0
    for bit in range(64):
        ones = int(((h >> np.uint64(bit)) & np.uint64(1)).sum())
        if ones * 2 > len(ws):
            sim |= 1 << bit
    return sim & 0x7FFFFFFFFFFFFFFF


def simhash_expected(docs: pd.DataFrame) -> np.ndarray:
    sims = {int(d): simhash_value(t) for d, t in zip(docs["doc_id"], docs["text"].fillna(""))}
    buckets: dict = {}
    for doc_id, sim in sims.items():
        for band in range(4):
            key = (band, (sim >> (16 * band)) & 0xFFFF)
            buckets.setdefault(key, []).append(doc_id)
    uf = UnionFind()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if bin(sims[a] ^ sims[b]).count("1") <= SIMHASH_THR:
                    uf.union(a, b)
    losers = {d for d in uf.parent if uf.find(d) != d}
    return np.array(
        sorted(d for d in sims if d not in losers), dtype=np.int64
    )


def ivf_expected(emb_df: pd.DataFrame) -> pd.DataFrame:
    """Sequential IVF reference mirroring q_knn_ivf's parameters: full-data
    centroid fit (shared deterministic _kmeans_fit), union-of-probes
    candidate set, float64 cosine top-k, self-filtered top-3 ranks."""
    sys.path.insert(0, os.path.dirname(OUT_DIR))
    from recipys_ray.ops.similarity import _kmeans_fit, _normalize

    ids = emb_df["vec_id"].to_numpy()
    X = np.stack(emb_df["embedding"].to_numpy()).astype(np.float32)
    C = _kmeans_fit(_normalize(X), n_clusters=8, seed=3)
    Cn = _normalize(np.asarray(C, dtype=np.float64))
    q_mask = ids < 5
    Xq = X[q_mask]
    order_q = np.argsort(ids[q_mask])
    Q = Xq[order_q]
    q_order = ids[q_mask][order_q]
    Qn = _normalize(np.asarray(Q, dtype=np.float64))
    probe = np.argsort(-(
        _normalize(Q.astype(np.float32)) @ _normalize(C).T
    ), axis=1)[:, :3]
    allowed = np.unique(probe)
    Xd = np.asarray(X, dtype=np.float64)
    cell = (_normalize(Xd) @ Cn.T).argmax(axis=1)
    cand = np.isin(cell, allowed)
    sims = _normalize(Xd[cand]) @ Qn.T  # (n_cand, q)
    cand_ids = ids[cand]
    rows = []
    for qi, qid in enumerate(q_order):
        order = np.lexsort((cand_ids, -sims[:, qi]))
        picked = [
            int(cand_ids[j]) for j in order if cand_ids[j] != qid
        ][:3]
        for r, vid in enumerate(picked):
            rows.append((int(qid), vid, r))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"])


def semdedup_expected(emb_df: pd.DataFrame) -> np.ndarray:
    """Sequential SemDeDup reference mirroring q_dedup_semantic's
    parameters: full-data centroid fit (shared deterministic _kmeans_fit,
    canonical lexsort order), float64 nearest-centroid assignment, then a
    plain per-pair greedy keep-first loop inside each cluster (independent
    of the distributed op's blocked scan)."""
    sys.path.insert(0, os.path.dirname(OUT_DIR))
    from recipys_ray.ops.similarity import _kmeans_fit, _normalize

    ids = emb_df["vec_id"].to_numpy()
    X = np.stack(emb_df["embedding"].to_numpy()).astype(np.float32)
    Xs = X[np.lexsort(X.T)]
    C = _kmeans_fit(_normalize(Xs), 8, seed=3)
    Cn = _normalize(np.asarray(C, dtype=np.float64))
    Xd = _normalize(np.asarray(X, dtype=np.float64))
    cell = (Xd @ Cn.T).argmax(axis=1)
    survivors = []
    for c in np.unique(cell):
        mask = cell == c
        mids = ids[mask]
        order = np.argsort(mids)
        mids, E = mids[order], Xd[mask][order]
        kept: list[int] = []
        for i in range(len(mids)):
            dup = False
            for j in kept:
                if float(E[i] @ E[j]) >= 0.3:
                    dup = True
                    break
            if not dup:
                kept.append(i)
                survivors.append(int(mids[i]))
    return np.sort(np.array(survivors, dtype=np.int64))


def knn_impute_expected(events: pd.DataFrame) -> pd.DataFrame:
    """Sequential reference for q_knn_impute: impute valn (NULL where
    event_id %% 7 == 0) as the uniform mean of the 5 nearest rows with valn
    observed under nan-euclidean distance over (value, valn, f3), with
    f3 = ((event_id * 2654435761) %% 1000003) / 1000003. Donor set chosen by
    (distance, donor row) lexicographic order; mean over donor-index-sorted
    values (canonical float summation)."""
    eid = events["event_id"].to_numpy()
    value = events["value"].to_numpy(dtype=np.float64)
    f3 = ((eid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1000003)
          ).astype(np.float64) / 1000003.0
    missing = eid % 7 == 0
    valn = np.where(missing, np.nan, value)
    donors = np.flatnonzero(~missing)
    # canonical donor order (value, valn, f3): the engine sorts its collected
    # donor sample the same way because Ray block collection order is not
    # deterministic — tie-breaks and mean-summation order key off this order
    ck = np.lexsort((f3[donors], valn[donors], value[donors]))
    donors = donors[ck]
    dv, df3 = value[donors], f3[donors]
    out = valn.copy()
    d = 3
    for i in np.flatnonzero(missing):
        # common observed coords = (value, f3); weight d / 2
        ssq = (dv - value[i]) ** 2 + (df3 - f3[i]) ** 2
        dist = np.sqrt(d * ssq / 2.0)
        order = np.argsort(dist, kind="stable")  # ties → lowest canon pos
        sel = np.sort(order[:5])  # positions in canonical donor order
        out[i] = np.mean(valn[donors[sel]])
    return pd.DataFrame({"event_id": eid, "valn": out})


def knn_impute_ivf_expected(events: pd.DataFrame) -> pd.DataFrame:
    """Sequential reference for q_knn_impute_ivf: KNN imputation with the
    IVF-bucketed donor search (64 euclidean k-means cells over mean-filled
    donors — shared deterministic _kmeans_fit, like knn_ivf — 3 probes,
    up-to-5 nearest candidate donors, full-donor retry when a probed cell
    set has no usable donor)."""
    sys.path.insert(0, os.path.dirname(OUT_DIR))
    from recipys_ray.ops.similarity import _kmeans_fit

    eid = events["event_id"].to_numpy()
    value = events["value"].to_numpy(dtype=np.float64)
    f3 = ((eid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1000003)
          ).astype(np.float64) / 1000003.0
    missing = eid % 7 == 0
    valn = np.where(missing, np.nan, value)
    Fq = np.column_stack([value, valn, f3])  # query frame, event order
    # canonical donor order (see knn_impute_expected): the seeded k-means
    # init, probe cells, tie-breaks and mean-summation order all key off it
    F = Fq[np.lexsort((f3, valn, value))]
    d = 3
    fallback = np.nan_to_num(np.nanmean(F, axis=0), nan=0.0)
    Fz = np.where(np.isnan(F), fallback, F)
    C = _kmeans_fit(Fz, 64, seed=3)
    cell = ((Fz[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    donors_obs = ~np.isnan(F[:, 1])

    def impute_row(i, cand):
        dj = cand[donors_obs[cand]]
        if len(dj) == 0:
            return None
        x = Fq[i]
        Fc = F[dj]
        cm = (~np.isnan(x))[None, :] & ~np.isnan(Fc)
        ncom = cm.sum(axis=1)
        ok = ncom > 0
        if not ok.any():
            return None
        dj, Fc, cm, ncom = dj[ok], Fc[ok], cm[ok], ncom[ok]
        diff = np.where(cm, Fc - x[None, :], 0.0)
        dist = np.sqrt(d * (diff * diff).sum(axis=1) / ncom)
        order = np.lexsort((dj, dist))  # ties → lowest canonical position
        sel = np.sort(dj[order[:5]])
        return float(np.mean(F[sel, 1]))

    out = valn.copy()
    all_idx = np.arange(len(F))
    pn = min(3, len(C))
    for i in np.flatnonzero(missing):
        q = np.where(np.isnan(Fq[i]), fallback, Fq[i])
        d2 = ((C - q) ** 2).sum(axis=1)
        probes = np.sort(np.argpartition(d2, pn - 1)[:pn])
        cand = np.flatnonzero(np.isin(cell, probes))
        v = impute_row(i, cand)
        if v is None:
            v = impute_row(i, all_idx)
        out[i] = v if v is not None else fallback[1]
    return pd.DataFrame({"event_id": eid, "valn": out})


def iterative_impute_expected(events: pd.DataFrame) -> pd.DataFrame:
    """Sequential reference for q_iterative_impute: 3 fixed round-robin
    BayesianRidge rounds over (value, valn, f3) — the same published
    evidence-maximization solver as the engine (shared deterministic
    primitive, like _kmeans_fit for knn_ivf), but a plain single-process
    replay loop with one longdouble Gram per fit."""
    sys.path.insert(0, os.path.dirname(OUT_DIR))
    from recipys_ray.transformers import _bayesian_ridge_from_stats

    eid = events["event_id"].to_numpy()
    value = events["value"].to_numpy(dtype=np.float64)
    f3 = ((eid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1000003)
          ).astype(np.float64) / 1000003.0
    missing = eid % 7 == 0
    valn = np.where(missing, np.nan, value)
    M = np.column_stack([value, valn, f3])
    miss = np.isnan(M)
    cnt = (~miss).sum(axis=0).astype(np.float64)
    means = np.asarray(
        np.where(miss, 0.0, M).astype(np.longdouble).sum(axis=0), np.float64
    ) / cnt
    X = M.copy()
    for j in range(3):
        X[miss[:, j], j] = means[j]
    for _ in range(3):
        for j in [1]:  # only valn has missing values
            obs = ~miss[:, j]
            others = [0, 2]
            Xo = X[np.ix_(obs, others)].astype(np.longdouble)
            yo = X[obs, j].astype(np.longdouble)
            stats = (
                float(len(yo)),
                np.asarray(Xo.sum(axis=0), np.float64),
                float(yo.sum()),
                np.asarray(Xo.T @ Xo, np.float64),
                np.asarray(Xo.T @ yo, np.float64),
                float(yo @ yo),
            )
            coef, b = _bayesian_ridge_from_stats(*stats)
            pred = X[:, others] @ coef + b
            X[miss[:, j], j] = pred[miss[:, j]]
    return pd.DataFrame({"event_id": eid, "valn": X[:, 1]})


def pca_expected(emb: pd.DataFrame, k: int = 4,
                 bits: int = 16) -> pd.DataFrame:
    """Sequential PCA implementing the op's bit-determinism contract
    (ops/pca.py module docstring): int64-quantized sufficient statistics
    (exact — so partitioning cannot matter), covariance from exact-int
    doubles, numpy eigh, max-|loading|-positive sign convention, and the
    FIXED ascending-j projection contraction."""
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    scale = float(1 << bits)
    q = np.rint(mat * scale).astype(np.int64)
    n, d = q.shape
    nf = float(n)
    S = q.sum(axis=0)
    G = (q.T @ q).astype(np.float64)
    Sf = S.astype(np.float64)
    mu = Sf / nf
    cov = (G - np.outer(Sf, Sf) / nf) / (nf - 1.0)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :k].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    z = np.zeros((n, k), dtype=np.float64)
    a = q.astype(np.float64)
    for j in range(d):
        z += (a[:, j] - mu[j])[:, None] * comps[:, j][None, :]
    z = z / scale
    out = pd.DataFrame({"vec_id": emb["vec_id"].to_numpy(np.int64)})
    for i in range(k):
        out[f"pc{i}"] = z[:, i]
    return out


def hll_expected(ev: pd.DataFrame, p: int = 12) -> pd.DataFrame:
    """Sequential per-group HyperLogLog over (event_type, user_id) with a
    DENSE register array (vs the op's sparse groupby-max merge). Shares
    only pd.util.hash_array and the published HLL formulae with
    ops/distinct.py. Determinism contract with the op: registers summed in
    ascending-register order, estimate expression evaluated in the same
    operation order — bit-equal float64 estimates."""
    m = 1 << p
    shift = np.uint64(64 - p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rows = []
    for et, grp in ev.groupby("event_type", sort=True):
        h = pd.util.hash_array(grp["user_id"].to_numpy()).astype(np.uint64)
        reg = (h >> shift).astype(np.int64)
        w = h << np.uint64(p)
        # exact leading-zero count via int bit_length (float log2 is
        # fragile at 2^63 boundaries)
        rho = np.array(
            [64 - int(x).bit_length() + 1 if x > 0 else 64 - p + 1
             for x in w],
            np.int64,
        )
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, reg, rho)
        present = np.nonzero(regs)[0]  # ascending register order
        inv_sum = float(np.sum(np.exp2(-regs[present].astype(np.float64))))
        zeros = float(m - len(present))
        denom = inv_sum + zeros
        E = alpha * m * m / denom
        if E <= 2.5 * m and zeros > 0:
            E = m * np.log(m / zeros)
        rows.append((et, float(E)))
    return pd.DataFrame(rows, columns=["event_type", "n_distinct_approx"])


def compression_expected(docs: pd.DataFrame, level: int = 6) -> pd.DataFrame:
    """Sequential zlib compression-ratio reference (ops/text.
    compression_ratio): per-doc UTF-8 byte length, compressed length at
    the fixed level, and the single-division ratio (NULL for empty)."""
    import zlib

    ids = docs["doc_id"].to_numpy()
    nb = np.empty(len(docs), dtype=np.int64)
    nc = np.empty(len(docs), dtype=np.int64)
    for i, t in enumerate(docs["text"].fillna("")):
        raw = t.encode("utf-8")
        nb[i] = len(raw)
        nc[i] = len(zlib.compress(raw, level))
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = nc.astype(np.float64) / nb.astype(np.float64)
    out = pd.DataFrame({
        "doc_id": ids, "n_bytes": nb, "n_comp": nc, "comp_ratio": ratio,
    })
    out.loc[nb == 0, "comp_ratio"] = np.nan
    return out


def bpe_expected(docs: pd.DataFrame, k: int = 30) -> pd.DataFrame:
    """Sequential BPE merge-rule reference (ops/text.bpe_merges):
    Sennrich-2016 learn_bpe over the exact \\w+ lowercase word counts —
    pure-python Counters and per-word scans, no shared code with the
    distributed op. Pair occurrences count WITH overlap; merges rewrite
    left-to-right non-overlapping; ties break (count desc, lhs asc,
    rhs asc)."""
    import re
    from collections import Counter

    wc: Counter = Counter()
    for t in docs["text"].fillna(""):
        wc.update(re.findall(r"\w+", t.lower()))
    symbols = {w: list(w) for w in wc}
    rules = []
    for rank in range(k):
        pairs: Counter = Counter()
        for w, cnt in wc.items():
            s = symbols[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        (lhs, rhs), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, lhs, rhs, c))
        merged = lhs + rhs
        for w, s in symbols.items():
            out, i = [], 0
            changed = False
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(s[i])
                    i += 1
            if changed:
                symbols[w] = out
    return pd.DataFrame({
        "rank": pd.Series([r[0] for r in rules], dtype=np.int64),
        "lhs": [r[1] for r in rules],
        "rhs": [r[2] for r in rules],
        "pair_count": pd.Series([r[3] for r in rules], dtype=np.int64),
    })


def bpe_encode_expected(docs: pd.DataFrame, k: int = 30) -> pd.DataFrame:
    """Sequential BPE tokenization reference (ops/text.bpe_encode):
    train the first k merges via bpe_expected, then encode every
    document word-by-word applying the rules in rank order. Emits
    per-doc word and token counts."""
    import re

    rules = bpe_expected(docs, k)
    rule_list = list(zip(rules["lhs"], rules["rhs"]))
    ids, n_words, n_tokens = [], [], []
    memo: dict = {}
    for did, t in zip(docs["doc_id"], docs["text"].fillna("")):
        words = re.findall(r"\w+", t.lower())
        total = 0
        for w in words:
            if w not in memo:
                s = list(w)
                for lhs, rhs in rule_list:
                    out, i = [], 0
                    while i < len(s):
                        if (i + 1 < len(s) and s[i] == lhs
                                and s[i + 1] == rhs):
                            out.append(lhs + rhs)
                            i += 2
                        else:
                            out.append(s[i])
                            i += 1
                    s = out
                memo[w] = len(s)
            total += memo[w]
        ids.append(did)
        n_words.append(len(words))
        n_tokens.append(total)
    return pd.DataFrame({
        "doc_id": np.asarray(ids, np.int64),
        "n_words": np.asarray(n_words, np.int64),
        "n_tokens": np.asarray(n_tokens, np.int64),
    })


def main():
    np.seterr(over="ignore")  # uint64 wraparound is the hash arithmetic
    os.makedirs(OUT_DIR, exist_ok=True)
    for sf_dir in SF_DIRS:
        emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        key = f"{len(emb)}_{int(emb['label'].sum())}"
        out = ivf_expected(emb)
        out["corpus_key"] = key
        path = os.path.join(OUT_DIR, f"knn_ivf_{key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows")
        surv = semdedup_expected(emb)
        out = pd.DataFrame({"vec_id": surv})
        out["corpus_key"] = key
        path = os.path.join(OUT_DIR, f"dedup_semantic_{key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(surv)}/{len(emb)} survivors")
        out = pca_expected(emb)
        out["corpus_key"] = key
        path = os.path.join(OUT_DIR, f"pca_{key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows")
    for sf_dir in SF_DIRS:
        ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
        key = f"{len(ev)}_{int(ev['user_id'].sum())}"
        out = knn_impute_expected(ev)
        out["corpus_key"] = key
        path = os.path.join(OUT_DIR, f"knn_impute_{key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows")
        out = iterative_impute_expected(ev)
        out["corpus_key"] = key
        path = os.path.join(OUT_DIR, f"iterative_impute_{key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows")
        out = knn_impute_ivf_expected(ev)
        out["corpus_key"] = key
        path = os.path.join(OUT_DIR, f"knn_impute_ivf_{key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows")
        out = hll_expected(ev)
        out["corpus_key"] = key
        path = os.path.join(OUT_DIR, f"distinct_hll_{key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows")
    for sf_dir in SF_DIRS:
        docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        n = len(docs)
        # corpus key distinguishable in SQL from the registered view alone
        # (count alone collides: sf0.001 and sf0.01 both have 500 docs)
        corpus_key = f"{n}_{int(docs['n_chars'].sum())}"
        for name, fn in [("dedup_minhash", minhash_expected), ("dedup_simhash", simhash_expected)]:
            surv = fn(docs)
            out = pd.DataFrame({"doc_id": surv})
            out["corpus_key"] = corpus_key
            path = os.path.join(OUT_DIR, f"{name}_{corpus_key}.parquet")
            out.to_parquet(path, index=False)
            print(f"{path}: {len(surv)}/{n} survivors")
        out = minhash_clusters_expected(docs)
        out["corpus_key"] = corpus_key
        path = os.path.join(OUT_DIR, f"dup_clusters_{corpus_key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows, "
              f"{(out['root'] != out['doc_id']).sum()} non-roots")
        out = compression_expected(docs)
        out["corpus_key"] = corpus_key
        path = os.path.join(OUT_DIR, f"compress_ratio_{corpus_key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} rows")
        out = bpe_expected(docs)
        out["corpus_key"] = corpus_key
        path = os.path.join(OUT_DIR, f"bpe_merges_{corpus_key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} merge rules")
        out = bpe_encode_expected(docs)
        out["corpus_key"] = corpus_key
        path = os.path.join(OUT_DIR, f"bpe_encode_{corpus_key}.parquet")
        out.to_parquet(path, index=False)
        print(f"{path}: {len(out)} encoded docs")



if __name__ == "__main__":
    sys.exit(main())
