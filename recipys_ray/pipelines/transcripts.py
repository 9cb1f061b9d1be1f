"""Deterministic synthetic multi-turn transcript table (FIXTURES.md F2).

Schema per BASELINE.json input_hint: conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us] + derived numeric
predictors n_chars:int64, latency_s:double (nulls), score:double (nulls).

Fully vectorized numpy generation, seeded — identical bytes across runs and
parallelism levels. Conversation lengths are lognormal with a heavy tail
plus forced mega-conversations; ts gaps include session-threshold-crossing
gaps and duplicate timestamps; the file row order is shuffled so engines
must sort by (conv_id, turn_idx, ts) themselves.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "code", "browse", None], dtype=object)


def make_transcripts(
    n_turns: int = 10_000,
    seed: int = 42,
    mega_conv_turns: int = 0,
    session_gap_s: float = 1800.0,
) -> pa.Table:
    rng = np.random.RandomState(seed)
    # conversation lengths: lognormal, clipped
    lengths = []
    total = 0
    while total < n_turns:
        batch = np.clip(
            rng.lognormal(mean=2.2, sigma=1.0, size=1024).astype(np.int64), 2, 400
        )
        lengths.append(batch)
        total += int(batch.sum())
    lengths = np.concatenate(lengths)
    cum = np.cumsum(lengths)
    n_convs = int(np.searchsorted(cum, n_turns) + 1)
    lengths = lengths[:n_convs]
    if mega_conv_turns:
        lengths = np.r_[lengths, [mega_conv_turns, mega_conv_turns]]
        n_convs += 2
    n = int(lengths.sum())

    conv_ids = np.repeat(
        np.array([f"c{i:08d}" for i in range(n_convs)], dtype=object), lengths
    )
    starts = np.r_[0, np.cumsum(lengths)[:-1]]
    turn_idx = (np.arange(n) - np.repeat(starts, lengths)).astype(np.int32)

    role = ROLES[(turn_idx + rng.randint(0, 3, size=n)) % 3]
    tool = TOOLS[rng.choice(4, size=n, p=[0.1, 0.1, 0.1, 0.7])]

    # deterministic token soup keyed on (conv index, turn_idx)
    conv_no = np.repeat(np.arange(n_convs), lengths)
    h = (conv_no.astype(np.int64) * 1_000_003 + turn_idx * 7919) % 99_991
    reps = (h % 7 + 1).astype(np.int64)
    base = np.char.add(np.char.add("tok", h.astype("U6")), " ")
    text = np.char.multiply(base, reps)
    text = np.char.add(text, np.char.add("end", turn_idx.astype("U6")))

    # timestamps: per-conv start + cumulative gaps; ~3% gaps cross the
    # session threshold; ~2% duplicate-ts pairs
    conv_start = rng.randint(0, 30 * 86400, size=n_convs).astype(np.int64) * 1_000_000
    gaps_s = rng.exponential(scale=60.0, size=n)
    big = rng.random(n) < 0.03
    gaps_s[big] += session_gap_s * (1.5 + rng.random(big.sum()) * 3)
    dup = rng.random(n) < 0.02
    gaps_s[dup] = 0.0
    gaps_us = (gaps_s * 1_000_000).astype(np.int64)
    gaps_us[turn_idx == 0] = 0
    ts = np.repeat(conv_start, lengths) + _segmented_cumsum(gaps_us, starts, lengths)

    n_chars = np.char.str_len(text.astype("U")).astype(np.int64)
    latency = np.round(rng.exponential(scale=2.0, size=n), 4)
    latency[rng.random(n) < 0.25] = np.nan
    score = np.round(rng.normal(loc=0.5, scale=0.2, size=n), 6)
    score[rng.random(n) < 0.35] = np.nan

    # shuffle file layout so engines must sort
    perm = rng.permutation(n)
    tbl = pa.table(
        {
            "conv_id": pa.array(conv_ids[perm]),
            "turn_idx": pa.array(turn_idx[perm], pa.int32()),
            "role": pa.array(role[perm].astype(object)),
            "text": pa.array(text[perm].astype(object)),
            "tool": pa.array(tool[perm]),
            "ts": pa.array(ts[perm], pa.timestamp("us")),
            "n_chars": pa.array(n_chars[perm], pa.int64()),
            "latency_s": pa.array(latency[perm], from_pandas=True),
            "score": pa.array(score[perm], from_pandas=True),
        }
    )
    return tbl


def _segmented_cumsum(x: np.ndarray, starts: np.ndarray, lengths: np.ndarray):
    c = np.cumsum(x)
    offsets = np.repeat(c[starts] - x[starts], lengths)
    return c - offsets


def write_transcripts(
    path: str,
    n_turns: int = 10_000,
    seed: int = 42,
    mega_conv_turns: int = 0,
    row_group_size: int = 200_000,
    n_shards: int = 16,
) -> str:
    """Write (cached) transcript parquet as a sharded directory (parallel
    reads — a single giant file reads in ONE task); returns the path."""
    if os.path.exists(path):
        return path
    tbl = make_transcripts(n_turns, seed, mega_conv_turns)
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = len(tbl)
    per = -(-n // n_shards)
    for i in range(n_shards):
        shard = tbl.slice(i * per, per)
        if len(shard):
            pq.write_table(
                shard, f"{tmp}/part-{i:04d}.parquet",
                row_group_size=row_group_size,
            )
    os.replace(tmp, path)
    return path


def flagship_recipe(ds, partitions=None):
    """The flagship feature-bake pipeline over a transcript Dataset:
    ffill-impute → historical min/max/mean/count → lag → sessionize → scale.
    One grouped shuffle + one fit pass by construction."""
    from recipys_ray import (
        Accumulator,
        Recipe,
        StepHistorical,
        StepImputeFill,
        StepLag,
        StepScale,
        StepSessionize,
    )
    from recipys_ray.selector import all_of

    rec = Recipe(
        ds,
        predictors=["n_chars", "latency_s", "score"],
        groups=["conv_id"],
        sequences=["turn_idx", "ts"],
        partitions=partitions,
    )
    rec.add_step(StepImputeFill(sel=all_of(["latency_s", "score"]), strategy="forward"))
    rec.add_step(StepHistorical(sel=all_of(["n_chars", "latency_s"]), fun=Accumulator.MIN))
    rec.add_step(StepHistorical(sel=all_of(["n_chars", "latency_s"]), fun=Accumulator.MAX))
    rec.add_step(StepHistorical(sel=all_of(["n_chars", "score"]), fun=Accumulator.MEAN))
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.COUNT))
    rec.add_step(StepLag(sel=all_of(["n_chars"]), shifts=[1]))
    rec.add_step(StepSessionize(gap="30m"))
    rec.add_step(
        StepScale(sel=all_of(["n_chars", "latency_s", "score"]))
    )
    return rec
