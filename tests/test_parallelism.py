"""Parallelism-invariance: identical results at different partition counts
(the in-sandbox stand-in for cluster-size invariance, SURVEY.md §5c)."""

import pandas as pd
import ray.data as rd

from recipys_ray.pipelines.transcripts import flagship_recipe, make_transcripts


def run_flagship(partitions: int) -> pd.DataFrame:
    tbl = make_transcripts(n_turns=3000, seed=11)
    rec = flagship_recipe(rd.from_arrow(tbl), partitions=partitions)
    out = rec.prep().to_pandas()
    return out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def test_partition_count_invariance():
    a = run_flagship(1)
    b = run_flagship(8)
    pd.testing.assert_frame_equal(a, b)


def test_repeated_runs_deterministic():
    a = run_flagship(4)
    b = run_flagship(4)
    pd.testing.assert_frame_equal(a, b)


def test_raw_shuffle_equals_sort_shuffle():
    """The raw two-phase hash shuffle and Ray's sort-based path must give
    identical results."""
    import functools

    import ray.data as rd

    import recipys_ray.kernels.grouped as G
    import recipys_ray.recipe as R

    tbl = make_transcripts(n_turns=2500, seed=17, mega_conv_turns=600)
    orig = R.run_grouped_chain
    try:
        outs = {}
        for mode in ("sort", "raw"):
            R.run_grouped_chain = functools.partial(
                G.run_grouped_chain, shuffle=mode
            )
            rec = flagship_recipe(rd.from_arrow(tbl), partitions=4)
            outs[mode] = (
                rec.prep()
                .to_pandas()
                .sort_values(["conv_id", "turn_idx"], kind="stable")
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs["sort"], outs["raw"])
    finally:
        R.run_grouped_chain = orig


def test_pack_sequences_partition_invariance():
    """Global offset-quantized packing must not depend on partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from recipys_ray.ops.packing import pack_sequences

    rng = np.random.RandomState(2)
    pdf = pd.DataFrame(
        {"doc_id": np.arange(2000), "tokens": rng.randint(1, 500, 2000)}
    )

    def run(parts):
        ds = rd.from_pandas(pdf).repartition(parts)
        return (
            pack_sequences(ds, "tokens", budget=1000, sort_cols=["doc_id"],
                           num_partitions=max(parts, 2))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    a, b = run(1), run(16)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_jaccard_partition_invariance():
    import ray.data as rd

    from recipys_ray.ops.jaccard import jaccard_dedup

    from .test_ops import docs_with_dups

    ds = rd.from_pandas(docs_with_dups())
    a = jaccard_dedup(ds, threshold=0.6, num_partitions=4).to_pandas()
    b = jaccard_dedup(ds, threshold=0.6, num_partitions=64).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
