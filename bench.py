"""Benchmark harness.

Headline metric: wall-seconds for the flagship feature-bake pipeline
(ffill → historical min/max/mean/count → lag → sessionize → scale — one
grouped shuffle + one fit pass) over a ~2M-turn synthetic transcript table
(FIXTURES.md F2), consumed via write_parquet (streaming, no driver
materialization). Also times the driver-contract query families over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling`` runs the flagship job twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughputs plus
scaling efficiency (the two-cluster-size criterion evidenced at two
parallelism levels per the driver instruction).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "2000000"))
TRANSCRIPTS = f"/tmp/bench_transcripts_{BENCH_TURNS}.parquet"


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _box_cpu_seconds() -> float:
    """Whole-box CPU seconds (user+nice+system across all cores) from
    /proc/stat — captures Ray worker processes the driver's own rusage
    misses, and exposes external noise (cpu-sec ≫ expected ⇒ busy box)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return sum(int(x) for x in parts[1:4]) / os.sysconf("SC_CLK_TCK")


def bench_flagship() -> dict:
    import ray.data as rd

    from recipys_ray.pipelines.transcripts import flagship_recipe, write_transcripts

    write_transcripts(TRANSCRIPTS, n_turns=BENCH_TURNS, seed=42,
                      mega_conv_turns=20_000)
    # row count from parquet metadata + warm the page cache (untimed)
    n = rd.read_parquet(TRANSCRIPTS).count()

    # best + median of N timed runs (single numbers on this VM are noise;
    # best-of-N tracks the capability, median-of-N the repeatability) with
    # explicit del + gc between runs so the previous run's pinned
    # object-store data is freed before the next one starts
    import gc
    import statistics

    runs = []
    cpu_secs = []
    out_dir = "/tmp/bench_flagship_out"
    for _ in range(4):
        shutil.rmtree(out_dir, ignore_errors=True)
        c0 = _box_cpu_seconds()
        t0 = time.time()
        ds = rd.read_parquet(TRANSCRIPTS)
        rec = flagship_recipe(ds)
        out = rec.prep()
        out.write_parquet(out_dir)
        runs.append(time.time() - t0)
        cpu_secs.append(_box_cpu_seconds() - c0)
        del out, rec, ds
        gc.collect()
    best = min(runs)
    return {
        "sec": best,
        "sec_median": statistics.median(runs),
        "sec_runs": [round(r, 3) for r in runs],
        "cpu_sec_median": round(statistics.median(cpu_secs), 1),
        "turns": n,
        "turns_per_sec": n / best,
    }


def bench_queries() -> dict:
    from recipys_ray.pipelines.driver_queries import QUERIES

    picks = [
        "impute_ffill",
        "historical",
        "rolling",
        "asof_purchase",
        "hist_lineitem",
        "lag_lead",
        "sessionize",
        "scale_standard",
        "resample_agg_1h",
        "resample_grid_1h",
        "dedup_exact",
        "dedup_minhash",
        "dedup_jaccard",
        "text_stats",
        "knn_cosine",
        "power_yj",
        "pack_sequences",
        "iterative_impute",
        "decontaminate",
        "repetition_stats",
        "hash_split",
        "mix_sources",
        "dedup_semantic",
        "tfidf_top3",
        "curate_corpus",
        "exact_quantiles",
        "top_docs_per_source",
        "join_orders_customer",
        "join_lineitem_orders",
        "semi_join_orders",
        "lm_score",
        "dedup_simhash",
        "langid_quality",
        "global_rank",
        "duplicate_spans",
        "chunk_documents",
        "redact_pii",
        "funnel",
        "cohort_retention",
        "session_stats",
        "range_join_clicks",
        "window_click_stats",
        "ntile",
        "group_quantiles",
        "pivot_event_counts",
        "melt_lineitem",
        "event_paths",
        "weighted_sample",
        "frequent_tokens",
        "cume_dist",
        "winsorize",
        "robust_outliers",
        "rollup_doc_stats",
        "distinct_users_hll",
        "mode_event",
        "event_entropy",
        "grouped_corr",
        "value_ranks",
        "merge_intervals",
        "event_transitions",
        "pmi_bigrams",
        "pca_embeddings",
        "target_encode",
        "grouped_regr",
        "grouped_moments",
        "histogram_values",
        "quantile_cont",
        "revenue_by_nation",
        "rfm_segments",
        "dedup_levenshtein",
        "psi_value_drift",
        "ks_quantity_flag",
        "cumulative_distinct",
        "grouped_auc",
        "feature_hash",
        "grouped_robust",
        "dedup_jaro_winkler",
        "dedup_sorted_neighborhood",
        "time_split",
        "cms_counts",
        "interarrival",
        "decayed_sum",
        "segment_psi",
        "connected_components",
        "calendar_features",
        "impute_linear",
        "k_anonymity",
        "l_diversity",
        "left_join_customer_orders",
        "asof_next_purchase",
        "mix_temperature",
        "feature_bake",
        "gopher_filter",
        "grouped_zscore",
        "dup_clusters",
        "outer_join_counts",
        "kbins_quantile",
        "scd2_intervals",
        "budget_prefix",
        "grouped_winsorize",
        "remove_boilerplate",
        "doc_term_counts",
        "welch_ttest",
        "prior_mean",
        "argmax_doc",
        "pattern_counts",
        "debounce",
        "group_share",
        "seq_index",
        "source_vocab_sim",
        "compress_ratio",
        "balanced_sample",
        "grouped_histogram",
        "top_tokens_per_source",
        "quality_checks",
        "asof_nearest",
        "negative_samples",
        "windowed_distinct",
        "rolling_corr",
        "null_patterns",
        # sixth-session op families
        "segment_dedup",
        "budget_sample",
        "stratified_split",
        "pagerank",
        "fuzzy_link",
        "quantile_normalize",
        "gini_spend",
        "weighted_median",
        "twap",
        "pit_state",
        "readability",
        "historical_salted",
        # seventh-session op families
        "theil_sen",
        "triangle_parts",
        "bpe_merges",
        "bpe_encode",
        "association_rules",
        "grouped_ols2",
        "peak_concurrency",
        "transition_latency",
        "max_drawdown",
        "spearman",
        "last_value_pct",
        "burst_counts",
        "collapse_rare",
        "longest_streak",
        "funnel_latency",
        "user_features",
        "corr_matrix",
        "nzv_report",
        "oversample",
        "churn_labels",
        "simpson_diversity",
        "rate_ci",
        "cube_doc_stats",
        "top_share",
    ]
    import gc

    out = {}
    for name in picks:
        t0 = time.time()
        res = QUERIES[name](SF_DIR)
        # consume lazily-built datasets without driver materialization
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
        # free this query's pinned/materialized blocks NOW — otherwise
        # object-store refs pile up across the 70+ queries and later ones
        # run against a degraded session (measured 3-7x inflation by the
        # end of the list)
        del res
        gc.collect()
    return out


def run_once() -> dict:
    _init_ray()
    flag = bench_flagship()
    queries = (
        {} if os.environ.get("BENCH_SKIP_QUERIES") else bench_queries()
    )
    import ray

    ray.shutdown()
    return {
        "metric": "flagship feature-bake wall sec (2M-turn transcripts)",
        "value": round(flag["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": flag["turns"],
        "turns_per_sec": round(flag["turns_per_sec"], 1),
        "value_median": round(flag["sec_median"], 3),
        "value_runs": flag["sec_runs"],
        "cpu_sec_median": flag["cpu_sec_median"],
    }


def run_scaling():
    def run(ncpu: int) -> dict:
        # larger input for the scaling pair so fixed overheads (executor
        # startup, plan, materialize) don't mask the compute scaling
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_TURNS=os.environ.get("SCALING_TURNS", "8000000"),
            BENCH_SKIP_QUERIES="1",  # flagship only — clean scaling signal
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = (
        int(x) for x in os.environ.get("SCALING_CPUS", "8,32").split(",")
    )
    # hi first, then a settle pause so the second child doesn't race the
    # first one's object-store teardown (measured to skew results)
    r_hi = run(hi)
    time.sleep(15)
    r_lo = run(lo)
    tp_lo, tp_hi = r_lo["turns_per_sec"], r_hi["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency (num_cpus {lo} → {hi}, same input)",
                f"turns_per_sec_{lo}": tp_lo,
                f"turns_per_sec_{hi}": tp_hi,
                f"sec_{lo}": r_lo["value"],
                f"sec_{hi}": r_hi["value"],
                # whole-box cpu-seconds per child (median over its runs):
                # flat cpu_sec across cpu counts ⇒ the work is constant and
                # wall differences are scheduling/bandwidth, not extra work
                f"cpu_sec_{lo}": r_lo.get("cpu_sec_median"),
                f"cpu_sec_{hi}": r_hi.get("cpu_sec_median"),
                f"runs_{lo}": r_lo.get("value_runs"),
                f"runs_{hi}": r_hi.get("value_runs"),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_once()))
