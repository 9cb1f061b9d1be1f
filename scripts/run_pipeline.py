"""Production runner for the flagship feature-bake pipeline — the
`ray job submit` entry point with resumable, manifest-tracked output.

    ray job submit -- python scripts/run_pipeline.py \
        --input /path/to/transcripts_parquet_dir \
        --output /path/to/out \
        --buckets 256 --salt-threshold 2000000

Re-running the same command after a failure skips every bucket whose
lineage manifest exists and recomputes only the missing ones
(recipys_ray.io.write_resumable). Standalone invocation initialises a local
Ray session; under `ray job submit` it attaches to the cluster.
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--salt-threshold", type=int, default=None,
                    help="rows per group above which salted sub-partitioning kicks in")
    ap.add_argument("--salt-chunk-span", type=int, default=250_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local" if args.num_cpus else None,
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from recipys_ray.io import write_resumable
    from recipys_ray.kernels.salted import SaltConfig
    from recipys_ray.pipelines.transcripts import flagship_recipe

    salt = (
        SaltConfig(args.salt_threshold, args.salt_chunk_span)
        if args.salt_threshold
        else None
    )

    def pipeline(ds):
        rec = flagship_recipe(ds)
        rec.salt = salt
        return rec.prep()

    input_ds = rd.read_parquet(args.input)
    summary = write_resumable(
        pipeline,
        input_ds,
        args.output,
        key_cols=["conv_id"],
        num_buckets=args.buckets,
        metrics_cols=["latency_s", "score"],
    )
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
