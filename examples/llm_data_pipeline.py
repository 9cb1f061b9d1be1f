"""A training-data curation run, end-to-end on recipys_ray.

Reads a raw document corpus, runs the curation chain (normalize → length
filter → exact dedup → benchmark decontamination → train/val/test split),
applies the Gopher quality rules, rebalances the source mixture with
sqrt-temperature sampling, enriches the training split with
quality/language features and TF-IDF keywords, near-dedups it with
MinHash, and writes resumable partitioned parquet. Every stage is a lazy Ray Data transform: nothing materializes on
the driver, the plan streams block-by-block with backpressure, and each op
is individually contract-verified against a DuckDB or golden oracle
(COVERAGE.md).

Run:  python examples/llm_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str = "/tmp/llm_pipeline_out"):
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():  # scripts own the session, the library not
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    from recipys_ray.ops.dedup import minhash_dedup
    from recipys_ray.ops.text import text_features, tfidf_top_terms
    from recipys_ray.pipelines.curation import curate_corpus

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # 0. data-quality gate: fail fast BEFORE any expensive pass if the
    #    ingest is malformed (exact integer report, one streaming pass)
    from recipys_ray.ops.quality import quality_checks

    report = quality_checks(docs, [
        {"name": "doc_id_unique", "kind": "unique", "col": "doc_id"},
        {"name": "text_not_null", "kind": "not_null", "col": "text"},
    ])
    bad = int(report["n_violations"].sum())
    if bad:
        raise SystemExit(f"quality gate failed:\n{report}")

    # 1. curation: one shuffle, full SQL-oracled composition
    splits = curate_corpus(docs)

    # 2. keep the train split; join the payload back by doc_id broadcast
    #    (the split table is skinny — ids + labels)
    train_ids = set(
        r["doc_id"]
        for r in splits.filter(lambda r: r["split"] == "train").take_all()
    )

    def pick_train(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        import numpy as np

        mask = np.isin(ids, np.fromiter(train_ids, dtype=np.int64))
        return tbl.filter(pa.array(mask))

    train = docs.map_batches(pick_train, batch_format="pyarrow")

    # 3a. Gopher quality rules (integer-exact thresholds), then rebalance
    #     the source mixture toward rare sources (n^0.5 temperature) —
    #     both zero-shuffle stamps/filters
    from recipys_ray.ops.sampling import mix_temperature
    from recipys_ray.ops.text import gopher_quality_filter

    with_source = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    train = gopher_quality_filter(train, min_words=10, min_mwl=3)
    # re-attach source for the mixture step (skinny broadcast join)
    from recipys_ray.ops.join import hash_join

    train = hash_join(
        train.select_columns(["doc_id", "text"]), with_source,
        on="doc_id", strategy="broadcast",
    )
    # half-corpus token budget, per-source shares ∝ sqrt(n) — rare
    # sources keep proportionally more
    train = mix_temperature(train, "source", "doc_id", alpha=0.5)

    # 3b. near-dedup (MinHash+LSH), boilerplate strip, then enrichment
    train = minhash_dedup(train, text_col="text", id_col="doc_id")
    # CCNet-style frequent-unit removal: Misra-Gries discovery bounds the
    # broadcast stop set; the clean pass is pure Arrow kernels
    from recipys_ray.ops.text import (
        compression_ratio,
        remove_boilerplate_tokens,
    )

    train = remove_boilerplate_tokens(train, min_fraction=0.05)
    # compressibility quality signal rides along as a column
    train = compression_ratio(train)
    enriched = text_features(train, text_col="text")
    keywords = tfidf_top_terms(train, vocab_size=500, top_n=3)

    # 4. unigram-LM quality scoring (CCNet-style perplexity filter):
    #    fit vocab + total count on the deduped train split, broadcast,
    #    score shuffle-free — filter downstream on oov_rate / perplexity
    from recipys_ray.ops.text import bpe_encode, bpe_merges, unigram_lm_score

    scored = unigram_lm_score(train, text_col="text", top_k=500)

    # 4b. token-budget accounting: learn the corpus's own BPE merges
    #     (one corpus pass — the vocab combiner) and count tokens per doc
    #     with the broadcast rule table + memoized actor encode
    rules = bpe_merges(train, "text", k=30)
    token_counts = bpe_encode(train, rules, "text", "doc_id")

    # 5. resumable partitioned sinks
    enriched.write_parquet(f"{out_dir}/train_features")
    keywords.write_parquet(f"{out_dir}/train_keywords")
    scored.write_parquet(f"{out_dir}/train_lm_scores")
    token_counts.write_parquet(f"{out_dir}/train_token_counts")
    n = enriched.count()
    print({"train_docs": n, "out": out_dir})
    return n


if __name__ == "__main__":
    main(*sys.argv[1:])
