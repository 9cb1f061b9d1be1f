"""Training-data ops for large-scale curation pipelines — convenience
re-exports of every public operator (each lives in its own module; see
COVERAGE.md for the op → test → driver-query map)."""

from recipys_ray.ops.asof import asof_join
from recipys_ray.ops.rangejoin import range_agg, range_join
from recipys_ray.ops.chunking import chunk_documents, chunk_sentences
from recipys_ray.ops.decontaminate import benchmark_gram_set, decontaminate
from recipys_ray.ops.calendar import calendar_features
from recipys_ray.ops.privacy import k_anonymize
from recipys_ray.ops.dedup import (
    cluster_labels,
    connected_components,
    dedup_against,
    embedding_dedup,
    embedding_dedup_exact,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_dedup,
    ngram_jaccard,
    simhash_dedup,
    verify_pairs_jaccard,
)
from recipys_ray.ops.distinct import (
    distinct_per_group,
    distinct_per_group_approx,
)
from recipys_ray.ops.segdedup import segment_dedup
from recipys_ray.ops.graph import pagerank
from recipys_ray.ops.jaccard import (
    containment_dedup,
    fuzzy_decontaminate,
    jaccard_dedup,
    overlap_dedup,
)
from recipys_ray.ops.join import hash_join, skew_join
from recipys_ray.ops.cohort import cohort_retention
from recipys_ray.ops.funnel import funnel
from recipys_ray.ops.jsonfields import extract_json_int
from recipys_ray.ops.multimodal import (
    ByteHistogramFeatures,
    DecodeImage,
    DecodeWav,
    SampleFrames,
    decode_images,
    read_webdataset,
)
from recipys_ray.ops.packing import pack_sequences
from recipys_ray.ops.profile import benford_counts, null_patterns, profile
from recipys_ray.ops.quantiles import (
    exact_quantiles,
    exact_quantiles_cont,
    group_quantiles,
    histogram,
    kbins_quantile_exact,
    quantile_normalize,
    grouped_histogram,
    grouped_robust_zscore,
    grouped_winsorize,
    robust_zscore,
    winsorize,
)
from recipys_ray.ops.rank import add_global_rank, add_ntile, value_ranks
from recipys_ray.ops.intervals import merge_intervals, scd2_intervals
from recipys_ray.ops.pca import fit_pca, pca_project
from recipys_ray.ops.drift import (
    chi_square,
    ks_statistic,
    population_stability,
    segment_psi,
)
from recipys_ray.ops.editdist import (
    banded_levenshtein,
    dedup_jaro_winkler,
    dedup_levenshtein,
    fuzzy_link,
    pairwise_jaro_winkler,
    sorted_neighborhood_dedup,
)
from recipys_ray.ops.encode import feature_hash, target_encode
from recipys_ray.ops.groupstats import (
    cooccurrence_counts,
    cumulative_distinct,
    decayed_sum,
    expanding_mean_exclusive,
    group_seq_index,
    group_share,
    grouped_argmax,
    grouped_auc,
    grouped_bitops,
    grouped_gini,
    two_proportion_ztest,
    grouped_corr,
    grouped_entropy,
    grouped_first_last,
    grouped_mode,
    grouped_moments,
    grouped_regression,
    grouped_value_counts,
    grouped_weighted_median,
    grouped_weighted_stats,
    grouped_welch_ttest,
    grouped_minmax,
    grouped_zscore,
    state_run_stats,
    rolling_corr,
    transition_counts,
    windowed_distinct,
)
from recipys_ray.ops.timeseries import (
    budget_prefix,
    debounce_events,
    grouped_autocorr,
    grouped_cusum,
    ohlc_bars,
    sequence_integrity,
    time_weighted_avg,
)
from recipys_ray.ops.setops import (
    except_distinct,
    intersect_distinct,
    table_diff,
)
from recipys_ray.ops.quality import quality_checks
from recipys_ray.ops.rollup import rollup_aggregate
from recipys_ray.ops.frequent import cms_counts, frequent_items
from recipys_ray.ops.reshape import group_concat, melt, pivot
from recipys_ray.ops.sampling import (
    balanced_sample,
    budget_sample,
    stratified_split,
    hash_sample,
    negative_samples,
    weighted_sample,
    hash_split,
    mix_sources,
    mix_temperature,
    sample_per_group,
    time_split,
)
from recipys_ray.ops.semdedup import semantic_dedup
from recipys_ray.ops.vector import quantize_embeddings
from recipys_ray.ops.similarity import knn_brute_force, knn_ivf
from recipys_ray.ops.spans import duplicate_spans
from recipys_ray.ops.text import (
    RepetitionStats,
    TextFeaturizer,
    bigram_lm_score,
    build_vocab,
    compression_ratio,
    doc_term_counts,
    normalize_text,
    pattern_counts,
    remove_boilerplate_tokens,
    readability_scores,
    source_similarity,
    top_tokens_per_source,
    pmi_bigrams,
    gopher_quality_filter,
    redact_pii,
    text_features,
    tfidf_top_terms,
    unigram_lm_score,
)
from recipys_ray.ops.topk import top_k_per_group

__all__ = [
    "asof_join", "range_agg", "range_join",
    "chunk_documents", "chunk_sentences", "benchmark_gram_set",
    "decontaminate",
    "embedding_dedup", "embedding_dedup_exact", "exact_dedup",
    "dedup_against", "connected_components", "cluster_labels",
    "calendar_features", "k_anonymize",
    "minhash_candidate_pairs", "minhash_dedup", "ngram_jaccard",
    "simhash_dedup", "segment_dedup", "verify_pairs_jaccard",
    "distinct_per_group",
    "distinct_per_group_approx", "jaccard_dedup", "containment_dedup",
    "overlap_dedup", "fuzzy_decontaminate", "hash_join", "skew_join",
    "ByteHistogramFeatures", "DecodeImage", "DecodeWav", "SampleFrames",
    "decode_images", "read_webdataset", "extract_json_int", "funnel", "cohort_retention", "pack_sequences", "profile", "benford_counts",
    "exact_quantiles", "exact_quantiles_cont", "group_quantiles",
    "winsorize", "robust_zscore", "grouped_robust_zscore",
    "grouped_winsorize", "grouped_histogram",
    "kbins_quantile_exact", "quantile_normalize",
    "histogram",
    "rollup_aggregate", "add_global_rank", "add_ntile", "value_ranks",
    "banded_levenshtein", "dedup_levenshtein",
    "pairwise_jaro_winkler", "dedup_jaro_winkler", "fuzzy_link",
    "sorted_neighborhood_dedup",
    "population_stability", "ks_statistic", "segment_psi", "chi_square",
    "cooccurrence_counts",
    "grouped_value_counts", "grouped_mode", "grouped_entropy", "grouped_corr",
    "grouped_zscore",
    "grouped_regression", "grouped_moments", "grouped_first_last",
    "grouped_weighted_stats", "grouped_welch_ttest", "grouped_autocorr",
    "ohlc_bars",
    "except_distinct", "intersect_distinct", "table_diff",
    "grouped_cusum", "sequence_integrity", "budget_prefix",
    "time_weighted_avg",
    "debounce_events",
    "merge_intervals", "scd2_intervals", "transition_counts",
    "state_run_stats",
    "grouped_minmax", "pmi_bigrams", "grouped_gini",
    "grouped_bitops", "two_proportion_ztest", "pagerank",
    "grouped_weighted_median",
    "cumulative_distinct", "grouped_auc", "decayed_sum",
    "windowed_distinct", "rolling_corr", "null_patterns",
    "expanding_mean_exclusive", "grouped_argmax", "group_share",
    "group_seq_index",
    "fit_pca", "pca_project", "target_encode", "feature_hash",
    "balanced_sample", "hash_sample", "hash_split", "negative_samples",
    "mix_sources", "mix_temperature", "sample_per_group",
    "weighted_sample", "time_split", "stratified_split",
    "budget_sample",
    "pivot", "melt", "group_concat", "frequent_items", "cms_counts",
    "quality_checks", "semantic_dedup", "knn_brute_force",
    "quantize_embeddings",
    "knn_ivf", "duplicate_spans", "RepetitionStats", "TextFeaturizer",
    "build_vocab", "compression_ratio", "doc_term_counts",
    "normalize_text", "pattern_counts", "remove_boilerplate_tokens",
    "readability_scores",
    "redact_pii", "source_similarity", "text_features",
    "top_tokens_per_source",
    "gopher_quality_filter",
    "tfidf_top_terms", "unigram_lm_score", "bigram_lm_score",
    "top_k_per_group",
]
