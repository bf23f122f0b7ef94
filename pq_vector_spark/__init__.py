"""pq_vector_spark — a PySpark-native analytics engine with the capabilities
of the reference ``XiangpengHao/pq-vector`` (IVF-in-Parquet vector search),
re-expressed Spark-first, plus large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7): everything is declarative DataFrame ops so
Catalyst/Tungsten choose physical strategy; the driver only ever holds tiny
state (centroids, ≤100k-row training samples); no ``collect()`` of data in
any operator hot path — built for a 1000-executor cluster over ~100 TB even
though tests run on ``local[*]``.
"""

from pq_vector_spark.session import PqSession, VectorTopKOptions, get_spark
from pq_vector_spark.functions.distance import (
    array_distance,
    squared_l2,
    cosine_similarity,
    dot_product,
    register_sql_functions,
)
from pq_vector_spark.schema import infer_vector_column, validate_vector_column
from pq_vector_spark.operators.topk import topk, brute_force_topk
from pq_vector_spark.operators.similarity import ivf_maxsim_topk, maxsim_topk
from pq_vector_spark.index.build import (
    append_to_index,
    auto_rebuild_if_stale,
    build_index,
    has_index,
    index_health,
)
from pq_vector_spark.index.search import indexed_topk, load_index
from pq_vector_spark.plans.sql import pq_sql, register_indexed_table
from pq_vector_spark.plans.intercept import (
    last_decline_reason,
    refresh_codes_sidecar,
    register_codes_sidecar,
    try_intercept_topk,
    unregister_codes_sidecar,
)
from pq_vector_spark.plans.explain import explain_vector, vector_route
from pq_vector_spark.operators.asof import asof_join
from pq_vector_spark.operators.skew import salted_join
from pq_vector_spark.operators.sampling import (
    hash_sample,
    train_split,
    weighted_mix,
)
from pq_vector_spark.functions.quantize import (
    binary_quantize,
    binary_topk,
    binary_topk_with_fetch,
    dequantize,
    hamming_distance,
    quantize_vectors,
    quantized_distance,
)
from pq_vector_spark.sources.sinks import (
    shard_manifest,
    verify_epoch_shards,
    write_epoch_shards,
    write_training_shards,
)
from pq_vector_spark.streaming.events import (
    enrich_join,
    trending,
    scd_enrich,
    stream_stream_window_join,
)
from pq_vector_spark.index.pq import (
    PQCodebook,
    adc_distance,
    encode_pq,
    opq_rotation,
    pq_topk,
    pq_topk_with_fetch,
    train_opq,
    train_pq,
    encode_indexed,
    ivfpq_topk,
)
from pq_vector_spark.operators.hybrid import hybrid_topk, rrf_fuse
from pq_vector_spark.operators.rangejoin import range_join
from pq_vector_spark.operators.funnel import funnel_counts, funnel_steps
from pq_vector_spark.operators.chunk import chunk_documents
from pq_vector_spark.operators.constraints import (
    check_constraints,
    check_unique,
    profile_columns,
)
from pq_vector_spark.operators.curate import curate_corpus
from pq_vector_spark.operators.decontaminate import contamination_report, decontaminate
from pq_vector_spark.operators.dedup import (
    append_dedup_index,
    append_exact_dedup_index,
    build_dedup_index,
    build_exact_dedup_index,
    incremental_dedup,
    incremental_dedup_exact_indexed,
    incremental_dedup_near,
    remove_repeated_paragraphs,
    resolve_duplicates,
    semantic_dedup,
    winnow_overlap_pairs,
)
from pq_vector_spark.operators.bloom import (
    bloom_gram_hits,
    build_gram_bloom,
    decontaminate_bloom,
)
from pq_vector_spark.operators.drift import distribution_drift, psi
from pq_vector_spark.operators.merge import latest_changes, merge_upsert
from pq_vector_spark.operators.packing import pack_sequences, packing_stats
from pq_vector_spark.operators.abtest import ab_test
from pq_vector_spark.operators.classifier import (
    classify_quality,
    fit_lda_quality,
    lda_quality_score,
    quality_features,
)
from pq_vector_spark.operators.dsir import dsir_importance_weights, dsir_select
from pq_vector_spark.operators.normalize import quantile_normalize
from pq_vector_spark.operators.retention import cohort_retention, event_transitions
from pq_vector_spark.streaming.ingest import (
    append_index_batch,
    dedup_append_batch,
    drain_pending_appends,
    indexed_topk_with_pending,
    streaming_index_ingest,
    streaming_ingest,
    wait_for_async_rebuild,
)
from pq_vector_spark.streaming.monitor import drift_metrics_batch, streaming_drift_monitor
from pq_vector_spark.operators.sampling import (
    importance_sample,
    leakage_safe_split,
    score_buckets,
    priority_sample_k,
    repeat_mix,
    select_token_budget,
    select_token_budget_grouped,
    stratified_sample,
    temperature_mix,
    temperature_rates,
    temperature_token_budgets,
)
from pq_vector_spark.functions.vector import (
    embedding_outliers,
    group_centroids,
    l2_normalize,
    norm_stats,
    pca_components,
    project_vectors,
    random_projection_matrix,
)
from pq_vector_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_inferred,
    write_jsonl,
)
from pq_vector_spark.sources.layout import zorder_key, zorder_write

__all__ = [
    "PqSession",
    "VectorTopKOptions",
    "get_spark",
    "array_distance",
    "squared_l2",
    "cosine_similarity",
    "dot_product",
    "register_sql_functions",
    "infer_vector_column",
    "validate_vector_column",
    "topk",
    "brute_force_topk",
    "maxsim_topk",
    "ivf_maxsim_topk",
    "append_to_index",
    "auto_rebuild_if_stale",
    "build_index",
    "has_index",
    "index_health",
    "indexed_topk",
    "load_index",
    "pq_sql",
    "register_indexed_table",
    "try_intercept_topk",
    "last_decline_reason",
    "refresh_codes_sidecar",
    "register_codes_sidecar",
    "unregister_codes_sidecar",
    "explain_vector",
    "vector_route",
    "asof_join",
    "salted_join",
    "hash_sample",
    "train_split",
    "weighted_mix",
    "quantize_vectors",
    "dequantize",
    "quantized_distance",
    "shard_manifest",
    "write_training_shards",
    "write_epoch_shards",
    "verify_epoch_shards",
    "enrich_join",
    "trending",
    "scd_enrich",
    "stream_stream_window_join",
    "PQCodebook",
    "adc_distance",
    "encode_pq",
    "opq_rotation",
    "pq_topk",
    "pq_topk_with_fetch",
    "train_opq",
    "train_pq",
    "encode_indexed",
    "ivfpq_topk",
    "hybrid_topk",
    "rrf_fuse",
    "range_join",
    "funnel_counts",
    "funnel_steps",
    "curate_corpus",
    "chunk_documents",
    "check_constraints",
    "check_unique",
    "profile_columns",
    "incremental_dedup",
    "incremental_dedup_near",
    "remove_repeated_paragraphs",
    "semantic_dedup",
    "winnow_overlap_pairs",
    "build_dedup_index",
    "append_dedup_index",
    "resolve_duplicates",
    "distribution_drift",
    "psi",
    "contamination_report",
    "bloom_gram_hits",
    "build_gram_bloom",
    "decontaminate_bloom",
    "decontaminate",
    "latest_changes",
    "merge_upsert",
    "pack_sequences",
    "packing_stats",
    "cohort_retention",
    "event_transitions",
    "quantile_normalize",
    "ab_test",
    "dedup_append_batch",
    "streaming_ingest",
    "streaming_index_ingest",
    "append_index_batch",
    "build_exact_dedup_index",
    "append_exact_dedup_index",
    "incremental_dedup_exact_indexed",
    "binary_quantize",
    "binary_topk",
    "binary_topk_with_fetch",
    "hamming_distance",
    "score_buckets",
    "drain_pending_appends",
    "wait_for_async_rebuild",
    "dsir_importance_weights",
    "dsir_select",
    "classify_quality",
    "fit_lda_quality",
    "lda_quality_score",
    "quality_features",
    "indexed_topk_with_pending",
    "drift_metrics_batch",
    "streaming_drift_monitor",
    "leakage_safe_split",
    "stratified_sample",
    "importance_sample",
    "temperature_mix",
    "temperature_rates",
    "temperature_token_budgets",
    "priority_sample_k",
    "repeat_mix",
    "select_token_budget",
    "select_token_budget_grouped",
    "embedding_outliers",
    "group_centroids",
    "l2_normalize",
    "norm_stats",
    "pca_components",
    "project_vectors",
    "random_projection_matrix",
    "read_jsonl",
    "read_jsonl_inferred",
    "write_jsonl",
    "zorder_key",
    "zorder_write",
]

__version__ = "0.1.0"
