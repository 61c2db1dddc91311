from cdc_system_spark.operators.changelog import (
    change_statistics,
    change_statistics_rollup,
    mark_synced,
    pending_changes,
)
from cdc_system_spark.operators.conflicts import field_merge, resolve, split_manual
from cdc_system_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from cdc_system_spark.operators.bucketing import bucketed_join, write_bucketed
from cdc_system_spark.operators.maintenance import (
    compact_log,
    compact_zordered,
    read_log_range,
    zorder_value,
)
from cdc_system_spark.operators.scd import asof_lookup, scd2_apply, scd2_from_log
from cdc_system_spark.operators.merge import apply_changes, lww_reduce, net_effect_reduce
from cdc_system_spark.operators.multimodal import (
    byte_histogram,
    decode_media,
    frame_sample,
    synthesize_media,
)
from cdc_system_spark.operators.similarity import (
    assign_cells,
    cosine_topk,
    group_normalize,
    ivf_topk,
    kmeans_refine,
    knn_graph,
    pairwise_neardup,
    semantic_dedup,
)
from cdc_system_spark.operators.snapshot_diff import snapshot_diff
from cdc_system_spark.operators.temporal import asof_join, bucketed_range_join
from cdc_system_spark.operators.text import (
    fingerprint,
    lang_id,
    term_frequency,
    text_quality,
    token_count,
    token_histogram,
    winnow_fingerprints,
)

__all__ = [
    "apply_changes",
    "asof_join",
    "asof_lookup",
    "assign_cells",
    "bucketed_join",
    "bucketed_range_join",
    "byte_histogram",
    "change_statistics",
    "change_statistics_rollup",
    "compact_log",
    "compact_zordered",
    "cosine_topk",
    "decode_media",
    "exact_dedup",
    "field_merge",
    "fingerprint",
    "frame_sample",
    "group_normalize",
    "ivf_topk",
    "kmeans_refine",
    "knn_graph",
    "lang_id",
    "lsh_candidate_pairs",
    "lww_reduce",
    "mark_synced",
    "minhash_signatures",
    "net_effect_reduce",
    "ngram_jaccard_pairs",
    "pairwise_neardup",
    "pending_changes",
    "read_log_range",
    "resolve",
    "scd2_apply",
    "scd2_from_log",
    "semantic_dedup",
    "simhash",
    "snapshot_diff",
    "split_manual",
    "synthesize_media",
    "term_frequency",
    "text_quality",
    "token_count",
    "token_histogram",
    "winnow_fingerprints",
    "write_bucketed",
    "zorder_value",
]
