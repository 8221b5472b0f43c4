"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``mysql_binlog_spark`` — see SURVEY.md §2 for the operator
inventory each query exercises.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_binlog_spark import driver_queries as dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay at sf0.001 — derived binlog → binary
    chunks → vectorized decode → dedup/last-writer → mini-lake MERGE
    (schema evolution + exactly-once epochs) → final transcripts state."""
    return dq.q_entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # CDC / incremental-ingest engine (SURVEY.md §2.3-2.7, §2.11)
        "cdc_changelog": dq.q_cdc_changelog,
        "cdc_dedup_lsn": dq.q_cdc_dedup_lsn,
        "cdc_last_writer": dq.q_cdc_last_writer,
        "cdc_salted_last_writer": dq.q_cdc_salted_last_writer,
        "cdc_final_state": dq.q_cdc_final_state,
        "cdc_stats_by_table": dq.q_cdc_stats_by_table,
        "cdc_stats_interval": dq.q_cdc_stats_interval,
        "cdc_stats_rollup": dq.q_cdc_stats_rollup,
        "cdc_validate": dq.q_cdc_validate,
        "cdc_lineage": dq.q_cdc_lineage,
        "cdc_filter_tables": dq.q_cdc_filter_tables,
        "cdc_filter_databases": dq.q_cdc_filter_databases,
        "cdc_schema_evolution": dq.q_cdc_schema_evolution,
        "cdc_start_position": dq.q_cdc_start_position,
        "cdc_turn_ordering": dq.q_cdc_turn_ordering,
        "cdc_decode_binary": dq.q_cdc_decode_binary,
        "cdc_gtid_lineage": dq.q_cdc_gtid_lineage,
        "cdc_gtid_resume": dq.q_cdc_gtid_resume,
        "cdc_gtid_set_resume": dq.q_cdc_gtid_set_resume,
        "cdc_decode_types": dq.q_cdc_decode_types,
        "cdc_apply_e2e": dq.q_cdc_apply_e2e,
        "cdc_asof_lookup": dq.q_cdc_asof_lookup,
        "cdc_scd2_history": dq.q_cdc_scd2_history,
        "cdc_time_travel": dq.q_cdc_time_travel,
        "cdc_snapshot_diff": dq.q_cdc_snapshot_diff,
        # training-data pipeline: dedup families
        "doc_dedup_exact": dq.q_doc_dedup_exact,
        "doc_minhash_signatures": dq.q_doc_minhash_signatures,
        "doc_neardup_minhash_lsh": dq.q_doc_neardup_minhash_lsh,
        "doc_neardup_jaccard": dq.q_doc_neardup_jaccard,
        "doc_dedup_clusters": dq.q_doc_dedup_clusters,
        "doc_novelty_filter": dq.q_doc_novelty_filter,
        "doc_decontaminate": dq.q_doc_decontaminate,
        "doc_simhash": dq.q_doc_simhash,
        # text analysis
        "doc_langid": dq.q_doc_langid,
        "doc_quality": dq.q_doc_quality,
        "doc_repetition": dq.q_doc_repetition,
        "doc_pii_scrub": dq.q_doc_pii_scrub,
        "doc_tokens": dq.q_doc_tokens,
        "doc_fingerprint": dq.q_doc_fingerprint,
        "doc_sample": dq.q_doc_sample,
        "doc_pack": dq.q_doc_pack,
        "doc_tokens_bpe": dq.q_doc_tokens_bpe,
        "doc_pack_bpe": dq.q_doc_pack_bpe,
        "doc_quality_filter": dq.q_doc_quality_filter,
        "doc_tfidf": dq.q_doc_tfidf,
        "corpus_top_ngrams": dq.q_corpus_top_ngrams,
        "corpus_distinct_kmv": dq.q_corpus_distinct_kmv,
        "doc_resample_sources": dq.q_doc_resample_sources,
        "doc_length_quantiles": dq.q_doc_length_quantiles,
        "doc_training_shuffle": dq.q_doc_training_shuffle,
        "doc_training_mix": dq.q_doc_training_mix,
        "doc_topk_per_source": dq.q_doc_topk_per_source,
        # similarity search / ANN
        "emb_cosine_knn": dq.q_emb_cosine_knn,
        "emb_sq8_knn": dq.q_emb_sq8_knn,
        "emb_ivf_knn": dq.q_emb_ivf_knn,
        "emb_semantic_dedup": dq.q_emb_semantic_dedup,
        "emb_lsh_buckets": dq.q_emb_lsh_buckets,
        "emb_neardup_cosine": dq.q_emb_neardup_cosine,
        # multimodal plumbing
        "multimodal_meta": dq.q_multimodal_meta,
        "multimodal_frames": dq.q_multimodal_frames,
        "multimodal_real_decode": dq.q_multimodal_real_decode,
        # windowed / sessionization
        "events_sessionize": dq.q_events_sessionize,
        "events_rate_window": dq.q_events_rate_window,
        "events_funnel": dq.q_events_funnel,
        "events_pivot": dq.q_events_pivot,
        "events_cohort_retention": dq.q_events_cohort_retention,
        "doc_chunk": dq.q_doc_chunk,
        "corpus_pmi_bigrams": dq.q_corpus_pmi_bigrams,
        "cdc_conversation_render": dq.q_cdc_conversation_render,
        "cdc_tool_chains": dq.q_cdc_tool_chains,
        "cdc_turn_latency": dq.q_cdc_turn_latency,
        "events_transitions": dq.q_events_transitions,
        "corpus_dup_spans": dq.q_corpus_dup_spans,
        "cdc_hot_keys": dq.q_cdc_hot_keys,
        "doc_perplexity": dq.q_doc_perplexity,
        "events_anomalies": dq.q_events_anomalies,
        "cdc_preimage_audit": dq.q_cdc_preimage_audit,
        "doc_winnow": dq.q_doc_winnow,
        "doc_winnow_neardup": dq.q_doc_winnow_neardup,
        "corpus_cross_source": dq.q_corpus_cross_source,
        "corpus_vocab_growth": dq.q_corpus_vocab_growth,
        "cdc_txn_stats": dq.q_cdc_txn_stats,
        "emb_cluster_stats": dq.q_emb_cluster_stats,
        "cdc_key_lifecycle": dq.q_cdc_key_lifecycle,
        "cdc_corpus_bridge": dq.q_cdc_corpus_bridge,
        "doc_dedup_keep": dq.q_doc_dedup_keep,
        "doc_split": dq.q_doc_split,
        "doc_perplexity_bigram": dq.q_doc_perplexity_bigram,
        "doc_curation_funnel": dq.q_doc_curation_funnel,
        "events_entropy": dq.q_events_entropy,
        "doc_lang_confusion": dq.q_doc_lang_confusion,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_changelog": dq.oracle_cdc_changelog(),
        "cdc_dedup_lsn": dq.oracle_cdc_dedup_lsn(),
        "cdc_last_writer": dq.oracle_cdc_last_writer(),
        "cdc_salted_last_writer": dq.oracle_cdc_last_writer(),
        "cdc_final_state": dq.oracle_cdc_final_state(),
        "cdc_stats_by_table": dq.oracle_cdc_stats_by_table(),
        "cdc_stats_interval": dq.oracle_cdc_stats_interval(),
        "cdc_stats_rollup": dq.oracle_cdc_stats_rollup(),
        "cdc_validate": dq.oracle_cdc_validate(),
        "cdc_lineage": dq.oracle_cdc_lineage(),
        "cdc_filter_tables": dq.oracle_cdc_filter_tables(),
        "cdc_filter_databases": dq.oracle_cdc_filter_databases(),
        "cdc_schema_evolution": dq.oracle_cdc_schema_evolution(),
        "cdc_start_position": dq.oracle_cdc_start_position(),
        "cdc_turn_ordering": dq.oracle_cdc_turn_ordering(),
        "cdc_decode_binary": dq.oracle_cdc_decode_binary(),
        "cdc_gtid_lineage": dq.oracle_cdc_gtid_lineage(),
        "cdc_gtid_resume": dq.oracle_cdc_gtid_resume(),
        "cdc_gtid_set_resume": dq.oracle_cdc_gtid_set_resume(),
        "cdc_decode_types": dq.oracle_cdc_decode_types(),
        "cdc_apply_e2e": dq.oracle_cdc_apply_e2e(),
        "cdc_asof_lookup": dq.oracle_cdc_asof_lookup(),
        "cdc_scd2_history": dq.oracle_cdc_scd2_history(),
        "cdc_time_travel": dq.oracle_cdc_time_travel(),
        "cdc_snapshot_diff": dq.oracle_cdc_snapshot_diff(),
        "doc_dedup_exact": dq.oracle_doc_dedup_exact(),
        "doc_minhash_signatures": dq.oracle_doc_minhash_signatures(),
        "doc_neardup_minhash_lsh": dq.oracle_doc_neardup_minhash_lsh(),
        "doc_neardup_jaccard": dq.oracle_doc_neardup_jaccard(),
        "doc_dedup_clusters": dq.oracle_doc_dedup_clusters(),
        "doc_novelty_filter": dq.oracle_doc_novelty_filter(),
        "doc_decontaminate": dq.oracle_doc_decontaminate(),
        "doc_simhash": dq.oracle_doc_simhash(),
        "doc_langid": dq.oracle_doc_langid(),
        "doc_quality": dq.oracle_doc_quality(),
        "doc_repetition": dq.oracle_doc_repetition(),
        "doc_pii_scrub": dq.oracle_doc_pii_scrub(),
        "doc_tokens": dq.oracle_doc_tokens(),
        "doc_fingerprint": dq.oracle_doc_fingerprint(),
        "doc_sample": dq.oracle_doc_sample(),
        "doc_pack": dq.oracle_doc_pack(),
        "doc_tokens_bpe": dq.oracle_doc_tokens_bpe(),
        "doc_pack_bpe": dq.oracle_doc_pack_bpe(),
        "doc_quality_filter": dq.oracle_doc_quality_filter(),
        "doc_tfidf": dq.oracle_doc_tfidf(),
        "corpus_top_ngrams": dq.oracle_corpus_top_ngrams(),
        "corpus_distinct_kmv": dq.oracle_corpus_distinct_kmv(),
        "doc_resample_sources": dq.oracle_doc_resample_sources(),
        "doc_length_quantiles": dq.oracle_doc_length_quantiles(),
        "doc_training_shuffle": dq.oracle_doc_training_shuffle(),
        "doc_training_mix": dq.oracle_doc_training_mix(),
        "doc_topk_per_source": dq.oracle_doc_topk_per_source(),
        "emb_cosine_knn": dq.oracle_emb_cosine_knn(),
        "emb_sq8_knn": dq.oracle_emb_sq8_knn(),
        "emb_ivf_knn": dq.oracle_emb_ivf_knn(),
        "emb_semantic_dedup": dq.oracle_emb_semantic_dedup(),
        "emb_lsh_buckets": dq.oracle_emb_lsh_buckets(),
        "emb_neardup_cosine": dq.oracle_emb_neardup_cosine(),
        "multimodal_meta": dq.oracle_multimodal_meta(),
        "multimodal_frames": dq.oracle_multimodal_frames(),
        "multimodal_real_decode": dq.oracle_multimodal_real_decode(),
        "events_sessionize": dq.oracle_events_sessionize(),
        "events_rate_window": dq.oracle_events_rate_window(),
        "events_funnel": dq.oracle_events_funnel(),
        "events_pivot": dq.oracle_events_pivot(),
        "events_cohort_retention": dq.oracle_events_cohort_retention(),
        "doc_chunk": dq.oracle_doc_chunk(),
        "corpus_pmi_bigrams": dq.oracle_corpus_pmi_bigrams(),
        "cdc_conversation_render": dq.oracle_cdc_conversation_render(),
        "cdc_tool_chains": dq.oracle_cdc_tool_chains(),
        "cdc_turn_latency": dq.oracle_cdc_turn_latency(),
        "events_transitions": dq.oracle_events_transitions(),
        "corpus_dup_spans": dq.oracle_corpus_dup_spans(),
        "cdc_hot_keys": dq.oracle_cdc_hot_keys(),
        "doc_perplexity": dq.oracle_doc_perplexity(),
        "events_anomalies": dq.oracle_events_anomalies(),
        "cdc_preimage_audit": dq.oracle_cdc_preimage_audit(),
        "doc_winnow": dq.oracle_doc_winnow(),
        "doc_winnow_neardup": dq.oracle_doc_winnow_neardup(),
        "corpus_cross_source": dq.oracle_corpus_cross_source(),
        "corpus_vocab_growth": dq.oracle_corpus_vocab_growth(),
        "cdc_txn_stats": dq.oracle_cdc_txn_stats(),
        "emb_cluster_stats": dq.oracle_emb_cluster_stats(),
        "cdc_key_lifecycle": dq.oracle_cdc_key_lifecycle(),
        "cdc_corpus_bridge": dq.oracle_cdc_corpus_bridge(),
        "doc_dedup_keep": dq.oracle_doc_dedup_keep(),
        "doc_split": dq.oracle_doc_split(),
        "doc_perplexity_bigram": dq.oracle_doc_perplexity_bigram(),
        "doc_curation_funnel": dq.oracle_doc_curation_funnel(),
        "events_entropy": dq.oracle_events_entropy(),
        "doc_lang_confusion": dq.oracle_doc_lang_confusion(),
    }
