package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans of representative queries to
  * docs/PLANS.md — the `.explain("formatted")` audit trail for the SURVEY §5
  * design rules (pushdown, pruning, exchange counts, join strategies). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = Seq(
      "bars_daily" -> "one hash aggregation, pruned scan (no props/event_type)",
      "feat_sma" -> "whole windowed ladder: single exchange + sort after the bars agg",
      "feat_ema" -> "recursive scan: one exchange, sortWithinPartitions, mapPartitions",
      "sig_ema_crossover" -> "signals: filter + lag windows over the (cached) feature table",
      "fund_balance_sheet" -> "two scan-side aggs + broadcast customer join + window pass",
      "dedup_minhash" -> "banded bucket equi-join + candidate-restricted exact verify, no cartesian",
      "dedup_embedding_lsh" -> "cell-routed (low threshold): k-means cell equi-join + exact cosine re-score, no nested loop",
      "dedup_embedding_lsh_hi" -> "sign-LSH regime: hyperplane bucket join + exact cosine re-score, no nested loop",
      "ann_topk" -> "broadcast query side + codegen graft_dot, top-k window",
      "fund_quality_scores" -> "distributed exact quantile: no single-partition window",
      "watermark_incremental_features" -> "stale-symbol semi-join gates the event scan",
      "trades_fundamentals_join" -> "broadcast as-of range join + keep-latest window",
      "corpus_pack" -> "deterministic bucketed global-offset cumsum, no single-partition window",
      "decontaminate" -> "broadcast holdout shingle set, map-side scoring + per-doc rollup",
      "dedup_incremental" -> "increment-bounded inverted-index join",
      "candlestick_prep" -> "date-range predicate pushed to the events scan",
      "table_profile" -> "one-scan multi-column profile (exact mode: second melt+distinct scan)",
      "bucketed_symbol_stats" -> "bucketed read: symbol join + aggs with no exchange",
      "corpus_sample_mix" -> "epoch sampling: one scan + explode, zero exchange",
      "stream_join_attribution" -> "interval join: equi-join on user_id, time bound as residual filter",
      "text_dup_spans" -> "gram-keyed df join reuses the window-count partitioning",
      "text_keywords" -> "tf/df from one explode, corpus-size scalar broadcast",
      "text_perplexity" -> "bigram model tables shuffled once; 1-row vocab scalar broadcast",
      "corpus_dsir_weights" -> "bucket-bounded ratio table broadcast, map-side feature scoring",
      "corpus_shuffle" -> "global permutation via 256-bucket offsets, no single-partition window",
      "embedding_domain_classify" -> "metadata-sized centroid fit broadcast + map-side argmax scan",
      "dedup_semantic" -> "cell-keyed pair join (never corpus x corpus) + star-contraction groups",
      "corpus_curation_report" -> "six doc_id-keyed signals composed as hash joins, signals computed once",
      "dedup_canonical" -> "per-cluster quality argmax: one window over small near-dup clusters",
      "corpus_chunk_overlap" -> "per-doc sliding windows: narrow explode, zero exchange",
      "corpus_stats_by_source" -> "map-side partial agg to a source-cardinality shuffle",
      "text_pii_redact" -> "codegen regexp chain, pure per-row projection",
      "embedding_project" -> "broadcast sign-matrix join + map-side-combined (vec, dim) agg",
      "ann_hard_negatives" -> "broadcast query side + label residual filter + top-k window",
      "sketch_token_freq_cms" -> "depth-fanout explode into a fixed-width cell aggregation",
      "corpus_bpe_encode" -> "distinct-word segmentation + word equi-join rollup",
      "text_bm25" -> "inverted-index token join, maxQueryTerms-gated broadcast query terms, corpus scalars broadcast",
      "retrieval_rrf" -> "rank-list fusion: full-outer join + per-query window over metadata-sized top-k lists",
      "stream_neardup" -> "batch half of the stream-detects/store-verifies split: candidate-restricted exact verify (the streaming stage ran before this plan)",
      "table_contracts" -> "per-table single-scan PK check: key-columns-only distinct shuffle",
      "ann_ivf" -> "stored-index probe: partition-pruned cell scan + broadcast centroid probe",
      "dedup_simhash" -> "codegen graft_simhash64 fingerprints + 16-bit band bucket self-join",
      "watermark_roundtrip" -> "versioned-store re-read: stale filter over the committed parquet state",
      "trades_filter_model" -> "fitted-GBT scoring as pure codegen CASE expressions (no MLlib transform UDF) + decimal-exact rollup",
      "ann_ivf_incremental" -> "incremental index probe: append-maintained cell partitions, pruned scan",
      "events_compaction" -> "bin-packed generation read: per-day rollup + broadcast file-count join",
      "cdc_apply_snapshot" -> "changelog latest-wins merge: one key-partitioned window, no snapshot join",
      "ann_pq" -> "PQ ADC: codegen encode pass, broadcast LUT join, map-side-combined exact sums, bounded exact re-rank",
      "ann_ivfpq" -> "IVF+PQ: probed-cell equi-join gates the ADC; broadcast LUT + centroids; no unprobed-cell scan",
      "ann_ivfpq_incremental" -> "IVFPQ incremental probe: append-maintained cell partitions, pruned code scan",
      "mv_incremental_refresh" -> "MV read-back: finalized algebraic columns off the bucketed partial-state store",
      "events_skipping_scan" -> "manifest-pruned scan: file-list read of intersecting z-order boxes + residual filter",
      "events_point_lookup" -> "bloom-pruned point read: surviving files only + exact equality residual",
      "table_fk_contracts" -> "per-edge LEFT ANTI orphan join against distinct parent keys (dimension side broadcasts)",
      "events_maintenance_cycle" -> "maintained-generation read: manifest-pruned box scan through the committed pointer",
      "pipeline_daily_run" -> "orchestrated per-stage counts over memoized stage checkpoints",
      "mm_audio_features" -> "binary WAV decode: per-partition batched codec pass, payload never exploded",
      "retrieval_eval" -> "metrics over metadata-sized top-k lists: query-keyed joins + broadcast gain tables",
      "training_triplets" -> "in-list positive/negative picks: two windows over the memoized ANN top-k",
      "events_schema_evolution" -> "mergeSchema union read over mixed-generation files, null-accounted rollup",
      "corpus_curriculum" -> "exact-quantile tier bounds as literals + md5 order keys, no single-partition sort",
      "sketch_event_stats" -> "KMV bottom-k sketches: one ObjectHashAggregate pass (partial+final), no Expand, no exact-distinct shuffle",
      "table_profile_approx" -> "single-scan profile with per-column KMV distinct sketches (vs the exact twin's second melt pass)",
      "ann_index_health" -> "drift rollup: pruned code-table scan + broadcast codebooks/increment, 16-row output",
      "ann_index_autorefit" -> "probe over the auto-REFIT store (thresholds pulled the rebuild lever): full-corpus-fit cell partitions, pruned scan",
      "stream_ann_ingest" -> "probe AFTER streamed foreachBatch appends: same pruned-cell shape as the batch-incremental store",
      "sql_extensions_simhash" -> "plain-SQL text through the injected graft_simhash64 (extensions session): same codegen fingerprint plan as the Scala route",
      "events_forget" -> "tombstone-masked read (broadcast anti-join) unioned with the post-purge physical read — masking never shuffles the data side",
      "mv_delete_refresh" -> "MV read-back after retraction: algebraic subtraction + boundary-only min/max recompute, untouched buckets unread",
      "ann_forget" -> "probe AFTER index-level deletes: survivors-only cell partitions, pruned scan, quantizer untouched",
      "corpus_version_diff" -> "release diff: per-side fingerprint at the scan, full-outer join moves 16-byte hashes not documents",
      "forget_cascade" -> "one takedown request audited on BOTH surfaces: purged base-store scan unioned with the retracted MV state read",
      "text_dup_span_rewrite" -> "exact-substring removal: one gram-keyed rank shuffle, position anti-join, per-doc bounded reassembly sort",
      "stream_mv_retraction" -> "MV read-back after a streamed CDC delete: per-batch exactly-once retraction, touched buckets only",
      "events_metadata_count" -> "metadata-only COUNT: interior files answered from footer row counts, boundary sliver scanned with the exact predicate",
      "sketch_store_rollup" -> "sketch-state store reaggregation: rollups merge persisted bottom-k states (array algebra), the data is never rescanned")
    val sb = new StringBuilder
    sb.append("# Physical-plan audit (generated by graft.tools.PlanDump at sf0.001)\n\n")
    sb.append("Each section is `df.explain(\"formatted\")` output for a representative\n")
    sb.append("registered query, with the design intent it demonstrates.\n")
    picks.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n```\n")
    }
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"), sb.toString)
    println(s"wrote docs/PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
