package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Regenerates PLANS.md: `.explain("formatted")` output for flagship
  * queries, annotated with the plan property each one is expected to show
  * (the same properties PlanAuditSpec asserts). Run:
  *
  *   sbt "runMain graft.tools.PlanDump"
  */
object PlanDump {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.LocalSession.buildBench("4")
    graft.GraftSession.registerAll(spark)

    val entries: Seq[(String, String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("q01_pricing_summary",
        "Partial HashAggregate before the exchange (map-side combine); " +
          "PushedFilters + narrow ReadSchema on the parquet scan.",
        () => graft.queries.RelationalQueries.queries("q01_pricing_summary")(spark, d)),
      ("q05_local_supplier_volume",
        "Small dimensions broadcast (BroadcastHashJoin), fact table never " +
          "shuffled for them.",
        () => graft.queries.RelationalQueries.queries("q05_local_supplier_volume")(spark, d)),
      ("q07_volume_shipping",
        "Key-partitioned joins for the big tables, broadcast for nation; " +
          "AQE coalesces post-shuffle partitions by size.",
        () => graft.queries.RelationalQueries.queries("q07_volume_shipping")(spark, d)),
      ("q33_event_sessions",
        "Sessionization: both windows keyed on user_id (hashpartitioning " +
          "exchange, no single-partition Window).",
        () => graft.queries.RelationalQueries.queries("q33_event_sessions")(spark, d)),
      ("l04_minhash_lsh_dedup",
        "Candidate generation is a keyed self-join on (band, sig) — no " +
          "CartesianProduct anywhere; hot buckets dropped before the join.",
        () => graft.queries.LlmQueries.queries("l04_minhash_lsh_dedup")(spark, d)),
      ("l67_image_neardup",
        "Image near-dup: codec stage repartitioned by CORES (CPU-bound " +
          "mapPartitions), candidate join keyed on (band pos, band value) " +
          "with hot buckets dropped — no CartesianProduct.",
        () => graft.queries.LlmQueries.queries("l67_image_neardup")(spark, d)),
      ("l70_audio_neardup",
        "Audio envelope near-dup: same keyed (band pos, band value) " +
          "candidate join as l67 via the shared bandedHashPairs — no " +
          "CartesianProduct; codec stage repartitioned by cores.",
        () => graft.queries.LlmQueries.queries("l70_audio_neardup")(spark, d)),
      ("l69_audio_decode",
        "WAV decode gate: map-only codec stages (synth -> decode) + one " +
          "partial-agg reduction; repartitioned by cores, no join.",
        () => graft.queries.LlmQueries.queries("l69_audio_decode")(spark, d)),
      ("l71_jpeg_invariant_neardup",
        "JPEG-leg dHashes, same keyed band join as l67 — no " +
          "CartesianProduct; the lossy re-encode runs inside the codec " +
          "mapPartitions stage.",
        () => graft.queries.LlmQueries.queries("l71_jpeg_invariant_neardup")(spark, d)),
      ("l72_video_frame_sample",
        "Multi-frame GIF decode: map-only codec stages + one partial-agg " +
          "reduction; repartitioned by cores, no join.",
        () => graft.queries.LlmQueries.queries("l72_video_frame_sample")(spark, d)),
      ("l06_ann_bruteforce",
        "The 3-query side is broadcast; the corpus streams through one " +
          "codegen'd cosine + window top-k, never shuffled whole.",
        () => graft.queries.LlmQueries.queries("l06_ann_bruteforce")(spark, d)),
      ("l16_stratified_sample",
        "Pure map (hash bucket) + broadcast join with the rate table + one " +
          "final aggregate — the corpus is shuffled once, for the groupBy.",
        () => graft.queries.LlmQueries.queries("l16_stratified_sample")(spark, d)),
      ("l17_token_budget_mix",
        "The cumsum window runs over per-(lang,bucket) totals (tiny), the " +
          "corpus itself only sees a map + broadcast semi-join.",
        () => graft.queries.LlmQueries.queries("l17_token_budget_mix")(spark, d)),
      ("l18_curation_funnel",
        "Quality gate -> dedup -> mix composed with one materialization " +
          "per stage; counts are cheap aggregates over the cut lineage.",
        () => graft.queries.LlmQueries.queries("l18_curation_funnel")(spark, d)),
      ("l19_decontamination",
        "Eval postings broadcast (BroadcastHashJoin on shingle); the " +
          "corpus is one flatMap + join, its text never shuffled.",
        () => graft.queries.LlmQueries.queries("l19_decontamination")(spark, d)),
      ("l20_repetition_filter",
        "Per-doc repetition stats are a pure map stage; the only exchange " +
          "is the tiny per-language aggregate.",
        () => graft.queries.LlmQueries.queries("l20_repetition_filter")(spark, d)),
      ("vcf_where_region_pushdown",
        "WHERE-derived region reaches the GraftScan description (tabix " +
          "chunk pruning); residual filter keeps results exact.",
        () => spark.read.format("vcf").load(s"$fx/vcf/index.vcf.gz")
          .filter(org.apache.spark.sql.functions.expr(
            "vcf_region_filter('1:3000-3400', chrom, pos)"))),
      ("fasta_projection_pruning",
        "Projecting one column: ReadSchema/cols shows only `id` — the " +
          "parser never materializes sequences.",
        () => spark.read.format("fasta").load(s"$fx/fasta/test.fasta")
          .select("id")),
      ("l22_span_dedup",
        "Substring-level dedup: span-keyed aggregation + one keyed join " +
          "back — no pairwise compare, cost O(total spans).",
        () => graft.queries.LlmQueries.queries("l22_span_dedup")(spark, d)),
      ("gff_auto_broadcast_join",
        "SupportsReportStatistics: the small GFF reports post-pruning " +
          "bytes, so Catalyst picks BroadcastHashJoin with NO hint — the " +
          "annotation-join shape at 100 TB needs no user tuning.",
        () => {
          val gff = spark.read.format("gff").load(s"$fx/gff/test.gff")
          val big = spark.range(500000000L).toDF("id")
          big.join(gff, big("id") === gff("start"))
        }),
      ("vcf_numeric_columnar_scan",
        "Primitive-only projection runs columnar: BatchScan emits " +
          "ColumnarBatch and Spark inserts codegen'd ColumnarToRow over " +
          "on-heap vectors.",
        () => spark.read.format("vcf").load(s"$fx/vcf/index.vcf")
          .select("pos")),
      ("gff_feature_scan_pruned",
        "Text-feature scan (the b12 shape): projection pruning reaches the " +
          "byte-span parser — GraftScan lists only type/start/end, the " +
          "attributes map is never parsed.",
        () => spark.read.format("gff").load(s"$fx/gff/test.gff")
          .filter(org.apache.spark.sql.functions.col("type") === "gene")
          .groupBy().sum("start")),
      ("fasta_string_columnar_scan",
        "String projections ALSO run columnar: RefColumnVector hands the " +
          "parser's UTF8String references to codegen with zero byte " +
          "copies — ColumnarToRow over BatchScan fasta.",
        () => spark.read.format("fasta").load(s"$fx/fasta/test.fasta")
          .select("sequence")),
      ("q44_grouping_sets",
        "Three groupings (per-returnflag, per-linestatus, grand total) " +
          "through ONE Expand-fed shuffle — a single parquet scan, not three.",
        () => graft.queries.RelationalQueries.queries("q44_grouping_sets")(spark, d)),
      ("q45_bloom_semijoin_prune",
        "Build-side key bloom broadcasts and filters the probe BELOW the " +
          "join: pruned rows never reach the exchange; the exact join " +
          "removes false positives so results equal the plain join.",
        () => graft.queries.RelationalQueries.queries("q45_bloom_semijoin_prune")(spark, d)),
      ("l27_sequence_packing",
        "Two-level distributed prefix sum: the only unpartitioned window " +
          "runs over per-block totals (one row per 64 docs); the per-doc " +
          "window is partitionBy(block) — parallel tiny sorts.",
        () => graft.queries.LlmQueries.queries("l27_sequence_packing")(spark, d)),
      ("l25_semantic_dedup",
        "SemDeDup: centroid assignment is a broadcast join; the pair join " +
          "is keyed on cluster id — pairwise work O(sum cluster^2), never " +
          "cartesian.",
        () => graft.queries.LlmQueries.queries("l25_semantic_dedup")(spark, d)),
      ("gff_multi_region_where",
        "OR-of-region WHERE: both (chrom, lo, hi) branches reach the " +
          "GraftScan region list for tabix chunk pruning; the OR stays a " +
          "residual filter so the scan is exact.",
        () => spark.read.format("gff")
          .load(s"$fx/gff-index/gencode.v38.polyAs.gff.gz")
          .filter(org.apache.spark.sql.functions.expr(
            "(seqname = 'chr1' AND start <= 200000 AND `end` >= 100000)" +
              " OR seqname = 'chr2'"))),
      ("q50_salted_skew_join",
        "Explicit skew salting: SortMergeJoin keys include the salt, so a " +
          "hot user key spreads over 16 tasks; SHUFFLE_MERGE hint keeps " +
          "the demonstration from degenerating to a broadcast.",
        () => graft.queries.RelationalQueries.queries("q50_salted_skew_join")(spark, d)),
      ("l32_deterministic_sample",
        "Global smallest-k sample plans as TakeOrderedAndProject: " +
          "per-partition top-k heaps + a k-row merge — no global sort, no " +
          "full-corpus exchange.",
        () => graft.queries.LlmQueries.queries("l32_deterministic_sample")(spark, d)),
      ("q51_trailing_range_window",
        "Both trailing 1-hour RANGE aggregates share ONE Window keyed on " +
          "user_id (hash exchange, per-user sort only); the range exchange " +
          "above it orders only the per-user aggregate rows.",
        () => graft.queries.RelationalQueries.queries("q51_trailing_range_window")(spark, d)),
      ("q53_cdc_compaction",
        "WindowGroupLimit (rank-limit pushdown) keeps only per-key top-1 " +
          "candidates ahead of the (user_id, event_type)-keyed window; no join.",
        () => graft.queries.RelationalQueries.queries("q53_cdc_compaction")(spark, d)),
      ("q54_sliding_wau",
        "Sliding distinct via Generate explode + keyed aggregates with " +
          "map-side partials; no Window over the corpus, no join.",
        () => graft.queries.RelationalQueries.queries("q54_sliding_wau")(spark, d)),
      ("l40_tokenizer_maxmatch",
        "Segmentation DP runs as a codegen'd aggregate fold over the " +
          "checkpointed vocabulary (no UDF, no parquet rescan); output is " +
          "the bounded TakeOrderedAndProject top-10.",
        () => graft.queries.LlmQueries.queries("l40_tokenizer_maxmatch")(spark, d)),
      ("l43_tokenize_pack",
        "BPE word stats broadcast into one corpus explode+join+aggregate; " +
          "pack offsets from the block-keyed window over broadcast block totals.",
        () => graft.queries.LlmQueries.queries("l43_tokenize_pack")(spark, d)),
      ("l36_pq_adc_search",
        "PQ ADC search: per-query integer distance tables broadcast; the " +
          "scan touches only the 4-byte code columns, scores by table " +
          "lookup, and top-k is a per-query window.",
        () => graft.queries.LlmQueries.queries("l36_pq_adc_search")(spark, d)),
      ("l51_budget_waterfill",
        "Water-filling allocation: waterline math rides the k-row domain " +
          "aggregate (1-row broadcasts); the corpus is touched by one " +
          "count aggregate and one per-domain rank window only.",
        () => graft.queries.LlmQueries.queries("l51_budget_waterfill")(spark, d)),
      ("l53_novelty_scores",
        "Novelty attribution: two keyed aggregates (shingle-min, doc " +
          "credit count), no window, no cartesian.",
        () => graft.queries.LlmQueries.queries("l53_novelty_scores")(spark, d)),
      ("l54_token_decontamination",
        "Token-level decontamination: vocabulary-sized broadcast for the " +
          "BPE join, doc-keyed reassembly aggregate, broadcast LeftSemi " +
          "against the eval gram set.",
        () => graft.queries.LlmQueries.queries("l54_token_decontamination")(spark, d)),
      ("q64_part_cooccurrence",
        "Market-basket pairs: keyed self-join on l_orderkey with baskets " +
          "wider than 32 excluded via a LeftSemi width filter (counted in " +
          "n_overflow_orders) — candidate volume capped even under skew; " +
          "the only BNLJs are the 1-row total/overflow broadcasts. The " +
          "INITIAL plan below shows 4 basket subtrees; at runtime AQE " +
          "stage reuse collapses them to ONE lineitem scan + ONE basket " +
          "exchange reused 3x (FINAL executed plan asserted by " +
          "PlanAuditSpec 'q64: AQE reuses the basket exchange').",
        () => graft.queries.RelationalQueries.queries("q64_part_cooccurrence")(spark, d)),
      ("q70_merge_upsert_log",
        "Lakehouse MERGE: both sides compact with ONE window keyed on the " +
          "merge key (WindowGroupLimit pushes top-1 map-side), a single " +
          "keyed FULL OUTER join resolves matched/not-matched.",
        () => graft.queries.RelationalQueries.mergeUpsertLog(spark, d)),
      ("q71_indexed_merge_rows",
        "The same MERGE shape feeding the indexed bgzf+.tbi VCF sink: " +
          "window-compacted delta, keyed FullOuter, no cartesian.",
        () => graft.queries.RelationalQueries.indexedMergeRows(spark)),
      ("q66_gapfill",
        "Gap fill: dense grid from a generator (no driver loop), " +
          "forward-fill window partitioned per series.",
        () => graft.queries.RelationalQueries.queries("q66_gapfill")(spark, d)),
      ("q68_sketch_merge",
        "Mergeable HLL: per-day sketch states aggregated, union-merged " +
          "without reprocessing raw events; exact check is a separate " +
          "1-row broadcast.",
        () => graft.queries.RelationalQueries.queries("q68_sketch_merge")(spark, d)),
      ("l58_source_minhash",
        "Mergeable MinHash via the native minhash_agg " +
          "TypedImperativeAggregate: ONE aggregation pass (partial " +
          "update + executor merge) builds every source signature; " +
          "estimate join keyed on position.",
        () => graft.queries.LlmQueries.queries("l58_source_minhash")(spark, d)),
      ("l63_oov_curve",
        "OOV curve: ranking window over the Zipf-bounded vocabulary " +
          "only; all four cutoffs fold into one conditional aggregate.",
        () => graft.queries.LlmQueries.queries("l63_oov_curve")(spark, d)),
      ("q69_reconciliation",
        "DAU churn: FULL OUTER join keyed on (user, day); the shifted " +
          "self-join co-partitions, no cartesian anywhere.",
        () => graft.queries.RelationalQueries.queries("q69_reconciliation")(spark, d))
    )

    val sb = new StringBuilder
    sb.append("# PLANS — flagship physical plans (`explain formatted`)\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.tools.PlanDump\"` ")
    sb.append(s"(sf dir: $d). PlanAuditSpec asserts the load-bearing\n")
    sb.append("properties below on every test run; this file is the same\n")
    sb.append("evidence in reviewable form.\n")
    entries.foreach { case (name, note, mk) =>
      val plan = mk().queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${entries.size} plans)")
    spark.stop()
  }
}
