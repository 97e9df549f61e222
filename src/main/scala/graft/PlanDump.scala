package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dumps `explain formatted` for the headline queries into
  * PLANS.md — the plan-shape evidence behind the README's scale claims
  * (PlanAuditSuite asserts the same properties mechanically).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    EntryTuning.tuneEmbeddedDerby()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.ops.Tables.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    val headliners = Seq(
      "a1_pricing_summary" -> "two-phase hash aggregate over a pushed-filter scan",
      "j1_broadcast_star" -> "star join: dimension broadcast, fact never shuffles",
      "j2_sortmerge_join" -> "fact-fact sort-merge join on co-partitioned keys",
      "o4_topk_global" -> "global top-k via TakeOrderedAndProject (no full sort)",
      "y3_snapshot_diff" -> "sync diff: one full-outer sort-merge join on the PK",
      "l3_cosine_topk" -> "similarity: broadcast bounded queries, codegen cosine_sim",
      "l2b_minhash_lsh" -> "minhash: compiled per-doc signature pass (zero shuffle), band-bucket aggregate only",
      "j8_asof_join" -> "as-of join: union-tag + running-max window, one shuffle",
      "j9_interval_overlap" -> "interval overlap: (key, month-bucket) equi-join, per-bucket quadratic only",
      "l2c_simhash" -> "simhash: one explode + 16-lane packed-popcount hash aggregate",
      "o5b_topk_agg" -> "bounded top-k aggregator: map-side <=k buffer, partial+final",
      "l5i_pack" -> "sample packing: distributed prefix sum — persisted single tokenize pass, chunk offsets joined on the window's own key, local windows bounded to 1024 rows",
      "o5c_topk_exec" -> "custom BoundedTopKExec: per-group k-heaps behind a clustered exchange, no sort",
      "sql_q18_large_orders" -> "IN over aggregated HAVING: left-semi against the aggregate",
      "l10_contamination" -> "contamination screen: eval gram set broadcast, corpus streams one pass",
      "a16_hll_union" -> "mergeable HLL rollup: partial sketches union upward, fact scanned once",
      "y9_incremental_agg" -> "incremental aggregate maintenance: PK-join deltas merged into the old summary, no fact rescan",
      "sql_lateral_topk" -> "LATERAL ORDER BY/LIMIT subquery decorrelated into a ranked window join",
      "l2a_shingle_jaccard" -> "blocked Jaccard: compiled long-hashed item sets, shuffle_hash self-join (no driver broadcast of the probe)",
      "o1_global_sort" -> "global sort: range-partitioning exchange from sampled bounds, explicit NULLS FIRST",
      "l4c_ivf_multiprobe" -> "multi-probe IVF: per-row codegen argmax assignment over the inlined codebook (zero expansion, zero shuffle), max_by partial-agg re-rank",
      "y13b_table_profile_approx" -> "approx table profile: one scan of mergeable HLL++ sketches, no Expand (exact-NDV scaffolding split into single-distinct aggs)",
      "sql_q20_promotion_parts" -> "q20 double-nested IN + correlated scalar: decorrelated into a semi-join chain over the partsupp surrogate, no cartesian",
      "y17_fk_consistent_sync" -> "FK-consistent parent+child sync: per-year rollups, broadcast dirty-year pruning on both tables, equi-join orphan audit — no cartesian, no fact-wide diff",
      "y20_hierarchical_narrow" -> "hierarchical digest narrowing: persisted year-level Merkle compare, month rescan broadcast-semi-gated on the dirty-year set",
      "y17b_fk_multi_child" -> "multi-child FK sync: shared parent plan/copy, per-child broadcast dirty-set prunes + orphan audits, children independent",
      "y21_retention_fallback" -> "retention decision: 2-row scenario broadcast over the log, single latest-wins window for the state rollup",
      "y22_column_subset_sync" -> "column-subset apply: classification and apply ride ONE full-outer PK sort-merge join, target-owned columns pass through",
      "y23_three_way_diff" -> "three-way diff: tagged union + ONE two-phase HashAggregate on the PK (no joins), hash as two longs to keep the hash-agg path",
      "l16_incremental_dedup" -> "incremental dedup: index side streams (batch band probes broadcast), only batch-sized state quadratic",
      "l17_e2e_pipeline" -> "end-to-end prep funnel: one corpus scan, content-hash window + band-bucket agg are the only corpus-sized shuffles",
      "y25_time_travel" -> "time travel: ONE interval window over the log + 4-row broadcast range join, hash-agg per cut — one scan for N historical states",
      "y26_consistent_cut" -> "watermark cut: strategy rows broadcast, one FK equi-join audit, counts conditional — no per-strategy rescans",
      "l4f_pq_ann" -> "PQ ANN: codegen'd per-row code assignment (no shuffle), ADC via CASE lookups against the broadcast query side, exact re-rank only on the broadcast shortlist",
      "w7_sessionize" -> "batch sessionization: lag + running sum + rollup over ONE user exchange, no self-join, no state store",
      "y29_bootstrap_seam" -> "bootstrap seam: one interval window over the log, three cursor variants from a 1-row broadcast, full-replay compare",
      "y30_dq_constraints" -> "DQ audit: N row-local checks as conditional counts in ONE aggregate, FK as a broadcast anti-join",
      "s16_bucketed_join" -> "bucketed co-located join: SortMergeJoin straight off the bucketed scans, ZERO Exchange on either side",
      "l20_cdc_chunks" -> "content-defined chunking: compiled per-doc kernel (zero shuffle), chunk-hash collision aggregate only",
      "l22_budget_select" -> "token-budget selection: band-cutoff instead of a global quality sort — tiny band-table prefix window, doc-level pass only inside the cutoff band",
      "l23_fuzzy_contamination" -> "fuzzy decontamination: corpus streams through the broadcast eval band table, exact-Jaccard verify only on LSH candidates",
      "y34_scd2_vacuum" -> "SCD2 vacuum: one (user) window builds history, vacuum is a filter, as-of certification via hash-agg summaries",
      "w10_resample" -> "grid resampling: per-user bounded sequence explode + union-tag LOCF window, one exchange")
    val sb = new StringBuilder
    sb.append("# PLANS — `explain formatted` for the headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` at $sf. These are the plans the\n")
    sb.append("100 TB design claims rest on; PlanAuditSuite asserts the same\n")
    sb.append("properties so regressions fail CI.\n")
    headliners.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $why\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
