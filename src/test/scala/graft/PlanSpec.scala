package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries

/** Physical-plan assertions: the 100 TB posture checked mechanically
  * (SURVEY §6 perf levers). A query that passes its oracle but plans a
  * cartesian product or skips a broadcast would regress silently
  * without these.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfTiny).queryExecution.executedPlan.toString

  test("dim joins broadcast the small side (nation/region/supplier)") {
    assert(plan("q10_join_inner").contains("BroadcastHashJoin"))
    assert(plan("q17_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("semi/anti joins plan as joins, not subquery re-scans") {
    assert(plan("q14_join_semi").contains("LeftSemi"))
    assert(plan("q15_join_anti").contains("LeftAnti"))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    assert(plan("q32_topk").contains("TakeOrderedAndProject"))
  }

  test("flagship agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q01_agg_tpch1")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(p.contains("HashAggregate"))
  }

  test("aggregation is partial+final (map-side combine before shuffle)") {
    val p = plan("q01_agg_tpch1")
    // two HashAggregate operators around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("whole-stage codegen covers the relational hot path") {
    // codegen'd operators print with a *(stageId) prefix; AQE only
    // renders the final (codegen-annotated) plan after execution
    val df = SparkEntry.queries("q01_agg_tpch1")(spark, sfTiny)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("no accidental cartesian products anywhere in the gated catalog") {
    val exempt = Set("q16_join_cross") // the intentional cross join
    val offenders = SparkEntry.queries.keys.filterNot(exempt).filter { q =>
      try {
        val p = SparkEntry.queries(q)(spark, sfTiny).queryExecution.executedPlan.toString
        p.contains("CartesianProduct")
      } catch { case _: Throwable => false } // streaming plans throw on executedPlan
    }
    assert(offenders.isEmpty, s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("unpartitioned WindowExec appears only in the bounded-by-construction whitelist") {
    // a global (no PARTITION BY) window moves ALL rows to one
    // partition — a scale-killer unless its input is bounded by
    // construction (a k-row sketch, an nQ-point ladder, a
    // maxDepth-row profile, a per-chunk offset table). This audit
    // pins the whitelist so a new query can't silently ship an
    // unbounded single-partition window. Prefixes because several
    // queries share kernels.
    val allowed = Set(
      // bounded-input windows (run over sketch/offset/grid frames):
      "q142_pack_sequences", "q142b_pack_by_subword", // chunk-offset table, #docs/chunkSize rows
      "q146_heavy_hitters", // rank over the bounded candidate set
      "q156c_mixture_temperature", // rate table, #sources rows
      "q157b_zipf_slope", // top-K vocabulary frame
      "q168_vocab_tokenize", // vocab table
      "q192_hist_quantile", "q207_ks_drift", // ladder walks, nBuckets rows
      "q200_attribution", // share-of-total over the grouped #sources frame
      "q209c_effective_diameter", // maxDepth+1-row profile
      "q262_calibration", // ECE fold over the <= nBins-row bin frame
      "q25d_value_counts_norm", // distinct values of a low-card column
      "q33b_factorize", "q33c_ngroup", // code dimension (distinct keys)
      "q277_categorify", // vocab rank window, bounded by category cardinality (categorical by contract; scaladoc names the hash-bucket swap for id-like columns)
      "q57_dt_resample", // calendar grid
      "q92f_lsh_plan", // band-count factorization grid
      // documented full-column tiers with a named scale swap:
      "q31b_searchsorted", "q31c_searchsorted_large", // prefix step (scaladoc'd)
      "q284_cdf_transform", // searchSortedLarge offsets window over the numParts-row count frame (bounded by construction)
      "q151b_perplexity_filter", // exact global deciles (gate tier; production assigns by histogram thresholds)
      "q298_seasonal_decompose", // trend MA over the SLOT series (time-range-bounded: one row per bucketSeconds; scaladoc'd aggregate-first discipline)
      // suffix-rank family: the only global window is the partition-
      // OFFSET cumsum over the #partitions-row count frame (the
      // searchSortedLarge pattern) + the bounded char-vocab rank
      "q321_suffix_spans", "q321b_suffix_rewrite", "q322_dup_attribution"
    )
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    def unwrap(p: SparkPlan): Seq[SparkPlan] =
      p +: p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .flatMap(unwrap)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { q =>
      try {
        val p = SparkEntry.queries(q)(spark, sfTiny).queryExecution.executedPlan
        val hasGlobal = unwrap(p).exists(_.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.nonEmpty)
        hasGlobal && !allowed(q)
      } catch { case _: Throwable => false } // streaming plans throw
    }
    assert(offenders.isEmpty,
      s"NEW unbounded single-partition window in: ${offenders.mkString(", ")}")
  }

  test("factorize broadcasts the code dimension, never shuffles the fact side") {
    val p = plan("q33b_factorize")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("ngroup numbers the distinct-key frame and broadcasts it back") {
    val p = plan("q33c_ngroup")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("binning aggregates partial+final on the computed bin key") {
    val p = plan("q25b_binning")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // bin arithmetic must not block column pruning: only price is read
    assert(p.contains("ReadSchema: struct<l_extendedprice"), p)
  }

  test("ffill/bfill is a single exchange on the partition key") {
    val p = plan("q77_ffill_bfill")
    // one hash exchange for the window, one range exchange for the
    // final orderBy — no per-frame re-shuffle
    assert("hashpartitioning".r.findAllIn(p.toLowerCase).size == 1, p)
  }

  test("nearest as-of computes both fills in ONE window pass, one exchange") {
    val p = plan("q132_asof_nearest")
    assert("hashpartitioning".r.findAllIn(p.toLowerCase).size == 1, p)
    assert("Window".r.findAllIn(p).size == 1, p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("wordpiece tokenization is a pure map stage — zero exchanges") {
    // the 100 TB contract of q109: tokenize scales as a scan, so the
    // plan may not contain any shuffle (and no Generate row blowup)
    val p = graft.ops.TextAnalysis
      .wordpieceTokenize(Tables.documents(spark, sfTiny), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Generate"), p)
  }

  test("token-budget mixture broadcasts the rate table, never the corpus") {
    val counted = graft.ops.TextAnalysis
      .wordpieceTokenize(Tables.documents(spark, sfTiny), "doc_id", "text")
      .join(Tables.documents(spark, sfTiny).select(col("doc_id"), col("lang")), "doc_id")
    val p = graft.ops.Corpus.mixtureResampleTokens(counted, "doc_id", "lang",
        col("n_tokens"), Map("en" -> 0.5, "es" -> 0.3, "zh" -> 0.2), 25000)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // corpus side never shuffles for the rates
  }

  test("ewm family is one hash exchange on the group key (+ gate sort)") {
    // the collect_list aggregation is partial+final over ONE
    // hashpartitioning; no joins, no extra shuffles beyond the final
    // presentation orderBy (a range exchange)
    for (q <- Seq("q74b_ewm_mean", "q74c_ewm_var_std", "q74e_ewm_ignore_na")) {
      val p = plan(q)
      assert("hashpartitioning".r.findAllIn(p.toLowerCase).size == 1, s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
    }
  }

  test("segmented ewm adds only the bounded carry join, never a cartesian") {
    val p = plan("q74f_ewm_segmented")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // carry table joins back on (key, seg) — an equi-join
    assert(p.contains("Join"), p)
  }

  test("interpolate options stay a single window pass (one hash exchange)") {
    val p = plan("q77c_interpolate_opts")
    assert("hashpartitioning".r.findAllIn(p.toLowerCase).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("bm25 broadcasts df/idf and the scalar stats, never sort-merges") {
    val p = plan("q152b_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("containment decon broadcasts the benchmark side") {
    val p = plan("q140c_containment")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("stratified split is a pure map + partial/final agg — no joins") {
    val p = plan("q143b_stratified_split")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial"), p) // map-side combine before the exchange
  }

  test("bpe encode broadcasts the learned dictionary — corpus text never shuffles") {
    val p = graft.ops.Bpe
      .encode(Tables.documents(spark, sfTiny), "doc_id", "text", nMerges = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("replace/filter tokens are pure map stages — zero exchanges") {
    for (q <- Seq("q163_replace_tokens", "q164_filter_tokens")) {
      val p = graft.SparkEntry.queries(q)(spark, sfTiny)
        .queryExecution.executedPlan.toString
      // only the presentation orderBy may exchange (a range partition)
      assert(!p.toLowerCase.contains("hashpartitioning"), s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
    }
  }

  test("vocab tokenize broadcasts the vocabulary — corpus never sort-merges") {
    val p = plan("q168_vocab_tokenize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("substring-dedup rewrite has no cartesian and no nested loop") {
    val p = plan("q154b_dedup_substrings")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("KN LM broadcasts only the 1-row type count — all other joins keyed") {
    val p = plan("q151c_kn_lm")
    assert(!p.contains("CartesianProduct"), p)
    // the single nested-loop allowed is the 1-row types crossJoin,
    // which Spark plans as BroadcastNestedLoopJoin over one row
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("mixture upsample broadcasts the rate table; replication is a map-stage explode") {
    val p = graft.ops.Corpus.mixtureUpsample(
        Tables.documents(spark, sfTiny), "doc_id", "lang",
        targets = Map("en" -> 0.5, "zh" -> 0.5), budget = 1000)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Generate"), p) // the sequence-explode replication
  }

  test("blocked embedding dedup joins on the bucket key — no cartesian") {
    val p = plan("q96b_dedup_embedding_blocked")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("PQ ADC scan: codes side never shuffles — queries broadcast, no sort-merge") {
    val p = plan("q99c_ann_pq")
    // the candidate expansion is the broadcast-nested-loop of the tiny
    // query set against the codes scan (bruteForceTopK's shape); the
    // only hash exchange allowed is the per-query top-k window
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("IVF-PQ: probes broadcast onto the codes scan — no sort-merge, no cartesian") {
    val p = plan("q99d_ann_ivfpq")
    // candidate generation is an equi-join on the cluster key with the
    // probe set broadcast; the codes side never hash-exchanges
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("viterbi tokenize: segmentation is a map stage — no join touches the corpus text") {
    val p = plan("q170_viterbi_tokenize")
    // vocab derivation joins nothing; the segmentation UDF runs over a
    // scan+project; only aggregation/top-k exchanges appear
    assert(!p.contains("Join"), p)
  }

  test("RRF fusion joins only top-k-bounded ranking lists") {
    val p = plan("q97c_rrf_fusion")
    assert(!p.contains("CartesianProduct"), p)
    // the corpus side appears only under broadcast candidate generation
    // (bruteforce/lsh shapes); the fusion join itself is tiny-vs-tiny
    assert(p.contains("FullOuter") || p.contains("full_outer") || p.contains("FULL OUTER"), p)
  }

  test("gopher rules are a scan-only projection — zero joins, zero hash exchanges") {
    val p = graft.ops.TextAnalysis.gopherRules(
        Tables.documents(spark, sfTiny), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!p.toLowerCase.contains("hashpartitioning"), p)
  }

  test("set_index analog: range repartition + within-partition sort is sorted per partition") {
    val df = Tables.lineitem(spark, sfTiny)
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
    val ok = df.select(col("l_orderkey")).mapPartitions { it =>
      val v = it.map(_.getLong(0)).toSeq
      Iterator.single(v == v.sorted)
    }(org.apache.spark.sql.Encoders.scalaBoolean).collect()
    assert(ok.forall(identity))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"))
  }

  test("neighborAgg plans two keyed joins with partial aggregation, no cartesian") {
    val p = plan("q247_neighbor_agg")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // map-side combine on both hop aggregations
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("cascadePurgePlan plans key-only semi joins, no row data crosses tables") {
    val p = plan("q248_cascade_purge")
    assert(p.contains("LeftSemi"), p)
    // the only nested-loop is the 1-row x 1-row aggregate crossJoin
    // (bounded scalar join); no unkeyed join over table data
    assert(!p.contains("CartesianProduct"), p)
    // the lineitem scan reads only the two key columns
    assert(p.contains("l_orderkey") && !p.contains("l_extendedprice"), p)
  }
}
