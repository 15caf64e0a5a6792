package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/**
 * Plan-shape regression guards: PLANS.md's scale claims as executable
 * assertions. These don't run the queries — they inspect the physical
 * plan — so a future refactor that silently drops a pushdown, a
 * map-side group limit, or a broadcast (the properties that matter at
 * 100 TB) fails the suite instead of only showing up as a slow bench.
 */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    val s = df.queryExecution.explainString(FormattedMode)
    CacheScope.drain(spark)
    s
  }

  test("get_neighbors_out: seed pushdown + map-side per-vertex limit") {
    val p = plan("q_get_neighbors_out")
    assert(p.contains("PushedFilters") && p.contains("In(o_custkey"),
      "vertex seed set must reach the parquet scan")
    assert(p.contains("WindowGroupLimit"),
      "per-vertex limit must partial-apply before the shuffle")
  }

  test("random_project: pure narrow map, no exchange at all") {
    val p = plan("q_random_project")
    assert(!p.contains("Exchange"),
      s"a projection must not shuffle:\n$p")
  }

  test("rolling_window: exactly one user-keyed shuffle, no self-join") {
    val p = plan("q_rolling_window")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).length == 1,
      s"the RANGE frame needs ONE user shuffle, found more:\n$p")
    assert(!p.contains("Join"), "no time-band self-join")
  }

  test("knn_graph / fuzzy_pairs: bucketed equi-joins, never cartesian") {
    assert(!plan("q_knn_graph").contains("CartesianProduct"))
    assert(!plan("q_fuzzy_pairs").contains("CartesianProduct"))
  }

  test("partitioned_scan: source filter prunes at the partition level") {
    val p = plan("q_partitioned_scan")
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s+", " ").matches("(?s).*PartitionFilters: \\[[^\\]]*source[^\\]]*\\].*"),
      s"the source predicate must be a PARTITION filter (no data read " +
        s"from other partitions), not a row filter:\n$p")
  }

  test("scan_vertex_page: keyset cursor is a pushed scan, no exchange") {
    val p = plan("q_scan_vertex_page")
    assert(p.contains("GreaterThan(c_custkey,50"))
    assert(!p.contains("Exchange hashpartitioning"),
      s"pagination must not shuffle:\n$p")
  }

  test("decontaminate: benchmark side broadcasts, corpus never self-joins") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"))
    // exactly two parquet scans (corpus shingles + bench shingles) —
    // a third would mean the corpus subtree got duplicated
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 2, p)
  }

  test("ann_topk: broadcast query side, codegen'd dot product") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("dotp") || p.contains("DotProduct") ||
      p.toLowerCase.contains("dot"), "native DotProduct in the plan")
  }

  test("weighted_sample + stratified: map-side WindowGroupLimit") {
    assert(plan("q_weighted_sample").contains("WindowGroupLimit"))
    assert(plan("q_stratified_sample").contains("WindowGroupLimit"))
  }

  test("token_entropy: both aggregations partial-apply before exchanges") {
    val p = plan("q_token_entropy")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"token entropy needs exactly two shuffles:\n$p")
  }

  test("events_enrich: dim side broadcasts, event side never shuffles") {
    val p = plan("q_events_enrich")
    assert(p.contains("BroadcastHashJoin"),
      "dimension enrichment must broadcast the dim table")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the event stream must not shuffle for a broadcast join:\n$p")
  }

  test("chunk_windows: pure narrow map, no exchange at all") {
    val p = plan("q_chunk_windows")
    assert(!p.contains("Exchange"),
      s"chunking must be shuffle-free:\n$p")
  }

  test("lookup_prefix_range: hints become pushed conjunctive predicates") {
    val p = plan("q_lookup_prefix_range")
    assert(p.contains("EqualTo(l_returnflag,R)"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
  }

  test("quality_classifier: pure narrow scan, zero exchanges") {
    val p = plan("q_quality_classifier")
    assert(!p.contains("Exchange"),
      s"the classifier is a per-row scorer — it must not shuffle:\n$p")
  }

  test("bigram_score: one tokenize (persisted pair frame feeds LM + score)") {
    val p = plan("q_bigram_score")
    // the pair explode must come from the InMemoryRelation, not three
    // re-reads of documents.parquet
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 1,
      s"corpus must be tokenized once via the persisted pair frame:\n$p")
  }

  test("split_assign: zero-shuffle narrow scan (incremental-split law)") {
    val p = plan("q_split_assign")
    assert(!p.contains("Exchange"),
      s"split assignment must be a pure per-row map:\n$p")
  }

  test("contrastive_pairs: anchors broadcast, corpus never self-joins") {
    val p = plan("q_contrastive_pairs")
    assert(p.contains("BroadcastExchange"),
      s"the bounded anchor side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-sized join may appear:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-anchor top-k must partial-apply map-side:\n$p")
  }

  test("collocations: token arrays materialize once for both explodes") {
    val p = plan("q_collocations")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 1,
      s"unigram and bigram explodes must share the persisted token frame:\n$p")
  }

  test("cursor-pruned range scan: files behind the cursor never read") {
    // SURVEY §7.4 pt 7 at rest: on range-partitioned storage the keyset
    // cursor must prune FILES (via the static partition filter), not
    // just rows inside a full scan.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    // width = keys/15 partitions, cursor at 80% of the key space — the
    // fixture-independent statement of "resume near the end"
    val maxKey = cust.agg(org.apache.spark.sql.functions.max("c_custkey"))
      .head.getLong(0)
    val width = math.max(1L, (maxKey + 1) / 15)
    val cursor = maxKey * 4 / 5
    graft.operators.Scan.writeRangePartitioned(cust, dir, "c_custkey", width)
    val totalFiles = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(_.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val table = spark.read.parquet(dir)
    val page = graft.operators.Scan.pageRangePruned(table, "c_custkey",
      width, Seq("c_name"), limit = 40, cursor = Some(cursor))
    val rows = page.collect()
    assert(rows.nonEmpty && rows.map(_.getLong(0)).forall(_ > cursor))
    val scan = page.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "the cursor's coarse-range bound must be a static partition filter")
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles > 0 && readFiles < totalFiles / 3,
      s"cursor at 80% of the key space must prune most files: read " +
        s"$readFiles of $totalFiles")
    // the exact key bound still reaches the parquet reader as a row
    // predicate inside the surviving files
    assert(page.queryExecution.explainString(FormattedMode)
      .contains(s"GreaterThan(c_custkey,$cursor)"))
  }

  test("pq encode + adc: codebooks/tables broadcast into the corpus " +
      "joins") {
    // NOTE: the cached codebook lineage contains k-row SortMergeJoins
    // from the training chain (harmless, centroid-sized); the guard
    // here is that the CORPUS-side joins — encode and ADC lookup —
    // are broadcast-built, never a corpus shuffle-join.
    val pc = plan("q_pq_codes")
    assert("Broadcast(NestedLoop|Hash)Join".r.findFirstIn(pc).isDefined,
      s"the m*k codebook must broadcast into the encode join:\n$pc")
    val pa = plan("q_pq_adc")
    assert("Broadcast(NestedLoop|Hash)Join".r.findFirstIn(pa).isDefined,
      s"the per-query distance tables must broadcast:\n$pa")
    assert(pa.contains("WindowGroupLimit"),
      s"per-query top-k must partial-apply map-side:\n$pa")
  }

  test("bin_quantiles: partial count before the bin exchange, " +
      "permille frame broadcast, one-column scan") {
    val p = plan("q_bin_quantiles")
    assert(p.contains("partial_count"),
      s"bin counts must map-side combine (the merge law):\n$p")
    assert(p.contains("ReadSchema: struct<l_extendedprice:double>"),
      s"the scan must prune to the value column alone:\n$p")
    assert("Broadcast(NestedLoop|Hash)Join".r.findFirstIn(p).isDefined,
      s"the permille probe frame must broadcast:\n$p")
  }

  test("zorder audit: bucket-keyed windows (no unpartitioned corpus " +
      "window), offsets frame broadcast") {
    val p = plan("q_zorder_skipping")
    // every Window sorts within a _bkt hash partition or the tiny
    // offsets frame; the corpus-sized rank pass must be keyed
    assert(p.contains("hashpartitioning(_bkt"),
      s"local ranks must partition by the coarse bucket:\n$p")
    assert(!p.contains("CartesianProduct"), "no cross join")
  }

  test("compaction plan: single window over file metadata, " +
      "partitioned by table-partition") {
    val p = plan("q_compaction_plan")
    assert(p.contains("hashpartitioning(source"),
      s"the prefix-sum window must partition by the table partition:\n$p")
    assert(!p.contains("Join"), "a planner is one pass, no joins")
  }

  test("json_props: narrow extraction, one aggregation shuffle") {
    val p = plan("q_json_props")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"the rollup must partial-aggregate before its exchange:\n$p")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).length == 1,
      s"promote-then-rollup is ONE shuffle:\n$p")
  }

  test("star_join: every dimension broadcasts; the fact side never " +
      "cartesians") {
    val p = plan("q_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"dimension joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no unkeyed join")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "revenue aggregate must partial-apply")
  }

  test("cube_stats: Expand-based grouping sets, one aggregate shuffle") {
    val p = plan("q_cube_stats")
    assert(p.contains("Expand"), s"CUBE must plan as Expand:\n$p")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).length == 1,
      s"all 2^k marginals in ONE shuffle:\n$p")
  }

  test("pit_join: as-of stream merge — union + ONE running window, " +
      "never a facts x versions range join") {
    val p = plan("q_pit_join")
    assert(p.contains("Union"), "facts and changelog ride ONE stream")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "the carry-forward is a running window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no range-predicate join:\n$p")
  }

  test("incr_agg: delta pre-aggregates (map-side combine) before the " +
      "merge join with the base aggregate") {
    val p = plan("q_incr_agg")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"delta must partial-aggregate before its exchange:\n$p")
    assert(p.contains("FullOuter") || p.contains("full_outer") ||
      p.contains("FullOuterJoin") || p.contains("SortMergeJoin FullOuter"),
      s"base/delta merge is a full-outer join:\n$p")
  }

  test("hll_intersect: register aggregate tail, scalar frames broadcast") {
    val p = plan("q_hll_intersect")
    assert(p.contains("BroadcastExchange"),
      s"the one-row estimate frames must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      "scalar attach is broadcast, not cartesian")
  }

  test("resource_alloc / entity_resolution: capped pair-gen, no cartesian") {
    assert(!plan("q_resource_alloc").contains("CartesianProduct"))
    assert(!plan("q_entity_resolution").contains("CartesianProduct"))
  }

  test("bpe_merges: corpus collapses to the vocab table before the " +
      "position explode (two aggregate shuffles + vocab-sized window)") {
    val p = plan("q_bpe_merges")
    assert(p.contains("partial_count"),
      s"word counting must partial-aggregate:\n$p")
    assert(!p.contains("Join"), "no join anywhere in the pair count")
  }

  test("pair_stats: ONE full-scan aggregate — no join, partial sums") {
    val p = plan("q_pair_stats")
    assert(!p.contains("Join"),
      s"every pair sum must ride one Tungsten pass, not a join:\n$p")
    assert(p.contains("partial_"),
      s"the moment sums must partial-aggregate map-side:\n$p")
  }

  test("window_topk: per-window rank plans as WindowGroupLimit") {
    val p = plan("q_window_topk")
    assert(p.contains("WindowGroupLimit"),
      s"rank <= k must partial-apply before the shuffle:\n$p")
  }

  test("peak_concurrency: local ranks partition by the hour bucket") {
    val p = plan("q_peak_concurrency")
    assert(p.contains("windowspecdefinition(hr#"),
      s"the corpus-sized running sum must partition by hour:\n$p")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
  }

  test("bucketed store join: co-located, zero shuffle on either side") {
    // SURVEY §2.1's SST-ingest claim made executable: two tables
    // bucketed+sorted on the same key join with NO Exchange — at
    // 100 TB this is the difference between a free merge and
    // re-shuffling both fact tables every run.
    import graft.sources.BucketedStore
    val spark0 = spark
    import spark0.implicits._
    val a = (1L to 500L).map(k => (k, s"a$k")).toDF("k", "va")
    val b = (1L to 500L).map(k => (k, k * 2)).toDF("k", "vb")
    BucketedStore.save(a, "psj_a", buckets = 8, keys = Seq("k"))
    BucketedStore.save(b, "psj_b", buckets = 8, keys = Seq("k"))
    // at 100 TB neither side broadcasts — force the SMJ path the
    // claim is about (tiny test tables would auto-broadcast)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = BucketedStore.load(spark, "psj_a")
        .join(BucketedStore.load(spark, "psj_b"), Seq("k"))
      val p = j.queryExecution.explainString(FormattedMode)
      assert(!p.contains("Exchange"),
        s"bucketed-bucketed equi-join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(j.count() == 500L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      CacheScope.drain(spark)
    }
  }

  test("bloom_probe: probes join the word-sized index by BROADCAST") {
    val p = plan("q_bloom_probe")
    assert(p.contains("BroadcastHashJoin"),
      s"the bloom index must broadcast against the probes:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("ivm_join: every delta term broadcasts — base tables never " +
      "shuffle into a sort-merge join") {
    val p = plan("q_ivm_join")
    assert(!p.contains("SortMergeJoin"),
      s"IVM deltas are batch-sized and must broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("textrank: global top-k plans as TakeOrderedAndProject") {
    val p = plan("q_textrank")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$p")
  }

  test("image_neardup: intra-block pair-gen — no join of any kind") {
    val p = plan("q_image_neardup")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"dims-blocked pair generation must be explode-based:\n$p")
  }

  // ---- round-11 shapes ----

  test("knn_refine: bucketed + capped 2-hop equi-joins, never cartesian") {
    val p = plan("q_knn_refine")
    assert(!p.contains("CartesianProduct"),
      s"the expansion must ride vertex-keyed equi-joins:\n$p")
  }

  test("interval_join_full: two-sided time band on a sort-merge join") {
    val p = plan("q_interval_join_full")
    assert(!p.contains("CartesianProduct"),
      "the interval join must stay key-partitioned")
    assert(p.contains("FullOuter") || p.contains("full_outer") ||
      p.contains("FullOuterJoin") || p.contains("SortMergeJoin FullOuter"),
      s"expected a full-outer join:\n$p")
  }

  test("weighted_matching: leaf output + partial vertex-min round") {
    // Since the r16 optimization round the matched output accumulates
    // through a checkpoint rotation, so the RETURNED plan must be a
    // leaf projection (nothing recomputes at output time — the shape
    // that fixed the recompute-through-released-checkpoint crash);
    // the per-round vertex-min map-side-combine law is asserted on
    // the same aggregate shape the round builds over the pair frame.
    import org.apache.spark.sql.functions.{col, count, lit, min}
    val pairs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy((col("l_partkey") % 50).as("a"),
        (col("l_suppkey") % 50 + 100).as("b"))
      .agg(count(lit(1)).as("w"))
    val df = graft.analytics.GraphAnalytics.weightedMatching(
      pairs, rounds = 8)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("Scan ExistingRDD"),
      s"matched output must be a checkpointed leaf:\n$p")
    assert(!p.contains("CartesianProduct"))
    val vminPlan = pairs
      .select(col("a").as("v"), col("w").as("p"))
      .unionByName(pairs.select(col("b").as("v"), col("w").as("p")))
      .groupBy(col("v")).agg(min(col("p")).as("mn"))
      .queryExecution.explainString(FormattedMode)
    CacheScope.drain(spark)
    assert(vminPlan.contains("partial_min") ||
      vminPlan.contains("partial min") ||
      vminPlan.toLowerCase.contains("partialmerge") ||
      vminPlan.contains("HashAggregate"),
      s"vertex-min must partial-apply:\n$vminPlan")
  }

  test("bpe_encode: application is one token explode + a vocab join") {
    val p = plan("q_bpe_encode")
    assert(!p.contains("CartesianProduct"))
    // the per-doc rollup must partial-aggregate before its exchange
    assert(p.contains("HashAggregate"),
      s"per-doc counts must map-side combine:\n$p")
  }
}
