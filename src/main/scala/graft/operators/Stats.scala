package graft.operators

import graft.model.GraphStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * StatisTask — whole-space statistics (reference: src/storage/admin/
 * StatisTask.cpp:105-272): vertices per tag, edges per edge type, space
 * totals with distinct-vid counting, and per-part in/out "correlativity"
 * histograms computed as `hash(dst) % parts`.
 *
 * Spark-first: per-tag/per-edge counts are map-side-combined `groupBy`
 * counts; distinct vids use exact `count_distinct` at oracle scale with
 * `approx_count_distinct` (HLL) offered for the 100 TB path; the
 * part-correlativity histogram keeps the reference's arithmetic
 * (`key mod parts`) so it is portable across engines.
 */
object Stats {

  /** One summary row per tag: (entity, row_count, distinct_vids). */
  def tagCounts(store: GraphStore): DataFrame =
    store.vertices.toSeq.sortBy(_._1).map { case (name, df) =>
      df.agg(
        lit(name).as("entity"),
        count(lit(1)).as("row_count"),
        count_distinct(col(GraphStore.VID)).as("distinct_vids"))
        .select("entity", "row_count", "distinct_vids")
    }.reduce(_ unionByName _)

  /** One summary row per edge type: (entity, row_count, distinct_srcs). */
  def edgeCounts(store: GraphStore): DataFrame =
    store.edges.toSeq.sortBy(_._1).map { case (name, df) =>
      df.agg(
        lit(name).as("entity"),
        count(lit(1)).as("row_count"),
        count_distinct(col(GraphStore.SRC)).as("distinct_vids"))
        .select("entity", "row_count", "distinct_vids")
    }.reduce(_ unionByName _)

  /** Scale path: HLL distinct vids per tag (no exact-distinct shuffle). */
  def tagCountsApprox(store: GraphStore, rsd: Double = 0.02): DataFrame =
    store.vertices.toSeq.sortBy(_._1).map { case (name, df) =>
      df.agg(
        lit(name).as("entity"),
        count(lit(1)).as("row_count"),
        approx_count_distinct(col(GraphStore.VID), rsd).as("approx_vids"))
        .select("entity", "row_count", "approx_vids")
    }.reduce(_ unionByName _)

  /**
   * Per-part correlativity histogram of an edge table: how many edges
   * land in each destination part (reference computes `hash(dst) %
   * parts`; we use `dst mod parts` — same shape, engine-portable).
   */
  def partHistogram(edges: DataFrame, parts: Int,
      byCol: String = GraphStore.DST): DataFrame =
    edges.groupBy(pmod(col(byCol), lit(parts)).as("part"))
      .agg(count(lit(1)).as("edge_count"))

  /**
   * Exact per-group quantiles of a numeric column (linear
   * interpolation — the `percentile` aggregate, same law as SQL
   * `quantile_cont`). Exact quantiles need the group's values sorted
   * somewhere; that is inherent. The scale path is
   * [[quantilesApprox]] — one pass, fixed-size t-digest-style sketch
   * per group, mergeable map-side.
   */
  def quantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
      probs: Seq[Double]): DataFrame = {
    val exact = probs.map(p =>
      graft.functions.Portable.quant(expr(s"percentile($valueCol, $p)"), 4)
        .as(s"p${(p * 100).toInt}"))
    df.groupBy(groupCols.map(col): _*).agg(exact.head, exact.tail: _*)
  }

  /** One-pass mergeable approximate quantiles for the 100 TB path. */
  def quantilesApprox(df: DataFrame, valueCol: String,
      groupCols: Seq[String], probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val aggs = probs.map(p =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).toInt}"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Hash-gateable mergeable quantiles — the 100 TB sketch with an
   * EXPLICIT accuracy contract: equi-width bin counts (one combinable
   * count shuffle; shards/days merge by ADDING bin counts, the same
   * law as the HLL/CMS registers), a running sum over the tiny
   * nBins-row frame, and quantile(p) = the first bin whose running
   * count reaches ceil(p·n). Error is bounded by one bin width —
   * deterministic and engine-portable, unlike percentile_approx whose
   * internal sketch can't face the oracle. All math is integer
   * (`cum·1000 ≥ pm·n` avoids the ceil), so the gate hashes exactly.
   */
  def binQuantiles(df: DataFrame, valueCol: String, lo: Long, width: Long,
      nBins: Int, permille: Seq[Int]): DataFrame =
    quantilesFromBins(binCounts(df, valueCol, lo, width, nBins),
      lo, width, permille)

  /** The sketch state: ≤nBins (bin, cnt) rows. Counts ADD across
    * shards/days/micro-batches, so the same column program maintains
    * the state incrementally under readStream (StreamingSpec) or
    * re-aggregates partial frames — the register-merge law. */
  def binCounts(df: DataFrame, valueCol: String, lo: Long, width: Long,
      nBins: Int): DataFrame = {
    require(width >= 1 && nBins >= 1)
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(nBins - 1L))
    df.groupBy(bin.as("bin")).agg(count(lit(1)).as("cnt"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov drift evidence over binned values —
   * the distribution-shift gate between crawl snapshots / sources /
   * model versions (the numeric companion to the embedding-drift
   * check): KS = max over bins of the scaled-CDF gap, surfaced as
   * exact integer ppm (each CDF is an integer floor-division of the
   * running count, so both engines compute identical numbers — no
   * float CDF). Output is ONE row (n_a, n_b, ks_ppm, ks_bin), with
   * `ks_bin` the first bin attaining the max (deterministic ties).
   * The binning granularity bounds the resolution: binned KS lower-
   * bounds the continuous statistic, the standard trade for a
   * mergeable sketch state.
   *
   * Scale shape: each side collapses to its ≤nBins counts (map-side
   * combinable — the [[binCounts]] additive state, so shards/days
   * merge by +); everything after runs on the bin frame only.
   */
  /**
   * Quantile normalization map between two corpora over binned values
   * — the TRANSFORM counterpart of the histogram-matching THINNER
   * ([[graft.pipeline.Curation.histogramMatch]]) and the repair action
   * behind a [[ksDrift]] alarm: calibrate one source's score
   * distribution onto a reference's (Bolstad et al. 2003 — the
   * microarray quantile-normalization standard, here at sketch
   * granularity) by mapping each source bin to the FIRST reference bin
   * whose CDF reaches the source bin's CDF. All-integer: the CDF
   * comparison is the cross-multiplied `refCum·nSrc ≥ srcCum·nRef`, so
   * no division and no float ranks. Output one row per populated
   * source bin: (bin, src_cnt, src_cdf_ppm, ref_bin, ref_value = the
   * mapped bin's lower bound) — the lookup table a calibration pass
   * broadcasts and applies as a narrow map.
   *
   * Scale shape: both corpora collapse to their ≤nBins additive
   * [[binCounts]] states (shards/days merge by +); cum sums ride
   * windows over the bin frames only; the mapping is a bin×bin
   * non-equi join + min aggregate — everything after the two count
   * shuffles is sketch-sized.
   */
  def quantileNormalize(src: DataFrame, ref: DataFrame, valueCol: String,
      lo: Long, width: Long, nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def cdf(df: DataFrame): DataFrame =
      binCounts(df, valueCol, lo, width, nBins)
        .withColumn("cum", sum(col("cnt")).over(cumW))
        .withColumn("n", sum(col("cnt")).over(allW))
    val s = cdf(src).select(col("bin"), col("cnt").as("src_cnt"),
      col("cum").as("scum"), col("n").as("ns"))
    val r = cdf(ref).select(col("bin").as("ref_bin"),
      col("cum").as("rcum"), col("n").as("nr"))
    s.join(broadcast(r), col("rcum") * col("ns") >= col("scum") * col("nr"))
      .groupBy(col("bin"), col("src_cnt"), col("scum"), col("ns"))
      .agg(min(col("ref_bin")).as("ref_bin"))
      .select(col("bin"), col("src_cnt"),
        expr("scum * 1000000 div ns").as("src_cdf_ppm"), col("ref_bin"),
        (lit(lo) + col("ref_bin") * lit(width)).as("ref_value"))
  }

  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String, lo: Long,
      width: Long, nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = binCounts(a, valueCol, lo, width, nBins)
      .withColumnRenamed("cnt", "ca")
    val cb = binCounts(b, valueCol, lo, width, nBins)
      .withColumnRenamed("cnt", "cb")
    val j = ca.join(cb, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // windows over the ≤nBins-row frame only — never the data
    val cumW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j.withColumn("cuma", sum(col("ca")).over(cumW))
      .withColumn("cumb", sum(col("cb")).over(cumW))
      .withColumn("na", sum(col("ca")).over(allW))
      .withColumn("nb", sum(col("cb")).over(allW))
      .withColumn("gap_ppm", abs(expr(
        "cuma * 1000000L div na - cumb * 1000000L div nb")))
      .withColumn("ks_ppm", max(col("gap_ppm")).over(allW))
      .filter(col("gap_ppm") === col("ks_ppm"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("ks_ppm")).as("ks_ppm"), min(col("bin")).as("ks_bin"))
  }

  /** The finisher over the tiny bin frame: quantile(pm) = first bin
    * whose running count reaches ceil(pm·n/1000) — integer math only. */
  def quantilesFromBins(counts: DataFrame, lo: Long, width: Long,
      permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000),
      s"permille out of (0, 1000]: $permille")
    import org.apache.spark.sql.expressions.Window
    // windows over the ≤nBins-row bin frame only — never the data
    val cumW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n_total", sum(col("cnt")).over(allW))
    val ps = broadcast(counts.sparkSession
      .createDataFrame(permille.map(Tuple1(_))).toDF("pm"))
    cum.crossJoin(ps) // ≤ nBins × |permille| rows
      .filter(col("cum") * lit(1000L) >= col("pm") * col("n_total"))
      .groupBy(col("pm"))
      .agg(min(col("bin")).as("bin"))
      .select(col("pm"), col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("lo_edge"))
  }

  /**
   * Quantile-bucket assignment — the discretizer TRANSFORM over the
   * [[binQuantiles]] sketch (Spark ML's QuantileDiscretizer shape):
   * every row's equi-width bin compares against the permille boundary
   * bins, bucket(x) = #{q : bin_q < bin(x)}, then buckets aggregate to
   * (bucket, n_rows, min_bin, max_bin). With permille = 250/500/750
   * this is the exact-integer quartile split of a 100 TB column.
   *
   * Scale shape: the boundary frame is ≤|permille| rows folded into a
   * broadcast array; assignment is a narrow per-row map (no sort, no
   * shuffle) followed by one bucket-sized count aggregate. In
   * production the sketch side reads the maintained [[binCounts]]
   * state, so the data is scanned once, not twice.
   */
  def quantileAssign(df: DataFrame, valueCol: String, lo: Long,
      width: Long, nBins: Int, permille: Seq[Int]): DataFrame = {
    val bounds = binQuantiles(df, valueCol, lo, width, nBins, permille)
      .agg(collect_list(col("bin")).as("qbins"))
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)).cast("long"),
      lit(0L)), lit(nBins - 1L))
    df.select(bin.as("xbin"))
      .crossJoin(broadcast(bounds))
      .select(col("xbin"),
        size(filter(col("qbins"), q => q < col("xbin")))
          .cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min(col("xbin")).as("min_bin"),
        max(col("xbin")).as("max_bin"))
  }

  /**
   * Sketch-accuracy eval: the mergeable bin-quantile estimate vs the
   * EXACT order statistic, per requested permille — the measurement
   * that sizes the bins (error is bounded by one bin width by
   * construction, and this query shows the ACTUAL gap on real data).
   * The exact side is the min value whose cumulative count reaches
   * ⌈pm·n/1000⌉, computed over the DISTINCT-VALUE histogram — a
   * values-sized cumsum, never a global row sort; `valueCol` must be
   * integral (callers floor() explicitly — CAST double→int rounds in
   * DuckDB but truncates in Spark, so the floor must be visible).
   * All-integer output: (pm, exact_val, est_lo, abs_err).
   */
  def quantileError(df: DataFrame, valueCol: String, lo: Long,
      width: Long, nBins: Int, permille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cumW = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(allW))
    val ps = broadcast(df.sparkSession
      .createDataFrame(permille.map(Tuple1(_))).toDF("pm"))
    val exact = cum.crossJoin(ps)
      .filter(col("cum") * lit(1000L) >= col("pm") * col("n"))
      .groupBy("pm").agg(min(col("v")).as("exact_val"))
    val est = quantilesFromBins(
      binCounts(df, valueCol, lo, width, nBins), lo, width, permille)
      .select(col("pm"), col("lo_edge").as("est_lo"))
    exact.join(est, Seq("pm"))
      .select(col("pm"), col("exact_val"), col("est_lo"),
        abs(col("exact_val") - col("est_lo")).as("abs_err"))
  }

  /**
   * ROLLUP statistics over a dimension hierarchy: per-(d1,d2,...)
   * subtotals at every prefix granularity plus the grand total — the
   * multi-granularity version of StatisTask's space totals. Aggregated-
   * out dimensions surface as 'ALL' so the result is join/oracle-stable
   * (no NULL-vs-absent ambiguity).
   */
  def rollupStats(df: DataFrame, dims: Seq[String],
      valueCol: String): DataFrame =
    df.rollup(dims.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        // quant, not round(): avg = sum/n ties the 4-decimal half when
        // n is 32-divisible (VERDICT r3 latent-trap list)
        graft.functions.Portable.quant(sum(col(valueCol)), 2).as("sum_value"),
        graft.functions.Portable.quant(avg(col(valueCol)), 4).as("avg_value"))
      .select(dims.map(d => coalesce(col(d), lit("ALL")).as(d)) ++
        Seq(col("n_rows"), col("sum_value"), col("avg_value")): _*)

  /**
   * Engine-portable HyperLogLog registers (Flajolet et al. 2007) — the
   * WHITE-BOX version of the distinct-vid sketch `tagCountsApprox`
   * delegates to Spark's opaque `approx_count_distinct` for: hash =
   * first 32 bits of md5 (the corpus-wide portable-hash idiom), top
   * `b` bits pick the register, the leading-zero rank of the low
   * `32-b` bits is `rho`, registers keep `max(rho)`. Leading zeros are
   * counted with `length(bin(x))` — both Spark and DuckDB print
   * minimal binary, so the sketch is bit-identical across engines and
   * the gate can hash the registers themselves. Mergeability is the
   * production property: register frames from independent partitions /
   * days / shards combine by max — the same re-aggregation law as the
   * reference's partial stats.
   *
   * Scale shape: one narrow hash projection + one `m`-register max
   * aggregate (map-side combinable, output ≤ 2^b rows regardless of
   * corpus size). All-integer output (max() never widens).
   */
  def hllRegisters(df: DataFrame, valueCol: String, b: Int): DataFrame =
    hllRegistersBy(df, Nil, valueCol, b)

  /** Per-group [[hllRegisters]] — one register frame per key (distinct
    * neighbors per vertex, distinct docs per domain, ...): output is
    * |groups| × ≤2^b rows, merged shard-wise by the same max law. */
  def hllRegistersBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String, b: Int): DataFrame = {
    require(b >= 4 && b <= 16, "register-index width b must be in [4,16]")
    val w = 32 - b
    val twoW = 1L << w
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.select(groupCols.map(col) :+ h.as("_h"): _*)
      .select(groupCols.map(col) ++ Seq(
        expr(s"_h div ${twoW}L").as("reg"),
        (col("_h") % twoW).as("rem")): _*)
      .select(groupCols.map(col) ++ Seq(col("reg"),
        when(col("rem") === 0, lit(w + 1))
          .otherwise(lit(w + 1) - length(bin(col("rem")))).cast("long")
          .as("rho")): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /**
   * Engine-portable Count-Min Sketch registers (Cormode &
   * Muthukrishnan 2005) — the FREQUENCY companion to [[hllRegisters]]:
   * `depth` independent hash rows, each hashing a value occurrence to
   * one of `width` counters; a point-frequency estimate is the min of
   * the value's `depth` counters ([[cmsLookup]]) and never
   * underestimates. Hash i of value v = hex window i of md5(v): ONE
   * md5 per value, with the `depth` hash rows read from DISJOINT
   * 8-hex-digit (32-bit) windows of the SAME digest — independent by
   * md5's avalanche property, same portability as the salted-hash
   * idiom at a quarter of the hashing cost (the r9 driver bench
   * showed the per-row md5 IS the operator's cost). Like the HLL
   * registers, sketches from independent shards / days merge by
   * element-wise SUM — the partial-stats re-aggregation law.
   *
   * Scale shape: one narrow md5 projection + `depth`-way explode + one
   * (row,reg) count aggregate (map-side combinable); output ≤
   * depth × width rows regardless of corpus size. All-integer output.
   */
  def cmsRegisters(df: DataFrame, valueCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 4,
      "depth must be in [1,4] — md5 has 4 disjoint 32-bit windows")
    require(width >= 16, "width must be >= 16")
    df.select(md5(col(valueCol).cast("string")).as("_d"))
      .select(posexplode(array((0 until depth).map(i =>
        cmsWindow(col("_d"), i) % width): _*)).as(Seq("hrow", "reg")))
      .groupBy(col("hrow").cast("long").as("hrow"), col("reg"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates through a [[cmsRegisters]] sketch: for
    * each distinct key, min over its `depth` counters (absent counter =
    * 0). The sketch is ≤ depth×width rows — always broadcast, so the
    * lookup is a shuffle-free map-side join however many keys probe. */
  /**
   * Join-cardinality estimate from CMS register inner products
   * (Cormode & Muthukrishnan 2005 §4.2; the AGMS lineage): the size of
   * `A ⋈ B` on the sketched key is Σ_k cA(k)·cB(k), estimated as
   * min over hash rows of Σ_reg cntA(reg)·cntB(reg). Like the point
   * lookup it NEVER underestimates (collisions only add), and the
   * overshoot is bounded by (e/width)·|A|·|B| per row — the estimate a
   * query planner reads off two at-rest sketches without touching
   * either table. With A = B this is the second frequency moment F2
   * (self-join size), the classic skew statistic. All-integer.
   *
   * Scale shape: two register frames (≤ depth×width rows each
   * REGARDLESS of table size), one register-keyed equi-join, one
   * depth-row aggregate — the tables themselves are only read by the
   * sketch passes, which shards/days merge into by SUM.
   */
  def cmsJoinSize(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      depth: Int, width: Int): DataFrame =
    cmsRegisters(a, aCol, depth, width).withColumnRenamed("cnt", "ca")
      .join(cmsRegisters(b, bCol, depth, width)
        .withColumnRenamed("cnt", "cb"), Seq("hrow", "reg"))
      .groupBy(col("hrow")).agg(sum(col("ca") * col("cb")).as("dot"))
      .agg(min(col("dot")).cast("long").as("est_join_size"))

  def cmsLookup(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol).as("pkey")).distinct()
      .select(col("pkey"), md5(col("pkey").cast("string")).as("_d"))
      .select(col("pkey"), posexplode(array((0 until depth).map(i =>
        cmsWindow(col("_d"), i) % width): _*)).as(Seq("hrow", "reg")))
      .select(col("pkey"), col("hrow").cast("long").as("hrow"), col("reg"))
      .join(broadcast(sketch), Seq("hrow", "reg"), "left")
      .groupBy("pkey").agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /**
   * Sketch-gated heavy hitters — the classic CMS use (Cormode &
   * Muthukrishnan 2005 §4): find keys whose frequency clears
   * `minFreq`, using the sketch's never-underestimates guarantee as
   * the candidate filter. Each distinct key probes the broadcast
   * sketch; keys whose CMS estimate clears the bar join their exact
   * count for the verdict (`true_cnt` may fall below `minFreq` — a
   * collision-inflated false candidate; no true heavy hitter is ever
   * missed). Output carries both counts so the gate checks the
   * overestimate law row by row.
   *
   * Scale shape: one map-side-combinable distinct-key count (the exact
   * side), one shuffle-free broadcast probe (sketch ≤ depth×width
   * rows); the candidate filter happens BEFORE the join with exact
   * counts, so the joined frame is heavy-hitter-sized, not vocab-sized.
   */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, depth: Int,
      width: Int, minFreq: Long): DataFrame = {
    val sketch = cmsRegisters(df, valueCol, depth, width)
    // the exact-count frame IS the distinct key set — probing from it
    // (instead of the raw corpus) saves a third corpus scan, and its
    // count rides along to the verdict join for free
    val exact = df.groupBy(col(valueCol).as("pkey"))
      .agg(count(lit(1)).as("true_cnt"))
      .transform(graft.CacheScope.persist(_)) // feeds probe + verdict
    val est = cmsLookup(sketch, exact, "pkey", depth, width)
      .filter(col("est_cnt") >= minFreq)
    est.join(exact, Seq("pkey"))
      .select(col("pkey"), col("est_cnt"), col("true_cnt"))
  }

  /**
   * Cohort-retention rollup over an event table (the user-activity /
   * data-freshness shape of StatisTask): users are cohorted by the
   * week of their first event; each (cohort_week, week_offset) cell
   * counts that cohort's users still active in that week and their
   * events. Weeks are pure integer arithmetic on epoch microseconds
   * (`unix_micros div 604800000000`) — engine-portable by
   * construction, no calendar functions, all-integer output.
   *
   * Scale shape: one (user, week) pre-aggregation shuffle (map-side
   * combinable — the raw event volume collapses before anything
   * else), a per-user min for the cohort week over that reduced
   * frame, one join back (user-week-sized, AQE-broadcastable cohort
   * side), one rollup aggregate of ≤ |weeks|² cells.
   */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val uw = events.select(col(userCol).as("u"),
        expr(s"unix_micros($tsCol) div 604800000000").as("wk"))
      .groupBy("u", "wk").agg(count(lit(1)).as("n_events"))
      .transform(graft.CacheScope.persist(_)) // feeds cohort min + cells
    val cohort = uw.groupBy("u").agg(min(col("wk")).as("cwk"))
    uw.join(cohort, Seq("u"))
      .groupBy(col("cwk").as("cohort_week"),
        (col("wk") - col("cwk")).as("week_offset"))
      .agg(count(lit(1)).as("users"), sum(col("n_events")).as("n_events"))
  }

  /**
   * Sketch-algebra set arithmetic: HLL estimates for two labeled sets,
   * their union, and the inclusion–exclusion intersection
   * |A∩B| ≈ E(A) + E(B) − E(A∪B) — the only intersection a register
   * sketch supports (registers union by max; they carry no
   * intersection law). `setCol` labels each row 'a' or 'b'; output is
   * ONE row (est_a, est_b, est_union, est_intersect), all BIGINT.
   *
   * The estimate is the raw HLL harmonic mean computed in EXACT
   * integer arithmetic so it is oracle-portable: with b=8 (m=256,
   * rho ≤ 25), Σ 2^-rho rescaled by 2^25 is an exact BIGINT
   * Σ 2^(25-rho) (absent registers contribute 2^25), and
   * E = α·m²·2^25 / S becomes one 64-bit integer floor-division with
   * α pre-scaled to 718272/10^6 — bit-identical in Spark and DuckDB,
   * no libm, no float summation order. Small-range linear counting is
   * deliberately omitted (it needs ln); the b=8 raw estimate is
   * within ~1.04/√m ≈ 6.5% σ on the >2.5m cardinalities this targets.
   *
   * Scale shape: one narrow hash projection, one ≤2·2^b-row register
   * aggregate, then scalar arithmetic on broadcast one-row frames —
   * corpus size only enters the first map-side-combined pass. Sets on
   * different machines/days just ship registers (the merge law).
   */
  def hllIntersect(df: DataFrame, setCol: String, valueCol: String)
      : DataFrame = {
    val b = 8
    val m = 1L << b // 256
    // N = alpha_scaled * m^2 * 2^25 with alpha_scaled = 718272 (α·10^6)
    val N = 718272L * m * m * (1L << 25)
    def est(regs: DataFrame, estName: String): DataFrame =
      regs.agg(
        sum(expr("shiftleft(1L, cast(25 - max_rho as int))")).as("_sp"),
        count(lit(1)).as("_np"))
        .select(expr(s"${N}L div (1000000L * " +
          s"(_sp + (${m}L - _np) * ${1L << 25}L))").as(estName))
    val regs = hllRegistersBy(df, Seq(setCol), valueCol, b)
    val union = regs.groupBy(col("reg")).agg(max(col("max_rho")).as("max_rho"))
    val ea = est(regs.filter(col(setCol) === "a"), "est_a")
    val eb = est(regs.filter(col(setCol) === "b"), "est_b")
    val eu = est(union, "est_union")
    ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union"))
          .as("est_intersect"))
  }

  /** 32-bit window `i` of an md5 hex digest as a nonnegative long
    * (Spark `conv` ↔ DuckDB `CAST('0x'||substr(md5(..), 1+8*i, 8)`). */
  private def cmsWindow(digest: Column, i: Int): Column =
    conv(substring(digest, i * 8 + 1, 8), 16, 10).cast("long")

  /**
   * Robust outlier gate over per-key event counts — median/MAD
   * (median absolute deviation, Hampel 1974), the load/abuse detector
   * that a mean/stddev z-score can't do on skewed rates (one whale
   * user drags the mean; the median ignores it). Everything is an
   * exact integer: the median is the lower-median law (min value whose
   * cumulative count reaches half) over the distinct-COUNT histogram,
   * MAD repeats the law over |c − med|, and a key is an outlier when
   * abs_dev > k·MAD. Output: (key, cnt, abs_dev, is_outlier) per key.
   *
   * Scale shape: the corpus collapses to per-key counts (combinable),
   * then to the distinct-count-value histogram (≤ distinct count
   * values — histogram-sized, not key-sized); the two median scalars
   * ride broadcast. Windows only ever run over the histogram frame.
   */
  def madOutliers(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .transform(graft.CacheScope.persist(_)) // feeds both medians + output
    def lowerMedian(vals: DataFrame, vCol: String): DataFrame = {
      val cumW = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val allW = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      vals.groupBy(col(vCol).as("v")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(cumW))
        .withColumn("n", sum(col("c")).over(allW))
        .filter(col("cum") * 2 >= col("n"))
        .agg(min(col("v")).as("med"))
    }
    val med = lowerMedian(counts, "cnt")
    val dev = counts.crossJoin(broadcast(med))
      .withColumn("abs_dev", abs(col("cnt") - col("med")))
    val mad = lowerMedian(dev, "abs_dev")
      .withColumnRenamed("med", "mad")
    dev.crossJoin(broadcast(mad))
      .select(col(keyCol), col("cnt"), col("abs_dev"),
        (col("abs_dev") > lit(k) * col("mad")).cast("int").as("is_outlier"))
  }

  /**
   * KMV (k-minimum-values) distinct sketch — the bottom-k companion
   * to HLL (Bar-Yossef et al. 2002; the Theta-sketch family's base):
   * the state is the k smallest 32-bit hashes of the distinct values,
   * merge = k-way min-merge (union the register sets, keep the k
   * smallest), estimate = (k−1)·2^32 div h_k. Unlike HLL the state
   * supports DIRECT set-intersection estimates ([[kmvJaccard]]).
   * Same portable hash law as the HLL/CMS family: first 8 md5 hex
   * digits as an integer.
   *
   * Scale shape: one narrow hash projection + distinct + global
   * bottom-k, which plans as TakeOrderedAndProject — each partition
   * keeps its own k smallest, the driver merges k-sized sets; nothing
   * data-sized crosses the wire.
   */
  def kmvRegisters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2 (the estimator divides by h_k)")
    df.select(conv(substring(md5(col(valueCol).cast("string")), 1, 8),
        16, 10).cast("long").as("h"))
      .distinct()
      .orderBy(col("h")).limit(k)
  }

  /** KMV estimate row vs the exact distinct count (eval companion —
    * the exact side is for measurement, not the 100 TB path): one row
    * (k_used, kth_hash, est_distinct, exact_distinct, err_permille). */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val regs = kmvRegisters(df, valueCol, k)
    val est = regs.agg(count(lit(1)).as("k_used"),
        max(col("h")).as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        // k_used < k means the sketch saw EVERY distinct value: exact
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr("(k_used - 1) * 4294967296 div kth_hash"))
          .as("est_distinct"))
    val exact = df.agg(count_distinct(col(valueCol)).as("exact_distinct"))
    est.crossJoin(broadcast(exact))
      .withColumn("err_permille",
        expr("abs(est_distinct - exact_distinct) * 1000" +
          " div exact_distinct"))
  }

  /**
   * KMV set-Jaccard estimate (Beyer et al. 2007 §4): merge the two
   * bottom-k sketches into the union's bottom-k, then count how many
   * of those union registers appear in BOTH input sketches —
   * jaccard ≈ n_both/k. The eval columns carry the exact Jaccard for
   * the error audit. All arithmetic integer permille.
   *
   * Scale shape: both sides collapse to k-row register frames before
   * any join; the membership checks are k-vs-k semi-joins. The exact
   * columns cost one distinct-count pass per side (eval only).
   */
  def kmvJaccard(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    val ra = kmvRegisters(a, valueCol, k)
      .transform(graft.CacheScope.persist(_))
    val rb = kmvRegisters(b, valueCol, k)
      .transform(graft.CacheScope.persist(_))
    val union = ra.unionByName(rb).distinct().orderBy(col("h")).limit(k)
    val both = union.join(ra, Seq("h"), "left_semi")
      .join(rb, Seq("h"), "left_semi")
    val est = union.agg(count(lit(1)).as("k_used"))
      .crossJoin(broadcast(both.agg(count(lit(1)).as("n_both"))))
      .withColumn("jaccard_est_permille",
        expr("n_both * 1000 div k_used"))
    val ad = a.select(col(valueCol).as("v")).distinct()
      .transform(graft.CacheScope.persist(_))
    val bd = b.select(col(valueCol).as("v")).distinct()
      .transform(graft.CacheScope.persist(_))
    val nInter = ad.join(bd, Seq("v"), "left_semi")
      .agg(count(lit(1)).as("n_inter"))
    val nA = ad.agg(count(lit(1)).as("n_a"))
    val nB = bd.agg(count(lit(1)).as("n_b"))
    est.crossJoin(broadcast(nInter)).crossJoin(broadcast(nA))
      .crossJoin(broadcast(nB))
      .select(col("k_used"), col("n_both"), col("jaccard_est_permille"),
        expr("n_inter * 1000 div (n_a + n_b - n_inter)")
          .as("jaccard_exact_permille"))
  }

  /**
   * Pairwise covariance/correlation sufficient statistics over integer
   * feature columns — the one-pass moment table every feature store
   * and drift monitor keeps (cov(x,y) = (n·Σxy − Σx·Σy)/n² and Pearson
   * r both fold client-side from these integers; the reference's
   * StatisTask keeps whole-space moments the same way,
   * src/storage/admin/StatisTask.cpp:105-272). One row per unordered
   * column pair i ≤ j (the diagonal rows carry the variance stats):
   * (x_col, y_col, n, sum_x, sum_y, sum_xy) — all exact BIGINTs, so
   * the row hash-gates with no float law needed.
   *
   * Scale shape: ONE full-scan aggregate computes every pair's Σxy as
   * a map-side-combinable sum (k(k+1)/2 + k sums in one Tungsten
   * pass — the corpus is read once, never once per pair); the single
   * wide row unpivots via `stack` (profileColumns' idiom). Caller
   * pre-scales doubles to integer units (cents/permille) and bounds
   * |x·y|·rows within Long range — at wider scale, shard the sum by a
   * key and re-add (the sums are additive).
   */
  def pairStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (cols(i), cols(j))
    // coalesce: an EMPTY input (or shard) must yield typed zero sums,
    // not NULLs — the additivity law (PropertySpec) re-adds shards
    val aggs = cols.map(c =>
      coalesce(sum(col(c)), lit(0L)).as(s"s_$c")) ++
      pairs.map { case (a, b) =>
        coalesce(sum(col(a) * col(b)), lit(0L)).as(s"p_${a}__$b") }
    val wide = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr = s"stack(${pairs.size}, " + pairs.map { case (a, b) =>
      s"'$a', '$b', `s_$a`, `s_$b`, `p_${a}__$b`" }.mkString(", ") +
      ") AS (x_col, y_col, sum_x, sum_y, sum_xy)"
    wide.select(col("n_rows").as("n"), expr(stackExpr))
      .select(col("x_col"), col("y_col"), col("n"), col("sum_x"),
        col("sum_y"), col("sum_xy"))
  }

  /** Cardinality estimate from [[hllRegisters]] output (standard HLL
    * bias-corrected harmonic mean + linear-counting small-range
    * correction). Spec-tested against exact distincts; the registers —
    * not this float — are the gate surface. */
  def hllEstimate(registers: DataFrame, b: Int): Double = {
    val m = 1 << b
    val row = registers.agg(
      sum(pow(lit(2.0), -col("max_rho"))).as("s"),
      count(lit(1)).as("n")).head() // one aggregated scalar row
    val present = row.getLong(1)
    val s = (if (row.isNullAt(0)) 0.0 else row.getDouble(0)) +
      (m - present) // absent registers contribute 2^0
    val zeros = m - present
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / s
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** α_m · 10^6 as an exact integer (Flajolet et al. 2007 Fig. 3 small-m
    * constants; the asymptotic formula above m=64) — the scaled-integer
    * currency of [[hllEstimateBy]]/[[hllIntersect]]. */
  private[graft] def hllAlphaScaled(b: Int): Long = b match {
    case 4 => 673000L
    case 5 => 697000L
    case 6 => 709000L
    case _ =>
      val m = 1L << b
      // floor, not round: b=8 gives 718272.59 and the cross-engine
      // constant [[hllIntersect]] and every oracle hardcode is 718272
      math.floor(0.7213 / (1 + 1.079 / m) * 1e6).toLong
  }

  /**
   * Per-group raw HLL estimate in EXACT integer arithmetic (the
   * [[hllIntersect]] law generalized over `b` and group keys): with
   * w = 32−b and rho ≤ w+1, Σ 2^−rho rescaled by 2^(w+1) is an exact
   * BIGINT Σ 2^(w+1−rho) (absent registers contribute 2^(w+1)), and
   * E = α·m²·2^(w+1) div S — bit-identical in Spark and DuckDB, no
   * libm, no float summation order. Small-range linear counting is
   * deliberately omitted (it needs ln); the raw estimate is the
   * deterministic, oracle-portable surface (the float-corrected
   * [[hllEstimate]] stays the accuracy-eval companion).
   *
   * Input is a register frame from [[hllRegistersBy]] with the same
   * group columns; output is one row per group:
   * (groupCols..., n_regs, est). Scale shape: one ≤|groups|·2^b-row
   * combinable aggregate — nothing corpus-sized.
   */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String],
      b: Int): DataFrame = {
    require(b >= 4 && b <= 16, "register-index width b must be in [4,16]")
    val m = 1L << b
    val w1 = 32 - b + 1 // max rho; 2^(w+1) is the scale unit
    // α·10^6 · m² · 2^(w+1) ≤ 0.73e6·2^32·2^29 only for small b+w combos;
    // for b ≤ 12 this stays under 2^63 (b=12: 0.72e6·2^24·2^21 ≈ 2.6e19 —
    // too big). Constrain to the b ≤ 10 range the callers use.
    require(b <= 10, "integer estimator needs α·m²·2^(w+1) < 2^63: b <= 10")
    val num = hllAlphaScaled(b) * m * m * (1L << w1)
    registers.groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(1L, cast($w1 - max_rho as int))"))
          .as("_sp"),
        count(lit(1)).as("n_regs"))
      .select(groupCols.map(col) ++ Seq(col("n_regs"),
        expr(s"${num}L div (1000000L * " +
          s"(_sp + (${m}L - n_regs) * ${1L << w1}L))").as("est")): _*)
  }

  /**
   * AMS sign-sketch second-moment estimate (Alon, Matias & Szegedy
   * 1996 — the F2 = Σf² tug-of-war sketch): three independent ±1 sign
   * rows (signs from the LSBs of disjoint md5 windows — the CMS window
   * law), each keeping Z_i = Σ_rows s_i(v); E[Z²] = F2 exactly, and
   * the 3-row median (= sum − max − min, an exact integer) bounds the
   * variance. F2 is the self-join size / skew statistic: CMS
   * ([[cmsJoinSizeEstimate]]) estimates A⋈B, AMS estimates A⋈A with
   * O(depth) counters instead of O(width·depth).
   *
   * Mergeability is the production law: Z_i is a plain SUM, so shards
   * /days combine by adding their Z columns (spec-tested). The exact
   * F2 rides along as the eval companion (a value-distinct-sized
   * aggregate — measurement, not the serving path).
   *
   * Scale shape: one narrow 3-way explode over the scan + ONE 3-row
   * sum aggregate; the exact side is one combinable count + sum of
   * cnt². Output: 3 rows (i, z, z2, est_f2, exact_f2), all BIGINT.
   */
  def amsF2(df: DataFrame, valueCol: String): DataFrame = {
    val digest = md5(col(valueCol).cast("string"))
    val signs = df.select(
        explode(array((0 until 3).map(i =>
          struct(lit(i.toLong).as("i"),
            when(cmsWindow(digest, i) % 2 === 1, lit(1L))
              .otherwise(lit(-1L)).as("s"))): _*)).as("e"))
      .select(col("e.i").as("i"), col("e.s").as("s"))
      .groupBy(col("i")).agg(sum(col("s")).as("z"))
      .select(col("i"), col("z"), (col("z") * col("z")).as("z2"))
    val med = signs.agg((sum(col("z2")) - max(col("z2")) -
      min(col("z2"))).as("est_f2"))
    val exact = df.groupBy(col(valueCol)).agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("exact_f2"))
    signs.crossJoin(broadcast(med)).crossJoin(broadcast(exact))
  }

  /**
   * Weighted lower median per group — the smallest value whose
   * cumulative weight reaches half the group's total (the weighted
   * twin of [[madOutliers]]' lower-median law; the robust center for
   * "median price weighted by volume"-class questions where the plain
   * median over rows misweights bulk lines). Exact integers
   * throughout: cum·2 ≥ total is the cross-multiplied half test.
   *
   * Scale shape: the corpus collapses to the (group, value) weight
   * histogram first (map-side combinable); the two windows run over
   * the HISTOGRAM frame partitioned by group — never over raw rows.
   */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = df.groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(sum(col(weightCol).cast("long")).as("w"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    h.withColumn("cum", sum(col("w")).over(cumW))
      .withColumn("tw", sum(col("w")).over(allW))
      .filter(col("cum") * 2 >= col("tw"))
      .groupBy(col(groupCol))
      .agg(min(col("v")).as("w_median"), max(col("tw")).as("total_w"))
  }

  /** Cumulative Poisson(1) CDF × 2^52 as FIXED integer thresholds
    * (identical literals in the DuckDB oracles): a 52-bit hash below
    * threshold i draws weight i; above all six draws 6 (P ≈ 6e-5). */
  private[graft] val PoissonThresholds: Seq[Long] = Seq(
    1656781714176974L, 3313563428353948L, 4141954285442435L,
    4418084571138597L, 4487117142562638L, 4500923656847446L)

  /**
   * Poisson-bootstrap uncertainty for a distributed mean (Chamandy et
   * al. 2012, "Estimating Uncertainty for Massive Data Streams" —
   * Google's production bootstrap): replicate b resamples the corpus
   * by giving each row an independent Poisson(1) multiplicity, so B
   * resamples run in ONE pass with no materialized copies; the spread
   * of the replicate means estimates the sampling distribution of the
   * full-data mean. Fully deterministic and engine-portable: the draw
   * for (row, b) is the 52-bit md5 window of `id#b` compared against
   * FIXED integer CDF thresholds ([[PoissonThresholds]]), and the
   * per-replicate sums ride the dyadic grid (order-independent
   * float summation — the pagerank law).
   *
   * Output: one row per replicate (rep, n_eff, mean_rep) with the
   * percentile-CI bounds (ci_lo, ci_hi — lower-rank law at
   * 2.5%/97.5% over the B replicate means) and the full-data mean
   * attached to every row.
   *
   * Scale shape: one B-way explode over the scan, ONE combinable
   * (rep)-keyed aggregate (B rows out), and a B-row window for the
   * CI — corpus size enters only the first map-side-combined pass.
   */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
      reps: Int): DataFrame = {
    import graft.functions.Portable.{dyadic, quant}
    import org.apache.spark.sql.expressions.Window
    require(reps >= 4, "need at least 4 replicates for a CI")
    val h = conv(substring(
      md5(concat(col(idCol).cast("string"), lit("#"), col("rep"))),
      1, 13), 16, 10).cast("long")
    val wgt = PoissonThresholds.zipWithIndex
      .foldRight(lit(PoissonThresholds.size.toLong)) {
        case ((t, i), other) => when(h < t, lit(i.toLong)).otherwise(other)
      }
    val repMeans = df
      .select(col(idCol), col(valueCol),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .select(col("rep").cast("long").as("rep"), wgt.as("w"),
        col(valueCol))
      .groupBy("rep")
      .agg(sum(col("w")).as("n_eff"),
        sum(dyadic(col("w") * col(valueCol))).as("_sv"))
      // a replicate whose every row drew weight 0 (prob ~e^-n per
      // replicate) has no mean: drop it rather than emit a null that
      // Spark and the oracle would ORDER differently in the CI window
      .filter(col("n_eff") > 0)
      .select(col("rep"), col("n_eff"),
        quant(col("_sv") / col("n_eff"), 6).as("mean_rep"))
      // B-row frame consumed by BOTH the CI window branch and the
      // output branch: without the persist the filter above defeats
      // ReuseExchange and the corpus-sized explode+md5 pass runs
      // twice (measured 0.7 s -> 22 s at sf0.1)
      .transform(graft.CacheScope.persist(_))
    // CI ranks from the SURVIVING replicate count, not the constant
    // reps: if a replicate dropped (n_eff = 0), a reps-based hiRank
    // would exceed the frame and the upper-CI row would silently
    // vanish, truncating the CI. Integer ceil on both engines:
    // ceil(q*nb) = (q_permille*nb + 999) div 1000.
    val nSurv = repMeans.agg(count(lit(1)).as("_nb"))
    val ranked = repMeans.crossJoin(broadcast(nSurv))
      .withColumn("_rk",
        row_number().over(Window.orderBy(col("mean_rep"), col("rep"))))
      .withColumn("_lo", greatest(lit(1L),
        floor((lit(25L) * col("_nb") + lit(999L)) / lit(1000L))
          .cast("long")))
      .withColumn("_hi", least(col("_nb"),
        floor((lit(975L) * col("_nb") + lit(999L)) / lit(1000L))
          .cast("long")))
    val ci = ranked.agg(
      min(when(col("_rk") === col("_lo"), col("mean_rep"))).as("ci_lo"),
      min(when(col("_rk") === col("_hi"), col("mean_rep"))).as("ci_hi"))
    val full = df.agg(
      quant(sum(dyadic(col(valueCol))) / count(lit(1)), 6)
        .as("mean_full"))
    repMeans.crossJoin(broadcast(ci)).crossJoin(broadcast(full))
  }
}
