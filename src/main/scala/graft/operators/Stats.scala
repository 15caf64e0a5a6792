package graft.operators

import graft.model.GraphStore
import org.apache.spark.sql.DataFrame
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
}
