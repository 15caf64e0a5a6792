package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Release-gate audits comparing two snapshots of a stored tag / arc
  * set, and scanning for arcs whose endpoint vertex is absent.
  *
  * Reference behavior: the admin-side consistency checks around
  * snapshot / ingest jobs (reference `src/storage/admin/` task family —
  * e.g. the rebuild/compact tasks validate the store after a bulk
  * operation). Both audits here are single-shuffle declarative plans:
  * no window functions, no driver-side collection, so they survive a
  * 100 TB store where a snapshot diff touches every row exactly once.
  */
object Audit {

  /** Per-status row counts of snapshot `v2` vs `base`, keyed by
    * `keyCols`, value-compared null-safely on `valCols`. Output is one
    * row per status in {added, deleted, changed, unchanged} with its
    * count.
    *
    * Scale: one full-outer shuffle join on the key columns (AQE splits
    * skewed key ranges), then a ≤4-row hash aggregate with map-side
    * partials. Nothing is ever materialized per-key beyond the join.
    */
  def diffSummary(base: DataFrame, v2: DataFrame,
                  keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val cols = keyCols ++ valCols
    val b = base.select(cols.map(F.col): _*).withColumn("_b", F.lit(1))
    val v = v2.select(cols.map(F.col): _*)
      .toDF(cols.map(_ + "__v"): _*).withColumn("_v", F.lit(1))
    val onKeys = keyCols.map(k => F.col(k) === F.col(k + "__v")).reduce(_ && _)
    val changed =
      valCols.map(c => !(F.col(c) <=> F.col(c + "__v"))).reduce(_ || _)
    b.join(v, onKeys, "full_outer")
      .select(
        F.when(F.col("_b").isNull, "added")
          .when(F.col("_v").isNull, "deleted")
          .when(changed, "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(F.count(F.lit(1)).as("n"))
  }

  /** Arc rows whose `refCol` has no matching vertex `keyCol`: returns
    * (ref_id, n_arcs) per dangling reference.
    *
    * Scale: aggregate the arcs by reference FIRST (map-side combinable,
    * shrinks the join input from |arcs| to |distinct refs|), then a
    * left-anti join against the vertex key set — broadcast when the
    * vertex side is small, sort-merge otherwise; never row-per-arc.
    */
  def danglingRefs(arcs: DataFrame, refCol: String,
                   vertices: DataFrame, keyCol: String): DataFrame = {
    val refs = arcs.groupBy(F.col(refCol).as("ref_id"))
      .agg(F.count(F.lit(1)).as("n_arcs"))
    refs.join(
      vertices.select(F.col(keyCol).as("ref_id")),
      Seq("ref_id"), "left_anti")
  }

  /** Graph-shape ingest audit — the one-row sanity report a bulk edge
    * load is gated on before anything downstream runs: raw arc count,
    * self-loops, parallel duplicates (same (src, dst) more than once),
    * distinct simple arcs, endpoint-vertex count, and vertices present
    * in the vertex set but touching no arc (isolated — usually a sign
    * the edge extract dropped a partition). All exact integers.
    *
    * Scale: one (src, dst) count aggregate (map-side combinable — the
    * arc volume collapses to the distinct-arc cardinality), one
    * endpoint distinct, one anti-join against the vertex keys; every
    * term is a Σ over that aggregate, no window, no self-join.
    */
  def graphShape(arcs: DataFrame, srcCol: String, dstCol: String,
      vertices: DataFrame, keyCol: String): DataFrame = {
    val pairs = arcs.select(F.col(srcCol).as("s"), F.col(dstCol).as("d"))
      .groupBy("s", "d").agg(F.count(F.lit(1)).as("c"))
      .transform(graft.CacheScope.persist(_)) // feeds 3 aggregates
    val endpoints = pairs.select(F.col("s").as("v"))
      .unionByName(pairs.select(F.col("d").as("v"))).distinct()
      .transform(graft.CacheScope.persist(_))
    val isolated = vertices.select(F.col(keyCol).as("v")).distinct()
      .join(endpoints, Seq("v"), "left_anti")
      .agg(F.count(F.lit(1)).as("n_isolated"))
    pairs.agg(
        F.sum(F.col("c")).as("n_arcs_raw"),
        F.sum(F.when(F.col("s") === F.col("d"), F.col("c"))
          .otherwise(F.lit(0L))).as("n_self_loops"),
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1)
          .otherwise(F.lit(0L))).as("n_parallel_dupes"),
        F.count(F.lit(1)).as("n_distinct_arcs"))
      .crossJoin(F.broadcast(
        endpoints.agg(F.count(F.lit(1)).as("n_endpoints"))))
      .crossJoin(F.broadcast(isolated))
  }
}
