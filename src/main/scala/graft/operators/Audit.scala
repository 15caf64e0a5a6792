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
}
