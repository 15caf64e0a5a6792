package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Co-located physical layout — the Spark equivalent of the reference's
 * part colocation (`hash(vid) % parts` puts a vertex and all its edges
 * in the same part, src/utils/NebulaKeyUtils.h:14-26), which is what
 * makes its one-hop join shuffle-free.
 *
 * Bucketed tables (`bucketBy(id) + sortBy(id)`) give Catalyst the same
 * guarantee: a join of two tables bucketed on the join key plans as a
 * sort-merge join with NO Exchange on either side. At 100 TB this is
 * the difference between a full-network shuffle of the edge table per
 * query and a purely local join; the rebuild-index admin task (§2.9)
 * maps to re-bucketing a projection the same way.
 */
object BucketedStore {

  /** Persist a frame bucketed+sorted on the key columns. */
  def save(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def load(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** RebuildIndexTask analog: materialize a sorted, bucketed projection
    * over selected columns (a covering "index" table). One job over an
    * immutable snapshot — no operation-log catch-up needed
    * (SURVEY.md §2.9). */
  def rebuildIndex(df: DataFrame, table: String, buckets: Int,
      indexCols: Seq[String]): Unit =
    save(df.select(indexCols.head, indexCols.tail: _*), table, buckets,
      Seq(indexCols.head))
}
