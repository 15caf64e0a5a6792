package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-inspection main: prints the formatted physical plan of selected
 * headline queries (the evidence trail for PLANS.md — pushed filters,
 * pruned schemas, broadcast vs shuffle joins, exchange reuse).
 */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_get_neighbors_out", "q_get_neighbors_tagprops",
        "q_lookup_prefix_range", "q_degrees", "q_pagerank",
        "q_ngram_jaccard", "q_ann_topk", "q_ttl_visibility")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
