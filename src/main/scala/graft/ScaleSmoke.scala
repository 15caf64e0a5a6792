package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/**
 * Scale-headroom smoke: amplify the sf0.1 fixtures in-memory (N copies,
 * keys offset, text perturbed so copies aren't trivial exact dups) and
 * run the heaviest pipelines. The point is the SHAPE of the scaling
 * curve — a linear operator on 10x data should cost ~10x its marginal
 * per-row time, not 100x — catching quadratic blowups the fixed-SF
 * bench can't see. Results recorded in PLANS.md.
 */
object ScaleSmoke {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"SMOKE $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def amplify(df: DataFrame, keyCols: Seq[String], textCol: Option[String]): DataFrame = {
      val copies = spark.range(factor).select(col("id").as("_copy"))
      var out = df.crossJoin(copies)
      keyCols.foreach { k =>
        out = out.withColumn(k, col(k) + col("_copy") * 10000000L)
      }
      textCol.foreach { t =>
        // perturb: suffix differs per copy so copies are near-dups, not
        // exact dups (exercises the verify stage, not just exact hash)
        out = out.withColumn(t,
          concat(col(t), lit(" copytag"), col("_copy")))
      }
      out.drop("_copy")
    }

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = amplify(docs0, Seq("doc_id"), Some("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = amplify(li0, Seq("l_orderkey", "l_partkey"), None)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    println(s"amplification factor: $factor")
    time("docs materialize")(docs.count())
    time("edges materialize")(edges.count())

    time(s"minhash sigs ${factor}x")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 4, 8).count())
    time(s"lsh candidates ${factor}x")(
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs, "doc_id", "text", 4, 8), 8, 4,
        maxBucketSize = 64).count())
    time(s"dedup pipeline ${factor}x")(
      Dedup.dedupPipeline(docs, "doc_id", "text", 4, 8, 4, 0.5).count())
    time(s"simhash neardup ${factor}x")(
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 64, 3,
        maxBucketSize = 64).count())

    // pagerank over the amplified edge list (disconnected copies —
    // structurally the same graph x N)
    val store = graft.model.GraphStore(
      Map.empty, Map("amp" -> edges.select(
        col("l_orderkey").as(graft.model.GraphStore.SRC),
        col("l_partkey").as(graft.model.GraphStore.DST),
        lit(0L).as(graft.model.GraphStore.RANK))),
      Map("amp" -> 1))
    time(s"pagerank 5 iters ${factor}x")(
      graft.analytics.GraphAnalytics.pageRank(store, Seq("amp"), 5).count())

    spark.stop()
  }
}
