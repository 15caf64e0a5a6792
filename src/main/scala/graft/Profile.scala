package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def sh: DataFrame = Dedup.shingles(docs, "doc_id", "text", 4)

    // warmup
    (1 to 2).foreach { _ =>
      docs.count(); sh.count()
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 4, 0.5).count()
      Dedup.minhashSignatures(docs, "doc_id", "text", 4, 8).count()
    }

    time("docs scan")(docs.count())
    time("tokens")(docs.select(explode(TextAnalysis.tokens(col("text")))).count())
    time("shingles")(sh.count())
    time("shingles+md5")(sh.withColumn("h", Dedup.hash32(col("shingle"))).count())
    time("sizes")(sh.groupBy("id").agg(count(lit(1))).count())
    val buckets = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    time("buckets")(buckets.count())
    val nestedPairs = transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("a"), y.as("b"))))
    val inter = buckets.select(explode(flatten(nestedPairs)).as("p"))
      .groupBy(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("inter")(inter.count())
    time("full jaccard")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 4, 0.5).count())
    time("minhash sigs")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 4, 8).count())
    time("lsh candidates")(
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs, "doc_id", "text", 4, 8), 8, 4).count())

    // simhash stages
    val tok = docs.select(col("doc_id").as("id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    (1 to 2).foreach { _ =>
      tok.count()
      Dedup.simhash(docs, "doc_id", "text", 64).count()
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 64, 3).count()
    }
    time("sh: tokens")(tok.count())
    time("sh: +md5")(tok.select(col("id"), md5(col("tok"))).count())
    time("sh: sig16")(Dedup.simhash(docs, "doc_id", "text", 16).count())
    time("sh: sig64")(Dedup.simhash(docs, "doc_id", "text", 64).count())
    time("sh: neardup64")(
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 64, 3).count())
    spark.stop()
  }
}
