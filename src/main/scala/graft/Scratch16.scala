package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Round-16 probe (temporary instrument, same class as ScratchJobs):
  * knnRefine substrate quality + two-layer recall on the CLUSTERED
  * MoG corpus at n=4096 — bucket-size distribution, dropped/hot
  * bucket counts, and the recall consequences. */
object Scratch16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = 4096; val dim = 16; val nc = 8
    val mog = Similarity.mogEmbeddings(spark, n, dim, nc, block = true)
      .transform(CacheScope.persist(_))
    val qids: Seq[Long] = (0 until 16).map(_ * 256L)

    // ---- substrate quality: LSH bucket-size distribution ----
    val planes = Similarity.hyperplanes(6, dim, 42L)
    val sig = mog.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), planes).as("bucket"))
    val hist = sig.groupBy("bucket").agg(count(lit(1)).as("bsz"))
      .transform(CacheScope.persist(_))
    println("== bucket histogram (bucket, size) ==")
    hist.orderBy(col("bsz").desc).collect()
      .foreach(r => println(s"  b=${r.get(0)} sz=${r.get(1)}"))
    val dropped = hist.filter(col("bsz") > 128)
      .agg(count(lit(1)), sum(col("bsz"))).head()
    println(s"over-cap buckets=${dropped.get(0)} rows=${dropped.get(1)}")

    val gt = Similarity.bruteForceTopK(mog, "vec_id", "embedding",
      queryIds = qids, k = 5).transform(CacheScope.persist(_))
    def mean(df: DataFrame): Double = {
      val r = df.agg(avg(col("recall")), min(col("recall"))).head()
      println(s"  min=${r.getDouble(1)}")
      r.getDouble(0)
    }
    def rec(approx: DataFrame): Double =
      mean(Similarity.recallPerQuery(gt, approx))

    val sub = Similarity.knnRefine(mog, "vec_id", "embedding",
      k = 12, numPlanes = 6, dim = dim, maxBucketSize = 128,
      expandCap = 12).select("vec_id", "nbr_id")
      .transform(CacheScope.persist(_))
    println(s"substrate edges=${sub.count()}")
    val cents = Similarity.ivfTrain(mog, "vec_id", "embedding",
      nCells = 32, iters = 3).transform(CacheScope.persist(_))
    println("== flat trained IVF (entry-layer quality control) ==")
    println("mean=" + rec(Similarity.ivfTopKWith(mog, "vec_id",
      "embedding", cents, queryIds = qids, k = 5, nProbe = 6)))
    println("== two-layer trained on knnRefine substrate ==")
    println("mean=" + rec(Similarity.graphAnnIvfTopKWith(mog, "vec_id",
      "embedding", sub, queryIds = qids, centroids = cents,
      nProbe = 6, beam = 12, rounds = 7, k = 5)))
    println("== same, beam=16 rounds=10 ==")
    println("mean=" + rec(Similarity.graphAnnIvfTopKWith(mog, "vec_id",
      "embedding", sub, queryIds = qids, centroids = cents,
      nProbe = 6, beam = 16, rounds = 10, k = 5)))
    val subD3 = Similarity.knnDescent(mog, "vec_id", "embedding",
      k = 12, numPlanes = 6, dim = dim, maxBucketSize = 128,
      expandCap = 12, maxRounds = 3)
      .select("vec_id", "nbr_id")
      .transform(CacheScope.persist(_))
    println("== descent3 substrate, nProbe=6 beam=12 walk=7 ==")
    println("mean=" + rec(Similarity.graphAnnIvfTopKWith(mog,
      "vec_id", "embedding", subD3, queryIds = qids,
      centroids = cents, nProbe = 6, beam = 12, rounds = 7, k = 5)))
    println("== descent3 substrate, nProbe=8 beam=16 walk=8 ==")
    println("mean=" + rec(Similarity.graphAnnIvfTopKWith(mog,
      "vec_id", "embedding", subD3, queryIds = qids,
      centroids = cents, nProbe = 8, beam = 16, rounds = 8, k = 5)))
    val subD4 = Similarity.knnDescent(mog, "vec_id", "embedding",
      k = 16, numPlanes = 6, dim = dim, maxBucketSize = 128,
      expandCap = 16, maxRounds = 3)
      .select("vec_id", "nbr_id")
      .transform(CacheScope.persist(_))
    println("== descent3 k=16 substrate, nProbe=6 beam=12 walk=7 ==")
    println("mean=" + rec(Similarity.graphAnnIvfTopKWith(mog,
      "vec_id", "embedding", subD4, queryIds = qids,
      centroids = cents, nProbe = 6, beam = 12, rounds = 7, k = 5)))

    spark.stop()
  }
}
