package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/**
 * Job-floor probe (not part of the driver contract): runs one
 * registered query twice (warm + timed) with a SparkListener counting
 * jobs and per-job wall, and prints the distribution. This is the
 * instrument behind the r15 broadcast-hint law — it showed
 * q_leiden_full's 25 s wall was 663 AQE exchange-materialization jobs
 * whose duration sum ≈ wall (job COUNT, not repeated work), which a
 * per-query timer cannot distinguish from slow operators.
 *
 * Usage: SPARK_GRAFT_PROBE=q_leiden_full sbt "runMain graft.ScratchJobs"
 */
object ScratchJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_PROBE", "q_leiden_full")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUF", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    val t = collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val starts = collection.mutable.Map.empty[Int, Long]
    // r17: attribute each job to its submission call site so the
    // per-operator job budget is readable (guide §1.5)
    val sites = collection.mutable.Map.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = System.nanoTime(); jobs += 1
        sites(j.jobId) =
          if (j.stageInfos.nonEmpty) j.stageInfos.maxBy(_.stageId).name
          else "?"
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.getOrElse(j.jobId, System.nanoTime())
        t += ((j.jobId, s, System.nanoTime()))
      }
    })
    for (q <- qname.split(",").map(_.trim).filter(_.nonEmpty)) {
      def run(): Long = SparkEntry.queries(q)(spark, sfDir).count()
      CacheScope.drain(spark)
      run() // warm
      CacheScope.drain(spark)
      Thread.sleep(500)
      jobs = 0; t.clear()
      val t0 = System.nanoTime()
      val n = run()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val durs = t.map { case (id, s, e) => (id, (e - s) / 1e9) }
        .sortBy(-_._2)
      println(f"SCRATCH $q jobs=$jobs wall=$wall%.1f rows=$n " +
        f"jobsum=${durs.map(_._2).sum}%.1f")
      println("SCRATCH top15: " + durs.take(15).map { case (id, d) =>
        f"j$id=$d%.2f" }.mkString(" "))
      // per-call-site rollup: job count + summed seconds, heaviest first
      val bySite = durs.groupBy { case (id, _) => sites.getOrElse(id, "?") }
        .map { case (s, ds) => (s, ds.size, ds.map(_._2).sum) }
        .toSeq.sortBy(-_._3)
      bySite.take(12).foreach { case (s, n, d) =>
        println(f"SCRATCH site n=$n%3d sum=$d%6.2f  $s") }
    }
    spark.stop()
  }
}
