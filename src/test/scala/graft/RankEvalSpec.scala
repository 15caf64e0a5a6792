package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  // exact list for query 1: a(0.9) b(0.8) c(0.7) -> ranks 1,2,3
  private val exact = Seq(
    (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7),
    (2L, 10L, 0.9), (2L, 11L, 0.8))
    .toDF("query_id", "cand_id", "sim")

  test("reversed list: recall-perfect but maximal displacement") {
    // query 1 approx returns the same 3 candidates REVERSED
    val approx = Seq(
      (1L, 10L, 0.1), (1L, 11L, 0.2), (1L, 12L, 0.3),
      (2L, 10L, 0.9), (2L, 11L, 0.8))
      .toDF("query_id", "cand_id", "sim")
    val out = Similarity.rankDisplacement(exact, approx)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // recall would be 1.0 for both queries; footrule separates them:
    // q1 displacements |1-3| + |2-2| + |3-1| = 4, max 2
    assert(out(1L) == ((3L, 3L, 4L, 2L)))
    // q2 approx identical -> zero displacement
    assert(out(2L) == ((2L, 2L, 0L, 0L)))
  }

  test("missing candidates: displacement only over the common set") {
    val approx = Seq(
      (1L, 10L, 0.9), (1L, 99L, 0.8), (1L, 12L, 0.7)) // 11 missing, 99 noise
      .toDF("query_id", "cand_id", "sim")
    val out = Similarity.rankDisplacement(exact, approx)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // common = {10 (erk1/ark1), 12 (erk3/ark3)} -> sum 0
    assert(out(1L) == ((3L, 2L, 0L, 0L)))
    // query 2 absent from approx entirely -> zeros via the left join
    assert(out(2L) == ((2L, 0L, 0L, 0L)))
  }
}
