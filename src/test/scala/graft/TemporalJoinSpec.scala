package graft

import graft.operators.TemporalJoin
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, "A", ts("2024-01-01 10:00:00"), 10.0),
    (2L, "A", ts("2024-01-01 10:05:00"), 11.0),
    (3L, "A", ts("2024-01-01 10:05:00"), 12.0), // tie: higher id wins
    (4L, "B", ts("2024-01-01 09:00:00"), 20.0))
    .toDF("q_id", "sym", "q_ts", "px")

  private val trades = Seq(
    (100L, "A", ts("2024-01-01 10:05:00")), // equal ts -> sees 10:05 quote
    (101L, "A", ts("2024-01-01 10:02:00")), // between quotes -> q_id 1
    (102L, "A", ts("2024-01-01 09:59:59")), // before all -> null
    (103L, "B", ts("2024-01-01 12:00:00")),
    (104L, "C", ts("2024-01-01 12:00:00"))) // no quotes for key
    .toDF("t_id", "sym", "t_ts")

  test("asOfBackward picks latest at-or-before, ties to larger tiebreak") {
    val out = TemporalJoin.asOfBackward(trades, quotes,
      leftKey = "sym", rightKey = "sym", leftTime = "t_ts",
      rightTime = "q_ts", rightTieBreak = "q_id",
      rightCols = Seq("q_id", "px"))
      .select("t_id", "q_id", "px").as[(Long, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(100L) == ((Some(3L), Some(12.0)))) // <= includes equal ts; tie -> id 3
    assert(out(101L) == ((Some(1L), Some(10.0))))
    assert(out(102L) == ((None, None)))
    assert(out(103L) == ((Some(4L), Some(20.0))))
    assert(out(104L) == ((None, None)))
    assert(out.size == 5) // left-outer: every trade exactly once
  }

  test("banded equals the naive inequality join on random data") {
    val n = 400
    val left = spark.range(n).select(
      col("id").as("l_id"), (col("id") % 7).as("k"),
      timestamp_micros(pmod(hash(col("id")), lit(1000000L)) * 3600).as("lt"))
    val right = spark.range(n).select(
      col("id").as("r_id"), (col("id") % 7).as("k2"),
      timestamp_micros(pmod(hash(col("id") + 9999), lit(1000000L)) * 3600)
        .as("rt"))
    val (lo, hi) = (0L, 250L * 3600)
    val fast = TemporalJoin.banded(left, right, "k", "k2", "lt", "rt",
      lo, hi, Seq("l_id" -> "l_id"), Seq("r_id" -> "r_id"))
      .select("l_id", "r_id", "gap_us").as[(Long, Long, Long)]
      .collect().toSet
    val naive = left.join(right, col("k") === col("k2") &&
        (unix_micros(col("rt")) - unix_micros(col("lt"))) >= lo &&
        (unix_micros(col("rt")) - unix_micros(col("lt"))) <= hi)
      .select(col("l_id"), col("r_id"),
        (unix_micros(col("rt")) - unix_micros(col("lt"))).as("gap"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }
}
