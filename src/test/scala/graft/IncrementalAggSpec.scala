package graft

import graft.streaming.ChangeLogListener
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("maintainAgg == fresh recompute on a random ins/del delta") {
    // facts: 500 rows over 23 keys, integral values
    val facts = spark.range(500).select(
      (col("id") % 23).as("k"),
      pmod(hash(col("id")), lit(97)).cast("long").as("v"),
      col("id"))
    val isDeleted = pmod(hash(col("id") + 7), lit(5)) === 0
    val base = facts.filter(col("id") < 350)
    val baseAgg = base.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
    val delta =
      facts.filter(col("id") >= 350)
        .select(col("k"), lit("ins").as("op"), col("v"))
        .unionByName(base.filter(isDeleted)
          .select(col("k"), lit("del").as("op"), col("v")))
    val maintained = ChangeLogListener
      .maintainAgg(baseAgg, delta, "k", "op", "v", "cnt", "s")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val fresh = base.filter(!isDeleted)
      .unionByName(facts.filter(col("id") >= 350))
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(maintained == fresh)
  }

  test("maintainAgg drops keys whose count reaches zero, keeps new keys") {
    val baseAgg = Seq((1L, 2L, 10L), (2L, 1L, 5L))
      .toDF("k", "cnt", "s")
    val delta = Seq(
      (1L, "del", 4L), (1L, "del", 6L), // key 1 fully deleted
      (9L, "ins", 3L)) // brand-new key
      .toDF("k", "op", "v")
    val out = ChangeLogListener
      .maintainAgg(baseAgg, delta, "k", "op", "v", "cnt", "s")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(2L -> ((1L, 5L)), 9L -> ((1L, 3L))))
  }
}
