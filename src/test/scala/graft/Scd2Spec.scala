package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // key 1: put@10 -> put@20 -> del@30  (two closed intervals)
  // key 2: put@15                      (one open interval)
  // key 3: del@5 -> put@8              (del first, then revived)
  private val chg = Seq(
    (1L, 10L, "put", Some("a1"), Some(1.0)),
    (1L, 20L, "put", Some("a2"), Some(2.0)),
    (1L, 30L, "del", None, None),
    (2L, 15L, "put", Some("b1"), Some(3.0)),
    (3L, 5L, "del", None, None),
    (3L, 8L, "put", Some("c1"), Some(4.0)))
    .toDF("key", "seq", "op", "name", "bal")

  test("intervals: lead closes each put at the next change, del emits none") {
    val iv = Scd2.intervals(chg, "key", "seq", "op", Seq("name", "bal"))
      .select("key", "name", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Int)].collect()
      .map(r => (r._1, r._3) -> ((r._2, r._4, r._5))).toMap
    assert(iv.size == 4) // 4 puts, 2 dels emit nothing
    assert(iv((1L, 10L)) == (("a1", Some(20L), 0)))
    assert(iv((1L, 20L)) == (("a2", Some(30L), 0))) // closed by the del
    assert(iv((2L, 15L)) == (("b1", None, 1)))
    assert(iv((3L, 8L)) == (("c1", None, 1))) // revived after early del
  }

  test("pointInTime: version live at the fact seq; del and pre-history unmatch") {
    val facts = Seq(
      (100L, 1L, 5L), // before first put -> unmatched
      (101L, 1L, 10L), // exactly at put@10 -> a1 (at-or-before)
      (102L, 1L, 25L), // between put@20 and del@30 -> a2
      (103L, 1L, 31L), // after del -> unmatched
      (104L, 3L, 6L), // latest change is the del@5 -> unmatched
      (105L, 3L, 9L), // revived -> c1
      (106L, 9L, 50L)) // key with no changelog at all
      .toDF("fact_id", "k", "fseq")
    val out = Scd2.pointInTime(facts, "k", "fseq",
      chg, "key", "seq", "op", Seq("name", "bal"))
      .select("fact_id", "name", "matched")
      .as[(Long, Option[String], Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 7) // every fact exactly once (left-outer law)
    assert(out(100L) == ((None, 0)))
    assert(out(101L) == ((Some("a1"), 1)))
    assert(out(102L) == ((Some("a2"), 1)))
    assert(out(103L) == ((None, 0)))
    assert(out(104L) == ((None, 0)))
    assert(out(105L) == ((Some("c1"), 1)))
    assert(out(106L) == ((None, 0)))
  }

  test("intervals tile each key's history: no gaps, no overlaps") {
    val iv = Scd2.intervals(chg, "key", "seq", "op", Seq("name"))
      .select("key", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect()
    for ((k, rows) <- iv.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) =>
          assert(to <= from, s"overlap on key $k")
        case _ => ()
      }
      assert(sorted.init.forall(_._3.isDefined),
        s"non-final open interval on key $k")
    }
  }
}
