package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics

/** Round-12 additions: degenerate-input guards from the r11 advice
  * sweep (empty matching, self-loop-only SCC vertices, empty Louvain
  * input) plus the new operators' laws. */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("weightedMatching on an edge-free input returns the empty matching") {
    val e = Seq.empty[(Long, Long, Long)].toDF("a", "b", "w")
    val got = GraphAnalytics.weightedMatching(e, rounds = 3)
    assert(got.count() == 0L, "empty matching expected")
    assert(got.columns.toSeq == Seq("v", "mate", "round"))
  }

  test("weightedMatching on a self-loop-only input returns the empty matching") {
    // the canonicalizer drops self-loops, so the loop body never runs
    val e = Seq((4L, 4L, 10L), (9L, 9L, 3L)).toDF("a", "b", "w")
    assert(GraphAnalytics.weightedMatching(e, rounds = 3).count() == 0L)
  }

  test("SCC emits a self-loop-only vertex as its own singleton component") {
    // 1<->2 is one SCC; 7 has ONLY the self-loop 7->7; 9 dangles off 1
    val e = Seq((1L, 2L), (2L, 1L), (7L, 7L), (1L, 9L)).toDF("s", "d")
    val got = GraphAnalytics
      .stronglyConnectedComponents(e, "s", "d", maxPeels = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(7L) == 7L, s"self-loop-only vertex lost: $got")
    assert(got(9L) == 9L && got(1L) == got(2L), s"unexpected SCCs: $got")
    assert(got.size == 4, s"expected 4 labeled vertices: $got")
  }

  test("louvainLevels on empty and self-loop-only inputs returns empty") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphAnalytics.louvainLevels(empty, 3, 4).count() == 0L)
    val loops = Seq((5L, 5L), (6L, 6L)).toDF("a", "b")
    val got = GraphAnalytics.louvainLevels(loops, 3, 4)
    assert(got.count() == 0L)
    assert(got.columns.toSeq ==
      Seq("level", "_vid", "community", "q_num", "q_den"))
  }
}
