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

  test("viterbiSegments applies (min k, max s, lexicographic path)") {
    import graft.pipeline.TextAnalysis
    val wf = Seq(("abc", 1L), ("abab", 2L)).toDF("w", "f")
    val vocab = Seq(("a", 5L), ("b", 3L), ("c", 1L), ("ab", 4L),
      ("abc", 2L)).toDF("tok", "cnt")
    val got = TextAnalysis.viterbiSegments(wf, vocab, maxPieceLen = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got("abc") == ((1L, 2L, "abc")), s"k=1 piece must win: $got")
    assert(got("abab") == ((2L, 8L, "ab ab")), s"greedy pair: $got")
  }

  test("viterbiSegments breaks (k, s) ties by smallest path") {
    import graft.pipeline.TextAnalysis
    // 'abc' under {ab:1, c:2} vs {a:2, bc:1}: both k=2, s=3 — the
    // lexicographically smaller joined path 'a bc' must win
    val wf = Seq(("abc", 1L)).toDF("w", "f")
    val vocab = Seq(("ab", 1L), ("c", 2L), ("a", 2L), ("bc", 1L))
      .toDF("tok", "cnt")
    val got = TextAnalysis.viterbiSegments(wf, vocab, maxPieceLen = 4)
      .collect().head
    assert(got.getLong(2) == 2L && got.getString(4) == "a bc",
      s"tie-break diverged: $got")
  }

  test("unigramTrain keeps every single character (coverage floor)") {
    import graft.pipeline.TextAnalysis
    val docs = Seq("aaab aaab ab zq").toDF("text")
    val v = TextAnalysis.unigramTrain(docs, "text", maxPieceLen = 3,
      seedSize = 5, vocabSize = 2, nRounds = 2)
    val toks = v.collect().map(_.getString(0)).toSet
    assert(Set("a", "b", "z", "q").subsetOf(toks),
      s"single chars pruned: $toks")
    val multi = toks.filter(_.length >= 2)
    assert(multi.size <= 2, s"vocabSize prune failed: $multi")
  }

  test("labelPropagationStable converges where sync LPA oscillates") {
    val store = graft.model.GraphStore.tpch(spark, sfDir)
    val trace = GraphAnalytics.labelPropagationStableTrace(store,
      Seq("in_nation", "in_region"), colorRounds = 8, maxSweeps = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val lastSweep = trace.map(_._1).max
    assert(lastSweep < 6L, s"no early exit: $lastSweep sweeps used")
    assert(trace.filter(_._1 == lastSweep).forall(_._2 == 0L),
      "final sweep must be all-zero (converged)")
    // sync LPA on the same graph: the trace never reaches zero within
    // the same budget (the oscillation the stable variant fixes)
    val sync = GraphAnalytics.labelPropagationTrace(store,
      Seq("in_nation", "in_region"), maxIters = 6)
      .collect().map(_.getLong(1))
    assert(sync.last != 0L, "expected sync-LPA oscillation on fixture")
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
