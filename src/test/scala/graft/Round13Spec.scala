package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics
import graft.pipeline.{Similarity, TextAnalysis}

/** Round-13 additions: the likelihood-loss unigram pruner and its
  * shrink schedule, the normalized uncovered-word sentinel in
  * viterbiSegments, the ivfOccupancyDrift degenerate guard, and
  * louvainLevels' type-stable schema. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("unigramKeepSize interpolates seed to target and lands exactly") {
    val sched = (1 to 4).map(TextAnalysis.unigramKeepSize(100, 20, 4, _))
    assert(sched == Seq(80, 60, 40, 20), s"schedule: $sched")
    assert(sched.zip(sched.tail).forall { case (a, b) => a >= b })
    // degenerate: seed below target never inflates past the target
    assert(TextAnalysis.unigramKeepSize(10, 20, 3, 1) == 20)
  }

  test("unigramTrainLoss keeps the coverage floor and the shrunk budget") {
    val docs = Seq("aaab aaab ab zq zq aaab").toDF("text")
    val v = TextAnalysis.unigramTrainLoss(docs, "text", maxPieceLen = 3,
      seedSize = 5, vocabSize = 2, nRounds = 2)
    val toks = v.collect().map(_.getString(0)).toSet
    assert(Set("a", "b", "z", "q").subsetOf(toks),
      s"single chars pruned: $toks")
    assert(toks.count(_.length >= 2) <= 2, s"budget failed: $toks")
  }

  test("loss prune keeps an expensive-to-replace token over a cheap concat") {
    // Candidates after the E-step: 'xy' is a cheap 2-single concat
    // (krepl=2, loss=cnt); 'pqr' has no 2-gram children in the vocab
    // once the budget shrinks, so krepl=3 doubles its loss. Corpus
    // tuned so usage(xy) > usage(pqr) but loss(pqr) > loss(xy):
    // usage pruning and loss pruning must disagree on the final token.
    val docs = Seq(Seq.fill(8)("xy").mkString(" ") + " " +
      Seq.fill(5)("pqr").mkString(" ")).toDF("text")
    val usage = TextAnalysis.unigramTrain(docs, "text", maxPieceLen = 3,
      seedSize = 8, vocabSize = 1, nRounds = 3)
      .collect().map(_.getString(0)).filter(_.length >= 2).toSet
    val loss = TextAnalysis.unigramTrainLoss(docs, "text",
      maxPieceLen = 3, seedSize = 8, vocabSize = 1, nRounds = 3)
      .collect().map(_.getString(0)).filter(_.length >= 2).toSet
    assert(usage == Set("xy"), s"usage pruner: $usage")
    assert(loss == Set("pqr"), s"loss pruner: $loss")
  }

  test("viterbiSegments emits the sentinel row for BOTH uncovered cases") {
    // vocab with no coverage floor: 'ab' matches a piece but cannot
    // complete ('c' missing); 'zz' matches nothing at all. Both must
    // surface as sentinel rows, not one row and one silent absence.
    val wf = Seq(("abc", 2L), ("zz", 1L), ("ab", 3L)).toDF("w", "f")
    val vocab = Seq(("ab", 5L)).toDF("tok", "cnt")
    val got = TextAnalysis.viterbiSegments(wf, vocab, maxPieceLen = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.isNullAt(4)))).toMap
    assert(got.size == 3, s"one row per input word: $got")
    assert(got("abc") == ((999999L, true)), s"partial-match: $got")
    assert(got("zz") == ((999999L, true)), s"zero-match: $got")
    assert(got("ab") == ((1L, false)), s"covered word: $got")
  }

  test("ivfOccupancyDrift fails loudly on an empty trained index") {
    val trained = Seq.empty[(Long, Long)].toDF("cell", "n")
    val appended = Seq((1L, 0L)).toDF("vec_id", "cell")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfOccupancyDrift(trained, appended).collect()
    }
    assert(ex.getMessage.contains("empty"), ex.getMessage)
  }

  test("louvainLevels returns the long schema for Int-typed edges") {
    val intEdges = Seq((1, 2), (2, 3), (1, 3)).toDF("a", "b")
    val got = GraphAnalytics.louvainLevels(intEdges, maxLevels = 1,
      roundsPerLevel = 2)
    val emptyEdges = Seq.empty[(Int, Int)].toDF("a", "b")
    val empty = GraphAnalytics.louvainLevels(emptyEdges, maxLevels = 1,
      roundsPerLevel = 2)
    // name + type (nullability is a plan artifact the gate's parquet
    // round trip erases anyway)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      empty.schema.map(f => (f.name, f.dataType)),
      s"paths disagree: ${got.schema} vs ${empty.schema}")
    assert(got.count() > 0 && empty.count() == 0)
  }
}
