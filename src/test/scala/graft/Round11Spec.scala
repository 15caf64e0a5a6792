package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Round-11 additions: iterated BPE training. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain replays the reference greedy-merge loop exactly") {
    // corpus: 'aaab' ×2, 'ab' ×1 — small enough to run by hand.
    // step 1: (a a)=4 beats (a b)=3 → 'aaab'→'aa a b'
    // step 2: (a b)=3 beats (aa a)=2 → 'aa ab' / 'ab'
    // step 3: (aa ab)=2 → 'aaab'; then no pairs remain (early stop)
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 10)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a a", 4L), (2L, "a b", 3L), (3L, "aa ab", 2L)),
      s"merge list diverged: $got")
  }

  test("bpeTrain leftmost-greedy merge handles overlapping runs") {
    // 'aaa': pairs (a,a) at 2 positions -> cnt 2; greedy merge gives
    // 'aa a' (NOT 'a aa'), so step 2's top pair is (aa, a)
    val docs = Seq("aaa aaa").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 2)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a a", 4L), (2L, "aa a", 2L)),
      s"greedy law diverged: $got")
  }

  test("bpeTrain merge list is prefix-stable as nMerges grows") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .limit(40).select("text")
    val m3 = TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val m6 = TextAnalysis.bpeTrain(docs, "text", nMerges = 6)
      .orderBy("step").collect().map(_.toSeq).toSeq
    assert(m6.take(3) == m3, "steps 1..3 must not depend on nMerges")
    assert(m6.size == 6)
  }
}
