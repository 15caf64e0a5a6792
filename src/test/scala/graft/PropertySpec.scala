package graft

import graft.model.GraphStore
import graft.operators.{GetNeighbors, Sample, Skew}
import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for codec-free invariants (SURVEY.md §5): dedup
  * idempotence, limit ≤ k, reservoir size, salted-agg equivalence.
  * (Deterministic seeded sampling — the scalatest/scalacheck bridge
  * artifact isn't in the offline cache.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 5)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  val textGen: Gen[String] = Gen.listOfN(30,
    Gen.oneOf("the", "fox", "dog", "spark", "row", "scan", "fast", ""))
    .map(_.mkString(" "))

  test("exact dedup is idempotent") {
    forAll(Gen.listOfN(20, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.exact(df, "doc_id", "text")
      val twice = Dedup.exact(once, "doc_id", "text")
      assert(once.count() == twice.count())
    }
  }

  test("per-vertex limit never exceeds k") {
    val store = GraphStore.cached(spark, sfDir)
    forAll(Gen.choose(1, 7)) { k =>
      val df = GetNeighbors.flat(store, GetNeighbors.Request(
        Seq("contains"), limitPerVertex = Some(k)))
      val maxPer = df.groupBy("_vid").count().agg(max("count"))
        .head.getLong(0)
      assert(maxPer <= k)
    }
  }

  test("reservoir size = min(k, n) for any k") {
    forAll(Gen.choose(1, 50), Gen.choose(1, 100)) { (k, n) =>
      val df = (1L to n.toLong).toDF("v").coalesce(1)
      val got = df.agg(Sample.reservoir(col("v"), k).as("s"))
        .as[Seq[Long]].head()
      assert(got.size == math.min(k, n))
      assert(got.distinct.size == got.size)
    }
  }

  test("salted aggregation equals plain aggregation for any salt factor") {
    val store = GraphStore.cached(spark, sfDir)
    val edges = store.edge("placed")
    forAll(Gen.choose(2, 16)) { saltFactor =>
      val salted = Skew.saltedAgg(edges, GraphStore.SRC, GraphStore.DST,
        saltFactor, Seq(
          Skew.Agg("*", "count", "cnt"),
          Skew.Agg("o_totalprice", "sum", "s"),
          Skew.Agg("o_totalprice", "min", "mn"),
          Skew.Agg("o_totalprice", "max", "mx")))
      val plain = edges.groupBy(col(GraphStore.SRC)).agg(
        count(lit(1)).as("cnt"), sum("o_totalprice").as("s"),
        min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      // double sums regroup across the two stages -> compare rounded
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("s", round(col("s"), 2))
      assert(norm(salted).except(norm(plain)).isEmpty &&
        norm(plain).except(norm(salted)).isEmpty)
    }
  }

  test("token count is invariant under extra whitespace") {
    forAll(textGen) { t =>
      val padded = "  " + t.replace(" ", "   ") + " "
      val df = Seq(t, padded).toDF("text")
      val counts = df.select(TextAnalysis.tokenCount(col("text")))
        .as[Int].collect()
      assert(counts(0) == counts(1))
    }
  }
}
