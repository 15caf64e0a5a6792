package graft

import graft.analytics.GraphAnalytics
import graft.model.GraphStore
import graft.pipeline.{Curation, TextAnalysis}
import org.apache.spark.sql.functions._

class ResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("resolveEntities groups transitively, elects longest-key golden record") {
    // "acme corp" ~1~ "acme corpx" ~1~ "acme corpxy": transitive chain
    // even though ends are 2 edits apart; "zebra inc" is a singleton
    val df = Seq(
      (10L, "Acme Corp"), (11L, "acme corpx"), (12L, "acme corpxy"),
      (50L, "zebra inc"))
      .toDF("id", "name")
    val out = Curation.resolveEntities(df, "id", "name",
        maxDist = 2, maxBlockSize = 64)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.size == 4) // every record classified exactly once
    // chain collapses to one entity labeled by the min id, canonical =
    // longest normalized key (12 wins with 11 chars)
    assert(out(10L) == ((10L, 12L, 3L)))
    assert(out(11L) == ((10L, 12L, 3L)))
    assert(out(12L) == ((10L, 12L, 3L)))
    assert(out(50L) == ((50L, 50L, 1L))) // singleton: own entity
  }

  test("resourceAllocation: RA ppm over wedge centers, cap drops hot centers") {
    // star: center 100 adjacent to 1,2,3 (deg 3); extra edge 1-2
    // wedge centers: 100 -> pairs (1,2),(1,3),(2,3) each w 10^6/3
    //                1 -> (2,100); 2 -> (1,100); 3 -> (1? no: deg 1)
    val e = Seq((100L, 1L), (100L, 2L), (100L, 3L), (1L, 2L))
      .toDF(GraphStore.SRC, GraphStore.DST)
      .withColumn(GraphStore.RANK, lit(0L))
    val store = GraphStore(Map.empty, Map("g" -> e), Map("g" -> 1))
    val out = GraphAnalytics.resourceAllocation(store, Seq("g"),
        maxDegree = 10, minCommon = 1)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((1L, 2L)) == ((1L, 333333L))) // via center 100 (deg 3)
    assert(out((1L, 3L)) == ((1L, 333333L)))
    assert(out((2L, 3L)) == ((1L, 333333L)))
    // (2,100) via center 1 (deg 2), (1,100) via center 2 (deg 2)
    assert(out((2L, 100L)) == ((1L, 500000L)))
    assert(out((1L, 100L)) == ((1L, 500000L)))
    // capping at deg <= 2 removes center 100's three pairs
    val capped = GraphAnalytics.resourceAllocation(store, Seq("g"),
        maxDegree = 2, minCommon = 1)
      .as[(Long, Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(capped == Set((2L, 100L), (1L, 100L)))
  }

  test("ppjoinPairs == naive all-pairs join (prefix filter is lossless)") {
    import graft.pipeline.Dedup
    // 40 docs in 8 near-dup families (perturbed tails) + unique noise
    val docs = (0 until 40).map { i =>
      val fam = i % 8
      val base = (0 until 12).map(j => s"w${fam}_$j").mkString(" ")
      (i.toLong, s"$base tail${i}_a tail${i}_b")
    }.toDF("doc_id", "text")
    val fast = Dedup.ppjoinPairs(docs, "doc_id", "text",
        n = 3, tNum = 1, tDen = 2)
      .select("id_a", "id_b", "inter").as[(Long, Long, Long)]
      .collect().toSet
    // naive: all co-occurring pairs via the full inverted index
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val szm = sh.groupBy("id").count().as[(Long, Long)].collect().toMap
    val naive = sh.toDF("a", "t")
      .join(sh.toDF("b", "t"), "t").filter(col("a") < col("b"))
      .groupBy("a", "b").count().as[(Long, Long, Long)].collect()
      .filter { case (a, b, i) => 2 * i >= szm(a) + szm(b) - i }
      .map { case (a, b, i) => (a, b, i) }.toSet
    assert(fast == naive)
    assert(fast.nonEmpty, "fixture must produce matching families")
  }

  test("bpePairCounts: weighted by word frequency, rank ties by pair") {
    val df = Seq("ab ab ab cd", "ab cd xy").toDF("text")
    val out = TextAnalysis.bpePairCounts(df, "text", topK = 10)
      .as[(Long, String, Long)].collect().toList
    // ab x4, cd x2, xy x1 -> ranked ab(4), cd(2), xy(1)
    assert(out == List((1L, "ab", 4L), (2L, "cd", 2L), (3L, "xy", 1L)))
  }
}
