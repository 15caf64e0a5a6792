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

  test("bpePairCounts: weighted by word frequency, rank ties by pair") {
    val df = Seq("ab ab ab cd", "ab cd xy").toDF("text")
    val out = TextAnalysis.bpePairCounts(df, "text", topK = 10)
      .as[(Long, String, Long)].collect().toList
    // ab x4, cd x2, xy x1 -> ranked ab(4), cd(2), xy(1)
    assert(out == List((1L, "ab", 4L), (2L, "cd", 2L), (3L, "xy", 1L)))
  }
}
