package graft

import graft.expr.FilterExpr._
import graft.operators.{GetNeighbors, GetProps, Lookup, Mutations}
import graft.operators.GetNeighbors.{Request, Out, In, StatSpec}
import org.apache.spark.sql.functions._

/**
 * Golden tests over the string-vid NBA fixture, mirroring the
 * reference's own test matrix (GetNeighborsTest / GetPropTest /
 * LookupIndexTest / UpdateVertexTest run against MockData — SURVEY.md
 * §5). Exercises the id-type-agnostic request path: vids here are
 * strings, the TPC-H suite uses longs.
 */
class NbaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nba = NbaFixture.store(spark)

  test("GetNeighbors out over string vids: serve props in key order") {
    val out = GetNeighbors.flat(nba, Request(
      edgeTypes = Seq("serve"),
      vertexIds = Some(Seq("Tracy McGrady", "Tim Duncan")),
      direction = Out,
      edgeProps = Seq("teamName", "startYear")))
      .select("_vid", "_nbr", "teamName", "startYear")
      .as[(String, String, String, Long)].collect().toList
    // edges arrive sorted by (type, rank, dst) within each vertex
    assert(out.filter(_._1 == "Tracy McGrady").map(_._2) ==
      List("Raptors", "Magic", "Rockets"))
    assert(out.filter(_._1 == "Tim Duncan") ==
      List(("Tim Duncan", "Spurs", "Spurs", 1997L)))
  }

  test("GetNeighbors in: who served at Spurs, with edge filter") {
    val in = GetNeighbors.flat(nba, Request(
      edgeTypes = Seq("serve"),
      vertexIds = Some(Seq("Spurs")),
      direction = In,
      edgeProps = Seq("startYear"),
      filter = Some(Cmp(">=", Prop("startYear"), Lit(2001L)))))
      .select("_nbr").as[String].collect().toSet
    assert(in == Set("Tony Parker", "Manu Ginobili", "LaMarcus Aldridge"))
  }

  test("GetNeighbors per-vertex stats over string vids") {
    val stats = GetNeighbors.stats(nba, Request(
      edgeTypes = Seq("serve"),
      vertexIds = Some(Seq("Tracy McGrady")),
      direction = Out,
      stats = Seq(StatSpec("teamGames", "sum", "total_games"),
        StatSpec("teamAvgScore", "max", "best_avg"))))
    val row = stats.select("total_games", "best_avg")
      .as[(Long, Double)].head()
    assert(row == ((192L + 295L + 303L, 28.1)))
  }

  test("GetProps point-get on string vid, nullable champions") {
    val byId = GetProps.vertices(nba, "player",
      Seq("Tim Duncan", "Tracy McGrady"), Seq("age", "champions"))
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(byId("Tim Duncan") == ((44L, Some(5L))))
    assert(byId("Tracy McGrady") == ((41L, None)))
  }

  test("Lookup with string prefix + int range hints (serve index shape)") {
    val hits = Lookup(nba.edge("serve"), Lookup.Request(
      contexts = Seq(Lookup.IndexQueryContext(Seq(
        Lookup.Prefix("playerName", "Tracy McGrady"),
        Lookup.Range("startYear", lo = Some(2000L), hi = Some(2005L))))),
      yieldCols = Seq("playerName", "teamName", "startYear"),
      dedupKeys = Seq("playerName", "teamName", "startYear")))
      .select("teamName").as[String].collect().toSet
    assert(hits == Set("Magic", "Rockets"))
  }

  test("update on string-keyed tag table (UpdateVertex analog)") {
    val updated = Mutations.updateWhere(nba.tag("player"),
      Cmp("==", Prop("playing"), Lit(true)),
      sets = Seq("age" -> (col("age") + 1)))
    val ages = updated.select("_vid", "age").as[(String, Long)]
      .collect().toMap
    assert(ages("LaMarcus Aldridge") == 36L) // playing: bumped
    assert(ages("Tim Duncan") == 44L)        // retired: untouched
  }
}

/** Second half of the reference test matrix over the NBA fixture:
  * mutations, pagination, direction symmetry (AddVerticesTest,
  * DeleteEdgesTest, ScanVertexTest analogs). */
class NbaMutationScanSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Mutations, Scan}
  import graft.operators.GetNeighbors.{Request, Both}

  private lazy val nba = NbaFixture.store(spark)

  test("add vertices if-not-exists keeps first-seen (string keys)") {
    val incoming = Seq(
      ("Tim Duncan", "Tim Duncan", 99L),   // exists: must keep age 44
      ("Dirk Nowitzki", "Dirk Nowitzki", 42L)) // new: inserted
      .toDF("_vid", "name", "age")
    val base = nba.tag("player").select("_vid", "name", "age")
    val merged = Mutations.addRows(base, incoming, Seq("_vid"),
      ifNotExists = true)
    val ages = merged.select("_vid", "age").as[(String, Long)]
      .collect().toMap
    assert(ages("Tim Duncan") == 44L && ages("Dirk Nowitzki") == 42L)
    assert(merged.count() == 6)
  }

  test("delete edges by full (src, rank, dst) string key") {
    val keys = Seq(("Tracy McGrady", 2000L, "Magic"))
      .toDF("_src", "_rank", "_dst")
    val left = Mutations.deleteRows(nba.edge("serve"), keys,
      Seq("_src", "_rank", "_dst"))
    assert(left.count() == 8)
    assert(left.filter($"_src" === "Tracy McGrady").count() == 2)
  }

  test("keyset pagination walks string vids in order") {
    val p1 = Scan.pageWithCursor(nba.tag("player"), "_vid",
      Seq("age"), limit = 2, cursor = None)
    val v1 = p1.rows.select("_vid").as[String].collect().toList
    assert(v1 == List("LaMarcus Aldridge", "Manu Ginobili"))
    val p2 = Scan.pageWithCursor(nba.tag("player"), "_vid",
      Seq("age"), limit = 2, cursor = p1.nextCursor)
    val v2 = p2.rows.select("_vid").as[String].collect().toList
    assert(v2 == List("Tim Duncan", "Tony Parker"))
    val p3 = Scan.pageWithCursor(nba.tag("player"), "_vid",
      Seq("age"), limit = 2, cursor = p2.nextCursor)
    assert(p3.rows.select("_vid").as[String].collect().toList ==
      List("Tracy McGrady"))
  }

  test("teammate BOTH direction yields the union of signed directions") {
    val both = GetNeighbors.flat(nba, Request(
      edgeTypes = Seq("teammate"),
      vertexIds = Some(Seq("Tim Duncan")),
      direction = Both))
      .select("_type", "_nbr").as[(Int, String)].collect().toSet
    // out rows carry +102, in rows -102 (reference's signed edgeType)
    assert(both == Set((102, "Tony Parker"), (102, "Manu Ginobili"),
      (-102, "Tony Parker"), (-102, "Manu Ginobili")))
  }
}

/** TTL-mode and request-validation analogs (IndexWithTTLTest and the
  * reference's failure-path tests). */
class NbaTtlValidationSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{GetNeighbors, Lookup, Ttl}
  import graft.operators.GetNeighbors.{Request, Out}

  private lazy val nba = NbaFixture.store(spark)

  test("TTL visibility over an insertTime column (mock_ttl_col analog)") {
    val withTtl = nba.tag("player")
      .withColumn("insertTime", when($"age" > 40,
        to_timestamp(lit("2024-01-01 00:00:00")))
        .otherwise(to_timestamp(lit("2024-01-31 00:00:00"))))
    val now = to_timestamp(lit("2024-01-20 00:00:00"))
    val visible = Ttl.visible(withTtl, "insertTime", 86400L * 10, now)
      .select("_vid").as[String].collect().toSet
    // rows older than 10 days are invisible: only the age<=40 rows
    // (inserted day 31, in the future => alive) survive
    assert(visible == Set("Tony Parker", "LaMarcus Aldridge"))
  }

  test("invalid requests fail fast with clear messages") {
    intercept[IllegalArgumentException] {
      GetNeighbors.stats(nba, Request(edgeTypes = Seq("serve"),
        vertexIds = Some(Seq("Tim Duncan")), direction = Out))
    }
    intercept[IllegalArgumentException] {
      Lookup.validateHints(Seq(
        Lookup.Range("startYear", lo = Some(2000L)),
        Lookup.Prefix("playerName", "x"))) // range not last
    }
    intercept[IllegalArgumentException] {
      Lookup.validateHints(Nil)
    }
  }
}
