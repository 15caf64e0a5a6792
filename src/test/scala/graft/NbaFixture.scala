package graft

import graft.model.GraphStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic NBA mock graph — the string-vid fixture every reference
 * operator test runs against (reference: src/mock/MockData.{h,cpp},
 * schemas at :296-471; see FIXTURES.md). A representative subset: enough
 * players/teams/serve rows to exercise multi-team careers, multi-rank
 * parallel edges, nullable champions, and both traversal directions.
 * Vertex ids are the entity NAMES (fixed-string vids in the reference).
 */
object NbaFixture {

  final case class Player(_vid: String, name: String, age: Long,
      playing: Boolean, career: Long, startYear: Long, endYear: Long,
      games: Long, avgScore: Double, serveTeams: Long, country: String,
      champions: Option[Long])

  final case class Serve(_src: String, _dst: String, _rank: Long,
      playerName: String, teamName: String, startYear: Long, endYear: Long,
      teamCareer: Long, teamGames: Long, teamAvgScore: Double,
      `type`: String, champions: Option[Long])

  final case class Teammate(_src: String, _dst: String, _rank: Long,
      player1: String, player2: String, teamName: String,
      startYear: Long, endYear: Long)

  /** Values follow MockData.cpp:56-110's player table shape. */
  def store(spark: SparkSession): GraphStore = {
    import spark.implicits._
    val players = Seq(
      Player("Tim Duncan", "Tim Duncan", 44, false, 19, 1997, 2016,
        1392, 19.0, 1, "America", Some(5L)),
      Player("Tony Parker", "Tony Parker", 38, false, 18, 2001, 2019,
        1254, 15.5, 2, "France", Some(4L)),
      Player("Manu Ginobili", "Manu Ginobili", 42, false, 16, 2002, 2018,
        1057, 13.3, 1, "Argentina", Some(4L)),
      Player("Tracy McGrady", "Tracy McGrady", 41, false, 15, 1997, 2012,
        938, 19.6, 4, "America", None),
      Player("LaMarcus Aldridge", "LaMarcus Aldridge", 35, true, 14, 2006,
        2020, 1003, 19.5, 2, "America", None)).toDF()
    val teams = Seq(
      ("Spurs", "Spurs"), ("Hornets", "Hornets"), ("Raptors", "Raptors"),
      ("Magic", "Magic"), ("Rockets", "Rockets"), ("Trail Blazers",
        "Trail Blazers")).toDF("_vid", "name")
    val serve = Seq(
      Serve("Tim Duncan", "Spurs", 1997, "Tim Duncan", "Spurs", 1997, 2016,
        19, 1392, 19.0, "zzzzz", Some(5L)),
      Serve("Tony Parker", "Spurs", 2001, "Tony Parker", "Spurs", 2001,
        2018, 17, 1198, 16.0, "trade", Some(4L)),
      Serve("Tony Parker", "Hornets", 2018, "Tony Parker", "Hornets", 2018,
        2019, 1, 56, 9.5, "trade", None),
      Serve("Manu Ginobili", "Spurs", 2002, "Manu Ginobili", "Spurs", 2002,
        2018, 16, 1057, 13.3, "draft", Some(4L)),
      Serve("Tracy McGrady", "Raptors", 1997, "Tracy McGrady", "Raptors",
        1997, 2000, 3, 192, 7.7, "draft", None),
      Serve("Tracy McGrady", "Magic", 2000, "Tracy McGrady", "Magic", 2000,
        2004, 4, 295, 28.1, "trade", None),
      Serve("Tracy McGrady", "Rockets", 2004, "Tracy McGrady", "Rockets",
        2004, 2010, 6, 303, 21.0, "trade", None),
      Serve("LaMarcus Aldridge", "Trail Blazers", 2006, "LaMarcus Aldridge",
        "Trail Blazers", 2006, 2015, 9, 648, 21.7, "draft", None),
      Serve("LaMarcus Aldridge", "Spurs", 2015, "LaMarcus Aldridge",
        "Spurs", 2015, 2020, 5, 355, 18.9, "trade", None)).toDF()
    // teammate is stored both directions in the reference; keep one row
    // per direction here too
    val tm = Seq(
      Teammate("Tim Duncan", "Tony Parker", 2001, "Tim Duncan",
        "Tony Parker", "Spurs", 2001, 2016),
      Teammate("Tony Parker", "Tim Duncan", 2001, "Tony Parker",
        "Tim Duncan", "Spurs", 2001, 2016),
      Teammate("Tim Duncan", "Manu Ginobili", 2002, "Tim Duncan",
        "Manu Ginobili", "Spurs", 2002, 2016),
      Teammate("Manu Ginobili", "Tim Duncan", 2002, "Manu Ginobili",
        "Tim Duncan", "Spurs", 2002, 2016)).toDF()
    GraphStore(
      vertices = Map("player" -> players, "team" -> teams),
      edges = Map("serve" -> serve, "teammate" -> tm),
      edgeTypeIds = Map("serve" -> 101, "teammate" -> 102))
  }
}
