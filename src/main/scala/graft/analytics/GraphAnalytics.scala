package graft.analytics

import graft.model.GraphStore
import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Batch graph analytics over the GraphStore — the north-star split from
 * BASELINE.json: OLTP point traversal stays with the reference's design
 * (out of scope); whole-graph analytics run on GraphX, built from the
 * same tag/edge DataFrames.
 *
 * Degree statistics stay in DataFrame-land (one map-side-combinable
 * aggregation, oracle-checkable); PageRank / connected components /
 * triangle counting use GraphX's Pregel implementations. Vertex ids are
 * already Long in our model, so the bridge is zero-copy on ids.
 */
object GraphAnalytics {

  /** GraphX view of selected edge types (edge attr = edge type id). */
  def toGraphX(store: GraphStore, edgeTypes: Seq[String]): Graph[Long, Int] = {
    val edgeRdd = edgeTypes.map { et =>
      val tid = store.edgeTypeIds(et)
      store.edge(et).select(col(GraphStore.SRC), col(GraphStore.DST))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), tid))
    }.reduce(_ union _)
    Graph.fromEdges(edgeRdd, defaultValue = 0L,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** In/out degree per vertex over selected edge types — the DataFrame
    * formulation (keeps the oracle in SQL, no GraphX needed). */
  def degrees(store: GraphStore, edgeTypes: Seq[String]): DataFrame = {
    val union = edgeTypes.map { et =>
      store.edge(et).select(col(GraphStore.SRC), col(GraphStore.DST))
    }.reduce(_ unionByName _)
    val out = union.groupBy(col(GraphStore.SRC).as("_vid"))
      .agg(count(lit(1)).as("out_deg"))
    val in = union.groupBy(col(GraphStore.DST).as("_vid"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("_vid"), "full_outer")
      .select(col("_vid"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Static PageRank (fixed iterations — deterministic structure;
    * floating-point sums may vary in the last ulp across partitionings,
    * so results are verified structurally, not hash-exactly). */
  def pageRank(store: GraphStore, edgeTypes: Seq[String], iters: Int,
      resetProb: Double = 0.15): DataFrame = {
    val spark = store.vertices.head._2.sparkSession
    import spark.implicits._
    toGraphX(store, edgeTypes).staticPageRank(iters, resetProb)
      .vertices.toDF("_vid", "rank")
      .select(col("_vid"), round(col("rank"), 6).as("rank"))
  }

  /** Connected components (undirected reachability); label = min vid in
    * the component — deterministic. */
  def connectedComponents(store: GraphStore,
      edgeTypes: Seq[String]): DataFrame = {
    val spark = store.vertices.head._2.sparkSession
    import spark.implicits._
    toGraphX(store, edgeTypes).connectedComponents()
      .vertices.toDF("_vid", "component")
  }

  /** Triangle count per vertex (GraphX canonical algorithm). */
  def triangleCount(store: GraphStore, edgeTypes: Seq[String]): DataFrame = {
    val spark = store.vertices.head._2.sparkSession
    import spark.implicits._
    // GraphX triangleCount requires canonical orientation; build a
    // deduped, canonicalized edge set first.
    val union = edgeTypes.map { et =>
      store.edge(et).select(col(GraphStore.SRC), col(GraphStore.DST))
    }.reduce(_ unionByName _)
      .filter(col(GraphStore.SRC) =!= col(GraphStore.DST))
      .select(least(col(GraphStore.SRC), col(GraphStore.DST)).as("s"),
        greatest(col(GraphStore.SRC), col(GraphStore.DST)).as("d"))
      .distinct()
    val g = Graph.fromEdges(
      union.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 0)), 0L)
    g.triangleCount().vertices.toDF("_vid", "triangles")
  }
}
