package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Property-graph view over parquet tables, mirroring the reference's data
 * model (reference: src/utils/NebulaKeyUtils.h:14-26 — vertex rows keyed by
 * `(part, vid, tagId)`, edge rows by `(part, src, edgeType, rank, dst)`).
 *
 * Spark-first mapping (SURVEY.md §1.4):
 *  - one DataFrame per tag: `_vid` + schema-ful props;
 *  - one DataFrame per edge type: `_src, _dst, _rank` + props. The reference
 *    stores every edge twice (±edgeType) so in-edges are a local scan; we
 *    derive in-edges by reading the same table keyed by `_dst` instead —
 *    no physical double-store needed (SURVEY.md §7.4 pt 5);
 *  - partitioning: the reference colocates a vertex with its out-edges via
 *    `hash(vid) % parts`. In Spark the analogous co-location is achieved by
 *    repartitioning/bucketing both sides on the id column, which lets
 *    Catalyst plan the vertex⋈edge join without an extra shuffle at scale.
 *
 * The concrete graph is derived from the driver-generated TPC-H-ish tables
 * (TESTDATA.md): entity tables become tags, foreign-key relations become
 * edge types. Tag prop columns keep their original names so the DuckDB
 * oracle can re-derive identical frames with plain SQL.
 */
final case class GraphStore(
    vertices: Map[String, DataFrame],
    edges: Map[String, DataFrame],
    edgeTypeIds: Map[String, Int]) {

  def tag(name: String): DataFrame = vertices(name)
  def edge(name: String): DataFrame = edges(name)
}

object GraphStore {
  val VID = "_vid"
  val SRC = "_src"
  val DST = "_dst"
  val RANK = "_rank"
  val TYPE = "_type"

  /** Read one driver table; column pruning/pushdown stays with Catalyst. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // Schema inference re-reads parquet footers on every spark.read; a
  // request-per-query engine (the reference resolves schemas through a
  // cached MetaClient, src/storage/query/QueryBaseProcessor.inl:236-255)
  // must not pay that per request — cache the assembled store per
  // (session, dir).
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), GraphStore]

  def cached(spark: SparkSession, dir: String): GraphStore =
    cache.getOrElseUpdate((spark, dir), tpch(spark, dir))

  /**
   * TPC-H-derived property graph.
   *
   * Tags (vertex tables, `_vid` = entity key):
   *   customer, supplier, part, nation, region, order
   * Edge types (reference-style numeric ids, cf. MockData edgeType 101/102):
   *   placed      101: customer -> order   (from orders; rank = o_orderkey)
   *   contains    102: order    -> part    (from lineitem; rank = l_linenumber)
   *   supplied_by 103: part     -> supplier(from lineitem; rank disambiguates
   *                                         parallel edges, cf. edge `rank`
   *                                         in NebulaKeyUtils.h:18-26)
   *   in_nation   104: customer -> nation
   *   supp_nation 105: supplier -> nation
   *   in_region   106: nation   -> region
   */
  def tpch(spark: SparkSession, dir: String): GraphStore = {
    val customer = table(spark, dir, "customer")
    val supplier = table(spark, dir, "supplier")
    val part = table(spark, dir, "part")
    val nation = table(spark, dir, "nation")
    val region = table(spark, dir, "region")
    val orders = table(spark, dir, "orders")
    val lineitem = table(spark, dir, "lineitem")

    val vertices = Map(
      "customer" -> customer.withColumnRenamed("c_custkey", VID),
      "supplier" -> supplier.withColumnRenamed("s_suppkey", VID),
      "part" -> part.withColumnRenamed("p_partkey", VID),
      "nation" -> nation.withColumn(VID, col("n_nationkey").cast("long"))
        .drop("n_nationkey"),
      "region" -> region.withColumn(VID, col("r_regionkey").cast("long"))
        .drop("r_regionkey"),
      "order" -> orders.withColumnRenamed("o_orderkey", VID)
    )

    val placed = orders.select(
      col("o_custkey").as(SRC),
      col("o_orderkey").as(DST),
      col("o_orderkey").as(RANK),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))

    val contains = lineitem.select(
      col("l_orderkey").as(SRC),
      col("l_partkey").as(DST),
      col("l_linenumber").cast("long").as(RANK),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"))

    val suppliedBy = lineitem.select(
      col("l_partkey").as(SRC),
      col("l_suppkey").as(DST),
      (col("l_orderkey") * 8 + col("l_linenumber")).as(RANK),
      col("l_quantity"), col("l_extendedprice"))

    val inNation = customer.select(
      col("c_custkey").as(SRC),
      col("c_nationkey").cast("long").as(DST),
      lit(0L).as(RANK), col("c_mktsegment"))

    val suppNation = supplier.select(
      col("s_suppkey").as(SRC),
      col("s_nationkey").cast("long").as(DST),
      lit(0L).as(RANK))

    val inRegion = nation.select(
      col("n_nationkey").cast("long").as(SRC),
      col("n_regionkey").cast("long").as(DST),
      lit(0L).as(RANK), col("n_name"))

    GraphStore(
      vertices,
      Map(
        "placed" -> placed,
        "contains" -> contains,
        "supplied_by" -> suppliedBy,
        "in_nation" -> inNation,
        "supp_nation" -> suppNation,
        "in_region" -> inRegion),
      Map(
        "placed" -> 101, "contains" -> 102, "supplied_by" -> 103,
        "in_nation" -> 104, "supp_nation" -> 105, "in_region" -> 106))
  }
}
