package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * ScanVertex / ScanEdge — paginated full scan of a tag/edge table with a
 * resume cursor (reference: src/storage/query/ScanVertexProcessor
 * .cpp:27-100 — prefix scan + limit + cursor = next storage key).
 *
 * Spark-first: keyset pagination. The cursor is the last key of the
 * previous page; a page is `key > cursor ORDER BY key LIMIT n`, which
 * Catalyst plans as TakeOrderedAndProject (distributed top-k — no global
 * sort materialization) with the `key > cursor` predicate pushed to the
 * parquet scan. On sorted/bucketed storage at 100 TB this prunes to the
 * files past the cursor (SURVEY.md §7.4 pt 7).
 */
object Scan {

  final case class Page(rows: DataFrame, nextCursor: Option[Any])

  /** One page of a keyset-paginated scan over `keyCols`-sorted data. */
  def page(table: DataFrame, keyCol: String, props: Seq[String],
      limit: Int, cursor: Option[Any]): DataFrame = {
    val after = cursor match {
      case Some(k) => table.filter(col(keyCol) > lit(k))
      case None => table
    }
    after.orderBy(col(keyCol)).limit(limit)
      .select((keyCol +: props).map(col): _*)
  }

  /**
   * Multi-tag vertex scan: one row per vertex holding the requested
   * props of EVERY tag the vertex has (nulls where a tag is absent) —
   * the reference's ScanVertexRequest carries a list of tag prop sets
   * and emits one row per vertex with per-tag columns
   * (src/storage/query/ScanVertexProcessor.cpp:27-100).
   */
  def multiTagPage(store: graft.model.GraphStore,
      tagProps: Map[String, Seq[String]], keyCol: String, limit: Int,
      cursor: Option[Any]): DataFrame = {
    val perTag = tagProps.toSeq.sortBy(_._1).map { case (tag, props) =>
      store.tag(tag).select((keyCol +: props).map(col): _*)
    }
    val joined = perTag.reduce(_.join(_, Seq(keyCol), "full_outer"))
    val after = cursor match {
      case Some(k) => joined.filter(col(keyCol) > lit(k))
      case None => joined
    }
    after.orderBy(col(keyCol)).limit(limit)
  }

  /** Page plus the resume cursor (max key of the page), for drivers that
    * loop pages like the reference's client. */
  def pageWithCursor(table: DataFrame, keyCol: String, props: Seq[String],
      limit: Int, cursor: Option[Any]): Page = {
    val rows = page(table, keyCol, props, limit, cursor)
    // cursor type follows the key column (int or string vids alike)
    val next = Option(rows.agg(max(col(keyCol))).head.getAs[Any](0))
    Page(rows, next)
  }
}
