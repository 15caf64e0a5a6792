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

  final case class Page(rows: DataFrame, nextCursor: Option[Long])

  /** One page of a keyset-paginated scan over `keyCols`-sorted data. */
  def page(table: DataFrame, keyCol: String, props: Seq[String],
      limit: Int, cursor: Option[Long]): DataFrame = {
    val after = cursor match {
      case Some(k) => table.filter(col(keyCol) > lit(k))
      case None => table
    }
    after.orderBy(col(keyCol)).limit(limit)
      .select((keyCol +: props).map(col): _*)
  }

  /** Page plus the resume cursor (max key of the page), for drivers that
    * loop pages like the reference's client. */
  def pageWithCursor(table: DataFrame, keyCol: String, props: Seq[String],
      limit: Int, cursor: Option[Long]): Page = {
    val rows = page(table, keyCol, props, limit, cursor)
    val next = rows.agg(max(col(keyCol))).head.getAs[Any](0) match {
      case null => None
      case v: Long => Some(v)
      case v: Int => Some(v.toLong)
      case v => Some(v.toString.toLong)
    }
    Page(rows, next)
  }
}
