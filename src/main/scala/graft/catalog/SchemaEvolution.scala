package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Versioned-schema read semantics. The reference keeps every historical
 * schema version of a tag/edge; each stored row carries the version it
 * was written with, and readers resolve fields against that version —
 * a field added in a later version is filled from its **default-value
 * expression** when reading an older row (reference:
 * src/storage/query/QueryBaseProcessor.inl:236-255 getAllVerTagSchema;
 * src/storage/exec/QueryUtils.h:49-89 readValue default/NULL handling;
 * src/codec/RowReaderWrapper dispatch on the row's embedded version).
 *
 * Spark-first: rows carry a `_schemaVer` column; each evolved field
 * declares the version it appeared in plus a default *Column expression*
 * (not just a literal — the reference serializes arbitrary expressions).
 * Reading = one `when(_schemaVer < since, default).otherwise(col)` per
 * evolved field — pure projection, codegen'd, zero shuffle.
 */
object SchemaEvolution {

  /** A field added at `sinceVersion` with a default expression evaluated
    * for rows older than that version. */
  final case class EvolvedField(name: String, sinceVersion: Int,
      default: Column)

  val VersionCol = "_schemaVer"

  /**
   * Resolve reads against evolved fields: for each field, rows written
   * before the field existed see the default expression (which may
   * reference other columns — evaluated against the row, like the
   * reference's DefaultValueContext), newer rows see the stored value.
   */
  def applyDefaults(df: DataFrame, fields: Seq[EvolvedField]): DataFrame =
    fields.foldLeft(df) { (d, f) =>
      d.withColumn(f.name,
        when(col(VersionCol) < f.sinceVersion, f.default)
          .otherwise(col(f.name)))
    }
}
