package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Interchange text formats for the corpus pipeline. Training-data
 * corpora move as JSONL (one JSON object per line — every public
 * dataset release, crawl dump, and labeling tool speaks it) and CSV;
 * parquet is the processing-side format. These helpers pin the
 * round-trip discipline:
 *
 *  - ALWAYS read with an explicit schema. Schema inference is a full
 *    extra pass over 100 TB before the real job, and its type guesses
 *    (ints vs longs, empty string vs null) are corpus-dependent —
 *    silently different schemas per partition of a growing dataset.
 *  - CSV writes with explicit quote/escape settings so embedded
 *    delimiters round-trip; JSONL is structurally lossless for
 *    string/numeric columns.
 *
 * Both paths are plain Spark text sources: fully parallel line-split
 * reads (gzip-free large files split by range), codegen'd parsing.
 */
object TextFormats {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      // write empty strings QUOTED: the reader's nullValue matches the
      // bare empty field, so an unquoted empty would come back null —
      // the classic CSV round-trip corruption
      .option("emptyValue", "\"\"")
      // the WRITER trims by default (univocity ignore*WhiteSpace=true
      // on write) — "  padded  " must not come back "padded"
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      // nulls write as the same \u0000 sentinel the reader's nullValue
      // maps back to null — otherwise null emits as a bare empty field
      // and reads back as "" (ADVICE r5: null and "" must BOTH survive;
      // precondition: \u0000 never occurs in real data)
      .option("nullValue", "\u0000")
      .csv(path)

  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      // a parsed empty string equals the default nullValue ("") and
      // silently becomes null; point nullValue at a sentinel that
      // cannot occur so "" survives as ""
      .option("nullValue", "\u0000")
      .option("emptyValue", "")
      .csv(path)

  /**
   * ORC round trip — the second columnar interchange format big data
   * estates actually run (Hive/Trino warehouses are ORC-first; a corpus
   * engine that can only ingest parquet can't read their tables). ORC
   * is typed and self-describing, so unlike the text formats there is
   * no null/empty-string ambiguity to defend against; snappy + the
   * vectorized reader are Spark defaults. Schema is still passed on
   * read — same no-inference discipline as every other source here
   * (schema drift across a 100 TB partition set must fail loudly, not
   * unify quietly).
   */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /**
   * Typed extraction from an embedded-JSON property bag — the
   * semi-structured column every real event/crawl feed carries
   * (analytics payloads, HTTP headers, page metadata). The reference
   * models properties as schemaful thrift values
   * (src/codec/RowReaderV2.cpp); at lake scale the property bag
   * arrives as a JSON string column instead, and promoting a field to
   * a typed column ONCE (then persisting columnar) is the difference
   * between one parse per row and one parse per query.
   *
   * `get_json_object` is a narrow codegen-friendly projection — no
   * shuffle, no UDF; `try_cast` (not `cast`, which throws under ANSI
   * mode) makes malformed / absent / mistyped fields NULL rather than
   * failing the scan (dirty feeds are the norm — one bad row must not
   * kill a 100 TB ingest).
   */
  def jsonField(bag: org.apache.spark.sql.Column, field: String,
      castTo: String = "string"): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions
      .get_json_object(bag, s"$$.$field").try_cast(castTo)
}
