package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * TIME property type (reference: src/codec/RowWriterV2.h:54-67 — a
 * 7-byte packed (hour, minute, sec, microsec) time-of-day value;
 * order-preserving index encoding in src/utils/IndexKeyUtils.h).
 *
 * Spark has no TIME type, so per SURVEY.md §1.2 we map it to
 * **µs-of-day as LongType**: total order matches the reference's
 * (h, m, s, µs) lexicographic order, range joins/filters stay
 * codegen'd long comparisons, and the four components unpack with
 * integer arithmetic. All functions are built-in-expression
 * compositions — no UDFs, fully codegen'd and pushdown-friendly.
 */
object TimeOfDay {
  val MicrosPerSecond = 1000000L
  val MicrosPerMinute: Long = 60L * MicrosPerSecond
  val MicrosPerHour: Long = 60L * MicrosPerMinute
  val MicrosPerDay: Long = 24L * MicrosPerHour

  /** TIME from a timestamp: its time-of-day in the session zone,
    * encoded as µs since midnight. */
  def fromTimestamp(ts: Column): Column =
    pmod(unix_micros(ts), lit(MicrosPerDay))

  /** TIME from components — the codec's writeTime composition. */
  def makeTime(h: Column, m: Column, s: Column, micro: Column): Column =
    h.cast("long") * MicrosPerHour + m.cast("long") * MicrosPerMinute +
      s.cast("long") * MicrosPerSecond + micro.cast("long")

  def hourOf(t: Column): Column = (t / MicrosPerHour).cast("int")
  def minuteOf(t: Column): Column =
    (pmod(t, lit(MicrosPerHour)) / MicrosPerMinute).cast("int")
  def secondOf(t: Column): Column =
    (pmod(t, lit(MicrosPerMinute)) / MicrosPerSecond).cast("int")
  def microOf(t: Column): Column = pmod(t, lit(MicrosPerSecond)).cast("int")

  /** Canonical display form `HH:MM:SS.ffffff` (the reference's
    * Value::toString for TIME). */
  def formatTime(t: Column): Column =
    concat(
      lpad(hourOf(t).cast("string"), 2, "0"), lit(":"),
      lpad(minuteOf(t).cast("string"), 2, "0"), lit(":"),
      lpad(secondOf(t).cast("string"), 2, "0"), lit("."),
      lpad(microOf(t).cast("string"), 6, "0"))
}
