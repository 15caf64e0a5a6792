package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge => B}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/**
 * Column API over Spark's native Bloom-filter expressions. Catalyst
 * ships `BloomFilterAggregate` / `BloomFilterMightContain` for its own
 * runtime row-level filtering but does not register them as public SQL
 * functions — the same codegen'd implementations are exactly what a
 * bloom-prefiltered dedup wants, so expose them through the expression
 * bridge rather than reimplementing the sketch.
 *
 * Reference bar: the RocksDB block-based-table bloom the reference
 * storage engine consults before every point lookup (its SST format
 * carries a filter block per table file).
 */
object BloomOps {

  /** Aggregate a LongType hash column into a serialized Bloom filter
    * (BinaryType). `numBits` fixed at build time; ~`numBits /
    * expectedItems` bits per item sets the false-positive rate. */
  def bloomAgg(hash: Column, expectedItems: Long, numBits: Long): Column =
    B.column(new BloomFilterAggregate(B.expression(hash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: false means DEFINITELY absent; true means maybe. */
  def mightContain(bloom: Column, hash: Column): Column =
    B.column(BloomFilterMightContain(B.expression(bloom),
      B.expression(hash)))
}
