package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.unsafe.types.UTF8String

/**
 * SparkSessionExtensions entry point: registers the library's custom
 * Catalyst expressions as SQL functions, so `spark.sql` users get the
 * same codegen'd implementations the Column API exposes. Activate with
 *
 *   spark.sql.extensions=graft.GraftExtensions
 *
 * on a fresh session, or [[GraftExtensions.register]] on a live one
 * (extensions configured at build time don't reach already-running
 * sessions).
 *
 * Registered surface:
 *  - `graft_dotp(a, b)`         — deterministic double dot product of
 *                                 two numeric-array columns
 *                                 (functions.DotProduct, codegen'd)
 *  - `graft_fixed_string(s, n[, pad])` — FIXED_STRING(n) pad/truncate
 *                                 codec semantics (functions.FixedString)
 *  - `graft_bloom_agg(h, items, bits)` / `graft_might_contain(bf, h)`
 *                               — Catalyst's native Bloom sketch
 *                                 (not SQL-registered upstream; see
 *                                 functions.BloomOps)
 */
object GraftExtensions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => other.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case x => throw new IllegalArgumentException(
        s"$what must be a literal int, got $x")
    }
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dotp"), info("graft_dotp"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dotp(arrayA, arrayB)")
        functions.DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_fixed_string"), info("graft_fixed_string"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "graft_fixed_string(str, n[, pad])")
        val pad =
          if (args.length > 2) args(2).eval() match {
            case s: UTF8String => s.toString
            case x => throw new IllegalArgumentException(
              s"graft_fixed_string: pad must be a literal string, got $x")
          }
          else " "
        functions.FixedString(args.head,
          litInt(args(1), "graft_fixed_string: n"), pad)
      }),
    (FunctionIdentifier("graft_bloom_agg"), info("graft_bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_bloom_agg(hashLong, estimatedItems, numBits)")
        new BloomFilterAggregate(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("graft_might_contain"), info("graft_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_might_contain(bloom, hashLong)")
        BloomFilterMightContain(args.head, args(1))
      }))

  /** Register on a LIVE session (tests, notebooks — builder-time
    * extensions can't attach to an existing session). Idempotent. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, fi, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}
