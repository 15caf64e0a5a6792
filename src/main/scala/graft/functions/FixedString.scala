package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * FIXED_STRING(n) write semantics as a native Catalyst expression with
 * whole-stage codegen: values longer than `n` bytes are truncated, and
 * shorter values are padded to exactly `n` with the pad byte.
 *
 * The reference stores FIXED_STRING columns NUL-padded to their declared
 * width and silently truncates oversized writes (reference:
 * src/codec/RowWriterV2.h:54-67 FIXED_STRING field layout;
 * src/utils/IndexKeyUtils.h:98-110 index encoding truncate/pad). The pad
 * byte is configurable because NUL is hostile to text interchange;
 * semantics (exact-width, truncate-or-pad) are what matters.
 *
 * Native `Expression` rather than a UDF so it stays inside codegen
 * (SURVEY.md §7.3 lists this as one of the few custom-code points).
 */
case class FixedString(child: Expression, n: Int, pad: String)
    extends UnaryExpression {

  require(n > 0, "fixed width must be positive")
  require(pad.length == 1, "pad must be a single character")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    FixedString.fit(s, n, pad.charAt(0))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val padLit = pad.charAt(0).toInt
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |String fsIn = $c.toString();
         |if (fsIn.length() > $n) { fsIn = fsIn.substring(0, $n); }
         |else if (fsIn.length() < $n) {
         |  StringBuilder fsSb = new StringBuilder(fsIn);
         |  while (fsSb.length() < $n) { fsSb.append((char) $padLit); }
         |  fsIn = fsSb.toString();
         |}
         |${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString(fsIn);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): FixedString =
    copy(child = c)
}

object FixedString {
  def fit(s: String, n: Int, pad: Char): UTF8String = {
    val fitted =
      if (s.length > n) s.substring(0, n)
      else if (s.length < n) s + pad.toString * (n - s.length)
      else s
    UTF8String.fromString(fitted)
  }

  /** Column API: exact-width string (reference FIXED_STRING(n)). */
  def fixedString(c: Column, n: Int, pad: String = " "): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(
      FixedString(GraftExpressionBridge.expression(c), n, pad))
  }
}
