package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The storage-pushdown expression surface, as a small AST compiled to
 * Catalyst `Column`s.
 *
 * Mirrors the whitelist the reference accepts in pushed-down filters
 * (reference: src/storage/query/QueryBaseProcessor.inl:257-530 `checkExp`):
 * constants; arithmetic `+ - * / %`; unary minus/NOT; relational
 * `== != < <= > >=`; regex `=~`; `CONTAINS / STARTS WITH / ENDS WITH`;
 * `IN`; logical `AND OR XOR`; `IS [NOT] NULL`; CASE; type cast; function
 * call (delegated to Spark builtins, cf. the reference's FunctionManager
 * dispatch); property refs (tag.prop / edge.prop / key fields `_src _dst
 * _rank _type _vid` are all just columns in our model).
 *
 * Filter semantics: the reference skips a row whenever the predicate
 * evaluates to anything but `true` — NULL and eval errors mean "drop"
 * (reference: src/storage/exec/FilterNode.h:64-77). SQL WHERE drops
 * NULL rows too, but we additionally wrap the compiled predicate in
 * `coalesce(pred, false)` so composed NOT/XOR trees can never leak a
 * NULL row upward.
 */
sealed trait FilterExpr {
  def compile: Column = FilterExpr.compile(this)
}

object FilterExpr {
  final case class Lit(v: Any) extends FilterExpr
  /** Property reference — tag prop, edge prop, or key pseudo-prop. */
  final case class Prop(name: String) extends FilterExpr
  /** op ∈ + - * / % */
  final case class Arith(op: String, l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class Neg(e: FilterExpr) extends FilterExpr
  /** op ∈ == != < <= > >= */
  final case class Cmp(op: String, l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class RegexMatch(e: FilterExpr, pattern: String) extends FilterExpr
  final case class ContainsOp(e: FilterExpr, sub: FilterExpr) extends FilterExpr
  final case class StartsWithOp(e: FilterExpr, p: FilterExpr) extends FilterExpr
  final case class EndsWithOp(e: FilterExpr, s: FilterExpr) extends FilterExpr
  final case class InList(e: FilterExpr, values: Seq[Any]) extends FilterExpr
  final case class IsNull(e: FilterExpr) extends FilterExpr
  final case class IsNotNull(e: FilterExpr) extends FilterExpr
  final case class Not(e: FilterExpr) extends FilterExpr
  final case class And(l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class Or(l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class Xor(l: FilterExpr, r: FilterExpr) extends FilterExpr
  final case class CaseWhen(branches: Seq[(FilterExpr, FilterExpr)],
      default: Option[FilterExpr]) extends FilterExpr
  final case class Cast(to: String, e: FilterExpr) extends FilterExpr
  /** Function call, dispatched to the Spark builtin of the same name. */
  final case class Func(name: String, args: Seq[FilterExpr]) extends FilterExpr
  /** LIST / MAP literals (the reference's container constructors). */
  final case class ListLit(items: Seq[FilterExpr]) extends FilterExpr
  final case class MapLit(pairs: Seq[(FilterExpr, FilterExpr)]) extends FilterExpr
  /** Predicate over a list: any/all/none (reference `any(x IN l WHERE p)`
    * etc.) — the lambda is expressed over the bound element column. */
  final case class AnyMatch(list: FilterExpr, pred: Column => Column) extends FilterExpr
  final case class AllMatch(list: FilterExpr, pred: Column => Column) extends FilterExpr
  /** List comprehension `[x IN l WHERE p | f(x)]`: filter then map. */
  final case class Comprehension(list: FilterExpr, pred: Column => Column,
      map: Column => Column) extends FilterExpr
  /** reduce(acc = z, x IN l | merge(acc, x)). */
  final case class Reduce(list: FilterExpr, zero: FilterExpr,
      merge: (Column, Column) => Column) extends FilterExpr

  def compile(e: FilterExpr): Column = e match {
    case Lit(v) => lit(v)
    case Prop(n) => col(n)
    case Arith("+", l, r) => compile(l) + compile(r)
    case Arith("-", l, r) => compile(l) - compile(r)
    case Arith("*", l, r) => compile(l) * compile(r)
    case Arith("/", l, r) => compile(l) / compile(r)
    case Arith("%", l, r) => compile(l) % compile(r)
    case Arith(op, _, _) => throw new IllegalArgumentException(s"arith op $op")
    case Neg(x) => -compile(x)
    case Cmp("==", l, r) => compile(l) === compile(r)
    case Cmp("!=", l, r) => compile(l) =!= compile(r)
    case Cmp("<", l, r) => compile(l) < compile(r)
    case Cmp("<=", l, r) => compile(l) <= compile(r)
    case Cmp(">", l, r) => compile(l) > compile(r)
    case Cmp(">=", l, r) => compile(l) >= compile(r)
    case Cmp(op, _, _) => throw new IllegalArgumentException(s"cmp op $op")
    case RegexMatch(x, p) => compile(x).rlike(p)
    case ContainsOp(x, s) => compile(x).contains(compile(s))
    case StartsWithOp(x, p) => compile(x).startsWith(compile(p))
    case EndsWithOp(x, s) => compile(x).endsWith(compile(s))
    case InList(x, vs) => compile(x).isin(vs: _*)
    case IsNull(x) => compile(x).isNull
    case IsNotNull(x) => compile(x).isNotNull
    case Not(x) => !compile(x)
    case And(l, r) => compile(l) && compile(r)
    case Or(l, r) => compile(l) || compile(r)
    case Xor(l, r) => compile(l) =!= compile(r)
    case CaseWhen(branches, default) =>
      val first = when(compile(branches.head._1), compile(branches.head._2))
      val chained = branches.tail.foldLeft(first) { case (acc, (c, v)) =>
        acc.when(compile(c), compile(v))
      }
      default.map(d => chained.otherwise(compile(d))).getOrElse(chained)
    case Cast(to, x) => compile(x).cast(to)
    case Func(name, args) => call_function(name, args.map(compile): _*)
    case ListLit(items) => array(items.map(compile): _*)
    case MapLit(pairs) =>
      map(pairs.flatMap { case (k, v) => Seq(compile(k), compile(v)) }: _*)
    case AnyMatch(l, p) => exists(compile(l), p)
    case AllMatch(l, p) => forall(compile(l), p)
    case Comprehension(l, p, m) =>
      transform(filter(compile(l), p), m)
    case Reduce(l, z, m) => aggregate(compile(l), compile(z), m)
  }

  /**
   * Compile as a WHERE predicate with the reference's NULL⇒false
   * semantics (FilterNode.h:64-77): a row passes only on literal `true`.
   */
  def predicate(e: FilterExpr): Column =
    coalesce(compile(e).cast("boolean"), lit(false))
}
