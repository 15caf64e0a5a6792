package graft

import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}

/**
 * Round-6 gate-currency law, enforced (VERDICT.md r5 "What's wrong"
 * #2/#3): the driver's checker normalizes cells through two different
 * fetch paths (Spark parquet vs DuckDB), and the HUGEINT episode proved
 * that only 64-bit integers are guaranteed to normalize identically.
 * Two guards:
 *
 *  1. No gate query may surface a DOUBLE/FLOAT/DECIMAL column — every
 *     rational goes through SparkEntry.GateScale's scaled-BIGINT
 *     surrogate at the gate boundary.
 *  2. No oracle SQL may contain an integer sum()/window-sum that DuckDB
 *     would widen to HUGEINT: every sum( must be CAST to BIGINT, sit
 *     inside a floor() quantization, sum an explicitly-floored (dyadic)
 *     summand, or sum a known-DOUBLE table column.
 *
 * check.py's type-class compare is the authoritative runtime version of
 * the same law (it fails HUGEINT/DECIMAL/FLOAT32 divergence locally);
 * these are the fast sbt-time versions.
 */
class NoFloatGateSpec extends SparkSpec {

  // Round-9 law (VERDICT.md r8 "What's wrong" #1): every declared query
  // MUST carry a DuckDB oracle and vice versa — r8 was the first round
  // an ungated query landed (q_cooccurrence/q_butterflies ran but were
  // untested). A keyset mismatch is now a build failure, not a silent
  // `err: no_oracle` row in the driver report.
  test("every query has an oracle and every oracle names a query") {
    val unoracled = SparkEntry.rawQueries.keySet -- SparkEntry.rawOracleSql.keySet
    val orphaned = SparkEntry.rawOracleSql.keySet -- SparkEntry.rawQueries.keySet
    assert(unoracled.isEmpty,
      s"queries with no DuckDB oracle (would land ungated): $unoracled")
    assert(orphaned.isEmpty,
      s"oracle SQL naming no query (dead gate): $orphaned")
  }

  // A bench shortName collision would silently emit duplicate JSON keys
  // in the driver-tail line, losing one query's timing (ADVICE r9).
  test("Bench.shortName is injective over the query set") {
    val collisions = SparkEntry.rawQueries.keys.toSeq
      .groupBy(Bench.shortName).collect {
        case (sn, ks) if ks.size > 1 => s"$sn <- ${ks.mkString(",")}"
      }
    assert(collisions.isEmpty,
      s"abbreviation collisions: ${collisions.mkString("; ")}")
    // and the table itself carries no duplicate rewrite keys
    val dupKeys = Bench.Abbrev.map(_._1).groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    assert(dupKeys.isEmpty, s"duplicate Abbrev entries: $dupKeys")
  }

  private def isFloaty(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case _: DecimalType         => true
    case _                      => false
  }

  test("no gate query surfaces a DOUBLE/FLOAT/DECIMAL column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val schema = mk(spark, sfDir).schema
        CacheScope.drain(spark)
        schema.fields.collect {
          case f if isFloaty(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"gate currency is integers/strings only — add these to " +
        s"SparkEntry.GateScale: ${offenders.mkString(", ")}")
  }

  test("GateScale entries name real queries and real columns") {
    val unknownQ = SparkEntry.GateScale.keySet -- SparkEntry.rawQueries.keySet
    assert(unknownQ.isEmpty, s"GateScale names unknown queries: $unknownQ")
    // A GateScale column that no longer exists is silently ignored by
    // descale (it maps over df.columns), so a rename would quietly
    // re-expose a double; catch the stale entry here instead.
    val stale = SparkEntry.GateScale.toSeq.sortBy(_._1).flatMap {
      case (name, cols) =>
        val have = SparkEntry.rawQueries(name)(spark, sfDir).columns.toSet
        CacheScope.drain(spark)
        cols.filterNot(have).map(c => s"$name.$c")
    }
    assert(stale.isEmpty, s"GateScale names absent columns: $stale")
  }

  /** DOUBLE table columns whose plain sum() stays DOUBLE in DuckDB. */
  private val DoubleSummands = Seq("l_quantity", "value", "o_totalprice",
    "l_extendedprice", "c_acctbal", "s_acctbal", "p_retailprice")

  /** Positions of sum( occurrences the HUGEINT law does not cover. */
  private def uncastSums(sql: String): Seq[String] = {
    val l = sql.toLowerCase
    "(?<![a-z0-9_])sum\\(".r.findAllMatchIn(l).map(_.start).toSeq
      .filterNot { i =>
        val before = l.substring(math.max(0, i - 45), i)
        val arg = l.substring(i + 4, math.min(l.length, i + 64))
        before.contains("cast(") || before.contains("floor(") ||
        arg.startsWith("floor(") ||
        DoubleSummands.exists(arg.startsWith)
      }
      .map(i => l.substring(i, math.min(l.length, i + 30)).replace('\n', ' '))
  }

  test("no oracle SQL carries an un-CAST integer sum() (HUGEINT guard)") {
    val offenders = SparkEntry.rawOracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => uncastSums(sql).map(s => s"$name: `$s`")
    }
    assert(offenders.isEmpty,
      "DuckDB widens integer sum() to HUGEINT, which the driver hashes " +
        s"differently from BIGINT — CAST these: ${offenders.mkString("; ")}")
  }

  test("the HUGEINT guard actually rejects a bare integer sum()") {
    assert(uncastSums("SELECT doc_id, sum(c) AS n FROM t GROUP BY 1").nonEmpty)
    assert(uncastSums(
      "SELECT sum(is_new) OVER (ORDER BY pos) AS sid FROM t").nonEmpty)
    // and accepts the four legal shapes
    assert(uncastSums("SELECT CAST(sum(c) AS BIGINT) FROM t").isEmpty)
    assert(uncastSums("SELECT floor((sum(c)) * 100.0 + 0.5) FROM t").isEmpty)
    assert(uncastSums(
      "SELECT sum(floor((x) * 1073741824.0) / 1073741824.0) FROM t").isEmpty)
    assert(uncastSums("SELECT sum(l_quantity) FROM lineitem").isEmpty)
  }
}
