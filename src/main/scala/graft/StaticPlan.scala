package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/**
 * The AQE-off-when-measured-small static-planning law, extracted from
 * the r16 leiden/louvain family so every bounded-round operator can
 * apply it (the r15 ScratchJobs probe showed those operators' wall is
 * the SUM of hundreds of tiny sequential jobs — AQE materializes one
 * job per exchange to re-plan it, which is pure overhead once the
 * engine has MEASURED the frames small).
 *
 * The law: when the operator has measured its loop frames under
 * [[SmallRows]], (1) AQE is disabled for the loop's jobs — every join
 * side is statically known broadcast-able, so there is nothing left
 * for runtime re-planning to discover, and each rotation's multi-
 * exchange stage tree collapses into ONE job; (2) shuffle partitions
 * drop to 1 — a 32-task shuffle of a 5 k-row frame pays 32 task
 * schedules for microseconds of work each; (3) callers get a
 * broadcast-hint function for their vertex-sized join sides (rotated
 * leaves carry capped "unknown" stats, so static planning would
 * otherwise SMJ everything).
 *
 * At 100 TB the measured bound does NOT arm: a level-1 graph or a
 * production embedding corpus exceeds 500 k rows, the body runs with
 * the session's own AQE/partition settings, and skew joins + runtime
 * coalescing keep working — the cases AQE exists for. Results are
 * identical either way: AQE and partition counts never change
 * semantics, and the hints only pick the physical join.
 *
 * Why a ROW bound is safe (r15 ADVICE adjudication, kept from the
 * leiden law): every hinted side in these operators is a narrow
 * fixed-shape frame — (v,label)/(v,color) pairs, (v,k) strengths,
 * (id,score) ranks — 2-5 primitive columns, ≤ ~48 bytes per unsafe
 * row, so 500 k rows ≤ ~24 MB serialized: inside Spark's 8 GB
 * broadcast-build cap by 300× and a rounding error against executor
 * memory. The bound is never applied to arbitrary user frames.
 *
 * The session confs are saved/restored on every exit path (leaking
 * "false" would strip AQE from unrelated queries); nesting is safe —
 * an inner wrap saves the outer wrap's values and restores them.
 */
object StaticPlan {
  /** Measured row bound under which static planning arms — the same
    * bound that arms the leiden broadcast-hint law (r15). */
  val SmallRows = 500000L

  /** Diagnostic kill-switches (measurement instrumentation, guide §1):
    * `SPARK_GRAFT_LAW_DISABLE=all|aqe|parts|codegen[,..]` turns
    * individual dials of the armed law off so an A/B can attribute a
    * regression to ONE dial. Unset in production and in the driver's
    * bench — default behavior is byte-identical to the law as shipped. */
  private val disabled: Set[String] = sys.env.get("SPARK_GRAFT_LAW_DISABLE")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    .getOrElse(Set.empty)

  private val AqeKey = "spark.sql.adaptive.enabled"
  private val ShufKey = "spark.sql.shuffle.partitions"
  private val CodegenKey = "spark.sql.codegen.wholeStage"

  /** Armed wraps mutate SESSION-global SQL confs (r16 ADVICE): two
    * concurrent armed operators on one session could interleave their
    * save/restore and leak `adaptive.enabled=false` into the session
    * permanently. The lock serializes armed regions — concurrent
    * callers of wrapped operators block until the armed peer restores
    * the confs, so the session state they save is always the true
    * baseline. Reentrant, so nested wraps on one thread keep working
    * (inner wrap saves the outer wrap's values, as before). NOTE the
    * remaining documented contract: a concurrent UNWRAPPED query on
    * the same session still plans under the armed confs — the law
    * assumes the session runs one query at a time (the bench/Verify
    * harness protocol); services wanting overlap should use separate
    * SparkSessions. */
  private val armedLock = new java.util.concurrent.locks.ReentrantLock()

  /** Rows per post-shuffle partition under the law. Static planning
    * loses AQE's runtime coalescing, so the engine derives the
    * partition count from the MEASURED size instead (guide §2: make
    * partitioning scale-adaptive — derive from input size, never a
    * constant tuned to one deployment): a 5 k-row label frame plans 1
    * partition (32 tasks of microseconds each was the floor being
    * cut), a 400 k-row edge frame keeps real parallelism. */
  val RowsPerPartition = 32768L

  /** Measured row bound under which AQE is disabled while armed —
    * r17 re-tune of the r16 law (VERDICT r16 "Next #1"): the r16 law
    * disabled AQE for EVERY armed loop (≤ 500 k rows), and the driver
    * + both committed cooled records showed the armed MID BAND
    * regress at 32 cores (cc_bigstar 310 k-row rounds 0.62×, the
    * 65536-row ivfTrain/beam gates 0.31–0.71×), while every verified
    * win sat at or under ~62.5 k rows (katz/eigen 62 500, hyperBall
    * 62 250, matching 40 k, lpa 30 k, scc 4.8 k, leiden/boruvka
    * ≤ 500). A 5-config × 2-rep dial-isolation matrix (committed in
    * OPTIMIZATION_r17.md) attributed the mid-band cost to the
    * AQE-off dial specifically (ccstar min 3.47 s law-as-shipped vs
    * 3.00 s with AQE kept; derived partitions and codegen-off were
    * both WINS at every size). Mechanism: a mid-band round does real
    * multi-partition exchange work, and AQE's runtime re-planning
    * (local coalescing, runtime broadcast of frames the static
    * planner can't prove small) buys more than its per-exchange
    * materialization jobs cost; on a ≤ 2-partition round there is
    * nothing to re-plan and the extra jobs are pure floor. So: AQE
    * turns off only below TWO partitions' worth of measured rows;
    * the broadcast hints and the derived partition count (which AQE
    * coalesces FROM when it stays on) keep the full ≤ 500 k arm.
    * Parameterised (env `SPARK_GRAFT_LAW_AQE_ROWS`) so a deployment
    * with different core counts / task-launch costs can re-derive its
    * own band from the same A/B without a rebuild; the default is the
    * measured local[32] value. */
  val AqeOffRows: Long = sys.env.get("SPARK_GRAFT_LAW_AQE_ROWS")
    .map(_.toLong).getOrElse(2L * RowsPerPartition)

  /** Run `body` under the static-small law when `measuredRows` is
    * under the bound, else unchanged. The body receives the broadcast-
    * hint function to apply to its measured-small join sides (identity
    * when the law is not armed). */
  def withMeasured[T](spark: SparkSession, measuredRows: Long)
      (body: (DataFrame => DataFrame) => T): T = {
    if (sys.env.contains("SPARK_GRAFT_LAW_LOG")) {
      val caller = Thread.currentThread.getStackTrace
        .drop(2).find(f => !f.getClassName.startsWith("graft.StaticPlan"))
        .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}:${f.getLineNumber}")
        .getOrElse("?")
      System.err.println(s"[law] rows=$measuredRows armed=${measuredRows <= SmallRows} at $caller")
    }
    if (measuredRows > SmallRows || disabled("all")) body(identity)
    else {
      armedLock.lock()
      try withMeasuredLocked(spark, measuredRows)(body)
      finally armedLock.unlock()
    }
  }

  private def withMeasuredLocked[T](spark: SparkSession,
      measuredRows: Long)(body: (DataFrame => DataFrame) => T): T = {
    {
      val aqePrev = spark.conf.getOption(AqeKey)
      val shufPrev = spark.conf.get(ShufKey, "200")
      val cgPrev = spark.conf.getOption(CodegenKey)
      val parts = math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong,
        (measuredRows + RowsPerPartition - 1) / RowsPerPartition))
      if (measuredRows < AqeOffRows && !disabled("aqe"))
        spark.conf.set(AqeKey, "false")
      if (!disabled("parts")) spark.conf.set(ShufKey, parts.toString)
      // Whole-stage codegen compiles a fresh Janino class per DISTINCT
      // generated source; bounded-round loops embed round-varying
      // literals (round index, parity, level id), so every rotation
      // job pays a compile that dwarfs the microseconds of data it
      // runs on — WHEN the frame is tiny. The dial is row-derived like
      // the partition count: at ≤ one partition's worth of rows the
      // compile dominates and interpreted execution wins (measured:
      // leiden_full job-time sum 17.9 → 12.3 s); in the mid band
      // (tens of thousands to 500 k rows of real expression work per
      // round) codegen's per-row speedup outweighs the compile, so it
      // stays on. At scale the law is unarmed and nothing changes.
      if (measuredRows <= RowsPerPartition && !disabled("codegen"))
        spark.conf.set(CodegenKey, "false")
      try body(if (disabled("hints")) identity else broadcast _)
      finally {
        aqePrev match {
          case Some(v) => spark.conf.set(AqeKey, v)
          case None => spark.conf.unset(AqeKey)
        }
        spark.conf.set(ShufKey, shufPrev)
        cgPrev match {
          case Some(v) => spark.conf.set(CodegenKey, v)
          case None => spark.conf.unset(CodegenKey)
        }
      }
    }
  }
}
