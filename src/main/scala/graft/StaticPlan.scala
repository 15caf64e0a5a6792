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

  private val AqeKey = "spark.sql.adaptive.enabled"
  private val ShufKey = "spark.sql.shuffle.partitions"
  private val CodegenKey = "spark.sql.codegen.wholeStage"

  /** Rows per post-shuffle partition under the law. Static planning
    * loses AQE's runtime coalescing, so the engine derives the
    * partition count from the MEASURED size instead (guide §2: make
    * partitioning scale-adaptive — derive from input size, never a
    * constant tuned to one deployment): a 5 k-row label frame plans 1
    * partition (32 tasks of microseconds each was the floor being
    * cut), a 400 k-row edge frame keeps real parallelism. */
  val RowsPerPartition = 32768L

  /** Run `body` under the static-small law when `measuredRows` is
    * under the bound, else unchanged. The body receives the broadcast-
    * hint function to apply to its measured-small join sides (identity
    * when the law is not armed). */
  def withMeasured[T](spark: SparkSession, measuredRows: Long)
      (body: (DataFrame => DataFrame) => T): T = {
    if (measuredRows > SmallRows) body(identity)
    else {
      val aqePrev = spark.conf.getOption(AqeKey)
      val shufPrev = spark.conf.get(ShufKey, "200")
      val cgPrev = spark.conf.getOption(CodegenKey)
      val parts = math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong,
        (measuredRows + RowsPerPartition - 1) / RowsPerPartition))
      spark.conf.set(AqeKey, "false")
      spark.conf.set(ShufKey, parts.toString)
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
      if (measuredRows <= RowsPerPartition)
        spark.conf.set(CodegenKey, "false")
      try body(broadcast _)
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
