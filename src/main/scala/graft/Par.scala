package graft

/**
 * Overlap INDEPENDENT operator constructions (guide §2.6 "Overlap
 * independent jobs"): Spark's scheduler happily runs several jobs at
 * once inside one application — the engine's iterative operators run
 * their training/descent loops at DataFrame-construction time, so two
 * independent substrates (e.g. an IVF centroid training loop and the
 * kNN-descent graph build feeding the same ANN query) otherwise
 * serialize on the driver for no reason. `two(a, b)` evaluates `a` on
 * the caller thread and `b` on a pool thread, so b's jobs back-fill
 * the executor slots a's stragglers leave idle.
 *
 * Results are unchanged by construction: both closures build the
 * exact frames they built sequentially (every operator's output is
 * deterministic under any job interleaving — orderings are explicit,
 * aggregations order-independent by the dyadic law), and the shared
 * scaffolding is thread-safe (CacheScope's registry is a concurrent
 * queue; rotateCheckpoint degrades its block-id diff to None under
 * concurrency, deferring release to the harness drain; StaticPlan
 * serializes armed conf windows on a lock).
 */
object Par {
  import scala.concurrent.{Await, ExecutionContext, Future}
  import scala.concurrent.duration.Duration

  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Evaluate `a` and `b` concurrently; `a` runs on the caller
    * thread. Exceptions from either propagate to the caller. */
  def two[A, B](a: => A, b: => B): (A, B) = {
    val fb = Future(b)
    val ra = a
    (ra, Await.result(fb, Duration(600, "s")))
  }
}
