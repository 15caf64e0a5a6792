package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Release-gate audits comparing two snapshots of a stored tag / arc
  * set, and scanning for arcs whose endpoint vertex is absent.
  *
  * Reference behavior: the admin-side consistency checks around
  * snapshot / ingest jobs (reference `src/storage/admin/` task family —
  * e.g. the rebuild/compact tasks validate the store after a bulk
  * operation). Both audits here are single-shuffle declarative plans:
  * no window functions, no driver-side collection, so they survive a
  * 100 TB store where a snapshot diff touches every row exactly once.
  */
object Audit {

  /**
   * Column-level quality profile (the Deequ-analyzer shape): one row
   * per profiled column with row count, null count, and exact distinct
   * count — the expectations a load gate checks before a 100 TB table
   * goes live (sudden null-rate jump = upstream schema drift; distinct
   * collapse = a join fanned out or a default flooded the column).
   *
   * Scale: ONE aggregation pass — the multi-column countDistinct plans
   * as a single Expand + two-phase aggregate (partials combine
   * map-side), and the wide one-row result unpivots with `stack` (a
   * narrow projection). Distinct counts ignore nulls (documented SQL
   * semantics; n_null carries them).
   */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"profile columns $cols must exist in ${df.columns.toSeq}")
    val aggs = cols.flatMap(c => Seq(
      F.sum(F.when(F.col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
      F.countDistinct(F.col(c)).as(s"nd_$c")))
    val allAggs = F.count(F.lit(1)).as("n_rows") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'$c', `nn_$c`, `nd_$c`").mkString(", ") +
      ") AS (column_name, n_null, n_distinct)"
    wide.select(F.col("n_rows"), F.expr(stackExpr))
      .select(F.col("column_name"), F.col("n_rows"), F.col("n_null"),
        F.col("n_distinct"))
  }

  /** Per-status row counts of snapshot `v2` vs `base`, keyed by
    * `keyCols`, value-compared null-safely on `valCols`. Output is one
    * row per status in {added, deleted, changed, unchanged} with its
    * count.
    *
    * Scale: one full-outer shuffle join on the key columns (AQE splits
    * skewed key ranges), then a ≤4-row hash aggregate with map-side
    * partials. Nothing is ever materialized per-key beyond the join.
    */
  def diffSummary(base: DataFrame, v2: DataFrame,
                  keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val cols = keyCols ++ valCols
    val b = base.select(cols.map(F.col): _*).withColumn("_b", F.lit(1))
    val v = v2.select(cols.map(F.col): _*)
      .toDF(cols.map(_ + "__v"): _*).withColumn("_v", F.lit(1))
    val onKeys = keyCols.map(k => F.col(k) === F.col(k + "__v")).reduce(_ && _)
    val changed =
      valCols.map(c => !(F.col(c) <=> F.col(c + "__v"))).reduce(_ || _)
    b.join(v, onKeys, "full_outer")
      .select(
        F.when(F.col("_b").isNull, "added")
          .when(F.col("_v").isNull, "deleted")
          .when(changed, "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(F.count(F.lit(1)).as("n"))
  }

  /**
   * Change-data feed between two snapshots — the GENERATOR side of the
   * changelog family: one row per key whose state differs, `op` ∈
   * {ins, del, upd} with the NEW payload (null payload for del). Its
   * output is exactly the record shape
   * [[graft.streaming.ChangeLogListener.applyChanges]],
   * [[graft.streaming.ChangeLogListener.maintainAgg]] and
   * [[graft.operators.Scd2]] consume, so diff → feed → apply
   * round-trips (the snapshot-to-CDC bridge a lake without a
   * transaction log needs).
   *
   * Scale: the same single full-outer key-join as [[diffSummary]]
   * (AQE splits skewed ranges); unchanged keys — the overwhelming
   * majority between adjacent snapshots — drop before anything
   * widens. Values compare null-safely (`<=>`).
   */
  def changeDataFeed(base: DataFrame, v2: DataFrame,
      keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val cols = keyCols ++ valCols
    val b = base.select(cols.map(F.col): _*)
      .toDF(cols.map(_ + "__b"): _*).withColumn("_b", F.lit(1))
    val v = v2.select(cols.map(F.col): _*)
      .toDF(cols.map(_ + "__v"): _*).withColumn("_v", F.lit(1))
    val onKeys = keyCols.map(k =>
      F.col(k + "__b") === F.col(k + "__v")).reduce(_ && _)
    val changed =
      valCols.map(c => !(F.col(c + "__b") <=> F.col(c + "__v")))
        .reduce(_ || _)
    val op = F.when(F.col("_b").isNull, "ins")
      .when(F.col("_v").isNull, "del")
      .when(changed, "upd")
    b.join(v, onKeys, "full_outer")
      .withColumn("op", op)
      .filter(F.col("op").isNotNull)
      .select(keyCols.map(k =>
        F.coalesce(F.col(k + "__v"), F.col(k + "__b")).as(k)) ++
        Seq(F.col("op")) ++
        valCols.map(c => F.when(F.col("op") =!= "del", F.col(c + "__v"))
          .as(c)): _*)
  }

  /**
   * Merkle-style anti-entropy bucket comparison — the batch analog of
   * a replica consistency sweep (reference: the raft snapshot /
   * catch-up machinery keeps replicas converged,
   * src/kvstore/raftex/SnapshotManager.cpp; an operator checking two
   * stores agrees compares content fingerprints, not rows). Each row
   * hashes to a 32-bit value (md5 window over key + values) and buckets
   * by `key mod nBuckets`; the ORDER-INDEPENDENT bucket fingerprint is
   * the plain sum of row hashes, so it map-side combines and two
   * replicas can compute it fully independently. Output: one row per
   * bucket where either the fingerprint or the row count differs —
   * the key ranges a repair job would then re-transfer.
   *
   * Bucketing hashes the KEY (md5 window of its string form) before
   * the mod, so any key type — string, UUID, composite rendered to
   * string — localizes correctly; a plain `key mod n` would NULL out
   * non-numeric keys and collapse both replicas into one bucket.
   *
   * Scale: each side is one aggregation pass collapsing to nBuckets
   * rows; the compare joins two nBuckets-sized frames (broadcast).
   * 100 TB replicas never ship rows — only the sketch. Sum of 32-bit
   * hashes stays in BIGINT up to 2^31 rows per bucket.
   */
  def merkleDiff(a: DataFrame, b: DataFrame, keyCol: String,
      valCols: Seq[String], nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    def buckets(df: DataFrame, suffix: String): DataFrame = {
      val h = F.conv(F.substring(F.md5(F.concat_ws("|",
        (keyCol +: valCols).map(F.col): _*)), 1, 8), 16, 10).cast("long")
      val kh = F.conv(F.substring(F.md5(F.col(keyCol).cast("string")),
        1, 8), 16, 10).cast("long")
      df.select(F.pmod(kh, F.lit(nBuckets.toLong)).as("bucket"),
          h.as("h"))
        .groupBy("bucket")
        .agg(F.sum(F.col("h")).as("fp" + suffix),
          F.count(F.lit(1)).as("n" + suffix))
    }
    buckets(a, "_a").join(buckets(b, "_b"), Seq("bucket"), "full_outer")
      .filter(!(F.col("fp_a") <=> F.col("fp_b")) ||
        !(F.col("n_a") <=> F.col("n_b")))
      .select(F.col("bucket"),
        F.coalesce(F.col("n_a"), F.lit(0L)).as("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0L)).as("n_b"),
        F.coalesce(F.col("fp_a"), F.lit(0L)).as("fp_a"),
        F.coalesce(F.col("fp_b"), F.lit(0L)).as("fp_b"))
  }

  /** Arc rows whose `refCol` has no matching vertex `keyCol`: returns
    * (ref_id, n_arcs) per dangling reference.
    *
    * Scale: aggregate the arcs by reference FIRST (map-side combinable,
    * shrinks the join input from |arcs| to |distinct refs|), then a
    * left-anti join against the vertex key set — broadcast when the
    * vertex side is small, sort-merge otherwise; never row-per-arc.
    */
  def danglingRefs(arcs: DataFrame, refCol: String,
                   vertices: DataFrame, keyCol: String): DataFrame = {
    val refs = arcs.groupBy(F.col(refCol).as("ref_id"))
      .agg(F.count(F.lit(1)).as("n_arcs"))
    refs.join(
      vertices.select(F.col(keyCol).as("ref_id")),
      Seq("ref_id"), "left_anti")
  }

  /** Graph-shape ingest audit — the one-row sanity report a bulk edge
    * load is gated on before anything downstream runs: raw arc count,
    * self-loops, parallel duplicates (same (src, dst) more than once),
    * distinct simple arcs, endpoint-vertex count, and vertices present
    * in the vertex set but touching no arc (isolated — usually a sign
    * the edge extract dropped a partition). All exact integers.
    *
    * Scale: one (src, dst) count aggregate (map-side combinable — the
    * arc volume collapses to the distinct-arc cardinality), one
    * endpoint distinct, one anti-join against the vertex keys; every
    * term is a Σ over that aggregate, no window, no self-join.
    */
  def graphShape(arcs: DataFrame, srcCol: String, dstCol: String,
      vertices: DataFrame, keyCol: String): DataFrame = {
    val pairs = arcs.select(F.col(srcCol).as("s"), F.col(dstCol).as("d"))
      .groupBy("s", "d").agg(F.count(F.lit(1)).as("c"))
      .transform(graft.CacheScope.persist(_)) // feeds 3 aggregates
    val endpoints = pairs.select(F.col("s").as("v"))
      .unionByName(pairs.select(F.col("d").as("v"))).distinct()
      .transform(graft.CacheScope.persist(_))
    val isolated = vertices.select(F.col(keyCol).as("v")).distinct()
      .join(endpoints, Seq("v"), "left_anti")
      .agg(F.count(F.lit(1)).as("n_isolated"))
    pairs.agg(
        F.sum(F.col("c")).as("n_arcs_raw"),
        F.sum(F.when(F.col("s") === F.col("d"), F.col("c"))
          .otherwise(F.lit(0L))).as("n_self_loops"),
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1)
          .otherwise(F.lit(0L))).as("n_parallel_dupes"),
        F.count(F.lit(1)).as("n_distinct_arcs"))
      .crossJoin(F.broadcast(
        endpoints.agg(F.count(F.lit(1)).as("n_endpoints"))))
      .crossJoin(F.broadcast(isolated))
  }

  /**
   * Directed-graph reciprocity — the share of non-self arcs whose
   * reverse arc also exists (Newman 2003 §III.C; near-1 flags an
   * effectively undirected graph, near-0 a hierarchy/bipartite flow —
   * the cheapest directionality audit before choosing between the
   * directed and undirected operator families). One row:
   * (n_arcs, n_mutual, reciprocity_ppm), all exact integers.
   *
   * Scale shape: arcs dedup in one (src,dst) shuffle; the reverse side
   * is the SAME persisted frame re-keyed, so the left-semi mutual probe
   * reuses one distribution; both tails are single-row aggregates
   * joined by broadcast. Never more than one corpus-sized shuffle.
   */
  def reciprocity(arcs: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = arcs.select(F.col(srcCol).cast("long").as("s"),
        F.col(dstCol).cast("long").as("d"))
      .filter(F.col("s") =!= F.col("d")).distinct()
      .transform(graft.CacheScope.persist(_)) // probed + counted
    val rev = e.select(F.col("d").as("s"), F.col("s").as("d"))
    val mutual = e.join(rev, Seq("s", "d"), "left_semi")
      .agg(F.count(F.lit(1)).as("n_mutual"))
    e.agg(F.count(F.lit(1)).as("n_arcs"))
      .crossJoin(F.broadcast(mutual))
      .select(F.col("n_arcs"), F.col("n_mutual"),
        F.expr("n_mutual * 1000000 div n_arcs").as("reciprocity_ppm"))
  }
}
