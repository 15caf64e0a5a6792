package graft.pipeline

import graft.model.GraphStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators beyond the dedup family: benchmark
 * decontamination, duplicate-cluster canonicalization, PII redaction,
 * and token-distribution statistics. These are the remaining standard
 * stages of a large-scale training-data pipeline (the reference engine
 * stops at storage-level scans/mutations — SURVEY.md §2 — so these are
 * additive capabilities, designed Spark-first).
 */
object Curation {

  /**
   * Benchmark decontamination: flag corpus documents sharing at least
   * `minShared` distinct word n-grams with any benchmark document —
   * the standard n-gram-overlap test (GPT-3 appendix C / PaLM style)
   * run before training so eval data doesn't leak into the corpus.
   *
   * Shape at scale: the benchmark side is eval-suite-sized (thousands
   * of docs, not billions), so its shingle frame is broadcast; the
   * corpus-side shingle frame streams through one hash join keyed on
   * the shingle and one (doc, bench) count shuffle — no corpus
   * self-join anywhere. Returns one row per contaminated corpus doc:
   * the best-matching benchmark doc (max shared n-grams, ties to the
   * smaller bench id) and the overlap count.
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, minShared: Int,
      broadcastBench: Boolean = true): DataFrame = {
    val corpusSh = Dedup.shingles(corpus, idCol, textCol, n)
    val benchSh0 = Dedup.shingles(benchmark, idCol, textCol, n)
      .withColumnRenamed("id", "bench_id")
    // eval suites are broadcast-sized by nature; callers decontaminating
    // against something corpus-like opt out and get a shuffled hash join
    val benchSh = if (broadcastBench) broadcast(benchSh0) else benchSh0
    val shared = corpusSh
      .join(benchSh, "shingle")
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
    // per-doc argmax: plans as map-side WindowGroupLimit, so only one
    // row per (doc) survives each task before the shuffle
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("shared_ngrams").desc, col("bench_id"))
    shared.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("id").as(idCol), col("bench_id"), col("shared_ngrams"))
  }

  /**
   * Duplicate-cluster canonicalization: run the LSH→exact-Jaccard dedup
   * pipeline's pair stage, treat verified near-dup pairs as undirected
   * edges, find connected components, and elect one canonical document
   * per cluster (longest text wins, ties to the smallest id) — the
   * "keep best, map the rest" step a curation pipeline runs instead of
   * blind drop-higher-id.
   *
   * Scale shape: the pair graph is near-dup-sized (orders of magnitude
   * below the corpus); components come from GraphX's Pregel CC over
   * that small graph, and the only corpus-sized work is the one
   * length-lookup join at the end.
   */
  def dupClusters(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val sh = Dedup.shingles(df, idCol, textCol, n)
      .transform(graft.CacheScope.persist(_))
    val cands = Dedup.lshCandidatePairs(
      Dedup.minhashSignaturesFrom(sh, numHashes), numHashes, bands)
    val pairs = Dedup.verifyJaccardFrom(
        Dedup.shingleSets(sh).transform(graft.CacheScope.persist(_)), cands)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"))
    val pairStore = GraphStore(
      Map.empty,
      Map("dup" -> pairs.select(col("id_a").as(GraphStore.SRC),
        col("id_b").as(GraphStore.DST), lit(0L).as(GraphStore.RANK))),
      Map("dup" -> 1))
    val comps = graft.analytics.GraphAnalytics
      .connectedComponents(pairStore, Seq("dup"))
      .select(col("_vid").as(idCol), col("component").as("cluster"))
    val lens = df.select(col(idCol), length(col(textCol)).as("_len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("_len").desc, col(idCol))
    comps.join(lens, idCol)
      .withColumn("canonical",
        first(col(idCol)).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col(idCol), col("cluster"), col("canonical"))
  }

  /**
   * Entity resolution to golden records — the record-linkage
   * composition (Fellegi & Sunter 1969 framing; blocking per
   * Christen 2012): [[Dedup.fuzzyPairs]] proposes within-block
   * edit-distance matches, connected components over the match graph
   * group records into entities, and each entity elects a canonical
   * ("golden") record by (longest normalized key, then smallest id) —
   * the same deterministic election dupClusters uses. Records with no
   * match are their own singleton entity (entity id = own id, the CC
   * min-label law extended). Output per input record: (id, entity,
   * canonical, n_members).
   *
   * Scale shape: blocking caps pair generation (never all-pairs); the
   * match graph is match-sized, orders below the corpus, so GraphX CC
   * runs on a small frame; the election windows partition by entity —
   * groups are cluster-sized, bounded by blocking, never hot.
   */
  def resolveEntities(df: DataFrame, idCol: String, keyCol: String,
      maxDist: Int, maxBlockSize: Int): DataFrame = {
    val keyed = df.select(col(idCol), trim(lower(col(keyCol))).as("_k"))
      .filter(length(col("_k")) > 0)
    val pairs = Dedup.fuzzyPairs(df, idCol, keyCol, maxDist, maxBlockSize)
    val pairStore = GraphStore(
      Map.empty,
      Map("er" -> pairs.select(col("id_a").as(GraphStore.SRC),
        col("id_b").as(GraphStore.DST), lit(0L).as(GraphStore.RANK))),
      Map("er" -> 1))
    val comps = graft.analytics.GraphAnalytics
      .connectedComponents(pairStore, Seq("er"))
      .select(col("_vid").as(idCol), col("component").as("entity"))
    val ent = keyed.join(comps, Seq(idCol), "left")
      .withColumn("entity", coalesce(col("entity"), col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("entity")
    val welect = w.orderBy(length(col("_k")).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ent.withColumn("canonical", first(col(idCol)).over(welect))
      .withColumn("n_members", count(lit(1)).over(w))
      .select(col(idCol), col("entity"), col("canonical"), col("n_members"))
  }

  /**
   * Record-linkage evaluation against exact-duplicate ground truth —
   * the measurement loop a matcher ships with: TRUTH pairs are
   * same-normalized-fingerprint documents (the planted exact dups,
   * group-capped like [[graft.analytics.GraphAnalytics.cooccurrence]]),
   * PREDICTED pairs come from [[Dedup.fuzzyPairs]] over `keyCol`, and
   * the output is ONE row of exact integers: n_truth, n_pred, tp,
   * fp_cnt, fn_cnt plus permille precision/recall (integer div — a
   * blocking or threshold change moves these numbers, and the gate
   * hashes them).
   *
   * Scale shape: truth pair-gen is bounded per fingerprint group;
   * prediction inherits fuzzyPairs' block caps; the eval join is
   * pair-frame-sized (matches, not corpus).
   */
  def linkageEval(df: DataFrame, idCol: String, textCol: String,
      keyCol: String, maxDist: Int, maxBlockSize: Int,
      maxGroup: Int): DataFrame = {
    val ids = df.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val groups = ids.groupBy("fp")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxGroup))
    val nested = transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("a"), y.as("b"))))
    val truth = groups.select(explode(flatten(nested)).as("pr"))
      .select(col("pr.a").as("id_a"), col("pr.b").as("id_b"))
      .withColumn("t", lit(1))
    val pred = Dedup.fuzzyPairs(df, idCol, keyCol, maxDist, maxBlockSize)
      .select(col("id_a"), col("id_b")).withColumn("p", lit(1))
    truth.join(pred, Seq("id_a", "id_b"), "full_outer")
      .agg(
        sum(coalesce(col("t"), lit(0))).cast("long").as("n_truth"),
        sum(coalesce(col("p"), lit(0))).cast("long").as("n_pred"),
        sum(when(col("t").isNotNull && col("p").isNotNull, 1)
          .otherwise(0)).cast("long").as("tp"),
        sum(when(col("t").isNull && col("p").isNotNull, 1)
          .otherwise(0)).cast("long").as("fp_cnt"),
        sum(when(col("t").isNotNull && col("p").isNull, 1)
          .otherwise(0)).cast("long").as("fn_cnt"))
      .select(col("n_truth"), col("n_pred"), col("tp"), col("fp_cnt"),
        col("fn_cnt"),
        when(col("n_pred") > 0, expr("tp * 1000L div n_pred"))
          .otherwise(lit(0L)).as("precision_permille"),
        when(col("n_truth") > 0, expr("tp * 1000L div n_truth"))
          .otherwise(lit(0L)).as("recall_permille"))
  }

  /**
   * Line-level exact dedup (CCNet/C4 style): across the WHOLE corpus,
   * each distinct line survives only in the first document containing
   * it (doc order, then position order); documents are reassembled
   * from their surviving lines. `linesCol` is an already-split
   * ArrayType(String) column — splitting policy (newlines, sentences,
   * fixed token windows) stays with the caller.
   *
   * Scale shape: one explode (corpus-sized, but narrow: line + two
   * longs), then the first occurrence per line is a `min(struct(doc,
   * pos))` AGGREGATE, not a window: partial min combines map-side, so
   * a pathologically hot line (empty string, boilerplate header
   * repeated across 1% of a 100 TB corpus) shrinks to one row per map
   * task instead of flooding a single window reducer. One groupBy(doc)
   * reassembles. No joins, no corpus self-join.
   */
  def lineDedup(df: DataFrame, idCol: String, linesCol: String): DataFrame = {
    val lines = df.select(col(idCol), posexplode(col(linesCol)))
      .toDF(idCol, "pos", "line")
    // lexicographic struct min == (doc order, then position) — the
    // same deterministic first-occurrence law a window would give
    val kept = lines.groupBy(col("line"))
      .agg(min(struct(col(idCol), col("pos"))).as("f"))
      .select(col(s"f.$idCol").as(idCol), col("f.pos").as("pos"),
        col("line"))
    kept.groupBy(col(idCol))
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("line"))))
        .getField("line"), " ").as("cleaned_text"),
        count(lit(1)).as("n_lines_kept"))
  }

  /**
   * GPT-style sequence-packing index: concatenate each shard's
   * documents in id order and cut the token stream into fixed
   * `targetTokens` windows — the standard "concat then chunk" packing
   * a causal-LM dataloader applies (documents straddle sequence
   * boundaries). Emits each document's position in the packed stream:
   * `(shard, n_tok, start_tok, seq_id, tok_offset)` with
   * `seq_id = start_tok div target`, `tok_offset = start_tok mod
   * target` — everything an indexed loader needs to locate any
   * document, or any sequence's documents, without materializing the
   * packed text.
   *
   * Scale shape: ONE shuffle, keyed on the deterministic shard
   * (`id mod nShards`); the running total is a window sum inside each
   * shard, so no global sort and no single-partition window exists
   * anywhere. `nShards` is the parallelism knob — at 100 TB set it to
   * O(cores) and each shard's prefix sum streams independently. All
   * outputs are exact integers (oracle-hashable on any engine).
   */
  def sequencePack(df: DataFrame, idCol: String, textCol: String,
      targetTokens: Int, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol),
      pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
    val before = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(before), lit(0L)))
      // `div`, not `/`: Spark's / is double division; these must stay
      // exact integers
      .withColumn("seq_id", expr(s"start_tok div $targetTokens"))
      .withColumn("tok_offset", pmod(col("start_tok"), lit(targetTokens.toLong)))
  }

  /**
   * Data-mixture weighting — the source-epoch stage of training-data
   * composition (upsample high-quality sources, downsample or drop
   * noisy ones). Each source's weight w is an epoch count: every doc
   * emits `floor(w)` copies, plus one more iff its deterministic
   * 32-bit multiplicative hash falls below `frac(w)·2^32` — the exact
   * per-source expected share with NO rand(): reproducible across
   * runs, partitionings, and engines (the SQL oracle replays the same
   * integer arithmetic). Sources absent from `weights` pass through
   * at 1.0. Output rows carry `copy_idx` (1..n) so downstream packing
   * can interleave epochs deterministically.
   *
   * Scale shape: a narrow map + explode — NO shuffle anywhere; the
   * weight table compiles into the projection as a CASE chain.
   */
  /**
   * Per-document n-gram novelty vs the earlier corpus (doc-id order):
   * the fraction of a document's distinct word n-grams whose FIRST
   * corpus occurrence is this document. A redundancy/contamination
   * curve — freshly-crawled shards with low novelty are mostly
   * re-crawls; a training mixture can budget by marginal novel tokens
   * instead of raw tokens (the "how much new data is this really"
   * question at 100 TB).
   *
   * Scale shape: the same laws as line dedup — first-owner election is
   * a `min(id)` AGGREGATE on the shingle key (map-side combinable; a
   * boilerplate shingle occurring in millions of docs costs one
   * partial per partition, never a single-reducer window), then one
   * shingle-keyed join back and one doc-keyed count shuffle.
   * All-integer output (permille by integer division); docs too short
   * for a single n-gram are absent, as in the oracle.
   */
  def docNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val sh = Dedup.shingles(df, idCol, textCol, n)
      .transform(graft.CacheScope.persist(_)) // feeds owners + join back
    val owners = sh.groupBy("shingle").agg(min(col("id")).as("owner"))
    sh.join(owners, "shingle")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("owner") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_permille",
        expr("(n_novel * 1000) div n_shingles"))
  }

  /**
   * Leakage-safe train/val/test split assignment: the split is decided
   * by a hash of the exact-dup FINGERPRINT (md5 of the text), not of
   * the document id — so byte-identical duplicates land in the same
   * split by construction and a train-side copy of a test document
   * cannot exist. Deterministic, shuffle-free (one narrow scan, no
   * joins), and stable under re-runs and corpus growth: a document's
   * split never changes when other documents are added — the property
   * that lets a 100 TB corpus be split incrementally, shard by shard.
   *
   * The first 8 md5 hex chars convert to an integer (the established
   * portable-hash idiom, cf. [[graft.operators.Sample.stratified]]);
   * permille thresholds carve test/val/train.
   */
  def splitAssign(df: DataFrame, idCol: String, textCol: String,
      testPermille: Int, valPermille: Int): DataFrame = {
    val fp = md5(col(textCol))
    val bucket = pmod(
      conv(substring(fp, 1, 8), 16, 10).cast("long"), lit(1000L))
    df.select(col(idCol), fp.as("fingerprint"), bucket.as("bucket"),
      when(bucket < testPermille, "test")
        .when(bucket < testPermille + valPermille, "val")
        .otherwise("train").as("split"))
  }

  /**
   * Length-bucketed batch planning for training dataloaders: documents
   * of similar token length batch together (minimizing pad waste), and
   * every doc gets a deterministic (bucket, batch_idx, pos) address.
   * Sharding by `idCol % numShards` bounds every window partition:
   * batches form within (shard, length-bucket), so the plan
   * parallelizes across shards×buckets instead of funneling a hot
   * length bucket (most web text is short) through one reducer — the
   * same shard-keyed law as [[sequencePack]]. A dataloader reads
   * (shard, bucket, batch_idx) groups; determinism makes the plan
   * resumable and oracle-replayable.
   */
  def batchPlan(df: DataFrame, idCol: String, textCol: String,
      bucketWidth: Int, batchSize: Int, numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(TextAnalysis.tokens(col(textCol))).cast("long")
    val w = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col(idCol))
    df.select(col(idCol), nTok.as("n_tok"),
        pmod(col(idCol), lit(numShards.toLong)).as("shard"))
      .withColumn("bucket", expr(s"n_tok div $bucketWidth"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col(idCol), col("n_tok"), col("shard"), col("bucket"),
        expr(s"(rn - 1) div $batchSize").as("batch_idx"),
        expr(s"(rn - 1) % $batchSize").as("pos"))
  }

  /**
   * Per-source token-budget trim — "take the first B tokens of each
   * source, in deterministic hash order": the data-budgeting step of a
   * mixture recipe (cap a huge crawl at B tokens, keep a smaller
   * source whole). A document is kept iff its INCLUSIVE cumulative
   * token count within its source stays ≤ B; the crossing document is
   * dropped, not split.
   *
   * The naive formulation is one prefix-sum window per source — and
   * sources are FEW, so at 100 TB that funnels the whole corpus
   * through |sources| reducers. Instead the standard scalable prefix
   * sum: (1) hash-bucket each doc (md5 idiom, `numBuckets` buckets);
   * (2) aggregate per-(source, bucket) token totals — a tiny frame;
   * (3) one window over that TINY frame turns totals into exclusive
   * bucket offsets; (4) join offsets back (AQE-broadcast) and run the
   * local prefix window per (source, bucket) — parallel across
   * buckets. The ORDER (bucket, then doc id) is identical in the
   * one-window formulation, so the oracle replays it with a single
   * window and the results agree exactly.
   */
  def tokenBudgetTrim(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budget: Long, numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(sourceCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"),
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(numBuckets.toLong)).as("bkt"))
      .transform(graft.CacheScope.persist(_)) // feeds totals + local scan
    val offsets = base.groupBy(col(sourceCol), col("bkt"))
      .agg(sum(col("n_tok")).as("bkt_tok"))
      .withColumn("offset", coalesce(sum(col("bkt_tok")).over(
        Window.partitionBy(col(sourceCol)).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("bkt_tok")
    val localW = Window.partitionBy(col(sourceCol), col("bkt"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(offsets, Seq(sourceCol, "bkt"))
      .withColumn("cum_tok", col("offset") + sum(col("n_tok")).over(localW))
      .select(col(idCol), col(sourceCol), col("n_tok"), col("cum_tok"),
        (col("cum_tok") <= budget).cast("int").as("kept"))
  }

  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    val whole = weights.map { case (s, w) => s -> math.floor(w).toLong }
    val thresh = weights.map { case (s, w) =>
      s -> math.floor((w - math.floor(w)) * 4294967296.0).toLong }
    def caseChain(m: Map[String, Long], default: Long): Column =
      m.toSeq.sortBy(_._1).foldLeft(lit(default)) { case (acc, (s, v)) =>
        when(col(sourceCol) === s, lit(v)).otherwise(acc)
      }
    df.withColumn("_n",
        caseChain(whole, 1L) +
          when(graft.operators.Sample.hashRank(col(idCol)) <
            caseChain(thresh, 0L), 1L).otherwise(0L))
      .filter(col("_n") >= 1)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(1L), col("_n"))).as("copy_idx"))
  }

  /**
   * Temperature-resampled source mixture (the multilingual alpha-
   * sampling law: Conneau & Lample 2019 XLM §3.1, mT5 — draw source i
   * with q_i ∝ p_i^alpha; alpha < 1 flattens the head so low-resource
   * sources up-sample and dominant ones down-sample). alpha is given
   * as a SQRT DEPTH (alpha = 2^-depth): sqrt is the one power IEEE 754
   * requires exactly rounded, so the per-source factor chain
   * n_i/N → depth nested sqrts → dyadic floor → /Z → ·N → /n_i is a
   * fixed sequence of exactly-rounded ops on identical integer inputs
   * — bit-identical across engines, with no libm pow() anywhere.
   *
   * Expected copy factor f_i = (q_i/Z)·N/n_i (mean one under q): each
   * row replicates floor(f_i) times plus one more when its id-hash
   * falls under the 2^32-scaled fractional part (the [[mixtureSample]]
   * gate — exact, deterministic, no rand()); f_i < 1 becomes a
   * downsample (whole = 0, the hash gate keeps the fraction).
   *
   * Scale shape: ONE combinable per-source count, source-count-sized
   * factor frames with two broadcast scalar attaches, then one
   * broadcast join + hash gate per row — corpus touched once.
   */
  def temperatureMixture(df: DataFrame, idCol: String, sourceCol: String,
      sqrtDepth: Int): DataFrame = {
    import graft.functions.Portable.dyadic
    require(sqrtDepth >= 1 && sqrtDepth <= 4, "sqrtDepth in [1, 4]")
    val stats = df.groupBy(sourceCol).agg(count(lit(1)).as("n_src"))
    val tot = stats.agg(sum(col("n_src")).as("n_tot"))
    var q: Column = col("n_src").cast("double") /
      col("n_tot").cast("double")
    for (_ <- 1 to sqrtDepth) q = sqrt(q)
    val withQ = stats.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_src"), col("n_tot"),
        dyadic(q).as("q"))
    val z = withQ.agg(sum(col("q")).as("z")) // on-grid exact
    val fac = withQ.crossJoin(broadcast(z))
      .select(col(sourceCol),
        (col("q") / col("z") * col("n_tot").cast("double") /
          col("n_src").cast("double")).as("f"))
      .select(col(sourceCol), floor(col("f")).cast("long").as("whole"),
        floor((col("f") - floor(col("f"))) * lit(4294967296.0))
          .cast("long").as("fr"))
    df.join(broadcast(fac), Seq(sourceCol))
      .withColumn("_n", col("whole") +
        when(graft.operators.Sample.hashRank(col(idCol)) < col("fr"),
          1L).otherwise(0L))
      .filter(col("_n") >= 1)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(1L), col("_n"))).as("copy_idx"))
  }

  /** Fixed-width token windows as synthetic "lines" for corpora whose
    * text carries no newlines (chunk i = tokens [i*n+1, i*n+n]).
    * Takes a MATERIALIZED token-array column — HOF lambdas evaluate
    * interpreted without subexpression elimination, so inlining the
    * tokenizer here would re-split the text once per chunk (see
    * Dedup.shingles). */
  def chunkLines(toks: Column, n: Int): Column =
    when(size(toks) > 0,
      transform(sequence(lit(0), ((size(toks) - 1) / n).cast("int")),
        i => concat_ws(" ", slice(toks, i * n + 1, lit(n)))))
      .otherwise(array())

  /**
   * Sliding-window token chunking with overlap — the RAG / context-
   * window preparation step: windows of `size` tokens every `stride`
   * tokens (stride < size ⇒ overlapping chunks), the final window
   * clipped to the document end, empty documents dropped. Emits
   * ceil(max(nTok−size,0)/stride)+1 chunks per non-empty doc with
   * 1-based provenance (chunk_id, start_tok, n_tok, chunk_text).
   *
   * Scale shape: a pure narrow map — tokenize once (materialized
   * array), compute the window count arithmetically, posexplode. No
   * shuffle anywhere; at 100 TB this is scan-bound with an output
   * amplification of ~size/stride, exactly what a chunker must be.
   */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val n = org.apache.spark.sql.functions.size(col("_toks"))
    // ceil((n - size) / stride) in exact integer arithmetic: operands
    // are nonnegative ints, so double division never rounds (< 2^53)
    val nWin = (when(n > size, n - size).otherwise(0)
      + (stride - 1)).cast("long") / stride
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .filter(n > 0)
      .withColumn("_nw", floor(nWin).cast("int") + 1)
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(0), col("_nw") - 1)).as(Seq("_w", "_d")))
      .select(col(idCol),
        (col("_w") + 1).cast("long").as("chunk_id"),
        (col("_w") * stride + 1).cast("long").as("start_tok"),
        (least(col("_w") * stride + size,
          org.apache.spark.sql.functions.size(col("_toks")))
          - (col("_w") * stride + 1) + 1).cast("long").as("n_tok"),
        concat_ws(" ", slice(col("_toks"), col("_w") * stride + 1,
          least(col("_w") * stride + size,
            org.apache.spark.sql.functions.size(col("_toks")))
            - (col("_w") * stride + 1) + 1)).as("chunk_text"))
  }

  /** Email pattern shared with the SQL oracle — plain character
    * classes only, so Java regex and RE2 (DuckDB) agree exactly. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** North-American-style phone pattern, same dialect-neutral style. */
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]{4}"

  /**
   * PII redaction: replace email addresses and phone numbers with
   * typed placeholder tokens and report per-document redaction counts.
   * Pure codegen'd string expressions (regexp_replace/regexp_count) —
   * a narrow map over the corpus, no shuffle at all; at 100 TB this is
   * scan-bound, exactly as a redaction pass should be.
   */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("scrubbed"),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"))

  /**
   * Token-distribution statistics per document: Shannon entropy of the
   * token frequency distribution (bits) and type-token ratio — cheap,
   * strong quality signals (low entropy = repetitive/generated text).
   * One explode + one two-level aggregation; the per-(doc, token)
   * partial aggregate is map-side combinable so the shuffle carries
   * vocabulary-sized rows per doc, not token instances.
   */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perTok = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
    perTok.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        // Σc² — the exact-integer concentration stat (Simpson/
        // Herfindahl numerator): carries the same "repetitive corpus"
        // signal as entropy but hashes bit-identically on any engine
        sum(col("c") * col("c")).as("sum_c2"),
        sum(col("c") * log2(col("c"))).as("_clog"))
      .select(col(idCol), col("n_tokens"), col("n_types"), col("sum_c2"),
        // entropy is a libm-dependent irrational (log2 sums): kept for
        // API users and spec-tested in sbt, but NOT oracle-hashed — a
        // 1-ulp libm difference across DuckDB builds can straddle any
        // quantization boundary (round-3/4 driver-only hash failures)
        (log2(col("n_tokens")) - col("_clog") / col("n_tokens"))
          .as("entropy"),
        // ttr = n_types/n_tokens: one IEEE division of exact integers —
        // bit-identical in any engine; floor-quant ties the 4-decimal
        // half exactly (round-3 oracle failure law)
        graft.functions.Portable.quant(
          col("n_types").cast("double") / col("n_tokens"), 4)
          .as("ttr"))
  }

  /**
   * Cross-source duplicate matrix — which feeds copy from which: per
   * source pair, the number of content fingerprints BOTH carry and the
   * total cross-pair duplicate row pairs. The complement of
   * [[dedupRateBySource]] (that says how much each source loses; this
   * says to whom). A mirror-site pair lights up as one dominant cell.
   *
   * Scale shape: one fingerprint scan collapses to a (fp, source,
   * count) frame; pair generation is the intra-bucket explode over
   * each fingerprint's source list (bounded by the SOURCE count per
   * fingerprint — a handful — not by the dup-group size, which folds
   * into the per-source count first). No self-join, no window.
   */
  def crossSourceDups(df: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val fps = df.select(TextAnalysis.fingerprint(col(textCol)).as("fp"),
        col(srcCol).as("source"))
      .groupBy(col("fp"), col("source")).agg(count(lit(1)).as("c"))
    val nestedPairs = transform(col("ss"), (x, i) =>
      transform(slice(col("ss"), i + 2, size(col("ss"))),
        y => struct(x.getField("source").as("sa"), x.getField("c").as("ca"),
          y.getField("source").as("sb"), y.getField("c").as("cb"))))
    fps.groupBy(col("fp"))
      .agg(sort_array(collect_list(struct(col("source"), col("c"))))
        .as("ss"))
      .filter(size(col("ss")) > 1)
      .select(explode(flatten(nestedPairs)).as("p"))
      .groupBy(col("p.sa").as("src_a"), col("p.sb").as("src_b"))
      .agg(count(lit(1)).as("n_shared_fps"),
        sum(col("p.ca") * col("p.cb")).as("n_dup_row_pairs"))
  }

  /**
   * Per-source exact-dedup rate rollup — the release-note table every
   * curation run publishes ("src X lost 40% to dedup") and the first
   * place feed-level pathologies show up (a mirror site, a template
   * farm). Winner election is the global min-id per content
   * fingerprint (the [[Dedup.exactSummary]] law — cross-source dups
   * are charged to every source that carried a loser). Output per
   * source: n_docs, n_kept (winners), n_removed, n_in_dup_groups
   * (docs whose fingerprint occurs >1 anywhere) — all exact integers.
   *
   * Scale shape: one fingerprint scan (narrow, codegen'd md5), one
   * group-sized aggregate electing winners (min + count, map-side
   * combinable — never a window over a hot fingerprint), one join
   * back, one source-sized rollup.
   */
  def dedupRateBySource(df: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val fp = df.select(col(idCol).as("id"), col(srcCol).as("source"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .transform(graft.CacheScope.persist(_)) // feeds election + rollup
    val groups = fp.groupBy("fp")
      .agg(min(col("id")).as("win_id"), count(lit(1)).as("grp_sz"))
    fp.join(groups, Seq("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("id") === col("win_id"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("id") =!= col("win_id"), 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("grp_sz") > 1, 1L).otherwise(0L))
          .as("n_in_dup_groups"))
  }

  /**
   * Per-source boilerplate line detection — the CCNet / RefinedWeb
   * paragraph-dedup preprocessing step (Wenzek et al. 2020 §3.1): a
   * line occurring in a large fraction of one source's documents is
   * navigation/footer boilerplate, not content. A line is flagged when
   * it appears in >= `minDocs` documents AND in >= `thrPermille`‰ of
   * the source's documents; the output is each document's line audit
   * (n_lines, n_boiler instances on flagged lines, n_kept) — the
   * integer evidence a removal pass acts on. Docs with zero lines
   * produce no row (nothing to strip).
   *
   * Scale shape: one explode (narrow), per-(source, line) doc counts
   * as a combinable aggregate (a boilerplate line occurring in 1% of a
   * 100 TB source combines map-side — never a window over the hot
   * line), a source-sized doc-count join, and the flagged-line frame
   * (small by construction: only lines above the threshold) joins
   * back broadcast-shaped. No self-joins anywhere.
   */
  def boilerplateStrip(df: DataFrame, idCol: String, srcCol: String,
      linesCol: String, minDocs: Int, thrPermille: Int): DataFrame = {
    val lines = df.select(col(idCol), col(srcCol).as("source"),
        explode(col(linesCol)).as("line"))
      .transform(graft.CacheScope.persist(_)) // feeds census + audit
    val nd = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("nd"))
    val dfreq = lines.select(col(idCol), col("source"), col("line"))
      .distinct()
      .groupBy(col("source"), col("line"))
      .agg(count(lit(1)).as("df_docs"))
    val boiler = dfreq.join(nd, "source")
      .filter(col("df_docs") >= minDocs &&
        col("df_docs") * 1000 >= lit(thrPermille) * col("nd"))
      .select(col("source"), col("line"), lit(1L).as("_b"))
    lines.join(boiler, Seq("source", "line"), "left")
      .groupBy(col(idCol), col("source"))
      .agg(count(lit(1)).as("n_lines"),
        sum(coalesce(col("_b"), lit(0L))).as("n_boiler"))
      .withColumn("n_kept", col("n_lines") - col("n_boiler"))
  }

  /**
   * Source-concentration audit — the mixture-health diagnostic before
   * training-weight decisions: Lorenz/Gini, top-source share, and
   * Herfindahl–Hirschman index over per-source document counts, all
   * exact integer parts-per-million. Gini uses the ascending-rank form
   * G = (2·Σ i·c_i − (n+1)·Σc) / (n·Σc) with a deterministic
   * (count, source) tie-break; HHI is Σc² / (Σc)² (exact while
   * Σc² < 2^63, i.e. per-source counts below ~3·10^9 — beyond that,
   * pre-shard counts by hash and fold the additive numerators).
   *
   * Scale shape: the corpus collapses to the SOURCE frame (one
   * combinable count) before any window; the rank window runs over
   * sources only, and the final row is one aggregate over that frame.
   */
  def sourceConcentration(df: DataFrame, srcCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("cnt"))
    // window over the source-sized frame only — never the corpus
    val ranked = counts.withColumn("rk",
      row_number().over(Window.orderBy(col("cnt"), col("source"))))
    ranked.agg(count(lit(1)).as("n_sources"),
        sum(col("cnt")).as("n_total"),
        sum(col("rk") * col("cnt")).as("_s1"),
        max(col("cnt")).as("_cmax"),
        sum(col("cnt") * col("cnt")).as("_c2"))
      .select(col("n_sources"), col("n_total"),
        expr("(2 * _s1 - (n_sources + 1) * n_total) * 1000000" +
          " div (n_sources * n_total)").as("gini_ppm"),
        expr("_cmax * 1000000 div n_total").as("top_share_ppm"),
        expr("_c2 * 1000000 div (n_total * n_total)").as("hhi_ppm"))
  }

  /**
   * Histogram-matching resampler: thin the source corpus so a chosen
   * statistic's distribution matches a REFERENCE corpus's (the
   * standard distribution-repair step when a new crawl skews short /
   * long / code-heavy relative to the curated mix — the
   * length-distribution cousin of DSIR's importance weighting).
   * Per bin, acceptance p = min(1, ref_share / src_share), applied as
   * an EXACT INTEGER rule: p_permille by cross-multiplied BIGINT
   * division, accepted iff md5(id) mod 1000 < p_permille — no floats,
   * replayable, oracle-portable (the quantization to 1/1000 is the
   * documented contract).
   *
   * Output is bin-level evidence: (bin, src_cnt, ref_cnt, p_permille,
   * n_accepted) — the doc-level accept column is a narrow projection
   * callers apply with the same rule.
   *
   * Scale shape: two bin-sized histograms (map-side combinable), the
   * totals ride broadcast, and the acceptance pass is one narrow
   * hash-mod filter on the scan — nothing corpus-sized shuffles.
   */
  def histogramMatch(src: org.apache.spark.sql.DataFrame,
      ref: org.apache.spark.sql.DataFrame, idCol: String,
      valueCol: String, binWidth: Long): org.apache.spark.sql.DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    val bin = expr(s"cast($valueCol as bigint) div $binWidth")
    val srcB = src.select(bin.as("bin"), col(idCol).as("_id"))
      .transform(graft.CacheScope.persist(_))
    val sh = srcB.groupBy("bin").agg(count(lit(1)).as("src_cnt"))
    val rh = ref.select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("ref_cnt"))
    val st = sh.agg(sum(col("src_cnt")).as("src_total"))
    val rt = rh.agg(sum(col("ref_cnt")).as("ref_total"))
    val plan = sh.join(rh, Seq("bin"), "left")
      .na.fill(0L, Seq("ref_cnt"))
      .crossJoin(broadcast(st)).crossJoin(broadcast(rt))
      .select(col("bin"), col("src_cnt"), col("ref_cnt"),
        least(lit(1000L),
          expr("ref_cnt * src_total * 1000 div (src_cnt * ref_total)"))
          .as("p_permille"))
    val accepted = srcB
      .join(broadcast(plan.select(col("bin"), col("p_permille"))), "bin")
      .filter(conv(substring(md5(col("_id").cast("string")), 1, 8),
        16, 10).cast("long") % 1000 < col("p_permille"))
      .groupBy("bin").agg(count(lit(1)).as("n_accepted"))
    plan.join(broadcast(accepted), Seq("bin"), "left")
      .na.fill(0L, Seq("n_accepted"))
  }

  /**
   * k-anonymity / l-diversity audit (Sweeney 2002 "k-Anonymity";
   * Machanavajjhala et al. 2007 "l-Diversity") — the privacy gate the
   * PII family needs beyond [[piiScrub]]'s pattern redaction: group
   * the table by its quasi-identifier columns and flag every
   * equivalence class that is re-identifiable (size < k — a joinable
   * fingerprint) or homogeneous (fewer than l distinct sensitive
   * values — membership alone leaks the attribute). The operator a
   * training-data release review runs before shipping any
   * user-derived table.
   *
   * Scale shape: ONE group-by over the quasi columns (map-side
   * partial counts) with an exact distinct-count on the sensitive
   * column (two-level aggregate — (quasi, sensitive) first, then
   * quasi); output is equivalence-class-sized, never row-sized.
   */
  def kAnonymityAudit(df: org.apache.spark.sql.DataFrame,
      quasiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 2 && l >= 1, "need k >= 2 and l >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_risk", (col("class_size") < k).cast("long"))
      .withColumn("l_risk", (col("n_sensitive") < l).cast("long"))
  }
}
