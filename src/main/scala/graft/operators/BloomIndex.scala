package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * White-box portable Bloom-filter index (Bloom 1970) — the
 * file/bucket-level membership summary behind point-lookup data
 * skipping (the reference keeps per-part RocksDB bloom filters for the
 * same purpose, conf `enable_rocksdb_prefix_filtering` at
 * src/kvstore/RocksEngineConfig.cpp:81-85; parquet and Delta keep per-file
 * blooms). Unlike `bloom_filter_agg` (Spark-opaque bytes), the state
 * here is ENGINE-PORTABLE: `bits` bitmap bits stored as BIGINT words of
 * 32 bits, hash positions read from disjoint 8-hex-digit windows of one
 * md5 digest (the CMS window law) — so the index itself is
 * oracle-checkable bit-for-bit, shards merge by `bit_or` (the
 * partial-stats re-aggregation law), and a probe can be planned by ANY
 * engine that can md5.
 *
 * Guarantees: a present key always probes positive (no false
 * negatives); absent keys probe positive with p ≈ (1-e^(-kn/m))^k.
 *
 * Scale shape: the build is one narrow hash projection + `hashes`-way
 * explode + one (bucket, word) bit_or aggregate — map-side combinable,
 * output ≤ buckets·bits/32 rows regardless of corpus size. Probes join
 * the WORD-SIZED index (broadcast at any realistic bits), never the
 * data.
 */
object BloomIndex {

  private def posCol(keyCol: String, i: Int, bits: Int) =
    conv(substring(md5(col(keyCol).cast("string")), i * 8 + 1, 8), 16, 10)
      .cast("long") % bits

  private def validate(bits: Int, hashes: Int): Unit = {
    require(bits % 32 == 0 && bits >= 32,
      s"bits $bits must be a positive multiple of the 32-bit word size")
    require(hashes >= 1 && hashes <= 4,
      s"hashes $hashes must be in [1,4]: one md5 digest yields four " +
        "disjoint 32-bit windows")
  }

  /** Build one Bloom bitmap per bucket: (bucket, word_idx, word) with
    * word = OR of 1<<(pos%32) over the bucket's key hash positions.
    * Words with no bits set are absent (probes treat missing as 0). */
  def build(df: DataFrame, bucketCol: String, keyCol: String,
      bits: Int, hashes: Int): DataFrame = {
    validate(bits, hashes)
    df.select(col(bucketCol).as("bucket"),
        explode(array((0 until hashes).map(posCol(keyCol, _, bits)): _*))
          .as("pos"))
      .select(col("bucket"), expr("pos div 32").as("word_idx"),
        expr("shiftleft(1L, cast(pos % 32 as int))").as("bit"))
      .groupBy("bucket", "word_idx")
      .agg(expr("bit_or(bit)").as("word"))
  }

  /**
   * Probe (bucket, key) candidates against a [[build]] index and audit
   * against exact membership: per bucket, how many probes the bloom
   * admits (bloom_hits), how many are true members (true_hits), and
   * the false-positive count the filter would forward to a data read.
   * `missed` counts true members the bloom REJECTED — the no-false-
   * negative law says it is identically 0 (spec + gate enforced).
   *
   * Scale shape: probes explode ×hashes and join the word-sized index
   * (broadcast); exact membership is a left-semi-shaped join against
   * the distinct (bucket, key) frame — the eval companion, not the
   * serving path (serving stops at the bloom verdict).
   */
  def probe(index: DataFrame, probes: DataFrame, data: DataFrame,
      bucketCol: String, keyCol: String, bits: Int,
      hashes: Int): DataFrame = {
    validate(bits, hashes)
    val need = probes
      .select(col(bucketCol).as("bucket"), col(keyCol).as("key"),
        explode(array((0 until hashes).map(posCol(keyCol, _, bits)): _*))
          .as("pos"))
      .select(col("bucket"), col("key"), expr("pos div 32").as("word_idx"),
        expr("shiftleft(1L, cast(pos % 32 as int))").as("bit"))
      // two hash positions can land in the same word: OR the masks
      .groupBy("bucket", "key", "word_idx")
      .agg(expr("bit_or(bit)").as("mask"))
    val verdict = need
      .join(broadcast(index), Seq("bucket", "word_idx"), "left")
      .withColumn("hit",
        (coalesce(col("word"), lit(0L)).bitwiseAND(col("mask")) ===
          col("mask")).cast("long"))
      .groupBy("bucket", "key").agg(min(col("hit")).as("bloom_hit"))
    val members = data
      .select(col(bucketCol).as("bucket"), col(keyCol).as("key"))
      .distinct().withColumn("is_member", lit(1L))
    verdict.join(members, Seq("bucket", "key"), "left")
      .select(col("bucket"), col("bloom_hit"),
        coalesce(col("is_member"), lit(0L)).as("is_member"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_probes"),
        sum(col("bloom_hit")).as("bloom_hits"),
        sum(col("is_member")).as("true_hits"),
        sum(when(col("bloom_hit") === 1 && col("is_member") === 0, 1L)
          .otherwise(0L)).as("false_pos"),
        sum(when(col("bloom_hit") === 0 && col("is_member") === 1, 1L)
          .otherwise(0L)).as("missed"))
  }
}
