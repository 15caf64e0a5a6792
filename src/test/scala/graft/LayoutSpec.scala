package graft

import org.apache.spark.sql.functions._
import graft.sources.{Compaction, ZOrderLayout}

/** Z-order clustering, the skipping audit, and the compaction planner. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is a bijection on the full grid and matches the bit law") {
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
      .toDF("x", "y")
      .withColumn("z", ZOrderLayout.zValue(Seq(col("x"), col("y")), 4))
    val rows = grid.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_._3).distinct.length == 256, "z not injective on 16x16")
    assert(rows.forall { case (x, y, z) => z >= 0 && z < 256 })
    // reference law: bit b of x at position 2b, of y at 2b+1
    rows.foreach { case (x, y, z) =>
      val expect = (0 until 4).map { b =>
        (((x >> b) & 1).toLong << (2 * b)) |
          (((y >> b) & 1).toLong << (2 * b + 1))
      }.reduce(_ | _)
      assert(z == expect, s"($x,$y) -> $z, expected $expect")
    }
  }

  test("zValue rejects widths that overflow a signed 64-bit value") {
    intercept[IllegalArgumentException] {
      ZOrderLayout.zValue(Seq(col("x"), col("y")), 32)
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.zValue(Seq.empty, 4)
    }
  }

  test("skippingAudit: z-order layout hits fewer files than linear on a 2-D box") {
    // the full 64x64 grid: linear files are thin x-slabs spanning all
    // of y, z-order files are aligned 8x8 Morton tiles
    val df = (0L until 4096L).map(i => (i % 64, i / 64, i))
      .toDF("x", "y", "id")
    val audit = ZOrderLayout.skippingAudit(df, "x", "y", "id", bits = 6,
      rowsPerFile = 64, xLo = 8, xHi = 15, yLo = 40, yHi = 47)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(audit("linear")._1 == 64 && audit("zorder")._1 == 64)
    assert(audit("zorder")._2 < audit("linear")._2,
      s"zorder ${audit("zorder")._2} files should beat linear " +
        s"${audit("linear")._2}")
  }

  test("writeZOrdered files cover compact rectangles (real footer stats)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val df = (0L until 4096L).map(i => (i % 64, i / 64, i))
      .toDF("x", "y", "id")
    ZOrderLayout.writeZOrdered(df, dir, Seq("x", "y"), bits = 6, files = 16)
    // real per-file stats: every file's x AND y span must be a strict
    // subset of the domain (a linear sort would leave y spanning 0..63)
    import org.apache.spark.sql.functions.{input_file_name => ifn}
    val spans = spark.read.parquet(dir)
      .groupBy(ifn().as("f"))
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .agg(avg($"xs").as("ax"), avg($"ys").as("ay")).head()
    assert(spans.getDouble(0) < 48 && spans.getDouble(1) < 48,
      s"files span too much of the domain: $spans")
  }

  test("compaction plan: bins respect target and ordering, summary rolls up") {
    val files = Seq(
      ("p1", 1L, 10L), ("p1", 2L, 10L), ("p1", 3L, 10L), ("p1", 4L, 25L),
      ("p1", 5L, 5L), ("p2", 1L, 100L), ("p2", 2L, 1L))
      .toDF("part", "file_id", "bytes")
    val plan = Compaction.plan(files, "part", "file_id", "bytes", 30L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val p1 = plan.filter(_._1 == "p1").sortBy(_._2).map(_._3)
    // cum-before: 0,10,20,30,55 -> bins 0,0,0,1,1
    assert(p1.toSeq == Seq(0L, 0L, 0L, 1L, 1L))
    // oversized first file lands alone in bin 0; next starts bin 3 (100/30)
    val p2 = plan.filter(_._1 == "p2").sortBy(_._2).map(_._3)
    assert(p2.toSeq == Seq(0L, 3L))
    val sum = Compaction.planSummary(files, "part", "file_id", "bytes", 30L)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(sum(("p1", 0L)) == ((3L, 30L, 1)))
    assert(sum(("p2", 3L)) == ((1L, 1L, 0))) // singleton: not compactable
  }

  test("rangeBounds: exact sample quantiles, partition invariance") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("k")
    // sampleMod 1 keeps every key: boundaries are exact quantiles
    val b = ZOrderLayout.rangeBounds(df, "k", sampleMod = 1, nParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b == Map(1L -> 250L, 2L -> 500L, 3L -> 750L))
    // deterministic hash sample: same boundaries at any partitioning
    val b2 = ZOrderLayout
      .rangeBounds(df.repartition(13), "k", sampleMod = 7, nParts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b3 = ZOrderLayout
      .rangeBounds(df.repartition(2), "k", sampleMod = 7, nParts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b2 == b3 && b2.size == 2)
    CacheScope.drain(spark)
  }

  test("embeddingDrift: identical snapshots have zero shift") {
    val emb = Seq((1L, Array(0.25f, 0.5f)), (2L, Array(0.75f, -0.5f)))
      .toDF("vec_id", "embedding")
    val d = graft.pipeline.Similarity.embeddingDrift(emb, emb, "embedding")
      .orderBy($"pos").collect()
    assert(d.length == 2)
    d.foreach { r =>
      assert(r.getAs[Double]("shift") == 0.0)
      assert(r.getAs[Double]("mean_a") == r.getAs[Double]("mean_b"))
    }
    assert(d(0).getAs[Double]("mean_a") == 0.5) // (0.25+0.75)/2
  }
}
