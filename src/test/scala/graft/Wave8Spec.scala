package graft

import org.apache.spark.sql.functions._

/** Round-10 wave-8 operators: TextRank, graph contraction, audio
  * features, image patch tiling. */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  test("textRank ranks the co-occurrence hub first") {
    val docs = Seq("hub alpha", "hub beta", "hub gamma", "hub delta",
      "alpha beta").toDF("text")
    val top = graft.pipeline.TextAnalysis.textRank(docs, "text",
      window = 1, minCount = 1, iters = 5, topK = 3)
      .collect().map(_.getString(0))
    assert(top.head == "hub", s"expected hub first, got ${top.toSeq}")
  }

  test("contractGraph collapses communities into the weighted super-graph") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("x", "c")
    val got = graft.analytics.GraphAnalytics.contractGraph(e, comm)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((1L, 1L) -> 3L, (1L, 4L) -> 1L, (4L, 4L) -> 3L))
  }

  test("audioFeatures reads the PCM spec back out of the WAV codec") {
    import graft.pipeline.Multimodal
    val id = 2L // id % 3 == 2 -> wav
    val out = Multimodal.audioFeatures(
      Multimodal.synthesize(Seq(id).toDF("doc_id"), "doc_id"))
      .collect().head
    val nf = Multimodal.specFrames(id)
    val samples = (0 until nf).map(i => Multimodal.specPixel(id, i, 0))
    val zc = samples.sliding(2).count {
      case Seq(a, b) => (a >= 128) != (b >= 128); case _ => false }
    val en = samples.map(v => (v - 128).toLong * (v - 128)).sum
    assert(out.n_frames == nf.toLong && out.zero_cross == zc.toLong &&
      out.energy == en)
  }

  test("imagePatches tile the full raster exactly once") {
    import graft.pipeline.Multimodal
    val ids = Seq(10L, 33L, 57L).toDF("doc_id")
    val media = Multimodal.synthesize(ids, "doc_id")
    val patches = Multimodal.imagePatches(media, grid = 4).toDF()
    val perImage = patches.groupBy("id")
      .agg(count(lit(1)).as("n_patches"), sum("n_px").as("tot_px"),
        sum("px_sum").as("tot_sum"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val stats = Multimodal.pixelStats(media).collect()
      .map(p => p.id -> (p.n_px, p.px_sum)).toMap
    for ((id, (np, tpx, tsum)) <- perImage) {
      assert(np == 16L, s"id $id patch count")
      assert((tpx, tsum) == stats(id), s"id $id pixel partition")
    }
  }
}
