package graft

/** Round-12 wave 11: span removal + audio VAD (q429/q430). */
class Round42Spec extends SparkSpec {

  private val L = 8

  private def toks(t: String): Array[String] = t.split(' ').filter(_.nonEmpty)

  test("q429 span removal ≡ in-JVM keep-canonical replay") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val grams = docs.flatMap { case (id, t) =>
      val tk = toks(t)
      (0 to tk.length - L).map(p => (id, p + 1, tk.slice(p, p + L).mkString(" ")))
    }
    val byGram = grams.groupBy(_._3)
    val owner = byGram.collect { case (g, occ) if occ.length >= 2 =>
      g -> occ.map(_._1).min }
    val expected = docs.map { case (id, t) =>
      val tk = toks(t)
      val covered = Array.fill(tk.length + 1)(false)
      (0 to tk.length - L).foreach { p0 =>
        val g = tk.slice(p0, p0 + L).mkString(" ")
        owner.get(g).foreach { own =>
          if (own != id) (p0 + 1 to p0 + L).foreach(covered(_) = true)
        }
      }
      val kept = tk.zipWithIndex.collect { case (w, i) if !covered(i + 1) => w }
      id -> (kept.mkString(" "), kept.length.toLong)
    }.filter(_._2._2 > 0).toMap
    val got = SparkEntry.queries("q429_dup_span_removal")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // a re-run of the span report over the CLEANED corpus finds no
    // cross-doc duplicated gram whose owner isn't the doc itself —
    // i.e. removal actually removed what q424 reported (owner copies
    // and within-owner repeats remain, by contract)
    val cleanedGrams = got.toSeq.flatMap { case (id, (t, _)) =>
      val tk = toks(t)
      (0 to tk.length - L).map(p => (id, tk.slice(p, p + L).mkString(" ")))
    }
    cleanedGrams.groupBy(_._2).foreach { case (g, occ) =>
      val docsWith = occ.map(_._1).distinct
      if (docsWith.length >= 2)
        // any surviving cross-doc gram must be a NEW gram created by
        // token splicing at span edges, never one the report flagged
        assert(!owner.contains(g), s"flagged gram survived removal: '$g'")
    }
  }

  test("q430 VAD utterances ≡ replay from the synth formula") {
    val got = SparkEntry.queries("q430_audio_vad")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docIds = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).filter(_ % 5 == 0)
    val expected = docIds.flatMap { id =>
      val s0 = graft.multimodal.AudioPcm.synthSamples(id)
      val voiced = s0.grouped(64).zipWithIndex.collect {
        case (fr, i) if fr.map(v => v.toLong * v).sum >= 100000000L * fr.length => i
      }.toArray
      if (voiced.isEmpty) None else {
        var runs = List.empty[Int] // lengths, head = current run
        var prev = Int.MinValue
        voiced.foreach { f =>
          if (f == prev + 1) runs = (runs.head + 1) :: runs.tail
          else runs = 1 :: runs
          prev = f
        }
        Some(id -> (runs.size.toLong, voiced.length.toLong, runs.max.toLong))
      }
    }.toMap
    assert(got == expected)
    // silent clips (id % 4 == 0, attenuated) never produce utterances
    got.keys.foreach(id => assert(id % 4 != 0 || !got.contains(id)))
  }
}
