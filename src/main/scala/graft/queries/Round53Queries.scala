package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.multimodal.{AudioPcm, Multimodal}

/** Round-53 additions (build round 12, wave 9): audio-as-binary —
  * q423 frame-energy extraction + silence trim report over int16-PCM
  * payloads staged as real files and read through the binaryFile
  * source (the audio twin of q183's image ingest). The decode step is
  * the deterministic synth (no audio libs in this container — the
  * documented multimodal stub contract); everything Spark-side is the
  * real pipeline: executor-parallel staging, binary scan, byte-exact
  * frame windowing, integer energy math, and the per-clip trim
  * aggregate.
  */
object Round53Queries {

  private val SEL = 5L       // every 5th doc carries a clip
  private val FRAME = 64     // samples per frame
  private val SIL = 100000000L // silence power threshold per sample

  /** Stage the synthetic PCM clips (executor-parallel, local-mode
    * shared FS as q183), read them back through the binaryFile source,
    * and decode to per-frame energies — the shared front half of q423
    * (trim report) and q430 (VAD utterance segmentation). `tag` keeps
    * the two queries' staging directories disjoint so concurrent runs
    * never race on the delete/re-stage step (ADVICE r12).
    */
  private[queries] def stagedFrames(s: org.apache.spark.sql.SparkSession,
                                    d: String, tag: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val dir = graft.tools.Staging.dir(s"pcm_$tag", d)
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val ls = java.nio.file.Files.list(p)
      try ls.forEach(f => java.nio.file.Files.delete(f))
      finally ls.close()
    } else java.nio.file.Files.createDirectories(p)
    Tables.documents(s, d).select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(SEL)) === 0).as[Long]
      .foreachPartition { (it: Iterator[Long]) =>
        it.foreach { id =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"clip_$id.pcm"),
            AudioPcm.synthPcm(id))
        }
      }
    val bin = Multimodal.readBinaryDir(s, dir)
      .select(regexp_extract(col("path"), "clip_(\\d+)\\.pcm", 1)
        .cast("long").as("doc_id"), col("content").as("payload"))
    AudioPcm.frameEnergies(bin, FRAME, SIL)
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    "q423_audio_energy" -> QueryDef(
      (s, d) => {
        // per-clip trim report: frames, silent frames, kept energy
        stagedFrames(s, d, "q423")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("is_silence"), 1L).otherwise(0L)).as("n_silent"),
            sum(when(!col("is_silence"), col("sum_sq")).otherwise(0L))
              .as("kept_energy"))
      },
      Some(s"""WITH sel AS (SELECT doc_id, 256 + doc_id % 128 AS n
                 FROM documents WHERE doc_id % $SEL = 0),
             smp AS (SELECT doc_id, n, unnest(range(n)) AS i FROM sel),
             v AS (SELECT doc_id, i // $FRAME AS frame_idx,
                 CASE WHEN doc_id % 4 = 0
                   THEN ((7919 * doc_id + 104729 * i) % 65536 - 32768) // 16
                   ELSE (7919 * doc_id + 104729 * i) % 65536 - 32768 END AS s
               FROM smp),
             fr AS (SELECT doc_id, frame_idx, count(*) AS n_samples,
                 CAST(sum(s * s) AS BIGINT) AS sum_sq
               FROM v GROUP BY 1, 2)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
               CAST(sum(CASE WHEN sum_sq < $SIL * n_samples THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_silent,
               CAST(sum(CASE WHEN sum_sq >= $SIL * n_samples THEN sum_sq ELSE 0 END)
                 AS BIGINT) AS kept_energy
             FROM fr GROUP BY 1"""))
  )
}
