package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio as an opaque binary column: int16 little-endian PCM payloads
  * decoded executor-side into frame-level energy rows — the audio twin
  * of the image decode seam ([[Multimodal.decodeFeatures]]). The
  * in-container synth is deterministic (no audio libs exist here, per
  * the multimodal stub contract), so the oracle replays the SAME
  * sample formula arithmetically while the engine path exercises the
  * real plumbing: file staging, binaryFile scan, byte-level decode,
  * frame windowing, integer energy math.
  *
  * Frame energy is the EXACT integer Σ s², not a float RMS — bounded
  * (32768² · frameLen < 2⁶³) and bit-replayable; silence detection
  * compares Σ s² < threshold · n in integer space (no division).
  */
object AudioPcm {

  /** Deterministic synthetic PCM: n = 256 + id%128 samples;
    * s_i = ((7919·id + 104729·i) mod 65536) − 32768, attenuated ÷16
    * (truncating) for id ≡ 0 (mod 4) — those clips read as silence.
    */
  def synthSamples(id: Long): Array[Short] = {
    val n = (256 + id % 128).toInt
    Array.tabulate(n) { i =>
      val base = ((7919L * id + 104729L * i) % 65536L - 32768L).toInt
      (if (id % 4 == 0) base / 16 else base).toShort
    }
  }

  /** The int16-LE byte encoding of [[synthSamples]]. */
  def synthPcm(id: Long): Array[Byte] = {
    val samples = synthSamples(id)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode (doc_id, payload) binaries into per-frame energy rows:
    * (doc_id, frame_idx, n_samples, sum_sq, is_silence). Partition-
    * local mapPartitions — no shuffle; frames of `frameLen` samples,
    * last frame possibly shorter.
    */
  def frameEnergies(binTable: DataFrame, frameLen: Int,
                    silencePowerPerSample: Long): DataFrame = {
    val spark = binTable.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      binTable.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / 2
        val nFrames = (n + frameLen - 1) / frameLen
        (0 until nFrames).map { f =>
          val from = f * frameLen
          val until = math.min(from + frameLen, n)
          var sumSq = 0L
          var i = from
          while (i < until) {
            val s = bb.getShort(i * 2).toLong
            sumSq += s * s
            i += 1
          }
          (id, f, until - from, sumSq,
            sumSq < silencePowerPerSample * (until - from))
        }
      }
    }.toDF("doc_id", "frame_idx", "n_samples", "sum_sq", "is_silence")
  }
}
