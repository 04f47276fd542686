package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video ride through the engine as `BinaryType` columns
  * with a metadata struct — the Spark-side contract (schema, batch
  * shape, partition-parallel decode) is real; the actual media DECODE is
  * a clearly-marked deterministic STUB (`fakeDecodeFeatures`) because no
  * media libraries ship in this environment. A production deployment
  * swaps the stub body for an image/audio decoder without touching any
  * plan shape.
  *
  * Scale: payloads never shuffle unless an operator needs them;
  * feature extraction is mapPartitions (executor-local, batch-at-a-time,
  * the Scala analogue of `mapInPandas`), emitting small fixed-width
  * vectors that downstream similarity/dedup operators consume.
  */
object Multimodal {

  /** Attach payload (binary) + metadata struct to a text corpus — the
    * ingest shape a real pipeline would read from raw files
    * (`spark.read.format("binaryFile")`).
    */
  def asBinaryTable(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        octet_length(col("payload")).as("n_bytes"),
        lit("text/plain").as("format")))

  /** Frame sampling stub: fixed-size byte windows of the payload (a video
    * decoder would emit real frames with the same array<binary> shape).
    */
  def sampleFrames(payload: Column, frameBytes: Int = 256): Column =
    transform(
      sequence(lit(0), ((octet_length(payload) - 1) / frameBytes).cast("int")),
      i => substring(payload, (i * frameBytes + 1).cast("int"), lit(frameBytes)))

  /** Resize stub: stride-resample the payload to exactly `outBytes`
    * bytes (out[j] = in[floor(j·n/outBytes)]) — the deterministic
    * stand-in for an image resize; a real decoder swaps the sampling
    * for pixel interpolation with the same binary→binary column shape.
    * Scan-stage, no shuffle.
    */
  def resizeBytes(payload: Column, outBytes: Int = 64): Column =
    transform(sequence(lit(0), lit(outBytes - 1)),
      j => substring(payload,
        (floor(j * octet_length(payload) / outBytes) + 1).cast("int"), lit(1)))

  /** Stage each document as its own binary file (executor-parallel
    * writes) — produces the raw-file layout a real multimodal corpus
    * arrives in, so [[readBinaryDir]] exercises Spark's actual
    * binaryFile ingest path rather than a cast.
    */
  def stageBinaryDir(docs: DataFrame, idCol: String, textCol: String,
                     dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    docs.select(col(idCol), col(textCol)).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { row =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"doc_${row.getLong(0)}.bin"),
            row.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
    }
  }

  /** The real multimodal source: one row per file with (path, length,
    * content binary) — schema/partitioning identical at 100 TB, where
    * the same reader fans file splits across executors.
    */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Feature extraction through a pluggable [[MediaDecoder]] —
    * partition-local (executor-side, batch-at-a-time), no shuffle; the
    * decoder ships to executors by closure serialization. Swapping in a
    * real image/audio decoder changes ONLY the decoder instance; the
    * plan shape, schema, and partitioning are identical.
    */
  def decodeFeatures(binTable: DataFrame,
                     decoder: MediaDecoder = ByteHistogramDecoder): DataFrame = {
    val spark = binTable.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      binTable.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) => (id, decoder.decode(bytes)) }
    }.toDF("doc_id", "features")
  }

  /** STUB DECODE (kept name — the q66 gate): the deterministic
    * [[ByteHistogramDecoder]] through the pluggable path.
    */
  def fakeDecodeFeatures(binTable: DataFrame): DataFrame =
    decodeFeatures(binTable, ByteHistogramDecoder)
}

/** Pluggable media decoder: payload bytes → fixed-width feature vector.
  * Implementations must be Serializable — instances ship to executors
  * inside the mapPartitions closure. This is the seam where a real
  * image/audio library plugs in (decode + embed), with the Spark-side
  * schema, batching, and partition parallelism unchanged.
  */
trait MediaDecoder extends Serializable {
  def featureDim: Int
  def decode(bytes: Array[Byte]): Array[Double]
}

/** The in-repo deterministic stand-in: 16-bin normalized byte histogram
  * (no media libraries ship in this environment; the oracle recomputes
  * the histogram from hex nibbles, so even the stub is gate-checked).
  */
object ByteHistogramDecoder extends MediaDecoder {
  val featureDim = 16
  def decode(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](featureDim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    hist.map(_ / n)
  }
}
