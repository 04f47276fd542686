package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{ByteHistogramDecoder, ImageIoDecoder, Multimodal, SyntheticImages}

/** The real `javax.imageio` decode path (round 6): codec round-trip
  * exactness, corrupt-payload handling, plan-shape equality with the
  * stub decoder, and the staged-file binaryFile ingest end-to-end.
  */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("PNG encode+decode round-trips the pixel formula exactly") {
    Seq(0L, 1L, 17L, 123L, 499L).foreach { d =>
      val w = SyntheticImages.widthFor(d)
      val h = SyntheticImages.heightFor(d)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        rs += (31 * d + 7 * x + 13 * y) % 256
        gs += (17 * d + 3 * x + 5 * y) % 256
        bs += (23 * d + 11 * x + 2 * y) % 256
      }
      val f = ImageIoDecoder.decode(SyntheticImages.pngFor(d))
      assert(f.toSeq == Seq(w, h, rs, gs, bs).map(_.toDouble), s"doc $d")
    }
  }

  test("undecodable payload yields the -1 sentinel vector, not a task failure") {
    val junk = "definitely not a png".getBytes("UTF-8")
    assert(ImageIoDecoder.decode(junk).toSeq == Seq.fill(5)(-1.0))
    assert(ImageIoDecoder.decode(Array.empty[Byte]).toSeq == Seq.fill(5)(-1.0))
    // truncated/garbled PNGs make ImageIO throw RUNTIME exceptions
    // (not just IOException) — the sentinel must absorb those too
    val png = SyntheticImages.pngFor(3L)
    (Seq(8, 16, 24, 33, 50) ++ Seq(png.length - 1)).foreach { cut =>
      val truncated = png.take(cut)
      val f = ImageIoDecoder.decode(truncated)
      assert(f.length == 5, s"cut=$cut")
    }
    val garbled = png.clone()
    (12 until math.min(80, garbled.length)).foreach(i => garbled(i) = 0x7f)
    assert(ImageIoDecoder.decode(garbled).length == 5)
  }

  test("stub and real decoder produce the identical physical plan shape") {
    val bin = Seq((1L, SyntheticImages.pngFor(1L))).toDF("doc_id", "payload")
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case p => p.nodeName }
    val stub = Multimodal.decodeFeatures(bin, ByteHistogramDecoder)
    val real = Multimodal.decodeFeatures(bin, ImageIoDecoder)
    assert(shape(stub) == shape(real))
    assert(stub.schema == real.schema)
  }

  test("q182/q183 run green on sf0.001") {
    val q182 = SparkEntry.queries("q182_image_decode")(spark, sf)
    val rows = q182.collect()
    assert(rows.length == 167) // doc_id % 3 == 0 among 0..499
    // spot-check one row against the formula
    val r0 = rows.find(_.getLong(0) == 123L).get
    assert(r0.getLong(1) == SyntheticImages.widthFor(123L))
    assert(r0.getLong(2) == SyntheticImages.heightFor(123L))
    val q183 = SparkEntry.queries("q183_image_ingest")(spark, sf).collect()
    assert(q183.length == 1 && q183.head.getLong(0) == 167L)
    assert(q183.head.getLong(1) == rows.map(_.getLong(1)).sum) // w_total
    assert(q183.head.getLong(2) == rows.map(_.getLong(3)).sum) // r_total
  }

  test("random rasters round-trip the PNG codec exactly (property)") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 25).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = rnd.nextInt(256); val g = rnd.nextInt(256); val b = rnd.nextInt(256)
        rs += r; gs += g; bs += b
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val f = graft.multimodal.ImageIoDecoder.decode(bos.toByteArray)
      assert(f.toSeq == Seq(w, h, rs, gs, bs).map(_.toDouble), s"${w}x$h")
    }
  }
}
