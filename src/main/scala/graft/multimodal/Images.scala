package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL image decode through the pluggable [[MediaDecoder]] seam — the
  * JDK ships a full PNG/JPEG/BMP/GIF codec in `javax.imageio` (no
  * external deps), so unlike [[ByteHistogramDecoder]] this path runs an
  * actual media library on executors: `ImageIO.read` → pixel raster →
  * fixed-width feature vector. Plan shape, schema, batching, and
  * partition parallelism are IDENTICAL to the stub path (asserted in
  * ImageDecodeSpec) — exactly the swap the seam was designed for.
  *
  * Features (all exactly representable as doubles):
  *   [width, height, rSum, gSum, bSum] — per-channel 8-bit sums over
  * the full raster. Integer-exact, so a lossless codec (PNG) makes
  * decode(encode(pixels)) bit-equal to the pixel formula and the DuckDB
  * oracle can recompute the expected sums WITHOUT decoding (q182).
  *
  * Codec instances are per-call (`ImageIO.read` is thread-safe that
  * way) — safe under local[32]'s many tasks and a 1000-executor
  * cluster alike. Undecodable payloads yield a -1 sentinel vector
  * rather than failing the task (a 100 TB crawl always contains
  * corrupt files).
  */
object ImageIoDecoder extends MediaDecoder {
  val featureDim = 5
  def decode(bytes: Array[Byte]): Array[Double] = {
    // ImageIO.read throws RuntimeExceptions beyond IOException on
    // malformed payloads (IllegalArgumentException, IndexOutOfBounds,
    // CMMException from broken color profiles) — exactly the
    // corrupt-crawl-file case the sentinel absorbs, so catch NonFatal.
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) Array.fill(featureDim)(-1.0)
    else {
      val w = img.getWidth
      val h = img.getHeight
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y) // sRGB regardless of storage type
          rs += (p >>> 16) & 0xff
          gs += (p >>> 8) & 0xff
          bs += p & 0xff
          x += 1
        }
        y += 1
      }
      Array(w.toDouble, h.toDouble, rs.toDouble, gs.toDouble, bs.toDouble)
    }
  }
}

/** Deterministic synthetic raster → REAL PNG bytes (encoded with the
  * same `javax.imageio` codec the decoder reads back). Pixel channels
  * are a pure modular function of (docId, x, y), so an oracle can
  * recompute every channel sum in SQL while the engine-side value
  * round-trips through genuine PNG encode + decode:
  *
  *   w = 8 + d%9,  h = 8 + d%7
  *   r(x,y) = (31d +  7x + 13y) mod 256
  *   g(x,y) = (17d +  3x +  5y) mod 256
  *   b(x,y) = (23d + 11x +  2y) mod 256
  */
object SyntheticImages {
  def widthFor(d: Long): Int = 8 + (d % 9).toInt
  def heightFor(d: Long): Int = 8 + (d % 7).toInt

  def pngFor(d: Long): Array[Byte] = {
    val w = widthFor(d)
    val h = heightFor(d)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((31 * d + 7 * x + 13 * y) % 256).toInt
        val g = ((17 * d + 3 * x + 5 * y) % 256).toInt
        val b = ((23 * d + 11 * x + 2 * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}

/** REAL-decode perceptual fingerprint support: nearest-neighbor 8×8
  * grid sample of the decoded raster, one luma (= r+g+b, 0..765) per
  * cell. Features = [w, h, luma(0,0) … luma(7,7)] (row-major), all
  * integer-exact doubles — the aHash derived from them
  * (bit i = luma_i·64 > Σluma, no division) is therefore identical to
  * what the pixel FORMULA predicts, so the DuckDB oracle can recompute
  * the fingerprint without decoding (q248), while the engine-side
  * value passes through genuine PNG decode.
  *
  * The grid sample IS the resize step of the standard aHash recipe
  * (nearest-neighbor to 8×8); averaging-based resamplers differ per
  * library, integer grid sampling is reproducible everywhere.
  */
object GridLumaDecoder extends MediaDecoder {
  val grid = 8
  val featureDim: Int = 2 + grid * grid
  def decode(bytes: Array[Byte]): Array[Double] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) Array.fill(featureDim)(-1.0)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Double](featureDim)
      out(0) = w.toDouble
      out(1) = h.toDouble
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val p = img.getRGB(gx * w / grid, gy * h / grid)
          out(2 + gy * grid + gx) =
            (((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)).toDouble
          gx += 1
        }
        gy += 1
      }
      out
    }
  }
}
