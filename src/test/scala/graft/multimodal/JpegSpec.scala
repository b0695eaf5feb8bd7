package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/**
 * Pins the baseline JPEG codec: golden closed-form decodes for the
 * block-constant fixtures (both 4:4:4 and 4:2:0), the exactness envelope
 * the q164/q165 oracles lean on, bounded loss on general images,
 * malformed-input rejection, and the Spark-side pixelMeans/resize
 * plumbing end to end.
 */
class JpegSpec extends AnyFunSuite with SparkSuite {

  // the fixture closed form, duplicated here as the independent referee
  private def fixYcc(s: Int)(x: Int, y: Int): (Int, Int, Int) = (
    ((x / 8) * 7 + (y / 8) * 3 + s) % 256,
    ((x / 16) * 11 + (y / 16) * 5 + s) % 256,
    ((x / 16) * 3 + (y / 16) * 7 + 2 * s) % 256)

  test("hand-built constant 16x16: decode reproduces every sample exactly") {
    val bytes = Jpeg.encodeYcc(16, 16, (_, _) => 77, (_, _) => 130, (_, _) => 99)
    // marker skeleton golden: SOI, DQT, SOF0, 4x DHT, SOS, EOI present
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    assert((bytes(bytes.length - 2) & 0xff) == 0xff && (bytes.last & 0xff) == 0xd9)
    val img = Jpeg.decode(bytes).get
    assert(img.width == 16 && img.height == 16 && img.nComponents == 3)
    for (x <- 0 until 16; y <- 0 until 16) {
      assert(img.ycc(x, y) == ((77, 130, 99)), s"at ($x,$y)")
      assert(img.pixel(x, y) == Jpeg.yccToRgb(77, 130, 99))
    }
  }

  test("4:4:4 fixture (even seed) decodes to the closed form bit-for-bit") {
    val (w, h) = (48, 32)
    val img = Jpeg.decode(Media.syntheticJpegImage(w, h, 4L)).get
    assert(img.width == w && img.height == h)
    for (x <- 0 until w; y <- 0 until h)
      assert(img.ycc(x, y) == fixYcc(4)(x, y), s"at ($x,$y)")
  }

  test("4:2:0 fixture (odd seed) decodes to the closed form bit-for-bit") {
    val (w, h) = (48, 32)
    val img = Jpeg.decode(Media.syntheticJpegImage(w, h, 9L)).get
    assert(img.width == w && img.height == h)
    for (x <- 0 until w; y <- 0 until h)
      assert(img.ycc(x, y) == fixYcc(9)(x, y), s"at ($x,$y)")
  }

  test("general (non-block-constant) image roundtrips within the DCT-round bound") {
    // pseudo-random but deterministic samples; quant=1 so the only loss is
    // round(DCT) — per-sample error bounded well under 8 codes
    def f(k: Int)(x: Int, y: Int): Int = ((x * 31 + y * 17 + k * 7) * 2654435761L >>> 24).toInt & 0xff
    val bytes = Jpeg.encodeYcc(40, 24, f(0), f(1), f(2))
    val img = Jpeg.decode(bytes).get
    var maxErr = 0
    for (x <- 0 until 40; y <- 0 until 24) {
      val (gy, gcb, gcr) = img.ycc(x, y)
      maxErr = math.max(maxErr, math.abs(gy - f(0)(x, y)))
      maxErr = math.max(maxErr, math.abs(gcb - f(1)(x, y)))
      maxErr = math.max(maxErr, math.abs(gcr - f(2)(x, y)))
    }
    assert(maxErr <= 8, s"roundtrip error $maxErr exceeds the all-ones-quant bound")
  }

  test("entropy data exercises 0xFF00 byte stuffing") {
    def f(k: Int)(x: Int, y: Int): Int = ((x * 31 + y * 17 + k * 7) * 2654435761L >>> 24).toInt & 0xff
    val bytes = Jpeg.encodeYcc(128, 128, f(3), f(4), f(5))
    val stuffed = (0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0x00)
    assert(stuffed, "no stuffed byte in ~16KB of entropy data — stuffing path untested")
    assert(Jpeg.decode(bytes).isDefined) // and destuffing inverts it
  }

  test("odd (non-multiple-of-8) dims: edge-replicated encode, cropped decode") {
    val bytes = Jpeg.encodeYcc(13, 11, (x, y) => (x * 8 + y) % 256, (_, _) => 128, (_, _) => 128)
    val img = Jpeg.decode(bytes).get
    assert(img.width == 13 && img.height == 11)
    // interior of the single block: still within loss bound
    val (gy, _, _) = img.ycc(3, 3)
    assert(math.abs(gy - ((3 * 8 + 3) % 256)) <= 8)
  }

  test("malformed inputs return None, never throw") {
    val good = Media.syntheticJpegImage(32, 16, 2L)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty, "truncated mid-scan")
    assert(Jpeg.decode(good.take(4)).isEmpty, "headers only")
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty, "not a JPEG")
    assert(Jpeg.decode(Array.empty[Byte]).isEmpty, "empty")
    val progressive = good.clone()
    // flip the SOF0 marker (first FF C0 after SOI) to SOF2: progressive
    val sofAt = (2 until progressive.length - 1).find(i =>
      (progressive(i) & 0xff) == 0xff && (progressive(i + 1) & 0xff) == 0xc0).get
    progressive(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(progressive).isEmpty, "progressive must be rejected")
    val corrupt = good.clone()
    corrupt(good.length / 2) = (corrupt(good.length / 2) ^ 0x55).toByte
    Jpeg.decode(corrupt) // any of Some(garbage-pixels)/None is fine; must not throw
  }

  test("decodeDims agrees with the full decode on fixture files") {
    val bytes = Media.syntheticJpegImage(48, 16, 3L)
    assert(Media.decodeDims(bytes).contains((48L, 16L)))
    assert(Media.sniffKind(bytes) == "jpeg")
  }

  test("undecodable frame classes are NAMED; malformed progressive stays rejected") {
    import spark.implicits._
    val baseline = Media.syntheticJpegImage(48, 16, 3L)
    assert(Jpeg.sofClass(baseline).contains("baseline"))
    val sofAt = (2 until baseline.length - 1).find(i =>
      (baseline(i) & 0xff) == 0xff && (baseline(i + 1) & 0xff) == 0xc0).get
    // a baseline stream RELABELED SOF2 is a malformed progressive file
    // (its single scan has ss=0, se=63 — illegal progressive scan params):
    // the progressive decoder must reject it, never misdecode it
    val lying = baseline.clone()
    lying(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.sofClass(lying).contains("progressive"))
    assert(Jpeg.decode(lying).isEmpty, "malformed progressive must be rejected")
    val means = Media.pixelMeans(
      Seq((1L, baseline), (2L, lying)).toDF("id", "blob"), "id", "blob")
    assert(means.select($"id").as[Long].collect().toSet == Set(1L))
    // the classes NO codec here covers surface their name in the kind and
    // route down the documented checksum path with the real SOF dims
    for ((marker, cls) <- Seq(0xc3 -> "lossless", 0xc9 -> "arithmetic", 0xc5 -> "hierarchical")) {
      val other = baseline.clone(); other(sofAt + 1) = marker.toByte
      assert(Jpeg.sofClass(other).contains(cls), f"marker 0x$marker%02x")
      assert(Jpeg.decode(other).isEmpty, s"$cls must be rejected")
      val feats = Media.extractFeatures(
        Seq((2L, other)).toDF("id", "blob"), "id", "blob").collect()
      assert(feats(0).kind == s"jpeg:$cls")
      assert(feats(0).width == 48L && feats(0).height == 16L)
      assert(feats(0).checksum == Media.sampleChecksum(other))
    }
    assert(Jpeg.sofClass(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.sofClass(baseline.take(sofAt)).isEmpty, "no SOF before EOF")
  }

  test("progressive fixture decodes to the closed form bit-for-bit (4:4:4 and 4:2:0)") {
    for (seed <- Seq(4L, 7L)) {
      val bytes = Media.syntheticProgressiveJpegImage(48, 32, seed)
      assert(Jpeg.sofClass(bytes).contains("progressive"))
      val img = Jpeg.decode(bytes).get
      assert(img.width == 48 && img.height == 32)
      for (x <- 0 until 48; y <- 0 until 32)
        assert(img.ycc(x, y) == fixYcc(seed.toInt)(x, y), s"seed=$seed at ($x,$y)")
    }
  }

  test("progressive encode of a GENERAL image decodes identically to its baseline sibling") {
    // same sample functions, same quantization: identical coefficients, so
    // the multi-scan reassembly must reproduce the baseline decode exactly —
    // any entropy desync anywhere would scramble from that point on
    def yf(x: Int, y: Int): Int = (x * 13 + y * 17 + (x * y) % 31) % 256
    def cb(x: Int, y: Int): Int = (x * 5 + y * 3) % 256
    def cr(x: Int, y: Int): Int = (x * 3 + y * 11) % 256
    for (sub <- Seq(1, 2)) {
      val p = Jpeg.decode(Jpeg.encodeYccProgressive(40, 24, yf, cb, cr, sub)).get
      val b = Jpeg.decode(Jpeg.encodeYcc(40, 24, yf, cb, cr, sub)).get
      for (x <- 0 until 40; y <- 0 until 24)
        assert(p.ycc(x, y) == b.ycc(x, y), s"sub=$sub at ($x,$y)")
    }
  }

  test("THIRD-PARTY progressive stream (ImageIO writer) decodes sample-identically") {
    // the JDK's JPEG writer emits the classic libjpeg progressive scan
    // script — interleaved DC first at Al=1, spectral AC bands with
    // successive approximation (Al=2 then refinements Ah=2->1->0), DC
    // refinement — so this single file exercises EVERY Annex G.2 decode
    // path against an independent implementation. Same writer, same
    // quality, baseline mode: identical quantized coefficients, so OUR
    // decode of both files must agree sample-for-sample.
    import javax.imageio._
    def write(img: java.awt.image.BufferedImage, progressive: Boolean): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      if (progressive) params.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), params)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val r = (x * 7 + y * 3) % 256
      val g = (x * 2 + y * 11) % 256
      val b = (x * 13 + y * 5) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val pBytes = write(img, progressive = true)
    assert(Jpeg.sofClass(pBytes).contains("progressive"))
    val p = Jpeg.decode(pBytes).get
    val b = Jpeg.decode(write(img, progressive = false)).get
    assert(p.width == w && p.height == h)
    for (x <- 0 until w; y <- 0 until h)
      assert(p.ycc(x, y) == b.ycc(x, y), s"at ($x,$y)")
    // grayscale EXTERNAL anchor: single-component, so no chroma-upsampling
    // convention in play — our pixels must track ImageIO's own decode to
    // within IDCT rounding
    val grey = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (x <- 0 until w; y <- 0 until h) {
      val v = (x * 9 + y * 13 + (x * y) % 17) % 256
      grey.getRaster.setSample(x, y, 0, v)
    }
    val gBytes = write(grey, progressive = true)
    assert(Jpeg.sofClass(gBytes).contains("progressive"))
    val g = Jpeg.decode(gBytes).get
    assert(g.nComponents == 1)
    val gRef = ImageIO.read(new java.io.ByteArrayInputStream(gBytes))
    var maxDiff = 0
    for (x <- 0 until w; y <- 0 until h) {
      val refV = gRef.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(refV - g.ycc(x, y)._1))
    }
    assert(maxDiff <= 2, s"grayscale max sample diff vs ImageIO = $maxDiff")
  }

  test("pixelMeans and extractFeatures route progressive blobs through the real decode") {
    import spark.implicits._
    val prog = Media.syntheticProgressiveJpegImage(16, 16, 6L)
    val base = Media.syntheticJpegImage(16, 16, 6L)
    val df = Seq((1L, base), (2L, prog)).toDF("id", "blob")
    val rows = Media.pixelMeans(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == rows(2L), "same closed form, same means")
    val feats = Media.extractFeatures(Seq((2L, prog)).toDF("id", "blob"), "id", "blob").collect()
    assert(feats(0).kind == "jpeg", "decodable progressive is NOT a fallback class")
    assert(feats(0).width == 16L && feats(0).height == 16L)
  }

  test("resizeJpeg x2 upscale stays inside the exactness envelope") {
    val src = Media.syntheticJpegImage(16, 16, 6L)
    val out = Media.resizeJpeg(src, 32, 32).get
    val img = Jpeg.decode(out).get
    assert(img.width == 32 && img.height == 32)
    // dest block (bx,by) point-samples src block (bx/2, by/2), and the
    // x2 grid keeps every dest 8x8 block inside ONE src block — so the
    // resized file decodes to the SOURCE closed form at halved coords
    for (x <- 0 until 32; y <- 0 until 32)
      assert(img.ycc(x, y) == fixYcc(6)(x / 2, y / 2), s"at ($x,$y)")
  }

  test("pixelMeans routes JPEG blobs through the real decode (Spark end to end)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Media.syntheticJpegImage(32, 16, 4L)),
      (2L, Media.syntheticJpegImage(16, 32, 9L)),
      (3L, "not an image".getBytes("UTF-8")))
    val got = Media.pixelMeans(rows.toDF("id", "blob"), "id", "blob")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(!got.contains(3L), "undecodable blob must be dropped")
    def expected(w: Int, h: Int, seed: Int): (Long, Long, Long, Long, Long) = {
      var sr = 0L; var sg = 0L; var sb = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val (yv, cb, cr) = fixYcc(seed)(x, y)
        val (r, g, b) = Jpeg.yccToRgb(yv, cb, cr)
        sr += r; sg += g; sb += b
      }
      val n = w.toLong * h
      (w.toLong, h.toLong, sr / n, sg / n, sb / n)
    }
    assert(got(1L) == expected(32, 16, 4))
    assert(got(2L) == expected(16, 32, 9))
  }

  test("Media.resize emits kind=jpeg with real re-encoded bytes for JPEG blobs") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, Media.syntheticJpegImage(16, 16, 8L)))
    val got = Media.resize(rows.toDF("id", "blob"), "id", "blob", 32, 32).collect().head
    assert(got.getString(1) == "jpeg")
    val img = Jpeg.decode(got.getAs[Array[Byte]](2)).get
    assert(img.width == 32 && img.height == 32)
  }

  test("fixed-point color transforms: grey is a fixed point, SQL-replay form agrees") {
    for (v <- 0 to 255) {
      assert(Jpeg.rgbToYcc(v, v, v) == ((v, 128, 128)), s"grey $v")
      assert(Jpeg.yccToRgb(v, 128, 128) == ((v, v, v)), s"grey $v back")
    }
    // the oracle's biased floor-division replay of yccToRgb
    def sqlReplay(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def fd(x: Long): Long = (x + 1073741824L) / 65536L - 16384L // trunc==floor after bias
      def cl(v: Long): Int = math.max(0L, math.min(255L, v)).toInt
      (cl(y + fd(91881L * (cr - 128) + 32768)),
       cl(y - fd(22554L * (cb - 128) + 46802L * (cr - 128) + 32768)),
       cl(y + fd(116130L * (cb - 128) + 32768)))
    }
    for (y <- 0 to 255 by 17; cb <- 0 to 255 by 13; cr <- 0 to 255 by 11)
      assert(Jpeg.yccToRgb(y, cb, cr) == sqlReplay(y, cb, cr), s"($y,$cb,$cr)")
  }
}
