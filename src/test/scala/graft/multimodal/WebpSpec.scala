package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/**
 * VP8L codec gates. Round-trips prove encoder and decoder agree on the
 * normal-Huffman literal path and the transforms the encoder emits;
 * HAND-ROLLED bitstreams (built with the encoder's own BitWriter / code
 * writers, bit layout straight from the spec) pin the decoder paths the
 * fixture encoder never exercises: LZ77 backrefs (direct distances AND
 * plane codes), the color cache, the predictor and cross-channel color
 * transforms, and meta prefix-code groups.
 */
class WebpSpec extends AnyFunSuite with graft.SparkSuite {

  private def closedForm(x: Int, y: Int, seed: Long): Int =
    ((x + 2 * y + seed) % 256).toInt

  test("synthetic round-trip: plain literals and subtract-green decode to the closed form") {
    for (seed <- Seq(0L, 1L, 7L, 200L); (w, h) <- Seq((1, 1), (5, 3), (16, 16), (13, 7))) {
      val img = Webp.decode(Webp.syntheticWebpImage(w, h, seed))
        .getOrElse(fail(s"decode failed for ${w}x$h seed $seed"))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = closedForm(x, y, seed)
        assert(img.pixel(x, y) == ((v, v, v)), s"($x,$y) seed $seed")
      }
    }
  }

  test("COLORED round-trip: distinct channels through plain and subtract-green paths") {
    // grayscale round-trips leave the subtract-green residuals at zero and
    // the channel codes identical — this pins the general case
    for (seed <- Seq(2L, 3L); (w, h) <- Seq((9, 4), (16, 8))) {
      val argb = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        0xff000000 | (((x + y) % 256) << 16) |
          ((((y + seed) % 256).toInt) << 8) | ((x + seed) % 256).toInt
      }
      for (sg <- Seq(false, true)) {
        val img = Webp.decode(Webp.encodeLossless(w, h, argb, subtractGreen = sg))
          .getOrElse(fail(s"decode failed ${w}x$h sg=$sg"))
        for (y <- 0 until h; x <- 0 until w)
          assert(img.pixel(x, y) == ((((x + y) % 256), ((y + seed) % 256).toInt,
            ((x + seed) % 256).toInt)), s"($x,$y) sg=$sg seed=$seed")
      }
    }
  }

  test("dims sniffs the VP8L header; lossy VP8 and garbage return None everywhere") {
    val bytes = Webp.syntheticWebpImage(12, 9, 3L)
    assert(Webp.dims(bytes).contains((12L, 9L)))
    // a lossy container: same RIFF/WEBP wrapper, 'VP8 ' chunk
    val lossy = bytes.clone()
    lossy(15) = ' ' // "VP8L" -> "VP8 "
    assert(Webp.decode(lossy).isEmpty && Webp.dims(lossy).isEmpty)
    assert(Webp.decode("not a webp at all".getBytes("UTF-8")).isEmpty)
    // truncation anywhere degrades to None, never throws
    for (cut <- Seq(4, 13, 21, bytes.length / 2, bytes.length - 2))
      assert(Webp.decode(java.util.Arrays.copyOf(bytes, cut)).isEmpty, s"cut=$cut")
  }

  private def le24(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    tag.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
  }
  /** Wrap inner chunks in a RIFF/WEBP container led by a VP8X header
    * declaring canvas w x h — any `cwebp -lossless` output with metadata
    * or an alpha flag ships this shape. */
  private def vp8xContainer(w: Int, h: Int, inner: Array[Byte]*): Array[Byte] = {
    val vp8x = chunk("VP8X", Array[Byte](0, 0, 0, 0) ++ le24(w - 1) ++ le24(h - 1))
    val body = "WEBP".getBytes("US-ASCII") ++ vp8x ++ inner.flatten
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("VP8X-wrapped VP8L decodes pixel-identical to the bare container") {
    val (w, h) = (9, 5)
    val argb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      0xff000000 | (((x * 7 + y) % 256) << 16) | (((y * 5) % 256) << 8) | ((x * 3) % 256)
    }
    val bare = Webp.encodeLossless(w, h, argb)
    val vp8l = java.util.Arrays.copyOfRange(bare, 12, bare.length)
    // realistic metadata shape: an ICCP chunk (odd-length, exercises the
    // even-padding walk) precedes the image chunk, EXIF follows it
    val wrapped = vp8xContainer(w, h,
      chunk("ICCP", Array[Byte](1, 2, 3)), vp8l, chunk("EXIF", Array[Byte](9)))
    assert(Webp.dims(wrapped).contains((w.toLong, h.toLong)))
    val a = Webp.decode(bare).getOrElse(fail("bare decode failed"))
    val b = Webp.decode(wrapped).getOrElse(fail("VP8X-wrapped decode failed"))
    assert(b.width == w && b.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(a.pixel(x, y) == b.pixel(x, y), s"($x,$y)")
  }

  test("wrapVp8x sets the ICCP and EXIF flag bits it embeds chunks for, " +
       "and still decodes pixel-identical") {
    val bare = Webp.syntheticWebpImage(11, 6, 4)
    val wrapped = Webp.wrapVp8x(bare)
    // VP8X payload starts after RIFF(12) + tag(4) + size(4); flags byte
    // must carry ICCP (0x20) and EXIF (0x08) — the shape cwebp ships when
    // those chunks are present (zero flags + embedded chunks is a fixture
    // strict external decoders may reject)
    assert(new String(wrapped, 12, 4, "US-ASCII") == "VP8X")
    assert((wrapped(20) & 0xff) == (0x20 | 0x08))
    val a = Webp.decode(bare).getOrElse(fail("bare decode failed"))
    val b = Webp.decode(wrapped).getOrElse(fail("wrapVp8x decode failed"))
    assert(a.width == b.width && a.height == b.height)
    for (y <- 0 until a.height; x <- 0 until a.width)
      assert(a.pixel(x, y) == b.pixel(x, y), s"($x,$y)")
  }

  test("VP8X with a lossy VP8 payload: dims from the VP8X header, pixels refused") {
    // the inner 'VP8 ' chunk here is opaque DCT data this codec honestly
    // declines; the canvas dims still surface from the VP8X header
    val lossyGuts = chunk("VP8 ", Array[Byte](0x10, 0, 0, 0x21, 0x04, 0x05))
    val wrapped = vp8xContainer(31, 17, lossyGuts)
    assert(Webp.decode(wrapped).isEmpty)
    assert(Webp.dims(wrapped).contains((31L, 17L)))
    // a VP8X header alone (truncated container) still refuses cleanly
    assert(Webp.decode(vp8xContainer(8, 8)).isEmpty)
  }

  test("palette (color-indexing) round-trip at every bundling width") {
    for (palSize <- Seq(2, 3, 4, 11, 16, 20)) {
      val palette = Array.tabulate(palSize)(i =>
        0xff000000 | ((i * 37 % 256) << 16) | ((i * 91 % 256) << 8) | (i * 53 % 256))
      val (w, h) = (11, 5)
      val indices = Array.tabulate(w * h)(i => ((i * 7 + 3) % palSize).toByte)
      val bytes = Webp.encodeLosslessPalette(w, h, indices, palette)
      val img = Webp.decode(bytes).getOrElse(fail(s"palette $palSize failed"))
      for (y <- 0 until h; x <- 0 until w) {
        val p = palette(indices(y * w + x) & 0xff)
        assert(img.pixel(x, y) == (((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)),
          s"($x,$y) palSize=$palSize")
      }
    }
  }

  // ---- hand-rolled stream helpers -----------------------------------

  private def wrap(vp8l: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    out.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + vp8l.length + (vp8l.length & 1))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(vp8l.length)
    out.write(vp8l, 0, vp8l.length)
    if ((vp8l.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def header(bw: Webp.BitWriter, w: Int, h: Int): Unit = {
    bw.write(0x2f, 8)
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1); bw.write(0, 3)
  }

  /** Emit a green code over alphabet 280 + cacheSize from used-symbol
    * frequencies, returning (lengths, codes) for later symbol writes. */
  private def greenCode(bw: Webp.BitWriter, used: Map[Int, Long],
      cacheSize: Int): (Array[Int], Array[Int]) = {
    val freq = new Array[Long](256 + 24 + cacheSize)
    used.foreach { case (s, n) => freq(s) = n }
    val lens = Webp.huffmanLengths(freq)
    Webp.writeNormalCode(bw, lens)
    // a single-present symbol is a ZERO-bit code on the decode side: the
    // transmitted length table says 1, but emission must write nothing
    val emitLens = if (used.size == 1) new Array[Int](lens.length) else lens
    (emitLens, Webp.canonicalCodes(lens))
  }

  test("LZ77 backrefs decode: direct distance and the first plane codes") {
    // 4x2 image: four literals (row 0), then one backref of length 4 at
    // plane code 1 = (dx 0, dy 1) -> distance = width — row 1 copies row 0
    val w = 4; val h = 2
    val bw = new Webp.BitWriter
    header(bw, w, h)
    bw.write(0, 1) // no transforms
    bw.write(0, 1) // no cache
    bw.write(0, 1) // no meta
    // greens 10,20,30,40 + length symbol 256+2 (length 3? code 2 -> value 3)
    // lengths: code for value 4 = code 3 (codes 0..3 are values 1..4)
    val (gl, gc) = greenCode(bw, Map(10 -> 1L, 20 -> 1L, 30 -> 1L, 40 -> 1L, (256 + 3) -> 1L), 0)
    Webp.writeSimpleCode(bw, Array(5)) // red: constant 5
    Webp.writeSimpleCode(bw, Array(6)) // blue: constant 6
    Webp.writeSimpleCode(bw, Array(255)) // alpha
    Webp.writeSimpleCode(bw, Array(0)) // distance code 0 -> value 1 -> plane (0,1)
    for (g <- Seq(10, 20, 30, 40)) bw.writeCode(gc(g), gl(g))
    bw.writeCode(gc(256 + 3), gl(256 + 3)) // length code 3 = literal length 4
    // distance: simple single-symbol code emits 0 bits; value 1 -> plane code 1
    val img = Webp.decode(wrap(bw.toBytes)).getOrElse(fail("backref stream failed"))
    for (x <- 0 until w; y <- 0 until h)
      assert(img.pixel(x, y) == ((5, (x + 1) * 10, 6)), s"($x,$y)")
  }

  test("direct distances (> plane 120) decode: distance = value - 120") {
    // 3x1: literals g=1, g=2, then a backref of length 1 whose distance
    // value is 122 -> direct distance 2 -> copies the first pixel
    val w = 3; val h = 1
    val bw = new Webp.BitWriter
    header(bw, w, h)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    val (gl, gc) = greenCode(bw, Map(1 -> 1L, 2 -> 1L, 256 -> 1L), 0)
    Webp.writeSimpleCode(bw, Array(0)); Webp.writeSimpleCode(bw, Array(0))
    Webp.writeSimpleCode(bw, Array(255))
    // distance VALUE 122: prefix code 13: extra_bits=(13-2)>>1=5,
    // offset=(2+1)<<5=96, value = 96 + extra + 1 -> extra = 25 (fits 5 bits)
    Webp.writeSimpleCode(bw, Array(13))
    bw.writeCode(gc(1), gl(1)); bw.writeCode(gc(2), gl(2))
    bw.writeCode(gc(256), gl(256)) // length code 0 = length 1
    bw.write(25, 5) // distance extra bits
    val img = Webp.decode(wrap(bw.toBytes)).getOrElse(fail("direct-distance stream failed"))
    assert(img.pixel(0, 0)._2 == 1 && img.pixel(1, 0)._2 == 2 && img.pixel(2, 0)._2 == 1)
  }

  test("color cache: literals insert, cache symbols replay") {
    val w = 3; val h = 1
    val cacheBits = 4
    val px = 0xff000000 | (5 << 16) | (9 << 8) | 7
    val idx = (0x1e35a7bd * px) >>> (32 - cacheBits)
    val bw = new Webp.BitWriter
    header(bw, w, h)
    bw.write(0, 1) // no transforms
    bw.write(1, 1); bw.write(cacheBits, 4) // color cache on
    bw.write(0, 1) // no meta
    val cacheSym = 256 + 24 + idx
    val (gl, gc) = greenCode(bw, Map(9 -> 1L, 3 -> 1L, cacheSym -> 1L), 1 << cacheBits)
    Webp.writeSimpleCode(bw, Array(5, 1)) // reds: 5 then 1
    Webp.writeSimpleCode(bw, Array(7, 2)) // blues: 7 then 2
    Webp.writeSimpleCode(bw, Array(255))
    Webp.writeSimpleCode(bw, Array(0)) // distance: unused
    // literal (5,9,7), literal (1,3,2), cache hit of (5,9,7)
    bw.writeCode(gc(9), gl(9)); bw.write(0, 1); bw.write(0, 1) // simple codes: 1 bit each
    bw.writeCode(gc(3), gl(3)); bw.write(1, 1); bw.write(1, 1)
    bw.writeCode(gc(cacheSym), gl(cacheSym))
    val img = Webp.decode(wrap(bw.toBytes)).getOrElse(fail("cache stream failed"))
    assert(img.pixel(0, 0) == ((5, 9, 7)))
    assert(img.pixel(1, 0) == ((1, 3, 2)))
    assert(img.pixel(2, 0) == ((5, 9, 7)))
  }

  test("predictor transform inverts: edges force black/L/T, block mode applies inside") {
    // 2x2, predictor blocks of 4 (sizeBits=2) -> one 1x1 mode image, mode 2
    // (= TOP) in the green channel. Target: every pixel 0xff808080.
    val bw = new Webp.BitWriter
    header(bw, 2, 2)
    bw.write(1, 1); bw.write(0, 2) // predictor transform
    bw.write(0, 3) // size_bits = 2
    // mode sub-image (1x1): literal pixel with green=2
    bw.write(0, 1) // sub-image: no cache
    val (ml, mc) = greenCode(bw, Map(2 -> 1L), 0)
    Webp.writeSimpleCode(bw, Array(0)) // red
    Webp.writeSimpleCode(bw, Array(0)) // blue
    Webp.writeSimpleCode(bw, Array(0)) // alpha
    Webp.writeSimpleCode(bw, Array(0)) // dist
    bw.writeCode(mc(2), ml(2))
    bw.write(0, 1) // end of transforms
    bw.write(0, 1); bw.write(0, 1) // no cache, no meta
    // residuals: (0,0) = target - black = (00,80,80,80); others 0
    val (gl, gc) = greenCode(bw, Map(0x80 -> 1L, 0 -> 3L), 0)
    Webp.writeSimpleCode(bw, Array(0x80, 0)) // red residuals
    Webp.writeSimpleCode(bw, Array(0x80, 0)) // blue residuals
    Webp.writeSimpleCode(bw, Array(0)) // alpha residuals all 0
    Webp.writeSimpleCode(bw, Array(0)) // dist
    // pixel (0,0): g=80,r(first sym)=0 bits? simple 2-symbol: 1 bit each
    bw.writeCode(gc(0x80), gl(0x80)); bw.write(0, 1); bw.write(0, 1)
    for (_ <- 1 to 3) { bw.writeCode(gc(0), gl(0)); bw.write(1, 1); bw.write(1, 1) }
    val img = Webp.decode(wrap(bw.toBytes)).getOrElse(fail("predictor stream failed"))
    for (x <- 0 to 1; y <- 0 to 1)
      assert(img.pixel(x, y) == ((0x80, 0x80, 0x80)), s"($x,$y)")
  }

  test("cross-channel color transform inverts with signed 3.5 deltas") {
    // 1x1, color transform with one element: green_to_red=16 (blue byte),
    // others 0. Stored pixel g=64, r=10: red' = 10 + ((16*64)>>5) = 42.
    val bw = new Webp.BitWriter
    header(bw, 1, 1)
    bw.write(1, 1); bw.write(1, 2) // color transform
    bw.write(0, 3) // size_bits = 2
    bw.write(0, 1) // cte sub-image: no cache
    val (cl, cc) = greenCode(bw, Map(0 -> 1L), 0) // green_to_blue = 0
    Webp.writeSimpleCode(bw, Array(0)) // red channel: red_to_blue = 0
    Webp.writeSimpleCode(bw, Array(16)) // blue channel: green_to_red = 16
    Webp.writeSimpleCode(bw, Array(0)) // alpha
    Webp.writeSimpleCode(bw, Array(0)) // dist
    bw.writeCode(cc(0), cl(0))
    bw.write(0, 1) // end transforms
    bw.write(0, 1); bw.write(0, 1)
    val (gl, gc) = greenCode(bw, Map(64 -> 1L), 0)
    Webp.writeSimpleCode(bw, Array(10)) // red stored
    Webp.writeSimpleCode(bw, Array(20)) // blue stored
    Webp.writeSimpleCode(bw, Array(255))
    Webp.writeSimpleCode(bw, Array(0))
    bw.writeCode(gc(64), gl(64))
    val img = Webp.decode(wrap(bw.toBytes)).getOrElse(fail("color-transform stream failed"))
    assert(img.pixel(0, 0) == ((42, 64, 20)))
  }

  test("meta prefix-code groups: different blocks decode through different codes") {
    // 8x1, meta blocks of 4 (sizeBits=2) -> meta image 2x1 with indices 0
    // and 1; group 0 emits green 100, group 1 emits green 200.
    val bw = new Webp.BitWriter
    header(bw, 8, 1)
    bw.write(0, 1) // no transforms
    bw.write(0, 1) // no cache
    bw.write(1, 1); bw.write(0, 3) // meta on, size_bits = 2
    // meta image (2x1): pixels with (red<<8|green) = 0 and 1
    bw.write(0, 1) // meta sub-image: no cache
    val (ml, mc) = greenCode(bw, Map(0 -> 1L, 1 -> 1L), 0)
    Webp.writeSimpleCode(bw, Array(0)) // red (meta index high byte) = 0
    Webp.writeSimpleCode(bw, Array(0))
    Webp.writeSimpleCode(bw, Array(0))
    Webp.writeSimpleCode(bw, Array(0))
    bw.writeCode(mc(0), ml(0)); bw.writeCode(mc(1), ml(1))
    // group 0: all-constant (100, 1, 2); group 1: all-constant (200, 3, 4)
    for ((g, r, b) <- Seq((100, 1, 2), (200, 3, 4))) {
      Webp.writeSimpleCode(bw, Array(g)) // single-symbol green: 0 bits/pixel
      Webp.writeSimpleCode(bw, Array(r))
      Webp.writeSimpleCode(bw, Array(b))
      Webp.writeSimpleCode(bw, Array(255))
      Webp.writeSimpleCode(bw, Array(0))
    }
    // 8 pixels: all codes are single-symbol -> zero data bits
    val img = Webp.decode(wrap(bw.toBytes)).getOrElse(fail("meta stream failed"))
    for (x <- 0 to 3) assert(img.pixel(x, 0) == ((1, 100, 2)), s"x=$x")
    for (x <- 4 to 7) assert(img.pixel(x, 0) == ((3, 200, 4)), s"x=$x")
  }

  test("plane-code table: generated rule reproduces the spec's leading entries") {
    val expect = Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3))
    assert(Webp.PlaneCodes.take(16).toSeq == expect)
    assert(Webp.PlaneCodes.length == 120)
  }

  test("resizeWebp: decode -> nearest-neighbor -> re-encode round-trips the sample rule") {
    val src = Webp.syntheticWebpImage(16, 12, 5L)
    val out = Webp.resizeWebp(src, 8, 6).getOrElse(fail("resize failed"))
    val img = Webp.decode(out).getOrElse(fail("re-decode failed"))
    assert(img.width == 8 && img.height == 6)
    for (y <- 0 until 6; x <- 0 until 8) {
      // nearest-neighbor: source pixel (x*16/8, y*12/6)
      val v = closedForm(x * 16 / 8, y * 12 / 6, 5L)
      assert(img.pixel(x, y) == ((v, v, v)), s"($x,$y)")
    }
    // lossy input takes the fallback (None), like decode
    val lossy = src.clone(); lossy(15) = ' '
    assert(Webp.resizeWebp(lossy, 8, 6).isEmpty)
  }

  test("perceptualHash pairs a WebP with its pixel-identical GIF twin") {
    import spark.implicits._
    // same closed form as syntheticBmp? No — build the SAME pixels directly
    val w = 16; val h = 12; val seed = 9L
    val argb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val v = ((x + 2 * y + seed) % 256).toInt
      0xff000000 | (v << 16) | (v << 8) | v
    }
    val webp = Webp.encodeLossless(w, h, argb)
    val gif = Gif.syntheticGifImage(w, h, seed) // same closed form
    val df = Seq((1L, webp), (2L, gif)).toDF("img_id", "blob")
    val hashed = Media.perceptualHash(df, "img_id", "blob")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toList.sortBy(_._1)
    assert(hashed.map(_._2) == List("webp", "gif"))
    assert(hashed(0)._3 == hashed(1)._3, "pixel-identical twins must share a phash")
  }
}
