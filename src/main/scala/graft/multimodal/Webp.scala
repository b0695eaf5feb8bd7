package graft.multimodal

/** REAL WebP LOSSLESS (VP8L) codec — the top-2 crawl image format the
  * codec family was missing: decode implements the full VP8L pipeline
  * with no decoder library (RIFF walk, LSB-first bit reading, simple and
  * normal canonical prefix codes with the 19-symbol code-length code,
  * meta prefix-code images, the color cache, LZ77 backward references
  * with the 120-entry plane-code distance mapping, and all four inverse
  * transforms: predictor (14 modes), cross-channel color, subtract-green,
  * and color-indexing with sub-byte pixel bundling). Encode is a REAL
  * entropy coder for the fixture path — per-channel histograms, canonical
  * Huffman construction, code-length-coded length tables — not a
  * stored/uncompressed trick, so round-trips exercise genuine prefix
  * decoding on both sides.
  *
  * Scope and honesty (the [[Media.parseBmp]] rule): LOSSLESS (VP8L)
  * pixels only, in BOTH container shapes — the bare `RIFF/WEBP/VP8L`
  * layout and the VP8X-extended container (where the image chunk is a
  * SIBLING of the leading `VP8X` header, after optional `ICCP`/`ANIM`
  * metadata — any `cwebp -lossless` output with metadata or an alpha
  * flag ships this shape; the RIFF walk simply skips non-image chunks,
  * so the descent is the same loop). Lossy VP8 pixels return None —
  * the caller's documented fallback path, its dims still surfaced from
  * the VP8 key-frame header or the VP8X canvas declaration — as does
  * anything damaged or structurally out of subset (the one such
  * restriction: color-indexing combined with OTHER transforms in one
  * stream, which mainstream encoders do not emit). Alpha is decoded but
  * not surfaced (the pixel contract is RGB, matching the other codecs).
  *
  * Format reference: the public VP8L bitstream specification (RFC 9649 /
  * the WebP lossless format document). The 120-entry distance table is
  * generated from its defining rule: candidates (dx in -7..8, dy in 0..7,
  * dy > 0 or dx > 0) sorted by (dx² + dy², larger dy first, larger dx
  * first) — reproducing the spec's explicit list.
  */
object Webp {

  /** A decoded lossless image: ARGB pixels, row-major. */
  private[graft] final class WebpImage(
      private[multimodal] val argb: Array[Int],
      val width: Int, val height: Int) {
    /** (r, g, b) at image coords (x, y). */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val p = argb(y * width + x)
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }
  }

  private[multimodal] def isWebp(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'

  /** The VP8L chunk payload — found at the top RIFF level in a bare
    * container AND as the image sibling inside a VP8X-extended one (the
    * walk skips `VP8X`/`ICCP`/`ANIM`/... like any other non-`VP8L`
    * chunk) — or None when no lossless payload exists (lossy VP8 falls
    * to the caller's fallback — decoding it would need a full DCT
    * codec). */
  private def vp8lPayload(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (!isWebp(bytes)) return None
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = (bytes(pos + 4) & 0xffL) | ((bytes(pos + 5) & 0xffL) << 8) |
        ((bytes(pos + 6) & 0xffL) << 16) | ((bytes(pos + 7) & 0xffL) << 24)
      if (size > bytes.length) return None
      if (tag == "VP8L") {
        val end = math.min(bytes.length.toLong, pos + 8 + size).toInt
        return Some(java.util.Arrays.copyOfRange(bytes, pos + 8, end))
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are even-padded
    }
    None
  }

  /** Image dimensions: the VP8L header, or — for LOSSY files, whose
    * pixels this codec honestly refuses — the VP8 key-frame header (real
    * parse: start code 9d 01 2a, 14-bit little-endian dimensions), or
    * finally the VP8X canvas declaration (24-bit little-endian minus-one
    * fields), so lossy and animation captures at least profile
    * correctly. */
  private[multimodal] def dims(bytes: Array[Byte]): Option[(Long, Long)] =
    vp8lPayload(bytes).flatMap { p =>
      if (p.length < 5 || (p(0) & 0xff) != 0x2f) None
      else {
        val br = new BitReader(p, 1)
        val w = br.read(14) + 1
        val h = br.read(14) + 1
        if (br.ok) Some((w.toLong, h.toLong)) else None
      }
    }.orElse(vp8LossyDims(bytes)).orElse(vp8xDims(bytes))

  /** Canvas dims from the VP8X extended-format header: flags (1 byte),
    * reserved (3), then canvas width-1 and height-1 as 24-bit
    * little-endian. The LAST resort — a decodable VP8L payload or a VP8
    * key-frame header describes the actual image chunk; the canvas is
    * the container's declaration. */
  private def vp8xDims(bytes: Array[Byte]): Option[(Long, Long)] = {
    if (!isWebp(bytes)) return None
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = (bytes(pos + 4) & 0xffL) | ((bytes(pos + 5) & 0xffL) << 8) |
        ((bytes(pos + 6) & 0xffL) << 16) | ((bytes(pos + 7) & 0xffL) << 24)
      if (size > bytes.length) return None
      if (tag == "VP8X") {
        val p = pos + 8
        if (size < 10 || p + 10 > bytes.length) return None
        def le24(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16)
        return Some((le24(p + 4) + 1L, le24(p + 7) + 1L))
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  private def vp8LossyDims(bytes: Array[Byte]): Option[(Long, Long)] = {
    if (!isWebp(bytes)) return None
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = (bytes(pos + 4) & 0xffL) | ((bytes(pos + 5) & 0xffL) << 8) |
        ((bytes(pos + 6) & 0xffL) << 16) | ((bytes(pos + 7) & 0xffL) << 24)
      if (size > bytes.length) return None
      if (tag == "VP8 ") {
        val p = pos + 8
        if (p + 10 > bytes.length) return None
        if ((bytes(p + 3) & 0xff) != 0x9d || (bytes(p + 4) & 0xff) != 0x01 ||
          (bytes(p + 5) & 0xff) != 0x2a) return None
        val w = ((bytes(p + 6) & 0xff) | ((bytes(p + 7) & 0xff) << 8)) & 0x3fff
        val h = ((bytes(p + 8) & 0xff) | ((bytes(p + 9) & 0xff) << 8)) & 0x3fff
        return Some((w.toLong, h.toLong))
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }

  /** Decode a lossless WebP, or None for anything not fully decodable. */
  private[graft] def decode(bytes: Array[Byte]): Option[WebpImage] =
    try {
      vp8lPayload(bytes).flatMap { p =>
        if (p.length < 5 || (p(0) & 0xff) != 0x2f) None
        else {
          val br = new BitReader(p, 1)
          val w = br.read(14) + 1
          val h = br.read(14) + 1
          br.read(1) // alpha hint (informational)
          val version = br.read(3)
          if (!br.ok || version != 0) None
          else decodeImageStream(br, w, h, isLevel0 = true)
            .filter(_ => br.ok)
            .map(argb => new WebpImage(argb, w, h))
        }
      }
    } catch { case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  // ---------------------------------------------------------------- bits

  /** LSB-first bit reader; `ok` latches false on overrun instead of
    * throwing, so damage degrades to a clean None. */
  private[multimodal] final class BitReader(b: Array[Byte], var pos: Int) {
    private var bit = 0
    var ok = true
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= b.length) { ok = false; return 0 }
        v |= ((b(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  /** Canonical prefix code (deflate assignment: codes ordered by (length,
    * symbol)), decoded MSB-first bit by bit from the LSB-first stream.
    * A single-symbol code reads ZERO bits. `simple` codes keep their
    * read order: 2-symbol simple codes assign 0 to the FIRST-read symbol
    * even when its value is larger. */
  private[multimodal] final class PrefixCode private (
      private val sorted: Array[Int], // symbols ordered by (length, symbol)
      private val firstCode: Array[Int], private val firstIdx: Array[Int],
      private val count: Array[Int], private val single: Int) {
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < 15) {
        code = (code << 1) | br.read(1)
        len += 1
        if (count(len) > 0 && code - firstCode(len) >= 0 && code - firstCode(len) < count(len))
          return sorted(firstIdx(len) + code - firstCode(len))
        if (!br.ok) return -1
      }
      br.ok = false; -1
    }
  }

  private[multimodal] object PrefixCode {
    /** Build from per-symbol code lengths (0 = absent). None when the
      * length set is not a valid prefix code. */
    def fromLengths(lengths: Array[Int]): Option[PrefixCode] = {
      val present = lengths.indices.filter(lengths(_) > 0)
      if (present.isEmpty) return None
      if (present.length == 1)
        return Some(new PrefixCode(Array(present.head), new Array[Int](16),
          new Array[Int](16), new Array[Int](16), present.head))
      val count = new Array[Int](16)
      present.foreach(s => count(lengths(s)) += 1)
      // Kraft check: over-subscribed or incomplete codes are damage
      var kraft = 0L
      for (l <- 1 to 15) kraft += count(l).toLong << (15 - l)
      if (kraft != (1L << 15)) return None
      val firstCode = new Array[Int](16)
      val firstIdx = new Array[Int](16)
      var code = 0
      var idx = 0
      for (l <- 1 to 15) {
        code = (code + count(l - 1)) << 1
        firstCode(l) = code
        firstIdx(l) = idx
        idx += count(l)
      }
      val sorted = present.sortBy(s => (lengths(s), s)).toArray
      Some(new PrefixCode(sorted, firstCode, firstIdx, count, -1))
    }
    /** A 1- or 2-symbol simple code in READ order. */
    def simple(symbols: Array[Int]): PrefixCode =
      if (symbols.length == 1)
        new PrefixCode(symbols, new Array[Int](16), new Array[Int](16),
          new Array[Int](16), symbols(0))
      else {
        // code 0 = first symbol, 1 = second — read order, not value order
        val count = new Array[Int](16); count(1) = 2
        val firstCode = new Array[Int](16); firstCode(1) = 0
        val firstIdx = new Array[Int](16)
        new PrefixCode(symbols, firstCode, firstIdx, count, -1)
      }
  }

  /** Order in which the 19 code-length-code lengths are transmitted. */
  private[multimodal] val CodeLengthOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal form) for `alphabetSize`. */
  private def readCode(br: BitReader, alphabetSize: Int): Option[PrefixCode] = {
    if (br.read(1) == 1) { // simple
      val numSymbols = br.read(1) + 1
      val first = if (br.read(1) == 1) br.read(8) else br.read(1)
      val syms = if (numSymbols == 2) Array(first, br.read(8)) else Array(first)
      if (!br.ok || syms.exists(_ >= alphabetSize)) None
      else Some(PrefixCode.simple(syms))
    } else {
      val numCodeLengths = 4 + br.read(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) { clLengths(CodeLengthOrder(i)) = br.read(3); i += 1 }
      if (!br.ok) return None
      PrefixCode.fromLengths(clLengths).flatMap { clCode =>
        var maxSymbol =
          if (br.read(1) == 1) {
            val lengthNBits = 2 + 2 * br.read(3)
            2 + br.read(lengthNBits)
          } else alphabetSize
        val lengths = new Array[Int](alphabetSize)
        var symbol = 0
        var prevLen = 8
        var bad = false
        while (symbol < alphabetSize && !bad) {
          if (maxSymbol == 0) symbol = alphabetSize // stop: rest are 0
          else {
            maxSymbol -= 1
            val codeLen = clCode.decode(br)
            if (!br.ok || codeLen < 0) bad = true
            else if (codeLen < 16) {
              lengths(symbol) = codeLen
              symbol += 1
              if (codeLen != 0) prevLen = codeLen
            } else {
              val (repeatVal, extra, base) = codeLen match {
                case 16 => (prevLen, 2, 3)
                case 17 => (0, 3, 3)
                case _ => (0, 7, 11)
              }
              var rep = base + br.read(extra)
              if (symbol + rep > alphabetSize) bad = true
              else while (rep > 0) { lengths(symbol) = repeatVal; symbol += 1; rep -= 1 }
            }
          }
        }
        if (bad || !br.ok) None else PrefixCode.fromLengths(lengths)
      }
    }
  }

  /** One prefix-code GROUP: green/length/cache, red, blue, alpha, dist. */
  private final case class CodeGroup(g: PrefixCode, r: PrefixCode, b: PrefixCode,
      a: PrefixCode, d: PrefixCode)

  private def readCodeGroup(br: BitReader, cacheSize: Int): Option[CodeGroup] =
    for {
      g <- readCode(br, 256 + 24 + cacheSize)
      r <- readCode(br, 256)
      b <- readCode(br, 256)
      a <- readCode(br, 256)
      d <- readCode(br, 40)
    } yield CodeGroup(g, r, b, a, d)

  /** LZ77 prefix-coded value: codes 0-3 are 1-4; above that, extra bits. */
  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.read(extraBits) + 1
    }

  /** The 120 plane codes: (dx, dy) generated by the spec's rule (see the
    * object doc); code c in 1..120 maps to entry c-1, distance =
    * max(1, dy * width + dx). */
  private[multimodal] val PlaneCodes: Array[(Int, Int)] = {
    val cand = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    cand.sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }.take(120).toArray
  }

  private def planeDistance(code: Int, width: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = PlaneCodes(code - 1)
      math.max(1, dy * width + dx)
    }

  // ------------------------------------------------------- image streams

  /** Decode one (possibly transformed) image stream. `isLevel0` = the
    * top-level ARGB image: reads transforms and the meta-prefix-code
    * image; sub-resolution images read neither. Returns ARGB pixels at
    * the stream's own resolution (transform-reduced for level 0), with
    * inverse transforms already applied for level 0. */
  private def decodeImageStream(br: BitReader, w0: Int, h0: Int,
      isLevel0: Boolean): Option[Array[Int]] = {
    var w = w0
    val h = h0
    // (type, sizeBits, data) in read order; applied inverse in REVERSE
    var transforms = List.empty[(Int, Int, Array[Int])]
    var paletteBits = 0
    if (isLevel0) {
      val seen = scala.collection.mutable.Set.empty[Int]
      while (br.ok && br.read(1) == 1) {
        val t = br.read(2)
        if (seen(t)) return None // each transform may appear at most once
        seen += t
        t match {
          case 0 | 1 => // predictor / color: block-size bits + sub-image
            val sizeBits = br.read(3) + 2
            val tw = subSize(w, sizeBits)
            val th = subSize(h, sizeBits)
            decodeImageStream(br, tw, th, isLevel0 = false) match {
              case Some(img) => transforms ::= ((t, sizeBits, img))
              case None => return None
            }
          case 2 => transforms ::= ((2, 0, Array.empty[Int])) // subtract-green
          case _ => // color indexing: palette + pixel bundling
            val paletteSize = br.read(8) + 1
            decodeImageStream(br, paletteSize, 1, isLevel0 = false) match {
              case Some(deltas) =>
                // palette entries accumulate component-wise mod 256
                val pal = new Array[Int](paletteSize)
                var prev = 0
                var i = 0
                while (i < paletteSize) {
                  pal(i) = addPixels(prev, deltas(i)); prev = pal(i); i += 1
                }
                paletteBits =
                  if (paletteSize <= 2) 3
                  else if (paletteSize <= 4) 2
                  else if (paletteSize <= 16) 1
                  else 0
                transforms ::= ((3, paletteBits, pal))
                if (paletteBits > 0) w = subSize(w, paletteBits)
              case None => return None
            }
        }
      }
      if (!br.ok) return None
      // out-of-subset guard: bundled color-indexing composed with other
      // transforms changes the width the OTHER transforms see — mainstream
      // encoders never emit it; reject rather than risk wrong pixels
      if (transforms.exists(_._1 == 3) && transforms.length > 1) return None
    }

    // color cache
    val cacheBits = if (br.read(1) == 1) br.read(4) else 0
    if (!br.ok || cacheBits > 11) return None
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    // meta prefix codes (level 0 only)
    var metaBits = 0
    var metaImage: Array[Int] = null
    if (isLevel0 && br.read(1) == 1) {
      metaBits = br.read(3) + 2
      val mw = subSize(w, metaBits)
      val mh = subSize(h, metaBits)
      decodeImageStream(br, mw, mh, isLevel0 = false) match {
        case Some(img) => metaImage = img
        case None => return None
      }
    }
    if (!br.ok) return None
    // meta index = (red << 8) | green of the meta pixel
    def metaIndexOf(p: Int): Int = ((p >> 16) & 0xff) << 8 | ((p >> 8) & 0xff)
    val nGroups = if (metaImage == null) 1 else metaImage.map(metaIndexOf).max + 1
    if (nGroups > 4096) return None // damage guard: meta image is bounded
    val groups = new Array[CodeGroup](nGroups)
    var gi = 0
    while (gi < nGroups) {
      readCodeGroup(br, cacheSize) match {
        case Some(g) => groups(gi) = g
        case None => return None
      }
      gi += 1
    }

    // pixel loop
    val n = w * h
    if (n <= 0 || n > (1 << 26)) return None
    val out = new Array[Int](n)
    val metaW = if (metaImage == null) 0 else subSize(w, metaBits)
    def groupAt(pos: Int): CodeGroup =
      if (metaImage == null) groups(0)
      else {
        val x = pos % w; val y = pos / w
        groups(metaIndexOf(metaImage((y >> metaBits) * metaW + (x >> metaBits))))
      }
    def cacheInsert(p: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    while (pos < n) {
      val grp = groupAt(pos)
      val s = grp.g.decode(br)
      if (!br.ok || s < 0) return None
      if (s < 256) {
        val red = grp.r.decode(br)
        val blue = grp.b.decode(br)
        val alpha = grp.a.decode(br)
        if (!br.ok) return None
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = p
        cacheInsert(p)
        pos += 1
      } else if (s < 256 + 24) {
        val length = prefixValue(s - 256, br)
        val distCode = grp.d.decode(br)
        if (!br.ok || distCode < 0) return None
        val distance = planeDistance(prefixValue(distCode, br), w)
        if (!br.ok || distance <= 0 || distance > pos || pos + length > n) return None
        var i = 0
        while (i < length) {
          val p = out(pos - distance)
          out(pos) = p
          cacheInsert(p)
          pos += 1
          i += 1
        }
      } else {
        if (cache == null) return None
        val idx = s - 256 - 24
        if (idx >= cacheSize) return None
        out(pos) = cache(idx)
        pos += 1
      }
    }
    if (!br.ok) return None

    if (!isLevel0) Some(out)
    else {
      // inverse transforms, reverse read order
      var img = out
      var iw = w
      transforms.foreach { case (t, bits, data) =>
        t match {
          case 2 => inverseSubtractGreen(img)
          case 0 => inversePredictor(img, iw, h, bits, data)
          case 1 => inverseColorTransform(img, iw, h, bits, data)
          case _ =>
            img = inverseColorIndexing(img, iw, w0, h, bits, data)
            iw = w0
        }
      }
      Some(img)
    }
  }

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  /** Component-wise (a + b) mod 256 over packed ARGB. */
  private def addPixels(a: Int, b: Int): Int =
    (((a >>> 24) + (b >>> 24)) & 0xff) << 24 |
      ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16 |
      ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8 |
      (((a & 0xff) + (b & 0xff)) & 0xff)

  private def inverseSubtractGreen(img: Array[Int]): Unit = {
    var i = 0
    while (i < img.length) {
      val p = img(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      img(i) = (p & 0xff000000) | (r << 16) | (g << 8) | b
      i += 1
    }
  }

  private def inversePredictor(img: Array[Int], w: Int, h: Int,
      sizeBits: Int, modes: Array[Int]): Unit = {
    val mw = subSize(w, sizeBits)
    def avg2(a: Int, b: Int): Int = {
      def c(sh: Int) = ((((a >>> sh) & 0xff) + ((b >>> sh) & 0xff)) / 2) << sh
      c(24) | c(16) | c(8) | c(0)
    }
    def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred: Int =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) img(pos - 1) // first row: left
          else if (x == 0) img(pos - w) // first column: top
          else {
            val mode = (modes((y >> sizeBits) * mw + (x >> sizeBits)) >> 8) & 0xff
            val l = img(pos - 1)
            val t = img(pos - w)
            val tl = img(pos - w - 1)
            val tr = img(pos - w + 1) // x = w-1: first pixel of CURRENT row (contiguous memory rule)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => // select: whichever of L/T is closer to TL-gradient
                val pAlpha = ((l >>> 24) & 0xff) + ((t >>> 24) & 0xff) - ((tl >>> 24) & 0xff)
                val pRed = ((l >> 16) & 0xff) + ((t >> 16) & 0xff) - ((tl >> 16) & 0xff)
                val pGreen = ((l >> 8) & 0xff) + ((t >> 8) & 0xff) - ((tl >> 8) & 0xff)
                val pBlue = (l & 0xff) + (t & 0xff) - (tl & 0xff)
                val dL = math.abs(pAlpha - ((l >>> 24) & 0xff)) + math.abs(pRed - ((l >> 16) & 0xff)) +
                  math.abs(pGreen - ((l >> 8) & 0xff)) + math.abs(pBlue - (l & 0xff))
                val dT = math.abs(pAlpha - ((t >>> 24) & 0xff)) + math.abs(pRed - ((t >> 16) & 0xff)) +
                  math.abs(pGreen - ((t >> 8) & 0xff)) + math.abs(pBlue - (t & 0xff))
                if (dL < dT) l else t
              case 12 => // clamp-add-subtract-full
                def f(sh: Int) = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff)) << sh
                f(24) | f(16) | f(8) | f(0)
              case 13 => // clamp-add-subtract-half
                val ave = avg2(l, t)
                def f(sh: Int) = {
                  val a = (ave >>> sh) & 0xff
                  val d = a - ((tl >>> sh) & 0xff)
                  clamp255(a + d / 2) << sh
                }
                f(24) | f(16) | f(8) | f(0)
              case _ => 0xff000000
            }
          }
        img(pos) = addPixels(img(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseColorTransform(img: Array[Int], w: Int, h: Int,
      sizeBits: Int, elems: Array[Int]): Unit = {
    val mw = subSize(w, sizeBits)
    def delta(m: Int, c: Int): Int = ((m.toByte.toInt * c.toByte.toInt) >> 5)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = elems((y >> sizeBits) * mw + (x >> sizeBits))
        val g2r = cte & 0xff // blue channel
        val g2b = (cte >> 8) & 0xff // green channel
        val r2b = (cte >> 16) & 0xff // red channel
        val p = img(pos)
        val g = (p >> 8) & 0xff
        val newRed = (((p >> 16) & 0xff) + delta(g2r, g)) & 0xff
        var newBlue = (p & 0xff) + delta(g2b, g)
        newBlue = (newBlue + delta(r2b, newRed)) & 0xff
        img(pos) = (p & 0xff00ff00) | (newRed << 16) | newBlue
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  /** Expand bundled palette indices (green channel) through the palette. */
  private def inverseColorIndexing(img: Array[Int], packedW: Int, w: Int, h: Int,
      widthBits: Int, palette: Array[Int]): Array[Int] = {
    val out = new Array[Int](w * h)
    val pixelsPerByte = 1 << widthBits
    val bitsPerPixel = 8 >> widthBits
    val mask = (1 << bitsPerPixel) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packed = img(y * packedW + (x >> widthBits))
        val idxInByte = if (widthBits == 0) 0 else x & (pixelsPerByte - 1)
        val idx = ((packed >> 8) & 0xff) >> (idxInByte * bitsPerPixel) & mask
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0xff000000
        x += 1
      }
      y += 1
    }
    out
  }

  // -------------------------------------------------------------- encode

  /** LSB-first bit writer (the [[BitReader]]'s inverse). */
  private[multimodal] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var bit = 0
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << bit
        bit += 1
        if (bit == 8) { out.write(cur); cur = 0; bit = 0 }
        i += 1
      }
    }
    /** A canonical prefix code's bits go out MSB-first. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (bit > 0) { out.write(cur); cur = 0; bit = 0 }
      out.toByteArray
    }
  }

  /** Canonical Huffman lengths for a histogram (max depth 15 — ample for
    * the fixture alphabets), plus the deflate-rule code assignment. */
  private[multimodal] def huffmanLengths(freq: Array[Long]): Array[Int] = {
    val present = freq.indices.filter(freq(_) > 0)
    val lengths = new Array[Int](freq.length)
    if (present.isEmpty) return lengths
    if (present.length == 1) { lengths(present.head) = 1; return lengths }
    // plain two-queue Huffman over (weight, tiebreak) — deterministic
    final case class Node(w: Long, tie: Int, syms: List[Int])
    val ord = Ordering.by[Node, (Long, Int)](n => (n.w, n.tie))
    var tieSeq = present.max
    val pq = scala.collection.mutable.PriorityQueue.empty(ord.reverse)
    present.foreach(s => pq.enqueue(Node(freq(s), s, List(s))))
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      a.syms.foreach(s => lengths(s) += 1)
      b.syms.foreach(s => lengths(s) += 1)
      tieSeq += 1
      pq.enqueue(Node(a.w + b.w, tieSeq, a.syms ++ b.syms))
    }
    require(lengths.forall(_ <= 15), "fixture histogram exceeded depth 15")
    lengths
  }

  private[multimodal] def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lengths.length)
    val count = new Array[Int](16)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](16)
    var code = 0
    for (l <- 1 to 15) { code = (code + count(l - 1)) << 1; next(l) = code }
    for (s <- lengths.indices.sortBy(s => (lengths(s), s)) if lengths(s) > 0) {
      codes(s) = next(lengths(s)); next(lengths(s)) += 1
    }
    codes
  }

  /** Write one NORMAL prefix code: 19 3-bit code-length-code lengths in
    * transmission order, then every symbol length through that code (no
    * run-length symbols — simplest legal form). */
  private[multimodal] def writeNormalCode(bw: BitWriter, lengths: Array[Int]): Unit = {
    bw.write(0, 1) // not simple
    val clFreq = new Array[Long](19)
    lengths.foreach(l => clFreq(l) += 1)
    val clLengths = huffmanLengths(clFreq)
    require(clLengths.forall(_ <= 7), "code-length code exceeded 3-bit length field")
    val clCodes = canonicalCodes(clLengths)
    bw.write(19 - 4, 4) // num_code_lengths = 19
    CodeLengthOrder.foreach(s => bw.write(clLengths(s), 3))
    bw.write(0, 1) // no max_symbol shortcut: all lengths follow
    lengths.foreach(l => bw.writeCode(clCodes(l), clLengths(l)))
  }

  /** Write a 1- or 2-symbol SIMPLE code (symbols < 256). */
  private[multimodal] def writeSimpleCode(bw: BitWriter, symbols: Array[Int]): Unit = {
    bw.write(1, 1)
    bw.write(symbols.length - 1, 1)
    if (symbols(0) < 2 && symbols.length == 1) { bw.write(0, 1); bw.write(symbols(0), 1) }
    else { bw.write(1, 1); bw.write(symbols(0), 8) }
    if (symbols.length == 2) bw.write(symbols(1), 8)
  }

  private def riffWrap(vp8l: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vp8l.length + 24)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val padded = vp8l.length + (vp8l.length & 1)
    out.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + padded)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(vp8l.length)
    out.write(vp8l, 0, vp8l.length)
    if ((vp8l.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Encode ARGB pixels as a literals-only VP8L stream (real per-channel
    * Huffman codes, no LZ77 / cache — legal and fully general), optionally
    * behind the subtract-green transform. The FIXTURE encoder: its whole
    * job is to exercise the decoder's normal-code path end to end. */
  private[graft] def encodeLossless(w: Int, h: Int, argb: Array[Int],
      subtractGreen: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && argb.length == w * h, "bad encode geometry")
    val px =
      if (!subtractGreen) argb
      else argb.map { p =>
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      }
    val bw = new BitWriter
    bw.write(0x2f, 8)
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1) // no alpha
    bw.write(0, 3) // version
    if (subtractGreen) { bw.write(1, 1); bw.write(2, 2) } // one transform
    bw.write(0, 1) // end of transforms
    bw.write(0, 1) // no color cache
    bw.write(0, 1) // no meta prefix codes
    writeChannelCodesAndPixels(bw, px)
    riffWrap(bw.toBytes)
  }

  private def writeChannelCodesAndPixels(bw: BitWriter, px: Array[Int]): Unit = {
    val gFreq = new Array[Long](256 + 24)
    val rFreq = new Array[Long](256)
    val bFreq = new Array[Long](256)
    val aFreq = new Array[Long](256)
    px.foreach { p =>
      gFreq((p >> 8) & 0xff) += 1
      rFreq((p >> 16) & 0xff) += 1
      bFreq(p & 0xff) += 1
      aFreq((p >>> 24) & 0xff) += 1
    }
    def writeChannel(freq: Array[Long]): (Array[Int], Array[Int]) = {
      val present = freq.indices.filter(freq(_) > 0)
      if (present.length <= 2 && present.forall(_ < 256)) {
        writeSimpleCode(bw, present.toArray)
        val lens = new Array[Int](freq.length)
        val codes = new Array[Int](freq.length)
        if (present.length == 1) lens(present.head) = 0
        else {
          lens(present(0)) = 1; lens(present(1)) = 1
          codes(present(0)) = 0; codes(present(1)) = 1
        }
        (lens, codes)
      } else {
        val lens = huffmanLengths(freq)
        writeNormalCode(bw, lens)
        (lens, canonicalCodes(lens))
      }
    }
    val (gl, gc) = writeChannel(gFreq)
    val (rl, rc) = writeChannel(rFreq)
    val (bl, bc) = writeChannel(bFreq)
    val (al, ac) = writeChannel(aFreq)
    writeSimpleCode(bw, Array(0)) // distance: never used, 0-bit code
    px.foreach { p =>
      val g = (p >> 8) & 0xff; val r = (p >> 16) & 0xff
      val b = p & 0xff; val a = (p >>> 24) & 0xff
      bw.writeCode(gc(g), gl(g))
      bw.writeCode(rc(r), rl(r))
      bw.writeCode(bc(b), bl(b))
      bw.writeCode(ac(a), al(a))
    }
  }

  /** Encode palette-indexed pixels through the COLOR-INDEXING transform
    * with sub-byte bundling (palette <= 16) — the other fixture shape. */
  private[graft] def encodeLosslessPalette(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Int]): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, "palette size")
    require(indices.length == w * h, "bad palette geometry")
    val bw = new BitWriter
    bw.write(0x2f, 8)
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1); bw.write(0, 3)
    bw.write(1, 1); bw.write(3, 2) // one transform: color indexing
    bw.write(palette.length - 1, 8)
    // palette as a delta-coded 1-row entropy image
    val deltas = new Array[Int](palette.length)
    var prev = 0
    for (i <- palette.indices) {
      deltas(i) = subPixels(palette(i), prev); prev = palette(i)
    }
    bw.write(0, 1) // palette image: no color cache
    writeChannelCodesAndPixels(bw, deltas)
    bw.write(0, 1) // end of transforms
    bw.write(0, 1) // main image: no color cache
    bw.write(0, 1) // no meta prefix codes
    val widthBits =
      if (palette.length <= 2) 3
      else if (palette.length <= 4) 2
      else if (palette.length <= 16) 1
      else 0
    val bitsPerPixel = 8 >> widthBits
    val packedW = subSize(w, widthBits)
    val packed = new Array[Int](packedW * h)
    for (y <- 0 until h; x <- 0 until w) {
      val slot = y * packedW + (x >> widthBits)
      val idxInByte = if (widthBits == 0) 0 else x & ((1 << widthBits) - 1)
      val g = ((packed(slot) >> 8) & 0xff) | ((indices(y * w + x) & 0xff) << (idxInByte * bitsPerPixel))
      packed(slot) = 0xff000000 | (g << 8)
    }
    writeChannelCodesAndPixels(bw, packed)
    riffWrap(bw.toBytes)
  }

  private def subPixels(a: Int, b: Int): Int =
    (((a >>> 24) - (b >>> 24)) & 0xff) << 24 |
      ((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16 |
      ((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8 |
      (((a & 0xff) - (b & 0xff)) & 0xff)

  /** REAL WebP->WebP resize: full VP8L decode, nearest-neighbor sample,
    * re-ENCODE through the lossless entropy coder — the [[Gif.resizeGif]]
    * contract for this container. None when the source is not decodable
    * lossless WebP (lossy VP8 falls to the caller's fallback). */
  private[graft] def resizeWebp(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(img.height - 1, y * img.height / h)
        var x = 0
        while (x < w) {
          val sx = math.min(img.width - 1, x * img.width / w)
          out(y * w + x) = img.argb(sy * img.width + sx)
          x += 1
        }
        y += 1
      }
      encodeLossless(w, h, out)
    }

  /**
   * Deterministic synthetic lossless WebP whose pixels are a pure
   * function of position and `seed` — the [[Gif.syntheticGifImage]]
   * closed form (`r = g = b = (x + 2y + seed) % 256`) behind a REAL
   * VP8L entropy coder, so decode tests and the q-series oracle replay
   * the same arithmetic. Odd seeds route through the subtract-green
   * transform, even seeds stay plain literals — both decode to the SAME
   * pixels.
   */
  def syntheticWebpImage(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383, s"bad dims ${w}x$h")
    val argb = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x + 2 * y + seed) % 256).toInt
      argb(y * w + x) = 0xff000000 | (v << 16) | (v << 8) | v
    }
    encodeLossless(w, h, argb, subtractGreen = seed % 2 == 1)
  }

  /**
   * Re-wrap a bare lossless WebP as a VP8X extended container — the
   * shape any `cwebp -lossless` output with metadata or an alpha flag
   * ships: a leading VP8X header declaring the canvas, an ICCP metadata
   * chunk (odd-length, so the even-padding walk is exercised), the
   * original VP8L image chunk, then a trailing EXIF chunk. Fixture-side
   * twin of the decoder's container descent: wrapping must not change a
   * single decoded pixel (gated in-query by q220's VP8X stripe and in
   * WebpSpec).
   */
  def wrapVp8x(bare: Array[Byte]): Array[Byte] = {
    val d = dims(bare).getOrElse(
      throw new IllegalArgumentException("not a decodable WebP — cannot re-wrap"))
    def le24(v: Long): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
    def le32(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      tag.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
    }
    val inner = java.util.Arrays.copyOfRange(bare, 12, bare.length)
    // VP8X flags byte: ICCP (0x20) and EXIF (0x08) are SET because the
    // corresponding chunks are written below — the shape cwebp ships; a
    // zero-flags header embedding those chunks is a fixture no strict
    // external decoder need accept, and never exercises flag handling
    val vp8xFlags = (0x20 | 0x08).toByte
    val body = "WEBP".getBytes("US-ASCII") ++
      chunk("VP8X", Array[Byte](vp8xFlags, 0, 0, 0) ++ le24(d._1 - 1) ++ le24(d._2 - 1)) ++
      chunk("ICCP", Array[Byte](1, 2, 3)) ++ inner ++ chunk("EXIF", Array[Byte](9))
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }
}
