package graft.multimodal

/** REAL GIF (87a/89a) codec — the remaining common crawl-image container
  * after BMP/PNG/JPEG, and the only one whose compression is LZW. Decode
  * implements the full GIF pipeline with no decoder library: header +
  * logical-screen walk, global/local color tables, extension-block skip,
  * interlace reordering, and variable-width LSB-first LZW with clear-code
  * resets, the KwKwK self-referencing case, and the 12-bit dictionary
  * ceiling (GIF89a spec, Appendix F; width/reset discipline follows the
  * classic compress-derived encoder/decoder pairing every mainstream GIF
  * writer emits). Encode is a real dictionary-building LZW compressor —
  * not the fixed-width "uncompressed GIF" trick — so round-trip tests
  * exercise genuine dictionary growth on both sides.
  *
  * Scope and honesty (the [[Media.parseBmp]] rule): FIRST frame only, and
  * `decode` returns None for anything it cannot fully and correctly
  * decode — missing color table, truncated data, or malformed framing —
  * so undecodable blobs fall to the caller's documented fallback instead
  * of emitting wrong pixels. Animation, transparency compositing, and
  * disposal methods are out of scope (frame 1 of an animated GIF decodes
  * fine; later frames are never touched).
  */
object Gif {

  /** A decoded first frame: palette-indexed pixels + active color table. */
  private[graft] final class GifImage(
      private[multimodal] val indices: Array[Byte],
      private[multimodal] val palette: Array[Int],
      val width: Int, val height: Int) {
    /** (r, g, b) at image coords (x, y). */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val rgb = palette(indices(y * width + x) & 0xff)
      ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    }
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Image dimensions from the logical screen descriptor (cheap sniff). */
  private[multimodal] def dims(bytes: Array[Byte]): Option[(Long, Long)] =
    if (isGif(bytes) && bytes.length >= 10)
      Some((le16(bytes, 6).toLong, le16(bytes, 8).toLong))
    else None

  private[multimodal] def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Decode the first frame, or None for anything not fully decodable. */
  private[graft] def decode(bytes: Array[Byte]): Option[GifImage] = {
    if (!isGif(bytes) || bytes.length < 13) return None
    var pos = 6
    val packed = bytes(pos + 4) & 0xff
    pos += 7 // logical screen descriptor
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > bytes.length) return None
      gct = readColorTable(bytes, pos, n)
      pos += 3 * n
    }
    // block walk to the first image descriptor
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label byte + data sub-blocks
          pos += 2
          while (pos < bytes.length && bytes(pos) != 0) pos += 1 + (bytes(pos) & 0xff)
          if (pos >= bytes.length) return None
          pos += 1 // block terminator
        case 0x2c => // image descriptor
          if (pos + 10 > bytes.length) return None
          val w = le16(bytes, pos + 5)
          val h = le16(bytes, pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          pos += 10
          var table = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > bytes.length) return None
            table = readColorTable(bytes, pos, n)
            pos += 3 * n
          }
          if (table == null || w <= 0 || h <= 0 ||
              w.toLong * h > Int.MaxValue) return None
          if (pos >= bytes.length) return None
          val minCodeSize = bytes(pos) & 0xff
          pos += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream(bytes.length - pos)
          while (pos < bytes.length && bytes(pos) != 0) {
            val n = bytes(pos) & 0xff
            if (pos + 1 + n > bytes.length) return None
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          if (pos >= bytes.length) return None // missing sub-block terminator
          val raw = lzwDecode(data.toByteArray, minCodeSize, w * h).getOrElse(return None)
          // palette-index bounds: an index past the table is damage, not a pixel
          var i = 0
          while (i < raw.length) {
            if ((raw(i) & 0xff) >= table.length) return None
            i += 1
          }
          val indices = if (interlaced) deinterlace(raw, w, h) else raw
          return Some(new GifImage(indices, table, w, h))
        case 0x3b => return None // trailer before any image frame
        case _ => return None // unframed damage
      }
    }
    None
  }

  private def readColorTable(b: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => ((b(off + 3 * i) & 0xff) << 16) |
      ((b(off + 3 * i + 1) & 0xff) << 8) | (b(off + 3 * i + 2) & 0xff))

  /** GIF interlace: sequential decoded rows land in 4 passes (0/8, 4/8,
    * 2/4, 1/2 row strides). */
  private def deinterlace(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](raw.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(raw, src * w, out, y * w, w)
        src += 1
        y += step
      }
    }
    out
  }

  /** Variable-width LSB-first LZW decode of `expected` palette indices.
    * None on truncated/overflowing/malformed code streams. */
  private[multimodal] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                                    expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outPos = 0
    var codeSize = minCodeSize + 1
    var topSlot = 1 << codeSize
    var slot = end + 1
    var prevCode = -1
    var firstByte = 0
    var acc = 0L
    var accBits = 0
    var bytePos = 0
    while (true) {
      // pull the next code
      while (accBits < codeSize) {
        if (bytePos >= data.length) return None // truncated mid-stream
        acc |= (data(bytePos) & 0xffL) << accBits
        accBits += 8
        bytePos += 1
      }
      val code = (acc & (topSlot - 1)).toInt
      acc >>>= codeSize
      accBits -= codeSize
      if (code == end) {
        return if (outPos == expected) Some(out) else None
      } else if (code == clear) {
        codeSize = minCodeSize + 1
        topSlot = 1 << codeSize
        slot = end + 1
        prevCode = -1
      } else if (prevCode == -1) {
        if (code >= clear) return None // first code after clear must be a literal
        out(outPos) = code.toByte; outPos += 1
        if (outPos > expected) return None
        firstByte = code
        prevCode = code
      } else {
        if (code > slot) return None // gap in the code sequence: damage
        var sp = 0
        var c = code
        if (code == slot) { // the KwKwK case: code not yet in the table
          stack(sp) = firstByte.toByte; sp += 1
          c = prevCode
        }
        while (c >= clear + 2) { // walk the prefix chain (literals are < clear)
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        stack(sp) = c.toByte; sp += 1
        firstByte = c
        if (outPos + sp > expected) return None
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (slot < 4096) {
          prefix(slot) = prevCode
          suffix(slot) = firstByte.toByte
          slot += 1
          if (slot >= topSlot && codeSize < 12) { topSlot <<= 1; codeSize += 1 }
        }
        prevCode = code
      }
      if (outPos == expected) {
        // all pixels decoded; accept with or without a trailing end code
        return Some(out)
      }
    }
    None // unreachable
  }

  /** Real dictionary-building LZW encode (the compress-derived pairing of
    * [[lzwDecode]]): emits an initial clear code, grows the table to the
    * 12-bit ceiling, and resets with a clear code when full. */
  private[multimodal] def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    var acc = 0L
    var accBits = 0
    var codeSize = minCodeSize + 1
    var maxCode = (1 << codeSize) - 1
    var nextCode = end + 1
    val dict = new java.util.HashMap[Integer, Integer](4096)
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
      // widen AFTER the write when the next assignable code no longer fits —
      // the decoder widens at the same point (slot >= topSlot post-insert)
      if (nextCode > maxCode && codeSize < 12) {
        codeSize += 1
        maxCode = (1 << codeSize) - 1
      }
    }
    emit(clear)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xff
      val key = Integer.valueOf((cur << 8) | b)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (nextCode < 4096) {
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
        } else { // table full: reset both sides with a clear code
          emit(clear)
          dict.clear()
          nextCode = end + 1
          codeSize = minCodeSize + 1
          maxCode = (1 << codeSize) - 1
        }
        cur = b
      }
      i += 1
    }
    emit(cur)
    emit(end)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Encode a non-interlaced GIF89a with a 256-entry color table. */
  private[graft] def encode(w: Int, h: Int, indices: Array[Byte],
                            palette: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h,
      s"index buffer must be exactly ${w}x$h")
    require(palette.length == 256, s"palette must have 256 entries, got ${palette.length}")
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 800)
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0xf7) // GCT present, 8 bits/channel, 256 entries
    out.write(0); out.write(0)
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
    }
    out.write(0x2c); w16(0); w16(0); w16(w); w16(h); out.write(0) // descriptor, no LCT
    val minCodeSize = 8
    out.write(minCodeSize)
    val lzw = lzwEncode(indices, minCodeSize)
    var off = 0
    while (off < lzw.length) { // <= 255-byte data sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Deterministic synthetic grayscale GIF: palette(i) = (i, i, i) and
    * index(x, y) = (x + 2y + seed) % 256 — a closed form DISTINCT from the
    * BMP/PNG/JPEG fixtures (2y, not y), replayable in SQL as the q206
    * oracle. Long runs along anti-diagonals make LZW genuinely compress. */
  def syntheticGifImage(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"dimensions must be positive and fit an Int, got ${w}x$h")
    val indices = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        indices(y * w + x) = (((x + 2L * y + seed) % 256).toInt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    encode(w, h, indices, Array.tabulate(256)(i => (i << 16) | (i << 8) | i))
  }

  /** Nearest-neighbor resize re-encoded as a GIF with the SOURCE color
    * table (index-space sampling: a resized pixel keeps its source pixel's
    * own palette entry, so no quantization step and no color drift; the
    * table pads to 256 entries because [[encode]] writes a fixed-size
    * GCT — padding entries are unreferenced). */
  private[graft] def resizeGif(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val indices = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(img.height - 1, y * img.height / h)
        var x = 0
        while (x < w) {
          val sx = math.min(img.width - 1, x * img.width / w)
          indices(y * w + x) = img.indices(sy * img.width + sx)
          x += 1
        }
        y += 1
      }
      encode(w, h, indices, java.util.Arrays.copyOf(img.palette, 256))
    }
}
