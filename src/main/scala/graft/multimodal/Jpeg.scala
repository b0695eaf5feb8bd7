package graft.multimodal

/**
 * Baseline sequential JPEG codec with ONLY the JDK — the last decode path
 * the multimodal surface had stubbed, now real byte math end to end
 * (the PNG inflate+unfilter of round 7 was the template; this is the
 * Huffman+DCT analog). Public-spec only: ITU-T T.81 (marker structure,
 * entropy coding, the Annex K example Huffman tables) and the JFIF
 * YCbCr<->RGB convention.
 *
 * DECODE ([[decode]]) is a general baseline reader: DQT (8/16-bit), DHT
 * (canonical Huffman build per T.81 F.2.2.3), SOF0/SOF1, DRI + restart
 * markers, 0xFF00 byte destuffing, interleaved MCU scan with sampling
 * factors h,v in {1,2} (4:4:4, 4:2:0, 4:2:2, grayscale), dequantize,
 * float IDCT, replication upsample. Progressive/arithmetic/hierarchical
 * streams and malformed data return None — the caller's route-to-generic
 * -blob-path signal, same honesty rule as [[Media.parseBmp]].
 *
 * ENCODE ([[encodeYcc]]/[[encode]]) emits baseline streams with ALL-ONES
 * quantization tables (legal per spec; chosen so the only loss is
 * round(DCT) — which is ZERO for 8x8-block-constant inputs, the property
 * the oracle'd fixtures exploit) and the Annex K example tables.
 *
 * EXACTNESS ENVELOPE (what the q164/q165 oracles lean on): for an input
 * whose YCbCr samples are CONSTANT within each 8x8 block (chroma: within
 * each chroma-plane block), the forward DCT has one nonzero coefficient
 * DC = 8*(v-128) — an exact integer — so quantize(1)/dequantize/IDCT
 * reproduce every sample bit-for-bit. The fixed-point color transforms
 * ([[yccToRgb]]/[[rgbToYcc]]) are integer-exact and SQL-replayable (the
 * >> 16 is floor division, biased positive for engines that truncate
 * toward zero). Decode therefore yields closed-form pixels for the
 * [[Media.syntheticJpegImage]] fixtures while remaining a REAL decoder
 * for arbitrary baseline files (roundtrip error on general images is
 * bounded by the DCT rounding alone — pinned in JpegSpec).
 */
object Jpeg {

  /** Zigzag index -> natural (row-major) index, T.81 Figure A.6. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosTable(u)(x) = C(u) * cos((2x+1) u pi / 16), C(0) = 1/sqrt(2). */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---------------------------------------------------------------------
  // Fixed-point color transforms — integer-exact, SQL-replayable.
  // Coefficients are the JFIF constants scaled by 2^16 (floor), with the
  // luma triple summing to exactly 65536 and both chroma triples to 0
  // (so grey maps to chroma 128 exactly). `>> 16` on a biased-positive
  // operand is floor division — the oracle writes
  // `((x + 1073741824) // 65536) - 16384` so truncate-toward-zero
  // engines floor too (the bias is a multiple of 65536).
  // ---------------------------------------------------------------------

  /** (r, g, b in [0,255]) -> (y, cb, cr in [0,255]), integer-exact. */
  private[graft] def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    val cb = ((32768 * b - 11059 * r - 21709 * g + 32768 + 1073741824) >> 16) - 16384 + 128
    val cr = ((32768 * r - 27439 * g - 5329 * b + 32768 + 1073741824) >> 16) - 16384 + 128
    (clamp255(y), clamp255(cb), clamp255(cr))
  }

  /** (y, cb, cr in [0,255]) -> (r, g, b in [0,255]), integer-exact. */
  private[graft] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val r = y + ((91881 * (cr - 128) + 32768 + 1073741824) >> 16) - 16384
    val g = y - (((22554 * (cb - 128) + 46802 * (cr - 128)) + 32768 + 1073741824) >> 16) + 16384
    val b = y + ((116130 * (cb - 128) + 32768 + 1073741824) >> 16) - 16384
    (clamp255(r), clamp255(g), clamp255(b))
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---------------------------------------------------------------------
  // Annex K example Huffman tables (T.81 Tables K.3-K.6, public spec).
  // (bits(i) = number of codes of length i+1; vals in code order.)
  // ---------------------------------------------------------------------

  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray

  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // ---------------------------------------------------------------------
  // Huffman table machinery
  // ---------------------------------------------------------------------

  /** Canonical decode table per T.81 F.2.2.3: mincode/maxcode/valptr
    * indexed by code length 1..16 (maxcode = -1 marks an empty length). */
  private final class HuffDecoder(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == vals.length, s"DHT: ${vals.length} symbols but counts sum to $k")
    }
  }

  /** Canonical encode table: (code, length) per symbol value. */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k)) = code
          lenOf(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  // ---------------------------------------------------------------------
  // DECODER
  // ---------------------------------------------------------------------

  /** Raised internally on malformed/truncated entropy data; converted to
    * None at the [[decode]] boundary. */
  private final class Malformed extends RuntimeException(null, null, false, false)

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * destuffing; any non-RST marker mid-read is malformed. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0

    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= bytes.length) throw new Malformed
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) throw new Malformed
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed data byte 0xFF
          else throw new Malformed // marker where data expected
          b = 0xff
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Consume the byte-aligned RSTn marker a DRI interval boundary
      * promises; wrong/absent marker is malformed. */
    def expectRestart(n: Int): Unit = {
      nBits = 0 // discard pad bits to the byte boundary
      if (pos + 1 >= bytes.length || (bytes(pos) & 0xff) != 0xff ||
        (bytes(pos + 1) & 0xff) != (0xd0 + n)) throw new Malformed
      pos += 2
    }

    def decodeHuff(t: HuffDecoder): Int = {
      var code = nextBit()
      var l = 1
      while (!(t.maxCode(l) >= 0 && code <= t.maxCode(l))) {
        code = (code << 1) | nextBit()
        l += 1
        if (l > 16) throw new Malformed
      }
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }
  }

  /** T.81 F.2.2.1 EXTEND: map the n-bit magnitude v to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  /** A fully-decoded baseline JPEG: YCbCr planes at their native sampling
    * (chroma stays subsampled; [[pixel]] replication-upsamples on access,
    * [[ycc]] exposes the raw samples for lossless-in-YCC transforms). */
  private[graft] final class JpegImage(
      val width: Int, val height: Int, val nComponents: Int,
      planes: Array[Array[Int]], planeW: Array[Int],
      sx: Array[Int], sy: Array[Int]) {

    private def sampleAt(c: Int, x: Int, y: Int): Int =
      planes(c)((y / sy(c)) * planeW(c) + (x / sx(c)))

    /** (y, cb, cr) at image coords; grayscale reports (y, 128, 128). */
    def ycc(x: Int, y: Int): (Int, Int, Int) =
      if (nComponents == 1) (sampleAt(0, x, y), 128, 128)
      else (sampleAt(0, x, y), sampleAt(1, x, y), sampleAt(2, x, y))

    /** (r, g, b) at image coords via the fixed-point [[yccToRgb]]. */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      if (nComponents == 1) { val v = sampleAt(0, x, y); (v, v, v) }
      else {
        val (yv, cb, cr) = ycc(x, y)
        yccToRgb(yv, cb, cr)
      }
    }
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /**
   * Classify the blob's first start-of-frame marker (T.81 Table B.1) —
   * the HONEST routing signal for [[decode]]'s coverage: only "baseline"
   * (SOF0/SOF1 Huffman sequential) is pixel-decodable here; every other
   * class NAMES why the pixel path falls back (a real crawl carries
   * progressive JPEGs, and a silent generic-fallback row would be
   * indistinguishable from a decoder bug). None when no SOF marker
   * appears before SOS/EOF — truncated or non-JPEG headers, which the
   * dimension parse already reports via its own fallback.
   */
  private[graft] def sofClass(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    while (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xff) { pos += 1 } // legal fill byte before a marker
      else if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return Some(marker match {
          case 0xc0 | 0xc1 => "baseline" // sequential Huffman ([[decode]]'s envelope)
          case 0xc2 => "progressive"
          case 0xc3 => "lossless"
          case 0xc9 | 0xca | 0xcb => "arithmetic"
          case _ => "hierarchical" // 0xc5-0xc7, 0xcd-0xcf differential frames
        })
      } else if (marker == 0xd8 || marker == 0xd9 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // standalone marker, no length field
      } else if (marker == 0xda || pos + 3 >= bytes.length) {
        return None // entropy data from here on; no SOF seen
      } else {
        val len = be16(bytes, pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        pos += 2 + len
      }
    }
    None
  }

  /**
   * Decode a baseline-sequential (SOF0/SOF1) OR progressive (SOF2) JPEG.
   * Baseline: 8-bit precision, 1 or 3 components with sampling factors in
   * {1,2}, one interleaved scan, optional restart intervals. Progressive
   * ([[decodeProgressiveImpl]]): full T.81 Annex G.2 Huffman progressive —
   * spectral selection, successive approximation on DC and AC, EOB runs,
   * interleaved DC scans and non-interleaved band scans, restart
   * intervals, DHT redefinition between scans. Returns None for
   * arithmetic-coded, lossless, hierarchical, 12-bit, or any malformed/
   * truncated stream — [[sofClass]] names which frame class caused the
   * fallback.
   */
  private[graft] def decode(bytes: Array[Byte]): Option[JpegImage] =
    try {
      if (sofClass(bytes).contains("progressive")) decodeProgressiveImpl(bytes)
      else decodeImpl(bytes)
    } catch {
      // untrusted bytes: any index/shape violation the explicit checks
      // miss is a malformed file, not a crash — same contract as parsePng
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }

  /**
   * T.81 Annex G.2 progressive decode. A progressive stream carries the
   * SAME frame data as a sequential one, split across scans: DC and AC
   * coefficient BANDS arrive separately (spectral selection) and each
   * band can arrive bit-plane by bit-plane (successive approximation).
   * The decoder therefore accumulates a full DCT-coefficient buffer per
   * component across all scans — stored in ZIGZAG order, since that is
   * the order every scan addresses — and only dequantizes + IDCTs once
   * the stream ends (EOI or end of data; a truncated-but-well-formed
   * prefix is exactly how progressive renders early previews, but here
   * any truncation mid-scan is malformed — the honesty rule).
   *
   * Scan types decoded (G.1.1.1.1 / G.2):
   *  - DC first (Ss=0, Ah=0): baseline DC diff coding of `dc >> Al`,
   *    interleaved over any subset of components.
   *  - DC refinement (Ah>0): one raw bit per block appends bit-plane Al.
   *  - AC first (Ss>0, Ah=0, single component): baseline run-length
   *    coding extended with EOB RUNS (RRRR with SSSS=0, run length
   *    `(1<<RRRR) - 1 + RECEIVE(RRRR)` further all-zero bands).
   *  - AC refinement (Ss>0, Ah>0): G.2's correction-bit pass — newly
   *    nonzero coefficients arrive as +/-1 << Al, every already-nonzero
   *    coefficient in the traversed span receives one correction bit,
   *    EOB runs carry correction bits through the remaining bands.
   */
  private def decodeProgressiveImpl(bytes: Array[Byte]): Option[JpegImage] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val qt = new Array[Array[Int]](4) // natural order after de-zigzag
    val dcT = new Array[HuffDecoder](4)
    val acT = new Array[HuffDecoder](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var hMax = 0; var vMax = 0
    var mcusX = 0; var mcusY = 0
    // per component: full interleaved block grid (bw x bh blocks, row-major),
    // 64 zigzag-ordered raw coefficients per block; and the non-interleaved
    // grid (nbw x nbh <= bw x bh) a single-component scan iterates
    var coefs: Array[Array[Int]] = null
    var bw: Array[Int] = null; var bh: Array[Int] = null
    var nbw: Array[Int] = null; var nbh: Array[Int] = null

    var pos = 2
    var sawEoi = false
    while (!sawEoi) {
      if (pos + 1 >= bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      var marker = bytes(pos + 1) & 0xff
      while (marker == 0xff) { pos += 1; if (pos + 1 >= bytes.length) return None; marker = bytes(pos + 1) & 0xff }
      pos += 2
      marker match {
        case 0xd9 => sawEoi = true
        case 0x01 => // TEM, standalone
        case m if m >= 0xd0 && m <= 0xd7 => // stray RST, standalone
        case 0xc2 => // SOF2: progressive frame header (same layout as SOF0)
          if (compId != null) return None // second frame header
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 8 || pos + len > bytes.length) return None
          val prec = bytes(pos + 2) & 0xff
          h = be16(bytes, pos + 3); w = be16(bytes, pos + 5)
          nComp = bytes(pos + 7) & 0xff
          if (prec != 8 || w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          if (nComp != 1 && nComp != 3) return None
          if (len != 8 + 3 * nComp) return None
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = bytes(pos + 8 + 3 * c) & 0xff
            val hv = bytes(pos + 9 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            compQ(c) = bytes(pos + 10 + 3 * c) & 0xff
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 || compQ(c) > 3)
              return None
            c += 1
          }
          hMax = compH.max; vMax = compV.max
          mcusX = (w + 8 * hMax - 1) / (8 * hMax)
          mcusY = (h + 8 * vMax - 1) / (8 * vMax)
          coefs = new Array[Array[Int]](nComp)
          bw = new Array[Int](nComp); bh = new Array[Int](nComp)
          nbw = new Array[Int](nComp); nbh = new Array[Int](nComp)
          c = 0
          while (c < nComp) {
            bw(c) = mcusX * compH(c); bh(c) = mcusY * compV(c)
            coefs(c) = new Array[Int](bw(c) * bh(c) * 64)
            // the component's OWN sample grid, blocked (G.1: non-interleaved
            // scans cover ceil(compSamples/8), not the MCU-padded grid)
            nbw(c) = ((w * compH(c) + hMax - 1) / hMax + 7) / 8
            nbh(c) = ((h * compV(c) + vMax - 1) / vMax + 7) / 8
            c += 1
          }
          pos += len
        case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // a non-SOF2 frame inside this path is malformed
        case 0xc4 => // DHT (tables may be redefined between scans)
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 2 || pos + len > bytes.length) return None
          val end = pos + len
          var p = pos + 2
          while (p < end) {
            val tcth = bytes(p) & 0xff
            val tc = tcth >> 4; val th = tcth & 0x0f
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            if (n > 256 || p + 17 + n > end) return None
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffDecoder(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + n
          }
          pos = end
        case 0xdb => // DQT
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 2 || pos + len > bytes.length) return None
          val end = pos + len
          var p = pos + 2
          while (p < end) {
            val pqtq = bytes(p) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 0x0f
            if (pq > 1 || tq > 3) return None
            val width = if (pq == 0) 1 else 2
            if (p + 1 + 64 * width > end) return None
            val tbl = new Array[Int](64)
            var i = 0
            while (i < 64) {
              val v = if (pq == 0) bytes(p + 1 + i) & 0xff else be16(bytes, p + 1 + 2 * i)
              if (v == 0) return None
              tbl(Zigzag(i)) = v
              i += 1
            }
            qt(tq) = tbl
            p += 1 + 64 * width
          }
          pos = end
        case 0xdd => // DRI
          if (pos + 4 > bytes.length || be16(bytes, pos) != 4) return None
          restartInterval = be16(bytes, pos + 2)
          pos += 4
        case 0xda => // SOS: decode one scan
          if (compId == null) return None
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 6 || pos + len > bytes.length) return None
          val ns = bytes(pos + 2) & 0xff
          if (ns < 1 || ns > nComp || len != 6 + 2 * ns) return None
          val scanComp = new Array[Int](ns)
          val scanDc = new Array[Int](ns)
          val scanAc = new Array[Int](ns)
          var c = 0
          while (c < ns) {
            val cid = bytes(pos + 3 + 2 * c) & 0xff
            val idx = compId.indexOf(cid)
            if (idx < 0) return None
            scanComp(c) = idx
            val tt = bytes(pos + 4 + 2 * c) & 0xff
            scanDc(c) = tt >> 4; scanAc(c) = tt & 0x0f
            c += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xff
          val se = bytes(pos + 4 + 2 * ns) & 0xff
          val ahAl = bytes(pos + 5 + 2 * ns) & 0xff
          val ah = ahAl >> 4; val al = ahAl & 0x0f
          if (ss > 63 || se > 63 || se < ss) return None
          if (ss == 0 && se != 0) return None // progressive DC scan is DC-only
          if (ss > 0 && ns != 1) return None // AC scans are non-interleaved
          if (ah > 0 && ah != al + 1) return None // bit planes arrive in order
          val br = new BitReader(bytes, pos + len)
          if (ss == 0) decodeDcScan(br, scanComp, scanDc, dcT, coefs, bw, bh, nbw, nbh,
            compH, compV, mcusX, mcusY, ah, al, restartInterval)
          else decodeAcScan(br, scanComp(0), scanAc(0), acT, coefs, bw, nbw, nbh,
            ss, se, ah, al, restartInterval)
          // resync to the next marker: skip pad bits / stuffed bytes
          pos = br.pos
          var found = false
          while (!found) {
            if (pos + 1 >= bytes.length) return None
            if ((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) != 0x00) found = true
            else pos += 1
          }
        case _ => // APPn, COM, anything else with a length field: skip
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 2 || pos + len > bytes.length) return None
          pos += len
      }
    }
    if (compId == null) return None

    // all scans in: dequantize + IDCT every block of the full grid
    val planes = new Array[Array[Int]](nComp)
    val planeW = new Array[Int](nComp)
    val nat = new Array[Int](64)
    val blk = new Array[Int](64)
    var c = 0
    while (c < nComp) {
      if (qt(compQ(c)) == null) return None
      planeW(c) = bw(c) * 8
      planes(c) = new Array[Int](bw(c) * 8 * bh(c) * 8)
      val q = qt(compQ(c))
      val cz = coefs(c)
      var b = 0
      val nBlocks = bw(c) * bh(c)
      while (b < nBlocks) {
        var k = 0
        while (k < 64) { val n = Zigzag(k); nat(n) = cz(b * 64 + k) * q(n); k += 1 }
        idct8x8(nat, blk)
        val ox = (b % bw(c)) * 8
        val oy = (b / bw(c)) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            planes(c)((oy + yy) * planeW(c) + ox + xx) = blk(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
      c += 1
    }
    Some(new JpegImage(w, h, nComp, planes, planeW,
      Array.tabulate(nComp)(i => hMax / compH(i)),
      Array.tabulate(nComp)(i => vMax / compV(i))))
  }

  /** One progressive DC scan (first pass or refinement), interleaved over
    * `scanComp` (G.2: a DC scan may carry any subset of components; a
    * single-component scan iterates that component's own block grid). */
  private def decodeDcScan(br: BitReader, scanComp: Array[Int], scanDc: Array[Int],
      dcT: Array[HuffDecoder], coefs: Array[Array[Int]],
      bw: Array[Int], bh: Array[Int], nbw: Array[Int], nbh: Array[Int],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      ah: Int, al: Int, restartInterval: Int): Unit = {
    val ns = scanComp.length
    val dcPred = new Array[Int](ns)
    var rstN = 0
    def maybeRestart(unit: Int): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.expectRestart(rstN); rstN = (rstN + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
    def decodeBlock(si: Int, c: Int, blockIdx: Int): Unit =
      if (ah == 0) {
        val t = br.decodeHuff({ val d = dcT(scanDc(si)); if (d == null) throw new Malformed; d })
        if (t > 11) throw new Malformed
        dcPred(si) += extend(br.receive(t), t)
        coefs(c)(blockIdx * 64) = dcPred(si) << al
      } else if (br.nextBit() == 1) {
        coefs(c)(blockIdx * 64) |= 1 << al
      }
    if (ns == 1) {
      val c = scanComp(0)
      var b = 0
      val n = nbw(c) * nbh(c)
      while (b < n) {
        maybeRestart(b)
        decodeBlock(0, c, (b / nbw(c)) * bw(c) + (b % nbw(c)))
        b += 1
      }
    } else {
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        maybeRestart(mcu)
        val mx = mcu % mcusX; val my = mcu / mcusX
        var si = 0
        while (si < ns) {
          val c = scanComp(si)
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              decodeBlock(si, c,
                (my * compV(c) + by) * bw(c) + mx * compH(c) + bx)
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        mcu += 1
      }
    }
  }

  /** One progressive AC scan (first pass or refinement) over a single
    * component's band [ss, se] — T.81 G.2 with EOB runs. */
  private def decodeAcScan(br: BitReader, c: Int, acSel: Int,
      acT: Array[HuffDecoder], coefs: Array[Array[Int]],
      bw: Array[Int], nbw: Array[Int], nbh: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Unit = {
    val at = acT(acSel); if (at == null) throw new Malformed
    val cz = coefs(c)
    var eobrun = 0
    var rstN = 0
    val p1 = 1 << al
    val m1 = -1 << al

    def firstPass(base: Int): Unit =
      if (eobrun > 0) eobrun -= 1
      else {
        var k = ss
        while (k <= se) {
          val rs = br.decodeHuff(at)
          val r = rs >> 4; val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL: 16 zero coefficients
            else { eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0); k = 64 }
          } else {
            k += r
            if (k > se) throw new Malformed
            cz(base + k) = extend(br.receive(s), s) << al
            k += 1
          }
        }
      }

    /** G.2 refinement: correction bit for an already-nonzero coefficient. */
    def refineNonzero(base: Int, k: Int): Unit =
      if (br.nextBit() == 1 && (cz(base + k) & p1) == 0)
        cz(base + k) += (if (cz(base + k) >= 0) p1 else m1)

    /** Correction-bit sweep over zigzag positions [from, to]. */
    def refineTo(base: Int, from: Int, to: Int): Unit = {
      var k = from
      while (k <= to) {
        if (cz(base + k) != 0) refineNonzero(base, k)
        k += 1
      }
    }

    def refinePass(base: Int): Unit =
      if (eobrun > 0) {
        // a block inside an EOB run still carries one correction bit per
        // nonzero-history coefficient in the band (the encoder buffers
        // them and flushes them after the EOBn symbol, in block order)
        refineTo(base, ss, se)
        eobrun -= 1
      } else {
        var k = ss
        var eobHere = false
        while (k <= se && !eobHere) {
          val rs = br.decodeHuff(at)
          var r = rs >> 4; val s = rs & 0x0f
          var insert = 0
          if (s != 0) {
            if (s != 1) throw new Malformed // refinement magnitudes are 1 bit
            insert = if (br.nextBit() == 1) p1 else m1
          } else if (r != 15) {
            eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
            eobHere = true
          } // s == 0, r == 15: ZRL — consume 16 zero-history slots, no insert
          if (!eobHere) {
            // advance to the (r+1)-th zero-HISTORY slot, refining nonzero
            // slots in passing; the new coefficient (if any) lands there
            var placed = false
            while (!placed && k <= se) {
              if (cz(base + k) != 0) { refineNonzero(base, k); k += 1 }
              else if (r == 0) {
                if (insert != 0) cz(base + k) = insert
                k += 1
                placed = true
              } else { r -= 1; k += 1 }
            }
            if (!placed && insert != 0) throw new Malformed
          }
        }
        // the EOBn block's own trailing positions also get correction bits
        if (eobHere) refineTo(base, k, se)
      }

    var b = 0
    val n = nbw(c) * nbh(c)
    while (b < n) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        br.expectRestart(rstN); rstN = (rstN + 1) & 7
        eobrun = 0
      }
      val base = ((b / nbw(c)) * bw(c) + (b % nbw(c))) * 64
      if (ah == 0) firstPass(base) else refinePass(base)
      b += 1
    }
  }

  private def decodeImpl(bytes: Array[Byte]): Option[JpegImage] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val qt = new Array[Array[Int]](4) // natural order after de-zigzag
    val dcT = new Array[HuffDecoder](4)
    val acT = new Array[HuffDecoder](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null

    var pos = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (pos + 1 >= bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      var marker = bytes(pos + 1) & 0xff
      // spec-legal fill bytes: runs of 0xFF before the marker byte
      while (marker == 0xff) { pos += 1; if (pos + 1 >= bytes.length) return None; marker = bytes(pos + 1) & 0xff }
      pos += 2
      marker match {
        case 0xd9 => return None // EOI before SOS: no image data
        case 0x01 => // TEM, standalone
        case m if m >= 0xd0 && m <= 0xd7 => // stray RST, standalone
        case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman SOF
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 8 || pos + len > bytes.length) return None
          val prec = bytes(pos + 2) & 0xff
          h = be16(bytes, pos + 3); w = be16(bytes, pos + 5)
          nComp = bytes(pos + 7) & 0xff
          if (prec != 8 || w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          if (nComp != 1 && nComp != 3) return None
          if (len != 8 + 3 * nComp) return None
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = bytes(pos + 8 + 3 * c) & 0xff
            val hv = bytes(pos + 9 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            compQ(c) = bytes(pos + 10 + 3 * c) & 0xff
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2 || compQ(c) > 3)
              return None
            c += 1
          }
          pos += len
        case 0xc4 => // DHT: one or more tables in the segment
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 2 || pos + len > bytes.length) return None
          val end = pos + len
          var p = pos + 2
          while (p < end) {
            val tcth = bytes(p) & 0xff
            val tc = tcth >> 4; val th = tcth & 0x0f
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            if (n > 256 || p + 17 + n > end) return None
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffDecoder(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + n
          }
          pos = end
        case 0xdb => // DQT: one or more tables, 8- or 16-bit, zigzag order
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 2 || pos + len > bytes.length) return None
          val end = pos + len
          var p = pos + 2
          while (p < end) {
            val pqtq = bytes(p) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 0x0f
            if (pq > 1 || tq > 3) return None
            val width = if (pq == 0) 1 else 2
            if (p + 1 + 64 * width > end) return None
            val tbl = new Array[Int](64)
            var i = 0
            while (i < 64) {
              val v = if (pq == 0) bytes(p + 1 + i) & 0xff else be16(bytes, p + 1 + 2 * i)
              if (v == 0) return None
              tbl(Zigzag(i)) = v
              i += 1
            }
            qt(tq) = tbl
            p += 1 + 64 * width
          }
          pos = end
        case 0xdd => // DRI
          if (pos + 4 > bytes.length || be16(bytes, pos) != 4) return None
          restartInterval = be16(bytes, pos + 2)
          pos += 4
        case 0xda => // SOS
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 6 || pos + len > bytes.length || compId == null) return None
          val ns = bytes(pos + 2) & 0xff
          if (ns != nComp) return None // multi-scan: not baseline-interleaved
          compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cid = bytes(pos + 3 + 2 * c) & 0xff
            val idx = compId.indexOf(cid)
            if (idx < 0) return None
            val tt = bytes(pos + 4 + 2 * c) & 0xff
            compDc(idx) = tt >> 4; compAc(idx) = tt & 0x0f
            c += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xff
          val se = bytes(pos + 4 + 2 * ns) & 0xff
          val ahAl = bytes(pos + 5 + 2 * ns) & 0xff
          if (ss != 0 || se != 63 || ahAl != 0) return None // progressive scan params
          sosAt = pos + len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive / arithmetic / hierarchical: unsupported
        case _ => // APPn, COM, anything else with a length field: skip
          if (pos + 2 > bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 2 || pos + len > bytes.length) return None
          pos += len
      }
    }
    if (compId == null || w == 0) return None

    val hMax = compH.max; val vMax = compV.max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planes = new Array[Array[Int]](nComp)
    val planeW = new Array[Int](nComp)
    var c = 0
    while (c < nComp) {
      planeW(c) = mcusX * 8 * compH(c)
      planes(c) = new Array[Int](planeW(c) * mcusY * 8 * compV(c))
      if (qt(compQ(c)) == null || dcT(compDc(c)) == null || acT(compAc(c)) == null) return None
      c += 1
    }

    val br = new BitReader(bytes, sosAt)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstN = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.expectRestart(rstN)
        rstN = (rstN + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      c = 0
      while (c < nComp) {
        val q = qt(compQ(c)); val dt = dcT(compDc(c)); val at = acT(compAc(c))
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            java.util.Arrays.fill(coef, 0)
            val t = br.decodeHuff(dt)
            if (t > 11) throw new Malformed
            dcPred(c) += extend(br.receive(t), t)
            coef(0) = dcPred(c) * q(0)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = br.decodeHuff(at)
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 else done = true // ZRL vs EOB
              } else {
                k += r
                if (k > 63) throw new Malformed
                val nat = Zigzag(k)
                coef(nat) = extend(br.receive(s), s) * q(nat)
                k += 1
              }
            }
            idct8x8(coef, blk)
            // place into the component plane (plane coords)
            val ox = (mx * compH(c) + bx) * 8
            val oy = (my * compV(c) + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((oy + yy) * planeW(c) + ox + xx) = blk(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    Some(new JpegImage(w, h, nComp, planes, planeW,
      Array.tabulate(nComp)(i => hMax / compH(i)),
      Array.tabulate(nComp)(i => vMax / compV(i))))
  }

  /** Float 2D IDCT + level shift + clamp. Separable would be faster; the
    * direct form keeps the math auditable and is exact where the
    * exactness envelope needs it (a lone DC coefficient: every output is
    * round(DC/8) + 128, bit-exact for integer DC). */
  private def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64) // rows: tmp(u)(x) pass over v
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosT(v)(x) * coef(u * 8 + v); v += 1 }
        tmp(u * 8 + x) = s
        x += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += CosT(uu)(y) * tmp(uu * 8 + x); uu += 1 }
        out(y * 8 + x) = clamp255(math.round(s / 4.0).toInt + 128)
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------------------
  // ENCODER
  // ---------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) put(0x7f, 8 - nBits) // pad with 1s
  }

  /** Magnitude category of v: smallest n with |v| < 2^n. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Forward float DCT of one level-shifted 8x8 block. */
  private def fdct8x8(in: Array[Int], out: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) { s += in(y * 8 + x) * CosT(u)(x) * CosT(v)(y); y += 1 }
          x += 1
        }
        out(v * 8 + u) = s / 4.0
        v += 1
      }
      u += 1
    }
  }

  /**
   * Encode a baseline JPEG from YCbCr sample FUNCTIONS (image coords,
   * values in [0,255]) — the in-YCC entry [[Media.resizeJpeg]] uses to
   * skip the lossy color roundtrip. `subsample` 1 = 4:4:4; 2 = 4:2:0
   * (luma 2x2 per MCU, chroma plane POINT-SAMPLED at even coords —
   * an encoder's legal choice, and exact for the block-constant
   * fixtures). Quantization tables are all-ones (see object doc). Edge
   * blocks replicate the last row/column. AC coefficients are clamped to
   * +/-1023 (category 10, the baseline AC table ceiling — reachable only
   * by adversarial +/-128 checkerboards at quant 1).
   */
  private[graft] def encodeYcc(w: Int, h: Int,
      yf: (Int, Int) => Int, cbf: (Int, Int) => Int, crf: (Int, Int) => Int,
      subsample: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad JPEG dims ${w}x$h")
    require(subsample == 1 || subsample == 2, s"subsample must be 1 or 2, got $subsample")
    val out = new java.io.ByteArrayOutputStream(1024 + w * h / 2)
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(2 + 65); out.write(0x00) // DQT: 8-bit, id 0, all ones
    var i = 0
    while (i < 64) { out.write(1); i += 1 }
    // SOF0: 3 components, luma h=v=subsample, chroma 1x1, all quant table 0
    m(0xc0); u16(8 + 9); out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((subsample << 4) | subsample); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + vals.length); out.write((tc << 4) | th)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals)
    m(0xda); u16(6 + 6); out.write(3) // SOS
    out.write(1); out.write(0x00) // luma: DC 0 / AC 0
    out.write(2); out.write(0x11) // chroma: DC 1 / AC 1
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl

    val dcEnc = Array(new HuffEncoder(DcLumaBits, DcLumaVals), new HuffEncoder(DcChromaBits, DcChromaVals))
    val acEnc = Array(new HuffEncoder(AcLumaBits, AcLumaVals), new HuffEncoder(AcChromaBits, AcChromaVals))
    val bw = new BitWriter(out)
    val hMax = subsample; val vMax = subsample
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val compHv = Array((subsample, subsample), (1, 1), (1, 1))
    val sample: Array[(Int, Int) => Int] = Array(yf, cbf, crf)
    val dcPred = new Array[Int](3)
    val blk = new Array[Int](64)
    val freq = new Array[Double](64)
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c = 0
      while (c < 3) {
        val (ch, cv) = compHv(c)
        val sxc = hMax / ch; val syc = vMax / cv // plane->image scale
        var by = 0
        while (by < cv) {
          var bx = 0
          while (bx < ch) {
            // gather the level-shifted block; edge replication clamp
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val px = ((mx * ch + bx) * 8 + xx) * sxc
                val py = ((my * cv + by) * 8 + yy) * syc
                val v = sample(c)(math.min(px, w - 1), math.min(py, h - 1))
                blk(yy * 8 + xx) = v - 128
                xx += 1
              }
              yy += 1
            }
            fdct8x8(blk, freq)
            val tIdx = if (c == 0) 0 else 1
            // DC: quant 1 -> round only
            val dc = math.round(freq(0)).toInt
            val diff = dc - dcPred(c)
            dcPred(c) = dc
            val s = category(diff)
            bw.put(dcEnc(tIdx).codeOf(s), dcEnc(tIdx).lenOf(s))
            if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
            // AC in zigzag order with run-length + EOB
            var run = 0
            var k = 1
            while (k < 64) {
              var ac = math.round(freq(Zigzag(k))).toInt
              if (ac > 1023) ac = 1023 else if (ac < -1023) ac = -1023
              if (ac == 0) run += 1
              else {
                while (run > 15) { bw.put(acEnc(tIdx).codeOf(0xf0), acEnc(tIdx).lenOf(0xf0)); run -= 16 }
                val sc = category(ac)
                val rs = (run << 4) | sc
                bw.put(acEnc(tIdx).codeOf(rs), acEnc(tIdx).lenOf(rs))
                bw.put(if (ac < 0) ac + (1 << sc) - 1 else ac, sc)
                run = 0
              }
              k += 1
            }
            if (run > 0) bw.put(acEnc(tIdx).codeOf(0x00), acEnc(tIdx).lenOf(0x00)) // EOB
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Flat AC Huffman table for the progressive encoder: every RRRRSSSS
    * symbol 0x00..0xFA (EOBn runs, ZRL, and all run/size pairs up to
    * category 10) at code length 8 — canonical, the all-ones code unused
    * (T.81 C.2). The Annex K tables lack the EOBn symbols 0x10..0xE0, so
    * progressive AC scans carry their own table. */
  private val AcFlatBits = Array(0, 0, 0, 0, 0, 0, 0, 251, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcFlatVals = (0 to 250).toArray

  /**
   * Encode a PROGRESSIVE (SOF2) JPEG from YCbCr sample functions — same
   * sampling/quantization contract as [[encodeYcc]] (all-ones tables,
   * `subsample` 1 = 4:4:4 / 2 = 4:2:0, edge replication), organized as a
   * T.81 Annex G scan script instead of one interleaved scan:
   *
   *   1. DC first, interleaved, successive approximation Al=1
   *   2. DC refinement (Ah=1, Al=0): one raw bit per block
   *   3.-5. per component: AC band Ss=1..Se=63 at full precision
   *      (spectral selection), EOB runs coalescing all-zero bands
   *
   * The scan script exercises the decoder's DC successive-approximation
   * and EOB-run paths while preserving the block-constant EXACTNESS
   * ENVELOPE: such blocks have only a DC coefficient (an exact integer,
   * split bit-exactly across scans 1+2), and their AC bands coalesce into
   * EOB runs — so decode reproduces every sample bit-for-bit, the same
   * closed form as the baseline fixtures.
   */
  private[graft] def encodeYccProgressive(w: Int, h: Int,
      yf: (Int, Int) => Int, cbf: (Int, Int) => Int, crf: (Int, Int) => Int,
      subsample: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad JPEG dims ${w}x$h")
    require(subsample == 1 || subsample == 2, s"subsample must be 1 or 2, got $subsample")
    val out = new java.io.ByteArrayOutputStream(1024 + w * h / 2)
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(2 + 65); out.write(0x00) // DQT: 8-bit, id 0, all ones
    var i = 0
    while (i < 64) { out.write(1); i += 1 }
    m(0xc2); u16(8 + 9); out.write(8); u16(h); u16(w); out.write(3) // SOF2
    out.write(1); out.write((subsample << 4) | subsample); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + vals.length); out.write((tc << 4) | th)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcLumaBits, DcLumaVals); dht(0, 1, DcChromaBits, DcChromaVals)
    dht(1, 0, AcFlatBits, AcFlatVals)

    // quantized coefficient blocks for every component, MCU-padded grid,
    // zigzag order — computed once, emitted across the scans
    val hMax = subsample; val vMax = subsample
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val compHv = Array((subsample, subsample), (1, 1), (1, 1))
    val sample: Array[(Int, Int) => Int] = Array(yf, cbf, crf)
    val bwArr = Array.tabulate(3)(c => mcusX * compHv(c)._1)
    val bhArr = Array.tabulate(3)(c => mcusY * compHv(c)._2)
    val nbwArr = Array.tabulate(3)(c => ((w * compHv(c)._1 + hMax - 1) / hMax + 7) / 8)
    val nbhArr = Array.tabulate(3)(c => ((h * compHv(c)._2 + vMax - 1) / vMax + 7) / 8)
    val coefs = Array.tabulate(3)(c => new Array[Int](bwArr(c) * bhArr(c) * 64))
    val blk = new Array[Int](64)
    val freq = new Array[Double](64)
    var c = 0
    while (c < 3) {
      val (ch, cv) = compHv(c)
      val sxc = hMax / ch; val syc = vMax / cv
      var b = 0
      val nBlocks = bwArr(c) * bhArr(c)
      while (b < nBlocks) {
        val bx = b % bwArr(c); val by = b / bwArr(c)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val px = (bx * 8 + xx) * sxc
            val py = (by * 8 + yy) * syc
            blk(yy * 8 + xx) = sample(c)(math.min(px, w - 1), math.min(py, h - 1)) - 128
            xx += 1
          }
          yy += 1
        }
        fdct8x8(blk, freq)
        var k = 0
        while (k < 64) {
          var v = math.round(freq(Zigzag(k))).toInt
          if (k > 0) { if (v > 1023) v = 1023 else if (v < -1023) v = -1023 }
          coefs(c)(b * 64 + k) = v
          k += 1
        }
        b += 1
      }
      c += 1
    }

    val dcEnc = Array(new HuffEncoder(DcLumaBits, DcLumaVals),
      new HuffEncoder(DcChromaBits, DcChromaVals))
    val acEnc = new HuffEncoder(AcFlatBits, AcFlatVals)

    def sosHeader(comps: Seq[(Int, Int, Int)], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      m(0xda); u16(6 + 2 * comps.length); out.write(comps.length)
      comps.foreach { case (cid, dcSel, acSel) =>
        out.write(cid); out.write((dcSel << 4) | acSel)
      }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }

    // scan 1: DC first, interleaved, Al = 1 — diff coding of dc >> 1
    // (arithmetic shift: the DC point transform, T.81 G.1.2.1)
    sosHeader(Seq((1, 0, 0), (2, 1, 0), (3, 1, 0)), 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      val dcPred = new Array[Int](3)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        var cc = 0
        while (cc < 3) {
          val (ch, cv) = compHv(cc)
          val tIdx = if (cc == 0) 0 else 1
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              val b = (my * cv + by) * bwArr(cc) + mx * ch + bx
              val v = coefs(cc)(b * 64) >> 1
              val diff = v - dcPred(cc)
              dcPred(cc) = v
              val s = category(diff)
              bw.put(dcEnc(tIdx).codeOf(s), dcEnc(tIdx).lenOf(s))
              if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
              bx += 1
            }
            by += 1
          }
          cc += 1
        }
        mcu += 1
      }
      bw.flush()
    }

    // scan 2: DC refinement (Ah=1, Al=0) — the held-back low bit, raw
    sosHeader(Seq((1, 0, 0), (2, 1, 0), (3, 1, 0)), 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        var cc = 0
        while (cc < 3) {
          val (ch, cv) = compHv(cc)
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              val b = (my * cv + by) * bwArr(cc) + mx * ch + bx
              bw.put(coefs(cc)(b * 64) & 1, 1)
              bx += 1
            }
            by += 1
          }
          cc += 1
        }
        mcu += 1
      }
      bw.flush()
    }

    // scans 3-5: one full-precision AC band per component (spectral
    // selection), all-zero bands coalesced into EOB runs
    var sc = 0
    while (sc < 3) {
      sosHeader(Seq((sc + 1, 0, 0)), 1, 63, 0, 0)
      val bw = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = while (eobrun > 0) {
        // EOBn covers n in [2^r, 2^(r+1) - 1]: symbol RRRR = r, then r
        // extension bits carry n - 2^r (r capped at 14: n <= 32767)
        var r = 0
        while ((2 << r) <= eobrun && r < 14) r += 1
        val n = math.min(eobrun, (2 << r) - 1)
        bw.put(acEnc.codeOf(r << 4), acEnc.lenOf(r << 4))
        if (r > 0) bw.put(n - (1 << r), r)
        eobrun -= n
      }
      var b = 0
      val nBlocks = nbwArr(sc) * nbhArr(sc)
      while (b < nBlocks) {
        val base = ((b / nbwArr(sc)) * bwArr(sc) + (b % nbwArr(sc))) * 64
        // last nonzero coefficient of the band, if any
        var last = 0
        var k = 63
        while (k >= 1 && last == 0) { if (coefs(sc)(base + k) != 0) last = k; k -= 1 }
        if (last == 0) eobrun += 1
        else {
          flushEob()
          var run = 0
          k = 1
          while (k <= last) {
            val v = coefs(sc)(base + k)
            if (v == 0) run += 1
            else {
              while (run > 15) { bw.put(acEnc.codeOf(0xf0), acEnc.lenOf(0xf0)); run -= 16 }
              val s = category(v)
              val rs = (run << 4) | s
              bw.put(acEnc.codeOf(rs), acEnc.lenOf(rs))
              bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
              run = 0
            }
            k += 1
          }
          if (last < 63) eobrun += 1 // this block's own end-of-band
        }
        b += 1
      }
      flushEob()
      bw.flush()
      sc += 1
    }

    m(0xd9) // EOI
    out.toByteArray
  }

  /** RGB entry: converts through the fixed-point [[rgbToYcc]] then
    * delegates to [[encodeYcc]]. */
  private[graft] def encode(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
      subsample: Int = 1): Array[Byte] = {
    // memoizing per-pixel would need a w*h*3 buffer; the three closures
    // re-derive instead (encode is fixture/re-encode plumbing, not hot)
    encodeYcc(w, h,
      (x, y) => rgbToYcc(px(x, y)._1, px(x, y)._2, px(x, y)._3)._1,
      (x, y) => rgbToYcc(px(x, y)._1, px(x, y)._2, px(x, y)._3)._2,
      (x, y) => rgbToYcc(px(x, y)._1, px(x, y)._2, px(x, y)._3)._3,
      subsample)
  }
}
