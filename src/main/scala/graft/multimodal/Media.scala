package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaFeatures(
    id: Long,
    n_bytes: Long,
    kind: String,   // sniffed container type
    width: Long,    // REAL header parse (PNG IHDR / JPEG SOF / BMP info header); fake fallback otherwise
    height: Long,   // REAL header parse (PNG IHDR / JPEG SOF / BMP info header); fake fallback otherwise
    checksum: Long) // sum of sampled bytes — real byte-level work

/**
 * Multimodal-column plumbing: media (image/audio/video) travels as an opaque
 * `binary` column plus typed metadata, exactly like a production training-data
 * pipeline. Decode runs batch-at-a-time inside `mapPartitions` so a real
 * decoder (JNI/ffi image lib) could allocate its native context once per
 * partition — same execution shape as Python's `mapInPandas`, kept JVM-native
 * here.
 *
 * DIMENSION extraction is REAL for PNG, JPEG and BMP ([[decodeDims]]): the
 * IHDR chunk / SOF segment / BITMAPINFOHEADER carry width/height as plain
 * integers, so no decoder library is needed — the same parse works on any
 * real file of those formats. Full PIXEL decode is REAL for uncompressed
 * 24bpp BMP ([[parseBmp]]/[[bmpChannelMeans]]/[[resizeBmp]]: per-pixel
 * channel access, means, nearest-neighbor resize — the format is raw BGR
 * triples, decodable with pure byte math), for 8-bit RGB/RGBA
 * non-interlaced PNG ([[parsePng]]: PNG's compression IS zlib, which the
 * JDK ships — chunk walk, CRC32 verify, Inflater, full five-filter
 * unfiltering; [[syntheticPngImage]] fixtures cycle every filter type),
 * AND for baseline-sequential PLUS progressive JPEG ([[Jpeg.decode]]:
 * DHT/DQT parse, Huffman entropy decode — including T.81 Annex G
 * spectral-selection / successive-approximation multi-scan streams —
 * dequantize, IDCT, 4:2:0/4:2:2 upsample; pure JDK byte math). The
 * byte-cycling `fakeDecode`/resize fallbacks now serve ONLY containers
 * no codec here covers (arithmetic-coded/lossless/hierarchical JPEG,
 * compressed AVI streams, unknown formats) — deterministic stand-ins
 * that keep schema and batch shape while staying clearly marked.
 */
object Media {

  /** Magic-byte container sniffing on the first bytes of the blob. */
  private[multimodal] def sniffKind(bytes: Array[Byte]): String =
    if (bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else if (Webp.isWebp(bytes)) "webp"
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "riff"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (Gif.isGif(bytes)) "gif"
    else "unknown"

  private[graft] def webpChannelMeans(img: Webp.WebpImage): (Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixel(x, y)
        sr += r; sg += g; sb += b
        x += 1
      }
      y += 1
    }
    val n = img.width.toLong * img.height
    (img.width.toLong, img.height.toLong, sr / n, sg / n, sb / n)
  }

  /** A fully-parsed uncompressed 24bpp BMP: pixel access in IMAGE
    * coordinates (origin top-left) regardless of the file's row order. */
  private[graft] final class BmpImage(bytes: Array[Byte], val width: Int, val height: Int,
      dataOffset: Int, stride: Int, bottomUp: Boolean) {
    /** (r, g, b) of the pixel at image coords (x, y). */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val row = if (bottomUp) height - 1 - y else y
      val i = dataOffset + row * stride + x * 3
      ((bytes(i + 2) & 0xff), (bytes(i + 1) & 0xff), (bytes(i) & 0xff))
    }
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  // shared little-endian/ascii writers for the synthetic containers
  private def putAsciiAt(b: Array[Byte], i: Int, s: String): Unit = {
    var j = 0; while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 }
  }
  private def putLe16At(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32At(b: Array[Byte], i: Int, v: Int): Unit = {
    putLe16At(b, i, v & 0xffff); putLe16At(b, i + 2, (v >> 16) & 0xffff)
  }

  /** BMP/AVI row stride in LONG arithmetic — header fields are untrusted,
    * so geometry math must not wrap before the bounds check rejects it. */
  private def strideOf(w: Int): Long = {
    val rowBytes = w.toLong * 3
    rowBytes + ((4 - rowBytes % 4) % 4)
  }

  /**
   * REAL pixel-level BMP parse — no decoder library, because the format
   * needs none: BITMAPINFOHEADER fields are little-endian integers at fixed
   * offsets, and uncompressed 24bpp pixel rows are plain BGR byte triples
   * padded to 4-byte row boundaries, stored bottom-up (or top-down when the
   * height field is negative). Returns None for anything that is not an
   * in-bounds uncompressed 24bpp BMP — those fall back to the stubbed path,
   * keeping the no-library container honest about other formats.
   */
  private[graft] def parseBmp(bytes: Array[Byte]): Option[BmpImage] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val off = le32(bytes, 10)
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val comp = le32(bytes, 30)
    // header fields are UNTRUSTED: Int.MinValue survives abs(), and wide
    // widths wrap int products — all geometry runs in long (strideOf) and
    // anything out of bounds returns None instead of crashing the task
    if (bpp != 24 || comp != 0 || w <= 0 || hRaw == 0 || hRaw == Int.MinValue || off < 54) return None
    val h = math.abs(hRaw)
    val stride = strideOf(w)
    if (off.toLong + stride * h > bytes.length) return None
    Some(new BmpImage(bytes, w, h, off, stride.toInt, bottomUp = hRaw > 0))
  }

  /** REAL per-channel pixel means over a decoded BMP:
    * `(width, height, mean_r, mean_g, mean_b)`, integer floor division. */
  private[graft] def bmpChannelMeans(img: BmpImage): (Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixel(x, y)
        sr += r; sg += g; sb += b
        x += 1
      }
      y += 1
    }
    val n = img.width.toLong * img.height
    (img.width.toLong, img.height.toLong, sr / n, sg / n, sb / n)
  }

  private[graft] def gifChannelMeans(img: Gif.GifImage): (Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixel(x, y)
        sr += r; sg += g; sb += b
        x += 1
      }
      y += 1
    }
    val n = img.width.toLong * img.height
    (img.width.toLong, img.height.toLong, sr / n, sg / n, sb / n)
  }

  /** A fully-parsed 16-bit PCM WAV: sample access decodes the little-endian
    * interleaved data chunk. */
  private[graft] final class WavAudio(bytes: Array[Byte], val sampleRate: Int, val channels: Int,
      val nSamples: Int, dataOffset: Int) {
    /** i-th interleaved sample, sign-extended 16-bit. */
    def sample(i: Int): Int = {
      val p = dataOffset + i * 2
      ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort.toInt
    }
  }

  /**
   * REAL MONO 16-bit PCM WAV parse — like BMP, the format needs no codec: RIFF chunks
   * are (4-byte id, little-endian u32 size, payload) walked in order with
   * word alignment; `fmt ` carries format/channels/rate/bits at fixed
   * offsets and `data` holds raw interleaved 16-bit samples. Returns None
   * for anything that is not an in-bounds 16-bit PCM WAV (compressed or
   * float WAVs fall to the generic-blob path).
   */
  private[graft] def parseWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    var pos = 12
    var sr = 0; var ch = 0; var fmtOk = false
    while (pos + 8 <= bytes.length) {
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos + 8 + size.toLong > bytes.length) return None
      if (bytes(pos) == 'f' && bytes(pos + 1) == 'm' && bytes(pos + 2) == 't' && bytes(pos + 3) == ' ') {
        if (size < 16) return None
        val audioFormat = le16(bytes, pos + 8)
        ch = le16(bytes, pos + 10)
        sr = le32(bytes, pos + 12)
        val bits = le16(bytes, pos + 22)
        // MONO only: with interleaved multi-channel data, a raw sample
        // count would double-count frames (duration = n/rate would be 2x
        // off for stereo) and the stats would silently mix channels —
        // reject rather than misreport; a stereo path would de-interleave
        fmtOk = audioFormat == 1 && bits == 16 && ch == 1 && sr > 0
      } else if (bytes(pos) == 'd' && bytes(pos + 1) == 'a' && bytes(pos + 2) == 't' && bytes(pos + 3) == 'a') {
        return if (fmtOk) Some(new WavAudio(bytes, sr, ch, size / 2, pos + 8)) else None
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** REAL PCM stats over every 16-bit sample:
    * `(sample_rate, n_samples, peak, mean_abs)` — integer floor mean. */
  private[graft] def wavStats(w: WavAudio): (Long, Long, Long, Long) = {
    var peak = 0L; var sumAbs = 0L
    var i = 0
    while (i < w.nSamples) {
      val a = math.abs(w.sample(i).toLong)
      if (a > peak) peak = a
      sumAbs += a
      i += 1
    }
    (w.sampleRate.toLong, w.nSamples.toLong, peak,
      if (w.nSamples == 0) 0L else sumAbs / w.nSamples)
  }

  /**
   * Deterministic synthetic 16-bit mono PCM WAV whose samples are the
   * closed form `s(i) = (i*37 + seed) % 2048 - 1024` — spec-valid RIFF
   * headers, decodable by any real WAV reader; doubles as the decode-test
   * fixture and the q148 oracle's closed form.
   */
  def syntheticWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0, s"bad WAV shape: rate=$sampleRate n=$nSamples")
    val dataSize = nSamples * 2
    val bytes = new Array[Byte](44 + dataSize)
    def putAscii(i: Int, s: String): Unit = putAsciiAt(bytes, i, s)
    def putLe16(i: Int, v: Int): Unit = putLe16At(bytes, i, v)
    def putLe32(i: Int, v: Int): Unit = putLe32At(bytes, i, v)
    putAscii(0, "RIFF"); putLe32(4, 36 + dataSize); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1); putLe16(22, 1)
    putLe32(24, sampleRate); putLe32(28, sampleRate * 2); putLe16(32, 2); putLe16(34, 16)
    putAscii(36, "data"); putLe32(40, dataSize)
    var i = 0
    while (i < nSamples) {
      putLe16(44 + i * 2, (((i * 37 + seed) % 2048) - 1024).toInt & 0xffff)
      i += 1
    }
    bytes
  }

  /**
   * REAL audio feature extraction over PCM WAV blobs: `(id, sample_rate,
   * n_samples, peak, mean_abs)` from an actual decode of every 16-bit
   * sample. Non-WAV / non-PCM / null blobs are DROPPED (route them through
   * the generic byte-feature path instead).
   */
  def audioStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          parseWav(bytes).map { w =>
            val (sr, n, peak, meanAbs) = wavStats(w)
            (id, sr, n, peak, meanAbs)
          }
        }
      }
      .toDF(idCol, "sample_rate", "n_samples", "peak", "mean_abs")
  }

  /**
   * REAL windowed audio feature extraction — the VAD / silence-trim
   * primitive an audio curation pipeline cuts by: each decoded WAV splits
   * into fixed `win`-sample non-overlapping windows (last window partial)
   * and emits per window the floor-mean SQUARED energy and the
   * zero-crossing count (sign flip vs the previous sample WITHIN the
   * window; sample >= 0 counts positive, so the definition is total and
   * engine-replayable in pure integer math). One narrow typed pass per
   * blob — the q148 shape with per-window rows instead of one summary row;
   * non-WAV / non-PCM / null blobs are dropped.
   *
   * Returns (idCol, win_idx, n_in_win, energy, zero_crossings) with
   * energy = floor(sum(s_i^2) / n_in_win) — exact integer division, so
   * oracle comparison is bit-stable.
   */
  def audioWindowProfile(df: DataFrame, idCol: String, binCol: String,
      win: Int = 32): DataFrame = {
    require(win > 0, s"window must be positive, got $win")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          parseWav(bytes).iterator.flatMap { w =>
            (0 until w.nSamples by win).iterator.map { start =>
              val end = math.min(start + win, w.nSamples)
              var sumSq = 0L; var zc = 0L
              var i = start
              var prev = 0
              while (i < end) {
                val s = w.sample(i)
                sumSq += s.toLong * s
                if (i > start && ((s >= 0) != (prev >= 0))) zc += 1
                prev = s
                i += 1
              }
              val n = (end - start).toLong
              (id, (start / win).toLong, n, sumSq / n, zc)
            }
          }
        }
      }
      .toDF(idCol, "win_idx", "n_in_win", "energy", "zero_crossings")
  }

  /**
   * In-place iterative radix-2 Cooley-Tukey FFT (decimation in time,
   * bit-reversal reorder, per-stage twiddle recurrence). StrictMath
   * twiddles so the spectrum — and thus every peak argmax below — is
   * bit-identical across JVMs/platforms (Math.sin/cos are allowed
   * platform variance; StrictMath is not).
   */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * StrictMath.PI / len
      val wr = StrictMath.cos(ang); val wi = StrictMath.sin(ang)
      var s = 0
      while (s < n) {
        var cr = 1.0; var ci = 0.0
        val half = len >> 1
        var k = 0
        while (k < half) {
          val er = re(s + k); val ei = im(s + k)
          val xr = re(s + k + half); val xi = im(s + k + half)
          val or_ = xr * cr - xi * ci
          val oi = xr * ci + xi * cr
          re(s + k) = er + or_; im(s + k) = ei + oi
          re(s + k + half) = er - or_; im(s + k + half) = ei - oi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** Dominant spectral bin of samples[start, start+win): argmax of
    * |FFT|² over bins 1..win/2-1 — DC (bin 0, where any constant offset
    * lands) and Nyquist excluded; exact-tie breaks to the LOWEST bin, so
    * the landmark is total and deterministic. */
  private def peakBin(w: WavAudio, start: Int, win: Int): Int = {
    val re = new Array[Double](win); val im = new Array[Double](win)
    var i = 0
    while (i < win) { re(i) = w.sample(start + i).toDouble; i += 1 }
    fft(re, im)
    var best = 1; var bestMag = re(1) * re(1) + im(1) * im(1)
    var b = 2
    while (b < win / 2) {
      val m = re(b) * re(b) + im(b) * im(b)
      if (m > bestMag) { bestMag = m; best = b }
      b += 1
    }
    best
  }

  /**
   * REAL audio spectral landmarks — the per-window dominant-frequency
   * peaks a Shazam-style fingerprint keys on (Wang 2003's constellation,
   * reduced to the strongest landmark per window): each decoded WAV
   * splits into non-overlapping `win`-sample windows (power of 2;
   * partial tails are DROPPED — a truncated window's spectrum is not
   * comparable) and emits the dominant FFT bin per window. Rectangular
   * window, bins 1..win/2-1 (excluding DC makes constant offsets
   * invisible; argmax over a scaled spectrum is unchanged, so the
   * landmark is loudness-invariant — the two invariances audio dedup
   * needs). One narrow typed pass per blob, O(win log win) per window;
   * non-WAV / non-PCM / null blobs are dropped.
   */
  def audioSpectralPeaks(df: DataFrame, idCol: String, binCol: String,
      win: Int = 256): DataFrame = {
    require(win >= 8 && (win & (win - 1)) == 0, s"win must be a power of 2 >= 8, got $win")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          parseWav(bytes).iterator.flatMap { w =>
            (0 to w.nSamples - win by win).iterator.map { start =>
              (id, (start / win).toLong, peakBin(w, start, win).toLong)
            }
          }
        }
      }
      .toDF(idCol, "win_idx", "peak_bin")
  }

  /**
   * Content-based audio fingerprint: the FNV-1a-64 fold of the
   * [[audioSpectralPeaks]] landmark sequence, computed in the SAME
   * narrow pass (no exchange — the per-doc fold never leaves the task).
   * Same audio at a different volume or DC offset fingerprints
   * IDENTICALLY (argmax/DC invariance above); different dominant
   * frequencies anywhere diverge. Join fingerprints to dedup — the audio
   * analog of the q192 image phash — or feed them to
   * `Dedup.hammingPairs`-style banding via the landmark rows themselves.
   * Returns (idCol, n_windows, fingerprint); docs without one full
   * window are dropped.
   */
  def audioFingerprint(df: DataFrame, idCol: String, binCol: String,
      win: Int = 256): DataFrame = {
    require(win >= 8 && (win & (win - 1)) == 0, s"win must be a power of 2 >= 8, got $win")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          parseWav(bytes).iterator.flatMap { w =>
            val nWins = w.nSamples / win
            if (nWins == 0) Iterator.empty
            else {
              var h = -3750763034362895579L // FNV-1a 64 offset basis
              var wi = 0
              while (wi < nWins) {
                h = (h ^ peakBin(w, wi * win, win)) * 1099511628211L
                wi += 1
              }
              Iterator.single((id, nWins.toLong, h))
            }
          }
        }
      }
      .toDF(idCol, "n_windows", "fingerprint")
  }

  /**
   * Deterministic tone-sequence WAV: window w of `bins.length` holds a
   * pure sinusoid at FFT bin `bins(w)` (window-aligned phase, so the
   * spectrum of each `win`-sample window concentrates at its planted
   * bin), quantized to 16-bit at `amp` around `offset`. The
   * [[audioSpectralPeaks]] fixture and the q223/q224 oracle closed form.
   */
  def syntheticToneWav(sampleRate: Int, win: Int, bins: Array[Int],
      amp: Double, offset: Int): Array[Byte] = {
    require(win >= 8 && (win & (win - 1)) == 0, s"win must be a power of 2 >= 8, got $win")
    require(bins.forall(b => b >= 1 && b < win / 2), "tone bins must lie in 1..win/2-1")
    require(amp > 0 && amp + math.abs(offset) < 32767, s"bad tone shape: amp=$amp offset=$offset")
    val n = win * bins.length
    val dataSize = n * 2
    val bytes = new Array[Byte](44 + dataSize)
    putAsciiAt(bytes, 0, "RIFF"); putLe32At(bytes, 4, 36 + dataSize); putAsciiAt(bytes, 8, "WAVE")
    putAsciiAt(bytes, 12, "fmt "); putLe32At(bytes, 16, 16); putLe16At(bytes, 20, 1); putLe16At(bytes, 22, 1)
    putLe32At(bytes, 24, sampleRate); putLe32At(bytes, 28, sampleRate * 2); putLe16At(bytes, 32, 2); putLe16At(bytes, 34, 16)
    putAsciiAt(bytes, 36, "data"); putLe32At(bytes, 40, dataSize)
    var i = 0
    while (i < n) {
      val w = i / win; val t = i - w * win
      val s = offset + StrictMath.round(
        amp * StrictMath.sin(2.0 * StrictMath.PI * bins(w) * t / win)).toInt
      putLe16At(bytes, 44 + i * 2, s & 0xffff)
      i += 1
    }
    bytes
  }

  /** A parsed AVI: per-frame access over the `movi` list. Frames are
    * either raw bottom-up padded BGR DIBs ('00db') or baseline JPEGs
    * ('00dc' MJPEG — each chunk IS a standalone JPEG file, decoded
    * through the real [[Jpeg]] codec on demand). */
  private[graft] final class AviVideo(bytes: Array[Byte], val width: Int, val height: Int,
      frameOffsets: Array[Int], frameSizes: Array[Int], jpegFlags: Array[Boolean]) {
    val nFrames: Int = frameOffsets.length
    private val stride = width * 3 + ((4 - (width * 3) % 4) % 4)
    def isJpeg(f: Int): Boolean = jpegFlags(f)
    /** (r, g, b) at image coords (x, y) of DIB frame f (top-left origin). */
    def pixel(f: Int, x: Int, y: Int): (Int, Int, Int) = {
      require(!jpegFlags(f), s"frame $f is MJPEG — decode via jpegImage")
      val i = frameOffsets(f) + (height - 1 - y) * stride + x * 3
      ((bytes(i + 2) & 0xff), (bytes(i + 1) & 0xff), (bytes(i) & 0xff))
    }
    /** The decoded JPEG of an MJPEG frame; None if the frame's entropy
      * stream is corrupt (callers drop it like any undecodable image). */
    def jpegImage(f: Int): Option[Jpeg.JpegImage] = {
      require(jpegFlags(f), s"frame $f is a raw DIB — read via pixel")
      Jpeg.decode(java.util.Arrays.copyOfRange(
        bytes, frameOffsets(f), frameOffsets(f) + frameSizes(f)))
    }
  }

  /**
   * REAL frame extraction from an AVI — the video analog of [[parseBmp]]:
   * RIFF('AVI ') → LIST('hdrl') → 'avih' (width/height at payload offsets
   * 32/36) → LIST('movi') → one chunk per frame. Two honestly-decodable
   * stream kinds: '00db' raw uncompressed DIBs (BMP-style bottom-up
   * padded BGR rows), and '00dc' MJPEG — each compressed chunk is a
   * complete baseline JPEG (SOI signature checked), decoded through the
   * real [[Jpeg]] codec. Any '00dc' chunk that is NOT a JPEG (another
   * codec's bitstream) still returns None: no codec here can decode it,
   * same honesty rule as compressed images.
   */
  private[graft] def parseAvi(bytes: Array[Byte]): Option[AviVideo] = {
    def fourcc(i: Int, s: String): Boolean =
      i + 4 <= bytes.length && (0 until 4).forall(j => bytes(i + j) == s.charAt(j).toByte)
    if (bytes.length < 24 || !fourcc(0, "RIFF") || !fourcc(8, "AVI ")) return None
    var w = 0; var h = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Boolean)]
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos + 8 + size.toLong > bytes.length) return None
      if (fourcc(pos, "LIST") && size >= 4) {
        if (fourcc(pos + 8, "hdrl")) {
          // scan the list body for the avih header chunk; sizes are
          // UNTRUSTED — bounds math in long so a huge csz can't wrap p
          var p = pos + 12
          val end = pos + 8 + size
          while (p + 8 <= end && !(w > 0)) {
            val csz = le32(bytes, p + 4)
            if (csz < 0 || p.toLong + 8 + csz > end) return None
            if (fourcc(p, "avih") && csz >= 40) {
              w = le32(bytes, p + 8 + 32)
              h = le32(bytes, p + 8 + 36)
            }
            p += 8 + csz + (csz & 1)
          }
        } else if (fourcc(pos + 8, "movi")) {
          if (w <= 0 || h <= 0) return None // header must precede movi
          val stride = strideOf(w) // long: wide widths must not wrap
          var p = pos + 12
          val end = pos + 8 + size
          while (p + 8 <= end) {
            val csz = le32(bytes, p + 4)
            if (csz < 0 || p.toLong + 8 + csz > end) return None
            if (fourcc(p, "00db")) {
              if (csz.toLong != stride * h) return None // frame size must match dims
              frames += ((p + 8, csz, false))
            } else if (fourcc(p, "00dc")) {
              // MJPEG: the chunk must BE a JPEG (SOI signature); any other
              // codec's bitstream is undecodable here — reject the container
              if (csz < 2 || bytes(p + 8) != 0xff.toByte || bytes(p + 9) != 0xd8.toByte)
                return None
              frames += ((p + 8, csz, true))
            }
            p += 8 + csz + (csz & 1)
          }
        }
      }
      pos += 8 + size + (size & 1)
    }
    if (w > 0 && h > 0 && frames.nonEmpty)
      Some(new AviVideo(bytes, w, h,
        frames.map(_._1).toArray, frames.map(_._2).toArray, frames.map(_._3).toArray))
    else None
  }

  /**
   * Deterministic synthetic uncompressed-DIB AVI (the [[parseAvi]] subset):
   * frame f's pixels follow `r=(x+y+f)%256, g=(y+seed+f)%256,
   * b=(x+seed+f)%256` — the q149 oracle's closed form.
   */
  def syntheticAvi(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad AVI shape: ${w}x$h x$nFrames")
    val stride = w * 3 + ((4 - (w * 3) % 4) % 4)
    val frameBytes = stride * h
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val hdrlSize = 4 + 8 + 56
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val bytes = new Array[Byte](total)
    def putAscii(i: Int, s: String): Unit = putAsciiAt(bytes, i, s)
    def putLe16(i: Int, v: Int): Unit = putLe16At(bytes, i, v)
    def putLe32(i: Int, v: Int): Unit = putLe32At(bytes, i, v)
    putAscii(0, "RIFF"); putLe32(4, total - 8); putAscii(8, "AVI ")
    var pos = 12
    putAscii(pos, "LIST"); putLe32(pos + 4, hdrlSize); putAscii(pos + 8, "hdrl")
    putAscii(pos + 12, "avih"); putLe32(pos + 16, 56)
    val avih = pos + 20
    putLe32(avih + 16, nFrames); putLe32(avih + 32, w); putLe32(avih + 36, h)
    pos += 8 + hdrlSize
    putAscii(pos, "LIST"); putLe32(pos + 4, moviSize); putAscii(pos + 8, "movi")
    var fp = pos + 12
    var f = 0
    while (f < nFrames) {
      putAscii(fp, "00db"); putLe32(fp + 4, frameBytes)
      var i = fp + 8
      var y = h - 1
      while (y >= 0) {
        var x = 0
        while (x < w) {
          bytes(i) = (((x + seed + f) % 256).toInt & 0xff).toByte     // blue
          bytes(i + 1) = (((y + seed + f) % 256).toInt & 0xff).toByte // green
          bytes(i + 2) = (((x + y + f) % 256) & 0xff).toByte          // red
          i += 3; x += 1
        }
        i += stride - w * 3
        y -= 1
      }
      fp += 8 + frameBytes
      f += 1
    }
    bytes
  }

  /**
   * Deterministic synthetic MJPEG AVI: same RIFF skeleton as
   * [[syntheticAvi]] but each frame is a '00dc' chunk whose payload is a
   * complete [[syntheticJpegImage]] (frame f's seed = `seed + f`, so the
   * q164 closed form holds per frame with s = (seed + f) mod 256). Odd
   * JPEG sizes get the RIFF pad byte.
   */
  def syntheticMjpegAvi(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    val jpegs = (0 until nFrames).map(f => syntheticJpegImage(w, h, seed + f))
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val hdrlSize = 4 + 8 + 56
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val bytes = new Array[Byte](total)
    putAsciiAt(bytes, 0, "RIFF"); putLe32At(bytes, 4, total - 8); putAsciiAt(bytes, 8, "AVI ")
    var pos = 12
    putAsciiAt(bytes, pos, "LIST"); putLe32At(bytes, pos + 4, hdrlSize)
    putAsciiAt(bytes, pos + 8, "hdrl")
    putAsciiAt(bytes, pos + 12, "avih"); putLe32At(bytes, pos + 16, 56)
    val avih = pos + 20
    putLe32At(bytes, avih + 16, nFrames)
    putLe32At(bytes, avih + 32, w); putLe32At(bytes, avih + 36, h)
    pos += 8 + hdrlSize
    putAsciiAt(bytes, pos, "LIST"); putLe32At(bytes, pos + 4, moviSize)
    putAsciiAt(bytes, pos + 8, "movi")
    var fp = pos + 12
    jpegs.foreach { j =>
      putAsciiAt(bytes, fp, "00dc"); putLe32At(bytes, fp + 4, j.length)
      System.arraycopy(j, 0, bytes, fp + 8, j.length)
      fp += 8 + j.length + (j.length & 1)
    }
    bytes
  }

  /**
   * REAL per-frame video features over AVI blobs:
   * `(id, frame_idx, width, height, mean_r, mean_g, mean_b)` — one row per
   * decoded frame, every pixel visited. The 1-to-N explode shape of real
   * video frame extraction, with the decode REAL for both honest codecs:
   * raw-DIB frames read directly, MJPEG frames through the [[Jpeg]]
   * decoder (dims from the DECODED frame — an MJPEG stream's frames own
   * their dimensions). Non-AVI / unknown-codec / null blobs are dropped;
   * a corrupt MJPEG frame drops that frame only.
   */
  def videoFrameMeans(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          parseAvi(bytes).iterator.flatMap { v =>
            (0 until v.nFrames).iterator.flatMap { f =>
              if (v.isJpeg(f))
                v.jpegImage(f).iterator.map { img =>
                  val (w, h, mr, mg, mb) = jpegChannelMeans(img)
                  (id, f.toLong, w, h, mr, mg, mb)
                }
              else {
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < v.height) {
                  var x = 0
                  while (x < v.width) {
                    val (r, g, b) = v.pixel(f, x, y)
                    sr += r; sg += g; sb += b
                    x += 1
                  }
                  y += 1
                }
                val n = v.width.toLong * v.height
                Iterator.single(
                  (id, f.toLong, v.width.toLong, v.height.toLong, sr / n, sg / n, sb / n))
              }
            }
          }
        }
      }
      .toDF(idCol, "frame_idx", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** Deterministic placeholder dims derived from blob length, reached
    * ONLY for containers [[decodeDims]] cannot header-parse (wav/generic
    * riff/unknown — i.e. non-image blobs; PNG, JPEG, BMP, GIF and WebP
    * all real-parse). A real plugin would hand `bytes` to its codec. */
  private[multimodal] def fakeDecode(bytes: Array[Byte]): (Long, Long) =
    (bytes.length.toLong % 64, bytes.length.toLong % 48)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be16(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 8) | (b(i + 1) & 0xffL)

  /**
   * REAL dimension extraction — pure byte math, no decoder library:
   *
   *  - PNG: the spec mandates IHDR as the first chunk, at a fixed offset —
   *    width/height are the two big-endian u32s at bytes 16 and 20
   *    (8-byte signature, 4-byte length, 4-byte "IHDR" type).
   *  - JPEG: walk the marker segments from SOI until a start-of-frame
   *    marker (0xC0–0xCF minus DHT 0xC4, JPG 0xC8, DAC 0xCC); height and
   *    width are the big-endian u16s at segment offsets +5 and +7.
   *    Standalone markers (RSTn, SOI, EOI, TEM) carry no length field and
   *    are stepped over; scanning stops at SOS (0xDA — past the headers,
   *    entropy-coded data follows) or any malformed length.
   *
   * Returns None when the blob is not a parseable PNG/JPEG — callers fall
   * back to [[fakeDecode]], keeping the no-library container honest.
   */
  private[multimodal] def decodeDims(bytes: Array[Byte]): Option[(Long, Long)] =
    sniffKind(bytes) match {
      case "png" =>
        if (bytes.length >= 24 &&
          bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
          Some((be32(bytes, 16), be32(bytes, 20)))
        else None
      case "jpeg" =>
        var pos = 2
        while (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
          val marker = bytes(pos + 1) & 0xff
          if (marker == 0xff) {
            // spec-legal 0xFF fill bytes may pad before any marker; the
            // marker byte is the first non-0xFF after the run — treating a
            // fill byte as a marker would consume a bogus length field
            pos += 1
          } else if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            return if (pos + 8 < bytes.length) Some((be16(bytes, pos + 7), be16(bytes, pos + 5)))
            else None
          } else if (marker == 0xd8 || marker == 0xd9 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
            pos += 2 // standalone marker, no length field
          } else if (marker == 0xda || pos + 3 >= bytes.length) {
            return None // entropy-coded data from here; no SOF seen
          } else {
            val segLen = be16(bytes, pos + 2).toInt
            if (segLen < 2) return None
            pos += 2 + segLen
          }
        }
        None
      case "bmp" => parseBmp(bytes).map(img => (img.width.toLong, img.height.toLong))
      case "gif" => Gif.dims(bytes)
      case "webp" => Webp.dims(bytes)
      case _ => None
    }

  /**
   * Deterministic synthetic 24bpp bottom-up BMP with pixel channels that
   * are pure functions of position and `seed`:
   * `r = (x + y) % 256`, `g = (y + seed) % 256`, `b = (x + seed) % 256`
   * (image coordinates, origin top-left). Spec-valid file + info headers,
   * 4-byte row padding — any real BMP reader decodes it; doubles as the
   * decode-test fixture and the q146/q147 oracle's closed form.
   */
  def syntheticBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"dimensions must be positive, got ${w}x$h")
    // rowBytes = w*3 must not wrap Int before the array allocation
    require(strideOf(w) * h + 54 <= Int.MaxValue,
      s"${w}x$h exceeds the 2 GiB single-array BMP envelope")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val imgSize = (rowBytes + pad) * h
    val bytes = new Array[Byte](54 + imgSize)
    def putLe16(i: Int, v: Int): Unit = putLe16At(bytes, i, v)
    def putLe32(i: Int, v: Int): Unit = putLe32At(bytes, i, v)
    bytes(0) = 'B'; bytes(1) = 'M'
    putLe32(2, bytes.length); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, w); putLe32(22, h)
    putLe16(26, 1); putLe16(28, 24); putLe32(30, 0); putLe32(34, imgSize)
    var i = 54
    var y = h - 1 // bottom-up storage: last image row first
    while (y >= 0) {
      var x = 0
      while (x < w) {
        bytes(i) = (((x + seed) % 256).toInt & 0xff).toByte     // blue
        bytes(i + 1) = (((y + seed) % 256).toInt & 0xff).toByte // green
        bytes(i + 2) = (((x + y) % 256) & 0xff).toByte          // red
        i += 3; x += 1
      }
      i += pad
      y -= 1
    }
    bytes
  }

  /** Encode pixels (image coords, top-left origin) as a bottom-up 24bpp BMP. */
  private def encodeBmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val out = syntheticBmp(w, h, 0L) // header template, pixels overwritten below
    var i = 54
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        out(i) = (b & 0xff).toByte; out(i + 1) = (g & 0xff).toByte; out(i + 2) = (r & 0xff).toByte
        i += 3; x += 1
      }
      i += pad
      y -= 1
    }
    out
  }

  /** REAL nearest-neighbor BMP resize: decode 24bpp pixels, sample source
    * pixel `(dx*srcW div dstW, dy*srcH div dstH)` per destination pixel,
    * re-encode as a spec-valid BMP. None when the blob isn't a parseable
    * uncompressed 24bpp BMP. */
  private[graft] def resizeBmp(bytes: Array[Byte], dw: Int, dh: Int): Option[Array[Byte]] =
    parseBmp(bytes).map { img =>
      encodeBmp(dw, dh, (dx, dy) =>
        img.pixel((dx.toLong * img.width / dw).toInt, (dy.toLong * img.height / dh).toInt))
    }

  /**
   * Deterministic synthetic PNG: real 8-byte signature + a spec-valid IHDR
   * chunk (8-bit RGB, correct CRC32) with the given dimensions, payload
   * bytes appended as the body. [[decodeDims]] — or any real PNG header
   * reader — parses back exactly (w, h); doubles as the fixture generator
   * for decode tests and the q30 oracle.
   */
  def syntheticPng(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"dimensions must be positive, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(33 + payload.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val chunk = new Array[Byte](17) // "IHDR" + 13 data bytes
    chunk(0) = 'I'; chunk(1) = 'H'; chunk(2) = 'D'; chunk(3) = 'R'
    def putBe32(a: Array[Byte], i: Int, v: Long): Unit = {
      a(i) = ((v >> 24) & 0xff).toByte; a(i + 1) = ((v >> 16) & 0xff).toByte
      a(i + 2) = ((v >> 8) & 0xff).toByte; a(i + 3) = (v & 0xff).toByte
    }
    putBe32(chunk, 4, w.toLong); putBe32(chunk, 8, h.toLong)
    chunk(12) = 8; chunk(13) = 2; chunk(14) = 0; chunk(15) = 0; chunk(16) = 0
    val lenAndCrc = new Array[Byte](4)
    putBe32(lenAndCrc, 0, 13L); out.write(lenAndCrc, 0, 4)
    out.write(chunk, 0, 17)
    val crc = new java.util.zip.CRC32
    crc.update(chunk, 0, 17)
    putBe32(lenAndCrc, 0, crc.getValue); out.write(lenAndCrc, 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /**
   * Deterministic synthetic PNG IMAGE — a fully-decodable file, not just a
   * header fixture: 8-bit RGB (color type 2), non-interlaced, scanlines
   * zlib-compressed into IDAT with the per-row filter type cycling y % 5 —
   * every spec filter (None/Sub/Up/Average/Paeth) appears, so a decoder
   * that mishandles any of them fails loudly on this fixture. Pixels share
   * the BMP fixture's closed form (`r = (x+y)%256, g = (y+seed)%256,
   * b = (x+seed)%256`), so the same oracle arithmetic covers both formats.
   */
  def syntheticPngImage(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"dimensions must be positive, got ${w}x$h")
    def px(x: Int, y: Int): (Int, Int, Int) =
      (((x + y) % 256), ((y + seed) % 256).toInt, ((x + seed) % 256).toInt)
    encodePng(w, h, px)
  }

  /** Encode pixels (image coords, top-left origin) as a spec-valid 8-bit
    * RGB PNG, cycling the row filter type y % 5 (encode applies the
    * filter; [[parsePng]] must invert it). */
  private def encodePng(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require((w.toLong * 3 + 1) * h <= Int.MaxValue,
      s"${w}x$h exceeds the 2 GiB single-array PNG envelope")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride) // zeros above row 0, per spec
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        cur(x * 3) = r & 0xff; cur(x * 3 + 1) = g & 0xff; cur(x * 3 + 2) = b & 0xff
        x += 1
      }
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0 // left
        val bUp = prev(i)                          // up
        val c = if (i >= bpp) prev(i - bpp) else 0 // upper-left
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => bUp
          case 3 => (a + bUp) / 2
          case 4 => paeth(a, bUp, c)
        }
        raw(y * (stride + 1) + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(64 + zbuf.size())
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def writeChunk(ctype: String, data: Array[Byte]): Unit = {
      val be = new Array[Byte](4)
      def putBe32(v: Long): Unit = {
        be(0) = ((v >> 24) & 0xff).toByte; be(1) = ((v >> 16) & 0xff).toByte
        be(2) = ((v >> 8) & 0xff).toByte; be(3) = (v & 0xff).toByte
      }
      putBe32(data.length.toLong); out.write(be, 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tb, 0, 4); crc.update(data, 0, data.length)
      putBe32(crc.getValue); out.write(be, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
    ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
    ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk("IHDR", ihdr)
    writeChunk("IDAT", zbuf.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** A fully-decoded 8-bit RGB/RGBA PNG: pixel access in image coords. */
  private[graft] final class PngImage(px: Array[Byte], val width: Int, val height: Int,
      bpp: Int) {
    /** (r, g, b) of the pixel at (x, y); alpha (if present) is ignored. */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * width + x) * bpp
      ((px(i) & 0xff), (px(i + 1) & 0xff), (px(i + 2) & 0xff))
    }
  }

  /**
   * REAL PNG pixel decode with ONLY the JDK: chunk walk (CRC32-verified),
   * IDAT concatenation, `java.util.zip.Inflater` (PNG's compression IS
   * zlib — the JDK ships the codec), and full scanline UNFILTERING for
   * all five spec filter types (None/Sub/Up/Average/Paeth). Supports the
   * dominant interchange shape: bit depth 8, color type 2 (RGB) or 6
   * (RGBA), non-interlaced. Anything else — or any malformed/corrupt
   * chunk — returns None (the caller's signal to route the blob through
   * the stubbed path, same honesty rule as [[parseBmp]]).
   */
  private[graft] def parsePng(bytes: Array[Byte]): Option[PngImage] = {
    if (sniffKind(bytes) != "png" || bytes.length < 45) return None
    var pos = 8
    var w = 0; var h = 0; var colorType = -1; var ok = true
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (ok && !sawEnd && pos + 12 <= bytes.length) {
      val len = be32(bytes, pos).toInt
      if (len < 0 || pos + 12 + len > bytes.length) { ok = false }
      else {
        val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, pos + 4, 4 + len)
        if (crc.getValue != be32(bytes, pos + 8 + len)) { ok = false }
        else {
          ctype match {
            case "IHDR" =>
              if (len != 13) ok = false
              else {
                w = be32(bytes, pos + 8).toInt; h = be32(bytes, pos + 12).toInt
                val bitDepth = bytes(pos + 16) & 0xff
                colorType = bytes(pos + 17) & 0xff
                val interlace = bytes(pos + 20) & 0xff
                if (bitDepth != 8 || (colorType != 2 && colorType != 6) ||
                  interlace != 0 || w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) ok = false
              }
            case "IDAT" => idat.write(bytes, pos + 8, len)
            case "IEND" => sawEnd = true
            case _ => // ancillary chunk: skip
          }
          pos += 12 + len
        }
      }
    }
    if (!ok || !sawEnd || colorType < 0 || idat.size() == 0) return None
    val bpp = if (colorType == 2) 3 else 4
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) { inf.end(); return None } // truncated
        off += n
      }
      inf.end()
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    // unfilter in place into the pixel buffer
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val v = raw(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= bpp) px(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) px((y - 1) * stride + i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        px(y * stride + i) = ((v + pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(new PngImage(px, w, h, bpp))
  }

  /** Integer-floor channel means over every pixel of a decoded PNG. */
  private[graft] def pngChannelMeans(img: PngImage): (Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixel(x, y)
        sr += r; sg += g; sb += b
        x += 1
      }
      y += 1
    }
    val n = img.width.toLong * img.height
    (img.width.toLong, img.height.toLong, sr / n, sg / n, sb / n)
  }

  /** REAL nearest-neighbor PNG resize: decode, sample, re-encode a
    * spec-valid 8-bit RGB PNG. None when the blob isn't a decodable PNG. */
  private[graft] def resizePng(bytes: Array[Byte], dw: Int, dh: Int): Option[Array[Byte]] =
    parsePng(bytes).map { img =>
      encodePng(dw, dh, (dx, dy) =>
        img.pixel((dx.toLong * img.width / dw).toInt, (dy.toLong * img.height / dh).toInt))
    }

  /**
   * Deterministic synthetic baseline JPEG IMAGE — a fully-decodable file
   * through the real [[Jpeg]] codec, the JPEG analog of
   * [[syntheticPngImage]]. The closed form lives in YCbCr space and is
   * CONSTANT within each 8x8 block (chroma: within each 16x16 MCU), the
   * [[Jpeg]] exactness envelope — so decode reproduces every YCbCr
   * sample bit-for-bit and the decoded RGB is the pure integer function
   * `yccToRgb(yv, cb, cr)` of the block coordinates, replayable in SQL:
   *
   *   yv(bx, by) = (bx*7 + by*3 + seed) mod 256       (8x8 luma block)
   *   cb(mx, my) = (mx*11 + my*5 + seed) mod 256      (16x16 MCU)
   *   cr(mx, my) = (mx*3 + my*7 + 2*seed) mod 256
   *
   * Even seeds encode 4:4:4, odd seeds 4:2:0 — both sampling layouts of
   * the decoder get fixture coverage. Dimensions should be multiples of
   * 16 so no edge-replicated partial blocks blur the closed form.
   */
  def syntheticJpegImage(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      s"fixture dims must be positive multiples of 16, got ${w}x$h")
    val s = math.floorMod(seed, 256).toInt
    Jpeg.encodeYcc(w, h,
      (x, y) => ((x / 8) * 7 + (y / 8) * 3 + s) % 256,
      (x, y) => ((x / 16) * 11 + (y / 16) * 5 + s) % 256,
      (x, y) => ((x / 16) * 3 + (y / 16) * 7 + 2 * s) % 256,
      subsample = if (s % 2 == 0) 1 else 2)
  }

  /** The [[syntheticJpegImage]] closed form encoded as a PROGRESSIVE
    * (SOF2) stream — same pixels, same exactness envelope, organized as
    * [[Jpeg.encodeYccProgressive]]'s successive-approximation DC + EOB-run
    * AC scan script. Decodes bit-identically to its baseline sibling. */
  def syntheticProgressiveJpegImage(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      s"fixture dims must be positive multiples of 16, got ${w}x$h")
    val s = math.floorMod(seed, 256).toInt
    Jpeg.encodeYccProgressive(w, h,
      (x, y) => ((x / 8) * 7 + (y / 8) * 3 + s) % 256,
      (x, y) => ((x / 16) * 11 + (y / 16) * 5 + s) % 256,
      (x, y) => ((x / 16) * 3 + (y / 16) * 7 + 2 * s) % 256,
      subsample = if (s % 2 == 0) 1 else 2)
  }

  /** Integer-floor RGB channel means over every pixel of a decoded JPEG. */
  private[graft] def jpegChannelMeans(img: Jpeg.JpegImage): (Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixel(x, y)
        sr += r; sg += g; sb += b
        x += 1
      }
      y += 1
    }
    val n = img.width.toLong * img.height
    (img.width.toLong, img.height.toLong, sr / n, sg / n, sb / n)
  }

  /**
   * REAL nearest-neighbor JPEG resize: decode via [[Jpeg.decode]], sample
   * IN YCBCR SPACE (skipping the lossy ycc->rgb->ycc roundtrip a
   * pixel-space resize would pay — and keeping block-constant inputs
   * inside the [[Jpeg]] exactness envelope), re-encode a spec-valid
   * baseline 4:4:4 JPEG. None when the blob isn't a decodable baseline
   * JPEG.
   */
  private[graft] def resizeJpeg(bytes: Array[Byte], dw: Int, dh: Int): Option[Array[Byte]] =
    // JPEG dimensions are u16 (SOF height/width fields): a resize target
    // past 0xffff cannot be represented, so route to the generic fallback
    // instead of letting encodeYcc's require fail the whole query on an
    // executor
    if (dw > 0xffff || dh > 0xffff) None
    else Jpeg.decode(bytes).map { img =>
      def src(dx: Int, dy: Int): (Int, Int, Int) =
        img.ycc((dx.toLong * img.width / dw).toInt, (dy.toLong * img.height / dh).toInt)
      Jpeg.encodeYcc(dw, dh, src(_, _)._1, src(_, _)._2, src(_, _)._3, subsample = 1)
    }

  /**
   * Deterministic synthetic JPEG: SOI + a spec-valid 3-component SOF0
   * segment carrying the dimensions, payload appended. 21 header bytes;
   * see [[syntheticPng]] for the role.
   */
  def syntheticJpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
      s"JPEG dimensions must fit u16, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(21 + payload.length)
    val hdr = Array[Int](
      0xff, 0xd8,             // SOI
      0xff, 0xc0, 0x00, 0x11, // SOF0, length 17
      0x08,                   // precision
      (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff,
      0x03,                   // 3 components
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    out.write(hdr.map(_.toByte), 0, hdr.length)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Byte-level feature: sum of every 16th byte (unsigned) — stands in for
    * real sampled-pixel statistics; forces an actual pass over the blob. */
  private[multimodal] def sampleChecksum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += bytes(i) & 0xff; i += 16 }
    acc
  }

  /**
   * Extract features from (id, blob) rows, batch-at-a-time per partition.
   * Input: DataFrame with `idCol` (long) and `binCol` (binary).
   *
   * A JPEG whose frame class the pixel codec cannot decode (arithmetic,
   * lossless, hierarchical — [[Jpeg.sofClass]]; baseline AND progressive
   * both decode for real) surfaces that class IN THE KIND
   * ("jpeg:arithmetic", ...): the fallback reason rides the metadata, so
   * downstream routing can act on it and an undecodable file can never
   * masquerade as a decodable one. Decodable classes (and JPEGs with no
   * SOF before SOS — header-truncated, already signalled by the
   * dimension fallback) keep the plain "jpeg" kind.
   */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder context would be allocated here (none needed
        // for the header parse; a pixel decoder would be)
        rows.filter(_._2 != null).map { case (id, bytes) =>
          val (w, h) = decodeDims(bytes).getOrElse(fakeDecode(bytes))
          val kind = sniffKind(bytes) match {
            case "jpeg" => Jpeg.sofClass(bytes) match {
              case Some(cls) if cls != "baseline" && cls != "progressive" => s"jpeg:$cls"
              case _ => "jpeg"
            }
            case k => k
          }
          MediaFeatures(id, bytes.length.toLong, kind, w, h, sampleChecksum(bytes))
        }
      }
  }

  /**
   * REAL per-blob pixel statistics for containers the JDK-only parse can
   * fully decode — uncompressed 24bpp BMP ([[parseBmp]]), 8-bit RGB/RGBA
   * non-interlaced PNG ([[parsePng]]: zlib inflate + full unfilter), and
   * baseline-or-progressive JPEG ([[Jpeg.decode]]: Huffman entropy decode +
   * dequantize + IDCT + upsample): `(id, width, height, mean_r, mean_g,
   * mean_b)` with integer-floor channel means over EVERY pixel — actual
   * byte→pixel work, the feature-extraction step of an image curation
   * pipeline. Undecodable blobs are DROPPED (the caller's signal to
   * route them through the generic byte-feature path instead); null
   * blobs likewise.
   */
  def pixelMeans(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          parseBmp(bytes).map(bmpChannelMeans)
            .orElse(parsePng(bytes).map(pngChannelMeans))
            .orElse(Jpeg.decode(bytes).map(jpegChannelMeans))
            .orElse(Gif.decode(bytes).map(gifChannelMeans))
            .orElse(Webp.decode(bytes).map(webpChannelMeans))
            .map { case (w, h, mr, mg, mb) => (id, w, h, mr, mg, mb) }
        }
      }
      .toDF(idCol, "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /**
   * REAL scene-change profiling over decoded video frames — the shot-cut /
   * frame-sampling primitive a video curation pipeline keys on (sample one
   * frame per scene instead of one per second; a pair diff near zero marks
   * a static segment): for each consecutive decodable frame pair (f, f+1)
   * of every AVI, the floor-mean absolute per-channel pixel difference
   * `sum(|r'−r| + |g'−g| + |b'−b|) / (w·h·3)` and its max. Raw-DIB frames
   * read directly; MJPEG frames decode through the real [[Jpeg]] codec;
   * a pair with an undecodable member emits nothing (honesty rule). Pure
   * integer math — engine-replayable.
   *
   * Returns (idCol, pair_idx, mean_abs_diff, max_abs_diff) with pair_idx
   * = f of the earlier frame.
   */
  def frameDiffProfile(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          parseAvi(bytes).iterator.flatMap { v =>
            // decode lazily, carrying only the CURRENT pair's accessors —
            // an eager all-frames decode would hold every MJPEG frame's
            // pixel buffer at once (nFrames * w * h * 3 bytes per video);
            // each frame still decodes exactly once (the pair's right side
            // becomes the next pair's left). Each accessor carries ITS OWN
            // decoded dims: an MJPEG stream's frames own their dimensions
            // (videoFrameMeans' rule) and may disagree with the container's
            // avih header — iterating the header grid over a smaller JPEG
            // would crash the task; over a larger one, silently diff a
            // sub-window. A pair whose members disagree on dims diffs
            // nothing (the undecodable-member honesty rule).
            def accessor(f: Int): Option[(Int, Int, (Int, Int) => (Int, Int, Int))] =
              if (v.isJpeg(f))
                v.jpegImage(f).map(img =>
                  (img.width, img.height, (x: Int, y: Int) => img.pixel(x, y)))
              else Some((v.width, v.height, (x: Int, y: Int) => v.pixel(f, x, y)))
            var carried: Option[(Int, Int, (Int, Int) => (Int, Int, Int))] =
              if (v.nFrames > 0) accessor(0) else None
            (0 until v.nFrames - 1).iterator.flatMap { f =>
              val left = carried
              val right = accessor(f + 1)
              carried = right
              (left, right) match {
                case (Some((w1, h1, a)), Some((w2, h2, b))) if w1 == w2 && h1 == h2 =>
                  var sum = 0L; var maxD = 0L
                  var y = 0
                  while (y < h1) {
                    var x = 0
                    while (x < w1) {
                      val (r1, g1, b1) = a(x, y)
                      val (r2, g2, b2) = b(x, y)
                      val d = math.abs(r2 - r1).toLong + math.abs(g2 - g1) + math.abs(b2 - b1)
                      sum += d
                      if (d > maxD) maxD = d
                      x += 1
                    }
                    y += 1
                  }
                  val n = w1.toLong * h1 * 3L
                  Iterator.single((id, f.toLong, sum / n, maxD))
                case _ => Iterator.empty
              }
            }
          }
        }
      }
      .toDF(idCol, "pair_idx", "mean_abs_diff", "max_abs_diff")
  }

  /**
   * REAL image sharpness scoring — the blur-detection filter an image
   * curation pipeline cuts by (out-of-focus and flat images carry little
   * training signal): integer Laplacian-of-luma over every decodable
   * image's interior pixels. luma = (299r + 587g + 114b) / 1000 (integer
   * floor of the Rec.601 weights), laplacian = 4·L(x,y) − L(x±1,y) −
   * L(x,y±1); emitted per image: interior pixel count, floor-mean |lap|
   * (the sharpness score — higher = more edge energy), and max |lap|.
   * Decodes BMP, PNG, and (baseline or progressive) JPEG through the real codecs; other
   * blobs and images without an interior (w or h < 3) are dropped. Pure
   * integer math end-to-end, so the score is engine-replayable.
   */
  def sharpnessProfile(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          val dec: Option[(Int, Int, (Int, Int) => (Int, Int, Int))] =
            parseBmp(bytes).map(b => (b.width, b.height, b.pixel _))
              .orElse(parsePng(bytes).map(p => (p.width, p.height, p.pixel _)))
              .orElse(Jpeg.decode(bytes).map(j => (j.width, j.height, j.pixel _)))
              .orElse(Webp.decode(bytes).map(i => (i.width, i.height, i.pixel _)))
          dec.filter { case (w, h, _) => w >= 3 && h >= 3 }.map { case (w, h, px) =>
            def luma(x: Int, y: Int): Int = {
              val (r, g, b) = px(x, y)
              (r * 299 + g * 587 + b * 114) / 1000
            }
            var sumAbs = 0L; var maxAbs = 0L
            var y = 1
            while (y < h - 1) {
              var x = 1
              while (x < w - 1) {
                val lap = 4L * luma(x, y) - luma(x - 1, y) - luma(x + 1, y) -
                  luma(x, y - 1) - luma(x, y + 1)
                val a = math.abs(lap)
                sumAbs += a
                if (a > maxAbs) maxAbs = a
                x += 1
              }
              y += 1
            }
            val n = (w - 2).toLong * (h - 2)
            (id, w.toLong, h.toLong, n, sumAbs / n, maxAbs)
          }
        }
      }
      .toDF(idCol, "width", "height", "n_interior", "mean_abs_lap", "max_abs_lap")
  }

  /**
   * PERCEPTUAL image hash (difference hash / dHash) over the REAL decode
   * path — the first-line image-dedup signature: re-encodes, format
   * conversions, and resolution changes of the same picture hash close
   * (identical pixels hash IDENTICAL, so cross-format exact dups group on
   * equality alone), while different pictures differ in many bits. Per
   * image: sample luma on a 9x8 nearest-neighbor grid, set bit y*8+x iff
   * grid luma strictly increases from column x to x+1 — 64 bits of
   * brightness-GRADIENT structure, invariant to uniform brightness shift
   * by construction. All integer math (the sharpnessProfile luma
   * weights), one narrow typed pass, blobs never shuffle. Rows whose blob
   * no codec decodes (or null) emit nothing — a hash from fake bytes
   * would poison the dedup downstream.
   *
   * Returns (idCol, kind, width, height, phash). Compose with
   * [[graft.operators.Dedup.hammingPairs]] for near-dup pairs within a
   * Hamming radius, or group by `phash` for the exact-signature tier.
   */
  def perceptualHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).flatMap { case (id, bytes) =>
          val dec: Option[(String, Int, Int, (Int, Int) => (Int, Int, Int))] =
            parseBmp(bytes).map(b => ("bmp", b.width, b.height, b.pixel _))
              .orElse(parsePng(bytes).map(p => ("png", p.width, p.height, p.pixel _)))
              .orElse(Jpeg.decode(bytes).map(j => ("jpeg", j.width, j.height, j.pixel _)))
              .orElse(Gif.decode(bytes).map(g => ("gif", g.width, g.height, g.pixel _)))
              .orElse(Webp.decode(bytes).map(i => ("webp", i.width, i.height, i.pixel _)))
          dec.map { case (kind, w, h, px) =>
            def luma(x: Int, y: Int): Int = {
              val (r, g, b) = px(x, y)
              (r * 299 + g * 587 + b * 114) / 1000
            }
            // 9x8 nearest-neighbor grid; floor sampling keeps any w/h >= 1 valid
            val grid = Array.tabulate(9, 8)((gx, gy) =>
              luma(math.min(w - 1, gx * w / 9), math.min(h - 1, gy * h / 8)))
            var hash = 0L
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 8) {
                if (grid(gx + 1)(gy) > grid(gx)(gy)) hash |= 1L << (gy * 8 + gx)
                gx += 1
              }
              gy += 1
            }
            (id, kind, w.toLong, h.toLong, hash)
          }
        }
      }
      .toDF(idCol, "kind", "width", "height", "phash")
  }

  /**
   * Resize plumbing: (id, blob) -> (id, kind, resized blob) at a target
   * `w`x`h`. For uncompressed 24bpp BMPs ([[resizeBmp]]), decodable PNGs
   * ([[resizePng]]) AND baseline JPEGs ([[resizeJpeg]]) the transform is
   * REAL: decode pixels, nearest-neighbor sample, re-encode a spec-valid
   * file of the SAME format — GIFs ([[Gif.resizeGif]]) and lossless WebPs
   * ([[Webp.resizeWebp]]) included. Only blobs NO codec here can decode
   * (unknown containers, compressed AVI, progressive JPEG, ...) take the
   * deterministic byte-cycling fallback — a clearly-marked stand-in that
   * preserves the schema, sizes, and partition-batch shape a real
   * decoder plugin would produce. Null blobs pass through as null (a
   * real decoder would skip them too).
   */
  def resize(df: DataFrame, idCol: String, binCol: String, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"resize dimensions must be positive and w*h must fit an Int (got ${w}x$h)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          if (bytes == null) (id, null.asInstanceOf[String], null.asInstanceOf[Array[Byte]])
          else resizeBmp(bytes, w, h).map(("bmp", _))
            .orElse(resizePng(bytes, w, h).map(("png", _)))
            .orElse(resizeJpeg(bytes, w, h).map(("jpeg", _)))
            .orElse(Gif.resizeGif(bytes, w, h).map(("gif", _)))
            .orElse(Webp.resizeWebp(bytes, w, h).map(("webp", _))) match {
            case Some((kind, real)) => (id, kind, real)
            case None =>
              val out = new Array[Byte](w * h)
              if (bytes.length > 0) {
                var i = 0
                while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
              }
              (id, sniffKind(bytes), out)
          }
        }
      }
      .toDF(idCol, "kind", "resized")
  }

  /**
   * Frame-sampling plumbing for video-ish blobs: emit up to `maxFrames`
   * rows per blob, one per `stride`-byte window — the 1-to-N explode shape
   * (and bounded output) of real video frame extraction, with the decode
   * STUBBED as a window checksum. Output: (id, frame_idx, offset, checksum).
   */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   stride: Int = 256, maxFrames: Int = 16): DataFrame = {
    require(stride > 0 && maxFrames > 0, "stride and maxFrames must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.length == 0) Iterator.empty
          else {
            val nFrames = math.min(maxFrames, (bytes.length + stride - 1) / stride)
            (0 until nFrames).iterator.map { f =>
              val off = f * stride
              val end = math.min(off + stride, bytes.length)
              var acc = 0L
              var i = off
              while (i < end) { acc = acc * 31 + (bytes(i) & 0xff); i += 1 }
              (id, f.toLong, off.toLong, acc)
            }
          }
        }
      }
      .toDF(idCol, "frame_idx", "offset", "checksum")
  }
}
