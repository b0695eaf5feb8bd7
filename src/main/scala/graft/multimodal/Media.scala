package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaFeatures(
    id: Long,
    n_bytes: Long,
    kind: String,   // sniffed container type
    width: Long,    // STUB decode output (deterministic fake)
    height: Long,   // STUB decode output (deterministic fake)
    checksum: Long) // sum of sampled bytes — real byte-level work

/**
 * Multimodal-column plumbing: media (image/audio/video) travels as an opaque
 * `binary` column plus typed metadata, exactly like a production training-data
 * pipeline. Decode runs batch-at-a-time inside `mapPartitions` so a real
 * decoder (JNI/ffi image lib) could allocate its native context once per
 * partition — same execution shape as Python's `mapInPandas`, kept JVM-native
 * here.
 *
 * The actual pixel decode is a clearly-marked STUB (`fakeDecode`): this
 * container has no image/audio libraries, so it derives deterministic fake
 * dimensions from the byte stream. Everything around it — binary column
 * handling, schema, per-partition batching, byte-level feature math — is real
 * and tested.
 */
object Media {

  /** Magic-byte container sniffing on the first bytes of the blob. */
  private[multimodal] def sniffKind(bytes: Array[Byte]): String =
    if (bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "riff"
    else "unknown"

  /** STUB decode ??? — a real implementation would hand `bytes` to an image
    * decoder. Deterministic fake: dimensions derived from blob length. */
  private[multimodal] def fakeDecode(bytes: Array[Byte]): (Long, Long) =
    (bytes.length.toLong % 64, bytes.length.toLong % 48)

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
   */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder context would be allocated here (STUB: none)
        rows.filter(_._2 != null).map { case (id, bytes) =>
          val (w, h) = fakeDecode(bytes)
          MediaFeatures(id, bytes.length.toLong, sniffKind(bytes), w, h, sampleChecksum(bytes))
        }
      }
  }

  /**
   * Resize plumbing: (id, blob) -> (id, kind, resized blob) at a target
   * `w`x`h`. The pixel transform is a STUB ??? (real impl: decode, scale,
   * re-encode via a native library) — deterministically faked by cycling the
   * source bytes into a w*h-byte output so downstream schema, sizes, and
   * partition-batch shape are exactly what a real resize would produce.
   * Null blobs pass through as null (a real decoder would skip them too).
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
          else {
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
