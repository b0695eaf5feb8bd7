package graft.sources

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec

import graft.SparkSuite

/** The export sink: lossless round trips under adversarial content,
  * shard size bounds, and the byte-determinism registry property. */
class ExportSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("export").toString

  private val tricky = Seq(
    (1L, Some("plain text"), Some("en")),
    (2L, Some("line\nbreak and \"quotes\" and \\backslash"), Some("de")),
    (3L, Some("ünïcødé ✓  control"), None),
    (4L, None, Some("fr")),
    (5L, Some(""), Some("en")))

  it("round-trips adversarial content losslessly through jsonl.gz shards") {
    val df = tricky.toDF("id", "text", "lang")
    val path = tmp("ex_rt")
    val manifest = Export.writeJsonlShards(df, path, "id", nShards = 3, maxShardBytes = 1 << 20)
    val back = Export.readJsonlShards(spark, path, df.schema)
    assert(back.exceptAll(df).count() === 0L)
    assert(df.exceptAll(back).count() === 0L)
    assert(manifest.map(_._2).sum === tricky.size.toLong)
    // the written manifest file replays the returned stats
    val mf = Export.readManifest(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(mf === manifest)
  }

  it("bounds uncompressed shard size, rolling over inside a partition") {
    val df = (0L until 40L).map(i => (i, "x" * 100)).toDF("id", "text")
    val path = tmp("ex_sz")
    val manifest = Export.writeJsonlShards(df, path, "id", nShards = 2, maxShardBytes = 300)
    // each row is ~130 raw bytes -> at most 2 per shard; every bound holds
    assert(manifest.forall(_._3 <= 300L), manifest.toString)
    assert(manifest.map(_._2).sum === 40L)
    assert(manifest.size > 10)
    // an oversized single row still writes (a row is never lost to a bound)
    val big = Seq((1L, "y" * 1000)).toDF("id", "text")
    val p2 = tmp("ex_big")
    val m2 = Export.writeJsonlShards(big, p2, "id", nShards = 1, maxShardBytes = 300)
    assert(m2.map(_._2).sum === 1L)
    assert(Export.readJsonlShards(spark, p2, big.schema).count() === 1L)
  }

  it("exports are byte-deterministic: placement, order, and gzip are all pinned") {
    val df = (0L until 200L).map(i => (i, s"doc $i content", (i % 5).toString)).toDF("id", "text", "lang")
    val (p1, p2) = (tmp("ex_d1"), tmp("ex_d2"))
    Export.writeJsonlShards(df, p1, "id", nShards = 4, maxShardBytes = 1 << 16)
    // same data, different input partitioning and row order
    Export.writeJsonlShards(df.repartition(13).sortWithinPartitions(org.apache.spark.sql.functions.rand(7)),
      p2, "id", nShards = 4, maxShardBytes = 1 << 16)
    val (d1, d2) = (Export.shardDigests(p1), Export.shardDigests(p2))
    assert(d1.nonEmpty && d1 === d2)
  }

  it("byte-determinism holds even when ids repeat (serialized-row tiebreak)") {
    val dup = Seq((1L, "alpha"), (1L, "beta"), (1L, "gamma"), (2L, "delta"),
      (2L, "epsilon")).toDF("id", "text")
    val (p1, p2) = (tmp("ex_dup1"), tmp("ex_dup2"))
    Export.writeJsonlShards(dup, p1, "id", nShards = 2, maxShardBytes = 1 << 16)
    Export.writeJsonlShards(
      dup.repartition(7).sortWithinPartitions(org.apache.spark.sql.functions.rand(3)),
      p2, "id", nShards = 2, maxShardBytes = 1 << 16)
    assert(Export.shardDigests(p1).nonEmpty)
    assert(Export.shardDigests(p1) === Export.shardDigests(p2))
  }

  it("readers refuse an unpublished artifact; an empty export publishes and reads back") {
    val df = tricky.toDF("id", "text", "lang")
    val path = tmp("ex_pub")
    Export.writeJsonlShards(df, path, "id", nShards = 2, maxShardBytes = 1 << 20)
    assert(new java.io.File(path, "_SUCCESS").delete())
    val ex = intercept[IllegalArgumentException] {
      Export.readJsonlShards(spark, path, df.schema)
    }
    assert(ex.getMessage.contains("_SUCCESS"))
    intercept[IllegalArgumentException] { Export.shardDigests(path) }
    // a republish restores readability
    Export.writeJsonlShards(df, path, "id", nShards = 2, maxShardBytes = 1 << 20)
    assert(Export.readJsonlShards(spark, path, df.schema).count() === tricky.size.toLong)
    // empty corpus: published, readable, zero rows — not an error
    val empty = df.where($"id" < 0)
    val pe = tmp("ex_empty")
    assert(Export.writeJsonlShards(empty, pe, "id", 2, 1 << 20).isEmpty)
    assert(Export.readJsonlShards(spark, pe, df.schema).count() === 0L)
    assert(Export.readManifest(spark, pe).count() === 0L)
  }

  it("a live .export-lock blocks a second writer loudly; a stale one is taken over") {
    val df = tricky.toDF("id", "text", "lang")
    val path = tmp("ex_lock")
    new java.io.File(path).mkdirs()
    val lock = new java.io.File(path, ".export-lock")
    // a FRESH lock = a concurrently-running export: fail, do not interleave
    assert(lock.createNewFile())
    val ex = intercept[IllegalArgumentException] {
      Export.writeJsonlShards(df, path, "id", nShards = 2, maxShardBytes = 1 << 20)
    }
    assert(ex.getMessage.contains("export-lock"))
    // a STALE lock = a crashed writer: reaped, export proceeds, lock released
    assert(lock.setLastModified(System.currentTimeMillis() - 10L * 60L * 1000L))
    Export.writeJsonlShards(df, path, "id", nShards = 2, maxShardBytes = 1 << 20)
    assert(!lock.exists())
    assert(Export.readJsonlShards(spark, path, df.schema).count() === tricky.size.toLong)
  }

  it("staging holds only attempt-suffixed temps until a partition completes") {
    // the canonical shard name appears via rename-on-success, so a killed
    // mid-write attempt can never leave a truncated canonical file: killing
    // the job mid-stream leaves only .attempt-* temps, which never publish.
    // Driving a real task kill is flaky under local[*]; the contract is
    // pinned structurally instead — the publish path renames EXACTLY the
    // stats-listed canonical names, and a leftover attempt temp from a
    // (simulated) dead attempt dies with the staging dir.
    val df = tricky.toDF("id", "text", "lang")
    val path = tmp("ex_att")
    Export.writeJsonlShards(df, path, "id", nShards = 2, maxShardBytes = 1 << 20)
    val leftovers = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.contains(".attempt-") || f.getName.startsWith(".staging-"))
    assert(leftovers.isEmpty)
  }

  it("re-export cleans stale shards from a previous layout") {
    val path = tmp("ex_cl")
    val wide = (0L until 40L).map(i => (i, "z" * 100)).toDF("id", "text")
    Export.writeJsonlShards(wide, path, "id", nShards = 2, maxShardBytes = 300) // many rolls
    val narrow = Seq((1L, "one")).toDF("id", "text")
    Export.writeJsonlShards(narrow, path, "id", nShards = 2, maxShardBytes = 300)
    assert(Export.readJsonlShards(spark, path, narrow.schema).count() === 1L)
    assert(Export.readManifest(spark, path).count() === 1L)
  }

  // ---- binary (GRBS) token shards ----

  private def binsOf(rows: (Long, Seq[Long], Seq[Long], Seq[Long])*) =
    rows.toSeq.toDF("bin_key", "doc_ids", "doc_lens", "ids")

  private val bins = Seq(
    (1L, Seq(10L, 11L), Seq(3L, 2L), Seq(300L, 1L, 2L, 259L, 0L)),
    (2L, Seq(12L), Seq(4L), Seq(258L, 1L, 65535L, 0L)),
    (3L, Seq.empty[Long], Seq.empty[Long], Seq.empty[Long]),
    (7L, Seq(13L), Seq(1L), Seq(0L)))

  it("binary shards round-trip bins, boundaries, and ids exactly") {
    val df = binsOf(bins: _*)
    val path = tmp("bx_rt")
    val manifest = Export.writeBinaryShards(df, path, "bin_key",
      nShards = 2, maxShardBytes = 1 << 20, tokenWidth = 2)
    assert(manifest.map(_._2).sum === bins.size.toLong)
    val back = Export.readBinaryShards(spark, path)
      .select($"bin_key", $"doc_ids", $"doc_lens", $"ids", $"n_docs", $"n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2),
        r.getSeq[Long](3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(back.toSeq === bins.sortBy(_._1).map { case (k, di, dl, ids) =>
      (k, di, dl, ids, di.length.toLong, ids.length.toLong) })
    // payload accounting: raw_bytes is the full self-describing file
    assert(manifest.forall(_._3 > 0L))
  }

  it("binary exports are byte-deterministic under reshuffled input; " +
     "width 4 round-trips ids above 65535") {
    val big = (0L until 120L).map(i =>
      (i, Seq(i), Seq(3L), Seq(70000L + i, 1L, 0L)))
    val df = binsOf(big: _*)
    val (p1, p2) = (tmp("bx_d1"), tmp("bx_d2"))
    Export.writeBinaryShards(df, p1, "bin_key", nShards = 3,
      maxShardBytes = 1 << 20, tokenWidth = 4)
    Export.writeBinaryShards(
      df.repartition(11).sortWithinPartitions(org.apache.spark.sql.functions.rand(3)),
      p2, "bin_key", nShards = 3, maxShardBytes = 1 << 20, tokenWidth = 4)
    assert(Export.shardDigests(p1) === Export.shardDigests(p2))
    val ids = Export.readBinaryShards(spark, p1)
      .select($"ids").collect().flatMap(_.getSeq[Long](0))
    assert(ids.count(_ >= 70000L) === 120)
  }

  it("binary shards roll over on the payload bound; a bin never splits across files") {
    val many = (0L until 30L).map(i => (i, Seq(i), Seq(8L), (0L until 8L).toSeq))
    val path = tmp("bx_roll")
    // 8 ids x 2 bytes = 16 payload bytes per bin; bound of 40 -> 2 bins/file
    val manifest = Export.writeBinaryShards(binsOf(many: _*), path, "bin_key",
      nShards = 2, maxShardBytes = 40, tokenWidth = 2)
    assert(manifest.map(_._2).sum === 30L)
    assert(manifest.forall(_._2 <= 2L), manifest.toString)
    assert(Export.readBinaryShards(spark, path).count() === 30L)
  }

  it("width and duplicate-key contracts fail loudly") {
    val over = binsOf((1L, Seq(1L), Seq(1L), Seq(65536L)))
    val e1 = intercept[org.apache.spark.SparkException](
      Export.writeBinaryShards(over, tmp("bx_w"), "bin_key", 1, 1 << 20, tokenWidth = 2))
    assert(e1.getMessage.contains("tokenWidth") ||
      Option(e1.getCause).exists(_.getMessage.contains("tokenWidth")))
    val dup = binsOf((5L, Seq(1L), Seq(1L), Seq(0L)), (5L, Seq(2L), Seq(1L), Seq(0L)))
    val e2 = intercept[org.apache.spark.SparkException](
      Export.writeBinaryShards(dup, tmp("bx_k"), "bin_key", 1, 1 << 20, tokenWidth = 2))
    assert(e2.getMessage.contains("duplicate bin key") ||
      Option(e2.getCause).exists(_.getMessage.contains("duplicate bin key")))
  }

  it("binary payload is materially smaller than the jsonl.gz encoding of the same bins") {
    // seeded-random ids — the entropy profile of a real token stream; a
    // REGULAR synthetic sequence would hand gzip an artificial win no
    // real corpus reproduces
    val data = (0L until 64L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Seq(i * 2, i * 2 + 1), Seq(100L, 100L),
        (0L until 200L).map(_ => 258L + rnd.nextInt(60000).toLong))
    }
    val df = binsOf(data: _*)
    val (pj, pb) = (tmp("bx_cj"), tmp("bx_cb"))
    val mj = Export.writeJsonlShards(df, pj, "bin_key", nShards = 2, maxShardBytes = 1 << 20)
    val mb = Export.writeBinaryShards(df, pb, "bin_key", nShards = 2,
      maxShardBytes = 1 << 20, tokenWidth = 2)
    // jsonl raw_bytes is the UNCOMPRESSED payload; compare what is actually
    // shipped: on-disk file sizes (gz for jsonl, self-describing binary)
    def onDisk(path: String, m: Seq[(String, Long, Long)]): Long =
      m.map { case (f, _, _) => new java.io.File(path, f).length() }.sum
    assert(onDisk(pb, mb) < onDisk(pj, mj),
      s"binary ${onDisk(pb, mb)}B should undercut jsonl.gz ${onDisk(pj, mj)}B")
  }

  it("GRBS property: random bin frames round-trip exactly under any rollover bound " +
     "and both widths, with digests invariant to input partitioning") {
    val rnd = new scala.util.Random(2026)
    // random bins: empty id lists, width-boundary ids, ragged doc counts
    val data = (0L until 40L).map { k =>
      val nDocs = rnd.nextInt(4) // 0..3 docs (0 = an empty bin row)
      val docIds = Seq.fill(nDocs)(rnd.nextLong().abs % 1000000L)
      val docLens = Seq.fill(nDocs)(rnd.nextInt(30).toLong)
      val nIds = docLens.sum.toInt
      val ids = Seq.fill(nIds)(rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => 65535L // u16 boundary
        case _ => rnd.nextInt(65536).toLong
      })
      (k, docIds, docLens, ids)
    }
    val df = binsOf(data: _*)
    for (bound <- Seq(64L, 300L, 1L << 20); width <- Seq(2, 4)) {
      val path = tmp(s"bx_prop_${bound}_$width")
      val manifest = Export.writeBinaryShards(df, path, "bin_key",
        nShards = 3, maxShardBytes = bound, tokenWidth = width)
      assert(manifest.map(_._2).sum === 40L, s"bound=$bound width=$width")
      val back = Export.readBinaryShards(spark, path)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2),
          r.getSeq[Long](3))).sortBy(_._1)
      assert(back.toSeq === data.sortBy(_._1).map { case (k, di, dl, ids) =>
        (k, di, dl, ids) }, s"bound=$bound width=$width")
      // determinism under reshuffle at every geometry
      val p2 = tmp(s"bx_prop2_${bound}_$width")
      Export.writeBinaryShards(
        df.repartition(9).sortWithinPartitions(org.apache.spark.sql.functions.rand(1)),
        p2, "bin_key", nShards = 3, maxShardBytes = bound, tokenWidth = width)
      assert(Export.shardDigests(path) === Export.shardDigests(p2),
        s"bound=$bound width=$width")
      // manifest raw_bytes is the true on-disk size, file by file
      manifest.foreach { case (f, _, b) =>
        assert(new java.io.File(path, f).length() === b)
      }
    }
  }

  it("a truncated GRBS shard fails loudly at read, never parses garbage") {
    val df = binsOf((1L, Seq(10L), Seq(5L), Seq(1L, 2L, 3L, 4L, 0L)),
      (2L, Seq(11L), Seq(3L), Seq(5L, 6L, 0L)))
    val path = tmp("bx_trunc")
    val manifest = Export.writeBinaryShards(df, path, "bin_key", 1, 1 << 20, 2)
    val f = new java.io.File(path, manifest.head._1)
    // chop the index tail: header checks pass, per-bin parse must require
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, java.util.Arrays.copyOf(bytes, bytes.length - 10))
    val e = intercept[org.apache.spark.SparkException](
      Export.readBinaryShards(spark, path).collect())
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("GRBS") || msg.contains("truncated"), msg)
  }

  it("the index must consume a GRBS shard exactly: trailing or concatenated bytes fail") {
    // a concatenated artifact (cat a.bin b.bin) passes every PER-RECORD
    // invariant of the first file's index — only the exact-consumption
    // check at the end of the parse catches it
    val df = binsOf((1L, Seq(10L), Seq(5L), Seq(1L, 2L, 3L, 4L, 0L)),
      (2L, Seq(11L), Seq(3L), Seq(5L, 6L, 0L)))
    val path = tmp("bx_exact")
    val manifest = Export.writeBinaryShards(df, path, "bin_key", 1, 1 << 20, 2)
    val f = new java.io.File(path, manifest.head._1)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val doubled = java.util.Arrays.copyOf(bytes, bytes.length * 2)
    System.arraycopy(bytes, 0, doubled, bytes.length, bytes.length)
    java.nio.file.Files.write(f.toPath, doubled)
    val e = intercept[org.apache.spark.SparkException](
      Export.readBinaryShards(spark, path).collect())
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("trailing bytes") || msg.contains("beyond the last"), msg)
    // plain trailing garbage after a valid index fails the same door
    java.nio.file.Files.write(f.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length + 7))
    val e2 = intercept[org.apache.spark.SparkException](
      Export.readBinaryShards(spark, path).collect())
    val msg2 = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("trailing bytes"), msg2)
  }

  // ---- masked binary (GRBM) SFT shards ----

  private def maskedBinsOf(rows: (Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long])*) =
    rows.toSeq.toDF("bin_key", "doc_ids", "doc_lens", "ids", "mask")

  private val maskedBins = Seq(
    // 5 tokens: mask crosses no byte; 9 tokens: mask spans two bytes with
    // padding bits; an empty bin; a 1-token bin
    (1L, Seq(10L, 11L), Seq(3L, 2L), Seq(300L, 1L, 2L, 259L, 0L), Seq(0L, 1L, 1L, 0L, 1L)),
    (2L, Seq(12L), Seq(9L), (0L until 9L).map(i => 258L + i), Seq(1L, 0L, 1L, 0L, 1L, 0L, 1L, 0L, 1L)),
    (3L, Seq.empty[Long], Seq.empty[Long], Seq.empty[Long], Seq.empty[Long]),
    (7L, Seq(13L), Seq(1L), Seq(0L), Seq(1L)))

  it("GRBM masked shards round-trip bins, ids, and mask bits exactly, " +
     "byte-deterministic under reshuffled input at both widths") {
    for (width <- Seq(2, 4)) {
      val df = maskedBinsOf(maskedBins: _*)
      val (p1, p2) = (tmp(s"mx_rt$width"), tmp(s"mx_rt${width}b"))
      val manifest = Export.writeMaskedBinaryShards(df, p1, "bin_key",
        nShards = 2, maxShardBytes = 1 << 20, tokenWidth = width)
      assert(manifest.map(_._2).sum === maskedBins.size.toLong)
      val back = Export.readMaskedBinaryShards(spark, p1)
        .select($"bin_key", $"doc_ids", $"doc_lens", $"ids", $"mask", $"n_docs", $"n_tokens")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2),
          r.getSeq[Long](3), r.getSeq[Long](4), r.getLong(5), r.getLong(6)))
        .sortBy(_._1)
      assert(back.toSeq === maskedBins.sortBy(_._1).map { case (k, di, dl, ids, m) =>
        (k, di, dl, ids, m, di.length.toLong, ids.length.toLong) })
      Export.writeMaskedBinaryShards(
        df.repartition(11).sortWithinPartitions(org.apache.spark.sql.functions.rand(3)),
        p2, "bin_key", nShards = 2, maxShardBytes = 1 << 20, tokenWidth = width)
      assert(Export.shardDigests(p1) === Export.shardDigests(p2))
    }
  }

  it("GRBM rolls over on the whole-file bound (mask section included); " +
     "a bin never splits") {
    val many = (0L until 30L).map(i =>
      (i, Seq(i), Seq(8L), (0L until 8L).toSeq, Seq(0L, 1L, 0L, 1L, 0L, 1L, 0L, 1L)))
    val path = tmp("mx_roll")
    // 8 ids x 2B + 1 mask byte + 36B index per bin; tight bound -> 1-2 bins/file
    val manifest = Export.writeMaskedBinaryShards(maskedBinsOf(many: _*), path,
      "bin_key", nShards = 2, maxShardBytes = 160, tokenWidth = 2)
    assert(manifest.map(_._2).sum === 30L)
    assert(manifest.forall(_._2 <= 2L), manifest.toString)
    val back = Export.readMaskedBinaryShards(spark, path)
    assert(back.count() === 30L)
    assert(back.where(org.apache.spark.sql.functions.expr(
      "aggregate(mask, CAST(0 AS BIGINT), (a, x) -> a + x) != 4")).isEmpty)
  }

  it("GRBM contracts fail loudly: mask misalignment, non-bit mask values, " +
     "tampered padding bits, truncation") {
    val bad1 = maskedBinsOf((1L, Seq(10L), Seq(2L), Seq(1L, 0L), Seq(1L)))
    val e1 = intercept[org.apache.spark.SparkException](
      Export.writeMaskedBinaryShards(bad1, tmp("mx_b1"), "bin_key", 1, 1 << 20, 2))
    val m1 = e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse("")
    assert(m1.contains("mask and ids lengths differ"), m1)
    val bad2 = maskedBinsOf((1L, Seq(10L), Seq(2L), Seq(1L, 0L), Seq(1L, 2L)))
    val e2 = intercept[org.apache.spark.SparkException](
      Export.writeMaskedBinaryShards(bad2, tmp("mx_b2"), "bin_key", 1, 1 << 20, 2))
    val m2 = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(m2.contains("is not a bit"), m2)
    // a flipped PADDING bit in the mask section must fail the read door —
    // it marks a corrupt or foreign artifact, never silent acceptance
    val ok = maskedBinsOf((1L, Seq(10L), Seq(5L), Seq(1L, 2L, 3L, 4L, 0L),
      Seq(0L, 1L, 0L, 1L, 0L)))
    val path = tmp("mx_pad")
    val manifest = Export.writeMaskedBinaryShards(ok, path, "bin_key", 1, 1 << 20, 2)
    val f = new java.io.File(path, manifest.head._1)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // mask section = one byte right after 44B header + 5 ids x 2B
    val maskByteAt = 44 + 10
    bytes(maskByteAt) = (bytes(maskByteAt) | 0x80).toByte // bit 7 pads (nTok=5)
    java.nio.file.Files.write(f.toPath, bytes)
    val e3 = intercept[org.apache.spark.SparkException](
      Export.readMaskedBinaryShards(spark, path).collect())
    val m3 = e3.getMessage + Option(e3.getCause).map(_.getMessage).getOrElse("")
    assert(m3.contains("padding bit"), m3)
    // truncation below the index fails loudly
    bytes(maskByteAt) = (bytes(maskByteAt) & 0x7f).toByte
    java.nio.file.Files.write(f.toPath, java.util.Arrays.copyOf(bytes, bytes.length - 6))
    val e4 = intercept[org.apache.spark.SparkException](
      Export.readMaskedBinaryShards(spark, path).collect())
    val m4 = e4.getMessage + Option(e4.getCause).map(_.getMessage).getOrElse("")
    assert(m4.contains("GRBM") || m4.contains("truncated"), m4)
  }
}
