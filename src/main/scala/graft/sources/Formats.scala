package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Ingestion formats beyond parquet: CSV and JSON-lines readers/writers with
 * the options that matter at lake scale, as one consistent surface.
 *
 * Two non-negotiables a 100 TB ingest job gets wrong at its peril, baked in
 * here:
 *
 *  - EXPLICIT schema, never inference: `inferSchema` is a full extra pass
 *    over the data before the real one (2× the scan cost), and a sampled
 *    inference can silently flip a column's type between runs. Readers here
 *    take a DDL string and refuse to guess.
 *  - EXPLICIT error posture: `FAILFAST` for pipelines that must stop on a
 *    malformed record, or the audited PERMISSIVE form that parses what it
 *    can and quarantines bad lines into `_corrupt_record` for inspection —
 *    never silent row drops (`DROPMALFORMED` is deliberately not offered).
 *
 * Compression is gzip (splittable formats don't matter for line formats the
 * way they do for parquet; gzip is the lake-interchange default).
 */
object Formats {

  /** CSV with header + gzip; embedded commas, quotes and newlines round-trip.
    * Escape is the RFC-4180 doubled quote (Spark's default is backslash,
    * which most non-Spark consumers misread). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", true).option("compression", "gzip")
      .option("escape", "\"")
      .csv(path)

  /** Strict CSV read: explicit DDL schema, stop on any malformed record.
    * `multiLine` honors the writer's quoting of embedded newlines; it makes
    * the FILE the split unit, which costs nothing here — gzip already did. */
  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl))
      .option("header", true).option("mode", "FAILFAST")
      // the writer's escaping convention, so round-trips are lossless
      .option("escape", "\"").option("multiLine", true)
      .csv(path)

  /** Audited CSV read: malformed lines land whole in `_corrupt_record`
    * (NULL for clean rows), parseable fields still populate — the quarantine
    * pattern for third-party feeds. */
  def readCsvAudited(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl).add("_corrupt_record", "string"))
      .option("header", true).option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("escape", "\"").option("multiLine", true)
      .csv(path)

  /** JSON-lines with gzip (nested structs/arrays survive, unlike CSV). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** Strict JSON-lines read: explicit DDL schema, stop on malformed. */
  def readJsonLines(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl))
      .option("mode", "FAILFAST")
      .json(path)

  /** Audited JSON-lines read (PERMISSIVE + `_corrupt_record`). */
  def readJsonLinesAudited(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl).add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** ZIP archive ingestion — dataset dumps and document collections ship
    * as `.zip`; Spark has no zip source, so this is the [[Warc]] pattern:
    * `binaryFile` scan (one row per archive, the FILE is the parallel
    * unit; the JVM 2 GB array bound is the per-archive ceiling) → narrow
    * per-archive member walk via the JDK `ZipInputStream` → one
    * `(archive, member, bytes)` row per regular member, directories
    * skipped. A corrupt archive tail keeps the members already read
    * (the torn-gzip-member contract). Decode/parse of member bytes
    * composes downstream (text, [[graft.multimodal.Pdf]], the codecs). */
  def readZipMembers(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (archive, bytes) =>
        zipMembers(bytes).map { case (name, data) => (archive, name, data) }
      }
      .toDF("archive", "member", "bytes")
  }

  /** Walk one zip payload's regular members; see [[readZipMembers]]'s
    * damage contract. */
  private[graft] def zipMembers(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val in = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    try {
      var e = in.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream(
            math.max(e.getSize.toInt, 0) max 64)
          val chunk = new Array[Byte](1 << 14)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          out += ((e.getName, buf.toByteArray))
        }
        e = in.getNextEntry
      }
    } catch {
      // damaged tail OR malformed entry metadata: getNextEntry throws
      // IllegalArgumentException (not ZipException) for entry names
      // with invalid UTF-8 — both keep the sound members already read
      case _: java.io.IOException | _: IllegalArgumentException => ()
    } finally in.close()
    out.toSeq
  }

  /** TAR (+`.tar.gz`) archive ingestion — the other dump format datasets
    * ship in. The JDK has no tar reader, but the format barely needs one:
    * 512-byte ustar header blocks (name, octal size, checksum, typeflag),
    * data in 512-byte blocks, two zero blocks at the end. SUBSET, stated
    * honestly: plain ustar regular files; GNU long-name ('L') and PAX ('x')
    * extension entries are SKIPPED (their payload is metadata, not a
    * member), links/directories skipped, and a header whose checksum does
    * not verify ends that archive's iteration (the damage contract —
    * unframed bytes are never attributed to a member). Gzip payloads
    * (magic 1f 8b) inflate first, multi-member and torn-tail tolerant. */
  def readTarMembers(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar*").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (archive, raw) =>
        val bytes = if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
          (raw(1) & 0xff) == 0x8b) gunzip(raw) else raw
        tarMembers(bytes).map { case (name, data) => (archive, name, data) }
      }
      .toDF("archive", "member", "bytes")
  }

  /** Walk one uncompressed tar payload; see [[readTarMembers]]'s subset. */
  private[graft] def tarMembers(bytes: Array[Byte]): Iterator[(String, Array[Byte])] =
    new scala.collection.AbstractIterator[(String, Array[Byte])] {
      private var pos = 0
      private var nextM: (String, Array[Byte]) = null
      advance()
      override def hasNext: Boolean = nextM != null
      override def next(): (String, Array[Byte]) = {
        val r = nextM; advance(); r
      }
      private def octal(off: Int, len: Int): Long = {
        var v = 0L; var i = off
        while (i < off + len) {
          val c = bytes(i).toChar
          if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
          else if (c != ' ' && c != 0) return -1L
          i += 1
        }
        v
      }
      @annotation.tailrec
      private def advance(): Unit = {
        nextM = null
        if (pos + 512 > bytes.length) return
        // the terminator: an all-zero header block
        var allZero = true
        var z = pos
        while (allZero && z < pos + 512) { if (bytes(z) != 0) allZero = false; z += 1 }
        if (allZero) return
        // header checksum: unsigned byte sum with the chksum field as spaces
        val declared = octal(pos + 148, 8)
        var sum = 0L
        var i = pos
        while (i < pos + 512) {
          sum += (if (i >= pos + 148 && i < pos + 156) ' '.toInt else bytes(i) & 0xff)
          i += 1
        }
        if (declared < 0 || sum != declared) { pos = bytes.length; return } // damage: stop
        val size = octal(pos + 124, 12)
        if (size < 0 || pos + 512 + size > bytes.length) { pos = bytes.length; return }
        var nameEnd = pos
        while (nameEnd < pos + 100 && bytes(nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, pos, nameEnd - pos, "UTF-8")
        val typeflag = bytes(pos + 156).toChar
        val dataStart = pos + 512
        pos = dataStart + (((size + 511) / 512) * 512).toInt
        if (typeflag == '0' || typeflag == 0.toChar) {
          nextM = (name, java.util.Arrays.copyOfRange(bytes, dataStart, (dataStart + size).toInt))
        } else advance() // long-name/pax/link/dir entries: skip payload too
      }
    }

  /** Multi-member, torn-tail-tolerant gunzip — ONE implementation of the
    * damage contract, shared with the WARC reader. */
  private def gunzip(gz: Array[Byte]): Array[Byte] = Warc.inflateAll(gz)

  /** The matching tar.gz fixture writer ([[writeZipFixture]]'s shape):
    * `(id: Long, member: String, bytes: binary)` rows, one `.tar.gz` per
    * task, plain ustar headers, streamed at constant memory. */
  def writeTarFixture(shaped: DataFrame, dir: String, nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    new java.io.File(dir).mkdirs()
    import org.apache.spark.sql.functions._
    shaped.select(col("id").cast("long"), col("member").cast("string"), col("bytes"))
      .repartition(nFiles, pmod(col("id"), lit(nFiles.toLong)))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val target = new java.io.File(dir, f"part-$pid%05d.tar.gz")
          val tmp = java.io.File.createTempFile(s"tar-$pid-", ".tmp", new java.io.File(dir))
          val gz = new java.util.zip.GZIPOutputStream(
            new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 16))
          try {
            it.foreach { r =>
              val name = r.getString(1).getBytes("UTF-8")
              require(name.length <= 100, s"ustar name limit: ${r.getString(1)}")
              val data = r.getAs[Array[Byte]](2)
              val h = new Array[Byte](512)
              System.arraycopy(name, 0, h, 0, name.length)
              def oct(off: Int, len: Int, v: Long): Unit = {
                val s = java.lang.Long.toOctalString(v)
                val padded = ("0" * (len - 1 - s.length)) + s
                System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off, len - 1)
              }
              oct(100, 8, 420) // mode 0644
              oct(108, 8, 0); oct(116, 8, 0) // uid/gid
              oct(124, 12, data.length.toLong)
              oct(136, 12, 0) // mtime pinned: bytes are a function of content
              h(156) = '0' // regular file
              "ustar".getBytes("US-ASCII").copyToArray(h, 257)
              h(262) = 0; h(263) = '0'; h(264) = '0' // ustar version "00"
              java.util.Arrays.fill(h, 148, 156, ' '.toByte)
              var sum = 0L
              h.foreach(b => sum += (b & 0xff))
              val cs = java.lang.Long.toOctalString(sum)
              val padded = ("0" * (6 - cs.length)) + cs
              System.arraycopy(padded.getBytes("US-ASCII"), 0, h, 148, 6)
              h(154) = 0; h(155) = ' '
              gz.write(h)
              gz.write(data)
              val pad = (512 - data.length % 512) % 512
              if (pad > 0) gz.write(new Array[Byte](pad))
            }
            gz.write(new Array[Byte](1024)) // two zero blocks: the terminator
          } finally gz.close()
          java.nio.file.Files.move(tmp.toPath, target.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
        }
      }
  }

  /** The matching fixture writer: one zip per task, members streamed at
    * constant memory ([[Warc.writeFixture]]'s discipline). Input rows:
    * `(id: Long, member: String, bytes: binary)`. */
  def writeZipFixture(shaped: DataFrame, dir: String, nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    new java.io.File(dir).mkdirs()
    import org.apache.spark.sql.functions._
    shaped.select(col("id").cast("long"), col("member").cast("string"), col("bytes"))
      .repartition(nFiles, pmod(col("id"), lit(nFiles.toLong)))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        // ZipOutputStream refuses empty archives, and bucket-hash packing
        // leaves some partitions empty: those write no file at all
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val target = new java.io.File(dir, f"part-$pid%05d.zip")
          val tmp = java.io.File.createTempFile(s"zip-$pid-", ".tmp", new java.io.File(dir))
          val zos = new java.util.zip.ZipOutputStream(
            new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 16))
          try {
            it.foreach { r =>
              val entry = new java.util.zip.ZipEntry(r.getString(1))
              // pin times: archive bytes stay a pure function of the content
              entry.setTime(0L)
              zos.putNextEntry(entry)
              zos.write(r.getAs[Array[Byte]](2))
              zos.closeEntry()
            }
          } finally zos.close()
          java.nio.file.Files.move(tmp.toPath, target.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
        }
      }
  }
}
