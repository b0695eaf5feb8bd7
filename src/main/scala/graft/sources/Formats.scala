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
        val in = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Array[Byte])]
        try {
          var e = in.getNextEntry
          while (e != null) {
            if (!e.isDirectory) {
              val buf = new java.io.ByteArrayOutputStream(
                math.max(e.getSize.toInt, 0) max 64)
              val chunk = new Array[Byte](1 << 14)
              var n = in.read(chunk)
              while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
              out += ((archive, e.getName, buf.toByteArray))
            }
            e = in.getNextEntry
          }
        } catch {
          // damaged tail OR malformed entry metadata: getNextEntry throws
          // IllegalArgumentException (not ZipException) for entry names
          // with invalid UTF-8 — both keep the sound members already read
          case _: java.io.IOException | _: IllegalArgumentException => ()
        } finally in.close()
        out
      }
      .toDF("archive", "member", "bytes")
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
