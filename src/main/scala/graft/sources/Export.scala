package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * TRAINING-DATA EXPORT — the pipeline's OUTPUT artifact: after ingest,
 * curation, dedup, and selection, a trainer consumes the corpus as
 * size-bounded compressed JSONL shards plus a manifest. This writer
 * produces exactly that, with the property an artifact registry needs
 * most: DETERMINISM — the same corpus exports to byte-identical shards
 * every time, so a shard digest identifies its data.
 *
 * How determinism is engineered (each step pins one source of variance):
 *  - rows hash-partition by the id column (`repartition(nShards, id)`) —
 *    content-addressed placement, independent of input partitioning;
 *  - each partition sorts by id (`sortWithinPartitions`) — placement
 *    fixed, order fixed;
 *  - rows serialize through Spark's `to_json` over the full struct —
 *    one codegen'd encoder, no per-executor formatting variance;
 *  - gzip is the JDK deflater at a fixed level with a zeroed header
 *    (JDK `GZIPOutputStream` writes MTIME=0), so compressed bytes are a
 *    pure function of the uncompressed stream.
 *
 * SCALE SHAPE: one shuffle (the content-addressed placement), then a
 * narrow per-partition streaming write — each task holds one open
 * gzip stream and a line buffer, never a shard in memory. Shards roll
 * over when the UNCOMPRESSED payload would exceed `maxShardBytes`
 * (a single oversized row still writes — a row must never be lost to a
 * bound), so decompressed shard size is bounded for the trainer's
 * loader. The manifest (`_MANIFEST.jsonl`: file, rows, raw_bytes) is
 * driver-written from per-file stats — file-count-sized, never
 * corpus-sized.
 */
object Export {

  /**
   * Write `df` as `nShards` hash-placed, id-sorted, size-bounded
   * `.jsonl.gz` shard families under `path` (local filesystem, the
   * store convention). Returns the manifest as (file, rows, raw_bytes),
   * also persisted as `_MANIFEST.jsonl` + `_SUCCESS`.
   */
  def writeJsonlShards(df: DataFrame, path: String, idCol: String,
      nShards: Int, maxShardBytes: Long): Seq[(String, Long, Long)] = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(maxShardBytes > 0, s"maxShardBytes must be positive, got $maxShardBytes")
    val spark = df.sparkSession
    import spark.implicits._
    val dir = new java.io.File(path)
    dir.mkdirs()
    // a re-export must never leave stale shards from a previous layout
    // (fewer rolls this time -> orphaned high-numbered files would read
    // back as phantom rows)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => (f.getName.startsWith("part-") && f.getName.endsWith(".jsonl.gz")) ||
        f.getName == "_MANIFEST.jsonl" || f.getName == "_SUCCESS")
      .foreach(f => { f.delete(): Unit })
    val lines = df
      .repartition(nShards, col(idCol))
      .sortWithinPartitions(col(idCol))
      .select(to_json(struct(df.columns.map(col): _*)).as("j"))
      .as[String]
    val stats = lines.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var roll = 0
      var stream: java.util.zip.GZIPOutputStream = null
      var file: String = null
      var rows = 0L
      var raw = 0L
      def close(): Unit = if (stream != null) {
        stream.finish(); stream.close()
        out += ((file, rows, raw))
        stream = null; rows = 0L; raw = 0L
      }
      def open(): Unit = {
        file = f"part-$pid%05d-$roll%04d.jsonl.gz"
        roll += 1
        stream = new java.util.zip.GZIPOutputStream(
          new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(new java.io.File(dir, file))))
      }
      it.foreach { j =>
        val bytes = (j + "\n").getBytes(StandardCharsets.UTF_8)
        if (stream != null && raw + bytes.length > maxShardBytes) close()
        if (stream == null) open()
        stream.write(bytes)
        rows += 1L
        raw += bytes.length
      }
      close()
      out.iterator
    }.collect().sortBy(_._1).toSeq
    val manifest = stats.map { case (f, r, b) =>
      s"""{"file":"$f","rows":$r,"raw_bytes":$b}"""
    }.mkString("", "\n", "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_MANIFEST.jsonl"), manifest)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path, "_SUCCESS"), "")
    stats
  }

  /** Read an export back with an explicit schema (never inference — the
    * manifest's consumer knows its contract), for round-trip gates and
    * downstream re-use. */
  def readJsonlShards(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(s"$path/part-*.jsonl.gz")

  /** The manifest of an export: (file, rows, raw_bytes). Read through the
    * driver (file-count-sized), NOT a Hadoop scan — input formats treat
    * `_`-prefixed files as hidden, and `_MANIFEST` keeps the ecosystem's
    * non-data prefix convention deliberately. */
  def readManifest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(path, "_MANIFEST.jsonl")).asScala.toSeq
    spark.read.schema("file string, rows long, raw_bytes long")
      .json(spark.createDataset(lines))
  }

  /** SHA-256 of every shard, for the registry-digest determinism gate:
    * (file, sha256hex). */
  def shardDigests(path: String): Seq[(String, String)] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".jsonl.gz"))
      .sortBy(_.getName)
      .map { f =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        (f.getName, md.digest(bytes).map(b => f"$b%02x").mkString)
      }.toSeq
  }
}
