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
 *  - each partition sorts by (id, serialized row) — placement fixed,
 *    order fixed EVEN when ids repeat (a bare id sort is not stable
 *    across input orders);
 *  - rows serialize through Spark's `to_json` over the full struct —
 *    one codegen'd encoder, no per-executor formatting variance;
 *  - gzip is the JDK deflater at a fixed level with a zeroed header
 *    (JDK `GZIPOutputStream` writes MTIME=0), so compressed bytes are a
 *    pure function of the uncompressed stream.
 *
 * WRITE PROTOCOL — replacement with detection, not versioning (a
 * versioned keyed store is [[Sink]]'s job; a trainer wants ONE flat
 * artifact): tasks write into a hidden staging directory and a partial
 * shard from a failed task dies with its staging dir, never reaching
 * the artifact; publish then retracts `_SUCCESS` FIRST, swaps the shard
 * set, writes `_MANIFEST.jsonl`, and re-creates `_SUCCESS` LAST. The
 * read face refuses a directory without `_SUCCESS` and reads EXACTLY
 * the manifest's file list — so a crash anywhere leaves either the old
 * artifact, or a detectably-unpublished one; never a silent mixture or
 * a silently partial corpus.
 *
 * Two failure modes the staging dir alone does not cover are closed
 * explicitly:
 *  - TASK-ATTEMPT RACES (speculation / retry): each attempt streams into
 *    an attempt-suffixed temp name and renames to the canonical shard
 *    name only when its partition completes, so a killed mid-write
 *    attempt can never leave a truncated file under a canonical name —
 *    and because shard bytes are a pure function of the sorted partition,
 *    even two attempts racing their renames land identical bytes;
 *  - CONCURRENT EXPORTS to one path: a `.export-lock` file (created
 *    atomically, heartbeat-refreshed every [[lockBeatMs]] while the
 *    export runs) makes the second writer FAIL LOUDLY instead of reaping
 *    the first one's staging dir and interleaving the two publish
 *    phases under one manifest. A crashed writer's lock stops beating
 *    and is reaped once it goes stale ([[lockStaleMs]]).
 *
 * SCALE SHAPE: one shuffle (the content-addressed placement), then a
 * narrow per-partition streaming write — each task holds one open gzip
 * stream and a line buffer, never a shard in memory. Shards roll over
 * when the UNCOMPRESSED payload would exceed `maxShardBytes` (a single
 * oversized row still writes — a row must never be lost to a bound).
 * Local-filesystem contract, like every [[Sink]] store.
 */
object Export {

  /** Single-writer lock heartbeat period / staleness horizon: a live
    * export refreshes the lock's mtime every beat from a daemon thread
    * (the driver blocks in the job, so the beat must be off-thread); a
    * lock that has not beaten for [[lockStaleMs]] belongs to a crashed
    * writer and is reaped. Stale >> beat, so one missed beat under load
    * never gets a live writer reaped. */
  private val lockBeatMs = 5000L
  private val lockStaleMs = 120000L

  private def acquireLock(dir: java.io.File, path: String): (java.io.File, Thread) = {
    val lock = new java.io.File(dir, ".export-lock")
    def tryCreate(): Boolean =
      try { java.nio.file.Files.createFile(lock.toPath); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!tryCreate()) {
      val age = System.currentTimeMillis() - lock.lastModified()
      require(age > lockStaleMs,
        s"another export to $path holds .export-lock (last heartbeat ${age / 1000}s ago)" +
          " — concurrent exports to one artifact would interleave their publish phases;" +
          s" a crashed writer's lock goes stale after ${lockStaleMs / 1000}s")
      // ATOMIC takeover: rename the stale lock to a contender-unique name —
      // exactly one of two racing reclaimers' renames can succeed (the
      // loser's source is gone), where a delete-then-create sequence would
      // let BOTH proceed (the second delete removing the first's fresh
      // lock). The subsequent create can still lose to a brand-new writer,
      // which is the correct outcome: one writer survives, the rest fail
      // loudly.
      val reclaim = new java.io.File(dir, s".export-lock.reclaim-${System.nanoTime()}")
      require(lock.renameTo(reclaim),
        s"lost the .export-lock takeover race at $path — another writer is active")
      // delete the reclaimed stale lock BEFORE contending for the fresh one:
      // losing tryCreate to a brand-new writer must still fail loudly, but
      // never strand a .reclaim-* file in the published artifact directory
      reclaim.delete(): Unit
      require(tryCreate(),
        s"lost the .export-lock takeover race at $path — another writer is active")
    }
    val beat = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(lockBeatMs)
        lock.setLastModified(System.currentTimeMillis()): Unit
      } catch { case _: InterruptedException => () }
    }, s"export-lock-beat:$path")
    beat.setDaemon(true)
    beat.start()
    (lock, beat)
  }

  /**
   * Write `df` as `nShards` hash-placed, id-sorted, size-bounded
   * `.jsonl.gz` shard families under `path`. Returns the manifest as
   * (file, rows, raw_bytes), also persisted as `_MANIFEST.jsonl` +
   * `_SUCCESS` (in that order — see the write protocol above).
   */
  def writeJsonlShards(df: DataFrame, path: String, idCol: String,
      nShards: Int, maxShardBytes: Long): Seq[(String, Long, Long)] = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(maxShardBytes > 0, s"maxShardBytes must be positive, got $maxShardBytes")
    Sink.requireLocalPath(path)
    val spark = df.sparkSession
    import spark.implicits._
    val dir = new java.io.File(path)
    dir.mkdirs()
    val (lock, beat) = acquireLock(dir, path)
    try {
    // abandoned staging dirs from crashed exports are never published —
    // reap them before staging anew (safe under the lock: only a STALE
    // writer's leavings can be here)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".staging-"))
      .foreach(deleteRec)
    val staging = new java.io.File(dir, s".staging-${System.nanoTime()}")
    require(staging.mkdirs(), s"cannot create staging dir $staging")
    val lines = df
      .select(to_json(struct(df.columns.map(col): _*)).as("j"), col(idCol).as("__id"))
      .repartition(nShards, col("__id"))
      .sortWithinPartitions(col("__id"), col("j"))
      .select(col("j")).as[String]
    val stats = lines.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      // attempt-unique temp suffix: a speculative or retried attempt of
      // this partition must never truncate a sibling attempt's open file
      val attempt = tc.taskAttemptId()
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
            new java.io.FileOutputStream(
              new java.io.File(staging, s"$file.attempt-$attempt"))))
      }
      try {
        it.foreach { j =>
          val bytes = (j + "\n").getBytes(StandardCharsets.UTF_8)
          if (stream != null && raw + bytes.length > maxShardBytes) close()
          if (stream == null) open()
          stream.write(bytes)
          rows += 1L
          raw += bytes.length
        }
        close()
        // partition complete: promote this attempt's finished temp files to
        // the canonical shard names via ATOMIC same-directory move (rename
        // replaces in one step — a delete-then-rename pair would leave a
        // window where a twin killed between the two steps strands the
        // canonical name missing). Racing promotions from a speculative
        // twin are benign — shard bytes are a pure function of the sorted
        // partition, so both attempts move identical bytes
        out.foreach { case (f, _, _) =>
          java.nio.file.Files.move(
            new java.io.File(staging, s"$f.attempt-$attempt").toPath,
            new java.io.File(staging, f).toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
        }
      } finally {
        // a failing task must not leak its open stream; its partial shard
        // stays an attempt-suffixed temp in staging, never promoted,
        // and dies unpublished
        if (stream != null) { stream.close(); stream = null }
      }
      out.iterator
    }.collect().sortBy(_._1).toSeq
    // PUBLISH: retract _SUCCESS first (readers refuse from here on), swap
    // the shard set, manifest, then _SUCCESS last
    val successFile = new java.io.File(dir, "_SUCCESS")
    if (successFile.exists()) require(successFile.delete(), s"cannot retract $successFile")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile &&
        ((f.getName.startsWith("part-") && f.getName.endsWith(".jsonl.gz")) ||
          f.getName == "_MANIFEST.jsonl"))
      .foreach(f => require(f.delete(), s"cannot remove stale $f — aborting before " +
        "a mixed-layout artifact can form"))
    stats.foreach { case (f, _, _) =>
      val (from, to) = (new java.io.File(staging, f), new java.io.File(dir, f))
      require(from.renameTo(to), s"cannot publish shard $f")
    }
    require(staging.delete() || { deleteRec(staging); !staging.exists() },
      s"cannot remove staging dir $staging")
    val manifest = stats.map { case (f, r, b) =>
      s"""{"file":"$f","rows":$r,"raw_bytes":$b}"""
    }.mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_MANIFEST.jsonl"),
      if (manifest.isEmpty) "" else manifest + "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path, "_SUCCESS"), "")
    stats
    } finally {
      beat.interrupt()
      lock.delete(): Unit
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  /** The published manifest's file list, with the integrity checks the
    * artifact exists for: `_SUCCESS` must be present (an interrupted
    * export is refused, never silently partial) and every listed shard
    * must exist on disk. */
  private def manifestEntries(path: String): Seq[(String, Long, Long)] = {
    require(new java.io.File(path, "_SUCCESS").isFile,
      s"export at $path is not published (_SUCCESS missing) — refusing to read " +
        "a possibly-partial artifact")
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(path, "_MANIFEST.jsonl")).asScala
      .filter(_.nonEmpty)
    val rx = """\{"file":"([^"]+)","rows":(\d+),"raw_bytes":(\d+)\}""".r
    lines.map {
      case rx(f, r, b) =>
        require(new java.io.File(path, f).isFile, s"manifest lists $f but it is missing")
        (f, r.toLong, b.toLong)
      case other => throw new IllegalArgumentException(s"malformed manifest line: $other")
    }.toSeq
  }

  /** Read a published export back with an explicit schema (never
    * inference — the manifest's consumer knows its contract). Reads
    * EXACTLY the manifest's file list after the integrity checks; an
    * empty published export reads as an empty frame, not an error. */
  def readJsonlShards(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val files = manifestEntries(path).map(_._1)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).json(files.map(f => s"$path/$f"): _*)
  }

  /** The manifest of a published export: (file, rows, raw_bytes). */
  def readManifest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    manifestEntries(path).toDF("file", "rows", "raw_bytes")
  }

  /** SHA-256 of every published shard, for the registry-digest
    * determinism gate: (file, sha256hex). Refuses unpublished exports —
    * two half-written directories must not compare vacuously equal. */
  def shardDigests(path: String): Seq[(String, String)] =
    manifestEntries(path).map { case (name, _, _) =>
      val f = new java.io.File(path, name)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      (name, md.digest(bytes).map(b => f"$b%02x").mkString)
    }
}
