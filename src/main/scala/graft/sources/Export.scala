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

  /** The write protocol shared by every shard format: lock, reap
    * abandoned staging dirs, stage, run `body` (which writes staged
    * shards and returns the manifest stats), publish, release. One
    * implementation so a new payload encoding can never fork the
    * crash-safety story. */
  private def stagedExport(path: String)(
      body: java.io.File => Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
    Sink.requireLocalPath(path)
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
      val stats = body(staging)
      publishStaged(dir, path, staging, stats)
      stats
    } finally {
      beat.interrupt()
      lock.delete(): Unit
    }
  }

  /** PUBLISH: retract `_SUCCESS` first (readers refuse from here on),
    * swap the shard set (ANY `part-*` file — one artifact per directory
    * is the contract, whatever its payload encoding), manifest, then
    * `_SUCCESS` last. */
  private def publishStaged(dir: java.io.File, path: String, staging: java.io.File,
      stats: Seq[(String, Long, Long)]): Unit = {
    val successFile = new java.io.File(dir, "_SUCCESS")
    if (successFile.exists()) require(successFile.delete(), s"cannot retract $successFile")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile &&
        (f.getName.startsWith("part-") || f.getName == "_MANIFEST.jsonl"))
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
    val spark = df.sparkSession
    import spark.implicits._
    stagedExport(path) { staging =>
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
    stats
    }
  }

  /** Binary shard magic: "GRBS" little-endian, format version 1. */
  private val binMagic: Int = 0x53425247 // "GRBS" read LE
  private val binVersion: Int = 1
  private val binHeaderBytes: Int = 4 + 4 + 4 + 8 + 8 + 8

  /**
   * BINARY token-shard writer — the payload encoding a trainer's loader
   * actually mmaps (the public Megatron-LM / GPT-NeoX `.bin`+`.idx`
   * layout, fused into one self-describing file per shard): token ids as
   * FIXED-WIDTH little-endian integers plus a per-bin offset index, in
   * place of jsonl.gz's ~5-8 decimal bytes + parse per token. Same write
   * protocol, staging discipline, manifest, and digests as
   * [[writeJsonlShards]] (shared [[stagedExport]] machinery), and the
   * same determinism engineering: hash placement by bin key, key-sorted
   * partitions, payload a pure function of the sorted rows.
   *
   * File layout (all integers little-endian):
   * {{{
   *   header : magic "GRBS" (u32) | version (u32) | token_width (u32)
   *          | n_bins (u64) | n_tokens (u64) | index_offset (u64, bytes)
   *   payload: n_tokens ids, token_width bytes each, bins concatenated
   *            in key order
   *   index  : per bin, in payload order:
   *            bin_key (u64) | n_tok (u64) | n_docs (u32)
   *            | per doc: doc_id (u64) | doc_len (u64)
   * }}}
   * The index rides the file tail so the payload streams without
   * buffering; the fixed-size header is patched once per file (a local
   * `RandomAccessFile` seek — bytes stay a pure function of content).
   * `doc_id`/`doc_len` per bin are the attention-boundary metadata
   * ([[graft.operators.TokenShards.packSequences]]'s `doc_ids`/
   * `doc_lens`), so the binary artifact is self-contained for a loader.
   *
   * Input frame contract: `(idCol: long bin key — UNIQUE, the content
   * address; doc_ids: array<long>; doc_lens: array<long>; ids:
   * array<long>)`. An id that does not fit `tokenWidth` bytes, or a
   * duplicate bin key (which would make byte order undefined), fails
   * LOUDLY. Shards roll over when the PAYLOAD would exceed
   * `maxShardBytes` (one oversize bin still writes whole — a bin never
   * splits across files).
   */
  def writeBinaryShards(df: DataFrame, path: String, idCol: String,
      nShards: Int, maxShardBytes: Long, tokenWidth: Int): Seq[(String, Long, Long)] = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(maxShardBytes > 0, s"maxShardBytes must be positive, got $maxShardBytes")
    require(tokenWidth == 2 || tokenWidth == 4,
      s"tokenWidth must be 2 or 4 bytes, got $tokenWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val maxId = if (tokenWidth == 2) 0xffffL else 0xffffffffL
    stagedExport(path) { staging =>
      val rows = df
        .select(col(idCol).cast("long"), col("doc_ids").cast("array<bigint>"),
          col("doc_lens").cast("array<bigint>"), col("ids").cast("array<bigint>"))
        .repartition(nShards, col(idCol))
        .sortWithinPartitions(col(idCol))
        .as[(Long, Seq[Long], Seq[Long], Seq[Long])]
      rows.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val attempt = tc.taskAttemptId()
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var roll = 0
        var stream: java.io.BufferedOutputStream = null
        var file: String = null
        var nBins = 0L
        var nTokens = 0L
        var idxBytes = 0L
        // per-open-file index buffer: bin-count-sized, never token-sized
        var index = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Long], Seq[Long])]
        var lastKey = Long.MinValue
        var first = true
        def writeLe(b: java.io.OutputStream, v: Long, width: Int): Unit = {
          var i = 0
          while (i < width) { b.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
        }
        def close(): Unit = if (stream != null) {
          stream.flush(); stream.close(); stream = null
          // footer index, then patch the header counts in place
          val f = new java.io.File(staging, s"$file.attempt-$attempt")
          val tail = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(f, true))
          index.foreach { case (key, nTok, docIds, docLens) =>
            writeLe(tail, key, 8)
            writeLe(tail, nTok, 8)
            writeLe(tail, docIds.length.toLong, 4)
            docIds.iterator.zip(docLens.iterator).foreach { case (d, l) =>
              writeLe(tail, d, 8); writeLe(tail, l, 8)
            }
          }
          tail.flush(); tail.close()
          val raf = new java.io.RandomAccessFile(f, "rw")
          try {
            val hdr = java.nio.ByteBuffer.allocate(binHeaderBytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            hdr.putInt(binMagic).putInt(binVersion).putInt(tokenWidth)
              .putLong(nBins).putLong(nTokens)
              .putLong(binHeaderBytes.toLong + nTokens * tokenWidth)
            raf.seek(0L); raf.write(hdr.array())
          } finally raf.close()
          // the reader parses a whole file through one byte array with Int
          // positions (the binaryFile contract) — an over-2GiB file is
          // only possible via ONE pathological oversize bin (the rollover
          // bound counts header + payload + index) and must fail here,
          // not there
          require(f.length() <= Int.MaxValue.toLong,
            s"shard $file exceeds the 2 GiB single-file read envelope — " +
              "split the oversize bin (or lower maxShardBytes below 2 GiB)")
          out += ((file, nBins, f.length()))
          nBins = 0L; nTokens = 0L; idxBytes = 0L
          index = scala.collection.mutable.ArrayBuffer.empty
        }
        def open(): Unit = {
          file = f"part-$pid%05d-$roll%04d.grbs"
          roll += 1
          stream = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(
              new java.io.File(staging, s"$file.attempt-$attempt")))
          // header placeholder (patched at close)
          stream.write(new Array[Byte](binHeaderBytes))
        }
        try {
          it.foreach { case (key, docIds, docLens, ids) =>
            require(first || key != lastKey,
              s"duplicate bin key $key — byte order would be undefined")
            first = false; lastKey = key
            require(docIds.length == docLens.length,
              s"bin $key: doc_ids and doc_lens lengths differ")
            val payloadBytes = ids.length.toLong * tokenWidth
            // roll on the WHOLE file size (header + payload + index), not
            // payload alone: many small bins carry real index mass
            // (20 B + 16 B/doc each), and a payload-only bound could
            // silently burst maxShardBytes — and the 2 GiB read envelope —
            // through index overhead
            val binIndexBytes = 20L + 16L * docIds.length
            if (stream != null &&
                binHeaderBytes + nTokens * tokenWidth + idxBytes +
                  payloadBytes + binIndexBytes > maxShardBytes)
              close()
            if (stream == null) open()
            ids.foreach { id =>
              require(id >= 0L && id <= maxId,
                s"token id $id does not fit tokenWidth=$tokenWidth bytes")
              writeLe(stream, id, tokenWidth)
            }
            index += ((key, ids.length.toLong, docIds, docLens))
            nBins += 1L; nTokens += ids.length.toLong
            idxBytes += binIndexBytes
          }
          close()
          out.foreach { case (f, _, _) =>
            java.nio.file.Files.move(
              new java.io.File(staging, s"$f.attempt-$attempt").toPath,
              new java.io.File(staging, f).toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
          }
        } finally {
          if (stream != null) { stream.close(); stream = null }
        }
        out.iterator
      }.collect().sortBy(_._1).toSeq
    }
  }

  /** Read a published [[writeBinaryShards]] artifact back as
    * `(bin_key, doc_ids, doc_lens, ids, n_docs, n_tokens)` — a
    * DISTRIBUTED binaryFile scan over exactly the manifest's file list
    * (shard files are `maxShardBytes`-bounded, so a whole file per task
    * is the WARC-reader contract), parsed through the header/index/
    * payload layout with every structural invariant `require`d. */
  def readBinaryShards(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = manifestEntries(path).map(_._1)
    if (files.isEmpty)
      return spark.emptyDataset[(Long, Seq[Long], Seq[Long], Seq[Long], Long, Long)]
        .toDF("bin_key", "doc_ids", "doc_lens", "ids", "n_docs", "n_tokens")
    spark.read.format("binaryFile")
      .load(files.map(f => s"$path/$f"): _*)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        require(buf.remaining() >= binHeaderBytes, "binary shard truncated below header")
        require(buf.getInt() == binMagic, "not a GRBS binary shard (bad magic)")
        require(buf.getInt() == binVersion, "unsupported GRBS version")
        val width = buf.getInt()
        require(width == 2 || width == 4, s"bad token width $width")
        val nBins = buf.getLong()
        val nTokens = buf.getLong()
        val indexOffset = buf.getLong()
        require(indexOffset == binHeaderBytes.toLong + nTokens * width,
          "index offset disagrees with the token count")
        require(indexOffset <= bytes.length, "binary shard truncated below its index")
        val idx = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        idx.position(indexOffset.toInt)
        var tokenPos = binHeaderBytes.toLong
        // materialize the bins EAGERLY (the file is maxShardBytes-bounded
        // and already whole in memory) so the exact-consumption checks
        // below can run after the last record — a lazy iterator would
        // return before they fire
        val bins = (0L until nBins).map { _ =>
          require(idx.remaining() >= 20, "GRBS index truncated mid-record")
          val key = idx.getLong()
          val nTok = idx.getLong()
          val nDocs = idx.getInt()
          require(nTok >= 0L && tokenPos + nTok * width <= indexOffset,
            "GRBS index claims a token span beyond the payload — corrupt shard")
          require(nDocs >= 0 && idx.remaining() >= 16L * nDocs,
            "GRBS index truncated inside a bin's doc table")
          val docIds = new Array[Long](nDocs)
          val docLens = new Array[Long](nDocs)
          var d = 0
          while (d < nDocs) { docIds(d) = idx.getLong(); docLens(d) = idx.getLong(); d += 1 }
          val ids = new Array[Long](nTok.toInt)
          val pay = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          pay.position(tokenPos.toInt)
          var t = 0
          while (t < nTok) {
            ids(t) = if (width == 2) (pay.getShort() & 0xffffL)
              else (pay.getInt() & 0xffffffffL)
            t += 1
          }
          tokenPos += nTok * width
          (key, docIds.toSeq, docLens.toSeq, ids.toSeq, nDocs.toLong, nTok)
        }
        // the index must consume the file EXACTLY: payload bytes beyond the
        // last bin's span, or trailing garbage after the last index record,
        // are a corrupted/concatenated artifact and must fail at the door —
        // the same loud-contract discipline the writer advertises
        require(tokenPos == indexOffset,
          s"GRBS payload has ${indexOffset - tokenPos} bytes beyond the last " +
            "bin's span — corrupt or concatenated shard")
        require(idx.position() == bytes.length,
          s"GRBS shard has ${bytes.length - idx.position()} trailing bytes " +
            "after the last index record — corrupt or concatenated shard")
        bins.iterator
      }
      .toDF("bin_key", "doc_ids", "doc_lens", "ids", "n_docs", "n_tokens")
  }

  private val maskMagic: Int = 0x4d425247 // "GRBM" read LE
  private val maskVersion: Int = 1
  private val maskHeaderBytes: Int = 4 + 4 + 4 + 8 + 8 + 8 + 8

  /**
   * MASKED binary shard writer — the [[writeBinaryShards]] layout with a
   * LOSS-MASK channel, the payload an SFT/preference trainer mmaps: ids
   * as fixed-width LE integers AND a bit-packed per-token mask, so the
   * loader reads "which positions train" without parsing anything. One
   * mask BIT per token (LSB-first within each byte) costs ~3% of a
   * 4-byte-id payload — a byte-per-token mask channel would cost 25%.
   *
   * File layout (all integers little-endian):
   * {{{
   *   header : magic "GRBM" (u32) | version (u32) | token_width (u32)
   *          | n_bins (u64) | n_tokens (u64) | mask_bytes (u64)
   *          | index_offset (u64)
   *   payload: n_tokens ids, token_width bytes each, bins in key order
   *   mask   : per bin ceil(n_tok/8) bytes, LSB-first, BYTE-ALIGNED per
   *            bin (a loader slices one bin's mask without bit offsets;
   *            padding bits are zero), bins in key order
   *   index  : as GRBS — bin_key (u64) | n_tok (u64) | n_docs (u32)
   *            | per doc: doc_id (u64) | doc_len (u64)
   * }}}
   * Same staging/manifest/digest protocol ([[stagedExport]]) and the
   * same streaming discipline: the mask section streams through a
   * per-file side temp that is appended at close, so in-memory state
   * stays BIN-COUNT-sized (never token-sized) exactly like the GRBS
   * writer. Input frame contract: `(idCol: long UNIQUE bin key;
   * doc_ids; doc_lens; ids: array<long>; mask: array<long> of 0/1,
   * positionally aligned with ids)` — a mask/ids length mismatch or a
   * non-bit mask value fails LOUDLY per bin.
   */
  def writeMaskedBinaryShards(df: DataFrame, path: String, idCol: String,
      nShards: Int, maxShardBytes: Long, tokenWidth: Int): Seq[(String, Long, Long)] = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(maxShardBytes > 0, s"maxShardBytes must be positive, got $maxShardBytes")
    require(tokenWidth == 2 || tokenWidth == 4,
      s"tokenWidth must be 2 or 4 bytes, got $tokenWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val maxId = if (tokenWidth == 2) 0xffffL else 0xffffffffL
    stagedExport(path) { staging =>
      val rows = df
        .select(col(idCol).cast("long"), col("doc_ids").cast("array<bigint>"),
          col("doc_lens").cast("array<bigint>"), col("ids").cast("array<bigint>"),
          col("mask").cast("array<bigint>"))
        .repartition(nShards, col(idCol))
        .sortWithinPartitions(col(idCol))
        .as[(Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long])]
      rows.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val attempt = tc.taskAttemptId()
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var roll = 0
        var stream: java.io.BufferedOutputStream = null
        var maskStream: java.io.BufferedOutputStream = null
        var file: String = null
        var nBins = 0L
        var nTokens = 0L
        var maskBytes = 0L
        var idxBytes = 0L
        var index = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[Long], Seq[Long])]
        var lastKey = Long.MinValue
        var first = true
        def writeLe(b: java.io.OutputStream, v: Long, width: Int): Unit = {
          var i = 0
          while (i < width) { b.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
        }
        def maskTemp = new java.io.File(staging, s"$file.attempt-$attempt.mask")
        def close(): Unit = if (stream != null) {
          stream.flush(); stream.close(); stream = null
          maskStream.flush(); maskStream.close(); maskStream = null
          val f = new java.io.File(staging, s"$file.attempt-$attempt")
          val tail = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(f, true))
          // mask section (streamed via the side temp), then the index
          java.nio.file.Files.copy(maskTemp.toPath, tail): Unit
          require(maskTemp.delete(), s"cannot remove mask temp for $file")
          index.foreach { case (key, nTok, docIds, docLens) =>
            writeLe(tail, key, 8)
            writeLe(tail, nTok, 8)
            writeLe(tail, docIds.length.toLong, 4)
            docIds.iterator.zip(docLens.iterator).foreach { case (d, l) =>
              writeLe(tail, d, 8); writeLe(tail, l, 8)
            }
          }
          tail.flush(); tail.close()
          val raf = new java.io.RandomAccessFile(f, "rw")
          try {
            val hdr = java.nio.ByteBuffer.allocate(maskHeaderBytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            hdr.putInt(maskMagic).putInt(maskVersion).putInt(tokenWidth)
              .putLong(nBins).putLong(nTokens).putLong(maskBytes)
              .putLong(maskHeaderBytes.toLong + nTokens * tokenWidth + maskBytes)
            raf.seek(0L); raf.write(hdr.array())
          } finally raf.close()
          require(f.length() <= Int.MaxValue.toLong,
            s"shard $file exceeds the 2 GiB single-file read envelope — " +
              "split the oversize bin (or lower maxShardBytes below 2 GiB)")
          out += ((file, nBins, f.length()))
          nBins = 0L; nTokens = 0L; maskBytes = 0L; idxBytes = 0L
          index = scala.collection.mutable.ArrayBuffer.empty
        }
        def open(): Unit = {
          file = f"part-$pid%05d-$roll%04d.grbm"
          roll += 1
          stream = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(
              new java.io.File(staging, s"$file.attempt-$attempt")))
          stream.write(new Array[Byte](maskHeaderBytes))
          maskStream = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(maskTemp))
        }
        try {
          it.foreach { case (key, docIds, docLens, ids, mask) =>
            require(first || key != lastKey,
              s"duplicate bin key $key — byte order would be undefined")
            first = false; lastKey = key
            require(docIds.length == docLens.length,
              s"bin $key: doc_ids and doc_lens lengths differ")
            require(mask != null && mask.length == ids.length,
              s"bin $key: mask and ids lengths differ")
            val binMaskBytes = (ids.length.toLong + 7L) / 8L
            val payloadBytes = ids.length.toLong * tokenWidth
            val binIndexBytes = 20L + 16L * docIds.length
            if (stream != null &&
                maskHeaderBytes + nTokens * tokenWidth + maskBytes + idxBytes +
                  payloadBytes + binMaskBytes + binIndexBytes > maxShardBytes)
              close()
            if (stream == null) open()
            ids.foreach { id =>
              require(id >= 0L && id <= maxId,
                s"token id $id does not fit tokenWidth=$tokenWidth bytes")
              writeLe(stream, id, tokenWidth)
            }
            var acc = 0
            var bit = 0
            mask.foreach { m =>
              require(m == 0L || m == 1L, s"bin $key: mask value $m is not a bit")
              acc |= (m.toInt << bit)
              bit += 1
              if (bit == 8) { maskStream.write(acc); acc = 0; bit = 0 }
            }
            if (bit > 0) maskStream.write(acc) // zero-padded tail bits
            index += ((key, ids.length.toLong, docIds, docLens))
            nBins += 1L; nTokens += ids.length.toLong
            maskBytes += binMaskBytes; idxBytes += binIndexBytes
          }
          close()
          out.foreach { case (f, _, _) =>
            java.nio.file.Files.move(
              new java.io.File(staging, s"$f.attempt-$attempt").toPath,
              new java.io.File(staging, f).toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
          }
        } finally {
          if (stream != null) { stream.close(); stream = null }
          if (maskStream != null) { maskStream.close(); maskStream = null }
        }
        out.iterator
      }.collect().sortBy(_._1).toSeq
    }
  }

  /** Read a published [[writeMaskedBinaryShards]] artifact back as
    * `(bin_key, doc_ids, doc_lens, ids, mask, n_docs, n_tokens)` —
    * the [[readBinaryShards]] contract plus the decoded mask channel;
    * every structural invariant (section bounds, exact consumption,
    * ZERO padding bits) is `require`d at the door. */
  def readMaskedBinaryShards(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import spark.implicits._
    val files = manifestEntries(path).map(_._1)
    if (files.isEmpty)
      return spark.emptyDataset[
          (Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long], Long, Long)]
        .toDF("bin_key", "doc_ids", "doc_lens", "ids", "mask", "n_docs", "n_tokens")
    spark.read.format("binaryFile")
      .load(files.map(f => s"$path/$f"): _*)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        require(buf.remaining() >= maskHeaderBytes, "masked shard truncated below header")
        require(buf.getInt() == maskMagic, "not a GRBM masked binary shard (bad magic)")
        require(buf.getInt() == maskVersion, "unsupported GRBM version")
        val width = buf.getInt()
        require(width == 2 || width == 4, s"bad token width $width")
        val nBins = buf.getLong()
        val nTokens = buf.getLong()
        val maskBytesTotal = buf.getLong()
        val indexOffset = buf.getLong()
        val maskStart = maskHeaderBytes.toLong + nTokens * width
        require(indexOffset == maskStart + maskBytesTotal,
          "index offset disagrees with the token/mask counts")
        require(indexOffset <= bytes.length, "masked shard truncated below its index")
        val idx = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        idx.position(indexOffset.toInt)
        var tokenPos = maskHeaderBytes.toLong
        var maskPos = maskStart
        val bins = (0L until nBins).map { _ =>
          require(idx.remaining() >= 20, "GRBM index truncated mid-record")
          val key = idx.getLong()
          val nTok = idx.getLong()
          val nDocs = idx.getInt()
          require(nTok >= 0L && tokenPos + nTok * width <= maskStart,
            "GRBM index claims a token span beyond the payload — corrupt shard")
          val binMaskBytes = (nTok + 7L) / 8L
          require(maskPos + binMaskBytes <= indexOffset,
            "GRBM index claims a mask span beyond the mask section — corrupt shard")
          require(nDocs >= 0 && idx.remaining() >= 16L * nDocs,
            "GRBM index truncated inside a bin's doc table")
          val docIds = new Array[Long](nDocs)
          val docLens = new Array[Long](nDocs)
          var d = 0
          while (d < nDocs) { docIds(d) = idx.getLong(); docLens(d) = idx.getLong(); d += 1 }
          val ids = new Array[Long](nTok.toInt)
          val pay = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          pay.position(tokenPos.toInt)
          var t = 0
          while (t < nTok) {
            ids(t) = if (width == 2) (pay.getShort() & 0xffffL)
              else (pay.getInt() & 0xffffffffL)
            t += 1
          }
          val mask = new Array[Long](nTok.toInt)
          var mb = 0
          while (mb < binMaskBytes) {
            val b = bytes((maskPos + mb).toInt) & 0xff
            var bit = 0
            while (bit < 8) {
              val pos = mb * 8 + bit
              if (pos < nTok) mask(pos) = ((b >> bit) & 1).toLong
              else require(((b >> bit) & 1) == 0,
                s"bin $key: nonzero mask padding bit — corrupt shard")
              bit += 1
            }
            mb += 1
          }
          tokenPos += nTok * width
          maskPos += binMaskBytes
          (key, docIds.toSeq, docLens.toSeq, ids.toSeq, mask.toSeq, nDocs.toLong, nTok)
        }
        require(tokenPos == maskStart,
          s"GRBM payload has ${maskStart - tokenPos} bytes beyond the last " +
            "bin's span — corrupt or concatenated shard")
        require(maskPos == indexOffset,
          s"GRBM mask section has ${indexOffset - maskPos} bytes beyond the " +
            "last bin's span — corrupt or concatenated shard")
        require(idx.position() == bytes.length,
          s"GRBM shard has ${bytes.length - idx.position()} trailing bytes " +
            "after the last index record — corrupt or concatenated shard")
        bins.iterator
      }
      .toDF("bin_key", "doc_ids", "doc_lens", "ids", "mask", "n_docs", "n_tokens")
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
