package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/**
 * Write-path layouts — the sink half of the source/sink surface. The
 * reference has no sinks of its own (SURVEY §2: inputs/outputs delegate to
 * Spark); these are the three layouts a 100 TB curation pipeline actually
 * ships:
 *
 *  - HIVE-PARTITIONED: one directory per partition value, so downstream
 *    readers prune whole directories (`spark.read.parquet(path).where(...)`
 *    never lists pruned dirs);
 *  - RANGE-SORTED: files carry non-overlapping key ranges, so parquet
 *    min/max footer stats let a point/range filter skip whole FILES —
 *    the persisted form of the `groupSortByRange` layout (pair with
 *    `ZOrder.interleave` for multi-column locality);
 *  - size-bounded: every writer takes `maxRecordsPerFile`, the lever that
 *    keeps single files splittable and avoids the 10 GB straggler file a
 *    skewed partition would otherwise produce.
 */
object Sink {

  /**
   * Hive-style partitioned parquet: `path/col=value/part-*.parquet`.
   * Rows are pre-shuffled onto their partition columns so each output
   * directory is written by few tasks (without this, EVERY task holds a
   * writer per live partition value — the classic small-files explosion:
   * tasks × partitions files instead of ~partitions).
   */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /**
   * Range-sorted parquet: `repartitionByRange(sortCols)` +
   * `sortWithinPartitions` means file i holds keys strictly below file
   * i+1's — parquet footer min/max then prune at FILE granularity for any
   * prefix filter on `sortCols`. This is the sorted-sink posture
   * `groupSortByRange` establishes in-memory, made durable.
   */
  def writeRangeSortedParquet(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int = -1, maxRecordsPerFile: Long = 1000000L): Unit = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val keys = sortCols.map(col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, keys: _*)
      else df.repartitionByRange(keys: _*)
    ranged.sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /**
   * IDEMPOTENT keyed upsert into a MANIFEST-COMMITTED bucket store — the
   * merge step that turns at-least-once delivery into effectively-once
   * ingestion. The winning row per key is the MAX of `struct(versionCol,
   * <other columns>)` — a total, deterministic order (last-writer-wins by
   * version; remaining columns break exact-version ties), so merge order
   * and replays cannot change the surviving row set.
   *
   * CRASH SAFETY (why a manifest, not overwrite-in-place): an in-place
   * dynamic partition overwrite deletes the old files before the new ones
   * are durable, so a crash inside the commit window loses store rows a
   * replay cannot restore. Here every upsert writes its merged buckets to
   * a FRESH epoch directory and then publishes a new numbered manifest
   * (`manifest-<n>.mf`, written to a temp name and renamed — rename to a
   * new name is atomic); readers resolve the highest-numbered manifest.
   * THIS implementation commits via driver-local file I/O and requires a
   * local (or file:) store root — see [[requireLocalPath]] for the
   * distributed-FS porting note. A crash at ANY point leaves the previous
   * manifest and every directory it references untouched — the replayed
   * batch then re-merges against the intact store. Superseded epoch
   * directories are garbage, not corruption; reclaim them with
   * [[vacuumStore]] when no reader needs old manifests.
   *
   * SCALE SHAPE: buckets are `__bucket = pmod(xxhash64(key), nBuckets)`;
   * a batch only READS and REWRITES the buckets its keys hash into —
   * ingest cost is proportional to touched-bucket mass, not store mass,
   * which is what makes per-hour batches against a 100 TB store feasible.
   * Driver-side state is the manifest (nBuckets-bounded lines) and the
   * touched-bucket list. Size `nBuckets` so one bucket ≈ a few files.
   *
   * Contract: key and version are non-null (null rows are dropped); every
   * batch carries the same schema; columns must be orderable (the struct
   * max). `__bucket`/`__pb` are reserved. Single writer at a time (the
   * streaming face serializes micro-batches; concurrent independent
   * writers would race on the manifest number and one would retry/fail).
   * Read the store back with [[readStore]] — the root directory holds
   * every epoch, so a raw `spark.read.parquet(root)` would see stale rows.
   */
  def upsertBuckets(storePath: String, batch: DataFrame, keyCol: String,
      versionCol: String, nBuckets: Int,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    import org.apache.spark.sql.functions._
    require(nBuckets >= 1 && nBuckets <= 1000000, s"nBuckets must be in [1,1e6], got $nBuckets")
    requireLocalPath(storePath)
    Seq("__bucket", "__pb").foreach(c =>
      require(!batch.columns.contains(c), s"$c is reserved by upsertBuckets"))
    val spark = batch.sparkSession
    val dataCols = batch.columns.toSeq // fixed order: (version, others) struct is stable
    // persist: the batch pipeline feeds TWO actions (the touched-bucket
    // collect and the epoch write) — without the cache an expensive or
    // non-deterministic upstream would run twice, and a non-deterministic
    // one could write buckets the manifest never lists
    val withB = batch
      .where(col(keyCol).isNotNull && col(versionCol).isNotNull)
      .withColumn("__bucket", pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
    val (manifestN, entries) = latestManifest(storePath)
    // nBuckets-bounded driver list — selects which store dirs to read/merge
    val touched = withB.select(col("__bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    // an effectively-empty batch is a NO-OP: publishing would at best clone
    // the manifest — and on a virgin store it would commit an ENTRY-LESS
    // manifest-1, after which storeExists() is true while readStore()
    // rejects forever (the first-batch-empty poisoning)
    if (touched.isEmpty) return // the finally below unpersists withB
    val currentDirs = entries.filter { case (b, _) => touched(b) }.values.toSeq
    val merged =
      if (currentDirs.isEmpty) withB
      else {
        val current = spark.read
          .parquet(currentDirs.map(d => s"${sparkDataRoot(storePath)}/$d"): _*)
          .select(withB.columns.map(col): _*) // align column order
        current.unionByName(withB)
      }
    val ordered = col(versionCol) +: dataCols.filterNot(_ == versionCol).map(col) :+ col("__bucket")
    val winner = merged
      .groupBy(col(keyCol))
      .agg(max(struct(ordered: _*)).as("__m"))
      .select(col(keyCol) +: (dataCols.filterNot(_ == keyCol).map(c => col(s"__m.$c").as(c))
        :+ col("__m.__bucket").as("__bucket")): _*)
    // fresh epoch dir: one job writes every touched bucket's merged rows
    // under epoch/__pb=<bucket>; __bucket stays a DATA column (the
    // partition copy __pb is what the directory layout strips)
    val epoch = f"e-${java.util.UUID.randomUUID().toString.take(8)}-${manifestN + 1}%09d"
    winner
      .withColumn("__pb", col("__bucket"))
      .repartition(col("__pb"))
      .write.mode(SaveMode.ErrorIfExists)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("__pb")
      .parquet(s"${sparkDataRoot(storePath)}/$epoch")
    val newEntries = entries ++ touched.map(b => b -> s"$epoch/__pb=$b").toMap
    publishManifest(storePath, manifestN + 1, newEntries)
    } finally { withB.unpersist(); () }
  }

  /**
   * SNAPSHOT-INDEX write: persist a standing derived asset (an IVF
   * assignment, a banded minhash index, a postings frame) under the SAME
   * manifest commit discipline as [[upsertBuckets]] — fresh epoch
   * directory, then an atomically-renamed next-numbered manifest — so a
   * session can LOAD the index instead of rebuilding it, and a crash
   * mid-write leaves the previous index version fully readable. Unlike
   * the keyed store this is whole-asset REPLACE semantics (an index
   * rebuild supersedes the old version outright; the old epoch becomes
   * [[vacuumStore]]-able garbage).
   *
   * `partitionCols` lay the epoch out one directory per value — pass the
   * probe key (`cent_id`, `band`) so a reader that filters on the
   * partition copy prunes whole directories. Partition values are
   * written via `__p_<col>` COPY columns (the [[upsertBuckets]] `__pb`
   * trick): the original column survives as parquet DATA with its exact
   * type — directory-name type re-inference can never mangle the schema —
   * and [[readIndex]] drops the copies, so a write→read round trip is
   * column-identical to the input frame. Scale-out readers wanting
   * directory pruning filter on `__p_<col>` via a raw read of the epoch
   * path; the in-session consumers here read the whole index once and
   * persist it.
   */
  def writeIndex(df: DataFrame, indexPath: String, partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    requireLocalPath(indexPath)
    partitionCols.foreach(c => require(df.columns.contains(c),
      s"partition column $c not in ${df.columns.mkString(",")}"))
    require(!df.columns.exists(_.startsWith("__p_")),
      s"the __p_ column prefix is reserved by writeIndex, got ${df.columns.mkString(",")}")
    val (n, _) = latestManifest(indexPath)
    val epoch = f"e-${java.util.UUID.randomUUID().toString.take(8)}-${n + 1}%09d"
    val copies = partitionCols.map(c => s"__p_$c")
    val withCopies = partitionCols.zip(copies).foldLeft(df) {
      case (acc, (c, p)) => acc.withColumn(p, col(c))
    }
    val laid =
      if (copies.isEmpty) withCopies
      // repartition on the copies first: one task per partition value keeps
      // the write at ~one file per directory (the upsertBuckets discipline)
      else withCopies.repartition(copies.map(col): _*)
    val writer = laid.write.mode(SaveMode.ErrorIfExists)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (copies.isEmpty) writer else writer.partitionBy(copies: _*))
      .parquet(s"${sparkDataRoot(indexPath)}/$epoch")
    // a ZERO-ROW partitioned write leaves a file-less epoch (partitionBy
    // writes no parquet for no rows); committing its manifest would poison
    // the store forever — indexExists() true while readIndex() can never
    // infer a schema, and load-or-build callers skip the rebuild branch
    // (the upsertBuckets first-batch-empty rule, applied to snapshots).
    // Leaving the store uncommitted is correct: an empty index rebuilds
    // from scratch next session for free. Checked on the written FILES,
    // not df.isEmpty, so the frame is never evaluated twice.
    val epochDir = new java.io.File(
      new java.net.URI(s"${sparkDataRoot(indexPath)}/$epoch"))
    def hasParquet(f: java.io.File): Boolean =
      f.isFile && f.getName.endsWith(".parquet") ||
        f.isDirectory && Option(f.listFiles()).exists(_.exists(hasParquet))
    if (hasParquet(epochDir)) publishManifest(indexPath, n + 1, Map(0L -> epoch))
  }

  /** Resolve the CURRENT committed snapshot of a [[writeIndex]] store and
    * strip the `__p_` partition copies — the returned frame is
    * column-identical (names, types, order) to the frame that was written. */
  def readIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String): DataFrame = {
    val raw = readStore(spark, indexPath)
    raw.drop(raw.columns.filter(_.startsWith("__p_")).toIndexedSeq: _*)
  }

  /** True once a first index snapshot has committed. */
  def indexExists(indexPath: String): Boolean = storeExists(indexPath)

  /** The manifest machinery does driver-local file I/O (java.nio) — a
    * distributed-FS store root would silently read an EMPTY manifest and
    * orphan all committed data. Reject loudly; porting to HDFS/S3 means
    * reimplementing latestManifest/publishManifest/vacuumStore over the
    * Hadoop FileSystem API (rename-to-new-name is atomic there too). */
  private[sources] def requireLocalPath(storePath: String): Unit =
    require(!storePath.contains("://") || storePath.startsWith("file:"),
      s"upsert store requires a driver-local (or file:) path, got $storePath — " +
        "the manifest commit protocol does local file I/O")

  /** The root EVERY Spark data read/write must use: explicit `file:` on an
    * absolute path. A scheme-less path would resolve against
    * `fs.defaultFS` — on a cluster where that is HDFS/S3 the parquet
    * epochs would land on the distributed FS while the manifest I/O stays
    * driver-local java.nio, a silent split-brain store (vacuum reclaims
    * nothing, other drivers see no data). Pinning the scheme keeps data and
    * manifest on the SAME filesystem whatever defaultFS says. */
  private def sparkDataRoot(storePath: String): String =
    "file:" + localRoot(storePath)

  /** The same root as a plain local path for the java.nio manifest I/O —
    * the inverse normalization of [[sparkDataRoot]], so a `file:`-prefixed
    * store root works on both sides. */
  private def localRoot(storePath: String): String = {
    val p = if (storePath.startsWith("file://")) storePath.stripPrefix("file://")
            else if (storePath.startsWith("file:")) storePath.stripPrefix("file:")
            else storePath
    new java.io.File(p).getAbsolutePath
  }

  /** The tombstone side-store of a keyed upsert store — a directory name
    * that can never collide with an `e-*` epoch, so the parent's
    * [[vacuumStore]] walks past it. */
  private def deletesPath(storePath: String): String = s"${localRoot(storePath)}/__deletes"

  /**
   * DELETE-BY-KEY that survives compaction — the takedown-compliance
   * primitive the last-writer-wins upsert alone cannot express: appends
   * `(key, version)` TOMBSTONES to the store's side-store
   * `<root>/__deletes`, itself a manifest-committed bucket store, so
   * deletes inherit the whole discipline (idempotent under replay,
   * crash-safe, compactable, vacuumable). [[readStore]] applies tombstones
   * at read time: a row is DEAD iff a tombstone for its key carries
   * version >= the row's version — a LATER re-ingest (strictly higher
   * version) resurrects the key (takedown-then-relicense), while replayed
   * older batches cannot; an exact version tie dies (takedown wins —
   * the conservative direction for compliance). [[compactStore]] purges
   * dead rows PHYSICALLY (the bytes leave the parent store) while the
   * tombstones persist in the side-store, so a post-compaction replay of
   * an old batch still cannot resurrect the key.
   *
   * Contract: `keys` carries exactly the (keyCol, versionCol) columns, in
   * that order, with the SAME names as the parent store's key and version
   * columns — [[readStore]] recovers which is which from the side-store's
   * column order.
   */
  def deleteKeys(storePath: String, keys: DataFrame, keyCol: String,
      versionCol: String, nBuckets: Int): Unit =
    upsertBuckets(deletesPath(storePath), keys.select(col(keyCol), col(versionCol)),
      keyCol, versionCol, nBuckets)

  /** Anti-join `rows` against the store's tombstones (if any): a row dies
    * when a tombstone for its key has version >= the row's version. The
    * tombstone frame's own column order names the key and version. */
  private def applyDeletes(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rows: DataFrame): DataFrame = {
    val dp = deletesPath(storePath)
    if (!storeExists(dp)) rows
    else {
      val tombs = readStore(spark, dp) // terminates: a side-store has no side-store
      val dataCols = tombs.columns.filterNot(_ == "__bucket")
      require(dataCols.length == 2,
        s"tombstone store under $dp carries ${dataCols.mkString(",")} — expected (key, version)")
      val (keyCol, versionCol) = (dataCols(0), dataCols(1))
      val t = tombs.select(col(keyCol).as("__del_key"), col(versionCol).as("__del_v"))
      rows.join(t,
        rows(keyCol) === t("__del_key") && rows(versionCol) <= t("__del_v"),
        "left_anti")
    }
  }

  /** Resolve the CURRENT committed view of an upsert store: the bucket
    * directories the highest-numbered manifest references (superseded
    * epochs are invisible), minus tombstoned keys ([[deleteKeys]]).
    * Returns an empty-schema-less error if the store has never
    * committed — check with [[storeExists]] first when that is a legal
    * state. */
  def readStore(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame = {
    requireLocalPath(storePath)
    val (_, entries) = latestManifest(storePath)
    require(entries.nonEmpty, s"no committed manifest under $storePath")
    applyDeletes(spark, storePath,
      spark.read.parquet(entries.values.toSeq.map(d => s"${sparkDataRoot(storePath)}/$d"): _*))
  }

  /** True once a first manifest has committed. */
  def storeExists(storePath: String): Boolean = latestManifest(storePath)._1 > 0

  /**
   * COMPACT the store: rewrite every live bucket into ONE fresh epoch
   * under the exact commit discipline of [[upsertBuckets]] (fresh epoch
   * directory, then an atomically-renamed next-numbered manifest). After
   * many incremental batches the live buckets are scattered across many
   * epoch directories — each batch leaves its touched buckets in a new
   * epoch while untouched buckets keep pointing into older ones, so
   * directory count (and, where `maxRecordsPerFile` split a hot bucket,
   * file count) grows with batch history and [[vacuumStore]] can reclaim
   * an old epoch only once NO bucket references it. Compaction collapses
   * the committed view to one directory per bucket in one epoch (one file
   * per bucket up to `maxRecordsPerFile`), making every older epoch
   * vacuum-able garbage. The committed row set is VALUE-IDENTICAL before
   * and after (no winner recompute — the store is already deduped), with
   * one deliberate exception: rows dead under a [[deleteKeys]] tombstone
   * are PHYSICALLY PURGED — compaction is where a takedown's bytes
   * actually leave the store (the tombstones persist in the side-store,
   * so a post-compaction replay of an old batch still cannot resurrect
   * the key). A crash at any point leaves the previous manifest view
   * intact, same as an upsert crash. Run it like any maintenance job:
   * quiesced writer, then [[vacuumStore]].
   */
  def compactStore(spark: org.apache.spark.sql.SparkSession, storePath: String,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    requireLocalPath(storePath)
    val (n, entries) = latestManifest(storePath)
    require(entries.nonEmpty, s"no committed manifest under $storePath")
    val raw = spark.read
      .parquet(entries.values.toSeq.map(d => s"${sparkDataRoot(storePath)}/$d"): _*)
    val live = applyDeletes(spark, storePath, raw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // tombstones can empty whole buckets; their manifest entries must go
      // (a zero-row partitionBy writes no dir, and a dangling entry would
      // fail every readStore). nBuckets-bounded driver list.
      val liveBuckets = live.select(col("__bucket")).distinct()
        .collect().map(_.getLong(0)).toSet
      // a 100%-deleted store cannot express "no buckets" in this manifest
      // format (an entry-less manifest is the documented poisoning state) —
      // fall back to a bit-identical rewrite; tombstones still hide every
      // row at read time, only the physical purge waits for a live row
      val (out, outBuckets) =
        if (liveBuckets.isEmpty) (raw, entries.keys.toSet) else (live, liveBuckets)
      val epoch = f"e-${java.util.UUID.randomUUID().toString.take(8)}-${n + 1}%09d"
      out
        .withColumn("__pb", col("__bucket"))
        .repartition(col("__pb"))
        .write.mode(SaveMode.ErrorIfExists)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy("__pb")
        .parquet(s"${sparkDataRoot(storePath)}/$epoch")
      publishManifest(storePath, n + 1, outBuckets.map(b => b -> s"$epoch/__pb=$b").toMap)
    } finally { live.unpersist(); () }
  }

  /** Delete epoch directories the LATEST manifest no longer references and
    * all superseded manifest files. Run only when no reader still resolves
    * an older manifest (quiescent maintenance, like any snapshot GC). */
  def vacuumStore(storePath: String): Unit = {
    val (n, entries) = latestManifest(storePath)
    if (n == 0) return
    val live = entries.values.map(_.split("/")(0)).toSet
    val root = new java.io.File(localRoot(storePath))
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith("e-") && !live(f.getName)) deleteRec(f)
      if (f.isFile && f.getName.startsWith("manifest-") &&
        manifestNumber(f.getName).exists(_ < n)) { f.delete(); () }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

  private def manifestNumber(name: String): Option[Long] =
    // {9,}: publishManifest's %09d zero-PADS but widens past 999,999,999 —
    // an exactly-9 pattern would silently resolve the stale previous
    // manifest once the store's billionth batch commits
    "manifest-([0-9]{9,})\\.mf".r.findFirstMatchIn(name).map(_.group(1).toLong)

  /** (highest manifest number, bucket -> relative dir); (0, empty) for a
    * store that never committed. Format: one `<bucket>\t<relpath>` line per
    * bucket — trivially parseable, no JSON dependency. */
  private def latestManifest(storePath: String): (Long, Map[Long, String]) = {
    val root = new java.io.File(localRoot(storePath))
    val manifests = Option(root.listFiles()).getOrElse(Array.empty)
      .flatMap(f => manifestNumber(f.getName).map(_ -> f))
    if (manifests.isEmpty) (0L, Map.empty)
    else {
      val (n, f) = manifests.maxBy(_._1)
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try {
        val entries = src.getLines()
          .filter(_.nonEmpty).map { line =>
            val Array(b, d) = line.split("\t", 2)
            b.toLong -> d
          }.toMap
        (n, entries)
      } finally src.close()
    }
  }

  /** Write manifest n to a temp name, then RENAME to its final numbered
    * name — rename-to-a-new-name is atomic, so readers see either the
    * previous manifest or the complete new one, never a partial file. */
  private[sources] def publishManifest(storePath: String, n: Long,
      entries: Map[Long, String]): Unit = {
    val root = java.nio.file.Paths.get(localRoot(storePath))
    java.nio.file.Files.createDirectories(root)
    val tmp = root.resolve(s".manifest-tmp-${java.util.UUID.randomUUID()}")
    val body = entries.toSeq.sortBy(_._1)
      .map { case (b, d) => s"$b\t$d" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
    val target = root.resolve(f"manifest-$n%09d.mf")
    try {
      // the manifest-number claim must be genuinely EXCLUSIVE: POSIX rename
      // silently REPLACES an existing target, so ATOMIC_MOVE alone never
      // throws FileAlreadyExistsException on Linux and two concurrent
      // writers would silently last-writer-win the same number (a keyed
      // upsert race could drop one writer's entries). A hard link is both
      // atomic and first-writer-wins — it fails loudly when the target
      // exists — and the fully-written temp file is its source, so readers
      // never see a partial manifest.
      java.nio.file.Files.createLink(target, tmp)
      java.nio.file.Files.delete(tmp)
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.delete(tmp)
        throw new IllegalStateException(
          s"concurrent writer already published manifest $n under $storePath", e)
      case e @ (_: UnsupportedOperationException | _: java.nio.file.FileSystemException) =>
        // No-hard-link filesystem. The JDK surfaces this either as
        // UnsupportedOperationException (provider without link support) or
        // as a generic FileSystemException from link(2) EPERM/EOPNOTSUPP
        // (FUSE/NFS/overlay mounts) — FileAlreadyExistsException is matched
        // ABOVE, so this arm usually sees genuine no-link-support failures.
        // But a TRANSIENT link error (EIO/ENOSPC) lands here too, and an
        // unconditional move could silently REPLACE a manifest a concurrent
        // writer published between our link attempt and now — so re-check:
        // a target that exists means someone won the number; surface the
        // conflict instead of destroying their commit. (A race window
        // narrower than exists→move remains only on no-link filesystems,
        // where the claim is documented last-writer-wins anyway.)
        if (java.nio.file.Files.exists(target)) {
          java.nio.file.Files.delete(tmp)
          throw new IllegalStateException(
            s"concurrent writer already published manifest $n under $storePath", e)
        }
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /**
   * The streaming face of [[upsertBuckets]]: every micro-batch merges into
   * the store under the same idempotent rule, so the pipeline is
   * effectively-once END TO END even though foreachBatch is at-least-once
   * (a replayed batch after a crash re-merges against the intact previous
   * manifest). Pair with a checkpoint location for restartable progress.
   */
  def upsertStream(stream: DataFrame, storePath: String, keyCol: String,
      versionCol: String, nBuckets: Int, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        upsertBuckets(storePath, b, keyCol, versionCol, nBuckets)
      }
      .start()
}
