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
   * IDEMPOTENT keyed upsert into a bucket-partitioned parquet store —
   * the merge step that turns at-least-once delivery into
   * effectively-once ingestion: re-applying any batch (a replayed
   * micro-batch, a retried job) leaves the store bit-identical, because
   * the winning row per key is the MAX of `struct(versionCol, <other
   * columns>)` — a total, deterministic order (last-writer-wins by
   * version; remaining columns break exact-version ties), so merge order
   * cannot matter.
   *
   * SCALE SHAPE: the store is hive-partitioned on
   * `__bucket = pmod(xxhash64(key), nBuckets)`; a batch only ever READS
   * and REWRITES the buckets its keys hash into (dynamic partition
   * overwrite) — ingest cost is proportional to touched-bucket mass, not
   * store mass, which is what makes per-hour batches against a 100 TB
   * store feasible. The only driver materialization is the touched-bucket
   * id list — `nBuckets`-bounded by construction. Size `nBuckets` so one
   * bucket ≈ a few files: too few buckets and every batch rewrites the
   * world; too many and the store is all small files.
   *
   * Contract: key and version are non-null; every batch carries the same
   * schema; columns must be orderable (the struct max). `__bucket` is
   * reserved.
   */
  def upsertBuckets(storePath: String, batch: DataFrame, keyCol: String,
      versionCol: String, nBuckets: Int,
      maxRecordsPerFile: Long = 1000000L): Unit = {
    import org.apache.spark.sql.functions._
    require(nBuckets >= 1 && nBuckets <= 1000000, s"nBuckets must be in [1,1e6], got $nBuckets")
    require(!batch.columns.contains("__bucket"), "__bucket is reserved by upsertBuckets")
    val spark = batch.sparkSession
    val dataCols = batch.columns.toSeq // fixed order: (version, others) struct is stable
    val withB = batch
      .where(col(keyCol).isNotNull && col(versionCol).isNotNull)
      .withColumn("__bucket", pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)))
    val storeExists = {
      val p = new org.apache.hadoop.fs.Path(storePath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val merged = if (storeExists) {
      // nBuckets-bounded driver list — the partition-pruning predicate
      val touched = withB.select(col("__bucket")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val current = spark.read.parquet(storePath)
        .where(col("__bucket").isin(touched: _*))
        .select(withB.columns.map(col): _*) // align column order
      current.unionByName(withB)
    } else withB
    val ordered = col(versionCol) +: dataCols.filterNot(_ == versionCol).map(col) :+ col("__bucket")
    val winner = merged
      .groupBy(col(keyCol))
      .agg(max(struct(ordered: _*)).as("__m"))
      .select(col(keyCol) +: (dataCols.filterNot(_ == keyCol).map(c => col(s"__m.$c").as(c))
        :+ col("__m.__bucket").as("__bucket")): _*)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      winner
        .repartition(col("__bucket"))
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy("__bucket")
        .parquet(storePath)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /**
   * The streaming face of [[upsertBuckets]]: every micro-batch merges into
   * the store under the same idempotent rule, so the pipeline is
   * effectively-once END TO END even though foreachBatch is at-least-once
   * (a replayed batch after a crash re-merges to the identical store).
   * Pair with a checkpoint location for restartable progress.
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
