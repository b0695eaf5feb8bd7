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
}
