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
}
