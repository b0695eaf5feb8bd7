package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sorted.syntax._

/**
 * Deterministic sampling for training pipelines. `df.sample()` draws from an
 * RNG seeded per partition, so the sample CHANGES whenever partitioning,
 * cluster layout, or evaluation order changes — unacceptable for reproducible
 * train/validation splits or A/B corpus slices. These operators derive every
 * decision from a content hash of the row's id: the same row lands in the
 * same slice on any cluster, any partitioning, any engine (the md5-prefix
 * hash is reproducible in SQL engines for cross-system audits — the DuckDB
 * oracle recomputes it exactly).
 */
object Sampling {

  /** Uniform deterministic hash of an id into [0, 2^32): the first 8 hex
    * chars of md5 of the id's decimal string. Pure function of the value —
    * stable across runs, partitionings, and engines. */
  def hash32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep ~`fraction` of rows, deterministically: a row survives iff its id
    * hash falls below fraction * 2^32. Rerunning, repartitioning, or scaling
    * the cluster cannot change the sample; growing the corpus never evicts a
    * previously sampled row (the decision is per-row, not per-quota). */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.where(hash32(col(idCol)) < (fraction * 4294967296.0).toLong)
  }

  /** Deterministic train/holdout assignment: adds `is_holdout`, true for
    * ~`holdoutFraction` of rows. The complement of [[deterministicSample]]'s
    * predicate — a row is in exactly one split, forever. */
  def withSplit(df: DataFrame, idCol: String, holdoutFraction: Double): DataFrame = {
    require(holdoutFraction >= 0.0 && holdoutFraction <= 1.0,
      s"holdoutFraction must be in [0,1], got $holdoutFraction")
    df.withColumn("is_holdout", hash32(col(idCol)) < (holdoutFraction * 4294967296.0).toLong)
  }

  /**
   * k rows per key, chosen as the k SMALLEST id-hashes (hash-minima are a
   * uniform random sample under a uniform hash — deterministic "reservoir"
   * sampling). Ranked through a bounded insertion-sort combiner with map-side
   * partial aggregation, so per-key state is O(k) and the shuffle carries at
   * most k rows per key per partition — a hot key with 10M rows never sorts
   * in one task (the row_number-window formulation would).
   *
   * Keys are compared as strings (cast back in the caller if needed);
   * ties on hash break by id, so the result is a pure function of the data.
   */
  def perKeySample(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val scored = df.select(
        col(keyCol).cast("string"),
        struct(hash32(col(idCol)).as("h"), col(idCol).cast("long").as("id")).as("s"))
      .as[(String, (Long, Long))]
    def ins(acc: List[(Long, Long)], v: (Long, Long)): List[(Long, Long)] =
      ((v :: acc).sorted).take(k)
    scored
      .groupSortCombine[List[(Long, Long)]](v => List(v), ins, (a, b) => (a ++ b).sorted.take(k))
      .flatMap { case (key, vs) => vs.iterator.map(v => (key, v._2)) }
      .toDF(keyCol, idCol)
  }
}
