package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot-to-snapshot corpus diffing. A 100 TB training corpus is not
 * rebuilt from scratch — crawls land as periodic snapshots, and the
 * pipeline's first question is WHAT CHANGED: which documents are new, which
 * disappeared, which were edited in place. Downstream work (re-embedding,
 * re-dedup via the incremental probe, cache invalidation) then touches only
 * the changed slice instead of the whole corpus.
 */
object Snapshot {

  /**
   * Per-id change status between two snapshots of the same table:
   * `added` (id only in `newSnap`), `removed` (only in `oldSnap`),
   * `changed` (both sides, different content), `unchanged`. Content is
   * compared by md5 of [[Dedup.exact]]'s canonical byte form of
   * `contentCol` — the full-outer join co-shuffles (id, 16-byte hash) pairs
   * only, never the payloads, so diffing costs two scans plus one narrow
   * shuffle regardless of document size; snapshots kept bucketed by id
   * diff with no exchange at all. NULL content hashes as NULL and therefore
   * compares as `changed` even against another NULL — callers treating
   * NULL≡empty should coalesce `contentCol` first (as the q79 query does).
   *
   * Returns `(idCol, status)` for every id present in either snapshot.
   */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol),
      md5(Dedup.contentBytes(oldSnap, col(contentCol))).as("__h_old"),
      lit(true).as("__in_old"))
    val n = newSnap.select(col(idCol),
      md5(Dedup.contentBytes(newSnap, col(contentCol))).as("__h_new"),
      lit(true).as("__in_new"))
    // presence is tracked by explicit flags, NOT hash-nullness: a present
    // row whose content is NULL must not masquerade as an add/remove
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /**
   * The INCREMENTAL-WORK driver: ids whose content is new or changed between
   * snapshots — [[diff]] restricted to the slice downstream work must
   * actually touch (re-embed, re-index, re-dedup via the standing-index
   * probe). Content hashes with `xxhash64` over the raw column, so ANY
   * Spark-hashable type works (arrays — embedding columns — included) and
   * the full-outer join co-shuffles (id, 8-byte hash) pairs only, never
   * payloads; the changed slice of a 100 TB corpus is identified for the
   * price of two narrow scans + one 16-byte-per-row shuffle. Unlike
   * [[diff]], NULL content compares EQUAL to NULL (hash-of-null semantics) —
   * a doc that stays NULL is not re-touched.
   *
   * Returns `(idCol, status)` with status in {added, changed} only.
   */
  /**
   * ONE-PASS release delta: every id whose release state moved between
   * snapshots — `added` / `changed` (ship the new payload) and `removed`
   * (ship a tombstone) — from a single hash full-outer join.
   * [[changedSlice]]'s hash-of-null semantics (a doc whose content stays
   * NULL is NOT re-shipped), [[diff]]'s removal visibility; unchanged
   * ids emit nothing. The delta-export composition (q233) reads the
   * slice AND the removals from this one frame instead of diffing twice.
   */
  def delta(oldSnap: DataFrame, newSnap: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol), xxhash64(col(contentCol)).as("__h_old"),
      lit(true).as("__in_old"))
    val n = newSnap.select(col(idCol), xxhash64(col(contentCol)).as("__h_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .where(col("__in_old").isNull || col("__in_new").isNull ||
        !(col("__h_old") <=> col("__h_new")))
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"))
  }

  def changedSlice(oldSnap: DataFrame, newSnap: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol), xxhash64(col(contentCol)).as("__h_old"),
      lit(true).as("__in_old"))
    val n = newSnap.select(col(idCol), xxhash64(col(contentCol)).as("__h_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .where(col("__in_new").isNotNull &&
        (col("__in_old").isNull || !(col("__h_old") <=> col("__h_new"))))
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added")).otherwise(lit("changed")).as("status"))
  }
}
