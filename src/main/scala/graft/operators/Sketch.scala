package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Frequency sketching for streams/corpora too large to count exactly per key:
 * a count-min sketch (Cormode & Muthukrishnan 2005) materialized AS A
 * DATAFRAME — `depth × width` counter cells, built with ONE hash aggregation.
 *
 * SCALE SHAPE: the build's shuffle carries at most `depth × width` partial
 * cells per map partition (map-side combine collapses the corpus first), so
 * a 100 TB scan reduces to a few thousand rows regardless of key cardinality
 * — the whole point of sketching. The sketch frame itself is tiny by
 * construction, so estimation joins BROADCAST it and stay narrow on the
 * query-key side. Estimates are upper bounds: `est >= exact` always, with
 * overestimate probability bounded by (cardinality/width)^depth per key.
 */
object Sketch {

  /** Count-min sketch of `key` occurrences: one row per non-empty
    * `(lane, bucket)` cell with its collision-summed count. Lane hashes are
    * xxhash64 seeded by the lane index — fixed, so sketches are deterministic
    * and mergeable across batches (cell-wise sum). Empty cells are implicit
    * zeros ([[cmEstimate]] coalesces them). */
  def countMin(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth x $width")
    df.select(explode(array((0 until depth).map { d =>
        struct(lit(d).as("lane"), pmod(xxhash64(lit(d), key), lit(width.toLong)).as("bucket"))
      }: _*)).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `keys` (small by contract — the handful
    * of candidates being checked): min over lanes of the key's cell counts.
    * The sketch is broadcast; a key hashing to an absent cell reads 0. */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                 depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth x $width")
    keys.select(col(keyCol), explode(array((0 until depth).map { d =>
        struct(lit(d).as("lane"),
          pmod(xxhash64(lit(d), col(keyCol)), lit(width.toLong)).as("bucket"))
      }: _*)).as("lb"))
      .select(col(keyCol), col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("lane", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
