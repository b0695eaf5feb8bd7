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

  /**
   * Misra-Gries heavy-hitter summary (Misra & Gries 1982): at most `k`
   * counters per partition, merged by per-key sum — count-min's DETERMINISTIC
   * complement. Where [[countMin]] gives probabilistic UPPER bounds, the
   * merged Misra-Gries counts are guaranteed LOWER bounds with a bounded
   * deficit: for every key, `freq - n/(k+1) <= mg_lower <= freq` (n = total
   * non-null rows). Hence every key with `freq > n/(k+1)` — a true heavy
   * hitter — is guaranteed present in the summary, under ANY partitioning.
   *
   * SCALE SHAPE: per-partition state is O(k) regardless of key cardinality
   * (the decrement-all step amortizes to O(1) per input row: each decrement
   * round retires k+1 units of count), and the shuffle carries at most k rows
   * per partition — a 100 TB token stream reduces to executors × k candidate
   * rows, never a full groupBy of the vocabulary. Null keys are skipped (they
   * don't count toward n).
   *
   * Returns one row per surviving key: `(keyCol, mg_lower)` — counters key
   * on the STRING form internally, but the summary key is cast back to the
   * input column's type on output, so a numeric-key caller equi-joins the
   * summary against the source directly (no implicit casts).
   * The summary may
   * hold more than k keys after the merge; it is a SUPERSET of the true
   * heavy-hitter set, so callers filter candidates by an exact count of the
   * candidates only (a broadcast-semi-join-sized recount, not a full
   * vocabulary aggregation).
   */
  def misraGries(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { iter =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        iter.foreach { key =>
          if (key != null) {
            counters.get(key) match {
              case Some(c) => counters(key) = c + 1
              case None if counters.size < k => counters(key) = 1L
              case None =>
                // decrement-all (the incoming key is dropped with them):
                // one round retires k+1 units of count, bounding rounds by
                // n_p/(k+1) and therefore each counter's deficit
                val keys = counters.keysIterator.toArray
                var i = 0
                while (i < keys.length) {
                  val t = keys(i)
                  val c = counters(t) - 1
                  if (c == 0L) counters.remove(t) else counters(t) = c
                  i += 1
                }
            }
          }
        }
        counters.iterator
      }
      .toDF(keyCol, "mg_lower")
      .groupBy(col(keyCol))
      .agg(sum(col("mg_lower")).as("mg_lower"))
      // the kernel counts over the key's STRING form; cast the summary key
      // back to the input column's type so a numeric-key caller can equi-join
      // candidates for the exact recount without implicit casts (exact
      // round-trip for integral types)
      .withColumn(keyCol, col(keyCol).cast(df.schema(keyCol).dataType))
  }

  /**
   * Per-key Datasketches-HLL distinct-count state: `(keyCol, hll_sk binary)`.
   * The sketch IS the incremental-ingest primitive for distinct counts at
   * 100 TB: persist it alongside each snapshot, sketch only the new batch on
   * the next load, and [[mergeDistinctSketches]] folds the two in O(2^lgK)
   * per key — no re-scan of history, no shuffle of raw ids (the map side
   * collapses each partition to one sketch per key before the exchange).
   * Register-maximum semantics make the merged state SPLIT-INVARIANT: the
   * union's registers are per-slot maxima over the whole stream, so ANY
   * batching of the same rows merges to the same estimate (q87 gates this
   * live). Note the merged estimate is NOT bit-equal to a from-scratch
   * direct sketch of the concatenated stream: direct sketching uses the
   * order-sensitive HIP estimator, which a union cannot preserve — both
   * remain within the same relative-error bound, but only the union path is
   * a pure function of the row SET, which is why incremental pipelines
   * should standardize on it.
   */
  def distinctSketchByKey(df: DataFrame, keyCol: String, valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4,21], got $lgK")
    df.groupBy(col(keyCol)).agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sk"))
  }

  /** Fold several per-key sketch frames (same lgK) into one: cell cost is
    * O(2^lgK) per key regardless of how many ids each sketch absorbed. */
  def mergeDistinctSketches(sketches: DataFrame, keyCol: String): DataFrame =
    sketches.groupBy(col(keyCol)).agg(hll_union_agg(col("hll_sk")).as("hll_sk"))

  /** Rounded distinct-count estimate per key from the sketch state. */
  def estimateDistinct(sketches: DataFrame, keyCol: String): DataFrame =
    sketches.select(col(keyCol), hll_sketch_estimate(col("hll_sk")).as("est_distinct"))

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

  /**
   * JOIN-SIZE estimate from two count-min sketches of the join keys (the
   * count-min inner-product estimator, Cormode & Muthukrishnan 2005 §4.2):
   * `|A ⋈_k B| = Σ_k fA(k)·fB(k)`, and each lane's cell-wise dot product
   * OVERESTIMATES that sum (hash collisions only ever add mass); the
   * estimate is the min over lanes. The one-sided guarantee a join planner
   * wants — "will this join explode?" answered from two `depth × width`
   * frames without executing the join or scanning either side again.
   *
   * Both sketches must come from [[countMin]] with the SAME depth/width
   * (same seeded lane hashes — the property that makes cells comparable).
   * Absent cells are implicit zeros and contribute nothing to a dot
   * product, so the join over PRESENT cell pairs is exact — but a lane with
   * NO overlapping cells has dot product 0 (which alone proves the join is
   * empty), so the min runs over ALL `depth` lanes, zero-dot lanes
   * included, never just the lanes the inner join happened to populate.
   * Returns one row `(est_join_size)`; estimates are LONG-exact (cell
   * counts are integers, products/sums exact).
   *
   * INTEGER ENVELOPE: a cell-product `ca * cb` stays in a long while both
   * cell counts are under ~3e9 (2^31.5); a hotter cell means one key holds
   * billions of rows PER SIDE. Under ANSI mode (Spark 4 default) an
   * overflow fails LOUDLY rather than silently under-estimating; for
   * corpora past the envelope, pre-scale both sketches (divide cell counts
   * by a common factor, multiply the estimate back) — the estimate is
   * linear in each side's counts.
   */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame, depth: Int): DataFrame = {
    require(depth > 0, s"depth must be positive, got $depth")
    val spark = sketchA.sparkSession
    val lanes = spark.range(depth).select(col("id").cast("int").as("lane"))
    val dots = sketchA.select(col("lane"), col("bucket"), col("cnt").as("ca"))
      .join(sketchB.select(col("lane"), col("bucket"), col("cnt").as("cb")),
        Seq("lane", "bucket"))
      .groupBy(col("lane")).agg(sum(col("ca") * col("cb")).as("dot"))
    lanes.join(dots, Seq("lane"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_join_size"))
  }
}
