package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy join — record linkage between two tables whose keys agree
 * only up to small edits (the entity-resolution shape: names, titles,
 * near-identical crawl anchors). The naive form is a quadratic cross join
 * with an edit-distance predicate; this operator makes it linear-ish by
 * BLOCKING: each key emits its prefix-k and suffix-k as candidate blocks,
 * pairs are generated only within a block, then verified with the exact
 * `levenshtein` predicate (a codegen'd built-in — no UDF).
 *
 * COMPLETENESS: a single edit changes the prefix-k block or the suffix-k
 * block, never both, when every key is at least `2k` characters long —
 * so for `maxDist = 1` and keys >= 2k the blocked result EQUALS the
 * quadratic ground truth (q186's oracle runs the quadratic join and the
 * hash compare proves zero recall loss). For higher `maxDist` or shorter
 * keys blocking is a recall/cost trade documented here, not hidden.
 *
 * SCALE SHAPE — blocking, candidate generation, and the edit-distance
 * verify all run over the DISTINCT-KEY space, never over rows: real key
 * vocabularies SATURATE (the sf0.1 part table holds 20,000 rows but 64
 * distinct names — the same 64 as sf0.01), so verify cost is bounded by
 * the vocabulary while the corpus grows without bound. Verified KEY
 * pairs then expand to id pairs through two hash joins — pure output
 * mass, no wasted distance computations on duplicate keys. Within the
 * distinct space, candidate volume is sum-of-block-size-products, and a
 * boilerplate-DIVERSE block (thousands of distinct keys sharing one
 * prefix — the crawl-template shape) would still re-quadratize it, so
 * blocks with more than `maxBlock` distinct members on either side are
 * DROPPED and counted ([[FuzzyResult.droppedBlocks]]), the same
 * cap-and-observe discipline as every other candidate source in the
 * family (LSH buckets, df-capped shingles, span windows). `Stress
 * linkage` proves completion + zero cold-block recall loss under 5k
 * planted template keys at sf0.1.
 */
object FuzzyJoin {

  /** `pairs`: verified (left_id, right_id, dist) rows. `droppedBlocks`:
    * 1-row frame with the count of over-cap blocks excluded from
    * candidate generation — crossJoin-broadcast it into the output to
    * make completeness observable in-query. */
  final case class FuzzyResult(pairs: DataFrame, droppedBlocks: DataFrame)

  /** Prefix-k and suffix-k blocks of a distinct-key frame (column `k`). */
  private def blocksOf(keys: DataFrame, blockLen: Int): DataFrame = {
    val kc = col("k")
    val suffixStart = greatest(length(kc) - (blockLen - 1), lit(1))
    keys.select(kc,
      explode(array(
        concat(lit("p:"), kc.substr(lit(1), lit(blockLen))),
        concat(lit("s:"), kc.substr(suffixStart, lit(blockLen))))).as("blk"))
      .distinct() // a short key's prefix and suffix block can coincide
  }

  def blockedFuzzyJoin(left: DataFrame, leftId: String, leftKey: String,
                       right: DataFrame, rightId: String, rightKey: String,
                       maxDist: Int, blockLen: Int = 3,
                       maxBlock: Int = 1024): FuzzyResult = {
    val lRows = left.where(col(leftId).isNotNull && col(leftKey).isNotNull)
      .select(col(leftId).as("left_id"), col(leftKey).as("k"))
    val rRows = right.where(col(rightId).isNotNull && col(rightKey).isNotNull)
      .select(col(rightId).as("right_id"), col(rightKey).as("k"))
    val lb = blocksOf(lRows.select(col("k")).distinct(), blockLen)
    val rb = blocksOf(rRows.select(col("k")).distinct(), blockLen)
    val sizes = lb.groupBy(col("blk")).agg(count(lit(1)).as("ln"))
      .join(rb.groupBy(col("blk")).agg(count(lit(1)).as("rn")), Seq("blk"), "full")
    val hot = sizes.where(coalesce(col("ln"), lit(0L)) > maxBlock ||
      coalesce(col("rn"), lit(0L)) > maxBlock)
    val cold = sizes.where(coalesce(col("ln"), lit(0L)) <= maxBlock &&
      coalesce(col("rn"), lit(0L)) <= maxBlock).select(col("blk"))
    val keyPairs = lb.join(cold, Seq("blk"))
      .select(col("blk"), col("k").as("lk"))
      .join(rb.select(col("blk"), col("k").as("rk")), Seq("blk"))
      // |len difference| <= maxDist is a NECESSARY condition of the edit
      // bound — integer arithmetic that kills most in-block candidates
      // before the distinct shuffle and the DP verify ever see them
      .where(abs(length(col("lk")) - length(col("rk"))) <= maxDist)
      .select(col("lk"), col("rk"))
      .distinct() // prefix- and suffix-block can both generate a key pair
      // thresholded levenshtein: the banded O(maxDist * len) DP, returning
      // -1 above the bound instead of paying the full O(len^2) matrix
      .withColumn("dist", levenshtein(col("lk"), col("rk"), maxDist))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
    // id expansion: verified key pairs fan back out to row pairs — output
    // mass only, every distance above was computed once per KEY pair
    val pairs = keyPairs
      .join(lRows.withColumnRenamed("k", "lk"), Seq("lk"))
      .join(rRows.withColumnRenamed("k", "rk"), Seq("rk"))
      .select(col("left_id"), col("right_id"), col("dist").cast("long").as("dist"))
    FuzzyResult(pairs, hot.agg(count(lit(1)).as("n_dropped_blocks")))
  }
}
