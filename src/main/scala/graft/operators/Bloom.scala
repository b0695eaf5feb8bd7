package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bloom-filter runtime join pruning — the "semi-join reduction" a 100 TB
 * fact-dim join lives on: summarize the (filtered) build side's join keys
 * into a fixed-size bitset, broadcast it, and drop probe-side rows BEFORE
 * they reach the shuffle. Spark's own runtime row-level filtering does this
 * only for eligible plan shapes; this operator makes the reduction explicit
 * and composable (build once, prune many probe frames, or persist the bitset
 * alongside a snapshot for incremental loads).
 *
 * Everything is codegen'd builtins — xxhash64 lanes, integer bit math, a
 * broadcast single-row map — no UDFs, no custom expressions, so the prune
 * predicate rides WholeStageCodegen at scan speed.
 *
 * GUARANTEE: no false negatives — every key inserted by [[buildFilter]]
 * passes [[mightContain]] (same lane hashes, deterministic). False positives
 * only cost un-pruned rows, never correctness; the rate is the classic
 * (1 - e^(-kn/m))^k.
 *
 * SCALE SHAPE: the build is one hash aggregation whose shuffle carries at
 * most `numBits/64` words per map partition (map-side `bit_or` collapses the
 * corpus first); the filter itself is O(numBits) bytes regardless of build
 * cardinality, so it broadcasts even when the dim side would not.
 */
object Bloom {

  private val BitsCol = "__bloom_bits"
  private val NumBitsCol = "__bloom_num_bits"
  private val NumHashesCol = "__bloom_num_hashes"

  private def lanePositions(key: Column, numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => pmod(xxhash64(lit(i), key), lit(numBits.toLong)))

  /** A lazily-evaluated guard that the filter row's recorded geometry matches
    * the caller's (numBits, numHashes): lane positions are computed modulo
    * numBits, so mismatched geometry silently voids the no-false-negative
    * guarantee — the one failure mode a bitset cannot self-detect. Returns a
    * Column that is TRUE on match and raises at execution time on mismatch
    * (no extra job: the check rides the probe's own evaluation). */
  private def geometryGuard(numBits: Int, numHashes: Int): Column =
    when(col(NumBitsCol) =!= numBits || col(NumHashesCol) =!= numHashes,
      raise_error(concat(
        lit(s"bloom geometry mismatch: caller ($numBits bits, $numHashes hashes) vs built ("),
        col(NumBitsCol), lit(" bits, "), col(NumHashesCol), lit(" hashes)"))).cast("boolean"))
      .otherwise(lit(true))

  /** Bloom bitset over `keyCol`, as ONE row holding a map<word-index, word>
    * (absent words are implicit zeros) plus the build geometry — consumers
    * verify (numBits, numHashes) against the recorded values, because a
    * probe modulo the wrong numBits silently drops true matches. `numBits`
    * need not be a power of two. */
  def buildFilter(df: DataFrame, keyCol: String, numBits: Int, numHashes: Int): DataFrame = {
    require(numBits > 0 && numHashes > 0,
      s"numBits/numHashes must be positive, got $numBits/$numHashes")
    df.where(col(keyCol).isNotNull)
      .select(explode(array(lanePositions(col(keyCol), numBits, numHashes): _*)).as("pos"))
      .groupBy((col("pos") / 64).cast("int").as("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int")))
        .as("word"))
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("word")))).as(BitsCol))
      .select(col(BitsCol), lit(numBits).as(NumBitsCol), lit(numHashes).as(NumHashesCol))
  }

  /** True iff every lane bit of `key` is set in the bitset map (never false
    * for an inserted key). NULL keys return false — they can't equi-join. */
  def mightContain(bits: Column, key: Column, numBits: Int, numHashes: Int): Column = {
    require(numBits > 0 && numHashes > 0,
      s"numBits/numHashes must be positive, got $numBits/$numHashes")
    lanePositions(key, numBits, numHashes).map { pos =>
      call_function("shiftright",
          coalesce(element_at(bits, (pos / 64).cast("int")), lit(0L)),
          pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _) && key.isNotNull
  }

  /**
   * Merge Bloom bitsets built with the SAME (numBits, numHashes): word-wise
   * `bit_or`. Because insertion is itself a bit_or of deterministic lane
   * bits, the merge is EXACT: filter(A) merged with filter(B) is
   * bit-identical to filter(A ∪ B) — the incremental-ingest primitive
   * (build per batch/source/snapshot, persist, OR together at read time;
   * never rebuild over history). O(numBits) work regardless of how many
   * keys the inputs summarized.
   */
  def mergeFilters(filters: DataFrame*): DataFrame = {
    require(filters.nonEmpty, "need at least one filter to merge")
    val u = filters.reduce(_ unionByName _)
    val merged = u
      .select(explode(col(BitsCol)).as(Seq("word_idx", "word")))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("word")).as("word"))
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("word")))).as(BitsCol))
    // geometry must agree across ALL inputs — ORing maps whose bit positions
    // were computed modulo different numBits is silent data loss. Checked
    // lazily in the merged row itself (no extra job).
    val geom = u.agg(
      min(col(NumBitsCol)).as("__gb_min"), max(col(NumBitsCol)).as("__gb_max"),
      min(col(NumHashesCol)).as("__gh_min"), max(col(NumHashesCol)).as("__gh_max"))
    merged.crossJoin(geom)
      .select(col(BitsCol),
        when(col("__gb_min") =!= col("__gb_max") || col("__gh_min") =!= col("__gh_max"),
          raise_error(concat(lit("bloom geometry mismatch across merged filters: bits ["),
            col("__gb_min"), lit(", "), col("__gb_max"), lit("], hashes ["),
            col("__gh_min"), lit(", "), col("__gh_max"), lit("]"))).cast("int"))
          .otherwise(col("__gb_min")).as(NumBitsCol),
        col("__gh_min").as(NumHashesCol))
  }

  /** Single-row `(n_mismatch)`: count of 64-bit words differing between two
    * bitsets (absent words compare as zero). The in-query gate for
    * [[mergeFilters]]' exactness claim — 0 iff the bitsets are identical. */
  def filterMismatch(a: DataFrame, b: DataFrame): DataFrame = {
    val ea = a.select(explode(col(BitsCol)).as(Seq("word_idx", "__wa")))
    val eb = b.select(explode(col(BitsCol)).as(Seq("word_idx", "__wb")))
    ea.join(eb, Seq("word_idx"), "full_outer")
      .agg(coalesce(sum(when(
          coalesce(col("__wa"), lit(0L)) =!= coalesce(col("__wb"), lit(0L)), 1L)
        .otherwise(0L)), lit(0L)).as("n_mismatch"))
  }

  /**
   * Prune `probe` with an ALREADY-BUILT filter (from [[buildFilter]] or
   * [[mergeFilters]]) — the persisted-bitset path of an incremental load,
   * where [[prunedEquiJoin]] would rebuild from scratch. Same no-false-
   * negative guarantee; `numBits`/`numHashes` must match the build.
   */
  def pruneWith(probe: DataFrame, filter: DataFrame, keyCol: String,
      numBits: Int, numHashes: Int): DataFrame = {
    require(!probe.columns.contains(BitsCol), s"$BitsCol is reserved by pruneWith")
    require(filter.columns.contains(NumBitsCol),
      "filter lacks recorded geometry — build it with Bloom.buildFilter/mergeFilters")
    probe.crossJoin(broadcast(filter))
      .where(geometryGuard(numBits, numHashes) &&
        mightContain(col(BitsCol), col(keyCol), numBits, numHashes))
      .drop(BitsCol, NumBitsCol, NumHashesCol)
  }

  /**
   * Inner equi-join with the probe side Bloom-pruned before the shuffle:
   * build the filter from `build`'s keys, broadcast it (one tiny row), keep
   * only probe rows that might match, then run the real join. Result is
   * EXACTLY `probe.join(build, key)` — false positives are removed by the
   * join itself, false negatives cannot exist.
   */
  def prunedEquiJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    require(!probe.columns.contains(BitsCol) && !build.columns.contains(BitsCol),
      s"$BitsCol is reserved by prunedEquiJoin")
    val filt = buildFilter(build, keyCol, numBits, numHashes)
    probe.crossJoin(broadcast(filt))
      .where(mightContain(col(BitsCol), col(keyCol), numBits, numHashes))
      .drop(BitsCol, NumBitsCol, NumHashesCol)
      .join(build, keyCol)
  }
}
