package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation operators. Spark's AQE splits skewed partitions for
 * sort-merge joins at runtime, but salting remains the explicit, planner-
 * independent tool when a handful of hot keys dominate a shuffle — the
 * classic 100 TB failure mode (one user / one order id with millions of rows
 * turns a partition into a straggler or an OOM).
 */
object Skew {

  /**
   * Inner equi-join that spreads each hot key of `left` across `numSalts`
   * shuffle partitions: every left row gets a salt derived from its
   * per-partition row index (`xxhash64(monotonically_increasing_id) pmod
   * numSalts` — no RNG state; the index spreads even 10M IDENTICAL rows of
   * a hot key across cells, which is also why hashing row content would be
   * pure waste — any salt value is correct by construction, and a full-row
   * hash would reject MapType columns and pay row-width hashing cost for
   * nothing), and `right` is replicated once per salt
   * value, so the join key becomes (key, salt) and a key with 10M rows
   * shuffles as `numSalts` cells of ~10M/numSalts rows each. Any salt value
   * yields the same join result (each pair meets in the left row's cell), so
   * the index's sensitivity to partitioning does not affect the output.
   *
   * SEMANTICALLY IDENTICAL to `left.join(right, key)`: each (left row,
   * right row) pair with equal keys meets in exactly one salt cell — the left
   * row's. The cost is `numSalts - 1` extra copies of `right` through the
   * shuffle; size numSalts to the hot key's row count over a comfortable
   * per-partition cell, and keep `right` the smaller side.
   *
   * Both inputs must share ONLY the join column name; other columns must be
   * disjoint (standard equi-join hygiene). `__salt` is reserved.
   */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String, numSalts: Int): DataFrame =
    saltedJoin(left, right, key, numSalts, "inner")

  /**
   * LEFT-OUTER variant — the fact-preserving enrich shape (keep every left
   * row, attach right columns where the key matches). Same salt scheme as
   * [[saltedEquiJoin]]: each left row carries exactly ONE salt, so an
   * unmatched left row survives exactly once (with NULL right columns), and a
   * matched left row meets ALL of the key's right rows in its own salt cell —
   * semantically identical to `left.join(right, key, "left")`. Left rows with
   * a NULL key never match (standard equi-join semantics) and likewise
   * survive exactly once.
   */
  def saltedLeftOuterJoin(left: DataFrame, right: DataFrame, key: String, numSalts: Int): DataFrame =
    saltedJoin(left, right, key, numSalts, "left")

  private def saltedJoin(left: DataFrame, right: DataFrame, key: String, numSalts: Int, joinType: String): DataFrame = {
    require(numSalts > 0, s"numSalts must be positive, got $numSalts")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt is reserved by salted joins")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(numSalts.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /**
   * Key-distribution diagnostic BEFORE reaching for the salt: the k hottest
   * keys with their row counts and integer per-mille share of the table —
   * the number that says whether a join/agg needs [[saltedEquiJoin]] at all
   * (one key at 300‰ of a 100 TB fact table is a guaranteed straggler; a
   * flat profile means salting only adds replication cost). NULL keys are
   * profiled too — in practice the null group IS the hot key.
   *
   * SCALE SHAPE: map-side-combined count agg (keys, not rows, cross the
   * shuffle), the one-row total broadcasts, and top-k plans
   * TakeOrderedAndProject — k rows per partition to the driver-side merge,
   * never a global sort. Integer share: cnt * 1000 div total, reproducible
   * everywhere.
   */
  def profileKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keyCol != "cnt" && keyCol != "share_permille",
      "cnt/share_permille are reserved by profileKeys")
    val tot = df.agg(count(lit(1)).as("__total"))
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .select(col(keyCol), col("cnt"), expr("cnt * 1000 div __total").as("share_permille"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
  }
}
