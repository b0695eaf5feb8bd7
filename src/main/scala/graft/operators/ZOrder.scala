package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) layout: interleave the bits of two clamped 16-bit
 * dimensions into one 32-bit sort key, so that range-partitioning + sorting
 * by the z-value gives every output file a small RECTANGLE of (a, b) space
 * instead of a thin slice of one dimension. Per-file min/max column stats
 * then prune on BOTH dimensions — the standard multi-dimensional data-
 * skipping layout for a 100 TB lake where queries filter on two keys (a
 * linear sort prunes only its leading column; a b-selective box query scans
 * every a-sorted file).
 *
 * The curve is PURE INTEGER Column arithmetic (shift/mask bit spreading —
 * no UDF, whole-stage codegen'd), and the identical expression is
 * reproducible in any SQL engine, which is what the q72 DuckDB oracle does
 * bit for bit.
 */
object ZOrder {

  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * lane: x = ...abcd -> ...0a0b0c0d (the classic mask ladder). */
  private def spread16(x: Column): Column = {
    val x1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two dimensions, each clamped to [0, 65535] (callers
    * scale their domain down to 16 bits first — e.g. `cents div 1024`);
    * `a` occupies the even bits, `b` the odd bits. */
  def zValue16(a: Column, b: Column): Column = {
    val ca = least(greatest(a.cast("long"), lit(0L)), lit(65535L))
    val cb = least(greatest(b.cast("long"), lit(0L)), lit(65535L))
    spread16(ca).bitwiseOR(shiftleft(spread16(cb), 1))
  }

  /**
   * Lay a frame out in z-order across `numFiles` range partitions (one
   * parquet file each when written): a one-time layout investment exactly
   * like bucketing (q49) or the standing indexes — the recurring win is
   * every two-dimensional box query skipping the files whose (minA..maxA)
   * × (minB..maxB) stat rectangle misses the box. The z column is kept
   * (callers drop it after write if unwanted); row CONTENT is untouched,
   * so any query over the layout equals the same query over the source —
   * which is why the plain filter is the oracle.
   */
  def layoutByZ(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(!df.columns.contains("__z"), "__z is reserved by layoutByZ")
    df.withColumn("__z", zValue16(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
  }
}
