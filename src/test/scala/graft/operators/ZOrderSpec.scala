package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order layout: curve correctness and the two-dimensional file-skipping
  * geometry it exists for. */
class ZOrderSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  describe("ZOrder.zValue16") {
    it("interleaves bits (a even, b odd): golden values") {
      val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 0L), (0L, 65535L))
        .toDF("a", "b")
        .select(ZOrder.zValue16(col("a"), col("b"))).as[Long].collect().toSeq
      // z(3,5): a=0b11 -> bits 0,2 = 5; b=0b101 -> bits 1,5 = 34; 5|34 = 39
      assert(got === Seq(0L, 1L, 2L, 39L, 0x55555555L, 0xAAAAAAAAL))
    }

    it("clamps out-of-domain inputs instead of corrupting high bits") {
      val got = Seq((-5L, 70000L)).toDF("a", "b")
        .select(ZOrder.zValue16(col("a"), col("b"))).as[Long].head()
      assert(got === 0xAAAAAAAAL) // a -> 0, b -> 65535
    }

    it("is monotone in each dimension within a fixed other (locality sanity)") {
      val rows = (0L until 64L).map(a => (a, 7L))
      val zs = rows.toDF("a", "b").select(ZOrder.zValue16(col("a"), col("b")))
        .as[Long].collect().toSeq
      assert(zs === zs.sorted)
    }
  }

  describe("ZOrder.layoutByZ") {
    // 64x64 grid, one row per cell. 16 range partitions over the z column
    // carve the curve into ~256-code runs = ~16x16 TILES: each partition's
    // (min..max a) x (min..max b) stat rectangle is a small square, where a
    // linear sort by `a` gives every partition the FULL b range. Partitions
    // here are files on write, and the rectangle is exactly what parquet
    // footer min/max stats expose to the scan — so "partitions overlapping a
    // box" below counts the files a stats-pruned scan would actually read.
    val grid = (0L until 4096L).map(i => (i, i % 64L, i / 64L)).toDF("id", "a", "b")
    def overlapCount(layout: org.apache.spark.sql.DataFrame,
                     bLo: Long, bHi: Long): Long = {
      val stats = layout
        .select(col("a"), col("b"), spark_partition_id().as("pid"))
        .groupBy("pid").agg(min("b").as("bmin"), max("b").as("bmax"))
      stats.where(col("bmax") >= bLo && col("bmin") <= bHi).count()
    }

    it("a b-selective box query overlaps a fraction of z-files but ALL a-sorted files") {
      val zLayout = ZOrder.layoutByZ(grid, col("a"), col("b"), 16)
      val aLayout = grid.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      val zHit = overlapCount(zLayout, 10L, 13L)
      val aHit = overlapCount(aLayout, 10L, 13L)
      assert(aHit === 16L, s"linear-by-a layout cannot prune a b-box (hit $aHit)")
      // ideal tiling hits exactly the 4 tiles of the bottom row; range-
      // boundary sampling may split a tile, so allow a small margin
      assert(zHit <= 8L, s"z layout should skip most files, hit $zHit of 16")
    }

    it("layout changes row placement only, never content") {
      val back = ZOrder.layoutByZ(grid, col("a"), col("b"), 16)
        .drop("__z").as[(Long, Long, Long)].collect().toSet
      assert(back === grid.as[(Long, Long, Long)].collect().toSet)
    }
  }
}
