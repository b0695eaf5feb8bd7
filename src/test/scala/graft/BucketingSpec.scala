package graft

import org.scalatest.funspec.AnyFunSpec

/**
 * Scale-technique guard: bucketed tables co-locate equi-joins, so repeated
 * joins on the bucket key read pre-partitioned data with NO exchange — the
 * pattern a 100 TB deployment uses for its hot join keys instead of paying a
 * shuffle per query.
 */
class BucketingSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  it("q49's co-bucketed join plans exactly one exchange (the final groupBy)") {
    val df = SparkEntry.queries("q49_bucketed_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // both scans read the bucketed layout, so the join needs no exchange;
    // the only one left is the final groupBy(mktsegment)
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
    assert(df.count() === 5L) // one row per market segment
    // the bucketed tables are deliberately NOT dropped: SparkEntry memoizes
    // the layout per dir (ensureBucketedTables), so dropping them here would
    // strand any later q49 call in this JVM with a stale "already built" note
  }

  it("partitionBy sink + filtered read scans ONLY the matching partition (partition pruning)") {
    // the other half of the 100 TB layout story: a corpus written
    // partitioned by a hot filter column is read back with PartitionFilters
    // at the scan, so a one-partition query touches one directory, not 100 TB
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = SparkEntry.tbl(spark, "/root/testdata/sf0.001", "events")
    events.select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/ev")
    val back = spark.read.parquet(s"$dir/ev").where($"event_type" === "purchase")
    val plan = back.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"expected the event_type filter to prune partitions at the scan:\n$plan")
    // pruning is semantically invisible: same rows as filtering the source
    assert(back.count() === events.where($"event_type" === "purchase").count())
  }

  it("equi-join of co-bucketed tables plans no exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val l = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
    val r = (1L to 1000L).map(i => (i % 100, i * 2)).toDF("k", "w")
    l.write.mode("overwrite").bucketBy(4, "k").sortBy("k").option("path", s"$dir/tl").saveAsTable("bucket_l")
    r.write.mode("overwrite").bucketBy(4, "k").sortBy("k").option("path", s"$dir/tr").saveAsTable("bucket_r")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
    try {
      val j = spark.table("bucket_l").join(spark.table("bucket_r"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() === 10000L) // 100 keys x 10 x 10
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bucket_l")
      spark.sql("DROP TABLE IF EXISTS bucket_r")
    }
  }
}
