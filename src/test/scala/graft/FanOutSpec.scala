package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** The scale-adaptive scan fan-out (SparkEntry.fanned, applied per call
  * site at the kernel-bound queries — tbl() itself never fans): when a
  * wrapped frame's lineage under-supplies the session's cores, fanned()
  * redistributes its rows round-robin; at scale (splits >= cores) it is
  * the identity. Results must be identical in both modes — the fan-out is
  * pure placement. */
class FanOutSpec extends AnyFunSpec with SparkSuite {

  private val bigDir = "/root/testdata/sf0.1" // single-file, single-row-group tables

  private def withFanout[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.scan.fanout", on.toString)
    try f finally spark.conf.set("spark.graft.scan.fanout", "false")
  }

  it("fans out an under-partitioned corpus scan, and only then") {
    val planOn = withFanout(on = true) {
      SparkEntry.fanned(SparkEntry.tbl(spark, bigDir, "documents"))
        .queryExecution.executedPlan.toString
    }
    assert(planOn.contains("RoundRobinPartitioning"),
      s"expected a round-robin fan-out exchange at local scale:\n$planOn")
    val planOff = withFanout(on = false) {
      SparkEntry.fanned(SparkEntry.tbl(spark, bigDir, "documents"))
        .queryExecution.executedPlan.toString
    }
    assert(!planOff.contains("Exchange"),
      s"scale mode must add no exchange:\n$planOff")
    // a frame whose lineage already supplies the cores is left alone
    val already = withFanout(on = true) {
      SparkEntry.fanned(spark.range(1000).repartition(64).toDF())
        .queryExecution.executedPlan.toString
    }
    assert("RoundRobinPartitioning".r.findAllIn(already).size == 1,
      s"an already-parallel frame must not re-fan:\n$already")
  }

  it("fan-out changes placement only: query results are identical in both modes") {
    // q69 (regex kernel) plus the fanned sites whose internals do
    // partition-order-sensitive work and so carry the real identity risk:
    // q191 (IVF/kNN float partial sums), q126 (minhash merge), q105
    // (edit-distance verify). The others share these code paths or are
    // per-row pure kernels.
    for (q <- Seq("q69_pii_scrub", "q105_edit_distance",
        "q126_minhash_merge", "q191_knn_graph")) {
      def rows(): Map[org.apache.spark.sql.Row, Int] =
        SparkEntry.queries(q)(spark, bigDir)
          .collect().toSeq.groupBy(identity).view.mapValues(_.size).toMap
      val off = withFanout(on = false)(rows())
      val on = withFanout(on = true)(rows())
      assert(on == off, s"fan-out changed the result of $q")
    }
  }
}
