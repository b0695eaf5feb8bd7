package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Stage-level profile of one query (optimization tooling — the headless
  * substitute for the Spark UI's stage table, guide §1/§7.1): runs the
  * named query with the bench methodology and prints every stage's wall
  * time, task count, and name, sorted by cost. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.Profile <sfDir> <queryName> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 1
    require(SparkEntry.queries.contains(name), s"unknown query $name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) as s").collect()
    SparkEntry.tbl(spark, sfDir, "lineitem").limit(10).collect()
    SparkEntry.prepare(spark, sfDir)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    val taskAcc = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (record) {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.add((si.stageId, ms, si.numTasks, si.name.linesIterator.next()))
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (record && te.taskInfo != null) {
          val d = te.taskInfo.duration
          taskAcc.merge(te.stageId, (d, d, 1), (a, b) =>
            (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3))
        }
    })
    def once(): Double = {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        (System.nanoTime() - t0) / 1e9
      } finally SparkEntry.drainCleanups()
    }
    once() // warm pass, unrecorded
    record = true
    val times = (1 to reps).map(_ => once())
    record = false
    Thread.sleep(500) // let the listener bus drain
    println(f"[profile] $name wall: ${times.map(t => f"$t%.2f").mkString(", ")} s (${stages.size} stages over $reps rep(s))")
    import scala.jdk.CollectionConverters._
    val rows = stages.asScala.toSeq.sortBy(-_._2)
    val total = rows.map(_._2).sum
    println(f"[profile] sum of stage wall times: ${total / 1000.0}%.2f s (stages overlap; sum > wall is normal)")
    rows.take(40).foreach { case (id, ms, n, nm) =>
      val (sum, mx, cnt) = taskAcc.getOrDefault(id, (0L, 0L, 0))
      println(f"[profile] stage $id%4d  ${ms / 1000.0}%7.2f s  $n%4d tasks  " +
        f"taskSum=${sum / 1000.0}%7.2f maxTask=${mx / 1000.0}%6.2f n=$cnt%4d  $nm")
    }
    spark.stop()
  }
}
