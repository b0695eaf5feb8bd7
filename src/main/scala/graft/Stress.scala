package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale-stress harness (not part of the driver contract): replicates a
 * testdata table 10x with shifted ids — every row 10-way duplicated, the
 * worst-case true-positive mass for a dedup verify step — and runs the
 * embedding dedup chain (q59's pipeline: LSH candidates -> exact-cosine
 * verify -> connected components -> canonical survivors) end to end,
 * printing per-stage wall seconds and cardinalities. The text analog (round-3
 * study) is recorded in BASELINE.md; this main keeps the embedding study
 * reproducible.
 *
 * Usage: runMain graft.Stress [sfDir] (default /root/testdata/sf0.1)
 */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // 10 copies, ids shifted into disjoint ranges: every vector is a 10-clique
    val corpus = (0 until 10)
      .map(i => emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated)")(corpus.count())
    println(s"[stress] corpus rows: $n")

    // q59's chain at threshold 0.999, under two table geometries: the q59
    // default (8 bits x 8 tables — tuned for the natural corpus density) and
    // the 10x-density response (16 bits x 4 tables: bucket count scales with
    // the corpus, so the hot-bucket cap never bites and planted recall is
    // exact). Both geometries pack into the same 64-bit signature.
    for ((planes, tables) <- Seq((8, 8), (16, 4))) {
      val drops0 = operators.Dedup.droppedHotBuckets(spark).value
      val pairs = operators.Similarity
        .lshNearNeighbors(corpus, "vec_id", "embedding", 64,
          planesPerTable = planes, tables = tables, threshold = 0.999)
        .select(col("id_a"), col("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val nPairs = timed(s"[$planes bits x $tables tables] LSH candidates + cosine verify")(pairs.count())
      println(s"[stress] verified pairs: $nPairs (planted: ${n / 10} * 45 = ${n / 10 * 45})")

      val comps = timed(s"[$planes bits x $tables tables] connected components") {
        val c = operators.Dedup.connectedComponents(pairs)
        c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER).count()
        c
      }
      val nClusters = comps.select(countDistinct(col("component"))).head().getLong(0)
      val survivors = timed(s"[$planes bits x $tables tables] canonical survivors (anti-join)") {
        val nonCanonical = comps.where(col("id") =!= col("component"))
          .select(col("id").as("vec_id"))
        corpus.select(col("vec_id")).join(nonCanonical, Seq("vec_id"), "left_anti").count()
      }
      val drops = operators.Dedup.droppedHotBuckets(spark).value - drops0
      println(s"[stress] clusters: $nClusters, survivors: $survivors (expected ${n / 10}), dropped hot buckets: $drops")
      pairs.unpersist(); comps.unpersist()
    }
    spark.stop()
  }
}
