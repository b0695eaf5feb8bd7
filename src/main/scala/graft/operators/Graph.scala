package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics as Pregel-on-DataFrames — the companion to
 * [[Dedup.connectedComponents]] for WEIGHTED vertex importance: a crawl
 * pipeline ranks domains by link authority before allocating crawl budget,
 * and a dedup pipeline ranks cluster members by co-purchase/citation
 * centrality when picking canonical survivors.
 *
 * Engine-exact discipline: ranks are FIXED-POINT integers (scaled by
 * `scale`), the damping factor is basis points, and every update is integer
 * multiply/divide — so an N-iteration run is a pure function of the edge
 * set, reproducible bit-for-bit on any engine, any partitioning (float
 * PageRank drifts with summation order; integer sums are order-free).
 */
object Graph {

  /**
   * Fixed-point PageRank over a directed edge list, `iterations` rounds of
   *
   *   rank'(v) = ((10000 − dampingBp)·scale
   *               + dampingBp · Σ_{u→v} (rank(u) div outdeg(u))) div 10000
   *
   * with rank_0(v) = scale (the "total mass = N·scale" formulation — no
   * divide-by-N, so the arithmetic never leaves the integers). Dangling
   * vertices (no out-edges) keep receiving the teleport term but distribute
   * nothing — their mass leaks, the standard simplified PageRank a ranking
   * (not a probability) consumer uses; exact replay only needs the oracle
   * to apply the same rule. Parallel edges collapse (`distinct`);
   * self-loops are legal and count toward outdeg.
   *
   * SCALE SHAPE: the (src, dst, outdeg) frame is built ONCE and
   * checkpointed — iterations never re-derive degrees. Each round is (a)
   * one hash join of the O(V) rank frame against edges on src, shuffling
   * only (id, rank) pairs; (b) one map-side-combined sum keyed by dst; (c)
   * one left join back onto the vertex list for the teleport term — three
   * exchanges of keys-proportional frames per round, payloads never move,
   * and `localCheckpoint` truncates the growing lineage exactly as the
   * connected-components loop does. At 1000 executors the per-round cost is
   * the edge shuffle; V-proportional frames spill, nothing collects to the
   * driver.
   *
   * Returns one row per vertex: (id, rank_scaled).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, dampingBp: Int = 8500,
               scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    require(dampingBp >= 0 && dampingBp <= 10000,
      s"dampingBp must be in [0,10000], got $dampingBp")
    require(scale >= 1L, s"scale must be positive, got $scale")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val vertices = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    var rank = vertices.withColumn("rank", lit(scale))
    for (_ <- 1 to iterations) {
      val inflow = withDeg.join(rank, col("src") === col("id"))
        .select(col("dst").as("id"), expr("rank div outdeg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__inflow"))
      rank = vertices.join(inflow, Seq("id"), "left_outer")
        .select(col("id"), expr(
          s"((${10000 - dampingBp}L * ${scale}L) + ${dampingBp}L * coalesce(__inflow, 0L)) div 10000L"
        ).as("rank"))
        .localCheckpoint()
    }
    rank.select(col("id"), col("rank").as("rank_scaled"))
  }
}
