package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * Fixed-point PageRank against an in-test integer reference implementation —
 * the unit-level complement of q152's chained-CTE oracle gate.
 */
class GraphSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** The operator's exact recurrence on Scala maps. */
  private def refPageRank(edges: Set[(Long, Long)], iters: Int,
                          dampBp: Long = 8500L, scale: Long = 1000000L): Map[Long, Long] = {
    val vertices = edges.flatMap(e => Seq(e._1, e._2))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = vertices.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.toSeq
        .map { case (u, v) => v -> rank(u) / outdeg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = vertices.map(v =>
        v -> ((10000L - dampBp) * scale + dampBp * inflow.getOrElse(v, 0L)) / 10000L).toMap
    }
    rank.toMap
  }

  private val edges = Set(
    (1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L), (4L, 1L)) // 4 is dangling-in only as src

  test("pageRank matches the integer reference recurrence (3 iterations)") {
    val got = Graph.pageRank(edges.toSeq.toDF("src", "dst"), "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(edges, 3))
  }

  test("dangling vertex (no out-edges) keeps only the teleport term") {
    // 9 -> 10, 10 has no out-edges: rank(10) after 1 iter =
    // (1500*scale + 8500*(scale div 1)) div 10000; rank(9) = teleport only
    val got = Graph.pageRank(Seq((9L, 10L)).toDF("src", "dst"), "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(9L) == (1500L * 1000000L) / 10000L)
    assert(got(10L) == (1500L * 1000000L + 8500L * 1000000L) / 10000L)
  }

  test("parallel edges collapse and results are partitioning-invariant") {
    val dup = (edges.toSeq ++ edges.toSeq).toDF("src", "dst")
    val a = Graph.pageRank(dup, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(dup.repartition(7), "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == refPageRank(edges, 2))
    assert(a == b)
  }

  test("total mass is conserved on a graph with no dangling vertices") {
    // every vertex has out-edges -> each round redistributes all damped mass;
    // integer division loses at most outdeg-1 units per vertex per round
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(cycle, "src", "dst", iterations = 5)
      .collect().map(_.getLong(1)).sum
    assert(got == 3L * 1000000L) // outdeg 1 everywhere: division is exact
  }
}
