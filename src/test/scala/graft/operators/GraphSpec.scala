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

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    Graph.kCorePeel(edges.toDF("a", "b"), "a", "b", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCorePeel: pendant peels first; isolated-after-peel vertices peel next round") {
    // triangle 1-2-3 with pendant 3-4: k=2 drops only the pendant
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(peel(g, k = 2, rounds = 2) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    // k=3: round 1 peels 1,2,4 (degree < 3); vertex 3 then has NO live
    // edges and must peel in round 2, not vanish
    assert(peel(g, k = 3, rounds = 2) == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("kCorePeel: cascade depth on a path; bounded rounds leave a documented superset") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // k=2 peels endpoints inward: depth = distance from the rim
    assert(peel(path, k = 2, rounds = 3) ==
      Map(1L -> 1L, 5L -> 1L, 2L -> 2L, 4L -> 2L, 3L -> 3L))
    // with only one round, the inner vertices survive as the SUPERSET the
    // bounded contract documents
    assert(peel(path, k = 2, rounds = 1) ==
      Map(1L -> 1L, 5L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  /** Brute-force exact k-core on a local adjacency map: peel any vertex
    * below k until none is, one at a time — order-independent result. */
  private def bruteCore(edges: Seq[(Long, Long)], k: Int): Set[Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      adj.find { case (_, ns) => ns.size < k } match {
        case Some((vtx, _)) =>
          adj = (adj - vtx).view.mapValues(_ - vtx).toMap
        case None => changed = false
      }
    }
    adj.keySet
  }

  test("kCoreExact equals brute force on random graphs and reports convergence") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      for (k <- Seq(2, 3, 4)) {
        val rows = Graph.kCoreExact(edges.toDF("a", "b"), "a", "b", k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        assert(rows.forall(_._3), s"trial $trial k=$k must converge")
        val core = rows.filter(_._2 == 0L).map(_._1).toSet
        assert(core == bruteCore(edges, k), s"trial $trial k=$k core mismatch")
        // every vertex appears exactly once
        assert(rows.map(_._1).distinct.length == rows.length)
      }
    }
  }

  test("kCoreExact valve: a path longer than maxRounds reports converged=false superset") {
    val path = (1L until 12L).map(i => (i, i + 1))
    val capped = Graph.kCoreExact(path.toDF("a", "b"), "a", "b", k = 2, maxRounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(capped.forall(!_._3), "2 rounds cannot finish a 12-path peel")
    // the capped survivors are a SUPERSET of the true (empty) 2-core
    assert(capped.count(_._2 == 0L) > 0)
    val full = Graph.kCoreExact(path.toDF("a", "b"), "a", "b", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(full.forall(_._3) && full.count(_._2 == 0L) == 0, "true 2-core of a path is empty")
  }

  /** The weighted variant's exact recurrence on Scala maps. */
  private def refWpr(edges: Map[(Long, Long), Long], iters: Int,
                     dampBp: Long = 8500L, scale: Long = 1000000L): Map[Long, Long] = {
    val vertices = edges.keySet.flatMap(e => Seq(e._1, e._2))
    val totw = edges.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    var rank = vertices.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.toSeq
        .map { case ((u, v), w) => v -> (rank(u) * w) / totw(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = vertices.map(v =>
        v -> ((10000L - dampBp) * scale + dampBp * inflow.getOrElse(v, 0L)) / 10000L).toMap
    }
    rank.toMap
  }

  test("weightedPageRank matches the weighted reference; weight 1 everywhere equals pageRank") {
    val w = Map((1L, 2L) -> 5L, (2L, 1L) -> 1L, (1L, 3L) -> 2L, (3L, 2L) -> 3L, (4L, 1L) -> 7L)
    val df = w.toSeq.map { case ((s, d), x) => (s, d, x) }.toDF("src", "dst", "w")
    val got = Graph.weightedPageRank(df, "src", "dst", "w", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refWpr(w, 3))
    // unit weights: the split is uniform, so the plain recurrence must agree
    val unit = edges.toSeq.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w")
    val a = Graph.weightedPageRank(unit, "src", "dst", "w", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == refPageRank(edges, 3))
  }

  /** The personalized variant's exact recurrence on Scala maps. */
  private def refPpr(edges: Set[(Long, Long)], seeds: Set[Long], iters: Int,
                     dampBp: Long = 8500L, scale: Long = 1000000L): Map[Long, Long] = {
    val vertices = edges.flatMap(e => Seq(e._1, e._2))
    val inGraphSeeds = seeds.intersect(vertices)
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = vertices.map(v => v -> (if (inGraphSeeds(v)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.toSeq
        .map { case (u, v) => v -> rank(u) / outdeg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = vertices.map { v =>
        val tp = if (inGraphSeeds(v)) (10000L - dampBp) * scale else 0L
        v -> (tp + dampBp * inflow.getOrElse(v, 0L)) / 10000L
      }.toMap
    }
    rank.toMap
  }

  test("personalizedPageRank matches the seeded reference; off-graph seeds are ignored") {
    val seeds = Seq(1L, 99L).toDF("id") // 99 has no edges
    val got = Graph.personalizedPageRank(edges.toSeq.toDF("src", "dst"), "src", "dst",
        seeds, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPpr(edges, Set(1L, 99L), 3))
    assert(!got.contains(99L))
  }

  test("personalizedPageRank: vertices unreachable from seeds rank 0 and are kept") {
    // 1 -> 2, 3 -> 4 disjoint; seed 1: component {3,4} must be 0, not absent
    val g = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(g, "src", "dst", Seq(1L).toDF("id"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(3L) == 0L && got(4L) == 0L)
    assert(got(1L) > 0L && got(2L) > 0L)
  }

  test("hopDistances: exact hop counts, min over multiple paths, unreached absent") {
    // 1->2->3->4->5 chain plus shortcut 1->3; seeds {1}: the chain alone
    // needs 4 hops to 5, the shortcut brings it into the 3-hop horizon
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L)).toDF("src", "dst")
    val got = Graph.hopDistances(g, "src", "dst", Seq(1L).toDF("id"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("hopDistances: off-graph seeds stay at distance 0; multi-seed takes the nearer") {
    val g = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.hopDistances(g, "src", "dst", Seq(3L, 77L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 0L, 77L -> 0L))
    val multi = Graph.hopDistances(g, "src", "dst", Seq(1L, 2L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val r = Graph.triangleStats(edges.toDF("a", "b"), "a", "b").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("triangleStats: K4 is all triangles (clustering 10000 bp)") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(census(k4) == ((4L, 6L, 12L, 4L, 10000L)))
  }

  test("triangleStats: a star has wedges but no triangles; duplicates/self-loops drop") {
    val star = (1L to 5L).map(i => (0L, i)) ++ Seq((3L, 0L), (2L, 2L)) // dup reversed + self-loop
    assert(census(star) == ((6L, 5L, 10L, 0L, 0L)))
  }

  test("triangleStats: an empty edge set censuses as zeros, not NULLs") {
    assert(census(Seq.empty[(Long, Long)]) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("triangleStats: one triangle with a pendant edge") {
    // triangle 1-2-3 plus 3-4: wedges = 1+1+3+0, triangles = 1
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) ==
      ((4L, 4L, 5L, 1L, (3L * 10000L) / 5L)))
  }

  /** The operator's exact synchronous-LPA rule on Scala maps. */
  private def refLpa(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var labels = sym.map(_._1).map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      labels = sym.groupBy(_._1).view.mapValues { nbrs =>
        val counts = nbrs.toSeq.map(e => labels(e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        counts.toSeq.map { case (l, c) => (c, l) }
          .sortBy { case (c, l) => (-c, l) }.head._2
      }.toMap.toMap
    }
    labels
  }

  test("labelPropagation matches the synchronous min-tie reference on a barbell") {
    // two triangles bridged by one edge: labels converge within each clique
    val barbell = Set((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    for (it <- 1 to 3) {
      val got = Graph.labelPropagation(barbell.toSeq.toDF("a", "b"), "a", "b", it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refLpa(barbell, it), s"iteration $it")
    }
  }

  test("labelPropagation is partitioning-invariant (deterministic ties)") {
    val g = Set((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val df = (g.toSeq ++ g.toSeq).toDF("a", "b")
    val a = Graph.labelPropagation(df, "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(df.repartition(7), "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == refLpa(g, 2))
    assert(a == b)
  }
}
