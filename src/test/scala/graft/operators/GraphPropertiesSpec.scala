package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * Randomized-graph properties for the Graph operators, against brute-force
 * Scala references (fixed seed — deterministic, so a failure is always
 * reproducible; a seeded loop instead of ScalaCheck keeps the Spark-job
 * count bounded).
 */
class GraphPropertiesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def randomGraphs(n: Int): Seq[Set[(Long, Long)]] = {
    val rnd = new scala.util.Random(20260814L)
    (1 to n).map { _ =>
      val v = 6 + rnd.nextInt(8)
      val e = 8 + rnd.nextInt(18)
      (1 to e).map { _ =>
        (rnd.nextInt(v).toLong, rnd.nextInt(v).toLong)
      }.filter { case (a, b) => a != b }.toSet
    }
  }

  private def refPr(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val vertices = edges.flatMap(e => Seq(e._1, e._2))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = vertices.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.toSeq.map { case (u, v) => v -> rank(u) / outdeg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = vertices.map(v =>
        v -> (1500L * 1000000L + 8500L * inflow.getOrElse(v, 0L)) / 10000L).toMap
    }
    rank.toMap
  }

  private def refLpa(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val sym = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var labels = sym.map(_._1).map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      labels = sym.groupBy(_._1).view.mapValues { nbrs =>
        nbrs.toSeq.map(e => labels(e._2)).groupBy(identity).view.mapValues(_.size)
          .toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }.toMap.toMap
    }
    labels
  }

  private def refTriangles(edges: Set[(Long, Long)]): (Long, Long, Long) = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val has = und
    val tris = (for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      if has((vs(i), vs(j))) && has((vs(j), vs(k))) && has((vs(i), vs(k)))
    } yield 1).size.toLong
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size.toLong)
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    (und.size.toLong, wedges, tris)
  }

  test("pageRank / labelPropagation / triangleStats match brute-force references on random graphs") {
    randomGraphs(8).filter(_.nonEmpty).foreach { g =>
      val df = g.toSeq.toDF("src", "dst")
      val pr = Graph.pageRank(df, "src", "dst", iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pr == refPr(g, 2), s"pageRank mismatch on $g")
      val lpa = Graph.labelPropagation(df, "src", "dst", iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lpa == refLpa(g, 2), s"labelPropagation mismatch on $g")
      val c = Graph.triangleStats(df, "src", "dst").collect().head
      val (e, w, t) = refTriangles(g)
      assert((c.getLong(1), c.getLong(2), c.getLong(3)) == ((e, w, t)),
        s"triangle census mismatch on $g")
    }
  }

  test("incrementalComponents == from-scratch components on random edge splits") {
    // standing = CC(first half), then fold the second half in incrementally;
    // MIN canonicalization on both paths makes the equality exact
    val rnd = new scala.util.Random(777L)
    for (_ <- 1 to 6) {
      val v = 8 + rnd.nextInt(10)
      val all = (1 to (10 + rnd.nextInt(20)))
        .map(_ => (rnd.nextInt(v).toLong, rnd.nextInt(v).toLong))
        .filter { case (a, b) => a != b }
      val (first, second) = all.splitAt(all.size / 2)
      if (first.nonEmpty && second.nonEmpty) {
        val standing = Dedup.connectedComponents(first.toDF("a", "b"))
        val inc = Dedup.incrementalComponents(standing, second.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val scratch = Dedup.connectedComponents((first ++ second).toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // incremental covers standing ids + batch ids; scratch covers ids in
        // any edge — identical sets here since standing ids come from edges
        assert(inc == scratch, s"split=$first | $second")
      }
    }
  }

  test("incrementalComponents: disjoint batch and empty batch leave standing rows unchanged") {
    val standing = Dedup.connectedComponents(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"))
    val before = standing.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val disjoint = Dedup.incrementalComponents(standing, Seq((50L, 60L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(disjoint == before ++ Map(50L -> 50L, 60L -> 50L))
    val selfOnly = Dedup.incrementalComponents(standing, Seq((7L, 7L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(selfOnly == before) // self-loops drop; nothing to add or merge
  }
}
