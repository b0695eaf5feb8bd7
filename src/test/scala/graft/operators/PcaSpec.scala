package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * PCA: the Jacobi kernel against hand-solved and property-checked
 * matrices, the planted-plane recovery with exact projections, and the
 * fixed-point partitioning-independence law.
 */
class PcaSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("jacobi solves the hand-derived 2x2 exactly") {
    // [[17.44, 10.08], [10.08, 11.56]]: trace 29, det 100 -> eigenvalues
    // 25 and 4, eigenvectors (0.8, 0.6) and (-0.6, 0.8)
    val (values, vectors) = Pca.jacobiEigen(
      Array(Array(17.44, 10.08), Array(10.08, 11.56)))
    val order = values.indices.sortBy(i => -values(i))
    assert(math.abs(values(order(0)) - 25.0) < 1e-10)
    assert(math.abs(values(order(1)) - 4.0) < 1e-10)
    val v1 = Array(vectors(0)(order(0)), vectors(1)(order(0)))
    assert(math.abs(math.abs(v1(0)) - 0.8) < 1e-10 &&
      math.abs(math.abs(v1(1)) - 0.6) < 1e-10)
    assert(v1(0) * v1(1) > 0) // (0.8, 0.6) up to a global sign
  }

  test("jacobi satisfies A v = lambda v and orthonormality on random symmetric matrices") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 3) {
      val n = 8
      val a = Array.ofDim[Double](n, n)
      for (i <- 0 until n; j <- i until n) {
        val x = rnd.nextDouble() * 2 - 1
        a(i)(j) = x; a(j)(i) = x
      }
      val (values, vectors) = Pca.jacobiEigen(a)
      for (k <- 0 until n) {
        val v = Array.tabulate(n)(i => vectors(i)(k))
        val av = Array.tabulate(n)(i => (0 until n).map(j => a(i)(j) * v(j)).sum)
        for (i <- 0 until n) assert(math.abs(av(i) - values(k) * v(i)) < 1e-8)
      }
      for (k1 <- 0 until n; k2 <- k1 until n) {
        val d = (0 until n).map(i => vectors(i)(k1) * vectors(i)(k2)).sum
        assert(math.abs(d - (if (k1 == k2) 1.0 else 0.0)) < 1e-8)
      }
    }
  }

  private def planted(dim: Int): Seq[(Long, Seq[Double])] =
    for (doc <- 0L until 50L; variant <- 0 until 4) yield {
      val s = if (variant < 2) 1.0 else -1.0
      val t = if (variant % 2 == 0) 1.0 else -1.0
      val v = new Array[Double](dim)
      // 5s·(0.8, 0.6, 0...) + 2t·(-0.6, 0.8, 0...)
      v(0) = 4.0 * s - 1.2 * t
      v(1) = 3.0 * s + 1.6 * t
      (doc * 4 + variant, v.toSeq)
    }

  test("fit recovers the planted plane; projections are exactly the generating coefficients") {
    val df = planted(16).toDF("id", "vec")
    val m = Pca.fit(df, "vec", k = 2)
    assert(math.abs(m.eigenvalues(0) - 25.0) < 1e-4)
    assert(math.abs(m.eigenvalues(1) - 4.0) < 1e-4)
    // sign rule: largest-|entry| positive -> (0.8, 0.6) and (-0.6, 0.8)
    assert(math.abs(m.components(0)(0) - 0.8) < 1e-4)
    assert(math.abs(m.components(0)(1) - 0.6) < 1e-4)
    assert(math.abs(m.components(1)(0) + 0.6) < 1e-4)
    assert(math.abs(m.components(1)(1) - 0.8) < 1e-4)
    // balanced variants => mean exactly 0; projections land on ±5 / ±2
    assert(m.mean.forall(_ == 0.0))
    val got = Pca.project(df, "id", "vec", m)
      .as[(Long, Seq[Double])].collect()
      .map { case (k, p) => (k, math.round(p(0)), math.round(p(1))) }.toSet
    val want = planted(16).map { case (k, _) =>
      val variant = (k % 4).toInt
      val s = if (variant < 2) 1L else -1L
      val t = if (variant % 2 == 0) 1L else -1L
      (k, 5L * s, 2L * t)
    }.toSet
    assert(got == want)
  }

  test("the fitted model is partitioning-independent bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 300L).map(i => (i, Seq.fill(12)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "vec")
    val a = Pca.fit(df, "vec", 4)
    val b = Pca.fit(df.repartition(17), "vec", 4)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }

  test("rotate is an exact isometry: brute-force neighbors are identical in the rotated space") {
    val rnd = new scala.util.Random(23)
    val df = (0L until 120L).map(i => (i, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val basis = Pca.opqBasis(df, "embedding", m = 4)
    val rot = Pca.rotate(df, "vec_id", "embedding", basis)
      .toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 5)
    val qRot = rot.where($"vec_id" < 5)
    def top(qs: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(qs, c, "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top(q, df) == top(qRot, rot))
  }

  test("opqBasis allocates eigenvalues across subspaces and stays orthonormal") {
    val rnd = new scala.util.Random(31)
    // anisotropic corpus: dim d has scale ~ 1/(d+1), so eigenvalues spread
    val df = (0L until 400L).map { i =>
      (i, (0 until 8).map(d => (rnd.nextDouble() * 2 - 1) / (d + 1.0)))
    }.toDF("id", "vec")
    val m = 4
    val b = Pca.opqBasis(df, "vec", m)
    assert(b.k == 8)
    // orthonormal after permutation
    for (i <- 0 until 8; j <- i until 8) {
      val d = (0 until 8).map(x => b.components(i)(x) * b.components(j)(x)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-8)
    }
    // allocation balance: the max/min per-subspace log-variance spread must
    // be no worse than the UNPERMUTED contiguous split of the same spectrum
    def spread(groups: Seq[Seq[Double]]): Double = {
      val loads = groups.map(_.map(e => math.log(math.max(e, 1e-12))).sum)
      loads.max - loads.min
    }
    val sorted = b.eigenvalues.sorted(Ordering.Double.TotalOrdering.reverse).toSeq
    val contiguous = sorted.grouped(8 / m).toSeq
    val allocated = b.eigenvalues.toSeq.grouped(8 / m).toSeq
    // this spectrum sits entirely below 1 — the regime where a naive
    // log-load greedy (empty bucket load 0 beats every negative sum)
    // would collapse to the contiguous split; the allocation must
    // GENUINELY interleave and strictly improve the balance
    assert(allocated != contiguous, "allocation degenerated to the contiguous split")
    assert(spread(allocated) < spread(contiguous))
  }

  test("the model width is the modal vector length, not an arbitrary first row") {
    // one stray narrow row among three 2-wide rows must not redefine dim,
    // under any partitioning
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(9.0)), (3L, Seq(3.0, 4.0)),
      (4L, Seq(5.0, 6.0))).toDF("id", "vec")
    for (parts <- Seq(1, 3, 7)) {
      val m = Pca.fit(df.repartition(parts), "vec", 1)
      assert(m.dim == 2)
    }
  }

  test("the basis round-trips through the store frame and rotates identically") {
    val rnd = new scala.util.Random(41)
    val df = (0L until 100L).map(i => (i, Seq.fill(8)(rnd.nextDouble()))).toDF("id", "vec")
    val b = Pca.opqBasis(df, "vec", m = 4)
    val back = Pca.modelFromStoreFrame(Pca.modelToFrame(spark, b).repartition(3))
    assert(back.mean.toSeq == b.mean.toSeq)
    assert(back.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(back.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    val r1 = Pca.rotate(df, "id", "vec", b).as[(Long, Seq[Double])].collect().toMap
    val r2 = Pca.rotate(df, "id", "vec", back).as[(Long, Seq[Double])].collect().toMap
    assert(r1 == r2)
  }

  test("a malformed store frame fails loudly, never a bare NoSuchElement or silent pick") {
    val rnd = new scala.util.Random(43)
    val df = (0L until 40L).map(i => (i, Seq.fill(4)(rnd.nextDouble()))).toDF("id", "vec")
    val good = Pca.modelToFrame(spark, Pca.opqBasis(df, "vec", m = 2))
    def msgOf(frame: org.apache.spark.sql.DataFrame): String =
      intercept[IllegalArgumentException](Pca.modelFromStoreFrame(frame)).getMessage
    // missing mean row
    assert(msgOf(good.where($"kind" =!= "mean")).contains("exactly one 'mean'"))
    // duplicated eig row — silently using the first would mask store corruption
    assert(msgOf(good.unionAll(good.where($"kind" === "eig")))
      .contains("exactly one 'eig'"))
    // colliding component indices
    assert(msgOf(good.unionAll(good.where($"kind" === "comp" && $"idx" === 0)))
      .contains("duplicate 'comp' idx"))
    // no components at all
    assert(msgOf(good.where($"kind" =!= "comp")).contains("no 'comp' rows"))
  }

  test("OPQ codes beat or match plain PQ on an anisotropic corpus (ADC recall)") {
    // per-dim scales decay, so a CONTIGUOUS subspace split starves the
    // tail subspaces; eigenvalue allocation rebalances them
    val rnd = new scala.util.Random(47)
    val dim = 16
    val corpus = (0L until 400L).map { i =>
      (i, (0 until dim).map(d => (rnd.nextDouble() * 2 - 1) / (1.0 + d * 0.7)))
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" < 12)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def adcRecall(c: org.apache.spark.sql.DataFrame, qs: org.apache.spark.sql.DataFrame): Double = {
      val idx = Similarity.buildPqIndex(c, "vec_id", "embedding", dim = dim,
        m = 4, ks = 16, trainIters = 3)
      val got = Similarity.pqTopK(idx, qs, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val plain = adcRecall(corpus, queries)
    val basis = Pca.opqBasis(corpus, "embedding", m = 4)
    val rotC = Pca.rotate(corpus, "vec_id", "embedding", basis).toDF("vec_id", "embedding")
    val rotQ = Pca.rotate(queries, "vec_id", "embedding", basis).toDF("vec_id", "embedding")
    val opq = adcRecall(rotC, rotQ)
    assert(opq >= plain,
      f"OPQ ADC recall $opq%.3f must be >= plain PQ $plain%.3f on anisotropic data")
    assert(opq > 0.5, f"OPQ ADC recall $opq%.3f unexpectedly low")
  }

  test("whiten produces unit variance; degenerate directions floor at eps instead of exploding") {
    val df = planted(16).toDF("id", "vec")
    val m = Pca.fit(df, "vec", k = 2)
    val w = Pca.whiten(df, "id", "vec", m).as[(Long, Seq[Double])].collect()
    // planted whitened coordinates are exactly the generating signs
    assert(w.forall { case (_, ws) => ws.forall(x => math.abs(math.abs(x) - 1.0) < 1e-6) })
    val vars = (0 until 2).map(c => w.map { case (_, ws) => ws(c) * ws(c) }.sum / w.length)
    // the fixed-point Gram quantization shifts eigenvalues ~1e-6 relative
    vars.foreach(v => assert(math.abs(v - 1.0) < 1e-6))
    // a zero-variance direction (k beyond the planted plane) floors at eps:
    // outputs stay finite and zero
    val m3 = Pca.fit(df, "vec", k = 3)
    val w3 = Pca.whiten(df, "id", "vec", m3).as[(Long, Seq[Double])].collect()
    assert(w3.forall { case (_, ws) => math.abs(ws(2)) < 1e-3 && !ws(2).isNaN && !ws(2).isInfinite })
  }

  test("null and wrong-width vectors drop; empty corpus refuses") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, null.asInstanceOf[Seq[Double]]),
      (3L, Seq(9.0)), (4L, Seq(3.0, 4.0))).toDF("id", "vec")
    val m = Pca.fit(df, "vec", 1)
    assert(m.dim == 2)
    assert(Pca.project(df, "id", "vec", m)
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    intercept[IllegalArgumentException] {
      Pca.fit(df.where($"id" < 0), "vec", 1)
    }
  }
}
