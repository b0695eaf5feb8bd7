package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PCA over an embedding column — the preprocessing step real embedding
 * pipelines run before indexing or semantic dedup (centering + variance
 * concentration; whitening and OPQ-style rotations build on the same
 * eigenbasis). Spark-first decomposition of the work:
 *
 *  - the DISTRIBUTED part is one map-side-combined aggregation of the
 *    second-moment state (count, per-dim sums, upper-triangular Gram) —
 *    O(dim²) state, independent of corpus size, the same shape as a
 *    `groupBy().agg()` of dim² sums;
 *  - the DRIVER part is an O(dim³) cyclic-Jacobi eigendecomposition of
 *    the dim×dim covariance — microseconds at embedding widths, and the
 *    model (mean + k components) broadcasts back as O(k·dim);
 *  - PROJECTION is a narrow typed pass (center, dot with each
 *    component) — rides the scan, no exchange.
 *
 * Determinism (the house discipline): per-row moment contributions are
 * INTEGER FIXED-POINT (quantized at [[quantScale]] BEFORE any cross-row
 * summation — integer sums commute, so the aggregated state is
 * partitioning-independent bit-for-bit), Jacobi sweeps run in a fixed
 * order from a deterministic state, eigenpairs sort by (eigenvalue desc,
 * index), and each component's sign is fixed by making its
 * largest-magnitude entry positive (earliest dim wins magnitude ties).
 * Two runs over any partitioning of the same data produce the same model
 * to the last bit.
 */
object Pca {

  /** Fixed-point scale for per-row moment contributions. */
  val quantScale: Long = 1L << 20

  /** A fitted model: per-dim mean, k orthonormal components (row-major),
    * and their eigenvalues (variance along each component). */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
    def varianceExplained: Array[Double] = {
      val t = eigenvalues.sum
      eigenvalues.map(e => if (t > 0) e / t else 0.0)
    }
  }

  /**
   * Fit a k-component model: one distributed moment aggregation + the
   * driver-side eigendecomposition. Null and wrong-width vectors are
   * dropped (the corpus contract is a fixed embedding width; `dim` is
   * taken from the first vector seen).
   */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    fitK(df, vecCol, Some(k))
  }

  /** The full-basis model (k = dim): an orthonormal ROTATION of the
    * embedding space — the substrate of whitening and OPQ. */
  def fitFull(df: DataFrame, vecCol: String): PcaModel = fitK(df, vecCol, None)

  private def fitK(df: DataFrame, vecCol: String, kOpt: Option[Int]): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
      .filter(v => v != null && v.nonEmpty)
    // the corpus width is the MODAL vector length (count desc, then the
    // wider wins) — deterministic under any partitioning, and one
    // truncated stray row cannot silently redefine the model width the
    // way an arbitrary first-row probe would
    val dim = {
      val widths = vecs.map(_.length).groupByKey(identity).count()
        .collect()
      require(widths.nonEmpty, "cannot fit PCA on an empty corpus")
      widths.minBy { case (w, n) => (-n, -w) }._1
    }
    val k = kOpt.getOrElse(dim)
    require(k <= dim, s"k=$k exceeds the embedding width dim=$dim")
    // per-partition integer moment state; partials collect (dim²-bounded
    // × partitions) and sum on the driver — integer sums commute, so the
    // result is independent of partitioning and order
    val gramLen = dim * (dim + 1) / 2
    val partials = vecs.mapPartitions { it =>
      var n = 0L
      val sums = new Array[Long](dim)
      val gram = new Array[Long](gramLen)
      it.foreach { v =>
        if (v.length == dim) {
          n += 1L
          val a = v.toArray
          var i = 0
          var g = 0
          while (i < dim) {
            sums(i) += math.round(a(i) * quantScale)
            var j = i
            while (j < dim) {
              gram(g) += math.round(a(i) * a(j) * quantScale)
              g += 1
              j += 1
            }
            i += 1
          }
        }
      }
      if (n == 0L) Iterator.empty else Iterator.single((n, sums, gram))
    }.collect()
    val n = partials.map(_._1).sum
    require(n > 0L, "cannot fit PCA on an empty corpus")
    val sums = new Array[Long](dim)
    val gram = new Array[Long](gramLen)
    partials.foreach { case (_, s, g) =>
      var i = 0
      while (i < dim) { sums(i) += s(i); i += 1 }
      var j = 0
      while (j < gramLen) { gram(j) += g(j); j += 1 }
    }
    val mean = sums.map(_.toDouble / quantScale / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var g = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val e = gram(g).toDouble / quantScale / n - mean(i) * mean(j)
        cov(i)(j) = e; cov(j)(i) = e
        g += 1
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // (eigenvalue desc, index) with the sign rule
    val order = values.indices.sortBy(ix => (-values(ix), ix)).take(k)
    val comps = order.map { ix =>
      val v = Array.tabulate(dim)(d => vectors(d)(ix))
      var best = 0
      var d = 1
      while (d < dim) {
        if (math.abs(v(d)) > math.abs(v(best))) best = d
        d += 1
      }
      if (v(best) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(mean, comps, order.map(values(_)).toArray)
  }

  /**
   * The OPQ basis (Ge et al. 2013, the PARAMETRIC variant §4): a
   * full-dimension PCA rotation whose components are then PERMUTED by
   * eigenvalue allocation — descending eigenvalues deal greedily onto
   * the m PQ subspaces, each taking the one with the smallest
   * accumulated log-variance — so every subspace carries a comparable
   * share of the corpus variance and no PQ codebook is starved or
   * overloaded. Quantize in THIS basis (rotate, then
   * [[Similarity.buildPqIndex]] on the projections) and re-rank against
   * the original vectors: rotation is orthonormal, so exact distances
   * are unchanged while the codes' quantization error drops.
   */
  def opqBasis(df: DataFrame, vecCol: String, m: Int): PcaModel = {
    require(m >= 1, s"m must be >= 1, got $m")
    val full = fitFull(df, vecCol)
    require(full.dim % m == 0, s"m=$m must divide dim=${full.dim}")
    val slots = full.dim / m
    // Greedy min-load balance needs NON-NEGATIVE addends: raw log λ is
    // negative for any spectrum below 1 (unit-normalized embeddings —
    // the common case), where an empty bucket's 0 load would beat every
    // started bucket and the "allocation" would collapse to the
    // contiguous descending split. Shifting by the minimum log is
    // balance-preserving because every bucket receives exactly `slots`
    // components (equal counts ⇒ equal shift mass).
    val logs = full.eigenvalues.map(e => StrictMath.log(math.max(e, 1e-12)))
    val shift = logs.min
    val sizes = new Array[Int](m)
    val load = new Array[Double](m)
    val buckets = Array.fill(m)(List.empty[Int])
    var i = 0
    while (i < full.dim) { // components arrive eigenvalue-descending
      var best = -1
      var b = 0
      while (b < m) {
        if (sizes(b) < slots &&
          (best < 0 || load(b) < load(best) ||
            (load(b) == load(best) && b < best))) best = b
        b += 1
      }
      buckets(best) ::= i
      sizes(best) += 1
      load(best) += logs(i) - shift
      i += 1
    }
    val order = buckets.toSeq.flatMap(_.reverse)
    PcaModel(full.mean,
      order.map(full.components(_)).toArray,
      order.map(full.eigenvalues(_)).toArray)
  }

  /** The model as a store-able frame `(kind, idx, values)` — the standing
    * basis artifact ([[graft.operators.Bpe.mergesFrame]] discipline):
    * one `mean` row, one `eig` row, one `comp` row per component. */
  def modelToFrame(spark: org.apache.spark.sql.SparkSession, model: PcaModel): DataFrame = {
    import spark.implicits._
    (Seq(("mean", -1L, model.mean.toSeq), ("eig", -1L, model.eigenvalues.toSeq)) ++
      model.components.zipWithIndex.map { case (c, i) => ("comp", i.toLong, c.toSeq) })
      .toDF("kind", "idx", "values")
  }

  /** Load a [[modelToFrame]] back (component order restored by idx).
    * Structural integrity is checked LOUDLY (the `maxEntries` guard's
    * discipline): a frame missing its singleton `mean`/`eig` rows, carrying
    * duplicates of them, or with colliding `comp` indices is not a model
    * frame and must fail with a diagnosis, not a bare
    * `NoSuchElementException` or a silently-arbitrary row choice. */
  def modelFromStoreFrame(df: DataFrame, maxEntries: Int = 65536): PcaModel = {
    val rows = df.limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"basis frame exceeds maxEntries=$maxEntries — not a model-sized frame")
    def arr(r: org.apache.spark.sql.Row): Array[Double] =
      r.getSeq[Double](2).toArray
    val byKind = rows.groupBy(_.getString(0))
    def exactlyOne(kind: String): org.apache.spark.sql.Row = {
      val rs = byKind.getOrElse(kind, Array.empty[org.apache.spark.sql.Row])
      require(rs.length == 1,
        s"not a model frame: expected exactly one '$kind' row, found ${rs.length}")
      rs.head
    }
    val mean = arr(exactlyOne("mean"))
    val eig = arr(exactlyOne("eig"))
    val compRows = byKind.getOrElse("comp", Array.empty[org.apache.spark.sql.Row])
    require(compRows.nonEmpty, "not a model frame: no 'comp' rows")
    val idxs = compRows.map(_.getLong(1))
    require(idxs.distinct.length == idxs.length,
      "not a model frame: duplicate 'comp' idx values")
    val comps = compRows.sortBy(_.getLong(1)).map(arr)
    PcaModel(mean, comps, eig)
  }

  /**
   * Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
   * (eigenvalues, column eigenvectors). Fixed sweep order and a fixed
   * convergence schedule — deterministic for a given input. O(dim³) per
   * sweep; embedding widths converge in a handful of sweeps.
   */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = Array.tabulate(n, n)((i, j) => aIn(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-24) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = {
              val s = if (theta >= 0) 1.0 else -1.0
              s / (math.abs(theta) + StrictMath.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / StrictMath.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /**
   * Project each vector onto the model's components: `(idCol,
   * proj: array<double>[k])` — center by the mean, dot with each
   * component, one narrow typed pass. Null / wrong-width vectors drop.
   */
  def project(df: DataFrame, idCol: String, vecCol: String, model: PcaModel): DataFrame =
    transformBy(df, idCol, vecCol, model, center = true)

  /**
   * The UNCENTERED isometry: `v · component_j` with NO mean subtraction —
   * a pure orthonormal rotation, so dot products, norms, and therefore
   * cosines are preserved exactly (centering, which [[project]] applies,
   * is right for variance analysis but SHIFTS cosine geometry). This is
   * the face quantization composes with: OPQ = [[opqBasis]] rotation →
   * PQ on the rotated vectors → exact re-rank against the originals.
   */
  def rotate(df: DataFrame, idCol: String, vecCol: String, model: PcaModel): DataFrame =
    transformBy(df, idCol, vecCol, model, center = false)

  /**
   * PCA WHITENING: center, project, and scale each component by
   * 1/√eigenvalue, so every output coordinate has unit variance and the
   * transformed covariance is the identity — the normalization semantic
   * dedup and clustering run so that one dominant direction cannot drown
   * the rest of the space. `eps` floors near-zero eigenvalues (a
   * degenerate direction must not explode). Same narrow one-pass shape
   * as [[project]].
   */
  def whiten(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
      eps: Double = 1e-9): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = model.dim
    val scale = model.eigenvalues.map(e => 1.0 / StrictMath.sqrt(math.max(e, eps)))
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, vec) =>
        if (vec == null || vec.length != dim) Iterator.empty
        else {
          val a = vec.toArray
          val out = Array.tabulate(model.k) { c =>
            val comp = model.components(c)
            var s = 0.0
            var i = 0
            while (i < dim) { s += (a(i) - model.mean(i)) * comp(i); i += 1 }
            s * scale(c)
          }
          Iterator.single((id, out.toSeq))
        }
      }
      .toDF(idCol, "white")
  }

  private def transformBy(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, center: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = model.dim
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, vec) =>
        if (vec == null || vec.length != dim) Iterator.empty
        else {
          val a = vec.toArray
          val proj = model.components.map { comp =>
            var s = 0.0
            var i = 0
            while (i < dim) {
              s += (if (center) a(i) - model.mean(i) else a(i)) * comp(i)
              i += 1
            }
            s
          }
          Iterator.single((id, proj.toSeq))
        }
      }
      .toDF(idCol, "proj")
  }
}
