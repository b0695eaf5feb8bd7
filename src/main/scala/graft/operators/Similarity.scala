package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions.dotProduct
import graft.sorted.syntax._

/**
 * Similarity search over embedding columns (`array<float>`), designed for the
 * two regimes that matter at 100 TB:
 *
 *  - a SMALL query set against a huge corpus: `broadcast` the queries so the
 *    corpus is scanned exactly once with no shuffle of corpus rows, and
 *    reduce per-query top-k with a bounded-heap combiner (map-side partial
 *    combine => the shuffle carries at most k rows per query per partition);
 *  - ALL-PAIRS near-neighbor: LSH-bucket by random-hyperplane signature so
 *    the quadratic join only happens within buckets.
 *
 * All dot products are sequential double accumulation (`aggregate` over
 * `zip_with`), which is bit-identical to DuckDB's `list_dot_product` — that
 * exactness is what lets the oracle hash-compare ranked results.
 */
object Similarity {

  /** Sequential-order double dot product of two array<double> columns —
    * a codegen'd native expression (see [[graft.expressions.DotProduct]]);
    * bit-identical to `aggregate(zip_with(..))` and DuckDB `list_dot_product`. */
  def dot(a: Column, b: Column): Column = dotProduct(a, b)

  /** Cosine similarity: dot / (||a|| * ||b||), all sequential double math in
    * ONE codegen'd array pass (the composed dot/dot/dot formulation traverses
    * each array three times). Zero-norm vectors (padding / failed encodes)
    * get similarity 0.0 — the raw 0/0 would be NaN, and Spark SQL orders NaN
    * ABOVE every number, so an unguarded NaN passes `>= threshold` filters
    * and ranks first in top-k. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineSim(a, b)

  /** Driver collect of a query-vector frame, GUARDED BEFORE the collect:
    * `limit(maxQueries + 1)` bounds what can ever reach the driver, so a
    * mis-pointed corpus-as-queries call fails the `require` with a clear
    * message instead of OOM-killing the driver first (the loadIvfIndex /
    * loadPqIndex discipline, applied to the ADC search entry points).
    * Null vectors are dropped; result sorted by id for determinism. */
  private def collectQueries(queries: DataFrame, idCol: String, vecCol: String,
      maxQueries: Int): Array[(Long, Array[Double])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qArr = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .limit(maxQueries + 1)
      .as[(Long, Array[Double])].collect()
    require(qArr.length <= maxQueries,
      s"query frame exceeds maxQueries=$maxQueries — the query side is " +
        "broadcast by contract; probe in batches or raise the cap deliberately")
    val out = qArr.filter(_._2 != null).sortBy(_._1)
    // duplicate query ids would silently collapse in the per-id probe maps
    // (ivfPqTopK keys its cell->query routing by id): each duplicate would
    // build its own ADC table but probe with the LAST duplicate's vector,
    // and rankTopK would merge both rows' scores under one query_id — so a
    // duplicated id is a caller bug, rejected loudly here
    var i = 1
    while (i < out.length) {
      require(out(i)._1 != out(i - 1)._1,
        s"query frame carries duplicate id ${out(i)._1} — query ids must be " +
          "distinct (scores for duplicates would merge under one query_id)")
      i += 1
    }
    out
  }

  /** Per-query ADC lookup tables + query norms over a PQ codebook grid:
    * `T[j][c] = <q_j, cw_{j,c}>` for each query, plus ||q|| — the
    * driver-side O(nq * m * ks * subDim) setup shared by [[pqTopK]] and
    * [[ivfPqTopK]]. Zero-norm queries are dropped (cosine undefined). */
  private def adcTables(qArr: Array[(Long, Array[Double])],
      books: Array[Array[Array[Double]]],
      subDim: Int): Array[(Long, Array[Array[Double]], Double)] =
    qArr.map { case (qid, qv) =>
      val t = Array.tabulate(books.length, books(0).length) { (j, c) =>
        val cw = books(j)(c)
        var s = 0.0; var i = 0
        while (i < cw.length) {
          val p = j * subDim + i
          s += (if (p < qv.length) qv(p) else 0.0) * cw(i)
          i += 1
        }
        s
      }
      var n2 = 0.0; var i = 0
      while (i < qv.length) { n2 += qv(i) * qv(i); i += 1 }
      (qid, t, math.sqrt(n2))
    }.filter(_._3 > 0.0)

  /** Driver/executor-local sequential cosine over double arrays (length
    * mismatch reads the shorter prefix; zero norms score 0.0) — the scalar
    * twin of [[cosine]], shared by the quantizer builders and probes. */
  private def cosLocal(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) 0.0 else dab / denom
  }

  /**
   * Per-query bounded top-k ranking of `(query_id, (cos, neighbor_id))` rows
   * via `groupSortCombine` — a bounded insertion-sort combiner ordered by
   * (cos desc, id asc), capped at k. Map-side partial aggregation keeps the
   * per-query state O(k) and the shuffle at most k rows per query per
   * partition, regardless of how many candidates were scored — the scale-safe
   * alternative to a `row_number` window, which would sort ALL of a query's
   * candidates in a single task. Shared by [[bruteForceTopK]] and [[ivfTopK]].
   */
  private def rankTopK(scored: Dataset[(Long, (Double, Long))], k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    def insert(acc: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] =
      ((v :: acc).sortBy { case (cos, id) => (-cos, id) }).take(k)
    scored
      .groupSortCombine[List[(Double, Long)]](v => List(v), insert, (a, b) => (a ++ b).sortBy { case (cos, id) => (-cos, id) }.take(k))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case ((_, nid), i) => (qid, nid, (i + 1).toLong) }
      }
      .toDF("query_id", "neighbor_id", "rank")
  }

  /**
   * Exact top-k neighbors for each query vector: broadcast the (small) query
   * side, one pass over the corpus, then per-query bounded top-k reduction
   * via [[rankTopK]]'s combiner, so partial aggregation keeps the shuffle
   * tiny regardless of corpus size.
   *
   * Input frames must have (idCol, vecCol) columns. Self-matches are dropped.
   * Returns (query_id, neighbor_id, rank) with rank 1..k by (cos desc, id).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), struct(cosine(col("qv"), col("cv")).as("cos"), col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    rankTopK(scored, k)
  }

  /**
   * HARD-NEGATIVE mining for contrastive training: for each query vector,
   * the top-k most-similar corpus vectors with a DIFFERENT label — the
   * near-boundary examples that make embedding models learn, mined here as
   * "similar but not same-class". Identical scale shape to
   * [[bruteForceTopK]] (broadcast query side, one corpus pass, bounded
   * combiner — shuffle <= k rows per query per partition); the label
   * inequality is part of the join predicate so mismatched pairs are dropped
   * before scoring. Rows whose label is NULL on either side are excluded
   * (unknown class can't be certified a negative).
   *
   * Returns (query_id, neighbor_id, rank), rank 1..k by (cos desc, id).
   */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("qlabel")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("clabel"))
    val scored = c.join(q,
        col("query_id") =!= col("neighbor_id") && col("qlabel") =!= col("clabel"))
      .select(col("query_id"), struct(cosine(col("qv"), col("cv")).as("cos"),
        col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    rankTopK(scored, k)
  }

  /**
   * kNN LABEL-NOISE detection / pseudo-labeling: for each query vector, the
   * majority label among its k nearest corpus neighbors (exact cosine,
   * self-match excluded) next to its own label — rows where the two disagree
   * are mislabel candidates, and rows where they agree with a strong vote
   * are high-confidence. Same scale shape as [[bruteForceTopK]] (broadcast
   * query side, bounded per-query combiner state); the voting itself
   * aggregates at most k rows per query, and "max votes, ties to the
   * smallest label" resolves as max(votes) then min(label) over the tied
   * rows — label-type-generic (numeric or string, no negation edge) and
   * fully deterministic given the neighbor ranking, which breaks cosine
   * ties by id. Neighbors with a NULL label are excluded from the vote
   * (they can't testify).
   *
   * Returns (vec_id, own_label, majority_label, n_votes): n_votes = how many
   * of the k neighbors carry the majority label.
   */
  def knnLabelVote(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val knn = bruteForceTopK(queries, corpus, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("__nl"))
      .where(col("__nl").isNotNull)
    val votes = labels.join(broadcast(knn), "neighbor_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("v"))
    // "max votes, then smallest label" without negating the label column:
    // max(v) first, then min(label) among the tied rows — works for ANY
    // orderable label type (strings included) and has no Long.MinValue
    // negation edge. Both aggregates run over the tiny (queries x labels)
    // vote frame, never the corpus.
    // broadcast is safe HERE (unlike the stats operators): top is bounded by
    // the query-set size, which is this operator's documented small-side
    // contract (the query frame itself already broadcasts)
    val top = votes.groupBy(col("query_id")).agg(max(col("v")).as("n_votes"))
    votes.join(broadcast(top), Seq("query_id"))
      .where(col("v") === col("n_votes"))
      .groupBy(col("query_id"), col("n_votes"))
      .agg(min(col("__nl")).as("majority_label"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(labelCol).as("own_label"))),
        "query_id")
      .select(col("query_id").as("vec_id"), col("own_label"),
        col("majority_label"), col("n_votes"))
  }

  /**
   * INT8-quantized top-k cosine search — the memory-bound scale path: one
   * global symmetric scale (127 / max|v| over the corpus, an O(1)-per-row
   * order-independent aggregate), vectors stored as 1-byte lanes (4× smaller
   * than float32, 8× than float64 — at 100 TB the difference between an
   * embedding store that fits executor memory and one that doesn't).
   * Quantized scores are INTEGER dot products (bit-deterministic under any
   * partitioning or reduction order — int sums commute exactly, unlike
   * floats) normalized by the quantized norms; ranking and tie-breaks are
   * therefore a pure function of the data. Same bounded-combiner ranking as
   * [[bruteForceTopK]]; callers gate recall@k against the exact ranking on a
   * sample (the q86 pattern).
   *
   * The scale collect is one scalar — the same driver-side O(1) investment as
   * the IVF centroid collect, paid once per corpus version.
   *
   * Vectors that quantize to ALL-ZERO lanes (norm 0) are excluded on BOTH
   * sides — cosine is undefined for them. Note a QUERY can quantize to zero
   * when a large-magnitude corpus outlier dominates the global scale (every
   * component under max|v|/254 rounds to 0); such a query emits no rows, so
   * callers that must not lose queries should check the output's query_id
   * coverage (q86's recall join does — a dropped query reads recall 0).
   */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val maxAbs = corpus
      .select(max(array_max(transform(col(vecCol).cast("array<double>"), x => abs(x)))).as("m"))
      .as[Option[Double]].head().getOrElse(0.0)
    require(maxAbs > 0.0 && !maxAbs.isInfinite,
      s"corpus must contain a finite non-zero vector component, max|v| = $maxAbs")
    val scale = 127.0 / maxAbs
    def quant(df: DataFrame, outId: String) = df.select(
      col(idCol).cast("long").as(outId),
      transform(col(vecCol).cast("array<double>"),
        x => least(greatest(round(x * scale), lit(-127.0)), lit(127.0)).cast("int")).as(s"${outId}_qv"))
      .withColumn(s"${outId}_n2",
        aggregate(col(s"${outId}_qv"), lit(0L), (acc, v) => acc + v * v))
      .where(col(s"${outId}_n2") > 0L)
    val q = broadcast(quant(queries, "query_id"))
    val c = quant(corpus, "neighbor_id")
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), struct(
        (aggregate(zip_with(col("query_id_qv"), col("neighbor_id_qv"), (a, b) => (a * b).cast("long")),
            lit(0L), (acc, v) => acc + v).cast("double")
          / sqrt((col("query_id_n2") * col("neighbor_id_n2")).cast("double"))).as("cos"),
        col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    rankTopK(scored, k)
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim) —
    * fixed public constants, no RNG state, identical across runs/executors. */
  private def coef(plane: Int, dim: Int): Double = {
    val h = (dim.toLong * 2654435761L + plane.toLong * 40503L + 7L) % 1000003L
    h.toDouble / 1000003.0 - 0.5
  }

  /** Random-hyperplane LSH bucket signature (numPlanes sign bits -> long).
    * Each projection is a codegen'd dot product against a CONSTANT coefficient
    * array. Fine for a handful of planes; for wide signatures prefer
    * [[hyperplaneSignatures]] — a 64-plane expression tree blows past
    * codegen's method-size sweet spot and costs ~1s of Janino compilation. */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val plane = typedLit((0 until dim).map(i => coef(p, i)))
      when(dot(vec, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** All numPlanes sign bits per row in ONE narrow typed pass over a
    * precomputed coefficient matrix (same `coef` constants, same ascending
    * accumulation — bit-identical to [[hyperplaneBucket]]). Emits (id, sig). */
  def hyperplaneSignatures(df: DataFrame, idCol: String, vecCol: String, dim: Int, numPlanes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val coefs = Array.tabulate(numPlanes, dim)(coef)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        rows.filter(_._2 != null).map { case (id, v) =>
          var sig = 0L
          var p = 0
          while (p < numPlanes) {
            val cs = coefs(p)
            val n = math.min(v.length, dim)
            var acc = 0.0
            var i = 0
            while (i < n) { acc += v(i) * cs(i); i += 1 }
            if (acc > 0) sig |= 1L << p
            p += 1
          }
          (id, sig)
        }
      }
      .toDF(idCol, "sig")
  }

  /**
   * Approximate near-neighbor pairs with OR-amplified random-hyperplane LSH:
   * `tables` independent hash tables of `planesPerTable` sign bits each; a
   * pair is a candidate if it collides in ANY table (recall amplification),
   * then exact cosine verifies. The scale path for all-pairs similarity —
   * quadratic work is confined to same-bucket rows, and both the bucketing
   * pass and the verify join shuffle only on (table, bucket).
   *
   * Bucket width governs the quadratic blow-up: `planesPerTable` sign bits
   * give 2^bits buckets per table, and candidates grow with (rows/bucket)^2.
   * The default 8 bits keeps per-table collision probability ~(1-θ/π)^8 —
   * ≈0.3 per table / ≈0.94 OR-amplified over 8 tables for cos≥0.9 pairs,
   * while a 4-bit table would put ~6% of ALL pairs in the candidate set.
   */
  def lshNearNeighbors(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                       planesPerTable: Int = 8, tables: Int = 8, threshold: Double = 0.35,
                       maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // 1) signature pass: one narrow typed scan, no wide expression tree
    require(planesPerTable >= 1 && tables >= 1 && planesPerTable * tables <= 64,
      s"planesPerTable * tables must fit the packed 64-bit signature " +
        s"(got $planesPerTable * $tables = ${planesPerTable * tables}) — JVM shifts " +
        "wrap mod 64, so an oversized geometry would silently alias bucket bits")
    require(planesPerTable <= 63,
      s"planesPerTable must be <= 63, got $planesPerTable (the (1L << n) - 1 lane mask wraps at 64)")
    val sigs = hyperplaneSignatures(df, idCol, vecCol, dim, planesPerTable * tables)
    // 2) candidate pairs: explode per-table buckets, group by (table, bucket),
    //    expand in-bucket pairs carrying ONLY ids, dedup across tables BEFORE
    //    verification. One group-by shuffle — the signature pass has a single
    //    consumer, so nothing needs caching (a self-join formulation forced a
    //    persist whose cold-run cache race double-computed the scan). Buckets
    //    hotter than `maxBucket` are dropped (see [[Dedup.bucketPairs]]).
    val banded = sigs.select(
        col(idCol),
        posexplode(array((0 until tables).map { t =>
          shiftrightunsigned(col("sig"), t * planesPerTable)
            .bitwiseAND(lit((1L << planesPerTable) - 1))
        }: _*)).as(Seq("table", "bucket")))
      .select(col("table"), col("bucket"), col(idCol).cast("long"), lit(0L))
      .as[(Int, Long, Long, Long)]
    val candidates = Dedup.bucketPairs(banded, maxBucket)
      .select(col("id_a"), col("id_b"))
      .distinct()
    // 3) verify: join vectors back, exact cosine (codegen'd, float-widening),
    //    once per pair
    val vecs = df.select(col(idCol), col(vecCol).as("v"))
    candidates
      .join(vecs.select(col(idCol).as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col("v").as("v_b")), "id_b")
      .where(cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /**
   * Deterministic Lloyd's k-means refinement of an IVF coarse quantizer:
   * seed centroids are the lowest-id vectors, then `iters` rounds of
   * cosine-assignment + mean update. Each round is ONE distributed pass —
   * per-partition accumulators reduce to O(k * dim) driver state, no shuffle
   * of corpus vectors. Empty clusters keep their previous centroid, so the
   * result is always k centroids and fully deterministic. Requires a corpus
   * with at least k vectors (fewer would silently shrink the quantizer).
   */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Array[Array[Double]] = corpus.where(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>")).as[Array[Double]].collect()
    require(cents.length == k,
      s"corpus has only ${cents.length} vectors but k=$k centroids were requested: " +
        "a silently smaller quantizer would contradict the k-centroid contract " +
        "(and Dataset.reduce throws on an empty corpus)")
    val vecs = corpus.select(col(vecCol).cast("array<double>")).as[Array[Double]]
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val (sums, counts) = vecs
        .mapPartitions { rows =>
          val cs = bc.value
          val dim = if (cs.nonEmpty) cs(0).length else 0
          val acc = Array.fill(cs.length)(new Array[Double](dim))
          val cnt = new Array[Long](cs.length)
          rows.foreach { v =>
            if (v != null && v.nonEmpty) {
              var best = 0; var bestCos = Double.NegativeInfinity
              var ci = 0
              while (ci < cs.length) {
                var dab = 0.0; var daa = 0.0; var dbb = 0.0
                val n = math.min(v.length, cs(ci).length)
                var i = 0
                while (i < n) { dab += v(i) * cs(ci)(i); daa += v(i) * v(i); dbb += cs(ci)(i) * cs(ci)(i); i += 1 }
                val denom = math.sqrt(daa) * math.sqrt(dbb)
                val c = if (denom == 0.0) 0.0 else dab / denom
                if (c > bestCos) { bestCos = c; best = ci }
                ci += 1
              }
              val a = acc(best)
              var i = 0
              while (i < math.min(v.length, a.length)) { a(i) += v(i); i += 1 }
              cnt(best) += 1
            }
          }
          Iterator.single((acc, cnt))
        }
        .reduce { (x, y) =>
          val (ax, cx) = x; val (ay, cy) = y
          var ci = 0
          while (ci < ax.length) {
            var i = 0
            while (i < ax(ci).length) { ax(ci)(i) += ay(ci)(i); i += 1 }
            cx(ci) += cy(ci)
            ci += 1
          }
          (ax, cx)
        }
      cents = Array.tabulate(cents.length) { ci =>
        if (counts(ci) == 0) cents(ci) // empty cluster: keep previous centroid
        else sums(ci).map(_ / counts(ci))
      }
    }
    cents
  }

  /**
   * A standing IVF index: the trained coarse quantizer plus the corpus
   * assignment frame `(neighbor_id, cent_id, cv)` (each corpus vector's
   * inverted-list membership; `cv` is stored `array<float>` — the source
   * embedding width — so the standing index costs 4 bytes/dim, not 8; all
   * scoring widens to double exactly). At 100 TB this is the layout a deployment
   * builds ONCE — exactly like a bucketed table — and every query run pays
   * probe + rank only; callers owning a long-lived index should
   * `index.assigned.persist(...)` (or write it out partitioned by `cent_id`)
   * and release it when retiring the index.
   */
  final class IvfIndex private[operators] (
      private[operators] val centroids: Array[(Long, Array[Double])],
      val assigned: DataFrame) extends Serializable

  /** The trained quantizer as a `(cent_id, cent_v)` frame — the
    * PERSISTABLE half of an [[IvfIndex]] (the assignment frame is the
    * other): write both through a manifest-committed index store (e.g.
    * [[graft.sources.Sink.writeIndex]], assignment partitioned by
    * `cent_id`) and a later session reconstructs the identical index with
    * [[loadIvfIndex]] instead of re-scanning the corpus. nCentroids rows,
    * array<double> exact through parquet. */
  def centroidsFrame(spark: SparkSession, index: IvfIndex): DataFrame = {
    import spark.implicits._
    spark.createDataset(index.centroids.toSeq).toDF("cent_id", "cent_v")
  }

  /** Reconstruct a standing [[IvfIndex]] from its two persisted frames —
    * the load half of the store round trip. The centroid collect is
    * O(nCentroids * dim), bounded by the same guard as the build path
    * (a mis-pointed centroids frame must fail loudly, not OOM the
    * driver); `assigned` is consumed lazily as written. */
  def loadIvfIndex(centroids: DataFrame, assigned: DataFrame,
      maxCentroids: Int = 65536): IvfIndex = {
    val spark = centroids.sparkSession
    import spark.implicits._
    val n = centroids.count()
    require(n > 0 && n <= maxCentroids,
      s"centroids frame carries $n rows; expected (0, $maxCentroids] — wrong frame?")
    val centArr = centroids
      .select(col("cent_id").cast("long"), col("cent_v").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    new IvfIndex(centArr, assigned)
  }

  /**
   * TWO-LEVEL coarse quantizer — the production-scale IVF routing path.
   * A FLAT quantizer stops scaling around 10⁴–10⁵ cells: every routed
   * vector pays O(nCells·dim) and every task closure carries the whole
   * nCells·dim centroid array. This factors the cell grid as
   * k1 super-centroids × k2 RESIDUAL sub-centroids (the inverted
   * multi-index decomposition, Babenko & Lempitsky 2012): cell (c1, c2)'s
   * effective centroid is `super(c1) + sub(c2)`, routing scores the k1
   * supers, expands the `expand` nearest, and ranks the expand·k2
   * candidate cells by cosine against the COMPOSED centroid —
   * O((k1 + expand·k2)·dim) per vector and (k1 + k2)·dim closure state,
   * both ~2·√nCells at k1 = k2. 10⁶ cells route through ~2,000 centroid
   * comparisons and < 1 MB of closure instead of 10⁶ and ~0.5 GB.
   *
   * Determinism: supers rank by (cos desc, index asc), cells by
   * (composed-cos desc, cell asc) — identical vectors always land in the
   * same cell, near-identical vectors in near-identical probe sets (what
   * IVF recall actually rests on). `expand = k1` considers every cell, so
   * probing all k1·k2 cells degenerates to exact brute force — the recall
   * gate IvfRecallSpec pins (≥4096 cells), with the routing-cost contrast
   * measured in `Stress ann`.
   */
  final class TwoLevelQuantizer private[operators] (
      private[operators] val supers: Array[Array[Double]],
      private[operators] val subs: Array[Array[Double]],
      val expand: Int) extends Serializable {
    require(supers.nonEmpty && subs.nonEmpty, "both quantizer levels need centroids")
    require(expand >= 1 && expand <= supers.length,
      s"expand must be in [1, ${supers.length}], got $expand")
    def k1: Int = supers.length
    def k2: Int = subs.length
    def nCells: Long = k1.toLong * k2
    /** The composed centroid of one cell — `super + sub`, the vector
      * residual encoders subtract ([[buildIvfPqIndex2]]) and the ADC
      * centroid term dots against. Callers encoding row streams should
      * memoize per partition (cells-touched-per-task bounded). */
    def cellCentroid(cell: Long): Array[Double] = {
      val s = supers((cell / k2).toInt)
      val r = subs((cell % k2).toInt)
      Array.tabulate(math.max(s.length, r.length)) { i =>
        (if (i < s.length) s(i) else 0.0) + (if (i < r.length) r(i) else 0.0)
      }
    }
    // DECOMPOSED scoring state — the computational heart of the
    // multi-index: cos(v, s+r) needs only v·s, v·r (one dot-product sweep
    // per LEVEL, not per cell) and the precomputed ||s||², ||r||², s·r
    // grid, so a candidate cell scores in O(1) after (k1 + k2)·dim setup.
    // The s·r grid is k1·k2 DOUBLES (8 MB at 10⁶ cells — vs 0.5 GB of
    // materialized cell centroids); @transient lazy so each executor JVM
    // derives it once from the shipped (k1 + k2)·dim level arrays.
    @transient private lazy val ss2: Array[Double] = supers.map(s => dot(s, s))
    @transient private lazy val rr2: Array[Double] = subs.map(r => dot(r, r))
    @transient private lazy val sr: Array[Array[Double]] =
      supers.map(s => subs.map(r => dot(s, r)))
    private def dot(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    }
    /** The `n` nearest cells of `v` by (composed cosine desc, cell asc),
      * searched inside the `expand` nearest super-cells. Scoring is the
      * cosLocal(v, super + sub) quantity computed through the
      * decomposition — same math, floating-point REGROUPED, so near-tie
      * cell choices may differ from a materialized-centroid evaluation;
      * what matters is that THIS rule is a pure deterministic function
      * (assignment and probe always agree). Dot products against `v`
      * truncate at v's width, mirroring cosLocal's min-length rule. */
    def routeN(v: Array[Double], n: Int): Array[Long] = {
      val vnorm = math.sqrt(dot(v, v))
      val vs = supers.map(s => dot(v, s))
      val vr = subs.map(r => dot(v, r))
      val supTop = supers.indices
        .map { i =>
          val d = vnorm * math.sqrt(ss2(i))
          (if (d == 0.0) 0.0 else vs(i) / d, i)
        }
        .sortBy { case (cs, i) => (-cs, i) }
        .take(expand)
      def cellCos(si: Int, j: Int): Double = {
        val b2 = ss2(si) + 2.0 * sr(si)(j) + rr2(j)
        val d = vnorm * math.sqrt(math.max(b2, 0.0))
        if (d == 0.0) 0.0 else (vs(si) + vr(j)) / d
      }
      if (n == 1) {
        // assignment hot path: direct argmax, no candidate materialization
        var bestCell = Long.MaxValue
        var bestCos = Double.NegativeInfinity
        supTop.foreach { case (_, si) =>
          var j = 0
          while (j < k2) {
            val cell = si.toLong * k2 + j
            val cs = cellCos(si, j)
            if (cs > bestCos || (cs == bestCos && cell < bestCell)) {
              bestCos = cs; bestCell = cell
            }
            j += 1
          }
        }
        Array(bestCell)
      } else {
        val cand = new Array[(Double, Long)](supTop.length * k2)
        var idx = 0
        supTop.foreach { case (_, si) =>
          var j = 0
          while (j < k2) {
            cand(idx) = (cellCos(si, j), si.toLong * k2 + j)
            idx += 1; j += 1
          }
        }
        cand.sortBy { case (cs, cell) => (-cs, cell) }.take(n).map(_._2)
      }
    }
    def route(v: Array[Double]): Long = routeN(v, 1).head
  }

  /** A standing two-level IVF index: the [[TwoLevelQuantizer]] plus the
    * corpus assignment frame `(neighbor_id, cent_id, cv)` — the
    * [[IvfIndex]] layout with the hierarchical quantizer in place of the
    * flat centroid array (cent_id = c1·k2 + c2). */
  final class IvfIndex2 private[operators] (
      val quantizer: TwoLevelQuantizer,
      val assigned: DataFrame) extends Serializable

  /** Build a [[TwoLevelQuantizer]] + assignment: train k1 super-centroids
    * on the corpus, k2 sub-centroids on the RESIDUALS `v − super(v)` (one
    * extra narrow pass), then assign each vector to its routed cell — the
    * [[buildIvfIndex]] shape with hierarchical routing. Source width is
    * preserved exactly as in [[buildIvfIndex]] (float corpus → float `cv`). */
  def buildIvfIndex2(corpus: DataFrame, idCol: String, vecCol: String,
      k1: Int, k2: Int, trainIters: Int = 1, expand: Int = 4): IvfIndex2 = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val supers = trainCentroids(corpus, idCol, vecCol, k1, trainIters)
    // residuals against the assignment rule's nearest super (ties → lowest
    // index, trainCentroids' own rule) — one narrow closure-captured pass
    val residuals = corpus
      .select(col(idCol).cast("long").as("__rid"), col(vecCol).cast("array<double>").as("__v"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.collect { case (id, v) if v != null =>
        val s = supers(nearestIdx(supers, v))
        (id, Array.tabulate(v.length)(i => v(i) - (if (i < s.length) s(i) else 0.0)))
      })
      .toDF("__rid", "__rv")
    val subs = trainCentroids(residuals, "__rid", "__rv", k2, trainIters)
    val q = new TwoLevelQuantizer(supers, subs, expand)

    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val sourceIsFloat = corpus.select(col(vecCol)).schema.head.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val assigned =
      if (sourceIsFloat)
        corpus.select(col(idCol).cast("long"), col(vecCol))
          .as[(Long, Array[Float])]
          .mapPartitions(_.collect { case (id, v) if v != null =>
            (id, q.route(v.map(_.toDouble)), v)
          })
          .toDF("neighbor_id", "cent_id", "cv")
      else
        corpus.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
          .as[(Long, Array[Double])]
          .mapPartitions(_.collect { case (id, v) if v != null =>
            (id, q.route(v), v)
          })
          .toDF("neighbor_id", "cent_id", "cv")
    new IvfIndex2(q, assigned)
  }

  /** The two-level quantizer as ONE persistable frame `(lvl, cid, cent_v)`
    * (lvl 1 = supers, 2 = residual subs; one lvl-0 metadata row carries the
    * build-time `expand` in `cid`) — [[centroidsFrame]]'s sibling for the
    * store round trip. (k1 + k2 + 1) rows, array<double> exact through
    * parquet. Persisting `expand` matters: the ROUTING RULE is part of the
    * index identity — a reload with a different expansion would probe cells
    * the stored assignment never used, silently degrading recall. */
  def quantizer2Frame(spark: SparkSession, index: IvfIndex2): DataFrame = {
    import spark.implicits._
    val q = index.quantizer
    spark.createDataset(
      Seq((0, q.expand.toLong, Array.empty[Double])) ++
        q.supers.toSeq.zipWithIndex.map { case (v, i) => (1, i.toLong, v) } ++
        q.subs.toSeq.zipWithIndex.map { case (v, i) => (2, i.toLong, v) })
      .toDF("lvl", "cid", "cent_v")
  }

  /** Reconstruct a standing [[IvfIndex2]] from its persisted frames — the
    * hierarchical replacement for [[loadIvfIndex]]'s flat 65,536-centroid
    * guard: each LEVEL is bounded at 65,536 rows (driver state stays
    * (k1 + k2)·dim) while the CELL count reaches k1·k2 — beyond 10⁹. The
    * routing expansion comes FROM the frame's metadata row (the build-time
    * value the assignment was routed with); `expandOverride > 0` replaces
    * it deliberately (recall/latency retuning — callers own the
    * consistency argument then). */
  def loadIvfIndex2(quantizer: DataFrame, assigned: DataFrame,
      expandOverride: Int = 0, maxPerLevel: Int = 65536): IvfIndex2 = {
    val spark = quantizer.sparkSession
    import spark.implicits._
    val rows = quantizer
      .select(col("lvl").cast("int"), col("cid").cast("long"), col("cent_v").cast("array<double>"))
      .as[(Int, Long, Array[Double])].collect()
    def level(l: Int): Array[Array[Double]] = {
      val vs = rows.filter(_._1 == l).sortBy(_._2).map(_._3)
      require(vs.nonEmpty && vs.length <= maxPerLevel,
        s"quantizer level $l carries ${vs.length} centroids; expected (0, $maxPerLevel] — wrong frame?")
      vs
    }
    val stored = rows.filter(_._1 == 0).map(_._2.toInt).headOption
    val expand = if (expandOverride > 0) expandOverride
      else stored.getOrElse(throw new IllegalArgumentException(
        "quantizer frame carries no expand metadata row (lvl 0) and no expandOverride was given"))
    new IvfIndex2(new TwoLevelQuantizer(level(1), level(2), expand), assigned)
  }

  /**
   * Probe a standing [[IvfIndex2]] — [[ivfProbe]] for the hierarchical
   * quantizer. Routing is a NARROW closure-captured pass over the query
   * frame (the [[knnGraph]] shape — queries are never collected or
   * broadcast), candidates come from one `cent_id` equi-join, exact cosine
   * ranks through the bounded-heap combiner. `nProbe = nCells` with
   * `expand = k1` reproduces exact brute force.
   */
  def ivfProbe2(index: IvfIndex2, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val q = index.quantizer
    val routes = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        if (v == null) Iterator.empty
        else q.routeN(v, nProbe).iterator.map(c => (id, c, v))
      })
      .toDF("query_id", "cent_id", "qv")
    val scored = routes
      .join(index.assigned.select(col("cent_id"), col("neighbor_id"), col("cv")), Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        struct(cosine(col("qv"), col("cv").cast("array<double>")).as("cos"),
          col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    rankTopK(scored, k)
  }

  /** Nearest centroid by (cosine desc, index asc) over a bare centroid
    * array — [[trainCentroids]]' assignment rule, shared by the residual
    * pass so the sub-quantizer trains against exactly the assignments the
    * supers would make. */
  private def nearestIdx(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var ci = 0
    while (ci < cents.length) {
      val cs = cosLocal(v, cents(ci))
      if (cs > bestCos) { bestCos = cs; best = ci }
      ci += 1
    }
    best
  }

  /**
   * Build the IVF coarse quantizer + inverted-list assignment (the index-build
   * half of [[ivfTopK]]). The quantizer is `nCentroids` deterministic seed
   * vectors (lowest ids), optionally refined by `trainIters` k-means rounds
   * (one distributed corpus pass each); materializing it to the driver is
   * O(nCentroids * dim) — bounded by the centroid count, never a data collect.
   * Assignment is a NARROW typed argmax against the closure-captured centroid
   * array — one corpus scan, zero shuffle (the previous groupBy(max_by)
   * formulation moved every corpus vector through an exchange once).
   */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    nCentroids: Int = 16, trainIters: Int = 0): IvfIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centArr: Array[(Long, Array[Double])] =
      if (trainIters > 0)
        trainCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
          .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      else {
        val seeds = corpus.where(col(vecCol).isNotNull)
          .orderBy(col(idCol)).limit(nCentroids)
          .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
          .as[(Long, Array[Double])].collect()
        // same contract as trainCentroids: a silently smaller quantizer
        // would widen every cell and break the nProbe/nCentroids cost math
        require(seeds.length == nCentroids,
          s"corpus yielded only ${seeds.length} seed centroids, need $nCentroids")
        seeds
      }

    // The standing index stores vectors at the SOURCE width: a float32
    // corpus (this repo's embeddings) stays array<float> — half the bytes of
    // a double frame, and the index footprint IS the dominant standing cost
    // of an ANN deployment — while a double corpus stays array<double>
    // (narrowing it would silently drop mantissa bits and change scores).
    // All similarity math widens to double, which is exact from float, so
    // float-source scores are bit-identical to a double-stored index.
    def argmax(v: Array[Double]): Long = nearestCentroid(centArr, v)

    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val sourceIsFloat = corpus.select(col(vecCol)).schema.head.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val assigned =
      if (sourceIsFloat)
        corpus.select(col(idCol).cast("long"), col(vecCol))
          .as[(Long, Array[Float])]
          .mapPartitions(_.collect { case (id, v) if v != null =>
            (id, argmax(v.map(_.toDouble)), v)
          })
          .toDF("neighbor_id", "cent_id", "cv")
      else
        corpus.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
          .as[(Long, Array[Double])]
          .mapPartitions(_.collect { case (id, v) if v != null =>
            (id, argmax(v), v)
          })
          .toDF("neighbor_id", "cent_id", "cv")
    new IvfIndex(centArr, assigned)
  }

  /**
   * FILTERED vector search: restrict a standing [[IvfIndex]] to an
   * allow-list of ids (the metadata-predicate result — "only label X",
   * "only license-clean docs", "only this snapshot's survivors") without
   * rebuilding anything. The semi-join prunes the inverted lists; the
   * quantizer is untouched, so probing behaves identically with fewer
   * candidates — the standard pre-filtered ANN shape. The keep-set frame
   * joins by id only (no vectors move), and the planner broadcasts it when
   * small.
   */
  def restrict(index: IvfIndex, keep: DataFrame, idCol: String): IvfIndex =
    new IvfIndex(index.centroids,
      index.assigned.join(
        keep.select(col(idCol).cast("long").as("neighbor_id")).distinct(),
        Seq("neighbor_id"), "left_semi"))

  /** Per-context count of quantizer cells dropped by the occupancy cap —
    * the IVF analog of [[Dedup.droppedHotBuckets]]. Zero in a healthy run;
    * nonzero means the corpus collapsed into cells the quantizer cannot
    * discriminate (retrain with more centroids / more iters).
    *
    * AT-LEAST-ONCE, not exact: the increment runs inside a transformation
    * (the sentinel mapPartitions), so re-execution — a second action on the
    * returned frame, a task retry, an AQE re-plan — adds again. Treat it
    * as a production health SIGNAL (zero vs nonzero); the per-query
    * `dropped_hot_cells` observe metric on the SAME frame is the exact
    * per-action count. Same caveat as the [[Dedup]] accumulator family. */
  def droppedHotCells(spark: SparkSession): org.apache.spark.util.LongAccumulator =
    droppedCellAcc.computeIfAbsent(spark.sparkContext.applicationId,
      _ => spark.sparkContext.longAccumulator("graft.similarity.droppedHotCells"))
  private val droppedCellAcc =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.util.LongAccumulator]()

  /** Name prefix of the per-query `Dataset.observe` metric
    * (`dropped_hot_cells`) [[centroidBlockedPairs]] emits — same production
    * hook and same AQE empty-relation caveat as
    * [[Dedup.HotBucketMetricPrefix]]. */
  val HotCellMetricPrefix = "graft.similarity.hotCells."
  private val cellObsId = new java.util.concurrent.atomic.AtomicLong

  /** Default per-cell occupancy cap: above this the within-cell exact
    * verify's <= cap^2/2 pair expansion stops being "linear at fixed cell
    * width" and the cell carries no blocking signal anyway — matches the
    * LSH expanders' [[Dedup.DefaultMaxBucket]] rationale. */
  val DefaultMaxCell: Int = 1024

  /**
   * SemDeDup-style centroid-blocked near-duplicate pair source over a built
   * [[IvfIndex]]: exact cosine runs only WITHIN a quantizer cell (a
   * `cent_id` equi-join), never all-pairs — the embedding analog of the
   * LSH-bucketed text path. Size the quantizer to the corpus
   * (k ≈ n / targetCellWidth) and the within-cell compare stays linear in n
   * at a fixed cell width; identical vectors share an argmax at ANY k, so
   * exact duplicates always meet in a cell. Returns (id_a, id_b) with
   * id_a < id_b and cosine >= minCosine.
   *
   * OCCUPANCY GUARD: a skewed corpus collapsing into one cell would turn
   * the in-cell verify quadratic in n — exactly the blowup the LSH path
   * caps with [[Dedup.DefaultMaxBucket]]. Cells holding more than
   * `maxCell` members are dropped WHOLE before the self-join (the
   * occupancy count is one narrow aggregate over the id/cent columns; the
   * hot-cell list is nCentroids-bounded and broadcast into an anti-join),
   * counted in [[droppedHotCells]] and surfaced per-query as the observed
   * `dropped_hot_cells` metric — never silent.
   */
  def centroidBlockedPairs(index: IvfIndex, minCosine: Double,
      maxCell: Int = DefaultMaxCell): DataFrame =
    centroidBlockedPairsFrom(index.assigned, minCosine, maxCell)

  /** [[centroidBlockedPairs]] over a TWO-LEVEL index — the blocking only
    * ever touches the assignment frame (a `cent_id` equi-join), so the
    * hierarchical quantizer plugs in unchanged; what it buys is cell
    * counts that can actually reach n / targetCellWidth at corpus scale. */
  def centroidBlockedPairs2(index: IvfIndex2, minCosine: Double,
      maxCell: Int = DefaultMaxCell): DataFrame =
    centroidBlockedPairsFrom(index.assigned, minCosine, maxCell)

  private def centroidBlockedPairsFrom(assigned: DataFrame, minCosine: Double,
      maxCell: Int): DataFrame = {
    require(maxCell >= 2, s"maxCell must be >= 2, got $maxCell")
    val spark = assigned.sparkSession
    import spark.implicits._
    val acc = droppedHotCells(spark)
    val occ = assigned.groupBy(col("cent_id")).agg(count(lit(1)).as("__n"))
    val hotCells = occ.where(col("__n") > maxCell).select(col("cent_id"))
    val live = assigned
      .join(broadcast(hotCells), Seq("cent_id"), "left_anti")
    val a = live.select(col("cent_id"), col("neighbor_id").as("id_a"), col("cv").as("va"))
    val b = live.select(col("cent_id"), col("neighbor_id").as("id_b"), col("cv").as("vb"))
    val pairs = a.join(b, Seq("cent_id"))
      .where(col("id_a") < col("id_b") && cosine(col("va"), col("vb")) >= minCosine)
      .select(col("id_a"), col("id_b"), lit(0).as("__dropped"))
    // one sentinel row per dropped cell: counted by the observe metric and
    // the accumulator, then stripped — the Dedup.observeDrops pattern
    val sentinels = hotCells.select(col("cent_id").cast("long")).as[Long]
      .mapPartitions(_.map { _ => acc.add(1L); (0L, 0L, 1) })
      .toDF("id_a", "id_b", "__dropped")
    pairs.unionByName(sentinels)
      .observe(s"$HotCellMetricPrefix${cellObsId.incrementAndGet()}",
        sum(col("__dropped")).cast("long").as("dropped_hot_cells"))
      .where(col("__dropped") === 0)
      .drop("__dropped")
  }

  /**
   * Probe a standing [[IvfIndex]]: each query scores only its `nProbe`
   * nearest inverted lists; exact cosine ranks the candidates. The recurring
   * cost of an IVF deployment — the expensive exact scoring touches
   * ~nProbe/nCentroids of the corpus, and no stage shuffles full vectors
   * except the bounded candidate set.
   */
  def ivfProbe(index: IvfIndex, queries: DataFrame, idCol: String, vecCol: String,
               k: Int, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val cents = broadcast(
      spark.createDataset(index.centroids.toSeq).toDF("cent_id", "cent_v"))
    // nProbe nearest centroids per query (query set is small by contract)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(cosine(col("qv"), col("cent_v")).desc, col("cent_id"))
    val probes = q.join(cents)
      .withColumn("rn", row_number().over(probeW))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cent_id"))
    // candidates = union of probed inverted lists; exact cosine scoring, then
    // per-query top-k via the bounded-heap combiner (each corpus vector lives
    // in exactly ONE inverted list and each (query, cent) probe row is unique,
    // so a (query, neighbor) candidate is scored at most once — no dedup
    // needed before ranking). A row_number window here would sort every
    // probed candidate of a query in a single task — under exhaustive probing
    // that is the whole corpus per query.
    val scored = broadcast(probes).join(index.assigned, "cent_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id").cast("long"),
        struct(cosine(col("qv"), col("cv")).as("cos"), col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    rankTopK(scored, k)
  }

  /**
   * IVF (inverted-file) approximate top-k: the classic two-level ANN index,
   * Spark-first — [[buildIvfIndex]] then [[ivfProbe]] in one call. One-shot
   * convenience: a deployment (or benchmark) running many query batches
   * should build the index once and call [[ivfProbe]] per batch, the way
   * `SparkEntry.prepare` memoizes it for q38.
   *
   * `nProbe >= nCentroids` degenerates to exact brute force (useful for
   * recall testing). Self-matches are dropped. Returns
   * (query_id, neighbor_id, rank) with rank 1..k by (cos desc, id).
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nCentroids: Int = 16, nProbe: Int = 4, trainIters: Int = 0): DataFrame =
    ivfProbe(buildIvfIndex(corpus, idCol, vecCol, nCentroids, trainIters),
      queries, idCol, vecCol, k, nProbe)

  /** `edges`: (query_id, neighbor_id, rank) approximate-kNN rows.
    * `droppedCells`: 1-row (n_dropped_cells) — inverted lists excluded by
    * the occupancy cap, crossJoin-broadcast it into an output for in-query
    * completeness observability (the family convention). */
  final case class KnnGraphResult(edges: DataFrame, droppedCells: DataFrame)

  /**
   * CORPUS-TO-CORPUS approximate kNN graph over a standing [[IvfIndex]] —
   * every corpus vector's top-k neighbors in ONE distributed plan: the
   * primitive under graph-based clustering, SemDeDup-style pruning, and
   * kNN-classification of a whole corpus. [[ivfProbe]] broadcasts a
   * (small-by-contract) query batch; here the query side IS the corpus,
   * so nothing is collected or broadcast. Each vector routes to its
   * `nProbe` nearest cells in a NARROW typed pass against the
   * closure-captured quantizer (the [[buildIvfIndex]] assignment shape),
   * candidates come from ONE `cent_id` equi-join against the inverted
   * lists, and per-vector top-k uses the bounded-heap combiner — never a
   * window over the scored frame.
   *
   * SCALE SHAPE: candidate mass ≈ nProbe/nCentroids × n × cellWidth —
   * linear in n at fixed cell width (size the quantizer n/cellWidth, as
   * [[centroidBlockedPairs]] documents). The only vector movement is the
   * route-side shuffle into the join (nProbe copies of each vector);
   * the combiner keeps the rank shuffle at k rows per vector per
   * partition. Cells over `maxCell` members are dropped WHOLE from the
   * CANDIDATE side and counted (a skew-collapsed cell would quadratize
   * the join — the LSH hot-bucket rationale); vectors living in a dropped
   * cell still route as queries to their other probed cells.
   */
  def knnGraph(index: IvfIndex, k: Int, nProbe: Int = 4,
      maxCell: Int = DefaultMaxCell): KnnGraphResult = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    require(maxCell >= 2, s"maxCell must be >= 2, got $maxCell")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val centArr = index.centroids
    val occ = index.assigned.groupBy(col("cent_id")).agg(count(lit(1)).as("__n"))
    val hotCells = occ.where(col("__n") > maxCell).select(col("cent_id"))
    val dropped = hotCells.agg(count(lit(1)).as("n_dropped_cells"))
    val live = index.assigned.join(broadcast(hotCells), Seq("cent_id"), "left_anti")
    // per-vector probe routing: narrow, quantizer closure-captured — the
    // query side never collects (contrast ivfProbe's broadcast contract)
    val routes = index.assigned
      .select(col("neighbor_id").as("query_id"), col("cv").cast("array<double>").as("qv"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        if (v == null) Iterator.empty
        else nearestCentroids(centArr, v, nProbe).iterator.map(c => (id, c, v))
      })
      .toDF("query_id", "cent_id", "qv")
    // each corpus vector lives in exactly one inverted list and each
    // (query, cent) route row is unique, so a (query, neighbor) candidate
    // scores at most once — no dedup before ranking
    val scored = routes
      .join(live.select(col("cent_id"), col("neighbor_id"), col("cv")), Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        struct(cosine(col("qv"), col("cv").cast("array<double>")).as("cos"),
          col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    KnnGraphResult(rankTopK(scored, k), dropped)
  }

  /**
   * [[knnGraph]] over a standing [[IvfIndex2]] — the corpus-to-corpus kNN
   * graph at PRODUCTION cell counts: routing per vector costs
   * (k1 + expand·k2)·dim through the hierarchical quantizer instead of
   * nCells·dim, and the task closure carries (k1 + k2)·dim doubles
   * instead of the flat centroid grid — the combination that lets the
   * knnGraph sizing rule (cells ≈ n / cellWidth) reach 10⁵⁺ cells. Same
   * plan shape and occupancy-cap semantics as the flat version; gated by
   * IvfRecallSpec (graph ≡ per-vector ivfProbe2 at the same geometry).
   */
  def knnGraph2(index: IvfIndex2, k: Int, nProbe: Int = 4,
      maxCell: Int = DefaultMaxCell): KnnGraphResult = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    require(maxCell >= 2, s"maxCell must be >= 2, got $maxCell")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val q = index.quantizer
    val occ = index.assigned.groupBy(col("cent_id")).agg(count(lit(1)).as("__n"))
    val hotCells = occ.where(col("__n") > maxCell).select(col("cent_id"))
    val dropped = hotCells.agg(count(lit(1)).as("n_dropped_cells"))
    val live = index.assigned.join(broadcast(hotCells), Seq("cent_id"), "left_anti")
    val routes = index.assigned
      .select(col("neighbor_id").as("query_id"), col("cv").cast("array<double>").as("qv"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        if (v == null) Iterator.empty
        else q.routeN(v, nProbe).iterator.map(c => (id, c, v))
      })
      .toDF("query_id", "cent_id", "qv")
    val scored = routes
      .join(live.select(col("cent_id"), col("neighbor_id"), col("cv")), Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        struct(cosine(col("qv"), col("cv").cast("array<double>")).as("cos"),
          col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    KnnGraphResult(rankTopK(scored, k), dropped)
  }

  /**
   * Per-key elementwise vector sums — the building block of class centroids
   * (classifier init, nearest-centroid labeling, embedding-drift
   * monitoring): `(key, pos, sum_micros, n)` where `sum_micros` is the
   * EXACT integer sum of `round(v[pos] * 1e6)` across the key's vectors and
   * `n` the vector count; mean = sum_micros / (n * 1e6) is then exact
   * double division. Integer sums on purpose: a float/double `avg` depends
   * on parallel reduction order and can't hash-compare across engines or
   * even across runs. Plan shape: `posexplode` is narrow (n·dim rows that
   * never leave the map side intact) and the partial hash-agg collapses
   * them to (keys × dims) rows per partition before the one tiny shuffle —
   * at any corpus size the exchange carries dimensions, not data.
   */
  def vectorSumsByKey(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col(keyCol), col("pos"))
      .agg(
        sum(round(col("__v").cast("double") * 1000000.0).cast("long")).as("sum_micros"),
        count(lit(1)).as("n"))

  /**
   * [[vectorSumsByKey]] plus the second moment: `(key, pos, sum_micros,
   * sumsq_micros, n)` with `sumsq_micros` the exact integer sum of squared
   * micro-units — per-dimension variance (the embedding-drift /
   * feature-scaling monitor: a collapsing dimension reads variance → 0) is
   * then ONE exact-integer-fed division downstream:
   * var = (sumsq − sum²/n) / n in micro² units. Same plan shape as the sums
   * (narrow posexplode, partial hash-agg, a dims-not-data shuffle); squares
   * stay in range for |v| < ~10^3 at up to ~10^6 rows per (key, dim).
   */
  def vectorMomentsByKey(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .withColumn("__m", round(col("__v").cast("double") * 1000000.0).cast("long"))
      .groupBy(col(keyCol), col("pos"))
      .agg(
        sum(col("__m")).as("sum_micros"),
        sum(col("__m") * col("__m")).as("sumsq_micros"),
        count(lit(1)).as("n"))

  /** One side of the triangle-blocked all-pairs self-join: hash each row
    * into one of `nBlocks` blocks and replicate it into every block-pair
    * CELL it can meet another row in — cell key (lo, hi) with lo <= hi,
    * encoded `lo * nBlocks + hi`. A pair with blocks (bi, bj), bi != bj,
    * shares exactly the one cell (min, max); a SAME-block pair shares all
    * nBlocks cells (both rows carry identical cell sets), so the join must
    * additionally pin the match to the pair's canonical cell — the caller
    * keeps only rows where the joined cell equals the cell derived from the
    * two block ids (carried through as `blkAs`). */
  private def blockCells(df: DataFrame, idCol: String, vecCol: String,
                         nBlocks: Int, idAs: String, vecAs: String,
                         blkAs: String, cellAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        pmod(xxhash64(col(idCol)), lit(nBlocks)).cast("int").as(blkAs))
      .withColumn("__x", explode(sequence(lit(0), lit(nBlocks - 1))))
      .select(col(idAs), col(vecAs), col(blkAs),
        (least(col(blkAs), col("__x")) * nBlocks + greatest(col(blkAs), col("__x"))).as(cellAs))

  /** Exact all-pairs similarity above a threshold, as a TRIANGLE-BLOCKED
    * self-equi-join: both sides replicate each row into its `nBlocks`
    * block-pair cells and join on the cell key, so every unordered pair is
    * scored exactly once. The n^2/2 cosine evaluations are inherent to the
    * EXACT contract — what blocking changes is the SHAPE: a shuffled
    * equi-join over ~nBlocks^2/2 evenly-sized cells (no CartesianProduct /
    * BroadcastNestedLoopJoin node, no single task owning the whole
    * quadratic), at the price of nBlocks-way row replication through one
    * shuffle. Size `nBlocks` so a cell's rows (~2n/nBlocks per side) fit a
    * task comfortably. For open-ended corpora where n^2 compute itself is
    * the problem, use [[lshNearNeighbors]] + exact verify instead. */
  def exactSimilarPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                        nBlocks: Int = 16): DataFrame = {
    require(nBlocks >= 1, s"nBlocks must be positive, got $nBlocks")
    val a = blockCells(df, idCol, vecCol, nBlocks, "id_a", "v_a", "__blk_a", "__cell_a")
    val b = blockCells(df, idCol, vecCol, nBlocks, "id_b", "v_b", "__blk_b", "__cell_b")
    a.join(b, col("__cell_a") === col("__cell_b") && col("id_a") < col("id_b") &&
        // pin each pair to its ONE canonical cell (same-block pairs share
        // all nBlocks cells; every other cell copy is discarded here)
        col("__cell_a") === least(col("__blk_a"), col("__blk_b")) * nBlocks +
          greatest(col("__blk_a"), col("__blk_b")))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  // ---------------------------------------------------------------------------
  // Product quantization (PQ) — the MEMORY-scale ANN path (Jégou et al., "Product
  // Quantization for Nearest Neighbor Search", IEEE TPAMI 2011, public knowledge).
  // The int8 path ([[quantizedTopK]]) compresses 4x; PQ compresses dim*4 bytes
  // down to m bytes (64-dim float -> 8 bytes at m=8: 32x), which at 100 TB is
  // the difference between a code table that fits executor memory on every node
  // and one that cannot. Scoring is ADC (asymmetric distance computation): per
  // query, ONE m x ks table of subspace dot products is precomputed, and every
  // corpus row scores with m table lookups — no vector arithmetic in the scan.
  // ---------------------------------------------------------------------------

  /**
   * Deterministic per-subspace Lloyd training of PQ codebooks: the vector space
   * is split into `m` contiguous subspaces of dim/m components; each subspace
   * gets a `ks`-entry codebook seeded from the `ks` lowest-id vectors (the
   * [[trainCentroids]] convention) and refined by `iters` rounds of
   * L2-assignment + mean update. ALL m subspaces train in the SAME corpus pass
   * per round — per-partition accumulators reduce to O(m * ks * subDim) driver
   * state, no shuffle of corpus vectors, one distributed pass per iteration.
   * Empty cells keep their previous codeword (always exactly ks entries,
   * fully deterministic). Returns codebooks[m][ks][subDim].
   */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ks: Int, iters: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0,
      s"dim must split evenly into m subspaces, got dim=$dim m=$m")
    require(ks >= 1 && ks <= 256,
      s"ks must be in [1, 256] (codes are stored as one byte per subspace), got $ks")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    // null vectors are tolerated input everywhere in the PQ/IVF paths (the
    // encode and training scans filter them) — the SEED query must too, or
    // a null among the ks lowest ids NPEs codebook init with no diagnosis
    val seeds = corpus.where(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(ks)
      .select(col(vecCol).cast("array<double>")).as[Array[Double]].collect()
    require(seeds.length == ks,
      s"corpus has only ${seeds.length} non-null vectors but ks=$ks codewords were " +
        "requested per subspace — a silently smaller codebook would change every code")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m, ks) { (j, c) =>
      Array.tabulate(subDim)(i => {
        val v = seeds(c); val p = j * subDim + i
        if (p < v.length) v(p) else 0.0
      })
    }
    val vecs = corpus.select(col(vecCol).cast("array<double>")).as[Array[Double]]
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(books)
      val (sums, counts) = vecs
        .mapPartitions { rows =>
          val bs = bc.value
          val acc = Array.fill(m, ks)(new Array[Double](subDim))
          val cnt = Array.fill(m)(new Array[Long](ks))
          rows.foreach { v =>
            if (v != null && v.nonEmpty) {
              var j = 0
              while (j < m) {
                val c = nearestCode(v, j * subDim, bs(j))
                val a = acc(j)(c)
                var i = 0
                while (i < subDim) {
                  val p = j * subDim + i
                  a(i) += (if (p < v.length) v(p) else 0.0)
                  i += 1
                }
                cnt(j)(c) += 1
                j += 1
              }
            }
          }
          Iterator.single((acc, cnt))
        }
        .reduce { (x, y) =>
          val (ax, cx) = x; val (ay, cy) = y
          var j = 0
          while (j < m) {
            var c = 0
            while (c < ks) {
              var i = 0
              while (i < subDim) { ax(j)(c)(i) += ay(j)(c)(i); i += 1 }
              cx(j)(c) += cy(j)(c)
              c += 1
            }
            j += 1
          }
          (ax, cx)
        }
      books = Array.tabulate(m, ks) { (j, c) =>
        if (counts(j)(c) == 0L) books(j)(c) // empty cell: keep previous codeword
        else sums(j)(c).map(_ / counts(j)(c))
      }
    }
    books
  }

  /** L2-nearest codeword index for the subvector starting at `off` (missing
    * trailing components read as 0 — same convention as every kernel here).
    * Ties break to the LOWEST code, so encoding is fully deterministic. */
  private def nearestCode(v: Array[Double], off: Int, book: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < book.length) {
      val cw = book(c)
      var d = 0.0; var i = 0
      while (i < cw.length) {
        val x = (if (off + i < v.length) v(off + i) else 0.0) - cw(i)
        d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /**
   * A standing PQ index: trained codebooks (the driver-side O(m*ks*subDim)
   * constant — kilobytes) plus the code frame `(neighbor_id, code, recon_n2)`
   * where `code` is the m-byte PQ code and `recon_n2` the squared norm of the
   * reconstruction (precomputed once at encode time so ADC scoring never
   * touches the codebooks' norms per row). At 100 TB the code frame IS the
   * index footprint: m bytes + one double per vector, ~50x smaller than the
   * float corpus — built once, persisted like any standing asset.
   */
  final class PqIndex private[operators] (
      private[operators] val dim: Int,
      private[operators] val codebooks: Array[Array[Array[Double]]],
      val codes: DataFrame) extends Serializable {
    def m: Int = codebooks.length
    def ks: Int = if (codebooks.isEmpty) 0 else codebooks(0).length
    /** The same frozen codebooks over a DIFFERENT code frame — how a
      * maintained store re-binds after [[mergePqCodes]] splices a batch in
      * (the books never change; only the codes do). */
    def withCodes(newCodes: DataFrame): PqIndex = new PqIndex(dim, codebooks, newCodes)
  }

  /**
   * Build the PQ index: train codebooks ([[trainPqCodebooks]]) then encode the
   * corpus in ONE narrow typed pass — per vector, m L2-argmin lookups against
   * the closure-captured codebooks, emitting the m-byte code and the
   * reconstruction's squared norm. Zero shuffle; rows with NULL vectors are
   * dropped (nothing to encode).
   */
  def buildPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, ks: Int = 256, trainIters: Int = 3): PqIndex = {
    val books = trainPqCodebooks(corpus, idCol, vecCol, dim, m, ks, trainIters)
    new PqIndex(dim, books, encodeWithBooks(books, dim, corpus, idCol, vecCol))
  }

  /**
   * Encode a slice of NEW vectors against a FROZEN index's codebooks —
   * the incremental-maintenance face ([[ivfPqEncode]]'s flat-PQ sibling):
   * an arriving vector's code depends only on the books, so a standing
   * code frame absorbs batches without retraining or re-reading the
   * corpus. Same `(neighbor_id, code, recon_n2)` schema as the built
   * index; NULL vectors drop.
   */
  def pqEncode(index: PqIndex, slice: DataFrame, idCol: String, vecCol: String): DataFrame =
    encodeWithBooks(index.codebooks, index.dim, slice, idCol, vecCol)

  /**
   * Fold a corpus slice into a standing flat-PQ code frame — the
   * [[mergeIvfPqCodes]] discipline without the coarse quantizer: every id
   * present in `slice` has its row REPLACED by the frozen-books encode
   * (re-embedded docs upsert, new docs append, NULL-vector rows delete —
   * encode drops them while the anti-join still strips their standing
   * rows), so a replayed batch is idempotent and the merged frame is
   * byte-identical to a from-scratch [[pqEncode]] of the updated corpus.
   * The slice must be expressed in the index's TRAINING frame: for an
   * OPQ store, rotate it through the standing basis first — the frozen
   * books were trained on rotated coordinates, and feeding raw vectors
   * would silently mis-encode (q258 gates exactly this composition).
   * Standing side shuffles nothing (slice ids broadcast); the delta is
   * one narrow encode pass over the batch.
   */
  def mergePqCodes(index: PqIndex, standingCodes: DataFrame, slice: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val delta = pqEncode(index, slice, idCol, vecCol)
    val sliceIds = slice.select(col(idCol).cast("long").as("neighbor_id"))
      .where(col("neighbor_id").isNotNull).distinct()
    // normalize the standing side to the encode schema (store-loaded frames
    // can come back with narrower inferred types)
    standingCodes
      .select(col("neighbor_id").cast("long"), col("code"), col("recon_n2"))
      .join(broadcast(sliceIds), Seq("neighbor_id"), "left_anti")
      .unionByName(delta)
  }

  private def encodeWithBooks(books: Array[Array[Array[Double]]], dim: Int,
      slice: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = slice.sparkSession
    import spark.implicits._
    val m = books.length
    val subDim = dim / m
    // codeword squared norms, precomputed once: recon_n2 = sum_j ||cw_{j,code_j}||^2
    // (subspaces are orthogonal coordinate blocks, so reconstruction norms add)
    val cwNorm2 = Array.tabulate(m, books(0).length) { (j, c) =>
      var s = 0.0; var i = 0
      val cw = books(j)(c)
      while (i < cw.length) { s += cw(i) * cw(i); i += 1 }
      s
    }
    val bc = spark.sparkContext.broadcast((books, cwNorm2))
    slice.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val (bs, n2s) = bc.value
        rows.collect { case (id, v) if v != null =>
          val code = new Array[Byte](m)
          var recon2 = 0.0
          var j = 0
          while (j < m) {
            val c = nearestCode(v, j * subDim, bs(j))
            code(j) = c.toByte
            recon2 += n2s(j)(c)
            j += 1
          }
          (id, code, recon2)
        }
      }
      .toDF("neighbor_id", "code", "recon_n2")
  }

  /** The trained PQ codebooks as a `(sub, code, cw)` frame — the PERSISTABLE
    * half of a [[PqIndex]] next to its code frame: write both through a
    * manifest-committed index store and [[loadPqIndex]] reconstructs the
    * identical index in a later session without touching the corpus.
    * m * ks rows, array<double> exact through parquet. */
  def pqBooksFrame(spark: SparkSession, index: PqIndex): DataFrame = {
    import spark.implicits._
    spark.createDataset(for {
      j <- 0 until index.m
      c <- 0 until index.ks
    } yield (j, c, index.codebooks(j)(c))).toDF("sub", "code", "cw")
  }

  /** Parse a persisted `(sub, code, cw)` codebook frame back into the
    * `books[m][ks][subDim]` grid — the shared load kernel of
    * [[loadPqIndex]] and [[loadIvfPqIndex]]. The collect is
    * O(m * ks * subDim) — kilobytes, guarded against a mis-pointed frame. */
  private def booksFromFrame(books: DataFrame, maxEntries: Int): Array[Array[Array[Double]]] = {
    val spark = books.sparkSession
    import spark.implicits._
    val rows = books.select(col("sub").cast("int"), col("code").cast("int"),
      col("cw").cast("array<double>")).as[(Int, Int, Array[Double])].collect()
    require(rows.nonEmpty && rows.length <= maxEntries,
      s"codebooks frame carries ${rows.length} rows; expected (0, $maxEntries] — wrong frame?")
    val m = rows.iterator.map(_._1).max + 1
    val ks = rows.iterator.map(_._2).max + 1
    require(rows.length == m * ks,
      s"codebooks frame has ${rows.length} rows but spans m=$m x ks=$ks — incomplete grid")
    val booksArr = Array.ofDim[Array[Double]](m, ks)
    rows.foreach { case (j, c, cw) => booksArr(j)(c) = cw }
    // row-count == m*ks does not preclude duplicate (sub, code) rows leaving
    // holes; a null cell would NPE mid-scan on an executor, so fail loudly here
    require(booksArr.forall(_.forall(_ != null)),
      "codebooks frame carries duplicate (sub, code) rows — grid has holes")
    booksArr
  }

  /** Reconstruct a standing [[PqIndex]] from its two persisted frames;
    * `codes` is consumed lazily as written. */
  def loadPqIndex(books: DataFrame, codes: DataFrame, maxEntries: Int = 65536): PqIndex = {
    val booksArr = booksFromFrame(books, maxEntries)
    new PqIndex(booksArr.length * booksArr(0)(0).length, booksArr, codes)
  }

  /**
   * ADC top-k search over a [[PqIndex]]: for each query, an m x ks table of
   * subspace dot products `T[j][c] = <q_j, cw_{j,c}>` is computed ONCE (per
   * partition, per query — O(m * ks * subDim) setup), then every corpus code
   * scores with m table lookups: approximate cosine =
   * sum_j T[j][code_j] / (||q|| * sqrt(recon_n2)). The corpus scan touches
   * only the m-byte codes — the full vectors never load — and ranking uses the
   * same bounded-heap combiner as [[bruteForceTopK]] (shuffle <= k rows per
   * query per partition). The query collect is bounded by the small-query-side
   * contract and guarded by `maxQueries`. Zero-norm queries and zero-recon
   * codes are excluded (cosine undefined); self-matches are dropped.
   *
   * PQ ranks are approximate BY DESIGN — production recall comes from
   * over-fetching (k' > k) and exact re-ranking of the k' survivors
   * ([[rerankExact]]): the scan stays code-only and the exact math runs on
   * queries x k' rows, never the corpus.
   *
   * Returns (query_id, neighbor_id, rank), rank 1..k by (approx cos desc, id).
   */
  def pqTopK(index: PqIndex, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, maxQueries: Int = 4096): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = index.codes.sparkSession
    import spark.implicits._
    val m = index.m
    val qArr = collectQueries(queries, idCol, vecCol, maxQueries)
    // per-query ADC tables + norms, built once on the driver (O(nq * m * ks * subDim),
    // bounded by maxQueries) and broadcast — cheaper than rebuilding per partition
    val tables = adcTables(qArr, index.codebooks, index.dim / m)
    val bc = spark.sparkContext.broadcast(tables)
    val scored = index.codes
      .select(col("neighbor_id"), col("code"), col("recon_n2"))
      .as[(Long, Array[Byte], Double)]
      .mapPartitions { rows =>
        val qs = bc.value
        rows.flatMap { case (nid, code, recon2) =>
          if (recon2 <= 0.0) Iterator.empty
          else {
            val rnorm = math.sqrt(recon2)
            qs.iterator.collect { case (qid, t, qnorm) if qid != nid =>
              var s = 0.0; var j = 0
              while (j < m) { s += t(j)(code(j) & 0xff); j += 1 }
              (qid, (s / (qnorm * rnorm), nid))
            }
          }
        }
      }
    rankTopK(scored, k)
  }

  /** The COMPOSED IVF-PQ standing frame `(neighbor_id, cent_id, code,
    * recon_n2)` — the classic inverted-file-with-PQ-codes layout (each
    * inverted list stores its members' m-byte codes): one equi-join of the
    * two standing assets, which a deployment materializes ONCE partitioned
    * by `cent_id` so a probe reads only its cells' directories. Full
    * vectors appear nowhere. */
  def ivfPqCodes(ivf: IvfIndex, pq: PqIndex): DataFrame =
    ivf.assigned.select(col("neighbor_id"), col("cent_id"))
      .join(pq.codes, "neighbor_id")

  /**
   * IVF-PQ top-k — the two-level production ANN shape (FAISS's IVFADC,
   * Jégou et al. 2011 §V): the coarse quantizer prunes the corpus to
   * `nProbe` inverted lists per query, and the surviving rows score by PQ
   * code ADC lookups — so the recurring per-batch cost is
   * ~(nProbe/nCentroids) of the corpus in CODE bytes, with full vectors
   * touched nowhere (callers re-rank the top k' exactly via
   * [[rerankExact]], which joins vectors for queries x k' rows only).
   * Probe selection is driver-local (the quantizer is already a driver
   * array; same cosine + cent_id tie-break as [[ivfProbe]]); each corpus
   * row in a probed cell scores ONLY for the queries probing that cell,
   * via a broadcast cell -> query-index map. Pass `codesWithCells` when
   * the composed [[ivfPqCodes]] frame is persisted (the standing layout);
   * otherwise it is derived on the fly.
   *
   * Returns (query_id, neighbor_id, rank), rank 1..k by (approx cos desc,
   * id). `nProbe >= nCentroids` makes the candidate set identical to
   * [[pqTopK]]'s full scan.
   */
  def ivfPqTopK(ivf: IvfIndex, pq: PqIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4,
      codesWithCells: Option[DataFrame] = None, maxQueries: Int = 4096): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    val spark = pq.codes.sparkSession
    import spark.implicits._
    val m = pq.m
    val qArr = collectQueries(queries, idCol, vecCol, maxQueries)
    // per-query ADC tables + norms (the pqTopK structure) ...
    val tables = adcTables(qArr, pq.codebooks, pq.dim / m)
    // ... plus the probe set: nProbe nearest centroids by (cos desc, cent_id
    // asc) per SURVIVING query (adcTables drops zero-norm queries, so the
    // table and probe arrays stay index-aligned)
    val byId = qArr.toMap
    val cellToQ: Map[Long, Array[Int]] = tables.zipWithIndex
      .flatMap { case ((qid, _, _), qi) =>
        val qv = byId(qid)
        ivf.centroids.map { case (cid, cv) => (cid, cosLocal(qv, cv)) }
          .sortBy { case (cid, c) => (-c, cid) }
          .take(nProbe).map(_._1 -> qi)
      }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2) }
    val bc = spark.sparkContext.broadcast((tables, cellToQ))
    val frame = codesWithCells.getOrElse(ivfPqCodes(ivf, pq))
    val scored = frame
      .select(col("neighbor_id"), col("cent_id"), col("code"), col("recon_n2"))
      .as[(Long, Long, Array[Byte], Double)]
      .mapPartitions { rows =>
        val (qs, cells) = bc.value
        rows.flatMap { case (nid, centId, code, recon2) =>
          val qIdxs = cells.getOrElse(centId, null)
          if (qIdxs == null || recon2 <= 0.0) Iterator.empty
          else {
            val rnorm = math.sqrt(recon2)
            qIdxs.iterator.map(qs).collect { case (qid, t, qnorm) if qid != nid =>
              var s = 0.0; var j = 0
              while (j < m) { s += t(j)(code(j) & 0xff); j += 1 }
              (qid, (s / (qnorm * rnorm), nid))
            }
          }
        }
      }
    rankTopK(scored, k)
  }

  // ---------------------------------------------------------------------------
  // Residual-encoded IVF-PQ — TRUE IVFADC (Jégou et al. 2011 §V / FAISS
  // IVFADC): the PQ codebooks are trained on the residuals r = x - centroid(x)
  // rather than on raw vectors. Residuals concentrate around the origin with
  // far smaller per-subspace variance than the raw corpus, so the same m bytes
  // of code carry more precision — the property that holds recall at higher
  // dimension and more centroids, where raw-vector codes decay first. Scoring
  // folds the centroid term in exactly: x̂ = centroid + r̂, so
  //   <q, x̂> = <q, centroid> + Σ_j T[j][code_j]
  // with <q, centroid> precomputed per (query, probed cell) on the driver
  // (nq x nProbe dot products — trivial) and the ADC table built over the
  // RESIDUAL codebooks. ||x̂||² is precomputed at encode time (centroid, cross
  // and residual terms together), so the scan still touches only m code bytes
  // and one double per row.
  // ---------------------------------------------------------------------------

  /**
   * A standing residual-encoded IVF-PQ index: the coarse quantizer, the
   * residual codebooks (driver-side kilobytes), and the composed code frame
   * `(neighbor_id, cent_id, code, recon_n2)` where `code` is the m-byte PQ
   * code of the RESIDUAL and `recon_n2 = ||centroid + r̂||²` — the full
   * reconstruction's squared norm. This is the one-frame inverted-file
   * layout a deployment materializes partitioned by `cent_id`; full vectors
   * appear nowhere.
   */
  final class IvfPqIndex private[operators] (
      private[operators] val dim: Int,
      private[operators] val centroids: Array[(Long, Array[Double])],
      private[operators] val codebooks: Array[Array[Array[Double]]],
      val codes: DataFrame) extends Serializable {
    def m: Int = codebooks.length
    def ks: Int = if (codebooks.isEmpty) 0 else codebooks(0).length
  }

  /** Full (non-normalized) dot product over double arrays, shorter-prefix
    * convention — the centroid term of the IVFADC score. */
  private def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The coarse-quantizer argmax shared by [[buildIvfIndex]] and
    * [[ivfPqEncode]]: nearest centroid by (cosine desc, cent_id asc) —
    * fully deterministic, so a slice encoded later lands in exactly the
    * cell the original build would have chosen. */
  /** The nProbe-nearest generalization of [[nearestCentroid]] (same
    * (cosine desc, cent_id asc) determinism), used by [[knnGraph]]'s
    * routing pass. O(nCentroids log nCentroids) per vector — the quantizer
    * is centroid-count-bounded by contract. */
  private def nearestCentroids(centArr: Array[(Long, Array[Double])],
      v: Array[Double], n: Int): Array[Long] =
    centArr.map { case (cid, cv) => (cosLocal(v, cv), cid) }
      .sortBy { case (cs, cid) => (-cs, cid) }
      .take(n).map(_._2)

  private def nearestCentroid(centArr: Array[(Long, Array[Double])], v: Array[Double]): Long = {
    var best = Long.MaxValue
    var bestCos = Double.NegativeInfinity
    var ci = 0
    while (ci < centArr.length) {
      val (cid, cv) = centArr(ci)
      val cs = cosLocal(v, cv)
      if (cs > bestCos || (cs == bestCos && cid < best)) { bestCos = cs; best = cid }
      ci += 1
    }
    best
  }

  /** Residual-encode one vector against its cell: PQ code of `v - cent` plus
    * the FULL reconstruction's squared norm `||cent + r̂||²` (centroid,
    * cross and residual terms computed together component-wise — exact, not
    * a sum of per-block norms). Missing trailing components read as 0. */
  private def residualEncodeRow(cent: Array[Double], v: Array[Double],
      books: Array[Array[Array[Double]]], subDim: Int): (Array[Byte], Double) = {
    val m = books.length
    val dim = m * subDim
    val r = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      r(i) = (if (i < v.length) v(i) else 0.0) - (if (i < cent.length) cent(i) else 0.0)
      i += 1
    }
    val code = new Array[Byte](m)
    var recon2 = 0.0
    var j = 0
    while (j < m) {
      val c = nearestCode(r, j * subDim, books(j))
      code(j) = c.toByte
      val cw = books(j)(c)
      var t = 0
      while (t < subDim) {
        val p = j * subDim + t
        val x = (if (p < cent.length) cent(p) else 0.0) + cw(t)
        recon2 += x * x
        t += 1
      }
      j += 1
    }
    (code, recon2)
  }

  /**
   * Build the residual IVF-PQ index over a standing [[IvfIndex]]: one narrow
   * pass over `ivf.assigned` derives the residual frame (the assignment
   * already carries each vector's cell — no re-argmax), [[trainPqCodebooks]]
   * trains the codebooks ON THE RESIDUALS (same deterministic per-subspace
   * Lloyd kernel, one distributed pass per iteration), and a second narrow
   * pass encodes every row. Zero shuffle throughout; NULL vectors were
   * already dropped by the IVF assignment.
   */
  def buildIvfPqIndex(ivf: IvfIndex, dim: Int, m: Int = 8, ks: Int = 256,
      trainIters: Int = 3): IvfPqIndex = {
    require(m >= 1 && dim % m == 0,
      s"dim must split evenly into m subspaces, got dim=$dim m=$m")
    val spark = ivf.assigned.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val centArr = ivf.centroids
    val bcCent = spark.sparkContext.broadcast(centArr.toMap)
    val assigned = ivf.assigned
      .select(col("neighbor_id").cast("long"), col("cent_id").cast("long"),
        col("cv").cast("array<double>"))
      .as[(Long, Long, Array[Double])]
    val residuals = assigned
      .mapPartitions { rows =>
        val cm = bcCent.value
        rows.collect { case (id, cid, v) if v != null =>
          val cent = cm(cid)
          val r = new Array[Double](dim)
          var i = 0
          while (i < dim) {
            r(i) = (if (i < v.length) v(i) else 0.0) - (if (i < cent.length) cent(i) else 0.0)
            i += 1
          }
          (id, r)
        }
      }
      .toDF("neighbor_id", "residual")
    val books = trainPqCodebooks(residuals, "neighbor_id", "residual", dim, m, ks, trainIters)
    val bcBooks = spark.sparkContext.broadcast(books)
    val codes = assigned
      .mapPartitions { rows =>
        val cm = bcCent.value
        val bs = bcBooks.value
        rows.collect { case (id, cid, v) if v != null =>
          val (code, recon2) = residualEncodeRow(cm(cid), v, bs, subDim)
          (id, cid, code, recon2)
        }
      }
      .toDF("neighbor_id", "cent_id", "code", "recon_n2")
    new IvfPqIndex(dim, centArr, books, codes)
  }

  /**
   * Encode a NEW corpus slice against a FROZEN [[IvfPqIndex]] — the
   * incremental-maintenance kernel: assign each vector to its cell with the
   * index's own deterministic quantizer argmax, residual-encode against the
   * index's own codebooks, and return rows in the standing code-frame schema
   * `(neighbor_id, cent_id, code, recon_n2)`. Because both steps are frozen
   * and deterministic, upserting this slice into the standing code frame is
   * EXACTLY the frame a from-scratch re-encode of the updated corpus would
   * produce — the merged ≡ rebuilt invariant the incremental path is gated
   * on. One narrow pass, zero shuffle; NULL vectors are dropped.
   */
  def ivfPqEncode(index: IvfPqIndex, slice: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = slice.sparkSession
    import spark.implicits._
    val subDim = index.dim / index.m
    val bc = spark.sparkContext.broadcast((index.centroids, index.codebooks))
    slice.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val (centArr, books) = bc.value
        val cm = centArr.toMap
        rows.collect { case (id, v) if v != null =>
          val cid = nearestCentroid(centArr, v)
          val (code, recon2) = residualEncodeRow(cm(cid), v, books, subDim)
          (id, cid, code, recon2)
        }
      }
      .toDF("neighbor_id", "cent_id", "code", "recon_n2")
  }

  /**
   * Fold a corpus slice into a standing IVFADC code frame — the incremental
   * maintenance step that was the missing member of the mergeable-state
   * family (postings/bloom/HLL/minhash/count-min/CC all merge; the ANN
   * stores used to full-rebuild on any corpus change): every id present in
   * `slice` has its row REPLACED by the frozen-index encode (re-embedded
   * docs upsert, new docs append) — the [[graft.operators.Retrieval.mergePostings]]
   * last-writer-wins-by-key discipline, so a replayed batch is idempotent.
   * Removed docs are the anti-join: pass them inside `slice` with NULL
   * vectors (encode drops them, the anti-join still strips their standing
   * rows). Because [[ivfPqEncode]] is frozen and deterministic, the merged
   * frame is BYTE-identical to a from-scratch re-encode of the updated
   * corpus — the merged ≡ rebuilt invariant q181 gates in-query. The
   * standing side shuffles nothing (slice ids broadcast); the delta is one
   * narrow encode pass over the batch.
   */
  def mergeIvfPqCodes(index: IvfPqIndex, standingCodes: DataFrame, slice: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val delta = ivfPqEncode(index, slice, idCol, vecCol)
    val sliceIds = slice.select(col(idCol).cast("long").as("neighbor_id"))
      .where(col("neighbor_id").isNotNull).distinct()
    // normalize the standing side to the encode schema: a store-loaded frame
    // partitioned by cent_id can come back with a narrower inferred type
    standingCodes
      .select(col("neighbor_id").cast("long"), col("cent_id").cast("long"),
        col("code"), col("recon_n2"))
      .join(broadcast(sliceIds), Seq("neighbor_id"), "left_anti")
      .unionByName(delta)
  }

  /** The residual codebooks as a persistable `(sub, code, cw)` frame — the
    * [[pqBooksFrame]] shape for the IVFADC index. */
  def ivfPqBooksFrame(spark: SparkSession, index: IvfPqIndex): DataFrame = {
    import spark.implicits._
    spark.createDataset(for {
      j <- 0 until index.m
      c <- 0 until index.ks
    } yield (j, c, index.codebooks(j)(c))).toDF("sub", "code", "cw")
  }

  /** The coarse quantizer as a persistable `(cent_id, cent_v)` frame — the
    * [[centroidsFrame]] shape for the IVFADC index. */
  def ivfPqCentroidsFrame(spark: SparkSession, index: IvfPqIndex): DataFrame = {
    import spark.implicits._
    spark.createDataset(index.centroids.toSeq).toDF("cent_id", "cent_v")
  }

  /** Reconstruct a standing [[IvfPqIndex]] from its three persisted frames
    * (quantizer, residual codebooks, composed code frame); both driver-side
    * collects are bounded and guarded, `codes` is consumed lazily. */
  def loadIvfPqIndex(centroids: DataFrame, books: DataFrame, codes: DataFrame,
      maxCentroids: Int = 65536, maxEntries: Int = 65536): IvfPqIndex = {
    val spark = centroids.sparkSession
    import spark.implicits._
    val n = centroids.count()
    require(n > 0 && n <= maxCentroids,
      s"centroids frame carries $n rows; expected (0, $maxCentroids] — wrong frame?")
    val centArr = centroids
      .select(col("cent_id").cast("long"), col("cent_v").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val booksArr = booksFromFrame(books, maxEntries)
    new IvfPqIndex(booksArr.length * booksArr(0)(0).length, centArr, booksArr, codes)
  }

  /**
   * IVFADC top-k search over a residual [[IvfPqIndex]]: probe selection and
   * the centroid dot products run on the driver (the quantizer is already a
   * driver array), the ADC tables are built over the RESIDUAL codebooks, and
   * each corpus row in a probed cell scores as
   * `(<q, cent> + Σ_j T[j][code_j]) / (||q|| · sqrt(recon_n2))` — m table
   * lookups plus one add, exactly the [[ivfPqTopK]] scan cost, with the
   * recall of residual codes. Returns (query_id, neighbor_id, rank), rank
   * 1..k by (approx cos desc, id); `nProbe >= nCentroids` degrades to a full
   * residual-PQ scan. Callers over-fetch and re-rank via [[rerankExact]].
   */
  def ivfadcTopK(index: IvfPqIndex, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4, maxQueries: Int = 4096): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    val spark = index.codes.sparkSession
    import spark.implicits._
    val m = index.m
    val qArr = collectQueries(queries, idCol, vecCol, maxQueries)
    val tables = adcTables(qArr, index.codebooks, index.dim / m)
    val byId = qArr.toMap
    // probe set per SURVIVING query (adcTables drops zero-norm queries), each
    // probed cell carrying this query's <q, centroid> term
    val cellToQ: Map[Long, Array[(Int, Double)]] = tables.zipWithIndex
      .flatMap { case ((qid, _, _), qi) =>
        val qv = byId(qid)
        index.centroids.map { case (cid, cv) => (cid, cosLocal(qv, cv), dotLocal(qv, cv)) }
          .sortBy { case (cid, c, _) => (-c, cid) }
          .take(nProbe).map { case (cid, _, d) => cid -> ((qi, d)) }
      }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).toArray }
    val bc = spark.sparkContext.broadcast((tables, cellToQ))
    val scored = index.codes
      .select(col("neighbor_id"), col("cent_id"), col("code"), col("recon_n2"))
      .as[(Long, Long, Array[Byte], Double)]
      .mapPartitions { rows =>
        val (qs, cells) = bc.value
        rows.flatMap { case (nid, centId, code, recon2) =>
          val probes = cells.getOrElse(centId, null)
          if (probes == null || recon2 <= 0.0) Iterator.empty
          else {
            val rnorm = math.sqrt(recon2)
            probes.iterator.flatMap { case (qi, qdc) =>
              val (qid, t, qnorm) = qs(qi)
              if (qid == nid) Iterator.empty
              else {
                var s = qdc; var j = 0
                while (j < m) { s += t(j)(code(j) & 0xff); j += 1 }
                Iterator.single((qid, (s / (qnorm * rnorm), nid)))
              }
            }
          }
        }
      }
    rankTopK(scored, k)
  }

  /**
   * A standing residual IVF-PQ index over the TWO-LEVEL quantizer — the
   * [[IvfPqIndex]] layout at PRODUCTION cell counts: the driver/task
   * state is the (k1 + k2)·dim level arrays plus the kilobyte residual
   * codebooks, never a per-cell centroid grid, so the IVFADC contract
   * (m code bytes + one double per scanned row, centroid term folded in
   * exactly) survives 10⁵⁺ cells. Cell centroids compose on demand
   * (`super + sub`, memoized per task).
   */
  final class IvfPq2Index private[operators] (
      private[operators] val dim: Int,
      val quantizer: TwoLevelQuantizer,
      private[operators] val codebooks: Array[Array[Array[Double]]],
      val codes: DataFrame) extends Serializable {
    def m: Int = codebooks.length
    def ks: Int = if (codebooks.isEmpty) 0 else codebooks(0).length
  }

  /** Per-task memoized cell-centroid lookup — cells touched per task are
    * bounded (a partition holds a slice of the corpus), so the map stays
    * small while saving one array composition per ROW. */
  private def cellCentCache(q: TwoLevelQuantizer): Long => Array[Double] = {
    val cache = scala.collection.mutable.HashMap.empty[Long, Array[Double]]
    cid => cache.getOrElseUpdate(cid, q.cellCentroid(cid))
  }

  /**
   * Residual IVF-PQ over a standing [[IvfIndex2]] — [[buildIvfPqIndex]]
   * with hierarchical cells: one narrow pass derives residuals against
   * the COMPOSED cell centroids (the assignment already carries each
   * vector's cell), codebooks train on the residuals, a second narrow
   * pass encodes. Zero shuffle throughout.
   */
  def buildIvfPqIndex2(ivf: IvfIndex2, dim: Int, m: Int = 8, ks: Int = 256,
      trainIters: Int = 3): IvfPq2Index = {
    require(m >= 1 && dim % m == 0,
      s"dim must split evenly into m subspaces, got dim=$dim m=$m")
    val spark = ivf.assigned.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val q = ivf.quantizer
    val assigned = ivf.assigned
      .select(col("neighbor_id").cast("long"), col("cent_id").cast("long"),
        col("cv").cast("array<double>"))
      .as[(Long, Long, Array[Double])]
    val residuals = assigned
      .mapPartitions { rows =>
        val cents = cellCentCache(q)
        rows.collect { case (id, cid, v) if v != null =>
          val cent = cents(cid)
          val r = new Array[Double](dim)
          var i = 0
          while (i < dim) {
            r(i) = (if (i < v.length) v(i) else 0.0) - (if (i < cent.length) cent(i) else 0.0)
            i += 1
          }
          (id, r)
        }
      }
      .toDF("neighbor_id", "residual")
    val books = trainPqCodebooks(residuals, "neighbor_id", "residual", dim, m, ks, trainIters)
    val bcBooks = spark.sparkContext.broadcast(books)
    val codes = assigned
      .mapPartitions { rows =>
        val cents = cellCentCache(q)
        val bs = bcBooks.value
        rows.collect { case (id, cid, v) if v != null =>
          val (code, recon2) = residualEncodeRow(cents(cid), v, bs, subDim)
          (id, cid, code, recon2)
        }
      }
      .toDF("neighbor_id", "cent_id", "code", "recon_n2")
    new IvfPq2Index(dim, q, books, codes)
  }

  /** [[ivfPqEncode]] for the hierarchical index: route with the frozen
    * [[TwoLevelQuantizer]] (sublinear), residual-encode against the
    * composed cell centroid. Frozen + deterministic, so the merged ≡
    * rebuilt invariant holds unchanged. */
  def ivfPq2Encode(index: IvfPq2Index, slice: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = slice.sparkSession
    import spark.implicits._
    val subDim = index.dim / index.m
    val q = index.quantizer
    val bcBooks = spark.sparkContext.broadcast(index.codebooks)
    slice.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cents = cellCentCache(q)
        val bs = bcBooks.value
        rows.collect { case (id, v) if v != null =>
          val cid = q.route(v)
          val (code, recon2) = residualEncodeRow(cents(cid), v, bs, subDim)
          (id, cid, code, recon2)
        }
      }
      .toDF("neighbor_id", "cent_id", "code", "recon_n2")
  }

  /** [[mergeIvfPqCodes]] for the hierarchical index — same last-writer-
    * wins-by-key fold, delta encoded by [[ivfPq2Encode]]. */
  def mergeIvfPq2Codes(index: IvfPq2Index, standingCodes: DataFrame, slice: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val delta = ivfPq2Encode(index, slice, idCol, vecCol)
    val sliceIds = slice.select(col(idCol).cast("long").as("neighbor_id"))
      .where(col("neighbor_id").isNotNull).distinct()
    standingCodes
      .select(col("neighbor_id").cast("long"), col("cent_id").cast("long"),
        col("code"), col("recon_n2"))
      .join(broadcast(sliceIds), Seq("neighbor_id"), "left_anti")
      .unionByName(delta)
  }

  /** Reconstruct a standing [[IvfPq2Index]] from its persisted frames:
    * the [[quantizer2Frame]] metadata-bearing quantizer, the
    * [[ivfPqBooksFrame]]-shaped residual codebooks, and the code frame. */
  def loadIvfPq2Index(quantizer: DataFrame, books: DataFrame, codes: DataFrame,
      maxPerLevel: Int = 65536, maxEntries: Int = 65536): IvfPq2Index = {
    val q = loadIvfIndex2(quantizer, codes, maxPerLevel = maxPerLevel).quantizer
    val booksArr = booksFromFrame(books, maxEntries)
    new IvfPq2Index(booksArr.length * booksArr(0)(0).length, q, booksArr, codes)
  }

  /** The residual codebooks of an [[IvfPq2Index]] as the persistable
    * `(sub, code, cw)` frame. */
  def ivfPq2BooksFrame(spark: SparkSession, index: IvfPq2Index): DataFrame = {
    import spark.implicits._
    spark.createDataset(for {
      j <- 0 until index.m
      c <- 0 until index.ks
    } yield (j, c, index.codebooks(j)(c))).toDF("sub", "code", "cw")
  }

  /**
   * IVFADC top-k over a hierarchical residual index — [[ivfadcTopK]] with
   * routing through the [[TwoLevelQuantizer]]: each query's probe set is
   * its `nProbe` nearest cells BY THE INDEX'S OWN ROUTING RULE (so probes
   * align with how the corpus was assigned), and the per-cell centroid
   * dot `<q, super + sub>` decomposes as `<q, super> + <q, sub>` — two
   * dot-product sweeps per query, never a per-cell scan. Scan cost per
   * probed row is unchanged: m table lookups + one add.
   */
  def ivfadc2TopK(index: IvfPq2Index, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4, maxQueries: Int = 4096): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    val spark = index.codes.sparkSession
    import spark.implicits._
    val m = index.m
    val qArr = collectQueries(queries, idCol, vecCol, maxQueries)
    val tables = adcTables(qArr, index.codebooks, index.dim / m)
    val byId = qArr.toMap
    val quant = index.quantizer
    val k2 = quant.k2
    val cellToQ: Map[Long, Array[(Int, Double)]] = tables.zipWithIndex
      .flatMap { case ((qid, _, _), qi) =>
        val qv = byId(qid)
        // <q, super + sub> decomposed: one dot sweep per LEVEL
        val qs = quant.supers.map(s => dotLocal(qv, s))
        val qr = quant.subs.map(r => dotLocal(qv, r))
        quant.routeN(qv, nProbe).map { cid =>
          cid -> ((qi, qs((cid / k2).toInt) + qr((cid % k2).toInt)))
        }
      }
      .groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2).toArray }
    val bc = spark.sparkContext.broadcast((tables, cellToQ))
    val scored = index.codes
      .select(col("neighbor_id"), col("cent_id"), col("code"), col("recon_n2"))
      .as[(Long, Long, Array[Byte], Double)]
      .mapPartitions { rows =>
        val (qs, cells) = bc.value
        rows.flatMap { case (nid, centId, code, recon2) =>
          val probes = cells.getOrElse(centId, null)
          if (probes == null || recon2 <= 0.0) Iterator.empty
          else {
            val rnorm = math.sqrt(recon2)
            probes.iterator.flatMap { case (qi, qdc) =>
              val (qid, t, qnorm) = qs(qi)
              if (qid == nid) Iterator.empty
              else {
                var s = qdc; var j = 0
                while (j < m) { s += t(j)(code(j) & 0xff); j += 1 }
                Iterator.single((qid, (s / (qnorm * rnorm), nid)))
              }
            }
          }
        }
      }
    rankTopK(scored, k)
  }

  /**
   * Exact re-rank of ANN candidates — the second half of every production PQ /
   * IVF deployment: candidates `(query_id, neighbor_id)` (k' per query,
   * bounded) join their FULL vectors back, score exact cosine, and reduce to
   * top-k with the bounded combiner. The exact math runs over queries x k'
   * rows only; the corpus joins by id (broadcast candidate side), so no scan
   * reloads every vector. Returns (query_id, neighbor_id, rank) like
   * [[bruteForceTopK]] — with enough over-fetch the two converge.
   */
  def rerankExact(candidates: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    val cand = candidates
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long")).distinct()
    val scored = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(q), "query_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), struct(cosine(col("qv"), col("cv")).as("cos"),
        col("neighbor_id").as("nid")).as("scored"))
      .as[(Long, (Double, Long))]
    rankTopK(scored, k)
  }
}
