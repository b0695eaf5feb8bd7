package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Pins the approximation quality and the determinism of the product-quantized
 * ANN path (`buildPqIndex` / `pqTopK` / `rerankExact`). Ground truth is
 * `bruteForceTopK`, itself bit-exact against the DuckDB oracle (q25).
 * Measured on the natural sf0.01 corpus (5000 vectors, dim 64, 16 queries,
 * k=10, m=16 x ks=256, 3 train rounds): ADC-only recall@10 = 0.79, and
 * over-fetch k'=50 + exact re-rank = 1.00 (asserted below with margin)
 * — so a regression in codebook training, encoding, table scoring, or
 * re-ranking fails this spec, not just a comment's claim.
 */
class PqRecallSpec extends AnyFunSpec with SparkSuite {

  private val K = 10
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 16)

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactTopK: Set[(Long, Long)] =
    pairSet(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", K))

  private lazy val index = Similarity.buildPqIndex(emb, "vec_id", "embedding",
    dim = 64, m = 16, ks = 256, trainIters = 3)

  describe("pqTopK ADC recall@10 vs exact brute force (sf0.01)") {
    lazy val adc = pairSet(Similarity.pqTopK(index, queries, "vec_id", "embedding", K))
    lazy val rAdc = adc.intersect(exactTopK).size.toDouble / exactTopK.size

    it("ADC-only recall is usable (>= 0.6) at 10x+ compression") {
      info(s"ADC recall@$K = $rAdc")
      assert(rAdc >= 0.6, s"ADC recall@$K was $rAdc")
    }

    it("over-fetch k'=50 + exact re-rank recovers recall >= 0.9") {
      val cands = Similarity.pqTopK(index, queries, "vec_id", "embedding", 50)
      val rr = pairSet(Similarity.rerankExact(cands, queries, emb, "vec_id", "embedding", K))
      val rRr = rr.intersect(exactTopK).size.toDouble / exactTopK.size
      info(s"re-ranked recall@$K = $rRr")
      assert(rRr >= 0.9, s"re-ranked recall@$K was $rRr")
    }

    it("re-rank over ALL pairs reproduces brute force exactly") {
      import spark.implicits._
      val ids = emb.select(col("vec_id").cast("long")).as[Long].collect()
      val qids = queries.select(col("vec_id").cast("long")).as[Long].collect()
      val all = spark.createDataset(
        for { q <- qids.toSeq; n <- ids.toSeq if q != n } yield (q, n)
      ).toDF("query_id", "neighbor_id")
      assert(pairSet(Similarity.rerankExact(all, queries, emb, "vec_id", "embedding", K))
        === exactTopK)
    }
  }

  describe("ivfPqTopK (cell-pruned ADC) recall and parity (sf0.01)") {
    lazy val ivf = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, trainIters = 1)

    it("full probing reproduces pqTopK's full-scan ranking exactly") {
      val full = Similarity.ivfPqTopK(ivf, index, queries, "vec_id", "embedding",
        10, nProbe = 16)
      val flat = Similarity.pqTopK(index, queries, "vec_id", "embedding", 10)
      assert(pairSet(full) === pairSet(flat))
    }

    it("partial probing (nProbe=8) + over-fetch + exact re-rank keeps recall >= 0.85") {
      val cands = Similarity.ivfPqTopK(ivf, index, queries, "vec_id", "embedding",
        50, nProbe = 8)
      val rr = pairSet(Similarity.rerankExact(cands, queries, emb, "vec_id", "embedding", K))
      val r = rr.intersect(exactTopK).size.toDouble / exactTopK.size
      info(s"ivf-pq re-ranked recall@$K at nProbe=8 = $r")
      assert(r >= 0.85, s"recall@$K was $r")
    }

    it("recall does not decrease as nProbe grows") {
      def recallAt(p: Int): Double = {
        val cands = Similarity.ivfPqTopK(ivf, index, queries, "vec_id", "embedding",
          50, nProbe = p)
        val rr = pairSet(Similarity.rerankExact(cands, queries, emb, "vec_id", "embedding", K))
        rr.intersect(exactTopK).size.toDouble / exactTopK.size
      }
      val (r2, r8, r16) = (recallAt(2), recallAt(8), recallAt(16))
      info(s"recall@$K at nProbe 2/8/16 = $r2 / $r8 / $r16")
      assert(r2 <= r8 && r8 <= r16, s"recall not monotone: $r2, $r8, $r16")
    }
  }

  describe("PQ index mechanics") {
    it("codes are m bytes, recon_n2 positive, and one row per corpus vector") {
      import spark.implicits._
      val n = emb.count()
      assert(index.codes.count() === n)
      val (codeLen, minRecon) = index.codes
        .select(length(col("code")).cast("long"), col("recon_n2"))
        .as[(Long, Double)].collect()
        .foldLeft((Set.empty[Long], Double.PositiveInfinity)) {
          case ((ls, mn), (l, r)) => (ls + l, math.min(mn, r))
        }
      assert(codeLen === Set(16L), s"code lengths seen: $codeLen")
      assert(minRecon > 0.0, s"min recon_n2 = $minRecon")
    }

    it("encoding is deterministic: a rebuild yields byte-identical codes") {
      import spark.implicits._
      def fp(ix: Similarity.PqIndex): Array[(Long, Seq[Byte], Double)] = ix.codes
        .select(col("neighbor_id"), col("code"), col("recon_n2"))
        .as[(Long, Array[Byte], Double)].collect()
        .map { case (id, c, r) => (id, c.toSeq, r) }.sortBy(_._1)
      val again = Similarity.buildPqIndex(emb, "vec_id", "embedding",
        dim = 64, m = 16, ks = 256, trainIters = 3)
      assert(fp(index).sameElements(fp(again)))
    }

    it("rejects geometries that cannot hold the contract") {
      assertThrows[IllegalArgumentException] {
        Similarity.trainPqCodebooks(emb, "vec_id", "embedding", 64, 7, 16, 1)
      }
      assertThrows[IllegalArgumentException] {
        Similarity.trainPqCodebooks(emb, "vec_id", "embedding", 64, 8, 257, 1)
      }
    }
  }

  describe("residual IVFADC (ivfadcTopK) vs raw-code IVF-PQ at equal bytes (sf0.01)") {
    lazy val ivf = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, trainIters = 1)
    // equal bytes by construction: same m x ks geometry, same per-row layout
    // (m code bytes + one recon_n2 double) — only the codebook target differs
    lazy val residual = Similarity.buildIvfPqIndex(ivf, dim = 64, m = 16, ks = 256,
      trainIters = 3)

    it("residual codes recall >= raw codes recall at equal bytes (ADC-only, full probing)") {
      val raw = pairSet(Similarity.ivfPqTopK(ivf, index, queries, "vec_id", "embedding",
        K, nProbe = 16))
      val res = pairSet(Similarity.ivfadcTopK(residual, queries, "vec_id", "embedding",
        K, nProbe = 16))
      val rRaw = raw.intersect(exactTopK).size.toDouble / exactTopK.size
      val rRes = res.intersect(exactTopK).size.toDouble / exactTopK.size
      info(s"ADC-only recall@$K: raw = $rRaw, residual = $rRes")
      assert(rRes >= rRaw, s"residual recall $rRes < raw recall $rRaw at equal bytes")
    }

    it("partial probing (nProbe=8) + over-fetch + exact re-rank keeps recall >= 0.85") {
      val cands = Similarity.ivfadcTopK(residual, queries, "vec_id", "embedding",
        50, nProbe = 8)
      val rr = pairSet(Similarity.rerankExact(cands, queries, emb, "vec_id", "embedding", K))
      val r = rr.intersect(exactTopK).size.toDouble / exactTopK.size
      info(s"ivfadc re-ranked recall@$K at nProbe=8 = $r")
      assert(r >= 0.85, s"recall@$K was $r")
    }

    it("ivfPqEncode over the full corpus reproduces the standing code frame exactly") {
      import spark.implicits._
      def fp(codes: DataFrame): Array[(Long, Long, Seq[Byte], Double)] = codes
        .select(col("neighbor_id"), col("cent_id"), col("code"), col("recon_n2"))
        .as[(Long, Long, Array[Byte], Double)].collect()
        .map { case (id, cid, c, r) => (id, cid, c.toSeq, r) }.sortBy(_._1)
      val re = Similarity.ivfPqEncode(residual, emb, "vec_id", "embedding")
      assert(fp(re).sameElements(fp(residual.codes)),
        "frozen-index slice encode diverged from the build-time code frame")
    }

    it("mergeIvfPqCodes: merged batch == from-scratch re-encode, idempotent, null-vector deletes") {
      import spark.implicits._
      def fp(codes: DataFrame): Set[(Long, Long, Seq[Byte], Double)] = codes
        .select(col("neighbor_id").cast("long"), col("cent_id").cast("long"),
          col("code"), col("recon_n2"))
        .as[(Long, Long, Array[Byte], Double)].collect()
        .map { case (id, cid, c, r) => (id, cid, c.toSeq, r) }.toSet
      // batch: re-embed vectors 0-9 (reversed), add 10 fresh, delete vec 10
      val batch = emb.filter(col("vec_id") < 10)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
        .unionByName(emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            reverse(col("embedding")).as("embedding")))
        .unionByName(emb.filter(col("vec_id") === 10)
          .select(col("vec_id"), lit(null).cast("array<float>").as("embedding")))
      val merged = Similarity.mergeIvfPqCodes(residual, residual.codes, batch,
        "vec_id", "embedding")
      val news = emb.filter(col("vec_id") > 10)
        .select(col("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") < 10)
          .select(col("vec_id"), reverse(col("embedding")).as("embedding")))
        .unionByName(emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            reverse(col("embedding")).as("embedding")))
      val scratch = Similarity.ivfPqEncode(residual, news, "vec_id", "embedding")
      assert(fp(merged) === fp(scratch), "merged batch diverged from from-scratch re-encode")
      // replaying the same batch is a no-op (last-writer-wins idempotence)
      val again = Similarity.mergeIvfPqCodes(residual, merged, batch, "vec_id", "embedding")
      assert(fp(again) === fp(merged), "batch replay was not idempotent")
    }

    it("store round trip: the reloaded index searches identically") {
      val cents = Similarity.ivfPqCentroidsFrame(spark, residual)
      val books = Similarity.ivfPqBooksFrame(spark, residual)
      val loaded = Similarity.loadIvfPqIndex(cents, books, residual.codes)
      val a = pairSet(Similarity.ivfadcTopK(residual, queries, "vec_id", "embedding", K, nProbe = 8))
      val b = pairSet(Similarity.ivfadcTopK(loaded, queries, "vec_id", "embedding", K, nProbe = 8))
      assert(a === b)
    }
  }

  describe("hierarchical residual IVFADC (IvfPq2Index over the two-level quantizer, sf0.01)") {
    // 4 super x 4 sub = 16 cells — the flat baseline's geometry, reached
    // through the hierarchy (full expansion, so routing considers every cell)
    lazy val ivf2 = Similarity.buildIvfIndex2(emb, "vec_id", "embedding",
      k1 = 4, k2 = 4, trainIters = 1, expand = 4)
    lazy val res2 = Similarity.buildIvfPqIndex2(ivf2, dim = 64, m = 16, ks = 256,
      trainIters = 3)

    it("partial probing + over-fetch + exact re-rank: pinned, recovering under wider probes") {
      // measured: 0.79 at nProbe=8, vs the flat 16-centroid index's 0.95 —
      // the known product-structure tradeoff: the 4 residual sub-centroids
      // are SHARED across supers, a coarser partition than 16 freely
      // trained cells, so equal-probe recall sits lower; the hierarchy's
      // payoff is routing cost at cell counts a flat quantizer cannot
      // reach. Wider probing recovers (measured 0.93 at nProbe=12).
      def recall(nProbe: Int): Double = {
        val cands = Similarity.ivfadc2TopK(res2, queries, "vec_id", "embedding",
          50, nProbe = nProbe)
        val rr = pairSet(Similarity.rerankExact(cands, queries, emb, "vec_id", "embedding", K))
        rr.intersect(exactTopK).size.toDouble / exactTopK.size
      }
      val r8 = recall(8); val r12 = recall(12)
      info(s"hierarchical ivfadc re-ranked recall@$K at nProbe 8/12 = $r8 / $r12")
      assert(r8 >= 0.7, s"recall@$K at nProbe=8 was $r8")
      assert(r12 >= 0.85 && r12 >= r8, s"recall@$K at nProbe=12 was $r12 (8: $r8)")
    }

    it("ivfPq2Encode over the full corpus reproduces the standing code frame exactly") {
      import spark.implicits._
      def fp(codes: DataFrame): Array[(Long, Long, Seq[Byte], Double)] = codes
        .select(col("neighbor_id"), col("cent_id"), col("code"), col("recon_n2"))
        .as[(Long, Long, Array[Byte], Double)].collect()
        .map { case (id, cid, c, r) => (id, cid, c.toSeq, r) }.sortBy(_._1)
      val re = Similarity.ivfPq2Encode(res2, emb, "vec_id", "embedding")
      assert(fp(re).sameElements(fp(res2.codes)),
        "frozen-index slice encode diverged from the build-time code frame")
    }

    it("mergeIvfPq2Codes: merged batch == from-scratch re-encode, idempotent") {
      import spark.implicits._
      def fp(codes: DataFrame): Set[(Long, Long, Seq[Byte], Double)] = codes
        .select(col("neighbor_id").cast("long"), col("cent_id").cast("long"),
          col("code"), col("recon_n2"))
        .as[(Long, Long, Array[Byte], Double)].collect()
        .map { case (id, cid, c, r) => (id, cid, c.toSeq, r) }.toSet
      val batch = emb.filter(col("vec_id") < 10)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
        .unionByName(emb.filter(col("vec_id") === 10)
          .select(col("vec_id"), lit(null).cast("array<float>").as("embedding")))
      val merged = Similarity.mergeIvfPq2Codes(res2, res2.codes, batch, "vec_id", "embedding")
      val news = emb.filter(col("vec_id") > 10)
        .select(col("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") < 10)
          .select(col("vec_id"), reverse(col("embedding")).as("embedding")))
      val scratch = Similarity.ivfPq2Encode(res2, news, "vec_id", "embedding")
      assert(fp(merged) === fp(scratch), "merged batch diverged from from-scratch re-encode")
      val again = Similarity.mergeIvfPq2Codes(res2, merged, batch, "vec_id", "embedding")
      assert(fp(again) === fp(merged), "batch replay was not idempotent")
    }

    it("store round trip: the reloaded hierarchical index searches identically") {
      // repackage the quantizer through an IvfIndex2 shell to reuse the
      // metadata-bearing frame writer
      val qFrame = Similarity.quantizer2Frame(spark,
        Similarity.buildIvfIndex2(emb, "vec_id", "embedding",
          k1 = 4, k2 = 4, trainIters = 1, expand = 4))
      val books = Similarity.ivfPq2BooksFrame(spark, res2)
      val loaded = Similarity.loadIvfPq2Index(qFrame, books, res2.codes)
      val a = pairSet(Similarity.ivfadc2TopK(res2, queries, "vec_id", "embedding", K, nProbe = 8))
      val b = pairSet(Similarity.ivfadc2TopK(loaded, queries, "vec_id", "embedding", K, nProbe = 8))
      assert(a === b)
    }
  }

  describe("mergePqCodes — standing flat-PQ store maintenance") {
    import spark.implicits._

    it("upsert + append + NULL-delete merge is byte-identical to a from-scratch " +
       "re-encode, and a replayed batch is idempotent") {
      val rnd = new scala.util.Random(53)
      def vec() = Seq.fill(16)(rnd.nextDouble() * 2 - 1)
      val base = (0L until 60L).map(i => (i, vec())).toDF("vec_id", "embedding")
      val idx = Similarity.buildPqIndex(base, "vec_id", "embedding",
        dim = 16, m = 4, ks = 16, trainIters = 3)
      // ids 0-4 re-embed (upsert), 100-104 arrive (append), 5-6 leave
      // (NULL vectors: encode drops them, the anti-join strips their rows)
      val slice = ((0L until 5L).map(i => (i, vec())) ++
        (100L until 105L).map(i => (i, vec())) ++
        (5L until 7L).map(i => (i, null.asInstanceOf[Seq[Double]])))
        .toDF("vec_id", "embedding")
      val merged = Similarity.mergePqCodes(idx, idx.codes, slice, "vec_id", "embedding")
      val updated = base.join(slice.select($"vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(slice.where($"embedding".isNotNull))
      val scratch = Similarity.pqEncode(idx, updated, "vec_id", "embedding")
      assert(merged.exceptAll(scratch).unionByName(scratch.exceptAll(merged)).isEmpty)
      assert(merged.count() === 60L - 2L + 5L) // 5 replaced in place
      val replayed = Similarity.mergePqCodes(idx, merged, slice, "vec_id", "embedding")
      assert(replayed.exceptAll(merged).unionByName(merged.exceptAll(replayed)).isEmpty)
    }

    it("OPQ drift maintenance: the refreshed rotation's ADC recall does not " +
       "regress the stale one on drifted queries (q258's spec-side pin)") {
      // base corpus: anisotropy decaying along the NATURAL dims (the
      // distribution opqBasis was derived for); drift: new vectors whose
      // anisotropy decays along the REVERSED dims — the stale rotation's
      // eigenvalue allocation and books were trained for the wrong
      // distribution, the refreshed ones were not
      val rnd = new scala.util.Random(61)
      val dim = 16
      def decay(i: Long, rev: Boolean) = (0 until dim).map { d =>
        val s = if (rev) dim - 1 - d else d
        (rnd.nextDouble() * 2 - 1) / (1.0 + s * 0.7)
      }
      val base = (0L until 400L).map(i => (i, decay(i, rev = false)))
        .toDF("vec_id", "embedding")
      val drift = (1000L until 1200L).map(i => (i, decay(i, rev = true)))
        .toDF("vec_id", "embedding")
      val updated = base.unionByName(drift)
      val queries = drift.where($"vec_id" < 1012)
      val exact = pairSet(Similarity.bruteForceTopK(
        queries, updated, "vec_id", "embedding", K))
      def adcRecall(basis: Pca.PcaModel, ix: Similarity.PqIndex): Double = {
        val rq = Pca.rotate(queries, "vec_id", "embedding", basis)
          .toDF("vec_id", "embedding")
        pairSet(Similarity.pqTopK(ix, rq, "vec_id", "embedding", K))
          .intersect(exact).size.toDouble / exact.size
      }
      // stale store: basis + books from BASE, the drift batch merged in
      // through the frozen quantizer (the q258 face-1 composition)
      val staleBasis = Pca.opqBasis(base, "embedding", m = 4)
      val staleIdx = Similarity.buildPqIndex(
        Pca.rotate(base, "vec_id", "embedding", staleBasis).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = dim, m = 4, ks = 16, trainIters = 3)
      val mergedIdx = staleIdx.withCodes(Similarity.mergePqCodes(staleIdx,
        staleIdx.codes,
        Pca.rotate(drift, "vec_id", "embedding", staleBasis).toDF("vec_id", "embedding"),
        "vec_id", "embedding"))
      // refreshed store: basis + books re-derived on the DRIFTED corpus
      val freshBasis = Pca.opqBasis(updated, "embedding", m = 4)
      val freshIdx = Similarity.buildPqIndex(
        Pca.rotate(updated, "vec_id", "embedding", freshBasis).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = dim, m = 4, ks = 16, trainIters = 3)
      val (stale, fresh) = (adcRecall(staleBasis, mergedIdx), adcRecall(freshBasis, freshIdx))
      info(f"ADC recall@$K on drifted queries: stale $stale%.3f, refreshed $fresh%.3f")
      // measured: stale 0.092, refreshed 0.417 (seed 61) — re-deriving the
      // rotation is not a tie-break, it is the difference between a dead
      // and a usable ADC stage on the drifted slice (production recall on
      // top of either comes from over-fetch + re-rank, q258's gate)
      assert(fresh >= stale + 0.15,
        f"refreshed rotation no longer materially beats stale: $fresh%.3f vs $stale%.3f")
      assert(fresh > 0.35, f"refreshed ADC recall $fresh%.3f unexpectedly low")
    }
  }
}
