package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Text
import graft.sorted.syntax._

/** Round-5 pipeline extensions: contamination detection, sequence packing,
  * repetition metrics. */
class PipelineExtrasSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  describe("Contamination.overlapPairs") {
    val train = Seq(
      (1L, "a b c d e f g"), // shares trigrams (b c d), (c d e), (d e f) with eval 100
      (2L, "z y x w v u t"), // no overlap
      (3L, "b c d q r s t")  // shares only (b c d) — below minShared
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "b c d e f x")).toDF("doc_id", "text")

    it("finds pairs sharing >= minShared distinct n-grams, and only those") {
      val got = Contamination.overlapPairs(train, eval, "doc_id", "text", 3, 3)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 100L, 3L)))
    }

    it("counts DISTINCT shared grams (repeated grams don't inflate)") {
      val t = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text") // (a b c) thrice
      val e = Seq((9L, "a b c a b c")).toDF("doc_id", "text")
      val got = Contamination.overlapPairs(t, e, "doc_id", "text", 3, 1)
        .as[(Long, Long, Long)].collect().toSet
      // shared distinct trigrams: (a b c), (b c a), (c a b) — once each
      assert(got === Set((1L, 9L, 3L)))
    }

    it("broadcasts the eval side (no corpus-side shuffle before the join)") {
      val p = Contamination.overlapPairs(train, eval, "doc_id", "text", 3, 1)
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastExchange"), p)
      assert(p.contains("BroadcastHashJoin"), p)
    }

    it("evalGramHits aggregates across the whole eval set per training doc") {
      val e2 = Seq((100L, "b c d e f x"), (101L, "z y x w n m")).toDF("doc_id", "text")
      val got = Contamination.evalGramHits(train, e2, "doc_id", "text", 3)
        .as[(Long, Long)].collect().toMap
      // doc 1: 3 grams from eval 100; doc 2: (z y x), (y x w) from eval 101;
      // doc 3: (b c d) from eval 100
      assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    }

    it("crossCorpusOverlap reports per-a-doc totals and hits via a shuffle " +
       "join (neither side broadcast by the operator)") {
      val b = Seq((50L, "a b c d e f g h")).toDF("doc_id", "text")
      // doc 1: 5 trigrams, all inside b; doc 2: none; doc 3: (b c d) only
      val got = Contamination.crossCorpusOverlap(train, b, "doc_id", "text", 3)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 5L, 5L), (2L, 5L, 0L), (3L, 5L, 1L)))
      // big x big contract: the gram join must not hinge on a broadcast
      // hint from the operator (AQE may still pick one for tiny frames;
      // assert the OPERATOR adds none by checking the logical plan)
      val lp = Contamination.crossCorpusOverlap(train, b, "doc_id", "text", 3)
        .queryExecution.logical.toString
      assert(!lp.contains("ResolvedHint"), lp)
      // a doc with fewer words than n contributes no row (nothing to probe)
      val tiny = Seq((7L, "a b")).toDF("doc_id", "text")
      assert(Contamination.crossCorpusOverlap(tiny, b, "doc_id", "text", 3).isEmpty)
    }
  }

  describe("Packing.packGreedy") {
    it("replays greedy next-fit per shard in value order") {
      // shard 0 in scan order: 4, 4, 4, 10, 3 at capacity 10
      // -> bins 0 (4+4), 1 (4), 2 (the oversize-fit 10), 3 (3)
      val rows = Seq(
        (0L, (2L, 1L, 3L)), // scrambled input: groupSort must restore order
        (0L, (1L, 0L, 4L)),
        (0L, (2L, 0L, 10L)),
        (0L, (1L, 2L, 4L)),
        (0L, (1L, 1L, 4L)),
        (1L, (7L, 0L, 9L)), // second shard packs independently from bin 0
        (1L, (7L, 1L, 2L))
      ).toDS()
      val got = Packing.packGreedy(rows.groupSort(), capacity = 10L)
        .map { case (s, (d, c, n, b)) => (s, d, c, n, b) }.collect().toSet
      assert(got === Set(
        (0L, 1L, 0L, 4L, 0L), (0L, 1L, 1L, 4L, 0L), (0L, 1L, 2L, 4L, 1L),
        (0L, 2L, 0L, 10L, 2L), (0L, 2L, 1L, 3L, 3L),
        (1L, 7L, 0L, 9L, 0L), (1L, 7L, 1L, 2L, 1L)))
    }

    it("gives an oversize chunk a bin of its own without splitting it") {
      val rows = Seq((0L, (1L, 0L, 25L)), (0L, (1L, 1L, 2L))).toDS()
      val got = Packing.packGreedy(rows.groupSort(), capacity = 10L)
        .map { case (_, (_, c, _, b)) => (c, b) }.collect().toSet
      assert(got === Set((0L, 0L), (1L, 1L)))
    }

    it("never overfills a bin except for a singleton oversize chunk") {
      // pseudo-random sizes, fixed seed: packing invariant must hold
      val rnd = new scala.util.Random(42)
      val chunks = (0 until 400).map(i =>
        ((i % 5).toLong, (i.toLong / 5, i.toLong % 5, 1L + rnd.nextInt(30))))
      val packed = Packing.packGreedy(chunks.toDS().groupSort(), capacity = 32L)
        .map { case (s, (_, _, n, b)) => (s, b, n) }.collect()
      packed.groupBy(p => (p._1, p._2)).foreach { case ((s, b), members) =>
        val fill = members.map(_._3).sum
        assert(fill <= 32L || members.length == 1,
          s"shard $s bin $b overfilled: $fill with ${members.length} chunks")
      }
    }
  }

  describe("Dedup.incrementalNearDups") {
    val standing = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),  // standing-side exact dup of doc 1
      (3L, "q r s t u v w x")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "a b c d e f g h"), // exact copy -> certain hit on docs 1 AND 2
      (102L, "m n o p m n o p"), // nothing like it in the corpus
      (103L, "a b c d e f g x")  // near copy: jaccard 5/7 < 0.99 -> verified OUT
    ).toDF("doc_id", "text")
    val index = Dedup.minhashIndex(standing, "doc_id", "text")

    it("finds planted batch copies against the standing index, cross-side only") {
      val got = Dedup
        .incrementalNearDups(index, standing, batch, "doc_id", "text", threshold = 0.99)
        .select("batch_id", "standing_id", "inter", "uni")
        .as[(Long, Long, Long, Long)].collect().toSet
      // 8 words -> 6 distinct trigrams; the standing dup pair (1,2) must NOT
      // appear (already handled at corpus-dedup time), nor any batch-batch pair
      assert(got === Set((101L, 1L, 6L, 6L), (101L, 2L, 6L, 6L)))
    }

    it("verify step excludes sub-threshold candidates deterministically") {
      val got = Dedup
        .incrementalNearDups(index, standing, batch, "doc_id", "text", threshold = 0.5)
        .select("batch_id", "standing_id").as[(Long, Long)].collect().toSet
      // at 0.5 the near copy may surface (jaccard 5/7) IF its signature
      // collides — but 103-vs-3 (jaccard 0) must never pass the exact verify
      assert(got.contains((101L, 1L)) && got.contains((101L, 2L)))
      assert(!got.contains((103L, 3L)) && !got.exists(_._1 == 102L))
    }
  }

  describe("Quantiles.perKeyExact") {
    it("selects the value at rank ceil(p*n) per key (percentile_disc semantics)") {
      // key 1: values 10..100 step 10 (n=10): p50 -> rank 5 = 50, p90 -> rank 9 = 90, p100 -> 100
      // key 2: single value (n=1): every quantile = that value
      val rows = ((1 to 10).map(i => (1L, i * 10L, i.toLong)) :+ ((2L, 7L, 99L)))
        .toDF("k", "v", "tie")
      val got = Quantiles.perKeyExact(rows, "k", "v", "tie",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0))
        .as[(Long, Long, Long, Long)].collect().map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
      assert(got === Map(1L -> ((50L, 90L, 100L)), 2L -> ((7L, 7L, 7L))))
    }

    it("bucketByQuantile assigns equal-probability bins per key; nulls and ties behave") {
      // key a: 1..8 -> quartile cuts 2,4,6 -> buckets 1,1,2,2,3,3,4,4
      // key b: all-equal values -> everything lands in bucket 1 (ties share)
      def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
      val rows = ((1 to 8).map(i => ("a", jl(i.toLong), i.toLong)) ++
        (1 to 4).map(i => ("b", jl(5L), i.toLong)) ++
        Seq((null.asInstanceOf[String], jl(3L), 100L), ("a", null.asInstanceOf[java.lang.Long], 101L)))
        .toDF("k", "v", "tie")
      val got = Quantiles.bucketByQuantile(rows, "k", "v", "tie", 4)
        .select(col("k"), col("v"), col("bucket")).as[(String, Long, Long)].collect()
      assert(got.length === 12) // null key / null value rows dropped
      val aBuckets = got.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq
      assert(aBuckets === Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
      assert(got.filter(_._1 == "b").forall(_._3 == 1L))
      intercept[IllegalArgumentException](Quantiles.bucketByQuantile(rows, "k", "v", "tie", 1))
    }

    it("winsorize clamps into the per-key [pLo, pHi] order-statistic range") {
      // n=10, values 10..100: pLo=0.2 -> rank 2 = 20, pHi=0.8 -> rank 8 = 80
      val rows = (1 to 10).map(i => (1L, i * 10L, i.toLong)).toDF("k", "v", "tie")
      val got = Quantiles.winsorize(rows, "k", "v", "tie", 0.2, 0.8)
        .select(col("v"), col("winsorized")).as[(Long, Long)].collect().toMap
      assert(got.size === 10) // all rows survive, only values clamp
      assert(got(10L) === 20L && got(20L) === 20L && got(50L) === 50L &&
        got(80L) === 80L && got(90L) === 80L && got(100L) === 80L)
      intercept[IllegalArgumentException](Quantiles.winsorize(rows, "k", "v", "tie", 0.9, 0.5))
      intercept[IllegalArgumentException](
        Quantiles.winsorize(rows.withColumn("winsorized", lit(1)), "k", "v", "tie", 0.1, 0.9))
    }

    it("globalExact reads quantiles off the value histogram; ties and duplicates are exact") {
      // values 1,2,2,2,9 (n=5): p50 -> rank 3 = 2; p99 -> rank 5 = 9; p20 -> rank 1 = 1
      val rows = Seq(2L, 9L, 2L, 1L, 2L).toDF("v")
      val got = Quantiles.globalExact(rows, "v",
          Seq("p20" -> 0.2, "p50" -> 0.5, "p99" -> 0.99))
        .as[(Long, Long, Long, Long)].head()
      assert(got === ((5L, 1L, 2L, 9L)))
      // agrees with the per-key form under a constant key
      val perKey = Quantiles.perKeyExact(
          rows.withColumn("k", lit(1L)).withColumn("tie", col("v")),
          "k", "v", "tie", Seq("p50" -> 0.5))
        .select("p50").as[Long].head()
      assert(perKey === 2L)
      intercept[IllegalArgumentException](Quantiles.globalExact(rows, "v", Seq("n" -> 0.5)))
    }

    it("robustStats: an extreme outlier moves neither the median nor the MAD") {
      val rows = ((1 to 9).map(i => (1L, i.toLong, i.toLong)) ++
        Seq((2L, 1L, 1L), (2L, 2L, 2L), (2L, 3L, 3L), (2L, 1000000L, 4L)))
        .toDF("k", "v", "tie")
      val got = Quantiles.robustStats(rows, "k", "v", "tie")
        .as[(Long, Long, Long)].collect().map { case (k, m, d) => k -> ((m, d)) }.toMap
      // key 1: median=5, absdevs 0,1,1,2,2,3,3,4,4 -> MAD=2
      // key 2 (outlier 1e6): median = rank ceil(0.5*4)=2 -> 2; absdevs
      // 0,1,1,999998 -> MAD = rank 2 -> 1. The outlier is invisible.
      assert(got === Map(1L -> ((5L, 2L)), 2L -> ((2L, 1L))))
      intercept[IllegalArgumentException](
        Quantiles.robustStats(rows.withColumn("mad", lit(1)), "k", "v", "tie"))
    }

    it("odd n and duplicate values: the selected value is tie-invariant") {
      // n=5 of values 1,2,2,2,9: p50 -> rank 3 = 2; p99 -> rank ceil(4.95)=5 = 9
      val rows = Seq((1L, 2L, 1L), (1L, 9L, 2L), (1L, 2L, 3L), (1L, 1L, 4L), (1L, 2L, 5L))
        .toDF("k", "v", "tie")
      val got = Quantiles.perKeyExact(rows, "k", "v", "tie",
          Seq("p50" -> 0.5, "p99" -> 0.99))
        .as[(Long, Long, Long)].collect().head
      assert(got === ((1L, 2L, 9L)))
    }

    it("rejects probabilities outside (0, 1] and below the rank precision") {
      val rows = Seq((1L, 1L, 1L)).toDF("k", "v", "tie")
      intercept[IllegalArgumentException] {
        Quantiles.perKeyExact(rows, "k", "v", "tie", Seq("p0" -> 0.0))
      }
      // p < 1e-6 would rationalize to rank 0 and silently return NULL
      intercept[IllegalArgumentException] {
        Quantiles.perKeyExact(rows, "k", "v", "tie", Seq("tiny" -> 1e-7))
      }
    }
  }

  describe("Sketch count-min") {
    val rows = (Seq.fill(40)("hot") ++ Seq.fill(7)("warm") ++ Seq("cold"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val keys = Seq("hot", "warm", "cold", "absent").toDF("k")

    it("estimates are exact when the sketch is wide (no collisions possible)") {
      val sk = Sketch.countMin(rows, col("k"), depth = 4, width = 1024)
      val got = Sketch.cmEstimate(sk, keys, "k", depth = 4, width = 1024)
        .as[(String, Long)].collect().toMap
      assert(got === Map("hot" -> 40L, "warm" -> 7L, "cold" -> 1L, "absent" -> 0L))
    }

    it("estimates never undercount, even at width 1 (all keys collide)") {
      val sk = Sketch.countMin(rows, col("k"), depth = 4, width = 1)
      val got = Sketch.cmEstimate(sk, keys, "k", depth = 4, width = 1)
        .as[(String, Long)].collect().toMap
      // a single bucket sums everything: every estimate is the total row count
      assert(got.values.toSet === Set(48L))
    }

    it("sketches merge cell-wise across batches (same fixed lane hashes)") {
      val (a, b) = (rows.where(col("id") < 20), rows.where(col("id") >= 20))
      val merged = Sketch.countMin(a, col("k"), 4, 1024)
        .unionByName(Sketch.countMin(b, col("k"), 4, 1024))
        .groupBy("lane", "bucket").agg(sum("cnt").as("cnt"))
      val got = Sketch.cmEstimate(merged, keys, "k", 4, 1024)
        .as[(String, Long)].collect().toMap
      assert(got === Map("hot" -> 40L, "warm" -> 7L, "cold" -> 1L, "absent" -> 0L))
    }

    it("joinSizeEstimate is exact without collisions and the worst case Na*Nb at width 1") {
      // other side: 3 "hot" rows, 2 "cold", 5 "absent-from-left" rows
      val other = (Seq.fill(3)("hot") ++ Seq.fill(2)("cold") ++ Seq.fill(5)("other"))
        .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
      val wide = Sketch.joinSizeEstimate(
        Sketch.countMin(rows, col("k"), 4, 1024),
        Sketch.countMin(other, col("k"), 4, 1024), 4).head().getLong(0)
      // exact inner-product: 40*3 (hot) + 1*2 (cold) = 122
      assert(wide === 122L)
      val narrow = Sketch.joinSizeEstimate(
        Sketch.countMin(rows, col("k"), 4, 1),
        Sketch.countMin(other, col("k"), 4, 1), 4).head().getLong(0)
      // one bucket holds all mass on both sides: the estimate degrades to
      // Na*Nb = 48*10 but NEVER undercounts
      assert(narrow === 480L && narrow >= 122L)
    }

    it("joinSizeEstimate returns 0 (not NULL) when the key sets are disjoint at full width") {
      val disjoint = Seq((0L, "zzz-only")).toDF("id", "k")
      // wide sketches: the disjoint side shares no (lane, bucket) cell with
      // high probability; any lane with zero overlap proves the join empty
      val est = Sketch.joinSizeEstimate(
        Sketch.countMin(rows, col("k"), 4, 65536),
        Sketch.countMin(disjoint, col("k"), 4, 65536), 4).head()
      assert(!est.isNullAt(0) && est.getLong(0) === 0L)
    }
  }

  describe("Sketch HLL distinct state") {
    it("merged estimates are split-invariant and within the error bound; direct HIP estimates may differ") {
      val rows = (0 until 20000).map(i => (i.toLong, s"g${i % 3}", s"u${i % 4000}"))
        .toDF("id", "grp", "uid")
      def est(splits: Int): Map[String, Long] = {
        val batches = (0 until splits).map(i =>
          Sketch.distinctSketchByKey(rows.where(pmod(col("id"), lit(splits)) === i), "grp", "uid"))
        Sketch.estimateDistinct(
          Sketch.mergeDistinctSketches(batches.reduce(_.unionByName(_)), "grp"), "grp")
          .as[(String, Long)].collect().toMap
      }
      val (e2, e5) = (est(2), est(5))
      assert(e2 === e5) // union state is a pure function of the row set
      e2.values.foreach(v => assert(math.abs(v - 4000L) <= 200L, s"estimate $v vs exact 4000"))
      intercept[IllegalArgumentException](Sketch.distinctSketchByKey(rows, "grp", "uid", 2))
    }
  }

  describe("Sketch Misra-Gries") {
    it("merged summary covers every true heavy hitter with bounded deficit, under any partitioning") {
      // skewed stream: key h0 40%, h1 20%, then a long uniform tail
      val rnd0 = new scala.util.Random(11)
      val keys = (0 until 5000).map { _ =>
        val r = rnd0.nextInt(10)
        if (r < 4) "h0" else if (r < 6) "h1" else s"t${rnd0.nextInt(500)}"
      }
      val k = 9
      for (parts <- Seq(1, 4, 13)) {
        val df = keys.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("id", "key").repartition(parts)
        val mg = Sketch.misraGries(df, "key", k)
          .as[(String, Long)].collect().toMap
        val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = keys.size.toLong
        exact.foreach { case (key, freq) =>
          val lower = mg.getOrElse(key, 0L)
          assert(lower <= freq, s"$key: mg $lower overcounts exact $freq")
          assert(freq - lower <= n / (k + 1) + 1,
            s"$key: deficit ${freq - lower} exceeds n/(k+1)")
          if (freq * (k + 1) > n)
            assert(mg.contains(key), s"heavy hitter $key missing from summary at $parts parts")
        }
      }
    }

    it("skips null keys and counts a single-key stream exactly") {
      val df = (Seq.fill(100)(Some("only")) ++ Seq.fill(5)(Option.empty[String]))
        .zipWithIndex.map { case (k, i) => (i.toLong, k.orNull) }.toDF("id", "key")
      val got = Sketch.misraGries(df, "key", 4).as[(String, Long)].collect().toMap
      assert(got === Map("only" -> 100L))
      intercept[IllegalArgumentException](Sketch.misraGries(df, "key", 0))
    }
  }

  describe("Bloom join pruning") {
    it("inserted keys always pass; most absent keys are pruned") {
      val dim = (0L until 200L).map(i => (i * 7, s"d$i")).toDF("k", "name")
      val filt = Bloom.buildFilter(dim, "k", 1 << 14, 3)
      val probeKeys = (0L until 5000L).toDF("k")
      val passed = probeKeys.crossJoin(broadcast(filt))
        .where(Bloom.mightContain(col("__bloom_bits"), col("k"), 1 << 14, 3))
        .select("k").as[Long].collect().toSet
      // no false negatives: every multiple of 7 under 1400 must pass
      (0L until 200L).foreach(i => assert(passed.contains(i * 7), s"false negative on ${i * 7}"))
      // false positives exist but are rare at 16384 bits / 200 keys
      val fp = passed.count(k => k % 7 != 0 || k >= 1400)
      assert(fp < 100, s"$fp false positives out of 4800 absent keys")
    }

    it("prunedEquiJoin is exactly the plain inner join, including empty and null cases") {
      val rnd1 = new scala.util.Random(3)
      val probe = (0 until 3000).map { i =>
        (if (rnd1.nextInt(50) == 0) null.asInstanceOf[java.lang.Long]
         else java.lang.Long.valueOf(rnd1.nextInt(400).toLong), i.toLong)
      }.toDF("k", "payload")
      val build = (0L until 120L).map(i => (i * 3, s"b$i")).toDF("k", "attr")
      val got = Bloom.prunedEquiJoin(probe, build, "k")
      assert(got.exceptAll(probe.join(build, "k")).isEmpty)
      assert(probe.join(build, "k").exceptAll(got).isEmpty)
      // empty build side prunes everything
      assert(Bloom.prunedEquiJoin(probe, build.where(lit(false)), "k").count() === 0L)
    }

    it("mergeFilters(a, b) is bit-identical to building over the union") {
      val all = (0L until 300L).map(i => (i * 11, i)).toDF("k", "x")
      val direct = Bloom.buildFilter(all, "k", 1 << 12, 3)
      val merged = Bloom.mergeFilters(
        Bloom.buildFilter(all.where(col("x") % 3 === 0), "k", 1 << 12, 3),
        Bloom.buildFilter(all.where(col("x") % 3 === 1), "k", 1 << 12, 3),
        Bloom.buildFilter(all.where(col("x") % 3 === 2), "k", 1 << 12, 3))
      assert(Bloom.filterMismatch(merged, direct).as[Long].head() === 0L)
      // and a genuinely different filter DOES mismatch
      val other = Bloom.buildFilter(Seq((99999L, 0)).toDF("k", "x"), "k", 1 << 12, 3)
      assert(Bloom.filterMismatch(merged, other).as[Long].head() > 0L)
    }

    it("mismatched geometry fails LOUD: merge of unequal filters and prune with wrong args both raise") {
      val build = (0L until 50L).map(i => (i * 3, i)).toDF("k", "x")
      val f16 = Bloom.buildFilter(build, "k", 1 << 16, 3)
      val f12 = Bloom.buildFilter(build, "k", 1 << 12, 3)
      // bit positions are computed modulo numBits — ORing maps of different
      // geometry, or probing with the wrong one, silently drops true matches,
      // so the recorded geometry must be enforced, not assumed
      val merged = Bloom.mergeFilters(f16, f12)
      val ex1 = intercept[Exception](merged.collect())
      assert(ex1.getMessage.contains("geometry mismatch"), ex1.getMessage)
      val ex2 = intercept[Exception](
        Bloom.pruneWith((0L until 10L).toDF("k"), f16, "k", 1 << 12, 3).collect())
      assert(ex2.getMessage.contains("geometry mismatch"), ex2.getMessage)
    }

    it("pruneWith a merged filter keeps every true match (no false negatives)") {
      val build = (0L until 150L).map(i => (i * 5, i)).toDF("k", "x")
      val merged = Bloom.mergeFilters(
        Bloom.buildFilter(build.where(col("x") < 75), "k", 1 << 14, 3),
        Bloom.buildFilter(build.where(col("x") >= 75), "k", 1 << 14, 3))
      val probe = (0L until 1000L).toDF("k")
      val kept = Bloom.pruneWith(probe, merged, "k", 1 << 14, 3)
        .as[Long].collect().toSet
      (0L until 150L).foreach(i => assert(kept.contains(i * 5), s"lost true key ${i * 5}"))
    }
  }

  describe("randomized brute-force comparisons (fixed seed)") {
    val rnd = new scala.util.Random(7)

    it("Quantiles.perKeyExact == in-memory rank selection on 2000 random rows") {
      val rows = (0 until 2000).map(i =>
        ((i % 40).toLong, rnd.nextInt(1000).toLong - 500L, i.toLong))
      val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p100" -> 1.0)
      val got = Quantiles.perKeyExact(rows.toDF("k", "v", "tie"), "k", "v", "tie", ps)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map { case (k, a, b, c, d) => k -> Seq(a, b, c, d) }.toMap
      val expect = rows.groupBy(_._1).view.mapValues { kvs =>
        val sorted = kvs.map(_._2).sorted
        ps.map { case (_, p) => sorted(math.ceil(p * sorted.size).toInt - 1) }
      }.toMap
      assert(got === expect)
    }

    it("count-min estimates never undercount on 2000 random rows at width 32") {
      val rows = (0 until 2000).map(i => (i.toLong, s"k${rnd.nextInt(100)}"))
        .toDF("id", "k")
      val exact = rows.groupBy("k").count().as[(String, Long)].collect().toMap
      val sk = Sketch.countMin(rows, col("k"), depth = 3, width = 32)
      val est = Sketch.cmEstimate(sk, exact.keys.toSeq.toDF("k"), "k", depth = 3, width = 32)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"key $k: estimate ${est(k)} < exact $n")
      }
    }

    it("Contamination.overlapPairs == brute-force shingle intersection on random docs") {
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      def doc(len: Int) = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val train = (1L to 30L).map(i => (i, doc(8 + rnd.nextInt(10))))
      val eval = (100L to 103L).map(i => (i, doc(10)))
      def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val expect = (for {
        (ti, tt) <- train; (ei, et) <- eval
        shared = (grams(tt) intersect grams(et)).size if shared >= 2
      } yield (ti, ei, shared.toLong)).toSet
      val got = Contamination
        .overlapPairs(train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
          "doc_id", "text", 3, 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expect)
    }

    it("Contamination.spanAttribution == brute-force diagonal runs on random docs") {
      val vocab = Vector("a", "b", "c", "d")
      def doc(len: Int) = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val w = 3
      val train = (1L to 20L).map(i => (i, doc(8 + rnd.nextInt(8))))
      val eval = (100L to 103L).map(i => (i, doc(9)))
      def windows(t: String): Seq[(Int, String)] =
        t.split(" ").sliding(w).zipWithIndex.map { case (ws, i) => (i, ws.mkString(" ")) }
          .toSeq.filter(_._2.split(" ").length == w)
      val expect = (for {
        (ti, tt) <- train; (ei, et) <- eval
        ms = for { (tp, s1) <- windows(tt); (ep, s2) <- windows(et) if s1 == s2 } yield (tp, ep)
        if ms.nonEmpty
      } yield {
        val runs = ms.groupBy { case (tp, ep) => tp - ep }.values.flatMap { diag =>
          // contiguity over eval positions within one diagonal
          val ps = diag.map(_._2).sorted
          ps.foldLeft(List.empty[List[Int]]) {
            case (acc @ (run :: rest), p) if run.headOption.contains(p - 1) => (p :: run) :: rest
            case (acc, p) => List(p) :: acc
          }.map(_.size.toLong)
        }.toSeq
        (ti, ei, runs.sum, runs.max, runs.max + (w - 1))
      }).toSet
      val got = Contamination
        .spanAttribution(train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
          "doc_id", "text", w)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expect)
    }
  }

  describe("Text repetition metrics") {
    it("counts distinct tokens and the top bigram") {
      val df = Seq(
        (1L, "a a a b"),  // bigrams: (a a) x2, (a b) -> top 2
        (2L, ""),         // empty
        (3L, "x y"),      // one bigram
        (4L, "p q p q p"), // bigrams: (p q) x2, (q p) x2 -> top 2
        (5L, "solo")      // single token: no bigrams (guards the sequence() bound)
      ).toDF("doc_id", "text")
      val got = df.select($"doc_id", Text.distinctTokenCount($"text").as("d"),
          Text.topBigramCount($"text").as("t"))
        .as[(Long, Long, Long)].collect().map { case (k, d, t) => k -> ((d, t)) }.toMap
      assert(got === Map(1L -> ((2L, 2L)), 2L -> ((0L, 0L)), 3L -> ((2L, 1L)),
        4L -> ((2L, 2L)), 5L -> ((1L, 0L))))
    }

    it("accept flag: short docs pass; repetitive long docs fail both ways") {
      val dup = ("spam " * 20).trim           // 20 tokens, 1 distinct
      val loop = ("tick tock " * 10).trim     // top bigram covers ~half
      val clean = (1 to 20).map(i => s"w$i").mkString(" ")
      val df = Seq((1L, "tiny doc"), (2L, dup), (3L, loop), (4L, clean)).toDF("doc_id", "text")
      val got = df.select($"doc_id" +: Text.repetitionColumns($"text"): _*)
        .select($"doc_id", $"repetition_ok").as[(Long, Boolean)].collect().toMap
      assert(got === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    }

    it("typed kernel (hot path) equals the Column form on every metric") {
      // interior tabs/newlines are in-contract (both forms split on Java \s);
      // only EDGE control chars diverge — see the next test
      val docs = Seq(
        (1L, "a a a b"), (2L, ""), (3L, "x y"), (4L, "p q p q p"), (5L, "solo"),
        (6L, ("spam " * 20).trim), (7L, ("tick tock " * 10).trim),
        (8L, (1 to 20).map(i => s"w$i").mkString(" ")),
        (9L, "a\tb\nc a\tb")
      ).toDF("doc_id", "text")
      val kernel = Text.repetitionMetrics(docs, "doc_id", "text")
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      val columns = docs
        .select($"doc_id" +: Text.repetitionColumns(coalesce($"text", lit(""))): _*)
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      assert(kernel === columns)
    }

    it("edge control chars: kernel and Column form CONVERGE under extraction " +
       "(the split form's phantom empty token after a leading tab is retired)") {
      val docs = Seq((1L, "\ta b"), (2L, "\t"), (3L, "x\u0000y z")).toDF("doc_id", "text")
      val kernel = Text.repetitionMetrics(docs, "doc_id", "text")
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      val column = docs
        .select($"doc_id" +: Text.repetitionColumns($"text"): _*)
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      assert(kernel === column)
      assert(kernel.find(_._1 == 1L).get._2 === 2L) // ["a", "b"] — no phantom
      assert(kernel.find(_._1 == 2L).get._2 === 0L) // blank -> no tokens
      // interior NUL stays inside its token (edge strip is EDGES only)
      assert(kernel.find(_._1 == 3L).get._2 === 2L)
    }

    it("edge control byte + CJK: the CJK branch extracts over the edge-stripped " +
       "text, so it agrees with the typed kernel and the fast path's semantics") {
      // before the fix the CJK branch extracted over RAW text, so the edge
      // \u0001 became a phantom token (3, not 2) while the typed kernel and
      // the oracle replay counted 2 — a latent corpus-wide divergence
      val docs = Seq((1L, "\u0001 foo 日"), (2L, "日本\u0001"),
        (3L, "\u0001 foo")).toDF("doc_id", "text")
      val got = docs.select($"doc_id", Text.tokenCount($"text").as("n"),
          Text.distinctTokenCount($"text").as("d"), Text.topBigramCount($"text").as("b"))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, n, d, b) => id -> ((n, d, b)) }.toMap
      assert(got === Map(1L -> ((2L, 2L, 1L)), 2L -> ((2L, 2L, 1L)), 3L -> ((1L, 1L, 0L))))
      assert(Text.segmentText("\u0001 foo 日").toSeq === Seq("foo", "日"))
      assert(Text.segmentText("日本\u0001").toSeq === Seq("日", "本"))
    }

    it("CJK codepoints segment one-per-token; Latin runs stay whole") {
      // "日本語のテスト" = 3 Han + の + 3 Katakana + ... no spaces at all:
      // a whitespace splitter would call this ONE token
      val got = Seq((1L, "日本語のテスト"), (2L, "abc 日本 def"), (3L, "漢字abc"))
        .toDF("doc_id", "text")
        .select($"doc_id", Text.tokenCount($"text").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 7L, 2L -> 4L, 3L -> 3L))
      // the typed kernel agrees exactly
      assert(Text.segmentText("日本語のテスト").length === 7)
      assert(Text.segmentText("abc 日本 def").toSeq === Seq("abc", "日", "本", "def"))
      assert(Text.segmentText("漢字abc").toSeq === Seq("漢", "字", "abc"))
    }
  }

  describe("Text.imageCaptions") {
    it("pairs src with alt/figcaption in either attribute order; decoys yield nothing") {
      val html =
        """<p>x</p><img src="https://a.example/1.png" alt="An &amp; alt">
          |<img alt="srcless"><img src="https://skip.example/e.png" alt="">
          |<img src="https://skip2.example/n.png">
          |<figure><img alt="inner one" src="https://f.example/2.jpg">
          |<figcaption>Cap <b>hot</b> text</figcaption></figure>
          |<figure><figcaption>orphan</figcaption></figure>""".stripMargin
      val got = Seq((1L, html)).toDF("id", "html")
        .select(explode(Text.imageCaptions($"html")).as("p"))
        .select($"p.src", $"p.caption", $"p.kind")
        .as[(String, String, String)].collect().toSet
      assert(got === Set(
        ("https://a.example/1.png", "An & alt", "alt"),
        // the figure img emits BOTH its alt pair and the figcaption pair
        ("https://f.example/2.jpg", "inner one", "alt"),
        ("https://f.example/2.jpg", "Cap hot text", "figcaption")))
    }

    it("data-src never masquerades as src; a self-closing tag still pairs") {
      val html = """<img data-src="https://lazy.example/x.png" alt="lazy">""" +
        """<img src="https://b.example/s.png" alt="selfclosed"/>"""
      val got = Seq((1L, html)).toDF("id", "html")
        .select(explode(Text.imageCaptions($"html")).as("p"))
        .select($"p.src", $"p.caption").as[(String, String)].collect().toSet
      assert(got === Set(("https://b.example/s.png", "selfclosed")))
    }

    it("a '>' inside a quoted attribute does not clip the tag; <img/src=...> pairs") {
      // quoted runs are opaque in the tag body: the alt carries a literal
      // '>' and must survive whole; the slash-only self-closing form
      // ('<img/src=...>', legal markup) must still yield its src
      val html = """<img src="https://q.example/g.png" alt="a &gt; b or a > b">""" +
        """<img/src="https://s.example/h.png" alt="slashform">"""
      val got = Seq((1L, html)).toDF("id", "html")
        .select(explode(Text.imageCaptions($"html")).as("p"))
        .select($"p.src", $"p.caption").as[(String, String)].collect().toSet
      assert(got === Set(
        ("https://q.example/g.png", "a > b or a > b"),
        ("https://s.example/h.png", "slashform")))
    }
  }

  describe("Text.scrubPii / piiCounts") {
    // same vector the DuckDB parity check uses: all four categories plus a
    // version string that must NOT match the IP/phone shapes
    val s = "mail a.b@x.co.uk and http://h.com/z?a=1 ip 10.0.42.7 call 555-042-0042 v2.13.8 end"

    it("redacts URL, email, IPv4 and phone; counts each over the raw text") {
      val got = Seq(s).toDF("t")
        .select(Text.scrubPii(col("t")).as("clean") +: Text.piiCounts(col("t")): _*)
        .as[(String, Long, Long, Long, Long)].head()
      assert(got === (("mail <EMAIL> and <URL> ip <IP> call <PHONE> v2.13.8 end", 1L, 1L, 1L, 1L)))
    }

    it("URL pass runs before email: a userinfo URL redacts whole but audits as both") {
      val got = Seq("go http://bob@h.io/x now").toDF("t")
        .select(Text.scrubPii(col("t")).as("clean") +: Text.piiCounts(col("t")): _*)
        .as[(String, Long, Long, Long, Long)].head()
      assert(got._1 === "go <URL> now")
      assert((got._2, got._3) === ((1L, 1L))) // n_url, n_email
    }

    it("text without PII passes through unchanged with zero counts") {
      val got = Seq("just words here").toDF("t")
        .select(Text.scrubPii(col("t")).as("clean") +: Text.piiCounts(col("t")): _*)
        .as[(String, Long, Long, Long, Long)].head()
      assert(got === (("just words here", 0L, 0L, 0L, 0L)))
    }

    it("pins the documented recall trade: a bare dotted quad matches the IP shape") {
      val got = Seq("release 1.2.3.4 shipped").toDF("t")
        .select(Text.scrubPii(col("t")).as("clean")).as[String].head()
      assert(got === "release <IP> shipped")
    }
  }

  describe("Sampling.stratifiedSample") {
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "z"),
      (6L, null.asInstanceOf[String])).toDF("id", "lang")

    it("fraction 1.0 keeps a stratum whole; 0.0 drops it; default covers the rest") {
      val got = Sampling.stratifiedSample(rows, "lang", "id",
          Map("a" -> 1.0, "b" -> 0.0), defaultFraction = 1.0)
        .select("id").as[Long].collect().toSet
      assert(got === Set(1L, 2L, 5L, 6L)) // all of a, none of b, default keeps z and NULL
    }

    it("matches the manual md5-prefix hash exactly (the cross-engine contract)") {
      def h(id: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest((id.toString + "strata").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(8), 16)
      }
      val many = (0L until 500L).map(i => (i, if (i % 2 == 0) "x" else "y")).toDF("id", "lang")
      val got = Sampling.stratifiedSample(many, "lang", "id",
          Map("x" -> 0.5, "y" -> 0.2)).select("id").as[Long].collect().toSet
      val want = (0L until 500L).filter { i =>
        val thr = if (i % 2 == 0) (0.5 * 4294967296.0).toLong else (0.2 * 4294967296.0).toLong
        h(i) < thr
      }.toSet
      assert(got === want)
    }

    it("is invariant to partitioning") {
      val many = (0L until 300L).map(i => (i, "s" + (i % 3))).toDF("id", "lang")
      val a = Sampling.stratifiedSample(many, "lang", "id", Map("s0" -> 0.4), 0.3)
        .select("id").as[Long].collect().toSet
      val b = Sampling.stratifiedSample(many.repartition(7), "lang", "id", Map("s0" -> 0.4), 0.3)
        .select("id").as[Long].collect().toSet
      assert(a === b)
    }

    it("rejects fractions outside [0, 1]") {
      intercept[IllegalArgumentException] {
        Sampling.stratifiedSample(rows, "lang", "id", Map("a" -> 1.5))
      }
      intercept[IllegalArgumentException] {
        Sampling.stratifiedSample(rows, "lang", "id", Map.empty, defaultFraction = -0.1)
      }
    }
  }

  describe("Dedup.exactRows") {
    it("keeps the min-id ROW per content group — exact()'s ids with their payloads") {
      val df = Seq((3L, "a", "x"), (1L, "a", "y"), (2L, "b", "z"), (5L, "b", "w"),
        (4L, "c", "v")).toDF("id", "text", "payload")
      val got = Dedup.exactRows(df, "id", col("text"))
        .as[(Long, String, String)].collect().toSet
      assert(got === Set((1L, "a", "y"), (2L, "b", "z"), (4L, "c", "v")))
      val ids = Dedup.exact(df, "id", col("text")).as[Long].collect().toSet
      assert(got.map(_._1) === ids)
    }

    it("NULL ids are unrankable: an all-null-id group emits NO row (not a phantom null row)") {
      val df = Seq(
        (Some(7L), "a"), (None, "a"),   // mixed: the non-null id wins
        (None, "b"), (None, "b")        // all-null group: absent from output
      ).toDF("id", "text")
      val got = Dedup.exactRows(df, "id", col("text"))
        .as[(Option[Long], String)].collect().toSet
      assert(got === Set((Some(7L), "a")))
    }

    it("reserves no column names: frames with dunder columns pass through intact") {
      // the row_number-window predecessor reserved __dedup_rn; the min_by
      // aggregation's intermediates live only in its own agg output, so any
      // input column name round-trips
      val df = Seq((1L, "a", "p"), (2L, "a", "q"), (3L, "b", "r"))
        .toDF("id", "__dedup_rn", "__dedup_row")
      val got = Dedup.exactRows(df, "id", col("__dedup_rn"))
        .as[(Long, String, String)].collect().toSet
      assert(got === Set((1L, "a", "p"), (3L, "b", "r")))
    }
  }

  describe("Dedup.removeFingerprinted") {
    it("drops every byte-identical copy of a banned text, regardless of id") {
      val docs = Seq(
        (1L, "banned words"), (2L, "kept words"),
        (3L, "banned words"),       // copy of a banned text under another id
        (4L, null.asInstanceOf[String]), (5L, "also kept")
      ).toDF("id", "t")
      val banned = Seq((100L, "banned words")).toDF("id", "t")
      val got = Dedup.removeFingerprinted(docs, banned,
          coalesce(col("t"), lit("")), coalesce(col("t"), lit("")))
        .select($"id").as[Long].collect().toSet
      assert(got === Set(2L, 4L, 5L))
    }

    it("a NULL-text ban with coalesce removes null-text rows; without, it removes nothing") {
      val docs = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("id", "t")
      val banned = Seq((9L, null.asInstanceOf[String])).toDF("id", "t")
      val coalesced = Dedup.removeFingerprinted(docs, banned,
        coalesce(col("t"), lit("")), coalesce(col("t"), lit("")))
      assert(coalesced.select($"id").as[Long].collect().toSet === Set(2L))
      // raw NULL keys never match in an anti-join: everything survives
      val raw = Dedup.removeFingerprinted(docs, banned, col("t"), col("t"))
      assert(raw.select($"id").as[Long].collect().toSet === Set(1L, 2L))
    }
  }

  describe("Sampling.rebalanceToBudget") {
    it("derives min(1, budget/count) per stratum and matches the explicit-threshold filter") {
      // 40 'en' docs, 3 'fr', 1 null-lang
      val docs = ((0L until 40L).map(i => (i, "en")) ++
        Seq((100L, "fr"), (101L, "fr"), (102L, "fr"), (103L, null.asInstanceOf[String])))
        .toDF("doc_id", "lang")
      val got = Sampling.rebalanceToBudget(docs, "lang", "doc_id", budget = 10L)
        .as[(Long, String)].collect().toSet
      // fr is under budget: kept whole; null stratum dropped
      assert(got.filter(_._2 == "fr").map(_._1) === Set(100L, 101L, 102L))
      assert(!got.exists(_._2 == null))
      // en must equal the fixed-fraction sampler at fraction 10/40 with the
      // same salt — i.e. the adaptive threshold IS the derived fraction
      val exp = docs.where($"lang" === "en")
        .where(Sampling.hash32($"doc_id", "rebalance") < math.floor(0.25 * 4294967296.0).toLong)
        .as[(Long, String)].collect().toSet
      assert(got.filter(_._2 == "en") === exp)
    }
  }

  describe("Dedup.duplicateShingleStats") {
    it("counts per-doc shingles shared with at least one other document") {
      val docs = Seq(
        (1L, "a b c d"),      // shingles: "a b c", "b c d"
        (2L, "a b c x"),      // shingles: "a b c", "b c x"
        (3L, "q r s"),        // shingle:  "q r s" (unique)
        (4L, "ab")            // too short: absent from output
      ).toDF("doc_id", "text")
      val got = Dedup.duplicateShingleStats(docs, "doc_id", "text", n = 3)
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, d) => id -> ((n, d)) }.toMap
      // "a b c" occurs in docs 1 AND 2 (df=2 -> duplicated); every other
      // shingle is unique; doc 4 has no shingle and is absent
      assert(got === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((1L, 0L))))
    }
  }

  describe("Dedup.noveltyProfile") {
    it("counts shingles whose global FIRST occurrence (min id) is this doc") {
      val docs = Seq(
        (1L, "a b c d"),      // introduces "a b c", "b c d"
        (2L, "a b c x"),      // "a b c" first seen in doc 1; introduces "b c x"
        (3L, "b c d y"),      // both shingles first seen elsewhere? "b c d"@1, introduces "c d y"
        (4L, "ab")            // too short: absent
      ).toDF("doc_id", "text")
      val got = Dedup.noveltyProfile(docs, "doc_id", "text", n = 3)
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, nov) => id -> ((n, nov)) }.toMap
      assert(got === Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L)), 3L -> ((2L, 1L))))
    }
  }

  describe("Dedup.boundaryOverlapPairs") {
    it("pairs docs whose last k tokens equal another doc's first k tokens") {
      val docs = Seq(
        (1L, "a b c d e"),      // tail-3 = "c d e"
        (2L, "c d e f g"),      // head-3 = "c d e" -> (1, 2); tail-3 = "e f g"
        (3L, "e f g h"),        // head-3 = "e f g" -> (2, 3)
        (4L, "x y"),            // too short: no boundary
        (5L, "p q r")           // exactly k: head == tail, no partner
      ).toDF("doc_id", "text")
      val got = Dedup.boundaryOverlapPairs(docs, "doc_id", "text", k = 3)
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L), (2L, 3L)))
    }

    it("a doc whose head equals its OWN tail never self-pairs, but pairs with an identical-boundary doc") {
      val docs = Seq(
        (1L, "s s s"),          // head == tail == "s s s"
        (2L, "s s s")           // same boundary: both directions pair
      ).toDF("doc_id", "text")
      val got = Dedup.boundaryOverlapPairs(docs, "doc_id", "text", k = 3)
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L), (2L, 1L)))
    }

    it("a boilerplate footer shared by thousands of docs is capped, not expanded quadratically") {
      // 10k crawl pages all END with the same 3-token footer ("copyright
      // acme corp") and 10k pages all START with it: the uncapped join
      // would expand 10k x 10k = 10^8 pair rows for that ONE hash in one
      // task. The df cap drops the hash whole; the genuine continuation
      // pair with its own distinct boundary survives, and the drop is
      // observable on the monitoring accumulator.
      val footers = (0L until 10000L).map(i => (i, s"page body $i copyright acme corp"))
      val headers = (10000L until 20000L).map(i => (i, s"copyright acme corp navigation $i"))
      val genuine = Seq(
        (30001L, "alpha beta gamma delta epsilon"),  // tail-3 = "gamma delta epsilon"
        (30002L, "gamma delta epsilon zeta eta"))    // head-3 matches -> (30001, 30002)
      val corpus = (footers ++ headers ++ genuine).toDF("doc_id", "text")
      val dropped0 = Dedup.droppedHotBuckets(spark).value
      val got = Dedup.boundaryOverlapPairs(corpus, "doc_id", "text", k = 3, maxDf = 64)
        .as[(Long, Long)].collect().toSet
      assert(got === Set((30001L, 30002L)))
      assert(Dedup.droppedHotBuckets(spark).value > dropped0)
    }

    it("the df cap is a parameter: raising it re-admits the boilerplate hash") {
      val docs = Seq(
        (1L, "x y shared tail here"),   // tail-3 = "shared tail here"
        (2L, "p q shared tail here"),   // same tail
        (3L, "shared tail here m n"),   // head-3 matches both tails
        (4L, "shared tail here r s"))   // head-3 matches both tails
        .toDF("doc_id", "text")
      // cap 1: both sides have df 2 -> hash dropped, nothing emitted
      val capped = Dedup.boundaryOverlapPairs(docs, "doc_id", "text", k = 3, maxDf = 1)
        .as[(Long, Long)].collect().toSet
      assert(capped === Set.empty[(Long, Long)])
      // cap 2 admits the hash: all 2x2 tail-head pairs emitted
      val open = Dedup.boundaryOverlapPairs(docs, "doc_id", "text", k = 3, maxDf = 2)
        .as[(Long, Long)].collect().toSet
      assert(open === Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    }
  }

  describe("Dedup repeated spans (cross-document exact-substring dedup)") {
    val docs = Seq(
      (1L, "a b c d e f g h"),        // shares "a b c d e" with doc 2
      (2L, "x a b c d e y z"),
      (3L, "p q r s t"),              // unique single window
      (4L, "g1 g2 g3 g4 g5 g6 m n"),  // shares TWO OVERLAPPING windows w/ doc 5
      (5L, "q g1 g2 g3 g4 g5 g6 w"),
      (6L, "k l m2 n2 o k l m2 n2 o"),// repeats WITHIN one doc only
      (7L, "too short"),              // < w tokens: no window
      (8L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")

    it("profiles repeated starts and the union of covered tokens; within-doc repeats don't count") {
      val got = Dedup.repeatedSpanProfile(docs, "doc_id", "text", w = 5)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, nw, nr, ct) => id -> ((nw, nr, ct)) }.toMap
      assert(got === Map(
        1L -> ((4L, 1L, 5L)), 2L -> ((4L, 1L, 5L)),
        3L -> ((1L, 0L, 0L)),
        // overlapping shared windows (starts 0,1 / 1,2): union = 6, not 10
        4L -> ((4L, 2L, 6L)), 5L -> ((4L, 2L, 6L)),
        // "k l m2 n2 o" occurs twice but only inside doc 6: not repeated
        6L -> ((6L, 0L, 0L))))
    }

    it("cutRepeatedSpans removes exactly the covered tokens; short/unique docs pass through") {
      val got = Dedup.cutRepeatedSpans(docs, "doc_id", "text", w = 5)
        .as[(Long, String)].collect().toMap
      assert(got === Map(
        1L -> "f g h", 2L -> "x y z",
        3L -> "p q r s t",
        4L -> "m n", 5L -> "q w",
        6L -> "k l m2 n2 o k l m2 n2 o",
        7L -> "too short")) // null-text doc 8 is dropped
      intercept[IllegalArgumentException](Dedup.cutRepeatedSpans(docs, "doc_id", "text", 0))
    }
  }

  describe("Sampling.splitByGroup") {
    it("assigns the split per GROUP: cluster members never straddle the boundary") {
      // two clusters + a singleton, components as q80 derives them
      val rows = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (99L, 99L))
        .toDF("vec_id", "component")
      val got = Sampling.splitByGroup(rows, "component", 0.5)
        .as[(Long, Long, Boolean)].collect()
      val byComp = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
      assert(byComp.values.forall(_.size == 1), s"a cluster straddled the split: $got")
      // and the flag is exactly the salted-hash threshold of the component
      val expect = rows.select($"component",
          (Sampling.hash32($"component", "groupsplit") <
            math.floor(0.5 * 4294967296.0).toLong).as("e"))
        .as[(Long, Boolean)].collect().toMap
      assert(got.forall { case (_, c, h) => expect(c) == h })
    }

    it("q80: every near-dup pair lands on one side; components match the planted ground truth") {
      val dir = "/root/testdata/sf0.001"
      val rows = graft.SparkEntry.queries("q80_leakage_safe_split")(spark, dir)
        .as[(Long, Long, Boolean)].collect()
      val byId = rows.map(r => r._1 -> r).toMap
      // ground truth: the LSH chain's verified edges are exactly the planted
      // exact-duplicate pairs {v, v+1000000} for v < 50 — each must form the
      // component v and share ONE split flag (the leakage guarantee); all
      // other vectors are singletons under their own id
      val planted = rows.collect { case (id, _, _) if id >= 1000000L => id - 1000000L }
      assert(planted.nonEmpty)
      planted.foreach { v =>
        val (_, compA, holdA) = byId(v)
        val (_, compB, holdB) = byId(v + 1000000L)
        assert(compA === v && compB === v, s"pair {$v, ${v + 1000000L}} not in component $v")
        assert(holdA === holdB, s"near-dup pair {$v, ${v + 1000000L}} straddles train/holdout")
      }
      rows.foreach { case (id, comp, _) =>
        if (id < 1000000L && !planted.contains(id))
          assert(comp === id, s"unplanted vector $id must be its own component, got $comp")
      }
    }
  }

  describe("Snapshot.diff") {
    it("classifies added / removed / changed / unchanged by content") {
      val old = Seq((1L, "same"), (2L, "was this"), (3L, "gone")).toDF("id", "t")
      val neu = Seq((1L, "same"), (2L, "now this"), (4L, "fresh")).toDF("id", "t")
      val got = Snapshot.diff(old, neu, "id", "t").as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    }

    it("a present row with NULL content is never an add/remove; NULL vs NULL is changed") {
      val old = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("id", "t")
      val neu = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("id", "t")
      val got = Snapshot.diff(old, neu, "id", "t").as[(Long, String)].collect().toMap
      // md5(NULL) compares as null => not equal => 'changed' (documented;
      // callers wanting NULL==empty coalesce first)
      assert(got === Map(1L -> "changed", 2L -> "unchanged"))
    }

    it("changedSlice returns only the added/changed ids, over any hashable column type") {
      val old = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)), (3L, Array(5.0f, 6.0f)))
        .toDF("id", "v")
      val neu = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(9.0f, 4.0f)), (4L, Array(7.0f, 8.0f)))
        .toDF("id", "v")
      val got = Snapshot.changedSlice(old, neu, "id", "v").as[(Long, String)].collect().toMap
      // 1 unchanged and 3 removed are NOT work; 2 changed and 4 added are
      assert(got === Map(2L -> "changed", 4L -> "added"))
    }

    it("changedSlice treats NULL content as equal to NULL (not re-touched)") {
      val old = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("id", "t")
      val neu = Seq((1L, null.asInstanceOf[String]), (2L, "y")).toDF("id", "t")
      val got = Snapshot.changedSlice(old, neu, "id", "t").as[(Long, String)].collect().toMap
      assert(got === Map(2L -> "changed"))
    }

    it("delta emits added/changed/removed from one pass, with hash-of-null semantics") {
      val old = Seq((1L, "same"), (2L, "before"), (3L, "gone"),
        (5L, null.asInstanceOf[String])).toDF("id", "t")
      val neu = Seq((1L, "same"), (2L, "after"), (4L, "fresh"),
        (5L, null.asInstanceOf[String])).toDF("id", "t")
      val got = Snapshot.delta(old, neu, "id", "t").as[(Long, String)].collect().toMap
      // 1 unchanged and the NULL-stable 5 emit nothing (not re-shipped)
      assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    }
  }

  describe("Similarity.vectorSumsByKey") {
    it("sums each dimension exactly in micro-units per key") {
      val df = Seq(
        (1, Array(0.5f, -1.25f)),
        (1, Array(0.25f, 0.75f)),
        (2, Array(2.0f, 0.0f))
      ).toDF("label", "vec")
      val got = Similarity.vectorSumsByKey(df, "label", "vec")
        .as[(Int, Int, Long, Long)].collect().toSet
      assert(got === Set(
        (1, 0, 750000L, 2L), (1, 1, -500000L, 2L),
        (2, 0, 2000000L, 1L), (2, 1, 0L, 1L)))
    }
  }

  describe("Similarity.vectorMomentsByKey") {
    it("sums and squared-sums each dimension exactly in micro-units, negatives included") {
      val df = Seq(
        (1, Array(0.5f, -1.25f)),
        (1, Array(0.25f, 0.75f)),
        (2, Array(2.0f, 0.0f))
      ).toDF("label", "vec")
      val got = Similarity.vectorMomentsByKey(df, "label", "vec")
        .as[(Int, Int, Long, Long, Long)].collect().toSet
      // dim0 key1: 500000^2 + 250000^2 = 3.125e11; dim1 key1 (negative lane):
      // (-1250000)^2 + 750000^2 = 2.125e12
      assert(got === Set(
        (1, 0, 750000L, 312500000000L, 2L),
        (1, 1, -500000L, 2125000000000L, 2L),
        (2, 0, 2000000L, 4000000000000L, 1L),
        (2, 1, 0L, 0L, 1L)))
    }
  }

  describe("quantile sketch gate (q71)") {
    it("the sketch's rank-error contract holds on sf0.001 (gate all-true)") {
      val rows = graft.SparkEntry
        .queries("q71_quantile_sketch")(spark, "/root/testdata/sf0.001").collect()
      assert(rows.length === 3)
      assert(rows.forall(_.getAs[Boolean]("within_rank_bound")), rows.mkString("\n"))
    }
  }

  describe("Contamination.spanAttribution (verbatim-run memorization audit)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    it("a verbatim excerpt certifies a run of (span - w + 1) aligned windows") {
      val train = Seq((10L, "a b c d e f g h i j")).toDF("doc_id", "text")
      val eval = Seq((1L, "c d e f g")).toDF("doc_id", "text")
      // 5-token excerpt, w=3 -> 3 aligned windows on one diagonal, span 5
      assert(rows(Contamination.spanAttribution(train, eval, "doc_id", "text", w = 3))
        === Set((10L, 1L, 3L, 3L, 5L)))
    }

    it("a gap splits the run: max_run counts the LONGEST island, n_shared all of them") {
      val train = Seq((10L, "a b c d e f g h i j")).toDF("doc_id", "text")
      // "a b c d" then junk then "f g h": unique junk tokens guarantee only
      // the intended windows match
      val eval = Seq((1L, "a b c d q1 q2 f g h")).toDF("doc_id", "text")
      // w=3: eval windows (a b c)@0 (b c d)@1 match diag 0; (f g h)@6 matches
      // train pos 5 -> diag -1. Two islands: run 2 and run 1.
      assert(rows(Contamination.spanAttribution(train, eval, "doc_id", "text", w = 3))
        === Set((10L, 1L, 3L, 2L, 4L)))
    }

    it("minRun drops isolated-window pairs; disjoint docs emit nothing") {
      val train = Seq((10L, "a b c d e f")).toDF("doc_id", "text")
      val eval = Seq((1L, "x y a b c z"), (2L, "p q r s t")).toDF("doc_id", "text")
      val all = Contamination.spanAttribution(train, eval, "doc_id", "text", w = 3)
      assert(rows(all) === Set((10L, 1L, 1L, 1L, 3L)))
      assert(Contamination.spanAttribution(train, eval, "doc_id", "text", w = 3, minRun = 2)
        .count() === 0L)
    }

    it("maxDf drops boilerplate windows shared by too many train docs") {
      // "a b c" lives in BOTH train docs (df 2) -> capped out at maxDf = 1;
      // the doc-20-only window "x y z" (df 1) survives
      val train = Seq((10L, "a b c d"), (11L, "a b c e"), (20L, "x y z")).toDF("doc_id", "text")
      val eval = Seq((1L, "a b c x y z")).toDF("doc_id", "text")
      val capped = Contamination.spanAttribution(train, eval, "doc_id", "text",
        w = 3, maxDf = 1)
      assert(rows(capped) === Set((20L, 1L, 1L, 1L, 3L)))
      // uncapped, the boilerplate window attributes to both its holders
      val open = Contamination.spanAttribution(train, eval, "doc_id", "text", w = 3)
      assert(rows(open) === Set((10L, 1L, 1L, 1L, 3L), (11L, 1L, 1L, 1L, 3L),
        (20L, 1L, 1L, 1L, 3L)))
    }

    it("a substring repeated inside the train doc attributes on EVERY diagonal") {
      val train = Seq((10L, "a b c k1 k2 a b c")).toDF("doc_id", "text")
      val eval = Seq((1L, "a b c")).toDF("doc_id", "text")
      // the one eval window matches train pos 0 and pos 5: two diagonals,
      // each an island of 1 -> n_shared 2, max_run 1
      assert(rows(Contamination.spanAttribution(train, eval, "doc_id", "text", w = 3))
        === Set((10L, 1L, 2L, 1L, 3L)))
    }
  }

  describe("Text.charEntropyColumns (fixed-point character entropy)") {
    def profile(texts: (Long, String)*): Map[Long, (Long, Long, Long)] = {
      import spark.implicits._
      texts.toSeq.toDF("id", "text")
        .select((col("id") +: graft.functions.Text.charEntropyColumns(col("text"))): _*)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    }

    it("golden values: zero for repeated chars, exact 1 bit for a 2-symbol balance") {
      val got = profile((1L, "aaaa"), (2L, "aabb"), (3L, "A b!"), (4L, ""), (5L, null))
      // repeated char: ilog(n) - ilog(n) = 0
      assert(got(1L) == ((4L, 1L, 0L)))
      // 2+2 over 4: (2*(2048-1024) + 2*(2048-1024)) / 4 = 1024 = exactly 1 bit
      assert(got(2L) == ((4L, 2L, 1024L)))
      // class filter lowercases and drops space/punct: 'a','b' -> 1 bit
      assert(got(3L) == ((2L, 2L, 1024L)))
      // empty and null score (0, 0, 0), never divide by zero
      assert(got(4L) == ((0L, 0L, 0L)) && got(5L) == ((0L, 0L, 0L)))
    }

    it("separates the curation extremes: spam at 0, text and hex in their bands") {
      val natural = "the cat sat on the mat and then that cat sat there again and again"
      val hexBlob = (1 to 4).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"seed$i".getBytes("UTF-8")).map(b => f"$b%02x").mkString).mkString
      val got = profile((1L, "aaaaaaaaaaaaaaaaaaaa"), (2L, natural), (3L, hexBlob))
      assert(got(1L)._3 == 0L, s"spam must score exactly 0: $got")
      // repeated-word English sits well below the uniform-hex band
      assert(got(2L)._3 > 1024L && got(2L)._3 < got(3L)._3,
        s"entropy bands violated: $got")
      // a near-uniform 16-symbol blob approaches but never exceeds 4 bits
      assert(got(3L)._3 > 3500L && got(3L)._3 <= 4096L, s"hex band violated: $got")
    }
  }

  describe("Text.extractMainContent (block-level boilerplate removal)") {
    def main(html: String): String = {
      import spark.implicits._
      Seq(html).toDF("h")
        .select(graft.functions.Text.extractMainContent(col("h"))).collect().head.getString(0)
    }
    val body = "This paragraph carries the actual article content of the page."

    it("drops all-link nav/ad blocks by link density, short footers by length, keeps the article") {
      val page = "<html><head><title>t</title></head><body>" +
        "<nav><a href=\"/a\">navlink one here</a> <a href=\"/b\">navlink two here</a></nav>" +
        "<div><a href=\"https://ads.example\">ad copy buy now cheap widgets</a></div>" +
        s"<p>$body</p><div>short footer</div></body></html>"
      val got = main(page)
      assert(got == body, s"got [$got]")
      // ... while stripHtml keeps every one of those block texts
      import spark.implicits._
      val strip = Seq(page).toDF("h")
        .select(graft.functions.Text.stripHtml(col("h"))).collect().head.getString(0)
      assert(strip.contains("navlink one") && strip.contains("ad copy") &&
        strip.contains("short footer"))
    }

    it("tolerates a minority link INSIDE an article block (density <= 1/3)") {
      val got = main(s"<body><p>$body Related: <a href=\"/x\">see also</a></p></body>")
      assert(got == s"$body Related: see also", s"got [$got]")
      // an all-link block of the same length still dies
      val linky = "<body><p><a href=\"/x\">" + body + "</a></p></body>"
      assert(main(linky) == "", s"got [${main(linky)}]")
    }

    it("kills script/style content, decodes entities, joins kept blocks in order with newlines") {
      val got = main("<body><script>var x = 'not content at all';</script>" +
        s"<p>first block long enough: $body</p>" +
        s"<p>second &amp; final block, 5 &lt; 7, also long enough.</p></body>")
      assert(got == s"first block long enough: $body\n" +
        "second & final block, 5 < 7, also long enough.", s"got [$got]")
    }

    it("degrades to empty on pages with no qualifying block, never errors") {
      assert(main("<body><p>too short</p></body>") == "")
      assert(main("") == "")
      assert(main("plain text with no markup at all but quite long indeed") ==
        "plain text with no markup at all but quite long indeed")
    }
  }

  describe("Text.stripHtml (crawl markup extraction)") {
    def strip(html: String): String = {
      import spark.implicits._
      Seq(html).toDF("h")
        .select(graft.functions.Text.stripHtml(col("h"))).collect().head.getString(0)
    }

    it("kills script/style/comment CONTENT, collapses tags, decodes entities in order") {
      val got = strip("<html><script>if (a < b) alert('x');</script>" +
        "<style>h1 { font: 10px; }</style><!-- note --><p>Hello <b>big</b> world</p></html>")
      assert(got.trim == "Hello big world", s"got [$got]")
      // case-insensitive, attribute-carrying, multiline blocks die too
      val multi = strip("<SCRIPT type=\"a\">\nline1\nline2\n</SCRIPT>ok")
      assert(multi.trim == "ok", s"got [$multi]")
    }

    it("decodes &amp; LAST: &amp;lt; yields literal '&lt;', never a second-round '<'") {
      assert(strip("a &amp;lt; b").trim == "a &lt; b")
      assert(strip("5 &lt; 7 &amp;&amp; 9 &gt; 3").trim == "5 < 7 && 9 > 3")
      assert(strip("&quot;q&#39;s&quot;&nbsp;end").trim == "\"q's\" end")
    }

    it("squeezes whitespace and degrades on malformed markup without error") {
      assert(strip("a\t\n  b<br><br>c").trim == "a b c")
      // unclosed tag swallows to the next '>', leftover text survives
      assert(strip("x <unclosed y").trim == "x <unclosed y")
    }

    it("sentences: terminator runs close, unterminated tails count, empties drop") {
      import spark.implicits._
      def seg(s: String): Seq[String] = Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.Text.sentences($"t")).as[Seq[String]].head()
      assert(seg("One here. Two there! Three? tail no dot") ==
        Seq("One here.", "Two there!", "Three?", "tail no dot"))
      assert(seg("Ellipsis... still one run. Next") ==
        Seq("Ellipsis...", "still one run.", "Next"))
      assert(seg("a.   ") == Seq("a.")) // trailing whitespace-only match drops
      assert(seg("") == Seq.empty)
    }

    it("NFC unifies combining marks; NFKC additionally folds compatibility forms") {
      import spark.implicits._
      def nfc(s: String) = graft.functions.Text
        .nfcNormalized(Seq((1L, s)).toDF("id", "t"), "id", "t")
        .select("t").as[String].head()
      def nfkc(s: String) = graft.functions.Text
        .nfkcNormalized(Seq((1L, s)).toDF("id", "t"), "id", "t")
        .select("t").as[String].head()
      val precomposed = "café"
      val combining = "café"
      assert(precomposed != combining) // byte-distinct inputs
      assert(nfc(precomposed) == nfc(combining)) // NFC collapses them
      val fullWidth = "ＡＢＣ １２" // ＡＢＣ １２
      assert(nfc(fullWidth) == fullWidth) // NFC does NOT fold compatibility
      assert(nfkc(fullWidth) == "ABC 12") // NFKC does
      assert(nfkc("ﬁle") == "file") // the fi ligature
      // idempotence and null passthrough
      assert(nfc(nfc(combining)) == nfc(combining))
      val n = graft.functions.Text
        .nfcNormalized(Seq((1L, null.asInstanceOf[String])).toDF("id", "t"), "id", "t")
        .select("t").as[String].head()
      assert(n == null)
    }

    it("extractLinks keeps anchor hrefs in order and nothing else") {
      import spark.implicits._
      val html = "<a href=\"https://a.example/1\">x</a>" +
        "<link href=\"https://css.example\">" + // not an anchor
        "<A REL=\"next\" HREF=\"https://b.example/2\">y</A>" + // case-insensitive
        "<a name=\"no-href\">z</a>" + // hrefless anchor
        "<a href=\"/relative\">r</a>" // relative: extracted, host-less
      val got = Seq(html).toDF("h")
        .select(graft.functions.Text.extractLinks(col("h"))).collect()
        .head.getSeq[String](0)
      assert(got == Seq("https://a.example/1", "https://b.example/2", "/relative"))
    }
  }

  describe("Dedup.lineDedup") {
    def run(rows: Seq[(Long, String)], minDf: Int): Map[Long, (String, Long, Long, Long)] =
      Dedup.lineDedup(rows.toDF("doc_id", "text"), "doc_id", "text", minDf)
        .as[(Long, String, Long, Long, Long)].collect()
        .map { case (id, t, nl, nk, nr) => id -> ((t, nl, nk, nr)) }.toMap

    it("cuts lines at df >= minDf corpus-wide, preserving the survivors' order") {
      val docs = Seq(
        (1L, "FOOTER\nkeep one\nFOOTER\nkeep two"),
        (2L, "FOOTER\nother"),
        (3L, "FOOTER"))
      val got = run(docs, 2)
      assert(got(1L) == (("keep one\nkeep two", 4L, 2L, 2L)))
      assert(got(2L) == (("other", 2L, 1L, 1L)))
    }

    it("keeps a doc whose every line is boilerplate, at kept_text = ''") {
      val got = run(Seq((1L, "FOOTER\nx"), (2L, "FOOTER"), (3L, "FOOTER")), 2)
      assert(got(3L) == (("", 1L, 0L, 1L)))
    }

    it("df counts DISTINCT docs: a line repeated inside ONE doc is not boilerplate") {
      val got = run(Seq((1L, "same\nsame\nsame"), (2L, "unrelated")), 2)
      assert(got(1L) == (("same\nsame\nsame", 3L, 3L, 0L)))
    }

    it("threshold boundary: df == minDf dies, df == minDf - 1 survives") {
      val docs = Seq((1L, "at3\nat2"), (2L, "at3\nat2"), (3L, "at3\nsolo"))
      val got = run(docs, 3)
      assert(got(1L) == (("at2", 2L, 1L, 1L)))
      assert(got(3L) == (("solo", 2L, 1L, 1L)))
    }

    it("empty text is one empty line, subject to the same df rule") {
      val got = run(Seq((1L, ""), (2L, ""), (3L, "a\n\nb")), 2)
      // '' appears in docs 1, 2, 3 (doc 3's middle line) -> df 3 -> cut
      assert(got(1L) == (("", 1L, 0L, 1L)))
      assert(got(3L) == (("a\nb", 3L, 2L, 1L)))
    }

    it("rejects minDf < 2 loudly") {
      assertThrows[IllegalArgumentException](
        Dedup.lineDedup(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", 1))
    }

    it("keeps a NULL-text doc visible (folded to one empty line), never a silent vanish") {
      val docs = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b")).toDF("doc_id", "text")
      val got = Dedup.lineDedup(docs, "doc_id", "text", 2)
        .as[(Long, String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(got(2L) == (("", 1L, 1L, 0L))) // its one empty line has df 1 -> kept
    }
  }
}
