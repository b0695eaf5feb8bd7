package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.Text
import graft.multimodal.Media
import graft.sorted.syntax._

class ExtensionsSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  describe("Text functions") {
    it("tokenCount counts whitespace tokens, 0 for blank") {
      val df = Seq((1L, "a b  c"), (2L, "   "), (3L, "single")).toDF("id", "t")
      val got = df.select($"id", Text.tokenCount($"t").as("n")).as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
    }

    it("substrCount counts non-overlapping literal occurrences") {
      val df = Seq((1L, " the cat the dog ")).toDF("id", "t")
      val got = df.select(Text.substrCount($"t", " the ").as("n")).as[Long].head()
      assert(got === 2L) // same as SQL replace-count arithmetic
    }

    it("langGuess scores char trigrams and picks the argmax with fixed precedence") {
      val df = Seq(
        (1L, "The cat sat on the mat and the dog"), // case-insensitive
        (2L, "der hund und der mann nicht schlecht"),
        (3L, "les chiens dorment une entente des couleurs"),
        (4L, "los perros duermen en la casa por adelantado"),
        (5L, "xyzzy plugh"), // no trigram fires -> und
        (6L, null.asInstanceOf[String])).toDF("id", "t")
      val got = df.select($"id", Text.langGuess($"t").as("g")).as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
        5L -> "und", 6L -> "und"))
    }

    it("langGuess SQL generators replay the kernel table verbatim") {
      // one trigram from each language's table must appear with its length
      assert(Text.langScoreSqlColumns.contains("replace(pt, 'the', '')"))
      assert(Text.langScoreSqlColumns.contains("replace(pt, ' le', '')"))
      assert(Text.langScoreSqlColumns.contains("// 3 AS c_es"))
      assert(Text.langGuessSqlCase.contains("ELSE 'und' END"))
      Text.langTrigrams.foreach { case (lang, tris) =>
        assert(Text.langGuessSqlCase.contains(s"THEN '$lang'"))
        tris.foreach(t => assert(Text.langScoreSqlColumns.contains(s"'$t'")))
      }
    }

    it("bpeTokenCount splits alpha/digit/punct runs") {
      val df = Seq((1L, "ab cd3,4"), (2L, ""), (3L, "hello, world!")).toDF("id", "t")
      val got = df.select($"id", Text.bpeTokenCount($"t").as("n")).as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 5L, 2L -> 0L, 3L -> 4L)) // ab|cd|3|,|4 ; - ; hello|,|world|!
    }

    it("fingerprint is a stable md5 hex") {
      val got = Seq((1L, "abc")).toDF("id", "t")
        .select(Text.fingerprint($"t")).as[String].head()
      assert(got === "900150983cd24fb0d6963f7d28e17f72")
    }

    it("tokenRollingHash is deterministic and order-sensitive") {
      val df = Seq((1L, "a b c"), (2L, "c b a")).toDF("id", "t")
      val got = df.select($"id", Text.tokenRollingHash($"t").as("h")).as[(Long, Long)].collect().toMap
      assert(got(1L) !== got(2L))
      val again = df.select($"id", Text.tokenRollingHash($"t").as("h")).as[(Long, Long)].collect().toMap
      assert(got === again)
    }
  }

  describe("Dedup") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every single day"),
      (2L, "the quick brown fox jumps over the lazy dog every single day"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog every single night"), // near dup of 1
      (4L, "completely different words about spark and large scale engines here"),
      (5L, "tiny")).toDF("doc_id", "text")

    it("exact dedup keeps min id per identical text") {
      val got = Dedup.exact(docs, "doc_id", col("text")).as[Long].collect().toSet
      assert(got === Set(1L, 3L, 4L, 5L))
    }

    it("shingles builds distinct word n-grams; short docs yield none") {
      val got = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      assert(got(1L).contains("the quick brown"))
      assert(got(5L).isEmpty)
      assert(got(1L).size === 10)
    }

    it("minhashNearDups finds exact and near dup pairs, not unrelated docs") {
      val got = Dedup.minhashNearDups(docs, "doc_id", "text", shingleN = 3,
          numHashes = 16, bands = 8, threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 2L)))
      assert(got.exists(p => p == (1L, 3L) || p == (2L, 3L))) // near-dup caught
      assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    }

    it("containmentVerify catches a subset doc that Jaccard misses, and scores it exactly") {
      // doc 11 is the first third of doc 10: containment ~1, Jaccard ~1/3
      val big = (1 to 30).map(i => s"w$i").mkString(" ")
      val small = (1 to 12).map(i => s"w$i").mkString(" ")
      val corpus = Seq((10L, big), (11L, small), (12L, "unrelated text entirely apart from this")).toDF("doc_id", "text")
      val cands = Seq((10L, 11L), (10L, 12L)).toDF("id_a", "id_b")
      val got = Dedup.containmentVerify(cands, corpus, "doc_id", "text", 3, 0.9)
        .as[(Long, Long, Long, Long, Long)].collect()
      // doc 10 has 28 shingles, doc 11 has 10, all 10 shared
      assert(got.toSeq === Seq((10L, 11L, 10L, 28L, 10L)))
      // the same pair fails symmetric Jaccard at the same bar
      val jac = Dedup.jaccardVerify(cands, corpus, "doc_id", "text", 3, 0.9)
      assert(jac.isEmpty)
      intercept[IllegalArgumentException](
        Dedup.containmentVerify(cands, corpus, "doc_id", "text", 3, 0.0))
    }

    it("simhash: identical texts hash identically, dissimilar texts differ") {
      val sh = Dedup.simhash(docs, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(sh(1L) === sh(2L))
      assert(sh(1L) !== sh(4L))
    }

    it("simhashNearDups respects the Hamming bound") {
      val got = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 2L))) // distance 0
      assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    }

    it("a pathologically hot bucket (10k identical signatures) is dropped, not expanded") {
      // 10^4 identical docs share every band bucket; quadratic expansion
      // would be ~5*10^7 pairs in ONE task. The cap drops the bucket whole:
      // the pipeline completes quickly and emits nothing for the hot cluster,
      // while unrelated small clusters are unaffected.
      val hot = (0L until 10000L).map(i => (i, "all these documents carry exactly the same words"))
      val cool = Seq(
        (20001L, "an unrelated pair of documents with its own shared phrasing here"),
        (20002L, "an unrelated pair of documents with its own shared phrasing here"))
      val corpus = (hot ++ cool).toDF("doc_id", "text")
      val dropped0 = Dedup.droppedHotBuckets(spark).value
      val mh = Dedup.minhashNearDups(corpus, "doc_id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(mh === Set((20001L, 20002L))) // hot cluster dropped, cool pair intact
      val sh = Dedup.simhashNearDups(corpus, "doc_id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(sh === Set((20001L, 20002L)))
      // the monitoring accumulator observed the drops (dashboards read this
      // instead of grepping executor logs)
      assert(Dedup.droppedHotBuckets(spark).value > dropped0)
    }

    it("dropped hot buckets surface as a per-query observed metric (Dataset.observe)") {
      // hot cluster (dropped, counted) + a cool pair (kept): the pipeline
      // output must be NON-empty — AQE's empty-relation propagation replaces
      // an all-empty subtree with a LocalTableScan, discarding the
      // CollectMetrics node and its metric (documented on observeDrops)
      val corpus = ((0L until 200L)
        .map(i => (i, "identical words shared by every single document here")) ++ Seq(
          (20001L, "an unrelated pair of documents with its own shared phrasing here"),
          (20002L, "an unrelated pair of documents with its own shared phrasing here")))
        .toDF("doc_id", "text")
      @volatile var seen = Option.empty[Long]
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(Dedup.HotBucketMetricPrefix)) {
              val v = row.getAs[Long]("dropped_hot_buckets")
              if (v > 0) seen = Some(v)
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        Dedup.minhashNearDups(corpus, "doc_id", "text", maxBucket = 50).collect()
        // listener delivery is async on the listener bus — poll briefly
        val deadline = System.currentTimeMillis() + 20000
        while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
        // every band's bucket holds all 200 identical docs: 4 dropped buckets
        assert(seen.exists(_ > 0), "expected an observed dropped_hot_buckets metric > 0")
      } finally spark.listenerManager.unregister(listener)
    }

    it("the bucket cap is a parameter: raising it re-admits the cluster") {
      val cluster = (0L until 20L).map(i => (i, "five identical words repeated across this tiny cluster"))
      val corpus = cluster.toDF("doc_id", "text")
      val capped = Dedup.minhashNearDups(corpus, "doc_id", "text", maxBucket = 10).count()
      assert(capped === 0L) // 20 members > cap 10: dropped
      val admitted = Dedup.minhashNearDups(corpus, "doc_id", "text", maxBucket = 100).count()
      assert(admitted === 20L * 19 / 2) // all pairs verify at Jaccard 1.0
    }

    // local union-find ground truth for the connected-components tests
    def localComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }

    def ccOf(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] =
      Dedup.connectedComponents(edges.toDF("id_a", "id_b"), maxIter)
        .as[(Long, Long)].collect().toMap

    it("connectedComponents labels every node with its component minimum") {
      // two cliques bridged by one edge + an isolated pair + a triangle
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
        (3L, 10L), (50L, 51L), (70L, 71L), (71L, 72L), (70L, 72L))
      assert(ccOf(edges) === localComponents(edges))
    }

    it("connectedComponents converges on a long chain (multi-round star collapse)") {
      // a 60-node path has diameter 59 — naive min-propagation would need ~59
      // rounds; large-star/small-star must collapse it within the default 20
      val chain = (0L until 59L).map(i => (i, i + 1))
      val got = ccOf(chain)
      assert(got === (0L to 59L).map(_ -> 0L).toMap)
    }

    it("connectedComponents matches union-find on seeded random graphs") {
      val rnd = new scala.util.Random(7)
      for (_ <- 1 to 3) {
        val n = 80
        val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
          .filter { case (a, b) => a != b }
        assert(ccOf(edges) === localComponents(edges))
      }
    }

    it("connectedComponents ignores self-loops and handles an empty edge set") {
      assert(ccOf(Seq((5L, 5L))) === Map.empty[Long, Long])
      assert(ccOf(Seq.empty[(Long, Long)]) === Map.empty[Long, Long])
    }

    it("editDistanceVerify computes banded distances on candidates, dropping pairs above maxDist") {
      val corpus = Seq(
        (1L, "the quick brown fox"),
        (2L, "the quick brown fx"),          // one deletion from doc 1
        (3L, "completely different words"),
        (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
      val got = Dedup.editDistanceVerify(cands, corpus, "doc_id", "text", 5)
        .as[(Long, Long, Int)].collect().toSet
      // (1,3) is far above 5; (1,4) has a NULL side -> NULL distance, dropped
      assert(got === Set((1L, 2L, 1)))
      intercept[IllegalArgumentException](
        Dedup.editDistanceVerify(cands, corpus, "doc_id", "text", -1))
    }

    it("bestOfCluster keeps the highest-score member, ties to the smallest id") {
      val members = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
        .toDF("id", "component")
      val scores = Seq((1L, 10L), (2L, 30L), (3L, 30L), (7L, 5L), (9L, 2L), (99L, 100L))
        .toDF("doc_id", "score")
      val got = Dedup.bestOfCluster(members, scores, "doc_id", "score")
        .as[(Long, Long, Long)].collect().toSet
      // cluster 1: scores 10/30/30 -> tie between 2 and 3 -> min id 2;
      // id 99 scores highest of all but belongs to no cluster
      assert(got === Set((1L, 2L, 30L), (7L, 7L, 5L)))
    }

    it("groupOverlap counts shared distinct shingles per group pair with integer per-mille Jaccard") {
      val docs = Seq(
        (1L, "a", "w x y z"),  // shingles {w x y, x y z}
        (2L, "b", "w x y"),    // {w x y}
        (3L, "b", "x y z q"),  // {x y z, y z q}
        (4L, "c", "p q r"))    // {p q r} — no overlap with anyone
        .toDF("doc_id", "source", "text")
      val got = Dedup.groupOverlap(docs, "source", "doc_id", "text", 3)
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      // a = {wxy, xyz} (2), b = {wxy, xyz, yzq} (3); inter 2 -> J = 2/3 -> 666 permille
      assert(got === Set(("a", "b", 2L, 2L, 3L, 666L)))
    }
  }

  describe("Skew") {
    it("profileKeys surfaces the hottest keys with integer per-mille shares, nulls included") {
      val rows = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c") ++
        Seq.fill(2)(null.asInstanceOf[String])).zipWithIndex.toDF("k", "i")
      val top2 = Skew.profileKeys(rows, "k", 2)
        .as[(String, Long, Long)].collect().toSet
      assert(top2 === Set(("a", 5L, 454L), ("b", 3L, 272L))) // 5*1000 div 11, 3*1000 div 11
      val top3 = Skew.profileKeys(rows, "k", 3)
        .as[(String, Long, Long)].collect().toSet
      assert(top3.contains((null, 2L, 181L)), s"the null group must be profiled: $top3")
      intercept[IllegalArgumentException](Skew.profileKeys(rows, "k", 0))
    }

    it("saltedEquiJoin equals the plain join on a heavily skewed fact side") {
      // one hot key with 10k rows + a long tail; dim has keys 0..99
      val fact = ((0 until 10000).map(i => (7L, i.toLong)) ++
        (0 until 500).map(i => ((i % 100).toLong, 100000L + i)))
        .toDF("k", "payload")
      val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val salted = Skew.saltedEquiJoin(fact, dim, "k", 8)
      val plain = fact.join(dim, Seq("k"), "inner")
      // identical result multiset, salt column gone
      assert(salted.columns.toSeq === plain.columns.toSeq)
      assert(salted.count() === plain.count())
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      // the join key is genuinely (k, __salt): the hot key's rows hash into
      // multiple shuffle cells instead of one straggler partition
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), plan)
    }

    it("saltedEquiJoin spreads even IDENTICAL hot-key rows across salt cells") {
      // 10k byte-identical fact rows: a pure content hash would collapse them
      // all into one cell, reintroducing the straggler; the mixed-in row
      // index must keep them spread — and the join result must still equal
      // the plain join exactly (duplicates preserved)
      val fact = (0 until 10000).map(_ => (7L, 1L)).toDF("k", "payload")
      val dim = Seq((7L, "hot"), (8L, "cold")).toDF("k", "name")
      val salted = Skew.saltedEquiJoin(fact, dim, "k", 8)
      assert(salted.count() === 10000L)
      assert(salted.exceptAll(fact.join(dim, Seq("k"), "inner")).isEmpty)
      val cells = fact
        .withColumn("__salt", pmod(xxhash64(col("k"), col("payload"),
          monotonically_increasing_id()), lit(8L)).cast("int"))
        .select("__salt").distinct().count()
      assert(cells === 8L, s"identical rows occupied only $cells of 8 salt cells")
    }

    it("saltedEquiJoin rejects a reserved column and non-positive salt counts") {
      val df = Seq((1L, "x")).toDF("k", "__salt")
      intercept[IllegalArgumentException](Skew.saltedEquiJoin(df, df, "k", 4))
      val ok = Seq((1L, "x")).toDF("k", "v")
      intercept[IllegalArgumentException](Skew.saltedEquiJoin(ok, ok, "k", 0))
    }

    it("saltedLeftOuterJoin equals the plain left join incl. unmatched and null keys") {
      // matched keys, an unmatched key (99), and a NULL key — the outer
      // shapes: each must survive exactly once per left row
      val fact = ((0 until 5000).map(i => (java.lang.Long.valueOf(7L), i.toLong)) ++
        Seq((java.lang.Long.valueOf(99L), -1L), (null.asInstanceOf[java.lang.Long], -2L)))
        .toDF("k", "payload")
      val dim = Seq((7L, "hot"), (8L, "cold")).toDF("k", "name")
      val salted = Skew.saltedLeftOuterJoin(fact, dim, "k", 8)
      val plain = fact.join(dim, Seq("k"), "left")
      assert(salted.columns.toSeq === plain.columns.toSeq)
      assert(salted.count() === plain.count())
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      // unmatched + null-key rows survive exactly once with a null dim column
      assert(salted.where(col("name").isNull).count() === 2L)
    }

    it("saltedLeftOuterJoin spreads IDENTICAL hot-key rows and keeps outer duplicates") {
      // the q51-style identical-row hot key, extended to the OUTER case:
      // 10k byte-identical matched rows AND 10k byte-identical UNMATCHED rows
      // (key 9 has no dim row) must each come back exactly once per input row
      val fact = ((0 until 10000).map(_ => (7L, 1L)) ++
        (0 until 10000).map(_ => (9L, 2L))).toDF("k", "payload")
      val dim = Seq((7L, "hot")).toDF("k", "name")
      val salted = Skew.saltedLeftOuterJoin(fact, dim, "k", 8)
      assert(salted.count() === 20000L)
      assert(salted.where(col("name").isNull).count() === 10000L)
      assert(salted.exceptAll(fact.join(dim, Seq("k"), "left")).isEmpty)
    }
  }

  describe("Sampling") {
    val ids = (0L until 2000L).map(i => (i, s"row_$i")).toDF("id", "payload")

    it("deterministicSample is stable, fraction-accurate, and monotone in fraction") {
      val s25a = Sampling.deterministicSample(ids, "id", 0.25).select("id").as[Long].collect().toSet
      val s25b = Sampling.deterministicSample(ids.repartition(13), "id", 0.25)
        .select("id").as[Long].collect().toSet
      assert(s25a === s25b) // identical under any partitioning
      assert(math.abs(s25a.size - 500) < 100, s"got ${s25a.size} of expected ~500")
      val s50 = Sampling.deterministicSample(ids, "id", 0.5).select("id").as[Long].collect().toSet
      assert(s25a.subsetOf(s50)) // raising the fraction never evicts a row
      assert(Sampling.deterministicSample(ids, "id", 0.0).count() === 0L)
      assert(Sampling.deterministicSample(ids, "id", 1.0).count() === 2000L)
    }

    it("weightedSample scales the keep rate with the weight, deterministically") {
      // weight = id capped at 1000, maxWeight 1000, base 0.8: low-id rows
      // (small weight) should survive far less often than high-id rows
      val weighted = (0L until 2000L).map(i => (i, i)).toDF("id", "w")
      val kept = Sampling.weightedSample(weighted, "id", "w", 1000L, 0.8)
        .select("id").as[Long].collect().toSet
      val keptAgain = Sampling.weightedSample(weighted.repartition(7), "id", "w", 1000L, 0.8)
        .select("id").as[Long].collect().toSet
      assert(kept === keptAgain) // partitioning-invariant
      val lowRate = (0L until 500L).count(kept).toDouble / 500
      val highRate = (1000L until 2000L).count(kept).toDouble / 1000
      assert(lowRate < 0.35, s"low-weight keep rate $lowRate should be ~0.2")
      assert(highRate > 0.65 && highRate < 0.95, s"capped-weight keep rate $highRate should be ~0.8")
      // weight <= 0 can never survive; weight >= max behaves as baseFraction
      assert(Sampling.weightedSample(weighted.withColumn("w", lit(-5L)), "id", "w", 1000L, 0.8)
        .count() === 0L)
      // monotone in baseFraction: same hash, larger threshold
      val kept50 = Sampling.weightedSample(weighted, "id", "w", 1000L, 0.5)
        .select("id").as[Long].collect().toSet
      assert(kept50.subsetOf(kept))
      intercept[IllegalArgumentException](Sampling.weightedSample(weighted, "id", "w", 0L, 0.5))
      intercept[IllegalArgumentException](Sampling.weightedSample(weighted, "id", "w", 10L, 1.5))
    }

    it("temperatureMix flattens dominant strata toward sqrt-share, deterministically") {
      // 1600 'big' rows vs 100 'rare': weights 40 vs 10, so of a 200 budget
      // big targets 160 (rate 0.1) and rare targets 40 (rate 0.4) — the rare
      // stratum's keep RATE is ~4x the dominant one's
      val mixed = ((0L until 1600L).map(i => (i, "big")) ++
        (10000L until 10100L).map(i => (i, "rare"))).toDF("id", "src")
      val kept = Sampling.temperatureMix(mixed, "src", "id", 200L)
        .select(col("id"), col("src")).as[(Long, String)].collect()
      val keptAgain = Sampling.temperatureMix(mixed.repartition(9), "src", "id", 200L)
        .select(col("id"), col("src")).as[(Long, String)].collect()
      assert(kept.toSet === keptAgain.toSet)
      val byStratum = kept.groupBy(_._2).view.mapValues(_.size).toMap
      val bigRate = byStratum.getOrElse("big", 0).toDouble / 1600
      val rareRate = byStratum.getOrElse("rare", 0).toDouble / 100
      assert(bigRate > 0.05 && bigRate < 0.15, s"big keep rate $bigRate should be ~0.1")
      assert(rareRate > 0.25 && rareRate < 0.55, s"rare keep rate $rareRate should be ~0.4")
      // a budget >= corpus keeps every row (targets cap at n_s)
      assert(Sampling.temperatureMix(mixed, "src", "id", 100000L).count() === 1700L)
      intercept[IllegalArgumentException](Sampling.temperatureMix(mixed, "src", "id", 0L))
    }

    it("capPerKeySample: heavy keys shrink toward the cap, under-cap keys stay whole") {
      // 2000 'hot' rows vs 30 'cold': cap 100 -> hot keeps ~5% (rate
      // 100/2000), cold keeps EVERYTHING (threshold 2^32 is unmissable)
      val mixed = ((0L until 2000L).map(i => (i, "hot")) ++
        (50000L until 50030L).map(i => (i, "cold"))).toDF("id", "k")
      val kept = Sampling.capPerKeySample(mixed, "k", "id", 100L)
        .as[(Long, String)].collect()
      val byKey = kept.groupBy(_._2).view.mapValues(_.size).toMap
      assert(byKey.getOrElse("cold", 0) === 30) // certain, not statistical
      val hotRate = byKey.getOrElse("hot", 0).toDouble / 2000
      assert(hotRate > 0.02 && hotRate < 0.09, s"hot keep rate $hotRate should be ~0.05")
      // partitioning-invariant; growing a key only ever REMOVES members
      val again = Sampling.capPerKeySample(mixed.repartition(7), "k", "id", 100L)
        .as[(Long, String)].collect()
      assert(kept.toSet === again.toSet)
      val grown = mixed.unionByName(
        (100000L until 102000L).map(i => (i, "hot")).toDF("id", "k"))
      val keptGrown = Sampling.capPerKeySample(grown, "k", "id", 100L)
        .as[(Long, String)].collect().toSet
      assert(keptGrown.filter(_._2 == "hot").subsetOf(kept.toSet.filter(_._2 == "hot")
        ++ (100000L until 102000L).map(i => (i, "hot"))))
      // null keys drop; cap contract is loud
      assert(Sampling.capPerKeySample(
        mixed.unionByName(Seq((7L, null.asInstanceOf[String])).toDF("id", "k")),
        "k", "id", 100L).where(col("k").isNull).count() === 0L)
      intercept[IllegalArgumentException](Sampling.capPerKeySample(mixed, "k", "id", 0L))
    }

    it("hash32Local is bit-identical to the hash32 Column form (typed kernels " +
       "and Column expressions can never disagree on a sampling decision)") {
      val ids = Seq(0L, 1L, -1L, 42L, 123456789L, Long.MaxValue, Long.MinValue + 1)
      for (salt <- Seq("", "sample", "fim-release-1:i", "tokmix")) {
        val viaColumn = ids.toDF("id")
          .select(col("id"), Sampling.hash32(col("id"), salt).as("h"))
          .as[(Long, Long)].collect().toMap
        ids.foreach { id =>
          assert(Sampling.hash32Local(id, salt) == viaColumn(id), s"id=$id salt=$salt")
        }
      }
    }

    it("capPerKeySample fails loudly past the maxKeys broadcast contract") {
      // the threshold frame is broadcast, so key cardinality is a CONTRACT:
      // 5 distinct keys against maxKeys=3 must fail BEFORE the join plans,
      // with a message that names the key and the escape hatches
      val manyKeys = (0L until 50L).map(i => (i, s"host${i % 5}")).toDF("id", "k")
      val e = intercept[IllegalArgumentException](
        Sampling.capPerKeySample(manyKeys, "k", "id", 10L, maxKeys = 3L))
      assert(e.getMessage.contains("maxKeys=3") && e.getMessage.contains("topKPerKey"))
      // at-the-boundary passes (the limit(maxKeys+1) probe is exact, not off-by-one)
      assert(Sampling.capPerKeySample(manyKeys, "k", "id", 100L, maxKeys = 5L)
        .count() === 50L)
      intercept[IllegalArgumentException](
        Sampling.capPerKeySample(manyKeys, "k", "id", 10L, maxKeys = 0L))
    }

    it("tokenBudgetMix hits the token target per stratum; unlisted strata drop") {
      // 'big': 1000 docs x 100 tokens = 100k mass, 600 milli of a 50k
      // budget -> target 30k -> keep rate 0.3 of the MASS; 'small':
      // 400 milli -> target 20k > its 8k mass -> keeps EVERYTHING;
      // 'out': no share -> drops entirely (certain)
      val rows = ((0L until 1000L).map(i => (i, "big", 100L)) ++
        (10000L until 10400L).map(i => (i, "small", 20L)) ++
        (90000L until 90050L).map(i => (i, "out", 10L))).toDF("id", "k", "w")
      val kept = Sampling.tokenBudgetMix(rows, "k", "id", "w",
        Map("big" -> 600L, "small" -> 400L), budget = 50000L)
        .as[(Long, String, Long)].collect()
      val mass = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      assert(mass.getOrElse("small", 0L) === 8000L) // under target: all kept, certain
      assert(!mass.contains("out"))                 // unlisted: dropped, certain
      val bigMass = mass.getOrElse("big", 0L).toDouble
      assert(bigMass > 30000 * 0.8 && bigMass < 30000 * 1.2,
        s"big kept mass $bigMass should be ~30000")
      // invariance + a zero-weight stratum never divides by zero
      val again = Sampling.tokenBudgetMix(rows.repartition(7), "k", "id", "w",
        Map("big" -> 600L, "small" -> 400L), budget = 50000L)
        .as[(Long, String, Long)].collect()
      assert(kept.toSet === again.toSet)
      val zeroed = Seq((1L, "z", 0L), (2L, "z", 0L)).toDF("id", "k", "w")
      assert(Sampling.tokenBudgetMix(zeroed, "k", "id", "w",
        Map("z" -> 1000L), budget = 100L).count() === 0L)
      // composition contracts are loud
      intercept[IllegalArgumentException](
        Sampling.tokenBudgetMix(rows, "k", "id", "w", Map("big" -> 1001L), 100L))
      intercept[IllegalArgumentException](
        Sampling.tokenBudgetMix(rows, "k", "id", "w",
          Map("big" -> 600L, "small" -> 600L), 100L))
      // a negative weight fails in-plan, never silently deflates the mass
      val neg = Seq((1L, "k", 5L), (2L, "k", -1L)).toDF("id", "k", "w")
      val e = intercept[Exception](
        Sampling.tokenBudgetMix(neg, "k", "id", "w", Map("k" -> 1000L), 100L).count())
      assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("negative"))
    }

    it("topKPerKey keeps the k best rows per key (value desc, id asc), invariant to partitioning") {
      val rows = Seq(
        ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 20L),
        ("b", 5L, 5L), ("b", 7L, Long.MinValue), // MinValue: no negation overflow
        (null.asInstanceOf[String], 6L, 99L)
      ).toDF("k", "id", "v")
      val got = Sampling.topKPerKey(rows, "k", "id", "v", 2)
        .as[(String, Long, Long)].collect().toSet
      // a: the two 30s survive on the id tiebreak, the 20 falls; b: under cap
      assert(got === Set(("a", 2L, 30L), ("a", 3L, 30L),
        ("b", 5L, 5L), ("b", 7L, Long.MinValue)))
      val again = Sampling.topKPerKey(rows.repartition(7), "k", "id", "v", 2)
        .as[(String, Long, Long)].collect().toSet
      assert(again === got) // combiner merge order cannot change the answer
      intercept[IllegalArgumentException](Sampling.topKPerKey(rows, "k", "id", "v", 0))
    }

    it("withSplit is INDEPENDENT of the sample (distinct purpose salts) and covers every row") {
      val split = Sampling.withSplit(ids, "id", 0.25)
      val holdout = split.where(col("is_holdout")).select("id").as[Long].collect().toSet
      val sampled = Sampling.deterministicSample(ids, "id", 0.25).select("id").as[Long].collect().toSet
      assert(split.count() === 2000L)
      assert(math.abs(holdout.size - 500) < 100)
      // correlated hashes would make holdout == sampled (every sampled row
      // lands in holdout when splitting a sampled corpus); independence means
      // the overlap is ~ fraction^2 of the corpus (~125 of 2000), not 100%
      val overlap = holdout.intersect(sampled).size
      assert(overlap < 250, s"sample/split overlap $overlap suggests correlated hashes")
      // splitting the SAMPLED corpus must hold out ~25% of it, not 100%
      val sampledDf = Sampling.deterministicSample(ids, "id", 0.25)
      val nested = Sampling.withSplit(sampledDf, "id", 0.25)
      val frac = nested.where(col("is_holdout")).count().toDouble / nested.count()
      assert(frac > 0.1 && frac < 0.45, s"holdout fraction of a sampled corpus was $frac")
    }

    it("withSplit rejects a frame that already carries is_holdout") {
      val pre = Sampling.withSplit(ids, "id", 0.25)
      intercept[IllegalArgumentException](Sampling.withSplit(pre, "id", 0.1))
    }

    it("perKeySample keeps exactly k per key (all, when the group is smaller) and matches the hash-rank oracle") {
      val ev = (0L until 1000L).map(i => (i % 7, i)).toDF("k", "id")
      val got = Sampling.perKeySample(ev, "k", "id", 5)
        .select(col("k").cast("long"), col("id")).as[(Long, Long)].collect()
      assert(got.groupBy(_._1).forall(_._2.length == 5))
      // window-rank reference: smallest 5 hashes per key, ties by id
      val ref = ev.withColumn("h", Sampling.hash32(col("id"), "perkey"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
            .orderBy(col("h"), col("id"))))
        .where(col("rn") <= 5)
        .select(col("k"), col("id")).as[(Long, Long)].collect()
      assert(got.toSet === ref.toSet)
      val tiny = Sampling.perKeySample(Seq((1L, 10L), (1L, 11L)).toDF("k", "id"), "k", "id", 5)
      assert(tiny.count() === 2L) // group smaller than k: keep all
    }
  }

  describe("Chunking") {
    it("chunkWords windows with overlap, truncated tail, full coverage") {
      val docs = Seq(
        (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), // 10 words
        (2L, "a b c"),                          // shorter than a chunk
        (3L, null.asInstanceOf[String]),
        (4L, "   "),
        (5L, "x0 x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text") // 7 words: tail
      // window [6,7) would add NO new tokens -> exactly one window
      val got = Chunking.chunkWords(docs, "doc_id", "text", chunkSize = 8, overlap = 2)
        .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq === Seq(
        (1L, 0L, 8L, "w0 w1 w2 w3 w4 w5 w6 w7"),
        (1L, 1L, 4L, "w6 w7 w8 w9"), // overlap of 2, truncated at doc end
        (2L, 0L, 3L, "a b c"),
        (5L, 0L, 7L, "x0 x1 x2 x3 x4 x5 x6")))
      // every word index of doc 1 appears in at least one chunk
      val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
      assert(covered === (0 until 10).map(i => s"w$i").toSet)
    }

    it("chunkWords validates window parameters") {
      val df = Seq((1L, "x")).toDF("doc_id", "text")
      intercept[IllegalArgumentException](Chunking.chunkWords(df, "doc_id", "text", 0, 0))
      intercept[IllegalArgumentException](Chunking.chunkWords(df, "doc_id", "text", 8, 8))
    }
  }

  describe("multilingual robustness (kernels on non-ASCII text)") {
    // CJK, accented Latin, RTL Arabic, and an astral-plane emoji (surrogate
    // pair in UTF-16) — 100 TB corpora are multilingual, and the typed
    // kernels hash UTF-16 units directly, so identical text MUST produce
    // identical signatures and token decisions regardless of script
    val uni = Seq(
      (1L, "机器 学习 模型 训练 数据 管道 构建 完成"),
      (2L, "机器 学习 模型 训练 数据 管道 构建 完成"),       // exact dup of 1
      (3L, "café naïve résumé señor jalapeño über garçon œuvre"),
      (4L, "تعلم الآلة نموذج تدريب بيانات خط أنابيب بناء"),
      (5L, "🚀 rocket 🌟 star 🎯 target 🔥 fire model data")).toDF("doc_id", "text")

    it("minhash and simhash treat identical non-ASCII texts as exact duplicates") {
      val mh = Dedup.minhashNearDups(uni, "doc_id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(mh === Set((1L, 2L))) // the dup pair and NOTHING else — no cross-script pairs
      val sh = Dedup.simhash(uni, "doc_id", "text").as[(Long, Long)].collect().toMap
      assert(sh(1L) === sh(2L))
      assert(Set(sh(1L), sh(3L), sh(4L), sh(5L)).size === 4)
    }

    it("chunkWords round-trips every non-ASCII token incl. surrogate pairs") {
      // "token" is the shared segmentText notion: CJK codepoints segment
      // one-per-token (so 机器 contributes 机 and 器), everything else by
      // whitespace — chunking must lose none of them in any script
      val chunks = Chunking.chunkWords(uni, "doc_id", "text", 3, 1)
        .as[(Long, Long, Long, String)].collect()
      for (id <- 1L to 5L) {
        val original = graft.functions.Text.segmentText(
          uni.where(col("doc_id") === id).select("text").as[String].head()).toSet
        val covered = chunks.filter(_._1 == id).flatMap(_._4.split(" ")).toSet
        assert(covered === original, s"doc $id lost tokens in chunking")
      }
    }

    it("deterministic sampling hash is byte-stable for ids regardless of platform") {
      // pin two hash32 values so any change to the hashing recipe (and thus
      // to every persisted sample) fails loudly
      val got = Sampling.deterministicSample(
        spark.range(0, 2, 1, 1).toDF("id"), "id", 1.0)
        .select(Sampling.hash32(col("id"), "sample").as("h")).as[Long].collect().toSeq
      assert(got === Seq(3531617373L, 2677363853L)) // md5("0sample"/"1sample") prefixes
    }
  }

  describe("Similarity") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

    it("centroid-blocked dedup (q125's chain): planted copies land in their source's cell; survivors are the originals") {
      // three well-separated clusters of 3; ids 0..8, plus exact copies of
      // 0/3/6 under +100 — the q125 construction at unit scale
      val base = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.98f, 0.05f, 0.0f)), (2L, Array(0.97f, 0.0f, 0.05f)),
        (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.05f, 0.98f, 0.0f)), (5L, Array(0.0f, 0.97f, 0.05f)),
        (6L, Array(0.0f, 0.0f, 1.0f)), (7L, Array(0.05f, 0.0f, 0.98f)), (8L, Array(0.0f, 0.05f, 0.97f)))
      val corpus = (base ++ Seq(0L, 3L, 6L).map(i => (i + 100L, base(i.toInt)._2)))
        .toDF("vec_id", "embedding")
      val idx = Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nCentroids = 3)
      val pairs = Similarity.centroidBlockedPairs(idx, 0.999)
      // exactly the three planted (source, copy) pairs survive the verify
      assert(pairs.as[(Long, Long)].collect().toSet === Set((0L, 100L), (3L, 103L), (6L, 106L)))
      val comp = Dedup.connectedComponents(pairs)
      val survivors = 12L - comp.where(col("id") =!= col("component")).count()
      assert(survivors === 9L) // every copy collapses onto its original
    }

    it("hardNegatives ranks only cross-label neighbors, skipping null labels") {
      val labeled = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f), java.lang.Integer.valueOf(1)),   // query, label 1
        (1L, Array(0.99f, 0.1f, 0.0f), java.lang.Integer.valueOf(1)),  // nearest overall — same label
        (2L, Array(0.9f, 0.2f, 0.0f), java.lang.Integer.valueOf(2)),   // nearest cross-label
        (3L, Array(0.5f, 0.5f, 0.0f), java.lang.Integer.valueOf(2)),
        (4L, Array(0.95f, 0.05f, 0.0f), null.asInstanceOf[java.lang.Integer]), // null label: excluded
        (5L, Array(0.0f, 0.0f, 1.0f), java.lang.Integer.valueOf(3))
      ).toDF("vec_id", "embedding", "label")
      val got = Similarity.hardNegatives(labeled.where(col("vec_id") === 0),
          labeled, "vec_id", "embedding", "label", 2)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
      assert(got === Seq((0L, 2L, 1L), (0L, 3L, 2L))) // 1 (same label) and 4 (null) never rank
    }

    it("knnLabelVote reports the neighbor-majority label with vote count; ties go to the smaller label") {
      val labeled = Seq(
        (0L, Array(1.0f, 0.0f), Integer.valueOf(1)),
        (1L, Array(0.95f, 0.1f), Integer.valueOf(2)),
        (2L, Array(0.9f, 0.2f), Integer.valueOf(2)),
        (3L, Array(0.85f, 0.3f), Integer.valueOf(1)),
        (4L, Array(0.0f, 1.0f), Integer.valueOf(3))).toDF("vec_id", "embedding", "label")
      // query 0, k=3: neighbors 1,2,3 carry labels 2,2,1 -> majority 2 with
      // 2 votes, own label 1 -> a mislabel candidate
      val noisy = Similarity.knnLabelVote(labeled.where(col("vec_id") === 0), labeled,
          "vec_id", "embedding", "label", 3)
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(noisy === Set((0L, 1, 2, 2L)))
      // query 4, k=2: nearest are 3 (label 1) and 2 (label 2) -> 1-1 tie
      // resolves to the smaller label
      val tie = Similarity.knnLabelVote(labeled.where(col("vec_id") === 4), labeled,
          "vec_id", "embedding", "label", 2)
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(tie === Set((4L, 3, 1, 1L)))
      intercept[IllegalArgumentException](
        Similarity.knnLabelVote(labeled, labeled, "vec_id", "embedding", "label", 0))
    }

    it("quantizedTopK matches exact brute-force ranking on well-separated vectors, invariant to partitioning") {
      // 60 random-ish 16-dim vectors from fixed integer seeds: quantization
      // error ~1/127 cannot reorder neighbors separated by > ~2% cosine
      val rndq = new scala.util.Random(23)
      val corpus = (0L until 60L).map { i =>
        (i, Array.fill(16)((rndq.nextInt(2001) - 1000) / 1000.0f))
      }.toDF("vec_id", "embedding")
      val queries = corpus.where(col("vec_id") < 4)
      val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
        .as[(Long, Long, Long)].collect().toSet
      val quant = Similarity.quantizedTopK(queries, corpus, "vec_id", "embedding", 5)
        .as[(Long, Long, Long)].collect().toSet
      val quantRepart = Similarity.quantizedTopK(queries, corpus.repartition(7), "vec_id", "embedding", 5)
        .as[(Long, Long, Long)].collect().toSet
      assert(quant === quantRepart) // integer scores: bit-deterministic
      // recall@5 >= 4/5 for every query against the exact ranking
      val exactBy = exact.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val quantBy = quant.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      exactBy.foreach { case (q, nbrs) =>
        val hit = nbrs.intersect(quantBy(q)).size
        assert(hit >= 4, s"query $q: recall $hit/5")
      }
      // an all-zero corpus vector is dropped, not NaN-scored
      val withZero = corpus.unionByName(Seq((999L, Array.fill(16)(0.0f))).toDF("vec_id", "embedding"))
      val gotZ = Similarity.quantizedTopK(queries, withZero, "vec_id", "embedding", 5)
      assert(!gotZ.select("neighbor_id").as[Long].collect().contains(999L))
    }

    it("dot_product is callable from SQL text after registration") {
      graft.expressions.VectorExpressions.registerSql(spark)
      vecs.createOrReplaceTempView("ext_vecs")
      val got = spark.sql(
        "SELECT vec_id, dot_product(embedding, embedding) AS d FROM ext_vecs WHERE vec_id = 1")
        .as[(Long, Double)].head()
      // elements widen to double BEFORE multiplying (exact float->double)
      val expect = 0.9f.toDouble * 0.9f.toDouble + 0.1f.toDouble * 0.1f.toDouble
      assert(got._2 === expect)
    }

    it("the text layer is callable from SQL text (composed-Column registration)") {
      graft.expressions.VectorExpressions.registerSql(spark)
      Seq((1L, "the cat sat on the mat"), (2L, "  "))
        .toDF("id", "t").createOrReplaceTempView("ext_docs")
      val got = spark.sql(
        """SELECT id, graft_token_count(t) AS n, graft_lang_guess(t) AS lang,
          |       graft_bpe_token_count(t) AS bpe FROM ext_docs""".stripMargin)
        .as[(Long, Long, String, Long)].collect().map { case (i, n, l, b) => i -> ((n, l, b)) }.toMap
      assert(got(1L) === ((6L, "en", 6L)))
      assert(got(2L) === ((0L, "und", 0L)))
    }

    it("graft_scrub_pii is callable from SQL text") {
      graft.expressions.VectorExpressions.registerSql(spark)
      Seq("mail a@b.io via http://x.y/z").toDF("t").createOrReplaceTempView("ext_pii")
      val got = spark.sql("SELECT graft_scrub_pii(t) AS c FROM ext_pii").as[String].head()
      assert(got === "mail <EMAIL> via <URL>")
    }

    it("cosine matches scala math") {
      val got = vecs.filter($"vec_id" === 1)
        .select(Similarity.cosine($"embedding", $"embedding")).as[Double].head()
      assert(math.abs(got - 1.0) < 1e-12)
    }

    it("bruteForceTopK ranks by cosine desc with id tie-break") {
      val got = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((0L, 1L, 1L), (0L, 2L, 2L))) // closest first
    }

    it("exactSimilarPairs finds the close pair only") {
      val got = Similarity.exactSimilarPairs(vecs, "vec_id", "embedding", 0.9)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === Set((0L, 1L)))
    }

    it("ivfTopK with exhaustive probing equals brute force; partial probing is a subset") {
      val exact = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 2)
        .as[(Long, Long, Long)].collect().toSet
      val full = Similarity.ivfTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
        k = 2, nCentroids = 2, nProbe = 2).as[(Long, Long, Long)].collect().toSet
      assert(full === exact) // probing every list degenerates to exact search
      val partial = Similarity.ivfTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
        k = 2, nCentroids = 2, nProbe = 1).as[(Long, Long, Long)].collect()
      assert(partial.map(_._2).toSet.subsetOf(vecs.as[(Long, Array[Float])].collect().map(_._1).toSet))
      assert(partial.forall(_._1 == 0L))
    }

    it("a standing IvfIndex probed repeatedly equals the one-shot ivfTopK (build-once contract)") {
      val idx = Similarity.buildIvfIndex(vecs, "vec_id", "embedding", nCentroids = 2, trainIters = 1)
      idx.assigned.persist()
      try {
        val oneShot = Similarity.ivfTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
          k = 2, nCentroids = 2, nProbe = 2, trainIters = 1).as[(Long, Long, Long)].collect().toSet
        val probe1 = Similarity.ivfProbe(idx, vecs.filter($"vec_id" === 0), "vec_id", "embedding",
          k = 2, nProbe = 2).as[(Long, Long, Long)].collect().toSet
        val probe2 = Similarity.ivfProbe(idx, vecs.filter($"vec_id" === 1), "vec_id", "embedding",
          k = 2, nProbe = 2).as[(Long, Long, Long)].collect().toSet
        assert(probe1 === oneShot) // probing the standing index ≡ build-and-probe
        assert(probe2.nonEmpty && probe2.forall(_._1 == 1L)) // second batch reuses the same index
      } finally { idx.assigned.unpersist(); () }
    }

    it("restrict() pre-filters the lists: results == brute force over the allow-listed corpus only") {
      val idx = Similarity.buildIvfIndex(vecs, "vec_id", "embedding", nCentroids = 2)
      val keep = vecs.where($"vec_id" =!= 1L).select($"vec_id")
      val got = Similarity.ivfProbe(Similarity.restrict(idx, keep, "vec_id"),
        vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 2, nProbe = 2)
        .as[(Long, Long, Long)].collect().toSet
      val exact = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0),
        vecs.where($"vec_id" =!= 1L), "vec_id", "embedding", 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === exact)
      assert(!got.exists(_._2 == 1L), "excluded id surfaced from the restricted index")
    }

    it("k-means-trained IVF still equals brute force under exhaustive probing; training is deterministic") {
      val exact = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 2)
        .as[(Long, Long, Long)].collect().toSet
      val trained = Similarity.ivfTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
        k = 2, nCentroids = 2, nProbe = 2, trainIters = 3).as[(Long, Long, Long)].collect().toSet
      assert(trained === exact) // exhaustive probing is exact regardless of quantizer quality
      val c1 = Similarity.trainCentroids(vecs, "vec_id", "embedding", 2, 3).map(_.toSeq).toSeq
      val c2 = Similarity.trainCentroids(vecs, "vec_id", "embedding", 2, 3).map(_.toSeq).toSeq
      assert(c1 === c2)
      assert(c1.length === 2 && c1.forall(_.length === 3))
    }

    it("lshNearNeighbors is a subset of exact pairs and finds the closest") {
      val exact = Similarity.exactSimilarPairs(vecs, "vec_id", "embedding", 0.9)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val approx = Similarity.lshNearNeighbors(vecs, "vec_id", "embedding", 3,
        planesPerTable = 2, tables = 8, threshold = 0.9)
        .as[(Long, Long)].collect().toSet
      assert(approx.subsetOf(exact))
      assert(approx.contains((0L, 1L))) // high recall for near-identical
    }

    it("embedding dedup pipeline (LSH -> cosine verify -> CC -> keep) removes exactly the planted copies") {
      // q59's shape on a toy corpus: identical vectors share every sign bit,
      // so LSH MUST surface every planted pair; the tight verify admits
      // nothing else; CC keeps the minimum id per cluster. Also plants a
      // 3-member cluster (two copies of vec 0) to check transitive collapse.
      val planted = vecs.select(($"vec_id" + 100L).as("vec_id"), $"embedding")
        .union(vecs.filter($"vec_id" === 0).select(($"vec_id" + 200L).as("vec_id"), $"embedding"))
      val corpus = vecs.union(planted)
      val pairs = Similarity.lshNearNeighbors(corpus, "vec_id", "embedding", 3,
        planesPerTable = 2, tables = 8, threshold = 0.999)
        .select($"id_a", $"id_b")
      val survivors = corpus.select($"vec_id")
        .join(Dedup.connectedComponents(pairs).where($"id" =!= $"component")
          .select($"id".as("vec_id")), Seq("vec_id"), "left_anti")
        .as[Long].collect().toSet
      assert(survivors === Set(0L, 1L, 2L, 3L))
    }
  }

  describe("Sessions") {
    it("sessionCounts splits on gaps > threshold in one pass") {
      val ev = Seq(
        (1L, (0L, 1L)), (1L, (10L, 2L)), (1L, (100L, 3L)), // gap 90 > 50: new session
        (2L, (0L, 4L))).toDS()
      val got = Sessions.sessionCounts[Long, (Long, Long)](ev.groupSort(2), _._1, 50L)
        .collect().toMap
      assert(got === Map(1L -> 2L, 2L -> 1L))
    }

    it("funnelStages advances greedily in value order; out-of-order stages don't count") {
      val ev = Seq(
        (1L, (1L, "view")), (1L, (2L, "click")), (1L, (3L, "purchase")), // full funnel
        (2L, (1L, "click")), (2L, (2L, "view")), (2L, (3L, "click")),    // early click ignored; view->click = 2
        (3L, (1L, "purchase")), (3L, (2L, "error")),                     // nothing matches stage 1
        (4L, (1L, "view")), (4L, (2L, "view"))).toDS()                   // stage 1 only
      val got = Sessions.funnelStages(ev.groupSort(2), Seq[((Long, String)) => Boolean](
          _._2 == "view", _._2 == "click", _._2 == "purchase")).collect().toMap
      assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
      intercept[IllegalArgumentException](
        Sessions.funnelStages(ev.groupSort(2), Seq.empty[((Long, String)) => Boolean]))
    }

    it("conversionLag emits first-start to first-end-after latency; non-converters are silent") {
      val ev = Seq(
        (1L, (10L, 1L, "view")), (1L, (25L, 2L, "purchase")),  // lag 15
        (2L, (10L, 3L, "purchase")), (2L, (20L, 4L, "view")),  // end before any start: no conversion
        (3L, (10L, 5L, "view")), (3L, (12L, 6L, "view")),      // first view anchors...
        (3L, (30L, 7L, "purchase")),                           // ...lag 20, not 18
        (4L, (10L, 8L, "click"))).toDS()                       // never starts
      val got = Sessions.conversionLag(ev.groupSort(2))(
          isStart = (v: (Long, Long, String)) => v._3 == "view",
          isEnd = (v: (Long, Long, String)) => v._3 == "purchase",
          ticksOf = (v: (Long, Long, String)) => v._1).collect().toMap
      assert(got === Map(1L -> 15L, 3L -> 20L))
    }

    it("sessionIntervals emits (start, end, n) per gap-closed session incl. the trailing one") {
      val ev = Seq(
        (1L, (0L, 1L)), (1L, (10L, 2L)), (1L, (100L, 3L)), (1L, (105L, 4L)), // gap 90 > 50 splits
        (2L, (7L, 5L))).toDS()
      val got = Sessions.sessionIntervals(ev.groupSort(2), (v: (Long, Long)) => v._1, 50L)
        .collect().toSet
      assert(got === Set(
        (1L, (0L, 10L, 2L)), (1L, (100L, 105L, 2L)), (2L, (7L, 7L, 1L))))
      // interval count agrees with sessionCounts on the same input
      val counts = Sessions.sessionCounts[Long, (Long, Long)](ev.groupSort(2), _._1, 50L)
        .collect().toMap
      assert(got.groupBy(_._1).view.mapValues(_.size.toLong).toMap === counts)
    }

    it("adjacentPairs emits each consecutive pair once; singleton keys are silent") {
      val ev = Seq(
        (1L, (1L, "a")), (1L, (2L, "b")), (1L, (3L, "c")),
        (2L, (1L, "x"))).toDS()
      val got = Sessions.adjacentPairs(ev.groupSort(2))(
          (p: (Long, String), n: (Long, String)) => (p._2, n._2))
        .collect().toSet
      assert(got === Set((1L, ("a", "b")), (1L, ("b", "c"))))
    }

    it("asOfLastMarker emits the most recent preceding marker") {
      val ev = Seq(
        (1L, (1L, 10L, "purchase")),
        (1L, (2L, 11L, "error")),   // after purchase 10
        (1L, (3L, 12L, "purchase")),
        (1L, (4L, 13L, "error")),   // after purchase 12
        (2L, (1L, 20L, "error"))).toDS() // no marker yet
      val got = Sessions.asOfLastMarker(ev.groupSort(2))(
          isTarget = (v: (Long, Long, String)) => v._3 == "error",
          isMarker = (v: (Long, Long, String)) => v._3 == "purchase",
          emit = (v: (Long, Long, String), m: Option[(Long, Long, String)]) => (v._2, m.map(_._2)))
        .collect().toSet
      assert(got === Set(
        (1L, (11L, Some(10L))), (1L, (13L, Some(12L))), (2L, (20L, None))))
    }
  }

  describe("AsOf") {
    it("asOfJoin matches the latest right row at-or-before each left row") {
      val trades = Seq(
        (1L, (10L, 100L)), (1L, (20L, 101L)), (1L, (30L, 102L)),
        (2L, (5L, 200L))).toDS() // (key, (ts, id))
      val quotes = Seq(
        (1L, (10L, 900L)), (1L, (15L, 901L)), (1L, (25L, 902L)),
        (3L, (1L, 999L))).toDS() // key 2 has no quotes; key 3 has no trades
      val got = AsOf.asOfJoin(trades.groupSort(2), quotes.groupSort(2))(
          tsL = (l: (Long, Long)) => l._1,
          tsR = (r: (Long, Long)) => r._1,
          emit = (l: (Long, Long), r: Option[(Long, Long)]) => (l._2, r.map(_._2)))
        .collect().toSet
      assert(got === Set(
        (1L, (100L, Some(900L))), // ts 10: quote at exactly 10 matches (<=)
        (1L, (101L, Some(901L))), // ts 20: latest quote <= 20 is 15
        (1L, (102L, Some(902L))),
        (2L, (200L, None))))      // no quotes for key 2
    }
  }

  describe("Media") {
    it("resize emits exactly w*h bytes per blob, preserving kind") {
      val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 4, 5)
      val df = Seq((1L, jpg), (2L, Array.empty[Byte])).toDF("id", "blob")
      val got = Media.resize(df, "id", "blob", 8, 4)
        .as[(Long, String, Array[Byte])].collect().map(r => r._1 -> r).toMap
      assert(got(1L)._2 === "jpeg")
      assert(got(1L)._3.length === 32)
      assert(got(1L)._3(0) === 0xff.toByte) // cycled from source
      assert(got(2L)._3.length === 32)      // empty source -> zero-filled
    }

    it("sampleFrames emits one bounded row per stride window") {
      val blob = Array.tabulate[Byte](600)(i => (i % 127).toByte)
      val df = Seq((1L, blob), (2L, Array.empty[Byte])).toDF("id", "blob")
      val got = Media.sampleFrames(df, "id", "blob", stride = 256, maxFrames = 16)
        .as[(Long, Long, Long, Long)].collect()
      assert(got.forall(_._1 == 1L)) // empty blob emits nothing
      assert(got.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L)) // ceil(600/256) = 3 frames
      assert(got.map(_._3).sorted.toSeq === Seq(0L, 256L, 512L))
      val capped = Media.sampleFrames(df, "id", "blob", stride = 100, maxFrames = 2).count()
      assert(capped === 2L) // maxFrames bound respected
    }

    it("extracts byte features and sniffs container kinds") {
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3)
      val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 4, 5)
      val txt = "hello world".getBytes("UTF-8")
      val df = Seq((1L, png), (2L, jpg), (3L, txt)).toDF("id", "blob")
      val got = Media.extractFeatures(df, "id", "blob").collect().map(m => m.id -> m).toMap
      assert(got(1L).kind === "png")
      assert(got(2L).kind === "jpeg")
      assert(got(3L).kind === "unknown")
      assert(got(3L).n_bytes === 11L)
      assert(got(3L).width === 11L % 64)
      assert(got(1L).checksum === (0x89L)) // every 16th byte of an 11-byte blob = byte 0
    }

    it("REALLY decodes 24bpp BMP pixels: values, orientation, means, resize, rejects") {
      val bmp = Media.syntheticBmp(3, 2, 7L)
      val img = Media.parseBmp(bmp).get
      assert((img.width, img.height) === ((3, 2)))
      // pixel closed form: r=(x+y)%256, g=(y+7)%256, b=(x+7)%256
      assert(img.pixel(0, 0) === ((0, 7, 7)))
      assert(img.pixel(2, 1) === ((3, 8, 9)))
      val (w, h, mr, mg, mb) = Media.bmpChannelMeans(img)
      assert((w, h, mr, mg, mb) === ((3L, 2L, 1L, 7L, 8L)))
      // top-down variant (negative height): same bytes reinterpreted — the
      // stored FIRST row (image row 1 in the bottom-up original) becomes
      // image row 0, so its green channel reads (1+7)=8 at y=0
      val topDown = bmp.clone()
      topDown(22) = (-2 & 0xff).toByte; topDown(23) = 0xff.toByte
      topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
      assert(Media.parseBmp(topDown).get.pixel(0, 0)._2 === 8)
      // real nearest-neighbor resize: corners map to source corners
      val rz = Media.resizeBmp(bmp, 6, 2).get
      val rimg = Media.parseBmp(rz).get
      assert((rimg.width, rimg.height) === ((6, 2)))
      assert(rimg.pixel(0, 0) === img.pixel(0, 0))
      assert(rimg.pixel(5, 1) === img.pixel(2, 1))
      // truncated pixel data and non-BMP bytes are rejected, not misread
      assert(Media.parseBmp(bmp.dropRight(1)).isEmpty)
      assert(Media.parseBmp("not a bitmap".getBytes("UTF-8")).isEmpty)
      // HOSTILE headers whose int geometry would wrap must reject, not crash:
      // w*3 overflowing to a tiny positive stride, and h = Int.MinValue
      // (abs() keeps it negative)
      def withLe32(src: Array[Byte], off: Int, v: Int): Array[Byte] = {
        val c = src.clone()
        c(off) = (v & 0xff).toByte; c(off + 1) = ((v >> 8) & 0xff).toByte
        c(off + 2) = ((v >> 16) & 0xff).toByte; c(off + 3) = ((v >> 24) & 0xff).toByte
        c
      }
      assert(Media.parseBmp(withLe32(bmp, 18, 1431655766)).isEmpty)
      assert(Media.parseBmp(withLe32(bmp, 18, 0x40000000)).isEmpty)
      assert(Media.parseBmp(withLe32(bmp, 22, Int.MinValue)).isEmpty)
      // extractFeatures reports the REAL header dims for bmp kind
      val feats = Media.extractFeatures(Seq((9L, bmp)).toDF("id", "blob"), "id", "blob")
        .collect().head
      assert((feats.kind, feats.width, feats.height) === (("bmp", 3L, 2L)))
    }

    it("REALLY decodes PNG pixels: inflate, all five filters, means, resize, rejects") {
      // 7 rows => filter types 0,1,2,3,4,0,1 all exercised (y % 5)
      val png = Media.syntheticPngImage(5, 7, 11L)
      val img = Media.parsePng(png).get
      assert((img.width, img.height) === ((5, 7)))
      // pixel closed form shared with the BMP fixture
      for (y <- 0 until 7; x <- 0 until 5)
        assert(img.pixel(x, y) === (((x + y) % 256, (y + 11) % 256, (x + 11) % 256)),
          s"pixel ($x,$y)")
      // decoded means equal the closed-form arithmetic
      val (w, h, mr, mg, mb) = Media.pngChannelMeans(img)
      val px = for (y <- 0 until 7; x <- 0 until 5) yield ((x + y) % 256, (y + 11) % 256, (x + 11) % 256)
      assert((w, h) === ((5L, 7L)))
      assert(mr === px.map(_._1.toLong).sum / 35)
      assert(mg === px.map(_._2.toLong).sum / 35)
      assert(mb === px.map(_._3.toLong).sum / 35)
      // real PNG->PNG nearest-neighbor resize: corners map to source corners
      val rimg = Media.parsePng(Media.resizePng(png, 10, 7).get).get
      assert((rimg.width, rimg.height) === ((10, 7)))
      assert(rimg.pixel(0, 0) === img.pixel(0, 0))
      assert(rimg.pixel(9, 6) === img.pixel(4, 6))
      // corrupt CRC, truncated IDAT, and header-only PNGs reject, not misread
      val badCrc = png.clone(); badCrc(png.length - 6) = (badCrc(png.length - 6) ^ 0x01).toByte
      val flipped = png.clone()
      flipped(40) = (flipped(40) ^ 0x7f).toByte // inside IDAT payload -> CRC fails
      assert(Media.parsePng(flipped).isEmpty)
      assert(Media.parsePng(png.dropRight(20)).isEmpty)
      assert(Media.parsePng(Media.syntheticPng(4, 4, Array.emptyByteArray)).isEmpty)
      // the DataFrame face decodes PNGs alongside BMPs now
      val df = Seq((1L, png), (2L, Media.syntheticBmp(3, 2, 7L))).toDF("id", "blob")
      val means = Media.pixelMeans(df, "id", "blob").collect().map(r => r.getLong(0)).toSet
      assert(means === Set(1L, 2L))
      val rz = Media.resize(df, "id", "blob", 4, 4)
        .as[(Long, String, Array[Byte])].collect().map(r => r._1 -> r._2).toMap
      assert(rz === Map(1L -> "png", 2L -> "bmp"))
    }

    it("REALLY decodes 16-bit PCM WAV samples: values, chunk walk, stats, rejects") {
      val wav = Media.syntheticWav(8000, 4, 100L)
      val w = Media.parseWav(wav).get
      assert((w.sampleRate, w.channels, w.nSamples) === ((8000, 1, 4)))
      // closed form s(i) = (i*37 + 100) % 2048 - 1024
      assert((0 until 4).map(w.sample) === Seq(-924, -887, -850, -813))
      assert(Media.wavStats(w) === ((8000L, 4L, 924L, (924L + 887 + 850 + 813) / 4)))
      // an ODD-size junk chunk before data: the walk must word-align past it
      val withJunk = wav.take(36) ++ "LIST".getBytes("US-ASCII") ++
        Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) ++ wav.drop(36)
      assert(Media.parseWav(withJunk).get.sample(0) === -924)
      // float (non-PCM) format and truncated data are rejected, not misread
      val floatWav = wav.clone(); floatWav(20) = 3
      assert(Media.parseWav(floatWav).isEmpty)
      assert(Media.parseWav(wav.dropRight(1)).isEmpty)
      // container sniff surfaces through the feature extractor
      val feats = Media.extractFeatures(Seq((1L, wav)).toDF("id", "blob"), "id", "blob")
        .collect().head
      assert(feats.kind === "wav")
    }

    it("frameDiffProfile: per-pair decoded pixel diff, wrap seam included") {
      // closed-form frames step every channel by exactly 1 per frame away
      // from the mod-256 seam: seed 0, 4x4, 3 frames -> every pixel d = 3,
      // so mean = 1 and max = 3 for both pairs
      val avi = Media.syntheticAvi(4, 4, 3, 0L)
      val got = Media.frameDiffProfile(Seq((1L, avi)).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
      assert(got.toSeq === Seq((1L, 0L, 1L, 3L), (1L, 1L, 1L, 3L)))
      // seed 254 pushes g/b channels across the wrap: pixels where
      // (y+254+f) % 256 == 255 jump |255| instead of |1| — max must see it
      val seam = Media.frameDiffProfile(
        Seq((2L, Media.syntheticAvi(4, 4, 2, 254L))).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long, Long)].collect().head
      assert(seam._4 > 3L, s"wrap seam not observed: $seam")
      // a single-frame video has no pair; junk bytes decode to nothing
      assert(Media.frameDiffProfile(
        Seq((1L, Media.syntheticAvi(4, 4, 1, 0L)), (2L, Array[Byte](1)))
          .toDF("id", "blob"), "id", "blob").count() === 0L)
    }

    it("sharpnessProfile: integer Laplacian-of-luma over real decodes, all formats") {
      // 3x3 all-black BMP with a white center: one interior pixel, luma 255
      // vs 0 neighbors -> |lap| = 4*255 = 1020; flat image -> 0
      val bmp = Media.syntheticBmp(3, 3, 0L)
      java.util.Arrays.fill(bmp, 54, bmp.length, 0.toByte)
      // bottom-up storage: image (1,1) lives at row h-1-1 = 1; stride 12
      bmp(54 + 12 + 3) = -1; bmp(54 + 12 + 4) = -1; bmp(54 + 12 + 5) = -1
      val flat = Media.syntheticBmp(3, 3, 0L)
      java.util.Arrays.fill(flat, 54, flat.length, 0.toByte)
      val got = Media.sharpnessProfile(
        Seq((1L, bmp), (2L, flat)).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq === Seq(
        (1L, 3L, 3L, 1L, 1020L, 1020L),
        (2L, 3L, 3L, 1L, 0L, 0L)))
      // the PNG decode path feeds the same kernel (same closed-form grid as
      // the BMP fixture family => scores must agree with a same-seed BMP)
      val pngScore = Media.sharpnessProfile(
        Seq((3L, Media.syntheticPngImage(8, 8, 5L))).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
      val bmpScore = Media.sharpnessProfile(
        Seq((3L, Media.syntheticBmp(8, 8, 5L))).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
      assert(pngScore === bmpScore)
      // no interior (2x5) and undecodable blobs drop
      assert(Media.sharpnessProfile(
        Seq((1L, Media.syntheticBmp(2, 5, 0L)), (2L, Array[Byte](9, 9)))
          .toDF("id", "blob"), "id", "blob").count() === 0L)
    }

    it("perceptualHash: cross-format identity, separation, tiny images, undecodable drop") {
      // identical pixel closed form across formats -> identical dHash
      val rows = Media.perceptualHash(Seq(
          (1L, Media.syntheticBmp(12, 9, 7L)),
          (2L, Media.syntheticPngImage(12, 9, 7L)),
          (3L, Media.syntheticJpegImage(32, 16, 3L)),
          (4L, Media.syntheticProgressiveJpegImage(32, 16, 3L)),
          (5L, Array[Byte](1, 2, 3)),
          (6L, null.asInstanceOf[Array[Byte]])).toDF("id", "blob"), "id", "blob")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(rows.keySet == Set(1L, 2L, 3L, 4L), "junk/null blobs must emit nothing")
      assert(rows(1L)._1 == "bmp" && rows(2L)._1 == "png")
      assert(rows(1L)._4 == rows(2L)._4, "same pixels, different formats -> same hash")
      assert(rows(3L)._4 == rows(4L)._4, "baseline vs progressive -> same hash")
      // a genuinely different picture differs in many bits: the BMP closed
      // form's luma rises along x (gradient bits set); its x-mirror falls
      val mirror = {
        val w = 12; val h = 9
        val src = Media.syntheticBmp(w, h, 7L)
        val out = src.clone()
        val stride = (w * 3 + 3) / 4 * 4
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          out(54 + y * stride + x * 3 + c) = src(54 + y * stride + (w - 1 - x) * 3 + c)
        out
      }
      val mh = Media.perceptualHash(Seq((9L, mirror)).toDF("id", "blob"), "id", "blob")
        .collect().head.getLong(4)
      assert(java.lang.Long.bitCount(mh ^ rows(1L)._4) > 16,
        s"mirror should flip many gradient bits: ${java.lang.Long.bitCount(mh ^ rows(1L)._4)}")
      // a 2x2 image still hashes (grid clamps, never out of bounds)
      assert(Media.perceptualHash(
        Seq((1L, Media.syntheticBmp(2, 2, 0L))).toDF("id", "blob"), "id", "blob")
        .count() === 1L)
    }

    it("hammingPairs: generalized banding equals brute force on arbitrary signatures") {
      // signatures engineered around the distance-3 boundary plus randoms
      val base = 0x0123456789abcdefL
      def flip(v: Long, bits: Int*): Long = bits.foldLeft(v)((a, b) => a ^ (1L << b))
      val sigs = Seq(
        (1L, base), (2L, flip(base, 0)), (3L, flip(base, 1, 17, 33)),
        (4L, flip(base, 2, 18, 34, 50)), (5L, ~base),
        (6L, 0L), (7L, flip(0L, 63)), (8L, flip(0L, 5, 21))).toDF("id", "sig")
      val got = Dedup.hammingPairs(sigs, "id", "sig", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val local = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = (for {
        (ia, sa) <- local; (ib, sb) <- local if ia < ib
        d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
      } yield (ia, ib, d.toLong)).toSet
      assert(want.nonEmpty && got == want)
    }

    it("audioWindowProfile: windowed energy + zero crossings over a real decode") {
      // 70 samples alternating +500 / -500: with win=32, windows of 32/32/6;
      // every in-window step flips sign -> zc = n_in_win - 1; energy = 500^2
      val n = 70
      val bytes = Media.syntheticWav(8000, n, 0L)
      var i = 0
      while (i < n) {
        val v = (if (i % 2 == 0) 500 else -500) & 0xffff
        bytes(44 + i * 2) = (v & 0xff).toByte
        bytes(44 + i * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val got = Media.audioWindowProfile(Seq((7L, bytes)).toDF("id", "blob"), "id", "blob", win = 32)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
      assert(got.toSeq === Seq(
        (7L, 0L, 32L, 250000L, 31L),
        (7L, 1L, 32L, 250000L, 31L),
        (7L, 2L, 6L, 250000L, 5L)))
      // a constant-sign window has zero crossings even at the boundary step
      val flat = Media.syntheticWav(8000, 3, 0L)
      var j = 0
      while (j < 3) { flat(44 + j * 2) = 7; flat(44 + j * 2 + 1) = 0; j += 1 }
      val g2 = Media.audioWindowProfile(Seq((1L, flat)).toDF("id", "blob"), "id", "blob", win = 32)
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(g2.toSeq === Seq((1L, 0L, 3L, 49L, 0L)))
      // non-WAV blobs drop
      assert(Media.audioWindowProfile(
        Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "blob"), "id", "blob").count() === 0L)
    }

    it("audioSpectralPeaks: FFT landmarks find planted tones, drop tails and non-WAV") {
      // two full windows at bins 5 and 19, plus a 40-sample tail (dropped)
      val tone = Media.syntheticToneWav(8000, 256, Array(5, 19), amp = 8000.0, offset = 0)
      val padded = java.util.Arrays.copyOf(tone, tone.length + 80)
      // fix RIFF/data sizes for the 40 extra (zero) samples
      def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
        b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
        b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
      }
      putLe32(padded, 4, 36 + 512 * 2 + 80); putLe32(padded, 40, 512 * 2 + 80)
      val got = Media.audioSpectralPeaks(Seq((3L, padded)).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long)].collect().sortBy(_._2)
      assert(got.toSeq === Seq((3L, 0L, 5L), (3L, 1L, 19L)))
      // stronger of two mixed tones wins the argmax
      val a = Media.syntheticToneWav(8000, 256, Array(7), amp = 9000.0, offset = 0)
      val b = Media.syntheticToneWav(8000, 256, Array(40), amp = 2000.0, offset = 0)
      val mixed = a.clone()
      var i = 0
      while (i < 256) {
        val sa = ((a(44 + i * 2) & 0xff) | (a(45 + i * 2) << 8)).toShort.toInt
        val sb = ((b(44 + i * 2) & 0xff) | (b(45 + i * 2) << 8)).toShort.toInt
        val s = sa + sb
        mixed(44 + i * 2) = (s & 0xff).toByte; mixed(45 + i * 2) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val g2 = Media.audioSpectralPeaks(Seq((1L, mixed)).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long)].collect()
      assert(g2.toSeq === Seq((1L, 0L, 7L)))
      assert(Media.audioSpectralPeaks(
        Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "blob"), "id", "blob").count() === 0L)
    }

    it("audioFingerprint: loudness/offset-invariant, content-sensitive, no-window drop") {
      val bins = Array(5, 19, 44, 101)
      def fp(amp: Double, off: Int, bs: Array[Int]): Long =
        Media.audioFingerprint(
          Seq((1L, Media.syntheticToneWav(8000, 256, bs, amp, off))).toDF("id", "blob"),
          "id", "blob").as[(Long, Long, Long)].collect().head._3
      val base = fp(8000.0, 0, bins)
      // same content, quieter and DC-shifted -> identical fingerprint
      assert(fp(3000.0, 50, bins) === base)
      assert(fp(12000.0, -200, bins) === base)
      // one landmark differs anywhere -> different fingerprint
      assert(fp(8000.0, 0, Array(5, 19, 45, 101)) !== base)
      assert(fp(8000.0, 0, Array(6, 19, 44, 101)) !== base)
      // order matters (FNV fold is positional)
      assert(fp(8000.0, 0, Array(19, 5, 44, 101)) !== base)
      // n_windows rides along; sub-window audio drops
      val rows = Media.audioFingerprint(
        Seq((1L, Media.syntheticToneWav(8000, 256, bins, 8000.0, 0)),
          (2L, Media.syntheticWav(8000, 100, 0L))).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long)].collect()
      assert(rows.map(r => (r._1, r._2)).toSet === Set((1L, 4L)))
    }

    it("fft: parseval + impulse sanity pins the kernel") {
      // impulse at 0: flat unit spectrum
      val re = new Array[Double](16); val im = new Array[Double](16)
      re(0) = 1.0
      Media.fft(re, im)
      assert((0 until 16).forall(k => math.abs(re(k) - 1.0) < 1e-12 && math.abs(im(k)) < 1e-12))
      // pure integer cosine at bin 3: energy concentrates at bins 3 and 13
      val re2 = Array.tabulate(16)(i => StrictMath.round(
        1000.0 * StrictMath.cos(2.0 * StrictMath.PI * 3 * i / 16)).toDouble)
      val im2 = new Array[Double](16)
      Media.fft(re2, im2)
      val mags = (0 until 16).map(k => re2(k) * re2(k) + im2(k) * im2(k))
      assert(mags(3) > 1e7 && mags(13) > 1e7)
      assert((0 until 16).filterNot(k => k == 3 || k == 13).forall(k => mags(k) < mags(3) / 100))
    }

    it("REALLY decodes uncompressed-DIB AVI frames: chunk walk, pixels, rejects") {
      val avi = Media.syntheticAvi(3, 2, 2, 5L)
      val v = Media.parseAvi(avi).get
      assert((v.width, v.height, v.nFrames) === ((3, 2, 2)))
      // frame f closed form: r=(x+y+f)%256, g=(y+5+f)%256, b=(x+5+f)%256
      assert(v.pixel(0, 0, 0) === ((0, 5, 5)))
      assert(v.pixel(1, 2, 1) === ((4, 7, 8)))
      val rows = Media.videoFrameMeans(Seq((3L, avi)).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
      assert(rows.length === 2)
      // frame 0: sr = sum(x+y) = 9 over 6 px -> 1; sg = (5*3 + 6*3)/6 = 5; sb = (5+6+7)*2/6 = 6
      assert(rows(0) === ((3L, 0L, 3L, 2L, 1L, 5L, 6L)))
      // a non-JPEG compressed stream chunk ('00dc' whose payload is the raw
      // DIB, no SOI signature) is rejected, not misdecoded
      val compressed = avi.clone()
      compressed(100 + 3) = 'c' // 00db -> 00dc of the first frame chunk id
      assert(Media.parseAvi(compressed).isEmpty)
      assert(Media.parseAvi(avi.dropRight(1)).isEmpty)
    }

    it("REALLY decodes MJPEG-in-AVI frames through the JPEG codec") {
      val avi = Media.syntheticMjpegAvi(16, 16, 3, 7L)
      val v = Media.parseAvi(avi).get
      assert((v.width, v.height, v.nFrames) === ((16, 16, 3)))
      assert((0 until 3).forall(v.isJpeg))
      // frame f is syntheticJpegImage(16,16, 7+f): block-constant luma
      // yv(bx,by) = (bx*7 + by*3 + 7+f) % 256, MCU-constant chroma — the
      // decoded samples must be bit-exact to the closed form
      val img1 = v.jpegImage(1).get
      assert((img1.width, img1.height) === ((16, 16)))
      assert(img1.ycc(0, 0) === ((8, 8, 16)))   // s = 8: bx=by=0
      assert(img1.ycc(9, 0) === ((15, 8, 16)))  // bx=1: 7+8
      assert(img1.ycc(0, 9) === ((11, 8, 16)))  // by=1: 3+8
      // videoFrameMeans explodes one row per frame with decoded dims
      val rows = Media.videoFrameMeans(Seq((5L, avi)).toDF("id", "blob"), "id", "blob")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
      assert(rows.length === 3)
      assert(rows.forall(r => r._3 == 16 && r._4 == 16))
      // a corrupted SOI signature on one frame rejects honestly: the chunk
      // no longer proves itself a JPEG, so the container is undecodable
      val corrupt = avi.clone()
      val idx = (0 until corrupt.length - 4).find(i =>
        corrupt(i) == '0'.toByte && corrupt(i + 1) == '0'.toByte &&
          corrupt(i + 2) == 'd'.toByte && corrupt(i + 3) == 'c'.toByte).get
      corrupt(idx + 8) = 0 // SOI first byte
      assert(Media.parseAvi(corrupt).isEmpty)
    }

    it("REALLY parses dimensions out of PNG IHDR and JPEG SOF headers") {
      val payload = "the pixel data would live here".getBytes("UTF-8")
      val png = Media.syntheticPng(640, 481, payload)
      val jpg = Media.syntheticJpeg(1023, 77, payload)
      // a JPEG whose SOF sits BEHIND an APP0 segment (the real-file layout):
      // the marker walk must skip segments by their length fields
      val app0 = Array[Int](0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0)
        .map(_.toByte)
      val jpgApp0 = {
        val sof = Media.syntheticJpeg(300, 200, Array.empty[Byte]).drop(2) // SOF0 segment only
        (Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof)
      }
      // spec-legal 0xFF fill bytes may pad before any marker — a walker that
      // treats a fill byte as a marker reads a bogus length and desyncs
      val jpgFill = {
        val sof = Media.syntheticJpeg(300, 200, Array.empty[Byte]).drop(2)
        (Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xff.toByte) ++ sof)
      }
      val df = Seq((1L, png), (2L, jpg), (3L, jpgApp0), (4L, jpgFill)).toDF("id", "blob")
      val got = Media.extractFeatures(df, "id", "blob").collect().map(m => m.id -> m).toMap
      assert((got(4L).width, got(4L).height) === (300L, 200L))
      assert(got(1L).kind === "png")
      assert((got(1L).width, got(1L).height) === (640L, 481L))
      assert(got(1L).n_bytes === 33L + payload.length) // sig(8) + len(4) + IHDR(17) + crc(4)
      assert(got(2L).kind === "jpeg")
      assert((got(2L).width, got(2L).height) === (1023L, 77L))
      assert(got(2L).n_bytes === 21L + payload.length)
      assert((got(3L).width, got(3L).height) === (300L, 200L))
      // the synthetic PNG's IHDR carries a spec-correct CRC32 (a real reader
      // would verify it before trusting the fields)
      val crc = new java.util.zip.CRC32
      crc.update(png, 12, 17)
      assert(crc.getValue === ((png(29) & 0xffL) << 24 | (png(30) & 0xffL) << 16 |
        (png(31) & 0xffL) << 8 | (png(32) & 0xffL)))
      // truncated magic-only blobs fall back to the documented fake decode
      val bare = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      val fb = Media.extractFeatures(Seq((9L, bare)).toDF("id", "blob"), "id", "blob")
        .collect().head
      assert((fb.width, fb.height) === (8L % 64, 8L % 48))
    }
  }
}
