package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-stress harness (not part of the driver contract): replicates a
 * testdata table 10x with shifted ids — every row 10-way duplicated, the
 * worst-case true-positive mass for a dedup verify step — and runs the
 * embedding dedup chain (q59's pipeline: LSH candidates -> exact-cosine
 * verify -> connected components -> canonical survivors) end to end,
 * printing per-stage wall seconds and cardinalities. The text analog (round-3
 * study) is recorded in BASELINE.md; this main keeps the embedding study
 * reproducible.
 *
 * A second mode (`runMain graft.Stress incremental [sfDir]`) stresses the
 * round-5 incremental probe: the sf documents become the STANDING corpus
 * (index built once), and a 10x batch — every standing doc copied 10 times
 * with shifted ids — probes it, the worst case for the cross-side expander
 * (each hit bucket holds 1 standing doc + 10 batch copies).
 *
 * A third mode (`runMain graft.Stress curation [sfDir]`) stresses the q75
 * end-to-end curation pass on the 10x corpus and checks EXACT scale
 * invariance: every replica dedups onto its original (smallest id), so the
 * 10x output must equal the 1x output row for row.
 *
 * Usage: runMain graft.Stress [mode] [sfDir] — the authoritative mode
 * list is the `modes` set in `main` below (a wrong mode fails loudly
 * and prints it); default sfDir /root/testdata/sf0.1.
 */
object Stress {
  def main(args: Array[String]): Unit = {
    val modes = Set("embed", "incremental", "curation", "snapshot", "events", "semantic", "retrieval", "rdd", "graph", "selection", "components", "store", "ivfcap", "standing", "kcore", "ann", "linkage", "allpairs", "knn", "lm", "crawl", "bpe", "bpefast", "unigram", "export", "opq", "tokens", "binary", "sft", "scale")
    val explicitMode = args.headOption.filter(modes)
    // a MISSPELLED mode must fail loudly, not silently run `embed` with the
    // typo as sfDir (the Verify query-filter convention): a bare first arg
    // is only accepted as sfDir when it actually is a directory
    args.headOption.foreach { a =>
      require(modes(a) || new java.io.File(a).isDirectory,
        s"unknown mode '$a' (expected one of ${modes.toSeq.sorted.mkString("|")} or an sfDir)")
    }
    val mode = explicitMode.getOrElse("embed")
    // an explicit mode token consumes args(0) — previously `Stress embed <dir>`
    // read "embed" as the sfDir
    val sfDir = args.drop(if (explicitMode.isDefined) 1 else 0)
      .headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "incremental") { incrementalStudy(spark, sfDir); spark.stop(); return }
    if (mode == "curation") { curationStudy(spark, sfDir); spark.stop(); return }
    if (mode == "tokens") { tokensStudy(spark, sfDir); spark.stop(); return }
    if (mode == "binary") { binaryStudy(spark, sfDir); spark.stop(); return }
    if (mode == "sft") { sftStudy(spark, sfDir); spark.stop(); return }
    if (mode == "snapshot") { snapshotStudy(spark, sfDir); spark.stop(); return }
    if (mode == "events") { eventsStudy(spark, sfDir); spark.stop(); return }
    if (mode == "semantic") { semanticStudy(spark, sfDir); spark.stop(); return }
    if (mode == "ivfcap") { ivfCapStudy(spark, sfDir); spark.stop(); return }
    if (mode == "retrieval") { retrievalStudy(spark, sfDir); spark.stop(); return }
    if (mode == "rdd") { rddStudy(spark, sfDir); spark.stop(); return }
    if (mode == "graph") { graphStudy(spark, sfDir); spark.stop(); return }
    if (mode == "selection") { selectionStudy(spark, sfDir); spark.stop(); return }
    if (mode == "components") { componentsStudy(spark, sfDir); spark.stop(); return }
    if (mode == "store") { storeStudy(spark, sfDir); spark.stop(); return }
    if (mode == "standing") { standingStudy(spark, sfDir); spark.stop(); return }
    if (mode == "kcore") { kcoreStudy(spark, sfDir); spark.stop(); return }
    if (mode == "ann") { annStudy(spark, sfDir); spark.stop(); return }
    if (mode == "linkage") { linkageStudy(spark, sfDir); spark.stop(); return }
    if (mode == "allpairs") { allPairsStudy(spark, sfDir); spark.stop(); return }
    if (mode == "knn") { knnStudy(spark, sfDir); spark.stop(); return }
    if (mode == "lm") { lmStudy(spark, sfDir); spark.stop(); return }
    if (mode == "crawl") { crawlStudy(spark, sfDir); spark.stop(); return }
    if (mode == "bpe") { bpeStudy(spark, sfDir); spark.stop(); return }
    if (mode == "bpefast") { bpeFastStudy(spark, sfDir); spark.stop(); return }
    if (mode == "unigram") { unigramStudy(spark, sfDir); spark.stop(); return }
    if (mode == "export") { exportStudy(spark, sfDir); spark.stop(); return }
    if (mode == "opq") { opqStudy(spark, sfDir); spark.stop(); return }
    if (mode == "scale") { scaleStudy(spark, sfDir); spark.stop(); return }

    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // 10 copies, ids shifted into disjoint ranges: every vector is a 10-clique
    val corpus = (0 until 10)
      .map(i => emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated)")(corpus.count())
    println(s"[stress] corpus rows: $n")

    // q59's chain at threshold 0.999, under two table geometries: the q59
    // default (8 bits x 8 tables — tuned for the natural corpus density) and
    // the 10x-density response (16 bits x 4 tables: bucket count scales with
    // the corpus, so the hot-bucket cap never bites and planted recall is
    // exact). Both geometries pack into the same 64-bit signature.
    for ((planes, tables) <- Seq((8, 8), (16, 4))) {
      val drops0 = operators.Dedup.droppedHotBuckets(spark).value
      val pairs = operators.Similarity
        .lshNearNeighbors(corpus, "vec_id", "embedding", 64,
          planesPerTable = planes, tables = tables, threshold = 0.999)
        .select(col("id_a"), col("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val nPairs = timed(s"[$planes bits x $tables tables] LSH candidates + cosine verify")(pairs.count())
      println(s"[stress] verified pairs: $nPairs (planted: ${n / 10} * 45 = ${n / 10 * 45})")

      val comps = timed(s"[$planes bits x $tables tables] connected components") {
        val c = operators.Dedup.connectedComponents(pairs)
        c.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER).count()
        c
      }
      val nClusters = comps.select(countDistinct(col("component"))).head().getLong(0)
      val survivors = timed(s"[$planes bits x $tables tables] canonical survivors (anti-join)") {
        val nonCanonical = comps.where(col("id") =!= col("component"))
          .select(col("id").as("vec_id"))
        corpus.select(col("vec_id")).join(nonCanonical, Seq("vec_id"), "left_anti").count()
      }
      val drops = operators.Dedup.droppedHotBuckets(spark).value - drops0
      println(s"[stress] clusters: $nClusters, survivors: $survivors (expected ${n / 10}), dropped hot buckets: $drops")
      pairs.unpersist(); comps.unpersist()
    }
    spark.stop()
  }

  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  /** 10x semantic-dedup stress (the q125 chain): centroid-blocked embedding
    * dedup on the corpus and on a 10x replica (every vector a 10-clique of
    * identical copies — worst-case duplicate mass). The quantizer is sized
    * to the corpus (k = n/500, the production rule that keeps the target
    * cell width FIXED as data grows, so within-cell compare stays linear in
    * n at constant cell size rather than O(n²)); identical vectors share an
    * argmax regardless of k, so every clique lands intact in one cell and
    * survivors must be scale-invariant: 10x survivors == 1x survivors. */
  private def semanticStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    import operators.{Dedup, Similarity}
    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
      .where(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))
      .persist(MEMORY_AND_DISK_SER)
    def run(label: String, corpus: DataFrame): Long = {
      val n = corpus.count()
      val k = math.max(4, (n / 500).toInt)
      val idx = timed(s"$label quantize+assign (k=$k)") {
        val i = Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nCentroids = k)
        i.assigned.persist(MEMORY_AND_DISK_SER); i.assigned.count(); i
      }
      val pairs = Similarity.centroidBlockedPairs(idx, 0.999).persist(MEMORY_AND_DISK_SER)
      val np = timed(s"$label within-cell verified pairs")(pairs.count())
      val dropped = timed(s"$label components + survivors")(
        Dedup.connectedComponents(pairs).where(col("id") =!= col("component")).count())
      println(s"[stress] $label: corpus=$n cells=$k pairs=$np survivors=${n - dropped}")
      idx.assigned.unpersist(); pairs.unpersist()
      n - dropped
    }
    val s1 = run("semantic 1x", emb)
    val corpus10 = (0 until 10)
      .map(i => emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_)).persist(MEMORY_AND_DISK_SER)
    corpus10.count()
    val s10 = run("semantic 10x", corpus10)
    println(s"[stress] survivor scale-invariance: 1x=$s1 10x=$s10 equal=${s1 == s10}")
    // the sized quantizer must never trip the occupancy cap (cells stay at
    // the target width by construction) — the ivfcap mode covers the
    // degenerate corpus where it MUST trip
    println(s"[stress] dropped hot cells: ${Similarity.droppedHotCells(spark).value} (expect 0)")
  }

  /** Degenerate single-cluster IVF stress: a 10x corpus where EVERY vector
    * is the same point, so the whole corpus collapses into one quantizer
    * cell — the adversarial shape that turns the within-cell exact verify
    * quadratic. With the occupancy cap the run must complete BOUNDED (the
    * hot cell drops whole: 0 pairs, droppedHotCells >= 1, wall time ~ one
    * narrow aggregate); the uncapped control on the same corpus pays the
    * full n(n-1)/2 expansion — printed side by side so the cap's value is
    * measured, not asserted. */
  private def ivfCapStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    import operators.Similarity
    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
      .where(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))
    // one fixed vector for every id: the worst-case single-cluster corpus
    val fixed = emb.limit(1).select(col("embedding").as("__fv"))
    val degen = (0 until 10)
      .map(i => emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id")))
      .reduce(_.unionByName(_))
      .crossJoin(broadcast(fixed))
      .select(col("vec_id"), col("__fv").as("embedding"))
      .persist(MEMORY_AND_DISK_SER)
    val n = degen.count()
    println(s"[stress] degenerate corpus rows: $n (all identical -> one cell)")
    val idx = timed("quantize+assign (k=16)") {
      val i = Similarity.buildIvfIndex(degen, "vec_id", "embedding", nCentroids = 16)
      i.assigned.persist(MEMORY_AND_DISK_SER); i.assigned.count(); i
    }
    val d0 = Similarity.droppedHotCells(spark).value
    val capped = timed("CAPPED centroid-blocked pairs (maxCell=1024)")(
      Similarity.centroidBlockedPairs(idx, 0.999, maxCell = 1024).count())
    val drops = Similarity.droppedHotCells(spark).value - d0
    println(s"[stress] capped: pairs=$capped droppedHotCells=$drops " +
      s"(expect pairs=0, dropped=1 — the hot cell drops whole, run stays bounded)")
    val uncapped = timed("UNCAPPED control (maxCell=n)")(
      Similarity.centroidBlockedPairs(idx, 0.999, maxCell = n.toInt).count())
    println(s"[stress] uncapped control: pairs=$uncapped " +
      s"(expect n*(n-1)/2 = ${n * (n - 1) / 2} — the quadratic mass the cap avoids)")
    idx.assigned.unpersist(); degen.unpersist()
  }

  /** 10x incremental-probe stress: standing docs indexed once, a 10x-copied
    * batch probes them. Every eligible copy (>= 3 tokens) must find its
    * original at jaccard 1.0 — exact planted recall, LSH certainty. */
  private def incrementalStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val docs = SparkEntry.tbl(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val index = operators.Dedup.minhashIndex(docs, "doc_id", "text").persist(MEMORY_AND_DISK_SER)
    timed("standing index build (one-time)")(index.count())

    val batch = (1 to 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_))
      .persist(MEMORY_AND_DISK_SER)
    val bn = timed("batch build (10x replicated)")(batch.count())

    // eligible = docs the minhash kernel signs (>= 3 segmentText tokens)
    import spark.implicits._
    val eligible = docs.as[(Long, String)]
      .filter(r => functions.Text.segmentText(r._2).length >= 3).count()
    val drops0 = operators.Dedup.droppedHotBuckets(spark).value
    val found = operators.Dedup.incrementalNearDups(
      index, docs, batch, "doc_id", "text", threshold = 0.99)
      .persist(MEMORY_AND_DISK_SER)
    val nFound = timed("incremental probe (batch sigs + cross pairs + verify)")(found.count())
    val planted = found.where(col("standing_id") === col("batch_id") % 10000000L).count()
    val drops = operators.Dedup.droppedHotBuckets(spark).value - drops0
    println(s"[stress] batch rows: $bn, eligible originals: $eligible, " +
      s"planted matches found: $planted / ${eligible * 10}, total pairs: $nFound, " +
      s"dropped hot buckets: $drops")
    found.unpersist(); batch.unpersist(); index.unpersist()
  }

  /** 10x curation stress: q75's five-stage pass over a 10x-replicated corpus.
    * Replicas carry shifted-UP ids, so `exactRows` keeps each content group's
    * original row — the 10x output must therefore EQUAL the 1x output exactly
    * (scale invariance), while the gates/scrub do 10x the narrow work and the
    * single dedup exchange carries 10x the survivors. */
  /** Fourth mode (`runMain graft.Stress snapshot [sfDir]`): the q79 snapshot
    * diff on a 10x corpus (ids shifted into disjoint bands that PRESERVE the
    * mod-10 class, so the q79 edit/delete rules act identically within each
    * band) with an exact scale-invariance check: every band's per-status
    * counts must equal the 1x counts — the diff is per-id and the join
    * carries (id, hash) only, so 10x data is 10 independent copies of the
    * same problem. */
  private def snapshotStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val base = SparkEntry.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    // band shift 10,000,000 is a multiple of 10: pmod(id, 10) is replica-invariant
    val old10 = (0 until 10)
      .map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_)).persist(MEMORY_AND_DISK_SER)
    println(s"[stress] old snapshot rows (10x): ${old10.count()}")

    // the q79 derivation, band-relative (`% 10000000 < 20` == `< 20` at 1x)
    def derive(old: DataFrame): DataFrame = {
      val edited = old.where(pmod(col("doc_id"), lit(10)) =!= 3)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(10)) === 7, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      val added = old.where(pmod(col("doc_id"), lit(10000000L)) < 20)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      edited.unionByName(added)
    }
    val one = timed("diff over 1x snapshot")(
      operators.Snapshot.diff(base, derive(base), "doc_id", "text")
        .groupBy("status").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // ONE 10x diff pass feeds both checks: totals roll up from the per-band
    // frame (recomputing the join for each check would time a warm second run)
    val bandCounts = timed("diff over 10x snapshot")(
      operators.Snapshot.diff(old10, derive(old10), "doc_id", "text")
        .groupBy(floor(col("doc_id") / 10000000L).as("band"), col("status")).count()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    val ten = bandCounts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // exact invariance: 10x counts are exactly 10 * 1x counts, per status
    val scaled = one.map { case (k, v) => k -> v * 10 }
    println(s"[stress] 1x counts: $one")
    println(s"[stress] 10x counts: $ten (expect exactly ${scaled})")
    // and per band: each of the 10 bands reproduces the 1x counts exactly
    val perBand = bandCounts.groupBy(_._2).view
      .mapValues(rows => (rows.map(_._3).distinct.size.toLong, rows.map(_._3).min)).toMap
    val bandsUniform = perBand.forall { case (st, (d, c)) => d == 1L && one.get(st).contains(c) }
    println(s"[stress] per-band uniformity: $perBand (every status: distinct_counts=1, cnt=1x) -> " +
      (if (ten == scaled && bandsUniform) "EXACT" else "MISMATCH"))
  }

  /** Fifth mode (`runMain graft.Stress events [sfDir]`): the round-6 ordered
    * event-stream operators (q103 funnel, q106 conversion lag) on a corpus of
    * 10x the USERS — each replica band carries the same per-user event
    * sequences under shifted user_ids, so both per-key streaming folds are
    * replica-invariant: the 10x funnel-depth histogram must be EXACTLY 10x
    * the 1x histogram, and the 10x lag multiset exactly 10 copies of the 1x
    * multiset. Exercises the groupSort core at 10x key cardinality (the
    * scaling axis a 100 TB event store actually grows along). */
  private def eventsStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    import spark.implicits._
    import graft.sorted.syntax._
    val ev = SparkEntry.tbl(spark, sfDir, "events")
      .where(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val ten = (0 until 10)
      .map(i => ev.select((col("user_id") + lit(i * 10000000L)).as("user_id"),
        col("ts"), col("event_id"), col("event_type")))
      .reduce(_.unionByName(_)).persist(MEMORY_AND_DISK_SER)
    println(s"[stress] event rows (10x users): ${ten.count()}")

    def funnelHist(df: DataFrame): Map[Long, Long] = {
      val ds = df.select($"user_id", struct($"ts", $"event_id", $"event_type").as("v"))
        .as[(Long, (Long, Long, String))]
      operators.Sessions.funnelStages(ds.groupSort(), Seq[((Long, Long, String)) => Boolean](
          _._3 == "view", _._3 == "click", _._3 == "purchase"))
        .toDF("user_id", "stage").groupBy("stage").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    def lagHist(df: DataFrame): Map[Long, Long] = {
      val ds = df.select($"user_id", struct($"ts", $"event_id", $"event_type").as("v"))
        .as[(Long, (Long, Long, String))]
      operators.Sessions.conversionLag(ds.groupSort())(
          isStart = _._3 == "view", isEnd = _._3 == "purchase", ticksOf = _._1 / 1000L)
        .toDF("user_id", "lag").groupBy("lag").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    val f1 = timed("funnel over 1x users")(funnelHist(ev))
    val f10 = timed("funnel over 10x users")(funnelHist(ten))
    val fOk = f10 == f1.map { case (k, v) => k -> v * 10 }
    println(s"[stress] funnel 1x: $f1")
    println(s"[stress] funnel 10x: $f10 -> " + (if (fOk) "EXACT 10x" else "MISMATCH"))

    val l1 = timed("conversion lag over 1x users")(lagHist(ev))
    val l10 = timed("conversion lag over 10x users")(lagHist(ten))
    val lOk = l10 == l1.map { case (k, v) => k -> v * 10 }
    println(s"[stress] lag multisets: 1x ${l1.size} distinct lags, 10x ${l10.size} -> " +
      (if (lOk) "EXACT 10x" else "MISMATCH"))
    ten.unpersist()
  }

  /** 10x retrieval stress: BM25 + PMI over a 10x-replicated documents table
    * (ids shifted into disjoint ranges, text identical). Invariants:
    *  - BM25 matches exactly 10x the docs (each copy matches iff its base
    *    does) and all 10 copies of a base doc score IDENTICALLY (score is a
    *    pure function of (tf, dl, df, N), which replication scales
    *    uniformly) — determinism across both corpus sizes;
    *  - PMI's ratio is exactly scale-invariant under replication
    *    (c_ab, c_a, c_b, T, P all scale x10 and the x10 factors cancel), so
    *    the top-20 collocation list must be IDENTICAL at 1x and 10x. Ranked
    *    here on the double ratio (the documented large-corpus path — the
    *    x100 integer form would overflow at 10x sf0.1's T^2).
    * Timings show both passes growing ~linearly with corpus mass. */
  private def retrievalStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val terms = Seq("spark", "vector", "merge")
    val docs = SparkEntry.tbl(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val corpus = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_)).persist(MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated)")(corpus.count())
    println(s"[stress] corpus rows: $n")

    val bm1 = operators.Retrieval.bm25(docs, "doc_id", "text", terms).persist(MEMORY_AND_DISK_SER)
    val m1 = timed("bm25 over 1x corpus")(bm1.count())
    val bm10 = operators.Retrieval.bm25(corpus, "doc_id", "text", terms).persist(MEMORY_AND_DISK_SER)
    val m10 = timed("bm25 over 10x corpus")(bm10.count())
    // every copy group carries ONE score
    val splitScores = bm10
      .groupBy((col("doc_id") % 10000000L).as("base_id"))
      .agg(countDistinct(col("bm25_scaled")).as("d"))
      .where(col("d") =!= 1L).count()
    println(s"[stress] bm25 matched 1x: $m1, 10x: $m10 (expect ${10 * m1}); " +
      s"copy groups with diverging scores: $splitScores (expect 0)")

    // minCount scales with the corpus (5 at 1x, 50 at 10x): a support
    // threshold is a RATE, not an absolute — kept absolute it would admit
    // rare (high-PMI) pairs at 10x that the 1x gate filtered
    def pmiTop20(src: DataFrame, minCount: Long): Seq[(String, String)] = {
      operators.Retrieval.pmiPairs(src, "text", minCount)
        // three SEPARATE divisions, each of two exactly-representable longs
        // (< 2^53 at 10x): (10a)/(10b) rounds to the SAME double as a/b
        // (identical real quotient), so each factor — and hence the product
        // and the ranking — is EXACTLY scale-invariant; the single fused
        // product c_ab*T^2 would exceed 2^53 at 10x and round differently
        // at the two scales
        .withColumn("r",
          (col("c_ab").cast("double") / col("c_a")) *
          (col("t_tok").cast("double") / col("t_pair")) *
          (col("t_tok").cast("double") / col("c_b")))
        .orderBy(col("r").desc, col("w1").asc, col("w2").asc).limit(20)
        .select(col("w1"), col("w2"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }

    val p1 = timed("pmi top-20 over 1x corpus")(pmiTop20(docs, 5L))
    val p10 = timed("pmi top-20 over 10x corpus")(pmiTop20(corpus, 50L))
    println(s"[stress] pmi top-20 scale-invariant: ${p1 == p10} (expect true)")
    bm1.unpersist(); bm10.unpersist(); corpus.unpersist()
  }

  /** 10x RDD-surface stress: the shuffle-time-sorted groupSort + an
    * ORDER-SENSITIVE per-key fold (a 31x+eid rolling hash — any mis-sorted
    * run changes it) over 10x the users (ids shifted into disjoint ranges,
    * event streams identical). Invariant: every copy of a user folds to
    * EXACTLY the base user's value — the sort the shuffle performs is a
    * pure function of the key's data, at any scale, under any partitioning.
    * Timings show the one-shuffle layout growing ~linearly with user mass. */
  private def rddStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    import spark.implicits._
    import graft.rdd.syntax._
    val ev = SparkEntry.tbl(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Long, Long)].rdd
      .map { case (u, ts, eid) => (u, (ts, eid)) }
    val base = ev.persist(MEMORY_AND_DISK_SER)
    val big = (0 until 10)
      .map(i => base.map { case (u, v) => (u + i * 10000000L, v) })
      .reduce(_ union _).persist(MEMORY_AND_DISK_SER)
    println(s"[stress] base rows: ${base.count()}, 10x rows: ${big.count()}")

    val vOrd = implicitly[Ordering[(Long, Long)]]
    def pathHash(rdd: org.apache.spark.rdd.RDD[(Long, (Long, Long))]) =
      rdd.groupSort(vOrd)
        .foldLeftByKey(17L)((acc, v) => acc * 31L + v._2) // order-sensitive
    val f1 = timed("groupSort + ordered fold over 1x users") {
      val r = pathHash(base).persist(MEMORY_AND_DISK_SER); r.count(); r
    }
    val h1 = f1.collectAsMap()
    f1.unpersist()
    val f10 = timed("groupSort + ordered fold over 10x users") {
      val r = pathHash(big).persist(MEMORY_AND_DISK_SER); r.count(); r
    }
    // all 10 copies of a user must fold identically AND equal the base:
    // distinct (base_id, hash) pairs == base user count, none disagreeing
    val pairs = f10.map { case (u, h) => (u % 10000000L, h) }.distinct()
      .persist(MEMORY_AND_DISK_SER)
    val nPairs = pairs.count()
    val wrong = pairs.filter { case (u, h) => !h1.get(u).contains(h) }.count()
    println(s"[stress] distinct (base, fold) pairs: $nPairs (expect ${h1.size}); " +
      s"disagreeing with base: $wrong (expect 0)")
    pairs.unpersist(); f10.unpersist(); big.unpersist(); base.unpersist()
  }

  private def curationStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val corpus = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("lang"), col("text")))
      .reduce(_.unionByName(_)).persist(MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated)")(corpus.count())
    println(s"[stress] corpus rows: $n")

    def pipeline(src: DataFrame): DataFrame = {
      val t = coalesce(col("text"), lit(""))
      val kept = src.where(functions.Text.qualityOk(t) && functions.Text.repetitionOk(t))
      val survivors = operators.Dedup.exactRows(kept, "doc_id", col("text"))
      operators.Sampling.stratifiedSample(survivors, "lang", "doc_id",
          Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.25)
        .select(col("doc_id"), col("lang"), functions.Text.scrubPii(col("text")).as("clean"))
    }

    val out10 = pipeline(corpus).persist(MEMORY_AND_DISK_SER)
    val n10 = timed("curation pass over 10x corpus")(out10.count())
    val out1 = pipeline(docs).persist(MEMORY_AND_DISK_SER)
    val n1 = timed("curation pass over 1x corpus")(out1.count())
    // exact scale invariance: rows of the two outputs must pair up 1:1
    // (each output is doc_id-unique, so "every row appears exactly twice in
    // the union" == set equality)
    val diff = out10.unionByName(out1)
      .groupBy("doc_id", "lang", "clean").count()
      .where(col("count") =!= 2).count()
    println(s"[stress] rows 10x: $n10, 1x: $n1, symmetric-diff rows: $diff (expect 0)")
    out10.unpersist(); out1.unpersist(); corpus.unpersist()
  }

  /** Upsert-store stress: build a DATA-SCALE keyed store (every lineitem
    * row keyed by (orderkey, linenumber-surrogate) — ~600k rows at sf0.1 —
    * hive-bucketed across 64 buckets), then measure what a SMALL batch
    * costs: the claim under test is that ingest reads and rewrites only
    * the touched buckets' mass, not the store's. Three measured rows tell
    * the story: a hash-UNIFORM ~500-key batch (touches essentially every
    * bucket — its gap vs the full build is merged-mass reduction), a
    * bit-identical REPLAY (effectively-once), and a bucket-LOCAL batch
    * confined to 1 of 64 buckets — the row that actually demonstrates
    * touched-bucket pruning. Winners are checked exactly throughout. */
  private def storeStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.sources.Sink
    val store = java.nio.file.Files.createTempDirectory("stress_store").resolve("s").toString
    val rows = SparkEntry.tbl(spark, sfDir, "lineitem")
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        lit(1L).as("version"),
        col("l_quantity").cast("long").as("qty"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // the synthetic lineitem carries duplicate (orderkey, linenumber)
    // pairs — the store's per-key winner rule collapses them, so the
    // expectation is the DISTINCT key count, not the row count; both
    // counts come out of ONE pass over the persisted frame
    val cnts = rows.agg(count(lit(1)).as("n"), countDistinct(col("id")).as("k")).head()
    val (nRowsIn, nKeys) = (cnts.getLong(0), cnts.getLong(1))
    println(s"[stress] store rows: $nRowsIn, distinct keys: $nKeys")
    timed("initial full build (all buckets)") {
      Sink.upsertBuckets(store, rows, "id", "version", nBuckets = 64)
    }
    val batch = rows
      .where(pmod(xxhash64(col("id")), lit(1000L)) < 1L) // ~0.1% of keys, hash-uniform
      .groupBy(col("id")).agg(max(col("qty")).as("qty"))
      .select(col("id"), lit(2L).as("version"), (col("qty") + 1000L).as("qty"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nBatch = batch.count()
    timed(s"incremental upsert ($nBatch rows)") {
      Sink.upsertBuckets(store, batch, "id", "version", nBuckets = 64)
    }
    val back = Sink.readStore(spark, store)
    val nRows = back.count()
    val nV2 = back.where(col("version") === 2L).count()
    println(s"[stress] read-back rows: $nRows (expect $nKeys); " +
      s"version-2 winners: $nV2 (expect $nBatch)")
    val fp1 = back.select(expr("bit_xor(xxhash64(id, version, qty))")).head().getLong(0)
    timed(s"REPLAYED upsert (same $nBatch rows)") {
      Sink.upsertBuckets(store, batch, "id", "version", nBuckets = 64)
    }
    val fp2 = Sink.readStore(spark, store)
      .select(expr("bit_xor(xxhash64(id, version, qty))")).head().getLong(0)
    println(s"[stress] replay row-set fingerprint equal: ${fp1 == fp2} (expect true)")
    batch.unpersist()
    // bucket-PROPORTIONALITY: a same-sized batch confined to ONE of the 64
    // buckets reads/rewrites 1/64 of the store mass — the hash-uniform
    // batch above touches essentially every bucket, so the gap between
    // these two rows is the touched-bucket discipline made visible
    val local = rows
      .where(pmod(xxhash64(col("id")), lit(64L)) === 0L)
      .where(pmod(xxhash64(col("id")), lit(7919L)) < 16L) // thin inside the bucket
      .groupBy(col("id")).agg(max(col("qty")).as("qty"))
      .select(col("id"), lit(3L).as("version"), col("qty"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nLocal = local.count()
    timed(s"bucket-local upsert ($nLocal rows, 1 of 64 buckets)") {
      Sink.upsertBuckets(store, local, "id", "version", nBuckets = 64)
    }
    val nV3 = Sink.readStore(spark, store).where(col("version") === 3L).count()
    println(s"[stress] version-3 winners: $nV3 (expect $nLocal)")
    local.unpersist(); rows.unpersist()
    // COMPACTION cycle: after the batches above the live buckets span
    // several epochs; compaction must collapse the committed view to one
    // epoch / one file per bucket with a BIT-IDENTICAL row set, after
    // which vacuum reclaims every older epoch
    def liveLayout(): (Int, Int) = {
      val root = new java.io.File(store)
      val epochs = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("e-"))
      val files = epochs.flatMap(e => Option(e.listFiles()).getOrElse(Array.empty))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .count(_.getName.endsWith(".parquet"))
      (epochs.length, files)
    }
    val (epBefore, filesBefore) = liveLayout()
    val fpPre = Sink.readStore(spark, store)
      .select(expr("bit_xor(xxhash64(id, version, qty))")).head().getLong(0)
    timed("compactStore (all live buckets -> one epoch)") {
      Sink.compactStore(spark, store)
    }
    Sink.vacuumStore(store)
    val (epAfter, filesAfter) = liveLayout()
    val fpPost = Sink.readStore(spark, store)
      .select(expr("bit_xor(xxhash64(id, version, qty))")).head().getLong(0)
    println(s"[stress] compaction: epochs $epBefore -> $epAfter (expect 1 after), " +
      s"data files $filesBefore -> $filesAfter (expect 64 = 1/bucket after), " +
      s"fingerprint identical: ${fpPre == fpPost} (expect true)")
    ()
  }

  /** STANDING-INDEX store round trip: for each of the three disk-backed
    * standing assets (IVF assignment + quantizer, banded minhash index,
    * BM25 postings), time the BUILD+WRITE session against the RELOAD
    * session and gate that the reloaded row set is fingerprint-identical
    * to an independent from-scratch rebuild — the invariant that makes
    * `ensureIvfIndex`/`ensureMinhashIndex`/`ensurePostings` safe to serve
    * from disk across sessions. At 100 TB the build side is a full corpus
    * scan + shuffle; the reload side is an index-mass parquet read, which
    * is why the load-or-build posture matters. */
  private def standingStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.sources.Sink
    import graft.operators.{Dedup, Retrieval, Similarity}
    val root = java.nio.file.Files.createTempDirectory("stress_standing").toString
    def fp(df: DataFrame): Long = {
      val cols = df.columns.map(col)
      df.select(xxhash64(struct(cols.toIndexedSeq: _*)).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    }
    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
    val docs = SparkEntry.tbl(spark, sfDir, "documents")

    // IVF: quantizer + assignment
    timed("IVF build+write (corpus scan, quantizer train, epoch write)") {
      val b = Similarity.buildIvfIndex(emb, "vec_id", "embedding", nCentroids = 16, trainIters = 1)
      Sink.writeIndex(Similarity.centroidsFrame(spark, b), s"$root/ivf_cent")
      Sink.writeIndex(b.assigned, s"$root/ivf_asg", partitionCols = Seq("cent_id"))
    }
    val ivfLoaded = Sink.readIndex(spark, s"$root/ivf_asg")
    val nIvf = timed("IVF reload (fresh-session load path)") { ivfLoaded.count() }
    // deterministic build: an independent rebuild IS the build-path row set
    val ivfRebuilt = Similarity
      .buildIvfIndex(emb, "vec_id", "embedding", nCentroids = 16, trainIters = 1).assigned
    println(s"[stress] IVF reload rows: $nIvf; " +
      s"reload==rebuild fingerprint: ${fp(ivfLoaded) == fp(ivfRebuilt)} (expect true)")

    // minhash banded index
    timed("minhash build+write") {
      Sink.writeIndex(Dedup.minhashIndex(docs, "doc_id", "text"),
        s"$root/minhash", partitionCols = Seq("band"))
    }
    val mhLoaded = Sink.readIndex(spark, s"$root/minhash")
    val nMh = timed("minhash reload") { mhLoaded.count() }
    println(s"[stress] minhash reload rows: $nMh; reload==rebuild fingerprint: " +
      s"${fp(mhLoaded) == fp(Dedup.minhashIndex(docs, "doc_id", "text"))} (expect true)")

    // BM25 postings
    timed("postings build+write") {
      Sink.writeIndex(
        Retrieval.buildPostings(docs, "doc_id", "text")
          .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(32L))),
        s"$root/postings", partitionCols = Seq("term_bucket"))
    }
    val poLoaded = Sink.readIndex(spark, s"$root/postings").drop("term_bucket")
    val nPo = timed("postings reload") { poLoaded.count() }
    println(s"[stress] postings reload rows: $nPo; reload==rebuild fingerprint: " +
      s"${fp(poLoaded) == fp(Retrieval.buildPostings(docs, "doc_id", "text"))} (expect true)")

    // PQ: codebooks + m-byte code frame (q174's standing asset)
    timed("PQ build+write (3 train passes + encode + epoch write)") {
      val b = Similarity.buildPqIndex(emb, "vec_id", "embedding",
        dim = 64, m = 16, ks = 256, trainIters = 3)
      Sink.writeIndex(Similarity.pqBooksFrame(spark, b), s"$root/pq_books")
      Sink.writeIndex(b.codes, s"$root/pq_codes")
    }
    val pqLoaded = Similarity.loadPqIndex(
      Sink.readIndex(spark, s"$root/pq_books"), Sink.readIndex(spark, s"$root/pq_codes"))
    val nPq = timed("PQ reload") { pqLoaded.codes.count() }
    val pqRebuilt = Similarity.buildPqIndex(emb, "vec_id", "embedding",
      dim = 64, m = 16, ks = 256, trainIters = 3)
    println(s"[stress] PQ reload rows: $nPq; reload==rebuild fingerprint: " +
      s"${fp(pqLoaded.codes) == fp(pqRebuilt.codes)} (expect true)")
    ()
  }

  /** EXACT k-core at data scale: a wider co-purchase graph (customer cut
    * 10x the q168 probe) peeled to fixpoint at several k, reporting
    * rounds-to-fixpoint, the peel-round distribution, and wall per round —
    * the evidence that the fixpoint loop's cost tracks rounds x
    * degree-aggregate (each round one degree aggregate over the LIVE edge
    * set, lineage checkpoint-truncated), not accumulated history. */
  private def kcoreStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Graph
    val buyers = SparkEntry.tbl(spark, sfDir, "orders").where(col("o_custkey") < 5000)
      .join(SparkEntry.tbl(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey").as("p"), col("o_custkey").as("c")).distinct()
    // single-shared-part edges (vs q168's >= 2 cut) on a 50x customer cut:
    // a much larger, denser graph whose peel fronts cascade deeper
    val edges = buyers.as("a").join(buyers.as("b"),
        col("a.p") === col("b.p") && col("a.c") < col("b.c"))
      .select(col("a.c").as("c1"), col("b.c").as("c2"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nEdges = edges.count()
    println(s"[stress] co-purchase graph: $nEdges edges")
    Seq(256, 320, 384).foreach { k =>
      val t0 = System.nanoTime()
      val res = Graph.kCoreExact(edges, "c1", "c2", k = k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val dist = res.groupBy(col("peel_round")).agg(count(lit(1)).as("n"))
        .orderBy(col("peel_round")).collect()
        .map(r => s"r${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      val converged = res.select(min(col("converged"))).head().getBoolean(0)
      val rounds = res.agg(max(col("peel_round"))).head().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[stress] k=$k%-3d rounds-to-fixpoint: $rounds, converged: $converged " +
        f"(expect true), wall: $wall%.2f s (${wall / math.max(rounds, 1)}%.2f s/round), " +
        s"peel distribution (r0 = survivors): $dist")
      res.unpersist()
    }
    edges.unpersist()
    ()
  }

  /** Incremental-components stress: a DATA-SCALE standing clustering (part
    * co-occurrence edges at full sf) absorbs a SMALL batch of bridge edges
    * two ways — incrementally (component-graph contraction) and from
    * scratch over the union — checking exact equality AND that the
    * incremental wall time is decoupled from the history size (the whole
    * point: the nightly batch must not pay for every historical edge). */
  private def componentsStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    import spark.implicits._
    val li = SparkEntry.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .persist(MEMORY_AND_DISK_SER)
    println(s"[stress] standing edges: ${edges.count()}")
    val standing = timed("standing clustering (from-scratch CC, paid once)") {
      val c = operators.Dedup.connectedComponents(edges).persist(MEMORY_AND_DISK_SER)
      c.count(); c
    }
    // batch: 200 bridges between vertices of DIFFERENT standing components
    // (deterministic pairing of the component list) + 100 never-seen ids
    val comps = standing.select(col("component")).distinct()
      .orderBy(col("component")).limit(400).as[Long].collect()
    require(comps.nonEmpty, "standing clustering yielded no components — nothing to stress")
    val bridges = comps.grouped(2).collect { case Array(a, b) => (a, b) }.toSeq
    val fresh = (0 until 100).map(i => (comps.head, 2000000000L + i))
    // no silent caps: the documented merge mass must be visible in the log
    println(s"[stress] batch: ${bridges.size} component bridges + ${fresh.size} never-seen ids " +
      s"(standing distinct components sampled: ${comps.length})")
    val batch = (bridges ++ fresh).toDF("a", "b").persist(MEMORY_AND_DISK_SER)
    batch.count()
    val inc = timed("incremental merge of the batch") {
      val r = operators.Dedup.incrementalComponents(standing, batch)
        .persist(MEMORY_AND_DISK_SER)
      r.count(); r
    }
    val scratch = timed("from-scratch CC over standing + batch edges") {
      val r = operators.Dedup.connectedComponents(
          edges.unionByName(batch.select(col("a").as("u"), col("b").as("v"))))
        .persist(MEMORY_AND_DISK_SER)
      r.count(); r
    }
    val diff = inc.unionByName(scratch).groupBy("id", "component").count()
      .where(col("count") =!= 2).count()
    println(s"[stress] incremental rows: ${inc.count()}, scratch rows: ${scratch.count()}, " +
      s"symmetric-diff rows: $diff (expect 0)")
    inc.unpersist(); scratch.unpersist(); batch.unpersist()
    standing.unpersist(); edges.unpersist()
  }

  /** 10x selection stress: DSIR-style importance scoring is a pure function
    * of the hashed-bigram DISTRIBUTIONS (target vs corpus), and uniform
    * replication multiplies every histogram cell and both totals by the
    * same factor — the cross-multiplied enrichment inequality
    * c_t·t_c > c_c·t_t is invariant under it, so every replica doc must
    * score bit-identically to its source. Integer arithmetic turns that
    * argument into an exact check (distinct folded rows == base rows),
    * and the timings show cost tracking corpus mass while the broadcast
    * histogram stays O(buckets) at any scale. */
  private def selectionStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val corpus = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("lang"), col("text")))
      .reduce(_.unionByName(_)).persist(MEMORY_AND_DISK_SER)
    println(s"[stress] corpus rows: ${corpus.count()}")
    def score(src: DataFrame): DataFrame =
      operators.Selection.importanceScore(src, "doc_id", "text",
        col("lang") === "en", nBuckets = 1024)
    val s1 = timed("importance scores over 1x corpus") {
      val r = score(docs).persist(MEMORY_AND_DISK_SER); r.count(); r
    }
    val s10 = timed("importance scores over 10x corpus") {
      val r = score(corpus).persist(MEMORY_AND_DISK_SER); r.count(); r
    }
    val folded = s10.select(pmod(col("doc_id"), lit(10000000L)).as("doc_id"),
        col("n_ngrams"), col("n_enriched"), col("score_bp"))
      .distinct().persist(MEMORY_AND_DISK_SER)
    val nBase = s1.count()
    val nFolded = folded.count()
    val diff = folded.unionByName(s1)
      .groupBy("doc_id", "n_ngrams", "n_enriched", "score_bp").count()
      .where(col("count") =!= 2).count()
    println(s"[stress] distinct folded score rows: $nFolded (expect $nBase); " +
      s"symmetric-diff rows: $diff (expect 0)")
    folded.unpersist(); s10.unpersist(); s1.unpersist(); corpus.unpersist()
  }

  /** 10x graph stress: part co-occurrence edges (parts sharing an order) at
    * full sf scale, then a 10x disjoint replica (both endpoints shifted into
    * per-copy id ranges). PageRank and the triangle census are both pure
    * functions of the edge set, so disjoint replication must change NOTHING
    * per copy: every copy's per-vertex rank equals the base's exactly, the
    * triangle count scales exactly 10x, and the clustering coefficient is
    * bit-identical — integer fixed-point arithmetic means "approximately
    * scale-invariant" never needs to be argued. Timings show the per-round
    * cost growing with |E|, not |E|² (degree orientation caps wedge work). */
  private def graphStudy(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    import graft.operators.Graph
    val li = SparkEntry.tbl(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val base = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .persist(MEMORY_AND_DISK_SER)
    val big = (0 until 10)
      .map(i => base.select((col("u") + lit(i * 1000000000L)).as("u"),
        (col("v") + lit(i * 1000000000L)).as("v")))
      .reduce(_.unionByName(_)).persist(MEMORY_AND_DISK_SER)
    println(s"[stress] base edges: ${base.count()}, 10x edges: ${big.count()}")

    def sym(e: DataFrame) =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val pr1 = timed("pageRank 3 iters over 1x edges") {
      val r = Graph.pageRank(sym(base), "u", "v", iterations = 3)
        .persist(MEMORY_AND_DISK_SER)
      r.count(); r
    }
    val pr10 = timed("pageRank 3 iters over 10x edges") {
      val r = Graph.pageRank(sym(big), "u", "v", iterations = 3)
        .persist(MEMORY_AND_DISK_SER)
      r.count(); r
    }
    // every copy's rank must equal the base rank of its source vertex:
    // distinct (base_id, rank) pairs == base vertex count, disagreements 0
    val folded = pr10.select(pmod(col("id"), lit(1000000000L)).as("id"), col("rank_scaled"))
      .distinct().persist(MEMORY_AND_DISK_SER)
    val nBase = pr1.count()
    val nPairs = folded.count()
    val wrong = folded.unionByName(pr1).groupBy("id", "rank_scaled").count()
      .where(col("count") =!= 2).count()
    println(s"[stress] distinct (base, rank) pairs: $nPairs (expect $nBase); " +
      s"symmetric-diff rows: $wrong (expect 0)")
    folded.unpersist(); pr1.unpersist(); pr10.unpersist()

    val t1 = timed("triangle census over 1x edges") {
      Graph.triangleStats(base, "u", "v").collect().head
    }
    val t10 = timed("triangle census over 10x edges") {
      Graph.triangleStats(big, "u", "v").collect().head
    }
    println(s"[stress] 1x census (V, E, wedges, tri, bp): $t1")
    println(s"[stress] 10x triangles: ${t10.getLong(3)} (expect ${10 * t1.getLong(3)}); " +
      s"10x clustering bp: ${t10.getLong(4)} (expect ${t1.getLong(4)})")
    big.unpersist(); base.unpersist()
  }

  /** ANN family bake-off on the natural corpus: every search path's build
    * wall, query wall, and recall@10 against the exact brute-force ranking
    * for the same 64-query batch — the measured evidence behind the
    * bytes-vs-recall claims in the PQ/IVF scaladocs (recall on these
    * near-random synthetic embeddings is the WORST case; structured real
    * embeddings cluster and every approximate path improves). */
  private def annStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Similarity
    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 64)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = timed("brute force (exact baseline) query")(
      pairSet(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)))
    def recall(got: Set[(Long, Long)]): Double =
      math.round(got.intersect(exact).size.toDouble / exact.size * 1000) / 1000.0

    val int8 = timed("int8 quantized query")(
      pairSet(Similarity.quantizedTopK(queries, emb, "vec_id", "embedding", 10)))
    println(s"[stress] int8 recall@10: ${recall(int8)} (4x compression)")

    val ivf = timed("IVF build (16 cells, 1 train round)")(
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", nCentroids = 16, trainIters = 1))
    ivf.assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER).count()
    for (p <- Seq(4, 8)) {
      val got = timed(s"IVF probe nProbe=$p query")(
        pairSet(Similarity.ivfProbe(ivf, queries, "vec_id", "embedding", 10, nProbe = p)))
      println(s"[stress] IVF nProbe=$p recall@10: ${recall(got)} (full vectors, ~$p/16 corpus scanned)")
    }

    val pq = timed("PQ build (m=16, ks=256, 3 train rounds)")(
      Similarity.buildPqIndex(emb, "vec_id", "embedding", dim = 64, m = 16, ks = 256, trainIters = 3))
    pq.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER).count()
    val adc = timed("PQ ADC-only query")(
      pairSet(Similarity.pqTopK(pq, queries, "vec_id", "embedding", 10)))
    println(s"[stress] PQ ADC recall@10: ${recall(adc)} (16-byte codes, ~16x compression)")
    val pqRr = timed("PQ over-fetch 50 + exact re-rank query") {
      val c = Similarity.pqTopK(pq, queries, "vec_id", "embedding", 50)
      pairSet(Similarity.rerankExact(c, queries, emb, "vec_id", "embedding", 10))
    }
    println(s"[stress] PQ+rerank50 recall@10: ${recall(pqRr)}")

    val ivfpq = timed("IVF-PQ nProbe=8 + rerank50 query") {
      val c = Similarity.ivfPqTopK(ivf, pq, queries, "vec_id", "embedding", 50, nProbe = 8)
      pairSet(Similarity.rerankExact(c, queries, emb, "vec_id", "embedding", 10))
    }
    println(s"[stress] IVF-PQ nProbe=8 + rerank50 recall@10: ${recall(ivfpq)} " +
      s"(~8/16 corpus in CODE bytes + ${64 * 50} exact pairs; n=$n)")

    // residual IVFADC: same bytes per row as the raw-code IVF-PQ (m code
    // bytes + one recon_n2 double) — the frontier point measures what the
    // residual target buys at EQUAL index footprint
    val ivfadc = timed("residual IVFADC build (m=16, ks=256, 3 train rounds)")(
      Similarity.buildIvfPqIndex(ivf, dim = 64, m = 16, ks = 256, trainIters = 3))
    ivfadc.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER).count()
    val resAdc = timed("residual IVFADC ADC-only full-probe query")(
      pairSet(Similarity.ivfadcTopK(ivfadc, queries, "vec_id", "embedding", 10, nProbe = 16)))
    println(s"[stress] residual IVFADC ADC recall@10: ${recall(resAdc)} " +
      "(equal bytes vs PQ ADC above — the residual-encoding gain)")
    val resRr = timed("residual IVFADC nProbe=8 + rerank50 query") {
      val c = Similarity.ivfadcTopK(ivfadc, queries, "vec_id", "embedding", 50, nProbe = 8)
      pairSet(Similarity.rerankExact(c, queries, emb, "vec_id", "embedding", 10))
    }
    println(s"[stress] residual IVFADC nProbe=8 + rerank50 recall@10: ${recall(resRr)}")

    // hierarchical edition: same m x ks bytes, cells reached through the
    // two-level quantizer (4x4 = the flat 16-cell geometry) — the frontier
    // point that measures what the product-structure partition costs at
    // equal probe fraction (expect slightly under the flat residual point;
    // the hierarchy's payoff is routing cost at cell counts the flat
    // quantizer cannot reach)
    val ivf2 = timed("two-level IVF build (4x4 cells, 1 train round)")(
      Similarity.buildIvfIndex2(emb, "vec_id", "embedding", k1 = 4, k2 = 4,
        trainIters = 1, expand = 4))
    val res2 = timed("hierarchical residual IVFADC build (m=16, ks=256, 3 train rounds)")(
      Similarity.buildIvfPqIndex2(ivf2, dim = 64, m = 16, ks = 256, trainIters = 3))
    res2.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER).count()
    val res2Rr = timed("hierarchical IVFADC nProbe=8 + rerank50 query") {
      val c = Similarity.ivfadc2TopK(res2, queries, "vec_id", "embedding", 50, nProbe = 8)
      pairSet(Similarity.rerankExact(c, queries, emb, "vec_id", "embedding", 10))
    }
    println(s"[stress] hierarchical IVFADC nProbe=8 + rerank50 recall@10: ${recall(res2Rr)} " +
      "(equal bytes and probe fraction vs the flat residual point above)")

    // ROUTING-COST contrast at production cell counts: a flat 4096-cell
    // quantizer routes every vector through 4096 centroid cosines and
    // ships a 4096 x dim closure; the two-level 64 x 64 grid reaches the
    // same cell count through (64 + expand*64) composed scores. Both
    // assignments are forced end to end (count) — the wall-clock ratio is
    // the sublinearity the hierarchy buys (expect two-level SEVERAL times
    // faster; exact ratio is geometry-dependent).
    // enough vector mass that per-vector routing flops dominate fixed task
    // costs — the regime the contrast is ABOUT (at 22k vectors both sides
    // measured ~1 s of setup noise)
    val reps = math.max(1, (4096 * 25 / n + 1).toInt)
    val big = (0 until reps)
      .map(i => emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val bigN = big.count()
    // train OUTSIDE the timer (seed collection and the residual pass are
    // one-time build costs); the timed section is the ROUTING pass alone —
    // one corpus scan + per-vector cell argmax, the recurring cost every
    // (re-)assignment and every query batch pays
    val flatIdx = Similarity.buildIvfIndex(big, "vec_id", "embedding",
      nCentroids = 4096, trainIters = 0)
    val twoIdx = Similarity.buildIvfIndex2(big, "vec_id", "embedding",
      k1 = 64, k2 = 64, trainIters = 0, expand = 4)
    val tFlat0 = System.nanoTime()
    flatIdx.assigned.count()
    val tFlat = (System.nanoTime() - tFlat0) / 1e9
    val tTwo0 = System.nanoTime()
    twoIdx.assigned.count()
    val tTwo = (System.nanoTime() - tTwo0) / 1e9
    println(f"[stress] 4096-cell ROUTING pass over $bigN vectors: " +
      f"flat $tFlat%.1f s vs two-level $tTwo%.1f s (${tFlat / tTwo}%.1fx; " +
      f"per-vector ops 4096*dim vs (64+64)*dim + ${4 * 64} O(1) combines — expect multiple-x)")
    big.unpersist()
    emb.unpersist(); ()
  }

  /**
   * `linkage` — the blocked fuzzy join under boilerplate pressure: the
   * sf0.1 part names (natural, block-diverse) plus 5k planted rows
   * sharing ONE near-identical boilerplate string (the crawl
   * footer/template shape that re-quadratizes any uncapped pair source).
   * Right side = every key with one char deleted at id%len (q186's
   * perturbation). Checks, in order: (1) the join COMPLETES with the cap
   * on — the boilerplate block alone would contribute ~25M candidate
   * pairs uncapped; (2) every NATURAL part still links to its perturbed
   * twin (recall is untouched by the cap, because natural blocks stay
   * cold); (3) the dropped-block count is nonzero and observable — the
   * production monitoring signal.
   */
  private def linkageStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.FuzzyJoin
    val natural = SparkEntry.tbl(spark, sfDir, "part")
      .where(col("p_partkey").isNotNull && col("p_name").isNotNull)
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nNatural = natural.count()
    // 5000 DISTINCT template keys, varied only in the middle: all land in
    // the same prefix-3 and suffix-3 blocks of the distinct-key space —
    // the shape the cap exists for (identical keys would collapse to one
    // distinct entry and cost nothing)
    val boiler = spark.range(5000).select(
      (col("id") + 10000000L).as("id"),
      concat(lit("zzz template "), col("id").cast("string"),
        lit(" footer zzz")).as("name"))
    val left = natural.unionByName(boiler)
    val pos = pmod(col("id"), length(col("name")).cast("long")) + 1
    val right = left.select((col("id") + 40000000L).as("id"),
      concat(col("name").substr(lit(1), pos - 1),
        col("name").substr(pos + 1, length(col("name")).cast("long"))).as("name"))
    println(s"[stress] left rows: ${nNatural + 5000} ($nNatural natural + 5000 boilerplate); " +
      "uncapped boilerplate block alone ~25M pairs")
    val res = FuzzyJoin.blockedFuzzyJoin(
      left, "id", "name", right, "id", "name",
      maxDist = 1, blockLen = 3, maxBlock = 1024)
    val pairs = timed("blocked fuzzy join (cap 1024)")(
      res.pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val nPairs = pairs.count()
    val dropped = res.droppedBlocks.head().getLong(0)
    // (2): every natural part's perturbed twin found (dist <= 1 by construction)
    val selfFound = pairs
      .where(col("right_id") === col("left_id") + 40000000L && col("left_id") < 10000000L)
      .count()
    println(s"[stress] verified pairs: $nPairs; dropped hot blocks: $dropped " +
      "(expect > 0: the boilerplate blocks)")
    println(s"[stress] natural self-links found: $selfFound / $nNatural " +
      "(expect equal: cap never touches cold natural blocks)")
    require(selfFound == nNatural, "recall loss on cold blocks — cap misfired")
    require(dropped > 0, "boilerplate block was not dropped — cap inert")
    pairs.unpersist(); natural.unpersist(); ()
  }

  /**
   * `allpairs` — the q189 inverted-index self-join under boilerplate
   * pressure: the sf0.1 documents each carrying a planted 12-TOKEN FOOTER
   * (every footer shingle's df = corpus size — the shared crawl-footer
   * shape whose posting lists alone would contribute ~n²/2 candidate
   * pairs EACH), plus exact copies of the first 200 docs. Checks, in
   * order: (1) the join COMPLETES with the df cap on; (2) the footer
   * shingles are dropped AND counted; (3) every planted copy whose
   * capped vector is nonempty still pairs with its original at exact
   * cosine 1 (dot == na2 == nb2) — the expected count is derived from
   * the df frame itself, so the check is exact, not a bound.
   */
  private def allPairsStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Retrieval
    val footer = " zz quick brown foxes stamp every crawled page with this very footer line"
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), concat(col("text"), lit(footer)).as("text"))
    val planted = docs.where(col("doc_id") < 200)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val corpus = docs.unionByName(planted)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = corpus.count()
    println(s"[stress] corpus: $n docs, every one carrying the 12-token footer " +
      s"(uncapped contribution ~${n * n / 2} pairs per footer shingle)")
    val words = graft.functions.Text.edgeStrippedTokens(col("text"))
    val postings = timed("build shingle postings")(
      corpus.select(col("doc_id"), words.as("tk")).where(size(col("tk")) >= 3)
        .select(col("doc_id"),
          explode(graft.functions.Text.trigramShingles(col("tk"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    postings.count()
    // expected planted matches: originals whose CAPPED vector is nonempty
    // (>= 1 shingle with df <= 10 in the augmented corpus)
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val expected = postings.join(dfreq.where(col("df") <= 10), Seq("term"))
      .where(col("doc_id") < 200).select(col("doc_id")).distinct().count()
    val res = Retrieval.allPairsCosine(postings, "doc_id",
      maxDf = 10L, thrNum = 1L, thrDen = 2L)
    val pairs = timed("all-pairs cosine (maxDf 10)")(
      res.pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val nPairs = pairs.count()
    val dropped = res.droppedTerms.head().getLong(0)
    val plantedFound = pairs
      .where(col("id_b") === col("id_a") + 5000000L && col("id_a") < 200 &&
        col("dot") === col("na2") && col("na2") === col("nb2"))
      .count()
    println(s"[stress] verified pairs: $nPairs; dropped stop-shingles: $dropped " +
      "(expect >= 12: the footer shingles at minimum)")
    println(s"[stress] planted copies at exact cosine 1: $plantedFound / $expected " +
      "expected (expect equal: cap drops never touch discriminative-content recall)")
    require(dropped >= 12, "footer shingles were not dropped — df cap inert")
    require(plantedFound == expected, "recall loss on planted copies — cap misfired")
    pairs.unpersist(); postings.unpersist(); corpus.unpersist(); ()
  }

  /**
   * `knn` — the q191 corpus-to-corpus kNN graph at 11x replica scale:
   * every sf0.1 vector replicated 10x (ids + r*1e6 — a 10-clique at
   * cosine 1 whose members share one argmax cell by construction), built
   * over a 64-cell quantizer. Checks, in order: (1) the graph COMPLETES
   * over ~22k vectors with k=8/nProbe=4 and zero dropped cells under the
   * wide cap; (2) clique recall: a query's top-8 must be (essentially
   * all) its own replicas — the planted-certainty law at scale; (3) a
   * second run with 1,300 planted copies of ONE vector under the default
   * 1024 cap drops that hot cell, counts it, completes, and no surviving
   * edge points into a dropped member.
   */
  /** LM perplexity filter at replica scale (the q196/q197 chain): the
    * claim under stress is the Heaps-law scale posture — MODEL FRAMES ARE
    * VOCABULARY-BOUNDED, so a 10x corpus changes no model row count, only
    * the counts inside (exactly x10, by additivity — an integer claim,
    * checked row-for-row). Scoring stays corpus-linear and the zz-OOV
    * garbage gate stays certain at scale. */
  /** SCALING-EXPONENT study for the heavy composed pipelines (q204
    * release, q186 fuzzy join, q189 all-pairs cosine, q191 kNN graph):
    * run each against a 1x and a 10x corpus written to disk, record wall
    * seconds, output rows, and the measured exponent
    * log10(t10/t1) — ~1.0 = linear. Replication semantics, stated
    * honestly: a 10x REPLICA multiplies duplicate mass, so pair-emitting
    * operators legitimately grow their OUTPUT superlinearly (10 copies of
    * a doc are 45 extra true pairs) — the study prints output rows so a
    * super-linear time with matching output growth reads as output cost,
    * not plan failure. q186's replicas get replica-tagged names (block
    * sizes stay realistic; untagged replicas would x100 every block). */
  private def scaleStudy(spark: SparkSession, sfDir: String): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft-scale").toString
    def writeScale(nReps: Int): String = {
      val dir = s"$root/x$nReps"
      def rep(table: String, idCol: String, tag: Option[String]): Unit = {
        val t = SparkEntry.tbl(spark, sfDir, table)
        (0 until nReps).map { i =>
          val shifted = t.withColumn(idCol, col(idCol) + lit(i * 100000000L))
          tag match {
            // replica tag INSIDE the name (after char 3, >= 2 chars apart
            // across replicas): prefix-3 and suffix-3 blocks keep their
            // natural diversity (a leading tag would collapse every prefix
            // block onto the tag) and cross-replica names stay > 1 edit
            // apart, so replicas never link to each other
            case Some(c) => shifted.withColumn(c,
              concat(substring(col(c), 1, 3), lit(s"q$i$i"), expr(s"substring($c, 4)")))
            case None => shifted
          }
        }.reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(s"$dir/$table.parquet")
      }
      rep("documents", "doc_id", None)
      rep("part", "p_partkey", Some("p_name"))
      rep("embeddings", "vec_id", None)
      dir
    }
    val dir1 = writeScale(1)
    val dir10 = writeScale(10)
    val queries = Seq("q204_release_pipeline", "q186_fuzzy_join",
      "q189_allpairs_cosine", "q191_knn_graph")
    for (q <- queries) {
      def run(dir: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = try SparkEntry.queries(q)(spark, dir).count()
        finally SparkEntry.drainCleanups()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      run(dir1) // warm-up: JIT + codegen caches, untimed
      val (t1, n1) = run(dir1)
      val (t10, n10) = run(dir10)
      val exp = math.log10(t10 / t1)
      println(f"[stress] $q: 1x $t1%.1f s / $n1 rows; 10x $t10%.1f s / $n10 rows; " +
        f"exponent ${exp}%.2f (output grew ${n10.toDouble / math.max(n1, 1)}%.1fx — " +
        "super-linear time with matching output growth is pair mass, not plan failure)")
    }
  }

  /** BPE batched-induction study: learn 256 merges over the sf corpus with
    * the strict-dominance batch (exact, see learnMergesBatched) and measure
    * the distributed round count — the whole point of batching is
    * rounds << merges. Gates batched == sequential-reference on a sampled
    * vocabulary prefix as a sanity cross-check at scale. */
  /** The tokenizer studies' shared corpus shapes — ONE definition because
    * `bpe`, `bpefast`, and `unigram` quote each other's numbers, so their
    * corpora must stay byte-identical: `wideCorpus` draws ~50k distinct
    * hash-derived base-36 words at weight ~1 (10 per doc);
    * `zipfReplicated` replays it under 1..13-fold doc replication — the
    * Zipf-weighted real-corpus shape. */
  private def wideCorpus(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame =
    SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), concat_ws(" ",
        transform(sequence(lit(1), lit(10)),
          i => conv(pmod(xxhash64(col("text"), i),
            lit(2821109907456L)).cast("string"), 10, 36))).as("text"))

  private def zipfReplicated(wide: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    wide.select(col("text"),
        explode(sequence(lit(1), (pmod(col("doc_id"), lit(13L)) + 1).cast("int"))).as("__r"))
      .select(col("text"))

  private def bpeStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Bpe
    import spark.implicits._
    val nMerges = 256
    val base = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val natural = base.select(col("text"))
    // Three corpus shapes, because the EXACT batch's rate is a function of
    // pair-count diversity, not of the operator: (a) the sf documents draw
    // from a ~31-word template vocabulary — counts tie constantly and
    // batches collapse to ~1; (b) a wide vocabulary of ~50k distinct
    // hash-derived base-36 words at weight ~1 each — diverse counts early
    // (rate >2), tie-dense unit counts late; (c) the same wide vocabulary
    // with 1..13-fold document replication — the Zipf-weighted shape of a
    // real corpus, where weighted sums keep the tail diverse. At real
    // corpus mass (counts in the millions at merge 32k) exact ties are
    // rare and the rate approaches the batch size.
    val wide = wideCorpus(spark, sfDir)
    val zipf = zipfReplicated(wide)
    for ((label, corpus) <- Seq(
        ("natural", natural), ("wide-vocab", wide.select(col("text"))),
        ("wide-zipf", zipf))) {
      val docs = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val n = timed(s"[$label] corpus build")(docs.count())
      // sequential reference computed ONCE driver-locally (study tool only —
      // the vocabulary fits a driver; the OPERATOR never collects it)
      val vocab = docs
        .select(explode(graft.functions.Text.edgeStrippedTokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val (ref, _) = timedValue(
        s"[$label] driver-local sequential reference (${vocab.size} distinct words, $n rows)") {
        Bpe.learnMergesLocal(vocab, nMerges)
      }
      for (m <- Seq(32, 64)) {
        val ((merges, sizes), secs) = timedValue(s"[$label] learn $nMerges merges at batchSize=$m") {
          Bpe.learnMergesBatchedWithRounds(docs, "text", nMerges, m)
        }
        val rounds = sizes.length
        // the batch rate GROWS as merges diversify the symbol inventory
        // (early rounds over a raw character alphabet are overlap-heavy):
        // report the per-quartile rate so the trend is the recorded fact
        val quartiles = if (rounds >= 4) {
          val qs = sizes.grouped(math.max(1, rounds / 4)).take(4).toSeq
          qs.map(q => f"${q.sum.toDouble / q.length}%.1f").mkString("/")
        } else sizes.mkString(",")
        println(f"[stress] [$label] batchSize=$m%3d: ${merges.size} merges in $rounds rounds " +
          f"(${merges.size.toDouble / rounds}%.1f merges/round; per-quartile $quartiles), " +
          f"$secs%.1f s (rate tracks pair-count DIVERSITY: ties and symbol overlaps " +
          "in the top ranking collapse the exact batch toward 1)")
        require(merges == ref,
          s"batched(m=$m) diverged from the sequential reference at scale")
        println(s"[stress] [$label] batchSize=$m: sequence == sequential reference (expect true)")
      }
      docs.unpersist(): Unit
    }
  }

  /**
   * The collect-once production trainer path at its REAL workload: a
   * 32,768-merge vocabulary — the scale the round-10 verdict named as
   * unreachable under round-per-merge distributed learning (32k
   * sequential Spark jobs; ~10k rounds even under the exact batch).
   * Exactness is gated by prefix: the incremental learner's first 256
   * merges must equal the naive full-recount reference (the same
   * reference `Stress bpe` gates the distributed rounds against, so all
   * three implementations are pinned to one sequence); BpeSpec
   * property-gates fast ≡ naive to exhaustion on adversarial vocabs.
   * The corpus is the wide-zipf shape (Zipf-weighted 50k-word
   * vocabulary — the real-corpus ranking structure).
   */
  private def bpeFastStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Bpe
    import spark.implicits._
    val zipf = zipfReplicated(wideCorpus(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (wide-zipf)")(zipf.count())
    val vocab = zipf
      .select(explode(graft.functions.Text.edgeStrippedTokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    println(s"[stress] wide-zipf: ${vocab.size} distinct words over $n docs")
    val (ref256, _) = timedValue("naive full-recount reference, 256 merges")(
      Bpe.learnMergesLocal(vocab, 256))
    val (fast256, _) = timedValue("incremental learner, 256 merges (same collected vocab)")(
      Bpe.learnMergesFast(vocab, 256))
    require(fast256 == ref256, "incremental learner diverged from the naive reference at 256")
    println("[stress] incremental(256) == naive reference(256) (expect true)")
    val nMerges = 32768
    val (full, secs) = timedValue(s"collect-once path, $nMerges merges (aggregate + collect + learn)")(
      Bpe.learnMergesCollected(zipf, "text", nMerges))
    require(full.take(256) == ref256,
      "collect-once path's 256-merge prefix diverged from the reference")
    println(f"[stress] learned ${full.size} merges in $secs%.1f s " +
      f"(${full.size / secs}%.0f merges/s; prefix(256) == reference — the " +
      "round-per-merge ceiling is CLOSED: a real tokenizer vocabulary is one " +
      "distributed aggregation + seconds of driver work)")
    zipf.unpersist(): Unit
  }

  /**
   * Unigram-LM training at its real workload (the `Stress bpefast`
   * companion): an 8192-piece vocabulary over the wide-zipf 50k-word
   * corpus through the collect-once face, the collected ≡ distributed
   * fixed-point law re-verified at a mid-size config, and the Viterbi
   * encode pass timed over the full corpus.
   */
  private def unigramStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Unigram
    val zipf = zipfReplicated(wideCorpus(spark, sfDir))
      .select(monotonically_increasing_id().as("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (wide-zipf)")(zipf.count())
    println(s"[stress] corpus: $n docs")
    val (mid, _) = timedValue("collect-once train, vocabSize=1024 seedSize=4096")(
      Unigram.trainCollected(zipf, "text", vocabSize = 1024, seedSize = 4096))
    val (midD, _) = timedValue("DISTRIBUTED train, same config")(
      Unigram.trainDistributed(zipf, "text", vocabSize = 1024, seedSize = 4096))
    require(mid.pieces == midD.pieces,
      "collected and distributed unigram faces diverged at scale")
    println("[stress] collected == distributed at vocabSize=1024 (expect true)")
    val (big, secs) = timedValue("collect-once train, vocabSize=8192 seedSize=32768")(
      Unigram.trainCollected(zipf, "text", vocabSize = 8192, seedSize = 32768))
    println(f"[stress] learned ${big.pieces.size} pieces in $secs%.1f s " +
      "(the real-tokenizer target size; rounds are bounded by the prune " +
      "schedule, never by vocabulary size)")
    val (nTok, encSecs) = timedValue("Viterbi encode pass over the full corpus")(
      Unigram.tokenCounts(zipf, "doc_id", "text", big)
        .agg(sum(col("n_unigram_tokens"))).collect()(0).getLong(0))
    println(f"[stress] encoded $n docs -> $nTok tokens in $encSecs%.1f s " +
      "(vocab-memoized: the lattice runs once per DISTINCT word)")
    zipf.unpersist(): Unit
  }

  /**
   * Export throughput and determinism at replica scale: the 10x document
   * corpus (the lmStudy replica shape) exports twice from different
   * partitionings; measured MB/s, shard census, and the SHA-256 digest
   * equality that makes a shard digest identify its data.
   */
  private def exportStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.sources.Export
    // widen each doc to ~page size (sf0.1 template texts are short) so
    // the measured rate is stream throughput, not per-task fixed cost
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", array_repeat(col("text"), 20)).as("text"))
    val replica = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("lang"), col("text")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated, 20x-widened docs)")(replica.count())
    val base = java.nio.file.Files.createTempDirectory("graft_export_stress")
    val (p1, p2) = (base.resolve("a").toString, base.resolve("b").toString)
    val (m1, secs) = timedValue(s"export $n docs (32 shards, 64 MB bound)")(
      Export.writeJsonlShards(replica, p1, "doc_id", nShards = 32, maxShardBytes = 64L << 20))
    val raw = m1.map(_._3).sum
    println(f"[stress] ${m1.size} shards, ${raw / 1e6}%.0f MB raw, " +
      f"${raw / 1e6 / secs}%.0f MB/s uncompressed throughput; " +
      f"max shard ${m1.map(_._3).max / 1e6}%.1f MB (bound 67.1 MB)")
    require(m1.map(_._2).sum == n, "manifest row census must equal the corpus")
    val (_, secs2) = timedValue("second export from a reshuffled input")(
      Export.writeJsonlShards(replica.repartition(101), p2, "doc_id",
        nShards = 32, maxShardBytes = 64L << 20))
    val identical = Export.shardDigests(p1) == Export.shardDigests(p2)
    require(identical, "exports must be byte-deterministic under reshuffling")
    println(f"[stress] digests identical across partitionings (expect true) " +
      f"[second pass $secs2%.1f s]")
    replica.unpersist()
    deleteRec(base.toFile)
  }

  /**
   * Token-shard pipeline at 10x: the terminal training artifact
   * (tokenize -> pack -> export) over the replicated, 20x-widened corpus.
   * Three scale laws are checked, not just timed:
   *  - REPLICA INVARIANCE: tokenization is a pure function of the text,
   *    so all 10 replicas of a doc must produce the identical id
   *    sequence (one distinct ids-hash per base doc — any per-task
   *    memoization or broadcast slip shows up here);
   *  - PACKING EFFICIENCY: next-fit wastes less than one doc per bin by
   *    construction — the measured fill ratio makes the claim concrete;
   *  - EXPORT DETERMINISM at mass: SHA-identical shards from a
   *    reshuffled input, the exportStudy law over token payloads.
   */
  private def tokensStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.TokenShards
    import graft.sources.Export
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", array_repeat(col("text"), 5)).as("text"))
    val replica = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated, 5x-widened docs)")(replica.count())
    val merges = graft.operators.Bpe.fixtureMerges
    val vocabFrame = timedValue("vocabulary induction over the distinct-word frame")(
      TokenShards.buildVocab(replica, "text", merges))._1
    val vocab = TokenShards.vocabFromFrame(vocabFrame)
    println(s"[stress] vocabulary: ${vocab.size} symbols")
    val tokens = TokenShards.tokenizeToIds(replica, "doc_id", "text", merges, vocab)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val (mass, tsecs) = timedValue(s"tokenize $n docs")(
      tokens.agg(sum(col("n_tokens"))).head().getLong(0))
    println(f"[stress] $mass token ids, ${mass / 1e6 / tsecs}%.1f M ids/s")
    // replica invariance: one distinct ids-hash per BASE doc id
    val distinctPerBase = tokens
      .select(pmod(col("doc_id"), lit(10000000L)).as("base"), xxhash64(col("ids")).as("h"))
      .groupBy(col("base")).agg(countDistinct(col("h")).as("nh"))
      .agg(max(col("nh"))).head().getLong(0)
    println(s"[stress] max distinct ids-hashes per base doc: $distinctPerBase (expect 1)")
    require(distinctPerBase == 1L, "replicas must tokenize identically")
    // TOTAL (byte-fallback) encoding over the same corpus: the per-symbol
    // vocab-map miss path plus byte decomposition must stay within the
    // same throughput class as strict encoding (same narrow shape)
    val vocabT = TokenShards.vocabFromFrameTotal(
      TokenShards.buildVocabTotal(replica, "text", merges))
    val (massT, ttsecs) = timedValue(s"tokenize $n docs (TOTAL scheme)")(
      TokenShards.tokenizeToIdsTotal(replica, "doc_id", "text", merges, vocabT)
        .agg(sum(col("n_tokens"))).head().getLong(0))
    println(f"[stress] total-scheme: $massT ids, ${massT / 1e6 / ttsecs}%.1f M ids/s " +
      "(expect same id count as strict -- full vocab, no fallback fires)")
    require(massT == mass, "total scheme under a full vocab must emit identical id counts")
    val (seqs, psecs) = timedValue("pack (capacity 16384, 32 shards)")(
      TokenShards.packSequences(tokens, "doc_id", nShards = 32, capacity = 16384L)
        .withColumn("seq_id",
          format_string("s%03d-b%09d", col("shard"), col("bin")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val stats = seqs.agg(count(lit(1)).as("bins"), sum(col("n_tokens")).as("m"),
      sum(col("n_docs")).as("d")).head()
    val (bins, m2) = (stats.getLong(0), stats.getLong(1))
    require(m2 == mass, "packed token mass must equal tokenized mass")
    val fill = m2.toDouble / (bins * 16384L)
    println(f"[stress] $bins bins, fill ratio $fill%.3f " +
      f"(next-fit wastes < 1 doc per bin) [$psecs%.1f s]")
    require(fill > 0.5, "fill ratio collapsed — capacity no longer exceeds doc size")
    val base = java.nio.file.Files.createTempDirectory("graft_token_stress")
    val (p1, p2) = (base.resolve("a").toString, base.resolve("b").toString)
    val (m1, esecs) = timedValue(s"export $bins sequences (32 shards, 64 MB bound)")(
      Export.writeJsonlShards(seqs, p1, "seq_id", nShards = 32,
        maxShardBytes = 64L << 20))
    val raw = m1.map(_._3).sum
    println(f"[stress] ${m1.size} shard files, ${raw / 1e6}%.0f MB raw, " +
      f"${raw / 1e6 / esecs}%.0f MB/s")
    Export.writeJsonlShards(seqs.repartition(101), p2, "seq_id", nShards = 32,
      maxShardBytes = 64L << 20)
    require(Export.shardDigests(p1) == Export.shardDigests(p2),
      "token shards must be byte-deterministic under reshuffling")
    println("[stress] token-shard digests identical across partitionings (expect true)")
    seqs.unpersist(); tokens.unpersist(); replica.unpersist()
    deleteRec(base.toFile)
  }


  /**
   * BINARY + ORDERED terminal path at 10x: the GRBS fixed-width writer
   * and the seeded training-order shuffle over the same replicated
   * corpus as [[tokensStudy]] — write/read throughput, bytes/token,
   * order invariance under repartitioning, and reshuffle digest
   * identity, all `require`d.
   */
  private def binaryStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.TokenShards
    import graft.sources.Export
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", array_repeat(col("text"), 5)).as("text"))
    val replica = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated, 5x-widened docs)")(replica.count())
    val merges = graft.operators.Bpe.fixtureMerges
    val vocab = TokenShards.vocabFromFrame(
      TokenShards.buildVocab(replica, "text", merges))
    val width = if (vocab.valuesIterator.max <= 0xffffL) 2 else 4
    println(s"[stress] vocabulary: ${vocab.size} symbols, token width $width bytes")
    val tokens = TokenShards.tokenizeToIds(replica, "doc_id", "text", merges, vocab)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val mass = tokens.agg(sum(col("n_tokens"))).head().getLong(0)
    println(s"[stress] tokenized $n docs, $mass token ids")
    val seqs = TokenShards.packSequences(tokens, "doc_id", nShards = 32,
        capacity = 16384L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val bins = seqs.count()
    // seeded training order: distributed rank, invariant under input layout
    val (ordered, osecs) = timedValue(s"training-order shuffle over $bins bins")(
      TokenShards.withTrainingOrder(seqs, "stress-epoch-0")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val ranks = ordered.agg(count(lit(1)).as("n"), max(col("train_seq")).as("mx"),
      min(col("train_seq")).as("mn")).head()
    require(ranks.getLong(0) == bins && ranks.getLong(2) == 0L &&
      ranks.getLong(1) == bins - 1L, "train_seq must be a 0..N-1 permutation")
    val again = TokenShards.withTrainingOrder(seqs.repartition(101), "stress-epoch-0")
      .select(col("shard"), col("bin"), col("train_seq"))
    val diff = ordered.select(col("shard"), col("bin"), col("train_seq"))
      .exceptAll(again).count()
    require(diff == 0L, "training order must be partitioning-invariant")
    println(f"[stress] order assignment invariant under repartitioning " +
      f"(expect true) [$osecs%.1f s]")
    val keyed = ordered
      .withColumn("bin_key", col("shard") * lit(4294967296L) + col("bin"))
      .select(col("bin_key"), col("doc_ids"), col("doc_lens"), col("ids"))
    val base = java.nio.file.Files.createTempDirectory("graft_binary_stress")
    val (p1, p2) = (base.resolve("a").toString, base.resolve("b").toString)
    val (m1, wsecs) = timedValue(s"binary export $bins bins (32 shards, 64 MB bound)")(
      Export.writeBinaryShards(keyed, p1, "bin_key", nShards = 32,
        maxShardBytes = 64L << 20, tokenWidth = width))
    val onDisk = m1.map(_._3).sum
    println(f"[stress] ${m1.size} GRBS files, ${onDisk / 1e6}%.0f MB, " +
      f"${onDisk / 1e6 / wsecs}%.0f MB/s, ${onDisk.toDouble / mass}%.3f bytes/token " +
      f"(payload floor $width.000)")
    Export.writeBinaryShards(keyed.repartition(101), p2, "bin_key", nShards = 32,
      maxShardBytes = 64L << 20, tokenWidth = width)
    require(Export.shardDigests(p1) == Export.shardDigests(p2),
      "binary shards must be byte-deterministic under reshuffling")
    println("[stress] binary digests identical across partitionings (expect true)")
    val (back, rsecs) = timedValue("read-back (distributed header/index/payload parse)")(
      Export.readBinaryShards(spark, p1)
        .agg(count(lit(1)).as("b"), sum(col("n_tokens")).as("m")).head())
    require(back.getLong(0) == bins && back.getLong(1) == mass,
      "read-back must recover every bin and every token id")
    println(f"[stress] read-back recovered $bins bins / $mass ids " +
      f"(expect equal) [$rsecs%.1f s]")
    ordered.unpersist(); seqs.unpersist(); tokens.unpersist(); replica.unpersist()
    deleteRec(base.toFile)
  }

  /**
   * SFT terminal path at 10x: conversations assemble over the
   * group-sorted layout, pack WHOLE-RECORD with the loss mask riding
   * the packer's low bit, export as GRBM (bit-packed mask channel), and
   * read back — measuring assembly/pack/export throughput, the mask
   * channel's REAL byte overhead against GRBS on the identical bins
   * (floor: 1/(8·width) of the payload, i.e. ~6% at width 2), and the
   * boundary-metadata record recovery at scale.
   */
  private def sftStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.{Sft, TokenShards}
    import graft.sources.Export
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", array_repeat(col("text"), 5)).as("text"))
    val replica = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated, 5x-widened docs)")(replica.count())
    val merges = graft.operators.Bpe.fixtureMerges
    val vocab = TokenShards.vocabFromFrameTotal(
      TokenShards.buildVocabTotal(replica, "text", merges))
    val vMax = vocab.valuesIterator.max
    val width = if (vMax + 3L <= 0xffffL) 2 else 4
    val roleIds = Map("system" -> (vMax + 1), "user" -> (vMax + 2),
      "assistant" -> (vMax + 3))
    println(s"[stress] vocabulary: ${vocab.size} symbols, token width $width bytes")
    val roleOf = element_at(
      array(lit("system"), lit("user"), lit("assistant"),
        lit("user"), lit("assistant"), lit("user")),
      (pmod(col("doc_id"), lit(6L)) + 1).cast("int"))
    val turns = TokenShards.tokenizeToIdsTotal(replica, "doc_id", "text", merges, vocab)
      .select((col("doc_id") / 6).cast("long").as("conv_id"),
        pmod(col("doc_id"), lit(6L)).as("turn_idx"), roleOf.as("role"), col("ids"))
    val (records, asecs) = timedValue("conversation assembly (one group-sort exchange)")({
      val r = Sft.assembleConversations(turns, roleIds, Set("assistant"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      r.count(): Unit
      r
    })
    val rs = records.agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("m"),
      sum(col("n_trainable")).as("t")).head()
    val (nConv, mass, trainable) = (rs.getLong(0), rs.getLong(1), rs.getLong(2))
    println(f"[stress] $nConv conversations, $mass ids, $trainable trainable " +
      f"(${mass / 1e6 / asecs}%.1f M ids/s assembly incl. tokenize)")
    val (packed, psecs) = timedValue("masked whole-record pack (32 shards, cap 16384)")({
      val p = Sft.packMaskedSequences(records, "conv_id", nShards = 32, capacity = 16384L)
        .withColumn("bin_key", col("shard") * lit(4294967296L) + col("bin"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      p.count(): Unit
      p
    })
    val bins = packed.count()
    println(f"[stress] $bins bins (${mass / 1e6 / psecs}%.1f M ids/s pack)")
    val base = java.nio.file.Files.createTempDirectory("graft_sft_stress")
    try {
      val (p1, p2, p3) = (base.resolve("a").toString, base.resolve("b").toString,
        base.resolve("g").toString)
      val (m1, wsecs) = timedValue(s"GRBM export $bins bins (32 shards, 64 MB bound)")(
        Export.writeMaskedBinaryShards(packed, p1, "bin_key", nShards = 32,
          maxShardBytes = 64L << 20, tokenWidth = width))
      val grbmBytes = m1.map(_._3).sum
      println(f"[stress] ${m1.size} GRBM files, ${grbmBytes / 1e6}%.0f MB, " +
        f"${grbmBytes / 1e6 / wsecs}%.0f MB/s")
      Export.writeMaskedBinaryShards(packed.repartition(101), p2, "bin_key",
        nShards = 32, maxShardBytes = 64L << 20, tokenWidth = width)
      require(Export.shardDigests(p1) == Export.shardDigests(p2),
        "GRBM shards must be byte-deterministic under reshuffling")
      println("[stress] GRBM digests identical across partitionings (expect true)")
      val mG = Export.writeBinaryShards(
        packed.select(col("bin_key"), col("doc_ids"), col("doc_lens"), col("ids")),
        p3, "bin_key", nShards = 32, maxShardBytes = 64L << 20, tokenWidth = width)
      val grbsBytes = mG.map(_._3).sum
      println(f"[stress] mask-channel overhead vs GRBS on identical bins: " +
        f"${(grbmBytes - grbsBytes).toDouble / mass}%.4f bytes/token " +
        f"(floor ${1.0 / 8}%.4f; expect ~the floor + header delta)")
      val (back, rsecs) = timedValue("GRBM read-back + lens-based record recovery")(
        TokenShards.splitBinsByLens(Export.readMaskedBinaryShards(spark, p1))
          .agg(count(lit(1)).as("n"), sum(size(col("ids")))).head())
      require(back.getLong(0) == nConv && back.getLong(1) == mass,
        "record recovery must reproduce every conversation and every id")
      println(f"[stress] recovered $nConv records / $mass ids (expect equal) " +
        f"[$rsecs%.1f s]")
      val maskMass = Export.readMaskedBinaryShards(spark, p1)
        .agg(sum(expr("aggregate(mask, CAST(0 AS BIGINT), (a, x) -> a + x)")))
        .head().getLong(0)
      require(maskMass == trainable,
        s"mask mass $maskMass must equal the assembled trainable mass $trainable")
      println(s"[stress] mask mass through the artifact = $trainable (expect equal)")
    } finally deleteRec(base.toFile)
    packed.unpersist(); records.unpersist(); replica.unpersist()
  }

  /**
   * OPQ vs plain PQ at the production geometry: ADC-only recall@10
   * (no re-rank — the codes' own quality) over the real embeddings
   * table, m=16, ks=256, 64 queries. The rotation is free at search
   * time (k·dim per query), so any recall gain is pure profit.
   */
  private def opqStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.{Pca, Similarity}
    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build")(emb.count())
    val queries = emb.where(col("vec_id") < 64)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def adcRecall(c: org.apache.spark.sql.DataFrame,
        qs: org.apache.spark.sql.DataFrame, label: String): Double = {
      val (idx, t) = timedValue(s"[$label] train+encode m=16 ks=256")(
        Similarity.buildPqIndex(c, "vec_id", "embedding", dim = 64, m = 16,
          ks = 256, trainIters = 3))
      val got = Similarity.pqTopK(idx, qs, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = got.intersect(exact).size.toDouble / exact.size
      println(f"[stress] [$label] ADC-only recall@10 = $rec%.3f ($t%.1f s, $n vectors)")
      rec
    }
    val plain = adcRecall(emb, queries, "plain PQ")
    val basis = timedValue("OPQ basis (moment agg + Jacobi + allocation)")(
      Pca.opqBasis(emb, "embedding", m = 16))._1
    // persisted like emb, so the OPQ leg's train/encode passes read the
    // cached rotation instead of re-rotating per action — like-for-like
    // timing against the plain leg
    val rotC = Pca.rotate(emb, "vec_id", "embedding", basis).toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    rotC.count(): Unit
    val rotQ = Pca.rotate(queries, "vec_id", "embedding", basis).toDF("vec_id", "embedding")
    val opq = adcRecall(rotC, rotQ, "OPQ")
    rotC.unpersist(): Unit
    println(f"[stress] OPQ - plain = ${opq - plain}%+.3f recall@10 " +
      "(rotation is free at search time: k·dim per query)")
    emb.unpersist(): Unit
  }

  /** The export studies write multi-GB GRBS/jsonl payloads to temp dirs;
    * leaving them behind leaks gigabytes per stress run — delete the temp
    * root on the way out, matching the unpersist cleanup each study
    * already does for its cached frames. */
  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  private def timedValue[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $label: $secs%.1f s")
    (r, secs)
  }

  private def lmStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Lm
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val replica = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = timed("corpus build (10x replicated)")(replica.count())

    def materialized(c: Lm.LmCounts): Lm.LmCounts = {
      val m = Lm.LmCounts(
        c.unigrams.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER),
        c.bigrams.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
      m.unigrams.count(); m.bigrams.count(); m
    }
    val base = timed("train on base corpus")(materialized(Lm.lmCounts(docs, "text")))
    val big = timed("train on 10x replica")(materialized(Lm.lmCounts(replica, "text")))
    val (v1, b1) = (base.unigrams.count(), base.bigrams.count())
    val (v10, b10) = (big.unigrams.count(), big.bigrams.count())
    println(s"[stress] model frames: $v1 unigram rows, $b1 bigram rows at 1x; " +
      s"$v10 / $b10 at 10x (expect IDENTICAL: vocabulary saturates, corpus mass doesn't add rows)")
    require(v1 == v10 && b1 == b10,
      "model frame row counts changed under replication — vocabulary-boundedness violated")
    val uniMismatch = base.unigrams
      .join(big.unigrams.withColumnRenamed("n", "n10"), Seq("w"))
      .where(col("n10") =!= col("n") * 10L).count()
    val bgMismatch = base.bigrams
      .join(big.bigrams.withColumnRenamed("n", "n10"), Seq("w1", "w2"))
      .where(col("n10") =!= col("n") * 10L).count()
    println(s"[stress] count additivity: $uniMismatch unigram + $bgMismatch bigram rows " +
      "deviate from exactly x10 (expect 0 + 0)")
    require(uniMismatch == 0 && bgMismatch == 0,
      "replica counts are not exactly 10x the base — additivity violated")

    val natural = timed("score 10x corpus")(
      Lm.scoreDocs(replica, "doc_id", "text", big)
        .agg(sum(col("nll_fp")).as("nll"), sum(col("n_bigrams")).as("nb")).head())
    val garbage = replica.select(col("doc_id"),
      concat_ws(" ", transform(
        graft.functions.Text.edgeStrippedTokens(col("text")),
        w => concat(lit("zz"), w))).as("text"))
    val garbageNll = timed("score 10x zz-garbage")(
      Lm.scoreDocs(garbage, "doc_id", "text", big)
        .agg(sum(col("nll_fp"))).head().getLong(0))
    val perBigram = natural.getLong(0) / math.max(natural.getLong(1), 1L)
    val perBigramG = garbageNll / math.max(natural.getLong(1), 1L)
    println(s"[stress] $n docs scored: natural ${perBigram} fp/bigram, " +
      s"garbage ${perBigramG} fp/bigram (expect garbage strictly worse — the certain gate)")
    require(garbageNll > natural.getLong(0), "garbage did not out-cost natural text at scale")

    base.unigrams.unpersist(); base.bigrams.unpersist()
    big.unigrams.unpersist(); big.bigrams.unpersist()
    replica.unpersist(); ()
  }

  private def knnStudy(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Similarity
    val emb = SparkEntry.tbl(spark, sfDir, "embeddings")
      .where(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val replicas = (0 until 10).map(r =>
      emb.select((col("vec_id") + lit(r.toLong * 1000000L)).as("vec_id"), col("embedding")))
    val corpus = replicas.reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = corpus.count()
    println(s"[stress] corpus: $n vectors (10 replicas — every vector a 10-clique at cosine 1)")
    val index = timed("build 64-cell IVF index")(
      Similarity.buildIvfIndex(corpus, "vec_id", "embedding", nCentroids = 64, trainIters = 1))
    index.assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val res = Similarity.knnGraph(index, k = 8, nProbe = 4, maxCell = 1000000)
    val edges = timed("kNN graph k=8 nProbe=4")(
      res.edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val nEdges = edges.count()
    val dropped = res.droppedCells.head().getLong(0)
    val twinEdges = edges
      .where(pmod(col("neighbor_id"), lit(1000000L)) === pmod(col("query_id"), lit(1000000L)))
      .count()
    println(s"[stress] edges: $nEdges (expect ${n * 8}); dropped cells: $dropped (expect 0)")
    println(f"[stress] clique edges: $twinEdges (${100.0 * twinEdges / nEdges}%.2f%% — " +
      "expect ~100%%: each top-8 is the vector's own 10-clique)")
    require(dropped == 0, "wide cap must drop nothing")
    require(nEdges == n * 8, "every vector must fill its top-8")
    require(twinEdges >= nEdges * 999 / 1000, "clique recall broke at replica scale")
    // hot-cell run: 1,300 copies of vector 0 overflow the default 1024 cap
    val hot = emb.where(col("vec_id") === 0)
    val hotCopies = (0 until 1300).map(i =>
      hot.select((col("vec_id") + lit(80000000L + i.toLong)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val corpus2 = emb.unionByName(hotCopies)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val index2 = Similarity.buildIvfIndex(corpus2, "vec_id", "embedding",
      nCentroids = 64, trainIters = 1)
    val res2 = Similarity.knnGraph(index2, k = 8, nProbe = 4)
    val edges2 = timed("kNN graph with one hot cell (default cap)")(res2.edges)
    val dropped2 = res2.droppedCells.head().getLong(0)
    val intoHot = edges2.where(col("neighbor_id") >= 80000000L).count()
    println(s"[stress] hot run: dropped cells: $dropped2 (expect >= 1); " +
      s"edges into hot-cell members: $intoHot (expect 0)")
    require(dropped2 >= 1, "hot cell was not dropped — occupancy cap inert")
    require(intoHot == 0, "an edge points into a dropped cell's member")
    edges.unpersist(); index.assigned.unpersist(); corpus.unpersist(); corpus2.unpersist(); ()
  }

  /** WARC ingestion at replica scale: serialize the corpus as real
    * `.warc.gz` files, parse them back through the full transport, damage
    * one file and prove the tear costs only its own tail, then apply the
    * robots policy — write/parse throughput and the damage contract are
    * the invariants a 100 TB crawl drop relies on. */
  private def crawlStudy(spark: SparkSession, sfDir: String): Unit = {
    val docs = SparkEntry.tbl(spark, sfDir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nDocs = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("stress_warc").toString
    val shaped = sources.Warc.shapePages(docs, "doc_id", "text")
    timed("write .warc.gz corpus (8 files, member-per-record gzip)")(
      sources.Warc.writeFixture(shaped, dir, nFiles = 8))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    val mb = files.map(_.length).sum / 1e6
    println(f"[stress] corpus: $nDocs docs -> ${files.length} files, $mb%.1f MB compressed")

    val parsed = sources.Warc.readResponses(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nResp = timed("parse: binaryFile scan -> inflate -> record walk -> HTTP split")(
      parsed.count())
    println(s"[stress] responses: $nResp (expect $nDocs: every doc captured exactly once)")
    require(nResp == nDocs, s"parse lost or invented records: $nResp != $nDocs")

    // tear one file mid-member: the damage must cost ONLY that file's tail
    val dir2 = java.nio.file.Files.createTempDirectory("stress_warc_torn").toString
    val torn = files.maxBy(_.length)
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val outBytes = if (f == torn) java.util.Arrays.copyOf(bytes, (bytes.length * 2) / 3)
                     else bytes
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir2, f.getName), outBytes): Unit
    }
    val nTorn = timed("parse with one file torn at 2/3 length")(
      sources.Warc.readResponses(spark, dir2).count())
    // the torn file's own INTACT record count bounds the loss: pmod buckets
    // hash unevenly across the 8 partitions, so measure, don't divide
    val tornFileRows = sources.Warc.parseWarcGz(
      java.nio.file.Files.readAllBytes(torn.toPath)).size
    println(s"[stress] torn-corpus responses: $nTorn (expect lost in (0, $tornFileRows]: " +
      "the torn file's own tail only; the other 7 files fully intact)")
    require(nTorn < nResp, "the tear cost nothing — damage contract inert")
    require(nResp - nTorn <= tornFileRows,
      s"the tear leaked beyond its file: lost ${nResp - nTorn} > its $tornFileRows rows")

    // robots policy over the parsed captures (the q208 composition)
    import spark.implicits._
    val robots = Seq(("crawl.example",
      "User-agent: *\nDisallow: /doc/3\nAllow: /doc/33\n")).toDF("host", "robots_txt")
    val rules = operators.Robots.robotsRules(robots, "host", "robots_txt", "graftbot")
    val allowed = timed("robots verdict (broadcast policy join + HOF selection)")(
      operators.Robots.filterByRobots(parsed, "uri", rules, "host")
        .where(col("allowed")).count())
    val expectedAllowed = docs.where(
      !(col("doc_id").cast("string").startsWith("3") &&
        !col("doc_id").cast("string").startsWith("33"))).count()
    println(s"[stress] allowed: $allowed (expect $expectedAllowed: " +
      "digit-prefix policy recomputed independently from the table)")
    require(allowed == expectedAllowed, s"robots verdict drifted: $allowed != $expectedAllowed")
    parsed.unpersist(); docs.unpersist(); ()
  }
}
