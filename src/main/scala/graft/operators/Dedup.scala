package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale corpora. All of them are pure
 * DataFrame transformations — shuffles only on the candidate keys, no
 * driver-side loops, no group materialization — so every step scales out
 * with `spark.sql.shuffle.partitions` / AQE.
 *
 * Pipeline shape (the standard MinHash-LSH dedup):
 *   shingle -> minhash signature -> band buckets -> in-bucket pair expansion
 *   (candidates) -> exact-similarity verify.
 * The LSH band grouping bounds the quadratic blow-up to rows sharing a band
 * bucket, which is what makes near-dup detection feasible at 100 TB.
 *
 * DAG SHAPE: every stage is single-consumer — candidate pairs come from ONE
 * `groupBy(band, bucket)` pass (not a self-join reading the bucketed frame
 * twice), and the verify step streams shingle rows through two aggregations
 * (never materializing per-document shingle arrays). The only reused frame is
 * the tiny id-pair candidate set, persisted by [[minhashNearDups]]; the
 * expensive corpus/signature scans run exactly once per pipeline with no
 * cache-race window.
 */
object Dedup {

  /** Exact dedup: smallest id per identical value of `on`. A single
    * hash-aggregation with map-side partial combine, grouped by a 128-bit
    * CONTENT HASH of the dedup key — the exchange carries 16 bytes + id per
    * row instead of the full key bytes (at 100 TB, grouping by raw `text`
    * would move the whole corpus through the shuffle). md5 collisions merging
    * two genuinely different keys are negligible at any realistic corpus size
    * (~n^2 / 2^129); callers needing certainty can re-verify within groups.
    * BINARY keys are hashed raw (never through a string cast, which would
    * collapse distinct invalid-UTF-8 byte sequences to the same replacement
    * characters before hashing — a collision mode far likelier than md5's). */
  def exact(df: DataFrame, idCol: String, on: Column): DataFrame = {
    df.groupBy(md5(contentBytes(df, on)).as("dedup_key"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
  }

  /** The hashable byte form of a dedup key (see [[exact]]'s binary-safety
    * note: BINARY hashes raw, STRING as its bytes, everything else through a
    * canonical string rendering). */
  private[operators] def contentBytes(df: DataFrame, on: Column): Column = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    df.select(on).schema.head.dataType match {
      case BinaryType => on
      case StringType => on.cast("binary")
      case _ => on.cast("string").cast("binary")
    }
  }

  /** Canonical surviving ROW per exact-content group (the row with the
    * smallest id). [[exact]] returns ids — right when the survivors feed an
    * anti-join or audit; a pipeline that keeps PROCESSING the survivors
    * would have to join those ids back, shuffling the payload a second
    * time. This form does it in ONE hash shuffle of the input:
    * `min_by(struct(*), id)` grouped by the content hash — a hash
    * aggregation with partial (map-side) combine, strictly cheaper than the
    * equivalent `row_number` window, which needs the same exchange PLUS a
    * full sort of every partition. Payload moved exactly once, never
    * sorted. Rows with a NULL `idCol` are unrankable in any canonical-pick
    * and are ignored: a content group whose ids are ALL null produces no
    * output row (the null-struct group is filtered, not emitted as a
    * phantom all-null row). */
  def exactRows(df: DataFrame, idCol: String, on: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(md5(contentBytes(df, on)).as("__dedup_key"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__dedup_row"))
      .where(col("__dedup_row").isNotNull)
      .select(cols.map(c => col("__dedup_row").getField(c).as(c)): _*)
  }

  /** Drop every row whose content fingerprint appears in a BLOCKLIST — the
    * curation primitive behind "remove known-bad documents", eval-set
    * decontamination by exact copy, and takedown lists. The blocklist is a
    * frame of banned content (`bannedOn` within `banned`); matching is by
    * md5 of the same canonical byte form [[exact]] hashes, so a banned text
    * removes ALL its byte-identical copies regardless of id. At 100 TB the
    * blocklist is small by nature (an eval set, a takedown list) while the
    * corpus is not: the blocklist is broadcast and the corpus never
    * shuffles — the anti-join rides the scan. NULL content never matches a
    * blocklist entry (Spark's anti-join keeps null-keyed rows); callers
    * wanting NULL≡empty should coalesce before calling, as the q76 query
    * does. */
  def removeFingerprinted(df: DataFrame, banned: DataFrame, on: Column, bannedOn: Column): DataFrame = {
    require(!df.columns.contains("__ban_fp"), "__ban_fp is reserved by removeFingerprinted")
    val keys = broadcast(
      banned.select(md5(contentBytes(banned, bannedOn)).as("__ban_fp")).distinct())
    df.join(keys, md5(contentBytes(df, on)) === col("__ban_fp"), "left_anti")
  }

  /**
   * Corpus-level duplication profile per document: how many of a document's
   * distinct word n-gram shingles also appear in at least one OTHER
   * document (the Dolma/Gopher-style "duplicate n-gram fraction" signal —
   * intra-document repetition is [[graft.functions.Text.repetitionColumns]]'s
   * job; this measures repetition ACROSS documents, the precursor signal to
   * near-dup clustering and boilerplate detection).
   *
   * Returns `(idCol, n_shingles, n_dup)` for every document with at least
   * one shingle; fraction = n_dup / n_shingles is left to the caller (the
   * integers hash exactly across engines). Counting is by the kernel's
   * 64-bit shingle hash ([[shingleHashes]] — same collision posture as the
   * verify path). Plan shape: the (id, h) frame feeds both the
   * document-frequency aggregation and the join back, so it is PERSISTED
   * (SER: two compact longs per row, strictly smaller than re-reading and
   * re-tokenizing the corpus — Spark does not reuse the exchange across the
   * two consumers, so without the cache the shingle kernel would run
   * twice). `unpersistHook` receives the release callback, the
   * [[minhashNearDups]] convention. A shingle occurring in `df` docs costs
   * `df` join rows (never df^2): cost is linear in shingle mass, no pair
   * expansion anywhere.
   */
  def duplicateShingleStats(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                            unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val sh = shingleHashes(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { sh.unpersist(); () })
    val freq = sh.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    sh.join(freq, "h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup"))
  }

  /**
   * Per-document n-gram NOVELTY — the curriculum / crawl-ordering signal:
   * how many of a document's distinct n-gram shingles appear FIRST in this
   * document (global first = the minimum id over every document containing
   * the shingle). A document full of shingles first seen elsewhere is
   * boilerplate or near-copy; a high-novelty document introduces new
   * content — the corpus-level complement of [[duplicateShingleStats]]
   * (which counts shared-anywhere, order-blind).
   *
   * SCALE SHAPE: identical to [[duplicateShingleStats]] — the (id, 64-bit
   * hash) projection shuffles once for the per-shingle min, joins back by
   * hash (linear in shingle mass, never doc x doc), and the persisted-SER
   * frame keeps the tokenize kernel from running twice. Documents with
   * fewer than n tokens emit no row.
   *
   * Returns (idCol, n_shingles, n_novel).
   */
  def noveltyProfile(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                     unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val sh = shingleHashes(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { sh.unpersist(); () })
    val first = sh.groupBy(col("h")).agg(min(col(idCol)).as("__first"))
    sh.join(first, "h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
  }

  /** Distinct word n-gram shingles as an array column (native expressions:
    * `sequence` + `transform` + `slice`, fully codegen'd). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    val grams = transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", slice(words, i + lit(1), lit(n))))
    array_distinct(when(size(words) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /**
   * Distinct word n-gram shingles as 64-bit FNV-1a hashes, one (id, h) row per
   * shingle — computed in typed JVM code (`mapPartitions`), NOT as Catalyst
   * higher-order functions: `transform`/`slice` are interpreted per row and
   * dominated the whole minhash pipeline. Hashing words directly also skips
   * materializing shingle strings through the shuffle.
   */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val words = graft.functions.Text.segmentText(text)
          if (words.length < n) Iterator.empty
          else {
            val seen = new java.util.HashSet[java.lang.Long]()
            (0 to words.length - n).iterator.flatMap { i =>
              var h = 1469598103934665603L // FNV-1a 64 offset basis
              var j = i
              while (j < i + n) {
                val w = words(j)
                var k = 0
                while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
                h ^= ' '; h *= 1099511628211L
                j += 1
              }
              if (seen.add(h)) Iterator.single((id, h)) else Iterator.empty
            }
          }
        }
      }
      .toDF(idCol, "h")
  }

  /** POSITIONAL w-token window hashes: one `(id, pos, h)` row per window
    * START (0-based token index), NOT deduplicated — positions are the
    * point: they let a caller locate and cut a repeated span, which the
    * distinct [[shingleHashes]] form cannot. Same FNV-1a-64 kernel and
    * tokenization (the shared [[graft.functions.Text.segmentText]]
    * kernel) as the shingle path. */
  def windowHashes(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    require(w > 0, s"window size must be positive, got $w")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val words = graft.functions.Text.segmentText(text)
          if (words.length < w) Iterator.empty
          else (0 to words.length - w).iterator.map { i =>
            var h = 1469598103934665603L // FNV-1a 64 offset basis
            var j = i
            while (j < i + w) {
              val word = words(j)
              var k = 0
              while (k < word.length) { h ^= word.charAt(k); h *= 1099511628211L; k += 1 }
              h ^= ' '; h *= 1099511628211L
              j += 1
            }
            (id, i.toLong, h)
          }
        }
      }
      .toDF(idCol, "pos", "h")
  }

  /**
   * Document BOUNDARY-OVERLAP pairs — the crawl-segmentation artifact
   * detector: (id_a, id_b) where the LAST k tokens of a equal the FIRST k
   * tokens of b (a != b). A page split mid-paragraph by the fetcher, or a
   * continuation scrape, shows up exactly this way; chaining the pairs
   * reconstructs the original document order. Matching uses
   * [[windowHashes]]'s FNV-1a window hashes, so the comparison never
   * materializes token strings.
   *
   * SCALE SHAPE: one window-kernel pass collapses per document to a single
   * (id, head_hash, tail_hash) row — min/max over the positional struct in
   * ONE aggregation whose shuffle carries three longs per document — then a
   * SINGLE per-hash group pass pairs tails with heads (each doc contributes
   * one head row and one tail row to its hash's group; one extra shuffle of
   * two longs per doc, no persist, no self-join). Like every other pair
   * source in this family, the expansion is CAPPED: a boundary hash whose
   * head OR tail side exceeds `maxDf` members is dropped whole (counted via
   * [[droppedHotBuckets]] and the per-query observed drop metric) — a
   * boilerplate 12-token footer/header shared by millions of crawl pages
   * carries no continuation signal and would otherwise cost df(tail) x
   * df(head) rows in one task. Within the cap a hash costs <= maxDf^2
   * pairs and O(maxDf) memory. Documents with fewer than k tokens have no
   * boundary and emit nothing.
   */
  def boundaryOverlapPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
                           unpersistHook: (() => Unit) => Unit = _ => (),
                           maxDf: Int = DefaultMaxBucket): DataFrame = {
    require(k > 0, s"boundary window must be positive, got $k")
    require(maxDf > 0, s"boundary df cap must be positive, got $maxDf")
    val spark = df.sparkSession
    import spark.implicits._
    val _ = unpersistHook // retained for source compatibility: the capped kernel is single-pass and persists nothing
    val acc = droppedHotBuckets(spark)
    val paired = windowHashes(df, idCol, textCol, k)
      .groupBy(col(idCol))
      .agg(min(struct(col("pos"), col("h"))).as("__head"),
        max(struct(col("pos"), col("h"))).as("__tail"))
      .select(col(idCol).cast("long"), col("__head.h"), col("__tail.h"))
      .as[(Long, Long, Long)]
      .flatMap { case (id, headH, tailH) =>
        // side 0 = this doc's TAIL (candidate id_a), side 1 = HEAD (candidate id_b)
        Iterator((tailH, 0, id), (headH, 1, id))
      }
      .groupByKey(_._1)
      .flatMapGroups { (h, rows) =>
        val tails = new scala.collection.mutable.ArrayBuffer[Long](4)
        val heads = new scala.collection.mutable.ArrayBuffer[Long](4)
        var overflow = false
        while (!overflow && rows.hasNext) {
          val r = rows.next()
          val buf = if (r._2 == 0) tails else heads
          if (buf.length < maxDf) buf += r._3 else overflow = true
        }
        if (overflow) {
          acc.add(1L)
          val n = DroppedBuckets.incrementAndGet()
          val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")
          val msg = s"dropping hot boundary hash $h: more than $maxDf heads or tails (boilerplate k-gram, no continuation signal; $n dropped so far in this JVM)"
          if (n == 1 || n % 1000 == 0) log.warn(msg) else log.debug(msg)
          Iterator.single((0L, 0L, 1)) // sentinel: counted by observeDrops, then stripped
        } else if (tails.isEmpty || heads.isEmpty) Iterator.empty
        else for { a <- tails.iterator; b <- heads.iterator; if a != b } yield (a, b, 0)
      }
      .toDF("id_a", "id_b", "__dropped")
    observeDrops(paired).distinct()
  }

  /**
   * Cross-document REPEATED-SPAN profile — the exact-substring dedup signal
   * of Lee et al.'s "Deduplicating Training Data Makes Language Models
   * Better": a w-token window is repeated iff its hash occurs in >= 2
   * DISTINCT documents (within-document repetition is
   * [[graft.functions.Text.repetitionColumns]]'s job). Per document:
   * `(idCol, n_windows, n_repeated, covered_tokens)` where
   * `covered_tokens` is the size of the union of `[pos, pos+w)` over
   * repeated starts — exactly the token count [[cutRepeatedSpans]] would
   * remove. Docs with < w tokens emit no row (they have no window).
   *
   * SCALE SHAPE: the positional (id, pos, h) frame is persisted-SER for its
   * consumers (frequency agg + join back — three compact longs per row,
   * cheaper than re-running the kernel; Spark does not reuse exchanges
   * across consumers). A window repeated in `d` docs costs `d` join rows,
   * never d^2; the coverage union is computed by exploding each repeated
   * start into its w positions and distinct-counting, so the expansion is
   * w x repeated-mass only — no per-document interval state, no window
   * function, nothing driver-side.
   */
  def repeatedSpanProfile(df: DataFrame, idCol: String, textCol: String, w: Int = 5,
                          unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    val wh = windowHashes(df, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { wh.unpersist(); () })
    val rep = repeatedStarts(wh, idCol)
    val cov = rep
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("__t"))
      .distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("covered_tokens"))
    val repCnt = rep.groupBy(col(idCol)).agg(count(lit(1)).as("n_repeated"))
    wh.groupBy(col(idCol)).agg(count(lit(1)).as("n_windows"))
      .join(repCnt, Seq(idCol), "left")
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
  }

  /** The (id, pos) starts whose window hash occurs in >= 2 distinct docs. */
  private def repeatedStarts(wh: DataFrame, idCol: String): DataFrame = {
    val docsPerH = wh.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__docs"))
    wh.join(docsPerH.where(col("__docs") > 1), "h").select(col(idCol), col("pos"))
  }

  /**
   * CUT repeated spans — the exact-substring dedup ACTION: rewrite each
   * document with every token covered by a cross-document repeated window
   * removed. Output `(idCol, textCol)` where the text is the space-joined
   * surviving tokens: whitespace canonicalizes by contract, because the
   * kernel's tokenization defines the positions (the rebuilt string is a
   * pure function of the surviving token sequence). Documents shorter than
   * w tokens carry no window and survive whole (canonicalized); NULL-text
   * rows are dropped.
   *
   * SCALE SHAPE: hashes and positions flow exactly as in
   * [[repeatedSpanProfile]]; the rebuild joins each document's covered-set
   * array (w x its repeated mass, usually tiny) back to the payload — the
   * one payload shuffle any remote-information rewrite must pay (bucketed
   * corpora co-locate it away).
   */
  def cutRepeatedSpans(df: DataFrame, idCol: String, textCol: String, w: Int = 5,
                       unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.where(col(textCol).isNotNull)
    val wh = windowHashes(rows, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { wh.unpersist(); () })
    val covSet = repeatedStarts(wh, idCol)
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("__t"))
      .distinct()
      .groupBy(col(idCol)).agg(collect_list(col("__t")).as("__cov"))
    rows.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .join(covSet, Seq(idCol), "left")
      .as[(Long, String, Array[Long])]
      .map { case (id, text, cov) =>
        val words = graft.functions.Text.segmentText(text)
        val covered: Set[Long] = if (cov == null) Set.empty else cov.toSet
        val kept = words.iterator.zipWithIndex
          .collect { case (t, i) if !covered(i.toLong) => t }
        (id, kept.mkString(" "))
      }
      .toDF(idCol, textCol)
  }

  /** Fixed affine permutation for minhash over the field mod 2^31-1 (Mersenne
    * prime). All intermediates stay below 2^62, so long arithmetic cannot
    * overflow; constants are deterministic splitmix64 mixes of the lane index
    * (public finalizer constants), so adjacent lanes get statistically
    * independent permutations — affinely-related per-lane constants would
    * correlate the lanes and break the (bands, rows) collision-probability
    * math LSH banding relies on. */
  private val MersenneP = 2147483647L

  /** splitmix64 finalizer: a well-mixed deterministic 64-bit hash of `z0`. */
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /**
   * MinHash signature (numHashes lanes) per id, computed in ONE narrow pass:
   * for each document, FNV-1a-hash every word n-gram and fold it into the
   * per-lane running minima. Duplicate shingles cannot change a min, so no
   * dedup set is needed and the result is identical to the explode →
   * groupBy(min) formulation — without shuffling a row per shingle. Documents
   * shorter than the shingle width yield no signature (no shingle set).
   */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, shingleN: Int, numHashes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = MersenneP
    // a in [1, p-1] (a = 0 would collapse the permutation), b in [0, p-1]
    val as = Array.tabulate(numHashes)(i => Math.floorMod(splitmix64(i.toLong), p - 1) + 1L)
    val bs = Array.tabulate(numHashes)(i => Math.floorMod(splitmix64(i.toLong + numHashes), p))
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val words = graft.functions.Text.segmentText(text)
          if (words.length < shingleN) Iterator.empty
          else {
            val mins = Array.fill(numHashes)(Long.MaxValue)
            var i = 0
            while (i <= words.length - shingleN) {
              var h = 1469598103934665603L // FNV-1a 64 offset basis
              var j = i
              while (j < i + shingleN) {
                val w = words(j)
                var k = 0
                while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
                h ^= ' '; h *= 1099511628211L
                j += 1
              }
              val hMod = (h % p + p) % p
              var l = 0
              while (l < numHashes) {
                val perm = (hMod * as(l) + bs(l)) % p
                if (perm < mins(l)) mins(l) = perm
                l += 1
              }
              i += 1
            }
            Iterator.single((id, mins.toSeq))
          }
        }
      }
      .toDF(idCol, "signature")
  }

  /** Executor-JVM-wide counter of dropped hot buckets, for rate-limited drop
    * logging in [[bucketPairs]] (shared across tasks by design — it throttles
    * a per-JVM log stream). */
  private object DroppedBuckets extends java.util.concurrent.atomic.AtomicLong

  /** Per-SparkContext accumulator of hot buckets dropped by [[bucketPairs]]
    * since the context started — the production monitoring hook for the cap:
    * a dashboard reads this (it surfaces in the Spark UI / status API as a
    * named accumulator) instead of grepping executor logs. Task retries can
    * overcount, as with any Spark accumulator used for monitoring; for an
    * exact per-query signal use the observed metric instead (see
    * [[observeDrops]] / [[HotBucketMetricPrefix]]). */
  def droppedHotBuckets(spark: org.apache.spark.sql.SparkSession): org.apache.spark.util.LongAccumulator =
    droppedAcc.computeIfAbsent(spark.sparkContext.applicationId,
      _ => spark.sparkContext.longAccumulator("graft.dedup.droppedHotBuckets"))
  private val droppedAcc =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.util.LongAccumulator]()

  /** Name prefix of the per-query `Dataset.observe` metric emitted by the
    * pair expanders (see [[observeDrops]]). */
  val HotBucketMetricPrefix = "graft.dedup.hotBuckets."
  private val obsId = new java.util.concurrent.atomic.AtomicLong

  /** Per-QUERY drop signal, complementing the per-context accumulator:
    * dropped buckets surface as an observed metric `dropped_hot_buckets`
    * under an observation named [[HotBucketMetricPrefix]]`<n>` (the suffix is
    * a process-unique counter — Spark requires observation names to be
    * unique within a plan, and one query can run several LSH stages), which
    * a `QueryExecutionListener` receives in `observedMetrics` per execution —
    * the production hook for "did THIS run's cap fire", with exact
    * once-per-query semantics (CollectMetrics deduplicates task retries,
    * unlike the accumulator). Expanders emit one sentinel row per dropped
    * bucket (`__dropped = 1`); this counts them and strips them out.
    * Caveat: if the query's downstream result is EMPTY, AQE's empty-relation
    * propagation can replace the whole subtree (CollectMetrics included)
    * with an empty scan and the metric is not reported for that query — the
    * accumulator still counts those drops, so monitoring should read both. */
  private def observeDrops(df: DataFrame): DataFrame =
    df.observe(s"$HotBucketMetricPrefix${obsId.incrementAndGet()}",
        sum(col("__dropped")).cast("long").as("dropped_hot_buckets"))
      .where(col("__dropped") === 0)
      .drop("__dropped")

  /** Default per-bucket member cap for the LSH pair expanders: a bucket this
    * populated carries no discriminating signal (standard LSH practice is to
    * drop it), and capping bounds both the single-group state (O(cap) heap —
    * no `collect_list` array row that could hit the 2 GiB row limit on a hot
    * bucket) and the single-task quadratic expansion (<= cap^2/2 pairs). */
  val DefaultMaxBucket: Int = 1024

  /**
   * All (a, b) member pairs with `id_a < id_b` within each (band, bucket)
   * group, streamed group-at-a-time — the shared pair-expansion kernel for
   * the LSH candidate generators. Input must be rows of
   * `(band, bucket, id, payload)` (payload carries a per-member tag the
   * caller needs at verify time, e.g. the simhash signature; pass 0 when
   * unused). Output is `(id_a, pay_a, id_b, pay_b)` rows, NOT deduplicated
   * across buckets — callers project and `distinct()` on their id pairs.
   *
   * Buckets with more than `cap` members are dropped whole (logged on the
   * executor): by LSH design a hot bucket means the hash carries no signal
   * for those rows, and expanding it would concentrate O(n^2) work in one
   * task. The group is streamed through a bounded buffer, so a pathological
   * bucket costs O(cap) memory and O(bucket size) time, never a giant row.
   * Members are buffered (bounded), sorted, and expanded with `i < j`;
   * duplicate-id members never self-pair (ids(i) == ids(j) is skipped).
   */
  private[graft] def bucketPairs(banded: Dataset[(Int, Long, Long, Long)], cap: Int): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val acc = droppedHotBuckets(spark)
    banded
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, rows) =>
        val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)](16)
        var overflow = false
        while (!overflow && rows.hasNext) {
          val r = rows.next()
          if (buf.length < cap) buf += ((r._3, r._4)) else overflow = true
        }
        if (overflow) {
          acc.add(1L)
          // rate-limited: in prefilter uses (e.g. a document-frequency cap)
          // dropping is the EXPECTED common case — per-bucket WARN would
          // flood the logs; first and every 1000th drop per executor JVM
          // surface at WARN, the rest at DEBUG
          val n = DroppedBuckets.incrementAndGet()
          val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")
          val msg = s"dropping hot LSH bucket ${key}: more than $cap members (no discriminating signal; $n dropped so far in this JVM)"
          if (n == 1 || n % 1000 == 0) log.warn(msg) else log.debug(msg)
          Iterator.single((0L, 0L, 0L, 0L, 1)) // sentinel: counted by observeDrops, then stripped
        } else if (buf.length < 2) Iterator.empty
        else {
          val ms = buf.sorted.toArray
          for {
            i <- ms.indices.iterator
            j <- ((i + 1) until ms.length).iterator
            if ms(i)._1 != ms(j)._1 // duplicate ids must not self-pair
          } yield (ms(i)._1, ms(i)._2, ms(j)._1, ms(j)._2, 0)
        }
      }
      .toDF("id_a", "pay_a", "id_b", "pay_b", "__dropped")
      .transform(observeDrops)
  }

  /**
   * LSH banding: split the signature into `bands` bands of `rowsPerBand`
   * lanes, hash each band to a bucket, expand candidate pairs WITHIN each
   * bucket group. One group-by-(band, bucket) shuffle carrying (band, bucket,
   * id) — no self-join, so the signature scan is consumed exactly once and
   * nothing needs caching. Returns candidate pairs (id_a < id_b), dedup'd.
   * Buckets above `maxBucket` members are dropped (see [[bucketPairs]]).
   */
  def lshCandidates(signatures: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
                    maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val spark = signatures.sparkSession
    import spark.implicits._
    bandBuckets(signatures, idCol, bands, rowsPerBand, payload = 0L)
      .as[(Int, Long, Long, Long)]
      .transform(bucketPairs(_, maxBucket))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Band a signature frame into `(band, bucket, id, payload)` bucket rows —
    * the unit the pair expanders group on. `payload` tags each row (the
    * incremental probe uses it as a side marker; 0 when unused). */
  private def bandBuckets(signatures: DataFrame, idCol: String, bands: Int,
                          rowsPerBand: Int, payload: Long): DataFrame =
    signatures
      // a signature SHORTER than bands*rowsPerBand would read NULL lanes that
      // concat_ws silently SKIPS — bands would hash fewer lanes than asked
      // and distinct bands could collapse into one degenerate bucket; fail
      // the task instead (assert_true survives column pruning inside where)
      .where(assert_true(size(col("signature")) >= bands * rowsPerBand,
        lit(s"signature shorter than bands*rowsPerBand = ${bands * rowsPerBand}")).isNull)
      .select(
        col(idCol),
        posexplode(array((0 until bands).map { b =>
          xxhash64(concat_ws(",",
            (0 until rowsPerBand).map(r => col("signature")(b * rowsPerBand + r).cast("string")): _*))
        }: _*)).as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col(idCol).cast("long"), lit(payload).as("payload"))

  /** Cross-side pair expansion for the incremental probe: rows are
    * `(band, bucket, id, side)` with side 0 = standing, 1 = batch; emits
    * ONLY standing×batch pairs per bucket — a bucket holding one standing
    * doc and its k batch copies costs k pairs, not (k+1)k/2 as the
    * symmetric expander would. Each side is buffered up to `cap`; a bucket
    * where either side overflows is dropped whole (same rationale and
    * accumulator as [[bucketPairs]]). */
  private[graft] def crossBucketPairs(banded: Dataset[(Int, Long, Long, Long)], cap: Int): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val acc = droppedHotBuckets(spark)
    banded
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key, rows) =>
        val standing = new scala.collection.mutable.ArrayBuffer[Long](8)
        val batch = new scala.collection.mutable.ArrayBuffer[Long](8)
        var overflow = false
        while (!overflow && rows.hasNext) {
          val r = rows.next()
          val buf = if (r._4 == 0L) standing else batch
          if (buf.length < cap) buf += r._3 else overflow = true
        }
        if (overflow) {
          acc.add(1L)
          val n = DroppedBuckets.incrementAndGet()
          val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")
          val msg = s"dropping hot LSH bucket ${key}: one side exceeds $cap members ($n dropped so far in this JVM)"
          if (n == 1 || n % 1000 == 0) log.warn(msg) else log.debug(msg)
          Iterator.single((0L, 0L, 1)) // sentinel: counted by observeDrops, then stripped
        } else if (standing.isEmpty || batch.isEmpty) Iterator.empty
        else for (s <- standing.iterator; b <- batch.iterator) yield (s, b, 0)
      }
      .toDF("standing_id", "batch_id", "__dropped")
      .transform(observeDrops)
  }

  /**
   * STANDING MinHash-LSH index of a corpus: the banded bucket rows
   * `(band, bucket, id)` for every document. At 100 TB, dedup is not a
   * one-shot batch job — the corpus is a standing asset and new data arrives
   * in batches, so the index is built ONCE (and persisted / written to a
   * bucketed table), and each arriving batch probes it via
   * [[incrementalNearDups]] at the cost of the BATCH's signatures only,
   * never re-pairing the corpus with itself.
   */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String, shingleN: Int = 3,
                   numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val sigs = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
    bandBuckets(sigs, idCol, bands, numHashes / bands, payload = 0L)
      .select(col("band"), col("bucket"), col(idCol))
  }

  /**
   * Incremental near-dup probe: find (batch, standing) near-duplicate pairs
   * between a NEW batch and a standing corpus index built by
   * [[minhashIndex]] with the SAME (shingleN, numHashes, bands) parameters.
   * Only CROSS-side pairs are generated ([[crossBucketPairs]]): standing-vs-
   * standing pairs were already handled when the corpus was deduped, and
   * batch-vs-batch pairs are the caller's separate intra-batch dedup pass —
   * so a bucket holding one standing doc and its k batch copies costs k
   * pairs, not (k+1)k/2. Candidates are then exact-verified
   * ([[jaccardVerify]]) over `standingDocs ∪ batch` texts.
   *
   * Returns `(batch_id, standing_id, inter, uni, jaccard)` with
   * `jaccard >= threshold`. Batch ids MUST be disjoint from standing ids
   * (they tag the sides through the shuffle).
   */
  def incrementalNearDups(index: DataFrame, standingDocs: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String, shingleN: Int = 3,
                          numHashes: Int = 16, bands: Int = 4, threshold: Double = 0.5,
                          maxBucket: Int = DefaultMaxBucket,
                          unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val spark = index.sparkSession
    import spark.implicits._
    val batchBanded = bandBuckets(
      minhashSignatures(batch, idCol, textCol, shingleN, numHashes),
      idCol, bands, numHashes / bands, payload = 1L)
    val allBanded = index
      .select(col("band").cast("int"), col("bucket").cast("long"),
        col(idCol).cast("long"), lit(0L).as("payload"))
      .unionByName(batchBanded)
      .as[(Int, Long, Long, Long)]
    val cands = crossBucketPairs(allBanded, maxBucket)
      .select(col("batch_id"), col("standing_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { cands.unpersist(); () })
    val corpus = standingDocs.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    jaccardVerify(
        cands.select(col("batch_id").as("id_a"), col("standing_id").as("id_b")),
        corpus, idCol, textCol, shingleN, threshold)
      .select(col("id_a").as("batch_id"), col("id_b").as("standing_id"),
        col("inter"), col("uni"), col("jaccard"))
  }

  /**
   * Exact shingle-set Jaccard for given candidate pairs (verify step).
   * Shingle hashes are re-derived only for ids that appear in a candidate
   * pair (semi-join first), so the expensive set math runs on a tiny fraction
   * of the corpus. Intersection/union sizes are computed by STREAMING the
   * shingle rows through two aggregations — per-document shingle sets are
   * never materialized as arrays, so a pathological multi-MB document costs
   * rows, not row width. Returns (id_a, id_b, inter, uni, jaccard) for pairs
   * with jaccard >= threshold; a pair where both docs have empty shingle sets
   * never surfaces (Jaccard 0/0 is undefined).
   *
   * Candidate pairs are made distinct internally (cheap — id pairs only): the
   * count-based set math requires it — a duplicated (id_a, id_b) row would
   * double every (pair, h) count, so single-side shingles would hit
   * n_sides = 2 and be miscounted as intersection.
   */
  def jaccardVerify(candidates: DataFrame, corpus: DataFrame, idCol: String, textCol: String, shingleN: Int, threshold: Double): DataFrame = {
    // melt each pair to two (pair, member-id) rows; both the semi-join id set
    // and the shingle join derive from this single frame
    val edges = candidates.select(col("id_a"), col("id_b")).distinct().select(
      col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as(idCol))
    // no distinct on the id side: left_semi never multiplies rows, so the
    // duplicate ids in the melted frame are harmless and skipping the
    // exchange removes a whole codegen stage from the pipeline
    val needed = corpus.join(edges.select(col(idCol)), Seq(idCol), "left_semi")
    val sh = shingleHashes(needed, idCol, textCol, shingleN) // (id, h), distinct per id
    edges.join(sh, idCol)
      // one row per (pair, shingle): n_sides = 1 (one member has it) or 2 (both)
      .groupBy(col("id_a"), col("id_b"), col("h"))
      .agg(count(lit(1)).as("n_sides"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        sum(when(col("n_sides") === 2, 1L).otherwise(0L)).as("inter"),
        count(lit(1)).as("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"), col("jaccard"))
  }

  /**
   * Exact shingle-set CONTAINMENT for given candidate pairs — [[jaccardVerify]]'s
   * ASYMMETRIC sibling. Containment(A in B) = |S_A ∩ S_B| / |S_A| catches the
   * subset/superset near-dups symmetric Jaccard structurally misses: a short
   * document quoted whole inside a long one has containment ≈ 1 but Jaccard
   * ≈ |A|/|B| ≈ 0 — boilerplate-wrapping, quote-expansion, and
   * version-append duplicates all look like this at corpus scale. A pair
   * survives when its LARGER containment (intersection over the SMALLER set)
   * reaches `threshold`.
   *
   * Same streaming shape as [[jaccardVerify]] — semi-join to candidate ids,
   * two count aggregations, never a materialized per-doc set — plus one
   * broadcast-sized join against per-doc set sizes. Returns
   * (id_a, id_b, inter, n_a, n_b); directionality is the caller's read:
   * inter/n_a is "A inside B", inter/n_b the reverse.
   */
  def containmentVerify(candidates: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, shingleN: Int, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val edges = candidates.select(col("id_a"), col("id_b")).distinct().select(
      col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as(idCol))
    val needed = corpus.join(edges.select(col(idCol)), Seq(idCol), "left_semi")
    val sh = shingleHashes(needed, idCol, textCol, shingleN) // (id, h), distinct per id
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    edges.join(sh, idCol)
      .groupBy(col("id_a"), col("id_b"), col("h"))
      .agg(count(lit(1)).as("n_sides"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("n_sides") === 2, 1L).otherwise(0L)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("n_b")), "id_b")
      .where(col("inter").cast("double") / least(col("n_a"), col("n_b")).cast("double")
        >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates then exact verify.
    * The candidate-pair set (small: ids only, LSH-bounded) is persisted —
    * `jaccardVerify`'s melt frame feeds both the semi-join and the shingle
    * join, and recomputing the whole signature+bucket subtree for each
    * dominates runtime. This is the pipeline's ONLY cached frame; everything
    * upstream is single-consumer. `unpersistHook` (if given) receives an
    * unpersist callback so long-lived applications can release the cache once
    * the returned frame has been consumed. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String, shingleN: Int = 3,
                      numHashes: Int = 16, bands: Int = 4, threshold: Double = 0.5,
                      maxBucket: Int = DefaultMaxBucket,
                      unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands): " +
        "integer division would silently drop signature lanes, and rowsPerBand=0 " +
        "hashes an empty band for every row, degenerating to an all-pairs join")
    val sigs = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
    // SER: id pairs are tiny and compress well; serialized blocks keep the
    // cache footprint minimal and spill cheaply
    val cands = lshCandidates(sigs, idCol, bands, numHashes / bands, maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { cands.unpersist(); () })
    jaccardVerify(cands, df, idCol, textCol, shingleN, threshold)
  }

  /**
   * Connected components over an undirected (id_a, id_b) edge list — the
   * clustering step every dedup pipeline runs AFTER near-dup pair generation:
   * near-duplicate pairs are transitive in practice (A~B, B~C => one cluster),
   * and the canonical representative of each cluster is its component id (the
   * minimum member id).
   *
   * Algorithm: alternating large-star / small-star (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC 2014) — converges in
   * O(log n) rounds, each round two groupBy shuffles over the EDGE set (which
   * for dedup is tiny relative to the corpus: only near-dup pairs), no
   * driver-side graph state. Per round:
   *
   *  - large-star: every node's strictly-larger neighbors are re-pointed at
   *    the minimum of its closed neighborhood;
   *  - small-star: every node's smaller-or-equal neighbors (and itself) are
   *    re-pointed at that minimum.
   *
   * Each iteration's edge frame is LOCALLY CHECKPOINTED, not merely persisted:
   * every round references the previous frame several times, so the logical
   * plan would double per iteration (exponential `treeString`/optimizer blowup
   * by ~iteration 10 — a persisted frame still carries its full plan);
   * `localCheckpoint` truncates the lineage to the materialized RDD, which is
   * exactly the iterative-graph-algorithm pattern. Superseded checkpoint
   * blocks are released by Spark's context cleaner as references drop.
   * Convergence is detected when the canonical edge set stops changing (equal
   * cardinality + empty one-sided difference — both distinct sets). The
   * converged graph is a forest of stars, so the component of x is
   * min(x, neighbors of x).
   *
   * Returns (id, component) for every id appearing in `edges`, where
   * `component` is the smallest id in x's component. Self-loops are ignored;
   * isolated ids (no edges) don't appear — union them back as their own
   * component if needed.
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val cols = edges.columns
    var e = edges
      .select(col(cols(0)).cast("long").as("a"), col(cols(1)).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(false) // lazy: the fingerprint job below materializes it
    // per-round convergence probe in ONE job: cardinality + an
    // order-insensitive content hash (bit_xor of per-row xxhash64). Equal
    // (count, hash) almost certainly means an unchanged edge set; the exact
    // `except` check then CONFIRMS it (so a 2^-64 hash collision can only
    // cost one extra round, never a wrong early stop).
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.select(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    var (eCount, eHash) = fingerprint(e)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // large-star: m(u) = min of u's closed neighborhood; (v, m(u)) for v > u
      val dir = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = dir.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = dir.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
      // small-star: view each edge from its larger endpoint; connect the
      // smaller neighbors AND the node itself to the neighborhood minimum
      val down = ls.select(col("v").as("u"), col("u").as("v")) // v < u now
      val mins2 = down.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = down.join(mins2, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .localCheckpoint(false) // lazy: materialized by the fingerprint job
      val (nNew, hNew) = fingerprint(ss)
      converged = nNew == eCount && hNew == eHash && ss.except(e).isEmpty
      e = ss
      eCount = nNew
      eHash = hNew
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")
        .warn(s"connectedComponents hit maxIter=$maxIter before the edge set stabilized; " +
          "labels may split components that more rounds would merge")
    // converged graph is a star forest: component(x) = min(x, neighbors)
    val dir = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    dir.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("component"))
  }

  /**
   * INCREMENTAL connected components — fold a batch of NEW edges into a
   * standing `(id, component)` assignment without re-clustering history:
   * the maintenance loop of a production dedup store, where the nightly
   * batch adds a few million edges against billions of standing rows and a
   * from-scratch [[connectedComponents]] would iterate over ALL historical
   * edges again.
   *
   * A new edge (a, b) can only merge the COMPONENTS of a and b, so the
   * star-contraction runs on the component-level graph — `newEdges` mapped
   * through the assignment (ids absent from the assignment enter as their
   * own singleton component) — which is BATCH-proportional, never
   * history-proportional. The resulting old→merged mapping then applies to
   * the standing assignment as one keys-proportional join; rows of
   * untouched components pass through unchanged, and because both the
   * standing canonical and the merge canonical are MIN ids, the output is
   * IDENTICAL to a from-scratch run over (old ∪ new) edges — the
   * equivalence q162's closed-form oracle checks exactly.
   *
   * SCALE SHAPE: two hash joins keyed by id (mapping the batch's
   * endpoints), the CC iteration on the tiny component graph, and one
   * (id, component) join to re-label — the standing frame crosses ONE
   * shuffle as its projection; no history edges are read at all.
   *
   * Returns the full updated assignment: every standing id plus every new
   * id from the batch.
   */
  def incrementalComponents(assignment: DataFrame, newEdges: DataFrame): DataFrame = {
    val asg = assignment.select(col(assignment.columns(0)).cast("long").as("id"),
      col(assignment.columns(1)).cast("long").as("component"))
    val e = newEdges
      .select(col(newEdges.columns(0)).cast("long").as("a"),
        col(newEdges.columns(1)).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    // every batch endpoint's CURRENT component (its own id when unseen)
    val endpoints = e.select(col("a").as("id")).unionByName(e.select(col("b").as("id"))).distinct()
    val endpointComp = endpoints.join(asg, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .localCheckpoint()
    val compEdges = e
      .join(endpointComp.select(col("id").as("a"), col("component").as("ca")), "a")
      .join(endpointComp.select(col("id").as("b"), col("component").as("cb")), "b")
      .select(col("ca"), col("cb")).where(col("ca") =!= col("cb"))
    // star-contraction over the BATCH-sized component graph only
    val merged = connectedComponents(compEdges)
      .select(col("id").as("component"), col("component").as("__newc"))
    val newIds = endpointComp.join(asg.select(col("id")), Seq("id"), "left_anti")
    asg.unionByName(newIds)
      .join(merged, Seq("component"), "left_outer")
      .select(col("id"), coalesce(col("__newc"), col("component")).as("component"))
  }

  /**
   * Edit-distance verification of candidate pairs — the fuzzy-match
   * complement to [[jaccardVerify]]: token-set similarity is blind to
   * CHARACTER-level edits (typo variants, OCR noise, template fills), which
   * Levenshtein distance measures directly. Distance is computed with
   * Spark's built-in codegen'd `levenshtein(l, r, threshold)` — the banded
   * O(len·maxDist) form, NOT the full O(len²) matrix — so cost per pair is
   * linear in text length for small thresholds; pairs above the threshold
   * never materialize a distance at all.
   *
   * CONTRACT: pair cost is still O(len·maxDist), so candidates must come
   * from a bounded source (the df-capped shingle chain, a blocking key) and
   * the operator suits short-to-medium text fields. The distance UNIT is
   * UNICODE CODE POINTS (Spark's native levenshtein semantics) on ANY
   * corpus encoding — the semantically right unit (a CJK substitution is
   * ONE edit, not three). Cross-engine replay against byte-based
   * levenshteins (e.g. DuckDB): equal outright on ASCII text (q105);
   * for non-ASCII, normalize the oracle side by translating each distinct
   * non-ASCII code point to a unique single ASCII byte first — a
   * distance-preserving reduction whenever the alphabet is known, which
   * q169's planted unicode near-dups gate under the hash oracle.
   *
   * Returns (id_a, id_b, edit_dist) for pairs with distance <= maxDist.
   */
  def editDistanceVerify(candidates: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val texts = corpus.select(col(idCol).cast("long").as("__id"), col(textCol).as("__t"))
    // distinct: the sibling verifiers (jaccardVerify/containmentVerify) share
    // this defensive contract — a duplicated candidate row must not pay the
    // O(len·maxDist) kernel twice or duplicate output
    candidates.select(col("id_a"), col("id_b")).distinct()
      .join(texts.select(col("__id").as("id_a"), col("__t").as("__ta")), "id_a")
      .join(texts.select(col("__id").as("id_b"), col("__t").as("__tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb"), maxDist).as("edit_dist"))
      .where(col("edit_dist") >= 0) // threshold form returns -1 above maxDist
  }

  /**
   * BEST-of-cluster representative selection: given duplicate-cluster
   * membership (`members`: (id, component) as produced by
   * [[connectedComponents]]) and an integer quality score per id, keep the
   * member with the HIGHEST score (ties to the smallest id) — what a curation
   * pipeline actually wants from dedup, which is rarely "keep the smallest
   * id" and usually "keep the best copy" (longest, highest-quality,
   * most-recent). Scores are cast to long so the selection is exact and
   * engine-reproducible; float scores should be micro-unit-quantized by the
   * caller first (the q67/q98 convention).
   *
   * SCALE SHAPE: one co-partitioned join of (id, component) with (id, score)
   * — three longs per row — then a single aggregation whose state is one
   * (score, id) pair per component regardless of cluster size; the document
   * payloads never move. The lexicographic max over struct(score, ~id)
   * resolves "max score then min id" in ONE aggregate (a separate
   * max-score-then-min-id pass would be a second shuffle).
   *
   * Returns (component, keep_id, keep_score).
   */
  def bestOfCluster(members: DataFrame, scores: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val s = scores.select(col(idCol).cast("long").as("id"), col(scoreCol).cast("long").as("score"))
    // bitwise NOT, not arithmetic negation, inverts the id order inside the
    // struct max: ~a > ~b iff a < b for ALL longs (including Long.MinValue,
    // where -id overflows back to itself and would break the tie order)
    members.select(col("id"), col("component"))
      .join(s, "id")
      .groupBy(col("component"))
      .agg(max(struct(col("score"), bitwise_not(col("id")).as("not_id"))).as("m"))
      .select(col("component"), bitwise_not(col("m.not_id")).as("keep_id"), col("m.score").as("keep_score"))
  }

  /**
   * Cross-GROUP n-gram overlap matrix — which sources/snapshots/languages
   * share content: per group, the set of distinct shingle hashes its
   * documents contain; per group PAIR, the intersection size and an integer
   * per-mille Jaccard. The corpus-level contamination diagnostic (one source
   * mirroring another, a crawl snapshot duplicating a curated set) that
   * document-pair dedup doesn't surface directly.
   *
   * CONTRACT: `groupCol` cardinality must be modest (sources, langs — not
   * doc_ids): a shingle shared by g groups expands to g·(g−1)/2 pair rows.
   * Documents are never self-joined; the join key is the shingle hash and
   * the frames carry (group, hash) only, so the shuffle is bounded by the
   * distinct (group, shingle) mass, not by document payloads.
   *
   * Returns (group_a, group_b, inter, n_a, n_b, jaccard_permille) for pairs
   * with at least one shared shingle, group_a < group_b.
   */
  def groupOverlap(df: DataFrame, groupCol: String, idCol: String, textCol: String,
      shingleN: Int = 3,
      unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    // THREE consumers read the distinct (group, shingle) frame (sizes + both
    // self-join sides) — persist it once, the duplicateShingleStats /
    // minhashNearDups convention (Spark never reuses work across consumers)
    val sh = shingleHashes(df, idCol, textCol, shingleN)
      .join(df.select(col(idCol), col(groupCol).as("g")), idCol)
      .select(col("g"), col("h")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { sh.unpersist(); () })
    val sizes = sh.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("group_a"), col("b.g").as("group_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("g").as("group_a"), col("n").as("n_a"))), "group_a")
      .join(broadcast(sizes.select(col("g").as("group_b"), col("n").as("n_b"))), "group_b")
      .select(col("group_a"), col("group_b"), col("inter"), col("n_a"), col("n_b"),
        expr("inter * 1000 div (n_a + n_b - inter)").as("jaccard_permille"))
  }

  /**
   * SimHash (64-bit) per id: per bit position, sum +1/-1 votes of each
   * token-hash's bit, assemble the sign vector into one long. Computed in one
   * NARROW pass per document (FNV-1a token hash, local vote array) — a
   * per-doc-computable signature needs no explode/aggregate shuffle at all.
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val votes = new Array[Int](64) // reused across docs in the partition
        rows.filter(_._2 != null).map { case (id, text) =>
          java.util.Arrays.fill(votes, 0)
          val words = graft.functions.Text.segmentText(text)
          var i = 0
          while (i < words.length) {
            val w = words(i)
            var h = 1469598103934665603L // FNV-1a 64
            var k = 0
            while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
              b += 1
            }
            i += 1
          }
          var sim = 0L
          var b = 0
          while (b < 64) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
          (id, sim)
        }
      }
      .toDF(idCol, "simhash")
  }

  /**
   * SimHash near-dups with Hamming distance <= maxHamming: band the 64 bits
   * into (maxHamming+1) chunks — by pigeonhole, any pair within the distance
   * agrees exactly on at least one chunk — group per chunk value, expand
   * in-bucket pairs (carrying each member's signature as the pair payload),
   * verify Hamming with `Long.bitCount` right after the expansion. One
   * group-by shuffle, signature pass consumed once, no cache. EXACT w.r.t.
   * the signature for buckets within `maxBucket` members: pigeonhole banding
   * cannot miss a pair within `maxHamming` (unlike probabilistic minhash
   * banding); hotter buckets are dropped (see [[bucketPairs]]).
   */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
                      maxBucket: Int = DefaultMaxBucket): DataFrame =
    hammingPairs(simhash(df, idCol, textCol), idCol, "simhash", maxHamming, maxBucket)

  /**
   * The pigeonhole-banded Hamming pair source behind [[simhashNearDups]],
   * over ANY 64-bit signature frame `(idCol, sigCol)` — the same kernel
   * serves text simhash and image perceptual hashes
   * ([[graft.multimodal.Media.perceptualHash]]): band, group per chunk
   * value, expand in-bucket pairs with signatures as payload, verify
   * `bit_count` right after expansion. EXACT w.r.t. the signature within
   * the `maxBucket` cap (pigeonhole cannot miss a pair at distance <=
   * maxHamming); hotter buckets drop counted (see [[bucketPairs]]).
   */
  def hammingPairs(sigs: DataFrame, idCol: String, sigCol: String, maxHamming: Int,
                   maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1,31], got $maxHamming — 0 would band the whole " +
        "64-bit signature into one chunk whose (1L << 64) mask wraps to 0 in JVM " +
        "shift semantics (use exact dedup for distance 0)")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val banded = sigs.select(
        col(idCol), col(sigCol),
        posexplode(array((0 until chunks).map { c =>
          shiftrightunsigned(col(sigCol), c * width).bitwiseAND(lit((1L << width) - 1))
        }: _*)).as(Seq("chunk", "chunk_val")))
      .select(col("chunk"), col("chunk_val"), col(idCol).cast("long"), col(sigCol))
      .as[(Int, Long, Long, Long)]
    bucketPairs(banded, maxBucket)
      .select(col("id_a"), col("id_b"),
        bit_count(col("pay_a").bitwiseXOR(col("pay_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /**
   * Line-level boilerplate removal (the CCNet / RefinedWeb curation step):
   * a line that appears in >= `minDf` DISTINCT documents is boilerplate
   * (nav bars, cookie banners, copyright footers) and is cut from every
   * document; the per-document remainder is re-joined in original line
   * order. Emits one row per input doc:
   * `(doc_id, kept_text, n_lines, n_kept, n_removed)` — a doc whose every
   * line is boilerplate survives with `kept_text = ''` (so downstream
   * length filters see it, rather than the doc silently vanishing).
   *
   * SCALE SHAPE: lines flow through THREE exchanges, none carrying the
   * corpus redundantly — (1) the df aggregation groups by a 128-bit md5 of
   * the line (16 bytes + doc id per row, never the line text; the
   * [[exact]] hashing argument), with map-side partial combine on the
   * distinct-doc count; (2) the boilerplate frame that comes back is ONLY
   * the lines at df >= minDf — web boilerplate is a tiny, heavy-tailed
   * vocabulary, so AQE broadcasts the left-anti join at any realistic
   * threshold; (3) the order-restoring regroup shuffles each doc's kept
   * lines once, keyed by doc id. No self-join, no window over the corpus,
   * no driver collection.
   */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String, minDf: Int): DataFrame =
    lineDedupWith(docs, idCol, textCol, lineBoilerplate(docs, idCol, textCol, minDf))

  /** The 16-byte line hash every line-dedup surface keys on (raw-binary
    * safe, the [[exact]] hashing argument) — centralized so the batch
    * kernel, the standing store, and any oracle replay cannot drift. */
  def lineHash(line: Column): Column = md5(line.cast("binary"))

  /** `(doc_id, pos, line, lh)` — one row per line of each doc. NULL text
    * folds to the empty string (one empty line), so a NULL-text doc
    * stays visible through every consumer instead of silently vanishing
    * from the exploded frame. */
  private def lineFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("lh", lineHash(col("line")))

  /** The boilerplate VOCABULARY alone — line hashes at df >= `minDf`
    * distinct docs, the [[lineDedup]] cut set as a reusable frame (what a
    * standing store maintains incrementally; see
    * `StreamOps.boilerplateFromStore`). */
  def lineBoilerplate(docs: DataFrame, idCol: String, textCol: String, minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf — at 1 every line is boilerplate")
    lineFrame(docs, idCol, textCol)
      .groupBy(col("lh"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
      .select(col("lh"))
  }

  /**
   * Apply a PRE-COMPUTED boilerplate vocabulary (`boiler`: one `lh`
   * column) to a document frame — the incremental face of [[lineDedup]]:
   * a new batch cleans against a standing corpus-wide vocabulary without
   * re-deriving df from history. Same output contract as [[lineDedup]].
   */
  def lineDedupWith(docs: DataFrame, idCol: String, textCol: String,
      boiler: DataFrame): DataFrame = {
    val lines = lineFrame(docs, idCol, textCol)
    // no .distinct() on the vocabulary: a left_anti join is insensitive
    // to duplicate right-side keys, and both producers (lineBoilerplate,
    // boilerplateFromStore) already emit distinct hashes
    val kept = lines.join(boiler.select(col("lh")), Seq("lh"), "left_anti")
    val keptAgg = kept.groupBy(col("doc_id")).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")),
        "\n").as("kept_text"),
      count(lit(1)).as("n_kept"))
    val totals = lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    totals.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
