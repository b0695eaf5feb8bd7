package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * UNIGRAM-LM tokenizer training (Kudo 2018, "Subword Regularization" §3;
 * the SentencePiece `--model_type=unigram` trainer) — the OTHER major
 * subword algorithm next to BPE ([[Bpe.learnMerges]]): where BPE GROWS a
 * vocabulary bottom-up by merging, the unigram LM SHRINKS one top-down —
 * seed with frequent substrings, fit piece probabilities by EM over each
 * word's segmentation lattice, prune the lowest-evidence pieces, repeat
 * until the target size. Encoding is Viterbi (most probable
 * segmentation).
 *
 * This is the algorithm's DETERMINISTIC CORE, reduced the way this repo
 * reduces Boilerpipe or jusText: every stochastic or
 * implementation-defined choice in the reference trainer is replaced by
 * a pinned rule so two independent runs — and the two faces below —
 * agree bit-for-bit:
 *  - expected counts are INTEGER FIXED-POINT (quantized at
 *    [[quantScale]] per word BEFORE any cross-word summation) — integer
 *    sums commute exactly, so the distributed aggregation is independent
 *    of partitioning and reduction order (the Classifier.nbCounts
 *    discipline);
 *  - all orderings (seed top-N, prune victims) tie-break
 *    lexicographically;
 *  - single-CODEPOINT pieces are never pruned and carry an expected-count
 *    floor of 1, so every word stays segmentable (the coverage rule the
 *    reference trainer enforces via required_chars).
 *
 * SCALE SHAPE — the same insight as [[Bpe.learnMergesCollected]]: the
 * training state is the DISTINCT-WORD frequency frame (Heaps-bounded,
 * sublinear in corpus mass), scanned out of the corpus exactly once.
 * Two faces share the per-word lattice kernel:
 * [[trainCollected]] collects the word frame once (`maxVocab`-guarded)
 * and runs every EM/prune round at driver memory speed — the production
 * path; [[trainDistributed]] keeps the word frame distributed and runs
 * each EM iteration as one broadcast + one integer aggregation — the
 * unbounded-vocabulary face (rounds are BOUNDED here, ~2 EM × ~log
 * prune rounds, unlike BPE's one-per-merge). Collected ≡ distributed is
 * exact by the fixed-point construction and gated in UnigramSpec and
 * in-query by q228.
 */
object Unigram {

  /** Longest candidate piece (the reference trainer's
    * max_sentencepiece_length, shortened to the subword regime). */
  val maxPieceLen: Int = 8

  /** EM iterations between prunes (the reference default is 2). */
  val emIters: Int = 2

  /** Prune fraction per round: drop 1/5 of multi-char pieces. */
  val shrinkNum: Int = 1
  val shrinkDen: Int = 5

  /** Fixed-point scale for per-word expected counts. */
  val quantScale: Long = 1L << 16

  /** A trained model: `(piece, evidence)` with integer fixed-point
    * expected counts; probabilities derive as evidence / total. */
  final case class UnigramModel(pieces: Seq[(String, Long)]) {
    @transient lazy val total: Long = pieces.iterator.map(_._2).sum
    @transient lazy val probs: Map[String, Double] =
      pieces.iterator.map { case (s, e) => (s, e.toDouble / total.toDouble) }.toMap
    /** Deterministic probability of a single UNKNOWN character at encode
      * time (a char absent from training data must not make encoding
      * partial): strictly below any trained piece. */
    def unkProb: Double = 0.25 / total.toDouble
  }

  /**
   * Per-word E-step: forward-backward over the segmentation lattice,
   * emitting each in-vocabulary piece's expected count quantized to
   * [[quantScale]] units. Pure function of (word, count, probs) — the
   * kernel BOTH faces run, so their equivalence reduces to summation
   * order, which integer quantization makes immaterial.
   */
  private val logZero = Double.NegativeInfinity

  /** log(Σ exp(xs)) accumulated incrementally: logAdd(a, b) with fixed
    * argument roles, so the evaluation order — and thus the bits — is
    * pinned by the caller's loop order. StrictMath transcendentals keep
    * the result platform-identical. */
  private def logAdd(a: Double, b: Double): Double =
    if (a == logZero) b
    else if (b == logZero) a
    else if (a >= b) a + StrictMath.log1p(StrictMath.exp(b - a))
    else b + StrictMath.log1p(StrictMath.exp(a - b))

  private[graft] def wordExpectedCounts(w: String, count: Long,
      probs: scala.collection.Map[String, Double]): Iterator[(String, Long)] = {
    // LOG-SPACE forward-backward: linear-space path masses underflow to
    // 0.0 around 50-300 chars (a URL or base64 token — routine in web
    // corpora), which would silently drop the word from training; log
    // space is exact down to exp(-1e308)-scale masses
    val n = w.length
    if (n == 0) return Iterator.empty
    val alpha = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, logZero)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var a = logZero
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (alpha(j) != logZero) {
          val p = probs.getOrElse(w.substring(j, i), 0.0)
          if (p > 0.0) a = logAdd(a, alpha(j) + StrictMath.log(p))
        }
        j += 1
      }
      alpha(i) = a
      i += 1
    }
    if (alpha(n) == logZero) return Iterator.empty
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(beta, logZero)
    beta(n) = 0.0
    var k = n - 1
    while (k >= 0) {
      var b = logZero
      val e = math.min(n, k + maxPieceLen)
      var i2 = k + 1
      while (i2 <= e) {
        if (beta(i2) != logZero) {
          val p = probs.getOrElse(w.substring(k, i2), 0.0)
          if (p > 0.0) b = logAdd(b, StrictMath.log(p) + beta(i2))
        }
        i2 += 1
      }
      beta(k) = b
      k -= 1
    }
    val lz = alpha(n)
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var j2 = 0
    while (j2 < n) {
      if (alpha(j2) != logZero) {
        val e = math.min(n, j2 + maxPieceLen)
        var i3 = j2 + 1
        while (i3 <= e) {
          val piece = w.substring(j2, i3)
          val p = probs.getOrElse(piece, 0.0)
          if (p > 0.0 && beta(i3) != logZero) {
            val ec = count.toDouble * StrictMath.exp(
              alpha(j2) + StrictMath.log(p) + beta(i3) - lz)
            acc.update(piece, acc.getOrElse(piece, 0.0) + ec)
          }
          i3 += 1
        }
      }
      j2 += 1
    }
    acc.iterator.map { case (s, v) => (s, math.round(v * quantScale)) }
      .filter(_._2 > 0L)
  }

  /** Position `i` of `w` is a CODEPOINT boundary — never between the
    * halves of a surrogate pair. Candidate pieces are enumerated on
    * codepoint boundaries only (the [[graft.operators.Bpe]]
    * `codepointSymbols` discipline): a piece tearing an astral codepoint
    * would be un-encodable as UTF-8 and would silently break the
    * byte-fallback total encoding downstream. Because every trained
    * piece is then well-formed, the EM lattice and Viterbi never match a
    * torn substring (a torn span starts with a low or ends with a high
    * surrogate — equal to no well-formed piece), so boundary enforcement
    * here covers the whole trainer. Value-identical on BMP-only corpora
    * (every pinned oracle). */
  private def isCpBoundary(w: String, i: Int): Boolean =
    i <= 0 || i >= w.length ||
      !(Character.isHighSurrogate(w.charAt(i - 1)) && Character.isLowSurrogate(w.charAt(i)))

  /** One whole codepoint (the never-pruned inventory floor unit — a
    * single Java char on the BMP, a surrogate pair above it). */
  private def isSingleCp(s: String): Boolean =
    s.nonEmpty && s.codePointCount(0, s.length) == 1

  /** Seed candidates of one word: every codepoint-boundary substring up
    * to [[maxPieceLen]] chars, weighted count × occurrences. */
  private[graft] def wordSeeds(w: String, count: Long): Iterator[(String, Long)] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var j = 0
    while (j < w.length) {
      if (isCpBoundary(w, j)) {
        val e = math.min(w.length, j + maxPieceLen)
        var i = j + 1
        while (i <= e) {
          if (isCpBoundary(w, i)) {
            val s = w.substring(j, i)
            acc.update(s, acc.getOrElse(s, 0L) + count)
          }
          i += 1
        }
      }
      j += 1
    }
    acc.iterator
  }

  /** One M-step + prune bookkeeping over integer piece sums, shared by
    * both faces: single chars floor at 1 and never prune; prune rounds
    * drop the weakest [[shrinkNum]]/[[shrinkDen]] of multi-char pieces
    * (at least one, at most down to `vocabSize`) by
    * (evidence asc, piece desc). Returns the new piece list. */
  private def refit(sums: Map[String, Long], current: Seq[String], vocabSize: Int,
      prune: Boolean): Seq[(String, Long)] = {
    val fitted = current.map { s =>
      val e = sums.getOrElse(s, 0L)
      (s, if (isSingleCp(s)) math.max(e, 1L) else e)
    }
    if (!prune) fitted.filter { case (s, e) => isSingleCp(s) || e > 0L }
    else {
      val (chars, multi) = fitted.partition(p => isSingleCp(p._1))
      val live = multi.filter(_._2 > 0L)
      val target = math.max(0, vocabSize - chars.size)
      val excess = live.size - target
      if (excess <= 0) chars ++ live
      else {
        val byWeakness = live.sortBy { case (s, e) => (e, s) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
        val nDrop = math.min(excess,
          math.max(1, live.size * shrinkNum / shrinkDen))
        val dropped = byWeakness.take(nDrop).map(_._1).toSet
        chars ++ live.filterNot(p => dropped(p._1))
      }
    }
  }

  /**
   * Seed selection, DISTRIBUTED for both faces: the substring-candidate
   * frame is ~maxPieceLen × word mass — far larger than the word frame
   * itself — so it must never materialize on the driver (only the
   * charset-bounded single-char slice and the `seedSize`-bounded top of
   * the multi-char ranking collect). Deterministic: top-N by
   * (weight desc, piece asc), the repo's orderBy+limit tie-break rule.
   */
  private def seedFrame(words: Dataset[(String, Long)], seedSize: Int): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val sums = words.flatMap { case (w, c) => wordSeeds(w, c) }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (s, e) => (s, e) }
    val chars = sums.filter(s => isSingleCp(s._1)).collect().toSeq
    val nMulti = math.max(0, seedSize - chars.size)
    val multi = sums.filter(s => !isSingleCp(s._1)).toDF("piece", "w")
      .orderBy(col("w").desc, col("piece").asc).limit(nMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    (chars ++ multi).sortBy(_._1)
  }

  /** Loop exit shared by both faces: at target size, or nothing prunable
    * is left (single chars never prune, so a vocabSize below the char
    * inventory bottoms out at the inventory instead of looping). */
  private def atTarget(model: UnigramModel, vocabSize: Int): Boolean =
    model.pieces.size <= vocabSize || model.pieces.forall(p => isSingleCp(p._1))

  private def emRounds(words: () => Iterator[(String, Long)],
      seed: Seq[(String, Long)], vocabSize: Int): UnigramModel = {
    var model = UnigramModel(seed)
    while (!atTarget(model, vocabSize)) {
      var iter = 0
      while (iter < emIters) {
        val sums = scala.collection.mutable.HashMap.empty[String, Long]
        val probs = model.probs
        words().foreach { case (w, c) =>
          wordExpectedCounts(w, c, probs).foreach { case (s, e) =>
            sums.update(s, sums.getOrElse(s, 0L) + e)
          }
        }
        val prune = iter == emIters - 1
        model = UnigramModel(refit(sums.toMap, model.pieces.map(_._1), vocabSize, prune))
        iter += 1
      }
    }
    model
  }

  /**
   * COLLECT-ONCE production training (the [[Bpe.learnMergesCollected]]
   * shape): one distributed word-count aggregation (`minCount` floor,
   * `maxVocab`-guarded collect), then the full seed → (EM × prune) →
   * target-size loop at driver memory speed.
   */
  def trainCollected(docs: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int, minCount: Long = 1L, maxVocab: Int = 4000000): UnigramModel = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need seedSize >= vocabSize >= 1, got seed=$seedSize vocab=$vocabSize")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val words = WordFrames.wordCounts(docs, textCol)
      .filter(_._2 >= minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // seed selection stays DISTRIBUTED even on the collect-once path:
      // the substring-candidate mass is ~maxPieceLen × the word frame —
      // the one intermediate the maxVocab guard does not cover
      val seed = seedFrame(words, seedSize)
      val vocab = words.limit(maxVocab + 1).collect()
      require(vocab.length <= maxVocab,
        s"distinct-word vocabulary exceeds maxVocab=$maxVocab after the minCount=$minCount " +
          "floor — raise minCount (the standard trainer response) or maxVocab")
      emRounds(() => vocab.iterator, seed, vocabSize)
    } finally { words.unpersist(): Unit }
  }

  /**
   * DISTRIBUTED training face for the unbounded-vocabulary regime: the
   * word frame stays a Dataset; each EM iteration is one broadcast of
   * the (vocab-bounded) piece probabilities + one integer expected-count
   * aggregation; the piece frame that reaches the driver is
   * MODEL-bounded, never corpus-bounded. Exactly equal to
   * [[trainCollected]] at `minCount = 1` by the fixed-point construction
   * (gated in UnigramSpec and q228).
   */
  def trainDistributed(docs: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int): UnigramModel = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need seedSize >= vocabSize >= 1, got seed=$seedSize vocab=$vocabSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = WordFrames.wordCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      var model = UnigramModel(seedFrame(words, seedSize))
      while (!atTarget(model, vocabSize)) {
        var iter = 0
        while (iter < emIters) {
          val bc = spark.sparkContext.broadcast(model.probs)
          val sums = words.flatMap { case (w, c) => wordExpectedCounts(w, c, bc.value) }
            .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
            .collect().toMap
          bc.destroy()
          val prune = iter == emIters - 1
          model = UnigramModel(refit(sums, model.pieces.map(_._1), vocabSize, prune))
          iter += 1
        }
      }
      model
    } finally { words.unpersist(): Unit }
  }

  /** The model as a store-able frame `(piece, evidence)` — the standing
    * tokenizer artifact, like [[Bpe.mergesFrame]]. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession,
      model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.toDF("piece", "evidence")
  }

  /** Load a [[modelFrame]] back. Pieces are canonicalized to piece order
    * — every model consumer (probs, total, unkProb, segment) is
    * order-insensitive, so a loaded model behaves identically to the
    * trained one; `maxEntries` guards the collect. */
  def modelFromFrame(df: DataFrame, maxEntries: Int = 1 << 22): UnigramModel = {
    val rows = df.limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"piece table exceeds maxEntries=$maxEntries — not a model-sized frame")
    UnigramModel(rows.map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1))
  }

  /**
   * Viterbi segmentation of one word — most probable piece sequence;
   * exact-score ties prefer the LONGER last piece (smaller split point),
   * making the rule total and deterministic. Single CODEPOINTS absent
   * from the model segment as themselves at [[UnigramModel.unkProb]]
   * (strictly below any trained piece), so encoding never fails — and
   * never emits a torn surrogate half (see [[isCpBoundary]]).
   */
  def segment(w: String, model: UnigramModel): Vector[String] = {
    // LOG-SPACE Viterbi: a linear-space product underflows to 0.0 around
    // 50-300 chars, which would leave back() unset and crash on the very
    // long tokens (URLs, base64, hashes) a web corpus always contains
    val n = w.length
    if (n == 0) return Vector.empty
    val probs = model.probs
    val logUnk = StrictMath.log(model.unkProb)
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, logZero)
    best(0) = 0.0
    java.util.Arrays.fill(back, -1)
    var i = 1
    while (i <= n) {
      var b = logZero
      var bj = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != logZero) {
          val piece = w.substring(j, i)
          val lp = probs.get(piece) match {
            case Some(p) => StrictMath.log(p)
            // unknown fallback is one whole CODEPOINT (2 chars when
            // astral) — a lone-surrogate "piece" would mangle to '?'
            // under UTF-8 downstream
            case None =>
              if (j + Character.charCount(w.codePointAt(j)) == i) logUnk else logZero
          }
          if (lp != logZero) {
            val s = best(j) + lp
            if (s > b || (s == b && j < bj)) { b = s; bj = j }
          }
        }
        j += 1
      }
      best(i) = b; back(i) = bj
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      out += w.substring(j, pos)
      pos = j
    }
    out.reverseIterator.toVector
  }

  /**
   * Per-document unigram token counts `(idCol, n_unigram_tokens)` — the
   * [[Bpe.tokenCounts]] shape with Viterbi instead of merge replay:
   * segmentation is a pure function of the word, so the lattice runs
   * once per DISTINCT word (vocab memoization) and joins back.
   */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: UnigramModel,
      unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame =
    WordFrames.memoizedTokenCounts(docs, idCol, textCol, "n_unigram_tokens",
      unpersistHook)(w => segment(w, model).length.toLong)
}
