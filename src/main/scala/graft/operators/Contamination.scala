package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Train/eval contamination detection: find training documents that share
 * word n-grams with an evaluation (benchmark/test) set — the decontamination
 * step every serious LLM training pipeline runs before training, so eval
 * scores measure generalization rather than memorization.
 *
 * SCALE SHAPE: the eval side is SMALL BY CONTRACT (benchmark suites are
 * megabytes; the training corpus is the 100 TB side), so its distinct-shingle
 * frame is broadcast and the training corpus is scanned exactly once with a
 * narrow map-side hash probe — no shuffle of corpus data at all. The only
 * exchange in the plan carries (train_id, eval_id) HIT rows (bounded by true
 * contamination mass, tiny in practice) into the final count aggregation,
 * with map-side partial combine. Shingles travel as 64-bit FNV-1a hashes
 * ([[Dedup.shingleHashes]] — distinct per document, same tokenization as the
 * dedup kernels), never as strings.
 */
object Contamination {

  /**
   * Contaminated (train, eval) pairs: one row per training document sharing
   * at least `minShared` distinct word `n`-grams with an eval document.
   *
   * Output: (train_id, eval_id, n_shared) where n_shared counts DISTINCT
   * shared shingles (both sides' shingle sets are distinct per document, so
   * the hash join yields each shared gram exactly once per pair).
   *
   * 64-bit FNV collisions inflating a count are ~(grams_a * grams_b) / 2^64
   * per pair — negligible at any realistic document size (same argument as
   * the Jaccard verify kernel).
   */
  def overlapPairs(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int, minShared: Int): DataFrame = {
    require(n > 0, s"shingle width must be positive, got $n")
    require(minShared > 0, s"minShared must be positive, got $minShared")
    val trainSh = Dedup.shingleHashes(train, idCol, textCol, n)
      .withColumnRenamed(idCol, "train_id")
    val evalSh = Dedup.shingleHashes(eval, idCol, textCol, n)
      .withColumnRenamed(idCol, "eval_id")
    trainSh
      .join(broadcast(evalSh), "h") // eval is the small side by contract
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /**
   * CROSS-ARTIFACT overlap — "don't double-train": for each `a`-side
   * document, how many of its distinct n-grams appear ANYWHERE in the
   * `b`-side corpus. Unlike [[evalGramHits]], NEITHER side is
   * small-by-contract (an SFT release probed against a pretraining
   * release is big × big), so the shape is a SHUFFLE join on the gram
   * hash — both shingle frames are (id, h)/(h) longs, the texts never
   * shuffle, and the b side collapses to distinct hashes first. Output:
   * `(a_id, n_grams, n_overlap)` per a-document with at least one
   * n-gram; `n_overlap == n_grams` means every window of the document
   * already exists in `b` (the fully-redundant case a dedup between the
   * two artifacts would drop).
   */
  def crossCorpusOverlap(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val aSh = Dedup.shingleHashes(a, idCol, textCol, n)
      .select(col(idCol).as("a_id"), col("h"))
    val bSh = Dedup.shingleHashes(b, idCol, textCol, n)
      .select(col("h")).distinct()
    // ONE pass over the a side (guide §2.4/§5): a LEFT join against the
    // distinct b hashes marks each a-gram hit-or-miss (b is distinct, so
    // the join never duplicates an a row), and a single aggregation
    // counts totals and hits together — the previous shape scanned aSh
    // twice (totals + hits), aggregated twice, and joined the two back;
    // for an a side derived from an artifact read-back + decode chain
    // that was the dominant cost, not the join itself.
    aSh.join(bSh.withColumn("__hit", lit(1)), Seq("h"), "left")
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_overlap"))
      .select(col("a_id"), col("n_grams"), col("n_overlap"))
  }

  /**
   * Per-training-document contamination summary: how many distinct eval
   * n-grams the document contains, across the WHOLE eval set (the form used
   * for a drop/keep decision when pair attribution isn't needed). Same
   * broadcast shape; the aggregation key is train_id alone.
   */
  def evalGramHits(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val trainSh = Dedup.shingleHashes(train, idCol, textCol, n)
      .withColumnRenamed(idCol, "train_id")
    val evalGrams = Dedup.shingleHashes(eval, idCol, textCol, n)
      .select(col("h")).distinct()
    trainSh
      .join(broadcast(evalGrams), "h")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_grams"))
  }

  /**
   * SPAN-level contamination attribution — the upgrade from "shares n-grams"
   * ([[overlapPairs]]) to "contains a VERBATIM RUN of the eval text": for
   * each (train, eval) pair sharing at least one w-token window, the count
   * of matched window starts and the LONGEST CONTIGUOUS matched run, where
   * a run of r consecutive aligned windows certifies a common substring of
   * r + w - 1 tokens. This is the memorization audit's primary exhibit —
   * "train doc X contains 27 verbatim tokens of benchmark item Y" — and the
   * severity ranking a decontamination pass cuts by.
   *
   * Output: (train_id, eval_id, n_shared_windows, max_run, max_span_tokens).
   *
   * SCALE SHAPE: both sides collapse to positional (id, pos, h) window-hash
   * frames ([[Dedup.windowHashes]] — three longs per token, strings never
   * shuffle); the eval side is small by contract and broadcast. Contiguity
   * is gaps-and-islands on the ALIGNMENT DIAGONAL (tpos - epos): within a
   * (pair, diagonal) group, consecutive eval positions share one island via
   * the epos - row_number trick; the window function partitions by (pair,
   * diagonal), so its input is match-mass-bounded — never a corpus sort. A
   * window hash repeated in d train docs costs d match rows per eval start
   * (the same df-locality as every shingle join), and `maxDf` caps it: a
   * window held by MORE than `maxDf` distinct train documents is
   * boilerplate, not memorization — it carries no attribution signal and
   * would concentrate quadratic match mass on one hash — so those hashes
   * are dropped before the join (the LSH hot-bucket rule, applied to
   * windows; a genuine verbatim excerpt's windows have df ~ its true copy
   * count, far below any sane cap). Pairs below `minRun` are dropped at
   * the end (run 1 = an isolated w-gram, usually noise).
   */
  def spanAttribution(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      w: Int, minRun: Int = 1, maxDf: Int = Dedup.DefaultMaxBucket): DataFrame = {
    require(w > 0, s"window width must be positive, got $w")
    require(minRun > 0, s"minRun must be positive, got $minRun")
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    import org.apache.spark.sql.expressions.Window
    val trainWhAll = Dedup.windowHashes(train, idCol, textCol, w)
      .select(col(idCol).as("train_id"), col("pos").as("__tpos"), col("h"))
    // df cap on the TRAIN side: one aggregate over (h, train_id)-distinct
    // rows; the surviving-hash set anti-joins nothing — the match join
    // itself just sees fewer build rows
    val hotHashes = trainWhAll.select(col("train_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf)
      .select(col("h"))
    val trainWh = trainWhAll.join(hotHashes, Seq("h"), "left_anti")
    val evalWh = Dedup.windowHashes(eval, idCol, textCol, w)
      .select(col(idCol).as("eval_id"), col("pos").as("__epos"), col("h"))
    val matches = trainWh.join(broadcast(evalWh), "h")
      .select(col("train_id"), col("eval_id"), col("__tpos"), col("__epos"),
        (col("__tpos") - col("__epos")).as("__diag"))
    // islands of consecutive epos within one (pair, diagonal): epos minus its
    // rank is constant exactly along a contiguous run
    val rn = Window.partitionBy(col("train_id"), col("eval_id"), col("__diag"))
      .orderBy(col("__epos"))
    val runs = matches
      .withColumn("__isl", col("__epos") - row_number().over(rn))
      .groupBy(col("train_id"), col("eval_id"), col("__diag"), col("__isl"))
      .agg(count(lit(1)).as("__run"))
    runs.groupBy(col("train_id"), col("eval_id"))
      .agg(sum(col("__run")).as("n_shared_windows"), max(col("__run")).as("max_run"))
      .where(col("max_run") >= minRun)
      .select(col("train_id"), col("eval_id"), col("n_shared_windows"),
        col("max_run"), (col("max_run") + lit(w - 1)).as("max_span_tokens"))
  }
}
