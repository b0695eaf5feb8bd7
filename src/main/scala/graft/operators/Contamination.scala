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
}
