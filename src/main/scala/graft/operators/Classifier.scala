package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * TRAINED text classifier — hashed-feature multinomial Naive Bayes, the
 * classic quality/domain-filter shape of LLM data curation (a CCNet-style
 * fastText filter reduced to its relational core): train token-count
 * statistics per label on a labeled slice, score the rest of the corpus,
 * keep/route documents by predicted label. Unlike the fixed-weight
 * char-trigram language ID ([[graft.functions.Text.langGuess]]), the
 * weights here are LEARNED from data inside the query plan.
 *
 * DETERMINISM CONTRACT (the repo's integer-scoring discipline): every
 * score is a BIGINT. Tokens hash to buckets via the md5-prefix integer
 * (the [[Sampling.hashId]] convention — identical in any engine), and the
 * log-likelihood uses the fixed-point integer log
 * `ilog(x) = floor(1024 * log2(x))` over integer counts, so a SQL oracle
 * replays training AND scoring exactly: score(d, l) =
 * `ilog(docs_l) + sum_b cnt_{d,b} * (ilog(c_{l,b}+1) - ilog(N_l + B))`
 * — Laplace-smoothed multinomial NB with the label-independent terms
 * dropped (they cannot move the argmax). floor(1024*log2(x)) of an
 * integer x is float-safe across engines: the distance from any grid
 * boundary is orders of magnitude above double rounding error for
 * x < 2^40 (exact at powers of two, where log2 is exact).
 *
 * SCALE SHAPE — training is ONE explode + map-side-combined aggregation
 * over the labeled slice (labeled data is the small side by nature); the
 * model is a DENSE (label x bucket) integer frame — L*B rows, kilobytes —
 * broadcast to the scoring join. Scoring is corpus-linear: one
 * (doc, bucket) aggregation, one broadcast join against the dense model,
 * one per-doc argmax over L rows (a doc-partitioned window — bounded by
 * the label count, never corpus-wide). No corpus self-join, no model
 * collect, no UDF: every step is codegen'd column arithmetic.
 */
object Classifier {

  /** Fixed-point integer log: `floor(1024 * log2(x))` — the only
    * transcendental in the model, applied to INTEGER counts only (see
    * class doc for why the floor is cross-engine exact). */
  def ilog(x: Column): Column = floor(lit(1024.0) * log2(x)).cast("long")

  /** Lowercase alphabetic-run tokens of `text` (empty runs dropped,
    * NULL text = no tokens), as one exploded row per token. */
  private def tokens(text: Column): Column =
    explode(filter(split(lower(coalesce(text, lit(""))), "[^a-z]+"), t => t =!= ""))

  /** Feature-hash a token to one of `buckets` buckets: first 8 hex chars
    * of md5 read as an integer, mod buckets — [[Sampling.hashId]]'s
    * engine-portable hash, applied to token text. */
  def tokenBucket(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))

  /** Learned model: dense per-(label, bucket) weights plus per-label
    * priors, both integer frames bounded by labels x buckets (broadcast
    * material, never corpus-sized). */
  final case class NbModel(weights: DataFrame, priors: DataFrame, buckets: Int)

  /**
   * MERGEABLE training state — the raw integer count frames, before any
   * log is taken: token counts per (label, bucket), token totals and doc
   * counts per label. Counts are additive, so two batches' states merge
   * by summation into exactly the state of their union (the repo's
   * sketch-merge family contract: merged ≡ from-scratch, gated in-query
   * by q188) — the shape that lets a standing classifier absorb a new
   * labeled batch without re-reading history.
   */
  final case class NbCounts(tokenCounts: DataFrame, labelTotals: DataFrame,
                            docCounts: DataFrame, buckets: Int)

  /** Count-statistics pass over one labeled batch: ONE explode +
    * map-side-combined aggregation; everything emitted is
    * label-cardinality-bounded. */
  def nbCounts(labeled: DataFrame, labelCol: String, textCol: String, buckets: Int): NbCounts = {
    val toks = labeled
      .select(col(labelCol).as("label"), tokens(col(textCol)).as("tok"))
      .select(col("label"), tokenBucket(col("tok"), buckets).as("b"))
    NbCounts(
      toks.groupBy(col("label"), col("b")).agg(count(lit(1)).as("c")),
      toks.groupBy(col("label")).agg(count(lit(1)).as("n_tok")),
      labeled.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_docs")),
      buckets)
  }

  /** Sum two batches' count states — exact, by additivity. */
  def mergeNbCounts(a: NbCounts, b: NbCounts): NbCounts = {
    require(a.buckets == b.buckets,
      s"bucket-count mismatch: ${a.buckets} vs ${b.buckets} — states are not mergeable")
    NbCounts(
      a.tokenCounts.unionByName(b.tokenCounts)
        .groupBy(col("label"), col("b")).agg(sum(col("c")).as("c")),
      a.labelTotals.unionByName(b.labelTotals)
        .groupBy(col("label")).agg(sum(col("n_tok")).as("n_tok")),
      a.docCounts.unionByName(b.docCounts)
        .groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs")),
      a.buckets)
  }

  /** Fixed-point log weights + priors from a count state: densified over
    * ALL buckets so unseen features carry the smoothing-only weight and
    * the scoring join never needs an outer edge. */
  def modelFromCounts(c: NbCounts): NbModel = {
    val spark = c.tokenCounts.sparkSession
    val priors = c.docCounts.select(col("label"), ilog(col("n_docs")).as("prior"))
    // The label axis comes from docCounts, NOT labelTotals: a label whose
    // training docs carry zero [a-z] tokens exists in docCounts only. Built
    // from labelTotals it would get NO weight rows and score a bare prior
    // at predict time, beating every real label's negative likelihood sum;
    // correct Laplace-smoothed NB gives it w = -ilog(B) per token
    // (n_tok = 0 below), so token-bearing docs rank it last, not first.
    val grid = c.docCounts.select(col("label")).crossJoin(
      spark.range(c.buckets.toLong).select(col("id").as("b")))
    val weights = grid
      .join(c.labelTotals, Seq("label"), "left")
      .join(c.tokenCounts, Seq("label", "b"), "left")
      .select(col("label"), col("b"),
        (ilog(coalesce(col("c"), lit(0L)) + lit(1L)) -
          ilog(coalesce(col("n_tok"), lit(0L)) + lit(c.buckets.toLong))).as("w"))
    NbModel(weights, priors, c.buckets)
  }

  /** Train on a labeled frame (counts pass + weight derivation). */
  def nbTrain(labeled: DataFrame, labelCol: String, textCol: String, buckets: Int): NbModel =
    modelFromCounts(nbCounts(labeled, labelCol, textCol, buckets))

  /**
   * Score and argmax: predicted label per document. Ties (possible on
   * token-free documents, where only priors compete) break to the
   * lexicographically smallest label — pinned identically in the oracle's
   * `ORDER BY score DESC, label` row_number.
   */
  def nbPredict(docs: DataFrame, idCol: String, textCol: String, model: NbModel): DataFrame = {
    val docTok = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("tok"))
      .select(col("id"), tokenBucket(col("tok"), model.buckets).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("cnt"))
    // token-free docs still get a (prior-only) score row per label
    val base = docs.select(col(idCol).as("id"))
      .crossJoin(broadcast(model.priors))
    val contrib = docTok
      .join(broadcast(model.weights), Seq("b"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("cnt") * col("w")).as("ll"))
    val scored = base.join(contrib, Seq("id", "label"), "left")
      .select(col("id"), col("label"),
        (col("prior") + coalesce(col("ll"), lit(0L))).as("score"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("score").desc, col("label").asc)))
      .where(col("rk") === 1)
      .select(col("id"), col("label").as("predicted"), col("score"))
  }

  /** Train on one slice, predict another, return the confusion matrix
    * (actual, predicted, n) — the standard held-out evaluation frame. */
  def confusionMatrix(train: DataFrame, test: DataFrame, labelCol: String,
                      idCol: String, textCol: String, buckets: Int): DataFrame = {
    val model = nbTrain(train, labelCol, textCol, buckets)
    val pred = nbPredict(test, idCol, textCol, model)
    test.select(col(idCol).as("id"), col(labelCol).as("actual"))
      .join(pred, Seq("id"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
