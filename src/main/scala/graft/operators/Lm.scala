package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Classifier.ilog

/**
 * Count-based n-gram language model with PERPLEXITY-style document scoring
 * — the CCNet quality filter reduced to its relational core: train bigram
 * statistics on a reference slice, score every document by how surprising
 * its bigrams are under that model, and gate/bucket documents on the
 * score. Unlike [[graft]]'s q129 rare-bigram *rate* (a boolean per
 * bigram), this is an actual smoothed language model: seen bigrams cost
 * their conditional log-probability, unseen bigrams back off to a
 * discounted unigram distribution (stupid backoff, Brants et al. 2007 —
 * the backoff weight is the exact rational 2/5).
 *
 * DETERMINISM CONTRACT (the repo's integer-scoring discipline, shared
 * with [[Classifier]]): every cost is a BIGINT in fixed-point 1/1024-bit
 * units via `ilog(x) = floor(1024 * log2(x))` over integer counts only.
 * A bigram's cost is a DIFFERENCE of two ilogs — `-log2 P` up to fixed-
 * point truncation — so a SQL oracle replays training AND scoring
 * exactly:
 *
 *   seen:    cost = ilog(nctx(w1))      - ilog(n(w1,w2))
 *   unseen:  cost = ilog(5 * (N + V))   - ilog(2 * (n(w2) + 1))
 *
 * where `nctx(w1) = Σ_w2 n(w1,w2)` (context totals from the bigram frame,
 * NOT the unigram counts — the last token of each doc contexts nothing),
 * `N` = total training tokens, `V` = distinct vocabulary (add-one
 * smoothing keeps OOV words finite), and 2/5 is the backoff discount
 * folded into the integers. All counts are >= 1 where ilog applies, so no
 * log of zero can occur on a non-empty training corpus.
 *
 * SCALE SHAPE — training is the q122 kernel: bigrams pair by a NARROW
 * array transform over each doc's token list (no self-join, no
 * posexplode+join), and only (w1, w2) pairs cross the one map-side-
 * combined shuffle, so the model frames are vocabulary-bounded (unigrams)
 * and vocabulary²-bounded (bigrams) — Heaps' law keeps both sublinear in
 * corpus size. Scoring aggregates the corpus side to (doc, w1, w2, cnt)
 * BEFORE joining (tf compression: a doc's repeated bigram joins once),
 * joins the model frames planner-decided (broadcast at any realistic
 * vocabulary), and the (N, V) totals ride along as a broadcast 1-row
 * scalar frame. No corpus self-join, no window, no UDF, no driver
 * collection anywhere.
 */
object Lm {

  /**
   * MERGEABLE training state — raw integer count frames, before any log:
   * `unigrams(w, n)` and `bigrams(w1, w2, n)`. Counts are additive, so
   * two batches' states merge by summation into exactly the state of
   * their union (the sketch-merge family contract; gated in-query by
   * q198) — a standing LM absorbs a new batch without re-reading history.
   * Derived quantities (context totals, N, V) are recomputed from the
   * merged frames at scoring time, so they can never drift from the
   * counts.
   */
  final case class LmCounts(unigrams: DataFrame, bigrams: DataFrame)

  /** One tokenize pass over a training slice: unigram and bigram counts
    * via the shared [[graft.functions.Text.edgeStrippedTokens]] kernel
    * (identical to the oracle's regexp extraction). */
  def lmCounts(docs: DataFrame, textCol: String): LmCounts = {
    val toks = docs.where(col(textCol).isNotNull)
      .select(graft.functions.Text.edgeStrippedTokens(col(textCol)).as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val bg = toks.where(size(col("tk")) >= 2)
      .select(explode(graft.functions.Text.bigramWindows(col("tk"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
    LmCounts(uni, bg)
  }

  /** Sum two batches' count states — exact, by additivity. */
  def mergeLmCounts(a: LmCounts, b: LmCounts): LmCounts = LmCounts(
    a.unigrams.unionByName(b.unigrams)
      .groupBy(col("w")).agg(sum(col("n")).as("n")),
    a.bigrams.unionByName(b.bigrams)
      .groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("n")))

  /**
   * Score documents under a trained model: one row per input doc —
   * `(doc_id, n_bigrams, nll_fp, avg_nll_fp)` where `nll_fp` is the
   * summed fixed-point negative log-likelihood (1/1024-bit units) and
   * `avg_nll_fp = nll_fp div n_bigrams` (integer division, both engines
   * truncate toward zero; nll is non-negative). Docs with fewer than two
   * tokens score `(0, 0, 0)` — they stay visible to downstream gates
   * rather than silently vanishing (the [[Dedup.lineDedup]] posture).
   * Training corpus must be non-empty (ilog of 0 is undefined).
   */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String, counts: LmCounts): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
    val db = base.where(col("__text").isNotNull)
      .select(col("doc_id"), graft.functions.Text.edgeStrippedTokens(col("__text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(graft.functions.Text.bigramWindows(col("tk"))).as("p"))
      .groupBy(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    val ctx = counts.bigrams.groupBy(col("w1")).agg(sum(col("n")).as("nctx"))
    val tot = counts.unigrams.agg(
      sum(col("n")).as("big_n"), count(lit(1)).as("vocab_v"))
    val cost =
      when(col("n").isNotNull, ilog(col("nctx")) - ilog(col("n")))
        .otherwise(ilog(lit(5L) * (col("big_n") + col("vocab_v"))) -
          ilog(lit(2L) * (coalesce(col("un"), lit(0L)) + lit(1L))))
    val scored = db
      .join(counts.bigrams, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(counts.unigrams.select(col("w").as("w2"), col("n").as("un")), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * cost).as("nll_fp"))
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_fp"), lit(0L)).as("nll_fp"),
        coalesce(expr("nll_fp div n_bigrams"), lit(0L)).as("avg_nll_fp"))
  }

  /** Train on one slice and score another, in one call. */
  def perplexityScore(train: DataFrame, score: DataFrame,
                      idCol: String, textCol: String): DataFrame =
    scoreDocs(score, idCol, textCol, lmCounts(train, textCol))

  /** TRIGRAM-order training state: the bigram/unigram frames of
    * [[LmCounts]] plus `trigrams(w1, w2, w3, n)` — the full backoff chain
    * a trigram scorer needs. Same additivity contract. */
  final case class LmCounts3(unigrams: DataFrame, bigrams: DataFrame, trigrams: DataFrame)

  /** The trigram window pairing, exploded (see
    * [[graft.functions.Text.trigramWindows]]). */
  private def triWindows(tk: org.apache.spark.sql.Column) =
    explode(graft.functions.Text.trigramWindows(tk))

  /** One tokenize pass: unigram, bigram AND trigram counts. The trigram
    * frame is vocabulary³-bounded in principle and Heaps-bounded in
    * practice (real text realizes a vanishing fraction of the cube). */
  def lmCounts3(docs: DataFrame, textCol: String): LmCounts3 = {
    val two = lmCounts(docs, textCol)
    val tri = docs.where(col(textCol).isNotNull)
      .select(graft.functions.Text.edgeStrippedTokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= 3)
      .select(triWindows(col("tk")).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
      .agg(count(lit(1)).as("n"))
    LmCounts3(two.unigrams, two.bigrams, tri)
  }

  /** Sum two batches' trigram-order states — exact, by additivity. */
  def mergeLmCounts3(a: LmCounts3, b: LmCounts3): LmCounts3 = {
    val two = mergeLmCounts(LmCounts(a.unigrams, a.bigrams), LmCounts(b.unigrams, b.bigrams))
    LmCounts3(two.unigrams, two.bigrams,
      a.trigrams.unionByName(b.trigrams)
        .groupBy(col("w1"), col("w2"), col("w3")).agg(sum(col("n")).as("n")))
  }

  /**
   * Trigram scoring with the FULL stupid-backoff chain, per consecutive
   * window (w1, w2, w3):
   *
   *   seen trigram:          cost = ilog(nctx2(w1,w2))   - ilog(n(w1,w2,w3))
   *   backoff to bigram:     cost = ilog(5 * nctx(w2))   - ilog(2 * n(w2,w3))
   *   backoff to unigram:    cost = ilog(25 * (N + V))   - ilog(4 * (n(w3) + 1))
   *
   * — each backoff level folds one 2/5 discount into the integers
   * (`-log2(0.4 · P) = ilog-difference with 5/2 multiplied through`), so
   * a doubly-unseen continuation pays both discounts. `nctx2` comes from
   * the trigram frame and `nctx` from the bigram frame (same last-window
   * argument as the bigram model). Output contract mirrors [[scoreDocs]]:
   * `(doc_id, n_trigrams, nll_fp, avg_nll_fp)`, sub-3-token docs at
   * `(0, 0, 0)`.
   */
  def scoreDocs3(docs: DataFrame, idCol: String, textCol: String, counts: LmCounts3): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
    val db = base.where(col("__text").isNotNull)
      .select(col("doc_id"), graft.functions.Text.edgeStrippedTokens(col("__text")).as("tk"))
      .where(size(col("tk")) >= 3)
      .select(col("doc_id"), triWindows(col("tk")).as("p"))
      .groupBy(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
      .agg(count(lit(1)).as("cnt"))
    val ctx2 = counts.trigrams.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("nctx2"))
    val ctx1 = counts.bigrams.groupBy(col("w1")).agg(sum(col("n")).as("nctx"))
    val tot = counts.unigrams.agg(
      sum(col("n")).as("big_n"), count(lit(1)).as("vocab_v"))
    val cost =
      when(col("n3").isNotNull, ilog(col("nctx2")) - ilog(col("n3")))
        .otherwise(when(col("n2").isNotNull,
          ilog(lit(5L) * col("nctx")) - ilog(lit(2L) * col("n2")))
          .otherwise(ilog(lit(25L) * (col("big_n") + col("vocab_v"))) -
            ilog(lit(4L) * (coalesce(col("un"), lit(0L)) + lit(1L)))))
    val scored = db
      .join(counts.trigrams.withColumnRenamed("n", "n3"), Seq("w1", "w2", "w3"), "left")
      .join(ctx2, Seq("w1", "w2"), "left")
      .join(counts.bigrams
        .select(col("w1").as("w2"), col("w2").as("w3"), col("n").as("n2")),
        Seq("w2", "w3"), "left")
      .join(ctx1.select(col("w1").as("w2"), col("nctx")), Seq("w2"), "left")
      .join(counts.unigrams.select(col("w").as("w3"), col("n").as("un")), Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_trigrams"),
        sum(col("cnt") * cost).as("nll_fp"))
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("nll_fp"), lit(0L)).as("nll_fp"),
        coalesce(expr("nll_fp div n_trigrams"), lit(0L)).as("avg_nll_fp"))
  }
}
