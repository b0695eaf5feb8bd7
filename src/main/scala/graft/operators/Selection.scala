package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hashed n-gram importance scoring for DATA SELECTION — the DSIR idea
 * (Xie et al. 2023, "Data Selection for Language Models via Importance
 * Resampling", public): score raw documents by how much their hashed
 * n-gram distribution looks like a TARGET distribution (a trusted
 * high-quality slice), then keep the high scorers. Hashing n-grams into a
 * fixed bucket space makes the feature table O(buckets) regardless of
 * corpus size — the trick that lets the "language model" fit in a
 * broadcast at 100 TB.
 *
 * Engine-exact discipline: DSIR's log-likelihood ratio is replaced by its
 * decision core — a bucket is TARGET-ENRICHED iff its target mass exceeds
 * its corpus mass, `c_t · total_corpus > c_c · total_target`, an exact
 * integer cross-multiplication (no logs, no floats) — and a document's
 * score is the basis-point fraction of its n-gram occurrences landing in
 * enriched buckets. Monotone in the same signal DSIR thresholds on,
 * reproducible bit-for-bit across engines and partitionings.
 */
object Selection {

  /**
   * Per-document importance score against a target slice. `isTarget` marks
   * the target rows (evaluated per document, e.g. `col("lang") === "en"`);
   * the corpus distribution is ALL rows. Tokenization is the corpus-wide
   * [[graft.functions.Text.edgeStrippedTokens]] rule; features are
   * adjacent token bigrams hashed into `nBuckets` buckets via the
   * engine-portable md5-prefix hash ([[Sampling.hash32]], salt "dsir").
   *
   * SCALE SHAPE: the bucket histogram is `nBuckets`-bounded however large
   * the corpus — ONE map-side-combined aggregation builds target and
   * corpus counts together (conditional sums, one pass), and the resulting
   * frame broadcasts back onto the per-document bigram stream (a bounded
   * build side by construction, so the broadcast is a contract, not a
   * bet). The per-document aggregation shuffles only (id, two small
   * counts). Documents with fewer than 2 tokens have no features and are
   * dropped.
   *
   * Returns `(idCol, n_ngrams, n_enriched, score_bp)` — `score_bp` =
   * enriched-occurrence fraction in basis points, integer-exact.
   */
  def importanceScore(docs: DataFrame, idCol: String, textCol: String,
                      isTarget: Column, nBuckets: Int = 4096,
                      unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20),
      s"nBuckets must be in [2, 2^20], got $nBuckets")
    val words = graft.functions.Text.edgeStrippedTokens(col(textCol))
    // TWO consumers read the hashed-bigram stream (the bucket histogram and
    // the per-doc scoring aggregate) — persist it once so the docblock's
    // one-pass framing is literally true, the groupOverlap convention
    // (Spark never reuses work across consumers without it)
    val grams = docs.where(col(textCol).isNotNull)
      .select(col(idCol), isTarget.as("__t"), words.as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col(idCol), col("__t"), explode(expr(
        "transform(slice(tk, 1, size(tk)-1), (w, i) -> concat(w, ' ', element_at(tk, i+2)))"))
        .as("__g"))
      .select(col(idCol), col("__t"),
        pmod(Sampling.hash32(col("__g"), "dsir"), lit(nBuckets.toLong)).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { grams.unpersist(); () })
    val hist = grams.groupBy(col("bucket")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("c_t"),
      count(lit(1)).as("c_c"))
    val tot = hist.agg(sum(col("c_t")).as("t_t"), sum(col("c_c")).as("t_c"))
    // the cross-multiplication is lifted to decimal(38,0): c_t*t_c is
    // bounded only by t_t*t_c, which exceeds 2^63 once the corpus carries
    // ~1e10 bigrams against a ~1e9-bigram target — exactly the 100 TB
    // posture this operator claims. decimal keeps the comparison EXACT
    // (the DuckDB oracle lifts to HUGEINT, same 38-digit headroom).
    val enriched = hist.crossJoin(broadcast(tot))
      .where(col("c_t").cast("decimal(38,0)") * col("t_c") >
        col("c_c").cast("decimal(38,0)") * col("t_t"))
      .select(col("bucket"))
    grams.join(broadcast(enriched).withColumn("__e", lit(1L)), Seq("bucket"), "left_outer")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_ngrams"),
        coalesce(sum(col("__e")), lit(0L)).as("n_enriched"))
      .withColumn("score_bp", expr("(n_enriched * 10000) div n_ngrams"))
  }
}
