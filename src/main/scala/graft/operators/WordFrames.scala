package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * The shared word-frame idioms both tokenizer trainers ([[Bpe]],
 * [[Unigram]]) are built on — one definition so the guarded-collect and
 * memoized-encode disciplines cannot drift between them.
 */
private[graft] object WordFrames {

  /** The distributed distinct-word frequency frame (corpus scanned once,
    * map-side combined). */
  def wordCounts(docs: DataFrame, textCol: String): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col(textCol).isNotNull)
      .select(explode(graft.functions.Text.edgeStrippedTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
  }

  /**
   * The guarded collect of [[wordCounts]]: `minCount` floors rare words
   * (the standard trainer vocabulary floor), `limit(maxVocab + 1)`
   * bounds the driver transfer BEFORE collecting (the `Similarity.topK`
   * convention), and the require fails fast with the floor to raise
   * rather than OOMing the driver.
   */
  def collectWordCounts(docs: DataFrame, textCol: String,
      minCount: Long, maxVocab: Int): Array[(String, Long)] = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val vocab = wordCounts(docs, textCol)
      .filter(_._2 >= minCount)
      .limit(maxVocab + 1)
      .collect()
    require(vocab.length <= maxVocab,
      s"distinct-word vocabulary exceeds maxVocab=$maxVocab after the minCount=$minCount " +
        "floor — raise minCount (the standard trainer response) or maxVocab")
    vocab
  }

  /**
   * The vocab-memoized per-document token-count pipeline: token count is
   * a pure function of the word, so `kernel` runs once per DISTINCT word
   * (Zipf-tiny relative to the corpus), the encoded vocab joins back by
   * word (AQE broadcasts it when small), and a per-doc integer sum
   * finishes. The `(doc, word, n)` frame has TWO consumers (the kernel's
   * distinct and the join-back side) — persisted, released via
   * `unpersistHook` (the Bpe.tokenCounts convention).
   */
  def memoizedTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      outCol: String, unpersistHook: (() => Unit) => Unit)(
      kernel: String => Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(graft.functions.Text.edgeStrippedTokens(col(textCol))).as("__w"))
    val wc = words.groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { wc.unpersist(); () })
    val enc = wc.select(col("__w")).distinct().as[String]
      .mapPartitions { it => it.map(w => (w, kernel(w))) }
      .toDF("__w", "__nt")
    wc.join(enc, "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__n") * col("__nt")).as(outCol))
  }
}
