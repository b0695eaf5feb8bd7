package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * REAL merges-table byte-pair encoding — token-budget accounting against
 * an actual BPE vocabulary, replacing the regex approximation
 * [[graft.functions.Text.bpeTokenCount]] kept for the q39 pre-tokenizer
 * profile. Algorithm is the public BPE apply rule (Sennrich et al. 2016;
 * the GPT-2 encoder's merge loop): repeatedly find the LOWEST-RANK merge
 * whose pair is adjacent in the word and merge ALL its occurrences
 * leftmost-first non-overlapping, until no merge applies.
 *
 * SCALE SHAPE — the insight that makes per-document BPE affordable at
 * 100 TB is VOCABULARY MEMOIZATION: token count is a pure function of
 * the word, so the imperative merge loop runs once per DISTINCT word
 * (vocab-bounded, Zipf-tiny relative to the corpus), not once per
 * occurrence. One corpus tokenization pass builds the (doc, word, n)
 * frame (persisted for its two consumers — the groupOverlap convention);
 * the distinct-word frame runs the typed kernel; the encoded vocab joins
 * back by word (AQE broadcasts it when small) and a per-doc integer sum
 * finishes. The merges table itself is a task-closure constant
 * (vocabulary-sized, kilobytes).
 *
 * The DuckDB oracle replays the SAME algorithm as a recursive CTE over
 * separator-delimited symbol strings (boundary-safe patterns
 * `\x1f a \x1f b \x1f`; the double replace completes leftmost
 * non-overlapping merge-all for runs like `t h t h t h` where adjacent
 * matches share a delimiter) — see the q167 oracle.
 */
object Bpe {

  /**
   * Deterministic fixture merge table (rank = position): common English
   * pairs plus hierarchical merges (th+e, an+d, in+g) so multi-level
   * application is exercised, not just single-char pairing. Duplicated
   * verbatim in the q167 oracle SQL — the two lists must stay identical.
   */
  val fixtureMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("s", "t"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "r"), ("in", "g"))

  /**
   * Apply the merge table to one word; returns the final symbol sequence.
   * Exposed for the spec's golden-string pins. `ranks` maps a pair to its
   * merge priority (lower merges first).
   */
  def applyMerges(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present right now
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of the best pair, leftmost-first
        // non-overlapping (the GPT-2 apply loop: after a merge, scanning
        // resumes AFTER the merged symbol)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.result()
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /**
   * Per-document REAL BPE token counts: `(idCol, n_bpe_tokens)`.
   * Tokenization is the corpus-wide
   * [[graft.functions.Text.edgeStrippedTokens]] rule; documents whose
   * text yields no tokens (null/whitespace-only) are dropped.
   */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)],
      unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty")
    require(merges.distinct.size == merges.size, "duplicate merge pairs are ambiguous")
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val words = docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(graft.functions.Text.edgeStrippedTokens(col(textCol))).as("__w"))
    // TWO consumers (the vocab kernel and the join-back side) — persist
    val wc = words.groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { wc.unpersist(); () })
    val enc = wc.select(col("__w")).distinct().as[String]
      .mapPartitions { it =>
        it.map(w => (w, applyMerges(w, ranks).length.toLong))
      }.toDF("__w", "__nt")
    wc.join(enc, "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__n") * col("__nt")).as("n_bpe_tokens"))
  }
}
