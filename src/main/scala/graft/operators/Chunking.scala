package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Context-window preparation: split documents into fixed-size word windows
 * with overlap — the step that turns a raw corpus into training-context rows.
 * A 1-to-N narrow transformation (typed `mapPartitions`, no shuffle at all):
 * each document emits its windows independently, so the operator scales with
 * the scan and never builds per-document state beyond one window.
 */
object Chunking {

  /**
   * Word windows of `chunkSize` tokens every `chunkSize - overlap` tokens:
   * window i covers words [i*stride, i*stride + chunkSize), the final window
   * is truncated at the document end, and a window whose NEW content would be
   * empty (everything it covers lies inside the previous window's overlap) is
   * not emitted — so a document shorter than `chunkSize` yields exactly one
   * window and no tail window duplicates content. Tokenization is Java
   * `trim` + `split("\\s+")` — identical to the dedup/minhash kernels, and
   * replicated exactly by the DuckDB oracle's edge-strip + `\s`-class regex.
   *
   * Returns (idCol, chunk_idx, n_tokens, chunk_text); documents with null or
   * token-free text yield no rows.
   */
  def chunkWords(df: DataFrame, idCol: String, textCol: String, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap for chunkSize $chunkSize")
    val stride = chunkSize - overlap
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val words = graft.functions.Text.segmentText(text)
            if (words.length == 0 || (words.length == 1 && words(0).isEmpty)) Iterator.empty
            // a window at start > 0 contributes new tokens iff the document
            // extends past the previous window's end (= start + overlap)
            else Iterator.iterate(0)(_ + stride)
              .takeWhile(s => s == 0 || s + overlap < words.length).map { start =>
              val end = math.min(start + chunkSize, words.length)
              (id, (start / stride).toLong, (end - start).toLong,
                words.slice(start, end).mkString(" "))
            }
          }
        }
      }
      .toDF(idCol, "chunk_idx", "n_tokens", "chunk_text")
  }

  /**
   * CONTENT-DEFINED chunking (the storage-dedup/FastCDC idea at token
   * granularity): a chunk boundary falls after every token whose content
   * hash is ≡ 0 mod `modulus` — a pure function of the TOKEN STRING, so
   * boundaries move WITH the content. Inserting a preamble into a
   * document shifts every [[chunkWords]] fixed window, destroying all
   * chunk-level matches; here only the chunks touching the edit change
   * and everything after the next boundary re-aligns — which is what
   * makes chunk-hash dedup robust to boilerplate injection and partial
   * edits. Expected chunk length is `modulus` tokens.
   *
   * Boundary hash = the md5-prefix integer of [[Sampling.hash32]] (salt
   * "cdc") — deterministic, partitioning-invariant, and replayed exactly
   * by the DuckDB oracle. Chunk identity = md5 of the space-joined token
   * run (order forced by position sort inside the aggregation — a bare
   * `collect_list` is assembly-order-dependent).
   *
   * SCALE SHAPE: one shuffle keyed by doc id; the per-doc running
   * boundary count is a doc-partitioned window (bounded input per key by
   * construction), and the chunk aggregation's (doc, chunk_idx) grouping
   * reuses the window's doc partitioning (hash partitioning on a subset
   * of the grouping keys satisfies the clustered distribution — no
   * second exchange). Returns (idCol, chunk_idx, n_tokens, chunk_hash).
   */
  def contentChunks(df: DataFrame, idCol: String, textCol: String, modulus: Int): DataFrame = {
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    val words = graft.functions.Text.edgeStrippedTokens(col(textCol))
    val toks = df.where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol), posexplode(words).as(Seq("pos", "term")))
    val flagged = toks.withColumn("b",
      when(pmod(Sampling.hash32(col("term"), "cdc"), lit(modulus.toLong)) === 0L, 1L)
        .otherwise(0L))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the boundary token CLOSES its chunk (cum - b keeps it inside)
    val withIdx = flagged.withColumn("chunk_idx", sum(col("b")).over(w) - col("b"))
    withIdx.groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          s => s.getField("term")), " ").cast("binary")).as("chunk_hash"))
  }

  /**
   * Cross-document duplicate-chunk profile over a [[contentChunks]] frame:
   * per document, how many of its chunks (and how much of its token mass)
   * also appear VERBATIM in at least one other document — the
   * chunk-granular duplication signal that catches partially-copied and
   * preamble-wrapped documents whole-content hashing misses and fixed
   * windows mis-align on. Chunk document frequency is chunk-mass-bounded
   * (never a pair expansion); returns
   * (idCol, n_chunks, n_dup_chunks, dup_tokens).
   */
  def chunkDupProfile(chunks: DataFrame, idCol: String): DataFrame = {
    val dfreq = chunks.groupBy(col("chunk_hash"))
      .agg(countDistinct(col(idCol)).as("__docs"))
    chunks.join(dfreq, Seq("chunk_hash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__docs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__docs") >= 2, col("n_tokens")).otherwise(0L)).as("dup_tokens"))
  }
}
