package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
            val words = text.trim.split("\\s+")
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
}
