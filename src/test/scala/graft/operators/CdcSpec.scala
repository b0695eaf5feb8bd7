package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * Content-defined chunking against a local reference implementation —
 * the unit-level complement of the q190 cross-engine oracle gate. The
 * reference replays the SAME boundary rule (md5-prefix integer of
 * token+"cdc", mod m == 0) and chunk identity (md5 of the space-joined
 * run) in plain JVM code, so a drift in either side's hash or islanding
 * logic fails here before it fails the oracle.
 */
class CdcSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def isBoundary(term: String, m: Int): Boolean =
    java.lang.Long.parseLong(md5hex(term + "cdc").take(8), 16) % m == 0

  /** Local reference: token runs closed by boundary tokens (inclusive). */
  private def refChunks(text: String, m: Int): Seq[(Long, Long, String)] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.isEmpty) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
      var run = scala.collection.mutable.ArrayBuffer.empty[String]
      var idx = 0L
      toks.foreach { t =>
        run += t
        if (isBoundary(t, m)) {
          out += ((idx, run.size.toLong, md5hex(run.mkString(" "))))
          run = scala.collection.mutable.ArrayBuffer.empty[String]
          idx += 1
        }
      }
      if (run.nonEmpty) out += ((idx, run.size.toLong, md5hex(run.mkString(" "))))
      out.toSeq
    }
  }

  // enough distinct tokens that mod-4 boundaries certainly occur
  private val longText = (1 to 60).map(i => s"tok$i").mkString(" ")

  test("contentChunks equals the local reference chunking (boundaries, sizes, hashes)") {
    val docs = Seq((1L, longText), (2L, "solo"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Chunking.contentChunks(docs, "doc_id", "text", modulus = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val want =
      (refChunks(longText, 4).map { case (i, n, h) => (1L, i, n, h) } ++
        refChunks("solo", 4).map { case (i, n, h) => (2L, i, n, h) }).toSet
    assert(refChunks(longText, 4).size > 3, "fixture must actually chunk")
    assert(got == want)
  }

  test("boundaries are content-defined: a preamble shifts nothing after the first boundary") {
    val wrapped = "inserted preamble drift " + longText
    val orig = refChunks(longText, 4).map(_._3)
    val wrap = refChunks(wrapped, 4).map(_._3)
    // every original chunk after the first boundary survives verbatim
    assert(orig.tail.forall(wrap.contains), "post-boundary chunks must re-align")
    val docs = Seq((1L, longText), (2L, wrapped)).toDF("doc_id", "text")
    val prof = Chunking.chunkDupProfile(
        Chunking.contentChunks(docs, "doc_id", "text", modulus = 4), "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: all chunks except (possibly) the first are shared with doc 2
    assert(prof(1L)._1 == orig.size.toLong)
    assert(prof(1L)._2 >= orig.size.toLong - 1)
  }

  test("a mid-document edit perturbs only the chunks touching it") {
    val toks = (1 to 60).map(i => s"tok$i")
    val edited = (toks.take(30) ++ Seq("EDIT") ++ toks.drop(30)).mkString(" ")
    val orig = refChunks(longText, 4).map(_._3).toSet
    val edit = refChunks(edited, 4).map(_._3).toSet
    // at most the single chunk containing the edit differs on each side
    assert((orig -- edit).size <= 1 && (edit -- orig).size <= 1)
    assert((orig & edit).size >= orig.size - 1)
  }

  test("chunkDupProfile counts cross-document repeats only (within-doc repeats excluded)") {
    // pick tokens that are NOT boundaries at mod 4 so runs form as intended
    val nonB = (1 to 200).map(i => s"w$i").filter(w => !isBoundary(w, 4))
    val Seq(t, t2) = nonB.take(2)
    val b = (1 to 200).map(i => s"w$i").find(w => isBoundary(w, 4)).get
    // doc 1 contains the same chunk twice (run closed by boundary b, twice);
    // no other doc shares it -> not a dup. docs 2/3 share a chunk -> dup.
    val docs = Seq(
      (1L, s"$t $b $t $b"),
      (2L, s"$t2 $b"),
      (3L, s"$t2 $b")).toDF("doc_id", "text")
    val prof = Chunking.chunkDupProfile(
        Chunking.contentChunks(docs, "doc_id", "text", modulus = 4), "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(prof(1L) == ((2L, 0L, 0L)), s"within-doc repeat must not count: ${prof(1L)}")
    assert(prof(2L) == ((1L, 1L, 2L)) && prof(3L) == ((1L, 1L, 2L)))
  }

  test("modulus guard") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunking.contentChunks(docs, "doc_id", "text", modulus = 1))
  }
}
