package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * DSIR-style importance scoring against an in-test reference that replays
 * the md5-prefix bucket hash and the exact cross-multiplied enrichment rule.
 */
class SelectionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val nBuckets = 64

  /** The operator's md5-prefix bucket, replayed byte-for-byte. */
  private def bucket(gram: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((gram + "dsir").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % nBuckets
  }

  private def refScores(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, text, t) =>
      val w = text.trim.split("\\s+").filter(_.nonEmpty)
      w.zip(w.drop(1)).map { case (a, b) => (id, t, bucket(s"$a $b")) }
    }
    val hist = grams.groupBy(_._3).view.mapValues { g =>
      (g.count(_._2).toLong, g.size.toLong)
    }.toMap
    val tT = hist.values.map(_._1).sum
    val tC = hist.values.map(_._2).sum
    val enriched = hist.collect { case (b, (ct, cc)) if ct * tC > cc * tT => b }.toSet
    grams.groupBy(_._1).view.mapValues { g =>
      val n = g.size.toLong
      val e = g.count(x => enriched(x._3)).toLong
      (n, e, e * 10000L / n)
    }.toMap.toMap
  }

  private val docs = Seq(
    (1L, "alpha beta gamma alpha beta", true),
    (2L, "alpha beta delta", true),
    (3L, "omega psi chi omega psi", false),
    (4L, "delta omega psi", false),
    (5L, "single", false), // < 2 tokens: no features, dropped
    (6L, null.asInstanceOf[String], true)) // null text: dropped

  test("importanceScore matches the md5-replay reference") {
    val df = docs.toDF("doc_id", "text", "is_en")
    val got = Selection.importanceScore(df, "doc_id", "text",
        org.apache.spark.sql.functions.col("is_en"), nBuckets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = refScores(docs.collect { case (id, t, tgt) if t != null => (id, t, tgt) })
      .filter(_._2._1 > 0)
    assert(got == want)
    assert(!got.contains(5L) && !got.contains(6L))
  }

  test("a uniform corpus (target == corpus) enriches nothing: all scores 0") {
    val df = docs.take(4).map { case (id, t, _) => (id, t, true) }.toDF("doc_id", "text", "is_en")
    val got = Selection.importanceScore(df, "doc_id", "text",
      org.apache.spark.sql.functions.col("is_en"), nBuckets)
    assert(got.collect().forall(_.getLong(3) == 0L))
  }

  test("scores are partitioning-invariant") {
    val df = docs.toDF("doc_id", "text", "is_en")
    val a = Selection.importanceScore(df, "doc_id", "text",
      org.apache.spark.sql.functions.col("is_en"), nBuckets).collect().toSet.map {
        (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) }
    val b = Selection.importanceScore(df.repartition(7), "doc_id", "text",
      org.apache.spark.sql.functions.col("is_en"), nBuckets).collect().toSet.map {
        (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) }
    assert(a == b)
  }
}
