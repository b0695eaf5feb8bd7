package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * BM25 / RRF against an in-test reference implementation on a tiny corpus —
 * the unit-level complement of the q133/q134 cross-engine oracle gate.
 */
class RetrievalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark fast"),
    (2L, "spark merge"),
    (3L, "other words here"),
    (4L, null.asInstanceOf[String])).toDF("doc_id", "text")

  private val terms = Seq("spark", "merge")

  // local double-precision BM25 with the operator's exact formula shape
  private def expectedBm25: Map[Long, Long] = {
    val toks = Map(1L -> Seq("spark", "spark", "fast"), 2L -> Seq("spark", "merge"),
      3L -> Seq("other", "words", "here"))
    val nDocs = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
    val dfm = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    toks.flatMap { case (id, ts) =>
      val contribs = terms.flatMap { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = (nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5)
          val tfn = (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (ts.size / avgdl)))
          Some(math.round(idf * tfn * 1.0e9))
        }
      }
      if (contribs.isEmpty) None else Some(id -> contribs.sum)
    }
  }

  test("bm25 matches the reference formula; null-text and no-hit docs are absent") {
    val got = Retrieval.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expectedBm25)
    assert(!got.contains(3L) && !got.contains(4L))
  }

  test("bm25 is invariant to input partitioning (integer contributions sum order-free)") {
    val sliced = docs.repartition(7)
    val a = Retrieval.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Retrieval.bm25(sliced, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("bm25ForQueries: single-query parity with bm25, duplicate rows ignored") {
    // query 7 carries exactly the fixed bag `terms` (one term duplicated):
    // its scores must equal bm25(docs, terms) row for row
    val queries = Seq((7L, "spark"), (7L, "merge"), (7L, "spark")).toDF("query_id", "term")
    val got = Retrieval.bm25ForQueries(docs, "doc_id", "text", queries, "query_id", "term")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expectedBm25.map { case (id, s) => (7L, id) -> s })
  }

  test("bm25ForQueries scores multiple queries independently in one frame") {
    val queries = Seq((1L, "spark"), (2L, "merge"), (3L, "spark"), (3L, "merge"))
      .toDF("query_id", "term")
    val got = Retrieval.bm25ForQueries(docs, "doc_id", "text", queries, "query_id", "term")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def single(ts: Seq[String]): Map[Long, Long] =
      Retrieval.bm25(docs, "doc_id", "text", ts).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q1 = single(Seq("spark")); val q2 = single(Seq("merge")); val q3 = single(Seq("spark", "merge"))
    val want = q1.map { case (id, s) => (1L, id) -> s } ++
      q2.map { case (id, s) => (2L, id) -> s } ++
      q3.map { case (id, s) => (3L, id) -> s }
    assert(got == want)
  }

  test("bm25FromPostings over buildPostings equals bm25ForQueries (the standing-index split)") {
    val queries = Seq((1L, "spark"), (2L, "merge"), (3L, "spark"), (3L, "merge"))
      .toDF("query_id", "term")
    val postings = Retrieval.buildPostings(docs, "doc_id", "text")
    val split = Retrieval.bm25FromPostings(postings, "doc_id", queries, "query_id", "term")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = Retrieval.bm25ForQueries(docs, "doc_id", "text", queries, "query_id", "term")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(split == oneShot)
  }

  test("mergePostings: re-ingested docs upsert, new docs append, merged == from-scratch") {
    val standing = Retrieval.buildPostings(docs, "doc_id", "text")
    // doc 2 re-ingested with NEW text (old rows must vanish), doc 9 fresh
    val batch = Seq((2L, "merge merge new"), (9L, "fresh doc"))
      .toDF("doc_id", "text")
    val merged = Retrieval.mergePostings(standing, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val splicedDocs = Seq(
      (1L, "spark spark fast"),
      (2L, "merge merge new"),
      (3L, "other words here"),
      (9L, "fresh doc")).toDF("doc_id", "text")
    val scratch = Retrieval.buildPostings(splicedDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == scratch)
    // the stale doc-2 posting ("spark" tf... none here, but the OLD tf=1
    // "merge" row) must not survive alongside the new tf=2 row
    assert(merged.count(t => t._1 == 2L && t._2 == "merge") == 1)
    assert(merged.contains((2L, "merge", 2L)))
  }

  test("rrfFuse sums round(1e9/(k0+rank)) per id and counts contributing lists") {
    val l1 = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val l2 = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
    def c(rank: Long): Long = math.round(1.0e9 / (60.0 + rank))
    val got = Retrieval.rrfFuse(Seq(l1, l2), "id", "rank")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      10L -> (c(1), 1L),
      20L -> ((c(2) + c(1)), 2L),
      30L -> (c(2), 1L)))
  }

  private val phraseDocs = Seq(
    (1L, "a b c a b c"),     // "a b c" twice
    (2L, "a a a a"),         // "a a" three times (overlaps count)
    (3L, "c b a"),           // reversed: no "a b"
    (4L, "a"),               // too short for any 2-term phrase
    (5L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("phraseMatches counts overlapping occurrences; order matters; misses are absent") {
    val got = Retrieval.phraseMatches(phraseDocs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
    val overlaps = Retrieval.phraseMatches(phraseDocs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(overlaps == Map(2L -> 3L))
  }

  test("phraseMatches resolves 3-term phrases and never pairs across documents") {
    val got = Retrieval.phraseMatches(phraseDocs, "doc_id", "text", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
    // "b c" then "a" continues only inside doc 1; doc 3 has b then a at the
    // positions a cross-doc bug would pair up
    val none = Retrieval.phraseMatches(phraseDocs, "doc_id", "text", Seq("b", "c", "b"))
      .collect()
    assert(none.isEmpty)
  }

  private def allPairs(corpus: Seq[(Long, String)], maxDf: Long,
      thrNum: Long, thrDen: Long): (Map[(Long, Long), (Long, Long, Long)], Long) = {
    val postings = Retrieval.buildPostings(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val res = Retrieval.allPairsCosine(postings, "doc_id", maxDf, thrNum, thrDen)
    val pairs = res.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    (pairs, res.droppedTerms.head().getLong(0))
  }

  test("allPairsCosine golden: hand-computed dot/norms, threshold boundary inclusive") {
    // doc1 = (a:2, b:1), doc2 = (a:1, b:1), doc3 = (c:1)
    // dot(1,2) = 3, n1 = 5, n2 = 2 -> cos^2 = 9/10 >= 1/4: kept
    val (got, dropped) = allPairs(
      Seq((1L, "a a b"), (2L, "a b"), (3L, "c")), maxDf = 100, thrNum = 1, thrDen = 2)
    assert(got == Map((1L, 2L) -> ((3L, 5L, 2L))))
    assert(dropped == 0L)
    // exact-boundary inclusion: cos == thr passes the >= gate.
    // doc4=(x:1), doc5=(x:1, y:1, z:1, w:1): dot=1, n4=1, n5=4 -> cos=1/2
    val (boundary, _) = allPairs(
      Seq((4L, "x"), (5L, "x y z w")), maxDf = 100, thrNum = 1, thrDen = 2)
    assert(boundary == Map((4L, 5L) -> ((1L, 1L, 4L))))
    // and the same pair at thr just above 1/2 is excluded
    val (above, _) = allPairs(
      Seq((4L, "x"), (5L, "x y z w")), maxDf = 100, thrNum = 51, thrDen = 100)
    assert(above.isEmpty)
  }

  test("allPairsCosine: identical docs score exactly cosine 1 (dot == na2 == nb2)") {
    val (got, _) = allPairs(
      Seq((1L, "p q r r"), (2L, "p q r r"), (3L, "unrelated tokens")),
      maxDf = 100, thrNum = 1, thrDen = 1)
    assert(got == Map((1L, 2L) -> ((6L, 6L, 6L))))
  }

  test("allPairsCosine df cap: stop-terms leave vectors AND are counted, never silent") {
    // 'the' occurs in all 3 docs; with maxDf=2 it is a stop-term: docs 1/2
    // still pair on 'alpha' (cos over capped space = 1), doc 3 has no
    // capped terms left and cannot pair
    val (got, dropped) = allPairs(
      Seq((1L, "the alpha"), (2L, "the alpha"), (3L, "the")),
      maxDf = 2, thrNum = 1, thrDen = 2)
    assert(got == Map((1L, 2L) -> ((1L, 1L, 1L))))
    assert(dropped == 1L)
  }

  test("allPairsCosine guards: threshold rational and maxDf validated") {
    val postings = Retrieval.buildPostings(
      Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text")
    intercept[IllegalArgumentException](
      Retrieval.allPairsCosine(postings, "doc_id", maxDf = 1, thrNum = 1, thrDen = 2))
    intercept[IllegalArgumentException](
      Retrieval.allPairsCosine(postings, "doc_id", maxDf = 10, thrNum = 3, thrDen = 2))
    intercept[IllegalArgumentException](
      Retrieval.allPairsCosine(postings, "doc_id", maxDf = 10, thrNum = 1, thrDen = 101))
  }
}
