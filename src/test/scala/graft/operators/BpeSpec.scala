package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * Golden-string pins for the merges-table BPE kernel: hand-replayed
 * applications of the public BPE apply rule (lowest-rank adjacent pair,
 * merge-all leftmost non-overlapping, iterate) on the fixture table —
 * the unit-level complement of q167's recursive-CTE oracle gate.
 */
class BpeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val ranks = Bpe.fixtureMerges.zipWithIndex.toMap

  private def enc(w: String): Seq[String] = Bpe.applyMerges(w, ranks)

  test("golden strings replay the merge table by hand") {
    // t+h first (rank 0), then th+e (rank 1): ther -> th,e,r -> the,r
    assert(enc("ther") == Vector("the", "r"))
    // hierarchical: a+n (3) then an+d (4)
    assert(enc("and") == Vector("and"))
    // i+n (2) then in+g (13)
    assert(enc("ing") == Vector("ing"))
    // multi-level inside a longer word: i,n,t,e,r,e,s,t,i,n,g
    //  -> in t e r e s t in g (i+n) -> in t er e s t in g (e+r)
    //  -> in t er e st in g (s+t)   -> in t er e st ing (in+g)
    assert(enc("interesting") == Vector("in", "t", "er", "e", "st", "ing"))
    // no applicable merges
    assert(enc("xyz") == Vector("x", "y", "z"))
    assert(enc("a") == Vector("a"))
    assert(enc("") == Vector())
  }

  test("merge-all is leftmost-first non-overlapping") {
    // t h t h t h: all three (t,h) pairs merge in ONE application
    assert(enc("ththth") == Vector("th", "th", "th"))
    // after th-merging, th+e applies to both halves
    assert(enc("thethe") == Vector("the", "the"))
    // overlapping run: e,e,s,t -> e,e,st ; (e,s) no longer adjacent
    assert(enc("eest") == Vector("e", "e", "st"))
  }

  test("rank order decides when pairs compete") {
    // "ath": (a,t) rank 10 vs (t,h) rank 0 -> t,h merges first, leaving
    // a+th (not a merge); greedy-by-rank != left-to-right
    assert(enc("ath") == Vector("a", "th"))
    // "est": (e,s) rank 11 vs (s,t) rank 8 -> st first
    assert(enc("est") == Vector("e", "st"))
  }

  test("tokenCounts memoizes by vocabulary and sums per document") {
    val docs = Seq(
      (1L, "the the and"),     // the=1 token x2, and=1 -> 3
      (2L, "interesting xyz"), // 6 + 3 -> 9
      (3L, "   "),             // no tokens: dropped
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", Bpe.fixtureMerges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 9L))
  }

  test("tokenCounts is partitioning-invariant") {
    val docs = (0L until 40L).map(i => (i, s"the quick$i and interesting word$i"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.tokenCounts(df, "doc_id", "text", Bpe.fixtureMerges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }
}
