package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Fixed-point stupid-backoff bigram LM: hand-replayed costs, backoff and
  * OOV paths, merge ≡ scratch additivity, and the garbage-ranks-worse
  * property the q197 gate relies on. */
class LmSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  private def ilog(x: Long): Long =
    math.floor(1024.0 * (math.log(x.toDouble) / math.log(2.0))).toLong

  // train corpus: "a b" x3 and "a c" x1  =>
  //   unigrams: a->4, b->3, c->1  (N=8, V=3)
  //   bigrams:  (a,b)->3, (a,c)->1 ; nctx(a)=4
  private val train = Seq(
    (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c")).toDF("doc_id", "text")

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Lm.perplexityScore(train, docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nb, nll, avg) => id -> ((nb, nll, avg)) }.toMap

  describe("Lm.scoreDocs") {
    it("charges a seen bigram ilog(nctx) - ilog(n12), exactly") {
      // doc "a b": one bigram (a,b), cost = ilog(4) - ilog(3)
      val want = ilog(4) - ilog(3)
      assert(score(Seq((10L, "a b")))(10L) == ((1L, want, want)))
    }

    it("a more probable bigram costs less than a rarer one") {
      val ab = score(Seq((10L, "a b")))(10L)._2
      val ac = score(Seq((11L, "a c")))(11L)._2
      assert(ab < ac) // P(b|a)=3/4 beats P(c|a)=1/4
    }

    it("backs off an unseen bigram of seen words to 2*(n(w2)+1) / 5*(N+V)") {
      // "b a": bigram (b,a) unseen; w2=a has n=4 -> cost = ilog(5*11) - ilog(2*5)
      val want = ilog(55) - ilog(10)
      assert(score(Seq((12L, "b a")))(12L) == ((1L, want, want)))
    }

    it("prices an OOV continuation via add-one: n(w2)=0 -> ilog(2)") {
      // "a zz": (a,zz) unseen, zz OOV -> cost = ilog(55) - ilog(2*1)
      val want = ilog(55) - ilog(2)
      assert(score(Seq((13L, "a zz")))(13L) == ((1L, want, want)))
    }

    it("sums repeated bigrams by multiplicity and integer-divides the average") {
      // "a b a b": bigrams (a,b)x2, (b,a)x1
      val seen = ilog(4) - ilog(3)
      val back = ilog(55) - ilog(10)
      val nll = 2 * seen + back
      assert(score(Seq((14L, "a b a b")))(14L) == ((3L, nll, nll / 3)))
    }

    it("keeps sub-2-token docs at (0, 0, 0) instead of dropping them") {
      val got = score(Seq((15L, "solo"), (16L, "a b")))
      assert(got(15L) == ((0L, 0L, 0L)))
      assert(got(16L)._1 == 1L)
    }

    it("backoff always costs more than any seen bigram from the same context mass") {
      // guards the discount direction: unseen (b,a) must out-cost seen (a,c)
      val rare = score(Seq((17L, "a c")))(17L)._2
      val unseen = score(Seq((18L, "b a")))(18L)._2
      assert(unseen > rare)
    }
  }

  describe("Lm.mergeLmCounts") {
    it("merged counts equal from-scratch counts on the union (exact frames)") {
      val a = Lm.lmCounts(train.where(col("doc_id") <= 2), "text")
      val b = Lm.lmCounts(train.where(col("doc_id") > 2), "text")
      val merged = Lm.mergeLmCounts(a, b)
      val scratch = Lm.lmCounts(train, "text")
      def diff(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
        x.exceptAll(y).unionByName(y.exceptAll(x)).count()
      assert(diff(merged.unigrams, scratch.unigrams) == 0)
      assert(diff(merged.bigrams, scratch.bigrams) == 0)
    }

    it("scoring off the merged state matches scoring off scratch") {
      val merged = Lm.mergeLmCounts(
        Lm.lmCounts(train.where(col("doc_id") <= 2), "text"),
        Lm.lmCounts(train.where(col("doc_id") > 2), "text"))
      val probe = Seq((20L, "a b a c"), (21L, "b a zz")).toDF("doc_id", "text")
      val m = Lm.scoreDocs(probe, "doc_id", "text", merged)
        .as[(Long, Long, Long, Long)].collect().toSet
      val s = Lm.scoreDocs(probe, "doc_id", "text", Lm.lmCounts(train, "text"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(m == s)
    }
  }

  // trigram train corpus:
  //   unigrams: a->3, b->3, c->2, d->1           (N=9, V=4)
  //   bigrams:  (a,b)->3, (b,c)->2, (b,d)->1     nctx(a)=3, nctx(b)=3
  //   trigrams: (a,b,c)->2, (a,b,d)->1           nctx2(a,b)=3
  private val train3 = Seq(
    (1L, "a b c"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")

  private def score3(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Lm.scoreDocs3(docs.toDF("doc_id", "text"), "doc_id", "text",
      Lm.lmCounts3(train3, "text"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nt, nll, avg) => id -> ((nt, nll, avg)) }.toMap

  describe("Lm.scoreDocs3 (trigram backoff chain)") {
    it("charges a seen trigram ilog(nctx2) - ilog(n123)") {
      val want = ilog(3) - ilog(2)
      assert(score3(Seq((10L, "a b c")))(10L) == ((1L, want, want)))
    }

    it("backs off an unseen trigram to the seen bigram at one 2/5 discount") {
      // (x,b,c) unseen; (b,c) seen n=2, nctx(b)=3 -> ilog(15) - ilog(4)
      val want = ilog(15) - ilog(4)
      assert(score3(Seq((11L, "x b c")))(11L) == ((1L, want, want)))
    }

    it("pays BOTH discounts when bigram is unseen too (OOV continuation)") {
      // (a,b,e): (b,e) unseen, e OOV -> ilog(25*(9+4)) - ilog(4*1)
      val want = ilog(325) - ilog(4)
      assert(score3(Seq((12L, "a b e")))(12L) == ((1L, want, want)))
    }

    it("orders the chain: seen < bigram backoff < unigram backoff") {
      val seen = score3(Seq((13L, "a b c")))(13L)._2
      val bi = score3(Seq((14L, "x b c")))(14L)._2
      val uni = score3(Seq((15L, "a b e")))(15L)._2
      assert(seen < bi && bi < uni)
    }

    it("keeps sub-3-token docs at (0, 0, 0)") {
      assert(score3(Seq((16L, "a b")))(16L) == ((0L, 0L, 0L)))
    }
  }

  describe("Lm.mergeLmCounts3") {
    it("merged trigram state equals from-scratch on the union") {
      val m = Lm.mergeLmCounts3(
        Lm.lmCounts3(train3.where(col("doc_id") <= 1), "text"),
        Lm.lmCounts3(train3.where(col("doc_id") > 1), "text"))
      val s3 = Lm.lmCounts3(train3, "text")
      def diff(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
        x.exceptAll(y).unionByName(y.exceptAll(x)).count()
      assert(diff(m.trigrams, s3.trigrams) == 0)
      assert(diff(m.bigrams, s3.bigrams) == 0)
      assert(diff(m.unigrams, s3.unigrams) == 0)
    }
  }

  describe("garbage ranking (the q197 gate property)") {
    it("token-reversed natural text scores a higher total NLL than the original") {
      val nat = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox runs over the lazy cat"),
        (3L, "a quick brown dog jumps over the lazy fox"),
        (4L, "the lazy dog sleeps under the brown tree"))
        .toDF("doc_id", "text")
      val rev = nat.select(col("doc_id"),
        concat_ws(" ", reverse(graft.functions.Text.edgeStrippedTokens(col("text")))).as("text"))
      val counts = Lm.lmCounts(nat, "text")
      def total(df: org.apache.spark.sql.DataFrame): Long =
        Lm.scoreDocs(df, "doc_id", "text", counts)
          .agg(sum(col("nll_fp"))).as[Long].head()
      assert(total(rev) > total(nat))
    }
  }
}
