package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * Unit pins for the trained hashed-feature Naive Bayes
 * ([[Classifier]]): the fixed-point integer log, learning on a
 * separable corpus, the prior fallback for token-free documents, and
 * the deterministic argmax tie-break — the unit-level complement of
 * q183's full-pipeline SQL replication and q184's planted gate.
 */
class ClassifierSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("ilog is exact at powers of two and monotone") {
    val xs = Seq(1L, 2L, 4L, 1024L, 1L << 30)
    val got = xs.toDF("x").select(Classifier.ilog(col("x")).as("l"))
      .orderBy(col("l")).as[Long].collect.toSeq
    assert(got == Seq(0L, 1024L, 2048L, 10240L, 30720L))
    val mono = (1L to 2000L).toDF("x")
      .select(Classifier.ilog(col("x")).as("l")).as[Long].collect.toSeq
    assert(mono == mono.sorted)
  }

  test("disjoint-vocab corpus classifies held-out docs perfectly") {
    val train = Seq(
      (0L, "cat", "whisker paw feline purr whisker tail"),
      (1L, "cat", "purr feline whisker claw paw"),
      (2L, "car", "engine piston gearbox clutch exhaust"),
      (3L, "car", "clutch engine turbo piston gearbox")).toDF("id", "label", "text")
    val test = Seq(
      (10L, "cat", "feline purr claw"),
      (11L, "car", "turbo exhaust clutch"),
      (12L, "cat", "whisker whisker paw")).toDF("id", "label", "text")
    val conf = Classifier.confusionMatrix(train, test, "label", "id", "text", 256)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(conf == Set(("cat", "cat", 2L), ("car", "car", 1L)))
  }

  test("token-free docs fall back to the max-prior label") {
    val train = Seq(
      (0L, "big", "alpha beta"), (1L, "big", "alpha gamma"), (2L, "big", "beta gamma"),
      (3L, "sml", "delta epsilon")).toDF("id", "label", "text")
    val model = Classifier.nbTrain(train, "label", "text", 64)
    val pred = Classifier.nbPredict(
      Seq((9L, ""), (10L, "   !!! 123 ")).toDF("id", "text"), "id", "text", model)
      .select("id", "predicted").as[(Long, String)].collect().toMap
    // prior(big) = ilog(3) > prior(sml) = ilog(1): both token-free docs -> big
    assert(pred == Map(9L -> "big", 10L -> "big"))
  }

  test("exact score ties break to the lexicographically smallest label") {
    // two labels with IDENTICAL doc counts and token statistics: every
    // score ties, so the row_number tie-break must decide — and it must
    // match the oracle's ORDER BY score DESC, label
    val train = Seq(
      (0L, "bbb", "same words here"), (1L, "aaa", "same words here"))
      .toDF("id", "label", "text")
    val model = Classifier.nbTrain(train, "label", "text", 64)
    val pred = Classifier.nbPredict(
      Seq((5L, "same words")).toDF("id", "text"), "id", "text", model)
      .select("predicted").as[String].collect().toSeq
    assert(pred == Seq("aaa"))
  }

  test("model frames are dense and label-bounded (broadcast material)") {
    val train = Seq((0L, "x", "a b c"), (1L, "y", "d e")).toDF("id", "label", "text")
    val model = Classifier.nbTrain(train, "label", "text", 128)
    assert(model.weights.count() == 2L * 128)
    assert(model.priors.count() == 2L)
    // unseen buckets carry the smoothing-only weight, never NULL
    assert(model.weights.where(col("w").isNull).count() == 0)
  }

  test("merged batch counts equal from-scratch counts on the union") {
    val rnd = new scala.util.Random(11)
    val labels = Seq("x", "y", "z")
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0L until 90L).map { i =>
      (i, labels(rnd.nextInt(3)),
        (0 until 1 + rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val a = docs.filter(_._1 % 3 != 2).toDF("id", "label", "text")
    val b = docs.filter(_._1 % 3 == 2).toDF("id", "label", "text")
    val all = docs.toDF("id", "label", "text")
    val merged = Classifier.mergeNbCounts(
      Classifier.nbCounts(a, "label", "text", 64),
      Classifier.nbCounts(b, "label", "text", 64))
    val scratch = Classifier.nbCounts(all, "label", "text", 64)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(merged.tokenCounts) == rows(scratch.tokenCounts))
    assert(rows(merged.labelTotals) == rows(scratch.labelTotals))
    assert(rows(merged.docCounts) == rows(scratch.docCounts))
  }

  test("states with different bucket counts refuse to merge") {
    val df = Seq((0L, "a", "word")).toDF("id", "label", "text")
    val e = intercept[IllegalArgumentException] {
      Classifier.mergeNbCounts(
        Classifier.nbCounts(df, "label", "text", 64),
        Classifier.nbCounts(df, "label", "text", 128))
    }
    assert(e.getMessage.contains("not mergeable"))
  }

  test("a token-free label gets smoothing weights, not a free bare prior") {
    // 'numeric' trains on digit-only docs: tokens() yields nothing, so it
    // exists in docCounts but NOT labelTotals. The dense grid must still
    // give it w = -ilog(B) per bucket — otherwise every token-bearing doc
    // would score it prior + 0 and predict 'numeric' over every real label.
    val train = Seq(
      (0L, "en", "the quick brown fox jumps over the lazy dog"),
      (1L, "en", "a plain english sentence with common words"),
      (2L, "numeric", "1234 5678 90 42"),
      (3L, "numeric", "777 888 999")).toDF("id", "label", "text")
    val model = Classifier.nbTrain(train, "label", "text", 64)
    // both labels are densified over all 64 buckets
    val perLabel = model.weights.groupBy("label").count()
      .as[(String, Long)].collect().toMap
    assert(perLabel == Map("en" -> 64L, "numeric" -> 64L))
    // a token-bearing English doc must NOT fall to the token-free label
    val pred = Classifier.nbPredict(
      Seq((9L, "plain english words")).toDF("id", "text"), "id", "text", model)
      .select("predicted").as[String].collect().toSeq
    assert(pred == Seq("en"))
    // a digit-only doc has no tokens: priors tie-break applies as before
    val noTok = Classifier.nbPredict(
      Seq((10L, "31337")).toDF("id", "text"), "id", "text", model)
      .select("predicted").as[String].collect().toSeq
    assert(noTok == Seq("en")) // equal priors, lexicographic tie-break
  }

  test("a label-exclusive token outweighs an unbalanced prior") {
    val train = Seq(
      (0L, "maj", "common text common text"), (1L, "maj", "common text filler"),
      (2L, "maj", "common filler text"), (3L, "maj", "filler common text"),
      (4L, "min", "zebra zebra zebra unique")).toDF("id", "label", "text")
    val model = Classifier.nbTrain(train, "label", "text", 256)
    val pred = Classifier.nbPredict(
      Seq((7L, "zebra zebra")).toDF("id", "text"), "id", "text", model)
      .select("predicted").as[String].collect().toSeq
    assert(pred == Seq("min"))
  }
}
