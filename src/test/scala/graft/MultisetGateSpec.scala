package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funspec.AnyFunSpec

/** The one-pass multiset gate (SparkEntry.multisetEqual /
  * multisetDiffCount) must agree EXACTLY with the literal
  * exceptAll-both-ways form it replaced — same emptiness verdict, same
  * symmetric-difference cardinality — including duplicate rows, null
  * fields, and array columns, in both conf modes. */
class MultisetGateSpec extends AnyFunSpec with SparkSuite {

  private def literalDiffCount(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).unionByName(b.toDF(a.columns: _*).exceptAll(a)).count()

  private def checkAgainstLiteral(a: DataFrame, b: DataFrame): Unit = {
    val want = literalDiffCount(a, b)
    for (mode <- Seq("true", "false")) {
      spark.conf.set("spark.graft.gate.onepass", mode)
      try {
        assert(SparkEntry.multisetDiffCount(a, b) == want,
          s"diff count diverged from exceptAll form (onepass=$mode)")
        assert(SparkEntry.multisetEqual(a, b) == (want == 0L),
          s"equality verdict diverged (onepass=$mode)")
      } finally spark.conf.unset("spark.graft.gate.onepass")
    }
  }

  it("matches exceptAll on equal multisets with duplicates") {
    import spark.implicits._
    val a = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y"), (1L, "x"), (1L, "x")).toDF("k", "v")
    checkAgainstLiteral(a, b)
    assert(SparkEntry.multisetEqual(a, b))
  }

  it("counts asymmetric duplicates exactly (|a minus b| + |b minus a|)") {
    import spark.implicits._
    // a has 3x(1,x), b has 1x(1,x) and 2x(3,z): diff = 2 + 2 = 4
    val a = Seq((1L, "x"), (1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "y"), (3L, "z"), (3L, "z")).toDF("k", "v")
    checkAgainstLiteral(a, b)
    assert(SparkEntry.multisetDiffCount(a, b) == 4L)
  }

  it("treats null fields as equal, like exceptAll") {
    import spark.implicits._
    val a = Seq((Some(1L), Option.empty[String]), (None, Some("y")))
      .toDF("k", "v")
    val b = Seq((None, Some("y")), (Some(1L), Option.empty[String]))
      .toDF("k", "v")
    checkAgainstLiteral(a, b)
    assert(SparkEntry.multisetEqual(a, b))
    val c = Seq((Some(1L), Option.empty[String])).toDF("k", "v")
    checkAgainstLiteral(a, c)
    assert(!SparkEntry.multisetEqual(a, c))
  }

  it("compares array columns (the artifact gates' shape)") {
    import spark.implicits._
    val a = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long])).toDF("k", "ids")
    val b = Seq((2L, Seq.empty[Long]), (1L, Seq(1L, 2L, 3L))).toDF("k", "ids")
    checkAgainstLiteral(a, b)
    val c = Seq((1L, Seq(1L, 2L)), (2L, Seq.empty[Long])).toDF("k", "ids")
    checkAgainstLiteral(a, c)
    assert(!SparkEntry.multisetEqual(a, c))
  }

  it("matches positionally when column names differ, like exceptAll") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("x", "y")
    val b = Seq((1L, 2L)).toDF("p", "q")
    checkAgainstLiteral(a, b)
    assert(SparkEntry.multisetEqual(a, b))
  }
}
