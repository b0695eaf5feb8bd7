package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** K-anonymity generalization ladder: release levels, cascade-on-remainder
  * semantics, suppression visibility, null grouping, guards. */
class PrivacySpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], levels: Seq[Seq[String]], k: Int)
      : Map[Long, (Long, Option[String], Option[String])] =
    Privacy.kAnonymize(rows.toDF("id", "a", "b"), "id", levels, k)
      .as[(Long, Long, Option[String], Option[String])].collect()
      .map { case (id, lvl, a, b) => id -> ((lvl, a, b)) }.toMap

  describe("Privacy.kAnonymize") {
    it("releases a >= k class at the finest level with all its quasi columns") {
      val got = run(Seq((1L, "de", "x"), (2L, "de", "x"), (3L, "fr", "y")),
        Seq(Seq("a", "b"), Seq("a")), k = 2)
      assert(got(1L) == ((0L, Some("de"), Some("x"))))
      assert(got(2L) == ((0L, Some("de"), Some("x"))))
    }

    it("generalizes a < k class to the coarser level, nulling the dropped column") {
      // (fr,y) and (fr,z) are singletons at level 0; together they are a
      // 2-class at level 1 (a = fr)
      val got = run(Seq((1L, "de", "x"), (2L, "de", "x"), (3L, "fr", "y"), (4L, "fr", "z")),
        Seq(Seq("a", "b"), Seq("a")), k = 2)
      assert(got(3L) == ((1L, Some("fr"), None)))
      assert(got(4L) == ((1L, Some("fr"), None)))
    }

    it("computes coarser-level class sizes over the REMAINDER, not the full input") {
      // a = de has 3 rows in total, but 2 release at level 0 — the one
      // remaining de row is a singleton at level 1 and must be SUPPRESSED,
      // not released on the strength of its already-released siblings
      val got = run(Seq((1L, "de", "x"), (2L, "de", "x"), (3L, "de", "y")),
        Seq(Seq("a", "b"), Seq("a")), k = 2)
      assert(got(3L) == ((-1L, None, None)))
    }

    it("keeps suppressed rows visible at level -1 with every quasi column null") {
      val got = run(Seq((1L, "de", "x"), (2L, "de", "x"), (3L, "zz", "q")),
        Seq(Seq("a", "b"), Seq("a")), k = 2)
      assert(got(3L) == ((-1L, None, None)))
      assert(got.size == 3)
    }

    it("groups NULL quasi values together (SQL window-partition semantics)") {
      val rows = Seq((1L, null.asInstanceOf[String], "x"), (2L, null.asInstanceOf[String], "x"))
      val got = run(rows, Seq(Seq("a", "b")), k = 2)
      assert(got(1L) == ((0L, None, Some("x"))))
      assert(got(2L) == ((0L, None, Some("x"))))
    }

    it("rejects k < 2 and empty ladders loudly") {
      val df = Seq((1L, "a", "b")).toDF("id", "a", "b")
      assertThrows[IllegalArgumentException](Privacy.kAnonymize(df, "id", Seq(Seq("a")), 1))
      assertThrows[IllegalArgumentException](Privacy.kAnonymize(df, "id", Seq.empty, 2))
      assertThrows[IllegalArgumentException](Privacy.kAnonymize(df, "id", Seq(Seq.empty), 2))
    }
  }

  describe("Privacy.kAnonymityAudit") {
    it("flags classes under k") {
      val audit = Privacy.kAnonymityAudit(
        Seq((1L, "de"), (2L, "de"), (3L, "fr")).toDF("id", "a"), Seq("a"), k = 2)
        .as[(String, Long, Boolean)].collect().toSet
      assert(audit == Set(("de", 2L, false), ("fr", 1L, true)))
    }
  }

  describe("Privacy.lDiversityAudit") {
    it("flags a large-but-homogeneous class (the attack k-anonymity misses)") {
      val rows = Seq(
        (1L, "de", "s1"), (2L, "de", "s1"), (3L, "de", "s1"), // k=3 but 1 value
        (4L, "fr", "s1"), (5L, "fr", "s2"))
        .toDF("id", "a", "s")
      val audit = Privacy.lDiversityAudit(rows, Seq("a"), "s", l = 2)
        .as[(String, Long, Long, Boolean)].collect().toSet
      assert(audit == Set(("de", 3L, 1L, true), ("fr", 2L, 2L, false)))
    }

    it("rejects l < 2 loudly") {
      assertThrows[IllegalArgumentException](Privacy.lDiversityAudit(
        Seq((1L, "a", "s")).toDF("id", "a", "s"), Seq("a"), "s", 1))
    }
  }

  describe("Privacy.tClosenessAudit") {
    // corpus: s1 x4, s2 x2 (p = 2/3, 1/3)
    // class A: s1 x3, s2 x1 -> TV = 1/12 ; class B: s1 x1, s2 x1 -> TV = 1/6
    val rows = Seq(
      (1L, "A", "s1"), (2L, "A", "s1"), (3L, "A", "s1"), (4L, "A", "s2"),
      (5L, "B", "s1"), (6L, "B", "s2")).toDF("id", "a", "s")

    it("cross-multiplies the TV threshold exactly: 1/12 <= 1/8 < 1/6") {
      val got = Privacy.tClosenessAudit(rows, Seq("a"), "s", tNum = 1, tDen = 8)
        .as[(String, Long, Boolean)].collect().toSet
      assert(got == Set(("A", 4L, false), ("B", 2L, true)))
    }

    it("boundary: a class exactly at t is safe (strict > flags)") {
      // t = 1/6 puts B exactly on the line -> safe
      val got = Privacy.tClosenessAudit(rows, Seq("a"), "s", tNum = 1, tDen = 6)
        .as[(String, Long, Boolean)].collect()
        .map { case (a, n, risk) => a -> ((n, risk)) }.toMap
      assert(got("B") == ((2L, false)))
    }

    it("charges absent-in-class sensitive values their full corpus mass") {
      // class C holds only s1; s2's corpus mass contributes |0 - n_s2 * N_c|
      val r2 = Seq((1L, "C", "s1"), (2L, "D", "s2")).toDF("id", "a", "s")
      // corpus p = (1/2, 1/2); each singleton class has TV = 1/2 > 1/3
      val got = Privacy.tClosenessAudit(r2, Seq("a"), "s", tNum = 1, tDen = 3)
        .as[(String, Long, Boolean)].collect().toSet
      assert(got == Set(("C", 1L, true), ("D", 1L, true)))
    }

    it("rejects a non-fraction t loudly") {
      assertThrows[IllegalArgumentException](
        Privacy.tClosenessAudit(rows, Seq("a"), "s", 2, 1))
      assertThrows[IllegalArgumentException](
        Privacy.tClosenessAudit(rows, Seq("a"), "s", 1, 0))
    }

    it("fails loudly on a high-cardinality sensitive column (broadcast contract)") {
      // a mis-pointed id column: the class x sensitive grid would be
      // corpus-squared — the require must fire with a diagnosis, not
      // silently build the grid
      val wide = (1L to 10L).map(i => (i, "A", s"id-$i")).toDF("id", "a", "s")
      val e = intercept[IllegalArgumentException](
        Privacy.tClosenessAudit(wide, Seq("a"), "s", 1, 8, maxSensitiveDomain = 4))
      assert(e.getMessage.contains("distinct values"))
      // the same domain under a sufficient bound audits fine
      assert(Privacy.tClosenessAudit(wide, Seq("a"), "s", 1, 8,
        maxSensitiveDomain = 16).count() == 1L)
    }

    it("treats a NULL sensitive value as an ordinary group (null-safe cell join)") {
      // both classes mirror the corpus distribution exactly (TV = 0) —
      // a null-unsafe join would zero the NULL cells and flag them
      val r3 = Seq(
        (1L, "A", null.asInstanceOf[String]), (2L, "A", "s1"),
        (3L, "B", null.asInstanceOf[String]), (4L, "B", "s1"))
        .toDF("id", "a", "s")
      val got = Privacy.tClosenessAudit(r3, Seq("a"), "s", tNum = 1, tDen = 100)
        .as[(String, Long, Boolean)].collect().toSet
      assert(got == Set(("A", 2L, false), ("B", 2L, false)))
    }
  }
}
