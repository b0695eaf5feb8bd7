package graft.rdd

import java.util.{Iterator => JIterator}

import scala.jdk.CollectionConverters._

import org.apache.spark.api.java.{JavaPairRDD, JavaSparkContext}
import org.apache.spark.api.java.function.{Function => JFunction, Function2 => JFunction2}
import org.scalatest.funspec.AnyFunSpec

import graft.SparkSuite
import graft.rdd.api.java.JavaGroupSortedRDD

/**
 * The RDD-surface Java facade exercised through the Java functional
 * interfaces a Java caller compiles against — mirroring the reference Java
 * API's behavioral contract on ITS primary surface
 * (`api/java/GroupSorted.scala:33-87`, `NaturalComparator.java:6-18`).
 */
class JavaRddApiSpec extends AnyFunSpec with SparkSuite {

  private lazy val jsc = JavaSparkContext.fromSparkContext(spark.sparkContext)

  private val rows = Seq(("a", 3), ("b", 10), ("a", 1), ("b", 1), ("c", 5))

  private def pairs(): JavaPairRDD[String, Int] =
    JavaPairRDD.fromRDD(jsc.sc.parallelize(rows, 3))

  describe("JavaGroupSortedRDD") {
    it("groupSort with a value comparator establishes the secondary-sorted layout") {
      val g = JavaGroupSortedRDD.groupSort(pairs(), 2,
        JavaGroupSortedRDD.naturalOrder[Int]())
      val perKey = g.underlying.collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(perKey == Map("a" -> Seq(1, 3), "b" -> Seq(1, 10), "c" -> Seq(5)))
      assert(g.underlying.partitioner.get.numPartitions == 2)
    }

    it("mapStreamByKey / foldLeftByKey / scanLeftByKey through Java SAMs") {
      val g = JavaGroupSortedRDD.groupSort(pairs(), 2, JavaGroupSortedRDD.naturalOrder[Int]())
      val top1: JFunction[JIterator[Int], JIterator[Int]] =
        (it: JIterator[Int]) => Iterator.single(it.next()).asJava
      assert(g.mapStreamByKey(top1).underlying.collect().toSeq.sorted ==
        Seq(("a", 1), ("b", 1), ("c", 5)))
      val plus: JFunction2[Int, Int, Int] = (a: Int, b: Int) => a + b
      assert(g.foldLeftByKey(0, plus).underlying.collect().toSeq.sorted ==
        Seq(("a", 4), ("b", 11), ("c", 5)))
      val scans = g.scanLeftByKey(0, plus).underlying.collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(scans("a") == Seq(0, 1, 4) && scans("c") == Seq(0, 5))
    }

    it("facade IS a JavaPairRDD, and projections/filter keep the facade type") {
      val g = JavaGroupSortedRDD.groupSort(pairs(), 2)
      val doubled: JFunction[Int, Int] = (v: Int) => v * 2
      val big: JFunction[(String, Int), java.lang.Boolean] =
        (kv: (String, Int)) => Boolean.box(kv._2 >= 2)
      val out = g.mapValues(doubled).filter(big)
      // inherited JavaPairRDD API still works on the result
      assert(out.countByKey().asScala.map { case (k, v) => (k, v.longValue) }.toMap ==
        Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
      assert(out.underlying.partitioner == g.underlying.partitioner)
    }

    it("mergeJoinInner and mergeUnion against a co-laid-out other side") {
      val g = JavaGroupSortedRDD.groupSort(pairs(), 2)
      val other = JavaGroupSortedRDD.groupSort(
        JavaPairRDD.fromRDD(jsc.sc.parallelize(Seq(("a", "x"), ("c", "y")), 2)), 2)
      val joined = g.mergeJoinInner(other)
      assert(joined.underlying.collect().toSeq.sortBy(_.toString) ==
        Seq(("a", (1, "x")), ("a", (3, "x")), ("c", (5, "y"))).sortBy(_.toString))
      // the shared natural-ordering singleton makes co-partitioned Java
      // layouts compare equal in aligned(): the join is NARROW — exactly
      // the two layout shuffles, no realignment of the right side
      val shuffleIds = "ShuffledRDD\\[(\\d+)\\]".r
        .findAllMatchIn(joined.underlying.toDebugString).map(_.group(1)).toSet
      assert(shuffleIds.size == 2,
        s"Java-facade join must be narrow:\n${joined.underlying.toDebugString}")
      val u = g.mergeUnion(JavaGroupSortedRDD.groupSort(pairs(), 2))
      assert(u.underlying.count() == rows.size * 2)
    }

    it("naturalOrder comparator throws NPE on null keys (reference parity)") {
      intercept[NullPointerException] {
        JavaGroupSortedRDD.naturalOrder[String]().compare(null, "x")
      }
    }
  }
}
