package graft.sorted

import scala.util.Random

import org.scalatest.funspec.AnyFunSpec

/** Pure (Spark-free) tests of the per-key streaming iterator engine, mirroring
  * the behavioral contract of the reference's `packageSpec.scala`. Property
  * tests use a fixed-seed generator against Scala-collections oracles. */
class IteratorsSpec extends AnyFunSpec {

  private val rng = new Random(42)
  private def randomPairs(n: Int): List[(Int, Int)] =
    List.fill(rng.nextInt(n))((rng.nextInt(8), rng.nextInt(100)))
  /** arrange rows in key-runs (what a group-sorted partition looks like) */
  private def runs(xs: List[(Int, Int)]): List[(Int, Int)] =
    xs.groupBy(_._1).toList.sortBy(_._1).flatMap(_._2)

  describe("mapStream") {
    it("streams f over each key run") {
      val in = List(("a", 1), ("a", 3), ("b", 10), ("b", 1), ("c", 5))
      val out = iterators.mapStream(in.iterator)(vs => Iterator.single(vs.max)).toList
      assert(out === List(("a", 3), ("b", 10), ("c", 5)))
    }

    it("skips keys with empty output without starving later keys (issue #5)") {
      val in = List(("a", 1), ("b", 10), ("b", 1), ("c", 5))
      val out = iterators.mapStream(in.iterator)(vs => vs.filter(_ > 5)).toList
      assert(out === List(("b", 10)))
    }

    it("handles f that does not exhaust the value iterator") {
      val in = List(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("c", 6))
      val out = iterators.mapStream(in.iterator)(vs => Iterator.single(vs.next())).toList
      assert(out === List(("a", 1), ("b", 4), ("c", 6)))
    }

    it("handles empty input") {
      assert(iterators.mapStream(Iterator.empty[(String, Int)])(identity).toList === Nil)
    }

    it("supports 1-to-N output per key, lazily") {
      val in = List(("a", 1), ("a", 2), ("b", 3))
      val out = iterators.mapStream(in.iterator)(vs => vs.map(_ * 10)).toList
      assert(out === List(("a", 10), ("a", 20), ("b", 30)))
    }

    it("builds the context once per call and passes it to every key") {
      val in = List(("a", 1), ("b", 2), ("c", 3))
      var built = 0
      val out = iterators
        .mapStreamWithContext(in.iterator)(
          () => { built += 1; new scala.collection.mutable.ArrayBuffer[Int] },
          (buf: scala.collection.mutable.ArrayBuffer[Int], vs: Iterator[Int]) => {
            buf ++= vs; Iterator.single(buf.size)
          })
        .toList
      assert(built === 1)
      assert(out === List(("a", 1), ("b", 2), ("c", 3))) // buffer grows across keys
    }

    it("matches a Scala-collections oracle on random input (100 cases)") {
      for (_ <- 1 to 100) {
        val in = runs(randomPairs(40))
        val got = iterators.mapStream(in.iterator)(vs => Iterator.single(vs.sum)).toList
        val want = in.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        assert(got.toMap === want)
        assert(got.size === want.size)
      }
    }
  }

  describe("mergeJoin") {
    it("inner-joins sorted key runs") {
      val l = List(("a", 1), ("a", 2), ("c", 3))
      val r = List(("a", 10), ("b", 20), ("c", 30))
      val out = iterators.mergeJoin(l.iterator, r.iterator)(iterators.innerProduct).toList
      assert(out === List(("a", (1, 10)), ("a", (2, 10)), ("c", (3, 30))))
    }

    it("outer-joins with None for missing sides") {
      val l = List(("a", 1), ("c", 3))
      val r = List(("b", 20), ("c", 30), ("c", 31))
      val out = iterators.mergeJoin(l.iterator, r.iterator)(iterators.outerProduct).toList
      assert(out === List(
        ("a", (Some(1), None)),
        ("b", (None, Some(20))),
        ("c", (Some(3), Some(30))),
        ("c", (Some(3), Some(31)))))
    }

    it("left/right-outer kernels skip missing-side keys and match the filtered full outer") {
      val l = List(("a", 1), ("c", 3))
      val r = List(("b", 20), ("c", 30), ("c", 31))
      val lo = iterators.mergeJoin(l.iterator, r.iterator)(iterators.leftOuterProduct[Int, Int]()).toList
      assert(lo === List(("a", (1, None)), ("c", (3, Some(30))), ("c", (3, Some(31)))))
      val ro = iterators.mergeJoin(l.iterator, r.iterator)(iterators.rightOuterProduct[Int, Int]()).toList
      assert(ro === List(("b", (None, 20)), ("c", (Some(3), 30)), ("c", (Some(3), 31))))
      // bufferLeft flips the buffered side; the emitted MULTISET is identical
      val loB = iterators.mergeJoin(l.iterator, r.iterator)(iterators.leftOuterProduct[Int, Int](bufferLeft = true)).toList
      assert(loB.toSet === lo.toSet)
      val roB = iterators.mergeJoin(l.iterator, r.iterator)(iterators.rightOuterProduct[Int, Int](bufferLeft = true)).toList
      assert(roB.toSet === ro.toSet)
    }

    it("flipped buffers the other side but emits the same pairs") {
      val l = List(("a", 1), ("a", 2))
      val r = List(("a", 10), ("a", 11))
      val plain = iterators.mergeJoin(l.iterator, r.iterator)(iterators.innerProduct[Int, Int]).toList
      val flip = iterators.mergeJoin(l.iterator, r.iterator)(iterators.flipped(iterators.innerProduct[Int, Int])).toList
      assert(plain.toSet === flip.toSet)
    }

    it("throws AssertionError on mis-sorted input") {
      val bad = List((1, "a"), (3, "b"), (2, "c"))
      val ok = List((1, "x"))
      assertThrows[AssertionError] {
        iterators.mergeJoin(bad.iterator, ok.iterator)(iterators.outerProduct).toList
      }
    }

    it("matches a Scala-collections full-outer oracle on random input (100 cases)") {
      for (_ <- 1 to 100) {
        val l = randomPairs(25).sortBy(_._1)
        val r = randomPairs(25).sortBy(_._1)
        val got = iterators.mergeJoin(l.iterator, r.iterator)(iterators.outerProduct).toList
        val keys = (l.map(_._1) ++ r.map(_._1)).distinct
        val want = keys.flatMap { k =>
          val lv = l.collect { case (`k`, v) => v }
          val rv = r.collect { case (`k`, v) => v }
          if (lv.isEmpty) rv.map(v => (k, (None, Some(v))))
          else if (rv.isEmpty) lv.map(v => (k, (Some(v), None)))
          else for (a <- lv; b <- rv) yield (k, (Some(a), Some(b)))
        }
        assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
          want.groupBy(identity).view.mapValues(_.size).toMap)
      }
    }
  }

  describe("mergeUnion") {
    it("interleaves two sorted iterators stably") {
      val out = iterators.mergeUnion(List(1, 3, 5).iterator, List(2, 3, 4).iterator).toList
      assert(out === List(1, 2, 3, 3, 4, 5))
    }

    it("throws AssertionError on mis-sorted input") {
      assertThrows[AssertionError] {
        iterators.mergeUnion(List(1, 3, 2).iterator, List.empty[Int].iterator).toList
      }
    }

    it("matches sorted concatenation on random input (100 cases)") {
      for (_ <- 1 to 100) {
        val ls = List.fill(rng.nextInt(30))(rng.nextInt(50))
        val rs = List.fill(rng.nextInt(30))(rng.nextInt(50))
        val got = iterators.mergeUnion(ls.sorted.iterator, rs.sorted.iterator).toList
        assert(got === (ls ++ rs).sorted)
      }
    }
  }
}
