package graft.sorted

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funspec.AnyFunSpec

/**
 * ScalaCheck properties for the pure iterator engine, against plain Scala
 * collection oracles — the same strategy the reference uses for its engine
 * (`packageSpec.scala` with ScalaCheck `Checkers`). Inputs are arbitrary;
 * the key-run layout precondition is established by `runs`.
 */
class IteratorPropertiesSpec extends AnyFunSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val pairsGen: Gen[List[(Int, Int)]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 6), Gen.choose(-50, 50)))

  /** arrange arbitrary pairs into the group-sorted layout (key runs, keys
    * sorted, values sorted per key) */
  private def runs(xs: List[(Int, Int)]): List[(Int, Int)] =
    xs.groupBy(_._1).toList.sortBy(_._1).flatMap { case (_, vs) => vs.sortBy(_._2) }

  describe("iterator engine properties") {

    it("mapStream == in-memory groupBy + f (running sums, arbitrary input)") {
      check(Prop.forAll(pairsGen) { xs =>
        val input = runs(xs)
        val got = iterators.mapStream(input.iterator)(vs => vs.toList.scanLeft(0)(_ + _).tail).toList
        val expect = input.groupBy(_._1).toList.sortBy(_._1).flatMap { case (k, kvs) =>
          kvs.map(_._2).sorted.scanLeft(0)(_ + _).tail.map((k, _))
        }
        got == expect
      })
    }

    it("mapStream with partial consumption (take 1) == first per key") {
      check(Prop.forAll(pairsGen) { xs =>
        val input = runs(xs)
        val got = iterators.mapStream(input.iterator)(vs => Iterator.single(vs.next())).toList
        val expect = input.groupBy(_._1).toList.sortBy(_._1).map { case (k, kvs) =>
          (k, kvs.map(_._2).min)
        }
        got == expect
      })
    }

    it("mergeJoin innerProduct == Scala inner join (per-key cross product)") {
      check(Prop.forAll(pairsGen, pairsGen) { (ls, rs) =>
        val l = runs(ls)
        val r = runs(rs)
        val got = iterators.mergeJoin(l.iterator, r.iterator)(iterators.innerProduct).toList
        val lm = l.groupBy(_._1); val rm = r.groupBy(_._1)
        val expect = (lm.keySet ++ rm.keySet).toList.sorted.flatMap { k =>
          for {
            a <- lm.getOrElse(k, Nil).map(_._2).sorted
            b <- rm.getOrElse(k, Nil).map(_._2).sorted
          } yield (k, (a, b))
        }
        got == expect
      })
    }

    it("mergeJoin outerProduct covers every key from either side") {
      check(Prop.forAll(pairsGen, pairsGen) { (ls, rs) =>
        val l = runs(ls)
        val r = runs(rs)
        val got = iterators.mergeJoin(l.iterator, r.iterator)(iterators.outerProduct).toList
        val keys = got.map(_._1).toSet
        keys == (l.map(_._1).toSet ++ r.map(_._1).toSet) &&
          got.forall { case (_, (a, b)) => a.isDefined || b.isDefined }
      })
    }

    it("left/right-outer kernels == Scala left/right joins, both buffer directions") {
      check(Prop.forAll(pairsGen, pairsGen, Gen.oneOf(false, true)) { (ls, rs, bufferLeft) =>
        val l = runs(ls)
        val r = runs(rs)
        val lm = l.groupBy(_._1); val rm = r.groupBy(_._1)
        val gotL = iterators.mergeJoin(l.iterator, r.iterator)(
          iterators.leftOuterProduct[Int, Int](bufferLeft)).toList
        val expectL = lm.keySet.toList.sorted.flatMap { k =>
          val as = lm(k).map(_._2).sorted
          rm.get(k).map(_.map(_._2).sorted) match {
            case None => as.map(a => (k, (a, None)))
            case Some(bs) => for (a <- as; b <- bs) yield (k, (a, Some(b)))
          }
        }
        val gotR = iterators.mergeJoin(l.iterator, r.iterator)(
          iterators.rightOuterProduct[Int, Int](bufferLeft)).toList
        val expectR = rm.keySet.toList.sorted.flatMap { k =>
          val bs = rm(k).map(_._2).sorted
          lm.get(k).map(_.map(_._2).sorted) match {
            case None => bs.map(b => (k, (None, b)))
            case Some(as) => for (a <- as; b <- bs) yield (k, (Some(a), b))
          }
        }
        // multiset equality: the bufferLeft direction changes emission ORDER
        // within a key, never membership
        gotL.groupBy(identity).view.mapValues(_.size).toMap ==
          expectL.groupBy(identity).view.mapValues(_.size).toMap &&
        gotR.groupBy(identity).view.mapValues(_.size).toMap ==
          expectR.groupBy(identity).view.mapValues(_.size).toMap
      })
    }

    it("mergeUnion of two sorted lists == sorted concatenation") {
      check(Prop.forAll(Gen.listOf(Gen.choose(-100, 100)), Gen.listOf(Gen.choose(-100, 100))) { (ls, rs) =>
        val got = iterators.mergeUnion(ls.sorted.iterator, rs.sorted.iterator).toList
        got == (ls ++ rs).sorted
      })
    }
  }
}
