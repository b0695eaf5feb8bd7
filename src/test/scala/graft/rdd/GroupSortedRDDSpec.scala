package graft.rdd

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.HashPartitioner
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.rdd.syntax._

/**
 * RDD-surface parity spec — mirrors the semantics the reference library pins
 * on its own `GroupSorted` (tresata/spark-sorted `GroupSortedSpec` test
 * disciplines): layout invariant under the partitioner, secondary value sort,
 * order-sensitive folds with mutable zeros, non-exhausting per-key functions,
 * empty-output key skipping (issue #5), one-shuffle combiner, merge-join
 * variants vs RDD join oracles, and co-partitioned narrow joins.
 */
class GroupSortedRDDSpec extends AnyFunSuite with SparkSuite {

  private def sc = spark.sparkContext

  private val data = Seq(
    ("b", 3), ("a", 1), ("c", 7), ("a", 5), ("b", 1), ("a", 3), ("c", 2), ("b", 2))

  /** Layout invariant: every key confined to the partition its partitioner
    * assigns, rows of a key consecutive, keys in keyOrdering order, values in
    * valueOrdering order when present. */
  private def assertLayout[K, V](gs: GroupSortedRDD[K, V]): Unit = {
    val parts = gs.mapPartitionsWithIndex((i, it) => Iterator.single((i, it.toList)), preservesPartitioning = true)
      .collect().toMap
    val p = gs.partitioner.get
    parts.foreach { case (i, rows) =>
      rows.foreach { case (k, _) => assert(p.getPartition(k) == i, s"key $k in partition $i") }
      val keys = rows.map(_._1)
      val runs = keys.foldLeft(List.empty[K])((acc, k) => if (acc.headOption.contains(k)) acc else k :: acc).reverse
      assert(runs.distinct == runs, s"key runs not consecutive: $keys")
      assert(runs == runs.sorted(gs.keyOrdering), s"keys not sorted: $runs")
      gs.valueOrdering.foreach { vo =>
        rows.groupBy(_._1).values.foreach { g =>
          val vs = g.map(_._2)
          assert(vs == vs.sorted(vo), s"values not sorted within key: $vs")
        }
      }
    }
  }

  test("groupSort establishes the layout (keys per partitioner, consecutive, sorted)") {
    val gs = sc.parallelize(data, 3).groupSort(2)
    assertLayout(gs)
    assert(gs.collect().toSeq.sorted == data.sorted)
  }

  test("secondary sort orders values within keys and placement stays a function of the key") {
    val gs = sc.parallelize(data, 3).groupSort(2, Ordering.Int.reverse)
    assertLayout(gs)
    assert(gs.partitioner.get.numPartitions == 2)
    val perKey = gs.collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(perKey("a") == Seq(5, 3, 1) && perKey("b") == Seq(3, 2, 1) && perKey("c") == Seq(7, 2))
  }

  test("mapStreamByKey streams runs; non-exhausting functions and empty outputs are safe") {
    val gs = sc.parallelize(data, 3).groupSort(2, Ordering.Int)
    // take(1) leaves the run unexhausted; key "b" emits nothing (issue #5)
    val out = gs.mapStreamByKey(vs => if (vs.next() % 2 == 1) vs.take(1) else Iterator.empty)
      .collect().toSeq.sorted
    // a: [1,3,5] -> head 1 odd -> emit 3 ; b: [1,2,3] -> 1 odd -> emit 2 ; c: [2,7] -> 2 even -> none
    assert(out == Seq(("a", 3), ("b", 2)))
  }

  test("mapStreamByKey per-partition context is built once per partition") {
    val gs = sc.parallelize(data, 3).groupSort(2, Ordering.Int)
    val out = gs.mapStreamByKey(() => new ArrayBuffer[Int]) { (buf, vs) =>
        buf.clear(); vs.foreach(buf += _); Iterator.single(buf.sum)
      }.collect().toSeq.sorted
    assert(out == Seq(("a", 9), ("b", 6), ("c", 9)))
  }

  test("foldLeftByKey is order-sensitive and serializer-clones mutable zeros per key") {
    val gs = sc.parallelize(data, 3).groupSort(2, Ordering.Int)
    val folded = gs.foldLeftByKey(new ArrayBuffer[Int])((acc, v) => { acc += v; acc })
      .mapValues(_.mkString("|")).collect().toSeq.sorted
    // a shared (un-cloned) zero would leak values across keys within a partition
    assert(folded == Seq(("a", "1|3|5"), ("b", "1|2|3"), ("c", "2|7")))
  }

  test("reduceLeftByKey and scanLeftByKey (N+1 rows incl. zero)") {
    val gs = sc.parallelize(data, 3).groupSort(2, Ordering.Int)
    assert(gs.reduceLeftByKey(_ - _).collect().toSeq.sorted == Seq(("a", -7), ("b", -4), ("c", -5)))
    val scans = gs.scanLeftByKey(0)(_ + _).collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(scans("a") == Seq(0, 1, 4, 9) && scans("c") == Seq(0, 2, 9))
  }

  test("mapValues / flatMapValues / mapKeyValuesToValues / filter preserve the layout narrowly") {
    val gs = sc.parallelize(data, 3).groupSort(2, Ordering.Int)
    val mv = gs.mapValues(_ * 10)
    assert(mv.partitioner == gs.partitioner) // no re-shuffle
    assertLayout(mv)
    assert(gs.flatMapValues(v => Seq(v, -v)).collect().length == data.size * 2)
    assert(gs.mapKeyValuesToValues { case (k, v) => s"$k$v" }.collect().toSeq.contains(("a", "a1")))
    val f = gs.filter { case (_, v) => v % 2 == 1 }
    assertLayout(f)
    assert(f.valueOrdering.isDefined) // filtering keeps the value-sorted proof
    assert(f.collect().toSeq.sorted == Seq(("a", 1), ("a", 3), ("a", 5), ("b", 1), ("b", 3), ("c", 7)))
  }

  test("combiner groupSort equals reduceByKey oracle with one sorted shuffle") {
    val big = sc.parallelize((1 to 5000).map(i => (s"k${i % 97}", i.toLong)), 8)
    val gs = big.groupSort(4, (a: Long, b: Long) => a + b)
    assertLayout(gs)
    val oracle = big.reduceByKey(_ + _).collect().toMap
    assert(gs.collect().toMap == oracle)
  }

  test("combiner createCombiner/mergeValue/mergeCombiners path (top-2 per key)") {
    val gs = sc.parallelize(data, 3)
      .groupSort[List[Int]](2, (v: Int) => List(v),
        (c: List[Int], v: Int) => (v :: c).sorted.takeRight(2),
        (a: List[Int], b: List[Int]) => (a ++ b).sorted.takeRight(2))
    val got = gs.collect().toMap
    assert(got == Map("a" -> List(3, 5), "b" -> List(2, 3), "c" -> List(2, 7)))
  }

  test("mergeJoin variants match RDD join oracles") {
    val left = sc.parallelize(Seq((1, "x"), (1, "y"), (2, "z"), (4, "w")), 3).groupSort(2)
    val right = sc.parallelize(Seq((1, 10), (3, 30), (4, 40), (4, 41)), 2).groupSort(2)
    val lr = sc.parallelize(Seq((1, "x"), (1, "y"), (2, "z"), (4, "w")), 3)
    val rr = sc.parallelize(Seq((1, 10), (3, 30), (4, 40), (4, 41)), 2)
    assert(left.mergeJoinInner(right).collect().toSeq.sorted ==
      lr.join(rr).collect().toSeq.sorted)
    assert(left.mergeJoinLeftOuter(right).collect().toSeq.sortBy(_.toString) ==
      lr.leftOuterJoin(rr).collect().toSeq.sortBy(_.toString))
    assert(left.mergeJoinRightOuter(right).collect().toSeq.sortBy(_.toString) ==
      lr.rightOuterJoin(rr).collect().toSeq.sortBy(_.toString))
    assert(left.mergeJoin(right, bufferLeft = true).collect().toSeq.sortBy(_.toString) ==
      lr.fullOuterJoin(rr).collect().toSeq.sortBy(_.toString))
  }

  test("co-partitioned mergeJoin and mergeUnion are narrow (no realignment)") {
    val left = sc.parallelize(data, 3).groupSort(new HashPartitioner(2))
    val right = sc.parallelize(Seq(("a", 100), ("c", 300)), 2).groupSort(left)
    assert(right.partitioner == left.partitioner) // co-layout adopted
    val joined = left.mergeJoinInner(right)
    assert(joined.partitioner == left.partitioner)
    assert(joined.collect().toSeq.sorted ==
      sc.parallelize(data, 3).join(sc.parallelize(Seq(("a", 100), ("c", 300)), 2)).collect().toSeq.sorted)
    val u = left.mergeUnion(left.mapValues(_ + 100))
    assertLayout(u)
    assert(u.count() == data.size * 2)
  }

  test("generalized mergeJoin(f) sees both runs per key") {
    val left = sc.parallelize(Seq((1, 2), (1, 3), (2, 5)), 2).groupSort(2)
    val right = sc.parallelize(Seq((1, 10), (3, 7)), 2).groupSort(2)
    val out = left.mergeJoin(right) { (vs, ws) => Iterator.single((vs.sum, ws.sum)) }
      .collect().toSeq.sorted
    assert(out == Seq((1, (5, 10)), (2, (5, 0)), (3, (0, 7))))
  }

  test("co-partitioned mergeJoin lineage has EXACTLY the two layout shuffles (narrow join)") {
    val left = sc.parallelize(data, 3).groupSort(2)
    val right = sc.parallelize(Seq(("a", 1), ("c", 2)), 2).groupSort(left)
    val joined = left.mergeJoinInner(right)
    // the join itself must not add a shuffle: 2 DISTINCT ShuffledRDDs = the
    // layouts (a shared lineage prints twice under a union — count ids)
    def shuffleIds(rdd: org.apache.spark.rdd.RDD[_]): Set[String] =
      "ShuffledRDD\\[(\\d+)\\]".r.findAllMatchIn(rdd.toDebugString).map(_.group(1)).toSet
    assert(shuffleIds(joined).size == 2,
      s"expected 2 layout shuffles, lineage:\n${joined.toDebugString}")
    // a chain of narrow transforms adds none either
    val chained = joined.mapValues(_.toString).filter(_ => true)
      .mergeUnion(joined.mapValues(_.toString))
    assert(shuffleIds(chained).size == 2,
      s"narrow chain must not re-shuffle:\n${chained.toDebugString}")
  }

  test("mergeJoin re-layout preserves the other side's VALUE ordering") {
    // different partition counts force aligned() to re-shuffle the right
    // side; its secondary sort must survive the re-layout or an
    // order-sensitive f sees arbitrary value order
    val left = sc.parallelize(Seq((1, 0), (2, 0)), 3).groupSort(4)
    val right = sc.parallelize(Seq((1, 30), (1, 10), (1, 20), (2, 2), (2, 1)), 5)
      .groupSort(8, Ordering[Int])
    val got = left.mergeJoin(right) { (_, ws) =>
      Iterator.single(ws.mkString(","))
    }.collect().toMap
    assert(got == Map(1 -> "10,20,30", 2 -> "1,2"))
  }

  test("hash-first ordering keeps runs clean on hash collisions") {
    // "Aa" and "BB" collide on String.hashCode; tie-break keeps them separate runs
    val gs = sc.parallelize(Seq(("Aa", 1), ("BB", 2), ("Aa", 3), ("BB", 4)), 2).groupSort(1)
    assertLayout(gs)
    val sums = gs.mapStreamByKey(vs => Iterator.single(vs.sum)).collect().toMap
    assert(sums == Map("Aa" -> 4, "BB" -> 6))
  }
}
