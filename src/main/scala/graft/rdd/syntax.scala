package graft.rdd

import scala.reflect.ClassTag

import org.apache.spark.{HashPartitioner, Partitioner}
import org.apache.spark.Partitioner.defaultPartitioner
import org.apache.spark.rdd.RDD

/**
 * Implicit enrichment of `RDD[(K, V)]` — the drop-in surface for users of the
 * reference's `PairRDDFunctions` (tresata/spark-sorted
 * `PairRDDFunctions.scala:14-48`): every `groupSort` overload family —
 * plain layout, secondary (value) sort, co-layout with an existing
 * group-sorted RDD, map-side combiner, and semigroup reduce — with the key
 * sort pushed into the shuffle (see [[GroupSortedRDD]]).
 *
 * `import graft.rdd.syntax._` and any pair RDD gains `.groupSort(...)`.
 */
object syntax {

  implicit class GroupSortPairRDDOps[K, V](val self: RDD[(K, V)]) extends AnyVal {

    private def pick(numPartitions: Int)(implicit kt: ClassTag[K], vt: ClassTag[V]): Partitioner =
      if (numPartitions > 0) new HashPartitioner(numPartitions) else defaultPartitioner(self)

    // ---- layout (± secondary sort) ----

    def groupSort(partitioner: Partitioner, valueOrdering: Option[Ordering[V]])(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      GroupSortedRDD(self, partitioner, valueOrdering)

    def groupSort(partitioner: Partitioner)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(partitioner, None)

    def groupSort(numPartitions: Int, valueOrdering: Option[Ordering[V]])(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(pick(numPartitions), valueOrdering)

    def groupSort(numPartitions: Int, valueOrdering: Ordering[V])(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(pick(numPartitions), Some(valueOrdering))

    def groupSort(numPartitions: Int)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(pick(numPartitions), None)

    def groupSort(valueOrdering: Ordering[V])(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(-1, Some(valueOrdering))

    def groupSort()(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(-1, None)

    /** Co-layout with `other`: same partitioner AND same key order, so a
      * following `mergeJoin`/`mergeUnion` zips partitions with no shuffle. */
    def groupSort(other: GroupSortedRDD[K, _])(
        implicit kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      GroupSortedRDD.sortedBy(self, other.partitioner.get, other.keyOrdering, None)

    // ---- map-side combiner (one shuffle: partial-combine + shuffle-time sort) ----

    def groupSort[C: ClassTag](partitioner: Partitioner, createCombiner: V => C,
        mergeValue: (C, V) => C, mergeCombiners: (C, C) => C)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, C] =
      GroupSortedRDD(self, partitioner, createCombiner, mergeValue, mergeCombiners)

    def groupSort[C: ClassTag](numPartitions: Int, createCombiner: V => C,
        mergeValue: (C, V) => C, mergeCombiners: (C, C) => C)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, C] =
      groupSort(pick(numPartitions), createCombiner, mergeValue, mergeCombiners)

    def groupSort[C: ClassTag](createCombiner: V => C,
        mergeValue: (C, V) => C, mergeCombiners: (C, C) => C)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, C] =
      groupSort(-1, createCombiner, mergeValue, mergeCombiners)

    // ---- semigroup reduce (`plus` as all three combiner roles) ----

    def groupSort(partitioner: Partitioner, plus: (V, V) => V)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(partitioner, identity[V] _, plus, plus)

    def groupSort(numPartitions: Int, plus: (V, V) => V)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(pick(numPartitions), identity[V] _, plus, plus)

    def groupSort(plus: (V, V) => V)(
        implicit keyOrdering: Ordering[K], kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
      groupSort(-1, identity[V] _, plus, plus)
  }
}
