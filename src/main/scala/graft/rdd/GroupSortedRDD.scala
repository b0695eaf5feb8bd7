package graft.rdd

import scala.reflect.ClassTag

import org.apache.spark.{Aggregator, Partition, Partitioner, TaskContext}
import org.apache.spark.rdd.{RDD, ShuffledRDD}

import graft.sorted.iterators

/**
 * Total key order that compares `hashCode` first and falls back to the wrapped
 * ordering only on hash ties. Re-expression of the reference's hash-based key
 * ordering (tresata/spark-sorted `utils.scala:5-12`): a `HashPartitioner`
 * places keys by hash, so sorting partitions hash-first keeps comparisons to
 * one int compare for arbitrary key types while staying a total order (the
 * tie-break makes distinct keys with colliding hashes still separate into
 * clean runs). Null keys hash to 0 and fall through to the tie-break, which
 * for natural orderings throws NPE — same null contract as the reference.
 *
 * Both sides of a merge join construct this from the same implicit
 * `Ordering[K]`, so co-partitioned layouts always agree on run order.
 */
final case class HashFirstOrdering[K](tieBreak: Ordering[K]) extends Ordering[K] {
  private def h(k: K): Int = if (k == null) 0 else k.hashCode
  override def compare(x: K, y: K): Int = {
    val c = java.lang.Integer.compare(h(x), h(y))
    if (c != 0) c else tieBreak.compare(x, y)
  }
}

/** Routes a composite `(K, V)` shuffle key to the partition its `K` alone
  * would get — how the secondary (value) sort rides the shuffle without
  * breaking key co-location (reference `utils.scala:14-18`). */
private[rdd] final case class KeyOnlyPartitioner(delegate: Partitioner) extends Partitioner {
  override def numPartitions: Int = delegate.numPartitions
  override def getPartition(key: Any): Int =
    delegate.getPartition(key.asInstanceOf[(Any, Any)]._1)
}

/**
 * RDD-side group-sorted layout — the compat surface for users of the
 * reference's primary API (`GroupSorted.scala:13-14`): an `RDD[(K, V)]`
 * partitioned by `partitioner`, keys sorted *within* each partition under
 * `keyOrdering` (so each key's rows are consecutive and confined to one
 * partition), values optionally sorted within each key.
 *
 * The sort happens AT SHUFFLE TIME: construction goes through
 * `repartitionAndSortWithinPartitions` / `ShuffledRDD.setKeyOrdering`, so the
 * shuffle's spill-merge machinery produces sorted partitions directly — no
 * post-shuffle sort stage. This is the one semantic the Dataset surface
 * cannot express (SQL plans Exchange + SortExec; the reference concedes the
 * same for its own SQL API, `README.md:45`), which is exactly why this RDD
 * surface exists alongside [[graft.sorted.GroupSortedDataset]].
 *
 * Every transform below is NARROW (`preservesPartitioning = true` /
 * `zipPartitions`): after the one construction shuffle, chains of
 * mapStream / fold / merge-join run with zero additional exchanges.
 * Per-key kernels reuse [[graft.sorted.iterators]] — the same streaming,
 * non-exhaustion-safe, empty-output-skipping (reference issue #5) kernels
 * the Dataset surface is specced against.
 */
class GroupSortedRDD[K, V] private[rdd] (
    parent: RDD[(K, V)],
    val keyOrdering: Ordering[K],
    val valueOrdering: Option[Ordering[V]])(implicit kt: ClassTag[K], vt: ClassTag[V])
  extends RDD[(K, V)](parent) {

  require(parent.partitioner.isDefined, "group-sorted layout requires a partitioner")

  override def compute(split: Partition, context: TaskContext): Iterator[(K, V)] =
    firstParent[(K, V)].iterator(split, context)

  override protected def getPartitions: Array[Partition] = firstParent[(K, V)].partitions

  override val partitioner: Option[Partitioner] = parent.partitioner

  /** Wrap a narrow transform's output without re-checking layout. */
  private def wrap[W: ClassTag](out: RDD[(K, W)], vo: Option[Ordering[W]]): GroupSortedRDD[K, W] =
    new GroupSortedRDD[K, W](out, keyOrdering, vo)

  // ---- per-key streaming (reference GroupSorted.scala:41-57) ----

  /** Stream `f` over each key's values in layout order; `f` need not exhaust
    * its iterator and empty outputs skip the key entirely. */
  def mapStreamByKey[W: ClassTag](f: Iterator[V] => IterableOnce[W]): GroupSortedRDD[K, W] =
    wrap(mapPartitions(iterators.mapStream(_)(f), preservesPartitioning = true), None)

  /** Per-partition context variant: `c` is invoked once per partition and its
    * result handed to every key — reusable buffers without per-key allocation. */
  def mapStreamByKey[W: ClassTag, C](c: () => C)(f: (C, Iterator[V]) => IterableOnce[W]): GroupSortedRDD[K, W] =
    wrap(mapPartitions(iterators.mapStreamWithContext(_)(c, f), preservesPartitioning = true), None)

  /** Order-sensitive fold per key. The zero is serializer-cloned once per key,
    * so mutable zeros (builders, buffers) are safe (reference `package.scala:175-182`). */
  def foldLeftByKey[W: ClassTag](zero: W)(f: (W, V) => W): GroupSortedRDD[K, W] = {
    val fresh = GroupSortedRDD.zeroFactory(zero)
    mapStreamByKey(vs => Iterator.single(vs.foldLeft(fresh())(f)))
  }

  /** Order-sensitive reduce per key (keys are never empty, so always defined). */
  def reduceLeftByKey[W >: V: ClassTag](f: (W, V) => W): GroupSortedRDD[K, W] =
    mapStreamByKey(vs => Iterator.single(vs.reduceLeft(f)))

  /** Running fold per key: emits N+1 rows per key including the zero row. */
  def scanLeftByKey[W: ClassTag](zero: W)(f: (W, V) => W): GroupSortedRDD[K, W] = {
    val fresh = GroupSortedRDD.zeroFactory(zero)
    mapStreamByKey(_.scanLeft(fresh())(f))
  }

  // ---- narrow value transforms (layout-preserving) ----

  def mapValues[W: ClassTag](f: V => W): GroupSortedRDD[K, W] =
    wrap(mapPartitions(_.map { case (k, v) => (k, f(v)) }, preservesPartitioning = true), None)

  def flatMapValues[W: ClassTag](f: V => IterableOnce[W]): GroupSortedRDD[K, W] =
    wrap(mapPartitions(_.flatMap { case (k, v) => f(v).iterator.map((k, _)) }, preservesPartitioning = true), None)

  /** Value transform that also sees the key (reference `GroupSorted.scala:39`). */
  def mapKeyValuesToValues[W: ClassTag](f: ((K, V)) => W): GroupSortedRDD[K, W] =
    wrap(mapPartitions(_.map(kv => (kv._1, f(kv))), preservesPartitioning = true), None)

  /** Row filter; dropping rows cannot break key runs or value order. */
  override def filter(p: ((K, V)) => Boolean): GroupSortedRDD[K, V] =
    new GroupSortedRDD(super.filter(p), keyOrdering, valueOrdering)

  // ---- merge joins / union (reference GroupSorted.scala:59-105) ----

  /** Re-layout `other` onto this RDD's partitioner unless BOTH the
    * partitioner and the key ordering already match — a matching partitioner
    * with a different sort order (e.g. one side built under a reversed
    * implicit) would zip partitions whose runs disagree and trip the merge
    * kernel's sortedness assert on hash ties. Ordering equality is
    * structural ([[HashFirstOrdering]] is a case class; primitive orderings
    * are singletons); when it can't be proven the side is re-sorted — a
    * redundant shuffle at worst, never a wrong merge. */
  private def aligned[W: ClassTag](other: GroupSortedRDD[K, W]): GroupSortedRDD[K, W] =
    if (other.partitioner == this.partitioner && other.keyOrdering == this.keyOrdering) other
    // carry other's valueOrdering through the re-layout: dropping it would
    // silently hand the merge kernel that side's runs in arbitrary value
    // order (an order-sensitive f would compute wrong results, no error)
    else GroupSortedRDD.sortedBy(other, this.partitioner.get, keyOrdering, other.valueOrdering)

  /**
   * Generalized sort-merge cogroup: for every key on either side, `f` sees
   * both (possibly empty) value runs. Narrow `zipPartitions` when layouts
   * match; otherwise the smaller re-shuffle is exactly one side.
   */
  def mergeJoin[W: ClassTag, U: ClassTag](other: GroupSortedRDD[K, W])(f: (Iterator[V], Iterator[W]) => IterableOnce[U]): GroupSortedRDD[K, U] = {
    val rhs = aligned(other)
    val ord = keyOrdering
    wrap(zipPartitions(rhs, preservesPartitioning = true)((l, r) => iterators.mergeJoin(l, r)(f)(ord)), None)
  }

  /** Full-outer merge join. Streams the left run and buffers the right run per
    * key; `bufferLeft` flips which side is buffered (the many-to-many caveat —
    * buffer the side you know is small, reference `README.md:39`). */
  def mergeJoin[W: ClassTag](other: GroupSortedRDD[K, W], bufferLeft: Boolean = false): GroupSortedRDD[K, (Option[V], Option[W])] =
    if (bufferLeft) mergeJoin(other)(iterators.flipped(iterators.outerProduct[W, V]))
    else mergeJoin(other)(iterators.outerProduct[V, W])

  def mergeJoinInner[W: ClassTag](other: GroupSortedRDD[K, W], bufferLeft: Boolean = false): GroupSortedRDD[K, (V, W)] =
    if (bufferLeft) mergeJoin(other)(iterators.flipped(iterators.innerProduct[W, V]))
    else mergeJoin(other)(iterators.innerProduct[V, W])

  /** Left-outer: right-only keys emit nothing outright (dedicated kernel —
    * no discarded-tuple allocation from filtering a full outer). */
  def mergeJoinLeftOuter[W: ClassTag](other: GroupSortedRDD[K, W], bufferLeft: Boolean = false): GroupSortedRDD[K, (V, Option[W])] =
    mergeJoin(other)(iterators.leftOuterProduct[V, W](bufferLeft))

  def mergeJoinRightOuter[W: ClassTag](other: GroupSortedRDD[K, W], bufferLeft: Boolean = false): GroupSortedRDD[K, (Option[V], W)] =
    mergeJoin(other)(iterators.rightOuterProduct[V, W](bufferLeft))

  /** Order-preserving 2-way merge by key (ties keep left-then-right order);
    * narrow when layouts match, value order within keys is interleaved so the
    * result carries no value ordering. */
  def mergeUnion(other: GroupSortedRDD[K, V]): GroupSortedRDD[K, V] = {
    val rhs = aligned(other)
    val ord: Ordering[(K, V)] = Ordering.by[(K, V), K](_._1)(keyOrdering)
    wrap(zipPartitions(rhs, preservesPartitioning = true)((l, r) => iterators.mergeUnion(l, r)(ord)), None)
  }
}

object GroupSortedRDD {

  /**
   * Establish the layout with the sort pushed into the shuffle.
   *
   * No value ordering: `repartitionAndSortWithinPartitions(partitioner)` under
   * the hash-first key order — one shuffle whose spill-merge emits sorted
   * partitions (`ShuffledRDD.setKeyOrdering` underneath).
   *
   * With value ordering: shuffle on the COMPOSITE `(K, V)` key ordered by
   * (key, value) while `KeyOnlyPartitioner` keeps placement a function of `K`
   * alone — the classic secondary-sort shape (reference `GroupSorted.scala:110-127`),
   * expressed through the public `OrderedRDDFunctions` API.
   */
  private[rdd] def sortedBy[K, V](rdd: RDD[(K, V)], partitioner: Partitioner,
      keyOrdering: Ordering[K], valueOrdering: Option[Ordering[V]])(
      implicit kt: ClassTag[K], vt: ClassTag[V]): GroupSortedRDD[K, V] =
    valueOrdering match {
      case None =>
        implicit val ord: Ordering[K] = keyOrdering
        val shuffled = rdd.repartitionAndSortWithinPartitions(partitioner)
        new GroupSortedRDD(shuffled, keyOrdering, None)
      case Some(vo) =>
        implicit val composite: Ordering[(K, V)] = Ordering.Tuple2(keyOrdering, vo)
        val shuffled = rdd.map((_, ()))
          .repartitionAndSortWithinPartitions(KeyOnlyPartitioner(partitioner))
        val unwrapped = shuffled.mapPartitions(_.map(_._1), preservesPartitioning = false)
        // placement is a pure function of K: re-attach that fact
        val keyPart = partitioner
        val placed = new RDD[(K, V)](unwrapped) {
          override def compute(split: Partition, context: TaskContext): Iterator[(K, V)] =
            firstParent[(K, V)].iterator(split, context)
          override protected def getPartitions: Array[Partition] = firstParent[(K, V)].partitions
          override val partitioner: Option[Partitioner] = Some(keyPart)
        }
        new GroupSortedRDD(placed, keyOrdering, Some(vo))
    }

  /** Hash-first wrapper applied at every public entry, so co-partitioned
    * layouts built from the same implicit ordering always agree. */
  def apply[K: ClassTag, V: ClassTag](rdd: RDD[(K, V)], partitioner: Partitioner,
      valueOrdering: Option[Ordering[V]])(implicit keyOrdering: Ordering[K]): GroupSortedRDD[K, V] =
    sortedBy(rdd, partitioner, HashFirstOrdering(keyOrdering), valueOrdering)

  /**
   * Combiner construction (reference `GroupSorted.scala:140-146`): ONE shuffle
   * carrying map-side partially-combined values AND the shuffle-time key sort.
   * `ShuffledRDD` + `Aggregator` is the public (`@DeveloperApi`) surface for
   * attaching both to a single exchange — `combineByKey` alone would lose the
   * sort and force a second pass.
   */
  def apply[K: ClassTag, V: ClassTag, C: ClassTag](rdd: RDD[(K, V)], partitioner: Partitioner,
      createCombiner: V => C, mergeValue: (C, V) => C, mergeCombiners: (C, C) => C)(
      implicit keyOrdering: Ordering[K]): GroupSortedRDD[K, C] = {
    val ord = HashFirstOrdering(keyOrdering)
    val shuffled = new ShuffledRDD[K, V, C](rdd, partitioner)
      .setKeyOrdering(ord)
      .setAggregator(new Aggregator(createCombiner, mergeValue, mergeCombiners))
      .setMapSideCombine(true)
    new GroupSortedRDD(shuffled, ord, None)
  }

  /** Serializer-clone factory for fold/scan zeros — delegates to the ONE
    * implementation on the Dataset surface so the two surfaces can never
    * drift ([[graft.sorted.GroupSortedDataset.zeroFactory]]). */
  private[rdd] def zeroFactory[W: ClassTag](zero: W): () => W =
    graft.sorted.GroupSortedDataset.zeroFactory(zero)
}
