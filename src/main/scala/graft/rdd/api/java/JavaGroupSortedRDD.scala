package graft.rdd.api.java

import java.util.{Comparator, Iterator => JIterator}

import scala.jdk.CollectionConverters._
import scala.reflect.ClassTag

import org.apache.spark.{HashPartitioner, Partitioner}
import org.apache.spark.Partitioner.defaultPartitioner
import org.apache.spark.api.java.JavaPairRDD
import org.apache.spark.api.java.function.{FlatMapFunction => JFlatMapFunction, Function => JFunction, Function0 => JFunction0, Function2 => JFunction2}

import graft.rdd.GroupSortedRDD

/**
 * Java-friendly facade over [[graft.rdd.GroupSortedRDD]] — the rebuild of the
 * reference's Java API on its PRIMARY (RDD) surface (tresata/spark-sorted
 * `api/java/GroupSorted.scala:33-87`). Like the reference's Java class, this
 * IS a `JavaPairRDD`, so Java callers keep the whole RDD API and gain the
 * per-key streaming operators; every method delegates to the Scala class,
 * adapting `java.util.Comparator`/`Iterator` and Spark's Java SAM interfaces
 * at the boundary.
 *
 * Key ordering defaults to the NPE-on-null natural comparator shared with the
 * Dataset facade ([[graft.sorted.api.java.JavaGroupSortedDataset.naturalOrder]]).
 * `scala.Option`-typed outer-join variants stay off the facade (awkward from
 * Java) — the generalized `mergeJoin(other, f)` expresses them in one lambda.
 */
object JavaGroupSortedRDD {

  /** NPE-on-null natural-order comparator for `Comparable` keys. */
  def naturalOrder[T](): Comparator[T] =
    graft.sorted.api.java.JavaGroupSortedDataset.naturalOrder[T]()

  // Same fake-ClassTag idiom Spark's Java API uses: tags only reach
  // serializer plumbing, which is tag-erased anyway.
  private[java] def fakeClassTag[T]: ClassTag[T] = ClassTag.AnyRef.asInstanceOf[ClassTag[T]]

  private[java] def toOrdering[T](cmp: Comparator[T]): Ordering[T] =
    Ordering.comparatorToOrdering(cmp)

  // ONE shared key-ordering instance for every facade construction:
  // `Ordering.comparatorToOrdering` wraps with reference equality, so a
  // fresh wrapper per groupSort would make co-partitioned Java layouts
  // compare unequal in `aligned()` and silently re-shuffle on every
  // mergeJoin/mergeUnion — the narrow path must be reachable from Java.
  private val sharedNaturalOrdering: Ordering[Any] = toOrdering(naturalOrder[Any]())

  private def build[K, V](rdd: JavaPairRDD[K, V], partitioner: Partitioner,
      valueComparator: Comparator[V]): GroupSortedRDD[K, V] = {
    implicit val kt: ClassTag[K] = rdd.kClassTag
    implicit val vt: ClassTag[V] = rdd.vClassTag
    implicit val ord: Ordering[K] = sharedNaturalOrdering.asInstanceOf[Ordering[K]]
    GroupSortedRDD(rdd.rdd, partitioner, Option(valueComparator).map(toOrdering))
  }

  // constructor-shaped factory overloads (reference Java constructors,
  // `api/java/GroupSorted.scala:34-49`)

  def groupSort[K, V](rdd: JavaPairRDD[K, V], partitioner: Partitioner,
      valueComparator: Comparator[V]): JavaGroupSortedRDD[K, V] =
    new JavaGroupSortedRDD(build(rdd, partitioner, valueComparator))

  def groupSort[K, V](rdd: JavaPairRDD[K, V], partitioner: Partitioner): JavaGroupSortedRDD[K, V] =
    groupSort(rdd, partitioner, null)

  def groupSort[K, V](rdd: JavaPairRDD[K, V], numPartitions: Int,
      valueComparator: Comparator[V]): JavaGroupSortedRDD[K, V] =
    groupSort(rdd,
      if (numPartitions > 0) new HashPartitioner(numPartitions) else defaultPartitioner(rdd.rdd),
      valueComparator)

  def groupSort[K, V](rdd: JavaPairRDD[K, V], numPartitions: Int): JavaGroupSortedRDD[K, V] =
    groupSort(rdd, numPartitions, null)

  def groupSort[K, V](rdd: JavaPairRDD[K, V], valueComparator: Comparator[V]): JavaGroupSortedRDD[K, V] =
    groupSort(rdd, -1, valueComparator)

  def groupSort[K, V](rdd: JavaPairRDD[K, V]): JavaGroupSortedRDD[K, V] =
    groupSort(rdd, -1, null)
}

class JavaGroupSortedRDD[K, V] private (val underlying: GroupSortedRDD[K, V])
  extends JavaPairRDD[K, V](underlying)(
    JavaGroupSortedRDD.fakeClassTag[K], JavaGroupSortedRDD.fakeClassTag[V]) {

  import JavaGroupSortedRDD.fakeClassTag

  // ---- layout-preserving projections ----

  override def mapValues[W](f: JFunction[V, W]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.mapValues(v => f.call(v)))
  }

  override def flatMapValues[W](f: JFlatMapFunction[V, W]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.flatMapValues(v => f.call(v).asScala))
  }

  def mapKeyValuesToValues[W](f: JFunction[(K, V), W]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.mapKeyValuesToValues(kv => f.call(kv)))
  }

  override def filter(f: JFunction[(K, V), java.lang.Boolean]): JavaGroupSortedRDD[K, V] =
    new JavaGroupSortedRDD(underlying.filter(kv => f.call(kv)))

  // ---- per-key streaming ----

  def mapStreamByKey[W](f: JFunction[JIterator[V], JIterator[W]]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.mapStreamByKey(it => f.call(it.asJava).asScala))
  }

  def mapStreamByKey[C, W](ctx: JFunction0[C],
      f: JFunction2[C, JIterator[V], JIterator[W]]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(
      underlying.mapStreamByKey(() => ctx.call())((c, it) => f.call(c, it.asJava).asScala))
  }

  def foldLeftByKey[W](zero: W, f: JFunction2[W, V, W]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.foldLeftByKey(zero)((w, v) => f.call(w, v)))
  }

  def reduceLeftByKey[W >: V](f: JFunction2[W, V, W]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.reduceLeftByKey[W]((w, v) => f.call(w, v)))
  }

  def scanLeftByKey[W](zero: W, f: JFunction2[W, V, W]): JavaGroupSortedRDD[K, W] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.scanLeftByKey(zero)((w, v) => f.call(w, v)))
  }

  // ---- merge joins / union ----

  /** Generalized sort-merge cogroup: `f` sees both sides' (possibly empty)
    * value iterators per key. Narrow when co-partitioned. */
  def mergeJoin[W, U](other: JavaGroupSortedRDD[K, W],
      f: JFunction2[JIterator[V], JIterator[W], JIterator[U]]): JavaGroupSortedRDD[K, U] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    implicit val ut: ClassTag[U] = fakeClassTag
    new JavaGroupSortedRDD(
      underlying.mergeJoin(other.underlying)((vs, ws) => f.call(vs.asJava, ws.asJava).asScala))
  }

  def mergeJoinInner[W](other: JavaGroupSortedRDD[K, W]): JavaGroupSortedRDD[K, (V, W)] = {
    implicit val wt: ClassTag[W] = fakeClassTag
    new JavaGroupSortedRDD(underlying.mergeJoinInner(other.underlying))
  }

  def mergeUnion(other: JavaGroupSortedRDD[K, V]): JavaGroupSortedRDD[K, V] =
    new JavaGroupSortedRDD(underlying.mergeUnion(other.underlying))
}
