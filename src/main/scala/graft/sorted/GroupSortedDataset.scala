package graft.sorted

import java.nio.ByteBuffer

import scala.reflect.ClassTag

import org.apache.spark.SparkEnv
import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/**
 * A `Dataset[(K, V)]` carrying the *group-sorted layout invariant*:
 * rows are hash-partitioned by key, each key's rows are consecutive within a
 * single partition, keys are sorted within a partition, and values are sorted
 * per key by a caller-chosen sort expression.
 *
 * Spark-native rebuild of the reference's SQL surface
 * (tresata/spark-sorted `sql/GroupSortedDataset.scala:12-47`) plus the RDD-only
 * operators of `GroupSorted.scala:29-103` re-expressed on Dataset. The layout is
 * established declaratively — `repartition(key).sortWithinPartitions(key, v)` —
 * so Catalyst plans a single hash exchange + spillable in-partition sort
 * (`SortExec`), and AQE can still re-plan partition counts at runtime. All
 * per-key operators below are *narrow* (mapPartitions) on top of that layout:
 * groups stream through [[iterators]] and are never materialized, so a key with
 * 100M rows costs O(1) heap, which is what makes this viable at 100 TB.
 *
 * By convention (inherited from the reference) the key is the FIRST column and
 * the value the LAST column of the tuple Dataset.
 *
 * KEY TYPE CONSTRAINT: key-run detection compares keys with JVM `==`, so key
 * types must have value-based equality consistent with their Catalyst sort
 * order — primitives, Strings, case classes, tuples. `Array[_]` keys
 * (reference equality) and `Double.NaN` keys (NaN != NaN) would silently
 * split one key's run into many; wrap such keys (e.g. `Seq` instead of
 * `Array`) before grouping. The reference has the same constraint.
 */
class GroupSortedDataset[K: Encoder, V] private[sorted] (
    dataset: Dataset[(K, V)],
    valueSort: Option[Column] = None,
    sourceOpt: Option[Dataset[(K, V)]] = None,
    private[sorted] val explicitPartitions: Option[Int] = None,
    private[sorted] val reverseLayout: Boolean = false) extends Serializable {
  import GroupSortedDataset.tupleEnc

  /** Escape hatch: the underlying Dataset, layout guaranteed. */
  def toDS: Dataset[(K, V)] = dataset

  /** The pre-shuffle input when this instance came straight from `groupSort`.
    * `mergeJoin` plans its own exchange+sort (`cogroupSorted`), so feeding it
    * the already-laid-out dataset would shuffle and sort each side TWICE —
    * Catalyst cannot see that the typed grouping key equals the repartition
    * column through the lambda. After narrow ops this falls back to the
    * laid-out dataset (still correct, cogroup re-establishes order itself). */
  private[sorted] def source: Dataset[(K, V)] = sourceOpt.getOrElse(dataset)

  private[sorted] def valueSortOrDefault: Column = valueSort.getOrElse(col(dataset.columns.last))

  /**
   * Stream `f` over each key's values (in the established value order), with a
   * per-partition reusable context. Emits one output row per element `f`
   * yields; keys with empty output are skipped (reference issue #5 semantics).
   */
  def mapStreamByKey[W: Encoder, C](ctx: () => C)(f: (C, Iterator[V]) => IterableOnce[W]): Dataset[(K, W)] =
    dataset.mapPartitions(it => iterators.mapStreamWithContext(it)(ctx, f))(tupleEnc[K, W])

  /** Stream `f` over each key's values in value order. */
  def mapStreamByKey[W: Encoder](f: Iterator[V] => IterableOnce[W]): Dataset[(K, W)] =
    dataset.mapPartitions(it => iterators.mapStream(it)(f))(tupleEnc[K, W])

  /** Order-sensitive left fold per key; one row per key. The zero value is
    * serializer-cloned per key so mutable accumulators are safe. */
  def foldLeftByKey[W: ClassTag: Encoder](zero: W)(f: (W, V) => W): Dataset[(K, W)] = {
    val freshZero = GroupSortedDataset.zeroFactory(zero)
    mapStreamByKey(vs => Iterator.single(vs.foldLeft(freshZero())(f)))
  }

  /** Order-sensitive left reduce per key (every key has >= 1 value). */
  def reduceLeftByKey[W >: V: Encoder](f: (W, V) => W): Dataset[(K, W)] =
    mapStreamByKey(vs => Iterator.single(vs.reduceLeft(f)))

  /** Per-key prefix scan in value order; emits N+1 rows per key, INCLUDING the
    * zero element (reference `GroupSortedSpec.scala:169-186` semantics). */
  def scanLeftByKey[W: ClassTag: Encoder](zero: W)(f: (W, V) => W): Dataset[(K, W)] = {
    val freshZero = GroupSortedDataset.zeroFactory(zero)
    mapStreamByKey(vs => vs.scanLeft(freshZero())(f))
  }

  /** Value projection. Narrow: grouping layout survives, per-key value ORDER is
    * no longer meaningful under the new value type (so the value-sort column is
    * dropped), but the key->partition mapping and key order are untouched — the
    * co-partition proof (`explicitPartitions`) is carried so a later
    * `mergeJoin`/`mergeUnion` still plans the 0-exchange narrow path, matching
    * the reference's partitioner preservation (`GroupSorted.scala:33-39`). */
  def mapValues[W: Encoder](f: V => W): GroupSortedDataset[K, W] =
    new GroupSortedDataset(dataset.map(kv => (kv._1, f(kv._2)))(tupleEnc[K, W]), None, None, explicitPartitions, reverseLayout)

  /** 1-to-N value expansion; narrow, grouping layout AND co-partition proof
    * survive (key runs stay contiguous and in key order). */
  def flatMapValues[W: Encoder](f: V => IterableOnce[W]): GroupSortedDataset[K, W] =
    new GroupSortedDataset(dataset.flatMap(kv => f(kv._2).iterator.map(w => (kv._1, w)))(tupleEnc[K, W]), None, None, explicitPartitions, reverseLayout)

  /** Value projection that can read the key; narrow, co-partition proof survives. */
  def mapKeyValuesToValues[W: Encoder](f: ((K, V)) => W): GroupSortedDataset[K, W] =
    new GroupSortedDataset(dataset.map(kv => (kv._1, f(kv)))(tupleEnc[K, W]), None, None, explicitPartitions, reverseLayout)

  /** Row filter; narrow, preserves BOTH grouping and per-key value order
    * (the sort metadata is carried so later mergeJoins keep the order too). */
  def filter(f: ((K, V)) => Boolean): GroupSortedDataset[K, V] =
    new GroupSortedDataset(dataset.filter(f), valueSort, None, explicitPartitions, reverseLayout)

  /** True when `this` and `other` PROVABLY share the same key->partition
    * mapping: both laid out with the same EXPLICIT partition count over the
    * same key hash (`repartition(n, key)` pins n — AQE does not coalesce
    * user-numbered repartitions, while equal runtime counts of two implicit
    * layouts prove nothing). */
  private def coPartitioned[W](other: GroupSortedDataset[K, W]): Boolean =
    (explicitPartitions, other.explicitPartitions) match {
      case (Some(a), Some(b)) => a == b
      case _ => false
    }

  /**
   * Diagnostic: would `mergeJoin(other)` plan the NARROW 0-exchange path
   * under the implicits in scope at the call site? The narrow path needs (a)
   * a co-partition proof — both sides `groupSort(n)` with the same explicit
   * `n`, carried through any narrow ops in between — and (b) a
   * [[NarrowJoinSupport]] instance carrying an `Ordering[K]` (derived
   * automatically whenever `K` has one in implicit scope; the low-priority
   * fallback for unordered keys selects cogroup). Pin the plan with this
   * method (or an Exchange-count plan assertion) where the narrow path is
   * load-bearing.
   */
  def canNarrowJoinWith[W](other: GroupSortedDataset[K, W])(implicit nj: NarrowJoinSupport[K]): Boolean =
    nj.keyOrdering.isDefined && coPartitioned(other)

  /**
   * Generalized sort-merge cogroup: for every key on either side, `f` sees both
   * (possibly empty) value iterators and streams its output.
   *
   * When both sides are provably co-partitioned (equal EXPLICIT partition
   * counts from `groupSort(n)`) and an `Ordering[K]` consistent with the
   * layout's key sort is available, this is a NARROW `zipPartitions` 2-pointer
   * merge over the already-established layouts — zero additional exchanges,
   * the direct analog of the reference's co-partitioned plan
   * (tresata/spark-sorted `GroupSorted.scala:63-72`). The merge kernel
   * ([[iterators.mergeJoin]]) asserts key sortedness as it streams, so an
   * `Ordering[K]` inconsistent with Catalyst's sort (exotic non-BMP strings)
   * fails loud, not wrong.
   *
   * Otherwise it is planned via `KeyValueGroupedDataset.cogroupSorted` —
   * Spark's native shuffle+sort-merge cogroup (one exchange + sort per side,
   * planned from the PRE-layout `source` so nothing shuffles twice).
   *
   * CALL-SITE CAVEAT: the physical path is chosen by the
   * [[NarrowJoinSupport]] typeclass — an ordered key resolves the narrow
   * instance, an unordered key resolves the low-priority cogroup fallback
   * (correct, but two exchanges), and `NarrowJoinSupport.cogroupOnly[K]` is
   * the explicit opt-out. When the narrow plan is the point, assert
   * [[canNarrowJoinWith]] or pin the plan's Exchange count in a test.
   */
  def mergeJoin[W, U](other: GroupSortedDataset[K, W])(f: (Iterator[V], Iterator[W]) => IterableOnce[U])(implicit encU: Encoder[U], nj: NarrowJoinSupport[K]): Dataset[(K, U)] = {
    val enc = tupleEnc[K, U]
    val narrowOrd = if (coPartitioned(other)) nj.keyOrdering else None
    narrowOrd match {
      case Some(ordK) =>
        val spark = dataset.sparkSession
        val merged = dataset.rdd.zipPartitions(other.toDS.rdd) { (l, r) =>
          iterators.mergeJoin(l, r)(f)(ordK)
        }
        spark.createDataset(merged)(enc)
      case None =>
        val left = source
        val right = other.source
        // value = LAST column by the key-first/value-last convention; `.as[(K, V)]`
        // keeps original column names, so don't assume "_2". Reuse the sort order
        // groupSort established when it is known.
        val leftSort = valueSortOrDefault
        val rightSort = other.valueSortOrDefault
        left
          .groupByKey(_._1)
          .cogroupSorted(right.groupByKey(_._1))(leftSort)(rightSort) { (k, vs, ws) =>
            f(vs.map(_._2), ws.map(_._2)).iterator.map(u => (k, u))
          }(enc)
    }
  }

  /** Full-outer merge join: per key, cross product of values with `None` for a
    * missing side. `bufferLeft` flips which side is buffered per key. */
  def mergeJoinOuter[W](other: GroupSortedDataset[K, W], bufferLeft: Boolean = false)(implicit e: Encoder[(Option[V], Option[W])], nj: NarrowJoinSupport[K]): Dataset[(K, (Option[V], Option[W]))] = {
    val f =
      if (bufferLeft) iterators.flipped(iterators.outerProduct[W, V])
      else iterators.outerProduct[V, W]
    mergeJoin(other)(f)(e, nj)
  }

  /** Inner merge join: only keys present on both sides. */
  def mergeJoinInner[W](other: GroupSortedDataset[K, W], bufferLeft: Boolean = false)(implicit e: Encoder[(V, W)], nj: NarrowJoinSupport[K]): Dataset[(K, (V, W))] = {
    val f =
      if (bufferLeft) iterators.flipped(iterators.innerProduct[W, V])
      else iterators.innerProduct[V, W]
    mergeJoin(other)(f)(e, nj)
  }

  /** Left-outer merge join. Right-only keys emit nothing outright (the
    * dedicated kernel never allocates the discarded tuples a filtered full
    * outer would). */
  def mergeJoinLeftOuter[W](other: GroupSortedDataset[K, W], bufferLeft: Boolean = false)(implicit e: Encoder[(V, Option[W])], nj: NarrowJoinSupport[K]): Dataset[(K, (V, Option[W]))] =
    mergeJoin(other)(iterators.leftOuterProduct[V, W](bufferLeft))(e, nj)

  /** Right-outer merge join (mirror of [[mergeJoinLeftOuter]]). */
  def mergeJoinRightOuter[W](other: GroupSortedDataset[K, W], bufferLeft: Boolean = false)(implicit e: Encoder[(Option[V], W)], nj: NarrowJoinSupport[K]): Dataset[(K, (Option[V], W))] =
    mergeJoin(other)(iterators.rightOuterProduct[V, W](bufferLeft))(e, nj)

  /**
   * Order-preserving multiset union with another GroupSortedDataset laid out
   * with a compatible sort. When partition counts match, this is a NARROW
   * zip-partitions 2-way merge (no shuffle — the direct analog of the
   * reference's `mergeUnion`, `GroupSorted.scala:100-103`); otherwise it falls
   * back to `union` + re-establishing the layout (one shuffle).
   */
  def mergeUnion(other: GroupSortedDataset[K, V])(implicit ordK: Ordering[K], ordV: Ordering[V]): GroupSortedDataset[K, V] = {
    val left = dataset
    val right = other.toDS
    // Rows are laid out (key asc, value asc-or-desc): a `reverse = true`
    // layout merges under the REVERSED value ordering — the caller passes the
    // natural `Ordering[V]` either way (reference `GroupSorted.scala:100-103`
    // parity; previously a descending layout assert-failed in the merge).
    implicit val ordKV: Ordering[(K, V)] =
      Ordering.Tuple2(ordK, if (reverseLayout) ordV.reverse else ordV)
    // The narrow zip is only sound when both sides PROVABLY share the same
    // key->partition mapping (same explicit partition count on the same key
    // hash — equal runtime counts alone are not proof: AQE can coalesce the
    // two sides' implicit repartitions differently, and zipping mismatched
    // partitionings would silently split a key across merged partitions) AND
    // the same value sort direction.
    if (coPartitioned(other) && reverseLayout == other.reverseLayout &&
        left.rdd.getNumPartitions == right.rdd.getNumPartitions) {
      val spark = left.sparkSession
      val merged = left.rdd.zipPartitions(right.rdd, preservesPartitioning = true)(iterators.mergeUnion(_, _))
      // restore the ORIGINAL column names: createDataset re-materializes the
      // encoder's tuple schema (_1/_2), and a named valueSort (col("score"))
      // carried onto a _1/_2 frame would break the next cogroup/union resolve
      val ds = spark.createDataset(merged)(dataset.encoder)
        .toDF(dataset.columns: _*).as[(K, V)](dataset.encoder)
      new GroupSortedDataset(ds, valueSort, None, explicitPartitions, reverseLayout)
    } else {
      // shuffle fallback: re-establish the layout PRESERVING this side's
      // established value sort (both sides must share a compatible sort for
      // mergeUnion to be meaningful at all)
      val u = left.union(right)
      val key = col(u.columns.head)
      val sort = valueSortOrDefault
      new GroupSortedDataset(
        u.repartition(key).sortWithinPartitions(key, sort), Some(sort), None,
        None, reverseLayout)
    }
  }
}

object GroupSortedDataset {
  private[sorted] def tupleEnc[A: Encoder, B: Encoder]: Encoder[(A, B)] =
    Encoders.tuple(implicitly[Encoder[A]], implicitly[Encoder[B]])

  /**
   * Establish the group-sorted layout: hash-partition by the first column,
   * sort within partitions by (key, sortBy(lastColumn)). `numPartitions <= 0`
   * defers to `spark.sql.shuffle.partitions` (and AQE coalescing).
   */
  private[sorted] def apply[K: Encoder, V](dataset: Dataset[(K, V)], numPartitions: Option[Int], reverse: Boolean, sortBy: Column => Column): GroupSortedDataset[K, V] = {
    val key = col(dataset.columns.head)
    val valueSort = {
      val s = sortBy(col(dataset.columns.last))
      if (reverse) s.desc else s.asc
    }
    val repartitioned = numPartitions match {
      case Some(n) if n > 0 => dataset.repartition(n, key)
      case _ => dataset.repartition(key)
    }
    new GroupSortedDataset(repartitioned.sortWithinPartitions(key, valueSort), Some(valueSort), Some(dataset),
      numPartitions.filter(_ > 0), reverse)
  }

  /**
   * Establish a RANGE-partitioned group-sorted layout (see
   * `syntax.groupSortByRange`): keys are range-partitioned so partitions
   * concatenate globally key-ordered, then sorted within partitions by
   * (key, valueSort) as usual. `explicitPartitions` stays `None` — range
   * bounds are sample-dependent, so no co-partition proof exists and joins
   * from this layout always plan the cogroup path.
   */
  private[sorted] def byRange[K: Encoder, V](dataset: Dataset[(K, V)], numPartitions: Option[Int], reverse: Boolean, sortBy: Column => Column): GroupSortedDataset[K, V] = {
    val key = col(dataset.columns.head)
    val valueSort = {
      val s = sortBy(col(dataset.columns.last))
      if (reverse) s.desc else s.asc
    }
    val repartitioned = numPartitions match {
      case Some(n) if n > 0 => dataset.repartitionByRange(n, key.asc)
      case _ => dataset.repartitionByRange(key.asc)
    }
    new GroupSortedDataset(repartitioned.sortWithinPartitions(key, valueSort), Some(valueSort), Some(dataset),
      None, reverse)
  }

  /**
   * Clone a fold/scan zero once per key via the executor's configured Spark
   * serializer, so mutable zero values (builders, buffers) are safe to reuse —
   * same guarantee the reference provides (`package.scala:175-182`). Falls back
   * to java serialization when no SparkEnv exists (pure unit tests).
   */
  private[graft] def zeroFactory[W: ClassTag](zero: W): () => W = {
    val env = SparkEnv.get
    if (env != null) {
      val buf = env.serializer.newInstance().serialize(zero)
      val bytes = new Array[Byte](buf.limit)
      buf.get(bytes)
      () => SparkEnv.get.serializer.newInstance().deserialize[W](ByteBuffer.wrap(bytes))
    } else {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(zero)
      oos.close()
      val bytes = bos.toByteArray
      () => new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes)).readObject().asInstanceOf[W]
    }
  }
}
