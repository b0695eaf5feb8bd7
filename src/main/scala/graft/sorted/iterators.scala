package graft.sorted

import scala.annotation.tailrec

/**
 * Pure iterator utilities for streaming over key-runs.
 *
 * All functions here assume the input iterator yields rows whose keys arrive in
 * *runs*: every row for a given key is consecutive. This is the layout invariant
 * produced by `repartition(key).sortWithinPartitions(key, ...)`.
 *
 * Semantics re-expressed from the reference library (tresata/spark-sorted,
 * `src/main/scala/com/tresata/spark/sorted/package.scala:12-182`):
 *  - a per-key user function receives a *lazy* sub-iterator over the key's values;
 *    the group is never materialized;
 *  - the user function need not exhaust its sub-iterator — leftover values are
 *    drained before the next key starts;
 *  - keys whose output is empty are skipped immediately so they cannot starve
 *    later keys (reference issue #5);
 *  - merge-join / merge-union verify input sortedness with assertions.
 *
 * Everything in this object is Spark-free and property-testable in isolation.
 */
object iterators {

  /** Streams `f` over each key-run. `ctx` is built once per call (i.e. once per
    * partition when used inside `mapPartitions`) and handed to every key — useful
    * for reusable mutable buffers. */
  def mapStreamWithContext[K, V, W, C](rows: Iterator[(K, V)])(ctx: () => C, f: (C, Iterator[V]) => IterableOnce[W]): Iterator[(K, W)] =
    new Iterator[(K, W)] {
      private val in = rows.buffered
      private val c: C = ctx()
      private var out: Iterator[(K, W)] = Iterator.empty
      private var drainRun: () => Unit = () => ()

      // Advance until `out` has an element or input is exhausted. Empty-output
      // keys are rolled past right here, never surfaced.
      @tailrec private def advance(): Boolean =
        if (out.hasNext) true
        else {
          drainRun() // exhaust any values f left unconsumed
          if (!in.hasNext) false
          else {
            val key = in.head._1
            val run: Iterator[V] = new Iterator[V] {
              def hasNext: Boolean = in.hasNext && in.head._1 == key
              def next(): V =
                if (hasNext) in.next()._2
                else throw new NoSuchElementException("value run exhausted")
            }
            out = f(c, run).iterator.map(w => (key, w))
            drainRun = () => while (run.hasNext) run.next()
            advance()
          }
        }

      def hasNext: Boolean = advance()
      def next(): (K, W) =
        if (advance()) out.next()
        else throw new NoSuchElementException("next on empty iterator")
    }

  /** Context-free variant. */
  def mapStream[K, V, W](rows: Iterator[(K, V)])(f: Iterator[V] => IterableOnce[W]): Iterator[(K, W)] =
    mapStreamWithContext[K, V, W, Unit](rows)(() => (), (_, vs) => f(vs))

  /**
   * Sort-merge cogroup of two key-run iterators, both sorted by key under `ord`
   * (repeated keys allowed, consecutive). For every key present on either side,
   * `f` is invoked with the (possibly empty) value runs of both sides; output is
   * streamed. Asserts that keys are strictly increasing run-to-run. Keys must be
   * non-null.
   */
  def mergeJoin[K, A, B, W](left: Iterator[(K, A)], right: Iterator[(K, B)])(f: (Iterator[A], Iterator[B]) => IterableOnce[W])(implicit ord: Ordering[K]): Iterator[(K, W)] =
    new Iterator[(K, W)] {
      private val l = left.buffered
      private val r = right.buffered
      private var haveKey = false
      private var key: K = _
      private var lastKey: Option[K] = None
      private var out: Iterator[W] = Iterator.empty

      private def runOf[V](k: K, it: scala.collection.BufferedIterator[(K, V)]): Iterator[V] =
        new Iterator[V] {
          def hasNext: Boolean = it.hasNext && it.head._1 == k
          def next(): V =
            if (hasNext) it.next()._2
            else throw new NoSuchElementException("value run exhausted")
        }

      private def skipRun[V](k: K, it: scala.collection.BufferedIterator[(K, V)]): Unit =
        while (it.hasNext && it.head._1 == k) it.next()

      @tailrec private def advance(): Boolean =
        if (out.hasNext) true
        else {
          if (haveKey) { // finished emitting for `key`: drain both runs
            skipRun(key, l); skipRun(key, r)
            lastKey = Some(key)
            haveKey = false
          }
          if (!l.hasNext && !r.hasNext) false
          else {
            key =
              if (!r.hasNext) l.head._1
              else if (!l.hasNext) r.head._1
              else ord.min(l.head._1, r.head._1)
            lastKey.foreach { prev =>
              assert(ord.lt(prev, key), s"input not sorted by key: $prev !< $key")
            }
            haveKey = true
            out = f(runOf(key, l), runOf(key, r)).iterator
            advance()
          }
        }

      def hasNext: Boolean = advance()
      def next(): (K, W) =
        if (advance()) (key, out.next())
        else throw new NoSuchElementException("next on empty iterator")
    }

  /** Full-outer per-key combiner: streams the left run, buffers the right run
    * (one key's worth) — the many-to-many caveat of a streaming merge join. */
  def outerProduct[A, B]: (Iterator[A], Iterator[B]) => IterableOnce[(Option[A], Option[B])] = {
    (as, bs) =>
      if (!as.hasNext) bs.map(b => (None, Some(b)))
      else if (!bs.hasNext) as.map(a => (Some(a), None))
      else {
        val buf = bs.toBuffer
        as.flatMap(a => buf.iterator.map(b => (Some(a), Some(b))))
      }
  }

  /** Left-outer per-key combiner: a key with an empty LEFT run emits nothing
    * outright — unlike filtering [[outerProduct]]'s output, no discarded
    * `(None, Some(w))` tuples are ever allocated for right-only keys. An
    * empty right run emits `(v, None)` per left value. `bufferLeft` flips
    * which side is buffered per key (buffer the side you know is small —
    * the reference's many-to-many discipline, `README.md:39`). */
  def leftOuterProduct[A, B](bufferLeft: Boolean = false): (Iterator[A], Iterator[B]) => IterableOnce[(A, Option[B])] = {
    (as, bs) =>
      if (!as.hasNext) Iterator.empty
      else if (!bs.hasNext) as.map(a => (a, None))
      else if (bufferLeft) {
        val buf = as.toBuffer
        bs.flatMap(b => buf.iterator.map(a => (a, Some(b))))
      } else {
        val buf = bs.toBuffer
        as.flatMap(a => buf.iterator.map(b => (a, Some(b))))
      }
  }

  /** Right-outer mirror of [[leftOuterProduct]] (left-only keys emit
    * nothing, allocation-free). */
  def rightOuterProduct[A, B](bufferLeft: Boolean = false): (Iterator[A], Iterator[B]) => IterableOnce[(Option[A], B)] =
    (as, bs) => leftOuterProduct[B, A](!bufferLeft)(bs, as).iterator.map(_.swap)

  /** Inner per-key combiner: only keys present on both sides emit. */
  def innerProduct[A, B]: (Iterator[A], Iterator[B]) => IterableOnce[(A, B)] = {
    (as, bs) =>
      if (!as.hasNext || !bs.hasNext) Iterator.empty
      else {
        val buf = bs.toBuffer
        as.flatMap(a => buf.iterator.map(b => (a, b)))
      }
  }

  /** Flip which side a per-key combiner buffers (and un-flip its output). */
  def flipped[A, B, X, Y](f: (Iterator[B], Iterator[A]) => IterableOnce[(Y, X)]): (Iterator[A], Iterator[B]) => IterableOnce[(X, Y)] =
    (as, bs) => f(bs, as).iterator.map(_.swap)

  /**
   * Order-preserving 2-way merge of two iterators each sorted under `ord`
   * (ties broken toward the left input). Verifies sortedness of both inputs as
   * it goes; safe with partial orderings and repeated elements.
   */
  def mergeUnion[X](left: Iterator[X], right: Iterator[X])(implicit ord: Ordering[X]): Iterator[X] =
    new Iterator[X] {
      private val l = left.buffered
      private val r = right.buffered
      private var prevL: Option[X] = None
      private var prevR: Option[X] = None

      def hasNext: Boolean = l.hasNext || r.hasNext
      def next(): X = {
        val takeLeft = l.hasNext && (!r.hasNext || ord.lteq(l.head, r.head))
        if (takeLeft) {
          val x = l.next()
          prevL.foreach(p => assert(ord.lteq(p, x), s"left input not sorted: $p !<= $x"))
          prevL = Some(x)
          x
        } else {
          val x = r.next()
          prevR.foreach(p => assert(ord.lteq(p, x), s"right input not sorted: $p !<= $x"))
          prevR = Some(x)
          x
        }
      }
    }
}
