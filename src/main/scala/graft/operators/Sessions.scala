package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

import graft.sorted.GroupSortedDataset

/**
 * Ordered-stream operators built on the group-sorted layout — showcases of
 * `mapStreamByKey` doing single-pass, O(1)-heap-per-key computations that SQL
 * window functions would need full sorts + multiple passes for.
 */
object Sessions {

  /**
   * Gap-based sessionization in one streaming pass per key: a new session
   * starts when the time gap to the previous row exceeds `gapTicks`.
   * Input: group-sorted (key, (ticks, ...)) with values in time order.
   * Returns one row per key with its session count.
   */
  def sessionCounts[K: Encoder, V](gs: GroupSortedDataset[K, V], ticksOf: V => Long, gapTicks: Long)(
      implicit el: Encoder[Long], ekl: Encoder[(K, Long)]): Dataset[(K, Long)] =
    gs.mapStreamByKey { vs =>
      var sessions = 0L
      var lastTick = Long.MinValue
      vs.foreach { v =>
        val t = ticksOf(v)
        if (lastTick == Long.MinValue || t - lastTick > gapTicks) sessions += 1
        lastTick = t
      }
      Iterator.single(sessions)
    }

  /**
   * Gap-based sessionization emitting the session INTERVALS, not just the
   * count: one (startTick, endTick, nEvents) row per closed session, in one
   * streaming pass with three Longs of state (the window formulation needs a
   * lag + running-sum + group-by chain over every row). The trailing open
   * session flushes when the key's values end — the lazily-concatenated
   * flush iterator evaluates only after the main pass exhausts, so the
   * state it reads is final.
   */
  def sessionIntervals[K: Encoder, V](gs: GroupSortedDataset[K, V], ticksOf: V => Long,
      gapTicks: Long)(implicit ew: Encoder[(Long, Long, Long)],
      ekw: Encoder[(K, (Long, Long, Long))]): Dataset[(K, (Long, Long, Long))] =
    gs.mapStreamByKey { vs =>
      var start = Long.MinValue
      var last = Long.MinValue
      var n = 0L
      val closed = vs.flatMap { v =>
        val t = ticksOf(v)
        val out =
          if (start != Long.MinValue && t - last > gapTicks) {
            val s = (start, last, n)
            start = t; n = 0L
            Iterator.single(s)
          } else {
            if (start == Long.MinValue) start = t
            Iterator.empty
          }
        last = t
        n += 1
        out
      }
      closed ++ (if (start != Long.MinValue) Iterator.single((start, last, n)) else Iterator.empty)
    }

  /**
   * Backward as-of match in one streaming pass: for every value selected by
   * `isTarget`, emit the most recent preceding value (in the established
   * value order) accepted by `isMarker`, or None when no marker has been
   * seen yet for that key. (Rows can be both marker and target; markers take
   * effect for SUBSEQUENT rows — the current row never matches itself.)
   */
  def asOfLastMarker[K: Encoder, V, W: Encoder](gs: GroupSortedDataset[K, V])(
      isTarget: V => Boolean, isMarker: V => Boolean, emit: (V, Option[V]) => W)(
      implicit ekw: Encoder[(K, W)]): Dataset[(K, W)] =
    gs.mapStreamByKey { vs =>
      var lastMarker: Option[V] = None
      vs.flatMap { v =>
        val out = if (isTarget(v)) Iterator.single(emit(v, lastMarker)) else Iterator.empty
        if (isMarker(v)) lastMarker = Some(v)
        out
      }
    }

  /**
   * Ordered FUNNEL progression in one streaming pass: scan each key's values
   * in the established order and advance one stage each time the CURRENT
   * stage's predicate accepts a value; emit how many stages completed
   * (0..stages.length). Greedy earliest-advance is exactly the classic
   * funnel semantics "first A, then the first B after it, then the first C
   * after that" — the SQL formulation is a chain of per-stage min-scans and
   * self-joins, one per stage, where this is a single pass with one Int of
   * state per key.
   */
  def funnelStages[K: Encoder, V](gs: GroupSortedDataset[K, V], stages: Seq[V => Boolean])(
      implicit el: Encoder[Long], ekl: Encoder[(K, Long)]): Dataset[(K, Long)] = {
    require(stages.nonEmpty, "funnelStages needs at least one stage predicate")
    gs.mapStreamByKey { vs =>
      var stage = 0
      vs.foreach { v => if (stage < stages.length && stages(stage)(v)) stage += 1 }
      Iterator.single(stage.toLong)
    }
  }

  /**
   * Time-to-convert in one streaming pass: for each key, the tick distance
   * from its FIRST value accepted by `isStart` to the first value accepted
   * by `isEnd` STRICTLY AFTER it (in the established order). Keys that never
   * start, or start but never convert, emit nothing — the output is the
   * converted population with its latency, ready for q67/q98-style
   * latency-quantile analysis downstream. One comparison + two Longs of
   * state per key.
   */
  def conversionLag[K: Encoder, V](gs: GroupSortedDataset[K, V])(
      isStart: V => Boolean, isEnd: V => Boolean, ticksOf: V => Long)(
      implicit el: Encoder[Long], ekl: Encoder[(K, Long)]): Dataset[(K, Long)] =
    gs.mapStreamByKey { vs =>
      var startTick = Long.MinValue
      var lag = Long.MinValue
      vs.foreach { v =>
        if (startTick == Long.MinValue) { if (isStart(v)) startTick = ticksOf(v) }
        else if (lag == Long.MinValue && isEnd(v)) lag = ticksOf(v) - startTick
      }
      if (lag != Long.MinValue) Iterator.single(lag) else Iterator.empty
    }

  /**
   * Adjacent-pair emission in the established value order — the raw material
   * of transition matrices and bigram behavior models: for each key, emit
   * `emit(prev, next)` for every consecutive value pair, in one streaming
   * pass with one value of look-behind state (a `lag` window would sort and
   * materialize every key's rows; this rides the group-sorted layout).
   * Keys with fewer than two values emit nothing.
   */
  def adjacentPairs[K: Encoder, V, W: Encoder](gs: GroupSortedDataset[K, V])(
      emit: (V, V) => W)(implicit ekw: Encoder[(K, W)]): Dataset[(K, W)] =
    gs.mapStreamByKey { vs =>
      var prev: Option[V] = None
      vs.flatMap { v =>
        val out = prev match {
          case Some(p) => Iterator.single(emit(p, v))
          case None => Iterator.empty
        }
        prev = Some(v)
        out
      }
    }
}
