package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

import graft.sorted.GroupSortedDataset

/**
 * Backward as-of join of two group-sorted sides (the trades/quotes shape):
 * for every left row, the most recent right row of the same key whose
 * timestamp is <= the left row's — or None when no right row precedes.
 *
 * Built on the generalized streaming mergeJoin: both value iterators arrive
 * in their established (time-ascending) order, so one forward pass with a
 * single buffered element of lookahead does the whole key — O(1) state, no
 * group materialization, no window re-sort. This is an operator Spark SQL
 * lacks natively (the usual workaround is join + row_number window, which
 * materializes and re-sorts every candidate pair).
 */
object AsOf {

  /**
   * @param tsL  event time of a left value (must match the left value order)
   * @param tsR  event time of a right value (must match the right value order)
   * @param emit combine a left value with its as-of match (None = none yet)
   */
  def asOfJoin[K: Encoder, L, R, W: Encoder](left: GroupSortedDataset[K, L], right: GroupSortedDataset[K, R])(
      tsL: L => Long, tsR: R => Long, emit: (L, Option[R]) => W)(
      implicit ekw: Encoder[(K, W)]): Dataset[(K, W)] =
    left.mergeJoin(right) { (ls, rs) =>
      val rb = rs.buffered
      var last: Option[R] = None
      var prevL = Long.MinValue
      var prevR = Long.MinValue
      ls.map { l =>
        val t = tsL(l)
        // the single-pass merge is only correct when both sides arrive in
        // ascending extracted-timestamp order (i.e. the groupSort value sort
        // matches tsL/tsR); turn a violated precondition into a failure
        // instead of silently wrong matches
        assert(t >= prevL, s"asOfJoin: left values not ascending by timestamp ($prevL then $t)")
        prevL = t
        while (rb.hasNext && tsR(rb.head) <= t) {
          val r = rb.next()
          val tr = tsR(r)
          assert(tr >= prevR, s"asOfJoin: right values not ascending by timestamp ($prevR then $tr)")
          prevR = tr
          last = Some(r)
        }
        emit(l, last)
      }
    }
}
