package graft.sorted

/**
 * Compile-time evidence selecting the physical path of the `mergeJoin` family
 * for key type `K`.
 *
 * The narrow 0-exchange `zipPartitions` merge needs an `Ordering[K]` that is
 * consistent with the layout's key sort; the shuffle-cogroup path needs
 * nothing. Historically `mergeJoin` took `implicit ordK: Ordering[K] = null`,
 * so a key type WITHOUT an Ordering in scope silently compiled to the
 * two-exchange cogroup plan. With this typeclass the compiler resolves which
 * instance applies — [[NarrowJoinSupport.narrow]] when an `Ordering[K]`
 * exists, the low-priority [[LowPriorityNarrowJoinSupport.cogroupFallback]]
 * otherwise — so the chosen path is an inspectable instance at the call site
 * (and [[GroupSortedDataset.canNarrowJoinWith]] reports it at runtime) rather
 * than a hidden `null` default. Callers who WANT the shuffle plan despite an
 * ordered key pass [[NarrowJoinSupport.cogroupOnly]] explicitly.
 */
sealed abstract class NarrowJoinSupport[K] extends Serializable {
  /** The layout-consistent key ordering when the narrow path is available;
    * `None` selects the always-correct shuffle-cogroup plan. */
  def keyOrdering: Option[Ordering[K]]
}

object NarrowJoinSupport extends LowPriorityNarrowJoinSupport {
  /** Narrow-path evidence, derived from any implicit `Ordering[K]`. */
  implicit def narrow[K](implicit ord: Ordering[K]): NarrowJoinSupport[K] =
    new NarrowJoinSupport[K] { val keyOrdering: Option[Ordering[K]] = Some(ord) }

  /** Explicit opt-out: force the cogroup path even when `K` is ordered. */
  def cogroupOnly[K]: NarrowJoinSupport[K] =
    new NarrowJoinSupport[K] { val keyOrdering: Option[Ordering[K]] = None }
}

trait LowPriorityNarrowJoinSupport {
  /** Fallback for key types with no `Ordering`: the cogroup path. Being
    * `LowPriority`, it never shadows [[NarrowJoinSupport.narrow]]. */
  implicit def cogroupFallback[K]: NarrowJoinSupport[K] = NarrowJoinSupport.cogroupOnly
}
