package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

import graft.sorted.GroupSortedDataset

/**
 * Sequence packing: fill fixed token-capacity context windows ("bins") with
 * document chunks — the step between chunking and batch assembly in an LLM
 * training pipeline, where short sequences are packed together so padding
 * doesn't dominate the batch.
 *
 * The packing rule is the classic greedy NEXT-FIT in deterministic order:
 * within each shard, chunks are visited in the group-sorted value order and
 * appended to the current bin; a chunk that would overflow `capacity` closes
 * the bin and opens the next. Next-fit is the rule production packers use at
 * scale because it is single-pass and streaming — optimal bin packing is
 * NP-hard and non-streaming, and next-fit wastes < one chunk per bin.
 *
 * SCALE SHAPE: one shuffle to establish the per-shard group-sorted layout
 * (the [[GroupSortedDataset]] invariant), then a single narrow streaming pass
 * with O(1) state per shard (current bin index + fill). Shards are the unit
 * of packing parallelism: bins never cross shards, so shard count trades off
 * packing locality vs parallelism, and a 100 TB corpus packs with
 * shards ≈ partitions, each task streaming its shard once.
 */
object Packing {

  /**
   * Greedy next-fit packing of `(docId, chunkIdx, nTokens)` values into bins
   * of at most `capacity` tokens, per shard key, in the established value
   * order. Emits `(docId, chunkIdx, nTokens, bin)` per chunk; `bin` is dense
   * from 0 within each shard. A chunk with `nTokens > capacity` occupies a
   * bin of its own (next-fit never splits a chunk — oversize chunks should
   * have been split by the chunker).
   */
  def packGreedy[K](gs: GroupSortedDataset[K, (Long, Long, Long)], capacity: Long)(
      implicit ew: Encoder[(Long, Long, Long, Long)]): Dataset[(K, (Long, Long, Long, Long))] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    gs.mapStreamByKey { vs =>
      var bin = 0L
      var fill = 0L
      vs.map { case (docId, chunkIdx, nTokens) =>
        if (fill > 0 && fill + nTokens > capacity) { bin += 1; fill = nTokens }
        else fill += nTokens
        (docId, chunkIdx, nTokens, bin)
      }
    }
  }
}
