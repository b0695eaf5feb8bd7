package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sorted.syntax._

/**
 * SFT / CONVERSATION-FORMAT ASSEMBLY — the supervised-fine-tuning last
 * mile the pretraining shard path (q237/q243) does not cover: role-tagged
 * multi-turn records with PER-TOKEN LOSS MASKS, so a trainer computes
 * loss only on the spans it is supposed to imitate (assistant turns) and
 * never on boilerplate (system prompts, user inputs, role tags).
 *
 * Record layout per conversation, turns in `turn_idx` order:
 * `[roleId(t1), ids(t1)..., roleId(t2), ids(t2)..., ...]` where each
 * turn's ids are its tokenized content INCLUDING the trailing EOS (the
 * [[TokenShards.tokenizeToIds]] shape — EOS doubles as end-of-turn, the
 * boundary a chat model must learn to emit). The mask is positionally
 * aligned: role-tag tokens are ALWAYS 0; a turn's content+EOS tokens are
 * 1 iff its role is trainable (loss on the assistant's EOS is what
 * teaches stopping). Role ids are caller-allocated above the standing
 * vocabulary — the [[TokenShards.fimTransform]] sentinel discipline —
 * and a collision with any content id fails per-turn, loudly.
 *
 * SCALE SHAPE: ONE group-sort exchange (conversation key, turn order) and
 * a streaming per-key assembly — the [[graft.sorted]] layout, no Window,
 * no collect; conversations are record-sized by nature, so per-key state
 * is one record. Output: `(conv_id, n_turns, ids, mask, n_tokens,
 * n_trainable)`, exportable through the existing staged shard writers.
 */
object Sft {

  def assembleConversations(turnTokens: DataFrame, roleIds: Map[String, Long],
      trainableRoles: Set[String]): DataFrame = {
    require(roleIds.nonEmpty, "roleIds must name at least one role")
    require(roleIds.values.toSeq.distinct.size == roleIds.size &&
      roleIds.values.forall(_ >= TokenShards.totalFirstSymbolId),
      s"role ids must be distinct and at/above ${TokenShards.totalFirstSymbolId} " +
        "(above the standing vocabulary's max id)")
    require(trainableRoles.subsetOf(roleIds.keySet),
      s"trainable roles ${trainableRoles -- roleIds.keySet} have no role id")
    val spark = turnTokens.sparkSession
    import spark.implicits._
    val sentinelIds = roleIds.values.toSet
    val kv = turnTokens.select(col("conv_id").cast("long").as("_1"),
        struct(col("turn_idx").cast("long").as("turn_idx"),
          col("role").cast("string").as("role"), col("ids")).as("_2"))
      .as[(Long, (Long, String, Seq[Long]))]
    kv.groupSort(sortBy = _.getField("turn_idx"))
      .mapStreamByKey { vs =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val mask = scala.collection.mutable.ArrayBuffer.empty[Long]
        var nTurns = 0L
        var prevIdx = Long.MinValue
        vs.foreach { case (idx, role, turnIds) =>
          require(idx != prevIdx,
            s"duplicate turn_idx $idx — the conversation order is ill-defined")
          prevIdx = idx
          val roleId = roleIds.getOrElse(role,
            throw new IllegalArgumentException(
              s"unknown role '$role' — every turn's role needs a role id"))
          require(turnIds.nonEmpty && turnIds.last == TokenShards.eosId,
            s"turn $idx: ids must be EOS-terminated (the tokenizeToIds shape)")
          require(!turnIds.exists(sentinelIds.contains),
            s"turn $idx carries a role-sentinel id — allocate roles above the vocabulary")
          val m = if (trainableRoles.contains(role)) 1L else 0L
          ids += roleId; mask += 0L
          ids ++= turnIds; mask ++= Seq.fill(turnIds.length)(m)
          nTurns += 1L
        }
        Iterator.single((nTurns, ids.toSeq, mask.toSeq,
          ids.length.toLong, mask.count(_ == 1L).toLong))
      }
      .map { case (conv, (nTurns, ids, mask, nTok, nTrain)) =>
        (conv, nTurns, ids, mask, nTok, nTrain)
      }
      .toDF("conv_id", "n_turns", "ids", "mask", "n_tokens", "n_trainable")
  }
}
