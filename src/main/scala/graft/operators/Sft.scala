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

  /**
   * DPO/RLHF PREFERENCE-PAIR ASSEMBLY — the training-format last mile for
   * preference optimization: each pair carries one prompt and two
   * responses (chosen beats rejected), and the trainer needs BOTH
   * branches laid out as `[shared prompt tail, response..., EOS]` with a
   * positionally-aligned loss mask (prompt tokens 0, response+EOS tokens
   * 1 — the DPO log-prob sums run over the response span only).
   *
   * All three inputs are EOS-terminated (the
   * [[TokenShards.tokenizeToIds]] shape); the prompt's EOS never ships —
   * the prompt flows INTO the response. Truncation is the standard
   * preference-data policy: the prompt truncates from the LEFT (its tail
   * is what conditions the response) until `prompt + longer response`
   * fits `maxLen`, and BOTH branches share the identical kept prompt —
   * branch-asymmetric truncation would silently corrupt the DPO loss
   * (the pair must differ only in the response). A pair whose longer
   * response alone exceeds `maxLen` cannot be truncated into validity:
   * it emits `valid = false` with empty sequences so callers count and
   * filter, never a silently-clipped response.
   *
   * SCALE SHAPE: one narrow typed pass — per-row arithmetic, no
   * exchange, the token payload never moves.
   */
  def preferencePairs(pairs: DataFrame, maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("pair_id").cast("long"), col("prompt_ids"),
        col("chosen_ids"), col("rejected_ids"))
      .as[(Long, Seq[Long], Seq[Long], Seq[Long])]
      .map { case (id, prompt, chosen, rejected) =>
        def checkEos(name: String, ids: Seq[Long]): Unit =
          require(ids != null && ids.nonEmpty && ids.last == TokenShards.eosId,
            s"pair $id: $name ids must be EOS-terminated (the tokenizeToIds shape)")
        checkEos("prompt", prompt); checkEos("chosen", chosen); checkEos("rejected", rejected)
        val p = prompt.length - 1
        val (c, r) = (chosen.length, rejected.length)
        val keep = math.min(p, maxLen - math.max(c, r))
        if (keep < 0)
          (id, false, 0L, Seq.empty[Long], Seq.empty[Long],
            Seq.empty[Long], Seq.empty[Long])
        else {
          val kept = prompt.slice(p - keep, p)
          (id, true, keep.toLong,
            kept ++ chosen, Seq.fill(keep)(0L) ++ Seq.fill(c)(1L),
            kept ++ rejected, Seq.fill(keep)(0L) ++ Seq.fill(r)(1L))
        }
      }
      .toDF("pair_id", "valid", "prompt_kept", "chosen_seq", "chosen_mask",
        "rejected_seq", "rejected_mask")
  }

  /**
   * Inverse of [[assembleConversations]]: parse each record's
   * `[roleId, content..., EOS]*` frame back into per-turn rows
   * `(conv_id, turn_idx, role, text)`, detokenizing turn content
   * through the total scheme ([[TokenShards.detokenizeTotal]] — byte
   * runs decode strictly). The inspection/audit face of the SFT
   * artifact: overlap probes, PII re-scans, and eyeballing all need
   * TEXT back out of a published record, and the role-id framing is
   * what a vocab-only decoder would choke on. Malformed framing (a
   * segment whose leading id is not a role id — including an empty
   * segment, whose "role" is the EOS itself — or a role id INSIDE turn
   * content) fails loudly: it marks a foreign or torn artifact, never a
   * silent mis-parse. One narrow typed pass.
   */
  def decodeConversations(records: DataFrame, idToSymbol: Map[Long, String],
      roleNames: Map[Long, String]): DataFrame = {
    require(roleNames.nonEmpty, "roleNames must name at least one role id")
    val spark = records.sparkSession
    import spark.implicits._
    val bcSym = spark.sparkContext.broadcast(idToSymbol)
    val bcRole = spark.sparkContext.broadcast(roleNames)
    records.select(col("conv_id").cast("long"), col("ids"))
      .as[(Long, Seq[Long])]
      .flatMap { case (conv, ids) =>
        val roles = bcRole.value
        val syms = bcSym.value
        require(ids != null && ids.nonEmpty && ids.last == TokenShards.eosId,
          s"conversation $conv: record must be EOS-terminated")
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, String)]
        var turn = 0L
        var i = 0
        while (i < ids.length) {
          val e = ids.indexOf(TokenShards.eosId, i)
          val role = roles.getOrElse(ids(i), throw new IllegalArgumentException(
            s"conversation $conv turn $turn: leading id ${ids(i)} is not a role id — " +
              "foreign or torn record"))
          val content = ids.slice(i + 1, e)
          require(!content.exists(roles.contains),
            s"conversation $conv turn $turn: role id inside turn content — torn record")
          out += ((conv, turn, role, TokenShards.detokenizeTotal(content, syms)))
          turn += 1
          i = e + 1
        }
        out
      }
      .toDF("conv_id", "turn_idx", "role", "text")
  }

  /**
   * PREFERENCE-JUDGMENT CONSISTENCY AUDIT — the data-QA pass reward-model
   * and DPO corpora need before training: pairwise judgments inside a
   * prompt group should form a partial order, and the two ways they fail
   * are DIRECT CONTRADICTIONS (the same pair judged in both directions)
   * and 3-CYCLES (A beats B beats C beats A — no consistent ranking
   * exists, so a Bradley-Terry/DPO fit is being asked to explain noise).
   * Input: `(group_id, winner, loser)` judgment edges; output per group:
   * edge/cycle/contradiction counts and a `consistent` verdict, the
   * drop/re-judge shortlist.
   *
   * Duplicate same-direction judgments are legitimate (multiple
   * annotators agree); a contradiction counts once per OPPOSING VOTE
   * PAIR (multiplicity product), which is exactly the mass a
   * majority-vote resolution would have to discard. Each directed
   * 3-cycle counts once, at its minimum vertex.
   *
   * SCALE SHAPE: every join keys on `(group_id, vertex)` — judgments
   * only compare within a prompt group, so candidate mass is bounded by
   * the group's own edge count and the triangle join never leaves the
   * group. (A single global tournament would make `group_id` a skew key;
   * the within-group contract IS the partitioning contract.)
   */
  def preferenceCycles(edges: DataFrame): DataFrame = {
    // The contract check rides a SEPARATE aggregate branch, not a per-row
    // assert in the main plan: a filter assert's conjunct can be pushed
    // into an upstream join and evaluate before that join's own
    // predicates (conjunct order is undefined), and even a
    // projection-level guard gets SUBSTITUTED into pushed-down filters
    // by the optimizer (both observed on this very plan) — firing on
    // rows the source join would have dropped. A one-row violation
    // count cross-joined into the output keeps the hot path codegen'd
    // and still fails the action loudly before any result is trusted.
    val e = edges.select(col("group_id").cast("long"),
      col("winner").cast("long"), col("loser").cast("long"))
    val bad = e.agg(sum(when(col("winner").isNull || col("loser").isNull ||
      col("winner") === col("loser"), 1L).otherwise(0L)).as("__n_bad"))
    val stats = e.groupBy(col("group_id")).agg(count(lit(1)).as("n_edges"))
    val ab = e.toDF("group_id", "a", "b")
    val bc = e.toDF("group_id", "b", "c")
    val ca = e.toDF("group_id", "c", "a0")
    val cyc = ab.join(bc, Seq("group_id", "b"))
      .join(ca, Seq("group_id", "c"))
      .where(col("a0") === col("a") && col("a") < col("b") && col("a") < col("c"))
      .groupBy(col("group_id")).agg(count(lit(1)).as("n_cycles"))
    val rev = e.select(col("group_id"),
      col("loser").as("winner"), col("winner").as("loser"))
    val con = e.join(rev, Seq("group_id", "winner", "loser"))
      .where(col("winner") < col("loser"))
      .groupBy(col("group_id")).agg(count(lit(1)).as("n_contradictions"))
    stats.join(cyc, Seq("group_id"), "left").join(con, Seq("group_id"), "left")
      .crossJoin(broadcast(bad))
      .where(expr("assert_true(__n_bad = 0, " +
        "'preferenceCycles: a self- or null-preference is meaningless') IS NULL"))
      .select(col("group_id"), col("n_edges"),
        coalesce(col("n_cycles"), lit(0L)).as("n_cycles"),
        coalesce(col("n_contradictions"), lit(0L)).as("n_contradictions"))
      .withColumn("consistent",
        col("n_cycles") === 0L && col("n_contradictions") === 0L)
  }

  /**
   * MAJORITY-VOTE RESOLUTION — the repair step after
   * [[preferenceCycles]] names the defects: multi-annotator judgments
   * collapse to one edge per unordered pair by net vote margin. A tied
   * pair is UNRESOLVABLE (`resolved = false`, winner/loser pinned to
   * (lo, hi) deterministically so the frame stays engine-replayable) —
   * callers must filter on `resolved` before training. Resolution
   * eliminates contradictions BY CONSTRUCTION (one direction survives
   * per pair); it can NOT eliminate majority cycles — the Condorcet
   * paradox is real data, not a bug — so the residual
   * [[preferenceCycles]] pass over the resolved set is what names the
   * groups still needing exclusion or re-judging.
   *
   * Output per (group_id, lo, hi): `(winner, loser, n_votes, margin,
   * resolved)`. One hash aggregation on (group, pair); the same
   * aggregate-branch input contract as [[preferenceCycles]].
   */
  def resolvePreferences(edges: DataFrame): DataFrame = {
    val e = edges.select(col("group_id").cast("long"),
      col("winner").cast("long"), col("loser").cast("long"))
    val bad = e.agg(sum(when(col("winner").isNull || col("loser").isNull ||
      col("winner") === col("loser"), 1L).otherwise(0L)).as("__n_bad"))
    e.select(col("group_id"),
        least(col("winner"), col("loser")).as("lo"),
        greatest(col("winner"), col("loser")).as("hi"),
        when(col("winner") < col("loser"), 1L).otherwise(-1L).as("__d"))
      .groupBy(col("group_id"), col("lo"), col("hi"))
      .agg(sum(col("__d")).as("__net"), count(lit(1)).as("n_votes"))
      .crossJoin(broadcast(bad))
      .where(expr("assert_true(__n_bad = 0, " +
        "'resolvePreferences: a self- or null-preference is meaningless') IS NULL"))
      .select(col("group_id"), col("lo"), col("hi"),
        when(col("__net") >= 0, col("lo")).otherwise(col("hi")).as("winner"),
        when(col("__net") >= 0, col("hi")).otherwise(col("lo")).as("loser"),
        col("n_votes"), abs(col("__net")).as("margin"),
        (col("__net") =!= 0L).as("resolved"))
  }

  /**
   * Pack whole masked records (SFT conversations, preference branches)
   * into capacity-bounded training bins WITHOUT splitting a record — an
   * SFT example must never tear across a bin (its loss mask is
   * record-scoped and its attention boundary is the record) — carrying
   * the per-token loss mask through the pack positionally intact.
   *
   * ONE packer implementation keeps the next-fit semantics in one place:
   * the mask bit rides each id's LOW BIT through
   * [[TokenShards.packSequences]] (`id*2 + m`) and unzips after — exact
   * integer arithmetic (any real vocabulary id stays far under 2^62).
   * Alignment and bit-ness are enforced in-plan BEFORE the ride-along; a
   * malformed mask fails loudly instead of corrupting ids. Input:
   * `(idCol, n_tokens, ids, mask)`; output: the packSequences bin frame
   * plus the positionally-reassembled `mask` column.
   */
  def packMaskedSequences(records: DataFrame, idCol: String, nShards: Int,
      capacity: Long): DataFrame = {
    val checked = records.where(expr(
      "assert_true(ids IS NOT NULL AND mask IS NOT NULL AND " +
        "size(ids) = size(mask) AND " +
        "size(filter(mask, m -> m != 0 AND m != 1)) = 0, " +
        "'packMaskedSequences: mask must align with ids and hold only bits') IS NULL"))
    val zipped = checked.select(col(idCol), col("n_tokens"),
      zip_with(col("ids"), col("mask"), (i, m) => i * lit(2L) + m).as("ids"))
    TokenShards.packSequences(zipped, idCol, nShards, capacity)
      .select(col("shard"), col("bin"), col("doc_ids"), col("doc_lens"),
        transform(col("ids"), x => shiftright(x, 1)).as("ids"),
        transform(col("ids"), x => x.bitwiseAND(lit(1L))).as("mask"),
        col("n_docs"), col("n_tokens"))
  }
}
