package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.SparkSuite

class SftSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  private val roles = Map("system" -> 900L, "user" -> 901L, "assistant" -> 902L)

  describe("Sft.assembleConversations") {

    it("assembles the HAND-PINNED conversation exactly: ids, mask, counts") {
      // the mask law, pinned position by position: role tags always 0,
      // assistant content+EOS 1 (loss on the assistant's EOS teaches
      // stopping), everything else 0
      val turns = Seq(
        (1L, 0L, "system", Seq(300L, 0L)),
        (1L, 1L, "user", Seq(301L, 302L, 0L)),
        (1L, 2L, "assistant", Seq(303L, 0L)))
        .toDF("conv_id", "turn_idx", "role", "ids")
      val got = Sft.assembleConversations(turns, roles, Set("assistant"))
        .as[(Long, Long, Seq[Long], Seq[Long], Long, Long)].head()
      assert(got._1 == 1L && got._2 == 3L)
      assert(got._3 == Seq(900L, 300L, 0L, 901L, 301L, 302L, 0L, 902L, 303L, 0L))
      assert(got._4 == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 1L))
      assert(got._5 == 10L && got._6 == 2L)
    }

    it("turn order comes from turn_idx, not input order; layout-invariant") {
      val turns = Seq(
        (5L, 2L, "assistant", Seq(310L, 0L)),
        (5L, 0L, "system", Seq(311L, 0L)),
        (5L, 1L, "user", Seq(312L, 0L)),
        (6L, 1L, "assistant", Seq(313L, 314L, 0L)),
        (6L, 0L, "user", Seq(315L, 0L)))
        .toDF("conv_id", "turn_idx", "role", "ids")
      val a = Sft.assembleConversations(turns, roles, Set("assistant"))
        .as[(Long, Long, Seq[Long], Seq[Long], Long, Long)].collect().sortBy(_._1)
      val b = Sft.assembleConversations(turns.repartition(7), roles, Set("assistant"))
        .as[(Long, Long, Seq[Long], Seq[Long], Long, Long)].collect().sortBy(_._1)
      assert(a.toSeq == b.toSeq)
      assert(a(0)._3 == Seq(900L, 311L, 0L, 901L, 312L, 0L, 902L, 310L, 0L))
      assert(a(1)._3 == Seq(901L, 315L, 0L, 902L, 313L, 314L, 0L))
      assert(a(1)._4 == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L))
      // mask/ids are always the same length; trainable count matches
      a.foreach(r => assert(r._3.length == r._4.length && r._6 == r._4.count(_ == 1L)))
    }

    it("contracts are loud: duplicate turn_idx, unknown role, unterminated turn, " +
       "sentinel collision, malformed role map") {
      def run(rows: Seq[(Long, Long, String, Seq[Long])]) =
        Sft.assembleConversations(
          rows.toDF("conv_id", "turn_idx", "role", "ids"), roles, Set("assistant"))
          .collect()
      val ok = Seq((1L, 0L, "user", Seq(300L, 0L)))
      assert(run(ok).length == 1)
      intercept[org.apache.spark.SparkException](
        run(ok ++ Seq((1L, 0L, "user", Seq(301L, 0L)))))
      intercept[org.apache.spark.SparkException](
        run(Seq((1L, 0L, "robot", Seq(300L, 0L)))))
      intercept[org.apache.spark.SparkException](
        run(Seq((1L, 0L, "user", Seq(300L)))))
      intercept[org.apache.spark.SparkException](
        run(Seq((1L, 0L, "user", Seq(901L, 0L)))))
      intercept[IllegalArgumentException](
        Sft.assembleConversations(ok.toDF("conv_id", "turn_idx", "role", "ids"),
          Map("user" -> 3L), Set.empty))
      intercept[IllegalArgumentException](
        Sft.assembleConversations(ok.toDF("conv_id", "turn_idx", "role", "ids"),
          roles, Set("assistant", "robot")))
    }
  }

  describe("Sft.preferencePairs") {
    def assemble(rows: Seq[(Long, Seq[Long], Seq[Long], Seq[Long])],
        maxLen: Int) =
      Sft.preferencePairs(
        rows.toDF("pair_id", "prompt_ids", "chosen_ids", "rejected_ids"), maxLen)

    it("assembles the HAND-PINNED pair exactly: shared prompt, masks, no truncation") {
      val got = assemble(Seq(
        (7L, Seq(300L, 301L, 0L), Seq(302L, 0L), Seq(303L, 304L, 0L))), maxLen = 10)
        .as[(Long, Boolean, Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long])].head()
      assert(got._1 == 7L && got._2 && got._3 == 2L)
      assert(got._4 == Seq(300L, 301L, 302L, 0L)) // prompt EOS never ships
      assert(got._5 == Seq(0L, 0L, 1L, 1L))       // loss on response + its EOS only
      assert(got._6 == Seq(300L, 301L, 303L, 304L, 0L))
      assert(got._7 == Seq(0L, 0L, 1L, 1L, 1L))
    }

    it("left-truncates the prompt to fit the LONGER response; both branches " +
       "share the identical kept prompt; an unfittable response invalidates") {
      val rows = Seq(
        // p=3, c=2, r=3, maxLen=5: keep = min(3, 5-3) = 2, prompt TAIL kept
        (1L, Seq(10L, 11L, 12L, 0L), Seq(20L, 0L), Seq(30L, 31L, 0L)),
        // longer response 6 > maxLen 5 -> invalid, empty sequences
        (2L, Seq(10L, 0L), Seq(20L, 21L, 22L, 23L, 24L, 0L), Seq(30L, 0L)),
        // keep = 0 is legal: the whole prompt truncates away
        (3L, Seq(10L, 11L, 0L), Seq(20L, 21L, 22L, 23L, 0L), Seq(30L, 0L)))
      val got = assemble(rows, maxLen = 5)
        .as[(Long, Boolean, Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long])]
        .collect().sortBy(_._1)
      assert(got(0)._4 == Seq(11L, 12L, 20L, 0L) && got(0)._3 == 2L)
      assert(got(0)._6 == Seq(11L, 12L, 30L, 31L, 0L))
      assert(got(0)._4.take(2) == got(0)._6.take(2)) // identical kept prompt
      assert(!got(1)._2 && got(1)._4.isEmpty && got(1)._6.isEmpty)
      assert(got(2)._2 && got(2)._3 == 0L && got(2)._4 == Seq(20L, 21L, 22L, 23L, 0L))
      // partitioning-invariant (pure per-row transform)
      assert(assemble(rows, maxLen = 5).collect().toSet ===
        Sft.preferencePairs(rows.toDF("pair_id", "prompt_ids", "chosen_ids",
          "rejected_ids").repartition(7), 5).collect().toSet)
    }

    it("contracts are loud: unterminated inputs and a degenerate maxLen") {
      val ok = Seq((1L, Seq(10L, 0L), Seq(20L, 0L), Seq(30L, 0L)))
      assert(assemble(ok, 10).collect().length == 1)
      intercept[org.apache.spark.SparkException](
        assemble(Seq((1L, Seq(10L), Seq(20L, 0L), Seq(30L, 0L))), 10).collect())
      intercept[org.apache.spark.SparkException](
        assemble(Seq((1L, Seq(10L, 0L), Seq.empty[Long], Seq(30L, 0L))), 10).collect())
      intercept[IllegalArgumentException](assemble(ok, 0))
    }
  }

  describe("Sft.decodeConversations (with TokenShards.splitBinsByLens)") {
    // tiny total-scheme world: symbol 300 -> "lo", 301 -> "w"; roles 900/901
    val syms = Map(300L -> "lo", 301L -> "w")
    val roles2 = Map(900L -> "user", 901L -> "assistant")

    it("parses the [roleId, content..., EOS]* frame back to per-turn text, " +
       "surviving the pack/split round trip") {
      val records = Seq(
        // user: "lo w" ; assistant: "w"
        (1L, Seq(900L, 300L, 1L, 301L, 0L, 901L, 301L, 0L)),
        (2L, Seq(901L, 300L, 0L)))
        .toDF("conv_id", "ids")
      val got = Sft.decodeConversations(records, syms, roles2)
        .as[(Long, Long, String, String)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq === Seq(
        (1L, 0L, "user", "lo w"), (1L, 1L, "assistant", "w"),
        (2L, 0L, "assistant", "lo")))
      // through the masked packer and the lens-based splitter (records
      // carry INTERIOR EOS, so the EOS-split decodeBins contract cannot
      // apply — doc_lens tiling is what recovers them)
      val withMask = records.select(col("conv_id"),
        org.apache.spark.sql.functions.size(col("ids")).cast("long").as("n_tokens"),
        col("ids"), org.apache.spark.sql.functions.transform(col("ids"),
          _ => org.apache.spark.sql.functions.lit(0L)).as("mask"))
      val bins = Sft.packMaskedSequences(withMask, "conv_id", 1, 100L)
      val split = TokenShards.splitBinsByLens(bins)
        .withColumnRenamed("doc_id", "conv_id")
      val again = Sft.decodeConversations(split, syms, roles2)
        .as[(Long, Long, String, String)].collect().sortBy(r => (r._1, r._2))
      assert(again.toSeq === got.toSeq)
    }

    it("foreign or torn frames fail loudly: non-role leading id, empty " +
       "segment, role id inside content, lens that do not tile") {
      def dec(ids: Seq[Long]) = Sft.decodeConversations(
        Seq((1L, ids)).toDF("conv_id", "ids"), syms, roles2).collect()
      def fails(ids: Seq[Long], want: String): Unit = {
        val e = intercept[Exception](dec(ids))
        val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
        assert(msg.contains(want), msg)
      }
      fails(Seq(300L, 0L), "not a role id")          // content id leads
      fails(Seq(900L, 300L, 0L, 0L), "not a role id") // empty segment: EOS leads
      fails(Seq(900L, 901L, 0L), "role id inside")    // torn frame
      fails(Seq(900L, 300L), "EOS-terminated")
      val badBins = Seq((0L, 0L, Seq(1L, 2L), Seq(2L, 3L), Seq(0L, 0L, 0L, 0L)))
        .toDF("shard", "bin", "doc_ids", "doc_lens", "ids")
      val e = intercept[Exception](TokenShards.splitBinsByLens(badBins).collect())
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("tile"), msg)
    }
  }

  describe("Sft.preferenceCycles") {
    def audit(rows: Seq[(Long, Long, Long)]) =
      Sft.preferenceCycles(rows.toDF("group_id", "winner", "loser"))
        .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)

    it("finds each directed 3-cycle once, counts opposing-vote pairs, and " +
       "certifies clean groups") {
      val got = audit(Seq(
        // group 0: total order 1>2>3, 1>3 — consistent
        (0L, 1L, 2L), (0L, 2L, 3L), (0L, 1L, 3L),
        // group 1: a 3-cycle (1>2>3>1) — exactly ONE cycle, not three rotations
        (1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, 1L),
        // group 2: a direct contradiction with agreeing duplicates: 1>2 twice,
        // 2>1 once -> 2 opposing vote pairs (the mass majority-vote discards)
        (2L, 1L, 2L), (2L, 1L, 2L), (2L, 2L, 1L)))
      assert(got.toSeq === Seq(
        (0L, 3L, 0L, 0L, true),
        (1L, 3L, 1L, 0L, false),
        (2L, 3L, 0L, 2L, false)))
    }

    it("cycles never cross groups; the same edges in one group do cycle") {
      val split = audit(Seq((0L, 1L, 2L), (1L, 2L, 3L), (2L, 3L, 1L)))
      assert(split.forall(r => r._3 == 0L && r._5))
      val joined = audit(Seq((9L, 1L, 2L), (9L, 2L, 3L), (9L, 3L, 1L)))
      assert(joined.toSeq === Seq((9L, 3L, 1L, 0L, false)))
    }

    it("a self- or null-preference fails loudly") {
      val e = intercept[Exception](audit(Seq((0L, 1L, 2L), (0L, 2L, 2L))))
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("preferenceCycles"), msg)
      val withNull = Seq((java.lang.Long.valueOf(0L), java.lang.Long.valueOf(1L),
        null.asInstanceOf[java.lang.Long]))
        .toDF("group_id", "winner", "loser")
      val e2 = intercept[Exception](Sft.preferenceCycles(withNull).collect())
      val msg2 = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
      assert(msg2.contains("preferenceCycles"), msg2)
    }
  }

  describe("Sft.resolvePreferences") {
    def resolve(rows: Seq[(Long, Long, Long)]) =
      Sft.resolvePreferences(rows.toDF("group_id", "winner", "loser"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
        .collect().sortBy(r => (r._1, r._2, r._3))

    it("collapses multi-annotator votes to one edge per pair by net margin; " +
       "ties are unresolvable and deterministically pinned") {
      val got = resolve(Seq(
        (0L, 1L, 2L), (0L, 1L, 2L), (0L, 2L, 1L),  // 2-1 for 1>2
        (0L, 3L, 1L),                              // single vote 3>1
        (1L, 1L, 2L), (1L, 2L, 1L)))               // 1-1 tie
      assert(got.toSeq === Seq(
        // (group, lo, hi, winner, loser, n_votes, margin, resolved)
        (0L, 1L, 2L, 1L, 2L, 3L, 1L, true),
        (0L, 1L, 3L, 3L, 1L, 1L, 1L, true),
        (1L, 1L, 2L, 1L, 2L, 2L, 0L, false)))
    }

    it("resolution kills contradictions by construction but NOT Condorcet " +
       "cycles — the residual audit still names them") {
      val condorcet = Seq(
        (7L, 1L, 2L), (7L, 1L, 2L), (7L, 2L, 1L),  // 1>2
        (7L, 2L, 3L), (7L, 2L, 3L), (7L, 3L, 2L),  // 2>3
        (7L, 3L, 1L), (7L, 3L, 1L), (7L, 1L, 3L))  // 3>1
      val res = Sft.resolvePreferences(condorcet.toDF("group_id", "winner", "loser"))
      val audit = Sft.preferenceCycles(res.where(col("resolved"))
          .select(col("group_id"), col("winner"), col("loser")))
        .as[(Long, Long, Long, Long, Boolean)].collect()
      assert(audit.toSeq === Seq((7L, 3L, 1L, 0L, false)))
    }

    it("a self- or null-preference fails loudly") {
      val e = intercept[Exception](resolve(Seq((0L, 1L, 1L))))
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("resolvePreferences"), msg)
    }
  }

  describe("Sft.packMaskedSequences") {
    val records = Seq(
      (0L, 3L, Seq(100L, 101L, 0L), Seq(0L, 1L, 1L)),
      (1L, 2L, Seq(102L, 0L), Seq(1L, 1L)),
      (2L, 4L, Seq(103L, 104L, 105L, 0L), Seq(0L, 0L, 1L, 1L)),
      (3L, 1L, Seq(0L), Seq(0L)))

    it("masks ride the pack positionally intact and bins match the unmasked " +
       "packer exactly (one packer implementation)") {
      val df = records.toDF("conv_id", "n_tokens", "ids", "mask")
      val packed = Sft.packMaskedSequences(df, "conv_id", nShards = 2, capacity = 5L)
        .as[(Long, Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long], Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
      val plain = TokenShards.packSequences(
          df.select(col("conv_id"), col("n_tokens"), col("ids")),
          "conv_id", nShards = 2, capacity = 5L)
        .as[(Long, Long, Seq[Long], Seq[Long], Seq[Long], Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
      assert(packed.map(r => (r._1, r._2, r._3, r._4, r._5, r._7, r._8)).toSeq ===
        plain.toSeq)
      // each bin's mask is the positional concatenation of its records'
      val byId = records.map(r => (r._1, r._4)).toMap
      packed.foreach { case (_, _, docIds, _, ids, mask, _, _) =>
        assert(mask === docIds.flatMap(byId))
        assert(mask.length === ids.length)
      }
    }

    it("contracts are loud: misaligned and non-bit masks never reach the packer") {
      def pack(rows: Seq[(Long, Long, Seq[Long], Seq[Long])]) =
        Sft.packMaskedSequences(rows.toDF("conv_id", "n_tokens", "ids", "mask"),
          "conv_id", 1, 100L).collect()
      assert(pack(records).nonEmpty)
      def failsLoudly(rows: Seq[(Long, Long, Seq[Long], Seq[Long])]): Unit = {
        val e = intercept[Exception](pack(rows))
        val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
        assert(msg.contains("packMaskedSequences"), msg)
      }
      failsLoudly(Seq((0L, 2L, Seq(100L, 0L), Seq(1L))))
      failsLoudly(Seq((0L, 2L, Seq(100L, 0L), Seq(1L, 7L))))
      failsLoudly(Seq((0L, 2L, Seq(100L, 0L), null.asInstanceOf[Seq[Long]])))
    }
  }
}
