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
}
