package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * [[FuzzyJoin]] pins: blocked == brute force at the completeness bound
 * (keys >= 2*blockLen, maxDist 1), the hot-block cap fires and is
 * counted, and degenerate shapes (identical keys, prefix==suffix
 * blocks) neither duplicate nor drop pairs.
 */
class FuzzyJoinSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def brute(left: Seq[(Long, String)], right: Seq[(Long, String)],
                    maxDist: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (li, lk) <- left; (ri, rk) <- right
      dist = lev(lk, rk) if dist <= maxDist
    } yield (li, ri, dist.toLong)).toSet
  }

  private def run(left: Seq[(Long, String)], right: Seq[(Long, String)],
                  maxDist: Int, blockLen: Int = 3, maxBlock: Int = 1024) = {
    val res = FuzzyJoin.blockedFuzzyJoin(
      left.toDF("id", "key"), "id", "key",
      right.toDF("id", "key"), "id", "key", maxDist, blockLen, maxBlock)
    (res.pairs.as[(Long, Long, Long)].collect().toSet,
      res.droppedBlocks.as[Long].head())
  }

  test("blocked equals brute force for keys >= 2*blockLen (deterministic fuzz)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    def word() = (0 until (6 + rnd.nextInt(5))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val left = (0L until 120L).map(i => (i, word()))
    // right: half perturbed copies (sub/del/ins at a random pos), half fresh
    val right = left.map { case (i, w) =>
      val p = rnd.nextInt(w.length)
      val r = rnd.nextInt(3) match {
        case 0 => w.updated(p, alpha(rnd.nextInt(alpha.length))) // substitute
        case 1 => w.take(p) + w.drop(p + 1)                      // delete
        case _ => w.take(p) + alpha(rnd.nextInt(alpha.length)) + w.drop(p) // insert
      }
      (i + 1000L, r)
    } ++ (0L until 60L).map(i => (i + 5000L, word()))
    // deletion of a 6-char word can leave 5 chars (< 2*blockLen): keep the
    // bound honest by filtering such keys from BOTH the operator input and
    // the brute-force reference
    val rOk = right.filter(_._2.length >= 6)
    val (pairs, dropped) = run(left, rOk, maxDist = 1)
    assert(dropped == 0L)
    assert(pairs == brute(left, rOk, 1))
    assert(pairs.nonEmpty) // the fuzz must actually exercise matches
  }

  test("hot-block cap drops and counts boilerplate blocks") {
    // 50 keys share the prefix AND suffix block ("aaa...aaa"); cap at 10
    val left = (0L until 50L).map(i => (i, s"aaa${i}xxaaa"))
    val right = left.map { case (i, w) => (i + 100L, w) }
    val (pairsCapped, dropped) = run(left, right, maxDist = 1, maxBlock = 10)
    assert(dropped > 0L)
    assert(pairsCapped.isEmpty) // every candidate block was hot
    val (pairsFull, dropped2) = run(left, right, maxDist = 1, maxBlock = 1024)
    assert(dropped2 == 0L)
    // uncapped: every key matches exactly its own copy (dist 0) — the
    // i-digit differs between any two distinct keys by >= 1 sub plus
    // length drift, but equal-i pairs are identical strings
    assert(pairsFull.count(_._3 == 0L) == 50)
  }

  test("prefix==suffix block coincidence neither duplicates nor drops") {
    val left = Seq((1L, "abcabc"), (2L, "xyzxyz"))
    val right = Seq((10L, "abcabc"), (20L, "xyzxyj"))
    val (pairs, dropped) = run(left, right, maxDist = 1)
    assert(dropped == 0L)
    assert(pairs == Set((1L, 10L, 0L), (2L, 20L, 1L)))
  }

  test("null keys and ids are excluded, not crashed on") {
    val left = Seq((Some(1L), Some("abcdef")), (None, Some("abcdef")), (Some(3L), None))
      .toDF("id", "key")
    val right = Seq((Some(9L), Some("abcdef"))).toDF("id", "key")
    val res = FuzzyJoin.blockedFuzzyJoin(left, "id", "key", right, "id", "key", 1)
    assert(res.pairs.as[(Long, Long, Long)].collect().toSet == Set((1L, 9L, 0L)))
  }
}
