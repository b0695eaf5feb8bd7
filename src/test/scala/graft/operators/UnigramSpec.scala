package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * Unigram-LM tokenizer training: hand-replayed EM arithmetic, the
 * collected ≡ distributed exactness law, coverage floors, and Viterbi
 * segmentation semantics.
 */
class UnigramSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("wordExpectedCounts replays the forward-backward arithmetic by hand") {
    // vocab pieces {a, b, ab} at p = 1/3 each; word "ab":
    //   [ab]   path mass 1/3,  [a b] path mass 1/9,  Z = 4/9
    //   E[ab] = (1/3)/(4/9) = 3/4 -> 49152/65536;  E[a] = E[b] = 1/4 -> 16384
    val probs = Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "ab" -> 1.0 / 3)
    val got = Unigram.wordExpectedCounts("ab", 1L, probs).toSeq.sortBy(_._1)
    assert(got == Seq(("a", 16384L), ("ab", 49152L), ("b", 16384L)))
    // corpus weight scales linearly
    val w5 = Unigram.wordExpectedCounts("ab", 5L, probs).toSeq.sortBy(_._1)
    assert(w5 == Seq(("a", 81920L), ("ab", 245760L), ("b", 81920L)))
  }

  test("EM sharpens, prune drops the weakest multi-char piece (hand-replayed round)") {
    // one word "ab", vocabSize 2 = the char inventory -> the single
    // multi-char seed piece must be pruned after EM; hand arithmetic:
    // round 1 fits p(ab)=.6 p(a)=p(b)=.2, round 2 E[ab]=61440 E[a]=4096,
    // prune removes 'ab' (target multi = 0)
    val docs = Seq((1L, "ab")).toDF("id", "text")
    val m = Unigram.trainCollected(docs, "text", vocabSize = 2, seedSize = 3)
    assert(m.pieces.map(_._1).sorted == Seq("a", "b"))
  }

  test("collected and distributed faces are bit-identical (fixed-point law)") {
    val rnd = new scala.util.Random(19)
    val words = Seq("low", "lower", "lowest", "new", "newer", "newest",
      "wide", "wider", "widest", "slow", "slowest")
    val docs = (0L until 150L).map { i =>
      (i, (0 until 1 + rnd.nextInt(5)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("id", "text")
    val a = Unigram.trainCollected(docs, "text", vocabSize = 18, seedSize = 40)
    val b = Unigram.trainDistributed(docs, "text", vocabSize = 18, seedSize = 40)
    assert(a.pieces == b.pieces)
    // and independent of partitioning (integer sums commute)
    val c = Unigram.trainDistributed(docs.repartition(7), "text", vocabSize = 18, seedSize = 40)
    assert(a.pieces == c.pieces)
  }

  test("every corpus word round-trips through Viterbi segmentation") {
    val sentence = "low lower lowest new newer newest wide wider widest slow slowest"
    val docs = Seq((1L, sentence)).toDF("id", "text")
    val m = Unigram.trainCollected(docs, "text", vocabSize = 16, seedSize = 48)
    sentence.split(" ").foreach { w =>
      val segs = Unigram.segment(w, m)
      assert(segs.mkString("") == w, s"$w segmented to $segs")
      assert(segs.forall(_.nonEmpty))
    }
    // single chars never prune: the char inventory survives at any target
    val chars = sentence.replace(" ", "").toSet.map((ch: Char) => ch.toString)
    assert(chars.subsetOf(m.pieces.map(_._1).toSet))
  }

  test("unknown characters segment as themselves below any trained piece") {
    val m = Unigram.trainCollected(Seq((1L, "ab ab")).toDF("id", "text"),
      "text", vocabSize = 3, seedSize = 3)
    assert(Unigram.segment("qxq", m) == Vector("q", "x", "q"))
    // a known piece still wins inside a word with unknown neighbors
    assert(Unigram.segment("qabq", m) == Vector("q", "ab", "q"))
    assert(Unigram.segment("", m) == Vector.empty)
  }

  test("tokenCounts memoizes by vocabulary and sums per document") {
    val train = Seq((1L, "ab ab cd")).toDF("id", "text")
    val m = Unigram.trainCollected(train, "text", vocabSize = 6, seedSize = 8)
    val docs = Seq(
      (1L, "ab cd ab"),    // ab=1 piece x2 (trained), cd=1 or 2 pieces
      (2L, "   "),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Unigram.tokenCounts(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perWord = Map("ab" -> Unigram.segment("ab", m).length.toLong,
      "cd" -> Unigram.segment("cd", m).length.toLong)
    assert(got == Map(1L -> (2 * perWord("ab") + perWord("cd"))))
  }

  test("log-space lattices survive the long tokens a web corpus always contains") {
    // linear-space path masses underflow around 50-300 chars; a URL or
    // base64 blob must neither crash Viterbi nor silently drop from EM
    val m = Unigram.trainCollected(Seq((1L, "ab ab")).toDF("id", "text"),
      "text", vocabSize = 3, seedSize = 3)
    val longUnknown = "x" * 5000
    assert(Unigram.segment(longUnknown, m) == Vector.fill(5000)("x"))
    val longKnown = "ab" * 2500
    assert(Unigram.segment(longKnown, m) == Vector.fill(2500)("ab"))
    // the training side: a corpus whose ONLY word is 400 chars still
    // produces expected counts (the word would vanish under linear math)
    val probs = Map("a" -> 0.5, "b" -> 0.5)
    val counts = Unigram.wordExpectedCounts("ab" * 200, 1L, probs).toMap
    assert(counts("a") == (200L << 16) && counts("b") == (200L << 16))
  }

  test("vocabSize below the char inventory bottoms out at the inventory") {
    val docs = Seq((1L, "abcdef")).toDF("id", "text")
    val m = Unigram.trainCollected(docs, "text", vocabSize = 3, seedSize = 30)
    assert(m.pieces.map(_._1).sorted == Seq("a", "b", "c", "d", "e", "f"))
  }

  test("models round-trip through the store frame and segment identically") {
    val m = Unigram.trainCollected(
      Seq((1L, "low lower lowest new newer")).toDF("id", "text"),
      "text", vocabSize = 12, seedSize = 30)
    val back = Unigram.modelFromFrame(Unigram.modelFrame(spark, m).repartition(3))
    assert(back.pieces == m.pieces.sortBy(_._1))
    for (w <- Seq("lower", "newest", "lowly", "qq"))
      assert(Unigram.segment(w, back) == Unigram.segment(w, m))
    val ex = intercept[IllegalArgumentException] {
      Unigram.modelFromFrame(Unigram.modelFrame(spark, m), maxEntries = 2)
    }
    assert(ex.getMessage.contains("maxEntries"))
  }

  test("minCount floors words before seeding; maxVocab guards the collect") {
    val docs = Seq((1L, "zz zz zz rare"), (2L, "zz aa aa")).toDF("id", "text")
    val floored = Unigram.trainCollected(docs, "text", vocabSize = 4, seedSize = 8,
      minCount = 2L)
    // 'rare' never seeds: no piece contains 'r'/'e'
    assert(!floored.pieces.exists(p => p._1.contains("r") || p._1.contains("e")))
    val ex = intercept[IllegalArgumentException] {
      Unigram.trainCollected(docs, "text", vocabSize = 4, seedSize = 8, maxVocab = 2)
    }
    assert(ex.getMessage.contains("maxVocab"))
  }

  test("astral codepoints never tear: pieces, floor, and unk all move whole codepoints") {
    // U+1D6C0 (surrogate pair) inside and between trained morphemes: every
    // candidate piece, the never-pruned floor, the unknown fallback, and
    // Viterbi backtrace must respect codepoint boundaries — a lone
    // surrogate piece would UTF-8-mangle to '?' under total encoding
    val astral = "\uD835\uDEC0"
    val word = s"low${astral}est"
    val docs = Seq((1L, s"$word low lowest est")).toDF("id", "text")
    val m = Unigram.trainCollected(docs, "text", vocabSize = 12, seedSize = 24)
    m.pieces.foreach { case (piece, _) =>
      assert(!Character.isLowSurrogate(piece.charAt(0)), s"torn head in '$piece'")
      assert(!Character.isHighSurrogate(piece.charAt(piece.length - 1)),
        s"torn tail in '$piece'")
    }
    val segs = Unigram.segment(word, m)
    assert(segs.mkString("") == word, s"$word segmented to $segs")
    segs.foreach { piece =>
      assert(!Character.isLowSurrogate(piece.charAt(0)), s"torn head in '$piece'")
      assert(!Character.isHighSurrogate(piece.charAt(piece.length - 1)),
        s"torn tail in '$piece'")
    }
    // a NEVER-SEEN astral codepoint segments as one whole-codepoint unk
    val novel = "\uD83D\uDE00" // U+1F600
    val unkSegs = Unigram.segment(s"a${novel}b", m)
    assert(unkSegs.mkString("") == s"a${novel}b")
    assert(unkSegs.contains(novel), s"expected whole-codepoint unk in $unkSegs")
    // ...and the byte-fallback TOTAL encoding round-trips through it
    val alien = Seq((7L, s"$word a${novel}b")).toDF("doc_id", "text")
    val vocabT = TokenShards.vocabFromFrameTotal(
      TokenShards.buildVocabTotalWith(alien, "text")(w => Unigram.segment(w, m)))
    val toks = TokenShards.tokenizeToIdsTotalWith(alien, "doc_id", "text", vocabT)(
      w => Unigram.segment(w, m))
    val ids = toks.select($"ids").as[Seq[Long]].collect().head
    assert(TokenShards.detokenizeTotal(ids, vocabT.map(_.swap)) == s"$word a${novel}b")
  }
}
