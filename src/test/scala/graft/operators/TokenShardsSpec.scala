package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.SparkSuite

/** The train-ready token-shard composition: vocabulary induction, lossless
  * id encoding, streaming next-fit sequence assembly, and the export
  * round trip. */
class TokenShardsSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, lit, struct}
  import graft.sorted.syntax._

  private val merges = Bpe.fixtureMerges
  private val ranks = merges.zipWithIndex.toMap

  private def docsOf(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  describe("buildVocab / vocabFromFrame") {
    it("assigns lexicographic ids from 2 over the merge outputs, deterministically") {
      val docs = docsOf((1L, "the thin cat"), (2L, "the  cat\tsat"))
      val frame = TokenShards.buildVocab(docs, "text", merges)
      val got = frame.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      // symbols: 'the'->[the]; 'thin'->[th,in]; 'cat'->[c,at]; 'sat'->[s,at]
      val syms = Seq("at", "c", "in", "s", "th", "the").sorted
      assert(got.toSeq == syms.zipWithIndex.map { case (s, i) => (2L + i, s) })
      val m = TokenShards.vocabFromFrame(frame)
      assert(m == got.map(_.swap).toMap)
    }

    it("rejects a corrupt vocab frame loudly") {
      val dup = Seq((2L, "a"), (3L, "a")).toDF("id", "symbol")
      assert(intercept[IllegalArgumentException](
        TokenShards.vocabFromFrame(dup)).getMessage.contains("duplicate"))
      val low = Seq((1L, "a")).toDF("id", "symbol")
      assert(intercept[IllegalArgumentException](
        TokenShards.vocabFromFrame(low)).getMessage.contains("EOS/SPACE"))
    }
  }

  describe("splitMaskedBinsByLens") {
    it("slices ids and mask by the same boundaries, agreeing with the single-channel splitter") {
      val bins = Seq(
        (Seq(10L, 11L), Seq(2L, 3L), Seq(1L, 2L, 3L, 4L, 5L), Seq(0L, 1L, 1L, 0L, 1L)),
        (Seq(12L), Seq(1L), Seq(9L), Seq(1L)))
        .toDF("doc_ids", "doc_lens", "ids", "mask")
      val got = TokenShards.splitMaskedBinsByLens(bins)
        .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1).toSeq
      assert(got == Seq(
        (10L, Seq(1L, 2L), Seq(0L, 1L)),
        (11L, Seq(3L, 4L, 5L), Seq(1L, 0L, 1L)),
        (12L, Seq(9L), Seq(1L))))
      // channel-for-channel agreement with splitBinsByLens (the shape the
      // q268 read-back used before the one-pass splitter)
      val ids1 = TokenShards.splitBinsByLens(
        bins.select(col("doc_ids"), col("doc_lens"), col("ids")))
        .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
      val mask1 = TokenShards.splitBinsByLens(
        bins.select(col("doc_ids"), col("doc_lens"), col("mask").as("ids")))
        .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
      assert(got.map(r => (r._1, r._2)) == ids1)
      assert(got.map(r => (r._1, r._3)) == mask1)
    }

    it("rejects a mask that does not tile the ids") {
      val bad = Seq((Seq(10L), Seq(2L), Seq(1L, 2L), Seq(1L)))
        .toDF("doc_ids", "doc_lens", "ids", "mask")
      val e = intercept[org.apache.spark.SparkException](
        TokenShards.splitMaskedBinsByLens(bad).collect())
      assert(e.getMessage.contains("mask") ||
        Option(e.getCause).exists(_.getMessage.contains("mask")))
    }
  }

  describe("tokenizeToIds") {
    val docs = docsOf((1L, "the thin cat"), (2L, " the "), (3L, "   "),
      (4L, null.asInstanceOf[String]))
    val vocab = TokenShards.vocabFromFrame(TokenShards.buildVocab(docs, "text", merges))

    it("encodes words joined by SPACE and closed by EOS; blank/null docs drop") {
      val got = TokenShards.tokenizeToIds(docs, "doc_id", "text", merges, vocab)
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
      def w(s: String) = Bpe.applyMerges(s, ranks).map(vocab)
      val d1 = w("the") ++ Seq(TokenShards.spaceId) ++ w("thin") ++
        Seq(TokenShards.spaceId) ++ w("cat") :+ TokenShards.eosId
      assert(got.map(_._1).toSeq == Seq(1L, 2L))
      assert(got(0)._2 == d1 && got(0)._3 == d1.length.toLong)
      assert(got(1)._2 == (w("the") :+ TokenShards.eosId))
      // n_tokens = sum(word symbols) + word count (the oracle's closed form)
      assert(got(0)._3 == 5L + 3L) // the=1, thin=2, cat=2 symbols; 3 words
    }

    it("round-trips through detokenize exactly (normalized token stream)") {
      val rev = vocab.map(_.swap)
      val got = TokenShards.tokenizeToIds(docs, "doc_id", "text", merges, vocab)
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
      assert(TokenShards.detokenize(got(0)._2, rev) == "the thin cat")
      assert(TokenShards.detokenize(got(1)._2, rev) == "the")
    }

    it("fails loudly on a word whose symbols are outside the standing vocabulary") {
      val alien = docsOf((9L, "zebra"))
      val e = intercept[org.apache.spark.SparkException](
        TokenShards.tokenizeToIds(alien, "doc_id", "text", merges, vocab).collect())
      assert(e.getMessage.contains("standing vocabulary") ||
        Option(e.getCause).exists(_.getMessage.contains("standing vocabulary")))
    }
  }

  describe("packSequences") {
    it("replays next-fit per shard in doc order and concatenates bin sequences") {
      // one shard (nShards = 1), capacity 5: docs of 3, 3, 2, 7 tokens
      // -> bins [d1], [d2, d3], [d4] (oversize d4 keeps its own bin)
      val tokens = Seq(
        (1L, Seq(10L, 11L, 0L), 3L),
        (2L, Seq(12L, 13L, 0L), 3L),
        (3L, Seq(14L, 0L), 2L),
        (4L, Seq(20L, 21L, 22L, 23L, 24L, 25L, 0L), 7L))
        .toDF("doc_id", "ids", "n_tokens")
      val got = packSorted(tokens, nShards = 1, capacity = 5L)
      assert(got.map(r => (r._2, r._3.toSeq, r._6, r._7)) == Seq(
        (0L, Seq(1L), 1L, 3L),
        (1L, Seq(2L, 3L), 2L, 5L),
        (2L, Seq(4L), 1L, 7L)))
      assert(got(1)._5.toSeq == Seq(12L, 13L, 0L, 14L, 0L))
      // doc_lens: per-doc id counts in doc order, the attention-boundary
      // metadata — must sum to the bin's token count
      assert(got(1)._4.toSeq == Seq(3L, 2L))
      assert(got.forall(r => r._4.sum == r._7))
    }

    it("never loses a zero-token document — even one buffered after an oversize close") {
      // doc 1 (7 tokens) overflows capacity 5 and closes its bin while
      // doc 2 (0 tokens) is being buffered: fill stays 0 but the doc must
      // still emit (a document is never lost to a bound)
      val tokens = Seq(
        (1L, Seq(10L, 11L, 12L, 13L, 14L, 15L, 0L), 7L),
        (2L, Seq.empty[Long], 0L))
        .toDF("doc_id", "ids", "n_tokens")
      val got = packSorted(tokens, nShards = 1, capacity = 5L)
      assert(got.map(r => (r._2, r._3.toSeq)) == Seq((0L, Seq(1L)), (1L, Seq(2L))))
      // an all-zero-token key emits its (empty-sequence) bin too
      val onlyEmpty = Seq((3L, Seq.empty[Long], 0L)).toDF("doc_id", "ids", "n_tokens")
      assert(packSorted(onlyEmpty, 1, 5L).map(_._3.toSeq) == Seq(Seq(3L)))
    }

    it("keeps bins inside their hash shard; shard+bin rows match Packing.packGreedy") {
      val tokens = (0L until 40L)
        .map(i => (i, Seq.fill((1 + i % 5).toInt)(7L) :+ 0L, (2 + i % 5)))
        .toDF("doc_id", "ids", "n_tokens")
      val got = packSorted(tokens, nShards = 4, capacity = 8L)
      // every doc in exactly one bin, in its own shard
      val perDoc = got.flatMap { case (shard, bin, ds, _, _, _, _) =>
        ds.map(d => (d, shard, bin))
      }
      assert(perDoc.map(_._1).sorted == (0L until 40L).toSeq)
      assert(perDoc.forall { case (d, shard, _) => d % 4 == shard })
      // the reference packer agrees bin-for-bin
      val ref = Packing.packGreedy(
        tokens.select((col("doc_id") % 4).as("_1"),
          struct(col("doc_id"), lit(0L), col("n_tokens").cast("long")).as("_2"))
          .as[(Long, (Long, Long, Long))].groupSort(), capacity = 8L)
        .map { case (s, (d, _, _, b)) => (d, s, b) }.collect().toSet
      assert(perDoc.toSet == ref)
    }
  }

  private def packSorted(tokens: org.apache.spark.sql.DataFrame, nShards: Int,
      capacity: Long): Seq[(Long, Long, Seq[Long], Seq[Long], Seq[Long], Long, Long)] =
    TokenShards.packSequences(tokens, "doc_id", nShards, capacity)
      .as[(Long, Long, Seq[Long], Seq[Long], Seq[Long], Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  describe("properties over random multilingual corpora") {
    // mixed ASCII words, CJK runs, punctuation, and hostile whitespace —
    // the encode->pack->decode identity and the capacity law must hold on
    // anything, not just the golden fixtures
    def randomDoc(rnd: scala.util.Random): String = {
      val words = Seq.fill(1 + rnd.nextInt(12)) {
        rnd.nextInt(4) match {
          case 0 => Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString
          case 1 => Seq.fill(1 + rnd.nextInt(4))((0x4E00 + rnd.nextInt(100)).toChar).mkString
          case 2 => "the" // force merge hits
          case 3 => Seq.fill(1 + rnd.nextInt(3))("!?#,."(rnd.nextInt(5))).mkString
        }
      }
      val sep = Seq(" ", "  ", "\t", "\n")
      words.mkString(sep(rnd.nextInt(sep.length))) +
        (if (rnd.nextBoolean()) " " else "")
    }

    it("encode -> pack -> decode is the identity on the normalized token stream") {
      val rnd = new scala.util.Random(1207)
      val docs = (0L until 60L).map(i => (i, randomDoc(rnd))).toDF("doc_id", "text")
      val vocab = TokenShards.vocabFromFrame(TokenShards.buildVocab(docs, "text", merges))
      val tokens = TokenShards.tokenizeToIds(docs, "doc_id", "text", merges, vocab)
      val seqs = TokenShards.packSequences(tokens, "doc_id", nShards = 3, capacity = 24L)
      val rebuilt = TokenShards.decodeBins(seqs, vocab)
        .as[(Long, String)].collect().toMap
      val expected = (0L until 60L).map { i =>
        i -> graft.functions.Text.segmentText(
          docs.where(col("doc_id") === i).select("text").as[String].head()).mkString(" ")
      }.filter(_._2.nonEmpty).toMap
      assert(rebuilt == expected)
    }

    it("TOTAL encoding round-trips on any corpus under any IMPOVERISHED vocab " +
       "(random symbols evicted -> byte fallback), including astral codepoints") {
      val rnd = new scala.util.Random(1223)
      def astralWord(): String =
        Seq.fill(1 + rnd.nextInt(3))(new String(Character.toChars(
          0x1D400 + rnd.nextInt(200)))).mkString
      val docs = (0L until 50L).map { i =>
        val base = randomDoc(rnd)
        // every 3rd doc additionally carries astral words (surrogate pairs)
        (i, if (i % 3 == 0) base + " " + astralWord() + " " + astralWord() else base)
      }.toDF("doc_id", "text")
      val full = TokenShards.vocabFromFrameTotal(
        TokenShards.buildVocabTotal(docs, "text", merges))
      // evict a random half of the symbols: those now take the byte path —
      // the round trip must hold under ANY closed vocabulary, not just a
      // corpus-complete one (that is what TOTAL means)
      val impoverished = full.filter(_ => rnd.nextBoolean())
      for (vocab <- Seq(full, impoverished, Map.empty[String, Long])) {
        val tokens = TokenShards.tokenizeToIdsTotal(docs, "doc_id", "text", merges, vocab)
        val seqs = TokenShards.packSequences(tokens, "doc_id", nShards = 3, capacity = 32L)
        val rebuilt = TokenShards.decodeBinsTotal(seqs, vocab)
          .as[(Long, String)].collect().toMap
        val expected = (0L until 50L).map { i =>
          i -> graft.functions.Text.segmentText(
            docs.where(col("doc_id") === i).select("text").as[String].head()).mkString(" ")
        }.filter(_._2.nonEmpty).toMap
        assert(rebuilt == expected, s"vocab size ${vocab.size}")
      }
    }

    it("indexed decode keeps placement: (key, pos) agrees with each bin's doc_ids order") {
      val rnd = new scala.util.Random(1231)
      val docs = (0L until 40L).map(i => (i, randomDoc(rnd))).toDF("doc_id", "text")
      val vocab = TokenShards.vocabFromFrame(TokenShards.buildVocab(docs, "text", merges))
      val tokens = TokenShards.tokenizeToIds(docs, "doc_id", "text", merges, vocab)
      val seqs = TokenShards.packSequences(tokens, "doc_id", nShards = 3, capacity = 24L)
        .withColumn("bin_key", col("shard") * 1000L + col("bin"))
      val indexed = TokenShards.decodeBinsIndexed(seqs, "bin_key", vocab)
        .as[(Long, Long, Long, String)].collect()
      // placement law: for every bin, pos-ordered doc_ids == the packed doc_ids array
      val byBin = indexed.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      val packed = seqs.select(col("bin_key"), col("doc_ids"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(byBin == packed)
      // and the detok payload agrees with the unindexed decode, doc for doc
      val plain = TokenShards.decodeBins(seqs, vocab).as[(Long, String)].collect().toMap
      assert(indexed.map(r => r._3 -> r._4).toMap == plain)
      // positions are 0-based and gapless within each bin
      indexed.groupBy(_._1).foreach { case (k, rows) =>
        assert(rows.map(_._2).sorted.toSeq == (0L until rows.length.toLong), s"bin $k")
      }
    }

    it("fimTransform: seeded PSM rewrite is deterministic, lens partition the " +
       "content, restore is the exact inverse; contracts are loud") {
      val rnd = new scala.util.Random(1249)
      val docs = (0L until 200L).map { i =>
        // content ids in the total-scheme SYMBOL range, varied lengths 1..40
        val c = 1 + rnd.nextInt(40)
        (i, (Seq.fill(c)(258L + rnd.nextInt(1000)) :+ 0L))
      }.toDF("doc_id", "ids")
      val (pre, suf, mid) = (90001L, 90002L, 90003L)
      val fim = TokenShards.fimTransform(docs, "fimtest", 500L, pre, suf, mid)
        .as[(Long, Seq[Long], Long, Boolean, Long, Long, Long)].collect()
      val srcById = docs.as[(Long, Seq[Long])].collect().toMap
      // ~half selected (seeded, not random); lens partition the content
      val applied = fim.filter(_._4)
      assert(applied.nonEmpty && applied.length < fim.length)
      fim.foreach { case (id, ids, n, app, p, m, sfx) =>
        val c = srcById(id).length - 1
        assert(p + m + sfx == c, s"doc $id lens must partition content")
        assert(n == ids.length.toLong)
        if (app) {
          assert(ids.length == c + 4, s"doc $id: 3 sentinels + EOS")
          assert(ids.head == pre && ids.last == 0L)
        } else assert(ids == srcById(id))
      }
      // deterministic under repartitioning, rate 0 is the identity, rate 1000 total
      val again = TokenShards.fimTransform(docs.repartition(7), "fimtest", 500L, pre, suf, mid)
        .as[(Long, Seq[Long], Long, Boolean, Long, Long, Long)].collect()
      assert(fim.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
      assert(TokenShards.fimTransform(docs, "fimtest", 0L, pre, suf, mid)
        .where(col("fim_applied")).isEmpty)
      assert(TokenShards.fimTransform(docs, "fimtest", 1000L, pre, suf, mid)
        .where(!col("fim_applied")).isEmpty)
      // restore is the exact inverse on the whole frame
      val restored = TokenShards.fimRestore(
          TokenShards.fimTransform(docs, "fimtest", 500L, pre, suf, mid), pre, suf, mid)
        .select(col("doc_id"), col("ids")).as[(Long, Seq[Long])].collect().toMap
      assert(restored == srcById)
      // loud contracts: sentinel collision, non-EOS-terminated, bad sentinels
      val collide = Seq((1L, Seq(90001L, 0L))).toDF("doc_id", "ids")
      assert(intercept[org.apache.spark.SparkException](
        TokenShards.fimTransform(collide, "s", 1000L, pre, suf, mid).collect())
        .getMessage != null)
      val unterminated = Seq((1L, Seq(300L))).toDF("doc_id", "ids")
      assert(intercept[org.apache.spark.SparkException](
        TokenShards.fimTransform(unterminated, "s", 0L, pre, suf, mid).collect())
        .getMessage != null)
      intercept[IllegalArgumentException](
        TokenShards.fimTransform(docs, "s", 500L, pre, pre, mid))
      intercept[IllegalArgumentException](
        TokenShards.fimTransform(docs, "s", 1001L, pre, suf, mid))
      // malformed PSM framing fails at restore, never partially restores
      val bad = Seq((1L, Seq(pre, 300L, mid, 301L, suf, 0L))).toDF("doc_id", "ids")
      assert(intercept[org.apache.spark.SparkException](
        TokenShards.fimRestore(bad, pre, suf, mid).collect()).getMessage != null)
    }

    it("offsetManifest: exact exclusive prefix sums across chunk boundaries, " +
       "partitioning-invariant; non-dense train_seq fails loudly") {
      val rnd = new scala.util.Random(1237)
      // 70k bins spans two 2^16 value-chunks — the chunk-base handoff at
      // train_seq 65536 is exactly where a base-offset bug would land
      val n = 70000
      val masses = Array.fill(n)(1L + rnd.nextInt(100))
      val rows = (0 until n).map(i => (i.toLong, i.toLong % 8, i.toLong / 8, masses(i)))
      val bins = rows.toDF("train_seq", "shard", "bin", "n_tokens")
      val got = TokenShards.offsetManifest(bins)
        .select(col("train_seq"), col("token_offset"))
        .as[(Long, Long)].collect().sortBy(_._1)
      val expected = masses.scanLeft(0L)(_ + _).init
      assert(got.map(_._1).toSeq == (0L until n.toLong))
      assert(got.map(_._2).toSeq == expected.toSeq)
      // invariant under input layout
      val again = TokenShards.offsetManifest(bins.repartition(17))
        .select(col("train_seq"), col("token_offset"))
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == again.toSeq)
      // duplicate and missing sequence numbers both fail at the door
      val dup = bins.unionByName(bins.where(col("train_seq") === 3L))
      val eDup = intercept[IllegalArgumentException](TokenShards.offsetManifest(dup))
      assert(eDup.getMessage.contains("dense"))
      val gap = bins.where(col("train_seq") =!= 3L)
      val eGap = intercept[IllegalArgumentException](TokenShards.offsetManifest(gap))
      assert(eGap.getMessage.contains("dense"))
    }

    it("no bin exceeds capacity unless it is an oversize singleton") {
      val rnd = new scala.util.Random(1213)
      val docs = (0L until 80L).map(i => (i, randomDoc(rnd))).toDF("doc_id", "text")
      val vocab = TokenShards.vocabFromFrame(TokenShards.buildVocab(docs, "text", merges))
      val tokens = TokenShards.tokenizeToIds(docs, "doc_id", "text", merges, vocab)
      for (cap <- Seq(8L, 24L, 64L)) {
        val bins = TokenShards.packSequences(tokens, "doc_id", nShards = 2, capacity = cap)
          .as[(Long, Long, Seq[Long], Seq[Long], Seq[Long], Long, Long)].collect()
        bins.foreach { case (shard, bin, ds, lens, ids, nDocs, nTok) =>
          assert(ids.length == nTok && ds.length == nDocs, s"census drift at $shard/$bin")
          assert(lens.length == nDocs && lens.sum == nTok,
            s"doc_lens drift at $shard/$bin")
          assert(nTok <= cap || nDocs == 1L,
            s"overfilled multi-doc bin $shard/$bin: $nTok > $cap with $nDocs docs")
        }
        // and nothing is lost: every doc lands in exactly one bin
        assert(bins.flatMap(_._3).sorted.toSeq ==
          tokens.select("doc_id").as[Long].collect().sorted.toSeq)
      }
    }
  }

  describe("end to end with the export writer") {
    it("shards round-trip and rebuild the corpus; digests are input-order invariant") {
      val docs = docsOf((0L, "the cat sat on the mat"), (1L, "a thin cat"),
        (2L, "the end"), (3L, "cat cat cat the the thin"))
      val vocab = TokenShards.vocabFromFrame(TokenShards.buildVocab(docs, "text", merges))
      val tokens = TokenShards.tokenizeToIds(docs, "doc_id", "text", merges, vocab)
      val seqs = TokenShards.packSequences(tokens, "doc_id", nShards = 2, capacity = 8L)
        .withColumn("seq_id",
          org.apache.spark.sql.functions.format_string("s%03d-b%06d", col("shard"), col("bin")))
      val path = java.nio.file.Files.createTempDirectory("tokshard").resolve("x").toString
      graft.sources.Export.writeJsonlShards(seqs, path, "seq_id", 2, 1 << 20)
      val digests1 = graft.sources.Export.shardDigests(path)
      // re-export from a reshuffled equal input: byte-identical
      graft.sources.Export.writeJsonlShards(seqs.repartition(7), path, "seq_id", 2, 1 << 20)
      assert(graft.sources.Export.shardDigests(path) == digests1)
      // rebuild through the OWNED inverse (decodeBins): explode bins into
      // docs, detokenize, compare to source
      val back = graft.sources.Export.readJsonlShards(spark, path, seqs.schema)
      val rebuilt = TokenShards.decodeBins(back, vocab)
        .as[(Long, String)].collect().toMap
      assert(rebuilt == Map(
        0L -> "the cat sat on the mat", 1L -> "a thin cat",
        2L -> "the end", 3L -> "cat cat cat the the thin"))
    }
  }

  describe("byte-fallback (total) scheme") {
    val docs = docsOf((1L, "the thin cat"), (2L, " the "))
    val vocabT = TokenShards.vocabFromFrameTotal(
      TokenShards.buildVocabTotal(docs, "text", merges))

    it("assigns symbol ids from 258, leaving 2..257 for the reserved bytes") {
      assert(vocabT.values.min == TokenShards.totalFirstSymbolId)
      // same symbol inventory as the strict frame, shifted id origin
      val strict = TokenShards.vocabFromFrame(TokenShards.buildVocab(docs, "text", merges))
      assert(vocabT.keySet == strict.keySet)
      assert(vocabT.toSeq.sortBy(_._2).map(_._1) == strict.toSeq.sortBy(_._2).map(_._1))
    }

    it("scheme guards fire at the door: strict frame into the total loader, " +
       "strict vocab into the total encoder") {
      val strictFrame = TokenShards.buildVocab(docs, "text", merges)
      assert(intercept[IllegalArgumentException](
        TokenShards.vocabFromFrameTotal(strictFrame)).getMessage.contains("byte"))
      val strict = TokenShards.vocabFromFrame(strictFrame)
      assert(intercept[IllegalArgumentException](
        TokenShards.tokenizeToIdsTotal(docs, "doc_id", "text", merges, strict))
        .getMessage.contains("byte-fallback"))
    }

    it("an OOV symbol encodes as its UTF-8 bytes; in-vocab symbols and byte runs " +
       "interleave and round-trip exactly") {
      // 'cat\u00F1': merges give [c, at, \u00F1] — c and at in vocab, \u00F1 OOV
      // (2 UTF-8 bytes); 'zebra' is fully OOV (5 single-byte symbols)
      val alien = docsOf((9L, "zebra cat\u00F1 the"))
      val got = TokenShards.tokenizeToIdsTotal(alien, "doc_id", "text", merges, vocabT)
        .as[(Long, Seq[Long], Long)].collect().head
      def byteIds(str: String): Seq[Long] =
        str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => TokenShards.firstByteId + (b & 0xff).toLong).toSeq
      val expect = byteIds("zebra") ++ Seq(TokenShards.spaceId) ++
        Seq(vocabT("c"), vocabT("at")) ++ byteIds("\u00F1") ++
        Seq(TokenShards.spaceId, vocabT("the"), TokenShards.eosId)
      assert(got._2 == expect, s"got ${got._2}")
      val rev = vocabT.map(_.swap)
      assert(TokenShards.detokenizeTotal(got._2, rev) == "zebra cat\u00F1 the")
    }

    it("multi-byte and ASTRAL codepoints survive the byte fallback (no surrogate tearing)") {
      // \u00F1 = 2 bytes, \u221A = 3, U+1D6C0 = 4 (surrogate pair in UTF-16)
      val marker = "\u00F1\u221A\uD835\uDEC0\u03B1"
      val alien = docsOf((7L, s"the $marker thin"))
      val toks = TokenShards.tokenizeToIdsTotal(alien, "doc_id", "text", merges, vocabT)
      val got = toks.as[(Long, Seq[Long], Long)].collect().head
      val nByte = got._2.count(id =>
        id >= TokenShards.firstByteId && id < TokenShards.totalFirstSymbolId)
      assert(nByte == 11, s"expected 11 byte ids, got $nByte in ${got._2}")
      val rev = vocabT.map(_.swap)
      assert(TokenShards.detokenizeTotal(got._2, rev) == s"the $marker thin")
      // and through the packed-bin inverse (the artifact-level gate)
      val bins = TokenShards.packSequences(toks, "doc_id", nShards = 1, capacity = 64L)
      val back = TokenShards.decodeBinsTotal(bins, vocabT)
        .as[(Long, String)].collect().toMap
      assert(back == Map(7L -> s"the $marker thin"))
    }

    it("strict detokenize refuses total-scheme byte ids (schemes cannot mix silently)") {
      val rev = vocabT.map(_.swap)
      val ids = Seq(TokenShards.firstByteId + 'z'.toLong, TokenShards.eosId)
      assert(intercept[IllegalArgumentException](
        TokenShards.detokenize(ids, rev)).getMessage.contains("unknown token id"))
    }
  }

  describe("mixtureManifest join contracts") {
    val bins = Seq((0L, 0L, Seq(1L, 2L), Seq(5L, 7L), Seq.fill(12)(1L), 2L, 12L))
      .toDF("shard", "bin", "doc_ids", "doc_lens", "ids", "n_docs", "n_tokens")

    it("missing metadata fails loudly instead of silently undercounting") {
      val partial = Seq((1L, "en", "web")).toDF("doc_id", "lang", "source")
      val e = intercept[IllegalArgumentException](
        TokenShards.mixtureManifest(bins, partial, "doc_id", Seq("lang", "source")))
      assert(e.getMessage.contains("missing from docMeta"))
    }

    it("duplicate metadata fails loudly instead of silently double-counting") {
      val dup = Seq((1L, "en", "web"), (1L, "de", "web"), (2L, "en", "web"))
        .toDF("doc_id", "lang", "source")
      val e = intercept[IllegalArgumentException](
        TokenShards.mixtureManifest(bins, dup, "doc_id", Seq("lang", "source")))
      assert(e.getMessage.contains("duplicate"))
    }
  }

  describe("detokenizeTotal strictness") {
    it("an invalid UTF-8 byte run fails loudly, never decodes to U+FFFD") {
      // a lone continuation byte 0xC3 cannot end a UTF-8 sequence
      val ids = Seq(TokenShards.firstByteId + 0xC3L, TokenShards.eosId)
      val e = intercept[IllegalArgumentException](
        TokenShards.detokenizeTotal(ids, Map.empty))
      assert(e.getMessage.contains("not valid UTF-8"))
    }
  }

  describe("withTrainingOrder") {
    val bins = (0L until 4L).flatMap(sh => (0L until 6L).map(b =>
      (sh, b, Seq(sh * 10 + b), Seq(3L), Seq(1L, 1L, 0L), 1L, 3L)))
      .toDF("shard", "bin", "doc_ids", "doc_lens", "ids", "n_docs", "n_tokens")

    it("assigns consecutive global positions 0..N-1 under the seeded md5 permutation") {
      val got = TokenShards.withTrainingOrder(bins, "seed-a")
        .select($"shard", $"bin", $"train_seq")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      assert(got.values.toSeq.sorted == (0L until 24L))
      // the permutation is the md5 order, recomputed independently here
      val md = java.security.MessageDigest.getInstance("MD5")
      def key(sh: Long, b: Long): String =
        md.digest(s"seed-a:$sh:$b".getBytes("UTF-8")).map(x => f"$x%02x").mkString
      val expect = got.keys.toSeq.sortBy { case (sh, b) => (key(sh, b), sh, b) }
        .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toMap
      assert(got == expect)
      // ...and it is NOT the corpus order (the whole point)
      assert(got.toSeq.sortBy(_._2).map(_._1) != got.keys.toSeq.sorted)
    }

    it("is partitioning-invariant; a different seed is a different permutation") {
      val a = TokenShards.withTrainingOrder(bins, "seed-a")
        .select($"shard", $"bin", $"train_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = TokenShards.withTrainingOrder(bins.repartition(7), "seed-a")
        .select($"shard", $"bin", $"train_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a == b)
      val c = TokenShards.withTrainingOrder(bins, "seed-b")
        .select($"shard", $"bin", $"train_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a != c) // fresh epoch-level reshuffle
    }

    it("duplicate (shard, bin) keys fail loudly instead of cross-producting ranks") {
      val dup = bins.unionByName(bins.limit(1))
      val e = intercept[IllegalArgumentException](
        TokenShards.withTrainingOrder(dup, "seed-a"))
      assert(e.getMessage.contains("duplicate (shard, bin)"))
    }

    it("withCurriculumOrder is stage-major, seeded within stages, and " +
       "degenerates to withTrainingOrder on a constant stage") {
      val staged = bins.withColumn("stage",
        org.apache.spark.sql.functions.pmod($"bin", org.apache.spark.sql.functions.lit(3L)))
      val got = TokenShards.withCurriculumOrder(staged, "stage", "seed-a")
        .select($"shard", $"bin", $"stage", $"train_seq")
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      assert(got.values.map(_._2).toSeq.sorted == (0L until 24L))
      // independent recompute: (stage, md5, shard, bin)
      val md = java.security.MessageDigest.getInstance("MD5")
      def key(sh: Long, b: Long): String =
        md.digest(s"seed-a:$sh:$b".getBytes("UTF-8")).map(x => f"$x%02x").mkString
      val expect = got.toSeq
        .sortBy { case ((sh, b), (st, _)) => (st, key(sh, b), sh, b) }
        .zipWithIndex.map { case (((sh, b), (st, _)), i) => ((sh, b), (st, i.toLong)) }
        .toMap
      assert(got == expect)
      // stage blocks are contiguous along train_seq
      val stagesInOrder = got.values.toSeq.sortBy(_._2).map(_._1)
      assert(stagesInOrder == stagesInOrder.sorted)
      // a constant stage reproduces the plain training order exactly
      val flat = TokenShards.withCurriculumOrder(
        bins.withColumn("stage", org.apache.spark.sql.functions.lit(7L)), "stage", "seed-a")
        .select($"shard", $"bin", $"train_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val plain = TokenShards.withTrainingOrder(bins, "seed-a")
        .select($"shard", $"bin", $"train_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(flat == plain)
      // a null stage fails loudly (it would sort nondeterministically)
      val e = intercept[IllegalArgumentException](
        TokenShards.withCurriculumOrder(
          bins.withColumn("stage",
            org.apache.spark.sql.functions.lit(null).cast("long")), "stage", "seed-a"))
      assert(e.getMessage.contains("non-null"))
    }
  }

  describe("mixtureManifest") {
    it("recounts each shard's (lang, source) composition from the packed doc_lens") {
      val bins = Seq(
        (0L, 0L, Seq(1L, 2L), Seq(5L, 7L), Seq.fill(12)(1L), 2L, 12L),
        (0L, 1L, Seq(3L), Seq(4L), Seq.fill(4)(1L), 1L, 4L),
        (1L, 0L, Seq(4L, 5L), Seq(6L, 2L), Seq.fill(8)(1L), 2L, 8L))
        .toDF("shard", "bin", "doc_ids", "doc_lens", "ids", "n_docs", "n_tokens")
      val meta = Seq((1L, "en", "web"), (2L, "en", "web"), (3L, "de", "web"),
        (4L, "en", "book"), (5L, "en", "web")).toDF("doc_id", "lang", "source")
      val got = TokenShards.mixtureManifest(bins, meta, "doc_id", Seq("lang", "source"))
        .collect().map(r => ((r.getLong(0), r.getString(1), r.getString(2)),
          (r.getLong(3), r.getLong(4)))).toMap
      assert(got === Map(
        (0L, "en", "web") -> ((2L, 12L)),   // docs 1+2: 5+7 ids
        (0L, "de", "web") -> ((1L, 4L)),
        (1L, "en", "book") -> ((1L, 6L)),
        (1L, "en", "web") -> ((1L, 2L))))
    }
  }

  describe("fallbackStats — the tokenizer-drift monitor") {
    it("counts exactly the reserved byte ids [2, 257], boundary-inclusive") {
      import spark.implicits._
      val tokens = Seq(
        // EOS/SPACE (0/1) are NOT fallback; 2 and 257 are the byte-range
        // boundaries; 258 is the first learned symbol
        (1L, Seq(0L, 1L, 2L, 257L, 258L, 300L)),
        (2L, Seq(258L, 259L, 0L)),
        (3L, Seq.empty[Long]))
        .toDF("doc_id", "ids")
      val got = TokenShards.fallbackStats(tokens, "doc_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq === Seq((1L, 6L, 2L), (2L, 3L, 0L), (3L, 0L, 0L)))
    }

    it("a total-scheme encode of unseen codepoints is visible to the monitor " +
       "and an in-vocab corpus is fallback-free") {
      import spark.implicits._
      val corpus = Seq((1L, "low lower")).toDF("doc_id", "text")
      val merges = Seq(("l", "o"), ("lo", "w"))
      val vocab = TokenShards.vocabFromFrameTotal(
        TokenShards.buildVocabTotal(corpus, "text", merges))
      val clean = TokenShards.fallbackStats(
        TokenShards.tokenizeToIdsTotal(corpus, "doc_id", "text", merges, vocab),
        "doc_id").as[(Long, Long, Long)].head()
      assert(clean._3 === 0L)
      // '§' (2 UTF-8 bytes) is out of vocabulary -> exactly 2 byte ids
      val drifted = TokenShards.fallbackStats(
        TokenShards.tokenizeToIdsTotal(
          Seq((1L, "low § lower")).toDF("doc_id", "text"),
          "doc_id", "text", merges, vocab),
        "doc_id").as[(Long, Long, Long)].head()
      assert(drifted._3 === 2L)
      assert(drifted._2 === clean._2 + 3L) // 2 byte ids + 1 word frame
    }
  }

  describe("packUtilization — the padding-waste report") {
    it("computes waste over fittable bins, reports oversize separately, " +
       "and a no-fittable shard reads 1000") {
      import spark.implicits._
      val bins = Seq(
        (0L, 0L, 8L),   // waste 2
        (0L, 1L, 10L),  // waste 0 (exactly full)
        (0L, 2L, 13L),  // OVERSIZE: excess 3, not averaged in
        (1L, 0L, 14L))  // a shard of only-oversize bins
        .toDF("shard", "bin", "n_tokens")
      val got = TokenShards.packUtilization(bins, capacity = 10L)
        .select("shard", "n_bins", "n_tokens", "n_padded_bins", "waste_tokens",
          "n_oversize", "excess_tokens", "utilization_permille")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1)
      assert(got.toSeq === Seq(
        (0L, 3L, 31L, 2L, 2L, 1L, 3L, 900L), // (20-2)*1000 div 20
        (1L, 1L, 14L, 0L, 0L, 1L, 4L, 1000L)))
      intercept[IllegalArgumentException](TokenShards.packUtilization(bins, 0L))
    }
  }

  describe("fallbackRuns / vocabProposals — the vocabulary-update shortlist") {
    import spark.implicits._
    def byteIds(s: String): Seq[Long] =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => TokenShards.firstByteId + (b & 0xff).toLong).toSeq

    it("extracts MAXIMAL runs (adjacent byte ids concatenate; any in-vocab " +
       "token splits) and decodes them strictly") {
      val tokens = Seq(
        // [§ß][space][€][EOS] -> two runs; the symbol id 300 splits a third
        (1L, byteIds("§ß") ++ Seq(1L) ++ byteIds("€") ++ Seq(0L)),
        (2L, byteIds("¶") ++ Seq(300L) ++ byteIds("¶") ++ Seq(0L)),
        (3L, Seq(300L, 0L)))
        .toDF("doc_id", "ids")
      val got = TokenShards.fallbackRuns(tokens, "doc_id")
        .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq === Seq((1L, "§ß", 4L), (1L, "€", 3L),
        (2L, "¶", 2L), (2L, "¶", 2L)))
      // a torn multi-byte run (half of '§') fails loudly, never U+FFFD
      val torn = Seq((1L, byteIds("§").take(1) :+ 0L)).toDF("doc_id", "ids")
      val e = intercept[Exception](TokenShards.fallbackRuns(torn, "doc_id").collect())
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("not valid UTF-8"), msg)
    }

    it("proposals rank by (count desc, text asc), truncate at k, and are " +
       "partitioning-invariant") {
      val runs = (Seq.fill(5)("aa") ++ Seq.fill(3)("bb") ++ Seq.fill(3)("ab") ++
        Seq.fill(1)("zz")).zipWithIndex
        .map { case (t, i) => (i.toLong, t, t.getBytes("UTF-8").length.toLong) }
        .toDF("doc_id", "run_text", "n_bytes")
      val got = TokenShards.vocabProposals(runs, 3)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq === Seq((1L, "aa", 5L, 2L), (2L, "ab", 3L, 2L),
        (3L, "bb", 3L, 2L)))
      val again = TokenShards.vocabProposals(runs.repartition(7), 3)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1)
      assert(again.toSeq === got.toSeq)
      intercept[IllegalArgumentException](TokenShards.vocabProposals(runs, 0))
    }
  }
}
