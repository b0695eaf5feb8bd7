package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sorted.syntax._

/**
 * TRAIN-READY TOKEN SHARDS — the last mile of the pipeline: compose the
 * standing tokenizer ([[Bpe]] merge table), the corpus, and next-fit
 * sequence packing ([[Packing]]'s rule) into the artifact a trainer
 * actually loads — fixed-context sequences of TOKEN IDS, exported
 * through the deterministic staged-publish shard writer
 * ([[graft.sources.Export]]). Everything upstream (clean, dedup, select,
 * train the tokenizer) exists to produce exactly this output.
 *
 * The id scheme is a standing artifact like the merge table itself:
 * id 0 = EOS (document boundary), id 1 = SPACE (inter-word boundary),
 * ids 2.. = the tokenizer's output symbols in lexicographic order. The
 * explicit SPACE token is what makes the encoding LOSSLESS over the
 * normalized token stream: BPE symbols never contain whitespace, so
 * without it a decoder could not recover word boundaries. Decoding is
 * pure concatenation — `detokenize(tokenize(text)) ==
 * edge-stripped-tokens-of(text) joined by single spaces` exactly, the
 * gate q237 carries in-query.
 *
 * SCALE SHAPE:
 *  - the VOCABULARY derives from the distinct-word frame (Heaps-bounded)
 *    and is symbol-count-sized — a model artifact, stored once
 *    ([[Bpe.mergesFrame]] discipline) and broadcast at apply time;
 *  - TOKENIZATION is one narrow corpus pass: the merge loop runs once
 *    per distinct word per task (a per-partition memo map — the
 *    [[WordFrames.memoizedTokenCounts]] insight applied task-side, with
 *    no join because the output here is the id SEQUENCE, not a count);
 *  - PACKING + SEQUENCE ASSEMBLY is ONE exchange: the group-sort shuffle
 *    establishes per-shard doc order, then a single streaming pass runs
 *    next-fit AND assembles each bin's id sequence as it closes —
 *    capacity-bounded state per task, bins never cross shards, shard
 *    count is the parallelism knob at 100 TB exactly as in [[Packing]].
 */
object TokenShards {

  /** Reserved ids: document boundary and inter-word boundary. */
  val eosId: Long = 0L
  val spaceId: Long = 1L
  val firstSymbolId: Long = 2L

  /**
   * BYTE-FALLBACK (TOTAL) id scheme — the SentencePiece `byte_fallback` /
   * GPT-2 byte-level rule (public knowledge): 256 ids are reserved for
   * the raw bytes (`[firstByteId, firstByteId+255]`, id = firstByteId +
   * byte value) and vocabulary symbols start at [[totalFirstSymbolId]].
   * A symbol ABSENT from the standing vocabulary encodes as its UTF-8
   * bytes instead of failing, so encoding is TOTAL: no input can be
   * unencodable, the vocabulary is a CLOSED standing artifact across
   * releases, and the streaming token-id store survives a micro-batch
   * carrying a never-seen codepoint. Decoding buffers maximal byte-id
   * runs and UTF-8-decodes them in one piece — segmenters split on
   * codepoint boundaries, so each fallback symbol contributes whole,
   * valid UTF-8 sequences and the round trip stays exact. The STRICT
   * scheme above remains the frozen-release contract (q237): there, an
   * OOV symbol is a corpus/vocabulary mismatch that must fail loudly.
   * The two schemes are deliberately id-incompatible (symbol ids 2..257
   * mean bytes only in the total scheme); the loaders and encoders
   * `require` the right id range so a mixed artifact fails at the door.
   */
  val firstByteId: Long = firstSymbolId
  val totalFirstSymbolId: Long = firstByteId + 256L

  /**
   * Vocabulary induction: every distinct symbol the merge table emits
   * over the corpus's distinct words, as a store-able `(id, symbol)`
   * frame — ids from [[firstSymbolId]] in lexicographic symbol order
   * (deterministic for a given corpus + merges). The symbol frame is
   * vocabulary-bounded, so the final ordering collect is guarded like
   * every model-sized collect (`maxVocab`).
   */
  def buildVocab(docs: DataFrame, textCol: String, merges: Seq[(String, String)],
      maxVocab: Int = 4000000): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty")
    val ranks = merges.zipWithIndex.toMap
    buildVocabWith(docs, textCol, maxVocab)(w => Bpe.applyMerges(w, ranks))
  }

  /** [[buildVocab]] generalized over the SEGMENTER — any trained
    * tokenizer whose apply rule maps a word to a symbol sequence (BPE
    * merge replay, unigram Viterbi, ...) induces an id table through the
    * same machinery; the shard format does not care which family
    * trained it. */
  def buildVocabWith(docs: DataFrame, textCol: String, maxVocab: Int = 4000000)(
      segment: String => Seq[String]): DataFrame =
    buildVocabImpl(docs, textCol, maxVocab, firstSymbolId)(segment)

  /** [[buildVocab]] in the TOTAL (byte-fallback) id scheme: symbol ids
    * start at [[totalFirstSymbolId]], leaving [2, 257] for the reserved
    * byte ids. Same induction, different id origin — the vocab frame is
    * what marks an artifact as strict vs total. */
  def buildVocabTotal(docs: DataFrame, textCol: String, merges: Seq[(String, String)],
      maxVocab: Int = 4000000): DataFrame = {
    require(merges.nonEmpty, "merges must be non-empty")
    val ranks = merges.zipWithIndex.toMap
    buildVocabTotalWith(docs, textCol, maxVocab)(w => Bpe.applyMerges(w, ranks))
  }

  /** [[buildVocabWith]] in the TOTAL id scheme. */
  def buildVocabTotalWith(docs: DataFrame, textCol: String, maxVocab: Int = 4000000)(
      segment: String => Seq[String]): DataFrame =
    buildVocabImpl(docs, textCol, maxVocab, totalFirstSymbolId)(segment)

  private def buildVocabImpl(docs: DataFrame, textCol: String, maxVocab: Int,
      firstId: Long)(segment: String => Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val symbols = docs.where(col(textCol).isNotNull)
      .select(explode(graft.functions.Text.edgeStrippedTokens(col(textCol))).as("w"))
      .distinct()
      .as[String]
      .flatMap(w => segment(w))
      .distinct()
      .orderBy(col("value").asc)
      .limit(maxVocab + 1)
      .collect()
    require(symbols.length <= maxVocab,
      s"symbol inventory exceeds maxVocab=$maxVocab — not a vocabulary-sized corpus slice")
    symbols.zipWithIndex
      .map { case (s, i) => (firstId + i, s) }
      .toSeq.toDF("id", "symbol")
  }

  /** Load a [[buildVocab]] frame back as the symbol→id map (guarded
    * collect — vocabulary-sized by contract). */
  def vocabFromFrame(df: DataFrame, maxEntries: Int = 4000000): Map[String, Long] =
    vocabFromFrameImpl(df, maxEntries, firstSymbolId, "EOS/SPACE")

  /** Load a [[buildVocabTotal]] frame back — `require`s every id above
    * the reserved byte range, so a STRICT-scheme frame (symbol ids from
    * 2) fails at the door instead of silently aliasing bytes. */
  def vocabFromFrameTotal(df: DataFrame, maxEntries: Int = 4000000): Map[String, Long] =
    vocabFromFrameImpl(df, maxEntries, totalFirstSymbolId, "EOS/SPACE/byte")

  private def vocabFromFrameImpl(df: DataFrame, maxEntries: Int, minId: Long,
      reservedDesc: String): Map[String, Long] = {
    val rows = df.limit(maxEntries + 1).collect()
    require(rows.length <= maxEntries,
      s"vocab frame exceeds maxEntries=$maxEntries — not a vocabulary-sized frame")
    val m = rows.map(r => (r.getString(1), r.getLong(0))).toMap
    require(m.size == rows.length, "vocab frame carries duplicate symbols")
    require(!m.valuesIterator.exists(_ < minId),
      s"vocab frame assigns an id below $minId — collides with the $reservedDesc ids")
    m
  }

  /**
   * Tokenize documents to id sequences: `(idCol, ids, n_tokens)` where
   * `ids` = per-word symbol ids joined by [[spaceId]], closed by one
   * [[eosId]]. Documents with no tokens (null/blank text) are dropped —
   * the [[Bpe.tokenCounts]] contract; a worded doc therefore encodes to
   * exactly `sum(word symbol counts) + word count` ids (n-1 spaces + 1
   * EOS). A word producing a symbol OUTSIDE the vocabulary fails loudly
   * — the vocabulary is a standing artifact and silent id invention
   * would corrupt every downstream shard.
   */
  def tokenizeToIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], vocab: Map[String, Long]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    tokenizeToIdsWith(docs, idCol, textCol, vocab)(w => Bpe.applyMerges(w, ranks))
  }

  /** [[tokenizeToIds]] generalized over the segmenter (the
    * [[buildVocabWith]] dual): the SAME segmenter that induced the vocab
    * must encode, or the loud OOV contract fires. */
  def tokenizeToIdsWith(docs: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long])(segment: String => Seq[String]): DataFrame =
    tokenizeImpl(docs, idCol, textCol, vocab, total = false)(segment)

  /** [[tokenizeToIds]] in the TOTAL (byte-fallback) scheme: a symbol
    * outside the standing vocabulary encodes as its UTF-8 bytes through
    * the reserved byte ids instead of failing — encoding is total, so
    * the vocabulary stays a closed artifact across releases and no
    * input (a novel codepoint, a new script, binary junk in a crawl) can
    * kill an export or a streaming micro-batch. */
  def tokenizeToIdsTotal(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], vocab: Map[String, Long]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    tokenizeToIdsTotalWith(docs, idCol, textCol, vocab)(w => Bpe.applyMerges(w, ranks))
  }

  /** [[tokenizeToIdsTotal]] generalized over the segmenter. */
  def tokenizeToIdsTotalWith(docs: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long])(segment: String => Seq[String]): DataFrame =
    tokenizeImpl(docs, idCol, textCol, vocab, total = true)(segment)

  private def tokenizeImpl(docs: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long], total: Boolean)(
      segment: String => Seq[String]): DataFrame = {
    // scheme guard at the door: a strict-scheme vocab (symbol ids from 2)
    // fed to the total encoder would alias the byte range silently
    if (total) require(!vocab.valuesIterator.exists(_ < totalFirstSymbolId),
      s"total-scheme encoding needs a byte-fallback vocab (ids >= $totalFirstSymbolId) — " +
        "build it with buildVocabTotal, not buildVocab")
    val spark = docs.sparkSession
    import spark.implicits._
    val bcVocab = spark.sparkContext.broadcast(vocab)
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-task memoization: the segmenter runs once per DISTINCT word
        // seen by this task — Zipf makes the hit rate overwhelming
        val memo = scala.collection.mutable.HashMap.empty[String, Array[Long]]
        val v = bcVocab.value
        def encodeSymbol(s: String, w: String): Array[Long] = v.get(s) match {
          case Some(id) => Array(id)
          case None if total =>
            // byte fallback: whole, valid UTF-8 byte runs per symbol —
            // the decoder's maximal-run UTF-8 decode reverses this exactly
            s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              .map(b => firstByteId + (b & 0xff).toLong)
          case None => throw new IllegalArgumentException(
            s"symbol '$s' (word '$w') is not in the standing vocabulary — " +
              "rebuild the vocab artifact over this corpus before exporting")
        }
        def encodeWord(w: String): Array[Long] =
          memo.getOrElseUpdate(w, segment(w).toArray.flatMap(s => encodeSymbol(s, w)))
        it.flatMap { case (id, text) =>
          val words = graft.functions.Text.segmentText(text)
          if (words.isEmpty) None
          else {
            val out = Array.newBuilder[Long]
            var i = 0
            while (i < words.length) {
              if (i > 0) out += spaceId
              out ++= encodeWord(words(i))
              i += 1
            }
            out += eosId
            val ids = out.result()
            Some((id, ids, ids.length.toLong))
          }
        }
      }
      .toDF(idCol, "ids", "n_tokens")
  }

  /** Decode one id sequence back to its normalized text — the inverse
    * the losslessness gate replays: symbols concatenate, [[spaceId]]
    * becomes one space, [[eosId]] ends the document. */
  def detokenize(ids: Seq[Long], idToSymbol: Map[Long, String]): String = {
    val sb = new StringBuilder
    ids.foreach { id =>
      if (id == spaceId) sb.append(' ')
      else if (id != eosId) sb.append(idToSymbol.getOrElse(id,
        throw new IllegalArgumentException(s"unknown token id $id")))
    }
    sb.toString
  }

  /** STRICT byte-run decode: the encoder only ever emits whole valid
    * UTF-8 per symbol, so an invalid run marks a corrupted or foreign
    * artifact — fail loudly (the strict scheme's unknown-id discipline),
    * never smuggle U+FFFD replacement chars into training text. Shared
    * by [[detokenizeTotal]] and [[fallbackRuns]] so the strictness
    * contract cannot fork. */
  private[operators] def decodeUtf8Strict(bytes: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch {
      case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          "byte-id run is not valid UTF-8 — corrupted or foreign total-scheme artifact", e)
    }
  }

  /** [[detokenize]] in the TOTAL scheme: maximal runs of reserved byte
    * ids buffer and UTF-8-decode in one piece (adjacent fallback symbols
    * concatenate to one valid byte sequence — decoding per-id would tear
    * multi-byte codepoints apart), symbol ids decode through the vocab. */
  def detokenizeTotal(ids: Seq[Long], idToSymbol: Map[Long, String]): String = {
    val sb = new StringBuilder
    val run = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (run.size > 0) {
      sb.append(decodeUtf8Strict(run.toByteArray))
      run.reset()
    }
    ids.foreach { id =>
      if (id == spaceId) { flush(); sb.append(' ') }
      else if (id == eosId) flush()
      else if (id >= firstByteId && id < totalFirstSymbolId)
        run.write((id - firstByteId).toInt)
      else {
        flush()
        sb.append(idToSymbol.getOrElse(id,
          throw new IllegalArgumentException(s"unknown token id $id")))
      }
    }
    flush()
    sb.toString
  }

  /**
   * Decode a packed-bin frame (`doc_ids`, `ids` columns — the
   * [[packSequences]] shape, typically read back from a published
   * export) to per-document normalized text: split each bin's id
   * sequence on [[eosId]] (one EOS-terminated segment per packed doc,
   * in order), zip with `doc_ids`, [[detokenize]] each. This is THE
   * inverse contract the losslessness gates replay — owned here once so
   * the gate queries and the spec cannot drift apart; a bin that does
   * not parse back into exactly its documents fails loudly.
   */
  def decodeBins(bins: DataFrame, vocab: Map[String, Long]): DataFrame =
    decodeBinsImpl(bins, vocab, total = false)

  /** [[decodeBins]] for TOTAL-scheme artifacts — same EOS-split inverse
    * contract, byte-fallback-aware per-segment decode. */
  def decodeBinsTotal(bins: DataFrame, vocab: Map[String, Long]): DataFrame =
    decodeBinsImpl(bins, vocab, total = true)

  /** [[decodeBins]] with PLACEMENT kept: `(key, pos, doc_id, detok)`
    * where `key` is the caller's bin-key column and `pos` the document's
    * 0-based position within its bin. The positional attribution is what
    * artifact-level audits need — a release-decontamination probe has to
    * reason about which documents are PACK-ADJACENT (a naive prober that
    * concatenates a bin's documents would see n-grams spanning the
    * boundary), and a loader-resume manifest addresses documents by
    * (bin, position). Same EOS-split inverse contract as [[decodeBins]]. */
  def decodeBinsIndexed(bins: DataFrame, keyCol: String,
      vocab: Map[String, Long]): DataFrame =
    decodeBinsIndexedImpl(bins, keyCol, vocab, total = false)

  /** [[decodeBinsIndexed]] for TOTAL-scheme artifacts. */
  def decodeBinsTotalIndexed(bins: DataFrame, keyCol: String,
      vocab: Map[String, Long]): DataFrame =
    decodeBinsIndexedImpl(bins, keyCol, vocab, total = true)

  private def decodeBinsIndexedImpl(bins: DataFrame, keyCol: String,
      vocab: Map[String, Long], total: Boolean): DataFrame = {
    val spark = bins.sparkSession
    import spark.implicits._
    val bcRev = spark.sparkContext.broadcast(vocab.map(_.swap))
    bins.select(col(keyCol).cast("long"), col("doc_ids"), col("ids"))
      .as[(Long, Seq[Long], Seq[Long])]
      .flatMap { case (key, docIds, ids) =>
        val segs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
        ids.foreach { id =>
          cur += id
          if (id == eosId) {
            segs += cur.toSeq
            cur = scala.collection.mutable.ArrayBuffer.empty[Long]
          }
        }
        require(cur.isEmpty && segs.length == docIds.length,
          "bin sequence does not parse back into its documents")
        docIds.zip(segs).zipWithIndex.map { case ((d, seg), i) =>
          (key, i.toLong, d,
            if (total) detokenizeTotal(seg, bcRev.value) else detokenize(seg, bcRev.value))
        }
      }
      .toDF("key", "pos", "doc_id", "detok")
  }

  private def decodeBinsImpl(bins: DataFrame, vocab: Map[String, Long],
      total: Boolean): DataFrame = {
    val spark = bins.sparkSession
    import spark.implicits._
    val bcRev = spark.sparkContext.broadcast(vocab.map(_.swap))
    bins.select(col("doc_ids"), col("ids"))
      .as[(Seq[Long], Seq[Long])]
      .flatMap { case (docIds, ids) =>
        val segs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
        ids.foreach { id =>
          cur += id
          if (id == eosId) {
            segs += cur.toSeq
            cur = scala.collection.mutable.ArrayBuffer.empty[Long]
          }
        }
        require(cur.isEmpty && segs.length == docIds.length,
          "bin sequence does not parse back into its documents")
        docIds.zip(segs).map { case (d, seg) =>
          (d, if (total) detokenizeTotal(seg, bcRev.value) else detokenize(seg, bcRev.value))
        }
      }
      .toDF("doc_id", "detok")
  }

  /**
   * Pack tokenized documents into fixed-context training sequences:
   * `(shard, bin, doc_ids, doc_lens, ids, n_docs, n_tokens)` — one row
   * per bin, its id sequence the concatenation of its documents'
   * sequences in doc-id order (each already EOS-terminated by
   * [[tokenizeToIds]]). `doc_lens` carries each packed document's id
   * count in the same order as `doc_ids` — the ATTENTION-BOUNDARY
   * metadata a trainer needs to mask cross-document attention inside a
   * packed context without re-scanning for EOS (the boundaries are also
   * recoverable from the ids themselves — [[decodeBins]] proves it —
   * but a loader wants them as offsets, not a scan).
   * Placement is `doc_id % nShards`; within a shard the packing rule is
   * [[Packing.packGreedy]]'s next-fit over `n_tokens` (an oversize doc
   * still gets a bin of its own — a document must never be lost to a
   * bound). ONE exchange: the group-sort shuffle; next-fit and bin
   * assembly then stream in the same pass with capacity-bounded state.
   */
  /**
   * SHARD-LEVEL MIXTURE MANIFEST — the data-mixture bookkeeping a
   * trainer's data card needs: for every pack shard, its composition
   * over the given metadata dimensions (typically `lang`, `source`) as
   * `(shard, dims..., n_docs, n_tokens)`. `n_tokens` sums the packed
   * `doc_lens` (id counts INCLUDING the inter-word SPACEs and closing
   * EOS — exactly what the shard ships), so the manifest reconciles
   * against the artifact byte-for-token. Each document lives in exactly
   * one bin (the [[packSequences]] invariant), so `n_docs` is a plain
   * count. SCALE SHAPE: one explode riding the pack output, one hash
   * join to the metadata frame (AQE broadcasts a small dimension side),
   * one map-side-combined aggregation — dimension-cardinality-sized
   * output, a registry row set, never corpus-sized.
   */
  def mixtureManifest(bins: DataFrame, docMeta: DataFrame, idCol: String,
      dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "at least one mixture dimension is required")
    // loud join contracts — the manifest's whole point is that it
    // RECONCILES against the artifact byte-for-token, so a doc missing
    // from the metadata (silently undercounting) or duplicated in it
    // (silently double-counting) must fail, not skew the data card
    require(docMeta.groupBy(col(idCol)).agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1).isEmpty,
      s"docMeta carries duplicate $idCol rows — the mixture would double-count")
    val exploded = bins.select(col("shard"),
        explode(arrays_zip(col("doc_ids"), col("doc_lens"))).as("d"))
      .select(col("shard"), col("d.doc_ids").as(idCol), col("d.doc_lens").as("__len"))
    val joined = exploded.join(
      docMeta.withColumn("__present", lit(1)), Seq(idCol), "left")
    require(joined.where(col("__present").isNull).isEmpty,
      "packed documents missing from docMeta — the mixture would undercount; " +
        "feed the SAME corpus slice the shards were packed from")
    joined
      .groupBy((col("shard") +: dims.map(col)): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__len")).as("n_tokens"))
  }

  /**
   * DETERMINISTIC TRAINING-ORDER SHUFFLE — the last step before a loader
   * consumes the shards: packed bins are doc-id-ordered within shards
   * ([[packSequences]] sorts by `doc_id`), so adjacent training sequences
   * are corpus-adjacent — non-IID batches. This assigns each bin a
   * global `train_seq` position under a SEEDED, PARTITIONING-INVARIANT
   * permutation: the order key is `md5(seed:shard:bin)` (the
   * [[Sampling.hash32]] md5 discipline applied to ORDER instead of
   * selection — a pure function of (seed, bin identity), so reruns,
   * repartitionings, and other engines replay the same permutation;
   * ties, astronomically unlikely, break on (shard, bin) so the order is
   * total). A new seed is a fresh epoch-level reshuffle of the SAME
   * artifact.
   *
   * SCALE SHAPE — the PAYLOAD never sorts: ranks are assigned on a
   * SKINNY `(order_key, shard, bin)` projection (24-byte rows — bins
   * carry multi-KB id arrays, and range-sorting those would move the
   * whole artifact through a sort exchange TWICE, once for
   * `zipWithIndex`'s count pass and once for the map; measured 19 s →
   * sub-second on the 10× stress corpus), then join back by (shard,
   * bin) — one hash exchange of the payload at worst, zero when AQE
   * broadcasts the bin-count-sized rank frame. The skinny frame takes
   * the range sort + `zipWithIndex` count pass, the standard
   * distributed global-rank; NEVER a single-partition window
   * (`row_number` over an unpartitioned window is the unbounded-window
   * trap PlanAuditSpec sweeps for).
   */
  def withTrainingOrder(bins: DataFrame, seed: String): DataFrame =
    withOrderImpl(bins, None, seed)

  /**
   * CURRICULUM ORDER — [[withTrainingOrder]] with a STAGE-MAJOR sort:
   * bins order by `(stageCol asc, seeded md5 permutation within stage)`,
   * so a loader walking ascending `train_seq` consumes all of stage 0
   * (shuffled), then stage 1, … — the curriculum / sequence-length-
   * warmup shape (e.g. stage = bucketed longest member document, so
   * early training sees short sequences). Same machinery, same
   * contracts, same scale shape (skinny range sort + `zipWithIndex`,
   * never a single-partition window); the stage column must be
   * long-castable and NON-NULL (a null stage would sort
   * nondeterministically between engines — it fails loudly).
   */
  def withCurriculumOrder(bins: DataFrame, stageCol: String, seed: String): DataFrame =
    withOrderImpl(bins, Some(stageCol), seed)

  private def withOrderImpl(bins: DataFrame, stageCol: Option[String],
      seed: String): DataFrame = {
    require(seed.nonEmpty, "seed must be non-empty — it names the permutation")
    val spark = bins.sparkSession
    import spark.implicits._
    val stage = stageCol.map(c => col(c).cast("long").as("__stage"))
    val keys = bins
      .select(stage.toSeq ++ Seq(
        md5(concat_ws(":", lit(seed), col("shard"), col("bin"))).as("__order_key"),
        col("shard").cast("long").as("shard"), col("bin").cast("long").as("bin")): _*)
    // a null stage would sort nondeterministically between engines — the
    // check is a tiny agg over the skinny key frame (never an in-plan
    // assert: see preferenceCycles on why those can misfire)
    stageCol.foreach { _ =>
      require(keys.where(col("__stage").isNull).isEmpty,
        "curriculum stage must be non-null on every bin")
    }
    // (shard, bin) must be UNIQUE — [[packSequences]] guarantees it, but
    // this is a public API over any bin frame, and a duplicate key would
    // silently CROSS-PRODUCT ranks through the join-back below. The check
    // is one tiny agg over the skinny key frame, never the payload.
    require(keys.groupBy(col("shard"), col("bin")).agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1).isEmpty,
      "duplicate (shard, bin) keys — the training order would be ill-defined")
    val skinny = keys
      .orderBy(stage.map(_ => col("__stage")).toSeq ++
        Seq(col("__order_key"), col("shard"), col("bin")): _*)
      .select(col("shard"), col("bin"))
      .as[(Long, Long)]
    val ranked = skinny.rdd.zipWithIndex
      .map { case ((sh, b), i) => (sh, b, i) }
      .toDF("shard", "bin", "train_seq")
    bins.join(ranked, Seq("shard", "bin"))
  }

  /**
   * FILL-IN-THE-MIDDLE TRANSFORM (public: Bavarian et al. 2022, "Efficient
   * Training of Language Models to Fill in the Middle") — the standard
   * code-corpus training transform: a seeded deterministic fraction of
   * documents is rewritten from `[tokens, EOS]` to PSM order
   * `[PRE, prefix, SUF, suffix, MID, middle, EOS]`, teaching the model to
   * infill `middle` given both sides. Everything is EXACT integer md5
   * arithmetic in the [[Sampling.hash32]] salt discipline, so the oracle
   * replays every decision:
   *  - selection: `hash32(doc_id, seed + ":fim") < rateMilli * 2^32 div
   *    1000` — per-document, partitioning-invariant;
   *  - split points over the `c = n_tokens - 1` content ids (EOS is never
   *    split): `i = hash32(doc_id, seed + ":i") mod (c + 1)`,
   *    `j = i + hash32(doc_id, seed + ":j") mod (c - i + 1)` — any of
   *    prefix/middle/suffix may legitimately be empty, as in the paper.
   * Sentinels are CALLER-ALLOCATED ids above the standing vocabulary
   * (the total scheme keeps 0/1/2..257 reserved; symbols are contiguous
   * from 258, so `vocabMax + 1..3` are free and stable while the
   * vocabulary is the standing artifact it already is). A sentinel
   * colliding with a document's ids would corrupt reassembly — each doc
   * is checked and fails loudly. Unselected documents pass through
   * unchanged (`prefix_len = c`, middle/suffix 0 — AR order is "all
   * prefix"). Narrow: one typed pass, no exchange, payload stays put.
   */
  def fimTransform(tokens: DataFrame, seed: String, rateMilli: Long,
      preId: Long, sufId: Long, midId: Long): DataFrame = {
    require(seed.nonEmpty, "seed must be non-empty — it names the transform")
    require(rateMilli >= 0 && rateMilli <= 1000, s"rateMilli in [0,1000], got $rateMilli")
    val sentinels = Seq(preId, sufId, midId)
    require(sentinels.distinct.size == 3 && sentinels.forall(_ >= totalFirstSymbolId),
      s"sentinel ids must be 3 distinct ids at/above $totalFirstSymbolId " +
        "(above the standing vocabulary's max id), got " + sentinels.mkString(", "))
    val spark = tokens.sparkSession
    import spark.implicits._
    val threshold = (rateMilli * 4294967296L) / 1000L
    tokens.select(col("doc_id").cast("long"), col("ids"))
      .as[(Long, Seq[Long])]
      .map { case (docId, ids) =>
        require(ids.nonEmpty && ids.last == eosId,
          s"doc $docId: ids must be EOS-terminated (the tokenizeToIds shape)")
        require(!ids.exists(sentinels.contains),
          s"doc $docId carries a sentinel id — allocate sentinels above the vocabulary")
        val c = ids.length - 1
        if (Sampling.hash32Local(docId, seed + ":fim") >= threshold) {
          (docId, ids, ids.length.toLong, false, c.toLong, 0L, 0L)
        } else {
          val i = (Sampling.hash32Local(docId, seed + ":i") % (c + 1)).toInt
          val j = i + (Sampling.hash32Local(docId, seed + ":j") % (c - i + 1)).toInt
          val out = (preId +: ids.slice(0, i)) ++ (sufId +: ids.slice(j, c)) ++
            (midId +: ids.slice(i, j)) :+ eosId
          (docId, out, out.length.toLong, true, i.toLong, (j - i).toLong, (c - j).toLong)
        }
      }
      .toDF("doc_id", "ids", "n_tokens", "fim_applied",
        "prefix_len", "middle_len", "suffix_len")
  }

  /** Inverse of [[fimTransform]]: a PSM-ordered document (leading `preId`)
    * reassembles to `[prefix, middle, suffix, EOS]`; any other document
    * passes through. Malformed PSM framing (missing/mis-ordered
    * sentinels) fails loudly — it marks a foreign or corrupted artifact,
    * never a silent partial restore. */
  def fimRestore(tokens: DataFrame, preId: Long, sufId: Long, midId: Long): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col("doc_id").cast("long"), col("ids"))
      .as[(Long, Seq[Long])]
      .map { case (docId, ids) =>
        if (ids.isEmpty || ids.head != preId) (docId, ids, ids.length.toLong)
        else {
          require(ids.last == eosId, s"doc $docId: PSM frame must be EOS-terminated")
          val body = ids.slice(1, ids.length - 1)
          val si = body.indexOf(sufId)
          val mi = body.indexOf(midId)
          require(si >= 0 && mi > si && body.indexOf(preId) < 0 &&
            body.lastIndexOf(sufId) == si && body.lastIndexOf(midId) == mi,
            s"doc $docId: malformed PSM framing")
          val prefix = body.slice(0, si)
          val suffix = body.slice(si + 1, mi)
          val middle = body.slice(mi + 1, body.length)
          val out = (prefix ++ middle ++ suffix) :+ eosId
          (docId, out, out.length.toLong)
        }
      }
      .toDF("doc_id", "ids", "n_tokens")
  }

  /**
   * LOADER-RESUME OFFSET MANIFEST — the prefix-sum artifact that turns
   * the GRBS per-bin index from "locate bin k" into "locate TOKEN t": for
   * an epoch-ordered bin frame ([[withTrainingOrder]]'s `train_seq`,
   * dense 0..N-1), each bin's cumulative global token offset
   * `token_offset = Σ n_tokens over train_seq' < train_seq`. A crashed
   * trainer resumes mid-epoch by binary-searching the manifest for the
   * last `token_offset <= t`, opening that bin through the shard index,
   * and skipping `t - token_offset` ids — no rescan of anything.
   *
   * SCALE SHAPE — a distributed exclusive scan with NO global sort and
   * NO unbounded window: `train_seq` is chunked by VALUE (2^16 per
   * chunk — deterministic arithmetic, not sampling, so recomputation can
   * never re-partition), per-chunk masses aggregate in one pass over the
   * SKINNY projection (the payload never moves) and collect
   * chunk-count-sized (bins/2^16 rows — ~100k rows for 6G bins; guarded),
   * chunk base offsets prefix-sum on the driver and broadcast back, and
   * the within-chunk running sum streams through ONE [[graft.sorted]]
   * group-sort exchange with O(1) state per chunk. The same collected
   * chunk stats verify the DENSE 0..N-1 contract chunk-locally
   * (count == distinct, min/max pin the range, interior chunks full) —
   * a duplicate or missing sequence number fails loudly before any
   * offset is emitted.
   */
  def offsetManifest(ordered: DataFrame): DataFrame = {
    val spark = ordered.sparkSession
    import spark.implicits._
    val chunkWidth = 1L << 16
    val skinny = ordered.select(col("train_seq").cast("long").as("train_seq"),
      col("shard").cast("long").as("shard"), col("bin").cast("long").as("bin"),
      col("n_tokens").cast("long").as("n_tokens"))
    val stats = skinny
      .groupBy(expr(s"train_seq div $chunkWidth").as("__chunk"))
      .agg(sum(col("n_tokens")).as("__mass"), count(lit(1)).as("__n"),
        countDistinct(col("train_seq")).as("__nd"),
        min(col("train_seq")).as("__mn"), max(col("train_seq")).as("__mx"))
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect()
    require(stats.length <= (1 << 22),
      s"offsetManifest: ${stats.length} chunks (> 2^22) — the chunk-base " +
        "collect would exceed its driver budget; raise chunkWidth deliberately")
    val sorted = stats.sortBy(_._1)
    sorted.zipWithIndex.foreach { case ((c, _, n, nd, mn, mx), i) =>
      require(c == i && n == nd && mn == c * chunkWidth && mx == mn + n - 1 &&
        (i == sorted.length - 1 || n == chunkWidth),
        "offsetManifest: train_seq must be dense 0..N-1 (withTrainingOrder's " +
          s"contract) — chunk $c has count=$n distinct=$nd min=$mn max=$mx")
    }
    // exclusive prefix: bases(i) = total mass of chunks 0..i-1
    val bases = sorted.map(_._2).scanLeft(0L)(_ + _).init
    val bc = spark.sparkContext.broadcast(bases)
    val kv = skinny.select(expr(s"train_seq div $chunkWidth").as("_1"),
        struct(col("train_seq"), col("shard"), col("bin"), col("n_tokens")).as("_2"))
      .as[(Long, (Long, Long, Long, Long))]
    kv.groupSort(sortBy = _.getField("train_seq"))
      .mapStreamByKey { vs =>
        new Iterator[(Long, Long, Long, Long, Long)] {
          private var run = Long.MinValue
          def hasNext: Boolean = vs.hasNext
          def next(): (Long, Long, Long, Long, Long) = {
            val (seq, sh, b, n) = vs.next()
            if (run == Long.MinValue) run = bc.value((seq / chunkWidth).toInt)
            val o = run; run += n
            (seq, sh, b, n, o)
          }
        }
      }
      .map(_._2)
      .toDF("train_seq", "shard", "bin", "n_tokens", "token_offset")
  }

  /**
   * PACKING-UTILIZATION REPORT — the $-per-token metric of a packed
   * release: a fixed-length trainer pads every bin to `capacity`, so
   * wasted slots are wasted compute. Per shard: bin/token counts, the
   * padding waste over fittable bins (`capacity - n_tokens` each), and
   * the OVERSIZE population separately (next-fit emits an over-capacity
   * record whole rather than losing it; a fixed-length loader must
   * truncate or length-class those, so hiding them inside an average
   * would overstate utilization). `utilization_permille` is integer
   * fixed-point over the padded slots only; a shard with no fittable
   * bins reports 1000 (no padded slots, nothing wasted). One
   * aggregation over the bin frame's skinny columns.
   */
  def packUtilization(bins: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val fits = col("n_tokens") <= capacity
    bins.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(fits, 1L).otherwise(0L)).as("n_padded_bins"),
        sum(when(fits, lit(capacity) - col("n_tokens")).otherwise(0L))
          .as("waste_tokens"),
        sum(when(fits, 0L).otherwise(1L)).as("n_oversize"),
        sum(when(fits, 0L).otherwise(col("n_tokens") - capacity))
          .as("excess_tokens"))
      .withColumn("utilization_permille",
        when(col("n_padded_bins") === 0L, 1000L).otherwise(
          expr(s"(n_padded_bins * $capacity - waste_tokens) * 1000 " +
            s"div (n_padded_bins * $capacity)")))
  }

  /**
   * Split packed bins back into records by the BOUNDARY METADATA
   * (`doc_ids`/`doc_lens`), NOT by EOS — the splitter for record
   * artifacts whose payloads legitimately contain INTERIOR EOS ids
   * (SFT conversations end every turn with EOS, so [[decodeBins]]'s
   * EOS-split contract cannot apply to them). One narrow typed pass;
   * a bin whose lens do not tile its ids exactly fails loudly.
   */
  def splitBinsByLens(bins: DataFrame): DataFrame = {
    val spark = bins.sparkSession
    import spark.implicits._
    bins.select(col("doc_ids").cast("array<bigint>"),
        col("doc_lens").cast("array<bigint>"), col("ids").cast("array<bigint>"))
      .as[(Seq[Long], Seq[Long], Seq[Long])]
      .flatMap { case (docIds, docLens, ids) =>
        require(docIds.length == docLens.length, "doc_ids and doc_lens lengths differ")
        require(docLens.sum == ids.length.toLong,
          s"doc_lens (sum ${docLens.sum}) do not tile the bin's ${ids.length} ids")
        var off = 0
        docIds.iterator.zip(docLens.iterator).map { case (d, l) =>
          val s = ids.slice(off, off + l.toInt)
          off += l.toInt
          (d, s)
        }.toSeq
      }
      .toDF("doc_id", "ids")
  }

  /** [[splitBinsByLens]] for MASKED bins: slice `ids` AND the parallel
    * `mask` channel by the same boundary metadata in one typed pass —
    * the masked-artifact read-back previously re-read and re-split the
    * whole artifact once per channel and joined the halves back
    * (guide §5: don't pay one pass twice). A mask that does not tile
    * the ids fails loudly, like the lens contract. */
  def splitMaskedBinsByLens(bins: DataFrame): DataFrame = {
    val spark = bins.sparkSession
    import spark.implicits._
    bins.select(col("doc_ids").cast("array<bigint>"),
        col("doc_lens").cast("array<bigint>"), col("ids").cast("array<bigint>"),
        col("mask").cast("array<bigint>"))
      .as[(Seq[Long], Seq[Long], Seq[Long], Seq[Long])]
      .flatMap { case (docIds, docLens, ids, mask) =>
        require(docIds.length == docLens.length, "doc_ids and doc_lens lengths differ")
        require(docLens.sum == ids.length.toLong,
          s"doc_lens (sum ${docLens.sum}) do not tile the bin's ${ids.length} ids")
        require(mask.length == ids.length,
          s"mask (${mask.length}) does not tile the bin's ${ids.length} ids")
        var off = 0
        docIds.iterator.zip(docLens.iterator).map { case (d, l) =>
          val s = ids.slice(off, off + l.toInt)
          val m = mask.slice(off, off + l.toInt)
          off += l.toInt
          (d, s, m)
        }.toSeq
      }
      .toDF("doc_id", "ids", "mask")
  }

  /**
   * TOKENIZER-DRIFT MONITOR — byte-fallback mass per record. The total
   * scheme ([[tokenizeToIdsTotal]]) keeps encoding TOTAL by decomposing
   * unseen symbols into raw-byte ids ([[firstByteId]], 2..257); the RATE
   * of those ids is the standing signal that the vocabulary no longer
   * fits the corpus (new script, new domain, new jargon) and the
   * tokenizer should retrain — byte-fallback tokens are semantically
   * valid but ~3-4x less efficient per character than learned symbols,
   * so a rising rate silently inflates every downstream token budget.
   * Emits `(idCol, n_tokens, n_fallback)` in one narrow pass (a
   * projection over the scan — no exchange, the payload never moves);
   * callers aggregate per shard/batch/day and alert on the ratio.
   */
  def fallbackStats(tokens: DataFrame, idCol: String): DataFrame =
    tokens.select(col(idCol),
      size(col("ids")).cast("long").as("n_tokens"),
      size(filter(col("ids"), i =>
        i >= lit(firstByteId) && i < lit(totalFirstSymbolId)))
        .cast("long").as("n_fallback"))

  /**
   * The drift loop's second half ([[fallbackStats]] DETECTS; this
   * PROPOSES): extract every MAXIMAL run of reserved byte ids from a
   * total-scheme token frame and decode it strictly — each run is an
   * out-of-vocabulary surface form the standing vocabulary had to spell
   * in bytes, i.e. exactly the unit whose adoption as a learned symbol
   * would reclaim that fallback mass. Runs are maximal spans between
   * in-vocab tokens (adjacent unseen codepoints concatenate — they were
   * one surface unit in the source). One narrow typed pass; records
   * without fallback contribute nothing. Emits `(idCol, run_text,
   * n_bytes)`, one row per run occurrence.
   */
  def fallbackRuns(tokens: DataFrame, idCol: String): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(idCol).cast("long"), col("ids"))
      .as[(Long, Seq[Long])]
      .flatMap { case (id, ids) =>
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
        val run = new java.io.ByteArrayOutputStream()
        def flush(): Unit = if (run.size > 0) {
          runs += ((id, decodeUtf8Strict(run.toByteArray), run.size.toLong))
          run.reset()
        }
        (if (ids == null) Seq.empty[Long] else ids).foreach { t =>
          if (t >= firstByteId && t < totalFirstSymbolId)
            run.write((t - firstByteId).toInt)
          else flush()
        }
        flush()
        runs
      }
      .toDF(idCol, "run_text", "n_bytes")
  }

  /**
   * Rank [[fallbackRuns]] surface forms into a VOCABULARY-UPDATE
   * PROPOSAL — the top-k out-of-vocabulary units by occurrence, the
   * frame a tokenizer-retrain job consumes to extend the standing
   * vocabulary where the corpus actually drifted. Deterministic order
   * (count desc, text asc); the rank is computed by a k-bounded
   * broadcast self-join over the ALREADY-truncated top-k (k² driver-free
   * comparisons, no window) so the aggregation stays one exchange and
   * the scan-side mass never sorts globally.
   */
  def vocabProposals(runs: DataFrame, k: Int): DataFrame = {
    require(k > 0 && k <= 65536, s"k must be in (0, 65536], got $k")
    val top = runs.groupBy(col("run_text"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("n_bytes")).as("n_bytes"))
      .orderBy(col("n_occurrences").desc, col("run_text"))
      .limit(k)
    val peers = broadcast(top.select(col("run_text").as("__rt"),
      col("n_occurrences").as("__n")))
    top.join(peers,
        col("__n") > col("n_occurrences") ||
          (col("__n") === col("n_occurrences") && col("__rt") < col("run_text")),
        "left")
      .groupBy(col("run_text"), col("n_occurrences"), col("n_bytes"))
      .agg((count(col("__rt")) + 1L).as("rank"))
      .select(col("rank"), col("run_text"), col("n_occurrences"), col("n_bytes"))
  }

  def packSequences(tokens: DataFrame, idCol: String, nShards: Int,
      capacity: Long): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = tokens.sparkSession
    import spark.implicits._
    val keyed = tokens.select(
        pmod(col(idCol), lit(nShards.toLong)).as("_1"),
        struct(col(idCol).cast("long").as("doc_id"), col("n_tokens").cast("long").as("n"),
          col("ids")).as("_2"))
      .as[(Long, (Long, Long, Array[Long]))]
    keyed.groupSort(sortBy = _.getField("doc_id"))
      .mapStreamByKey { vs =>
        // streaming next-fit + assembly: one capacity-bounded bin buffer
        new Iterator[(Long, Array[Long], Array[Long], Array[Long], Long, Long)] {
          private var bin = 0L
          private var fill = 0L
          private val docIds = scala.collection.mutable.ArrayBuffer.empty[Long]
          private val docLens = scala.collection.mutable.ArrayBuffer.empty[Long]
          private val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
          private def closeBin(): (Long, Array[Long], Array[Long], Array[Long], Long, Long) = {
            val row = (bin, docIds.toArray, docLens.toArray, ids.toArray,
              docIds.length.toLong, fill)
            docIds.clear(); docLens.clear(); ids.clear()
            bin += 1L; fill = 0L
            row
          }
          private def buffer(docId: Long, docTok: Array[Long]): Unit = {
            docIds += docId; docLens += docTok.length.toLong; ids ++= docTok
          }
          // docIds.nonEmpty, not fill > 0: a zero-token document buffered
          // right after an oversize-bin close has fill == 0 but must still
          // emit — a document is never lost to a bound (tokenizeToIds
          // never produces n == 0, but this is a public API over any
          // (id, ids, n_tokens) frame)
          def hasNext: Boolean = vs.hasNext || docIds.nonEmpty
          def next(): (Long, Array[Long], Array[Long], Array[Long], Long, Long) = {
            while (vs.hasNext) {
              val (docId, n, docTok) = vs.next()
              if (fill > 0L && fill + n > capacity) {
                val closed = closeBin()
                buffer(docId, docTok); fill = n
                return closed
              }
              buffer(docId, docTok); fill += n
            }
            closeBin()
          }
        }
      }
      .map { case (shard, (bin, docIds, docLens, ids, nDocs, nTok)) =>
        (shard, bin, docIds, docLens, ids, nDocs, nTok)
      }
      .toDF("shard", "bin", "doc_ids", "doc_lens", "ids", "n_docs", "n_tokens")
  }
}
