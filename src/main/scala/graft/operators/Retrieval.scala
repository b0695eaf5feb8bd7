package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval scoring and rank fusion — the search half of a
 * training-data curation stack (mining docs relevant to a probe query,
 * fusing lexical and vector rankings before dedup/decontamination).
 *
 * Engine-exact discipline: no transcendentals. BM25's usual `ln` idf is
 * replaced by its ratio core `(N - df + 0.5) / (df + 0.5)` (the
 * Robertson-Sparck Jones odds without the log damping); every remaining op
 * is IEEE +,*,/ — correctly rounded, so two engines evaluating the SAME
 * expression tree produce bit-identical doubles — and each per-(doc, term)
 * contribution is scaled to `round(x * 1e9)` BIGINT before the order-free
 * integer SUM (float summation order is partition-dependent; integer
 * summation is not).
 */
object Retrieval {

  /**
   * BM25-style relevance of every document to a fixed bag of query terms.
   *
   * One pass tokenizes (whitespace split, Java-trim edges — the q64/q21
   * oracle convention), then:
   *  - `dl` per-doc token length, `corpus` the 1-row (n_docs, total_dl);
   *  - `tf` only for query terms (the corpus-wide token stream is filtered
   *    BEFORE the per-term aggregate, so the shuffle carries query-term hits
   *    only — |terms| is a user-bounded constant);
   *  - `df` per query term, broadcast (|terms| rows);
   *  - per-(doc, term) contribution
   *    `idf_ratio * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))`,
   *    scaled to BIGINT, summed per doc.
   *
   * SCALE SHAPE: ONE corpus scan and one shuffle keyed by doc id (dl and
   * all per-term counts come out of the same aggregation; the unpivot is
   * narrow), the term table and the 1-row corpus stats broadcast; nothing
   * is keys-proportional on the driver. Returns `(idCol, bm25_scaled)`; only
   * docs containing at least one query term appear (a doc with score 0
   * carries no information for ranking).
   *
   * k1/b reach the plan as `lit(k1) + lit(1.0)`-shaped expressions (never
   * pre-folded in Scala) so an oracle writing the same literals folds to the
   * same doubles.
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // dedup: a duplicated query term would get its own conditional-sum
    // column AND its own unpivot row, double-counting df and the per-doc
    // contribution — the groupBy(id, term) formulation this single-scan
    // rewrite replaced was duplicate-invariant, so restore that invariance
    val distinctTerms = terms.distinct
    // ONE corpus scan, one shuffle: the per-doc aggregate computes dl and a
    // conditional count per query term together (|terms| is a user-bounded
    // constant, so the extra columns through the shuffle are a constant
    // width), then unpivots to (id, dl, term, tf) rows — no second
    // tokenization pass and no dl re-join.
    // bare split is enough: nulls are already filtered and the length guard
    // drops the empty edge tokens a leading/trailing-whitespace split yields
    val toks = docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tfCols = distinctTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"__tf$i")
    }
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val corpus = perDoc.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val tf = perDoc.select(col(idCol), col("dl"),
        explode(array(distinctTerms.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("term"), col(s"__tf$i").as("tf"))
        }: _*)).as("__p"))
      .select(col(idCol), col("dl"), col("__p.term").as("term"), col("__p.tf").as("tf"))
      .where(col("tf") > 0)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfn = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl") / avgdl)))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("contrib", round(idf * tfn * lit(1.0e9)).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("bm25_scaled"))
  }

  /**
   * BM25 against a QUERY TABLE — the set-of-queries form [[bm25]]'s
   * fixed-bag signature cannot express: scoring thousands of queries in
   * ONE pass (training-data mining runs probe-query batches, not single
   * searches). `queries` carries (queryIdCol, termCol) rows; the result
   * is per-(query, doc) `bm25_scaled` under the exact same
   * no-transcendental integer-sum discipline as [[bm25]].
   *
   * SCALE SHAPE — one corpus tokenization pass, never per-term columns:
   *  - ONE corpus-wide `(doc, term) -> tf` aggregation (the postings
   *    frame, bounded by distinct doc-term mass, persisted once for its
   *    three consumers — dl, df, and scoring — the groupOverlap
   *    convention; persist it externally for the standing-index form);
   *  - `dl` and the 1-row corpus stats aggregate off the postings frame
   *    (postings-mass-bounded, no second corpus scan);
   *  - the query table (user-bounded by contract) broadcasts onto the
   *    postings, so scoring cost is ∝ query-term postings mass x queries
   *    sharing each term — never corpus x queries.
   *
   * Duplicate (query, term) rows are deduped (duplicate-invariance,
   * same rule as [[bm25]]); `df` counts DOCUMENTS per term, computed
   * before the query join so a term shared by many queries is not
   * multi-counted. Only (query, doc) pairs matching >= 1 term appear.
   */
  def bm25ForQueries(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      k1: Double = 1.2, b: Double = 0.75,
      unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol),
      s"docs must carry $idCol and $textCol")
    val postings = buildPostings(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { postings.unpersist(); () })
    bm25FromPostings(postings, idCol, queries, queryIdCol, termCol, k1, b)
  }

  /**
   * The postings build half of [[bm25ForQueries]]: one corpus scan, one
   * shuffle keyed by (doc, term), returning the `(idCol, term, tf)`
   * term-frequency postings frame — the STANDING ASSET a retrieval
   * deployment persists (e.g. through
   * [[graft.sources.Sink.writeIndex]]) and every query batch scores
   * against. `dl`, `df`, and the corpus stats are all derivable from it
   * (postings-mass-bounded aggregates), so nothing else needs storing.
   * Maintain it incrementally with [[mergePostings]].
   */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /**
   * Fold an ingest batch into a standing postings frame: every document
   * present in `batchDocs` has its postings REPLACED by the batch's
   * tokenization (re-ingested docs upsert, new docs append) — the same
   * last-writer-wins-by-key discipline as the bucket store, so a replayed
   * batch is idempotent. Deleting a doc's rows is the anti-join; the
   * delete list is the batch's (small) id set, broadcast. The merged
   * frame is ALGEBRAICALLY identical to `buildPostings(standingDocs
   * without batch ids ∪ batchDocs)` — the mergeable-state law the
   * bloom/minhash/HLL/count-min family pins in-query, completed for
   * postings.
   */
  def mergePostings(standing: DataFrame, batchDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val delta = buildPostings(batchDocs, idCol, textCol)
    // anti-join on the batch's FULL id set (not just non-empty-text docs):
    // a re-ingested doc whose new text is null/empty means "this doc now
    // has no tokens" — its standing rows must still be dropped
    val batchIds = batchDocs.select(col(idCol)).where(col(idCol).isNotNull).distinct()
    standing.join(broadcast(batchIds), Seq(idCol), "left_anti")
      .unionByName(delta)
  }

  /**
   * The scoring half of [[bm25ForQueries]], over an ALREADY-BUILT postings
   * frame `(idCol, term, tf)` — the standing-index form: postings load
   * from the index store (or arrive persisted), and each query batch pays
   * postings-mass-bounded aggregates plus broadcast joins, never a corpus
   * scan. Callers pass a persisted/stored frame; the three consumers
   * below (dl, df, scoring spine) each read it once.
   */
  def bm25FromPostings(postings: DataFrame, idCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.columns.contains(queryIdCol) && queries.columns.contains(termCol),
      s"queries must carry $queryIdCol and $termCol")
    val tfAll = postings.select(col(idCol), col("term").as("__term"), col("tf"))
    val dl = tfAll.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val q = queries.select(col(queryIdCol).as("__qid"), col(termCol).as("__term")).distinct()
    // df BEFORE the query join: one row per (doc, term) in tfAll makes
    // count(*) the document frequency; restricting to query terms first
    // keeps the aggregate term-bounded
    val dfreq = tfAll.join(broadcast(q.select(col("__term")).distinct()), "__term")
      .groupBy(col("__term")).agg(count(lit(1)).as("df"))
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfn = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl") / avgdl)))
    tfAll.join(broadcast(q), "__term")
      .join(broadcast(dfreq), "__term")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("contrib", round(idf * tfn * lit(1.0e9)).cast("long"))
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("contrib")).as("bm25_scaled"))
      .select(col("__qid").as(queryIdCol), col(idCol), col("bm25_scaled"))
  }

  /**
   * Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009): each ranked list
   * contributes `1 / (k0 + rank)` per id; ids high in ANY list surface, ids
   * high in SEVERAL dominate. Contributions are scaled to
   * `round(1e9 / (k0 + rank))` BIGINT — rank is a small integer, so the
   * score is a pure function of rank positions, immune to float-sum order
   * and to cross-engine score-scale differences (fusion never compares raw
   * scores across lists, only ranks — the property that makes RRF the
   * default hybrid-search combiner).
   *
   * Input frames carry `(idCol, rankCol)`; ranks should be bounded (top-k
   * lists), making this a union of tiny frames + one hash aggregate.
   * Returns `(idCol, rrf_scaled, n_lists)`.
   */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contribs = rankings.map(_.select(col(idCol),
      round(lit(1.0e9) / (lit(k0.toDouble) + col(rankCol))).cast("long").as("contrib")))
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("rrf_scaled"), count(lit(1)).as("n_lists"))
  }

  /**
   * Exact PHRASE search over a positional postings list — the capability
   * BM25's bag-of-words scoring cannot express ("spark sql", not documents
   * containing both words somewhere). Tokenization is the corpus-wide
   * [[graft.functions.Text.edgeStrippedTokens]] rule; position is the
   * 0-based token index.
   *
   * The postings frame `(term, id, pos)` is filtered to the phrase's terms
   * BEFORE any shuffle — the exploded token stream dies map-side except for
   * the |phrase| terms' hits. The k-term phrase then resolves as k−1
   * self-equi-joins on `(id, pos + offset)`: every join keys on the doc id
   * plus an integer position, so each is a hash join of term-hit frames
   * (corpus-frequency-bounded, never corpus-row-bounded), and a phrase with
   * one rare term shrinks every later join to that term's postings. This is
   * exactly how a positional inverted index answers phrase queries — the
   * filtered postings checkpoint once (ONE corpus tokenization pass
   * regardless of k); persist them externally to make the standing-index
   * form.
   *
   * Returns `(idCol, n_matches)` for documents containing the phrase at
   * least once (overlapping occurrences each count).
   */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 terms, got ${phrase.size}")
    require(phrase.forall(_.nonEmpty), "phrase terms must be non-empty")
    // a term containing whitespace can never equal a \s+-split token —
    // fail loudly instead of returning a silently empty result
    require(phrase.forall(!_.exists(_.isWhitespace)),
      "phrase terms must be single tokens (no whitespace) — split the phrase first")
    val words = graft.functions.Text.edgeStrippedTokens(col(textCol))
    // checkpoint the term-filtered postings (term-frequency-bounded, tiny
    // relative to the corpus): each of the k start frames then reads the
    // materialized rows instead of re-tokenizing the whole corpus k times
    val postings = docs.where(col(textCol).isNotNull)
      .select(col(idCol), posexplode(words).as(Seq("pos", "term")))
      .where(col("term").isin(phrase: _*))
      .localCheckpoint()
    // every frame gets UNIQUE column names (__idN/__sN) so the k−1
    // self-joins over the shared postings lineage never depend on Spark's
    // ambiguous-self-join disambiguation
    val starts = phrase.zipWithIndex.map { case (t, i) =>
      postings.where(col("term") === t)
        .select(col(idCol).as(s"__id$i"), (col("pos") - i).as(s"__s$i"))
    }
    val matched = starts.zipWithIndex.reduceLeft[(DataFrame, Int)] {
      case ((acc, ai), (nxt, ni)) =>
        (acc.join(nxt, col(s"__id$ai") === col(s"__id$ni") && col(s"__s$ai") === col(s"__s$ni"))
          .select(col(s"__id$ni"), col(s"__s$ni")), ni)
    }._1
    matched.groupBy(col(s"__id${phrase.size - 1}").as(idCol))
      .agg(count(lit(1)).as("n_matches"))
  }

  /**
   * Adjacent-pair collocation COUNTS — the shared scaffold under PMI-style
   * association scoring: unigram counts, adjacent-pair counts, and the
   * 1-row corpus totals joined into one frame
   * `(w1, w2, c_ab, c_a, c_b, t_tok, t_pair)`, support-filtered by
   * `c_ab >= minCount` (a support threshold is a RATE — scale it with the
   * corpus). The SCORING expression stays at the call site (q135 ranks by
   * the exact x100 BIGINT cross-multiplication; the Stress study by the
   * division-factored double ratio) so callers can't drift on tokenization
   * or thresholds — the same single-source rule as
   * [[graft.functions.Text.edgeStrippedTokens]].
   *
   * SCALE SHAPE: count frames are vocab-/pair-bounded (never
   * corpus-row-bounded); the two unigram joins key on single tokens and
   * AQE broadcasts them when small; corpus totals ride 1-row broadcasts.
   */
  def pmiPairs(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val words = graft.functions.Text.edgeStrippedTokens(col(textCol))
    val base = docs.where(col(textCol).isNotNull)
    val uni = base.select(explode(words).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val pair = base.select(words.as("tk")).where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(slice(tk, 1, size(tk)-1), (w, i) -> struct(w AS w1, element_at(tk, i+2) AS w2))"))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val totT = uni.agg(sum(col("c_w")).as("t_tok"))
    val totP = pair.agg(sum(col("c_ab")).as("t_pair"))
    pair.where(col("c_ab") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totP))
  }

  /** `pairs`: (id_a, id_b, dot, na2, nb2) exact-integer rows for every
    * doc pair at cosine >= thrNum/thrDen over the df-capped term space.
    * `droppedTerms`: 1-row (n_dropped_terms) — the stop-terms excluded by
    * the cap, crossJoin-broadcast it into the output for in-query
    * completeness observability (the [[graft.operators.FuzzyJoin]] /
    * LSH-bucket convention). */
  final case class AllPairsResult(pairs: DataFrame, droppedTerms: DataFrame)

  /**
   * All-pairs sparse cosine similarity over a term-frequency postings
   * frame `(idCol, term, tf)` — Bayardo et al.'s all-pairs similarity
   * search (WWW'07) re-expressed as an inverted-index self-join: the
   * lexical doc-doc near-dup/similarity primitive that works directly on
   * the SAME standing postings asset BM25 serves from, no embedding
   * model in the loop.
   *
   * SEMANTICS: documents are tf vectors over the DF-CAPPED vocabulary —
   * terms with document frequency > `maxDf` are stop-terms (they carry no
   * discrimination and their posting lists quadratize the self-join, the
   * exact analog of hot LSH buckets) and are excluded from BOTH the dot
   * product and the norms, so the reported cosine is exact w.r.t. the
   * capped vector space, not an approximation of the uncapped one.
   * Dropped terms are counted, never silent.
   *
   * The threshold is the rational thrNum/thrDen and the gate is pure
   * 64-bit integer cross-multiplication (tf >= 0 makes dot >= 0, so
   * cos >= t  <=>  dot^2 * thrDen^2 >= thrNum^2 * na2 * nb2 — no sqrt,
   * no division, bit-identical on any engine). Overflow contract:
   * dot^2 * thrDen^2 and thrNum^2 * na2 * nb2 must fit in a signed 64-bit
   * long, i.e. per-doc capped norm^2 below ~3e9/thrDen — guarded here by
   * thrDen <= 100 plus the practical bound that capped tf mass per doc is
   * context-length-bounded in a training corpus.
   *
   * SCALE SHAPE: cost is sum over kept terms of df^2 (the posting-list
   * self-join), bounded by maxDf * postings mass — linear in the corpus at
   * fixed maxDf, never docs^2. df=1 terms contribute to norms but skip the
   * pair join (no partner). Norm frames are doc-bounded and join on id;
   * the term-df frame is vocab-bounded.
   */
  def allPairsCosine(postings: DataFrame, idCol: String,
      maxDf: Long, thrNum: Long, thrDen: Long,
      unpersistHook: (() => Unit) => Unit = _ => ()): AllPairsResult = {
    require(maxDf >= 2, s"maxDf must be >= 2 (df-1 terms cannot pair), got $maxDf")
    require(thrNum >= 1 && thrDen >= thrNum,
      s"threshold must be a rational in (0, 1]: got $thrNum/$thrDen")
    require(thrDen <= 100,
      s"thrDen must be <= 100 (64-bit cross-multiplication overflow contract), got $thrDen")
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dropped = dfreq.where(col("df") > maxDf)
      .agg(count(lit(1)).as("n_dropped_terms"))
    // the capped postings feed three consumers (norms + both join sides);
    // persist so the corpus-mass tokenize/count isn't re-run per consumer
    val capped = postings
      .join(dfreq.where(col("df") <= maxDf).select(col("term"), col("df")), Seq("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    unpersistHook(() => { capped.unpersist(); () })
    val norms = capped.groupBy(col(idCol).as("__nid"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    // df=1 terms can't generate a pair — drop them before the self-join
    val joinable = capped.where(col("df") >= 2)
      .select(col("term"), col(idCol).as("__id"), col("tf"))
    val dots = joinable
      .join(joinable.select(col("term"), col("__id").as("__id_b"), col("tf").as("__tf_b")),
        Seq("term"))
      .where(col("__id") < col("__id_b"))
      .groupBy(col("__id").as("id_a"), col("__id_b").as("id_b"))
      .agg(sum(col("tf") * col("__tf_b")).as("dot"))
    val pairs = dots
      .join(norms.select(col("__nid").as("id_a"), col("n2").as("na2")), Seq("id_a"))
      .join(norms.select(col("__nid").as("id_b"), col("n2").as("nb2")), Seq("id_b"))
      .where(col("dot") * col("dot") * lit(thrDen * thrDen) >=
        lit(thrNum * thrNum) * col("na2") * col("nb2"))
      .select(col("id_a"), col("id_b"), col("dot"), col("na2"), col("nb2"))
    AllPairsResult(pairs, dropped)
  }
}
