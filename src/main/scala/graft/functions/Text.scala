package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale corpus pipelines, built ONLY from
 * codegen'd native Spark SQL functions (no UDFs) so they stay inside
 * whole-stage codegen and push through the vectorized Parquet scan at 100 TB.
 *
 * Every function here is also expressible in ANSI SQL with identical,
 * integer-exact results — which is what the DuckDB oracle queries rely on.
 */
object Text {

  /** Codepoints segmented ONE TOKEN PER CODEPOINT regardless of
    * whitespace: the space-less CJK scripts — CJK Unified Ideographs
    * (U+4E00–9FFF), Extension A (U+3400–4DBF), Hiragana and Katakana
    * (U+3040–30FF). Chinese/Japanese text carries essentially no spaces,
    * so a pure whitespace tokenizer reads a whole sentence as ONE "word"
    * — silently degrading token counts, repetition signals, shingle
    * dedup, and tokenizer training corpora on a multilingual crawl. The
    * per-codepoint fallback is the standard corpus-pipeline answer
    * (Gopher's and CCNet's character-level treatment of CJK).
    * Thai/Khmer/Lao are deliberately NOT listed: their grapheme clusters
    * carry combining vowel marks a per-codepoint split would corrupt —
    * proper segmentation there is dictionary-driven and out of scope
    * (documented, not silent). Written with explicit `\x{...}` ranges —
    * identical syntax and semantics under Java regex and RE2, the q69
    * pattern-parity discipline. */
  private[functions] val cjkRangeBounds: Array[(Int, Int)] =
    Array((0x3040, 0x30FF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF))
  val cjkCodepointRanges: String =
    cjkRangeBounds.map { case (a, b) => f"\\x{$a%04X}-\\x{$b%04X}" }.mkString

  /** THE token-extraction pattern every tokenizing kernel and the
    * CJK-aware oracle replays share: a maximal run of non-whitespace
    * non-CJK, else one token per CJK codepoint. Whitespace is the
    * EXPLICIT class `[ \x09-\x0D]` (= Java `\s`; RE2's `\s` lacks \x0B,
    * so the class is spelled out — the q64 dialect rule). On CJK-free
    * text this extracts exactly the whitespace-split tokens, so adopting
    * it was value-neutral for every existing oracle. The RUN branch
    * comes FIRST deliberately — both engines are leftmost-first, so on
    * ASCII-dominant text the matcher succeeds on its first branch at
    * every position instead of failing the single-codepoint class each
    * time (measured 2-3x on tokenization-bound scans); at a CJK
    * codepoint the run class cannot match (the ranges are excluded), so
    * the branch order never changes the tokens. */
  val tokenExtractPattern: String =
    s"[^ \\x09-\\x0D$cjkCodepointRanges]+|[$cjkCodepointRanges]"

  /** One-codepoint probe class: does this text need the per-codepoint
    * path at all? Drives the Column kernels' ASCII FAST PATH below —
    * `regexp_extract_all` must decode UTF-16 and run the alternation
    * matcher per row, measured 3-6x slower than the byte-level `split`
    * fast path on tokenization-bound scans; rows without a CJK codepoint
    * (the overwhelming mass of a Latin-dominant corpus) take the split
    * branch, which is VALUE-IDENTICAL there: after the `[\x00-\x20]`
    * edge strip a whitespace split yields exactly the extraction's
    * tokens (no phantom empties — the stripped text starts and ends
    * non-whitespace). */
  private val cjkProbe: String = s"[$cjkCodepointRanges]"
  private val edgeStripPattern: String = "^[\\x00-\\x20]+|[\\x00-\\x20]+$"
  private val wsClassPattern: String = "[ \\x09-\\x0D]+"

  /** Whitespace+CJK token count (0 for blank/empty text; NULL for NULL).
    * CJK rows count extraction tokens; CJK-free rows count split tokens —
    * BOTH over the edge-stripped text, so the two branches agree even on
    * rows with an edge control byte in \x00-\x08/\x0E-\x1F (the only
    * chars where edge-stripping changes the extraction: \x09-\x0D and
    * space are non-token chars either way). One edge semantics for both
    * branches AND the oracle replays. */
  def tokenCount(text: Column): Column = {
    val stripped = regexp_replace(text, edgeStripPattern, "")
    when(text.rlike(cjkProbe),
        size(regexp_extract_all(stripped, lit(tokenExtractPattern), lit(0))))
      .otherwise(when(length(stripped) === 0, lit(0))
        .otherwise(size(split(stripped, wsClassPattern))))
      .cast("long")
  }

  /** THE canonical token array every bigram/shingle kernel and its DuckDB
    * oracle share: strip the full `[\x00-\x20]` class (= Java trim) at the
    * EDGES only, then extract [[tokenExtractPattern]] runs (one token per
    * CJK codepoint). Interior control bytes below \x09 stay inside tokens
    * — exactly what the oracle's
    * `regexp_extract_all(regexp_replace(text, '^[\x00-\x20]+|[\x00-\x20]+$',
    * '', 'g'), '<pattern>')` extraction produces (the `'g'` flag
    * matters: both edges must strip). Centralized here because five kernels
    * share it and a drifted copy is a silent Spark/oracle divergence. */
  def edgeStrippedTokens(text: Column): Column = {
    val stripped = regexp_replace(text, edgeStripPattern, "")
    when(text.rlike(cjkProbe),
        regexp_extract_all(stripped, lit(tokenExtractPattern), lit(0)))
      .otherwise(when(length(stripped) === 0,
          array().cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
        .otherwise(split(stripped, wsClassPattern)))
  }

  /** Typed twin of [[edgeStrippedTokens]]/[[tokenExtractPattern]] for the
    * hot-path JVM kernels (repetition, shingling, chunking, token-id
    * encoding): Java `trim` IS the `[\x00-\x20]` edge strip, then the
    * same extraction regex. One definition — a typed kernel and a Column
    * kernel disagreeing on tokenization is a silent corpus-wide bug. */
  private val tokenExtractRegex = java.util.regex.Pattern.compile(tokenExtractPattern)
  private val wsSplitRegex = java.util.regex.Pattern.compile("\\s+")
  // derived from the SAME bounds as the regex constant — widening the
  // script list can never desynchronize the typed fast path from the
  // Column kernels (the silent-divergence hazard this file warns about)
  private def hasCjk(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      var r = 0
      while (r < cjkRangeBounds.length) {
        val (lo, hi) = cjkRangeBounds(r)
        if (c >= lo && c <= hi) return true
        r += 1
      }
      i += 1
    }
    false
  }
  def segmentText(text: String): Array[String] = {
    if (text == null) return Array.empty
    val t = text.trim
    if (t.isEmpty) return Array.empty
    // CJK-free fast path (one primitive char scan): a plain whitespace
    // split IS the extraction when no per-codepoint class can fire —
    // the hot-path kernels tokenize mostly-Latin corpora at split speed
    // and pay the alternation matcher only on rows that need it
    if (!hasCjk(t)) return wsSplitRegex.split(t)
    val m = tokenExtractRegex.matcher(t)
    val out = Array.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Exact number of occurrences of literal `token` via replace-arithmetic —
    * identical semantics in every SQL engine, exact integer math. */
  def substrCount(text: Column, token: String): Column =
    ((length(text) - length(replace(text, lit(token), lit("")))) / token.length).cast("long")

  /** Adjacent-bigram windows of a token-array column, as an array of
    * `struct(w1, w2)` — the q122 pairing kernel, NARROW (no self-join, no
    * posexplode+join). Centralized for the same reason as
    * [[edgeStrippedTokens]]: the bigram LM (`operators.Lm`), its
    * streaming store, and the corpus bigram queries must pair tokens
    * IDENTICALLY or the oracle replay silently diverges. */
  def bigramWindows(tk: Column): Column =
    transform(slice(tk, lit(1), size(tk) - 1),
      (w, i) => struct(w.as("w1"), get(tk, i + lit(1)).as("w2")))

  /** Consecutive-trigram windows — [[bigramWindows]] one order up, an
    * array of `struct(w1, w2, w3)`. */
  def trigramWindows(tk: Column): Column =
    transform(slice(tk, lit(1), size(tk) - 2),
      (w, i) => struct(w.as("w1"), get(tk, i + lit(1)).as("w2"),
        get(tk, i + lit(2)).as("w3")))

  /** Consecutive word-trigram SHINGLES as single space-joined strings —
    * the term space of the sparse-cosine/minhash family (q126, q189, the
    * all-pairs stress). Centralized like [[bigramWindows]]: the shingle
    * STRING is the join key between a Spark kernel and its DuckDB oracle
    * replay, so a drifted copy silently desynchronizes the hash gate. */
  def trigramShingles(tk: Column): Column =
    transform(slice(tk, lit(1), size(tk) - 2),
      (w, i) => concat_ws(" ", w, get(tk, i + lit(1)), get(tk, i + lit(2))))

  /** Discriminative character trigrams per language (classic char-n-gram
    * language ID à la Cavnar/Trenkle, reduced to a fixed integer-scored
    * table): each language's score is the SUM of its trigram occurrence
    * counts in the space-padded lowercased text. Deliberately ASCII-only
    * (no accented trigrams) so `length`/`replace` arithmetic is
    * code-point-exact across engines. This table is the SINGLE SOURCE for
    * both the Column kernel ([[langGuess]]) and the DuckDB oracle
    * replication ([[langScoreSqlColumns]]/[[langGuessSqlCase]]). */
  val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " th", "he ", "ing", "and", " of"),
    "de" -> Seq("der", "sch", "ich", "ein", "und", "cht"),
    "fr" -> Seq(" le", "les", "ent", "des", "une", "eur"),
    "es" -> Seq(" el", "los", " la", "ado", "por", "nte"))

  /**
   * Deterministic char-trigram language ID: integer trigram-count scores
   * per language over the padded lowercased text ([[langTrigrams]]), pick
   * the first maximum in fixed (en, de, fr, es) order, or "und" when no
   * trigram fires. Pure column expression — single scan, no shuffle, no
   * UDF — so it runs at corpus scale inside whole-stage codegen; scoring
   * is replace-arithmetic, so any SQL engine replays it exactly.
   * Acceptance artifact: q173's planted multilingual fixture classifies
   * 100% diagonal (gated in-query); q124 grades it against the corpus
   * labels.
   */
  def langGuess(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = langTrigrams.map { case (lang, tris) =>
      lang -> tris.map(t => substrCount(padded, t)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s > 0 && s === best, lit(lang)).otherwise(els)
    }
  }

  /** The per-language score columns (`c_en, c_de, ...`) of the DuckDB
    * replication, generated from [[langTrigrams]] — the enclosing query
    * provides `pt = concat(' ', lower(text), ' ')`. Generated, not
    * hand-copied, so kernel and oracle can never drift. */
  def langScoreSqlColumns: String =
    langTrigrams.map { case (lang, tris) =>
      tris.map(t => s"(len(pt) - len(replace(pt, '$t', ''))) // ${t.length}")
        .mkString("", " + ", s" AS c_$lang")
    }.mkString(",\n    ")

  /** The argmax CASE over the [[langScoreSqlColumns]] columns — fixed
    * (en, de, fr, es) precedence, 'und' fallback, exactly [[langGuess]]. */
  def langGuessSqlCase: String = {
    val all = langTrigrams.map(l => s"c_${l._1}").mkString(", ")
    langTrigrams.map(_._1).map(l =>
      s"WHEN c_$l > 0 AND c_$l >= greatest($all) THEN '$l'")
      .mkString("CASE ", "\n       ", "\n       ELSE 'und' END")
  }

  /** BPE-style pre-tokenization count: alphabetic runs, digit runs, and
    * punctuation runs each count as one token (the GPT-2 pre-tokenizer shape,
    * ASCII simplification — real BPE merges happen inside these pieces, so
    * this upper-bounds subword count). `regexp_count` is a native codegen'd
    * function and the same regex runs verbatim in DuckDB. For token counts
    * against an ACTUAL merge table, use [[graft.operators.Bpe.tokenCounts]]
    * (q167) — this column stays as the cheap zero-shuffle profile (q39). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+")).cast("long")

  /** Exact-dup fingerprint: MD5 hex of the text (identical across engines). */
  def fingerprint(text: Column): Column = md5(text)

  /** Rolling-hash style content signature over the shared token array
    * ([[edgeStrippedTokens]] — CJK-aware, with the same ASCII fast path
    * as every other Column kernel): polynomial hash mod 10^9+7
    * (intermediates < 2^62: safe under ANSI long math). */
  def tokenRollingHash(text: Column): Column =
    aggregate(
      edgeStrippedTokens(text),
      lit(146959810393L),
      (acc, tok) => (acc % 1000000007L) * lit(31L) + crc32(tok).cast("long"))

  /** Distinct token count under [[tokenExtractPattern]] (0 for
    * blank/empty text); same ASCII fast path as [[tokenCount]]. */
  def distinctTokenCount(text: Column): Column = {
    val stripped = regexp_replace(text, edgeStripPattern, "")
    when(text.rlike(cjkProbe),
        size(array_distinct(regexp_extract_all(stripped, lit(tokenExtractPattern), lit(0)))))
      .otherwise(when(length(stripped) === 0, lit(0))
        .otherwise(size(array_distinct(split(stripped, wsClassPattern)))))
      .cast("long")
  }

  /**
   * Fixed-point Shannon entropy of the lowercase alphanumeric CHARACTER
   * distribution, in 1/1024-bit units — the gibberish/encoded-blob/
   * keyboard-mash detector (natural language sits ~3–4.2 bits/char over
   * [a-z0-9]; base64 blobs higher, repeated-char spam near 0). The only
   * transcendental is [[graft.operators.Classifier.ilog]]'s
   * `floor(1024 * log2)` over integer counts (cross-engine exact — the
   * q183 convention), so
   * `ent = sum_c cnt_c * (ilog(n) - ilog(cnt_c)) div n` replays verbatim
   * in SQL. Non-alphanumeric chars are class-filtered out, and a doc
   * with no classed chars scores 0.
   *
   * The class is a FIXED 36-char alphabet, so each count is flat
   * `length`/`replace` arithmetic over the lowered text (the
   * [[substrCount]] kernel) — entirely codegen'd scalar expressions that
   * whole-stage CSE shares, zero exchanges, rides the scan. This
   * replaced a per-position `substr` + per-char regex higher-order-
   * function form whose lambdas were interpreted AND re-derived the char
   * array at every reference — measured 608 s for q193 at sf0.1 vs
   * sub-second in this form; value-identical (the oracle's positional
   * replay still matches hash-for-hash).
   */
  def charEntropyColumns(text: Column): Seq[Column] = {
    def ilog(x: Column): Column = floor(lit(1024.0) * log2(x)).cast("long")
    val lowered = lower(coalesce(text, lit("")))
    val counts = (('a' to 'z') ++ ('0' to '9')).map { c =>
      ((length(lowered) - length(replace(lowered, lit(c.toString), lit("")))))
        .cast("long")
    }
    // one regex pass, not the 36-term sum: the sum would re-evaluate all
    // 36 replaces at every reference, and CSE cannot hoist expressions
    // that live inside conditional branches
    val n = (length(lowered) -
      length(regexp_replace(lowered, "[a-z0-9]", ""))).cast("long")
    val nDistinct = counts.map(c => when(c > 0L, lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    // sum_{c>0} c*(ilog n - ilog c) = n*ilog(n) - sum_{c>0} c*ilog(c),
    // hoisting ilog(n) out of the per-class branches (log2(0) is NULL in
    // Spark, so the n = 0 row nulls through to the guarded 0 below)
    val entSum = n * ilog(n) - counts
      .map(c => when(c > 0L, c * ilog(c)).otherwise(lit(0L)))
      .reduce(_ + _)
    // exact integer floor-div: make the numerator divisible first, so the
    // double division is exact (both engines), never a rounding hazard
    val entMilli = ((entSum - pmod(entSum, n)) / n).cast("long")
    Seq(n.as("n_classed"),
      nDistinct.as("n_distinct_chars"),
      when(n > 0, entMilli).otherwise(lit(0L)).as("ent_milli"))
  }

  /** Occurrence count of the MOST FREQUENT word bigram (0 when the text has
    * fewer than two tokens) — the Gopher-style "top n-gram fraction"
    * repetition signal's numerator, kept integer-exact. Computed entirely in
    * native higher-order functions: build the bigram array, sort it, and take
    * the longest equal-run with one `aggregate` — per-row work, no shuffle,
    * no per-document state beyond the row itself. */
  def topBigramCount(text: Column): Column = {
    // same dispatch as tokenCount: the split branch's blank-text [""]
    // artifact is neutralized by the size < 2 guard below; both branches
    // read the edge-stripped text (the tokenCount edge-semantics rule)
    val stripped = regexp_replace(text, edgeStripPattern, "")
    val words = when(text.rlike(cjkProbe),
        regexp_extract_all(stripped, lit(tokenExtractPattern), lit(0)))
      .otherwise(split(stripped, wsClassPattern))
    val grams = array_sort(transform(
      sequence(lit(0), size(words) - 2),
      i => concat_ws(" ", element_at(words, i + 1), element_at(words, i + 2))))
    val best = aggregate(
      grams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        // equal-run length in the sorted array == per-bigram count
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
    // extraction yields [] on blank text, so size < 2 covers the blank
    // case the old split form needed isBlank for
    when(size(words) < 2, lit(0L)).otherwise(best)
  }

  /**
   * Gopher-style intra-document repetition metrics: token count, distinct
   * token count, top-bigram occurrence count, and an accept flag from two
   * integer-exact rules (distinct tokens >= half the tokens; the most
   * frequent bigram covers <= a fifth of the bigram positions). Documents
   * under 10 tokens pass unconditionally — repetition ratios are degenerate
   * on a handful of tokens (a 2-token doc's only bigram "covers 100%"), and
   * short docs are the length filter's job, not this one's. All columns are
   * single-scan native expressions — the repetition filter runs at
   * corpus-scan speed with zero shuffles.
   */
  def repetitionColumns(text: Column): Seq[Column] = {
    val nTokens = tokenCount(text)
    val nDistinct = distinctTokenCount(text)
    val topBigram = topBigramCount(text)
    val ok = nTokens < 10 ||
      (nDistinct * 2 >= nTokens && topBigram * 5 <= nTokens - 1)
    Seq(
      nTokens.as("n_tokens"),
      nDistinct.as("n_distinct"),
      topBigram.as("top_bigram_n"),
      ok.as("repetition_ok"))
  }

  /**
   * Typed single-pass kernel for the repetition metrics — the hot-path form
   * of [[repetitionColumns]]: one tokenization + one bigram-count map per
   * document in plain JVM code. The Column form's `aggregate` higher-order
   * function is interpreted per element (struct state allocated per bigram)
   * and dominated the corpus scan ~8×, the same reason
   * `Dedup.shingleHashes` is a typed kernel. Tokenization is the shared
   * [[segmentText]] kernel — the exact typed twin of the Column form's
   * [[tokenExtractPattern]] extraction, so the two forms agree on every
   * text including edge control characters (parity-pinned in spec; the
   * old split-based Column form minted a phantom empty token after a
   * leading tab — extraction retired that divergence). On NULL text the
   * kernel treats the document as empty — (0, 0, 0, ok=true) — while the
   * Column form propagates NULL, so Column-form callers should
   * `coalesce(text, '')`.
   * Narrow (mapPartitions) — no shuffle.
   */
  def repetitionMetrics(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val words: Array[String] = segmentText(text)
          val n = words.length.toLong
          val distinct = new java.util.HashSet[String]()
          words.foreach(distinct.add)
          var top = 0L
          if (words.length >= 2) {
            val counts = new java.util.HashMap[String, Long]()
            var i = 0
            while (i < words.length - 1) {
              val g = words(i) + " " + words(i + 1)
              val c = counts.getOrDefault(g, 0L) + 1L
              counts.put(g, c)
              if (c > top) top = c
              i += 1
            }
          }
          val nd = distinct.size.toLong
          val ok = n < 10 || (nd * 2 >= n && top * 5 <= n - 1)
          (id, n, nd, top, ok)
        }
      }
      .toDF(idCol, "n_tokens", "n_distinct", "top_bigram_n", "repetition_ok")
  }

  /**
   * PII scrubbing patterns: (name, regex, replacement token), applied in this
   * fixed order. The regexes are restricted to the RE2-compatible subset (no
   * backreferences, no lookaround) so the SAME pattern string runs verbatim
   * under Java regex (Spark) and RE2 (DuckDB/production scrubber audits) with
   * identical matches — note the URL terminator is the EXPLICIT class
   * `[^ \x09-\x0D]` (Java's `\s`), not `\s` itself, because RE2's `\s`
   * lacks vertical tab and the two engines would split a match differently
   * around \x0B. Deliberately simple recall-oriented shapes — a version
   * string like 1.2.3.4 does match the IP pattern; at corpus-cleaning scale
   * that false positive is the standard trade.
   */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^ \\x09-\\x0D]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  /** Redact URLs, then emails, then IPv4s, then phone numbers (order matters:
    * a URL's userinfo could otherwise be half-eaten by the email pass).
    * Chained native `regexp_replace` — whole-stage codegen, zero shuffles,
    * scrubbing runs at scan speed. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, lit(p), lit(r)) }

  /**
   * HTML-to-text extraction steps, applied in THIS fixed order (each is a
   * (pattern, replacement); all patterns sit in the RE2 ∩ Java-regex
   * subset with inline `(?is)` flags, so the SAME strings run verbatim in
   * Spark and DuckDB — the [[piiPatterns]] discipline):
   *  1–3. script/style/comment blocks die WITH their content (visible
   *       text never includes code);
   *  4.   every remaining tag becomes one space (block/inline distinction
   *       deliberately collapsed — token boundaries, not layout, is what
   *       a training corpus needs);
   *  5–9. the five core entities decode, `&amp;` LAST so `&amp;lt;`
   *       yields the literal text `&lt;`, never a second-round `<`;
   *  10.  whitespace squeezes to single spaces (the tag replacements and
   *       source formatting would otherwise leave runs).
   * The result still needs a Java-trim for edge spaces — callers compose
   * with the tokenizers, which edge-strip anyway.
   */
  val htmlStripSteps: Seq[(String, String)] = Seq(
    ("(?is)<script\\b[^>]*>.*?</script>", " "),
    ("(?is)<style\\b[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    ("(?s)<[^>]+>", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("[ \\x09-\\x0D]+", " "))

  /** Visible text of an HTML document — markup curation for crawl input:
    * chained native `regexp_replace` over [[htmlStripSteps]], whole-stage
    * codegen, zero shuffles; extraction rides the scan exactly like
    * [[scrubPii]]. NOT a browser: malformed nesting degrades to leftover
    * text, never to an error. */
  def stripHtml(text: Column): Column =
    htmlStripSteps.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, lit(p), lit(r)) }

  /** Block-boundary tags for [[extractMainContent]]: a page splits into
    * text blocks at block-LEVEL tag boundaries (open or close); inline
    * tags (`<a> <b> <span> <em> <meta>`...) stay inside their block and
    * are stripped during per-block text extraction. Shared constant —
    * the oracle replays the same split. RE2 ∩ Java by construction. */
  val blockTagPattern: String =
    "(?i)</?(?:p|div|section|article|main|header|footer|nav|aside|h[1-6]|" +
      "ul|ol|li|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|blockquote|pre|" +
      "form|fieldset|figure|figcaption|body|html|head|title|br|hr)\\b[^>]*>"

  /** One full anchor span `<a ...>...</a>` — the LINK TEXT of a block,
    * the numerator of its link density. */
  val anchorSpanPattern: String = "(?is)<a\\b[^>]*>.*?</a>"

  /** [[extractMainContent]] thresholds: a block is MAIN CONTENT when its
    * visible text has at least `mainMinChars` characters AND its link
    * density (anchor-text chars / visible chars) is at most
    * `mainMaxLinkNum`/`mainMaxLinkDen` — checked as pure integer
    * cross-multiplication, engine-exact. */
  val mainMinChars: Int = 25
  val mainMaxLinkNum: Int = 1
  val mainMaxLinkDen: Int = 3

  /** Visible text of ONE block: inline tags stripped, entities decoded
    * (the [[htmlStripSteps]] tail), whitespace squeezed, edges trimmed. */
  private[graft] def blockVisible(b: Column): Column =
    regexp_replace(
      htmlStripSteps.drop(3).foldLeft(b) { case (c, (p, r)) =>
        regexp_replace(c, lit(p), lit(r))
      },
      lit("^[\\x00-\\x20]+|[\\x00-\\x20]+$"), lit(""))

  /**
   * MAIN-CONTENT extraction — the step real curation pipelines run
   * between markup strip and quality filters (Boilerpipe / jusText,
   * reduced to their deterministic core): [[stripHtml]] keeps nav, ad,
   * and footer TEXT in the corpus; this drops whole boilerplate BLOCKS by
   * the two density rules those systems agree on. The page splits into
   * blocks at [[blockTagPattern]] boundaries (script/style/comment
   * blocks die with their content first); a block survives iff its
   * visible text reaches [[mainMinChars]] AND its anchor-text share is at
   * most [[mainMaxLinkNum]]/[[mainMaxLinkDen]] (nav bars and ad units
   * are nearly all link text; footers are short). Survivors join with
   * `\n` in document order. Deliberately a RULE, not a model — the
   * jusText context pass (short blocks inheriting neighbor verdicts) is
   * out of scope, so isolated short headings drop; the
   * engine-replayability contract matters more.
   *
   * Entirely native HOFs (split / transform / filter / regexp chains)
   * riding the scan — zero exchanges, whole-stage codegen, the
   * [[stripHtml]] posture.
   */
  def extractMainContent(html: Column): Column = {
    val cleaned = htmlStripSteps.take(3).foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, lit(p), lit(r))
    }
    val scored = transform(split(cleaned, blockTagPattern), b =>
      struct(
        blockVisible(b).as("v"),
        length(blockVisible(array_join(
          regexp_extract_all(b, lit(anchorSpanPattern), lit(0)), " "))).as("l")))
    val kept = filter(scored, s =>
      length(s.getField("v")) >= lit(mainMinChars) &&
        s.getField("l") * lit(mainMaxLinkDen) <=
          length(s.getField("v")) * lit(mainMaxLinkNum))
    array_join(transform(kept, s => s.getField("v")), "\n")
  }

  /** href targets of ANCHOR tags (`<a ... href="...">`), in document
    * order — the web-graph edge extractor that pairs with [[stripHtml]]:
    * one keeps the text, the other keeps the links. Deliberately anchors
    * only (`<link>`/`<script src>` are page plumbing, not hyperlinks) and
    * double-quoted values only (what real generators emit); the RE2 ∩
    * Java pattern subset, zero exchanges, rides the scan. Shared constant
    * so oracle SQL replays the same pattern. */
  val anchorHrefPattern: String = "(?i)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\""

  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(anchorHrefPattern), lit(1))

  /** One full anchor with BOTH its href (group 1) and its inner markup
    * (group 2) — [[anchorHrefPattern]]'s capture extended over the whole
    * `<a ...>...</a>` span. Shared constant; RE2 ∩ Java subset. */
  val anchorPairPattern: String =
    "(?is)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"

  /**
   * (href, anchor) pairs of a page in document order — the web-search /
   * quality signal [[extractLinks]] drops: what OTHER pages call a URL
   * (anchor text) describes the target better than the target's own
   * boilerplate, and aggregating it per target is a classic ranking and
   * labeling input. The two `regexp_extract_all` calls share ONE pattern,
   * so the arrays align match-for-match; anchor text is the VISIBLE text
   * of the span (inline tags stripped, entities decoded, edges trimmed —
   * the [[extractMainContent]] block rule). Anchors only, double-quoted
   * hrefs only — the [[anchorHrefPattern]] contract. Zero exchanges.
   */
  def anchorTexts(html: Column): Column =
    zip_with(
      regexp_extract_all(html, lit(anchorPairPattern), lit(1)),
      transform(regexp_extract_all(html, lit(anchorPairPattern), lit(2)), b => blockVisible(b)),
      (h, t) => struct(h.as("href"), t.as("anchor")))

  /** One `<img ...>` tag (self-closing or not) — the multimodal analog
    * of [[anchorHrefPattern]]: the tag is extracted whole, then its
    * attributes are pulled from the tag string, so `src`/`alt` pair
    * correctly in EITHER attribute order (a single all-in-one pattern
    * would silently drop alt-first markup). Double-quoted attribute
    * values are OPAQUE runs inside the tag body: `alt="a > b"` must not
    * end the tag at the quoted `>` (a bare `[^>]*` clipped that caption
    * silently). Unterminated quotes remain out of contract — the
    * [[anchorHrefPattern]] double-quote discipline. Shared constants;
    * RE2 ∩ Java subset (no lookarounds). */
  val imgTagPattern: String = "(?i)<img[\\s/](?:[^>\"]|\"[^\"]*\")*>"

  /** `src="..."` inside one extracted tag. The leading `[\s/]` keeps
    * `data-src=` from matching (the char before `src` must be
    * whitespace or the self-closing slash — `<img/src="...">` is legal
    * markup — and `-` is neither). Double-quoted values only — the
    * [[anchorHrefPattern]] contract. */
  val imgSrcAttrPattern: String = "(?i)[\\s/]src\\s*=\\s*\"([^\"]*)\""

  /** `alt="..."` inside one extracted tag (same delimiter discipline). */
  val imgAltAttrPattern: String = "(?i)[\\s/]alt\\s*=\\s*\"([^\"]*)\""

  /** One `<figure>...</figure>` block (inner markup captured). */
  val figureBlockPattern: String = "(?is)<figure[^>]*>(.*?)</figure>"

  /** `<figcaption>...</figcaption>` inner markup. */
  val figcaptionPattern: String = "(?is)<figcaption[^>]*>(.*?)</figcaption>"

  /**
   * IMAGE–TEXT PAIR EXTRACTION — the multimodal analog of
   * [[anchorTexts]]: every textual description markup attaches to an
   * image, as `(src, caption, kind)` structs — GROUPED BY KIND (all alt
   * pairs in document order, then all figcaption pairs in document
   * order; the two scans are independent, so kinds are NOT interleaved
   * by page position) — the raw material of caption–image training
   * pairs (composable with the blob decode + phash dedup chain — q246).
   * Two caption sources, each a shared-constant pattern pass:
   *  - `kind='alt'`: every `<img>` tag carrying BOTH a src and a
   *    non-empty alt (the accessibility text — attribute order
   *    irrelevant, see [[imgTagPattern]]);
   *  - `kind='figcaption'`: every `<figure>` block carrying both an
   *    `<img src>` and a `<figcaption>` (the editorial caption).
   * A figure image with its own alt emits BOTH pairs — two independent
   * caption signals for one image, which a pairing pipeline wants
   * separately. Captions pass through [[blockVisible]] (inline tags
   * stripped, entities decoded, edges trimmed — the [[anchorTexts]]
   * rule). Srcless images, captionless figures, and empty captions
   * yield no rows. Zero exchanges — rides the scan.
   */
  def imageCaptions(html: Column): Column = {
    def pair(src: Column, caption: Column, kind: String) =
      struct(src.as("src"), caption.as("caption"), lit(kind).as("kind"))
    val altPairs = filter(
      transform(regexp_extract_all(html, lit(imgTagPattern), lit(0)), tag =>
        pair(regexp_extract(tag, imgSrcAttrPattern, 1),
          blockVisible(regexp_extract(tag, imgAltAttrPattern, 1)), "alt")),
      p => p.getField("src") =!= "" && p.getField("caption") =!= "")
    val figPairs = filter(
      transform(regexp_extract_all(html, lit(figureBlockPattern), lit(1)), block =>
        pair(
          regexp_extract(regexp_extract(block, imgTagPattern, 0), imgSrcAttrPattern, 1),
          blockVisible(regexp_extract(block, figcaptionPattern, 1)), "figcaption")),
      p => p.getField("src") =!= "" && p.getField("caption") =!= "")
    concat(altPairs, figPairs)
  }

  /** Sentence segmentation — the unit between the token and the document
    * that sentence-level dedup/chunking/packing keys on. Deliberately a
    * RULE, not a model: a sentence is a maximal run of non-terminator
    * characters plus its trailing `.!?` run (a final unterminated tail
    * counts too), shared as a constant so the oracle replays the same
    * pattern. RE2 ∩ Java by construction (no lookarounds — RE2 has none,
    * and the engine-replayability contract matters more than abbreviation
    * handling, which no regex rule gets right anyway). Zero exchanges. */
  val sentencePattern: String = "[^.!?]+[.!?]*"

  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit(sentencePattern), lit(0)),
        s => regexp_replace(s, lit("^[\\x00-\\x20]+|[\\x00-\\x20]+$"), lit(""))),
      s => s =!= "")

  /** Unicode-normalized text (JDK `java.text.Normalizer`) — the dedup
    * canonicalization ASCII folding cannot provide: NFC collapses
    * combining-mark sequences onto their precomposed forms (e + U+0301 ≡
    * é), NFKC additionally folds compatibility variants (full-width
    * ＡＢＣ → ABC, ligatures, squared forms — the CJK-web-text dedup
    * killer). Spark has no native normalizer expression, so this is a
    * narrow typed pass over `(id, text)` — zero exchanges, rides the
    * scan; null text passes through as null. */
  def nfcNormalized(df: org.apache.spark.sql.DataFrame,
                    idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    normalized(df, idCol, textCol, java.text.Normalizer.Form.NFC)

  def nfkcNormalized(df: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    normalized(df, idCol, textCol, java.text.Normalizer.Form.NFKC)

  private def normalized(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String,
                         form: java.text.Normalizer.Form): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // boxed id: a null id is a row to pass through, not an encoder crash
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(java.lang.Long, String)]
      .map { case (id, t) =>
        (id, if (t == null) null else java.text.Normalizer.normalize(t, form))
      }
      .toDF(idCol, textCol)
  }

  /** Per-category match counts over the RAW text (counts are independent per
    * pattern; an email inside a URL counts once for each — the audit number a
    * compliance report wants, and what the oracle recomputes). */
  def piiCounts(text: Column): Seq[Column] =
    piiPatterns.map { case (n, p, _) => regexp_count(text, lit(p)).cast("long").as(s"n_$n") }

  /** Just the accept flag from [[qualityColumns]] (for WHERE-clause use
    * without materializing the sibling metric columns). */
  def qualityOk(text: Column): Column = qualityColumns(text).last

  /** Just the accept flag from [[repetitionColumns]]. */
  def repetitionOk(text: Column): Column = repetitionColumns(text).last

  /** Quality heuristics: token count, mean token length (exact ints + one
    * division), stopword hits, and an accept flag. */
  def qualityColumns(text: Column): Seq[Column] = {
    val nTokens = tokenCount(text)
    val nChars = length(trim(text)).cast("long")
    val meanTokLen = when(nTokens > 0, nChars.cast("double") / nTokens.cast("double")).otherwise(lit(0.0))
    val stopHits = substrCount(concat(lit(" "), text, lit(" ")), " the ") +
      substrCount(concat(lit(" "), text, lit(" ")), " a ")
    val ok = nTokens >= 5 && nTokens <= 100000 && meanTokLen >= 2.0 && meanTokLen <= 20.0
    Seq(
      nTokens.as("n_tokens"),
      meanTokLen.as("mean_token_len"),
      stopHits.as("stopword_hits"),
      ok.as("quality_ok"))
  }
}
