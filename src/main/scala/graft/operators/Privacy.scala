package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * K-ANONYMITY via a generalization ladder (Samarati/Sweeney, reduced to
 * its relational core) — the release-compliance side of privacy curation,
 * complementing [[graft.functions.Text.scrubPii]]'s in-text redaction: a
 * row may only be released if its QUASI-IDENTIFIER tuple (the columns
 * that jointly re-identify: language, source, length band, ...) is shared
 * by at least k rows. Rows in too-small equivalence classes are not
 * dropped outright — they retry at successively COARSER quasi-identifier
 * levels (drop the length band, then the source, ...) and only rows
 * whose class is still < k at the coarsest level are suppressed.
 *
 * Semantics (deterministic, engine-replayable): levels are evaluated in
 * order on the NOT-YET-RELEASED remainder — a row released at level i was
 * in a < k class at every finer level, and class sizes at level i are
 * computed over exactly the rows that reached level i (the cascade
 * definition; the oracle replays it as chained windowed CTEs). Output is
 * one row per input row: `(id, level, <quasi columns>)` with every column
 * OUTSIDE the releasing level nulled (that is the generalization), and
 * `level = -1` + all-null for suppressed rows — visible, never vanished.
 *
 * SCALE SHAPE: each level carries only (id + quasi) columns — never text
 * or payload — over the shrinking remainder; the ladder depth is a small
 * constant set by the caller. Per-level class sizes are a
 * `groupBy(quasi).count()` (map-side combined) joined back null-safely —
 * deliberately NOT a partitioned window: at the coarsest ladder level
 * the dominant class (half the corpus under `lang` alone) would land in
 * ONE window partition = one task buffering billions of rows, and AQE
 * can split a skewed JOIN partition but never a skewed WINDOW partition.
 * The count frame is class-count-bounded (tiny exactly when classes are
 * huge), so the join back broadcasts in the skewed regime and degrades
 * to an AQE-skew-splittable shuffle join only when classes are many and
 * small. No corpus-wide sort and no driver collection anywhere.
 *
 * The base projection and each level's remainder are MATERIALIZED
 * (persisted; release via `unpersistHook` — the Bpe.tokenCounts
 * convention): every level's count aggregate and the 4-way output union
 * are separate consumers of the same subtree, and with broadcast
 * join-backs there is no exchange for ReuseExchange to share, so an
 * unpersisted cascade re-executes the caller's ENTIRE upstream plan
 * once per level per branch (measured 5x on the q204 capstone, whose
 * upstream is a dedup + LM chain). The cached frames are (id + quasi)
 * only — bounded columns, never payload.
 */
object Privacy {

  /**
   * Anonymize `df` against the ladder: `levels(i)` names the quasi
   * columns of level i (finest first; columns must exist in `df`, and a
   * coarser level is typically a subset of the finer one). Returns
   * `(idCol, level, union-of-quasi-columns)` as described above. NULL
   * quasi values are legal and group together (SQL window-partition
   * semantics in both engines).
   */
  def kAnonymize(df: DataFrame, idCol: String, levels: Seq[Seq[String]], k: Int,
      unpersistHook: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k — k = 1 releases everything")
    require(levels.nonEmpty, "at least one quasi-identifier level is required")
    require(levels.forall(_.nonEmpty), "a level must name at least one quasi column")
    val allQ = levels.flatten.distinct
    val types = allQ.map(c => c -> df.schema(c).dataType).toMap
    def materialize(frame: DataFrame): DataFrame = {
      val m = frame.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      unpersistHook(() => { m.unpersist(); () })
      m
    }
    val base = materialize(
      df.select((col(idCol).cast("long").as(idCol) +: allQ.map(col)): _*))

    def shape(levelNo: Long, qs: Set[String])(frame: DataFrame): DataFrame =
      frame.select(
        (col(idCol) +: lit(levelNo).as("level") +:
          allQ.map(c =>
            (if (qs(c)) col(c) else lit(null).cast(types(c))).as(c))): _*)

    val (releasedAll, rest) = levels.zipWithIndex
      .foldLeft((Seq.empty[DataFrame], base)) { case ((acc, remaining), (qs, i)) =>
        // class sizes as groupBy + null-safe join back (NULL quasi values
        // are one class, matching window-partition semantics) — count-only
        // window ⇒ identical semantics, but the skewed side never shuffles
        // into a single partition (see SCALE SHAPE above)
        val sizes = remaining.groupBy(qs.map(col): _*).agg(count(lit(1)).as("__n"))
          .select((qs.map(c => col(c).as(s"__g_$c")) :+ col("__n")): _*)
        val cond = qs.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
        val counted = remaining.join(sizes, cond).drop(qs.map(c => s"__g_$c"): _*)
        (acc :+ shape(i.toLong, qs.toSet)(counted.where(col("__n") >= k)),
          materialize(counted.where(col("__n") < k).drop("__n")))
      }
    (releasedAll :+ shape(-1L, Set.empty)(rest)).reduce(_.unionByName(_))
  }

  /** The audit face: per-class sizes at one quasi level, with the < k
    * risk flag — what a release review reads before anonymizing. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /**
   * L-DIVERSITY audit (Machanavajjhala et al.) — k-anonymity's blind
   * spot: a class can hold >= k rows yet leak the SENSITIVE attribute
   * outright when every member shares one value (the homogeneity
   * attack). A class is safe only when its members carry >= l DISTINCT
   * sensitive values. One map-side-combined aggregation per class; NULL
   * sensitive values count as one value (SQL count-distinct semantics in
   * both engines drop them — callers holding NULL-heavy sensitive
   * columns should coalesce first).
   */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l — at 1 any non-empty class passes")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
  }

  /**
   * T-CLOSENESS audit (Li et al.), total-variation distance — the
   * residual attack l-diversity misses: a class can carry l distinct
   * sensitive values whose DISTRIBUTION still differs sharply from the
   * corpus-wide one (skewness attack). A class is safe when
   * `TV(class, corpus) = ½ Σ_s |p_class(s) − p_corpus(s)| <= t`, checked
   * here as pure 64-bit cross-multiplication with `t = tNum/tDen`:
   *
   *   tDen · Σ_s |n_cs · N − n_s · N_c|  >  tNum · 2 · N_c · N  ⇒ at risk
   *
   * (both sides are the inequality multiplied by `2 · N_c · N · tDen` —
   * no division, no floats, engine-exact). The sum runs over the
   * sensitive values PRESENT in the corpus; absent-in-class values
   * contribute their full corpus mass through the left join's zero.
   *
   * OVERFLOW BOUND: the summed deviation reaches `2 · N_c · N <= 2 · N²`
   * and is then scaled by `tDen`, so the math is 64-bit exact while
   * `2 · tDen · N² < 2⁶³` — roughly `N ≲ 2·10⁹ / √tDen` audited rows.
   * Audit per partition/shard above that (the per-class frame is what
   * shuffles, so scoping is free); the class×sensitive aggregation
   * itself is map-side-combined and class-bounded. NULL quasi and
   * sensitive values group as ordinary values (null-safe joins
   * throughout, matching [[kAnonymize]]'s window semantics).
   */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      tNum: Long, tDen: Long, maxSensitiveDomain: Int = 65536): DataFrame = {
    require(tNum >= 0 && tDen > 0 && tNum <= tDen,
      s"t must be a fraction in [0, 1]: got $tNum/$tDen")
    require(maxSensitiveDomain >= 1,
      s"maxSensitiveDomain must be >= 1, got $maxSensitiveDomain")
    val qs = quasiCols.map(col)
    val cs = df.groupBy((qs :+ col(sensitiveCol).as("__s")): _*)
      .agg(count(lit(1)).as("n_cs"))
    val classes = cs.groupBy(qs: _*).agg(sum(col("n_cs")).as("n_c"))
    val corpus = df.groupBy(col(sensitiveCol).as("__s")).agg(count(lit(1)).as("n_s"))
    // BROADCAST CONTRACT, checked loudly (the collectQueries/loadPqIndex
    // discipline): the class×sensitive grid below is |classes| × |domain|
    // rows, sane only while the sensitive DOMAIN is audit-small. A
    // mis-pointed high-cardinality column (an id, free text) must fail
    // with a diagnosis here, not silently build a corpus-squared grid.
    val nSens = corpus.limit(maxSensitiveDomain + 1).count()
    require(nSens <= maxSensitiveDomain,
      s"sensitive column '$sensitiveCol' has more than $maxSensitiveDomain distinct values" +
        " — not an auditable sensitive domain (is the column mis-pointed at an id or" +
        " free-text field?); raise maxSensitiveDomain only if the domain is genuinely" +
        " this large and the class-grid cost is accepted")
    val totals = corpus.agg(sum(col("n_s")).as("big_n"))
    // every (class, corpus-sensitive-value) cell: absent-in-class -> 0.
    // The cell join must be NULL-SAFE — a NULL sensitive (or quasi) value
    // is a legitimate group, and a null-unsafe join would zero its n_cs
    // while its mass still counts in n_c, overstating the deviation
    val csr = cs.select(
      (quasiCols.map(c => col(c).as(s"__cs_$c")) :+
        col("__s").as("__cs_s") :+ col("n_cs")): _*)
    val cellCond = (quasiCols.map(c => col(c) <=> col(s"__cs_$c")) :+
      (col("__s") <=> col("__cs_s"))).reduce(_ && _)
    val grid = classes.crossJoin(broadcast(corpus))
      .join(csr, cellCond, "left")
      .na.fill(0L, Seq("n_cs"))
      .crossJoin(broadcast(totals))
    grid.groupBy(qs: _*)
      .agg(first(col("n_c")).as("n_rows"),
        sum(abs(col("n_cs") * col("big_n") - col("n_s") * col("n_c"))).as("__dev"),
        first(col("n_c") * col("big_n")).as("__cn"))
      .select((qs :+ col("n_rows") :+
        (lit(tDen) * col("__dev") > lit(tNum) * lit(2L) * col("__cn")).as("at_risk")): _*)
  }
}
