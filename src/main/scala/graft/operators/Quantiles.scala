package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact per-key quantiles with `percentile_disc` semantics: the quantile at
 * probability p is the VALUE AT RANK ceil(p·n) in the key's sorted values —
 * an order statistic, not an interpolation, so results are integer-exact on
 * integer inputs (no float drift between engines, unlike `percentile`/
 * `quantile_cont`) — the form a pipeline uses to pick truncation/filter
 * thresholds from length and quality distributions.
 *
 * SCALE SHAPE: collapse to a per-key (value, count) HISTOGRAM first (one
 * map-side-combined aggregation whose (key, value) hash spreads even a
 * dominant key across tasks), then read quantiles off the running
 * cumulative count in value order — the [[globalExact]] trick per key.
 * The per-key window runs over the HISTOGRAM frame (bounded by the value
 * domain, not the data), never over corpus rows: the row-rank window
 * formulation would funnel a skewed low-cardinality key's dominant class
 * (half the corpus under `lang`) into ONE window partition = one task,
 * and AQE cannot split a skewed window partition (the
 * Privacy.kAnonymize lesson — PlanAuditSpec's sweep now flags that
 * shape). Two exchanges total, both of histogram mass. CONTRACT (same
 * as [[globalExact]]): the per-key value domain should be far below the
 * per-key row count — lengths, token counts, quantized scores.
 * Rank arithmetic is pure integer math:
 * ceil(p·n) = (n·num + den−1) div den with p rationalized at 1e-6
 * precision (exact for n < ~4.6e12 rows per key).
 */
object Quantiles {

  private val Den = 1000000L

  /**
   * Per-key order-statistic quantiles. `ps` maps output column name to
   * probability in (0, 1]; `tieCol` is retained for source compatibility —
   * the histogram formulation is order-free, so no tie-break is needed for
   * determinism. Rows with a NULL key or value are DROPPED (a null has
   * no rank; leaving them in would both inflate n and occupy the lowest
   * ranks, silently shifting every quantile). `carry` names columns
   * CONSTANT within each key to pass through to the output unchanged
   * (aggregated as their per-key max — lets a second quantile pass keep
   * the first pass's result without re-running its plan, the
   * [[robustStats]] shape). Returns one row per key:
   * (keyCol, ps..., carry...).
   */
  def perKeyExact(df: DataFrame, keyCol: String, valueCol: String, tieCol: String,
                  ps: Seq[(String, Double)], carry: Seq[String] = Nil): DataFrame = {
    require(ps.nonEmpty, "need at least one probability")
    ps.foreach { case (name, p) =>
      require(p > 0.0 && p <= 1.0, s"probability $name=$p outside (0, 1]")
      // below the rationalization precision, num would round to 0 and the
      // rank expression to 0 — no row matches and the quantile silently
      // reads NULL instead of the per-key minimum; reject instead
      require(math.round(p * Den) >= 1,
        s"probability $name=$p below the 1e-6 rank precision")
    }
    // per-key histogram: the only pass over the data, map-side combined,
    // hash-spread on (key, value) so a dominant key cannot skew a task
    val hist = df.select((Seq(keyCol, valueCol) ++ carry).map(col): _*)
      .where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol))
      .agg(count(lit(1)).as("__c"), carry.map(c => max(col(c)).as(c)): _*)
    // cumulative counts in value order over the HISTOGRAM (domain-bounded)
    val byKey = Window.partitionBy(keyCol)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(
        byKey.orderBy(col(valueCol)).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", sum(col("__c")).over(byKey))
    val aggs = ps.map { case (name, p) =>
      val num = math.round(p * Den)
      // the value at rank ceil(p*n) = the SMALLEST value whose cumulative
      // count reaches the rank; ceil in pure integer math
      val rank = expr(s"(__n * ${num}L + ${Den - 1}L) div ${Den}L")
      min(when(col("__cum") >= rank, col(valueCol))).as(name)
    } ++ carry.map(c => max(col(c)).as(c))
    cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Per-key quantile BUCKETING — score calibration ("is this document long
   * for ITS language?"): each row gets the 1-based index of its value's
   * equal-probability bin within its key's distribution, using
   * [[perKeyExact]]'s order-statistic cuts (bucket = 1 + #cuts strictly
   * below the value; ties share a bucket, so the assignment is a pure
   * function of (key, value)).
   *
   * SCALE SHAPE: the cut computation shuffles only the per-key (value,
   * count) HISTOGRAM ([[perKeyExact]]'s shape); the cut table (keys × nBuckets−1) joins back as a
   * plain equi-join — NOT a forced broadcast: AQE broadcasts it at runtime
   * when it is actually small (per-language strata), and falls back to a
   * shuffle join when the key is high-cardinality (per-user, per-document),
   * where a mandatory broadcast of the O(keys) frame would OOM the driver.
   * The assignment itself is a narrow comparison chain; payload columns
   * cross at most the one cut join. The per-row window formulation (ntile)
   * would instead sort EVERY key's full rows in one task per key. Rows with
   * a NULL key or value are dropped (they have no distribution to calibrate
   * against).
   */
  def bucketByQuantile(df: DataFrame, keyCol: String, valueCol: String, tieCol: String,
                       nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000, s"nBuckets must be in [2,1000], got $nBuckets")
    val ps = (1 until nBuckets).map(i => (s"__c$i", i.toDouble / nBuckets))
    ("bucket" +: ps.map(_._1)).foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by bucketByQuantile"))
    val rows = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
    val cuts = perKeyExact(rows, keyCol, valueCol, tieCol, ps)
    val bucket = ps.map { case (name, _) =>
      when(col(valueCol) > col(name), 1).otherwise(0)
    }.reduce(_ + _) + lit(1)
    rows.join(cuts, Seq(keyCol))
      .withColumn("bucket", bucket.cast("long"))
      .drop(ps.map(_._1): _*)
  }

  /**
   * Per-key WINSORIZATION — outlier clipping for score/length features:
   * each value is clamped into its key's [pLo, pHi] order-statistic range
   * from [[perKeyExact]] (a crawl pipeline clips per-language length and
   * quality tails before they dominate mixture weights or loss scales).
   * Clamping to an order statistic keeps the result integer-exact on
   * integer inputs — engine-reproducible, unlike mean±k·stddev clipping
   * whose float moments drift with reduction order.
   *
   * SCALE SHAPE: the cut computation shuffles only the per-key (value,
   * count) histogram ([[perKeyExact]]'s shape); the per-key cut pair joins back as a plain equi-join — AQE
   * broadcasts it when small, shuffle-joins it when the key cardinality is
   * data-proportional (a forced broadcast of an O(keys) frame is the
   * classic per-user-stats OOM). The clamp itself is a narrow
   * two-comparison projection. Output = the non-NULL-key/value input rows
   * plus a `winsorized` column.
   */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String, tieCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 < pLo < pHi <= 1, got pLo=$pLo pHi=$pHi")
    Seq("__lo", "__hi", "winsorized").foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by winsorize"))
    val rows = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
    val cuts = perKeyExact(rows, keyCol, valueCol, tieCol, Seq("__lo" -> pLo, "__hi" -> pHi))
    rows.join(cuts, Seq(keyCol))
      .withColumn("winsorized", least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /**
   * GLOBAL exact order-statistic quantiles WITHOUT a global sort: collapse
   * the corpus to a (value, count) histogram in one map-side-combined
   * aggregation — the shuffle carries DISTINCT VALUES, not rows — then read
   * the quantile off the running cumulative count in value order. Same
   * `percentile_disc` rank semantics as [[perKeyExact]] (value at rank
   * ceil(p·n), pure integer math).
   *
   * CONTRACT: the value domain's cardinality must be far below the row
   * count (quantized scores, cents, token counts — the discrete columns a
   * pipeline thresholds on). The cumulative pass runs in a single task over
   * the distinct-value frame, which is exactly as large as the domain, not
   * the data; a 100 TB column with millions of rows per distinct value pays
   * one narrow scan + one tiny sort. Returns ONE row: (n, ps...).
   */
  def globalExact(df: DataFrame, valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "need at least one probability")
    ps.foreach { case (name, p) =>
      require(p > 0.0 && p <= 1.0, s"probability $name=$p outside (0, 1]")
      require(math.round(p * Den) >= 1, s"probability $name=$p below the 1e-6 rank precision")
    }
    require(!ps.map(_._1).contains("n"), "column name n is reserved by globalExact")
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col(valueCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("__n", sum(col("__c")).over())
    val aggs = ps.map { case (name, p) =>
      val num = math.round(p * Den)
      val rank = expr(s"(__n * ${num}L + ${Den - 1}L) div ${Den}L")
      min(when(col("__cum") >= rank, col(valueCol))).as(name)
    }
    cum.agg(max(col("__n")).as("n"), aggs: _*)
  }

  /**
   * Per-key ROBUST location/scale — median and MAD (median absolute
   * deviation), both exact order statistics: the outlier-insensitive
   * alternative to mean/stddev for score normalization (one corrupt
   * quality score cannot move either number, where it moves a mean
   * arbitrarily). Integer-exact on integer inputs, so the pair
   * hash-compares across engines; robust z = (v - median) / (1.4826 * mad)
   * is one float division the CALLER applies.
   *
   * SCALE SHAPE: two [[perKeyExact]] histogram passes — only per-key
   * (value, count) frames shuffle, medians join back (plain equi-join: AQE broadcasts a small
   * per-stratum frame, shuffle-joins a per-user-sized one — the median
   * frame is O(keys), so a forced broadcast would OOM exactly when the
   * operator is most useful), |v - median| re-ranks with the median CARRIED
   * through the second pass's aggregation (so the median subplan runs once,
   * not once per consumer, and no third join is needed) — each pass a
   * single exchange of the projection, payloads never move.
   */
  def robustStats(df: DataFrame, keyCol: String, valueCol: String, tieCol: String): DataFrame = {
    Seq("median", "mad", "__absdev").foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by robustStats"))
    val rows = df.where(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol), col(tieCol))
    val med = perKeyExact(rows, keyCol, valueCol, tieCol, Seq("median" -> 0.5))
    val dev = rows.join(med, Seq(keyCol))
      .withColumn("__absdev", abs(col(valueCol) - col("median")))
    perKeyExact(dev, keyCol, "__absdev", tieCol, Seq("mad" -> 0.5), carry = Seq("median"))
      .select(col(keyCol), col("median"), col("mad"))
  }
}
