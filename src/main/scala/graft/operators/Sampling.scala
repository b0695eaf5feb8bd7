package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sorted.syntax._

/**
 * Deterministic sampling for training pipelines. `df.sample()` draws from an
 * RNG seeded per partition, so the sample CHANGES whenever partitioning,
 * cluster layout, or evaluation order changes — unacceptable for reproducible
 * train/validation splits or A/B corpus slices. These operators derive every
 * decision from a content hash of the row's id: the same row lands in the
 * same slice on any cluster, any partitioning, any engine (the md5-prefix
 * hash is reproducible in SQL engines for cross-system audits — the DuckDB
 * oracle recomputes it exactly).
 */
object Sampling {

  /** Uniform deterministic hash of an id into [0, 2^32): the first 8 hex
    * chars of md5 of the id's decimal string concatenated with a PURPOSE
    * SALT. Pure function of (value, salt) — stable across runs,
    * partitionings, and engines. The salt decorrelates the sampling
    * operators from each other: with one unsalted hash, `withSplit(0.25)`
    * after `deterministicSample(0.25)` would mark 100% of survivors as
    * holdout (the sample IS the low-hash set) instead of 25%. */
  def hash32(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10).cast("long")

  /** [[hash32]] evaluated JVM-side, for typed kernels that decide per-row
    * inside a map (the FIM split, for one) — SAME bytes, same salt
    * discipline, so a typed kernel and a Column expression (and the
    * DuckDB oracle) can never disagree on a sampling decision. Parity
    * with the Column form is spec-pinned. */
  def hash32Local(id: Long, salt: String = ""): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((id.toString + salt).getBytes("UTF-8"))
    // first 8 hex chars == first 4 bytes, big-endian, zero-extended
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Keep ~`fraction` of rows, deterministically: a row survives iff its id
    * hash (salt "sample") falls below fraction * 2^32. Rerunning,
    * repartitioning, or scaling the cluster cannot change the sample;
    * growing the corpus never evicts a previously sampled row (the decision
    * is per-row, not per-quota); composes independently with [[withSplit]]
    * and [[perKeySample]] (distinct salts). */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.where(hash32(col(idCol), "sample") < (fraction * 4294967296.0).toLong)
  }

  /** Deterministic train/holdout assignment: adds `is_holdout`, true for
    * ~`holdoutFraction` of rows (salt "split" — INDEPENDENT of
    * [[deterministicSample]]'s selection, so splitting a sampled corpus
    * yields the requested fraction, not an artifact of the shared hash).
    * A row is in exactly one split, forever. */
  def withSplit(df: DataFrame, idCol: String, holdoutFraction: Double): DataFrame = {
    require(holdoutFraction >= 0.0 && holdoutFraction <= 1.0,
      s"holdoutFraction must be in [0,1], got $holdoutFraction")
    require(!df.columns.contains("is_holdout"), "is_holdout is reserved by withSplit")
    df.withColumn("is_holdout", hash32(col(idCol), "split") < (holdoutFraction * 4294967296.0).toLong)
  }

  /**
   * Per-stratum deterministic sampling: keep ~`fractions(stratum)` of each
   * stratum's rows (strata compared as strings; strata absent from the map
   * keep `defaultFraction`). Rebalancing a skewed corpus — downsample the
   * dominant language, keep all of a rare one — is THE curation use of
   * sampling at 100 TB, and it must be deterministic for reproducible
   * retrains. Same [[hash32]] contract with its own salt ("strata"), so it
   * composes independently with the other samplers; the per-stratum
   * threshold folds into one CASE column — a single narrow filter at scan
   * speed, no shuffle, no join.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0,1], got $f"))
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(
        lit((defaultFraction * 4294967296.0).toLong)) { case (els, (k, f)) =>
      when(col(stratumCol).cast("string") === k, lit((f * 4294967296.0).toLong)).otherwise(els)
    }
    df.where(hash32(col(idCol), "strata") < thr)
  }

  /**
   * ADAPTIVE stratified rebalancing: downsample every stratum to an expected
   * `budget` rows, with the per-stratum fraction min(1, budget / count)
   * computed FROM the data — the "cap the dominant language, keep the rare
   * ones whole" curation move when the mix isn't known up front
   * ([[stratifiedSample]] is its fixed-fraction sibling). Two-pass but
   * corpus-light: pass one is a tiny count-per-stratum aggregation, whose
   * result (a handful of rows) broadcasts back as the threshold dim — the
   * corpus itself never shuffles, the keep-decision is the same narrow
   * [[hash32]] filter (salt "rebalance", independent of the other
   * samplers). Expected (not exact) per-stratum size, like every
   * hash-threshold sampler here: the decision stays per-row, so growing a
   * stratum never evicts previously kept rows of OTHER strata (exact-N
   * quotas would reshuffle everything on every ingest). Rows with a NULL
   * stratum are dropped (they match no threshold row).
   */
  def rebalanceToBudget(df: DataFrame, stratumCol: String, idCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    Seq("__stratum", "__thr").foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by rebalanceToBudget"))
    val thr = df
      .groupBy(col(stratumCol).cast("string").as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__stratum"),
        floor(least(lit(1.0), lit(budget.toDouble) / col("__n")) * 4294967296.0)
          .cast("long").as("__thr"))
    df.join(broadcast(thr), df(stratumCol).cast("string") === col("__stratum"))
      .where(hash32(col(idCol), "rebalance") < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /**
   * WEIGHTED deterministic Bernoulli sampling: a row is kept with probability
   * `baseFraction * min(max(weight, 0), maxWeight) / maxWeight` — the
   * quality-weighted curation move ("keep more of the long/high-quality
   * documents, less of the short ones") with the same reproducibility
   * contract as [[deterministicSample]]. The per-row threshold is computed
   * ENTIRELY in 64-bit integer math —
   * `floor(baseFraction * 2^32) * w div maxWeight` — so the keep decision is
   * bit-identical across engines (no float rounding at the boundary; the
   * DuckDB oracle replays the identical integer expression). Same
   * per-row/never-evict posture: a narrow filter at scan speed, no shuffle,
   * salt "wsample" decorrelates it from every other sampler.
   *
   * `maxWeight` is capped at 2^30 so `scaledBase * w` stays within Int64
   * (2^32 * 2^30 = 2^62).
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      maxWeight: Long, baseFraction: Double): DataFrame = {
    require(maxWeight > 0 && maxWeight <= (1L << 30),
      s"maxWeight must be in [1, 2^30], got $maxWeight")
    require(baseFraction >= 0.0 && baseFraction <= 1.0,
      s"baseFraction must be in [0,1], got $baseFraction")
    val scaledBase = (baseFraction * 4294967296.0).toLong
    val thr = expr(
      s"${scaledBase}L * least(greatest(CAST(`$weightCol` AS BIGINT), 0L), ${maxWeight}L) div ${maxWeight}L")
    df.where(hash32(col(idCol), "wsample") < thr)
  }

  /**
   * TEMPERATURE-flattened mixture sampling — the standard multilingual /
   * multi-source data-mixing move: sample stratum s with expected size
   * `budget * sqrt(n_s) / Σ sqrt(n_t)` (capped at n_s), i.e. mixture weights
   * ∝ n^(1/2) instead of n, so dominant sources are flattened and rare ones
   * up-weighted relative to their natural share (temperature T = 2 in the
   * p^(1/T) convention). [[rebalanceToBudget]] is the T → ∞ limit (equal
   * budgets); natural sampling is T = 1.
   *
   * The exponent is FIXED at 1/2 deliberately: IEEE-754 `sqrt` is correctly
   * rounded on every platform/engine, so `floor(sqrt(n))` is bit-identical
   * everywhere and all downstream math stays in 64-bit integers — an
   * arbitrary `pow(n, alpha)` is NOT correctly rounded and would make the
   * keep decision engine-dependent at threshold boundaries. Same
   * [[hash32]] contract (salt "tempmix"): the corpus never shuffles, the
   * tiny per-stratum threshold dim broadcasts back, rows with a NULL
   * stratum are dropped. `budget` is bounded to 2^31 so `2^32 * target`
   * stays within Int64.
   */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String, budget: Long): DataFrame = {
    require(budget > 0 && budget < (1L << 31),
      s"budget must be in [1, 2^31), got $budget")
    Seq("__stratum", "__n", "__wt", "__W", "__thr").foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by temperatureMix"))
    // NULL strata are dropped BEFORE weighting: a NULL group would inflate
    // Σ√n (shrinking every real stratum's share) while its own rows could
    // never be emitted through the equi-join below
    val wts = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wt", expr("CAST(floor(sqrt(CAST(__n AS DOUBLE))) AS BIGINT)"))
    val tot = wts.agg(sum(col("__wt")).as("__W"))
    val thr = wts.crossJoin(broadcast(tot)).select(col("__stratum"),
      expr(s"4294967296L * least((${budget}L * __wt) div __W, __n) div __n").as("__thr"))
    df.join(broadcast(thr), df(stratumCol).cast("string") === col("__stratum"))
      .where(hash32(col(idCol), "tempmix") < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /**
   * EXPECTED-CAP per-key sampling — the cluster-balancing move for
   * embedding-space curation: no key (topic cluster, near-dup component,
   * crawl host) contributes more than ~`cap` rows IN EXPECTATION; keys
   * at or under the cap keep everything. Keep a row iff
   * `hash32(id, "keycap") < floor(2^32 · min(cap, n_key) / n_key)` —
   * the [[deterministicSample]] md5 discipline with a per-key threshold,
   * so the decision is per-row, partitioning-invariant, and
   * engine-replayable in exact integer math (DuckDB `//`, Spark `div`).
   * Unlike [[topKPerKey]]'s hard rank cap this needs NO per-key ordering
   * state — the corpus never shuffles; one key-cardinality-sized count
   * aggregation broadcasts back and the filter rides the scan. Growing a
   * key's population only ever LOWERS its members' threshold — rows
   * leave monotonically, never churn in and out. NULL keys drop (the
   * [[temperatureMix]] rule).
   *
   * CARDINALITY CONTRACT: the per-key threshold frame is broadcast, so
   * the key must be BOUNDED — IVF cells (≤ k), topic clusters, language
   * buckets. Near-dup components or crawl hosts at corpus scale are
   * ~10^8–10^9 distinct keys: a broadcast that size kills the driver and
   * every executor long before the join runs. The [[Similarity]]
   * `collectQueries` discipline applies: the threshold frame is COUNTED
   * before the hint and the call fails loudly past `maxKeys` (default
   * 2^22 ≈ 4M keys ≈ tens of MB broadcast — generous for every bounded
   * key family, far below the unbounded ones). The count is one extra
   * map-side-combined aggregation over `df` — cheap insurance against
   * the silent scale-killer. Raise `maxKeys` only with a deliberate
   * memory budget; for genuinely unbounded keys use [[topKPerKey]]'s
   * shuffled rank cap instead.
   */
  def capPerKeySample(df: DataFrame, keyCol: String, idCol: String, cap: Long,
      maxKeys: Long = 1L << 22,
      unpersistHook: (() => Unit) => Unit = null): DataFrame = {
    require(cap > 0 && cap < (1L << 31), s"cap must be in [1, 2^31), got $cap")
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    Seq("__key", "__n", "__thr").foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by capPerKeySample"))
    // persisted so the guard count and the broadcast below share ONE
    // aggregation pass over `df`. Lifecycle: a caller that threads an
    // `unpersistHook` owns the drain (the q248 onCleanup shape — one
    // pass, released after the query materializes); a caller that does
    // NOT is made SELF-CLEANING — the cache is dropped right after the
    // guard count, trading the second aggregation pass back for zero
    // session-lifetime leak (an un-hooked call must never accumulate a
    // maxKeys-sized cache per invocation). The guard-failure path
    // unpersists unconditionally for both kinds of caller.
    val thr = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__key"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__key"),
        expr(s"4294967296L * least(${cap}L, __n) div __n").as("__thr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    if (unpersistHook != null) unpersistHook(() => { thr.unpersist(); () })
    // guard BEFORE the broadcast hint: limit bounds the count job itself,
    // so even a 10^9-key frame answers the question with bounded work
    // (the limit also bounds what the persist above materializes on that
    // first pass — only the probed prefix caches when the guard trips)
    val nKeys =
      try thr.limit(((maxKeys min (Int.MaxValue - 1L)) + 1).toInt).count()
      catch { case t: Throwable => thr.unpersist(); throw t }
    if (nKeys > maxKeys) {
      thr.unpersist()
      throw new IllegalArgumentException(
        s"capPerKeySample key '$keyCol' exceeds maxKeys=$maxKeys distinct values — " +
          "the per-key threshold frame is broadcast by contract; this key is not " +
          "bounded-cardinality. Use topKPerKey's shuffled rank cap, or raise " +
          "maxKeys deliberately with a matching broadcast memory budget")
    }
    if (unpersistHook == null) thr.unpersist()
    df.join(broadcast(thr), df(keyCol).cast("string") === col("__key"))
      .where(hash32(col(idCol), "keycap") < col("__thr"))
      .drop("__key", "__thr")
  }

  /**
   * TOKEN-BUDGET mixture sampling — the data-card move trainers actually
   * budget by: hit a TARGET TOKEN COMPOSITION, not a document-count one
   * ([[temperatureMix]] flattens doc counts; a stratum of long documents
   * would blow its token share right through a doc-count target). Given
   * integer milli-shares (`Map("en" -> 600, "code" -> 250, ...)`) and a
   * total token `budget`, stratum s targets `budget·share_s div 1000`
   * tokens and keeps each row with probability
   * `min(target_s, actual_s) / actual_s` — Bernoulli on the row keeps
   * the EXPECTED KEPT TOKEN MASS at the target regardless of how tokens
   * distribute across documents. Same [[hash32]] discipline (salt
   * "tokmix"): thresholds are exact 64-bit integer math (the `least`
   * operand is ≤ budget < 2^31, so `2^32·least` never overflows even
   * when a stratum's actual mass is in the trillions), the corpus never
   * shuffles (one stratum-cardinality mass aggregation broadcasts back),
   * and the keep decision is per-row, partitioning-invariant, and
   * engine-replayable. Strata absent from the map target 0 and drop;
   * NULL strata drop; `weightCol` must be a non-negative integer token
   * count (the q21 tokenCount contract).
   */
  def tokenBudgetMix(df: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, sharesMilli: Map[String, Long], budget: Long): DataFrame = {
    require(budget > 0 && budget < (1L << 31), s"budget must be in [1, 2^31), got $budget")
    require(sharesMilli.values.forall(s => s >= 0 && s <= 1000),
      s"milli-shares must be in [0, 1000], got $sharesMilli")
    require(sharesMilli.values.sum <= 1000,
      s"milli-shares sum to ${sharesMilli.values.sum} > 1000 — not a composition")
    Seq("__stratum", "__actual", "__share", "__thr").foreach(c =>
      require(!df.columns.contains(c), s"$c is reserved by tokenBudgetMix"))
    val shareExpr = sharesMilli.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (els, (k, sh)) =>
        when(col("__stratum") === k, lit(sh)).otherwise(els)
    }
    val thrWithShare = df.where(col(stratumCol).isNotNull)
      // a negative (or NULL) weight would silently deflate the stratum
      // mass and inflate every sibling's keep rate — fail in-plan, not
      // in the math (assert_true is NULL when the condition holds, and
      // throws otherwise — including on a NULL weight)
      .where(expr(s"assert_true($weightCol >= 0, " +
        s"'tokenBudgetMix: negative or NULL token weight in $weightCol') IS NULL"))
      .groupBy(col(stratumCol).cast("string").as("__stratum"))
      .agg(sum(col(weightCol)).cast("long").as("__actual"))
      .withColumn("__share", shareExpr)
      // greatest(,1): an all-zero-weight stratum targets 0 and keeps 0
      // rows — never a division by zero under ANSI
      .select(col("__stratum"),
        expr(s"4294967296L * least((${budget}L * __share) div 1000L, __actual)" +
          " div greatest(__actual, 1L)").as("__thr"))
    df.join(broadcast(thrWithShare), df(stratumCol).cast("string") === col("__stratum"))
      .where(hash32(col(idCol), "tokmix") < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /**
   * GROUP-level train/holdout assignment: `is_holdout` is a function of
   * `groupCol`'s hash (salt "groupsplit"), not the row's — every member of a
   * group lands on the same side of the split. THE leakage guard for
   * training pipelines: split a deduplicated corpus by near-dup CLUSTER
   * (component id from [[Dedup.connectedComponents]]) and no pair of
   * near-duplicates can straddle train/eval — per-document splitting
   * ([[withSplit]]) leaks every cluster that crosses the boundary. Same
   * deterministic [[hash32]] contract: narrow, partitioning-invariant,
   * engine-reproducible. A NULL group hashes to NULL, so the predicate is
   * coalesced to FALSE: ungrouped rows land deterministically in TRAIN
   * (never silently in neither slice — a NULL `is_holdout` would fall out
   * of both `where(is_holdout)` and `where(!is_holdout)`); callers wanting
   * NULL groups held out should coalesce the group column first.
   */
  def splitByGroup(df: DataFrame, groupCol: String, holdoutFraction: Double): DataFrame = {
    require(holdoutFraction >= 0.0 && holdoutFraction <= 1.0,
      s"holdoutFraction must be in [0,1], got $holdoutFraction")
    require(!df.columns.contains("is_holdout"), "is_holdout is reserved by splitByGroup")
    df.withColumn("is_holdout",
      coalesce(hash32(col(groupCol), "groupsplit") < (holdoutFraction * 4294967296.0).toLong,
        lit(false)))
  }

  /**
   * k rows per key, chosen as the k SMALLEST id-hashes (hash-minima are a
   * uniform random sample under a uniform hash — deterministic "reservoir"
   * sampling). Ranked through a bounded insertion-sort combiner with map-side
   * partial aggregation, so per-key state is O(k) and the shuffle carries at
   * most k rows per key per partition — a hot key with 10M rows never sorts
   * in one task (the row_number-window formulation would).
   *
   * Keys are compared as strings (cast back in the caller if needed);
   * ties on hash break by id, so the result is a pure function of the data.
   */
  def perKeySample(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val scored = df.select(
        col(keyCol).cast("string"),
        struct(hash32(col(idCol), "perkey").as("h"), col(idCol).cast("long").as("id")).as("s"))
      .as[(String, (Long, Long))]
    def ins(acc: List[(Long, Long)], v: (Long, Long)): List[(Long, Long)] =
      ((v :: acc).sorted).take(k)
    scored
      .groupSortCombine[List[(Long, Long)]](v => List(v), ins, (a, b) => (a ++ b).sorted.take(k))
      .flatMap { case (key, vs) => vs.iterator.map(v => (key, v._2)) }
      .toDF(keyCol, idCol)
  }

  /**
   * Per-key CAP keeping the k BEST rows — the per-domain document cap of
   * crawl curation: no source may contribute more than k documents, and the
   * kept ones are the best by an explicit score (not an arbitrary subset the
   * way a plain limit would pick). Ranked by (valueCol DESC, idCol ASC)
   * through the same bounded insertion-sort combiner as [[perKeySample]]:
   * per-key state is O(k) and the shuffle carries at most k rows per key per
   * partition — a hot domain with 10M pages never sorts its full row set in
   * one task (the row_number-window formulation would). Rows with a NULL
   * key, id, or value are dropped; keys compare as strings, id and value
   * must cast to long (score integerization is the caller's contract, same
   * as the quantile operators).
   */
  def topKPerKey(df: DataFrame, keyCol: String, idCol: String, valueCol: String,
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // (value DESC, id ASC) as an explicit Ordering — negating the value
    // would overflow on Long.MinValue
    implicit val byScore: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val scored = df
      .where(col(keyCol).isNotNull && col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).cast("string"),
        struct(col(valueCol).cast("long").as("v"), col(idCol).cast("long").as("id")).as("s"))
      .as[(String, (Long, Long))]
    def ins(acc: List[(Long, Long)], v: (Long, Long)): List[(Long, Long)] =
      ((v :: acc).sorted(byScore)).take(k)
    scored
      .groupSortCombine[List[(Long, Long)]](v => List(v), ins,
        (a, b) => (a ++ b).sorted(byScore).take(k))
      .flatMap { case (key, vs) => vs.iterator.map(v => (key, v._2, v._1)) }
      .toDF(keyCol, idCol, valueCol)
  }
}
