package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sorted.syntax._

/**
 * Driver contract: one query per implemented operator (SURVEY.md §2 + the
 * large-scale pipeline extensions), with DuckDB oracle SQL where the operator
 * is SQL-expressible.
 *
 * Conventions shared by every query/oracle pair (hash-compare safety):
 *  - output columns are aliased identically on both sides;
 *  - money/quantity aggregates go through `round(x*100) -> BIGINT` so sums are
 *    exact integer math in both engines;
 *  - `events.ts` is parquet TIMESTAMP(NANOS): Spark reads it as a raw
 *    nanosecond Long (`spark.sql.legacy.parquet.nanosAsLong`), DuckDB truncates
 *    to microseconds — ordering agrees (µs values are unique in the data);
 *    queries never output raw ts, only `ts div 1000` (µs) when needed;
 *  - every per-key value order carries the unique tie-breaker `event_id`.
 */
object SparkEntry {

  private[graft] def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS,false) which Spark 4 refuses by
    // default; read as raw nanos Long (idempotent session conf).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Flagship query on sf=0.001: per-user exponential moving average over the
    * event stream in (ts, event_id) order — the reference's motivating
    * time-series use case, as an order-sensitive streaming fold. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val ds = tbl(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", struct($"ts", $"event_id", $"value").as("v"))
      .as[(Long, (Long, Long, Double))]
    ds.groupSort()
      .foldLeftByKey(0.0)((acc, v) => 0.8 * acc + 0.2 * v._3)
      .toDF("user_id", "ema")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- per-key streaming ops on the group-sorted layout (SURVEY §2a/§2b) ----

    // groupSort + mapStreamByKey: top-3 events per user in (ts, event_id) order
    "q01_topn_per_key" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", struct($"ts", $"event_id").as("v"))
        .as[(Long, (Long, Long))]
      ds.groupSort().mapStreamByKey(_.take(3).map(_._2)).toDF("user_id", "event_id")
    }),

    // foldLeftByKey: order-sensitive string fold per user
    "q02_fold_concat" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", struct($"ts", $"event_id", $"event_type").as("v"))
        .as[(Long, (Long, Long, String))]
      ds.groupSort()
        .foldLeftByKey("")((acc, v) => if (acc.isEmpty) v._3 else acc + "," + v._3)
        .toDF("user_id", "path")
    }),

    // reduceLeftByKey: order-sensitive reduce (keeps earliest max)
    "q03_reduce_max" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", struct($"ts", $"event_id", $"value").as("v"))
        .as[(Long, (Long, Long, Double))]
      ds.groupSort()
        .reduceLeftByKey((a, b) => if (b._3 > a._3) b else a)
        .map { case (k, v) => (k, v._3) }
        .toDF("user_id", "max_value")
    }),

    // scanLeftByKey: running sum (in cents) per user, N+1 rows incl. zero row
    "q04_scan_running" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", struct($"ts", $"event_id", $"value").as("v"))
        .as[(Long, (Long, Long, Double))]
      ds.groupSort()
        .scanLeftByKey(0L)((acc, v) => acc + math.round(v._3 * 100))
        .toDF("user_id", "running")
    }),

    // combiner-style aggregation (map-side combine): sum of quantity cents
    "q05_combine_sum" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity")
        .as[(Long, Double)]
      ds.groupSortCombine[Long](v => math.round(v * 100), (c, v) => c + math.round(v * 100), _ + _)
        .toDF("l_orderkey", "sum_qty_cents")
    }),

    // semigroup reduce overload: event count per user
    "q06_semigroup_count" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", lit(1L).as("one"))
        .as[(Long, Long)]
      ds.groupSortReduce(_ + _).toDF("user_id", "n_events")
    }),

    // filter on the group-sorted layout (layout-preserving narrow op)
    "q07_filter" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", struct($"ts", $"event_id", $"value").as("v"))
        .as[(Long, (Long, Long, Double))]
      ds.groupSort()
        .filter(_._2._3 > 100.0)
        .mapKeyValuesToValues(kv => kv._2._2)
        .toDS.toDF("user_id", "event_id")
    }),

    // mapValues (narrow value projection)
    "q08_map_values" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", $"event_type")
        .as[(Long, String)]
      ds.groupSort().mapValues(_.toUpperCase).toDS.toDF("user_id", "et_upper")
    }),

    // flatMapValues (1-to-N value expansion)
    "q09_flatmap_values" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", $"props")
        .as[(Long, String)]
      ds.groupSort()
        .flatMapValues(p => p.split("\\W+").filter(_.nonEmpty))
        .toDS.toDF("user_id", "token")
    }),

    // mapKeyValuesToValues (value projection that reads the key)
    "q10_map_key_values" -> ((s, dir) => {
      import s.implicits._
      val ds = tbl(s, dir, "events")
        .select($"user_id", $"event_type")
        .as[(Long, String)]
      ds.groupSort()
        .mapKeyValuesToValues { case (k, v) => s"$k:$v" }
        .toDS.toDF("user_id", "tagged")
    }),

    // ---- merge join family (SURVEY §2c) ----

    "q11_join_inner" -> ((s, dir) => {
      import s.implicits._
      val cust = tbl(s, dir, "customer").select($"c_custkey", $"c_name").as[(Long, String)]
      val ords = tbl(s, dir, "orders").select($"o_custkey", $"o_orderkey").as[(Long, Long)]
      cust.groupSort().mergeJoinInner(ords.groupSort())
        .map { case (k, (name, okey)) => (k, name, okey) }
        .toDF("c_custkey", "c_name", "o_orderkey")
    }),

    "q12_join_left" -> ((s, dir) => {
      import s.implicits._
      val cust = tbl(s, dir, "customer").select($"c_custkey", $"c_name").as[(Long, String)]
      val ords = tbl(s, dir, "orders").select($"o_custkey", $"o_orderkey").as[(Long, Long)]
      cust.groupSort().mergeJoinLeftOuter(ords.groupSort())
        .map { case (k, (name, okey)) => (k, name, okey) }
        .toDF("c_custkey", "c_name", "o_orderkey")
    }),

    "q13_join_right" -> ((s, dir) => {
      import s.implicits._
      val ords = tbl(s, dir, "orders").select($"o_custkey", $"o_orderkey").as[(Long, Long)]
      val cust = tbl(s, dir, "customer").select($"c_custkey", $"c_name").as[(Long, String)]
      ords.groupSort().mergeJoinRightOuter(cust.groupSort())
        .map { case (k, (okey, name)) => (k, okey, name) }
        .toDF("c_custkey", "o_orderkey", "c_name")
    }),

    "q14_join_full" -> ((s, dir) => {
      import s.implicits._
      val cust = tbl(s, dir, "customer").select($"c_custkey", $"c_name").as[(Long, String)]
      val bigOrders = tbl(s, dir, "orders")
        .filter($"o_totalprice" > 150000.0)
        .select($"o_custkey", $"o_orderkey").as[(Long, Long)]
      cust.groupSort().mergeJoinOuter(bigOrders.groupSort())
        .map { case (k, (name, okey)) => (k, name, okey) }
        .toDF("custkey", "c_name", "o_orderkey")
    }),

    // generalized mergeJoin with a custom per-key merge function
    "q15_merge_join_count" -> ((s, dir) => {
      import s.implicits._
      val cust = tbl(s, dir, "customer").select($"c_custkey", $"c_name").as[(Long, String)]
      val ords = tbl(s, dir, "orders").select($"o_custkey", $"o_orderkey").as[(Long, Long)]
      cust.groupSort().mergeJoin(ords.groupSort()) { (names, okeys) =>
        if (names.hasNext) {
          val name = names.next()
          Iterator.single((name, okeys.size.toLong))
        } else Iterator.empty
      }
        .map { case (k, (name, n)) => (k, name, n) }
        .toDF("c_custkey", "c_name", "n_orders")
    }),

    // order-preserving mergeUnion of two disjoint splits
    "q16_merge_union" -> ((s, dir) => {
      import s.implicits._
      val ev = tbl(s, dir, "events")
        .select($"user_id", struct($"ts", $"event_id").as("v"))
        .as[(Long, (Long, Long))]
      val even = ev.filter($"v.event_id" % 2 === 0).groupSort(8)
      val odd = ev.filter($"v.event_id" % 2 === 1).groupSort(8)
      even.mergeUnion(odd).toDS
        .map { case (k, v) => (k, v._2) }
        .toDF("user_id", "event_id")
    }),

    // ---- relational surface the reference lacks, supplied by built-in Spark ----

    // ranking window: top-2 orders per customer by price
    "q17_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"))
    }),

    // hash aggregation with partial (map-side) combine: TPC-H Q1 shape
    "q18_agg_stats" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_cents"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_topn_per_key" ->
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3""".stripMargin,
    "q02_fold_concat" ->
      "SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS path FROM events GROUP BY user_id",
    "q03_reduce_max" ->
      "SELECT user_id, max(value) AS max_value FROM events GROUP BY user_id",
    "q04_scan_running" ->
      """SELECT user_id, CAST(0 AS BIGINT) AS running FROM (SELECT DISTINCT user_id FROM events) u
        |UNION ALL
        |SELECT user_id,
        |       CAST(sum(CAST(round(value*100) AS BIGINT))
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        |FROM events""".stripMargin,
    "q05_combine_sum" ->
      "SELECT l_orderkey, CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents FROM lineitem GROUP BY l_orderkey",
    "q06_semigroup_count" ->
      "SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id",
    "q07_filter" ->
      "SELECT user_id, event_id FROM events WHERE value > 100",
    "q08_map_values" ->
      "SELECT user_id, upper(event_type) AS et_upper FROM events",
    "q09_flatmap_values" ->
      """SELECT user_id, unnest(list_filter(regexp_split_to_array(props, '\W+'), x -> len(x) > 0)) AS token
        |FROM events""".stripMargin,
    "q10_map_key_values" ->
      "SELECT user_id, concat(CAST(user_id AS VARCHAR), ':', event_type) AS tagged FROM events",
    "q11_join_inner" ->
      "SELECT c_custkey, c_name, o_orderkey FROM customer JOIN orders ON c_custkey = o_custkey",
    "q12_join_left" ->
      "SELECT c_custkey, c_name, o_orderkey FROM customer LEFT JOIN orders ON c_custkey = o_custkey",
    "q13_join_right" ->
      "SELECT c_custkey, o_orderkey, c_name FROM orders RIGHT JOIN customer ON o_custkey = c_custkey",
    "q14_join_full" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, o_orderkey
        |FROM customer FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 150000.0) o
        |ON c_custkey = o_custkey""".stripMargin,
    "q15_merge_join_count" ->
      """SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q16_merge_union" ->
      "SELECT user_id, event_id FROM events",
    "q17_window_topk" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2""".stripMargin,
    "q18_agg_stats" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
