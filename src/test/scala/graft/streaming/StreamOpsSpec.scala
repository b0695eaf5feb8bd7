package graft.streaming

import java.sql.Timestamp

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.operators.Sessions
import graft.sorted.syntax._

class StreamOpsSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  // offset from epoch: a record exactly at the initial watermark (0) is dropped as late
  private def ts(minute: Int): Timestamp = new Timestamp((minute + 60) * 60000L)

  describe("sessionize (flatMapGroupsWithState)") {
    it("finalizes a gap-split session once the watermark passes its end + gap") {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val sessions = StreamOps.sessionize(input.toDS(), gapMs = 10 * 60000L, watermarkDelay = "0 seconds")
      val q = sessions.writeStream.format("memory").queryName("sess1")
        .outputMode(OutputMode.Append()).start()
      try {
        // user 1: events at minute 0,5 then 30 (gap 25 min > 10) then 31
        input.addData(
          StreamEvent(1L, ts(0), "click", 1.0),
          StreamEvent(1L, ts(5), "click", 1.0),
          StreamEvent(1L, ts(30), "click", 1.0),
          StreamEvent(1L, ts(31), "click", 1.0))
        q.processAllAvailable()
        // sessions are held until the watermark passes (late data could still
        // join them); a later event advances the watermark to minute 120 and
        // the engine's no-data batch then fires the event-time timeouts,
        // finalizing BOTH of user 1's sessions
        input.addData(StreamEvent(99L, ts(120), "click", 1.0))
        q.processAllAvailable()
        val closed = spark.table("sess1").as[SessionClosed].collect()
          .filter(_.user_id == 1L).sortBy(_.start_ms)
        assert(closed.toSeq === Seq(
          SessionClosed(1L, ts(0).getTime, ts(5).getTime, 2L),
          SessionClosed(1L, ts(30).getTime, ts(31).getTime, 2L)))
      } finally q.stop()
    }

    it("an admissible late event BRIDGES two sessions the gap had split") {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val sessions = StreamOps.sessionize(input.toDS(), gapMs = 10 * 60000L, watermarkDelay = "2 hours")
      val q = sessions.writeStream.format("memory").queryName("sess3")
        .outputMode(OutputMode.Append()).start()
      try {
        // minute 0 and minute 16: gap 16 > 10 -> two provisional sessions
        input.addData(StreamEvent(4L, ts(0), "click", 1.0), StreamEvent(4L, ts(16), "click", 1.0))
        q.processAllAvailable()
        // late event at minute 8 is within gap of BOTH -> they collapse to one
        input.addData(StreamEvent(4L, ts(8), "click", 1.0))
        q.processAllAvailable()
        // advance the watermark far enough to finalize everything (2 batches:
        // the watermark used by a batch comes from the previous one)
        input.addData(StreamEvent(98L, ts(600), "x", 1.0))
        q.processAllAvailable()
        input.addData(StreamEvent(98L, ts(601), "x", 1.0))
        q.processAllAvailable()
        val closed = spark.table("sess3").as[SessionClosed].collect().filter(_.user_id == 4L)
        assert(closed.toSeq === Seq(SessionClosed(4L, ts(0).getTime, ts(16).getTime, 3L)))
      } finally q.stop()
    }

    it("closes open sessions via event-time timeout when the watermark advances") {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val sessions = StreamOps.sessionize(input.toDS(), gapMs = 10 * 60000L, watermarkDelay = "0 seconds")
      val q = sessions.writeStream.format("memory").queryName("sess2")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(StreamEvent(7L, ts(0), "click", 1.0))
        q.processAllAvailable()
        // watermark jumps far past lastSeen+gap -> timeout fires for user 7
        input.addData(StreamEvent(8L, ts(120), "click", 1.0))
        q.processAllAvailable()
        input.addData(StreamEvent(9L, ts(300), "click", 1.0))
        q.processAllAvailable()
        val closed = spark.table("sess2").as[SessionClosed].collect().map(_.user_id).toSet
        assert(closed.contains(7L))
      } finally q.stop()
    }
  }

  describe("sessionize ≡ batch sessionCounts (finite replay equivalence)") {
    // The driver's DuckDB oracle cannot check a streaming query, so this is the
    // strongest available gate: the SAME finite event set, delivered in several
    // arrival orders (including late data split across micro-batches), must
    // close exactly the sessions the batch operator derives — same per-user
    // session COUNT (vs Sessions.sessionCounts), same event totals, and the
    // same (start, end, n) intervals under every permutation.
    val gapMs = 10 * 60000L
    val userMinutes: Map[Long, Seq[Int]] = Map(
      1L -> Seq(0, 5, 30, 31, 45),   // 3 sessions: [0,5] [30,31] [45]
      2L -> Seq(0, 8, 16),           // 1 session — the 8 bridges 0 and 16 when it arrives LAST
      3L -> Seq(2, 12, 22, 32, 42),  // gaps exactly == gap: 1 session in both engines
      4L -> Seq(7),                  // singleton session
      5L -> Seq(0, 11, 21, 40))      // 3 sessions: [0] [11,21] [40]
    val allEvents: Seq[StreamEvent] =
      userMinutes.toSeq.flatMap { case (u, ms) => ms.map(m => StreamEvent(u, ts(m), "click", 1.0)) }

    def runStreaming(arrival: Seq[StreamEvent], name: String): Seq[SessionClosed] = {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      // 2h watermark delay: every permutation of a <=45-minute replay is admissible late data
      val q = StreamOps.sessionize(input.toDS(), gapMs, watermarkDelay = "2 hours")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        arrival.grouped(6).foreach { batch => input.addData(batch); q.processAllAvailable() }
        // two flush batches: the watermark a batch USES comes from the previous one
        input.addData(StreamEvent(999L, ts(600), "x", 1.0)); q.processAllAvailable()
        input.addData(StreamEvent(999L, ts(601), "x", 1.0)); q.processAllAvailable()
        spark.table(name).as[SessionClosed].collect().toSeq.filter(_.user_id != 999L)
      } finally q.stop()
    }

    it("closes the batch operator's sessions under in-order, reversed, and shuffled late arrival") {
      val batchCounts: Map[Long, Long] =
        Sessions.sessionCounts[Long, Long](
          allEvents.map(e => (e.user_id, e.ts.getTime)).toDS().groupSort(4), identity, gapMs)
          .collect().toMap

      val inOrder = allEvents.sortBy(_.ts.getTime)
      val permutations = Seq(
        "eq_inorder" -> inOrder,
        "eq_reversed" -> inOrder.reverse,
        "eq_shuffled" -> new scala.util.Random(42).shuffle(allEvents))
      val results = permutations.map { case (name, arrival) =>
        val closed = runStreaming(arrival, name)
        // per-user session count matches the batch operator exactly
        val streamCounts = closed.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
        assert(streamCounts === batchCounts, s"session counts diverged for arrival order $name")
        // no event lost or duplicated: per-user n_events sums to the replay size
        val eventTotals = closed.groupBy(_.user_id).view.mapValues(_.map(_.n_events).sum).toMap
        assert(eventTotals === userMinutes.view.mapValues(_.size.toLong).toMap, s"event totals diverged for $name")
        // closed sessions are genuinely gap-separated intervals
        closed.groupBy(_.user_id).values.foreach { ss =>
          ss.sortBy(_.start_ms).sliding(2).foreach {
            case Seq(a, b) => assert(b.start_ms - a.end_ms > gapMs, s"adjacent sessions within gap for $name")
            case _ =>
          }
        }
        closed.map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events)).toSet
      }
      // every arrival order closes the IDENTICAL session set
      assert(results.distinct.size === 1, "arrival order changed the closed-session set")
    }
  }

  describe("dedupWithinWatermark") {
    it("drops repeated keys within the watermark horizon") {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val deduped = StreamOps.dedupWithinWatermark(input.toDS(), Seq("user_id", "event_type"), "10 minutes")
      val q = deduped.writeStream.format("memory").queryName("dd")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          StreamEvent(1L, ts(0), "click", 1.0),
          StreamEvent(1L, ts(1), "click", 2.0), // dup (user, type) within horizon
          StreamEvent(1L, ts(2), "buy", 3.0),
          StreamEvent(2L, ts(0), "click", 4.0))
        q.processAllAvailable()
        val got = spark.table("dd").as[StreamEvent].collect().map(e => (e.user_id, e.event_type)).toSeq
        assert(got.sorted === Seq((1L, "buy"), (1L, "click"), (2L, "click")))
        // cross-batch duplicate within the horizon is still dropped
        input.addData(StreamEvent(1L, ts(3), "click", 9.0))
        q.processAllAvailable()
        assert(spark.table("dd").count() === 3L)
        // watermark advances past the horizon -> state ages out, key re-admits
        input.addData(StreamEvent(9L, ts(500), "marker", 0.0))
        q.processAllAvailable()
        input.addData(StreamEvent(1L, ts(501), "click", 7.0))
        q.processAllAvailable()
        assert(spark.table("dd").count() === 5L) // 3 + marker + re-admitted dup
      } finally q.stop()
    }

    it("rejects an empty key-column list with a clear message") {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val e = intercept[IllegalArgumentException] {
        StreamOps.dedupWithinWatermark(input.toDS(), Seq.empty)
      }
      assert(e.getMessage.contains("at least one key column"))
    }
  }

  describe("dedupWithinWatermark ≡ batch Dedup.exact (finite replay equivalence)") {
    // The same finite event set, replayed in several arrival orders (batches
    // split so duplicates cross micro-batch boundaries, including LATE
    // arrivals under a wide watermark), must keep exactly one survivor per
    // distinct (user_id, event_type) — the same key set the batch operator
    // derives. The surviving REPRESENTATIVE is engine-defined (streaming
    // keeps the first arrival, Dedup.exact the minimum id), which mirrors
    // real dedup usage: for exact dedup the keyed content is identical, so
    // any representative is equivalent.
    val raw: Seq[StreamEvent] = Seq(
      StreamEvent(1L, ts(0), "click", 1.0), StreamEvent(1L, ts(4), "click", 2.0),
      StreamEvent(1L, ts(9), "buy", 3.0),
      StreamEvent(2L, ts(1), "click", 4.0), StreamEvent(2L, ts(2), "click", 5.0),
      StreamEvent(2L, ts(8), "click", 6.0),
      StreamEvent(3L, ts(5), "view", 7.0),
      StreamEvent(4L, ts(3), "buy", 8.0), StreamEvent(4L, ts(7), "buy", 8.0))

    def runStream(arrival: Seq[StreamEvent], name: String): Seq[(Long, String)] = {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      // 2h watermark: every permutation of this <=10-minute replay is
      // admissible, so no duplicate can sneak past an aged-out state entry
      val q = StreamOps.dedupWithinWatermark(input.toDS(), Seq("user_id", "event_type"), "2 hours")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        // batches of 3: duplicate keys land both within one batch and across
        // batches, exercising intra-batch and stateful cross-batch dropping
        arrival.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table(name).as[StreamEvent].collect().toSeq.map(e => (e.user_id, e.event_type))
      } finally q.stop()
    }

    it("keeps exactly the batch operator's surviving key set under every arrival order") {
      import org.apache.spark.sql.functions.{col, concat_ws}
      // batch side: Dedup.exact over the same rows keyed by the same columns
      // (\u0001 separator keeps composite keys unambiguous), representatives
      // joined back to their keys
      val df = raw.zipWithIndex
        .map { case (e, i) => (i.toLong, e.user_id, e.event_type) }
        .toDF("eid", "user_id", "event_type")
      val batchKeys = graft.operators.Dedup.exact(df, "eid", concat_ws("\u0001", col("user_id"), col("event_type")))
        .join(df, "eid")
        .select("user_id", "event_type").as[(Long, String)].collect().toSet

      val inOrder = raw.sortBy(_.ts.getTime)
      for ((name, arrival) <- Seq(
          "ddeq_inorder" -> inOrder,
          "ddeq_reversed" -> inOrder.reverse,
          "ddeq_shuffled" -> new scala.util.Random(7).shuffle(raw))) {
        val kept = runStream(arrival, name)
        // one survivor per key, and the key set is the batch operator's
        assert(kept.size === kept.toSet.size, s"$name emitted a duplicate key")
        assert(kept.toSet === batchKeys, s"$name key set diverged from Dedup.exact")
      }
    }
  }

  describe("windowedCounts (watermarked sliding windows)") {
    it("equals the batch window aggregation on a finite replay (late arrivals included)") {
      implicit val sc = spark.sqlContext
      // deterministic event set across 3 users / 4 windows, delivered with the
      // second batch strictly EARLIER in event time than the first (late data
      // under a wide-enough watermark must still land in its window)
      val events = Seq(
        StreamEvent(1L, ts(1), "click", 2.0), StreamEvent(2L, ts(3), "view", 1.5),
        StreamEvent(1L, ts(12), "click", 4.0), StreamEvent(3L, ts(25), "buy", 9.0),
        StreamEvent(2L, ts(14), "click", 1.0), StreamEvent(1L, ts(35), "view", 3.0))
      val (batch1, batch2) = events.splitAt(4)
      val input = MemoryStream[StreamEvent]
      val counts = StreamOps.windowedCounts(input.toDS(), "10 minutes", "10 minutes", "2 hours")
      val q = counts.writeStream.format("memory").queryName("wceq")
        .outputMode(OutputMode.Complete()).start()
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
        val streamed = spark.table("wceq")
          .selectExpr("window.start AS ws", "event_type", "n",
            "CAST(round(sum_value*100) AS BIGINT) AS sv")
          .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
        val batch = events.toDS()
          .groupBy(org.apache.spark.sql.functions.window($"ts", "10 minutes").as("window"), $"event_type")
          .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum($"value").as("sum_value"))
          .selectExpr("window.start AS ws", "event_type", "n",
            "CAST(round(sum_value*100) AS BIGINT) AS sv")
          .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
        assert(streamed === batch)
      } finally q.stop()
    }

    it("counts per window and type") {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val counts = StreamOps.windowedCounts(input.toDS(), "10 minutes", "10 minutes", "0 seconds")
      val q = counts.writeStream.format("memory").queryName("wc")
        .outputMode(OutputMode.Complete()).start()
      try {
        input.addData(
          StreamEvent(1L, ts(1), "click", 2.0),
          StreamEvent(2L, ts(2), "click", 3.0),
          StreamEvent(1L, ts(11), "buy", 5.0))
        q.processAllAvailable()
        val rows = spark.table("wc")
          .selectExpr("event_type", "n", "sum_value").as[(String, Long, Double)]
          .collect().toSet
        assert(rows === Set(("click", 2L, 5.0), ("buy", 1L, 5.0)))
      } finally q.stop()
    }
  }

  describe("streamingCountMin ≡ batch Sketch.countMin (finite replay equivalence)") {
    it("the running sketch equals the batch sketch of everything ingested so far") {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val sketch = StreamOps.streamingCountMin(
        input.toDS().toDF(), org.apache.spark.sql.functions.col("event_type"),
        depth = 4, width = 64)
      val q = sketch.writeStream.format("memory").queryName("cms")
        .outputMode(OutputMode.Complete()).start()
      val batch1 = (1 to 30).map(i => StreamEvent(i.toLong, ts(i), "click", 1.0)) :+
        StreamEvent(99L, ts(1), "buy", 1.0)
      val batch2 = (1 to 5).map(i => StreamEvent(i.toLong, ts(40 + i), "buy", 1.0))
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
        val streamed = spark.table("cms")
          .as[(Int, Long, Long)].collect().toSet
        val batch = graft.operators.Sketch.countMin(
            (batch1 ++ batch2).toDF(), org.apache.spark.sql.functions.col("event_type"),
            depth = 4, width = 64)
          .as[(Int, Long, Long)].collect().toSet
        assert(streamed === batch)
        // and the running sketch answers point queries exactly like the batch one
        val est = graft.operators.Sketch.cmEstimate(
            spark.table("cms"), Seq("click", "buy", "nope").toDF("k"), "k", 4, 64)
          .as[(String, Long)].collect().toMap
        assert(est("click") >= 30L && est("buy") >= 6L)
      } finally q.stop()
    }
  }

  describe("streamingFunnel ≡ batch funnelStages (finite replay equivalence)") {
    val stages = Seq("view", "click", "purchase")
    val userEvents: Map[Long, Seq[(Int, String)]] = Map(
      1L -> Seq((0, "view"), (5, "click"), (9, "purchase")),             // full funnel
      2L -> Seq((0, "click"), (4, "view"), (8, "click")),                // early click ignored -> 2
      3L -> Seq((1, "purchase"), (2, "error")),                          // never starts -> 0
      4L -> Seq((3, "view")),                                            // stage 1 only
      5L -> Seq((0, "view"), (2, "view"), (6, "purchase"), (7, "click"),
        (9, "purchase")))                                                // view@0 click@7 purchase@9 -> 3
    val allEvents: Seq[StreamEvent] = userEvents.toSeq.flatMap { case (u, evs) =>
      evs.map { case (m, t) => StreamEvent(u, ts(m), t, 1.0) }
    }

    def runStream(arrival: Seq[StreamEvent], name: String): Seq[StageReached] = {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val q = StreamOps.streamingFunnel(input.toDS(), stages, watermarkDelay = "2 hours")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        arrival.grouped(4).foreach { batch => input.addData(batch); q.processAllAvailable() }
        // two flush batches: the watermark a batch USES comes from the previous one
        input.addData(StreamEvent(999L, ts(600), "x", 1.0)); q.processAllAvailable()
        input.addData(StreamEvent(999L, ts(601), "x", 1.0)); q.processAllAvailable()
        spark.table(name).as[StageReached].collect().toSeq.filter(_.user_id != 999L)
      } finally q.stop()
    }

    it("reaches exactly the batch operator's stages under in-order, reversed, and shuffled arrival") {
      val batchStages: Map[Long, Long] = Sessions.funnelStages(
          allEvents.map(e => (e.user_id, (e.ts.getTime, e.event_type))).toDS().groupSort(4),
          Seq[((Long, String)) => Boolean](
            _._2 == "view", _._2 == "click", _._2 == "purchase"))
        .collect().toMap
      val inOrder = allEvents.sortBy(_.ts.getTime)
      val permutations = Seq(
        "fun_inorder" -> inOrder,
        "fun_reversed" -> inOrder.reverse,
        "fun_shuffled" -> new scala.util.Random(11).shuffle(allEvents))
      val results = permutations.map { case (name, arrival) =>
        val reached = runStream(arrival, name)
        // final depth per user matches the batch fold (streaming is silent at 0)
        val depth = reached.groupBy(_.user_id).view.mapValues(_.map(_.stage).max.toLong).toMap
        assert(depth === batchStages.filter(_._2 > 0L), s"funnel depth diverged for $name")
        // each stage 1..depth emitted exactly once, monotone in event time
        reached.groupBy(_.user_id).foreach { case (u, rs) =>
          assert(rs.map(_.stage).sorted === (1 to rs.size).toSeq, s"stage emissions broken for user $u in $name")
          assert(rs.sortBy(_.stage).map(_.at_ms) === rs.map(_.at_ms).sorted, s"non-monotone stage times for $u in $name")
        }
        reached.map(r => (r.user_id, r.stage, r.at_ms)).toSet
      }
      assert(results.distinct.size === 1, "arrival order changed the emitted stage set")
    }
  }

  describe("streamingTransitions ≡ batch adjacentPairs (finite replay equivalence)") {
    val userEvents: Map[Long, Seq[(Int, String)]] = Map(
      1L -> Seq((0, "view"), (4, "click"), (8, "purchase"), (12, "view")),
      2L -> Seq((1, "click")),                       // singleton: no pairs
      3L -> Seq((2, "view"), (6, "view"), (10, "error")))
    val allEvents: Seq[StreamEvent] = userEvents.toSeq.flatMap { case (u, evs) =>
      evs.map { case (m, t) => StreamEvent(u, ts(m), t, 1.0) }
    }

    def runStream(arrival: Seq[StreamEvent], name: String): Set[(Long, String, String, Long)] = {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val q = StreamOps.streamingTransitions(input.toDS(), watermarkDelay = "2 hours")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        arrival.grouped(3).foreach { batch => input.addData(batch); q.processAllAvailable() }
        input.addData(StreamEvent(999L, ts(600), "x", 1.0)); q.processAllAvailable()
        input.addData(StreamEvent(999L, ts(601), "x", 1.0)); q.processAllAvailable()
        spark.table(name).as[TransitionSeen].collect().toSeq.filter(_.user_id != 999L)
          .map(r => (r.user_id, r.from_type, r.to_type, r.at_ms)).toSet
      } finally q.stop()
    }

    it("emits exactly the batch operator's pairs under in-order, reversed, and shuffled arrival") {
      val batchPairs = Sessions.adjacentPairs(
          allEvents.map(e => (e.user_id, (e.ts.getTime, e.event_type))).toDS().groupSort(4))(
          (p: (Long, String), n: (Long, String)) => (p._2, n._2, n._1))
        .collect().map { case (u, (f, t, at)) => (u, f, t, at) }.toSet
      val inOrder = allEvents.sortBy(_.ts.getTime)
      val results = Seq(
        "tr_inorder" -> inOrder,
        "tr_reversed" -> inOrder.reverse,
        "tr_shuffled" -> new scala.util.Random(5).shuffle(allEvents)).map { case (name, arrival) =>
        val got = runStream(arrival, name)
        assert(got === batchPairs, s"transition pairs diverged for $name")
        got
      }
      assert(results.distinct.size === 1)
    }
  }

  describe("intervalJoin ≡ batch interval join (finite replay equivalence)") {
    // attribution shape: purchases pair with the same user's clicks in the
    // trailing 10 minutes
    val clicks = Seq(
      StreamEvent(1L, ts(0), "click", 1.0), StreamEvent(1L, ts(7), "click", 1.0),
      StreamEvent(1L, ts(30), "click", 1.0),
      StreamEvent(2L, ts(3), "click", 1.0), // 17 min before the purchase: outside
      StreamEvent(3L, ts(5), "click", 1.0)) // user with no purchase
    val purchases = Seq(
      StreamEvent(1L, ts(9), "purchase", 5.0),
      StreamEvent(1L, ts(35), "purchase", 7.0),
      StreamEvent(2L, ts(20), "purchase", 9.0),
      StreamEvent(4L, ts(1), "purchase", 2.0)) // user with no clicks
    val windowMs = 10 * 60000L

    def runStream(leftArrival: Seq[StreamEvent], rightArrival: Seq[StreamEvent],
                  name: String): Set[(Long, Long, Long)] = {
      implicit val sc = spark.sqlContext
      val l = MemoryStream[StreamEvent]
      val r = MemoryStream[StreamEvent]
      val q = StreamOps.intervalJoin(l.toDS(), r.toDS(), windowMs, "2 hours")
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        // drip both sides in small batches so matches must span micro-batches
        val lb = leftArrival.grouped(2).toSeq
        val rb = rightArrival.grouped(2).toSeq
        (0 until math.max(lb.size, rb.size)).foreach { i =>
          if (i < lb.size) l.addData(lb(i))
          if (i < rb.size) r.addData(rb(i))
          q.processAllAvailable()
        }
        spark.table(name)
          .selectExpr("user_id", "CAST(left_ts AS LONG) AS lms", "CAST(right_ts AS LONG) AS rms")
          .as[(Long, Long, Long)].collect().toSet
      } finally q.stop()
    }

    it("emits exactly the batch join's pairs under in-order and reversed arrival") {
      // batch truth: the same join condition on static frames
      val expected = (for {
        p <- purchases
        c <- clicks
        if c.user_id == p.user_id
        if c.ts.getTime >= p.ts.getTime - windowMs && c.ts.getTime <= p.ts.getTime
      } yield (p.user_id, c.ts.getTime / 1000, p.ts.getTime / 1000)).toSet
      assert(expected.size === 3) // (1: 0->9), (1: 7->9), (1: 30->35)

      for ((name, la, ra) <- Seq(
          ("ijeq_inorder", clicks, purchases),
          ("ijeq_reversed", clicks.reverse, purchases.reverse))) {
        val got = runStream(la, ra, name)
        assert(got === expected, s"arrival order $name diverged from the batch join")
      }
    }
  }

  describe("enrichWithDim (stream-static broadcast lookup)") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val events = Seq(
      StreamEvent(1L, ts(0), "click", 1.0),
      StreamEvent(2L, ts(1), "click", 1.0),
      StreamEvent(7L, ts(2), "click", 1.0)) // no dim row

    def run(keepUnmatched: Boolean, name: String): Seq[(Long, String)] = {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val out = StreamOps.enrichWithDim(input.toDS().toDF(), dim, "user_id", keepUnmatched)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(events: _*)
        q.processAllAvailable()
        spark.table(name).select($"user_id", $"segment")
          .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
      } finally q.stop()
    }

    it("left mode keeps unmatched events with null dims; matches the batch join") {
      val got = run(keepUnmatched = true, "enrich_left").sortBy(_._1)
      assert(got === Seq((1L, "gold"), (2L, "basic"), (7L, null)))
      val batch = events.toDF().join(dim, Seq("user_id"), "left_outer")
        .select($"user_id", $"segment")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
        .toSeq.sortBy(_._1)
      assert(got === batch)
    }

    it("inner mode drops unmatched events") {
      assert(run(keepUnmatched = false, "enrich_inner").sortBy(_._1) ===
        Seq((1L, "gold"), (2L, "basic")))
    }
  }

  describe("streamingComponents ≡ from-scratch components (store-maintained clustering)") {
    it("each micro-batch folds into the manifest store; final store equals batch CC") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("cc_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
      val src = MemoryStream[(Long, Long)]
      val q = StreamOps.streamingComponents(src.toDF().toDF("a", "b"),
        store, nBuckets = 4, checkpointDir = ckpt)
      val batches = Seq(
        Seq((1L, 2L), (3L, 4L)),          // two components {1,2} {3,4}
        Seq((2L, 3L), (10L, 11L)),        // bridge them + a new component
        Seq((4L, 10L)))                   // merge everything but nothing else
      try {
        var streamed = Seq.empty[(Long, Long)]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          streamed ++= b
          val got = graft.sources.Sink.readStore(spark, store)
            .select($"id", $"component")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val scratch = graft.operators.Dedup
            .connectedComponents(streamed.toDF("a", "b"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == scratch, s"after streaming $streamed")
        }
      } finally q.stop()
    }
  }

  describe("streamingPostings ≡ from-scratch postings (store-maintained retrieval index)") {
    it("re-ingests upsert doc-wholesale; final store equals buildPostings of the live corpus") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("po_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("po_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingPostings(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      // batch 2 RE-INGESTS doc 1 with fewer terms and doc 2 with EMPTY text:
      // stale terms ("merge", "spark") must vanish without any delete list
      val batches = Seq(
        Seq((1L, "spark merge spark"), (2L, "vector index")),
        Seq((1L, "spark only"), (2L, ""), (3L, "fresh doc spark")),
        Seq((4L, "tail batch")))
      try {
        val live = scala.collection.mutable.Map.empty[Long, String]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, t) => live(id) = t }
          val got = StreamOps.postingsFromStore(spark, store, "doc_id")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
          val scratch = graft.operators.Retrieval
            .buildPostings(live.toSeq.toDF("doc_id", "text"), "doc_id", "text")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
          assert(got == scratch, s"after streaming ${live.toMap}")
        }
        // the store row set itself is deterministic: every doc ever ingested
        // has exactly one row (doc 2's is empty-postings, not absent)
        val ids = graft.sources.Sink.readStore(spark, store)
          .select($"doc_id").collect().map(_.getLong(0)).sorted
        assert(ids.toSeq == Seq(1L, 2L, 3L, 4L))
      } finally q.stop()
    }
  }

  describe("streamingChunks ≡ from-scratch contentChunks (store-maintained chunk index)") {
    it("re-ingests supersede doc-wholesale; an edit's store diff is chunk-local") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("ch_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ch_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingChunks(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", modulus = 4, storePath = store, nBuckets = 4,
        checkpointDir = ckpt)
      val longText = (1 to 40).map(i => s"tok$i").mkString(" ")
      // batch 2 re-ingests doc 1 with one mid-document token edited and
      // doc 2 with empty text (zero chunks, but the row must remain)
      val edited = ((1 to 20).map(i => s"tok$i") ++ Seq("EDIT") ++
        (21 to 40).map(i => s"tok$i")).mkString(" ")
      val batches = Seq(
        Seq((1L, longText), (2L, "alpha beta gamma")),
        Seq((1L, edited), (2L, ""), (3L, "fresh doc words")))
      try {
        val live = scala.collection.mutable.Map.empty[Long, String]
        var before = Set.empty[(Long, Long, Long, String)]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, t) => live(id) = t }
          val got = StreamOps.chunksFromStore(spark, store, "doc_id")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
            .toSet
          val scratch = graft.operators.Chunking.contentChunks(
              live.toSeq.toDF("doc_id", "text"), "doc_id", "text", modulus = 4)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
            .toSet
          assert(got == scratch, s"after streaming ${live.toMap}")
          if (before.isEmpty) before = got
          else {
            // content-defined boundaries keep the edit local: most of doc
            // 1's chunk hashes survive the re-ingest
            val h0 = before.filter(_._1 == 1L).map(_._4)
            val h1 = got.filter(_._1 == 1L).map(_._4)
            assert((h0 & h1).size >= h0.size - 2,
              s"edit was not chunk-local: ${h0.size} -> ${(h0 & h1).size} shared")
          }
        }
        val ids = graft.sources.Sink.readStore(spark, store)
          .select($"doc_id").collect().map(_.getLong(0)).sorted
        assert(ids.toSeq == Seq(1L, 2L, 3L))
      } finally q.stop()
    }
  }

  describe("streamingTokenIds ≡ from-scratch tokenizeToIds (store-maintained token ids)") {
    it("re-ingests supersede doc-wholesale; a takedown purges the doc from re-packed shards") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("tok_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("tok_ckpt").toString
      val merges = graft.operators.Bpe.fixtureMerges
      // vocabulary induced over the UNION of every text the stream will
      // carry — the standing-artifact posture (a frozen tokenizer)
      val allTexts = Seq("the thin cat", "a cat sat", "the end stands",
        "fresh thing here", "")
      val vocab = graft.operators.TokenShards.vocabFromFrame(
        graft.operators.TokenShards.buildVocab(
          allTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"), "text", merges))
      val ranks = merges.zipWithIndex.toMap
      val seg = (w: String) => graft.operators.Bpe.applyMerges(w, ranks)
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingTokenIds(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", vocab, seg, storePath = store, nBuckets = 4,
        checkpointDir = ckpt)
      def flat(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Long], Long)] =
        df.select($"doc_id", $"ids", $"n_tokens")
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
      // batch 2: doc 1 re-ingests EDITED, doc 2 blanks (must vanish from
      // the read face), doc 3 is fresh
      val batches = Seq(
        Seq((1L, "the thin cat"), (2L, "a cat sat")),
        Seq((1L, "the end stands"), (2L, ""), (3L, "fresh thing here")))
      try {
        val live = scala.collection.mutable.Map.empty[Long, String]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, t) => live(id) = t }
          val scratch = graft.operators.TokenShards.tokenizeToIdsWith(
            live.toSeq.toDF("doc_id", "text"), "doc_id", "text", vocab)(seg)
          assert(flat(StreamOps.tokenIdsFromStore(spark, store, "doc_id")) ===
            flat(scratch), s"after streaming ${live.toMap}")
        }
        // TAKEDOWN: tombstone doc 1; the terminal shard build derives from
        // live rows only, so re-packing excludes it with zero bookkeeping
        StreamOps.deleteIdsFromStore(store, Seq(1L).toDF("doc_id"), "doc_id",
          version = Long.MaxValue, nBuckets = 4)
        val packed = graft.operators.TokenShards.packSequences(
          StreamOps.tokenIdsFromStore(spark, store, "doc_id"),
          "doc_id", nShards = 2, capacity = 16L)
        val packedDocs = packed.select(org.apache.spark.sql.functions.explode($"doc_ids").as("d"))
          .collect().map(_.getLong(0)).toSet
        assert(packedDocs === Set(3L)) // doc 1 taken down, doc 2 blanked
        // ...and the DATA CARD follows the takedown: the mixture manifest
        // recomputed from the live store carries only the surviving doc
        val meta = Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("doc_id", "lang")
        val mix = graft.operators.TokenShards.mixtureManifest(
            packed, meta, "doc_id", Seq("lang"))
          .collect().map(r => (r.getString(1), r.getLong(2))).toMap
        assert(mix === Map("fr" -> 1L))
      } finally q.stop()
    }

    it("total mode: a micro-batch carrying never-seen codepoints maintains the " +
       "store through byte fallback instead of dying") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("tokt_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("tokt_ckpt").toString
      val merges = graft.operators.Bpe.fixtureMerges
      // the FROZEN standing vocab: induced over batch 1's text only — the
      // release-time corpus; batch 2's novel codepoints are genuinely OOV
      val vocab = graft.operators.TokenShards.vocabFromFrameTotal(
        graft.operators.TokenShards.buildVocabTotal(
          Seq((0L, "the thin cat sat")).toDF("doc_id", "text"), "text", merges))
      val ranks = merges.zipWithIndex.toMap
      val seg = (w: String) => graft.operators.Bpe.applyMerges(w, ranks)
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingTokenIds(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", vocab, seg, storePath = store, nBuckets = 4,
        checkpointDir = ckpt, total = true)
      try {
        src.addData((1L, "the thin cat"))
        q.processAllAvailable()
        // batch 2: multi-byte AND astral codepoints the vocab never saw —
        // under the strict scheme this batch would kill the query
        val novel = "caf\u00E9 \u00F1\u221A\uD835\uDEC0\u03B1 the"
        src.addData((2L, novel))
        q.processAllAvailable()
        val got = StreamOps.tokenIdsFromStore(spark, store, "doc_id")
          .select($"doc_id", $"ids")
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
        assert(got.keySet == Set(1L, 2L))
        // the store row decodes back to the exact normalized text
        val rev = vocab.map(_.swap)
        assert(graft.operators.TokenShards.detokenizeTotal(got(2L), rev) == novel)
        // and it really took the fallback path (reserved byte ids present)
        assert(got(2L).exists(id => id >= graft.operators.TokenShards.firstByteId &&
          id < graft.operators.TokenShards.totalFirstSymbolId))
        // store ≡ scratch under the same total encoder (the face law)
        val scratch = graft.operators.TokenShards.tokenizeToIdsTotalWith(
          Seq((1L, "the thin cat"), (2L, novel)).toDF("doc_id", "text"),
          "doc_id", "text", vocab)(seg)
          .select($"doc_id", $"ids")
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
        assert(got == scratch)
      } finally q.stop()
    }
  }

  describe("streamingCrawl (store-maintained captured corpus from .warc.gz files)") {
    it("re-crawls supersede by url; same-batch duplicate captures pick the latest date") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("crawl_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("crawl_ckpt").toString
      val src = MemoryStream[(String, Array[Byte])]
      val q = StreamOps.streamingCrawl(src.toDF().toDF("path", "content"),
        storePath = store, nBuckets = 4, checkpointDir = ckpt)
      import graft.sources.Warc.{gzipMember, responseRecord, warcinfoRecord}
      def file(recs: Array[Byte]*): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        out.write(gzipMember(warcinfoRecord("f")))
        recs.foreach(r => out.write(gzipMember(r)))
        out.toByteArray
      }
      def corpus(): Set[(String, String, Long, String)] =
        StreamOps.crawlFromStore(spark, store).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3).trim))
          .toSet
      try {
        src.addData(
          ("f1", file(
            responseRecord("https://a.example/1", "2026-01-01T00:00:00Z", 200, "<p>alpha one</p>"),
            responseRecord("https://a.example/2", "2026-01-01T00:00:00Z", 404, "<p>beta</p>"))),
          // one url captured TWICE in one batch: the later WARC-Date wins
          ("f2", file(
            responseRecord("https://a.example/3", "2026-01-01T00:00:00Z", 200, "<p>old capture</p>"),
            responseRecord("https://a.example/3", "2026-01-02T00:00:00Z", 200, "<p>new capture</p>"))))
        q.processAllAvailable()
        assert(corpus() == Set(
          ("https://a.example/1", "2026-01-01T00:00:00Z", 200L, "alpha one"),
          ("https://a.example/2", "2026-01-01T00:00:00Z", 404L, "beta"),
          ("https://a.example/3", "2026-01-02T00:00:00Z", 200L, "new capture")))
        // a later batch's re-crawl supersedes doc-wholesale (even with an
        // EARLIER WARC-Date: batch version outranks in-store history) —
        // and its outlinks replace the page's edge set the same way
        src.addData(("f3", file(
          responseRecord("https://a.example/1", "2026-01-01T12:00:00Z", 200,
            "<p>alpha two</p><a href=\"https://t.example/x\">t</a>"))))
        q.processAllAvailable()
        assert(corpus() == Set(
          ("https://a.example/1", "2026-01-01T12:00:00Z", 200L, "alpha two t"),
          ("https://a.example/2", "2026-01-01T00:00:00Z", 404L, "beta"),
          ("https://a.example/3", "2026-01-02T00:00:00Z", 200L, "new capture")))
        // the standing web graph derives from the store: exactly the
        // re-crawled page's one edge, the link-free pages contribute none
        val edges = StreamOps.linkEdgesFromStore(spark, store).collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
        assert(edges == Set(("https://a.example/1", "https://t.example/x")))
      } finally q.stop()
    }
  }

  describe("streamingArchives (store-maintained member set from zip/tar drops)") {
    it("mixed formats ingest by magic; a re-shipped member supersedes") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("arch_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("arch_ckpt").toString
      val src = MemoryStream[(String, Array[Byte])]
      val q = StreamOps.streamingArchives(src.toDF().toDF("path", "content"),
        storePath = store, nBuckets = 4, checkpointDir = ckpt)
      // build a zip and a tar.gz THROUGH the real writers: write to a tmp
      // dir with one bucket, then read the produced file's bytes back
      def archiveOf(write: (org.apache.spark.sql.DataFrame, String, Int) => Unit,
                    suffix: String, rows: Seq[(Long, String, Array[Byte])]): Array[Byte] = {
        val d = java.nio.file.Files.createTempDirectory("arch_fix").toString
        write(rows.toDF("id", "member", "bytes"), d, 1)
        val f = new java.io.File(d).listFiles().filter(_.getName.endsWith(suffix)).head
        java.nio.file.Files.readAllBytes(f.toPath)
      }
      def members(): Map[String, String] =
        StreamOps.membersFromStore(spark, store).collect()
          .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8"))).toMap
      try {
        val zip1 = archiveOf(graft.sources.Formats.writeZipFixture, ".zip", Seq(
          (0L, "a.txt", "alpha v1".getBytes("UTF-8")),
          (0L, "b.txt", "beta".getBytes("UTF-8"))))
        src.addData(("drop1.zip", zip1)); q.processAllAvailable()
        assert(members() == Map("a.txt" -> "alpha v1", "b.txt" -> "beta"))
        // batch 2: a tar.gz re-ships a.txt and adds c.txt — format sniffed
        // by magic, the re-shipped name supersedes doc-wholesale
        val tar2 = archiveOf(graft.sources.Formats.writeTarFixture, ".tar.gz", Seq(
          (0L, "a.txt", "alpha v2".getBytes("UTF-8")),
          (0L, "c.txt", "gamma".getBytes("UTF-8"))))
        src.addData(("drop2.tar.gz", tar2)); q.processAllAvailable()
        assert(members() == Map(
          "a.txt" -> "alpha v2", "b.txt" -> "beta", "c.txt" -> "gamma"))
      } finally q.stop()
    }

    it("a pre-POSIX/v7 tar (no ustar magic) ingests like the batch face; garbage stays empty") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("arch_store_v7").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("arch_ckpt_v7").toString
      val src = MemoryStream[(String, Array[Byte])]
      val q = StreamOps.streamingArchives(src.toDF().toDF("path", "content"),
        storePath = store, nBuckets = 2, checkpointDir = ckpt)
      // hand-built v7 tar: valid checksummed headers, NUL typeflag, and NO
      // ustar magic at offset 257 — the shape the batch face already accepts
      def v7Tar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        members.foreach { case (name, data) =>
          val h = new Array[Byte](512)
          val nb = name.getBytes("UTF-8")
          System.arraycopy(nb, 0, h, 0, nb.length)
          def oct(off: Int, len: Int, v: Long): Unit = {
            val s = java.lang.Long.toOctalString(v)
            val p = ("0" * (len - 1 - s.length)) + s
            System.arraycopy(p.getBytes("US-ASCII"), 0, h, off, len - 1)
          }
          oct(100, 8, 420); oct(108, 8, 0); oct(116, 8, 0)
          oct(124, 12, data.length.toLong); oct(136, 12, 0)
          java.util.Arrays.fill(h, 148, 156, ' '.toByte)
          var sum = 0L
          h.foreach(b => sum += b & 0xff)
          val cs = ("0" * 6 + java.lang.Long.toOctalString(sum)).takeRight(6) + "  "
          System.arraycopy(cs.getBytes("US-ASCII"), 0, h, 148, 8)
          out.write(h); out.write(data)
          out.write(new Array[Byte]((512 - data.length % 512) % 512))
        }
        out.write(new Array[Byte](1024))
        out.toByteArray
      }
      try {
        val tar = v7Tar(Seq(
          ("old/a.txt", "ancient alpha".getBytes("UTF-8")),
          ("old/b.txt", "ancient beta".getBytes("UTF-8"))))
        assert(tar.length > 262 && tar(257) == 0, "fixture must lack the ustar magic")
        src.addData(("drop.tar", tar)); q.processAllAvailable()
        def members(): Map[String, String] =
          StreamOps.membersFromStore(spark, store).collect()
            .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8"))).toMap
        assert(members() == Map("old/a.txt" -> "ancient alpha", "old/b.txt" -> "ancient beta"))
        // an unidentifiable payload attributes nothing (tar checksum rejects)
        src.addData(("noise.bin", Array.fill[Byte](600)(0x55))); q.processAllAvailable()
        assert(members().size == 2)
      } finally q.stop()
    }
  }

  describe("streamingLines ≡ from-scratch lineBoilerplate (store-maintained boilerplate vocabulary)") {
    it("re-ingests move df doc-wholesale; the store-derived vocabulary equals scratch") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("ln_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ln_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingLines(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      // FOOTER reaches df=3 in batch 2; batch 3 re-ingests docs 1 and 2
      // WITHOUT it, dropping df back to 1 — the vocabulary must shrink
      // with no decrement bookkeeping (df is derived, never stored)
      val batches = Seq(
        Seq((1L, "FOOTER\nalpha"), (2L, "FOOTER\nbeta")),
        Seq((3L, "FOOTER\ngamma\nFOOTER")), // within-doc repeat: still one df
        Seq((1L, "alpha only"), (2L, "beta only")))
      try {
        val live = scala.collection.mutable.Map.empty[Long, String]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, t) => live(id) = t }
          val got = StreamOps.boilerplateFromStore(spark, store, "doc_id", minDf = 2)
            .collect().map(_.getString(0)).toSet
          val scratch = graft.operators.Dedup
            .lineBoilerplate(live.toSeq.toDF("doc_id", "text"), "doc_id", "text", minDf = 2)
            .collect().map(_.getString(0)).toSet
          assert(got == scratch, s"after streaming ${live.toMap}")
        }
        // df(FOOTER) fell to 1 after the re-ingest: vocabulary is empty
        assert(StreamOps.boilerplateFromStore(spark, store, "doc_id", 2).count() == 0)
      } finally q.stop()
    }

    it("resolves same-batch duplicate versions of a doc to ONE deterministic winner") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("ln3_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ln3_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingLines(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      try {
        // doc 1 arrives TWICE in one batch: without the per-batch winner
        // reduction both versions' lines would UNION into one store row
        src.addData(Seq((1L, "alpha\nshared"), (1L, "beta\nshared"), (2L, "other")): _*)
        q.processAllAvailable()
        val got = StreamOps.linesFromStore(spark, store, "doc_id")
          .where($"doc_id" === 1L).collect().map(_.getString(1)).toSet
        // the winner is max(text) = "beta\nshared" — exactly its 2 lines,
        // never the 3-line union of both versions
        val want = graft.operators.Dedup
          .lineBoilerplate(Seq((1L, "beta\nshared"), (2L, "beta\nshared")).toDF("doc_id", "text"),
            "doc_id", "text", 2) // df-2 trick: both rows same text -> all its line hashes
          .collect().map(_.getString(0)).toSet
        assert(got == want)
      } finally q.stop()
    }

    it("closes the loop: lineDedupWith(batch, store vocabulary) ≡ batch lineDedup semantics") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("ln2_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ln2_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingLines(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      try {
        src.addData(Seq((1L, "NAV\none"), (2L, "NAV\ntwo"), (3L, "NAV\nthree")): _*)
        q.processAllAvailable()
        val vocab = StreamOps.boilerplateFromStore(spark, store, "doc_id", minDf = 3)
        val incoming = Seq((10L, "NAV\nfresh text"), (11L, "NAV")).toDF("doc_id", "text")
        val got = graft.operators.Dedup
          .lineDedupWith(incoming, "doc_id", "text", vocab)
          .as[(Long, String, Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
        // NAV dies against the STANDING vocabulary even though it has
        // df=2 inside the incoming batch alone
        assert(got(10L) == (("fresh text", 2L, 1L, 1L)))
        assert(got(11L) == (("", 1L, 0L, 1L)))
      } finally q.stop()
    }
  }

  describe("streamingLmCounts ≡ from-scratch lmCounts (store-maintained LM state)") {
    it("re-ingests supersede doc-wholesale; derived counts equal scratch and scoring agrees") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("lm_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("lm_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingLmCounts(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      // batch 2 re-ingests doc 1 with DIFFERENT bigrams (the old (a,b)
      // mass must shrink) and doc 2 with empty text (all its n-grams die)
      val batches = Seq(
        Seq((1L, "a b a b"), (2L, "a c")),
        Seq((1L, "b a"), (2L, ""), (3L, "a b c")),
        Seq((4L, "c c c")))
      try {
        val live = scala.collection.mutable.Map.empty[Long, String]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, t) => live(id) = t }
          val got = StreamOps.lmCountsFromStore(spark, store)
          val scratch = graft.operators.Lm.lmCounts(
            live.toSeq.toDF("doc_id", "text"), "text")
          assert(got.unigrams.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
            scratch.unigrams.collect().map(r => (r.getString(0), r.getLong(1))).toSet,
            s"unigrams after ${live.toMap}")
          assert(got.bigrams.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
            scratch.bigrams.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet,
            s"bigrams after ${live.toMap}")
        }
        // loop closed: scoring off the store state == scoring off scratch
        val probe = Seq((100L, "a b zz"), (101L, "c a")).toDF("doc_id", "text")
        val viaStore = graft.operators.Lm.scoreDocs(probe, "doc_id", "text",
          StreamOps.lmCountsFromStore(spark, store))
          .as[(Long, Long, Long, Long)].collect().toSet
        val viaScratch = graft.operators.Lm.scoreDocs(probe, "doc_id", "text",
          graft.operators.Lm.lmCounts(live.toSeq.toDF("doc_id", "text"), "text"))
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(viaStore == viaScratch)
      } finally q.stop()
    }

    it("same-batch duplicate versions reduce to one winner instead of summing") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("lm2_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("lm2_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingLmCounts(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      try {
        // an at-least-once EXACT duplicate must not double any count, and
        // two different versions must not sum their n-grams
        src.addData(Seq((1L, "a b"), (1L, "a b"), (2L, "a b"), (2L, "c d")): _*)
        q.processAllAvailable()
        val got = StreamOps.lmCountsFromStore(spark, store)
        val scratch = graft.operators.Lm.lmCounts(
          Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text"), "text") // max(text) winners
        assert(got.bigrams.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
          scratch.bigrams.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
        assert(got.unigrams.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
          scratch.unigrams.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
      } finally q.stop()
    }
  }

  describe("streamingImagePhash ≡ from-scratch perceptualHash (store-maintained image dedup)") {
    it("re-ingests supersede; corrupted re-uploads retire; cross-format twins pair from the store") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.multimodal.Media
      val store = java.nio.file.Files.createTempDirectory("ph_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ph_ckpt").toString
      val src = MemoryStream[(Long, Array[Byte])]
      val q = StreamOps.streamingImagePhash(src.toDF().toDF("img_id", "blob"),
        "img_id", "blob", store, nBuckets = 4, checkpointDir = ckpt)
      // batch 1: a BMP and its cross-format PNG twin (identical pixels) plus
      // a distinct image; batch 2 re-ingests id 3 with DIFFERENT pixels and
      // id 1 with a corrupted (undecodable) blob
      val batches: Seq[Seq[(Long, Array[Byte])]] = Seq(
        Seq((1L, Media.syntheticBmp(12, 9, 7L)), (2L, Media.syntheticPngImage(12, 9, 7L)),
          (3L, Media.syntheticBmp(10, 10, 3L))),
        Seq((3L, Media.syntheticBmp(10, 10, 200L)), (1L, Array[Byte](1, 2, 3))))
      try {
        val live = scala.collection.mutable.Map.empty[Long, Array[Byte]]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, blob) => live(id) = blob }
          val got = StreamOps.phashFromStore(spark, store, "img_id")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSet
          val scratch = Media.perceptualHash(
              live.toSeq.toDF("img_id", "blob"), "img_id", "blob")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSet
          assert(got == scratch, s"store drifted after ${live.keySet}")
        }
        // the undecodable re-upload RETIRED id 1 (row kept, phash null)
        val raw = graft.sources.Sink.readStore(spark, store)
        assert(raw.select($"img_id").collect().map(_.getLong(0)).sorted.toSeq
          == Seq(1L, 2L, 3L))
        assert(raw.where($"img_id" === 1L).collect().head.isNullAt(
          raw.columns.indexOf("phash")))
        // the surviving store still pairs nothing (the twin's partner is
        // retired); before the corruption, 1-2 paired exactly
        val sigs = StreamOps.phashFromStore(spark, store, "img_id")
        val pairs = graft.operators.Dedup.hammingPairs(sigs, "img_id", "phash", 2)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(!pairs.contains((1L, 2L)), "retired signature must not pair")
      } finally q.stop()
    }
  }

  describe("streamingFrontier ≡ from-scratch frontierRows (store-maintained crawl frontier)") {
    it("sitemaps and feeds fold in, re-declarations supersede, takedown removes") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("fr_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("fr_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingFrontier(src.toDF().toDF("src", "xml"),
        store, nBuckets = 4, checkpointDir = ckpt)
      val batches: Seq[Seq[(Long, String)]] = Seq(
        Seq(
          (1L, "<urlset><url><loc>https://a.example/1</loc>" +
            "<lastmod>2026-01-05</lastmod></url>" +
            "<url><loc>https://a.example/2</loc></url></urlset>"),
          (2L, "<feed><entry><title>t</title><link href=\"https://a.example/3\"/>" +
            "<updated>2026-01-06</updated></entry></feed>")),
        // re-declare url 1 with a newer lastmod; add an index pointer
        Seq((3L, "<urlset><url><loc>https://a.example/1</loc>" +
          "<lastmod>2026-02-07</lastmod></url></urlset>"),
          (4L, "<sitemapindex><sitemap><loc>https://a.example/more.xml</loc>" +
            "</sitemap></sitemapindex>")))
      try {
        val live = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          live ++= b
          val got = StreamOps.frontierFromStore(spark, store)
            .collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
          // scratch: later batches overwrite earlier urls (doc-wholesale),
          // which for this data equals re-running the kernel on the union
          val scratch = StreamOps.frontierRows(live.toSeq.toDF("src", "xml"))
            .collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
          assert(got == scratch, s"store drifted after batch ${live.size}")
        }
        assert(StreamOps.frontierFromStore(spark, store)
          .where($"url" === "https://a.example/1")
          .collect().map(_.getString(2)).toSeq == Seq("2026-02-07"))
        // same-batch signal priority: a signal-less sitemap declaration
        // must NOT beat a dated feed declaration of the same url (the
        // winner struct orders last_signal before kind)
        val mixed = StreamOps.frontierRows(Seq(
          (1L, "<urlset><url><loc>https://a.example/both</loc></url></urlset>"),
          (2L, "<feed><entry><title>t</title><link href=\"https://a.example/both\"/>" +
            "<updated>2026-08-10</updated></entry></feed>")).toDF("src", "xml"))
          .collect().map(r => (r.getString(0), Option(r.getString(2))))
        assert(mixed.toSeq == Seq(("https://a.example/both", Some("2026-08-10"))))
        StreamOps.deleteIdsFromStore(store, Seq("https://a.example/2").toDF("url"), "url",
          version = 100L, nBuckets = 4)
        assert(!StreamOps.frontierFromStore(spark, store)
          .collect().map(_.getString(0)).contains("https://a.example/2"))
      } finally q.stop()
    }
  }

  describe("streamingAudioFingerprints ≡ from-scratch audioFingerprint (store-maintained audio dedup)") {
    it("re-ingests supersede; truncated re-uploads retire; loudness twins pair from the store") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.multimodal.Media
      val store = java.nio.file.Files.createTempDirectory("au_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("au_ckpt").toString
      val src = MemoryStream[(Long, Array[Byte])]
      val q = StreamOps.streamingAudioFingerprints(src.toDF().toDF("clip_id", "blob"),
        "clip_id", "blob", store, nBuckets = 4, checkpointDir = ckpt)
      // batch 1: a clip and its quieter DC-shifted twin plus a distinct clip;
      // batch 2 re-ingests id 3 with different tones and id 1 with a
      // sub-window (undecodable-for-fingerprinting) blob
      val bins = Array(5, 19, 44, 101)
      val batches: Seq[Seq[(Long, Array[Byte])]] = Seq(
        Seq((1L, Media.syntheticToneWav(8000, 256, bins, 8000.0, 0)),
          (2L, Media.syntheticToneWav(8000, 256, bins, 3000.0, 50)),
          (3L, Media.syntheticToneWav(8000, 256, Array(7, 21), 8000.0, 0))),
        Seq((3L, Media.syntheticToneWav(8000, 256, Array(8, 22), 8000.0, 0)),
          (1L, Media.syntheticWav(8000, 100, 0L))))
      try {
        val live = scala.collection.mutable.Map.empty[Long, Array[Byte]]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, blob) => live(id) = blob }
          val got = StreamOps.audioFingerprintsFromStore(spark, store, "clip_id")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          val scratch = Media.audioFingerprint(
              live.toSeq.toDF("clip_id", "blob"), "clip_id", "blob")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          assert(got == scratch, s"store drifted after ${live.keySet}")
        }
        // batch 1's loudness twins fingerprinted identically
        val fp1 = StreamOps.audioFingerprintsFromStore(spark, store, "clip_id")
        assert(fp1.groupBy($"fingerprint").count().where($"count" === 2).count() === 0L,
          "after retiring id 1, no pair should remain")
        // the sub-window re-upload RETIRED id 1 (row kept, fingerprint null)
        val raw = graft.sources.Sink.readStore(spark, store)
        assert(raw.select($"clip_id").collect().map(_.getLong(0)).sorted.toSeq
          == Seq(1L, 2L, 3L))
        assert(raw.where($"clip_id" === 1L).collect().head.isNullAt(
          raw.columns.indexOf("fingerprint")))
      } finally q.stop()
    }
  }

  describe("streamingOpqCodes ≡ frozen rotate+encode (store-maintained OPQ codes)") {
    it("batches rotate through the frozen basis; re-ingests supersede, nulls tombstone") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.operators.{Pca, Similarity}
      val dim = 16
      def vec(id: Long): Array[Double] =
        Array.tabulate(dim)(j => math.sin(id * 17 + j * 5) / (1.0 + j * 0.5))
      val corpus0 = (0L until 48L).map(id => (id, vec(id)))
      val train = corpus0.toDF("vec_id", "embedding")
      val basis = Pca.opqBasis(train, "embedding", m = 4)
      val index = Similarity.buildPqIndex(
        Pca.rotate(train, "vec_id", "embedding", basis).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = dim, m = 4, ks = 16, trainIters = 2)
      val store = java.nio.file.Files.createTempDirectory("opq_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("opq_ckpt").toString
      val src = MemoryStream[(Long, Array[Double])]
      val q = StreamOps.streamingOpqCodes(src.toDF().toDF("vec_id", "embedding"),
        basis, index, "vec_id", "embedding", store, nBuckets = 4, checkpointDir = ckpt)
      def codes(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Byte], Double)] =
        df.select($"neighbor_id", $"code", $"recon_n2")
          .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSet
      try {
        // batch 1: first half; batch 2: second half + RE-ingest id 3 with
        // a new vector + tombstone id 5
        src.addData(corpus0.take(24): _*); q.processAllAvailable()
        // re-ingest id 3 with a new vector, tombstone id 5, and RETIRE
        // id 9 via a wrong-width re-upload (the basis cannot rotate it —
        // serving its stale code would break store ≡ scratch)
        src.addData(corpus0.drop(24) ++ Seq((3L, vec(300L)),
          (5L, null.asInstanceOf[Array[Double]]),
          (9L, Array(1.0, 2.0))): _*)
        q.processAllAvailable()
        val live = (corpus0.toMap ++ Map(3L -> vec(300L))) - 5L - 9L
        val scratch = Similarity.pqEncode(index,
          Pca.rotate(live.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding", basis)
            .toDF("vec_id", "embedding"),
          "vec_id", "embedding")
        assert(codes(StreamOps.opqCodesFromStore(spark, store)) === codes(scratch))
        // takedown path shared with every store
        StreamOps.deleteIdsFromStore(store, Seq(7L).toDF("neighbor_id"), "neighbor_id",
          version = 100L, nBuckets = 4)
        assert(codes(StreamOps.opqCodesFromStore(spark, store)) ===
          codes(scratch).filterNot(_._1 == 7L))
      } finally q.stop()
    }
  }

  describe("streamingAnnCodes ≡ frozen-index re-encode (store-maintained ANN codes)") {
    it("upserts fold in, null-vector deletions tombstone; store equals scratch encode per batch") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.operators.Similarity
      val dim = 16
      def vec(id: Long, salt: Int): Array[Double] =
        Array.tabulate(dim)(j => math.sin(id * 31 + j * 7 + salt * 131).abs + 0.01)
      val corpus0 = (0L until 48L).map(id => (id, vec(id, 0)))
      val ivf = Similarity.buildIvfIndex(
        corpus0.toDF("vec_id", "embedding"), "vec_id", "embedding",
        nCentroids = 4, trainIters = 2)
      val index = Similarity.buildIvfPqIndex(ivf, dim = dim, m = 4, ks = 16, trainIters = 2)

      val store = java.nio.file.Files.createTempDirectory("ann_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ann_ckpt").toString
      val src = MemoryStream[(Long, Array[Double])]
      val q = StreamOps.streamingAnnCodes(src.toDF().toDF("vec_id", "embedding"),
        index, "vec_id", "embedding", store, nBuckets = 4, checkpointDir = ckpt)

      def storedCodes(): Set[(Long, Long, Seq[Byte], Double)] =
        StreamOps.annCodesFromStore(spark, store)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getAs[Array[Byte]](2).toSeq, r.getDouble(3))).toSet
      def scratchCodes(live: Map[Long, Array[Double]]): Set[(Long, Long, Seq[Byte], Double)] =
        Similarity.ivfPqEncode(index,
            live.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getAs[Array[Byte]](2).toSeq, r.getDouble(3))).toSet

      // batch 1: initial corpus; batch 2: re-embed 0..9 + new 48..53;
      // batch 3: DELETE 5 and 48 (null vectors) + one more re-embed
      val batches: Seq[Seq[(Long, Array[Double])]] = Seq(
        corpus0,
        (0L until 10L).map(id => (id, vec(id, 1))) ++ (48L until 54L).map(id => (id, vec(id, 0))),
        Seq((5L, null: Array[Double]), (48L, null: Array[Double]), (7L, vec(7L, 2))))
      try {
        val live = scala.collection.mutable.Map.empty[Long, Array[Double]]
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.foreach { case (id, v) => if (v == null) live.remove(id) else live(id) = v }
          assert(storedCodes() == scratchCodes(live.toMap))
        }
        // deletion survives COMPACTION (the bytes physically leave), and a
        // LATER re-embed resurrects the id with fresh codes
        graft.sources.Sink.compactStore(spark, store)
        graft.sources.Sink.vacuumStore(store)
        assert(storedCodes() == scratchCodes(live.toMap))
        src.addData(Seq((5L, vec(5L, 3))): _*)
        q.processAllAvailable()
        live(5L) = vec(5L, 3)
        assert(storedCodes() == scratchCodes(live.toMap))
      } finally q.stop()
    }
  }

  describe("streamingNearDups (standing minhash store probed + maintained per batch)") {
    it("emits cross-side verified pairs, excludes a re-ingested doc's stale self") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("nd_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("nd_ckpt").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingNearDups(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", root, nBuckets = 4, checkpointDir = ckpt)
      def pairs(): Set[(Long, Long)] =
        if (!graft.sources.Sink.storeExists(s"$root/pairs")) Set.empty
        else StreamOps.pairsFromStore(spark, root)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      try {
        // batch 1: two unrelated standing docs -> no pairs (no standing store yet)
        src.addData((1L, "alpha beta gamma delta epsilon"),
          (2L, "completely different tokens here now"))
        q.processAllAvailable()
        assert(pairs() === Set.empty)
        // batch 2: doc 3 is an EXACT copy of doc 1 — identical signatures
        // collide in every band, so candidacy is certain (a 0.5-jaccard pair
        // collides only with ~23% probability at this 4x4 geometry; the
        // planted-pair queries use exact copies for the same reason)
        src.addData((3L, "alpha beta gamma delta epsilon"))
        q.processAllAvailable()
        assert(pairs() === Set((3L, 1L)))
        // batch 3: RE-INGEST doc 1 with its own (unchanged) text. Its stale
        // standing rows are a jaccard-1.0 match — the stale-self exclusion is
        // the only thing keeping (1,1) out. Doc 1's prior pair (3,1) is
        // TOMBSTONED (it referenced the superseded version) and the still-
        // true relationship re-certifies through doc 1's own probe as (1,3)
        src.addData((1L, "alpha beta gamma delta epsilon"))
        q.processAllAvailable()
        assert(pairs() === Set((1L, 3L)))
        val docRow = graft.sources.Sink.readStore(spark, s"$root/docs")
          .where($"doc_id" === 1L).select($"text").head().getString(0)
        assert(docRow === "alpha beta gamma delta epsilon")
        val nDocs = StreamOps.bandsFromStore(spark, s"$root/bands", "doc_id")
          .select($"doc_id").distinct().count()
        assert(nDocs === 3L)
        // batch 4: doc 1 re-ingests with UNRELATED text — every pair touching
        // it must die, and its fresh probe certifies nothing. Without the
        // tombstone, the store would keep serving the jaccard-1.0 verdict for
        // a doc version that no longer exists (the stale-verdict hole)
        src.addData((1L, "totally novel words qq ww ee"))
        q.processAllAvailable()
        assert(pairs() === Set.empty)
      } finally q.stop()
    }

    it("a pair whose BOTH members re-ingest in one batch re-certifies via the intra-batch pass") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("nd_store2").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("nd_ckpt2").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingNearDups(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", root, nBuckets = 4, checkpointDir = ckpt)
      def pairs(): Set[(Long, Long)] =
        if (!graft.sources.Sink.storeExists(s"$root/pairs")) Set.empty
        else StreamOps.pairsFromStore(spark, root)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      try {
        // batch 1: docs 1 and 2 are exact copies — the intra-batch pass
        // certifies (1,2) even though no standing store exists yet
        src.addData((1L, "alpha beta gamma delta epsilon"),
          (2L, "alpha beta gamma delta epsilon"))
        q.processAllAvailable()
        assert(pairs() === Set((1L, 2L)))
        // batch 2: BOTH members re-ingest (unchanged text) in the SAME
        // micro-batch. Every prior pair touching either id tombstones; the
        // cross-side probe by design emits no batch-batch candidates, so
        // only the intra-batch pass can re-certify the still-true pair —
        // this was the silent-drop hole
        src.addData((1L, "alpha beta gamma delta epsilon"),
          (2L, "alpha beta gamma delta epsilon"))
        q.processAllAvailable()
        assert(pairs() === Set((1L, 2L)))
        // batch 3: both re-ingest with texts that no longer match — the
        // pair dies and nothing re-certifies
        src.addData((1L, "totally novel words qq ww ee"),
          (2L, "other unrelated tokens rr tt yy"))
        q.processAllAvailable()
        assert(pairs() === Set.empty)
      } finally q.stop()
    }

    it("a taken-down doc disappears from pairs, stores, and future probes") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val root = java.nio.file.Files.createTempDirectory("nd_store3").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("nd_ckpt3").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingNearDups(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", root, nBuckets = 4, checkpointDir = ckpt)
      def pairs(): Set[(Long, Long)] =
        StreamOps.pairsFromStore(spark, root)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      try {
        src.addData((1L, "alpha beta gamma delta epsilon"),
          (2L, "alpha beta gamma delta epsilon"))
        q.processAllAvailable()
        assert(pairs() === Set((1L, 2L)))
        // takedown doc 2 at a version above every batch so far
        StreamOps.deleteDocsFromNearDupStore(spark, root,
          Seq(2L).toDF("doc_id"), "doc_id", version = 1000L, nBuckets = 4)
        assert(pairs() === Set.empty)
        assert(graft.sources.Sink.readStore(spark, s"$root/docs")
          .where($"doc_id" === 2L).count() === 0L)
        assert(StreamOps.bandsFromStore(spark, s"$root/bands", "doc_id")
          .where($"doc_id" === 2L).count() === 0L)
        // a NEW doc with doc 2's exact text must not match the deleted doc —
        // its band rows are dead — but still matches the live doc 1
        src.addData((3L, "alpha beta gamma delta epsilon"))
        q.processAllAvailable()
        assert(pairs() === Set((3L, 1L)))
      } finally q.stop()
    }
  }

  describe("streamingSpanAttribution ≡ batch spanAttribution (chunked replay equivalence)") {
    // three train docs, chunked; doc 1 carries a verbatim 6-token run of
    // eval 1001, doc 2 is unrelated, doc 3 shares an isolated trigram only
    val evalFrame = Seq(
      (1001L, "alpha beta gamma delta epsilon zeta"),
      (1002L, "one two three four five six")).toDF("doc_id", "text")
    val docTexts = Map(
      1L -> "intro words alpha beta gamma delta epsilon zeta outro words",
      2L -> "completely unrelated content with no overlap at all here",
      3L -> "one two three but then it diverges entirely afterwards")
    val allChunks: Seq[DocChunk] = docTexts.toSeq.flatMap { case (id, text) =>
      // three chunks per doc, token-boundary splits, one version at minute 5
      val toks = text.split(" ")
      val (a, rest) = toks.splitAt(toks.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(DocChunk(id, ts(5), 0, a.mkString(" ")),
        DocChunk(id, ts(5), 1, b.mkString(" ")),
        DocChunk(id, ts(5), 2, c.mkString(" ")))
    }
    val batchExpected: Set[(Long, Long, Long, Long, Long)] =
      graft.operators.Contamination.spanAttribution(
          docTexts.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text"),
          evalFrame, "doc_id", "text", w = 3, minRun = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

    def runStreaming(arrival: Seq[DocChunk], groupSize: Int): Set[(Long, Long, Long, Long, Long)] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("span_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("span_ckpt").toString
      val src = MemoryStream[DocChunk]
      // 2h watermark: every permutation of the minute-5 chunks is admissible
      val q = StreamOps.streamingSpanAttribution(src.toDS(), evalFrame,
        "doc_id", "text", w = 3, store, nBuckets = 4, checkpointDir = ckpt,
        minRun = 2, watermarkDelay = "2 hours")
      try {
        arrival.grouped(groupSize).foreach { g => src.addData(g); q.processAllAvailable() }
        // two flush batches (the watermark a batch uses comes from the prior one)
        src.addData(DocChunk(999L, ts(600), 0, "flush")); q.processAllAvailable()
        src.addData(DocChunk(999L, ts(601), 0, "flush")); q.processAllAvailable()
        StreamOps.spansFromStore(spark, store)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet
      } finally q.stop()
    }

    it("matches the batch kernel under in-order, reversed, and re-delivered chunk arrival") {
      assert(batchExpected.exists(_._4 >= 2L), "fixture must plant a real run")
      val inOrder = allChunks.sortBy(c => (c.doc_id, c.seq))
      assert(runStreaming(inOrder, groupSize = 4) === batchExpected)
      assert(runStreaming(inOrder.reverse, groupSize = 3) === batchExpected)
      // at-least-once transport: every chunk delivered twice across batches
      assert(runStreaming(
        new scala.util.Random(7).shuffle(allChunks ++ allChunks), groupSize = 5)
        === batchExpected)
    }

    it("the <= finalization is aligned with Spark's inclusive late-row drop") {
      // assembleChunkedDocs finalizes a version at ts <= watermark. That is
      // safe ONLY because Spark's late-row predicate is likewise inclusive:
      // a chunk at ts == wm is dropped before reaching the state function,
      // so a finalized version can never be partially RE-finalized by a
      // boundary straggler. This spec pins the alignment empirically — if
      // Spark ever switched to a strict drop (admitting ts == wm), the
      // straggler below would buffer and later emit a SECOND, partial row
      // for the version, failing the exactly-one-row assert and flagging
      // the convention for review.
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val src = MemoryStream[DocChunk]
      val q = StreamOps.assembleChunkedDocs(src.toDS(), "0 seconds")
        .writeStream.outputMode("append").format("memory")
        .queryName("asm_boundary").start()
      try {
        src.addData(DocChunk(1L, ts(5), 0, "alpha")); q.processAllAvailable()
        // this batch runs at wm == ts(5) exactly (0s delay): the seq-1
        // chunk arrives AT the watermark and dies at the operator input
        src.addData(DocChunk(1L, ts(5), 1, "beta")); q.processAllAvailable()
        src.addData(DocChunk(998L, ts(50), 0, "advance")); q.processAllAvailable()
        src.addData(DocChunk(998L, ts(51), 0, "advance")); q.processAllAvailable()
        val rows = spark.table("asm_boundary").where($"doc_id" === 1L)
          .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
        // exactly ONE finalize for the version — never a partial second row
        assert(rows === Seq((1L, "alpha")))
      } finally q.stop()
    }

    it("a re-crawled version re-audits and supersedes the prior verdicts") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("span_store2").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("span_ckpt2").toString
      val src = MemoryStream[DocChunk]
      val q = StreamOps.streamingSpanAttribution(src.toDS(), evalFrame,
        "doc_id", "text", w = 3, store, nBuckets = 4, checkpointDir = ckpt,
        minRun = 2, watermarkDelay = "0 seconds")
      def spans(): Set[(Long, Long)] =
        StreamOps.spansFromStore(spark, store)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      try {
        src.addData(DocChunk(1L, ts(5), 0, docTexts(1L))); q.processAllAvailable()
        src.addData(DocChunk(998L, ts(50), 0, "advance")); q.processAllAvailable()
        src.addData(DocChunk(998L, ts(51), 0, "advance")); q.processAllAvailable()
        assert(spans() === Set((1L, 1001L)))
        // version 2 of doc 1 (decontaminated text): old verdict must die
        src.addData(DocChunk(1L, ts(60), 0, "scrubbed text with nothing shared"))
        q.processAllAvailable()
        src.addData(DocChunk(998L, ts(100), 0, "advance")); q.processAllAvailable()
        src.addData(DocChunk(998L, ts(101), 0, "advance")); q.processAllAvailable()
        assert(spans() === Set.empty)
      } finally q.stop()
    }
  }

  describe("takedown: deleteIdsFromStore removes a doc from EVERY derived standing artifact") {
    // Per store family: ingest -> delete one id -> the derived read equals
    // the from-scratch computation over the corpus WITHOUT the doc. The
    // derived artifacts (df counts, vocabularies, LM models, signatures,
    // code frames, link graphs) must all forget the doc through the one
    // tombstone — no decrement bookkeeping anywhere.
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta gamma beta delta"),
      (3L, "gamma delta epsilon alpha"))
    def liveDf = Seq(docs(0), docs(2)).toDF("doc_id", "text") // corpus minus doc 2

    it("postings store: df and tf forget the doc; a higher-version re-ingest resurrects") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("td_post").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_post_ck").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingPostings(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      def got(): Set[(Long, String, Long)] =
        StreamOps.postingsFromStore(spark, store, "doc_id")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      def scratch(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
        graft.operators.Retrieval.buildPostings(df, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      try {
        src.addData(docs.take(2): _*); q.processAllAvailable()
        src.addData(docs(2)); q.processAllAvailable()
        StreamOps.deleteIdsFromStore(store, Seq(2L).toDF("doc_id"), "doc_id",
          version = 100L, nBuckets = 4)
        assert(got() === scratch(liveDf))
        // a HIGHER-version re-ingest resurrects the doc (the takedown was
        // versioned, not irrevocable)
        import org.apache.spark.sql.functions.{collect_list, lit, sort_array, struct}
        graft.sources.Sink.upsertBuckets(store,
          graft.operators.Retrieval.buildPostings(Seq(docs(1)).toDF("doc_id", "text"), "doc_id", "text")
            .groupBy($"doc_id")
            .agg(sort_array(collect_list(struct($"term", $"tf"))).as("postings"))
            .withColumn("version", lit(101L)),
          "doc_id", "version", nBuckets = 4)
        assert(got() === scratch(docs.toDF("doc_id", "text")))
      } finally q.stop()
    }

    it("chunk store: the doc's chunks leave the dup profile") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("td_chunk").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_chunk_ck").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingChunks(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", modulus = 4, store, nBuckets = 4, checkpointDir = ckpt)
      def flat(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
        df.select($"doc_id", $"chunk_idx", $"chunk_hash")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      try {
        src.addData(docs: _*); q.processAllAvailable()
        StreamOps.deleteIdsFromStore(store, Seq(2L).toDF("doc_id"), "doc_id",
          version = 100L, nBuckets = 4)
        assert(flat(StreamOps.chunksFromStore(spark, store, "doc_id")) ===
          flat(graft.operators.Chunking.contentChunks(liveDf, "doc_id", "text", 4)))
      } finally q.stop()
    }

    it("line store: the boilerplate vocabulary's df forgets the doc") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("td_line").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_line_ck").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingLines(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      try {
        // FOOTER df = 2 via docs 1 and 2; deleting doc 2 drops df to 1 and
        // the vocabulary entry must vanish
        src.addData((1L, "FOOTER\nalpha"), (2L, "FOOTER\nbeta"), (3L, "gamma"))
        q.processAllAvailable()
        assert(StreamOps.boilerplateFromStore(spark, store, "doc_id", minDf = 2).count() == 1)
        StreamOps.deleteIdsFromStore(store, Seq(2L).toDF("doc_id"), "doc_id",
          version = 100L, nBuckets = 4)
        assert(StreamOps.boilerplateFromStore(spark, store, "doc_id", minDf = 2).count() == 0)
      } finally q.stop()
    }

    it("LM count store: the derived model equals training without the doc") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("td_lm").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_lm_ck").toString
      val src = MemoryStream[(Long, String)]
      val q = StreamOps.streamingLmCounts(src.toDF().toDF("doc_id", "text"),
        "doc_id", "text", store, nBuckets = 4, checkpointDir = ckpt)
      def uni(c: graft.operators.Lm.LmCounts): Set[(String, Long)] =
        c.unigrams.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      def bg(c: graft.operators.Lm.LmCounts): Set[(String, String, Long)] =
        c.bigrams.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      try {
        src.addData(docs: _*); q.processAllAvailable()
        StreamOps.deleteIdsFromStore(store, Seq(2L).toDF("doc_id"), "doc_id",
          version = 100L, nBuckets = 4)
        val got = StreamOps.lmCountsFromStore(spark, store)
        val scratch = graft.operators.Lm.lmCounts(liveDf, "text")
        assert(uni(got) === uni(scratch))
        assert(bg(got) === bg(scratch))
      } finally q.stop()
    }

    it("phash store: the deleted image's signature stops pairing") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.multimodal.Media
      val store = java.nio.file.Files.createTempDirectory("td_ph").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_ph_ck").toString
      val src = MemoryStream[(Long, Array[Byte])]
      val q = StreamOps.streamingImagePhash(src.toDF().toDF("img_id", "blob"),
        "img_id", "blob", store, nBuckets = 4, checkpointDir = ckpt)
      try {
        // ids 1 and 2 are pixel-identical twins; 3 distinct
        src.addData((1L, Media.syntheticBmp(12, 9, 7L)),
          (2L, Media.syntheticPngImage(12, 9, 7L)), (3L, Media.syntheticBmp(10, 10, 3L)))
        q.processAllAvailable()
        def pairs(): Set[(Long, Long)] =
          graft.operators.Dedup.hammingPairs(
              StreamOps.phashFromStore(spark, store, "img_id"), "img_id", "phash", 2)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pairs().contains((1L, 2L)))
        StreamOps.deleteIdsFromStore(store, Seq(2L).toDF("img_id"), "img_id",
          version = 100L, nBuckets = 4)
        assert(pairs() === Set.empty)
        assert(StreamOps.phashFromStore(spark, store, "img_id")
          .select($"img_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
      } finally q.stop()
    }

    it("audio fingerprint store: the deleted clip's signature stops matching") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.multimodal.Media
      val store = java.nio.file.Files.createTempDirectory("td_au").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_au_ck").toString
      val src = MemoryStream[(Long, Array[Byte])]
      val q = StreamOps.streamingAudioFingerprints(src.toDF().toDF("clip_id", "blob"),
        "clip_id", "blob", store, nBuckets = 4, checkpointDir = ckpt)
      try {
        // 1 and 2 are the same tones at different loudness/offset; 3 differs
        val bins = Array(5, 19, 44)
        src.addData(
          (1L, Media.syntheticToneWav(8000, 256, bins, 8000.0, 0)),
          (2L, Media.syntheticToneWav(8000, 256, bins, 3000.0, 50)),
          (3L, Media.syntheticToneWav(8000, 256, Array(6, 20, 45), 8000.0, 0)))
        q.processAllAvailable()
        def dupGroups(): Set[Set[Long]] =
          StreamOps.audioFingerprintsFromStore(spark, store, "clip_id")
            .groupBy($"fingerprint")
            .agg(org.apache.spark.sql.functions.collect_set($"clip_id").as("ids"))
            .collect().map(_.getSeq[Long](1).toSet).toSet
        assert(dupGroups() === Set(Set(1L, 2L), Set(3L)))
        StreamOps.deleteIdsFromStore(store, Seq(2L).toDF("clip_id"), "clip_id",
          version = 100L, nBuckets = 4)
        assert(dupGroups() === Set(Set(1L), Set(3L)))
      } finally q.stop()
    }

    it("ANN code store: the code frame equals the frozen-index encode without the vector") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.operators.Similarity
      val dim = 16
      def vec(id: Long): Array[Double] =
        Array.tabulate(dim)(j => math.sin(id * 31 + j * 7).abs + 0.01)
      val corpus0 = (0L until 48L).map(id => (id, vec(id)))
      val ivf = Similarity.buildIvfIndex(
        corpus0.toDF("vec_id", "embedding"), "vec_id", "embedding",
        nCentroids = 4, trainIters = 2)
      val index = Similarity.buildIvfPqIndex(ivf, dim = dim, m = 4, ks = 16, trainIters = 2)
      val store = java.nio.file.Files.createTempDirectory("td_ann").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_ann_ck").toString
      val src = MemoryStream[(Long, Array[Double])]
      val q = StreamOps.streamingAnnCodes(src.toDF().toDF("vec_id", "embedding"),
        index, "vec_id", "embedding", store, nBuckets = 4, checkpointDir = ckpt)
      def codes(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Seq[Byte])] =
        df.select($"neighbor_id", $"cent_id", $"code")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).toSet
      try {
        src.addData(corpus0: _*); q.processAllAvailable()
        StreamOps.deleteIdsFromStore(store, Seq(7L).toDF("neighbor_id"), "neighbor_id",
          version = 100L, nBuckets = 4)
        val scratch = Similarity.ivfPqEncode(index,
          corpus0.filterNot(_._1 == 7L).toDF("vec_id", "embedding"), "vec_id", "embedding")
        assert(codes(StreamOps.annCodesFromStore(spark, store)) === codes(scratch))
      } finally q.stop()
    }

    it("crawl store: the url's capture AND its link-graph edges vanish") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("td_crawl").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_crawl_ck").toString
      val src = MemoryStream[(String, Array[Byte])]
      val q = StreamOps.streamingCrawl(src.toDF().toDF("path", "content"),
        storePath = store, nBuckets = 4, checkpointDir = ckpt)
      import graft.sources.Warc.{gzipMember, responseRecord, warcinfoRecord}
      def file(recs: Array[Byte]*): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        out.write(gzipMember(warcinfoRecord("f")))
        recs.foreach(r => out.write(gzipMember(r)))
        out.toByteArray
      }
      try {
        src.addData(("f1", file(
          responseRecord("https://a.example/1", "2026-01-01T00:00:00Z", 200,
            "<p>keep</p><a href=\"https://t.example/x\">t</a>"),
          responseRecord("https://a.example/2", "2026-01-01T00:00:00Z", 200,
            "<p>takedown</p><a href=\"https://gone.example/y\">g</a>"))))
        q.processAllAvailable()
        StreamOps.deleteIdsFromStore(store, Seq("https://a.example/2").toDF("url"), "url",
          version = 100L, nBuckets = 4)
        val urls = StreamOps.crawlFromStore(spark, store)
          .select($"url").collect().map(_.getString(0)).toSet
        assert(urls === Set("https://a.example/1"))
        val hrefs = StreamOps.linkEdgesFromStore(spark, store)
          .select($"href").collect().map(_.getString(0)).toSet
        assert(hrefs === Set("https://t.example/x"),
          "the taken-down page's outlinks must leave the web graph")
      } finally q.stop()
    }

    it("archive member store: the member's bytes leave the standing set") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("td_arch").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("td_arch_ck").toString
      val src = MemoryStream[(String, Array[Byte])]
      val q = StreamOps.streamingArchives(src.toDF().toDF("path", "content"),
        storePath = store, nBuckets = 2, checkpointDir = ckpt)
      def zipOf(rows: Seq[(Long, String, Array[Byte])]): Array[Byte] = {
        val d = java.nio.file.Files.createTempDirectory("td_arch_fix").toString
        graft.sources.Formats.writeZipFixture(rows.toDF("id", "member", "bytes"), d, 1)
        val f = new java.io.File(d).listFiles().filter(_.getName.endsWith(".zip")).head
        java.nio.file.Files.readAllBytes(f.toPath)
      }
      try {
        src.addData(("d.zip", zipOf(Seq(
          (0L, "a.txt", "alpha".getBytes("UTF-8")),
          (0L, "b.txt", "beta".getBytes("UTF-8"))))))
        q.processAllAvailable()
        StreamOps.deleteIdsFromStore(store, Seq("b.txt").toDF("member"), "member",
          version = 100L, nBuckets = 2)
        val got = StreamOps.membersFromStore(spark, store)
          .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8"))).toMap
        assert(got === Map("a.txt" -> "alpha"))
      } finally q.stop()
    }
  }

  describe("streamingSftTurns ≡ release-time assembly over the live turn store") {
    it("out-of-order arrival, turn re-ship, in-batch duplicates, and a turn " +
       "tombstone all reconcile to the from-scratch assembly") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val store = java.nio.file.Files.createTempDirectory("sft_store").resolve("s").toString
      val ckpt = java.nio.file.Files.createTempDirectory("sft_ckpt").toString
      val roleIds = Map("user" -> 900L, "assistant" -> 901L)
      val src = MemoryStream[(Long, Long, String, Seq[Long])]
      val q = StreamOps.streamingSftTurns(
        src.toDF().toDF("conv_id", "turn_idx", "role", "ids"),
        storePath = store, nBuckets = 4, checkpointDir = ckpt)
      def assembled(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Seq[Long], Seq[Long])] =
        graft.operators.Sft.assembleConversations(df, roleIds, Set("assistant"))
          .select($"conv_id", $"n_turns", $"ids", $"mask")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3))).toSet
      // batch 1: conv 1 turns arrive OUT OF ORDER; conv 2 starts
      // batch 2: conv 1 turn 2 lands, turn 0 RE-SHIPS edited, and the
      //          batch carries a duplicate capture of conv 2 turn 1
      //          (the max-(role, ids) winner must be deterministic)
      // batch 3: conv 2 turn 1 is TOMBSTONED (redaction) via empty ids
      val batches = Seq(
        Seq((1L, 1L, "assistant", Seq(301L, 0L)), (1L, 0L, "user", Seq(300L, 0L)),
          (2L, 0L, "user", Seq(310L, 0L))),
        Seq((1L, 2L, "user", Seq(302L, 0L)), (1L, 0L, "user", Seq(303L, 304L, 0L)),
          (2L, 1L, "assistant", Seq(311L, 0L)), (2L, 1L, "assistant", Seq(312L, 0L))),
        Seq((2L, 1L, "assistant", Seq.empty[Long])))
      val live = scala.collection.mutable.Map.empty[(Long, Long), (String, Seq[Long])]
      try {
        batches.foreach { b =>
          src.addData(b: _*)
          q.processAllAvailable()
          b.groupBy(r => (r._1, r._2)).foreach { case (k, rows) =>
            // mirror the in-batch winner rule: max (role, ids)
            val w = {
              // Spark's max(struct(role, ids)) compares arrays element-wise
              // then by length — exactly Ordering.Implicits.seqOrdering
              import scala.math.Ordering.Implicits.seqOrdering
              rows.map(r => (r._3, r._4)).max
            }
            if (w._2.isEmpty) live.remove(k) else live(k) = w
          }
          val scratch = live.toSeq
            .map { case ((c, t), (role, ids)) => (c, t, role, ids) }
            .toDF("conv_id", "turn_idx", "role", "ids")
          assert(assembled(StreamOps.sftTurnsFromStore(spark, store)) ===
            assembled(scratch), s"after ${live.toMap}")
        }
        // the post-tombstone record truly lost the redacted turn
        val conv2 = graft.operators.Sft.assembleConversations(
            StreamOps.sftTurnsFromStore(spark, store), roleIds, Set("assistant"))
          .where($"conv_id" === 2L)
          .select($"n_turns", $"ids").collect().head
        assert(conv2.getLong(0) === 1L)
        assert(conv2.getSeq[Long](1) === Seq(900L, 310L, 0L))
        // a turn_idx outside the packing bound fails the batch loudly
        src.addData((3L, 1048576L, "user", Seq(320L, 0L)))
        val e = intercept[Exception](q.processAllAvailable())
        val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
        assert(msg.contains("turn_key packing bound") || msg.contains("2^20"), msg)
      } finally q.stop()
    }
  }
}
