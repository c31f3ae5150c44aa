package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured Streaming parity: the SAME transform objects power batch
  * (driver correctness gate) and streams; here MemoryStream feeds the
  * streaming entry points and the result must equal the batch run on
  * the same data. */
class EventStreamsSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val rows = Seq(
    (ts(0), "click", 1.0), (ts(3), "click", 2.0), (ts(7), "view", 3.0),
    (ts(12), "click", 4.0), (ts(31), "view", 5.0), (ts(33), "click", 6.0))

  test("tumblingStream over MemoryStream equals batch tumbling") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingStream(streamDf, "10 minutes", "5 minutes")
      .select(col("w.start").as("wstart"), col("event_type"), col("n"),
        col("sum_value"))
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val streamed = s.table("tumbling_test")
        .orderBy("wstart", "event_type").collect().toSeq
      val batch = EventStreams.tumbling(rows.toDF("ts", "event_type", "value"),
          "10 minutes")
        .select(col("w.start").as("wstart"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy("wstart", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.size == 5) // windows 00,00,10,30,30 × types
    } finally q.stop()
  }

  test("slidingStream over MemoryStream equals batch sliding") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.slidingStream(streamDf, "10 minutes", "5 minutes",
        "5 minutes")
      .select(col("w.start").as("wstart"), col("event_type"), col("n"),
        col("sum_value"))
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val streamed = s.table("sliding_test")
        .orderBy("wstart", "event_type").collect().toSeq
      val batch = EventStreams.sliding(rows.toDF("ts", "event_type", "value"),
          "10 minutes", "5 minutes")
        .select(col("w.start").as("wstart"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy("wstart", "event_type").collect().toSeq
      assert(streamed == batch)
      // every event lands in exactly width/slide = 2 windows
      assert(streamed.map(_.getLong(2)).sum == 2L * rows.size)
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingStream(streamDf, "10 minutes", "5 minutes")
      .select(col("w.start").as("wstart"), col("n"))
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts(5), "click", 1.0)))
      q.processAllAvailable()
      // advance event time far past the first window + watermark
      input.addData(Seq((ts(120), "click", 1.0)))
      q.processAllAvailable()
      // this event is 2h late — behind the watermark, must be dropped
      input.addData(Seq((ts(6), "click", 99.0)))
      q.processAllAvailable()
      input.addData(Seq((ts(240), "click", 1.0)))
      q.processAllAvailable()
      val emitted = s.table("late_test").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      // the 00:00 window was emitted with exactly 1 event (not 2):
      assert(emitted(ts(0)) == 1L)
    } finally q.stop()
  }

  test("file-source stream: parquet dropped into a watched dir flows through the same transform") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val stream = s.readStream.schema(schema).parquet(dir)
    val q = EventStreams.tumblingStream(stream, "10 minutes", "5 minutes")
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    try {
      rows.take(3).toDF("ts", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val n1 = s.table("file_stream_test").agg(sum("n")).head().getLong(0)
      assert(n1 == 3L)
      // a second file lands in the watched dir → incremental processing
      rows.drop(3).toDF("ts", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val n2 = s.table("file_stream_test").agg(sum("n")).head().getLong(0)
      assert(n2 == 6L)
    } finally q.stop()
  }

  test("mapGroupsWithState: lifetime count accumulates, streak resets across the gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.userRunningState(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("state_test")
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(0))))
      q.processAllAvailable()
      input.addData(Seq((1L, ts(10))))   // within gap → streak extends
      q.processAllAvailable()
      input.addData(Seq((1L, ts(120)))) // 110 min later → streak resets
      q.processAllAvailable()
      val got = s.table("state_test")
        .groupBy("user_id").agg(max("n").as("n"), last("streak").as("streak"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got(1L) == 4L) // lifetime count survives across batches
      assert(got(2L) == 1L)
      val updates = s.table("state_test").filter(col("user_id") === 1)
        .orderBy("n").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(updates == Seq((2L, 2L), (3L, 3L), (4L, 1L)),
        s"got $updates") // streak 2 after batch1, 3 in-gap, reset to 1
    } finally q.stop()
  }

  test("mapGroupsWithState: final per-user state is chunking-invariant") {
    // the q_stream_running gate keeps each user's LAST update (max n);
    // that row must be the fold of the full chronological sequence no
    // matter how the feed is micro-batched
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val events = (0 until 40).map { i =>
      ((i % 3).toLong, ts(i * 13 + (if (i % 7 == 0) 600 else 0)))
    }.sortBy(_._2.getTime)
    def finalRows(chunks: Seq[Seq[(Long, Timestamp)]]): Map[Long, (Long, Long)] = {
      val input = MemoryStream[(Long, Timestamp)]
      val name = s"chunk_inv_${chunks.size}"
      val q = EventStreams.userRunningState(input.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val out = s.table(name)
        .groupBy("user_id")
        .agg(max("n").as("n"), max_by(col("streak"), col("n")).as("streak"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      s.catalog.dropTempView(name)
      out
    }
    val oneBatch = finalRows(Seq(events))
    val fiveBatches = finalRows(events.grouped(8).toSeq)
    assert(oneBatch == fiveBatches, s"$oneBatch vs $fiveBatches")
    assert(oneBatch.values.map(_._1).sum == 40L)
  }

  test("anomalyStream: a zero-variance profile never emits; the final " +
      "open hour is never emitted even when anomalous") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def at(hour: Int, minute: Int) = ts(hour * 60 + minute)
    // hours 0-2 all carry count 2 (variance 0 → closing hour 3 can't
    // score), and the 9-count spike in hour 3 NEVER closes (no later
    // event) — so nothing at all is emitted
    val calm = for (h <- 0 to 2; m <- Seq(1, 2)) yield (1L, at(h, m))
    val spike = (0 until 9).map(m => (1L, at(3, m)))
    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anom_test")
      .outputMode("append").start()
    try {
      input.addData(calm)
      q.processAllAvailable()
      input.addData(spike)
      q.processAllAvailable()
      assert(s.table("anom_test").isEmpty)
    } finally q.stop()
  }

  test("anomalyStream: z equals the prefix-moment replay and is " +
      "chunking-invariant") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def at(hour: Int, minute: Int) = ts(hour * 60 + minute)
    // counts 1, 2, 3 over hours 0-2 (nonzero variance), spike 9 in
    // hour 3, closer in hour 4
    val events = (Seq((1L, at(0, 1))) ++
      Seq(1, 2).map(m => (1L, at(1, m))) ++
      Seq(1, 2, 3).map(m => (1L, at(2, m))) ++
      (0 until 9).map(m => (1L, at(3, m))) ++
      Seq((1L, at(4, 0)))).sortBy(_._2.getTime)
    def run(chunks: Seq[Seq[(Long, Timestamp)]], name: String) = {
      val input = MemoryStream[(Long, Timestamp)]
      val q = EventStreams.anomalyStream(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val out = s.table(name).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getDouble(3))).toSeq
      s.catalog.dropTempView(name)
      out
    }
    val one = run(Seq(events), "anom_one")
    val many = run(events.grouped(3).toSeq, "anom_many")
    assert(one == many, s"$one vs $many")
    // hour 2 closes against {1,2}: m=1.5, var=0.5, z=(3-1.5)/sqrt(.5)
    // ≈ 2.12 > 2 → emitted; hour 3 against {1,2,3}: m=2, var=1, z=7
    val m23 = 3.0 / 2
    val v23 = (5.0 - 3.0 * 3.0 / 2) / 1
    assert(one.map(t => (t._3, t._4)) ==
      Seq((3L, (3 - m23) / math.sqrt(v23)), (9L, (9 - 2.0) / 1.0)))
  }

  test("mergeable CMS sketch aggregates identically in batch and streaming") {
    // the sketch Aggregators are the scale path BECAUSE they're
    // mergeable; streaming incremental state maintenance is the same
    // merge, so a stream must converge to the batch sketch exactly
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val cms = udaf(new graft.functions.CountMinAgg(4, 64))
    val data: Seq[java.lang.Long] =
      (1L to 30L).flatMap(v => Seq.fill((v % 7 + 1).toInt)(java.lang.Long.valueOf(v)))

    val input = MemoryStream[java.lang.Long]
    val q = input.toDF().toDF("h")
      .agg(cms(col("h")).as("cms"))
      .writeStream.format("memory").queryName("cms_test")
      .outputMode("complete").start()
    try {
      val (a, b) = data.splitAt(data.size / 2)
      input.addData(a)
      q.processAllAvailable()
      input.addData(b) // second micro-batch: state merged incrementally
      q.processAllAvailable()
      val streamed = s.table("cms_test").head().getSeq[Long](0)
      val batch = data.toDF("h").agg(cms(col("h")).as("cms"))
        .head().getSeq[Long](0)
      assert(streamed == batch)
      assert(streamed.sum == 4L * data.size) // every input counted d times
    } finally q.stop()
  }

  test("flatMapGroupsWithState: sessions are emitted exactly once, when closed by a later event") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionCloseStream(input.toDS(), gapMinutes = 60)
      .writeStream.format("memory").queryName("close_test")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(10))))
      q.processAllAvailable()
      // both sessions still open — nothing emitted yet
      assert(s.table("close_test").count() == 0)
      input.addData(Seq((1L, ts(300)))) // 295 min gap → closes session 1
      q.processAllAvailable()
      val got = s.table("close_test").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSeq
      assert(got == Seq((1L, ts(0), ts(5), 2L))) // emitted once, user 2 open
      // two sessions closed in ONE batch: events at 400 and 600 close
      // the (300) session and the (400) session in the same trigger
      input.addData(Seq((1L, ts(400)), (1L, ts(600))))
      q.processAllAvailable()
      val all = s.table("close_test").filter(col("user_id") === 1)
        .orderBy("start").collect().map(r => r.getTimestamp(1)).toSeq
      assert(all == Seq(ts(0), ts(300), ts(400)))
    } finally q.stop()
  }

  test("session close: cross-batch stragglers can't merge or corrupt sessions") {
    // ADVICE r4 item 4: an event OLDER than the open session's lastMs
    // used to yield a negative delta that always extended the session
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

    val input = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionCloseStream(input.toDS(), gapMinutes = 60)
      .writeStream.format("memory").queryName("straggler_test")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, ts(1000)), (1L, ts(1010))))
      q.processAllAvailable()
      // batch 2: a late event INSIDE the open session (absorbed, start
      // extended down) and a stale one far older (emitted as singleton)
      input.addData(Seq((1L, ts(990)), (1L, ts(100))))
      q.processAllAvailable()
      val singles = s.table("straggler_test").collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSeq
      assert(singles == Seq((ts(100), ts(100), 1L)))
      // boundary: an event EXACTLY gap older than the open session's
      // start (990 − 60 = 930) must break, not absorb — batch islands
      // split at delta ≥ gap (ADVICE r5)
      input.addData(Seq((1L, ts(930))))
      q.processAllAvailable()
      // close the open session: it must span 990..1010 with n=3 — the
      // stragglers neither extended it through a negative gap nor merged
      input.addData(Seq((1L, ts(2000))))
      q.processAllAvailable()
      val all = s.table("straggler_test").orderBy("start").collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSeq
      assert(all == Seq((ts(100), ts(100), 1L), (ts(930), ts(930), 1L),
        (ts(990), ts(1010), 3L)))
    } finally q.stop()
  }

  test("stream-stream interval join: errors pick up same-user clicks within the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val errors = MemoryStream[(Long, Long, Timestamp)]
    val cdf = clicks.toDF().toDF("user_id", "event_id", "ts")
    val edf = errors.toDF().toDF("user_id", "event_id", "ts")
    val q = EventStreams.clickErrorJoinStream(cdf, edf,
        horizon = "30 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    try {
      clicks.addData(Seq((1L, 100L, ts(0)), (1L, 101L, ts(20)),
        (1L, 102L, ts(90)), (2L, 200L, ts(10))))
      errors.addData(Seq((1L, 900L, ts(25)), (2L, 901L, ts(60))))
      q.processAllAvailable()
      // advance both watermarks so joined rows are emitted (distinct
      // users so the advancer rows don't join with each other)
      clicks.addData(Seq((8L, 999L, ts(300))))
      errors.addData(Seq((9L, 998L, ts(300))))
      q.processAllAvailable()
      val got = s.table("ssjoin_test")
        .select("err_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // error 900 @25: clicks 100 (@0, 25m before) and 101 (@20, 5m before) hit;
      // click 102 is after the error. error 901 @60: user 2's click @10 is
      // 50m before — outside the 30m horizon.
      assert(got == Set((900L, 100L), (900L, 101L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: same event_id delivered twice emits once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupStream(df, "event_id", lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, ts(0), 1.0), (2L, ts(1), 2.0)))
      q.processAllAvailable()
      // redelivery of event 1 (at-least-once source) within the watermark
      input.addData(Seq((1L, ts(2), 1.0), (3L, ts(3), 3.0)))
      q.processAllAvailable()
      val ids = s.table("dedup_stream_test")
        .select("event_id").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("foreachBatch sink: each micro-batch lands in the external store exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // the production sink pattern: stream → foreachBatch(batchDf, id)
    // → idempotent write keyed by batch id (here: a concurrent map
    // standing in for a parquet/Delta MERGE target)
    val store = new java.util.concurrent.ConcurrentHashMap[Long, Seq[(String, Long)]]()
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.tumblingStream(
        input.toDF().toDF("ts", "event_type", "value"), "10 minutes", "5 minutes")
      .select(col("event_type"), col("n"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        store.put(id, batch.collect().toSeq.map(r => (r.getString(0), r.getLong(1))))
        (): Unit
      }
      .start()
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.drop(3))
      q.processAllAvailable()
      val batches = store.values().toArray.toSeq
        .asInstanceOf[Seq[Seq[(String, Long)]]].filter(_.nonEmpty)
      assert(batches.size == 2, s"got ${store.size} batches")
      // update mode re-emits changed (window, type) rows per batch; both
      // event types must have flowed through the sink
      assert(batches.flatten.map(_._1).toSet == Set("click", "view"))
    } finally q.stop()
  }

  test("sessionsStream groups by inactivity gap like batch sessions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val sess = Seq(
      (ts(0), 1L, 1.0), (ts(5), 1L, 2.0),   // session 1 of user 1
      (ts(60), 1L, 3.0),                    // session 2 of user 1 (gap 55m > 30m)
      (ts(10), 2L, 4.0))                    // user 2
    val input = MemoryStream[(Timestamp, Long, Double)]
    val streamDf = input.toDF().toDF("ts", "user_id", "value")
    val q = EventStreams.sessionsStream(streamDf, "30 minutes", "5 minutes")
      .select(col("user_id"), col("w.start").as("wstart"), col("n"))
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("complete").start()
    try {
      input.addData(sess)
      q.processAllAvailable()
      val got = s.table("sessions_test")
        .orderBy("user_id", "wstart")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSeq
      assert(got == Seq((1L, ts(0), 2L), (1L, ts(60), 1L), (2L, ts(10), 1L)))
    } finally q.stop()
  }

  test("distinctStream registers equal the batch HLL over the same data " +
      "and estimate exact small cardinalities") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // window 1: users 1,2,3 (one duplicate); window 2: users 1,4
    val ev = Seq(
      (ts(0), 1L), (ts(2), 2L), (ts(4), 3L), (ts(6), 1L),
      (ts(12), 1L), (ts(14), 4L))
    val input = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.distinctStream(
        input.toDF().toDF("ts", "user_id"), "10 minutes", "5 minutes")
      .select(col("w.start").as("wstart"), col("regs"))
      .writeStream.format("memory").queryName("distinct_test")
      .outputMode("complete").start()
    try {
      input.addData(ev)
      q.processAllAvailable()
      val streamed = s.table("distinct_test")
        .orderBy("wstart")
        .collect().map(r => (r.getTimestamp(0), r.getSeq[Int](1))).toSeq
      // batch path: same hash, same aggregator, same windows
      val hll = udaf(new graft.functions.HllAgg(8))
      val batch = ev.toDF("ts", "user_id")
        .withColumn("hv",
          conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long"))
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(hll(col("hv")).as("regs"))
        .select(col("w.start").as("wstart"), col("regs"))
        .orderBy("wstart")
        .collect().map(r => (r.getTimestamp(0), r.getSeq[Int](1))).toSeq
      assert(streamed == batch)
      // tiny cardinalities sit in the linear-counting regime — exact
      val ests = streamed.map { case (_, regs) =>
        val nz = regs.count(_ == 0)
        math.round(256.0 * math.log(256.0 / nz))
      }
      assert(ests == Seq(3L, 2L), s"estimates $ests")
    } finally q.stop()
  }

  test("cmsStream counter matrix equals the batch CMS over the same " +
      "data and never under-counts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // window 1: 3 clicks, 1 view; window 2: 1 click, 2 errors — fed in
    // two chunks so the matrix must merge micro-batch partials
    val ev = Seq(
      (ts(0), "click"), (ts(2), "click"), (ts(4), "view"), (ts(6), "click"),
      (ts(12), "click"), (ts(14), "error"), (ts(16), "error"))
    val input = MemoryStream[(Timestamp, String)]
    val q = EventStreams.cmsStream(
        input.toDF().toDF("ts", "event_type"), "10 minutes", "5 minutes",
        d = 4, w = 64)
      .select(col("w.start").as("wstart"), col("cms"))
      .writeStream.format("memory").queryName("cms_test")
      .outputMode("complete").start()
    try {
      input.addData(ev.take(4))
      q.processAllAvailable()
      input.addData(ev.drop(4))
      q.processAllAvailable()
      val streamed = s.table("cms_test")
        .orderBy("wstart")
        .collect().map(r => (r.getTimestamp(0), r.getSeq[Long](1))).toSeq
      val cms = udaf(new graft.functions.CountMinAgg(4, 64))
      val batch = ev.toDF("ts", "event_type")
        .withColumn("hv",
          conv(substring(md5(col("event_type")), 1, 8), 16, 10).cast("long"))
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(cms(col("hv")).as("cms"))
        .select(col("w.start").as("wstart"), col("cms"))
        .orderBy("wstart")
        .collect().map(r => (r.getTimestamp(0), r.getSeq[Long](1))).toSeq
      assert(streamed == batch)
      // probe estimates against the true per-window counts
      val exact = Map(ts(0) -> Map("click" -> 3L, "view" -> 1L),
        ts(10) -> Map("click" -> 1L, "error" -> 2L))
      streamed.foreach { case (w, mat) =>
        exact(w).foreach { case (k, n) =>
          val hv = java.lang.Long.parseLong(
            org.apache.commons.codec.digest.DigestUtils.md5Hex(k)
              .substring(0, 8), 16)
          val est = (0 until 4).map(j =>
            mat(j * 64 + graft.functions.CountMinAgg.bucket(hv, j, 64))).min
          assert(est >= n, s"CMS under-counted $k in $w: $est < $n")
        }
      }
    } finally q.stop()
  }
}
