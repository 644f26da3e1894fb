package graft.streaming

import graft.SparkSpec
import graft.gen.SequenceGen
import graft.gen.SequenceGen.Knobs
import graft.model.Violation
import org.apache.spark.sql.functions._

class StreamingValidationSpec extends SparkSpec {
  import spark.implicits._

  test("incremental validation: new files are validated exactly once") {
    val dir = tmpDir("stream")
    val in = s"$dir/in"
    val out = s"$dir/out"

    // first micro-batch of data lands
    SequenceGen.sequences(spark, 300, knobs = Knobs(badNtokRate = 0.1))
      .write.mode("overwrite").parquet(in)
    val manifest = SequenceGen.manifest(spark, 300)

    val q1 = StreamingValidation.start(spark, in, manifest, out)
    q1.awaitTermination(60000)

    val vioSchema = org.apache.spark.sql.Encoders.product[Violation].schema
    def readVio() = spark.read.schema(vioSchema)
      .parquet(s"$out/violations_stream")
    val n1 = readVio().count()
    assert(n1 > 0)

    // late-arriving second batch: only the NEW file is processed
    SequenceGen.sequences(spark, 200, seed = 77L,
        knobs = Knobs(badNtokRate = 0.5))
      .write.mode("append").parquet(in)
    val q2 = StreamingValidation.start(spark, in, manifest, out)
    q2.awaitTermination(60000)

    val n2 = readVio().count()
    assert(n2 > n1) // new violations appended
    // re-running with no new data is a no-op (exactly-once)
    val q3 = StreamingValidation.start(spark, in, manifest, out)
    q3.awaitTermination(60000)
    assert(readVio().count() === n2)
  }

  test("manifested ingest: streamed batches land exactly once and the " +
      "manifest inventory always matches the table") {
    import graft.sources.ManifestTable
    val dir = tmpDir("manstream")
    val in = s"$dir/in"
    val t = s"$dir/table"
    val ckpt = s"$dir/ckpt"

    SequenceGen.sequences(spark, 150).write.mode("overwrite").parquet(in)
    StreamingValidation.startManifestedIngest(
      spark, in, t, ckpt, statsCols = Seq("n_tok"))
      .awaitTermination(60000)
    assert(spark.read.parquet(t).count() === 150L)
    assert(ManifestTable.verifyAgainstListing(spark, t).isEmpty)
    assert(ManifestTable.lastCommitKey(spark, t).exists(_.startsWith("stream-")))
    // zone maps were committed at ingest time
    assert(ManifestTable.readFull(spark, t).get
      .columns.toSet.contains("min_n_tok"))

    // restart with no new files: checkpoint makes it a no-op
    StreamingValidation.startManifestedIngest(
      spark, in, t, ckpt, statsCols = Seq("n_tok"))
      .awaitTermination(60000)
    assert(spark.read.parquet(t).count() === 150L)

    // a late file streams in; only its rows append, inventory stays true
    SequenceGen.sequences(spark, 40, seed = 5L)
      .write.mode("append").parquet(in)
    StreamingValidation.startManifestedIngest(
      spark, in, t, ckpt, statsCols = Seq("n_tok"))
      .awaitTermination(60000)
    assert(spark.read.parquet(t).count() === 190L)
    assert(ManifestTable.verifyAgainstListing(spark, t).isEmpty)
  }

  test("re-uploaded partition REPLACES its violations (delete-then-" +
      "rewrite per micro-batch; VERDICT r02 #4, reference " +
      "s3_event_recorder delete-before-ingest semantics)") {
    import graft.model.Sequence
    val dir = tmpDir("restream")
    val in = s"$dir/in"
    val out = s"$dir/out"

    def doc(i: Long) = f"D$i%012d"
    // batch 1: mito arrives BROKEN (bad n_tok), ee arrives broken too
    val firstUpload = Seq(
      Sequence(doc(1), Array(1, 2, 3), 99, "mito"),
      Sequence(doc(2), Array(1, 2), 98, "mito"),
      Sequence(doc(3), Array(5), 97, "ee"))
    firstUpload.toDS().write.mode("overwrite").parquet(in)
    val manifest = SequenceGen.manifest(spark, 300)

    val vioSchema = org.apache.spark.sql.Encoders.product[Violation].schema
    def readVio() = spark.read.schema(vioSchema)
      .parquet(s"$out/violations_stream")

    val q1 = StreamingValidation.startRevalidating(spark, in, manifest, out)
    q1.awaitTermination(60000)
    assert(readVio().filter($"source" === "mito").count() === 2)
    assert(readVio().filter($"source" === "ee").count() === 1)

    // the CORRECTED mito partition is re-uploaded as a new file
    Seq(
      Sequence(doc(1), Array(1, 2, 3), 3, "mito"),
      Sequence(doc(2), Array(1, 2), 2, "mito"))
      .toDS().write.mode("append").parquet(in)
    val q2 = StreamingValidation.startRevalidating(spark, in, manifest, out)
    q2.awaitTermination(60000)

    // second upload REPLACED (not appended to) mito's violations;
    // untouched ee keeps its generation
    assert(readVio().filter($"source" === "mito").count() === 0)
    assert(readVio().filter($"source" === "ee").count() === 1)

    // a re-upload that is still broken yields exactly ONE fresh generation
    Seq(Sequence(doc(2), Array(1, 2), 77, "mito"))
      .toDS().write.mode("append").parquet(in)
    val q3 = StreamingValidation.startRevalidating(spark, in, manifest, out)
    q3.awaitTermination(60000)
    assert(readVio().filter($"source" === "mito").count() === 1)
  }

  test("streaming drift monitor: clean batches pass, a shifted batch " +
      "flips the cumulative KS alert; histogram generations are " +
      "batch-keyed") {
    val dir = tmpDir("driftmon")
    val in = s"$dir/in"
    val out = s"$dir/out"

    // baseline and first batch from the SAME distribution
    val base = SequenceGen.sequences(spark, 800)
    val baseline = graft.drift.Drift.histograms(
      base.toDF(), SequenceGen.vocabSize, "base")
    SequenceGen.sequences(spark, 800, seed = 7L)
      .write.mode("overwrite").parquet(in)
    StreamingValidation.startDriftMonitor(spark, in, baseline, out)
      .awaitTermination(60000)

    def alerts() = spark.read
      .parquet(s"$out/drift_alerts")
    val a1 = alerts().collect()
    assert(a1.nonEmpty)
    assert(a1.forall(!_.getAs[Boolean]("rejected")),
      a1.mkString("\n")) // same distribution: no drift

    // a second batch with a hard n_tok shift on every source
    SequenceGen.sequences(spark, 800, seed = 8L)
      .withColumn("n_tok", col("n_tok") + 1500)
      .write.mode("append").parquet(in)
    StreamingValidation.startDriftMonitor(spark, in, baseline, out)
      .awaitTermination(60000)

    val a2 = alerts().collect()
    val batches = a2.map(_.getAs[Number]("batch_id").longValue).distinct
    assert(batches.length >= 2) // one alert generation per micro-batch
    val latest = batches.max
    val last = a2.filter(_.getAs[Number]("batch_id").longValue == latest)
    assert(last.exists(_.getAs[Boolean]("rejected")),
      last.mkString("\n")) // cumulative KS now rejects

    // state is one histogram generation per batch (replay-idempotent key)
    val gens = spark.read.parquet(s"$out/drift_state")
      .select("batch_id").distinct().count()
    assert(gens >= 2)
  }

  test("drift monitor per-batch work is BOUNDED: one disk rebuild per " +
      "query run, generations compact into a base, and alerts equal the " +
      "batch-computed cumulative KS (VERDICT r03 #2)") {
    import graft.drift.Drift
    val dir = tmpDir("driftmon_bounded")
    val in = s"$dir/in"
    val out = s"$dir/out"
    val base = SequenceGen.sequences(spark, 800)
    val baseline = Drift.histograms(
      base.toDF(), SequenceGen.vocabSize, "base")

    // 40 input files at maxFilesPerTrigger=16 -> 3 micro-batches per run
    SequenceGen.sequences(spark, 800, seed = 7L).repartition(40)
      .write.mode("overwrite").parquet(in)
    val st1 = new StreamingValidation.DriftMonitorStats
    StreamingValidation.startDriftMonitor(spark, in, baseline, out,
        compactEvery = 2, stats = Some(st1))
      .awaitTermination(120000)
    // within ONE run the cumulative histogram lives in driver memory:
    // disk state was read at most once, regardless of batch count
    assert(st1.rebuilds.get === 1L)
    assert(st1.compactions.get >= 1L)

    // restart with 40 more files: the rebuild reads the compacted base +
    // the few uncompacted generations, NOT one generation per past batch
    SequenceGen.sequences(spark, 800, seed = 8L).repartition(40)
      .write.mode("append").parquet(in)
    val st2 = new StreamingValidation.DriftMonitorStats
    StreamingValidation.startDriftMonitor(spark, in, baseline, out,
        compactEvery = 2, stats = Some(st2))
      .awaitTermination(120000)
    assert(st2.rebuilds.get === 1L)
    val sources = 8 // SequenceGen.sources.size
    // bound: base + at most compactEvery uncompacted generations
    assert(st2.stateRowsRead.get <=
      (1 + 2).toLong * sources * Drift.ntokBins,
      s"rebuild read ${st2.stateRowsRead.get} state rows")

    // on-disk generations stay bounded (uncompacted tail + one base)
    val gens = graft.sources.TableIO
      .partitionValues(spark, s"$out/drift_state", "batch_id")
      .getOrElse(Nil)
    assert(gens.size <= 3, s"state generations not compacted: $gens")
    assert(graft.sources.TableIO
      .partitionValues(spark, s"$out/drift_base", "hw")
      .getOrElse(Nil).size === 1)

    // the LAST batch's alerts must equal a from-scratch batch computation
    // of the cumulative KS over ALL input — compaction and the in-memory
    // carry change the plan, not the answer
    val alerts = spark.read.parquet(s"$out/drift_alerts")
    val lastBatch = alerts.select(max("batch_id")).collect()(0)
      .getAs[Number](0).longValue
    val got = alerts
      .filter(col("batch_id") === lastBatch)
      .select("source", "statistic", "rejected", "n")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getBoolean(2), r.getLong(3)))).toMap
    val baseBins = baseline.collect().filter(_.kind == "ntok_hist")
      .groupBy(_.source).view
      .mapValues(_.map(b => b.bin -> b.count).toMap).toMap
    val expected = Drift.ntokHist(spark.read.parquet(in)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(got.keySet === expected.keySet.intersect(baseBins.keySet))
    got.foreach { case (src, (stat, rej, n)) =>
      val res = Drift.ksTest(
        expected(src), baseBins(src), Drift.ntokBins, 0.01)
      assert(math.abs(res.statistic - stat) < 1e-12, s"$src statistic")
      assert(res.rejected === rej, s"$src rejected")
      assert(res.n === n, s"$src n")
    }
  }

  test("flatMapGroupsWithState sessionizer: sessions close on event-time " +
      "timeout and carry exact violation counts") {
    import StreamingValidation.{SessionEvent, sessionSummaries}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(src: String, sec: Int, v: Boolean) = SessionEvent(
      src, new java.sql.Timestamp(1700000000000L + sec * 1000L), v)

    val in = MemoryStream[SessionEvent]
    val q = sessionSummaries(in.toDS(), gapMs = 10000L,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // one session for cardiac: 2 events 5s apart, 1 violation
      in.addData(ev("cardiac", 0, false), ev("cardiac", 5, true))
      q.processAllAvailable()
      // a much later event advances the watermark past cardiac's
      // session end + gap in the NEXT batch...
      in.addData(ev("mito", 100, false))
      q.processAllAvailable()
      // ...which is triggered by one more batch
      in.addData(ev("mito", 200, false))
      q.processAllAvailable()

      val rows = spark.table("sessions")
        .as[StreamingValidation.SessionSummary].collect()
      val cardiac = rows.filter(_.source == "cardiac")
      assert(cardiac.length === 1, rows.mkString(", "))
      assert(cardiac.head.n_events === 2 && cardiac.head.n_violations === 1)
      assert(cardiac.head.end_ms - cardiac.head.start_ms === 5000L)
    } finally q.stop()
  }

  test("streaming stateful dedup: first occurrence wins across " +
      "micro-batches, duplicates are dropped") {
    import graft.model.Sequence
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    def s(id: String, src: String) = Sequence(id, Array(1), 1, src)
    val in = MemoryStream[Sequence]
    val q = StreamingValidation.dedupStream(in.toDS())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(s("DA", "s1"), s("DB", "s1"), s("DA", "s2")) // in-batch dup
      q.processAllAvailable()
      in.addData(s("DA", "s3"), s("DC", "s2")) // cross-batch dup + fresh
      q.processAllAvailable()
      val out = spark.table("dedup_stream").as[Sequence].collect()
      assert(out.map(_.doc_id).sorted.toSeq === Seq("DA", "DB", "DC"))
      // DA kept its first BATCH's deterministic survivor (the
      // (source, n_tok)-least of the in-batch duplicates — s1), never
      // the later batch's re-upload (s3)
      assert(out.find(_.doc_id == "DA").get.source === "s1")
    } finally q.stop()
  }

  test("dedup stream state TTL: an idle key expires and its next " +
      "duplicate is re-admitted; an active key refreshes its TTL") {
    import graft.model.Sequence
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

    def s(id: String, src: String) = Sequence(id, Array(1), 1, src)
    val fn = StreamingValidation.dedupStateFn(Some(100L)) _
    def fresh() = TestGroupState.create[Boolean](
      org.apache.spark.api.java.Optional.empty[Boolean](),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

    // first sighting: emitted, state armed with the TTL
    val st1 = fresh()
    val out1 = fn("DA", Iterator(s("DA", "s2"), s("DA", "s1")), st1).toSeq
    assert(out1.map(_.source) === Seq("s1")) // deterministic in-batch min
    assert(st1.exists && st1.getTimeoutTimestampMs.get() === 1100L)

    // duplicate while state lives: dropped AND the TTL is refreshed
    // (a key expires only after a full TTL of silence)
    val st2 = TestGroupState.create[Boolean](
      org.apache.spark.api.java.Optional.of(java.lang.Boolean.TRUE),
      GroupStateTimeout.ProcessingTimeTimeout, 2000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    assert(fn("DA", Iterator(s("DA", "s3")), st2).isEmpty)
    assert(st2.exists && st2.getTimeoutTimestampMs.get() === 2100L)

    // timeout fires: the seen-bit is dropped (bounded state)...
    val st3 = TestGroupState.create[Boolean](
      org.apache.spark.api.java.Optional.of(java.lang.Boolean.TRUE),
      GroupStateTimeout.ProcessingTimeTimeout, 3000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    assert(fn("DA", Iterator.empty, st3).isEmpty)
    assert(st3.isRemoved)

    // ...so the key's next sighting is a fresh first-seen (re-admitted)
    val st4 = fresh()
    assert(fn("DA", Iterator(s("DA", "s9")), st4).map(_.source).toSeq
      === Seq("s9"))

    // without a TTL the state never arms a timeout (exact semantics)
    val noTtl = StreamingValidation.dedupStateFn(None) _
    val st5 = TestGroupState.create[Boolean](
      org.apache.spark.api.java.Optional.empty[Boolean](),
      GroupStateTimeout.NoTimeout, 1000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    assert(noTtl("DA", Iterator(s("DA", "s1")), st5).nonEmpty)
    assert(!st5.getTimeoutTimestampMs.isPresent)
  }

  test("stream-stream interval join: purchases attribute to same-user " +
      "clicks within the lag window; state join is symmetric-hash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(sec: Int) =
      new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingValidation.attributeStream(
      clicks.toDS().toDF("click_user", "click_id", "click_ts"),
      purchases.toDS().toDF("purchase_user", "purchase_id", "purchase_ts"),
      maxLagSec = 60)
    val q = joined
      .select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 10L, ts(0)), (1L, 11L, ts(30)), (2L, 20L, ts(5)))
      purchases.addData((1L, 100L, ts(40)))
      q.processAllAvailable()
      // cross-micro-batch match: a later purchase still finds the
      // buffered click state
      purchases.addData((2L, 200L, ts(50)), (1L, 101L, ts(80)))
      q.processAllAvailable()
      val out = spark.table("attr_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // p100@40s: clicks 10 (lag 40) and 11 (lag 10) both inside 60s;
      // p200@50s: click 20 (lag 45); p101@80s: only click 11 (lag 50) is
      // within 60s — click 10 (lag 80) is outside the band and, once the
      // watermark passes, evictable state
      assert(out === Set((100L, 10L), (100L, 11L), (200L, 20L),
        (101L, 11L)))
    } finally q.stop()
  }

  test("dedupWithinWatermark: duplicates inside the watermark window " +
      "are dropped (in-batch and cross-batch); an expired key re-emits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(sec: Int) =
      new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamingValidation.dedupWithinWatermark(
      in.toDS().toDF("event_id", "ts"),
      keyCols = Seq("event_id"), tsCol = "ts", delay = "60 seconds")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      // batch 1: in-batch duplicate of key 1 collapses
      in.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(10)))
      q.processAllAvailable()
      // batch 2: key 1 again within the window -> dropped;
      // watermark after this batch = 70 - 60 = t+10s
      in.addData((1L, ts(40)), (3L, ts(70)))
      q.processAllAvailable()
      // batch 3: advance the watermark far past key 1's state
      // (wm = 600 - 60 = t+540s >> t0+60s, so key 1's state is evicted)
      in.addData((9L, ts(600)))
      q.processAllAvailable()
      // batch 4: key 1 after the quiet period -> re-emitted
      in.addData((1L, ts(650)))
      q.processAllAvailable()
      val rows = spark.table("dedup_wm").collect()
        .map(r => r.getLong(0)).toSeq
      assert(rows.count(_ == 1L) === 2,
        s"key 1 should emit once per watermark epoch, got $rows")
      assert(rows.count(_ == 2L) === 1 && rows.count(_ == 3L) === 1 &&
        rows.count(_ == 9L) === 1)
    } finally q.stop()
  }

  test("watermarked windowed violation-rate aggregation") {
    val events = Seq(
      ("cardiac", java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), true),
      ("cardiac", java.sql.Timestamp.valueOf("2026-01-01 00:02:00"), false),
      ("mito", java.sql.Timestamp.valueOf("2026-01-01 00:11:00"), true)
    ).toDF("source", "event_time", "is_violation")
    val rates = StreamingValidation.violationRate(events).collect()
    assert(rates.length === 2) // two (window, source) groups
    val cardiac = rates.find(_.getString(1) == "cardiac").get
    assert(cardiac.getLong(2) === 2L && cardiac.getLong(3) === 1L)
  }
}
