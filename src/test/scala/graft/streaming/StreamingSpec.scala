package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends AnyFunSuite with SharedSpark {

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming FASTA source: new files arrive as new micro-batches") {
    val dir = graft.TestTmp.dir("graft_stream").toString
    val ckpt = graft.TestTmp.dir("graft_ckpt").toString
    def writeFasta(name: String, ids: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
      java.nio.file.Files.writeString(tmp,
        ids.map(i => s">$i\nATCG").mkString("", "\n", "\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    writeFasta("a.fasta", Seq("a1", "a2"))

    val out = graft.TestTmp.dir("graft_sink").toString
    def runOnce(): Long = {
      val q = spark.readStream.format("fasta").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(runOnce() == 2)
    writeFasta("b.fasta", Seq("b1", "b2", "b3"))
    // restart from the checkpoint: only the new file is read, output appends
    assert(runOnce() == 5, "second run must read only the newly arrived file")
    val ids = spark.read.parquet(out).select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("a1", "a2", "b1", "b2", "b3"))
  }

  test("streaming BINARY source: bigwig shards arrive as new micro-batches") {
    import org.apache.spark.sql.functions.col
    val dir = graft.TestTmp.dir("graft_bw_stream").toString
    val ckpt = graft.TestTmp.dir("graft_bw_ckpt").toString
    def addTrack(name: String, rows: Seq[(String, Int, Int, Float)]): Unit = {
      import spark.implicits._
      val stage = graft.TestTmp.dir("graft_bw_stage").toString
      rows.toDF("name", "start", "end", "value").coalesce(1)
        .write.format("bigwig_value").mode("overwrite").save(s"$stage/t")
      val part = new java.io.File(s"$stage/t").listFiles()
        .filter(_.getName.endsWith(".bw")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    addTrack("a.bw", Seq(("chrA", 0, 10, 1f), ("chrA", 10, 20, 2f),
      ("chrB", 0, 5, 3f)))
    val out = graft.TestTmp.dir("graft_bw_sink").toString
    def runOnce(): Long = {
      val q = spark.readStream.format("bigwig_value").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(runOnce() == 3)
    addTrack("b.bw", Seq(("chrC", 0, 10, 4f), ("chrC", 10, 30, 5f)))
    assert(runOnce() == 5, "second run must read only the new shard")
    val sums = spark.read.parquet(out)
      .agg(org.apache.spark.sql.functions.sum(col("value"))).head().getDouble(0)
    assert(sums == 15.0)
  }

  test("streaming restart survives deletion of an already-processed file") {
    // Boundary-key offsets (mtime, path) — not counts — so removing a
    // processed file must neither re-read survivors nor skip arrivals.
    val dir = graft.TestTmp.dir("graft_stream_del").toString
    val ckpt = graft.TestTmp.dir("graft_ckpt_del").toString
    val out = graft.TestTmp.dir("graft_sink_del").toString
    def writeFasta(name: String, ids: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
      java.nio.file.Files.writeString(tmp,
        ids.map(i => s">$i\nATCG").mkString("", "\n", "\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("fasta").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeFasta("a.fasta", Seq("a1"))
    writeFasta("b.fasta", Seq("b1"))
    runOnce()
    // delete one processed file, land a new one strictly later
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "a.fasta"))
    Thread.sleep(1100) // distinct mtime second on coarse filesystems
    writeFasta("c.fasta", Seq("c1"))
    runOnce()
    val ids = spark.read.parquet(out).select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("a1", "b1", "c1"),
      s"deletion of a processed file shifted the window: $ids")
  }

  test("offset json round-trips hostile paths and accepts legacy count offsets") {
    import graft.sources.GraftFilesOffset
    // control characters (a newline would split the one-line offset log)
    val hostile = GraftFilesOffset(42L, "/data/a\nb\"c\\d\t.fasta")
    assert(GraftFilesOffset.parse(hostile.json()) == hostile)
    assert(!hostile.json().contains('\n'))

    // a pre-boundary-key {"count":N} checkpoint restarts as the Nth file's key
    val dir = graft.TestTmp.dir("graft_offs").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.fasta"), ">a\nA\n")
    Thread.sleep(1100)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.fasta"), ">b\nA\n")
    val table = new graft.sources.GraftTable(
      graft.sources.formats.FastaFormat, Map("path" -> dir))
    val scan = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())).build()
      .asInstanceOf[graft.sources.GraftScan]
    val stream = scan.toMicroBatchStream("unused")
    val legacy = stream.deserializeOffset("""{"count":1}""")
      .asInstanceOf[GraftFilesOffset]
    assert(legacy.path.endsWith("a.fasta"), legacy)
    // the converted offset covers exactly the first file: one file remains
    val batch = stream.planInputPartitions(legacy,
      stream.latestOffset().asInstanceOf[GraftFilesOffset])
    assert(batch.nonEmpty)

    // monotonicity: delete the newest file; latestOffset must not regress
    val hi = stream.latestOffset().asInstanceOf[GraftFilesOffset]
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "b.fasta"))
    val after = stream.latestOffset().asInstanceOf[GraftFilesOffset]
    assert(after == hi, s"offset regressed after deletion: $after < $hi")
  }

  test("flatMapGroupsWithState dedup emits each hash once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = StreamingOps.dedupByHash(in.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData(DocEvent(1, "h1", ts(0)), DocEvent(2, "h1", ts(1)), DocEvent(3, "h2", ts(1)))
    q.processAllAvailable()
    in.addData(DocEvent(4, "h1", ts(2)), DocEvent(5, "h3", ts(3)))
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id, hash FROM dedup_out ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    q.stop()
    assert(got == Seq((1L, "h1"), (3L, "h2"), (5L, "h3")),
      s"dedup must keep first sighting only, got $got")
  }

  test("watermarked windowed counts finalize once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "kind")
    val q = StreamingOps.windowedEventCounts(df, "ts", "kind",
      window = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    in.addData((ts(0), "click"), (ts(1), "click"), (ts(2), "view"))
    q.processAllAvailable()
    // advance the watermark far past the first window to finalize it
    in.addData((ts(60), "click"))
    q.processAllAvailable()
    val got = spark.sql("SELECT kind, n FROM win_out ORDER BY kind")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    q.stop()
    assert(got == Seq(("click", 2L), ("view", 1L)), s"got $got")
  }

  test("streaming sliding distinct users: explode-dedup-count, windows finalize on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayTs(day: Int, min: Int = 0) =
      new Timestamp(1700000000000L + (day * 1440L + min) * 60000L)
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "user_id")
    val q = StreamingOps.slidingDistinctUsers(df, "ts", "user_id",
      days = 7, watermarkDays = 1)
      .writeStream.format("memory").queryName("wau_out")
      .outputMode("append").start()
    in.addData((dayTs(0), 1L), (dayTs(0, 10), 2L))
    q.processAllAvailable()
    // next day: user 1 again (dedups into existing windows), new user 3
    // with a late-but-inside-watermark day-0 event
    in.addData((dayTs(1), 1L), (dayTs(0, 20), 3L))
    q.processAllAvailable()
    // push the watermark far past day 7 so every early window finalizes
    in.addData((dayTs(30), 99L))
    q.processAllAvailable()
    val got = spark.sql("SELECT win_end, wau FROM wau_out ORDER BY win_end")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    q.stop()
    // day0 window saw users 1,2,3; day7 window only user 1's day-1 event
    def wau(day: Int): Option[Long] = {
      val target = new Timestamp(
        java.time.Instant.ofEpochMilli(1700000000000L)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.plusDays(day)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
      got.find(_._1 == target).map(_._2)
    }
    assert(wau(0).contains(3L), s"day0: ${got.mkString(",")}")
    assert(wau(7).contains(1L), s"day7: ${got.mkString(",")}")
  }

  test("streaming sessionization: in-batch gaps close immediately, trailing session by timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamingOps.sessionize(in.toDS(), gapMs = 30L * 60000,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // user 1: three events then a 48-min in-batch gap -> first session
    // (3 events, min 0-2) closes inside the batch
    in.addData(UserEvent(1, ts(0)), UserEvent(1, ts(1)), UserEvent(1, ts(2)),
      UserEvent(1, ts(50)))
    q.processAllAvailable()
    val afterBatch1 = spark.sql("SELECT count(*) FROM sess_out").head().getLong(0)
    assert(afterBatch1 == 1, s"in-batch gap must close the first session, got $afterBatch1")
    // advance the watermark far past min 50 + gap: user 1's trailing open
    // session must time out and emit (timeouts fire the batch AFTER the
    // watermark advances, hence two pokes)
    in.addData(UserEvent(2, ts(200)))
    q.processAllAvailable()
    in.addData(UserEvent(2, ts(201)))
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT user_id, n_events FROM sess_out ORDER BY session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    assert(got.take(2) == Seq((1L, 3L), (1L, 1L)),
      s"expected user 1's two sessions (3 events, then 1), got $got")
  }

  test("dropDuplicatesWithinWatermark + quality filter compose on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val df = in.toDF().toDF("ts", "h", "text")
    val deduped = StreamingOps.dedupWithinWatermark(df, "ts", "h", "10 minutes")
    val gated = StreamingOps.qualityFilter(deduped, "text", minQuality = 0.3)
    val q = gated.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    val good = "the quick brown fox jumps over the lazy dog and it is good " * 3
    in.addData((ts(0), "h1", good), (ts(1), "h1", good), (ts(1), "h2", "x"))
    q.processAllAvailable()
    val got = spark.sql("SELECT h, lang, quality FROM gate_out").collect()
    q.stop()
    assert(got.length == 1 && got(0).getString(0) == "h1")
    assert(got(0).getString(1) == "en")
  }

  test("stream-stream interval join: clicks attribute within horizon, state evicts on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impIn = MemoryStream[(Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Timestamp)]
    val q = StreamingOps.clickAttribution(
        impIn.toDF().toDF("ad_id", "ts"), clkIn.toDF().toDF("ad_id", "ts"),
        horizonMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    impIn.addData((1L, ts(0)), (2L, ts(5)))
    clkIn.addData((1L, ts(10)),  // inside horizon -> attributes
      (1L, ts(45)),              // beyond 30-min horizon -> no match
      (3L, ts(12)))              // no impression for ad 3 -> no match
    q.processAllAvailable()
    // clicks may arrive before their impression lands in a batch: the
    // buffered click must still match once the impression shows up
    clkIn.addData((2L, ts(20)))
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT ad_id, imp_ts, click_ts FROM attr_out ORDER BY ad_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSeq
    q.stop()
    assert(got == Seq((1L, ts(0), ts(10)), (2L, ts(5), ts(20))), s"got $got")
  }
}
