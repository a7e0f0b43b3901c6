package graft.streaming

import graft.Session
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Structured Streaming semantics driven through real streaming
  * queries (file source → memory sink, processAllAvailable). */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-stream-").toString

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("user_id", LongType),
    StructField("value", DoubleType)))

  private def writeJson(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes("UTF-8"))

  test("windowed aggregation with watermark over a file stream") {
    val in = tmp()
    writeJson(in, "b1.json",
      """{"ts":"2024-01-01 10:00:30","user_id":1,"value":1.0}""",
      """{"ts":"2024-01-01 10:01:10","user_id":1,"value":2.0}""",
      """{"ts":"2024-01-01 10:04:45","user_id":2,"value":3.0}""")
    val stream = spark.readStream.schema(schema).json(in)
    val agg = StreamOps.windowedAgg(stream, "ts", "user_id", "5 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        """select window_start, user_id, n from win_out
           order by window_start, user_id""")
        .as[(java.sql.Timestamp, Long, Long)].collect()
      assert(rows.length == 2)
      assert(rows(0)._2 == 1L && rows(0)._3 == 2L) // two events in 10:00 window
      assert(rows(1)._2 == 2L && rows(1)._3 == 1L)
    } finally q.stop()
  }

  test("streaming OHLC equals the batch aggregate on identical rows") {
    val in = tmp()
    val ohlcSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_id", LongType),
      StructField("sym", StringType), StructField("value", DoubleType)))
    val rows = Seq(
      """{"ts":"2024-01-01 10:00:05","event_id":1,"sym":"A","value":10.0}""",
      """{"ts":"2024-01-01 10:00:05","event_id":2,"sym":"A","value":11.0}""",
      """{"ts":"2024-01-01 10:02:00","event_id":3,"sym":"A","value":8.0}""",
      """{"ts":"2024-01-01 10:04:59","event_id":4,"sym":"A","value":9.5}""",
      """{"ts":"2024-01-01 10:06:00","event_id":5,"sym":"A","value":7.0}""",
      """{"ts":"2024-01-01 10:00:30","event_id":6,"sym":"B","value":1.0}""")
    writeJson(in, "b1.json", rows: _*)
    val stream = spark.readStream.schema(ohlcSchema).json(in)
    val q = StreamOps.streamingOhlc(stream, "ts", "sym", "value",
        "event_id", "5 minutes")
      .writeStream.outputMode("complete").format("memory")
      .queryName("ohlc_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        """select sym, open, high, low, close, n, vol from ohlc_out
           order by window_start, sym""")
        .as[(String, Double, Double, Double, Double, Long, Double)]
        .collect().toSeq
      // first A-candle: equal-ts tie at 10:00:05 resolved by event_id
      // (open = id 1's 10.0), close = last event (9.5)
      assert(got == Seq(
        ("A", 10.0, 11.0, 8.0, 9.5, 4L, 38.5),
        ("B", 1.0, 1.0, 1.0, 1.0, 1L, 1.0),
        ("A", 7.0, 7.0, 7.0, 7.0, 1L, 7.0)))
      // batch twin: the same aggregate expressions over the same rows
      val batch = spark.read.schema(ohlcSchema).json(in)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("sym"))
        .agg(
          min_by(col("value"), format_string("%020d-%012d",
            unix_micros(col("ts")), col("event_id"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max_by(col("value"), format_string("%020d-%012d",
            unix_micros(col("ts")), col("event_id"))).as("close"),
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("vol"))
        .orderBy(col("w.start"), col("sym"))
        .select("sym", "open", "high", "low", "close", "n", "vol")
        .as[(String, Double, Double, Double, Double, Long, Double)]
        .collect().toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming dedup drops replayed rows under the watermark") {
    val in = tmp()
    writeJson(in, "b1.json",
      """{"ts":"2024-01-01 10:00:00","user_id":1,"value":1.0}""",
      """{"ts":"2024-01-01 10:00:00","user_id":1,"value":1.0}""",
      """{"ts":"2024-01-01 10:00:05","user_id":1,"value":2.0}""")
    val stream = spark.readStream.schema(schema).json(in)
    val dedup = StreamOps.streamingDedup(stream, "ts", Seq("user_id"))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from dedup_out").count() == 2)
    } finally q.stop()
  }

  test("key-only streaming dedup collapses replays whose event time drifted") {
    val in = tmp()
    // same business key (user_id) redelivered with a re-stamped ts:
    // (key, ts) dedup would keep both; key-only dedup must keep one.
    // user 2 is a distinct key and must survive.
    writeJson(in, "b1.json",
      """{"ts":"2024-01-01 10:00:00","user_id":1,"value":1.0}""",
      """{"ts":"2024-01-01 10:00:03","user_id":1,"value":1.0}""",
      """{"ts":"2024-01-01 10:00:10","user_id":2,"value":2.0}""")
    val stream = spark.readStream.schema(schema).json(in)
    val dedup = StreamOps.streamingDedupKeyOnly(stream, "ts", Seq("user_id"))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_key_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("select user_id from dedup_key_out")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the graft source to a fixed point and stops") {
    import graft.core.{GraftTable, TableConfig}
    import org.apache.spark.sql.streaming.Trigger
    val root = tmp()
    val t = GraftTable.create(spark, s"$root/t", TableConfig(
      name = "an_src", keyField = "k", orderingField = "ts", numBuckets = 2))
    t.insert(Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("k", "ts", "v"))
    t.upsert(Seq(("c", 1L, 3.0)).toDF("k", "ts", "v"))
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$root/t").load()
      .select("k", "ts", "v")
      .writeStream.outputMode("append").format("memory")
      .queryName("an_out").trigger(Trigger.AvailableNow()).start()
    try {
      // AvailableNow must terminate on its own once the prepared
      // timeline head is reached — no stop() needed
      assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
      val got = spark.sql("select k from an_out").as[String].collect().sorted.toSeq
      assert(got == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("maxCommitsPerTrigger bounds how many commits one micro-batch spans") {
    import graft.core.{GraftTable, TableConfig}
    import org.apache.spark.sql.streaming.Trigger
    val root = tmp()
    val t = GraftTable.create(spark, s"$root/t", TableConfig(
      name = "mc_src", keyField = "k", orderingField = "ts", numBuckets = 2))
    // three separate commits, one row each
    t.insert(Seq(("a", 1L, 1.0)).toDF("k", "ts", "v"))
    t.upsert(Seq(("b", 1L, 2.0)).toDF("k", "ts", "v"))
    t.upsert(Seq(("c", 1L, 3.0)).toDF("k", "ts", "v"))
    spark.conf.set("spark.graft.stream.maxCommitsPerTrigger", "1")
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$root/t").load()
      .select("k", "ts", "v")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count(); if (n > 0) { sizes.add(n); () }
      }.start()
    try {
      assert(q.awaitTermination(60000), "query did not terminate")
      // catch-up happened in single-commit steps: three 1-row batches,
      // never one 3-row batch
      assert(sizes.asScala.toSeq == Seq(1L, 1L, 1L),
        s"batch sizes ${sizes.asScala.toSeq}")
    } finally {
      q.stop()
      spark.conf.unset("spark.graft.stream.maxCommitsPerTrigger")
    }
  }

  test("stream-stream join attributes clicks to impressions within the interval") {
    val impDir = tmp()
    val clkDir = tmp()
    writeJson(impDir, "imps.json",
      """{"imp_ts":"2024-01-01 10:00:00","ad_id":1,"campaign":"c1"}""",
      """{"imp_ts":"2024-01-01 10:00:00","ad_id":2,"campaign":"c2"}""")
    writeJson(clkDir, "clicks.json",
      """{"click_ts":"2024-01-01 10:05:00","ad_id":1}""", // within 10 min → joins
      """{"click_ts":"2024-01-01 11:00:00","ad_id":2}""") // 1h later → dropped
    val impSchema = StructType(Seq(StructField("imp_ts", TimestampType),
      StructField("ad_id", LongType), StructField("campaign", StringType)))
    val clkSchema = StructType(Seq(StructField("click_ts", TimestampType),
      StructField("ad_id", LongType)))
    val imps = spark.readStream.schema(impSchema).json(impDir)
    val clicks = spark.readStream.schema(clkSchema).json(clkDir)
    val joined = StreamOps.streamStreamJoin(imps, clicks, "ad_id",
      "imp_ts", "click_ts", within = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select ad_id, campaign from attr_out")
        .as[(Long, String)].collect()
      assert(rows.toSeq == Seq((1L, "c1"))) // only the in-window click
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched impressions emit null-padded after the watermark closes the interval") {
    val impDir = tmp()
    val clkDir = tmp()
    writeJson(impDir, "imps.json",
      """{"imp_ts":"2024-01-01 10:00:00","ad_id":1,"campaign":"c1"}""",
      """{"imp_ts":"2024-01-01 10:00:00","ad_id":2,"campaign":"c2"}""")
    writeJson(clkDir, "clicks.json",
      """{"click_ts":"2024-01-01 10:05:00","ad_id":1}""") // ad 2 never clicks
    val impSchema = StructType(Seq(StructField("imp_ts", TimestampType),
      StructField("ad_id", LongType), StructField("campaign", StringType)))
    val clkSchema = StructType(Seq(StructField("click_ts", TimestampType),
      StructField("ad_id", LongType)))
    val imps = spark.readStream.schema(impSchema).json(impDir)
    val clicks = spark.readStream.schema(clkSchema).json(clkDir)
    val joined = StreamOps.streamStreamLeftJoin(imps, clicks, "ad_id",
      "imp_ts", "click_ts", within = "10 minutes", lateness = "1 minute")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("louter_out").start()
    try {
      q.processAllAvailable()
      // the no-match verdict needs the GLOBAL watermark (min of both
      // sides) past imp_ts + within + lateness — push BOTH streams
      // forward, twice (outer rows surface in the batch after the
      // watermark advance)
      writeJson(impDir, "imps2.json",
        """{"imp_ts":"2024-01-01 12:00:00","ad_id":998,"campaign":"px"}""")
      writeJson(clkDir, "clicks2.json",
        """{"click_ts":"2024-01-01 12:00:00","ad_id":999}""")
      q.processAllAvailable()
      writeJson(impDir, "imps3.json",
        """{"imp_ts":"2024-01-01 12:30:00","ad_id":997,"campaign":"px"}""")
      writeJson(clkDir, "clicks3.json",
        """{"click_ts":"2024-01-01 12:30:00","ad_id":996}""")
      q.processAllAvailable()
      val rows = spark.sql(
        "select ad_id, campaign, click_ts from louter_out where ad_id in (1, 2)")
        .as[(Long, String, Option[java.sql.Timestamp])].collect().toSet
      assert(rows.map(r => (r._1, r._2, r._3.isDefined)) ==
        Set((1L, "c1", true), (2L, "c2", false)),
        s"got $rows")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join surfaces both sides' no-matches") {
    val impDir = tmp()
    val clkDir = tmp()
    writeJson(impDir, "imps.json",
      """{"imp_ts":"2024-01-01 10:00:00","ad_id":1,"campaign":"c1"}""",
      """{"imp_ts":"2024-01-01 10:00:00","ad_id":2,"campaign":"c2"}""")
    writeJson(clkDir, "clicks.json",
      """{"click_ts":"2024-01-01 10:05:00","ad_id":1}""", // matches imp 1
      """{"click_ts":"2024-01-01 10:05:00","ad_id":77}""") // ghost click
    val impSchema = StructType(Seq(StructField("imp_ts", TimestampType),
      StructField("ad_id", LongType), StructField("campaign", StringType)))
    val clkSchema = StructType(Seq(StructField("click_ts", TimestampType),
      StructField("ad_id", LongType)))
    val imps = spark.readStream.schema(impSchema).json(impDir)
    val clicks = spark.readStream.schema(clkSchema).json(clkDir)
    val joined = StreamOps.streamStreamFullOuterJoin(imps, clicks, "ad_id",
      "imp_ts", "click_ts", within = "10 minutes", lateness = "1 minute")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("fouter_out").start()
    try {
      q.processAllAvailable()
      // push the global watermark past every open interval, twice
      // (outer verdicts surface one batch after the advance)
      for (i <- 2 to 3) {
        writeJson(impDir, s"imps$i.json",
          s"""{"imp_ts":"2024-01-01 1$i:00:00","ad_id":99$i,"campaign":"px"}""")
        writeJson(clkDir, s"clicks$i.json",
          s"""{"click_ts":"2024-01-01 1$i:00:00","ad_id":98$i}""")
        q.processAllAvailable()
      }
      val rows = spark.sql(
        "select ad_id, campaign, click_ts from fouter_out where ad_id in (1, 2, 77)")
        .as[(Long, Option[String], Option[java.sql.Timestamp])].collect().toSet
      assert(rows.map(r => (r._1, r._2.isDefined, r._3.isDefined)) ==
        Set((1L, true, true),    // matched pair
            (2L, true, false),   // impression without click
            (77L, false, true)), // click without impression
        s"got $rows")
    } finally q.stop()
  }

  test("streaming sink mergeMode=partial keeps stored values for null columns") {
    import graft.core.{GraftTable, TableConfig}
    val root = tmp()
    def c(n: String) = TableConfig(
      name = n, keyField = "k", orderingField = "ts", numBuckets = 2)
    val src = GraftTable.create(spark, s"$root/src", c("psink_src"))
    val dst = GraftTable.create(spark, s"$root/dst", c("psink_dst"))
    dst.insert(Seq(("a", 1L, Option(10.0), Option("x")))
      .toDF("k", "ts", "v", "tag"))
    // the CDC-feed shape: only changed fields arrive, the rest null
    src.insert(Seq(("a", 2L, Option.empty[Double], Option("y")),
      ("b", 1L, Option(20.0), Option.empty[String]))
      .toDF("k", "ts", "v", "tag"))
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$root/src").load()
      .select("k", "ts", "v", "tag")
      .writeStream.outputMode("append").format("graft-stream")
      .option("path", s"$root/dst")
      .option("mergeMode", "partial")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      q.processAllAvailable()
      val got = dst.read().select("k", "ts", "v", "tag")
        .as[(String, Long, Option[Double], Option[String])]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq(
        ("a", 2L, Some(10.0), Some("y")), // v kept from the stored row
        ("b", 1L, Some(20.0), None)))     // new key: nulls stay null
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dimension, keeps misses") {
    val in = tmp()
    writeJson(in, "b1.json",
      """{"ts":"2024-01-01 10:00:00","user_id":1,"value":1.0}""",
      """{"ts":"2024-01-01 10:00:05","user_id":99,"value":2.0}""")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = spark.readStream.schema(schema).json(in)
    val q = StreamOps.enrich(stream, dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select user_id, tier from enrich_out order by user_id")
        .as[(Long, Option[String])].collect()
      assert(rows.toSeq == Seq((1L, Some("gold")), (99L, None)))
    } finally q.stop()
  }

  test("graft table as streaming source: commits become micro-batches") {
    import graft.core.{GraftTable, TableConfig}
    val root = tmp()
    val t = GraftTable.create(spark, s"$root/t", TableConfig(
      name = "ssrc", keyField = "k", orderingField = "ts", numBuckets = 2))
    t.insert(Seq(("a", 1L, 10.0), ("b", 1L, 20.0)).toDF("k", "ts", "v"))
    // short name resolves via META-INF/services DataSourceRegister
    val stream = spark.readStream.format("graft-stream")
      .option("path", s"$root/t").load()
    val q = stream.select("k", "ts", "v").writeStream.outputMode("append")
      .format("memory").queryName("gsrc_out").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select k from gsrc_out").as[String].collect().toSet
        == Set("a", "b"))
      // a second commit arrives while the stream runs → its changes
      // (and ONLY its changes) land as the next micro-batch
      t.upsert(Seq(("a", 2L, 11.0), ("c", 1L, 30.0)).toDF("k", "ts", "v"))
      q.processAllAvailable()
      val rows = spark.sql("select k, ts, v from gsrc_out order by k, ts")
        .as[(String, Long, Double)].collect()
      assert(rows.toSeq == Seq(
        ("a", 1L, 10.0), ("a", 2L, 11.0), ("b", 1L, 20.0), ("c", 1L, 30.0)))
    } finally q.stop()
  }

  test("graft streaming source merges MOR deltas before the range filter") {
    import graft.core.{GraftTable, TableConfig}
    val root = tmp()
    val t = GraftTable.create(spark, s"$root/t", TableConfig(
      name = "ssrcm", keyField = "k", orderingField = "ts",
      tableType = TableConfig.Mor, numBuckets = 2))
    t.insert(Seq(("a", 1L, 10.0), ("b", 1L, 20.0)).toDF("k", "ts", "v"))
    t.upsert(Seq(("a", 2L, 11.0)).toDF("k", "ts", "v")) // delta file
    require(t.log.liveFiles().exists(_.delta))
    // fresh stream: one batch spans both commits — the reader merges
    // base+delta locally, then applies visibility; 'a' must surface
    // ONCE with its winning version
    val stream = spark.readStream
      .format(classOf[graft.sql.GraftStreamTableProvider].getName)
      .option("path", s"$root/t").load()
    val q = stream.select("k", "ts", "v").writeStream.outputMode("append")
      .format("memory").queryName("gsrcm_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select k, ts, v from gsrcm_out order by k")
        .as[(String, Long, Double)].collect()
      assert(rows.toSeq == Seq(("a", 2L, 11.0), ("b", 1L, 20.0)))
    } finally q.stop()
  }

  test("table-to-table incremental ETL: stream source + foreachBatch upsert") {
    import graft.core.{GraftTable, TableConfig}
    val root = tmp()
    def c(n: String) = TableConfig(
      name = n, keyField = "k", orderingField = "ts", numBuckets = 2)
    val src = GraftTable.create(spark, s"$root/src", c("etl_src"))
    val dst = GraftTable.create(spark, s"$root/dst", c("etl_dst"))
    src.insert(Seq(("a", 1L, 10.0), ("b", 1L, 20.0)).toDF("k", "ts", "v"))
    // replication pipeline: each micro-batch (= each source commit's
    // changes) upserts into the target — the target converges to the
    // source snapshot without ever rescanning it
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$root/src").load()
      .select("k", "ts", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        dst.upsert(df); ()
      }
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      q.processAllAvailable()
      src.upsert(Seq(("a", 2L, 11.0), ("c", 1L, 30.0)).toDF("k", "ts", "v"))
      q.processAllAvailable()
      val got = dst.read().select("k", "ts", "v")
        .as[(String, Long, Double)].collect().sortBy(_._1)
      assert(got.toSeq == Seq(("a", 2L, 11.0), ("b", 1L, 20.0), ("c", 1L, 30.0)))
      assert(got.toSeq == src.read().select("k", "ts", "v")
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq)
    } finally q.stop()
  }

  test("graft table as streaming sink: DSv2 STREAMING_WRITE round trip") {
    import graft.core.{GraftTable, TableConfig}
    import graft.sql.GraftStreamingWrite
    val root = tmp()
    def c(n: String) = TableConfig(
      name = n, keyField = "k", orderingField = "ts", numBuckets = 2)
    val src = GraftTable.create(spark, s"$root/src", c("sink_src"))
    val dst = GraftTable.create(spark, s"$root/dst", c("sink_dst"))
    src.insert(Seq(("a", 1L, 10.0), ("b", 1L, 20.0)).toDF("k", "ts", "v"))
    // the SAME replication pipeline as the foreachBatch test, but the
    // sink side is the engine's own DSv2 streaming write — per-epoch
    // atomic upsert commits stamped (queryId, epoch) on the timeline
    val q = spark.readStream.format("graft-stream")
      .option("path", s"$root/src").load()
      .select("k", "ts", "v")
      .writeStream.outputMode("append").format("graft-stream")
      .option("path", s"$root/dst")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      q.processAllAvailable()
      src.upsert(Seq(("a", 2L, 11.0), ("c", 1L, 30.0)).toDF("k", "ts", "v"))
      q.processAllAvailable()
      val got = dst.read().select("k", "ts", "v")
        .as[(String, Long, Double)].collect().sortBy(_._1)
      assert(got.toSeq == Seq(("a", 2L, 11.0), ("b", 1L, 20.0), ("c", 1L, 30.0)))
      // every sink commit is epoch-stamped, epochs strictly increase
      val epochs = dst.log.commits()
        .flatMap(_.extra.get(GraftStreamingWrite.EpochKey)).map(_.toLong)
      assert(epochs.nonEmpty && epochs == epochs.sorted.distinct)
      // staging is cleaned after each epoch commit
      val staging = Paths.get(s"$root/dst", GraftStreamingWrite.StagingDir)
      assert(!Files.exists(staging) ||
        Files.list(staging).iterator().asScala.forall(qd =>
          !Files.list(qd).iterator().asScala.hasNext))
    } finally q.stop()
  }

  test("streaming sink epoch re-commit is idempotent (exactly-once timeline)") {
    import graft.core.{GraftTable, TableConfig}
    import graft.sql.{GraftStagedFiles, GraftStreamingWrite}
    val root = tmp()
    val dst = GraftTable.create(spark, s"$root/t", TableConfig(
      name = "idem", keyField = "k", orderingField = "ts", numBuckets = 1))
    val rows = Seq(("a", 1L, 10.0), ("b", 1L, 20.0)).toDF("k", "ts", "v")
    // stage a batch the way executors would, then drive commit() twice
    // with the same epoch — the retry-after-crash window
    val staged = s"$root/staged"
    rows.coalesce(1).write.parquet(staged)
    val files = Files.list(Paths.get(staged)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    val w = new GraftStreamingWrite(s"$root/t", "q-idem", rows.schema)
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(GraftStagedFiles(files))
    w.commit(0L, msgs)
    val commitsAfterFirst = dst.log.commits().size
    w.commit(0L, msgs) // replayed epoch: must be a no-op
    assert(dst.log.commits().size == commitsAfterFirst)
    assert(dst.read().count() == 2)
    // a LATER epoch from the same query still lands
    w.commit(1L, Array(GraftStagedFiles(files)))
    assert(dst.log.commits().size == commitsAfterFirst + 1)
    assert(dst.read().count() == 2) // same keys — upsert, not append
  }

  test("streaming sink survives a query restart from checkpoint") {
    import graft.core.{GraftTable, TableConfig}
    val root = tmp()
    def c(n: String) = TableConfig(
      name = n, keyField = "k", orderingField = "ts", numBuckets = 2)
    val src = GraftTable.create(spark, s"$root/src", c("rs_src"))
    val dst = GraftTable.create(spark, s"$root/dst", c("rs_dst"))
    def start() = spark.readStream.format("graft-stream")
      .option("path", s"$root/src").load()
      .select("k", "ts", "v")
      .writeStream.outputMode("append").format("graft-stream")
      .option("path", s"$root/dst")
      .option("checkpointLocation", s"$root/ckpt").start()
    src.insert(Seq(("a", 1L, 10.0)).toDF("k", "ts", "v"))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    val commitsAfterQ1 = dst.log.commits().size
    // restart from the SAME checkpoint: the replayed source offset must
    // not re-commit into the sink, and new source commits must flow
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(dst.log.commits().size == commitsAfterQ1) // no replay commit
      src.upsert(Seq(("a", 2L, 11.0), ("b", 1L, 20.0)).toDF("k", "ts", "v"))
      q2.processAllAvailable()
      assert(q2.exception.isEmpty)
    } finally q2.stop()
    val got = dst.read().select("k", "ts", "v")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 11.0), ("b", 1L, 20.0)))
  }

  test("gap sessionization closes idle sessions on event-time advance") {
    val in = tmp()
    // user 7: two events 10s apart (one session), then 40 min idle
    writeJson(in, "b1.json",
      """{"ts":"2024-01-01 10:00:00","user_id":7,"value":1.0}""",
      """{"ts":"2024-01-01 10:00:10","user_id":7,"value":2.0}""")
    val stream = spark.readStream.schema(schema).json(in)
      .select($"user_id".as("userId"), $"ts", $"value").as[SessionEvent]
    val q = StreamOps.sessionizeByGap(stream).writeStream
      .outputMode("append").format("memory").queryName("gap_out").start()
    try {
      q.processAllAvailable()
      // nothing closed yet: no event time has passed 10:00:10 + 30min
      assert(spark.table("gap_out").isEmpty)
      // another user's event advances the watermark past the gap —
      // user 7 has NO new data, so the close comes from the event-time
      // TIMEOUT, not from a row for that key
      writeJson(in, "b2.json",
        """{"ts":"2024-01-01 11:30:00","user_id":9,"value":5.0}""")
      q.processAllAvailable()
      val rows = spark.sql(
        "select userId, nEvents, totalValue from gap_out")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((7L, 2L, 3.0)))
    } finally q.stop()
  }

  test("drained gap sessions equal the batch q22 answer on real events") {
    import graft.{Queries, Tables}
    val sf = "/root/testdata/sf0.001"
    // µs ride as LONGS through the JSON files: Spark's default JSON
    // timestamp format truncates to millis, which would break the
    // exact-µs equivalence with the batch twin
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", expr("ts DIV 1000").as("ts_us"), $"value")
    // split by GLOBAL event time so batch 2 is never late vs batch 1
    val cut = ev.agg(expr("percentile_approx(ts_us, 0.5)")).head().getLong(0)
    val in = tmp()
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val rows = df.toJSON.collect()
      writeJson(in, name, rows.toIndexedSeq: _*)
    }
    dump(ev.filter($"ts_us" <= cut), "b1.json")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("value", DoubleType))))
      .json(in)
      .select($"user_id".as("userId"),
        expr("timestamp_micros(ts_us)").as("ts"), $"value").as[SessionEvent]
    val q = StreamOps.sessionizeByGap(stream).writeStream
      .outputMode("append").format("memory").queryName("gap22_out").start()
    try {
      q.processAllAvailable()
      dump(ev.filter($"ts_us" > cut), "b2.json")
      q.processAllAvailable()
      // sentinel far past every session's close drains the state
      writeJson(in, "b3.json",
        """{"ts_us":1893456000000000,"user_id":-1,"value":0.0}""")
      q.processAllAvailable()
      val streamed = spark.sql(
        "select userId, nEvents, startUs, endUs from gap22_out where userId >= 0")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val batch = Queries.q22Sessionize(spark, sf)
        .select($"user_id", $"n_events", $"start_us", $"end_us")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization emits running session state") {
    val in = tmp()
    writeJson(in, "b1.json",
      """{"ts":"2024-01-01 10:00:00","user_id":7,"value":1.5}""",
      """{"ts":"2024-01-01 10:00:10","user_id":7,"value":2.5}""",
      """{"ts":"2024-01-01 10:00:20","user_id":8,"value":10.0}""")
    val stream = spark.readStream.schema(schema).json(in)
      .select($"user_id", $"value").as[(Long, Double)]
    val sessions = StreamOps.sessionize(stream, closeAtValue = 10.0)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "select userId, nEvents, totalValue, closed from sess_out order by userId")
        .as[(Long, Long, Double, Boolean)].collect()
      assert(rows.contains((7L, 2L, 4.0, false)))   // open session
      assert(rows.contains((8L, 1L, 10.0, true)))   // closed at budget
    } finally q.stop()
  }
}
