package graft.ingest

import graft.Session
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Ingestion-service semantics: incremental dir sources with durable
  * checkpoints, chained-table incremental source, Debezium envelope
  * application, and the Structured Streaming foreachBatch path —
  * mirrors the reference Streamer flow (README.md:217-243) and the
  * mysql-debezium CDC demos.
  */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-ingest-").toString

  private val tickSchema = StructType(Seq(
    StructField("key", StringType), StructField("symbol", StringType),
    StructField("ts", StringType), StructField("date", StringType),
    StructField("volume", LongType)))

  private def cfg(name: String) = TableConfig(
    name = name, keyField = "key", orderingField = "ts",
    partitionField = Some("date"), numBuckets = 2)

  private def writeJson(dir: String, name: String, rows: String*): Unit =
    Files.write(Paths.get(dir, name),
      rows.mkString("\n").getBytes("UTF-8"))

  test("JsonDirSource: batch-1 then batch-2, checkpoint prevents re-reads") {
    val in = tmp(); val work = tmp()
    writeJson(in, "batch_1.json",
      """{"key":"GOOG_10","symbol":"GOOG","ts":"2018-08-31 10:29:00","date":"2018/08/31","volume":3391}""",
      """{"key":"MSFT_10","symbol":"MSFT","ts":"2018-08-31 10:29:00","date":"2018/08/31","volume":6000}""")
    val t = GraftTable.create(spark, s"$work/t", cfg("st"))
    val src = new JsonDirSource(spark, in, tickSchema, s"$work/ckpt")
    assert(Streamer.runUntilCaughtUp(t, src).size == 1)
    assert(t.read().count() == 2)
    // caught up: no-op
    assert(Streamer.runOnce(t, src).isEmpty)
    // batch 2 updates GOOG
    writeJson(in, "batch_2.json",
      """{"key":"GOOG_10","symbol":"GOOG","ts":"2018-08-31 10:59:00","date":"2018/08/31","volume":9021}""")
    assert(Streamer.runUntilCaughtUp(t, src).size == 1)
    val goog = t.read().filter($"key" === "GOOG_10")
      .select("ts", "volume").as[(String, Long)].head()
    assert(goog == (("2018-08-31 10:59:00", 9021L)))
    assert(t.read().count() == 2)
  }

  test("TableIncrementalSource chains tables (hoodie-incr analog)") {
    val work = tmp()
    val up = GraftTable.create(spark, s"$work/up", cfg("up"))
    val down = GraftTable.create(spark, s"$work/down", cfg("down"))
    up.insert(Seq(("A_1", "A", "t1", "2018/08/31", 1L))
      .toDF("key", "symbol", "ts", "date", "volume"))
    val src = new TableIncrementalSource(up, s"$work/ckpt")
    Streamer.runUntilCaughtUp(down, src)
    assert(down.read().count() == 1)
    up.upsert(Seq(("A_1", "A", "t2", "2018/08/31", 2L), ("B_1", "B", "t1", "2018/08/31", 3L))
      .toDF("key", "symbol", "ts", "date", "volume"))
    Streamer.runUntilCaughtUp(down, src)
    assert(down.read().count() == 2)
    assert(down.read().filter($"key" === "A_1").select("volume").as[Long].head() == 2L)
    // no new upstream commits → caught up
    assert(Streamer.runOnce(down, src).isEmpty)
  }

  test("Debezium envelope apply: create/update/delete + stale-delete drop") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("city", StringType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "customers", keyField = "id", orderingField = "_cdc_ts",
      numBuckets = 2))
    def env(op: String, ts: Long, before: String, after: String): String =
      s"""{"before":$before,"after":$after,"op":"$op","ts_ms":$ts}"""

    val batch1 = Seq(
      env("c", 100, "null", """{"id":1,"name":"ann","city":"berlin"}"""),
      env("c", 101, "null", """{"id":2,"name":"bob","city":"paris"}"""),
      env("u", 102, """{"id":1,"name":"ann","city":"berlin"}""",
        """{"id":1,"name":"ann","city":"munich"}""")).toDF("json")
    Debezium.apply(t, Debezium.parse(batch1, "json", rowSchema))
    assert(t.read().count() == 2)
    assert(t.read().filter($"id" === 1).select("city").as[String].head() == "munich")

    // delete bob; stale delete for ann (ts older than her row) is dropped
    val batch2 = Seq(
      env("d", 103, """{"id":2,"name":"bob","city":"paris"}""", "null"),
      env("d", 50, """{"id":1,"name":"ann","city":"berlin"}""", "null")).toDF("json")
    Debezium.apply(t, Debezium.parse(batch2, "json", rowSchema))
    val left = t.read().select("id").as[Long].collect().toSet
    assert(left == Set(1L))
  }

  test("Debezium: same-key create+update+delete in one batch resolves to latest") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "oneshot", keyField = "id", orderingField = "_cdc_ts", numBuckets = 2))
    val batch = Seq(
      """{"before":null,"after":{"id":7,"v":1},"op":"c","ts_ms":10}""",
      """{"before":{"id":7,"v":1},"after":{"id":7,"v":2},"op":"u","ts_ms":11}""",
      """{"before":{"id":7,"v":2},"after":null,"op":"d","ts_ms":12}""",
      """{"before":null,"after":{"id":8,"v":9},"op":"c","ts_ms":10}""").toDF("json")
    Debezium.apply(t, Debezium.parse(batch, "json", rowSchema))
    assert(t.read().select("id").as[Long].collect().toSet == Set(8L))
  }

  test("Debezium: delete beats update at the same ts_ms (binlog-millisecond tie)") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "tiebreak", keyField = "id", orderingField = "_cdc_ts", numBuckets = 1))
    val batch = Seq(
      """{"before":null,"after":{"id":1,"v":1},"op":"c","ts_ms":10}""",
      // update and delete in the SAME millisecond: the delete must win
      """{"before":{"id":1,"v":1},"after":{"id":1,"v":2},"op":"u","ts_ms":20}""",
      """{"before":{"id":1,"v":2},"after":null,"op":"d","ts_ms":20}""").toDF("json")
    Debezium.apply(t, Debezium.parse(batch, "json", rowSchema))
    assert(t.read().count() == 0, "row deleted in the same ms was resurrected")
  }

  test("Debezium: key-only delete images (null ordering) still delete") {
    val work = tmp()
    // ordering is a ROW column; the delete's before image carries only
    // the key (Postgres default REPLICA IDENTITY shape)
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("ver", LongType),
      StructField("v", StringType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "keyonly", keyField = "id", orderingField = "ver", numBuckets = 1))
    Debezium.apply(t, Debezium.parse(Seq(
      """{"before":null,"after":{"id":1,"ver":5,"v":"x"},"op":"c","ts_ms":10}""")
      .toDF("json"), "json", rowSchema))
    assert(t.read().count() == 1)
    Debezium.apply(t, Debezium.parse(Seq(
      """{"before":{"id":1},"after":null,"op":"d","ts_ms":20}""")
      .toDF("json"), "json", rowSchema))
    assert(t.read().count() == 0, "key-only tombstone was silently dropped")
  }

  test("Debezium: a row schema carrying its own ts_ms column applies cleanly") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts_ms", LongType),
      StructField("v", StringType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "tsms", keyField = "id", orderingField = "_cdc_ts", numBuckets = 1))
    Debezium.apply(t, Debezium.parse(Seq(
      """{"before":null,"after":{"id":1,"ts_ms":777,"v":"a"},"op":"c","ts_ms":10}""")
      .toDF("json"), "json", rowSchema))
    val r = t.read().select("id", "ts_ms", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getString(2)) == ((1L, 777L, "a")))
  }

  test("Mongo Debezium envelope: extended-JSON strings, partial update, key-only delete") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("_id", LongType), StructField("name", StringType),
      StructField("qty", LongType)))
    def mkTable(p: String) = GraftTable.create(spark, s"$work/$p", TableConfig(
      name = p, keyField = "_id", orderingField = "_cdc_ts", numBuckets = 2))
    val mongoT = mkTable("mongo"); val structT = mkTable("structs")

    // after/before ride as extended-JSON STRINGS in the Mongo envelope
    // (register-mongodb.json connector); the key JSON carries _id
    def js(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def env(op: String, ts: Long, after: String, updated: String = null): String = {
      val a = if (after == null) "null" else js(after)
      val ud = if (updated == null) "null"
        else s"""{"updatedFields":${js(updated)},"removedFields":[]}"""
      s"""{"before":null,"after":$a,"updateDescription":$ud,"op":"$op","ts_ms":$ts}"""
    }
    def key(id: Long) = s"""{"id":"$id"}"""

    val batch1 = Seq(
      (env("c", 100,
        """{"_id": {"$numberLong": "1"}, "name": "ann", "qty": {"$numberInt": "5"}}"""),
        key(1)),
      (env("c", 101, """{"_id": 2, "name": "bob", "qty": 7}"""), key(2)),
      (env("u", 102, """{"_id": 1, "name": "ann", "qty": 6}"""), key(1))
    ).toDF("value", "key")
    Debezium.applyMongo(mongoT,
      Debezium.parseMongo(batch1, "value", rowSchema, keyJsonCol = Some("key")))
    assert(mongoT.read().count() == 2)
    assert(mongoT.read().filter($"_id" === 1).select("qty").as[Long].head() == 6L)

    // partial update (no full after image) + key-only delete
    val batch2 = Seq(
      (env("u", 103, null, updated = """{"qty": {"$numberLong": "99"}}"""), key(2)),
      (env("d", 104, null), key(1))
    ).toDF("value", "key")
    Debezium.applyMongo(mongoT,
      Debezium.parseMongo(batch2, "value", rowSchema, keyJsonCol = Some("key")))

    // struct-path parity: the same logical history through the
    // relational envelope must land the same final state
    def senv(op: String, ts: Long, before: String, after: String): String =
      s"""{"before":$before,"after":$after,"op":"$op","ts_ms":$ts}"""
    val structBatch = Seq(
      senv("c", 100, "null", """{"_id":1,"name":"ann","qty":5}"""),
      senv("c", 101, "null", """{"_id":2,"name":"bob","qty":7}"""),
      senv("u", 102, "null", """{"_id":1,"name":"ann","qty":6}"""),
      senv("u", 103, "null", """{"_id":2,"name":"bob","qty":99}"""),
      senv("d", 104, """{"_id":1,"name":"ann","qty":6}""", "null")).toDF("json")
    Debezium.apply(structT, Debezium.parse(structBatch, "json", rowSchema))

    def state(t: GraftTable) = t.read()
      .select("_id", "name", "qty")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(state(mongoT) == Set((2L, "bob", 99L)), state(mongoT).toString)
    assert(state(mongoT) == state(structT))
  }

  test("Mongo update with neither after nor updatedFields is rejected loudly") {
    val rowSchema = StructType(Seq(
      StructField("_id", LongType), StructField("v", StringType)))
    val batch = Seq(
      ("""{"before":null,"after":null,"updateDescription":null,"op":"u","ts_ms":5}""",
       """{"id":"1"}""")).toDF("value", "key")
    val e = intercept[org.apache.spark.SparkException] {
      Debezium.parseMongo(batch, "value", rowSchema, keyJsonCol = Some("key"))
        .collect()
    }
    // silently upserting {_id, null, ...} would wipe the stored doc
    assert(e.getMessage.contains("neither") ||
      Option(e.getCause).exists(_.getMessage.contains("neither")))
  }

  test("Mongo extended-JSON scalars: $oid, $date, $numberDouble round into the row schema") {
    val work = tmp()
    val rowSchema = StructType(Seq(
      StructField("_id", StringType), StructField("seen", LongType),
      StructField("score", DoubleType)))
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "oids", keyField = "_id", orderingField = "_cdc_ts", numBuckets = 1))
    val after = """{"_id": {"$oid": "64a1f2c3d4e5f60718293a4b"}, """ +
      """"seen": {"$date": {"$numberLong": "1692000000000"}}, """ +
      """"score": {"$numberDouble": "0.25"}}"""
    val batch = Seq(
      (s"""{"before":null,"after":"${after.replace("\"", "\\\"")}",""" +
        s""""updateDescription":null,"op":"c","ts_ms":1}""",
       """{"id":"{\"$oid\": \"64a1f2c3d4e5f60718293a4b\"}"}""")
    ).toDF("value", "key")
    Debezium.applyMongo(t,
      Debezium.parseMongo(batch, "value", rowSchema, keyJsonCol = Some("key")))
    val r = t.read().select("_id", "seen", "score").collect().head
    assert(r.getString(0) == "64a1f2c3d4e5f60718293a4b")
    assert(r.getLong(1) == 1692000000000L)
    assert(r.getDouble(2) == 0.25)
  }

  test("CsvDirSource reads header CSVs incrementally") {
    val in = tmp(); val work = tmp()
    Files.write(Paths.get(in, "r1.csv"),
      "key,symbol,ts,date,volume\nA_1,A,t1,2018/08/31,5".getBytes)
    val t = GraftTable.create(spark, s"$work/t", cfg("csv"))
    val src = new CsvDirSource(spark, in, s"$work/ckpt", Some(tickSchema))
    Streamer.runUntilCaughtUp(t, src)
    assert(t.read().count() == 1)
    assert(t.read().select("volume").as[Long].head() == 5L)
  }

  test("transformer hook: derived haversine column during ingestion (target.avsc analog)") {
    import graft.functions.GeoFunctions
    val in = tmp(); val work = tmp()
    val tripSchema = StructType(Seq(
      StructField("_row_key", StringType), StructField("timestamp", LongType),
      StructField("begin_lat", DoubleType), StructField("begin_lon", DoubleType),
      StructField("end_lat", DoubleType), StructField("end_lon", DoubleType)))
    writeJson(in, "trips.json",
      """{"_row_key":"r1","timestamp":1,"begin_lat":52.52,"begin_lon":13.405,"end_lat":48.8566,"end_lon":2.3522}""")
    val t = GraftTable.create(spark, s"$work/t", TableConfig(
      name = "trips", keyField = "_row_key", orderingField = "timestamp",
      numBuckets = 2))
    val src = new JsonDirSource(spark, in, tripSchema, s"$work/ckpt")
    Streamer.runUntilCaughtUp(t, src, transform = df =>
      df.withColumn("haversine_distance", GeoFunctions.haversineDistance(
        col("begin_lat"), col("begin_lon"), col("end_lat"), col("end_lon"))))
    val d = t.read().select("haversine_distance").as[Double].head()
    assert(math.abs(d - 878000) < 10000, s"berlin-paris ~878km, got $d") // known distance
  }

  test("JDBC sink appends micro-batches to a relational target (S13, Derby)") {
    val work = tmp()
    val url = s"jdbc:derby:$work/db;create=true"
    JdbcSink.write(
      Seq((1L, "ann"), (2L, "bob")).toDF("id", "name"), url, "customers")
    JdbcSink.write(Seq((3L, "cid")).toDF("id", "name"), url, "customers")
    val back = spark.read.jdbc(url, "customers", new java.util.Properties())
    assert(back.count() == 3)
    assert(back.select("name").as[String].collect().toSet == Set("ann", "bob", "cid"))
  }

  test("JDBC sink multi-topic routing: topic2TableMap lands each topic in its table") {
    val in = tmp(); val work = tmp()
    val url = s"jdbc:derby:$work/db;create=true"
    val routeSchema = StructType(Seq(
      StructField("topic", StringType), StructField("id", LongType),
      StructField("name", StringType)))
    writeJson(in, "b1.json",
      """{"topic":"dbserver1.inventory.customers","id":1,"name":"ann"}""",
      """{"topic":"dbserver1.inventory.orders","id":10,"name":"o-10"}""",
      """{"topic":"dbserver1.inventory.customers","id":2,"name":"bob"}""",
      """{"topic":"dbserver1.inventory.ignored","id":99,"name":"zzz"}""")
    val routes = JdbcSink.parseTopic2TableMap(
      "dbserver1.inventory.customers=customer, dbserver1.inventory.orders=orders")
    val stream = spark.readStream.schema(routeSchema).json(in)
    val q = JdbcSink.streamIntoRouted(stream, url, "topic", routes, s"$work/ckpt")
    try {
      q.processAllAvailable()
      val props = new java.util.Properties()
      val cust = spark.read.jdbc(url, "customer", props)
      val ord = spark.read.jdbc(url, "orders", props)
      assert(cust.select("name").as[String].collect().toSet == Set("ann", "bob"))
      assert(ord.select("name").as[String].collect().toSet == Set("o-10"))
      // second micro-batch appends (at-least-once contract)
      writeJson(in, "b2.json",
        """{"topic":"dbserver1.inventory.orders","id":11,"name":"o-11"}""")
      q.processAllAvailable()
      assert(spark.read.jdbc(url, "orders", props).count() == 2)
    } finally q.stop()
  }

  test("Structured Streaming foreachBatch upsert (S1 streaming path)") {
    val in = tmp(); val work = tmp()
    writeJson(in, "b1.json",
      """{"key":"K1","symbol":"K","ts":"t1","date":"2018/08/31","volume":1}""")
    val t = GraftTable.create(spark, s"$work/t", cfg("stream"))
    val stream = spark.readStream.schema(tickSchema).json(in)
    val q = Streamer.streamInto(t, stream, s"$work/sckpt")
    try {
      q.processAllAvailable()
      assert(t.read().count() == 1)
      writeJson(in, "b2.json",
        """{"key":"K1","symbol":"K","ts":"t2","date":"2018/08/31","volume":2}""",
        """{"key":"K2","symbol":"K","ts":"t1","date":"2018/08/31","volume":3}""")
      q.processAllAvailable()
      assert(t.read().count() == 2)
      assert(t.read().filter($"key" === "K1").select("volume").as[Long].head() == 2L)
    } finally q.stop()
  }
}
