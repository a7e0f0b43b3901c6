package graft.ingest

import graft.Session
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-2 ingest: Avro Debezium envelopes (the reference's CDC demos
  * are Avro-first), kafka value-decode functions, and SQL-session
  * incremental consumption. */
class Round2IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-r2i-").toString

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("ts", LongType)))

  private def cfg(name: String) = TableConfig(
    name = name, keyField = "id", orderingField = "ts", numBuckets = 2)

  /** Serialize one envelope with avro-core exactly as a connector
    * would (optionally Confluent-framed). */
  private def avroBytes(schemaJson: String,
      before: Option[(Long, String, Long)], after: Option[(Long, String, Long)],
      op: String, tsMs: Long, framed: Boolean = false): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val rowSch = schema.getField("after").schema().getTypes.get(1)
    def rec(v: (Long, String, Long)): GenericRecord = {
      val r = new GenericData.Record(rowSch)
      r.put("id", v._1); r.put("name", v._2); r.put("ts", v._3); r
    }
    val env = new GenericData.Record(schema)
    env.put("before", before.map(rec).orNull)
    env.put("after", after.map(rec).orNull)
    env.put("op", op)
    env.put("ts_ms", tsMs)
    val out = new java.io.ByteArrayOutputStream()
    if (framed) { out.write(0); out.write(Array[Byte](0, 0, 0, 7)) }
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(env, enc)
    enc.flush()
    out.toByteArray
  }

  test("avro envelope ingestion equals the JSON-envelope result") {
    val avsc = Debezium.avroEnvelopeSchema(rowSchema).toString
    val events = Seq(
      avroBytes(avsc, None, Some((1L, "ada", 10L)), "c", 100L),
      avroBytes(avsc, None, Some((2L, "bob", 10L)), "c", 100L),
      avroBytes(avsc, None, Some((1L, "ada2", 20L)), "u", 200L),
      avroBytes(avsc, Some((2L, "bob", 10L)), None, "d", 300L))
    val raw = events.toDF("value")
    val changes = Debezium.parseAvro(raw, "value", avsc, rowSchema)

    val tAvro = GraftTable.create(spark, tmp(), cfg("cdc_avro"))
    Debezium.apply(tAvro, changes)
    val gotAvro = tAvro.read().select("id", "name", "ts")
      .as[(Long, String, Long)].collect().toSet

    // identical events as JSON envelopes
    val jsons = Seq(
      """{"before":null,"after":{"id":1,"name":"ada","ts":10},"op":"c","ts_ms":100}""",
      """{"before":null,"after":{"id":2,"name":"bob","ts":10},"op":"c","ts_ms":100}""",
      """{"before":null,"after":{"id":1,"name":"ada2","ts":20},"op":"u","ts_ms":200}""",
      """{"before":{"id":2,"name":"bob","ts":10},"after":null,"op":"d","ts_ms":300}""")
    val tJson = GraftTable.create(spark, tmp(), cfg("cdc_json"))
    Debezium.apply(tJson, Debezium.parse(jsons.toDF("json"), "json", rowSchema))
    val gotJson = tJson.read().select("id", "name", "ts")
      .as[(Long, String, Long)].collect().toSet

    assert(gotAvro == gotJson)
    assert(gotAvro == Set((1L, "ada2", 20L)))
  }

  test("confluent-framed avro values decode after stripping the wire prefix") {
    val avsc = Debezium.avroEnvelopeSchema(rowSchema).toString
    val framed = Seq(
      avroBytes(avsc, None, Some((7L, "eve", 5L)), "c", 50L, framed = true))
      .toDF("value")
    val changes = Debezium.parseAvro(framed, "value", avsc, rowSchema,
      confluentFramed = true)
    val after = changes.select("after.id", "after.name")
      .as[(Long, String)].collect().toSeq
    assert(after == Seq((7L, "eve")))
  }

  test("kafka wiring: decode functions work on static frames; connector detection is explicit") {
    // static stand-in for kafka's (key, value) output shape
    val kafkaShaped = Seq(
      ("""k1""".getBytes, """{"id":1,"name":"ada","ts":10}""".getBytes),
      ("""k2""".getBytes, """{"id":2,"name":"bob","ts":20}""".getBytes))
      .toDF("key", "value")
    val rows = KafkaStream.decodeJsonValue(kafkaShaped, rowSchema)
    assert(rows.select("id", "name").as[(Long, String)].collect().toSet ==
      Set((1L, "ada"), (2L, "bob")))

    val dbz = Seq(
      ("k".getBytes,
       """{"before":null,"after":{"id":3,"name":"cy","ts":1},"op":"c","ts_ms":9}""".getBytes))
      .toDF("key", "value")
    val env = KafkaStream.decodeDebeziumValue(dbz, rowSchema)
    assert(env.select("after.id").as[Long].head() == 3L)

    if (!KafkaStream.connectorAvailable(spark)) {
      // the wiring must fail with the standard missing-source error,
      // not silently do something else
      val ex = intercept[Throwable] {
        KafkaStream.jsonStream(spark, "localhost:9092", "t", rowSchema)
      }
      assert(ex.getMessage.toLowerCase.contains("kafka"))
      cancel("spark-sql-kafka connector not on classpath; live-stream path skipped")
    } else {
      val s = KafkaStream.reader(spark, "localhost:9092", "graft_t")
      assert(s.isStreaming && s.columns.contains("value"))
    }
  }

  test("SQL-session incremental consumption equals the API incremental read") {
    import graft.sql.{GraftCatalog, GraftSql}
    val cat = new GraftCatalog(spark, tmp())
    val gsql = new GraftSql(cat)
    val t = cat.createTable(cfg("ev_sqlinc"))
    val c1 = t.insert(Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "name", "ts"))
    t.upsert(Seq((1L, "a2", 20L), (3L, "c", 20L)).toDF("id", "name", "ts"))

    gsql.sql(s"SET graft.ev_sqlinc.consume.mode=INCREMENTAL")
    gsql.sql(s"SET graft.ev_sqlinc.consume.start.instant=$c1")
    val sqlRows = gsql.sql("SELECT id, name, ts FROM ev_sqlinc ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    val apiRows = t.readIncremental(fromExclusive = c1)
      .select("id", "name", "ts").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(sqlRows == apiRows && sqlRows.map(_._1) == Seq(1L, 3L))

    // back to snapshot mode once the conf is cleared
    spark.conf.unset("graft.ev_sqlinc.consume.mode")
    val snap = gsql.sql("SELECT id FROM ev_sqlinc ORDER BY id")
      .as[Long].collect().toSeq
    assert(snap == Seq(1L, 2L, 3L))
  }

  test("streaming CDC apply: envelope file stream drives upserts and deletes") {
    val envDir = graft.util.TempDirs.create("graft-cdc-stream-").toString
    val ckpt = graft.util.TempDirs.create("graft-cdc-ckpt-").toString
    val t = GraftTable.create(spark, tmp(), cfg("cdc_stream"))
    Files.writeString(java.nio.file.Paths.get(envDir, "batch1.json"),
      """{"before":null,"after":{"id":1,"name":"ada","ts":10},"op":"c","ts_ms":100}
        |{"before":null,"after":{"id":2,"name":"bob","ts":10},"op":"c","ts_ms":100}
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(envDir, "batch2.json"),
      """{"before":null,"after":{"id":1,"name":"ada2","ts":20},"op":"u","ts_ms":200}
        |{"before":{"id":2,"name":"bob","ts":10},"after":null,"op":"d","ts_ms":300}
        |""".stripMargin)
    val envelopes = spark.readStream
      .schema(Debezium.envelopeSchema(rowSchema))
      .json(envDir)
    val q = Streamer.streamCdcInto(t, envelopes, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = t.read().select("id", "name").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "ada2")))
  }

  test("vector-index table service: build once per snapshot, query off the index") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "vecs", keyField = "vec_id", orderingField = "vec_id", numBuckets = 2))
    t.bulkInsert(embs.select("vec_id", "embedding"))
    val path = graft.core.TableServices.buildVectorIndex(t, "vec_id", "embedding", nLists = 8)
    val stamp = java.nio.file.Paths.get(path, "instant.stamp")
    val m1 = Files.getLastModifiedTime(stamp)
    // same snapshot → service is a no-op
    graft.core.TableServices.buildVectorIndex(t, "vec_id", "embedding", nLists = 8)
    assert(Files.getLastModifiedTime(stamp) == m1)
    // full-probe query off the index == brute force over the table
    val queries = t.read().filter($"vec_id" < 5).select("vec_id", "embedding")
    val exact = graft.operators.Similarity.bruteForceTopK(
      t.read().select("vec_id", "embedding"), queries, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val viaIndex = graft.operators.IvfIndex.topK(spark, path, queries,
      "vec_id", "embedding", k = 3, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaIndex == exact)
    // table advances → stale → rebuild on next service run
    t.upsert(embs.limit(1).select("vec_id", "embedding"))
    graft.core.TableServices.buildVectorIndex(t, "vec_id", "embedding", nLists = 8)
    assert(Files.getLastModifiedTime(stamp) != m1)
  }

  test("CDC tombstone validation reads a pruned key range, not the whole table") {
    val t = GraftTable.create(spark, tmp(), TableConfig(
      name = "cdc_prune", keyField = "id", orderingField = "ts", numBuckets = 4))
    t.bulkInsert((1L to 100L).map(i => (i, s"n$i", 10L)).toDF("id", "name", "ts"))
    // delete one key; the probe must not need a full scan to validate
    val avsc = Debezium.avroEnvelopeSchema(rowSchema).toString
    val del = Seq(avroBytes(avsc, Some((5L, "n5", 10L)), None, "d", 99L)).toDF("value")
    Debezium.apply(t, Debezium.parseAvro(del, "value", avsc, rowSchema))
    assert(t.read().filter($"id" === 5L).count() == 0)
    assert(t.read().count() == 99)
  }
}
