package graft.ingest

import graft.Session
import graft.core.{GraftTable, TableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-4 ingest: protobuf Debezium envelopes (reference
  * mysql-debezium/register-mysql-protobuf.json:19-22). The test
  * encoder writes the public protobuf wire format by hand — the same
  * bytes protoc-generated code would emit for the contract schema. */
class Round4IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(): String = graft.util.TempDirs.create("graft-r4i-").toString

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("ts", LongType)))

  private def cfg(name: String) = TableConfig(
    name = name, keyField = "id", orderingField = "ts", numBuckets = 2)

  // ---- minimal wire-format encoder (what protoc-generated code emits)

  private def varint(v: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var x = v
    while ((x & ~0x7FL) != 0) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
    out.toByteArray
  }
  private def key(field: Int, wire: Int): Array[Byte] = varint((field << 3) | wire)
  private def lenDelim(field: Int, payload: Array[Byte]): Array[Byte] =
    key(field, 2) ++ varint(payload.length) ++ payload
  private def rowMsg(v: (Long, String, Long)): Array[Byte] =
    key(1, 0) ++ varint(v._1) ++
      lenDelim(2, v._2.getBytes("UTF-8")) ++
      key(3, 0) ++ varint(v._3)

  private def protoBytes(before: Option[(Long, String, Long)],
      after: Option[(Long, String, Long)], op: String, tsMs: Long,
      framed: Boolean = false, extraField: Boolean = false): Array[Byte] = {
    var body = Array.empty[Byte]
    before.foreach(b => body ++= lenDelim(1, rowMsg(b)))
    after.foreach(a => body ++= lenDelim(2, rowMsg(a)))
    body ++= lenDelim(3, op.getBytes("UTF-8"))
    body ++= key(4, 0) ++ varint(tsMs)
    if (extraField) // a `source`-style submessage the decoder must skip
      body ++= lenDelim(7, lenDelim(1, "mysql".getBytes("UTF-8")))
    if (framed) Array[Byte](0, 0, 0, 0, 9) ++ Array[Byte](0) ++ body
    else body
  }

  test("protobuf envelope ingestion equals the JSON-envelope result") {
    val events = Seq(
      protoBytes(None, Some((1L, "ada", 10L)), "c", 100L),
      protoBytes(None, Some((2L, "bob", 10L)), "c", 100L),
      protoBytes(None, Some((1L, "ada2", 20L)), "u", 200L, extraField = true),
      protoBytes(Some((2L, "bob", 10L)), None, "d", 300L))
    val changes = Debezium.parseProtobuf(events.toDF("value"), "value", rowSchema)

    val tProto = GraftTable.create(spark, tmp(), cfg("cdc_proto"))
    Debezium.apply(tProto, changes)
    val gotProto = tProto.read().select("id", "name", "ts")
      .as[(Long, String, Long)].collect().toSet

    val jsons = Seq(
      """{"before":null,"after":{"id":1,"name":"ada","ts":10},"op":"c","ts_ms":100}""",
      """{"before":null,"after":{"id":2,"name":"bob","ts":10},"op":"c","ts_ms":100}""",
      """{"before":null,"after":{"id":1,"name":"ada2","ts":20},"op":"u","ts_ms":200}""",
      """{"before":{"id":2,"name":"bob","ts":10},"after":null,"op":"d","ts_ms":300}""")
    val tJson = GraftTable.create(spark, tmp(), cfg("cdc_pjson"))
    Debezium.apply(tJson, Debezium.parse(jsons.toDF("json"), "json", rowSchema))
    val gotJson = tJson.read().select("id", "name", "ts")
      .as[(Long, String, Long)].collect().toSet

    assert(gotProto == gotJson)
    assert(gotProto == Set((1L, "ada2", 20L)))
  }

  test("confluent-framed protobuf values decode after stripping the message-indexes path") {
    // single-0 optimized frame (message indexes [0])
    val framed = Seq(
      protoBytes(None, Some((7L, "eve", 5L)), "c", 50L, framed = true))
      .toDF("value")
    val changes = Debezium.parseProtobuf(framed, "value", rowSchema,
      confluentFramed = true)
    assert(changes.select("after.id", "after.name")
      .as[(Long, String)].collect().toSeq == Seq((7L, "eve")))

    // explicit zigzag index path: count=2 (zigzag 4), indexes 1,0
    val body = protoBytes(None, Some((8L, "kim", 6L)), "c", 60L)
    val deepFrame = Array[Byte](0, 0, 0, 0, 9, 4, 2, 0) ++ body
    val changes2 = Debezium.parseProtobuf(Seq(deepFrame).toDF("value"),
      "value", rowSchema, confluentFramed = true)
    assert(changes2.select("after.name").as[String].head() == "kim")
  }

  test("float/double/bool scalar fields survive the wire round-trip") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("ratio", FloatType), StructField("ok", BooleanType)))
    def fixed64(field: Int, v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      key(field, 1) ++ (0 until 8).map(i => ((bits >>> (8 * i)) & 0xFF).toByte)
    }
    def fixed32(field: Int, v: Float): Array[Byte] = {
      val bits = java.lang.Float.floatToIntBits(v)
      key(field, 5) ++ (0 until 4).map(i => ((bits >>> (8 * i)) & 0xFF).toByte)
    }
    val row = key(1, 0) ++ varint(3L) ++ fixed64(2, 0.75) ++
      fixed32(3, 0.5f) ++ key(4, 0) ++ varint(1L)
    val env = lenDelim(2, row) ++ lenDelim(3, "c".getBytes) ++
      key(4, 0) ++ varint(10L)
    val changes = Debezium.parseProtobuf(Seq(env).toDF("value"), "value", schema)
    val got = changes.select("after.id", "after.score", "after.ratio", "after.ok")
      .as[(Long, Double, Float, Boolean)].head()
    assert(got == ((3L, 0.75, 0.5f, true)))
  }

  test("elided zero-valued scalars decode as proto3 zeros, not null") {
    // canonical serializers (protoc, Confluent's ProtobufConverter for
    // non-optional fields) omit zero-valued scalars from the wire: an
    // after-row carrying only `name` means id=0, ts=0 — not null
    val onlyName = lenDelim(2, lenDelim(2, "zed".getBytes("UTF-8"))) ++
      lenDelim(3, "c".getBytes) ++ key(4, 0) ++ varint(10L)
    val d = ProtobufEnvelope.decode(onlyName, 0, onlyName.length, rowSchema)
    assert(d.after.toSeq == Seq(0L, "zed", 0L))

    // an entirely-empty row message is the all-zeros row
    val emptyRow = lenDelim(2, Array.empty[Byte]) ++
      lenDelim(3, "c".getBytes) ++ key(4, 0) ++ varint(10L)
    val d2 = ProtobufEnvelope.decode(emptyRow, 0, emptyRow.length, rowSchema)
    assert(d2.after.toSeq == Seq(0L, "", 0L))

    // double/float/bool zeros too
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("ratio", FloatType), StructField("ok", BooleanType)))
    val env = lenDelim(2, Array.empty[Byte]) ++ lenDelim(3, "c".getBytes) ++
      key(4, 0) ++ varint(10L)
    val d3 = ProtobufEnvelope.decode(env, 0, env.length, schema)
    assert(d3.after.toSeq == Seq(0L, 0.0d, 0.0f, false))
  }

  test("malformed length varints fail loudly instead of corrupting the cursor") {
    // length pointing past the buffer
    val overrun = key(3, 2) ++ varint(1000L) ++ "c".getBytes
    val e1 = intercept[IllegalArgumentException] {
      ProtobufEnvelope.decode(overrun, 0, overrun.length, rowSchema)
    }
    assert(e1.getMessage.contains("malformed protobuf length"))

    // varint that decodes to a negative Int (cursor would move backward)
    val negative = key(3, 2) ++ varint(0xFFFFFFFFL) ++ "c".getBytes
    intercept[IllegalArgumentException] {
      ProtobufEnvelope.decode(negative, 0, negative.length, rowSchema)
    }

    // truncated fixed64 in a skipped unknown field
    val truncated = key(9, 1) ++ Array[Byte](1, 2, 3)
    intercept[IllegalArgumentException] {
      ProtobufEnvelope.decode(truncated, 0, truncated.length, rowSchema)
    }
  }

  test("protoSchemaText renders the registered contract shape") {
    val txt = ProtobufEnvelope.protoSchemaText(rowSchema)
    assert(txt.contains("int64 id = 1;") && txt.contains("string name = 2;"))
    assert(txt.contains("Row before = 1;") && txt.contains("int64 ts_ms = 4;"))
  }
}
