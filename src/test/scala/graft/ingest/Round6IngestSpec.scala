package graft.ingest

import graft.Session
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-6 ingest: Schema-Registry client analog. The reference's CDC
  * registrations all point the converters at a registry
  * (mysql-debezium/register-mysql-avro.json:9-13,
  * register-mysql-protobuf.json:19-22); these cases prove the schema
  * id in each record's Confluent frame resolves to that record's
  * WRITER schema — two ids in one stream decode under two different
  * row schemas — via both provider shapes (HTTP REST mock, shared
  * file directory). */
class Round6IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private val rowV1 = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("ts", LongType)))
  private val rowV2 = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("ts", LongType), StructField("email", StringType)))

  // ---- avro producer side (what a registry-backed connector emits) ---

  private def avroEnvelope(avsc: String, schemaId: Int,
      fields: Map[String, Any], op: String, tsMs: Long): Array[Byte] = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(avsc)
    val rowSch = schema.getField("after").schema().getTypes.get(1)
    val r = new GenericData.Record(rowSch)
    fields.foreach { case (k, v) => r.put(k, v) }
    val env = new GenericData.Record(schema)
    env.put("before", null)
    env.put("after", r)
    env.put("op", op)
    env.put("ts_ms", tsMs)
    val out = new java.io.ByteArrayOutputStream()
    out.write(SchemaProvider.confluentFrame(schemaId))
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(env, enc)
    enc.flush()
    out.toByteArray
  }

  test("confluent frame schema id round-trips") {
    val framed = SchemaProvider.confluentFrame(123456) ++ Array[Byte](9, 9)
    assert(SchemaProvider.confluentSchemaId(framed) == 123456)
    intercept[IllegalArgumentException] {
      SchemaProvider.confluentSchemaId(Array[Byte](1, 0, 0, 0, 1, 0))
    }
  }

  test("HTTP registry: two schema ids resolve to two avro row schemas in one stream") {
    val v1Avsc = Debezium.avroEnvelopeSchema(rowV1).toString
    val v2Avsc = Debezium.avroEnvelopeSchema(rowV2).toString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def registryBody(avsc: String): String = {
      val node = mapper.createObjectNode()
      node.put("schema", avsc)
      mapper.writeValueAsString(node)
    }

    // in-process mock speaking the public REST contract
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val served = Map(1 -> registryBody(v1Avsc), 2 -> registryBody(v2Avsc))
    server.createContext("/schemas/ids/", exch => {
      val id = exch.getRequestURI.getPath.split("/").last.toInt
      served.get(id) match {
        case Some(body) =>
          val bytes = body.getBytes("UTF-8")
          exch.getResponseHeaders.add("Content-Type",
            "application/vnd.schemaregistry.v1+json")
          exch.sendResponseHeaders(200, bytes.length)
          exch.getResponseBody.write(bytes)
        case None => exch.sendResponseHeaders(404, -1)
      }
      exch.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // interleaved writer versions, the registry's raison d'être
      val records = Seq(
        avroEnvelope(v1Avsc, 1, Map("id" -> 1L, "name" -> "ada", "ts" -> 10L), "c", 100L),
        avroEnvelope(v2Avsc, 2, Map("id" -> 2L, "name" -> "bob", "ts" -> 20L,
          "email" -> "bob@x.io"), "c", 200L),
        avroEnvelope(v1Avsc, 1, Map("id" -> 3L, "name" -> "cy", "ts" -> 30L), "c", 300L))
      val changes = Debezium.parseAvroRegistry(records.toDF("value"), "value",
        new HttpSchemaProvider(base), rowV2)
      val got = changes
        .select("after.id", "after.name", "after.email")
        .as[(Long, String, Option[String])].collect().toSet
      assert(got == Set((1L, "ada", None), (2L, "bob", Some("bob@x.io")),
        (3L, "cy", None)))
    } finally server.stop(0)
  }

  test("HTTP registry: unknown schema id fails loudly") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/",
      exch => { exch.sendResponseHeaders(404, -1); exch.close() })
    server.start()
    try {
      val p = new HttpSchemaProvider(
        s"http://127.0.0.1:${server.getAddress.getPort}")
      val e = intercept[IllegalArgumentException] { p.schemaById(99) }
      assert(e.getMessage.contains("404") && e.getMessage.contains("99"))
    } finally server.stop(0)
  }

  // ---- protobuf producer side ----------------------------------------

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

  /** Confluent-framed protobuf envelope: frame + message-indexes [0] +
    * an after-image row encoded field-by-field. */
  private def protoEnvelope(schemaId: Int, row: Array[Byte], op: String,
      tsMs: Long): Array[Byte] =
    SchemaProvider.confluentFrame(schemaId) ++ Array[Byte](0) ++
      lenDelim(2, row) ++ lenDelim(3, op.getBytes("UTF-8")) ++
      key(4, 0) ++ varint(tsMs)

  test("file registry: two schema ids resolve to two protobuf row schemas in one stream") {
    val dir = graft.util.TempDirs.create("graft-reg-").toString
    Files.writeString(java.nio.file.Paths.get(dir, "1.proto"),
      ProtobufEnvelope.protoSchemaText(rowV1))
    Files.writeString(java.nio.file.Paths.get(dir, "2.proto"),
      ProtobufEnvelope.protoSchemaText(rowV2))

    val rowAda = key(1, 0) ++ varint(1L) ++ // v1: id=1,name=2,ts=3
      lenDelim(2, "ada".getBytes) ++ key(3, 0) ++ varint(10L)
    val rowBob = key(1, 0) ++ varint(2L) ++ // v2: +email=4
      lenDelim(2, "bob".getBytes) ++ key(3, 0) ++ varint(20L) ++
      lenDelim(4, "bob@x.io".getBytes)
    val records = Seq(
      protoEnvelope(1, rowAda, "c", 100L),
      protoEnvelope(2, rowBob, "c", 200L))
    val changes = Debezium.parseProtobufRegistry(records.toDF("value"), "value",
      new FileSchemaProvider(dir, ext = "proto"), rowV2)
    val got = changes
      .select("after.id", "after.name", "after.email")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "ada", None), (2L, "bob", Some("bob@x.io"))))
  }

  test("file registry: missing schema id fails loudly") {
    val dir = graft.util.TempDirs.create("graft-reg-miss-").toString
    val e = intercept[IllegalArgumentException] {
      new FileSchemaProvider(dir).schemaById(5)
    }
    assert(e.getMessage.contains("5"))
  }

  test("kafka-shaped registry decode drives CDC apply across schema versions") {
    import graft.core.{GraftTable, TableConfig}
    val dir = graft.util.TempDirs.create("graft-reg-kafka-").toString
    val v1Avsc = Debezium.avroEnvelopeSchema(rowV1).toString
    val v2Avsc = Debezium.avroEnvelopeSchema(rowV2).toString
    Files.writeString(java.nio.file.Paths.get(dir, "1.avsc"), v1Avsc)
    Files.writeString(java.nio.file.Paths.get(dir, "2.avsc"), v2Avsc)

    // kafka's (key, value) shape: a v1 insert, then a v2 update adding
    // the new column — the registry resolves each record's writer
    val kafkaShaped = Seq(
      ("k1".getBytes, avroEnvelope(v1Avsc, 1,
        Map("id" -> 1L, "name" -> "ada", "ts" -> 10L), "c", 100L)),
      ("k1".getBytes, avroEnvelope(v2Avsc, 2,
        Map("id" -> 1L, "name" -> "ada2", "ts" -> 20L,
            "email" -> "ada@x.io"), "u", 200L)))
      .toDF("key", "value")
    val changes = KafkaStream.decodeDebeziumAvroRegistryValue(
      kafkaShaped, new FileSchemaProvider(dir), rowV2)

    val t = GraftTable.create(spark, graft.util.TempDirs.create("graft-reg-t-").toString,
      TableConfig(name = "cdc_reg", keyField = "id", orderingField = "ts",
        numBuckets = 2))
    Debezium.apply(t, changes)
    val got = t.read().select("id", "name", "email")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "ada2", Some("ada@x.io"))))
  }

  test("property: protoSchemaText ∘ rowSchema is identity over random scalar schemas") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genSchema: Gen[StructType] = for {
      n <- Gen.choose(1, 12)
      types <- Gen.listOfN(n, Gen.oneOf[DataType](
        StringType, LongType, IntegerType, DoubleType, FloatType, BooleanType))
    } yield StructType(types.zipWithIndex.map { case (t, i) =>
      StructField(s"f$i", t)
    })
    (1L to 50L).foreach { seed =>
      val schema = genSchema.apply(Gen.Parameters.default, Seed(seed)).get
      val parsed = ProtoSchemaText.rowSchema(
        ProtobufEnvelope.protoSchemaText(schema))
      // protoSchemaText declares all fields non-null scalars; parsing
      // recovers names, types, and field order exactly
      assert(parsed.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq, s"seed=$seed")
    }
  }

  test("proto schema text parses back to the row StructType, ordered by field number") {
    val parsed = ProtoSchemaText.rowSchema(
      ProtobufEnvelope.protoSchemaText(rowV2))
    assert(parsed == rowV2)

    // declaration order is not trusted: field numbers win
    val shuffled =
      """syntax = "proto3";
        |message Row {
        |  string name = 2;
        |  int64 id = 1;
        |  int64 ts = 3;
        |}
        |message Envelope { Row before = 1; Row after = 2; }""".stripMargin
    assert(ProtoSchemaText.rowSchema(shuffled) == rowV1)

    // non-contiguous numbering violates the positional wire contract
    val holes =
      """message Row {
        |  int64 id = 1;
        |  string name = 5;
        |}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      ProtoSchemaText.rowSchema(holes)
    }
    assert(e.getMessage.contains("contiguous"))
  }
}
