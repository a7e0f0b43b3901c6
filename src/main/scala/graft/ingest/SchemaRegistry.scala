package graft.ingest

import org.apache.spark.sql.types._

/** Schema-Registry client analog (SURVEY.md §2.1 S6).
  *
  * The reference's CDC connectors are registry-backed: every Avro and
  * protobuf registration points the converters at a registry URL
  * (mysql-debezium/register-mysql-avro.json:9-13,
  * register-mysql-protobuf.json:19-22), and each Kafka record carries
  * a Confluent wire frame — magic byte 0 + 4-byte big-endian schema id
  * — that the consumer resolves to the WRITER schema before decoding.
  * [[SchemaProvider]] is that resolution step: id → schema text. Two
  * impls mirror the two deployment shapes — a shared-storage directory
  * of `<id>.<ext>` files, and an HTTP client speaking the registry's
  * public REST contract (`GET /schemas/ids/{id}` →
  * `{"schema": "<text>"}`).
  *
  * Providers are used inside `mapPartitions` decoders, so they are
  * Serializable and cache resolved ids in a transient per-JVM map: a
  * 100 TB backfill resolves each distinct schema id once per executor,
  * not once per record.
  */
trait SchemaProvider extends Serializable {
  /** Resolve a registry schema id to its schema text (Avro `.avsc`
    * JSON or proto3 text, per the topic's converter). */
  def schemaById(id: Int): String
}

object SchemaProvider {

  /** The Confluent wire frame's schema id: magic byte 0, then a 4-byte
    * big-endian id (the frame [[ProtobufEnvelope.stripConfluentFrame]]
    * and the Avro decode path otherwise skip over). */
  def confluentSchemaId(bytes: Array[Byte]): Int = {
    require(bytes.length > 5 && bytes(0) == 0, "not a Confluent-framed value")
    ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
      ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
  }

  /** Render the Confluent wire frame for a schema id (test/producer
    * side): magic 0 + 4-byte BE id. Avro payloads follow directly;
    * protobuf payloads additionally carry a message-indexes path. */
  def confluentFrame(id: Int): Array[Byte] =
    Array[Byte](0, (id >>> 24).toByte, (id >>> 16).toByte,
      (id >>> 8).toByte, id.toByte)
}

/** Shared-storage registry: schema id `n` lives at `<dir>/<n>.<ext>`.
  * The deployment shape where schemas ship with the job (an `.avsc`
  * directory on DFS) rather than behind a service. */
final class FileSchemaProvider(dir: String, ext: String = "avsc")
    extends SchemaProvider {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  override def schemaById(id: Int): String =
    cache.computeIfAbsent(id, _ => {
      val p = java.nio.file.Paths.get(dir, s"$id.$ext")
      require(java.nio.file.Files.exists(p), s"schema id $id not found at $p")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    })
}

/** HTTP registry client: the public Confluent REST contract,
  * `GET {base}/schemas/ids/{id}` → `{"schema": "<schema text>"}`.
  * Resolution happens lazily on executors and is cached per JVM. */
final class HttpSchemaProvider(baseUrl: String, timeoutMs: Int = 10000)
    extends SchemaProvider {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  override def schemaById(id: Int): String =
    cache.computeIfAbsent(id, _ => fetch(id))

  private def fetch(id: Int): String = {
    val url = java.net.URI.create(s"$baseUrl/schemas/ids/$id").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestProperty("Accept",
      "application/vnd.schemaregistry.v1+json, application/json")
    val code = conn.getResponseCode
    require(code == 200, s"schema registry returned $code for id $id")
    val body = try {
      val in = conn.getInputStream
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } finally conn.disconnect()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val schema = node.get("schema")
    require(schema != null && schema.isTextual,
      s"malformed registry response for id $id: $body")
    schema.asText()
  }
}

/** Proto3 schema-text → row StructType: the registry serves proto text
  * for protobuf subjects, and the wire decoder
  * ([[ProtobufEnvelope.decode]]) needs the WRITER's field order/types
  * to interpret field numbers. Parses exactly the envelope subset
  * [[ProtobufEnvelope.protoSchemaText]] renders — a `message Row`
  * whose fields are scalar `type name = N;` declarations, numbered in
  * declaration order.
  */
object ProtoSchemaText {

  private val fieldRe =
    """^\s*(?:optional\s+)?(string|int64|int32|double|float|bool)\s+(\w+)\s*=\s*(\d+)\s*;""".r

  private def sparkType(t: String): DataType = t match {
    case "string" => StringType
    case "int64" => LongType
    case "int32" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "bool" => BooleanType
    case other => throw new IllegalArgumentException(
      s"unsupported proto scalar type $other")
  }

  /** Extract `messageName`'s scalar fields as a StructType, ordered by
    * field number (the decoder's positional contract). */
  def rowSchema(protoText: String, messageName: String = "Row"): StructType = {
    val body = messageBody(protoText, messageName)
    val fields = body.linesIterator.flatMap {
      case fieldRe(t, name, num) => Some((num.toInt, StructField(name, sparkType(t))))
      case _ => None
    }.toSeq.sortBy(_._1)
    require(fields.nonEmpty, s"no scalar fields found in message $messageName")
    require(fields.map(_._1) == (1 to fields.length),
      s"message $messageName field numbers must be contiguous 1..n " +
        s"(got ${fields.map(_._1).mkString(",")}): the positional wire " +
        "contract has no holes")
    StructType(fields.map(_._2))
  }

  private def messageBody(text: String, name: String): String = {
    // word-boundary match: a prefix search for "message Row" would
    // land on "message RowKey" and parse the wrong struct
    val m = java.util.regex.Pattern
      .compile("message\\s+" + java.util.regex.Pattern.quote(name) + "\\b")
      .matcher(text)
    require(m.find(), s"message $name not found in proto text")
    val start = m.start()
    val open = text.indexOf('{', start)
    require(open >= 0, s"malformed proto text: no body for message $name")
    var depth = 1
    var i = open + 1
    while (i < text.length && depth > 0) {
      text.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, s"malformed proto text: unbalanced braces in $name")
    text.substring(open + 1, i - 1)
  }
}
