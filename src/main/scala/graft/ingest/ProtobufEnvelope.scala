package graft.ingest

import org.apache.spark.sql.types._

/** Debezium protobuf envelope decoding (SURVEY.md §2.1 S6; reference
  * mysql-debezium/register-mysql-protobuf.json:19-22 registers the
  * ProtobufConverter variant of the same connector).
  *
  * No protobuf runtime ships in this environment, and none is needed:
  * the protobuf wire format is a tiny public spec (a message is a
  * sequence of `key = field_number << 3 | wire_type` varints followed
  * by the field payload; wire types 0 = varint, 1 = fixed64,
  * 2 = length-delimited, 5 = fixed32). This object implements exactly
  * the subset the CDC envelope needs, so the decode stays a
  * dependency-free boundary step — like the Avro path, bytes are
  * decoded once per partition and rows re-enter the typed plan through
  * `from_json`, keeping everything downstream codegen'd.
  *
  * Field-number contract (the shape the protobuf converter generates
  * from the Connect envelope schema, fields numbered in declaration
  * order): envelope `before = 1, after = 2, op = 3, ts_ms = 4`; row
  * messages number their fields 1..n in row-schema order. proto3
  * presence rules: an absent `before`/`after` submessage is null, an
  * absent scalar is its zero value. Unknown field numbers and wire
  * types are skipped, so envelopes carrying extra fields (`source`,
  * `transaction`) decode cleanly.
  */
object ProtobufEnvelope {

  /** Render the proto3 schema text for a row schema — the descriptor a
    * registry would serve for the generated envelope type, kept for
    * interop documentation and tests. */
  def protoSchemaText(row: StructType, messageName: String = "Envelope"): String = {
    def scalarType(dt: DataType): String = dt match {
      case StringType => "string"
      case LongType => "int64"
      case IntegerType => "int32"
      case DoubleType => "double"
      case FloatType => "float"
      case BooleanType => "bool"
      case other => throw new IllegalArgumentException(
        s"unsupported CDC protobuf field type $other")
    }
    val rowFields = row.fields.zipWithIndex.map { case (f, i) =>
      s"  ${scalarType(f.dataType)} ${f.name} = ${i + 1};"
    }.mkString("\n")
    s"""syntax = "proto3";
       |message Row {
       |$rowFields
       |}
       |message $messageName {
       |  Row before = 1;
       |  Row after = 2;
       |  string op = 3;
       |  int64 ts_ms = 4;
       |}""".stripMargin
  }

  // ---- wire-format primitives ---------------------------------------

  private final class Cursor(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
  }

  private def readVarint(c: Cursor): Long = {
    var shift = 0
    var out = 0L
    while (true) {
      require(c.pos < c.end && shift < 64, "malformed protobuf varint")
      val b = c.buf(c.pos)
      c.pos += 1
      out |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return out
      shift += 7
    }
    out // unreachable
  }

  private def readFixed64(c: Cursor): Long = {
    require(c.pos + 8 <= c.end, "truncated fixed64")
    var out = 0L
    var i = 0
    while (i < 8) { out |= (c.buf(c.pos + i) & 0xFFL) << (8 * i); i += 1 }
    c.pos += 8
    out
  }

  private def readFixed32(c: Cursor): Int = {
    require(c.pos + 4 <= c.end, "truncated fixed32")
    var out = 0
    var i = 0
    while (i < 4) { out |= (c.buf(c.pos + i) & 0xFF) << (8 * i); i += 1 }
    c.pos += 4
    out
  }

  /** Read a length-delimited payload length, rejecting negative or
    * buffer-overrunning values — a corrupt varint must fail loudly, not
    * move the cursor backward (infinite loop) or past the buffer. */
  private def readLen(c: Cursor): Int = {
    val len = readVarint(c).toInt
    require(len >= 0 && c.pos + len <= c.end,
      s"malformed protobuf length $len at ${c.pos} (end ${c.end})")
    len
  }

  private def skipField(c: Cursor, wireType: Int): Unit = wireType match {
    case 0 => readVarint(c); ()
    case 1 => require(c.pos + 8 <= c.end, "truncated fixed64"); c.pos += 8
    case 2 => val len = readLen(c); c.pos += len
    case 5 => require(c.pos + 4 <= c.end, "truncated fixed32"); c.pos += 4
    case other => throw new IllegalArgumentException(
      s"unsupported protobuf wire type $other")
  }

  /** proto3 zero value for a scalar field — canonical serializers
    * (protoc, Confluent's ProtobufConverter for non-optional fields)
    * elide zero-valued scalars from the wire, so an absent field means
    * ZERO, not null. Decoding absent as null would silently corrupt
    * legitimate id=0 / value=0.0 / flag=false / '' data. */
  private def zeroValue(dt: DataType): Any = dt match {
    case StringType => ""
    case LongType => 0L
    case IntegerType => 0
    case BooleanType => false
    case DoubleType => 0.0d
    case FloatType => 0.0f
    case other => throw new IllegalArgumentException(
      s"unsupported CDC protobuf field type $other")
  }

  /** Decode one row message into field-position → value (1-based).
    * Fields absent from the wire get their proto3 zero value. */
  private def decodeRow(c: Cursor, row: StructType): Array[Any] = {
    val out = new Array[Any](row.fields.length)
    var i = 0
    while (i < out.length) { out(i) = zeroValue(row.fields(i).dataType); i += 1 }
    while (c.hasMore) {
      val key = readVarint(c)
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      if (field >= 1 && field <= row.fields.length) {
        out(field - 1) = row.fields(field - 1).dataType match {
          case StringType =>
            val len = readLen(c)
            val s = new String(c.buf, c.pos, len, "UTF-8")
            c.pos += len
            s
          case LongType => readVarint(c)
          case IntegerType => readVarint(c).toInt
          case BooleanType => readVarint(c) != 0L
          case DoubleType => java.lang.Double.longBitsToDouble(readFixed64(c))
          case FloatType => java.lang.Float.intBitsToFloat(readFixed32(c))
          case other => throw new IllegalArgumentException(
            s"unsupported CDC protobuf field type $other")
        }
      } else skipField(c, wire)
    }
    out
  }

  /** Decoded envelope: row images as positional values (null = absent
    * submessage), op, ts_ms. */
  final case class Decoded(before: Array[Any], after: Array[Any],
      op: String, tsMs: Long)

  /** Decode one envelope message. `offset`/`length` bound the message
    * inside `bytes` (Confluent frame already stripped by the caller). */
  def decode(bytes: Array[Byte], offset: Int, length: Int,
      row: StructType): Decoded = {
    val c = new Cursor(bytes, offset, offset + length)
    var before: Array[Any] = null
    var after: Array[Any] = null
    var op: String = null
    var tsMs = 0L
    while (c.hasMore) {
      val key = readVarint(c)
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      field match {
        case 1 | 2 =>
          val len = readLen(c)
          val sub = new Cursor(c.buf, c.pos, c.pos + len)
          c.pos += len
          if (field == 1) before = decodeRow(sub, row)
          else after = decodeRow(sub, row)
        case 3 =>
          val len = readLen(c)
          op = new String(c.buf, c.pos, len, "UTF-8")
          c.pos += len
        case 4 => tsMs = readVarint(c)
        case _ => skipField(c, wire)
      }
    }
    Decoded(before, after, op, tsMs)
  }

  /** Strip the Confluent protobuf wire frame: magic byte 0, 4-byte
    * schema id, then the message-indexes path — a ZIGZAG varint count
    * followed by that many zigzag varint indexes (the common
    * single-`0` byte is the optimized encoding of `[0]`). Returns
    * (offset, length) of the protobuf message body. */
  def stripConfluentFrame(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length > 5 && bytes(0) == 0, "not a Confluent-framed value")
    val c = new Cursor(bytes, 5, bytes.length)
    val raw = readVarint(c)
    val count = (raw >>> 1) ^ -(raw & 1) // zigzag decode
    var i = 0L
    while (i < count) { readVarint(c); i += 1 }
    (c.pos, bytes.length - c.pos)
  }
}
