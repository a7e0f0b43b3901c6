package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka ingestion wiring (S1 — the reference's primary ingest path,
  * kafka-source.properties:24-28: bootstrap servers + topic + schema
  * provider + earliest offsets).
  *
  * The stream is Spark's own `readStream.format("kafka")`; everything
  * graft-specific is the VALUE DECODE, split out as pure
  * DataFrame→DataFrame functions so it is testable on static frames
  * (and identical between batch replay and the live stream). The
  * decoded stream feeds [[Streamer.streamInto]] (foreachBatch upsert)
  * like every other source.
  *
  * The kafka connector jar (spark-sql-kafka) is an external package;
  * [[connectorAvailable]] lets callers and tests degrade explicitly
  * instead of failing at plan time.
  */
object KafkaStream {

  /** Is the kafka DSv2 connector on the classpath? (Spark reports its
    * absence as a dedicated AnalysisException, hence the broad catch.) */
  def connectorAvailable(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("kafka", spark.sessionState.conf)
      true
    } catch { case scala.util.control.NonFatal(_) => false }

  /** The raw kafka stream: (key, value, topic, partition, offset,
    * timestamp) as Spark's kafka source emits them. */
  def reader(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** JSON-value decode (JsonKafkaSource analog): kafka `value` bytes →
    * typed row columns under the declared schema. */
  def decodeJsonValue(kafkaRows: DataFrame, schema: StructType): DataFrame =
    kafkaRows.select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))

  /** Debezium-JSON value decode: kafka `value` bytes → parsed change
    * envelope (before/after/op/ts_ms), ready for [[Debezium.apply]]. */
  def decodeDebeziumValue(kafkaRows: DataFrame, row: StructType): DataFrame =
    Debezium.parse(
      kafkaRows.select(col("value").cast("string").as("json")), "json", row)

  /** Debezium-Avro value decode (register-mysql-avro.json analog):
    * Confluent-framed Avro `value` bytes under a local schema file. */
  def decodeDebeziumAvroValue(kafkaRows: DataFrame, avroSchemaJson: String,
      row: StructType): DataFrame =
    Debezium.parseAvro(kafkaRows, "value", avroSchemaJson, row,
      confluentFramed = true)

  /** Registry-resolved Debezium-Avro decode: each record's writer
    * schema comes from the [[SchemaProvider]] via the Confluent
    * frame's schema id (register-mysql-avro.json:9-13 — the deployed
    * shape: converters point at a registry, topics interleave schema
    * versions). `row` is the target read schema. */
  def decodeDebeziumAvroRegistryValue(kafkaRows: DataFrame,
      provider: SchemaProvider, row: StructType): DataFrame =
    Debezium.parseAvroRegistry(kafkaRows, "value", provider, row)

  /** Registry-resolved Debezium-protobuf decode
    * (register-mysql-protobuf.json:19-22 analog). */
  def decodeDebeziumProtobufRegistryValue(kafkaRows: DataFrame,
      provider: SchemaProvider, row: StructType): DataFrame =
    Debezium.parseProtobufRegistry(kafkaRows, "value", provider, row)

  /** Ready-to-run typed streams. */
  def jsonStream(spark: SparkSession, bootstrapServers: String,
      topic: String, schema: StructType): DataFrame =
    decodeJsonValue(reader(spark, bootstrapServers, topic), schema)

  def debeziumStream(spark: SparkSession, bootstrapServers: String,
      topic: String, row: StructType): DataFrame =
    decodeDebeziumValue(reader(spark, bootstrapServers, topic), row)
}
