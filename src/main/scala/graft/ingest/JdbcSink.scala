package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** JDBC sink (S13 — the ClickHouse-connect analog, reference
  * mysql-debezium/kafka/connect/thirdparty/kafka_connect_clickhouse
  * .json:4-23: topic → table map, at-least-once `exactlyOnce: false`).
  *
  * Streaming path: foreachBatch append per micro-batch — the same
  * at-least-once contract as the reference connector; dedup belongs
  * in the target (or upstream keyed upsert).
  */
object JdbcSink {

  def write(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit = {
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    df.write.mode("append").jdbc(url, table, props)
  }

  def streamInto(stream: DataFrame, url: String, table: String,
      checkpointDir: String,
      options: Map[String, String] = Map.empty): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) write(batch, url, table, options)
      }
      .start()
}
