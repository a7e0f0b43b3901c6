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
        // persist: isEmpty and the JDBC write would otherwise each
        // re-plan the micro-batch (a Kafka source re-fetches the
        // offset range per action) — same reason streamIntoRouted
        // caches its batch
        val cached = batch.persist()
        try { if (!cached.isEmpty) write(cached, url, table, options) }
        finally { cached.unpersist(); () }
      }
      .start()

  /** Parse the connector's `topic2TableMap` string form
    * (`"topicA=tableA,topicB=tableB"`,
    * kafka_connect_clickhouse.json:20). */
  def parseTopic2TableMap(s: String): Map[String, String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        // BOTH sides must be non-empty: '=tableA' would route the
        // empty-string topic (matching nothing, silently starving the
        // table) instead of failing loudly like other bad entries
        case Array(t, tbl) if t.trim.nonEmpty && tbl.trim.nonEmpty =>
          t.trim -> tbl.trim
        case _ => throw new IllegalArgumentException(
          s"bad topic2TableMap entry '$kv' (want topic=table)")
      }
    }.toSeq match {
      case entries =>
        val dups = entries.groupBy(_._1).filter(_._2.size > 1).keys
        require(dups.isEmpty,
          s"topic2TableMap routes topic(s) ${dups.mkString(", ")} twice — " +
          "a duplicate would silently last-win")
        entries.toMap
    }

  /** Multi-topic routing — the connector's `topic2TableMap`
    * (kafka_connect_clickhouse.json:4-23): ONE streaming sink fans a
    * mixed-topic stream out to its per-topic JDBC tables. The topic
    * rides in `topicCol` (Kafka sources expose it as `topic`); rows
    * whose topic has no mapping are ignored, mirroring the connector,
    * which only subscribes to the topics it routes. Each micro-batch
    * is persisted once and filtered per target — the per-table scans
    * share the cached batch instead of re-reading the source. Same
    * at-least-once contract as [[streamInto]]. */
  def streamIntoRouted(stream: DataFrame, url: String, topicCol: String,
      topic2Table: Map[String, String], checkpointDir: String,
      options: Map[String, String] = Map.empty): StreamingQuery = {
    require(topic2Table.nonEmpty, "topic2TableMap is empty")
    import org.apache.spark.sql.functions.col
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.persist()
          try topic2Table.foreach { case (topic, table) =>
            val rows = b.filter(col(topicCol) === topic).drop(topicCol)
            if (!rows.isEmpty) write(rows, url, table, options)
          } finally { b.unpersist(); () }
        }
      }
      .start()
  }
}
