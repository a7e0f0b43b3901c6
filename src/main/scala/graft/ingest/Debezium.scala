package graft.ingest

import graft.core.GraftTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium CDC envelope ingestion (SURVEY.md §2.1 S6; reference
  * connector configs mysql-debezium/register-mysql-avro.json:4-22,
  * postgres/mongo variants).
  *
  * The wire format is the public Debezium JSON envelope:
  * `{"before": {...}|null, "after": {...}|null, "op": "c|u|d|r",
  *   "ts_ms": ...}` keyed by the table's PK. Application semantics:
  * c/u/r upsert `after`; d deletes `before`'s key. One batch applies
  * as (at most) one upsert commit + one delete commit, ordered so the
  * per-key latest event in the batch wins — the connector's
  * at-least-once delivery composes with keyed latest-wins idempotence.
  */
object Debezium {

  /** Envelope schema for a given row schema. */
  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Parse a DataFrame of raw JSON envelope strings (e.g. a Kafka
    * `value` column) into typed change rows. */
  def parse(raw: DataFrame, jsonCol: String, row: StructType): DataFrame =
    raw.select(from_json(col(jsonCol), envelopeSchema(row)).as("e"))
      .select(col("e.before").as("before"), col("e.after").as("after"),
        col("e.op").as("op"), col("e.ts_ms").as("ts_ms"))

  /** Apply parsed change events to a graft table.
    *
    * Semantics: for each key, the batch's latest event (by ts_ms)
    * decides the action — c/u/r upsert the `after` image, d deletes.
    * A delete is applied only if the table's current row isn't newer
    * than the delete's image (stale tombstones from at-least-once
    * replay are dropped), matching the ordering-respecting merge the
    * rest of the engine uses. If the row schema lacks the table's
    * ordering column, ts_ms is stamped into it so cross-batch binlog
    * order keeps winning. */
  def apply(table: GraftTable, changes: DataFrame): Seq[String] = {
    import org.apache.spark.sql.expressions.Window
    val cfg = table.config
    val rowCols = changes.select(col("after.*")).columns.toSeq
    require(rowCols.contains(cfg.keyField),
      s"CDC row schema lacks key ${cfg.keyField}")

    val imaged = changes.select(
        coalesce(col("after"), col("before")).as("r"),
        col("op"), col("ts_ms"))
      .select(col("r.*") +: Seq(col("op"), col("ts_ms")): _*)
    val withOrd =
      if (rowCols.contains(cfg.orderingField)) imaged
      else imaged.withColumn(cfg.orderingField, col("ts_ms"))

    // one surviving event per key: the latest in the batch
    val keyCols = (cfg.partitionField.toSeq.filter(rowCols.contains) :+
      cfg.keyField).map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("ts_ms").desc, col("op").desc) // d beats u at same ts
    val latest = withOrd
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)

    val dataCols = withOrd.columns.filterNot(Set("op", "ts_ms", "__rn")) ++
      (if (rowCols.contains("ts_ms")) Seq("ts_ms") else Nil)
    val upserts = latest.filter(col("op") =!= "d")
      .select(dataCols.distinct.map(col).toIndexedSeq: _*)
    val deletes = latest.filter(col("op") === "d")
      .select(dataCols.distinct.map(col).toIndexedSeq: _*)

    var commits = List.empty[String]
    if (!upserts.isEmpty) commits ::= table.upsert(upserts)
    if (!deletes.isEmpty) {
      // drop deletes that are older than the current table row
      val idCols = cfg.partitionField.toSeq :+ cfg.keyField
      val cur = table.read().select(
        (idCols.map(col) :+ col(cfg.orderingField).as("__cur_ord")): _*)
      val valid = deletes.join(cur, idCols)
        .filter(col("__cur_ord") <= col(cfg.orderingField))
        .drop("__cur_ord")
      if (!valid.isEmpty) commits ::= table.deleteRows(valid)
    }
    commits.reverse
  }
}
