package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Streamer transformer library — the reference's custom-transformation
  * surface (onehouse-pov/readme.md "ETL/ELT Transformations": the
  * Hudi Streamer `--transformer-class` family) re-expressed as plain
  * `DataFrame => DataFrame` values for [[Streamer]]'s `transform`
  * hook. Three shapes cover the public repertoire:
  *
  *  - [[sql]]: the SqlQueryBasedTransformer analog — an arbitrary SQL
  *    statement over the incoming batch, `<SRC>` standing for it.
  *  - [[flatten]]: the FlatteningTransformer analog — nested structs
  *    flattened to `parent_child` columns, recursively.
  *  - [[chain]]: the ChainedTransformer analog — left-to-right
  *    composition.
  *
  * All three are plan-to-plan: they add Catalyst operators onto the
  * micro-batch's plan, so Spark optimizes the transformer TOGETHER
  * with the source read and the write routing (filters written in the
  * SQL reach the source scan; a flatten is a pure projection) — at
  * 100 TB a transformer costs what its operators cost, never an extra
  * materialization.
  */
object Transformers {

  /** SQL transformer: `query` runs with `<SRC>` bound to the incoming
    * batch (e.g. `SELECT *, ts / 1000 AS ts_ms FROM <SRC> WHERE v > 0`).
    * Analysis resolves the view eagerly, so the temp view is dropped
    * before returning — nothing leaks into the session catalog. */
  def sql(query: String): DataFrame => DataFrame = df => {
    val view = s"graft_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.createOrReplaceTempView(view)
    try df.sparkSession.sql(query.replace("<SRC>", view))
    finally { df.sparkSession.catalog.dropTempView(view); () }
  }

  /** Flattening transformer: every nested struct column unnests to
    * `parent_child` (recursively), non-struct columns pass through in
    * order. A pure projection — codegen folds it into the scan. */
  val flatten: DataFrame => DataFrame = df => {
    def cols(prefix: Seq[String], schema: StructType): Seq[(Seq[String], String)] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case s: StructType => cols(path, s)
          case _ => Seq(path -> path.mkString("_"))
        }
      }
    val flat = cols(Nil, df.schema).map { case (path, name) =>
      col(path.map(p => s"`$p`").mkString(".")).as(name)
    }
    df.select(flat: _*)
  }

  /** Chained transformer: apply left to right. */
  def chain(ts: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    ts.reduceOption(_ andThen _).getOrElse(identity)
}
