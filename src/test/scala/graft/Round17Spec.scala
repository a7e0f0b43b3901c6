package graft

import graft.core.{GraftTable, TableConfig, TableServices}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 hardening: dropColumn×index interaction, schema-faithful
  * snapshot export readback. */
class Round17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def freshRoot(name: String): String =
    graft.util.TempDirs.create(s"graft-$name-").toString

  test("dropColumn refuses while a secondary index references the column") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshRoot("dropidx"),
      TableConfig(name = "dropidx", keyField = "k", orderingField = "ts",
        tableType = TableConfig.Cow, numBuckets = 2,
        indexes = Map("v_bloom" -> "bloom:v")))
    t.insert(Seq((1L, 1L, "a")).toDF("k", "ts", "v"))
    val e = intercept[IllegalArgumentException](t.dropColumn("v"))
    assert(e.getMessage.contains("v_bloom"))
    assert(e.getMessage.contains("DROP INDEX"))
    // un-indexed columns still droppable on the same table
    t.upsert(Seq((1L, 2L, "a", "x")).toDF("k", "ts", "v", "w"))
    t.dropColumn("w")
  }

  test("exportSnapshot sidecar keeps numeric-looking string partitions typed") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshRoot("exptype"),
      TableConfig(name = "exptype", keyField = "k", orderingField = "ts",
        partitionField = Some("p"), tableType = TableConfig.Cow,
        numBuckets = 2))
    // partition values that LOOK like integers — bare inference would
    // return p as int and break schema fidelity
    t.insert(Seq((1L, 1L, "123", 1.5), (2L, 1L, "0456", 2.5))
      .toDF("k", "ts", "p", "v"))
    val dest = freshRoot("exptype_out")
    TableServices.exportSnapshot(t, dest)
    val inferred = spark.read.parquet(dest)
    val faithful = TableServices.readExportedSnapshot(spark, dest)
    assert(faithful.schema("p").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(faithful.select("p").as[String].collect().sorted
      .sameElements(Array("0456", "123")))
    // demonstrate the hazard the sidecar exists to prevent: inference
    // loses the leading zero / the string type
    assert(inferred.schema("p").dataType !=
      org.apache.spark.sql.types.StringType)
  }
}
