package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-28 additions:
  *  - Iceberg v2 EQUALITY deletes (content=2) are APPLIED on the
  *    foreign-read path: the `equality_ids` columns anti-join data
  *    rows with STRICTLY SMALLER data sequence numbers (a re-inserted
  *    row survives); nulls match null-safely; entry-level sequence
  *    numbers inherit from the manifest when null; the delete
  *    relation broadcasts (no scan-side shuffle);
  *  - refusals narrowed to the genuinely unreadable: adoption of any
  *    live deletes, content=2 without equality_ids, equality deletes
  *    without an orderable sequence number, unknown equality field
  *    ids, and data columns colliding with the reader's helper names.
  */
class Round28Spec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-r28-$tag-").toString

  // ---- fixture forging --------------------------------------------------

  private def writeAvro(path: java.nio.file.Path, schemaJson: String,
      rows: Seq[Map[String, Any]]): Unit = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    def rec(s: org.apache.avro.Schema, m: Map[String, Any]): GenericRecord = {
      val r = new GenericData.Record(s)
      m.foreach {
        case (k, sub: Map[_, _]) =>
          r.put(k, rec(s.getField(k).schema(), sub.asInstanceOf[Map[String, Any]]))
        case (k, v) => r.put(k, v)
      }
      r
    }
    rows.foreach(m => w.append(rec(schema, m)))
    w.close()
  }

  private val manifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"}]}""".stripMargin
  private val manifestSchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"content","type":"int"},
      |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],
      |"default":null}]}}]}""".stripMargin

  private def writeOneParquet(df: org.apache.spark.sql.DataFrame,
      dest: java.nio.file.Path, sortCol: String = "id"): Unit = {
    val tmpd = s"$dest.tmp-${java.util.UUID.randomUUID()}"
    df.repartition(1).sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(tmpd)
    val part = graft.util.Fs.list(Paths.get(tmpd))(
      _.filter(_.getFileName.toString.endsWith(".parquet")).toSeq).head
    Files.createDirectories(dest.getParent)
    Files.move(part, dest)
    graft.util.TempDirs.deleteRecursively(Paths.get(tmpd))
  }

  private def schemaJson =
    """"current-schema-id":0,
      |"schemas":[{"schema-id":0,"type":"struct","fields":[
      |{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"cat","required":false,"type":"string"},
      |{"id":3,"name":"v","required":false,"type":"string"}]}]""".stripMargin

  /** Two-column equality-delete tree with a NULL key value and a
    * re-insert after the delete:
    *  - f1 (seq 1): ids 0..9 with cat = "a"/"b"/NULL cycling (so row 8
    *    carries a NULL cat targeted by a null-keyed delete);
    *  - eq (seq 2, equality_ids=[id, cat]): kills (1,"b"), (8,null),
    *    (3,null — matches nothing: row 3 has cat "a");
    *  - f2 (seq 3): re-inserts (1,"b") with v="new" — survives (3 > 2).
    * `entrySeqNull`: write the data-manifest entries with NULL
    * sequence numbers so they inherit the manifest list's — the
    * inheritance leg of the spec. */
  private def forgeEqTree(root: String, entrySeqNull: Boolean = false,
      dropEqualityIds: Boolean = false, dropSeq: Boolean = false,
      badFieldId: Boolean = false): Unit = {
    val metaDir = Paths.get(root, "metadata")
    Files.createDirectories(metaDir)
    val f1 = Paths.get(root, "data", "f1.parquet")
    val f2 = Paths.get(root, "data", "f2.parquet")
    val cats = Seq("a", "b", null)
    writeOneParquet((0 until 10).map(i =>
      (i.toLong, cats(i % 3), s"old$i")).toDF("id", "cat", "v"), f1)
    writeOneParquet(Seq((1L, "b", "new")).toDF("id", "cat", "v"), f2)
    val eq = Paths.get(root, "deletes", "eq.parquet")
    writeOneParquet(Seq((1L, "b"), (8L, null), (3L, null))
      .toDF("id", "cat"), eq)
    val dataMan = metaDir.resolve("m-data.avro")
    def entry(f: java.nio.file.Path, seq: Long) = Map(
      "status" -> Int.box(1),
      "data_file" -> Map(
        "file_path" -> f.toString, "content" -> Int.box(0))) ++
      (if (entrySeqNull) Map.empty[String, Any]
       else Map[String, Any]("sequence_number" -> Long.box(seq)))
    // with null entry seqs, the two data files need separate manifests
    // to carry distinct inherited sequence numbers
    val dataMan2 = metaDir.resolve("m-data2.avro")
    if (entrySeqNull) {
      writeAvro(dataMan, manifestSchema, Seq(entry(f1, 1L)))
      writeAvro(dataMan2, manifestSchema, Seq(entry(f2, 3L)))
    } else
      writeAvro(dataMan, manifestSchema, Seq(entry(f1, 1L), entry(f2, 3L)))
    val delMan = metaDir.resolve("m-del.avro")
    writeAvro(delMan, manifestSchema, Seq(Map[String, Any](
      "status" -> Int.box(1),
      "data_file" -> (Map[String, Any]("file_path" -> eq.toString,
        "content" -> Int.box(2)) ++
        (if (dropEqualityIds) Map.empty[String, Any]
         else Map[String, Any]("equality_ids" -> java.util.Arrays.asList(
           Int.box(if (badFieldId) 99 else 1), Int.box(2)))))) ++
      (if (dropSeq) Map.empty[String, Any]
       else Map[String, Any]("sequence_number" -> Long.box(2L)))))
    val list = metaDir.resolve("snap-1.avro")
    val listRows = Seq(
      Map[String, Any]("manifest_path" -> dataMan.toString,
        "content" -> Int.box(0), "sequence_number" -> Long.box(1L))) ++
      (if (entrySeqNull) Seq(Map[String, Any](
        "manifest_path" -> dataMan2.toString,
        "content" -> Int.box(0), "sequence_number" -> Long.box(3L)))
       else Nil) ++
      Seq(Map[String, Any]("manifest_path" -> delMan.toString,
        "content" -> Int.box(1), "sequence_number" -> Long.box(2L)))
    writeAvro(list, manifestListSchema, listRows)
    Files.writeString(metaDir.resolve("v1.metadata.json"),
      s"""{"current-snapshot-id":1,$schemaJson,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$list"}]}""".stripMargin)
    ()
  }

  private def expectAfterDeletes: Set[(Long, String)] =
    // f1 minus (1,"b") and (8,null); (3,null) matches nothing; f2's
    // re-inserted (1,"b","new") survives (seq 3 > delete's 2)
    ((0 until 10).map(i => (i.toLong, s"old$i")).toSet
      -- Set((1L, "old1"), (8L, "old8"))) + ((1L, "new"))

  test("readIceberg applies equality deletes: multi-column ids, " +
      "null-safe matching, strictly-smaller sequence ordering") {
    val root = tmp("eqapply")
    forgeEqTree(root)
    val df = graft.interop.XTableSync.readIceberg(spark, root)
    val got = df.select("id", "v").as[(Long, String)].collect().toSet
    assert(got == expectAfterDeletes)
    // the small delete relation must BROADCAST into the anti-join —
    // the 100 TB plan shape (the scan side never shuffles)
    df.collect()
    val antis = collect(df.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.nonEmpty,
      s"expected a broadcast LeftAnti join, plan:\n${df.queryExecution.executedPlan}")
  }

  test("entry-level sequence numbers inherit from the manifest list " +
      "when null (spec inheritance)") {
    val root = tmp("eqinherit")
    forgeEqTree(root, entrySeqNull = true)
    val got = graft.interop.XTableSync.readIceberg(spark, root)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got == expectAfterDeletes)
  }

  test("adoption refuses equality deletes (cannot be represented)") {
    val root = tmp("eqadopt")
    forgeEqTree(root)
    val e = intercept[IllegalArgumentException] {
      graft.interop.XTableSync.adoptIceberg(spark, root,
        graft.core.TableConfig(name = "t", keyField = "id",
          orderingField = "id", numBuckets = 1))
    }
    assert(e.getMessage.contains("readIceberg"), e.getMessage)
  }

  test("malformed equality deletes refuse loudly: missing " +
      "equality_ids, missing sequence number, unknown field id") {
    val r1 = tmp("eqnoids")
    forgeEqTree(r1, dropEqualityIds = true)
    val e1 = intercept[IllegalArgumentException] {
      graft.interop.XTableSync.readIceberg(spark, r1).collect()
    }
    assert(e1.getMessage.contains("no equality_ids"), e1.getMessage)
    // a delete ENTRY with a null sequence number is not malformed — it
    // inherits the manifest list's (2 here) and the tree still reads;
    // the genuinely unordered tree refuses in the next test
    val r2 = tmp("eqnoseq")
    forgeEqTree(r2, dropSeq = true)
    val got2 = graft.interop.XTableSync.readIceberg(spark, r2)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got2 == expectAfterDeletes)
    val r3 = tmp("eqbadfid")
    forgeEqTree(r3, badFieldId = true)
    val e3 = intercept[IllegalArgumentException] {
      graft.interop.XTableSync.readIceberg(spark, r3).collect()
    }
    assert(e3.getMessage.contains("field id 99"), e3.getMessage)
  }

  test("an equality delete with NO orderable sequence number refuses") {
    val root = tmp("eqzeroseq")
    forgeEqTree(root)
    // forge the manifest list + delete manifest with seq 0 everywhere
    val metaDir = Paths.get(root, "metadata")
    val delMan = metaDir.resolve("m-del0.avro")
    writeAvro(delMan, manifestSchema, Seq(Map(
      "status" -> Int.box(1),
      "data_file" -> Map(
        "file_path" -> Paths.get(root, "deletes", "eq.parquet").toString,
        "content" -> Int.box(2),
        "equality_ids" -> java.util.Arrays.asList(Int.box(1), Int.box(2))))))
    val list = metaDir.resolve("snap-2.avro")
    writeAvro(list, manifestListSchema, Seq(
      Map("manifest_path" -> metaDir.resolve("m-data.avro").toString,
        "content" -> Int.box(0), "sequence_number" -> Long.box(1L)),
      Map("manifest_path" -> delMan.toString,
        "content" -> Int.box(1), "sequence_number" -> Long.box(0L))))
    Files.writeString(metaDir.resolve("v2.metadata.json"),
      s"""{"current-snapshot-id":2,$schemaJson,"snapshots":[
         |{"snapshot-id":2,"manifest-list":"$list"}]}""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.interop.XTableSync.readIceberg(spark, root).collect()
    }
    assert(e.getMessage.contains("no sequence number"), e.getMessage)
  }

  test("data columns colliding with the reader's helper names refuse " +
      "loudly instead of being silently clobbered") {
    val root = tmp("eqclash")
    val metaDir = Paths.get(root, "metadata")
    Files.createDirectories(metaDir)
    val f1 = Paths.get(root, "data", "f1.parquet")
    writeOneParquet((0 until 5).map(i => (i.toLong, s"x$i"))
      .toDF("id", "__fp"), f1)
    val pd = Paths.get(root, "deletes", "pd.parquet")
    writeOneParquet(Seq((f1.toString, 0L)).toDF("file_path", "pos"), pd,
      sortCol = "pos")
    val dataMan = metaDir.resolve("m-data.avro")
    writeAvro(dataMan, manifestSchema, Seq(Map(
      "status" -> Int.box(1), "sequence_number" -> Long.box(1L),
      "data_file" -> Map("file_path" -> f1.toString, "content" -> Int.box(0)))))
    val delMan = metaDir.resolve("m-del.avro")
    writeAvro(delMan, manifestSchema, Seq(Map(
      "status" -> Int.box(1), "sequence_number" -> Long.box(2L),
      "data_file" -> Map("file_path" -> pd.toString, "content" -> Int.box(1)))))
    val list = metaDir.resolve("snap-1.avro")
    writeAvro(list, manifestListSchema, Seq(
      Map("manifest_path" -> dataMan.toString, "content" -> Int.box(0),
        "sequence_number" -> Long.box(1L)),
      Map("manifest_path" -> delMan.toString, "content" -> Int.box(1),
        "sequence_number" -> Long.box(2L))))
    Files.writeString(metaDir.resolve("v1.metadata.json"),
      s"""{"current-snapshot-id":1,"snapshots":[
         |{"snapshot-id":1,"manifest-list":"$list"}]}""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      graft.interop.XTableSync.readIceberg(spark, root).collect()
    }
    assert(e.getMessage.contains("__fp"), e.getMessage)
  }
}
