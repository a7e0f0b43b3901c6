package graft

import graft.operators.{IvfPq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-27 hardening (round-16 advice):
  *  - filtered ANN joins the allowed id set on the index id column's
  *    NATIVE type — a string-keyed index takes string id sets directly
  *    (the old cast-to-long nulled them out and silently returned zero
  *    rows), and a type-FAMILY mismatch refuses loudly;
  *  - malformed Delta protocol actions (missing minReaderVersion /
  *    minWriterVersion) refuse with the module's loud
  *    IllegalArgumentException contract instead of an NPE;
  *  - MMR pool vectors with null / non-float elements refuse loudly
  *    instead of an opaque MatchError mid-greedy.
  */
class Round27Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  import spark.implicits._

  private def tmp(tag: String) =
    graft.util.TempDirs.create(s"graft-r27-$tag-").toString

  // ---- filtered ANN over a string-keyed index --------------------------

  /** 40 deterministic 8-dim vectors keyed by STRING ids. */
  private def stringCorpus() = {
    val rows = (0 until 40).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 8 + j + 1).abs + 0.1)
      (f"doc-$i%03d", v.toSeq)
    }
    rows.toDF("doc_id", "emb")
  }

  test("filtered ANN: string-keyed index joins a string id set natively") {
    val path = tmp("strids")
    val corpus = stringCorpus()
    val cb = IvfPq.build(corpus, "doc_id", "emb", nLists = 2, m = 4,
      codesPerSub = 16, path = path)
    val q = corpus.filter($"doc_id" === "doc-007")
      .select($"emb".cast("array<double>")).first().getSeq[Double](0).toArray
    // allowed = the ten even-numbered ids below 20, as STRINGS
    val allowedIds = (0 until 20 by 2).map(i => f"doc-$i%03d")
    val allowed = allowedIds.toDF("doc_id")
    val got = IvfPq.topK(spark, path, cb, q, k = 5, nProbe = 2,
      allowed = Some(allowed))
      .select("id").as[String].collect().toSet
    assert(got.nonEmpty, "old cast-to-long path silently returned 0 rows")
    assert(got.subsetOf(allowedIds.toSet))
    // exactness vs an unfiltered scan post-filtered to the allowed set:
    // full probe + filter-before-ranking == filter-after-ranking at
    // the same k when the allowed set is re-ranked exactly
    val brute = IvfPq.topK(spark, path, cb, q, k = 40, nProbe = 2)
      .filter($"id".isin(allowedIds: _*))
      .orderBy($"adc_score".desc, $"id".asc).limit(5)
      .select("id").as[String].collect().toSet
    assert(got == brute)
  }

  test("filtered ANN: type-family mismatch refuses loudly") {
    val path = tmp("stridsbad")
    val corpus = stringCorpus()
    val cb = IvfPq.build(corpus, "doc_id", "emb", nLists = 2, m = 4,
      codesPerSub = 16, path = path)
    val q = Array.fill(8)(0.5)
    val e = intercept[IllegalArgumentException] {
      IvfPq.topK(spark, path, cb, q, k = 5, nProbe = 2,
        allowed = Some(Seq(1L, 2L).toDF("id"))).collect()
    }
    assert(e.getMessage.contains("type famil"))
  }

  test("filtered ANN: numeric widths still widen losslessly (int id set)") {
    val path = tmp("intids")
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 8 + j + 1).abs + 0.1).toSeq)
    }.toDF("vec_id", "emb")
    val cb = IvfPq.build(corpus, "vec_id", "emb", nLists = 2, m = 4,
      codesPerSub = 16, path = path)
    val q = Array.fill(8)(0.5)
    val got = IvfPq.topK(spark, path, cb, q, k = 3, nProbe = 2,
      allowed = Some((0 until 10).toDF("vec_id"))) // INT set, LONG index
      .select("id").as[Long].collect().toSet
    assert(got.nonEmpty && got.forall(_ < 10))
  }

  // ---- malformed Delta protocol actions --------------------------------

  private def writeLog(root: String, ver: Long, actions: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(root, "_delta_log"))
    Files.write(Paths.get(root, "_delta_log", f"$ver%020d.json"),
      actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    ()
  }

  private val metaLine: String =
    graft.core.CommitLog.mapper.writeValueAsString(Map(
      "metaData" -> Map("id" -> "0",
        "format" -> Map("provider" -> "parquet"),
        "schemaString" -> Seq((1L, 1L)).toDF("id", "ts").schema.json,
        "partitionColumns" -> Seq.empty,
        "configuration" -> Map.empty)))

  test("replay refuses a protocol action without minReaderVersion") {
    val root = tmp("noreader")
    writeLog(root, 0L, Seq("""{"protocol":{"minWriterVersion":2}}""", metaLine))
    val e = intercept[IllegalArgumentException] {
      graft.interop.XTableSync.readDelta(spark, root)
    }
    assert(e.getMessage.contains("minReaderVersion"))
    assert(e.getMessage.contains("malformed"))
  }

  test("adoption refuses a protocol action without minWriterVersion") {
    val root = tmp("nowriter")
    writeLog(root, 0L, Seq("""{"protocol":{"minReaderVersion":1}}""", metaLine))
    val e = intercept[IllegalArgumentException] {
      graft.interop.XTableSync.adoptDelta(spark, root, graft.core.TableConfig(
        name = "t", keyField = "id", orderingField = "ts", numBuckets = 1))
    }
    assert(e.getMessage.contains("minWriterVersion"))
    assert(e.getMessage.contains("malformed"))
  }

  // ---- MMR null-element refusal -----------------------------------------

  test("mmrSelectClustered refuses a null vector element loudly") {
    val df = Seq(1L, 2L, 3L).toDF("vec_id")
      .withColumn("vec", when($"vec_id" === 2,
          array(lit(null).cast("double"), lit(1.0)))
        .otherwise(array(lit(1.0), lit(0.0))))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelectClustered(df, "vec_id", "vec",
        Array(1.0, 0.0), k = 3, numClusters = 1, poolPerCluster = 8).collect()
    }
    assert(e.getMessage.contains("null element"))
  }
}
