package graft

import graft.core.{GraftTable, TableConfig}
import graft.ingest.{ParquetDirSource, Streamer, Transformers}
import graft.operators.{Curation, Dedup, IncrementalMv}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Lakehouse-native curation, end to end: documents land in a graft
  * table through the Streamer (with a SQL transformer), curation
  * operators read the table's snapshot, an aggregate MV tracks corpus
  * statistics incrementally, and a second ingestion wave flows through
  * the same pipeline touching only its own increment. This is the
  * round-11 pieces composed into the north-star story: the corpus
  * lives IN the engine, not beside it. */
class LakehouseCurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def fresh(name: String) =
    graft.util.TempDirs.create(s"graft-$name-").toString

  test("ingest → curate → MV stats → incremental second wave") {
    import spark.implicits._
    // -- corpus table: keyed by doc_id, ordered by a version column
    val t = GraftTable.create(spark, fresh("cur-docs"), TableConfig(
      name = "cur_docs", keyField = "doc_id", orderingField = "ver",
      partitionField = Some("source"), tableType = TableConfig.Cow,
      numBuckets = 2))
    val mv = GraftTable.create(spark, fresh("cur-mv"), TableConfig(
      name = "cur_mv", keyField = "source", orderingField = "_refreshed",
      partitionField = None, tableType = TableConfig.Cow, numBuckets = 1))

    def wave(rows: Seq[(Long, String, String, Long, Double)], tag: String): Unit = {
      val dir = fresh(s"cur-src-$tag")
      // DirSource picks up regular FILES — stage the parquet dir and
      // move its part file in, like an upstream producer would drop it
      val stage = fresh(s"cur-stage-$tag")
      rows.toDF("doc_id", "source", "text", "ver", "w")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      Files.list(Paths.get(stage)).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .forEachRemaining { p =>
          if (p.getFileName.toString.endsWith(".parquet"))
            Files.copy(p, Paths.get(dir, s"$tag-${p.getFileName}"))
        }
      val src = new ParquetDirSource(spark, dir, s"${fresh(s"cur-ck-$tag")}/ck")
      // transformer normalizes text at INGEST time — downstream
      // operators see canonical text, the raw form never lands
      Streamer.runUntilCaughtUp(t, src, transform = Transformers.chain(
        Transformers.sql(
          "SELECT doc_id, source, lower(text) AS text, ver, w FROM <SRC>")))
      ()
    }

    wave(Seq(
      (1L, "web", "THE CAT SAT", 1L, 1.0),
      (2L, "web", "THE CAT SAT", 1L, 1.0),  // exact dup of 1
      (3L, "web", "a dog ran far", 1L, 1.0),
      (4L, "book", "Chapter one begins here", 1L, 1.0)), "w1")

    // -- curation over the snapshot -----------------------------------
    val snap = t.read()
    assert(snap.count() == 4)
    assert(snap.filter(col("text") === "the cat sat").count() == 2) // transformed

    val dedup = Dedup.exact(snap, "doc_id", "text")
    assert(dedup.count() == 3)                       // 2 collapse to 1
    assert(dedup.filter(col("n_copies") === 2).count() == 1)

    val chunks = Curation.chunkDocuments(snap, "doc_id", "text",
      windowTokens = 2, strideTokens = 2)
    assert(chunks.filter(col("id") === 3L).count() == 2) // 4 tokens / 2

    // -- MV: per-source doc counts maintained incrementally ------------
    IncrementalMv.sync(spark, t, mv, "source", "w")
    def mvState(): Map[String, Long] = mv.read()
      .select("source", "cnt").as[(String, Long)].collect().toMap
    assert(mvState() == Map("web" -> 3L, "book" -> 1L))

    // -- second wave: an update (doc 3 revised) + a new doc ------------
    val mvCommits = mv.log.commits().size
    wave(Seq(
      (3L, "web", "a dog ran very far indeed", 2L, 1.0), // newer ver wins
      (5L, "book", "Chapter two follows", 1L, 1.0)), "w2")
    assert(t.read().count() == 5)
    assert(t.read().filter(col("doc_id") === 3L)
      .select("text").as[String].head() == "a dog ran very far indeed")

    // the MV refresh consumes ONLY the wave's CDC — one commit
    IncrementalMv.sync(spark, t, mv, "source", "w")
    assert(mvState() == Map("web" -> 3L, "book" -> 2L))
    assert(mv.log.commits().size == mvCommits + 1)

    // incremental read serves the second wave's net changes only
    val c1 = t.log.commits()
      .filter(c => c.action == "commit" || c.action == "replace")
      .head.instant
    val cdc = t.readCdc(c1).select("_change_type", "doc_id")
      .as[(String, Long)].collect().toSet
    assert(cdc == Set(("u", 3L), ("i", 5L)))
  }
}
