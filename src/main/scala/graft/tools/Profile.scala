package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents").cache()
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("p3 full minhashLsh") {
      Dedup.minhashLsh(docs, "doc_id", "text", k = 5).count()
    }
    // stage-by-stage replica of minhashLsh's internals (public fns)
    locally {
      val withHashes = docs.select(col("doc_id").as("id"),
        shingleHashes(col("text"), 5).as("hashes")).persist()
      time("p3a shingle+hash cache") { withHashes.count() }
      val sigs = withHashes
        .withColumn("sig", minhashSignature(col("hashes"), 128))
        .withColumn("band", explode(lshBands(col("sig"), 32, 4)))
        .select(col("id"), col("band.band").as("band"), col("band.sig").as("bsig"))
      val candidates = sigs
        .groupBy("band", "bsig").agg(sort_array(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids) - i - 1),
            |    y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct().persist()
      time("p3b band bucket cands") { candidates.count() }
      val verified = candidates
        .join(withHashes.toDF("doc_a", "ha"), "doc_a")
        .join(withHashes.toDF("doc_b", "hb"), "doc_b")
        .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("ha")) + size(col("hb")) - col("inter")))
        .filter(col("jaccard") >= 0.7)
      time("p3c verify joins") { verified.count() }
      println(verified.queryExecution.executedPlan.toString.take(4000))
      withHashes.unpersist(); candidates.unpersist()
    }
    time("p3 signatures+bands only") {
      docs.select(col("doc_id"),
          lshBands(minhashSignature(shingleHashes(col("text"), 5), 128), 32, 4).as("b"))
        .selectExpr("sum(size(b))").collect()(0).getLong(0)
    }
    time("p3 shingleRel+sizes") {
      docs.select(col("doc_id"), explode(wordShingles(col("text"), 5)).as("gram"))
        .groupBy("doc_id").agg(count(lit(1))).count()
    }
    // incremental dedup: marginal cost of one more batch (1/5 of the
    // corpus) vs recomputing the whole corpus from scratch
    locally {
      import graft.operators.IncrementalDedup
      val inc = new IncrementalDedup(spark,
        graft.util.TempDirs.create("graft-incd-").toString)
      (0 until 4).foreach { i =>
        inc.dedupBatch(docs.filter(col("doc_id") % 5 === i),
          "doc_id", "text", i + 1L).count()
      }
      inc.compactStores() // periodic maintenance between batches
      time("incD 5th batch (1/5 corpus)") {
        inc.dedupBatch(docs.filter(col("doc_id") % 5 === 4),
          "doc_id", "text", 5L).count()
      }
      time("incD full recompute") {
        Dedup.minhashLsh(docs, "doc_id", "text", k = 5).count()
      }
    }
    // lakehouse l1 pipeline breakdown
    val ev = Tables.load(spark, dir, "events").cache(); ev.count()
    time("l1 full build+read") {
      graft.LakehouseQueries.qCowUpsertSnapshot(spark, dir).count()
    }
    spark.stop()
  }
}
