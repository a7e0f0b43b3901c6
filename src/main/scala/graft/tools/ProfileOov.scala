package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Scratch measurement for the oovRate reformulation (not part of the
  * driver contract): time the plan-resident hash-set expression
  * ([[graft.functions.OovCount]]) against the literal-array
  * `array_contains` HOF it replaced, at a REAL vocabulary size
  * (default V=100k, corpus words padded to V) and a corpus multiplier.
  * The HOF is tokens × O(V) interpreted — run it only at 1× unless you
  * have time to burn. Usage:
  * runMain graft.tools.ProfileOov [mult=1] [V=100000] [withHof=false] [padOnly=false]
  * padOnly=true builds the vocab from padding alone, so EVERY token is
  * OOV — the HOF's worst case (full O(V) scan per token; with real
  * words included the fixture's 31-word vocabulary sorts to the front
  * of the literal array and the linear scan exits almost immediately).
  */
object ProfileOov {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 1
    val v = if (args.length > 1) args(1).toInt else 100000
    val withHof = args.length > 2 && args(2).toBoolean
    val padOnly = args.length > 3 && args(3).toBoolean
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val docs = (1 to mult).map(i => base.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ union _).cache()
    println(s"[oov] corpus rows=${docs.count()} mult=$mult V=$v")

    val real = if (padOnly) Array.empty[String]
      else base.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(v)
        .collect().map(_.getString(0))
    val vocab = real ++ (real.length until v).map(i => s"pad_$i")
    val vocabBc = spark.sparkContext.broadcast(vocab)
    println(s"[oov] vocab real=${real.length} padded=${vocab.length}")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[oov] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $r")
    }
    (1 to 3).foreach { _ =>
      time("native hash-set") {
        docs.select(graft.functions.GraftExpressions
            .oov_count(col("text"), vocabBc).as("o"))
          .agg(sum("o")).collect()(0).getLong(0)
      }
    }
    if (withHof) {
      val vocabArr = array(vocab.toIndexedSeq.map(lit): _*)
      val ws = split(col("text"), " ")
      time("HOF array_contains") {
        docs.select(size(filter(ws, w => !array_contains(vocabArr, w)))
            .cast("long").as("o"))
          .agg(sum("o")).collect()(0).getLong(0)
      }
    }
    spark.stop()
  }
}
