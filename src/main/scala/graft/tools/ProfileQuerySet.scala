package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurements for the round-25 additions (not part of the
  * driver contract):
  *
  *  1. query-set ANN: [[graft.operators.IvfPq.topKBatch]] over a
  *     20-query table vs 20 sequential [[graft.operators.IvfPq
  *     .topKRerank]] calls on the same index — the per-query-jobs
  *     vs one-pass comparison the BASELINE.md row records;
  *  2. the [[graft.operators.Similarity.mmrSelect]] k=100 envelope
  *     point (k sequential driver-scheduled scans with the selected
  *     set as plan literals).
  *
  * Usage: runMain graft.tools.ProfileQuerySet [nQueries=20] [mmrK=100]
  *          [corpusMult=1]
  *
  * `corpusMult` > 1 unions deterministic per-copy-perturbed replicas
  * of the fixture embeddings (fresh ids) before building the index —
  * the scale-sweep shape the other Profile* tools use.
  */
object ProfileQuerySet {
  def main(args: Array[String]): Unit = {
    val nQ = if (args.length > 0) args(0).toInt else 20
    val mmrK = if (args.length > 1) args(1).toInt else 100
    val mult = if (args.length > 2) args(2).toInt else 1
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base0 = graft.Tables.load(spark, dir, "embeddings")
    val embs = (if (mult <= 1) base0
      else (1 until mult).map { m =>
        base0.select(
          (col("vec_id") + lit(m * 1000000L)).as("vec_id"),
          transform(col("embedding"), x =>
            x + (xxhash64(col("vec_id") * lit(m)) % 1000).cast("float")
              / lit(1e6f)).as("embedding"))
      }.foldLeft(base0.select("vec_id", "embedding"))(_ unionByName _))
      .cache()
    val n = embs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[queryset] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val p = graft.util.TempDirs.create("graft-qset-").toString + "/idx"
    // `lab` is a stored filter column (metaCols): the p86 pushdown path
    val withLab = embs.withColumn("lab",
      pmod(col("vec_id"), lit(2L)).cast("int"))
    val cb = time(s"IVF-PQ build (corpus=$n, metaCols=lab)") {
      graft.operators.IvfPq.build(withLab, "vec_id", "embedding",
        nLists = 16, m = 8, codesPerSub = 64, path = p,
        metaCols = Seq("lab"))
    }
    val queries = embs.filter(col("vec_id") < nQ)
      .select("vec_id", "embedding").cache()
    queries.count()
    // warm both paths once (parquet footers, codegen)
    graft.operators.IvfPq.topKBatch(queries, "vec_id", "embedding", p, cb,
      k = 10, nProbe = 4, candidates = 40).count()
    time(s"topKBatch ($nQ queries, one pass)") {
      graft.operators.IvfPq.topKBatch(queries, "vec_id", "embedding", p, cb,
        k = 10, nProbe = 4, candidates = 40).count()
    }
    val qVecs = queries.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    time(s"${nQ}x single-query topKRerank (per-query jobs)") {
      qVecs.foreach { q =>
        graft.operators.IvfPq.topKRerank(spark, p, cb, q,
          k = 10, nProbe = 4, candidates = 40).count()
      }
    }
    // filtered retrieval: selective (1/10 survives — AQE broadcasts
    // the id set) vs broad (1/2 — the semi join shuffles); both must
    // stay within the same order as the unfiltered pass
    Seq(("selective 1/10", 10L), ("broad 1/2", 2L)).foreach {
      case (label, mod) =>
        val allowed = embs.filter(col("vec_id") % mod === 0L)
          .select("vec_id")
        time(s"topKBatch FILTERED ($label, $nQ queries, id-set semi join)") {
          graft.operators.IvfPq.topKBatch(queries, "vec_id", "embedding",
            p, cb, k = 10, nProbe = 4, candidates = 40,
            allowed = Some(allowed)).count()
        }
    }
    time(s"topKBatch FILTERED (broad 1/2, $nQ queries, STORED pushdown)") {
      graft.operators.IvfPq.topKBatch(queries, "vec_id", "embedding",
        p, cb, k = 10, nProbe = 4, candidates = 40,
        storedFilter = Some(col("lab") === 0)).count()
    }
    val q0 = qVecs.head
    time(s"mmrSelect k=$mmrK over $n candidates") {
      graft.operators.Similarity.mmrSelect(embs, "vec_id", "embedding",
        q0, k = mmrK).count()
    }
    spark.stop()
  }
}
