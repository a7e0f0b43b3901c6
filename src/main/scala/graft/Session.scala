package graft

import org.apache.spark.sql.SparkSession

/** Single place for engine session config so Verify/Bench/tests agree.
  *
  * Notes:
  *  - events.parquet carries TIMESTAMP(NANOS) which vanilla Spark
  *    rejects; `nanosAsLong` surfaces it as epoch-nanos LongType and
  *    [[Tables]]/queries convert explicitly.
  *  - shuffle.partitions is sized to the local core count, not 200 —
  *    on a real cluster this is set per-job from input stats.
  */
object Session {
  // Reap graft-* temp dirs left by crashed prior JVMs (normal exits
  // clean their own via TempDirs' shutdown hook). Once per JVM, at
  // first session build — every harness path goes through here.
  private lazy val swept: Int = graft.util.TempDirs.sweepStale()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    swept: Unit
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // classic (non-ANSI) arithmetic: hash families (minhash a*h+b)
      // rely on 2^64 ring wraparound, like every hash library does
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // storage-partitioned joins: two co-bucketed graft tables join
      // by zipping file groups, no exchange on either side (the scan
      // reports KeyGroupedPartitioning; see GraftBucketFunction)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
  }

  /** Local session for tests / ad-hoc mains. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
