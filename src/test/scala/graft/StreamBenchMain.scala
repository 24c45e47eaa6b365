package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.delta._

/** Streaming throughput probe (r12 verdict #6): delta → delta
  * `readStream`/`writeStream` at sf1 volume with admission control ON
  * (`maxFilesPerTrigger`), measuring what the correctness soaks never
  * recorded — the sustained rate:
  *
  *  - initial-snapshot drain: 6M rows through the paced source,
  *  - steady state: K append batches landing while the stream runs,
  *    rows/s and sink commits/s from wall clock,
  *  - exactly-once check at the end (sink count == source count).
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "Test/runMain graft.StreamBenchMain"
  */
object StreamBenchMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = "/tmp/graft_streambench"
    LocalPaths.deleteRecursively(root)
    val src = s"$root/src"; val dst = s"$root/dst"; val ckpt = s"$root/ckpt"

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()
    li.repartition(32).write.format("graft-delta").save(src)

    val q = spark.readStream.format("graft-delta")
      .option("maxFilesPerTrigger", "8") // admission control on
      .load(src)
      .writeStream.format("graft-delta")
      .option("checkpointLocation", ckpt)
      .option("appId", "streambench")
      .start(dst)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    try {
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val initSec = (System.nanoTime() - t0) / 1e9
      val initCommits = DeltaLog.forPath(spark, dst).update().version + 1
      println(s"""{"metric":"stream_initial","rows":$n,"sec":${fmt(initSec)},"rows_per_sec":${fmt(n / initSec)},"sink_commits":$initCommits,"commits_per_sec":${fmt(initCommits / initSec)}}""")

      // steady state: K pre-staged append batches of ~10% sf1 each, landed
      // back-to-back while the stream drains them
      val batches = 8
      val batch = li.filter(col("l_orderkey") % 10 === 3).repartition(8).cache()
      val batchRows = batch.count()
      val t1 = System.nanoTime()
      (1 to batches).foreach { _ =>
        batch.write.format("graft-delta").mode("append").save(src)
      }
      q.processAllAvailable()
      val steadySec = (System.nanoTime() - t1) / 1e9
      val totalCommits = DeltaLog.forPath(spark, dst).update().version + 1
      val steadyRows = batchRows * batches
      println(s"""{"metric":"stream_steady","rows":$steadyRows,"append_batches":$batches,"sec":${fmt(steadySec)},"rows_per_sec":${fmt(steadyRows / steadySec)},"sink_commits":${totalCommits - initCommits},"commits_per_sec":${fmt((totalCommits - initCommits) / steadySec)}}""")

      val sinkCount = DeltaTable.forPath(spark, dst).toDF.count()
      val srcCount = DeltaTable.forPath(spark, src).toDF.count()
      assert(sinkCount == srcCount, s"exactly-once violated: sink $sinkCount != src $srcCount")
      println(s"""{"metric":"stream_total","rows":$sinkCount,"exactly_once":true}""")
    } finally q.stop()
    spark.stop()
  }
}
