package graft

import org.apache.spark.sql.SparkSession

/** Micro-probe for the staged-write floor: times `df.write.parquet` of a
  * 1-row local relation under committer/conf variants, so the per-commit
  * fixed cost attributes to a mechanism before anything is changed
  * (guide §1 measure-first). Measurement tooling only. */
object WriteFloorProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val one = Seq((1L, "x")).toDF("id", "v").cache(); one.count()

    def loop(label: String, n: Int): Unit = {
      val base = s"/tmp/graft_wfloor/${label.replaceAll("[^a-zA-Z0-9]", "_")}"
      LocalPaths.deleteRecursively("/tmp/graft_wfloor")
      // warm
      (1 to 3).foreach(i => one.write.mode("overwrite").parquet(s"$base/w$i"))
      val t0 = System.nanoTime()
      (1 to n).foreach(i => one.write.mode("overwrite").parquet(s"$base/r$i"))
      val per = (System.nanoTime() - t0) / 1e6 / n
      println(f"WFLOOR $label%-40s ${per}%7.1f ms/write")
    }

    def loopOpt(label: String, n: Int): Unit = {
      val base = s"/tmp/graft_wfloor/${label.replaceAll("[^a-zA-Z0-9]", "_")}"
      LocalPaths.deleteRecursively("/tmp/graft_wfloor")
      def w(i: Int, dir: String) = one.write
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .mode("overwrite").parquet(s"$base/$dir$i")
      (1 to 3).foreach(i => w(i, "w"))
      val t0 = System.nanoTime()
      (1 to n).foreach(i => w(i, "r"))
      val per = (System.nanoTime() - t0) / 1e6 / n
      val marker = new java.io.File(s"$base/r1/_SUCCESS").exists()
      println(f"WFLOOR $label%-40s ${per}%7.1f ms/write successMarker=$marker")
    }
    // interleaved A/B: order effects (codegen/committer warmup, page cache)
    // hit both variants equally
    def ab(n: Int): Unit = {
      LocalPaths.deleteRecursively("/tmp/graft_wfloor")
      val base = "/tmp/graft_wfloor/ab"
      def plain(i: Int) = one.write.mode("overwrite").parquet(s"$base/p$i")
      def opt(i: Int) = one.write
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .mode("overwrite").parquet(s"$base/o$i")
      (1 to 3).foreach { i => plain(i); opt(i) }
      var tp = 0L; var to = 0L
      (1 to n).foreach { i =>
        val a = System.nanoTime(); plain(i + 100); val b = System.nanoTime()
        opt(i + 100); val c = System.nanoTime()
        tp += b - a; to += c - b
      }
      println(f"WFLOOR ab_plain ${tp / 1e6 / n}%7.1f ms  ab_opt ${to / 1e6 / n}%7.1f ms")
    }
    ab(30)
    loopOpt("per_write_options", 20)
    loop("baseline", 20)
    spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    loop("no_success_marker", 20)
    spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    loop("plus_committer_v2", 20)
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    loop("plus_uncompressed", 20)
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    loop("plus_no_aqe", 20)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // noop sink floor: the pure job-scheduling cost without any file work
    val t0 = System.nanoTime()
    (1 to 20).foreach(_ => one.write.format("noop").mode("overwrite").save())
    println(f"WFLOOR noop_sink ${(System.nanoTime() - t0) / 1e6 / 20}%7.1f ms/write")
    spark.stop()
  }
}
