package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupIndex

/** One-shot profiling harness for the standing-dedup-index refresh: runs a
  * build + ONE CDF-window refresh with the Spark event log on, so the
  * per-job wall can be attributed to call sites offline (the bench can't
  * see inside a refresh). Measurement tooling only — not part of any gate. */
object RefreshProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val evDir = sys.env.getOrElse("SPARK_GRAFT_EVLOG", "/tmp/graft_evlog")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evDir))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", evDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = "/tmp/graft_refreshprof"
    LocalPaths.deleteRecursively(root)
    val src = s"$root/source"

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
        f"commits=${graft.delta.OptimisticTransaction.committedCount.get()}")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    timed("seed write") {
      graft.delta.GraftWriter.write(
        docs.filter(pmod(col("doc_id"), lit(10)) < 8), src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    }
    timed("buildFromSource") {
      DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$root/idx")
    }
    timed("append batch") {
      graft.delta.GraftWriter.write(
        docs.filter(pmod(col("doc_id"), lit(10)) === 8), src, SaveMode.Append)
    }
    spark.sparkContext.setJobDescription(null)
    timed("refreshFromSource") {
      DedupIndex.refreshFromSource(spark, s"$root/idx")
    }
    spark.stop()
  }
}
