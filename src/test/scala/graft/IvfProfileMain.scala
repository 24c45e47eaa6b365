package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IvfIndex

/** One-shot profiling harness for the IVF index gates' flow (q79/q80/q85
  * shape): build + refresh + probe with the Spark event log on, so per-job
  * wall attributes to call sites offline. Measurement tooling only. */
object IvfProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val evDir = sys.env.getOrElse("SPARK_GRAFT_EVLOG", "/tmp/graft_evlog_ivf")
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
    import spark.implicits._

    val root = "/tmp/graft_ivfprof"
    LocalPaths.deleteRecursively(root)

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
        f"commits=${graft.delta.OptimisticTransaction.committedCount.get()}")
      r
    }

    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cut = vecs.selectExpr("percentile_approx(vec_id, 0.9)").first().getLong(0)
    timed("build") {
      IvfIndex.build(spark, vecs.filter(col("vec_id") < cut), "vec_id",
        "embedding", root, nClusters = 8)
    }
    timed("refresh") {
      IvfIndex.refresh(spark, vecs.filter(col("vec_id") >= cut), "vec_id",
        "embedding", root)
    }
    val qv = vecs.filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    timed("topK") {
      IvfIndex.topK(spark, root, qv, k = 10, nProbe = 8).collect()
    }
    spark.stop()
  }
}
