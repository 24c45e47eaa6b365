package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IvfIndex

/** One-shot profiling harness for the q80 (CDF-maintained IVF) shape:
  * source write → buildFromTable → DELETE → append → refreshFromSource →
  * probe, each phase walled separately, honoring SPARK_GRAFT_CPUS so the
  * 8-vs-32-core delta attributes to a phase. Measurement tooling only. */
object IvfCdfProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // per-job wall attributed to call sites (guide §1: find where the time
    // goes before touching anything)
    val jobAgg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties.getProperty("callSite.short"))
          .orElse(js.stageInfos.lastOption.map(_.details.split('\n')
            .find(l => l.contains("graft.") && !l.contains("Profile"))
            .getOrElse(js.stageInfos.last.name)))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, site.trim))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) jobAgg.merge(s._2, (1L, je.time - s._1),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })
    def dumpJobs(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      val rows = jobAgg.asScala.toSeq.sortBy(-_._2._2).take(18)
      println(s"-- jobs after $label --")
      rows.foreach { case (site, (n, ms)) =>
        println(f"  JOB $site%-52s n=$n%3d total=${ms / 1000.0}%7.2f s") }
      jobAgg.clear()
    }

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val k0 = graft.delta.OptimisticTransaction.committedCount.get()
      val r = body
      val k1 = graft.delta.OptimisticTransaction.committedCount.get()
      println(f"PROF $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"commits=${k1 - k0}")
      dumpJobs(label)
      r
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"== rep $rep (cpus=$cpus) ==")
      val root = s"/tmp/graft_ivfcdfprof_$rep"
      LocalPaths.deleteRecursively(root)
      val src = s"$root/source"
      val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      timed("write_source") {
        graft.delta.GraftWriter.write(
          vecs.select(col("vec_id"), col("embedding")), src,
          configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
      }
      timed("buildFromTable") {
        IvfIndex.buildFromTable(spark, src, "vec_id", "embedding",
          s"$root/idx", nClusters = 8)
      }
      timed("dml_delete") {
        graft.delta.Dml.delete(spark, src, col("vec_id") % 7 === lit(3L))
      }
      timed("append") {
        graft.delta.GraftWriter.write(
          vecs.filter(col("vec_id") < 10)
            .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding")),
          src, org.apache.spark.sql.SaveMode.Append)
      }
      timed("refreshFromSource") {
        IvfIndex.refreshFromSource(spark, s"$root/idx")
      }
      val qv = vecs.filter(col("vec_id") === 0)
        .select("embedding").as[Array[Float]].head()
      timed("topK") {
        IvfIndex.topK(spark, s"$root/idx", qv, k = 10, nProbe = 8).collect()
      }
      LocalPaths.deleteRecursively(root)
    }
    spark.stop()
  }
}
