package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupIndex

/** One-shot profiling harness replicating the SHARED q81/q82/q84 dedup
  * lifecycle (PipelineQueries.runDedupLifecycle) phase by phase, with
  * per-job wall attributed to call sites — the lifecycle is the bench's
  * single biggest real cost and the bench can only see its total.
  * Measurement tooling only. */
object DedupLifecycleProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROF_AQE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_PROF_BCAST", "10485760"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobAgg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // root-execution call sites: AQE stage materializations and broadcast
    // builds run as anonymous future jobs — attribute them to the SQL
    // execution that owns them
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            val site = s.details.split('\n')
              .find(l => l.contains("graft.") && !l.contains("Profile"))
              .getOrElse(s.description.take(60))
            execSite.put(s.executionId, site.trim)
          case _ => ()
        }
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val byExec = Option(js.properties.getProperty("spark.sql.execution.root.id"))
          .orElse(Option(js.properties.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execSite.get(id.toLong)))
        val site = byExec
          .orElse(Option(js.properties.getProperty("callSite.short")))
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
      val rows = jobAgg.asScala.toSeq.sortBy(-_._2._2)
      val total = rows.map(_._2._2).sum
      val nJobs = rows.map(_._2._1).sum
      println(f"-- jobs after $label: n=$nJobs sum=${total / 1000.0}%.2f s --")
      rows.take(14).foreach { case (site, (n, ms)) =>
        println(f"  JOB $site%-64s n=$n%3d total=${ms / 1000.0}%7.2f s") }
      jobAgg.clear()
    }
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val k0 = graft.delta.OptimisticTransaction.committedCount.get()
      val r = body
      val k1 = graft.delta.OptimisticTransaction.committedCount.get()
      println(f"PROF $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"commits=${k1 - k0}")
      dumpJobs(label)
      r
    }

    val root = "/tmp/graft_dlprof"
    LocalPaths.deleteRecursively(root)
    val src = s"$root/source"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def part(rs: Int*) =
      docs.filter(pmod(col("doc_id"), lit(10)).isin(rs.map(Int.box): _*))

    timed("seed_write") {
      graft.delta.GraftWriter.write(part(0, 1, 2, 3), src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    }
    timed("build") {
      DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$root/idx")
    }
    timed("append_4to7") {
      graft.delta.GraftWriter.write(part(4, 5, 6, 7), src, SaveMode.Append)
    }
    timed("refresh_1_insert") { DedupIndex.refreshFromSource(spark, s"$root/idx") }
    timed("delete_mod3") {
      graft.delta.Dml.delete(spark, src, pmod(col("doc_id"), lit(10)) === 3)
    }
    timed("refresh_2_delete") { DedupIndex.refreshFromSource(spark, s"$root/idx") }
    timed("append_89") {
      graft.delta.GraftWriter.write(part(8, 9), src, SaveMode.Append)
    }
    timed("refresh_3_insert") { DedupIndex.refreshFromSource(spark, s"$root/idx") }
    timed("delete_mod7") {
      graft.delta.Dml.delete(spark, src, pmod(col("doc_id"), lit(10)) === 7)
    }
    timed("refresh_4_delete") { DedupIndex.refreshFromSource(spark, s"$root/idx") }
    timed("update_mod5") {
      graft.delta.Dml.update(spark, src, pmod(col("doc_id"), lit(10)) === 5,
        Map("text" -> translate(col("text"), "aeiou", "01234")))
    }
    timed("refresh_5_update") { DedupIndex.refreshFromSource(spark, s"$root/idx") }
    timed("survivors_read") {
      DedupIndex.survivors(spark, s"$root/idx").queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
