package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.delta._
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked tumbling window aggregation over a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agged = StreamOps.windowedAgg(
      mem.toDF().toDF("ts", "kind", "v"),
      tsCol = "ts", watermarkDelay = "10 minutes", windowDuration = "1 hour",
      keys = Seq("kind"), valueCol = Some("v"))
    val q = agged.writeStream.format("memory").queryName("wagg")
      .outputMode("update").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:10:00"), "a", 1.0),
        (ts("2024-01-01 00:50:00"), "a", 2.0),
        (ts("2024-01-01 01:10:00"), "b", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wagg")
        .select(col("window.start").cast("string"), col("kind"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows.contains(("2024-01-01 00:00:00", "a", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 01:00:00", "b", 1L, 5.0)))
    } finally q.stop()
  }

  test("session windows close after the gap and carry counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sessions = StreamOps.sessionize(
      mem.toDF().toDF("ts", "user"),
      tsCol = "ts", watermarkDelay = "0 seconds", gap = "5 minutes", keys = Seq("user"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:00:00"), "u1"),
        (ts("2024-01-01 00:03:00"), "u1"), // same session (gap 3m < 5m)
        (ts("2024-01-01 00:20:00"), "u1")) // new session
      q.processAllAvailable()
      // push the watermark far enough to close both sessions
      mem.addData((ts("2024-01-01 09:00:00"), "u2"))
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select(col("user"), col("session_start").cast("string"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("u1", "2024-01-01 00:00:00", 2L)))
      assert(rows.contains(("u1", "2024-01-01 00:20:00", 1L)))
    } finally q.stop()
  }

  test("streamingDedup drops cross-batch duplicates, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val deduped = StreamOps.streamingDedup(
      mem.toDF().toDF("ts", "key", "v"),
      tsCol = "ts", watermarkDelay = "10 minutes", keys = Seq("key"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:00:00"), "k1", 1.0),
        (ts("2024-01-01 00:00:10"), "k1", 2.0), // same-batch dup
        (ts("2024-01-01 00:00:20"), "k2", 3.0))
      q.processAllAvailable()
      mem.addData(
        (ts("2024-01-01 00:01:00"), "k1", 4.0), // cross-batch dup (inside watermark)
        (ts("2024-01-01 00:02:00"), "k3", 5.0))
      q.processAllAvailable()
      val keys = spark.table("sdedup").select("key", "v")
        .as[(String, Double)].collect().toSeq.sorted
      // first occurrence per key survives; both dups of k1 dropped
      assert(keys == Seq(("k1", 1.0), ("k2", 3.0), ("k3", 5.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = StreamOps.runningStats(mem.toDS())
      .writeStream.format("memory").queryName("rstats")
      .outputMode("update").start()
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      mem.addData(("a", 3.0)) // second batch: state must carry n=2, total=3
      q.processAllAvailable()
      val latest = spark.table("rstats")
        .groupBy("key").agg(max(struct(col("n"), col("total"))).as("s"))
        .select(col("key"), col("s.n"), col("s.total"))
        .as[(String, Long, Double)].collect()
        .map { case (k, n, t) => k -> ((n, t)) }.toMap
      assert(latest("a") == ((3L, 6.0)))
      assert(latest("b") == ((1L, 10.0)))
    } finally q.stop()
  }
}

class OptimizeSpec extends AnyFunSuite with SparkTestBase {
  import graft.delta.LogFixtures.tempTable
  import spark.implicits._

  test("compact merges small files, preserves contents, dataChange=false") {
    val dir = tempTable("opt-basic").toString
    (0 until 5).foreach { i =>
      GraftWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(1), dir,
        if (i == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val log = DeltaLog.forPath(spark, dir)
    val tailer = DeltaTailer.fromLatest(log) // after the 5 writes

    val before = DeltaTable.forPath(spark, dir)
    assert(before.files.size == 5)
    val m = Optimize.compact(spark, dir)
    assert(m.filesRemoved == 5 && m.filesAdded == 1)

    val after = DeltaTable.forPath(spark, dir)
    assert(after.files.size == 1)
    assert(after.toDF.as[(Long, String)].collect().sorted.toSeq ==
      (0 until 5).map(i => (i.toLong, s"v$i")))
    // compaction is invisible to log tailers…
    val Some((_, batch)) = tailer.nextBatch()
    assert(batch.count() == 0)
    // …and pre-compaction versions still time-travel
    assert(DeltaTable.forPath(spark, dir, m.version - 1).toDF.count() == 5)
  }

  test("partitioned compact keeps partition layout and prunes correctly after") {
    val dir = tempTable("opt-part").toString
    (0 until 4).foreach { i =>
      GraftWriter.write(
        (0 until 10).map(j => ((i * 10 + j).toLong, j % 2)).toDF("id", "p").repartition(1),
        dir, if (i == 0) SaveMode.ErrorIfExists else SaveMode.Append, Seq("p"))
    }
    val before = DeltaTable.forPath(spark, dir)
    assert(before.files.size == 8) // 4 writes × 2 partitions
    val m = Optimize.compact(spark, dir)
    assert(m.filesRemoved == 8)
    val after = DeltaTable.forPath(spark, dir)
    assert(after.files.size < 8)
    assert(after.files.forall(_.partitionValues.keySet == Set("p")))
    assert(after.toDF.count() == 40)
    assert(after.toDF.filter(col("p") === 1).count() == 20)
  }

  test("single-file table is a no-op") {
    val dir = tempTable("opt-noop").toString
    GraftWriter.write(Seq((1L, "x")).toDF("id", "v").repartition(1), dir)
    val m = Optimize.compact(spark, dir)
    assert(m.filesRemoved == 0 && m.filesAdded == 0)
  }
}
