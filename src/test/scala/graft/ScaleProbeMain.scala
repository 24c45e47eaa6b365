package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.delta._

/** One-off write/DML scale probe over the full sf1 lineitem (6M rows).
  *
  * The driver's delta gates all operate on bounded orderkey slices (≤4k
  * rows) — correctness-sized. This probe runs the transactional tier at
  * volume: full-table write, snapshot load, stats-pruned read, DV DELETE
  * (merge-on-read point delete — must not rewrite any data file), CoW
  * UPDATE of a small slice, OPTIMIZE compact, and a full-range change
  * feed read. Timings land in BASELINE.md (round-8 close-out).
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "Test/runMain graft.ScaleProbeMain"
  */
object ScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.delta.GraftSparkExtensions")
      .config("spark.sql.catalog.spark_catalog", "graft.delta.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = "/tmp/graft_scaleprobe/lineitem"
    LocalPaths.deleteRecursively("/tmp/graft_scaleprobe")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()
    println(s"PROBE rows $n")

    timed("write 6M rows (32 files)") {
      GraftWriter.write(li.repartition(32), t)
    }
    timed("cold snapshot load + count") {
      assert(DeltaTable.forPath(spark, t).toDF.count() == n)
    }
    timed("stats-pruned 1-replica read") {
      // replica key ranges are disjoint per make_sf1.py; stats pruning
      // should drop file sets wholesale before Spark lists anything
      val c = DeltaTable.forPath(spark, t)
        .toDF(Nil, Seq(StatsPredicate.Ge("l_orderkey", 90000000L)))
        .filter(col("l_orderkey") >= 90000000L).count()
      println(s"PROBE   pruned-read rows $c")
    }
    timed("enable DV") {
      DeltaTable.forPath(spark, t)
        .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    }
    val del = timed("DV point DELETE (~0.1% rows)") {
      Dml.delete(spark, t, col("l_orderkey") % 1000 === 7 && col("l_quantity") > 45)
    }
    println(s"PROBE   delete metrics $del")
    timed("post-delete count") {
      println("PROBE   rows now " + DeltaTable.forPath(spark, t).toDF.count())
    }
    timed("CoW UPDATE (0.1% slice, +100 qty, DV off)") {
      DeltaTable.forPath(spark, t)
        .setProperties(Map(TableConfig.EnableDeletionVectors -> "false"))
      Dml.update(spark, t, col("l_orderkey") % 1000 === 3,
        Map("l_quantity" -> (col("l_quantity") + 100.0)))
    }
    timed("OPTIMIZE compact") {
      Optimize.compact(spark, t)
    }
    timed("full-range graft_changes count") {
      println("PROBE   change rows " + spark.sql(s"SELECT count(*) FROM graft_changes('$t', 0)").collect()(0).getLong(0))
    }
    timed("MERGE upsert (0.1% update + 0.1% insert)") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey", "l_linenumber")
        .orderBy(col("l_quantity").desc, col("l_extendedprice").desc)
      val upd = li.filter(col("l_orderkey") % 1000 === 13)
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .drop("_rn")
        .withColumn("l_quantity", col("l_quantity") + 1000.0)
      val ins = upd.withColumn("l_orderkey", col("l_orderkey") + 1000000000L)
      val m = Merge.into(spark, t, upd.unionByName(ins),
          col("t.l_orderkey") === col("s.l_orderkey") &&
          col("t.l_linenumber") === col("s.l_linenumber"))
        .whenMatchedUpdate(Map("l_quantity" -> col("s.l_quantity")))
        .whenNotMatchedInsertAll()
        .execute()
      println(s"PROBE   merge metrics $m")
    }
    timed("OPTIMIZE zorder (okey, qty)") {
      Optimize.zorder(spark, t, Seq("l_orderkey", "l_quantity"),
        targetFileBytes = 32L * 1024 * 1024)
    }
    val before = DeltaTable.forPath(spark, t).toDF.count()
    timed("VACUUM all stale files (forced parallel path)") {
      DeltaTable.forPath(spark, t)
        .setProperties(Map(TableConfig.DeletedFileRetention -> "interval 0 hours"))
      val del = DeltaTable.forPath(spark, t)
        .vacuum(0.0, dryRun = false, parallelDeleteThreshold = 10)
      println(s"PROBE   vacuumed ${del.size} stale files")
    }
    timed("post-vacuum full count (no live file lost)") {
      val after = DeltaTable.forPath(spark, t).toDF.count()
      assert(after == before, s"vacuum lost rows: $before -> $after")
      println(s"PROBE   rows final $after")
    }

    // streaming delta→delta at volume: 6M-row initial snapshot batch, then
    // a 600k append, folded into a graft-delta sink exactly once
    val ssrc = "/tmp/graft_scaleprobe/stream_src"
    val sdst = "/tmp/graft_scaleprobe/stream_dst"
    val sckpt = "/tmp/graft_scaleprobe/stream_ckpt"
    timed("stream source write (6M rows)") {
      li.repartition(32).write.format("graft-delta").save(ssrc)
    }
    val q = spark.readStream.format("graft-delta").load(ssrc)
      .writeStream.format("graft-delta")
      .option("checkpointLocation", sckpt)
      .option("appId", "scaleprobe")
      .start(sdst)
    try {
      timed("stream initial 6M-row batch") { q.processAllAvailable() }
      timed("stream 600k-row append batch") {
        li.filter(col("l_orderkey") < 10000000L)
          .write.format("graft-delta").mode("append").save(ssrc)
        q.processAllAvailable()
      }
      timed("sink count == source count") {
        val sc = DeltaTable.forPath(spark, sdst).toDF.count()
        val tc = DeltaTable.forPath(spark, ssrc).toDF.count()
        assert(sc == tc, s"sink $sc != source $tc")
        println(s"PROBE   streamed rows $sc")
      }
    } finally q.stop()

    // governance tier at volume: adopt a plain 6M-row parquet dir in place,
    // fork it zero-copy, rewind the fork's delete with one diff commit
    val conv = "/tmp/graft_scaleprobe/convert"
    timed("CONVERT 6M-row parquet dir (32 files)") {
      li.repartition(32).write.mode("overwrite").parquet(conv)
      Convert.parquetToDelta(spark, conv)
      assert(DeltaTable.forPath(spark, conv).toDF.count() == n)
    }
    val cl = "/tmp/graft_scaleprobe/clone"
    timed("shallow CLONE (zero-copy fork)") {
      Clone.shallow(spark, conv, cl)
      assert(DeltaTable.forPath(spark, cl).toDF.count() == n)
    }
    timed("DELETE 10% in clone, then RESTORE to pre-delete") {
      Dml.delete(spark, cl, col("l_orderkey") % 10 === 0)
      DeltaTable.forPath(spark, cl).restoreToVersion(0)
      assert(DeltaTable.forPath(spark, cl).toDF.count() == n)
      // the source table is untouched by the fork's churn
      assert(DeltaTable.forPath(spark, conv).toDF.count() == n)
    }

    // modern-protocol tier at volume: ICT + v2 checkpoints + domains on
    // the 6M-row table, plus identity-column generation over a 6M insert
    timed("enable ICT + v2 checkpoints + domain") {
      DeltaTable.forPath(spark, t).setProperties(Map(
        TableConfig.EnableInCommitTimestamps -> "true",
        TableConfig.CheckpointPolicy -> "v2"))
      DeltaTable.forPath(spark, t).setDomainMetadata("probe.audit", "sf1")
    }
    timed("100 ICT commits (append loop, .crc + monotonic clock each)") {
      val one = li.limit(1).cache()
      one.count()
      (1 to 100).foreach(_ => GraftWriter.write(one, t, SaveMode.Append))
      val log = DeltaLog.forPath(spark, t)
      val snap = log.update()
      val vs = log.listCommitVersions().takeRight(100)
      val icts = vs.map(v => log.inCommitTimestampOf(v).get)
      assert(icts == icts.sorted && icts.distinct == icts, "ICT monotonic")
      println(s"PROBE   version now ${snap.version}")
    }
    timed("v2 checkpoint write (manifest + sidecars)") {
      DeltaLog.forPath(spark, t).checkpoint()
    }
    timed("cold load THROUGH the v2 checkpoint + count") {
      val log = DeltaLog.forPath(spark, t)
      val snap = log.update()
      assert(snap.domainMetadata.get("probe.audit").contains("sf1"),
        "domain lost through v2 checkpoint")
      println("PROBE   rows via v2 " + DeltaTable.forPath(spark, t).toDF.count())
    }
    val idT = "/tmp/graft_scaleprobe/identity"
    timed("identity table: 6M-row generated insert") {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        IdentityColumns.field("row_id", start = 1, step = 1),
        org.apache.spark.sql.types.StructField("l_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("l_quantity",
          org.apache.spark.sql.types.DoubleType)))
      GraftWriter.write(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema), idT)
      GraftWriter.write(li.select("l_orderkey", "l_quantity").repartition(32),
        idT, SaveMode.Append)
      val dt = DeltaTable.forPath(spark, idT)
      val stats = dt.toDF.agg(count(col("row_id")), countDistinct(col("row_id")))
        .collect()(0)
      assert(stats.getLong(0) == n && stats.getLong(1) == n,
        s"identity uniqueness violated: $stats")
      println(s"PROBE   identity hwm ${dt.identityColumns.head.highWaterMark}")
    }
    spark.stop()
  }
}
