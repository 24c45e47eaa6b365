package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL time travel on graft-delta catalog tables (GraftSqlDml rewrite of
  * RelationTimeTravel; stock Spark supports the syntax only for DSv2). */
class SqlTimeTravelSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def ext = InsertIntoSpec.extensionSession(spark)

  test("VERSION AS OF pins a historical snapshot") {
    val dir = tempTable("sql-tt").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    ext.sql(s"CREATE TABLE g_tt_v USING `graft-delta` OPTIONS (path '$dir')")
    try {
      assert(ext.sql("SELECT count(*) FROM g_tt_v VERSION AS OF 0").head().getLong(0) == 1)
      assert(ext.sql("SELECT count(*) FROM g_tt_v VERSION AS OF 1").head().getLong(0) == 2)
      assert(ext.sql("SELECT count(*) FROM g_tt_v").head().getLong(0) == 2)
      intercept[Exception] { ext.sql("SELECT * FROM g_tt_v VERSION AS OF 9").collect() }
    } finally ext.sql("DROP TABLE g_tt_v")
  }

  test("TIMESTAMP AS OF resolves through commit mtimes") {
    val dir = tempTable("sql-tt-ts").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val afterV0 = new java.sql.Timestamp(
      DeltaLog.forPath(spark, dir).versionTimestamp(0) + 1)
    Thread.sleep(1100) // distinct mtimes (fs second granularity safety)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    ext.sql(s"CREATE TABLE g_tt_ts USING `graft-delta` OPTIONS (path '$dir')")
    try {
      val n = ext.sql(s"SELECT count(*) FROM g_tt_ts TIMESTAMP AS OF '$afterV0'")
        .head().getLong(0)
      assert(n == 1)
    } finally ext.sql("DROP TABLE g_tt_ts")
  }

  test("graft_history table function lists commits with operations") {
    val dir = tempTable("sql-history").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    GraftWriter.write(Seq((2L, "b")).toDF("id", "v"), dir, SaveMode.Append)
    Dml.delete(ext, dir, col("id") === 1L)
    val rows = ext.sql(s"SELECT version, operation FROM graft_history('$dir') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L))
    assert(rows.map(_._2) == Seq("WRITE", "WRITE", "DELETE"))
  }

  test("graft_history distributed path is row-identical to the driver path") {
    import LogFixtures.writeCommit
    val dir = tempTable("sql-history-dist")
    def info(op: String): String = s"""{"commitInfo":{"operation":"$op","n":1}}"""
    writeCommit(dir, 0, Seq(LogFixtures.protocol, LogFixtures.metaData,
      LogFixtures.add("f0.parquet"), info("op0")))
    (1 until 200).foreach { v =>
      // every third commit has NO commitInfo — both paths must still emit
      // its row (nulls), not drop it
      val lines = Seq(LogFixtures.add(s"f$v.parquet")) ++
        (if (v % 3 == 0) Nil else Seq(info(s"op$v")))
      writeCommit(dir, v, lines)
    }
    val q = s"SELECT * FROM graft_history('${dir.toString}') ORDER BY version"
    def run(): Seq[(Long, Long, String, String)] =
      ext.sql(q).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSeq
    val driver = run()
    assert(driver.size == 200)
    ext.conf.set(GraftHistoryFunction.ThresholdKey, "50")
    try {
      val dist = run()
      assert(dist == driver, "distributed history diverged from driver path")
      assert(dist.count(_._3 == null) == 66) // v=3,6,...,198
      assert(dist.filter(_._3 != null).forall(t => t._4.contains(t._3)))
    } finally ext.conf.unset(GraftHistoryFunction.ThresholdKey)
  }

  test("graft_detail table function summarizes the live snapshot") {
    val dir = tempTable("sql-detail").toString
    GraftWriter.write((0 until 60).map(i => (i.toLong, i % 3)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, partitionBy = Seq("p"))
    DeltaTable.forPath(ext, dir).setProperties(Map(TableConfig.CheckpointInterval -> "5"))
    val r = ext.sql(s"SELECT * FROM graft_detail('$dir')").head()
    assert(r.getAs[Long]("version") == 1L)
    assert(r.getAs[Long]("num_files") ==
      DeltaLog.forPath(ext, dir).update().files.size.toLong)
    assert(r.getAs[Long]("num_records") == 60L)
    assert(r.getAs[String]("partition_columns") == "p")
    assert(r.getAs[String]("properties").contains("\"delta.checkpointInterval\":\"5\""))
    assert(r.getAs[String]("schema_json").contains("\"id\""))
  }

  test("graft_changes returns rows per version range; compactions invisible") {
    val dir = tempTable("sql-changes").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)                    // v0
    GraftWriter.write(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir,
      SaveMode.Append)                                                        // v1
    GraftWriter.write(Seq((4L, "d")).toDF("id", "v"), dir, SaveMode.Append)  // v2
    Optimize.compact(spark, dir)                                              // v3 dataChange=false

    def changes(sql: String): Seq[(Long, Long)] =
      ext.sql(sql).select("id", "_commit_version")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    // full tail since v0: versions 1..3, compaction invisible
    assert(changes(s"SELECT * FROM graft_changes('$dir', 0)") ==
      Seq((2L, 1L), (3L, 1L), (4L, 2L)))
    // bounded range (0, 1]
    assert(changes(s"SELECT * FROM graft_changes('$dir', 0, 1)") ==
      Seq((2L, 1L), (3L, 1L)))
    // empty range is an empty, correctly-typed result
    val empty = ext.sql(s"SELECT * FROM graft_changes('$dir', 3)")
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "v", "_commit_version"))
    // out-of-range end fails fast
    intercept[Exception] { ext.sql(s"SELECT * FROM graft_changes('$dir', 0, 99)").collect() }
  }

  test("non-graft tables keep Spark's unsupported time-travel error") {
    val dir = tempTable("sql-tt-plain").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    ext.sql(s"CREATE TABLE g_tt_plain USING parquet OPTIONS (path '$dir')")
    try {
      val e = intercept[Exception] {
        ext.sql("SELECT * FROM g_tt_plain VERSION AS OF 0").collect()
      }
      assert(e.getMessage.contains("TIME_TRAVEL") || e.getMessage.contains("Time travel"))
    } finally ext.sql("DROP TABLE g_tt_plain")
  }
}
