package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InsertIntoSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("INSERT INTO a catalog table commits through the log") {
    val dir = tempTable("sql-insert").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    spark.sql(s"CREATE TABLE graft_ins USING `graft-delta` OPTIONS (path '$dir')")
    try {
      spark.sql("INSERT INTO graft_ins VALUES (2, 'b'), (3, 'c')")
      val log = DeltaLog.forPath(spark, dir)
      assert(log.update().version == 1, "insert must be a log commit")
      // read-your-writes through the catalog name
      val rows = spark.sql("SELECT id, v FROM graft_ins ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally spark.sql("DROP TABLE graft_ins")
  }

  test("INSERT OVERWRITE replaces the table contents transactionally") {
    val dir = tempTable("sql-insert-ow").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    spark.sql(s"CREATE TABLE graft_ow USING `graft-delta` OPTIONS (path '$dir')")
    try {
      spark.sql("INSERT OVERWRITE TABLE graft_ow VALUES (9, 'z')")
      assert(spark.sql("SELECT * FROM graft_ow").count() == 1)
      val log = DeltaLog.forPath(spark, dir)
      assert(log.update().version == 1)
      // prior contents still reachable by time travel
      assert(DeltaTable.forPath(spark, dir, 0).toDF.count() == 1)
      assert(DeltaTable.forPath(spark, dir, 0).toDF
        .select("v").as[String].head() == "a")
    } finally spark.sql("DROP TABLE graft_ow")
  }

  test("INSERT into a time-travel relation is rejected") {
    val dir = tempTable("sql-insert-tt").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val rel = spark.read.format("graft-delta").option("versionAsOf", 0).load(dir)
    rel.createOrReplaceTempView("graft_tt")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft_tt VALUES (2, 'b')")
    }
    assert(e.getMessage.contains("time-travel") ||
      e.getCause != null && e.getCause.getMessage.contains("time-travel"))
    assert(DeltaLog.forPath(spark, dir).update().version == 0)
  }

  test("the relation's file format refuses direct writes (no-extensions guard)") {
    // In a session WITHOUT GraftSparkExtensions, Spark routes partitioned
    // INSERTs to InsertIntoHadoopFsRelationCommand, whose first write step is
    // format.prepareWrite — the write-disabled format must fail there,
    // before a single orphan parquet lands in the table dir. (The shared
    // test session carries the extensions, so the guard is asserted at the
    // exact entry point that command calls.)
    val e = intercept[IllegalStateException] {
      new GraftParquetFileFormat().prepareWrite(spark,
        org.apache.hadoop.mapreduce.Job.getInstance(
          spark.sessionState.newHadoopConf()),
        Map.empty, new org.apache.spark.sql.types.StructType().add("id", "long"))
    }
    assert(e.getMessage.contains("GraftSparkExtensions"))
  }

  test("INSERT INTO a partitioned table commits through the log (with extensions)") {
    val ext = InsertIntoSpec.extensionSession(spark)
    val dir = tempTable("sql-insert-part").toString
    GraftWriter.write(Seq((1L, 0), (2L, 1)).toDF("id", "p"), dir,
      org.apache.spark.sql.SaveMode.ErrorIfExists, Seq("p"))
    ext.sql(s"CREATE TABLE graft_ins_p USING `graft-delta` OPTIONS (path '$dir')")
    try {
      ext.sql("INSERT INTO graft_ins_p (id, p) VALUES (3, 1)")
      val dt = DeltaTable.forPath(ext, dir)
      assert(dt.log.update().version == 1, "insert must be a log commit")
      assert(dt.toDF.count() == 3)
      assert(dt.files.forall(_.partitionValues.keySet == Set("p")))
      assert(dt.toDF.filter(col("p") === 1).count() == 2)
      // read-your-writes through the catalog name in the same session
      assert(ext.sql("SELECT count(*) FROM graft_ins_p").as[Long](ext.implicits.newLongEncoder).head() == 3)
    } finally ext.sql("DROP TABLE graft_ins_p")
  }

  test("INSERT OVERWRITE a partitioned table replaces it transactionally (with extensions)") {
    val ext = InsertIntoSpec.extensionSession(spark)
    val dir = tempTable("sql-insert-part-ow").toString
    GraftWriter.write(Seq((1L, 0), (2L, 1)).toDF("id", "p"), dir,
      org.apache.spark.sql.SaveMode.ErrorIfExists, Seq("p"))
    ext.sql(s"CREATE TABLE graft_ow_p USING `graft-delta` OPTIONS (path '$dir')")
    try {
      ext.sql("INSERT OVERWRITE TABLE graft_ow_p VALUES (9, 5)")
      val dt = DeltaTable.forPath(ext, dir)
      assert(dt.toDF.count() == 1)
      assert(dt.files.forall(_.partitionValues.get("p").contains("5")))
      assert(DeltaTable.forPath(ext, dir, 0).toDF.count() == 2) // time travel intact
    } finally ext.sql("DROP TABLE graft_ow_p")
  }
}

object InsertIntoSpec {
  /** One extra SparkSession on the shared SparkContext with
    * GraftSparkExtensions registered (extensions are fixed at session build,
    * so the shared base session can't be reused). Suites run serially in
    * the forked test JVM; the default session is restored after building. */
  @volatile private var ext: org.apache.spark.sql.SparkSession = _
  def extensionSession(base: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    synchronized {
      if (ext == null) {
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
        // static conf spark.sql.extensions only applies at context creation
        // (as in Verify/Bench); a second session on the shared context needs
        // the programmatic hook
        ext = org.apache.spark.sql.SparkSession.builder()
          .withExtensions(new GraftSparkExtensions().apply(_))
          .getOrCreate()
        org.apache.spark.sql.SparkSession.setDefaultSession(base)
        org.apache.spark.sql.SparkSession.setActiveSession(base)
      }
      ext
    }
}
