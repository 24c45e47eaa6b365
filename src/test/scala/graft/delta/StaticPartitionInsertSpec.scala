package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-scoped SQL INSERT semantics over graft-delta tables, expressed
  * as log actions instead of directory deletes. */
class StaticPartitionInsertSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def ext = InsertIntoSpec.extensionSession(spark)

  private def mk(name: String, tbl: String): String = {
    val dir = tempTable(name).toString
    GraftWriter.write(Seq((1L, 0), (2L, 1), (3L, 1)).toDF("id", "p"), dir,
      org.apache.spark.sql.SaveMode.ErrorIfExists, Seq("p"))
    ext.sql(s"CREATE TABLE $tbl USING `graft-delta` OPTIONS (path '$dir')")
    dir
  }

  test("INSERT INTO PARTITION (p=7) appends into the named partition") {
    val dir = mk("sp-append", "g_sp_a")
    try {
      ext.sql("INSERT INTO g_sp_a PARTITION (p=7) (id) VALUES (9)")
      val dt = DeltaTable.forPath(ext, dir)
      assert(dt.toDF.count() == 4)
      assert(dt.toDF.filter(col("p") === 7).select("id").as[Long](ext.implicits.newLongEncoder).head() == 9L)
      assert(dt.log.update().version == 1)
    } finally ext.sql("DROP TABLE g_sp_a")
  }

  test("INSERT OVERWRITE PARTITION (p=1) replaces only that partition") {
    val dir = mk("sp-ow", "g_sp_o")
    try {
      ext.sql("INSERT OVERWRITE TABLE g_sp_o PARTITION (p=1) (id) VALUES (99)")
      val dt = DeltaTable.forPath(ext, dir)
      val rows = dt.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(rows == Seq((1L, 0), (99L, 1))) // p=0 untouched, p=1 replaced
      // time travel still sees the replaced rows
      assert(DeltaTable.forPath(ext, dir, 0).toDF.count() == 3)
    } finally ext.sql("DROP TABLE g_sp_o")
  }

  test("dynamic partitionOverwriteMode replaces only touched partitions") {
    val dir = mk("sp-dyn", "g_sp_d")
    try {
      ext.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        ext.sql("INSERT OVERWRITE TABLE g_sp_d VALUES (50, 1)")
        val dt = DeltaTable.forPath(ext, dir)
        val rows = dt.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
        assert(rows == Seq((1L, 0), (50L, 1))) // p=0 kept, p=1 replaced
      } finally ext.conf.unset("spark.sql.sources.partitionOverwriteMode")
    } finally ext.sql("DROP TABLE g_sp_d")
  }
}
