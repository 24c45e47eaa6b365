package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL DELETE/UPDATE/MERGE over graft-delta catalog tables (GraftSqlDml
  * hint-stage rewrite; requires GraftSparkExtensions, like Delta Lake). */
class SqlDmlSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def ext = InsertIntoSpec.extensionSession(spark)

  private def mkTable(name: String, tbl: String): String = {
    val dir = tempTable(name).toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), dir)
    ext.sql(s"CREATE TABLE $tbl USING `graft-delta` OPTIONS (path '$dir')")
    dir
  }

  test("DELETE FROM with alias-qualified predicate") {
    val dir = mkTable("sqldml-del", "g_del")
    try {
      val out = ext.sql("DELETE FROM g_del x WHERE x.id < 3").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(3L))
      assert(ext.sql("SELECT count(*) FROM g_del").head().getLong(0) == 7)
      assert(DeltaLog.forPath(ext, dir).update().version == 1)
    } finally ext.sql("DROP TABLE g_del")
  }

  test("UPDATE SET with expression referencing the row") {
    val dir = mkTable("sqldml-upd", "g_upd")
    try {
      val out = ext.sql("UPDATE g_upd SET v = v + 100 WHERE id >= 8").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(2L))
      val rows = ext.sql("SELECT id, v FROM g_upd ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.count { case (id, v) => v == id + 100.0 } == 2)
      assert(rows.count { case (id, v) => v == id.toDouble } == 8)
      assert(DeltaLog.forPath(ext, dir).update().version == 1)
    } finally ext.sql("DROP TABLE g_upd")
  }

  test("MERGE INTO with custom aliases, UPDATE SET and INSERT *") {
    val dir = mkTable("sqldml-merge", "g_mrg")
    try {
      val out = ext.sql(
        """MERGE INTO g_mrg tgt
          |USING (SELECT 5 AS id, 500.0 AS v UNION ALL SELECT 50 AS id, 50.0 AS v) src
          |ON tgt.id = src.id
          |WHEN MATCHED THEN UPDATE SET v = src.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(2L)) // 1 update + 1 insert
      val rows = ext.sql("SELECT id, v FROM g_mrg ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.length == 11)
      assert(rows.find(_._1 == 5L).get._2 == 500.0)
      assert(rows.find(_._1 == 50L).get._2 == 50.0)
    } finally ext.sql("DROP TABLE g_mrg")
  }

  test("MERGE with UPDATE SET * and WHEN MATCHED DELETE condition") {
    val dir = mkTable("sqldml-merge2", "g_mrg2")
    try {
      ext.sql(
        """MERGE INTO g_mrg2 t2
          |USING (SELECT 1 AS id, -1.0 AS v UNION ALL SELECT 2 AS id, -2.0 AS v) s2
          |ON t2.id = s2.id
          |WHEN MATCHED AND t2.id = 2 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
      val rows = ext.sql("SELECT id, v FROM g_mrg2 ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.length == 9) // id=2 deleted
      assert(!rows.exists(_._1 == 2L))
      assert(rows.find(_._1 == 1L).get._2 == -1.0)
    } finally ext.sql("DROP TABLE g_mrg2")
  }

  test("MERGE with WHEN NOT MATCHED BY SOURCE (sync-table shape)") {
    val dir = mkTable("sqldml-bysource", "g_bys")
    try {
      val out = ext.sql(
        """MERGE INTO g_bys t USING (SELECT 5 AS id, 500.0 AS v) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE AND t.id < 2 THEN DELETE""".stripMargin).collect()
      assert(out.head.getLong(0) == 3) // 1 update + 2 deletes
      val ids = ext.sql("SELECT id FROM g_bys ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
      assert(ext.sql("SELECT v FROM g_bys WHERE id = 5").head().getDouble(0) == 500.0)
    } finally ext.sql("DROP TABLE g_bys")
  }

  test("DELETE with an IN-subquery predicate resolves against session views") {
    val dir = mkTable("sqldml-subq", "g_subq")
    try {
      ext.createDataset(Seq(1L, 3L))(ext.implicits.newLongEncoder)
        .toDF("bad_id").createOrReplaceTempView("bad_ids")
      val out = ext.sql(
        "DELETE FROM g_subq WHERE id IN (SELECT bad_id FROM bad_ids)").collect()
      assert(out.head.getLong(0) == 2)
      val ids = ext.sql("SELECT id FROM g_subq ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(0L, 2L, 4L, 5L, 6L, 7L, 8L, 9L))
    } finally ext.sql("DROP TABLE g_subq")
  }

  test("DML statements on non-graft tables keep Spark's normal behavior") {
    val dir = tempTable("sqldml-plain").toString
    (0 until 5).map(i => (i.toLong, s"x$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    ext.sql(s"CREATE TABLE plain_pq USING parquet OPTIONS (path '$dir')")
    try {
      val e = intercept[Exception] {
        ext.sql("DELETE FROM plain_pq WHERE id = 1")
      }
      assert(e.getMessage.contains("does not support DELETE"))
    } finally ext.sql("DROP TABLE plain_pq")
  }

  test("MERGE with an UNALIASED source remaps its table-name qualifiers (r11)") {
    val dir = mkTable("sqldml-unaliased", "g_unal")
    try {
      // registered on the EXTENSION session (temp views are per-session)
      ext.sql("""CREATE OR REPLACE TEMPORARY VIEW unal_src AS
                |SELECT CAST(id AS BIGINT) AS id, CAST(v AS DOUBLE) AS v
                |FROM VALUES (8, 800.0), (20, 2000.0) AS t(id, v)""".stripMargin)
      // table-name (not alias) qualifiers everywhere — sAlias was empty
      // for UnresolvedRelation sources and the merge failed analysis
      val out = ext.sql(
        """MERGE INTO g_unal USING unal_src
          |ON g_unal.id = unal_src.id
          |WHEN MATCHED THEN UPDATE SET v = unal_src.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (unal_src.id, unal_src.v)
          |""".stripMargin).collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(2L))
      val rows = ext.sql("SELECT id, v FROM g_unal WHERE id IN (8, 20) ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows == Seq((8L, 800.0), (20L, 2000.0)))
    } finally { ext.sql("DROP TABLE g_unal"); ext.catalog.dropTempView("unal_src") }
  }

  test("nested-field assignment refuses loudly instead of hitting a same-named column (r11)") {
    val dir = mkTable("sqldml-nested", "g_nested")
    try {
      val e = intercept[Exception](
        ext.sql("UPDATE g_nested SET addr.city = 'x' WHERE id = 1"))
      assert(e.getMessage.contains("nested-field assignment"), e.getMessage)
    } finally ext.sql("DROP TABLE g_nested")
  }

  test("a temp view shadowing a graft table is not mutated by DML (r11)") {
    val dir = mkTable("sqldml-shadow", "g_shadow_tbl")
    try {
      // temp view with the SAME name as a second catalog table entry
      ext.sql(s"CREATE TABLE g_shadow USING `graft-delta` OPTIONS (path '$dir')")
      ext.sql("CREATE TEMPORARY VIEW g_shadow AS SELECT * FROM g_shadow_tbl WHERE id < 5")
      val e = intercept[Exception](ext.sql("DELETE FROM g_shadow WHERE id = 1"))
      // stock Spark rejects DML on views; the physical table must be intact
      assert(ext.sql("SELECT count(*) FROM g_shadow_tbl").head().getLong(0) == 10,
        s"physical table mutated through the shadowing view (error was $e)")
    } finally {
      ext.catalog.dropTempView("g_shadow")
      ext.sql("DROP TABLE g_shadow")
      ext.sql("DROP TABLE g_shadow_tbl")
    }
  }
}
