package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 session-catalog extension (DeltaCatalog role): SQL DDL is
  * transactional against the Delta log, reads/writes stay on the optimized
  * V1 paths. The shared test session registers
  * `spark.sql.catalog.spark_catalog = graft.delta.catalog.GraftCatalog`. */
class GraftCatalogSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def withTable(names: String*)(f: => Unit): Unit =
    try f finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("CREATE TABLE on a fresh location initializes the delta log (v0)") {
    val dir = tempTable("cat-create").toString
    withTable("cat_create_t") {
      spark.sql(
        s"""CREATE TABLE cat_create_t (id BIGINT, v STRING)
           |USING `graft-delta` LOCATION '$dir'""".stripMargin)
      val dt = DeltaTable.forPath(spark, dir)
      assert(dt.version == 0)
      assert(dt.schema.fieldNames.toSeq == Seq("id", "v"))
      assert(dt.toDF.count() == 0)
      // the metastore entry resolves and reads through the V1 scan path
      assert(spark.table("cat_create_t").count() == 0)
      spark.sql("INSERT INTO cat_create_t VALUES (1, 'a'), (2, 'b')")
      assert(spark.table("cat_create_t").count() == 2)
      assert(DeltaTable.forPath(spark, dir).version == 1) // one log commit
    }
  }

  test("CREATE TABLE PARTITIONED BY + TBLPROPERTIES lands in the log") {
    val dir = tempTable("cat-part").toString
    withTable("cat_part_t") {
      spark.sql(
        s"""CREATE TABLE cat_part_t (id BIGINT, p STRING)
           |USING `graft-delta` PARTITIONED BY (p) LOCATION '$dir'
           |TBLPROPERTIES ('delta.appendOnly' = 'true')""".stripMargin)
      val snap = DeltaLog.forPath(spark, dir).update()
      assert(snap.partitionColumns == Seq("p"))
      assert(TableConfig.appendOnly(TableConfig.of(snap)))
      // appendOnly enforced through the catalog-table DML surface too
      spark.sql("INSERT INTO cat_part_t VALUES (1, 'a')")
      assert(spark.table("cat_part_t").count() == 1)
    }
  }

  test("CREATE TABLE on an existing delta location adopts the log schema") {
    val dir = tempTable("cat-adopt").toString
    (0 until 30).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(dir)
    withTable("cat_adopt_t") {
      // no column list: schema comes from the log
      spark.sql(s"CREATE TABLE cat_adopt_t USING `graft-delta` LOCATION '$dir'")
      assert(spark.table("cat_adopt_t").count() == 30)
      assert(spark.table("cat_adopt_t").schema.fieldNames.toSeq == Seq("id", "v"))
      // mismatched declared schema is rejected
      intercept[Exception] {
        spark.sql(s"CREATE TABLE cat_adopt_bad (x INT) USING `graft-delta` LOCATION '$dir'")
      }
    }
  }

  test("TIMESTAMP_NTZ DDL columns adopt a timestamp-typed table (NTZ normalization)") {
    val dir = tempTable("cat-adopt-ntz").toString
    (0 until 5).map(i => (i.toLong, s"2024-01-0${i + 1} 10:00:00")).toDF("id", "s")
      .selectExpr("id", "CAST(s AS TIMESTAMP_NTZ) AS ts")
      .write.format("graft-delta").save(dir)
    withTable("cat_adopt_ntz") {
      // declared NTZ column ≡ the protocol `timestamp` the log recorded
      spark.sql(
        s"""CREATE TABLE cat_adopt_ntz (id BIGINT, ts TIMESTAMP_NTZ)
           |USING `graft-delta` LOCATION '$dir'""".stripMargin)
      assert(spark.table("cat_adopt_ntz").count() == 5)
    }
  }

  test("CTAS writes through one transactional commit") {
    val dir = tempTable("cat-ctas").toString
    withTable("cat_ctas_t") {
      spark.sql(
        s"""CREATE TABLE cat_ctas_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id, id * 2 AS dbl FROM range(0, 50)""".stripMargin)
      assert(spark.table("cat_ctas_t").count() == 50)
      val dt = DeltaTable.forPath(spark, dir)
      assert(dt.toDF.agg(sum("dbl")).head.getLong(0) == (0 until 50).map(_ * 2).sum)
      assert(dt.version == 1) // v0 create + v1 data commit
    }
  }

  test("partitioned CTAS respects the declared partitioning") {
    val dir = tempTable("cat-ctas-part").toString
    withTable("cat_ctas_p") {
      spark.sql(
        s"""CREATE TABLE cat_ctas_p USING `graft-delta`
           |PARTITIONED BY (p) LOCATION '$dir'
           |AS SELECT id, CAST(id % 3 AS STRING) AS p FROM range(0, 30)""".stripMargin)
      val snap = DeltaLog.forPath(spark, dir).update()
      assert(snap.partitionColumns == Seq("p"))
      assert(snap.files.forall(_.partitionValues.contains("p")))
      assert(spark.table("cat_ctas_p").where(col("p") === "1").count() == 10)
    }
  }

  test("ALTER TABLE ADD COLUMNS commits schema evolution to the log") {
    val dir = tempTable("cat-alter").toString
    withTable("cat_alter_t") {
      spark.sql(
        s"""CREATE TABLE cat_alter_t (id BIGINT, v STRING)
           |USING `graft-delta` LOCATION '$dir'""".stripMargin)
      spark.sql("INSERT INTO cat_alter_t VALUES (1, 'a')")
      spark.sql("ALTER TABLE cat_alter_t ADD COLUMNS (extra INT)")
      val snap = DeltaLog.forPath(spark, dir).update()
      assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
      // old rows read as null in the new column; new rows carry values
      spark.sql("INSERT INTO cat_alter_t VALUES (2, 'b', 7)")
      val rows = spark.table("cat_alter_t").orderBy("id")
        .select("id", "extra").collect()
      assert(rows.map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSeq ==
        Seq((1L, -1), (2L, 7)))
    }
  }

  test("ALTER TABLE ADD COLUMNS on a PARTITIONED table keeps hive column order") {
    // Regression (q58): hive-style metastores require partition columns
    // last; a delegated AddColumn appends after them and trips the catalog's
    // ordering assertion. The log keeps declared order either way.
    val dir = tempTable("cat-alter-part").toString
    withTable("cat_alter_p") {
      spark.sql(
        s"""CREATE TABLE cat_alter_p USING `graft-delta`
           |PARTITIONED BY (p) LOCATION '$dir'
           |AS SELECT id, CAST(id % 2 AS STRING) AS p FROM range(0, 10)""".stripMargin)
      spark.sql("ALTER TABLE cat_alter_p ADD COLUMNS (extra BIGINT)")
      val snap = DeltaLog.forPath(spark, dir).update()
      assert(snap.schema.fieldNames.toSeq == Seq("id", "p", "extra"))
      spark.sql("INSERT INTO cat_alter_p VALUES (100, '9', 7)")
      assert(spark.table("cat_alter_p")
        .where(col("extra") === 7).count() == 1)
      assert(spark.table("cat_alter_p").count() == 11)
    }
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES round-trips through the log") {
    val dir = tempTable("cat-props").toString
    withTable("cat_props_t") {
      spark.sql(
        s"""CREATE TABLE cat_props_t (id BIGINT)
           |USING `graft-delta` LOCATION '$dir'""".stripMargin)
      spark.sql("ALTER TABLE cat_props_t SET TBLPROPERTIES " +
        "('delta.checkpointInterval' = '5')")
      var cfg = TableConfig.of(DeltaLog.forPath(spark, dir).update())
      assert(TableConfig.checkpointInterval(cfg) == 5)
      spark.sql("ALTER TABLE cat_props_t UNSET TBLPROPERTIES ('delta.checkpointInterval')")
      cfg = TableConfig.of(DeltaLog.forPath(spark, dir).update())
      assert(!cfg.contains("delta.checkpointInterval"))
      // invalid delta.* values are rejected before touching the log
      intercept[Exception] {
        spark.sql("ALTER TABLE cat_props_t SET TBLPROPERTIES ('delta.appendOnly' = 'banana')")
      }
    }
  }

  test("path identifier `graft-delta`.`/path` resolves without a metastore entry") {
    val dir = tempTable("cat-pathident").toString
    (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(dir)
    assert(spark.sql(s"SELECT count(*) FROM `graft-delta`.`$dir`").head.getLong(0) == 20)
    Seq((100L, "x")).toDF("id", "v").write.format("graft-delta").mode("append").save(dir)
    assert(spark.sql(s"SELECT count(*) FROM `graft-delta`.`$dir`").head.getLong(0) == 21)
  }

  test("SQL time travel through the catalog: VERSION AS OF / TIMESTAMP AS OF") {
    val dir = tempTable("cat-asof").toString
    Seq((1L, "a")).toDF("id", "v").write.format("graft-delta").save(dir)
    Seq((2L, "b")).toDF("id", "v").write.format("graft-delta").mode("append").save(dir)
    assert(spark.sql(s"SELECT count(*) FROM `graft-delta`.`$dir` VERSION AS OF 0")
      .head.getLong(0) == 1)
    withTable("cat_asof_t") {
      spark.sql(s"CREATE TABLE cat_asof_t USING `graft-delta` LOCATION '$dir'")
      assert(spark.sql("SELECT count(*) FROM cat_asof_t VERSION AS OF 0").head.getLong(0) == 1)
      assert(spark.sql("SELECT count(*) FROM cat_asof_t").head.getLong(0) == 2)
    }
  }

  test("CREATE OR REPLACE TABLE AS SELECT replaces contents and schema in one commit") {
    val dir = tempTable("cat-replace").toString
    withTable("cat_rep_t") {
      spark.sql(
        s"""CREATE TABLE cat_rep_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id, CAST(id AS STRING) AS v FROM range(0, 20)""".stripMargin)
      val v0 = DeltaTable.forPath(spark, dir).version
      spark.sql(
        s"""CREATE OR REPLACE TABLE cat_rep_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id * 10 AS key, CAST(id AS DOUBLE) AS score FROM range(0, 5)""".stripMargin)
      // new schema + contents, same location, ONE more commit
      val dt = DeltaTable.forPath(spark, dir)
      assert(dt.schema.fieldNames.toSeq == Seq("key", "score"))
      assert(spark.table("cat_rep_t").count() == 5)
      assert(dt.version == v0 + 1)
      // time travel to the pre-replace table still works
      assert(spark.read.format("graft-delta").option("versionAsOf", v0).load(dir)
        .schema.fieldNames.toSeq == Seq("id", "v"))
    }
  }

  test("REPLACE TABLE without AS SELECT empties the table with the new schema") {
    val dir = tempTable("cat-replace-empty").toString
    withTable("cat_repe_t") {
      spark.sql(
        s"""CREATE TABLE cat_repe_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id FROM range(0, 9)""".stripMargin)
      spark.sql(
        s"""REPLACE TABLE cat_repe_t (a BIGINT, b STRING)
           |USING `graft-delta` LOCATION '$dir'""".stripMargin)
      assert(spark.table("cat_repe_t").count() == 0)
      assert(DeltaTable.forPath(spark, dir).schema.fieldNames.toSeq == Seq("a", "b"))
      // REPLACE (no OR CREATE) on a missing table is an error
      intercept[Exception] {
        spark.sql("REPLACE TABLE cat_rep_missing (x INT) USING `graft-delta`")
      }
    }
  }

  test("DML (DELETE/UPDATE/MERGE) still works on catalog tables") {
    val dir = tempTable("cat-dml").toString
    withTable("cat_dml_t") {
      spark.sql(
        s"""CREATE TABLE cat_dml_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id, CAST(id AS STRING) AS v FROM range(0, 40)""".stripMargin)
      spark.sql("DELETE FROM cat_dml_t WHERE id >= 30")
      assert(spark.table("cat_dml_t").count() == 30)
      spark.sql("UPDATE cat_dml_t SET v = 'young' WHERE id < 5")
      assert(spark.table("cat_dml_t").where(col("v") === "young").count() == 5)
    }
  }

  test("TRUNCATE TABLE is one commit; history and schema survive") {
    val dir = tempTable("cat-truncate").toString
    withTable("cat_trunc_t") {
      spark.sql(
        s"""CREATE TABLE cat_trunc_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id, CAST(id AS STRING) AS v FROM range(0, 30)""".stripMargin)
      val before = DeltaTable.forPath(spark, dir).version
      spark.sql("TRUNCATE TABLE cat_trunc_t")
      assert(spark.table("cat_trunc_t").count() == 0)
      val dt = DeltaTable.forPath(spark, dir)
      assert(dt.version == before + 1) // exactly one commit
      assert(dt.schema.fieldNames.toSeq == Seq("id", "v"))
      assert(DeltaTable.forPath(spark, dir, before).toDF.count() == 30) // time travel
      spark.sql("INSERT INTO cat_trunc_t VALUES (99, 'x')") // still writable
      assert(spark.table("cat_trunc_t").count() == 1)
    }
  }

  test("self-join, views and caching work over the converted v2 relation") {
    val dir = tempTable("cat-edge").toString
    withTable("cat_edge_t") {
      spark.sql(
        s"""CREATE TABLE cat_edge_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id, id % 5 AS grp FROM range(0, 50)""".stripMargin)
      // self-join: each side resolves to its own relation instance with
      // distinct exprIds
      val selfJoin = spark.sql(
        """SELECT a.id FROM cat_edge_t a JOIN cat_edge_t b
          |ON a.id = b.id + 1""".stripMargin)
      assert(selfJoin.count() == 49)
      // view over the catalog table
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW cat_edge_v AS " +
        "SELECT grp, count(*) AS n FROM cat_edge_t GROUP BY grp")
      assert(spark.sql("SELECT count(*) FROM cat_edge_v").head.getLong(0) == 5)
      // caching the converted plan
      val df = spark.table("cat_edge_t").filter(col("grp") === 1)
      df.cache()
      try {
        assert(df.count() == 10)
        assert(df.count() == 10)
      } finally df.unpersist()
      // aggregate pushes through the conversion (stats rewrite or scan)
      assert(spark.sql("SELECT max(id) FROM cat_edge_t").head.getLong(0) == 49)
    }
  }

  test("readStream.table on a catalog graft table tails the log") {
    val dir = tempTable("cat-rstream").toString
    val ckpt = tempTable("cat-rstream-ckpt").toString
    withTable("cat_stream_t") {
      spark.sql(
        s"""CREATE TABLE cat_stream_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id, CAST(id AS STRING) AS v FROM range(0, 3)""".stripMargin)
      val q = spark.readStream.table("cat_stream_t")
        .writeStream.format("memory").queryName("cat_stream_out")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("cat_stream_out").count() == 3)
        spark.sql("INSERT INTO cat_stream_t VALUES (9, 'x')")
        q.processAllAvailable()
        assert(spark.table("cat_stream_out").count() == 4) // tails new commits
      } finally q.stop()
    }
  }

  test("failed CTAS aborts: no metastore entry survives") {
    val dir = tempTable("cat-ctas-fail").toString
    withTable("cat_fail_t") {
      intercept[Exception] {
        spark.sql(
          s"""CREATE TABLE cat_fail_t USING `graft-delta` LOCATION '$dir'
             |AS SELECT id, CAST(1 AS INT) / CAST(id - id AS INT) AS boom
             |FROM range(0, 10)""".stripMargin) // ANSI division by zero
      }
      // the staged create was aborted: the name must be free again
      assert(!spark.catalog.tableExists("cat_fail_t"))
      // and reusable
      spark.sql(
        s"""CREATE TABLE cat_fail_t USING `graft-delta` LOCATION '$dir'
           |AS SELECT id FROM range(0, 3)""".stripMargin)
      assert(spark.table("cat_fail_t").count() == 3)
    }
  }

  test("SQL CREATE/ALTER with deletion vectors apply the reader fence") {
    // SQL must not be a fence-less side door: a DV table that a foreign
    // reader can open at minReaderVersion 1 silently resurrects deleted rows
    val dir1 = tempTable("cat-dv-create").toString
    withTable("cat_dv_create_t") {
      spark.sql(
        s"""CREATE TABLE cat_dv_create_t (id BIGINT, v STRING)
           |USING `graft-delta` LOCATION '$dir1'
           |TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')""".stripMargin)
      assert(DeltaLog.forPath(spark, dir1).update().minReaderVersion == 3)
    }
    val dir2 = tempTable("cat-dv-alter").toString
    withTable("cat_dv_alter_t") {
      spark.sql(
        s"""CREATE TABLE cat_dv_alter_t (id BIGINT, v STRING)
           |USING `graft-delta` LOCATION '$dir2'""".stripMargin)
      assert(DeltaLog.forPath(spark, dir2).update().minReaderVersion == 1)
      spark.sql("ALTER TABLE cat_dv_alter_t SET TBLPROPERTIES " +
        "('delta.enableDeletionVectors' = 'true')")
      assert(DeltaLog.forPath(spark, dir2).update().minReaderVersion == 3)
    }
  }

  test("REPLACE TABLE commits its TBLPROPERTIES to the log (and fences DVs)") {
    val dir = tempTable("cat-replace-props").toString
    withTable("cat_rp_t") {
      spark.sql(
        s"""CREATE TABLE cat_rp_t (id BIGINT) USING `graft-delta`
           |LOCATION '$dir' TBLPROPERTIES ('delta.appendOnly' = 'true')""".stripMargin)
      assert(TableConfig.appendOnly(
        TableConfig.of(DeltaLog.forPath(spark, dir).update())))
      // REPLACE with different properties: the declared set REPLACES the
      // old one in the log (previously validated then silently dropped)
      spark.sql(
        s"""CREATE OR REPLACE TABLE cat_rp_t (id BIGINT, v STRING)
           |USING `graft-delta` LOCATION '$dir'
           |TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')""".stripMargin)
      val snap = DeltaLog.forPath(spark, dir).update()
      val cfg = TableConfig.of(snap)
      assert(TableConfig.deletionVectorsEnabled(cfg))
      assert(!TableConfig.appendOnly(cfg), "REPLACE replaces properties")
      assert(snap.minReaderVersion == 3, "DV fence rides the replace commit")
      // and time travel still reaches the pre-replace state
      assert(DeltaTable.forPath(spark, dir, snap.version - 1)
        .snapshot.metadata.exists(_.configuration.contains(TableConfig.AppendOnly)))
    }
  }

  test("non-graft providers pass through the delegate untouched") {
    val dir = tempTable("cat-parquet").toString
    withTable("cat_pq_t") {
      spark.sql(
        s"""CREATE TABLE cat_pq_t USING parquet LOCATION '$dir'
           |AS SELECT id FROM range(0, 10)""".stripMargin)
      assert(spark.table("cat_pq_t").count() == 10)
      // no _delta_log was created for a parquet table
      assert(!new java.io.File(dir, "_delta_log").exists())
    }
  }
}
