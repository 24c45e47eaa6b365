package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** The delta-inspect CLI's output contract (S17,
  * rust/src/bin/delta-inspect.rs:10-68) — previously only smoke-tested. */
class InspectSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def table(): String = {
    val dir = tempTable("inspect").toString
    GraftWriter.write(
      (0 until 40).map(i => (i.toLong, s"v$i", i % 2)).toDF("id", "v", "p"),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    GraftWriter.write(
      Seq((100L, "x", 0)).toDF("id", "v", "p"), dir, SaveMode.Append, Seq("p"))
    dir
  }

  test("info reports version, schema, partitioning, stats, tombstones") {
    val dir = table()
    val out = Inspect.render(DeltaTable.forPath(spark, dir), "info")
    assert(out.exists(_ == "version: 1"))
    assert(out.exists(l => l.startsWith("schema:") && l.contains("id:bigint")))
    assert(out.exists(_ == "partitions: p"))
    // footer stats give the exact logical row count
    assert(out.exists(l => l.startsWith("files:") && l.endsWith("rows: 41")))
    assert(out.exists(_ == "tombstones: 0"))
  }

  test("files lists exactly the live snapshot's paths; --version time-travels") {
    val dir = table()
    val dt = DeltaTable.forPath(spark, dir)
    val files = Inspect.render(dt, "files")
    assert(files.toSet == dt.files.map(_.path).toSet && files.nonEmpty)
    assert(files.forall(p => p.contains("p=0") || p.contains("p=1")))

    val v0 = Inspect.render(DeltaTable.forPath(spark, dir, 0), "files")
    assert(v0.size < files.size) // the append's file is not yet there
    assert(v0.toSet.subsetOf(files.toSet))
  }

  test("unknown command is rejected") {
    val dir = table()
    intercept[IllegalArgumentException] {
      Inspect.render(DeltaTable.forPath(spark, dir), "nope")
    }
  }

  test("info surfaces protocol, clustering, domains, and the ICT clock") {
    val dir = table()
    DeltaTable.forPath(spark, dir).setProperties(
      Map(TableConfig.EnableInCommitTimestamps -> "true"))
    DeltaTable.forPath(spark, dir).clusterBy(Seq("id"))
    DeltaTable.forPath(spark, dir).setDomainMetadata("app.x", "1")
    val out = Inspect.render(DeltaTable.forPath(spark, dir), "info")
    assert(out.exists(l => l.startsWith("protocol: reader") &&
      l.contains("inCommitTimestamp")))
    assert(out.contains("clusterBy: id"))
    assert(out.exists(_.startsWith("domains: app.x")))
    assert(out.exists(_.startsWith("inCommitTimestamp: ")))
  }
}
