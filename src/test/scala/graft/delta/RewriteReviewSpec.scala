package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-10 rewrite-core review — one test per found
  * failure scenario. */
class RewriteReviewSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("DV DELETE change feed derives from the STAGED positions (non-deterministic predicate)") {
    val dir = tempTable("rr2-dv-cdf").toString
    GraftWriter.write((0 until 200).map(i => (i.toLong, "x")).toDF("id", "v"), dir,
      configuration = Some(Map(
        TableConfig.EnableDeletionVectors -> "true",
        TableConfig.EnableChangeDataFeed -> "true")))
    val before = DeltaTable.forPath(spark, dir).toDF.select("id").as[Long].collect().toSet
    // a sampling delete: re-evaluating the predicate would select a
    // DIFFERENT row set for the images than the one actually DV'd out
    val m = Dml.delete(spark, dir, rand(seed = 0) < 0.5 && col("id") >= 0)
    val after = DeltaTable.forPath(spark, dir).toDF.select("id").as[Long].collect().toSet
    val reallyDeleted = before -- after
    assert(reallyDeleted.nonEmpty && after.nonEmpty, "sampling should split the table")
    val images = DeltaTable.forPath(spark, dir).changes(m.version - 1, m.version)
      .filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet
    assert(images == reallyDeleted,
      s"delete images diverge from the DV: extra=${images -- reallyDeleted} missing=${reallyDeleted -- images}")
  }

  test("direct deleteWithDv/updateWithDv enforce the router's guards") {
    val dir = tempTable("rr2-dv-guards").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir) // DV property OFF
    val e = intercept[IllegalStateException](
      Dml.deleteWithDv(spark, dir, col("id") === 1L))
    assert(e.getMessage.contains("enableDeletionVectors"))
    intercept[IllegalStateException](
      Dml.updateWithDv(spark, dir, col("id") === 1L, Map("v" -> lit("z"))))

    // GENERATED ALWAYS identity refuses explicit assignment on the DV path
    val dir2 = tempTable("rr2-dv-identity").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      IdentityColumns.field("rid", 1, 1),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    GraftWriter.write(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema), dir2,
      configuration = Some(Map(TableConfig.EnableDeletionVectors -> "true")))
    GraftWriter.write(Seq("a").toDF("v"), dir2, SaveMode.Append)
    val e2 = intercept[IllegalArgumentException](
      Dml.updateWithDv(spark, dir2, col("v") === "a", Map("RID" -> lit(9L))))
    assert(e2.getMessage.contains("GENERATED ALWAYS"))
  }

  test("UPDATE cannot assign the hidden materialized row-tracking columns") {
    val dir = tempTable("rr2-hidden-assign").toString
    GraftWriter.write((0 until 5).map(i => (i.toLong, "a")).toDF("id", "v"), dir,
      configuration = Some(Map(TableConfig.EnableRowTracking -> "true")))
    // materialize the columns via a first rewrite
    Dml.update(spark, dir, col("id") === 1L, Map("v" -> lit("b")))
    val names = RowTracking.materializedCols(
      DeltaLog.forPath(spark, dir).update()).get
    val e = intercept[IllegalArgumentException](
      Dml.update(spark, dir, lit(true), Map(names._1 -> lit(0L))))
    assert(e.getMessage.contains("unknown columns"))
  }

  test("MERGE with a non-deterministic source inserts no duplicate keys") {
    val dir = tempTable("rr2-merge-nondet").toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, 0.0)).toDF("id", "v")
      .repartition(4), dir)
    // rand-derived keys: the two executions (detection, rewrite) would
    // disagree without the pinned source
    val src = spark.range(0, 30)
      .select((rand(seed = 7) * lit(40)).cast("long").as("id"),
        lit(1.0).as("v"))
      .dropDuplicates("id")
    val m = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedInsertAll()
      .execute()
    assert(m.rowsInserted >= 0)
    val ids = DeltaTable.forPath(spark, dir).toDF.select("id").as[Long].collect()
    assert(ids.distinct.length == ids.length,
      s"duplicate keys after merge: ${ids.groupBy(identity).filter(_._2.length > 1).keys}")
  }

  test("compact converges: a compacted table no-ops instead of re-churning") {
    val dir = tempTable("rr2-compact-converge").toString
    GraftWriter.write((0 until 2000).map(i => (i.toLong, "x" * 50)).toDF("id", "v")
      .repartition(8), dir)
    val m1 = Optimize.compact(spark, dir)
    assert(m1.filesRemoved == 8 && m1.filesAdded >= 1)
    val m2 = Optimize.compact(spark, dir)
    assert(m2.filesRemoved == 0 && m2.filesAdded == 0,
      "a converged table must not re-churn on the next maintenance run")
    // at-target files never re-pack even with peers: two files each at
    // the target stay put
    val snap = DeltaLog.forPath(spark, dir).update()
    val bytes = snap.files.map(_.size).sum
    val m3 = Optimize.compact(spark, dir, targetFileBytes = math.max(1, bytes / 4))
    // every current file is >= bytes/4? If one file: no candidates either way
    assert(m3.version >= m1.version)
  }

  test("compact on a clustered table delegates to the incremental cluster path") {
    val dir = tempTable("rr2-compact-clustered").toString
    GraftWriter.write((0 until 1000).map(i => ((i * 37 % 1000).toLong, s"v$i"))
      .toDF("id", "v").repartition(4), dir)
    DeltaTable.forPath(spark, dir).clusterBy(Seq("id"))
    val m = Optimize.compact(spark, dir, targetFileBytes = 16 * 1024)
    assert(m.filesRemoved == 4)
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.files.forall(_.tags.exists(_.contains(Optimize.ClusterSpecTag))),
      "compaction on a clustered table must produce CLUSTERED (tagged) output")
    // and it stays incremental: nothing new -> no churn
    val m2 = Optimize.compact(spark, dir, targetFileBytes = 16 * 1024)
    assert(m2.filesRemoved == 0)
  }
}
