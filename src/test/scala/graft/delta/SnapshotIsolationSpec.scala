package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reader-isolation semantics under concurrent table churn — which reads
  * pin a snapshot and which follow the log:
  *
  *  - a [[DeltaTable]] handle PINS its snapshot: DML/overwrite/optimize
  *    landing after `forPath` are invisible to that handle (the Delta
  *    snapshot-isolation contract);
  *  - the pinned files stay readable because churn only TOMBSTONES them
  *    and vacuum's retention floor (168 h default) keeps fresh tombstones
  *    on disk — so a long-running query cannot lose its inputs;
  *  - the format/catalog read path is LIVE: a DataFrame created before the
  *    churn and executed after it resolves the current snapshot
  *    (latest-at-execution, upstream Delta's behavior for format reads);
  *  - time-travel reads stay pinned forever regardless of churn.
  */
class SnapshotIsolationSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("a DeltaTable handle pins its snapshot across overwrite + DML + optimize") {
    val dir = tempTable("iso-pin").toString
    (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2)
      .write.format("graft-delta").save(dir)

    val pinned = DeltaTable.forPath(spark, dir) // snapshot at version 0

    // churn: delete, append, compact — three more versions
    Dml.delete(spark, dir, col("id") < 10)
    Seq((500L, "new")).toDF("id", "v").write.format("graft-delta")
      .mode("append").save(dir)
    Optimize.compact(spark, dir)
    assert(DeltaLog.forPath(spark, dir).update().version >= 3)

    // the pinned handle still reads version 0 exactly
    assert(pinned.toDF.count() == 50)
    assert(pinned.toDF.filter(col("id") < 10).count() == 10) // deleted rows visible
    assert(pinned.toDF.filter(col("id") === 500).count() == 0) // append invisible

    // and vacuum (retention floor) cannot reclaim the pinned files yet
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.vacuum(dryRun = true).isEmpty, "fresh tombstones must be retained")
    assert(pinned.toDF.count() == 50) // still intact after the dry run

    // a fresh handle sees the churned state
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 41) // 50 - 10 + 1
  }

  test("format reads are live: a pre-churn DataFrame resolves the post-churn snapshot") {
    val dir = tempTable("iso-live").toString
    (0 until 30).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("graft-delta").save(dir)

    val live = spark.read.format("graft-delta").load(dir) // plan built now
    assert(live.count() == 30)

    Seq((900L, "late")).toDF("id", "v").write.format("graft-delta")
      .mode("append").save(dir)
    // latest-at-execution: the same DataFrame now sees the append
    assert(live.count() == 31)

    // versionAsOf stays pinned through the same churn
    val pinned = spark.read.format("graft-delta").option("versionAsOf", 0).load(dir)
    Seq((901L, "later")).toDF("id", "v").write.format("graft-delta")
      .mode("append").save(dir)
    assert(pinned.count() == 30)
    assert(live.count() == 32)
  }
}
