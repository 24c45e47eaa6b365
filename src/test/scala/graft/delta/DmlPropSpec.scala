package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential property test for DML: random predicates — including
  * null-valued columns, OR/AND mixes, and always-null comparisons — applied
  * through `Dml.delete`/`Dml.update` on BOTH the copy-on-write and the
  * merge-on-read (DV) path, cross-checked against plain DataFrame
  * semantics on the same rows. SQL three-valued logic is the contract:
  * DELETE removes rows where the predicate is TRUE (not NULL, not false);
  * UPDATE transforms exactly those rows and leaves the rest byte-identical.
  */
class DmlPropSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def freshTable(name: String, dv: Boolean): String = {
    val dir = tempTable(name).toString
    val rows = (0 until 120).map { i =>
      (i.toLong,
       if (i % 7 == 0) null else s"s${i % 5}",
       if (i % 11 == 0) null else java.lang.Long.valueOf(i % 13L))
    }
    GraftWriter.write(rows.toDF("id", "v", "q").repartition(3), dir,
      SaveMode.ErrorIfExists)
    if (dv) DeltaTable.forPath(spark, dir)
      .setProperties(Map(TableConfig.EnableDeletionVectors -> "true"))
    dir
  }

  /** Random predicate over (id, v nullable, q nullable). */
  private def predGen(rnd: scala.util.Random): Column = {
    def leaf(): Column = rnd.nextInt(6) match {
      case 0 => col("id") < rnd.nextInt(120)
      case 1 => col("v") === s"s${rnd.nextInt(6)}"   // sometimes never-true
      case 2 => col("q") > rnd.nextInt(13)           // NULL on null q
      case 3 => col("v").isNull
      case 4 => col("q") =!= rnd.nextInt(13)         // NULL on null q
      case 5 => lit(null).cast("boolean")            // always-NULL predicate
    }
    rnd.nextInt(3) match {
      case 0 => leaf()
      case 1 => leaf() && leaf()
      case 2 => leaf() || leaf()
    }
  }

  private def rows(dir: String): Set[(Long, String, Option[Long])] =
    DeltaTable.forPath(spark, dir).toDF
      .as[(Long, Option[String], Option[Long])].collect()
      .map { case (i, v, q) => (i, v.orNull, q) }.toSet

  private def expectSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Option[Long])] =
    df.as[(Long, Option[String], Option[Long])].collect()
      .map { case (i, v, q) => (i, v.orNull, q) }.toSet

  Seq(false, true).foreach { dv =>
    val mode = if (dv) "DV" else "CoW"
    test(s"$mode: 15 random predicates — DELETE/UPDATE match DataFrame semantics") {
      (1 to 15).foreach { seed =>
        val rnd = new scala.util.Random(seed * (if (dv) 7919 else 104729))
        val dir = freshTable(s"dmlprop-$mode-$seed", dv)
        val original = DeltaTable.forPath(spark, dir).toDF.cache()
        original.count()

        // DELETE
        val delPred = predGen(rnd)
        val m1 = Dml.delete(spark, dir, delPred)
        val expectAfterDelete = expectSet(
          original.filter(!coalesce(delPred, lit(false))))
        assert(rows(dir) == expectAfterDelete,
          s"$mode seed $seed: DELETE($delPred) diverged")
        if (dv && m1.rowsAffected > 0) // merge-on-read: pointers, not rewrites
          assert(DeltaTable.forPath(spark, dir).files.exists(DeletionVectors.hasDv))

        // UPDATE on the post-delete state
        val updPred = predGen(rnd)
        val kept = original.filter(!coalesce(delPred, lit(false)))
        Dml.update(spark, dir, updPred, Map("v" -> lit("UPD")))
        val matches = coalesce(updPred, lit(false))
        val expectAfterUpdate = expectSet(
          kept.withColumn("v", when(matches, lit("UPD")).otherwise(col("v"))))
        assert(rows(dir) == expectAfterUpdate,
          s"$mode seed $seed: UPDATE($updPred) after DELETE($delPred) diverged")
        original.unpersist()
      }
    }
  }
}
