package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pruning-soundness property: for random predicates, a filtered read
  * through the Delta path (GraftFileIndex = partition pruning + footer-stats
  * skipping + DV handling) must return EXACTLY the rows of the same filter
  * over the raw live parquet files. Stats skipping that drops a file it
  * shouldn't is silent data loss at 100 TB — this is the invariant that
  * makes P2/P5/Q2 safe to enable everywhere. */
class StatsPruningPropSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def predGen(rnd: scala.util.Random): Column = {
    def leaf(): Column = rnd.nextInt(7) match {
      case 0 => col("id") < rnd.nextInt(200)
      case 1 => col("id") >= rnd.nextInt(200)
      case 2 => col("d") > rnd.nextDouble() * 20
      case 3 => col("s") === s"g${rnd.nextInt(8)}"
      case 4 => col("p") === rnd.nextInt(4)           // partition column
      case 5 => col("s").isNull
      case 6 => col("id") === rnd.nextInt(200)
    }
    rnd.nextInt(4) match {
      case 0 => leaf()
      case 1 => leaf() && leaf()
      case 2 => leaf() || leaf()
      case 3 => leaf() && leaf() && leaf()
    }
  }

  test("random filters through the Delta read path equal the raw-parquet truth (25 seeds)") {
    val dir = tempTable("prune-prop").toString
    val rows = (0 until 200).map { i =>
      (i.toLong,
       i * 0.1,
       if (i % 9 == 0) null else s"g${i % 6}",
       i % 4)
    }
    // range-partitioned writes give files tight, distinct id/d min-max —
    // the regime where stats skipping actually prunes
    GraftWriter.write(
      rows.toDF("id", "d", "s", "p").repartitionByRange(6, col("id")),
      dir, SaveMode.ErrorIfExists, partitionBy = Seq("p"))

    val dt = DeltaTable.forPath(spark, dir)
    val raw = spark.read.option("basePath", dir).schema(dt.schema)
      .parquet(dt.files.map(a =>
        new org.apache.hadoop.fs.Path(dt.log.tablePath, a.path).toString): _*)

    (1 to 25).foreach { seed =>
      val rnd = new scala.util.Random(seed * 31337)
      val pred = predGen(rnd)
      val got = dt.toDF.filter(pred)
        .as[(Long, Double, Option[String], Int)].collect().toSet
      val want = raw.filter(pred)
        .as[(Long, Double, Option[String], Int)].collect().toSet
      assert(got == want,
        s"seed $seed: pruning changed results for $pred — " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }
}
