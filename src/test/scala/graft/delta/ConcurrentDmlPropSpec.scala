package graft.delta

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.Try

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized two-writer serializability: two REAL `Dml` operations with
  * partition-scoped predicates race from two threads. Allowed outcomes:
  * both commit (their read domains commuted) or one aborts with
  * [[ConcurrentCommitException]] (never both failing, never a hang). In
  * every case the final table must equal the surviving operations applied
  * to the initial state IN COMMIT-VERSION ORDER — the external observer's
  * serial history. Partition-disjoint pairs must BOTH commit (the
  * read-domain scoping the conflict detector exists for). */
class ConcurrentDmlPropSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutor(Executors.newFixedThreadPool(2))

  private case class Op(part: Int, cut: Long, isDelete: Boolean) {
    def pred = col("p") === part && col("id") % 10 < cut
    def run(dir: String): DmlMetrics =
      if (isDelete) Dml.delete(spark, dir, pred)
      else Dml.update(spark, dir, pred, Map("v" -> lit("RACED")))
    /** model application over (id, v, p) rows */
    def apply(rows: Set[(Long, String, Int)]): Set[(Long, String, Int)] =
      if (isDelete) rows.filterNot(r => r._3 == part && r._1 % 10 < cut)
      else rows.map(r =>
        if (r._3 == part && r._1 % 10 < cut) (r._1, "RACED", r._3) else r)
  }

  test("racing partition-scoped DMLs serialize by commit version (12 seeds)") {
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed * 48611)
      val dir = tempTable(s"race-$seed").toString
      val init = (0 until 80).map(i => (i.toLong, s"v$i", i % 4))
      GraftWriter.write(init.toDF("id", "v", "p").repartition(4), dir,
        SaveMode.ErrorIfExists, partitionBy = Seq("p"))

      val a = Op(rnd.nextInt(4), 1 + rnd.nextInt(9), rnd.nextBoolean())
      val b = Op(rnd.nextInt(4), 1 + rnd.nextInt(9), rnd.nextBoolean())

      val fa = Future(Try(a.run(dir)))
      val fb = Future(Try(b.run(dir)))
      val (ra, rb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))

      // failures may only be concurrency aborts, and never both
      Seq(ra, rb).foreach(_.failed.foreach(e =>
        assert(e.isInstanceOf[ConcurrentCommitException],
          s"seed $seed: unexpected failure $e")))
      assert(ra.isSuccess || rb.isSuccess, s"seed $seed: both writers aborted")
      if (a.part != b.part)
        assert(ra.isSuccess && rb.isSuccess,
          s"seed $seed: partition-disjoint ops must both commit ($a vs $b)")

      // serial history = successful ops ordered by committed version
      val serial = Seq(ra.toOption.map(m => (m.version, a)),
                       rb.toOption.map(m => (m.version, b)))
        .flatten.sortBy(_._1).map(_._2)
      val want = serial.foldLeft(init.toSet)((s, op) => op.apply(s))
      val got = DeltaTable.forPath(spark, dir).toDF
        .as[(Long, String, Int)].collect().toSet
      assert(got == want,
        s"seed $seed: final state diverges from serial history $serial — " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }
}
