package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** A/B the per-commit cost of the modern tier (ICT re-stamp + .crc write)
  * against a plain table — same payload, same loop. Not a perf gate; the
  * numbers land in BASELINE.md and the assertion only guards against a
  * pathological multiple. */
class CommitOverheadProbeSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("ICT + crc per-commit overhead stays a modest fraction of a commit") {
    val one = Seq((1L, "x")).toDF("id", "v").cache(); one.count()
    def loop(dir: String, n: Int): Double = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => GraftWriter.write(one, dir, SaveMode.Append))
      (System.nanoTime() - t0) / 1e9
    }
    val plain = tempTable("ovh-plain").toString
    val ict = tempTable("ovh-ict").toString
    GraftWriter.write(one, plain)
    GraftWriter.write(one, ict)
    DeltaTable.forPath(spark, ict).setProperties(
      Map(TableConfig.EnableInCommitTimestamps -> "true"))
    loop(plain, 5); loop(ict, 5) // warm both paths
    val tPlain = loop(plain, 30)
    val tIct = loop(ict, 30)
    info(f"plain ${tPlain / 30}%.3f s/commit, ICT ${tIct / 30}%.3f s/commit " +
      f"(x${tIct / tPlain}%.2f)")
    assert(tIct < tPlain * 2.0,
      f"ICT+crc made commits ${tIct / tPlain}%.2fx slower — investigate")
  }
}
