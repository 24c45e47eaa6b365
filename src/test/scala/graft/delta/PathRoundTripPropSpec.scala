package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property: ANY partition value a user can write must round-trip through
  * the full at-rest path stack — Hive directory escaping (Spark's writer),
  * URI percent-encoding of action paths (the protocol's "encoded as a URI",
  * [[ActionPath]]), partitionValues maps, file pruning, DV DML, and the
  * change feed — with no silent row loss or resurrection.
  *
  * This generalizes the round-8 encoded-path fixes: each of those bugs
  * (raw-space action paths, encoded/decoded join mismatches in the DV
  * anti-join and the feed's version attach) was a single adversarial
  * partition value away from silent corruption, and none of the
  * fixed-example specs would have caught the NEXT character class. */
class PathRoundTripPropSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // character classes that stress different layers: Hive-escaped (= % : /),
  // URI-encoded (space #  ? [ ]), multi-byte UTF-8, and plain
  private val valueGen: Gen[String] = {
    val c = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '=', '%', '#', '+', ',', '\'', '-', '_', '.'),
      2 -> Gen.oneOf(':', '/', '?', '[', ']', '&', '@'),
      1 -> Gen.oneOf('é', 'ü', '中', 'Ω'))
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, c).map(_.mkString))
      // Spark's writer trims trailing whitespace in partition dir names —
      // a writer-layer normalization, not a graft path bug
      .map(_.trim).suchThat(_.nonEmpty)
  }

  test("50 random adversarial partition values survive write→scan→prune→DV-delete→feed") {
    val values = Iterator.continually(valueGen.sample).flatten
      .distinct.take(50).toVector
    val dir = java.nio.file.Files.createTempDirectory("graft-prt-").resolve("t").toString

    val df = values.zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 2L, v), (i * 2L + 1, v))
    }.toDF("id", "k")
    GraftWriter.write(df.repartition(4), dir, SaveMode.ErrorIfExists, Seq("k"))
    DeltaTable.forPath(spark, dir).setProperties(Map(
      TableConfig.EnableDeletionVectors -> "true",
      TableConfig.EnableChangeDataFeed -> "true"))

    // full-scan fidelity: every (id, value) pair back intact
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.toDF.count() == values.size * 2L)
    val read = dt.toDF.as[(Long, String)].collect().toSet
    val expected = values.zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 2L, v), (i * 2L + 1L, v)) }.toSet
    assert(read == expected, {
      val lost = expected -- read
      val phantom = read -- expected
      s"lost=${lost.take(5)} phantom=${phantom.take(5)}"
    })

    // partition-filter fidelity on the 10 nastiest values (longest encoded)
    val nasty = values.sortBy(v => -ActionPath.encode(v).length).take(10)
    nasty.foreach { v =>
      assert(dt.toDF.filter(col("k") === v).count() == 2,
        s"partition filter lost rows for <$v>")
    }

    // DV delete of every even id: deleted rows stay gone through the DV
    // anti-join (encoded-path space mismatches here previously resurfaced
    // ALL deleted rows)
    val m = Dml.delete(spark, dir, col("id") % 2 === 0)
    assert(m.rowsAffected == values.size)
    val after = DeltaTable.forPath(spark, dir)
    assert(after.toDF.count() == values.size)
    assert(after.toDF.filter(col("id") % 2 === 0).count() == 0)

    // change feed attaches versions for every encoded path: inserts at v0,
    // DV deletes afterwards
    val log = DeltaLog.forPath(spark, dir)
    val byType = ChangeDataFeed.readChanges(spark, log, -1L, log.update().version)
      .groupBy(col(ChangeDataFeed.ChangeType)).count()
      .as[(String, Long)].collect().toMap
    assert(byType.get("insert").contains(values.size * 2L), s"feed: $byType")
    assert(byType.get("delete").contains(values.size.toLong), s"feed: $byType")

    // vacuum live-set: no live file is a reclaim candidate
    DeltaTable.forPath(spark, dir).setProperties(Map(
      TableConfig.DeletedFileRetention -> "interval 0 hours"))
    val live = DeltaTable.forPath(spark, dir).files.map(_.path).toSet
    val candidates = DeltaTable.forPath(spark, dir).vacuum(0.0, dryRun = true)
    assert(candidates.forall(c => !live.contains(c)),
      s"vacuum would reclaim live files: ${candidates.filter(live).take(3)}")
  }
}
