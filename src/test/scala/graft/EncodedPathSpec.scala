package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.delta._
import graft.functions.UriPathDecode

/** URI-encodable characters in table paths and partition values.
  *
  * Spark's `_metadata.file_path` is the PERCENT-ENCODED `Path.toUri
  * .toString` (`region=North America` → `region=North%20America`), while
  * Delta action paths are stored decoded — so every join between the two
  * spaces must normalize consistently. Before the round-8 fix, a space in
  * the table path or a partition value silently emptied (a) the DV
  * anti-join — DELETED ROWS RESURFACED — and (b) the change feed's
  * file→version attach. Hive path escaping does NOT cover the space
  * (`escapePathName` leaves it literal), so "North America" is an
  * ordinary, reachable partition directory name. */
class EncodedPathSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("percent-decode kernel: escapes, identity, '+', multi-byte, malformed") {
    assert(UriPathDecode.decode(u("region=North%20America/f.parquet")).toString ==
      "region=North America/f.parquet")
    // '+' stays verbatim (URI path semantics, NOT x-www-form-urlencoded)
    assert(UriPathDecode.decode(u("a+b%2Bc")).toString == "a+b+c")
    // clean input returns the SAME object — no copy on the hot path
    val clean = u("part-00000.parquet")
    assert(UriPathDecode.decode(clean) eq clean)
    // UTF-8 multi-byte: é = %C3%A9
    assert(UriPathDecode.decode(u("caf%C3%A9.parquet")).toString == "café.parquet")
    // malformed escapes copy through verbatim
    assert(UriPathDecode.decode(u("100%")).toString == "100%")
    assert(UriPathDecode.decode(u("a%2")).toString == "a%2")
    assert(UriPathDecode.decode(u("a%zz")).toString == "a%zz")
    // uppercase hex
    assert(UriPathDecode.decode(u("%2F%2f")).toString == "//")
  }

  test("DV DELETE + change feed survive spaces in table path and partition values") {
    val base = java.nio.file.Files.createTempDirectory("graft enc probe")
    val dir = base.resolve("my table").toString

    val df = (0 until 100).map(i =>
      (i.toLong, if (i % 2 == 0) "North America" else "Europe")).toDF("id", "region")
    GraftWriter.write(df.repartition(2), dir, partitionBy = Seq("region"))
    DeltaTable.forPath(spark, dir)
      .setProperties(Map(
        TableConfig.EnableDeletionVectors -> "true",
        TableConfig.EnableChangeDataFeed -> "true"))

    // DV delete: rows must actually disappear (the old decoded prefix never
    // matched the encoded file_path, so the anti-join subtracted nothing)
    val m = Dml.delete(spark, dir, col("id") < 20)
    assert(m.rowsAffected == 20)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.files.map(DeletionVectors.cardinality).sum == 20)
    assert(dt.toDF.count() == 80)
    assert(dt.toDF.filter(col("id") < 20).count() == 0)
    // both space-bearing partitions still serve reads
    assert(dt.toDF.filter(col("region") === "North America").count() == 40)

    // second delete on the same files unions positions through the DV
    // parquet whose keys were written by the first (decoded-space) pass
    Dml.delete(spark, dir, col("id") >= 90)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 70)

    // change feed: the file→version broadcast join must attach versions for
    // encoded paths (insert rows from v0, delete rows from the DV commits)
    val log = DeltaLog.forPath(spark, dir)
    val feed = ChangeDataFeed.readChanges(spark, log, -1L, log.update().version)
    val byType = feed.groupBy(col(ChangeDataFeed.ChangeType)).count()
      .as[(String, Long)].collect().toMap
    assert(byType("insert") == 100, s"feed change counts: $byType")
    assert(byType("delete") == 30, s"feed change counts: $byType")

    // file-level batch feed (graft_changes) uses the same normalized keys
    val changed = spark.sql(s"SELECT * FROM graft_changes('$dir', -1, 0)").count()
    assert(changed == 100)
  }
}
