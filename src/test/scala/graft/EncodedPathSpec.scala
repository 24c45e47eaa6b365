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

  test("action-path codec property: decode∘encode = id over random paths") {
    import graft.delta.ActionPath.{decode, encode}
    import org.scalacheck.Gen
    val segChar = Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '%', '=', '+', '#', '?', '[', ']', '&', '\'', '.',
        '-', '_', 'é', 'ü', '中'),
      1 -> Gen.oneOf(':', '@', ',', ';', '~', '!', '$'))
    val seg = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, segChar).map(_.mkString))
    val path = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, seg).map(_.mkString("/")))
    (0 until 500).foreach { _ =>
      val p = Iterator.continually(path.sample).flatten.next()
      assert(decode(encode(p)) == p, s"round-trip failed for <$p>")
      // encoded form is pure printable ASCII with no raw space (JSON-safe,
      // URI-safe) — what the protocol means by "encoded as a URI"
      assert(encode(p).forall(c => c > ' ' && c < 127), s"unsafe byte in <${encode(p)}>")
    }
  }

  test("action-path codec: encode kernel and round-trip") {
    import graft.delta.ActionPath.{decode, encode}
    assert(encode("region=North America/f.parquet") == "region=North%20America/f.parquet")
    // '%' is ALWAYS encoded → decode∘encode = id even for Hive-escaped dirs
    assert(encode("region=a%3Db/f.parquet") == "region=a%253Db/f.parquet")
    // unreserved + sub-delims + :@/ stay literal (java.net.URI path quoting)
    assert(encode("a+b,c;d=e:f@g/h.parquet") == "a+b,c;d=e:f@g/h.parquet")
    // non-ASCII → UTF-8 %XX
    assert(encode("café.parquet") == "caf%C3%A9.parquet")
    // absolute action paths (shallow CLONE) keep scheme/authority
    assert(encode("file:/tmp/my table/f.parquet") == "file:/tmp/my%20table/f.parquet")
    assert(encode("s3a://bucket/a b") == "s3a://bucket/a%20b")
    // clean path: identity, same object
    val clean = "region=1/part-00000-abc.snappy.parquet"
    assert(encode(clean) eq clean)
    for (p <- Seq("a b/c%d#e?f[g]h", "région=été/ö ü.parquet", "100%/x",
                  "col=__HIVE_DEFAULT_PARTITION__/f", clean))
      assert(decode(encode(p)) == p, s"round-trip failed for $p")
  }

  test("protocol conformance: action paths are URI-encoded at rest, decoded in memory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_proto").resolve("t").toString
    // values that Hive-escape ('=', '%') and URI-encode (space) differently:
    // "a=b"     → disk dir  region=a%3Db       → action region=a%253Db
    // "50% off" → disk dir  region=50%25 off   → action region=50%2525%20off
    val df = (0 until 90).map(i => (i.toLong, i % 3 match {
      case 0 => "North America"; case 1 => "a=b"; case _ => "50% off"
    })).toDF("id", "region")
    GraftWriter.write(df.repartition(1), dir, partitionBy = Seq("region"))

    // 1. at rest: the commit JSON carries protocol-space (encoded) paths
    val v0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_delta_log", "00000000000000000000.json")), "UTF-8")
    val addPaths = v0.linesIterator.filter(_.contains("\"add\"")).toSeq
    assert(addPaths.exists(_.contains("region=North%20America/")), v0.take(400))
    assert(addPaths.exists(_.contains("region=a%253Db/")))
    assert(addPaths.exists(_.contains("region=50%2525%20off/")))
    assert(!addPaths.exists(_.contains("North America/")), "raw space leaked into JSON")

    // 2. in memory: decoded disk-relative paths (URI layer off, Hive layer —
    //    part of the literal directory name — intact) + decoded values
    val dt = DeltaTable.forPath(spark, dir)
    val inMem = dt.files.map(_.path)
    assert(inMem.exists(_.startsWith("region=North America/")), inMem.mkString(", "))
    assert(inMem.exists(_.startsWith("region=a%3Db/")))
    assert(inMem.exists(_.startsWith("region=50%25 off/")))
    assert(!inMem.exists(p => p.contains("%20") || p.contains("%253D")))
    assert(dt.files.flatMap(_.partitionValues.get("region")).toSet ==
      Set("North America", "a=b", "50% off"))
    assert(dt.toDF.count() == 90)
    assert(dt.toDF.filter(col("region") === "a=b").count() == 30)
    assert(dt.toDF.filter(col("region") === "50% off").count() == 30)

    // 3. distributed replay decodes the same path space as the driver replay
    val log = DeltaLog.forPath(spark, dir)
    val distPaths = DistributedReplay.activeFiles(log)
      .select("path").as[String].collect().toSet
    assert(distPaths == log.update().files.map(_.path).toSet)

    // 4. DML over encoded-at-rest paths; vacuum's live set must cover every
    //    active file (a path-space mismatch would surface live data files as
    //    unreferenced orphans under a zero-retention dry run)
    DeltaTable.forPath(spark, dir).setProperties(Map(
      TableConfig.DeletedFileRetention -> "interval 0 hours"))
    Dml.delete(spark, dir, col("id") < 9)
    val afterDml = DeltaTable.forPath(spark, dir)
    assert(afterDml.toDF.count() == 81)
    val live = afterDml.files.map(_.path).toSet
    val candidates = afterDml.vacuum(0.0, dryRun = true)
    assert(candidates.forall(c => !live.contains(c)),
      s"vacuum would delete live files: ${candidates.filter(live).take(3)}")

    // 5. checkpoint round-trips the encoding: cold restore from parquet only
    log.checkpoint()
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    java.nio.file.Files.list(logDir).filter(_.toString.endsWith(".json"))
      .forEach(p => java.nio.file.Files.delete(p))
    val cold = DeltaTable.forPath(spark, dir)
    assert(cold.toDF.count() == 81)
    assert(cold.files.flatMap(_.partitionValues.get("region")).toSet ==
      Set("North America", "a=b", "50% off"))
    assert(cold.toDF.filter(col("region") === "50% off").count() == 27)
  }

  test("foreign over-encoded action paths (e.g. %61 for 'a') decode on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_foreign").resolve("t").toString
    GraftWriter.write((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "s"), dir)
    // a foreign writer may legally percent-encode MORE than we do: rewrite
    // the add.path's "part-" prefix to "p%61rt-" (RFC-3986-equivalent)
    val f = java.nio.file.Paths.get(dir, "_delta_log", "00000000000000000000.json")
    val rewritten = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .linesIterator.map(l =>
        if (l.contains("\"add\"")) l.replaceFirst("part-", "p%61rt-") else l)
      .mkString("\n")
    java.nio.file.Files.write(f, rewritten.getBytes("UTF-8"))
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.files.forall(_.path.startsWith("part-")))
    assert(dt.toDF.count() == 10)
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
