package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class FileIndexSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private def listedCount(dt: DeltaTable): Int =
    dt.lastFileIndex.map(_.lastListedFileCount)
      .getOrElse(fail("no file index recorded"))

  /** These tests assert which files the SCAN's OWN index listed; the
    * session-wide plan rewrites (StatsOnlyAggregates answers counts from
    * stats, PruneGraftScans swaps in a re-scoped index) would bypass it. */
  private def withoutPlanRewrites[A](f: => A): A = {
    spark.conf.set("spark.graft.planRewrites.enabled", "false")
    try f finally spark.conf.unset("spark.graft.planRewrites.enabled")
  }

  test("plain .filter on a partition column prunes files inside Catalyst") { withoutPlanRewrites {
    val dir = tempTable("fi-part").toString
    GraftWriter.write(
      (0 until 90).map(i => (i.toLong, i % 3)).toDF("id", "bucket"),
      dir, SaveMode.ErrorIfExists, Seq("bucket"))
    val dt = DeltaTable.forPath(spark, dir)
    val total = dt.files.size

    assert(dt.toDF.count() == 90)
    assert(listedCount(dt) == total) // unfiltered scan lists everything

    val one = dt.toDF.filter(col("bucket") === 1)
    assert(one.count() == 30)
    assert(listedCount(dt) < total) // Catalyst-pushed partition filter pruned
    assert(one.select("bucket").distinct().as[Int].collect().toSeq == Seq(1))

    // IN-list partition pruning
    val two = dt.toDF.filter(col("bucket").isin(0, 2))
    assert(two.count() == 60)
  } }

  test("plain .filter on a data column skips files via Add.stats") { withoutPlanRewrites {
    val dir = tempTable("fi-stats").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .repartition(1), dir)
    GraftWriter.write((1000 until 1050).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .repartition(1), dir, SaveMode.Append)
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.files.size == 2)

    val hi = dt.toDF.filter(col("id") >= 1000L)
    assert(hi.count() == 50)
    assert(listedCount(dt) == 1) // second file's [min,max] excludes the range

    val none = dt.toDF.filter(col("id") > 999999L)
    assert(none.count() == 0)
    assert(listedCount(dt) == 0) // provably-empty scan lists nothing

    val all = dt.toDF.filter(col("id") >= 0L)
    assert(all.count() == 100)
    assert(listedCount(dt) == 2)
  } }

  test("r15: IN-list point lookups skip files via Add.stats (In and InSet forms)") { withoutPlanRewrites {
    val dir = tempTable("fi-inset").toString
    // 4 files with disjoint id ranges
    (0 until 4).foreach { k =>
      GraftWriter.write(
        (k * 1000 until k * 1000 + 50).map(i => (i.toLong, s"n$i"))
          .toDF("id", "name").repartition(1),
        dir, if (k == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val dt = DeltaTable.forPath(spark, dir)
    assert(dt.files.size == 4)

    // short list (stays Catalyst `In`): hits files 0 and 2 only
    val short = dt.toDF.filter(col("id").isin(3L, 2007L))
    assert(short.count() == 2)
    assert(listedCount(dt) == 2)

    // long list (Catalyst converts to InSet past the threshold): all values
    // inside file 1's range
    val vals: Seq[Any] = (1000L until 1040L).map(v => v: Any)
    val longList = dt.toDF.filter(col("id").isin(vals: _*))
    assert(longList.count() == 40)
    assert(listedCount(dt) == 1)

    // list entirely between the files' ranges: provably-empty scan
    val miss = dt.toDF.filter(col("id").isin(777L, 888L))
    assert(miss.count() == 0)
    assert(listedCount(dt) == 0)
  } }

  test("r15: eager InLongSet pre-pruning bounds inputFiles") {
    val dir = tempTable("fi-inset-eager").toString
    (0 until 4).foreach { k =>
      GraftWriter.write(
        (k * 1000 until k * 1000 + 50).map(i => (i.toLong, s"n$i"))
          .toDF("id", "name").repartition(1),
        dir, if (k == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val dt = DeltaTable.forPath(spark, dir)
    val df = dt.toDF(Nil, Seq(StatsPredicate.inLongSet("id", Array(3L, 2007L))))
    assert(df.inputFiles.length == 2)
    assert(df.count() == 100) // eager prune drops FILES, not rows
    // boundary inclusivity: min and max values of a file must keep it
    val edge = dt.toDF(Nil, Seq(StatsPredicate.inLongSet("id", Array(1049L, 3000L))))
    assert(edge.inputFiles.length == 2)
  }

  test("r15: eager InStringSet pre-pruning bounds inputFiles (string keys)") {
    val dir = tempTable("fi-instr-eager").toString
    // four files with disjoint lexicographic key ranges a*, b*, c*, d*
    (0 until 4).foreach { k =>
      val p = ('a' + k).toChar
      GraftWriter.write(
        (0 until 50).map(i => (f"$p%c-key-$i%03d", i))
          .toDF("k", "v").repartition(1),
        dir, if (k == 0) SaveMode.ErrorIfExists else SaveMode.Append)
    }
    val dt = DeltaTable.forPath(spark, dir)
    val df = dt.toDF(Nil,
      Seq(StatsPredicate.inStringSet("k", Array("a-key-003", "c-key-007"))))
    assert(df.inputFiles.length == 2)
    assert(df.count() == 100) // eager prune drops FILES, not rows
    // boundary inclusivity: a file's exact min and max keys must keep it
    val edge = dt.toDF(Nil,
      Seq(StatsPredicate.inStringSet("k", Array("b-key-000", "d-key-049"))))
    assert(edge.inputFiles.length == 2)
    // between-ranges values prove emptiness (UTF-8 order, not UTF-16:
    // '' sorts ABOVE supplementary chars in UTF-16 but the stats
    // convention is UTF-8 binary — a between-files probe must still miss)
    val miss = dt.toDF(Nil,
      Seq(StatsPredicate.inStringSet("k", Array("az", "cz"))))
    assert(miss.inputFiles.isEmpty)
  }

  test("explicit pre-pruning composes with Catalyst-pushed filters") { withoutPlanRewrites {
    val dir = tempTable("fi-compose").toString
    GraftWriter.write(
      (0 until 120).map(i => (i.toLong, i % 4)).toDF("id", "p").repartition(1),
      dir, SaveMode.ErrorIfExists, Seq("p"))
    val dt = DeltaTable.forPath(spark, dir)
    // pre-prune to p ∈ {1, 2} via the reference-style API, then Catalyst
    // narrows to p = 2 from the pushed filter
    val df = dt.toDF(Seq(PartitionFilter.In("p", Set("1", "2"))))
      .filter(col("p") === 2)
    assert(df.count() == 30)
    assert(listedCount(dt) == 1)
  } }

  test("schema column order and types survive the FileIndex scan") {
    val dir = tempTable("fi-order").toString
    GraftWriter.write(
      (0 until 10).map(i => (i.toLong, s"s$i", i)).toDF("a", "b", "part"),
      dir, SaveMode.ErrorIfExists, Seq("part"))
    val dt = DeltaTable.forPath(spark, dir)
    val df = dt.toDF
    assert(df.schema.fieldNames.toSeq == Seq("a", "b", "part"))
    assert(df.schema("part").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("small delta tables auto-broadcast in joins (sizeInBytes reaches the planner)") {
    val dir = tempTable("fi-broadcast").toString
    GraftWriter.write((0 until 20).map(i => (i.toLong, s"dim$i")).toDF("k", "name"), dir)
    val small = DeltaTable.forPath(spark, dir).toDF
    val big = spark.range(0, 10000).withColumnRenamed("id", "k")
    val joined = big.join(small, "k")
    assert(joined.count() == 20)
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin") || physical.contains("BroadcastExchange"),
      s"expected broadcast join for a tiny delta dim table, got:\n$physical")
  }

  test("empty prune result yields an empty, correctly-typed DataFrame") {
    val dir = tempTable("fi-empty").toString
    GraftWriter.write(Seq((1L, "x")).toDF("id", "v"), dir)
    val dt = DeltaTable.forPath(spark, dir)
    val df = dt.toDF(Nil, Seq(StatsPredicate.Gt("id", 999L)))
    assert(df.count() == 0)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
  }
}
