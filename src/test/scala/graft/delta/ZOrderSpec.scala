package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZE ZORDER: multi-column clustering must (a) keep contents
  * bit-identical and (b) make per-file stats selective on every clustered
  * column — the data-skipping property a linear sort only gives its leading
  * column. */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  /** 4096 rows over a 64×64 (x, y) grid, written in row-shuffled order so
    * every initial file spans nearly the full range of both columns. */
  private def writeGrid(dir: String): Unit = {
    val rows = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, s"s${(x * 64 + y) % 7}")
    val shuffled = new scala.util.Random(42).shuffle(rows)
    GraftWriter.write(shuffled.toDF("x", "y", "s").repartition(16), dir)
  }

  private def survivors(dir: String, preds: Seq[StatsPredicate]): Int = {
    val snap = DeltaLog.forPath(spark, dir).update()
    StatsPredicate.prune(snap.files, preds).size
  }

  test("zorder keeps contents identical and tightens stats on both columns") {
    val dir = tempTable("zorder-grid").toString
    writeGrid(dir)
    val before = DeltaTable.forPath(spark, dir).toDF
      .orderBy("x", "y").collect()

    val snap0 = DeltaLog.forPath(spark, dir).update()
    assert(snap0.files.size == 16)
    // shuffled layout: a narrow x-range query can prune nothing
    val xq = Seq[StatsPredicate](StatsPredicate.Ge("x", 8L), StatsPredicate.Lt("x", 16L))
    val yq = Seq[StatsPredicate](StatsPredicate.Ge("y", 48L), StatsPredicate.Lt("y", 56L))
    assert(survivors(dir, xq) == 16 && survivors(dir, yq) == 16)

    val m = Optimize.zorder(spark, dir, Seq("x", "y"), targetFileBytes = 2L * 1024)
    assert(m.filesRemoved == 16 && m.filesAdded > 8)

    // contents identical (dataChange=false rewrite)
    val after = DeltaTable.forPath(spark, dir).toDF.orderBy("x", "y").collect()
    assert(after.sameElements(before))

    // an eighth-of-range query on EITHER column now skips most files
    val nFiles = DeltaLog.forPath(spark, dir).update().files.size
    val xs = survivors(dir, xq)
    val ys = survivors(dir, yq)
    assert(xs <= nFiles / 2, s"x-range query kept $xs of $nFiles files")
    assert(ys <= nFiles / 2, s"y-range query kept $ys of $nFiles files")
  }

  test("zorder respects hive partitions and scoping filters") {
    val dir = tempTable("zorder-part").toString
    val rows = for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong, if ((x + y) % 2 == 0) "a" else "b")
    GraftWriter.write(new scala.util.Random(7).shuffle(rows)
      .toDF("x", "y", "p").repartition(8), dir,
      SaveMode.ErrorIfExists, partitionBy = Seq("p"))

    val before = DeltaTable.forPath(spark, dir).toDF.orderBy("x", "y", "p").collect()
    val m = Optimize.zorder(spark, dir, Seq("x", "y"),
      targetFileBytes = 4L * 1024,
      partitionFilters = Seq(PartitionFilter.Eq("p", "a")))
    assert(m.filesRemoved > 0)
    val snap = DeltaLog.forPath(spark, dir).update()
    // only p=a rewritten; every file still carries its partition value
    assert(snap.files.forall(f => f.partitionValues.get("p").exists(v => v == "a" || v == "b")))
    val after = DeltaTable.forPath(spark, dir).toDF.orderBy("x", "y", "p").collect()
    assert(after.sameElements(before))
  }

  test("zorder handles strings, dates and nulls") {
    val dir = tempTable("zorder-types").toString
    import java.sql.Date
    val rows = (0 until 500).map { i =>
      (i.toLong,
       if (i % 97 == 0) null else f"key$i%04d",
       Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i % 365)))
    }
    GraftWriter.write(new scala.util.Random(1).shuffle(rows)
      .toDF("id", "k", "d").repartition(8), dir)
    val before = DeltaTable.forPath(spark, dir).toDF.orderBy("id").collect()
    val m = Optimize.zorder(spark, dir, Seq("k", "d"), targetFileBytes = 2L * 1024)
    assert(m.filesRemoved == 8)
    val after = DeltaTable.forPath(spark, dir).toDF.orderBy("id").collect()
    assert(after.sameElements(before))
    // string stats now selective: a prefix-range query skips files
    val nFiles = DeltaLog.forPath(spark, dir).update().files.size
    val ks = survivors(dir,
      Seq(StatsPredicate.Ge("k", "key0100"), StatsPredicate.Lt("k", "key0160")))
    assert(nFiles > 2 && ks < nFiles, s"string-range query kept $ks of $nFiles")
  }

  test("string surrogate is order-preserving across byte lengths") {
    // Regression (ADVICE r4): an unpadded byte slice compared 'ab' > 'b'
    // (0x6162 > 0x62); the zero-padded fixed-width surrogate must follow
    // lexicographic order, so bucket codes are monotone in string order.
    val strs = Seq("a", "ab", "abc", "b", "ba", "c", "ca", "cab", "d", "da",
      "db", "e", "ea", "f", "fa", "g")
    val df = new scala.util.Random(3).shuffle(
      strs.zipWithIndex.map { case (s, i) => (i.toLong, s) })
      .toDF("id", "s")
    val z = Optimize.zValue(df, Seq("s"), df.schema)
    val codeByStr = df.withColumn("z", z)
      .select("s", "z").as[(String, Long)].collect().toMap
    strs.sliding(2).foreach { case Seq(lo, hi) =>
      assert(codeByStr(lo) <= codeByStr(hi),
        s"surrogate order broken: z('$lo')=${codeByStr(lo)} > z('$hi')=${codeByStr(hi)}")
    }
  }

  test("zorder rejects partition and unknown columns") {
    val dir = tempTable("zorder-bad").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      SaveMode.ErrorIfExists, partitionBy = Seq("p"))
    intercept[IllegalArgumentException](Optimize.zorder(spark, dir, Seq("p")))
    intercept[IllegalArgumentException](Optimize.zorder(spark, dir, Seq("nope")))
  }
}
