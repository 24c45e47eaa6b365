package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[AsOfJoin]] against brute-force oracles, every direction/strictness
  * combination, plus the plan-shape claims (single shuffle, NO join node
  * for asOf; no nested-loop/cartesian for the range join — the whole
  * point of both operators). */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // randomized-but-seeded: ~30% of left rows precede every right row
  // (unmatched), keys skew, duplicate left timestamps occur
  private val rnd = new scala.util.Random(7)
  private lazy val left = (0 until 500).map { i =>
    (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(300).toLong)
  }.toDF("lid", "k", "t").cache()
  private lazy val right = (0 until 200).map { i =>
    (rnd.nextInt(8).toLong, 90L + rnd.nextInt(200), s"v$i", i.toLong)
  }.toDF("k", "rt", "v", "rid")
    // asOf's determinism contract: right unique on (key, time)
    .groupBy("k", "rt").agg(max(struct(col("rid"), col("v"))).as("m"))
    .select(col("k"), col("rt"), col("m.v").as("v"), col("m.rid").as("rid"))
    .cache()

  /** Brute force: join all candidate right rows, rank, keep the best. */
  private def oracle(strict: Boolean, forward: Boolean): DataFrame = {
    val cmp =
      if (forward && strict) col("rt") > col("t")
      else if (forward) col("rt") >= col("t")
      else if (strict) col("rt") < col("t")
      else col("rt") <= col("t")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lid").orderBy(
        if (forward) col("rt").asc else col("rt").desc)
    left.join(right, left("k") === right("k") && cmp, "left")
      .select(col("lid"), left("k").as("k"), col("t"), col("rt"),
        col("v"), col("rid"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("lid", "k", "t", "v", "rid")
  }

  private def run(strict: Boolean, forward: Boolean): DataFrame =
    AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v", "rid"),
      strict = strict, forward = forward)

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val d = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert(d == 0, s"$d rows differ from the brute-force oracle")
  }

  for (strict <- Seq(false, true); forward <- Seq(false, true))
    test(s"asOf ≡ brute force (strict=$strict, forward=$forward)") {
      assertSame(run(strict, forward), oracle(strict, forward))
    }

  test("a matched right row with a NULL value does not see through") {
    val l = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val r = Seq((1L, 50L, Some("old"), 1L), (1L, 90L, None: Option[String], 2L))
      .toDF("k", "rt", "v", "rid")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "t", "rt", Seq("v", "rid"))
      .select("v", "rid").as[(Option[String], Long)].collect().toSeq
    assert(out == Seq((None, 2L)),
      s"must match the rt=90 row and keep its null value, got $out")
  }

  test("asOf plan: one hash-shuffle on the keys, NO join node") {
    // plain (un-aggregated, un-cached) inputs: the fixture `right` carries
    // its own groupBy exchange inside the cached plan string, which is not
    // the operator's plan
    val l = (0 until 50).map(i => (i.toLong, i % 3L, i * 2L))
      .toDF("lid", "k", "t")
    val r = (0 until 20).map(i => (i % 3L, i * 5L, s"v$i", i.toLong))
      .toDF("k", "rt", "v", "rid")
    val plan = AsOfJoin.asOf(l, r, Seq("k"), "t", "rt", Seq("v", "rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asOf must not plan a join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan.replace("\n", " ")).size
    assert(shuffles == 1, s"expected exactly 1 hash shuffle, got $shuffles")
  }

  test("rangePointJoin ≡ inequality join, no nested-loop in the plan") {
    val pts = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "k", "p")
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(900).toLong
      (i.toLong, rnd.nextInt(6).toLong, s, s + rnd.nextInt(120))
    }.toDF("iid", "k", "s", "e")
    val got = AsOfJoin.rangePointJoin(pts, ivs, "p", "s", "e",
      bucketWidth = 64L, keyCols = Seq("k"))
      .select("pid", "iid")
    val want = pts.join(ivs, Seq("k"))
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid")
    assertSame(got, want)
    assert(want.count() > 100, "degenerate fixture: too few matches")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the inequality must ride an equi-join:\n$plan")
  }

  test("rangePointJoin: intervals touching a bucket boundary match both sides") {
    val pts = Seq((1L, 64L), (2L, 63L), (3L, 128L)).toDF("pid", "p")
    val ivs = Seq((10L, 60L, 64L), (11L, 64L, 130L)).toDF("iid", "s", "e")
    val got = AsOfJoin.rangePointJoin(pts, ivs, "p", "s", "e", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L)))
  }

  test("rangePointJoin refuses an interval exploding past the bucket cap") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((10L, 0L, 10000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      AsOfJoin.rangePointJoin(pts, ivs, "p", "s", "e", 4L,
        maxBucketsPerInterval = 100).count()
    }
    assert(e.getMessage != null)
  }

  test("asOf refuses colliding right column names loudly") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right.withColumnRenamed("v", "t"),
        Seq("k"), "t", "rt", Seq("t"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
