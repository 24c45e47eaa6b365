package graft.functions

import graft.SparkTestBase
import graft.functions.functions.dot_q
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizedDotProductSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("matches the aggregate(zip_with) built-in formulation exactly") {
    val df = Seq(
      (1L, Array(0.1f, -0.25f, 3.0f), Array(1.0f, 2.0f, -0.5f)),
      (2L, Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
      (3L, Array(1.2345f), Array(-1.2345f)))
      .toDF("id", "a", "b")
    val ref = df.withColumn("r", expr(
      """aggregate(zip_with(a, b, (x, y) ->
        |  cast(round(cast(x as double) * 1000) as bigint)
        |  * cast(round(cast(y as double) * 1000) as bigint)), 0L, (acc, v) -> acc + v)"""
        .stripMargin))
    val got = ref.withColumn("g", dot_q(col("a"), col("b")))
      .select("id", "r", "g").collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row $r"))
  }

  test("interpreted eval agrees with codegen") {
    val e = QuantizedDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.5f, -0.5f, 2.25f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 1.0f, 1.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      1000)
    // interpreted: 500*1000 + (-500)*1000 + 2250*1000
    assert(e.eval(null) == 500L * 1000 - 500L * 1000 + 2250L * 1000)
  }

  test("rounding is HALF_UP away from zero (matches Spark round and DuckDB round)") {
    assert(QMath.qround(2.5) == 3L)
    assert(QMath.qround(-2.5) == -3L)
    assert(QMath.qround(2.4999) == 2L)
    assert(QMath.qround(-2.4999) == -2L)
    assert(QMath.qround(0.0) == 0L)
  }

  test("qround does not inherit the floor(v+0.5) midpoint defect (r12)") {
    // 0.49999999999999994 + 0.5 rounds UP to 1.0 in float arithmetic
    // (JDK-8010430); Spark's BigDecimal HALF_UP and DuckDB's std::round
    // both keep it at 0 — so must we
    assert(QMath.qround(0.49999999999999994) == 0L)
    assert(QMath.qround(-0.49999999999999994) == 0L)
    // and a Spark-side cross-check on the same value through round()
    val viaSpark = spark.sql(
      "SELECT cast(round(0.49999999999999994d) as bigint)").head.getLong(0)
    assert(viaSpark == 0L && QMath.qround(0.49999999999999994) == viaSpark)
  }

  test("non-finite components throw instead of silently quantizing (r12)") {
    intercept[ArithmeticException](QMath.qround(Double.NaN))
    intercept[ArithmeticException](QMath.qround(Double.PositiveInfinity))
    intercept[ArithmeticException](QMath.qround(Double.NegativeInfinity))
    // finite BIGINT overflow throws too (ANSI/DuckDB cast parity): a
    // corrupt 1e17 component at scale 1000 must not saturate-and-wrap
    intercept[ArithmeticException](QMath.qround(1e20))
    intercept[ArithmeticException](QMath.qround(-1e20))
    assert(QMath.qround(9e18) == 9000000000000000000L) // inside range: fine
    // end-to-end through the expression (codegen path): the corrupted
    // embedding must fail loudly, not join a similarity ranking as 0
    val df = Seq((1L, Array(1.0, Double.NaN), Array(1.0, 1.0))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      df.withColumn("d", dot_q(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException in the cause chain, got $e")
  }

  test("null array → null; null element → null; length mismatch → common prefix") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(1.0f), Some(1.0f)))),
      (2L, None, Some(Seq(Some(1.0f)))),
      (3L, Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f)))),
      (4L, Some(Seq(Some(1.0f), Some(2.0f), Some(3.0f))), Some(Seq(Some(2.0f)))))
      .toDF("id", "a", "b")
    val out = df.withColumn("d", dot_q(col("a"), col("b")))
      .select("id", "d").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == Some(3000000L))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    assert(out(4L) == Some(2000000L)) // prefix: 1000*2000
  }

  test("works on long/int arrays too (pre-quantized inputs, scale 1)") {
    val df = Seq((1L, Seq(10L, 20L), Seq(3L, 4L))).toDF("id", "a", "b")
    val out = df.withColumn("d", dot_q(col("a"), col("b"), scale = 1)).collect()
    assert(out.head.getAs[Long]("d") == 10 * 3 + 20 * 4)
  }
}

class SimHashAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.functions.SimHashAgg.simhash_agg

  test("matches the declarative 64-conditional-sum formulation bit for bit") {
    val features = Seq(
      (1L, 0x0123456789abcdefL), (1L, 0x0f0f0f0f0f0f0f0fL), (1L, -1L),
      (2L, 42L), (2L, 43L),
      (3L, 0L)).toDF("id", "h")
    val viaAgg = features.groupBy("id").agg(simhash_agg(col("h")).as("s"))
      .as[(Long, Long)].collect().toMap
    // declarative reference computation
    val bitCols = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i"))
    val ref = features.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
      .collect().map { r =>
        var h = 0L
        (0 until 64).foreach(i => if (r.getAs[Long](s"s$i") > 0) h |= (1L << i))
        r.getAs[Long]("id") -> h
      }.toMap
    assert(viaAgg == ref)
  }

  test("single feature yields its own bit pattern; null features are ignored") {
    val one = Seq((1L, Some(0xdeadbeefL)), (1L, None)).toDF("id", "h")
      .groupBy("id").agg(simhash_agg(col("h")).as("s"))
      .as[(Long, Long)].collect().head
    assert(one._2 == 0xdeadbeefL) // every set bit counts +1, clear bits -1 → sign reproduces the hash
  }

  test("partial-aggregation merge across partitions is exact") {
    val many = (0 until 1000).map(i => (i % 4).toLong -> (i * 0x9E3779B97F4A7C15L))
    val a = many.toDF("id", "h").repartition(8)
      .groupBy("id").agg(simhash_agg(col("h")).as("s")).as[(Long, Long)].collect().toMap
    val b = many.toDF("id", "h").coalesce(1)
      .groupBy("id").agg(simhash_agg(col("h")).as("s")).as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
