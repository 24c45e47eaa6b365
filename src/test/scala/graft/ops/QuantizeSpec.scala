package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (1L, Array(0.5f, -0.25f, 0.125f, 0.0f)), // same direction as 0, half scale
    (2L, Array(-1.0f, 0.5f, -0.25f, 0.0f)),  // antipodal to 0
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))      // zero vector
  ).toDF("vec_id", "embedding")

  test("scalarQuantize maps the max-abs component to ±127, zeros to zeros") {
    val byId = Quantize.scalarQuantize(vecs, "embedding")
      .select("vec_id", "q8", "q8_scale")
      .collect().map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getDouble(2))).toMap
    assert(byId(0L)._1 == Seq[Byte](127, -64, 32, 0)) // round(0.25*127)=round(31.75)=32
    assert(byId(0L)._2 == 127.0)
    // direction preserved under per-vector scaling: same codes as vec 0
    assert(byId(1L)._1 == byId(0L)._1)
    assert(byId(2L)._1 == Seq[Byte](-127, 64, -32, 0))
    assert(byId(3L)._1 == Seq[Byte](0, 0, 0, 0) && byId(3L)._2 == 1.0)
  }

  test("dequantize reconstructs within one code step of 1/127") {
    val rt = Quantize.dequantize(
        Quantize.scalarQuantize(vecs, "embedding"), "q8", "q8_scale", "recon")
      .select(col("vec_id"), col("embedding"), col("recon"))
      .as[(Long, Array[Float], Array[Float])].collect()
    rt.foreach { case (_, orig, recon) =>
      orig.zip(recon).foreach { case (o, r) =>
        assert(math.abs(o - r) <= (math.abs(orig.map(math.abs).max) / 127.0) / 2 + 1e-6)
      }
    }
  }

  test("quantizedTopK ranks by the DESCALED dot: magnitude counts, codes alone do not") {
    // vec 4 is code-identical to the query (same direction) but 1000×
    // smaller — ranking by the raw integer dot would tie it with vec 0;
    // the descaled ranking puts it below the genuinely-closer vec 1
    val withTiny = vecs.union(
      Seq((4L, Array(0.001f, -0.0005f, 0.00025f, 0.0f))).toDF("vec_id", "embedding"))
    val ranked = Quantize.quantizedTopK(withTiny, "vec_id", "embedding",
      queryId = 0, k = 5).as[(Long, Long)].collect().toSeq
    assert(ranked.map(_._1) == Seq(0L, 1L, 4L, 3L, 2L),
      s"descaled ranking wrong: $ranked")
    val dots = ranked.toMap
    assert(dots(0L) == 127L * 127 + 64 * 64 + 32 * 32) // self dot
    assert(dots(1L) == dots(0L)) // identical codes after per-vector scaling
    assert(dots(4L) == dots(0L)) // ...and for the tiny vector too
    assert(dots(2L) == -dots(0L))
    assert(dots(3L) == 0L)
  }

  test("int8Dot scores ragged arrays over the common prefix (r11 review)") {
    // note: Array[Byte] encodes as BINARY, so build array<tinyint> literals
    val d = spark.range(1).select(
      array(lit(10.toByte), lit(20.toByte), lit(30.toByte)).as("a"),
      array(lit(1.toByte), lit(2.toByte)).as("b"))
    val got = d.select(Quantize.int8Dot(col("a"), col("b")).as("dot"))
      .as[Long].head()
    assert(got == 10L * 1 + 20L * 2, s"expected common-prefix dot, got $got")
  }
}
