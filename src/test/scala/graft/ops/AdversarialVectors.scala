package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ADVERSARIAL vector corpus for ANN recall studies (r13
  * verdict #4): a mixture of `g` OVERLAPPING Gaussians (centers a couple
  * of sigmas apart, so cluster boundaries genuinely confuse an IVF coarse
  * quantizer) plus 20% uniform noise. Everything derives from xxhash64 of
  * (id, component, draw), so any SF regenerates bit-identically — no RNG
  * state, no seeds to drift.
  *
  * Schema: (vec_id long, embedding array<float>). */
object AdversarialVectors {

  /** Unit uniform in (0,1): (xxhash64(...) mod M + 0.5) / M — never 0, so
    * Box-Muller's ln() stays finite. */
  private def unit(cols: String) =
    s"(cast(abs(xxhash64($cols)) % 1048576 as double) + 0.5) / 1048576.0"

  def corpus(spark: SparkSession, n: Long, dim: Int = 32,
             g: Int = 16): DataFrame = {
    // centers: g points in [-1, 1]^dim; sigma 0.6 with ~2-unit spread
    // keeps neighboring Gaussians overlapping at several sigma
    val center = s"2.0 * ${unit("'c', pmod(vec_id, " + g + "), j")} - 1.0"
    val gauss =
      s"""$center + 0.6 * sqrt(-2.0 * ln(${unit("'u1', vec_id, j")}))
         |  * cos(2.0 * pi() * ${unit("'u2', vec_id, j")})""".stripMargin
    val noise = s"6.0 * ${unit("'n', vec_id, j")} - 3.0"
    spark.range(n).select(
      col("id").as("vec_id"),
      expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |  cast(if(pmod(vec_id, 5) = 4, $noise, $gauss) as float))"""
          .stripMargin).as("embedding"))
  }
}
