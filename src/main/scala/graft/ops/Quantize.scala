package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector int8 scalar quantization for embedding columns — the storage
  * and bandwidth lever for similarity search at corpus scale: a float32
  * embedding shrinks 4× (int8 codes + one float scale per vector), scans
  * stream 4× more vectors per byte of IO, and dot products run on exact
  * integers (no float-summation-order nondeterminism in rankings).
  *
  * Scheme: symmetric max-abs scaling, `scale = 127 / max(|v_i|)`,
  * `q_i = round(v_i · scale)` ∈ [-127, 127] (half-away-from-zero, the
  * rounding DuckDB/ANSI also use — the oracle can replicate exactly).
  * Everything is expressed with codegen'd collection expressions
  * (`transform` / `zip_with` / `aggregate`) — per-row, zero shuffle. */
object Quantize {

  private def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Adds `qCol` (array<tinyint>) and `scaleCol` (double) to `df`. The
    * all-zero vector quantizes to zeros with scale 1 (nothing to scale). */
  def scalarQuantize(df: DataFrame, vecCol: String,
                     qCol: String = "q8", scaleCol: String = "q8_scale"): DataFrame = {
    val mx = maxAbs(col(vecCol))
    df.withColumn(scaleCol,
        when(mx.isNull || mx === 0.0, lit(1.0)).otherwise(lit(127.0) / mx))
      .withColumn(qCol,
        transform(col(vecCol), x =>
          round(x.cast("double") * col(scaleCol)).cast("tinyint")))
  }

  /** Reconstruct an approximate float vector from its codes. */
  def dequantize(df: DataFrame, qCol: String, scaleCol: String,
                 outCol: String): DataFrame =
    df.withColumn(outCol,
      transform(col(qCol), x => (x.cast("double") / col(scaleCol)).cast("float")))

  /** Exact integer dot product of two int8 code arrays. Ragged lengths
    * score over the COMMON PREFIX (zip_with null-pads the shorter array;
    * the coalesce treats the padding as 0) — the same semantics as the
    * float [[graft.functions.functions.dot_q]] kernel, so the quantized
    * and exact baselines agree on malformed corpora instead of the
    * quantized row silently nulling to last place (r11 review). */
  def int8Dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        coalesce(x.cast("long") * y.cast("long"), lit(0L))),
      lit(0L), (acc, e) => acc + e)

  /** Brute-force top-k over QUANTIZED codes: one corpus pass against the
    * broadcast quantized query — `TakeOrderedAndProject` keeps top-k per
    * partition, no full sort. The 4×-smaller scan is the point; ranking
    * quality vs float dot is the standard int8 trade (≈1 ULP of 1/127
    * per component).
    *
    * RANKING divides the per-vector scales back out: the raw integer dot
    * is `dot(a,q)·scale_a·scale_q` with `scale_v = 127/maxAbs(v)`, so
    * ordering by it ranks `dot/maxAbs(corpus vector)` — a corpus with
    * non-uniform norms would invert the true ordering (a tiny vector
    * code-identical to the query would beat a large near-match). The
    * returned `dot_q8` stays the exact integer; the descale is a
    * deterministic per-row division, not a float summation. */
  def quantizedTopK(vectors: DataFrame, idCol: String, vecCol: String,
                    queryId: Long, k: Int): DataFrame = {
    val qd = scalarQuantize(vectors, vecCol)
    val query = qd.filter(col(idCol) === queryId)
      .select(col("q8").as("query_q8"), col("q8_scale").as("query_scale"))
    qd.crossJoin(broadcast(query))
      .withColumn("dot_q8", int8Dot(col("q8"), col("query_q8")))
      .orderBy((col("dot_q8") / (col("q8_scale") * col("query_scale"))).desc,
        col(idCol))
      .limit(k)
      .select(col(idCol), col("dot_q8"))
  }
}
