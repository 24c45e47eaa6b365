package graft.functions

import graft.SparkTestBase
import graft.functions.functions.lsh_buckets_multi
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guard rails of the fused LSH kernel (r12 review): parameter bounds,
  * the sign-matrix size cap against ragged/malformed rows, and the
  * bit-identity of the per-instance matrix memo with the companion cache. */
class LshBucketsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("parameter bounds reject configurations that would overflow the matrix") {
    intercept[IllegalArgumentException] {
      LshBucketsMultiExpr(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0f), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)), 5000, 4, 42)
    }
    intercept[IllegalArgumentException] {
      LshBucketsMultiExpr(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0f), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)), 96, 64, 42)
    }
  }

  test("a ragged monster row fails loudly instead of caching a giant matrix") {
    // 96×63 planes × a 50M-element row would be a ~300 GB matrix; the
    // size cap must refuse before allocation (a silent cache entry that
    // large is an executor OOM waiting for the next bad row)
    intercept[Exception] {
      val big = Array.fill(50_000_000)(0.0f)
      Seq((1L, big)).toDF("id", "e")
        .withColumn("b", lsh_buckets_multi(col("e"), 96, 63, 42))
        .collect()
    }
  }

  test("cache eviction past the entry cap neither hangs nor corrupts (r12)") {
    // the old clear() INSIDE computeIfAbsent violated the CHM contract
    // (deadlockable); eviction now happens before the probe. 70 distinct
    // seeds overflow the 64-entry cap at least once; matrices stay
    // deterministic across the reset.
    val before = LshBucketsMultiExpr.signMatrix(2, 2, 7, 4).clone()
    (0 until 70).foreach(s => LshBucketsMultiExpr.signMatrix(2, 2, 1000 + s, 4))
    val after = LshBucketsMultiExpr.signMatrix(2, 2, 7, 4)
    assert(java.util.Arrays.equals(before, after),
      "recomputed matrix after eviction must be bit-identical")
  }

  test("buckets are stable across the per-instance memo and dim changes") {
    // same row twice (memo hit) and a different dim in between (memo
    // refresh): buckets must be identical for identical inputs
    val rows = Seq(
      (1L, Array.tabulate(64)(i => (i - 32) / 7.0f)),
      (2L, Array.tabulate(16)(i => (i % 5) - 2.0f)),
      (3L, Array.tabulate(64)(i => (i - 32) / 7.0f)))
    val out = rows.toDF("id", "e")
      .withColumn("b", lsh_buckets_multi(col("e"), 8, 4, 42))
      .select("id", "b").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == out(3L), "identical vectors must bucket identically")
    assert(out(1L).size == 8 && out(2L).size == 8)
    // and the same query re-run (fresh plan, fresh instances) agrees
    val again = rows.toDF("id", "e")
      .withColumn("b", lsh_buckets_multi(col("e"), 8, 4, 42))
      .select("id", "b").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == out, "buckets must be plan-instance-independent")
  }
}
