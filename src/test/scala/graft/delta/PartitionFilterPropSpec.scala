package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{catalystExpression => ex}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property: `PartitionFilter.fromCatalyst` must return a NECESSARY
  * condition of the predicate — any row satisfying the predicate has
  * partition values matching EVERY extracted filter. Conflict detection
  * relies on exactly this direction (it may only prove disjointness), so a
  * generator-driven soundness check guards the rewrite against new
  * predicate shapes quietly breaking it. */
class PartitionFilterPropSpec extends AnyFunSuite with SparkTestBase {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { _ =>
      Iterator.continually(gen.sample).flatten.take(1).foreach(f)
    }

  private val partCols = Seq("p", "q")

  /** A random row: partition values + a data value. */
  private val rowGen: Gen[(String, Long, Long)] = for {
    p <- Gen.oneOf("a", "b", "c", "2021-01-01")
    q <- Gen.chooseNum(0L, 5L)
    id <- Gen.chooseNum(0L, 100L)
  } yield (p, q, id)

  /** Random predicates over p (string part col), q (long part col), id
    * (data col), mixing supported and unsupported shapes. */
  private def predGen: Gen[Column] = {
    val leaf: Gen[Column] = Gen.oneOf(
      Gen.oneOf("a", "b", "c", "2021-01-01").map(v => col("p") === v),
      Gen.oneOf("a", "b").map(v => col("p") =!= v),
      Gen.listOfN(2, Gen.oneOf("a", "b", "c")).map(vs => col("p").isin(vs: _*)),
      Gen.chooseNum(0L, 5L).map(v => col("q") === v),
      Gen.chooseNum(0L, 100L).map(v => col("id") < v),
      Gen.chooseNum(0L, 100L).map(v => col("id") === v),
      // typed date literal against the string partition col (the ADVICE-r4
      // trap shape: must extract NOTHING, never a wrong filter)
      Gen.const(col("p") === lit(java.sql.Date.valueOf("2021-01-01"))))
    for {
      n <- Gen.chooseNum(1, 3)
      leaves <- Gen.listOfN(n, leaf)
      useOr <- Gen.prob(0.2)
    } yield
      if (useOr && leaves.size >= 2)
        leaves.reduce(_ || _) // OR: nothing may be extracted per-branch
      else leaves.reduce(_ && _)
  }

  test("extracted filters are implied by the predicate (soundness)") {
    import spark.implicits._
    forAll(Gen.zip(predGen, Gen.listOfN(40, rowGen))) { case (pred, rows) =>
      val filters = PartitionFilter.fromCatalyst(ex(pred), partCols)
      val df = rows.toDF("p", "q", "id")
      // ANSI mode: a typed date literal against non-date strings makes the
      // predicate itself unevaluable (cast error) — such a sample challenges
      // nothing, skip it (extraction still ran above without error)
      val satisfying =
        try df.filter(pred).collect()
        catch { case scala.util.control.NonFatal(_) => Array.empty[org.apache.spark.sql.Row] }
      satisfying.foreach { r =>
        val pv = Map("p" -> r.getString(0), "q" -> r.getLong(1).toString)
        filters.foreach { f =>
          assert(f.matches(pv),
            s"row $pv satisfies predicate $pred but fails extracted $f")
        }
      }
    }
  }

  test("quantization round-trip error is bounded by half a code step") {
    val vecGen: Gen[Array[Float]] = Gen.chooseNum(1, 16).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-100.0, 100.0).map(_.toFloat)).map(_.toArray))
    import spark.implicits._
    forAll(Gen.listOfN(8, vecGen), n = 25) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val rt = graft.ops.Quantize.dequantize(
          graft.ops.Quantize.scalarQuantize(df, "embedding"),
          "q8", "q8_scale", "recon")
        .select("embedding", "recon")
        .as[(Array[Float], Array[Float])].collect()
      rt.foreach { case (orig, recon) =>
        val mx = orig.map(x => math.abs(x.toDouble)).max
        val bound = (if (mx == 0) 0.0 else mx / 127.0) / 2 + 1e-5
        orig.zip(recon).foreach { case (o, r) =>
          assert(math.abs(o - r) <= bound,
            s"|${o} - ${r}| > $bound (maxAbs=$mx)")
        }
      }
    }
  }
}
