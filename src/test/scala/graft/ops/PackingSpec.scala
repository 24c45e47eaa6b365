package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val budget = 100L

  private def pack(sizes: Seq[Long], parts: Int = 4) = {
    val docs = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n_tokens")
    Packing.packSequences(docs, "doc_id", "n_tokens", budget, parts)
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("every doc lands in exactly one bin; no bin exceeds the budget") {
    val rnd = new scala.util.Random(3)
    val sizes = (0 until 2000).map(_ => 1L + rnd.nextInt(60))
    val out = pack(sizes)
    assert(out.map(_._2).sorted == (0L until 2000L))
    val byBin = out.groupBy(_._1).values.map(_.map(_._3).sum)
    assert(byBin.forall(_ <= budget))
  }

  test("oversized docs get dedicated bins, others still pack") {
    val out = pack(Seq(250L, 100L, 60L, 40L, 30L), parts = 1)
    val binOf = out.map(t => t._2 -> t._1).toMap
    val byBin = out.groupBy(_._1)
    // 250 and 100 (>= budget) are alone
    assert(byBin(binOf(0L)).map(_._2) == Seq(0L))
    assert(byBin(binOf(1L)).map(_._2) == Seq(1L))
    // 60+40 pack together; 30 alone or with them (best-fit: 60+40=100 full)
    assert(binOf(2L) == binOf(3L))
    assert(byBin.values.map(_.map(_._3).sum).forall(s => s <= budget || s == 250L))
  }

  test("fill factor is high for a dense size mix") {
    val rnd = new scala.util.Random(11)
    val sizes = (0 until 5000).map(_ => 1L + rnd.nextInt(50))
    val out = pack(sizes, parts = 8)
    val nBins = out.map(_._1).distinct.size
    val total = sizes.sum.toDouble
    val fill = total / (nBins * budget)
    assert(fill > 0.9, f"fill factor $fill%.3f with $nBins bins")
  }

  test("deterministic across runs") {
    val sizes = (0 until 500).map(i => 1L + (i * 37 % 80))
    assert(pack(sizes) == pack(sizes))
  }

  test("string ids refuse loudly instead of null-casting (r11 review)") {
    val docs = Seq(("doc-1", 10L), ("doc-2", 20L)).toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException](
      Packing.packSequences(docs, "doc_id", "n_tokens", 100L))
    assert(e.getMessage.contains("integral id column"))
  }
}
