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

  test("r17: repackDeletes ≡ full repack; untouched partitions byte-identical; CDF is O(changed)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val sizes = (0 until 3000).map(_ => 1L + rnd.nextInt(60))
    val docs = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", budget, 8)
      .localCheckpoint(true)
    val delIds = Seq(5L, 17L, 100L, 2999L)
    val (newPacked0, cdf0) = Packing.repackDeletes(packed,
      delIds.toDF("doc_id"), budget)
    val newPacked = newPacked0.as[(Long, Long, Long)].collect().toSet
    val cdf = cdf0.as[(Long, String)].collect().toSeq
    // the incremental result IS the full repack of the remaining corpus
    val full = Packing.packSequences(
        docs.filter(!col("doc_id").isin(delIds.map(Long.box): _*)),
        "doc_id", "n_tokens", budget, 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(newPacked == full, "repackDeletes must equal the full repack")
    // O(affected): only the deleted docs' partitions were touched —
    // every other partition's rows pass through byte-identical, and the
    // bin CDF names bins of affected partitions only
    val oldRows = packed.as[(Long, Long, Long)].collect()
    val affPids = oldRows.filter(r => delIds.contains(r._2))
      .map(_._1 >> 32).toSet
    assert(affPids.size < 8, "the wave must leave some partition untouched")
    val untouchedOld = oldRows.filterNot(r => affPids.contains(r._1 >> 32)).toSet
    assert(untouchedOld.subsetOf(newPacked),
      "untouched partitions must pass through byte-identical")
    assert(cdf.forall { case (b, _) => affPids.contains(b >> 32) },
      "the bin CDF must only name affected partitions' bins")
    // CDF consistency: removed bins vanished, added bins are new,
    // rewritten bins exist on both sides with different membership
    val oldBins = oldRows.map(_._1).toSet
    val newBins = newPacked.map(_._1)
    cdf.foreach {
      case (b, "removed") => assert(oldBins(b) && !newBins(b), s"bin $b")
      case (b, "added") => assert(!oldBins(b) && newBins(b), s"bin $b")
      case (b, "rewritten") =>
        assert(oldBins(b) && newBins(b) &&
          oldRows.filter(_._1 == b).map(_._2).toSet !=
            newPacked.filter(_._1 == b).map(_._2), s"bin $b")
      case (b, c) => fail(s"unexpected change '$c' for bin $b")
    }
    // bins the repack reproduced identically emit NO row
    val cdfBins = cdf.map(_._1).toSet
    val reproduced = newPacked.map(_._1)
      .filter(b => affPids.contains(b >> 32) && !cdfBins.contains(b))
    reproduced.foreach { b =>
      assert(oldRows.filter(_._1 == b).map(_._2).toSet ==
        newPacked.filter(_._1 == b).map(_._2), s"bin $b silently changed")
    }
  }

  test("r17: repackDeletes with no matching ids is a no-op with an empty CDF") {
    val docs = (0 until 200).map(i => (i.toLong, 1L + (i * 13 % 50)))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", budget, 4)
      .localCheckpoint(true)
    val (out, cdf) = Packing.repackDeletes(packed,
      Seq(99999L).toDF("doc_id"), budget)
    assert(out.as[(Long, Long, Long)].collect().toSet ==
      packed.as[(Long, Long, Long)].collect().toSet)
    assert(cdf.isEmpty)
  }
}
