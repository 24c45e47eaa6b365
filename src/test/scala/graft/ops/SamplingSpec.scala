package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = (0 until 1000).map { i =>
    (i.toLong, s"lang${i % 3}", s"body $i")
  }.toDF("doc_id", "lang", "text")

  test("stratified takes exactly k per stratum, deterministically") {
    val s1 = Sampling.stratified(docs, Seq("lang"), "doc_id", 25)
    val s2 = Sampling.stratified(docs.repartition(13), Seq("lang"), "doc_id", 25)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("lang0" -> 25L, "lang1" -> 25L, "lang2" -> 25L))
    // partitioning-independent: identical id sets
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
           s2.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("stratified caps at stratum size") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "lang")
    assert(Sampling.stratified(tiny, Seq("lang"), "doc_id", 10).count() == 3)
  }

  test("byFraction is stateless, deterministic, and near the target rate") {
    val f = Sampling.byFraction(docs, "doc_id", 0.25)
    val n = f.count()
    assert(n > 150 && n < 350, s"got $n of 1000 at fraction 0.25")
    assert(f.collect().sameElements(Sampling.byFraction(docs, "doc_id", 0.25).collect()))
    assert(Sampling.byFraction(docs, "doc_id", 1.0).count() == 1000)
    assert(Sampling.byFraction(docs, "doc_id", 0.0).count() == 0)
  }

  test("byQuota honors per-class quotas and drops unlisted strata") {
    val kept = Sampling.byQuota(docs, "lang", "doc_id", Map("lang0" -> 5, "lang2" -> 40))
    val counts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("lang0" -> 5L, "lang2" -> 40L))
    assert(kept.columns.toSeq == docs.columns.toSeq)
  }
}
