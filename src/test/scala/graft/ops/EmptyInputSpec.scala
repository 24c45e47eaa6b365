package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every pipeline operator over EMPTY input: a corpus slice with no
  * documents, a filter that matched nothing, a dedup pass that found no
  * pairs — all normal production outcomes that small happy-path fixtures
  * never exercise (the empty-pair-set NPE in connectedComponents survived
  * five rounds exactly this way). Each call must return an empty result,
  * not throw. */
class EmptyInputSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val noDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noVecs: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private val noEvents: DataFrame =
    Seq.empty[(Long, Long, String, Double)].toDF("event_id", "user_id", "event_type", "value")

  test("dedup operators tolerate an empty corpus") {
    assert(Dedup.exact(noEvents, Seq("user_id", "event_type"), "event_id").count() == 0)
    assert(Dedup.byFingerprint(noDocs, "text", "doc_id").count() == 0)
    assert(Dedup.jaccardPairs(Dedup.shingles(noDocs, "text", "doc_id"), "doc_id", 1, 2).count() == 0)
    assert(Dedup.minhashLshPairs(noDocs, "text", "doc_id", 1, 2).count() == 0)
    assert(Dedup.simhashPairs(noDocs, "text", "doc_id").count() == 0)
    assert(Dedup.contamination(noDocs, "text", "doc_id",
      noDocs.select(col("doc_id").as("bench_id"), col("text")), "text", "bench_id",
      n = 3, thresholdNum = 3, thresholdDen = 5).count() == 0)
    assert(Dedup.embeddingSimilarPairs(noVecs, "vec_id", "embedding", 45, 100).count() == 0)
    assert(Dedup.embeddingSimilarPairsMultiLsh(noVecs, "vec_id", "embedding",
      45, 100, nTables = 4, nPlanes = 2).count() == 0)
  }

  test("similarity and quantization tolerate an empty corpus / missing query") {
    assert(Similarity.bruteForceTopK(noVecs, "vec_id", "embedding", 0, 10).count() == 0)
    assert(Quantize.quantizedTopK(noVecs, "vec_id", "embedding", 0, 10).count() == 0)
    assert(Similarity.centroids(noVecs, "embedding", "vec_id").count() == 0)
    // a query id that matches nothing on a NON-empty corpus
    val vecs = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 999, 10).count() == 0)
  }

  test("text analysis tolerates an empty corpus") {
    assert(TextAnalysis.tokenStats(noDocs, "text", "doc_id").count() == 0)
    assert(TextAnalysis.qualityScore(noDocs, "text", "doc_id").count() == 0)
    assert(TextAnalysis.languageId(noDocs, "text", "doc_id").count() == 0)
    assert(TextAnalysis.fingerprint(noDocs, "text", "doc_id").count() == 0)
    assert(TextAnalysis.subwordCount(noDocs, "text", "doc_id").count() == 0)
    assert(TextAnalysis.redactPii(noDocs, "text", "doc_id").count() == 0)
  }

  test("packing, sampling, clustering tolerate empty input") {
    val docs = noDocs.withColumn("n_tokens", lit(1L))
    assert(Packing.packSequences(docs, "doc_id", "n_tokens", budget = 128).count() == 0)
    assert(Sampling.stratified(noDocs.withColumn("lang", lit("en")),
      Seq("lang"), "doc_id", 5).count() == 0)
    assert(Clustering.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
  }

  test("multimodal plumbing tolerates empty input and null payloads") {
    val noBin = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(MultiModal.extractMetadata(noBin, "payload").count() == 0)
    val withNull = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val m = MultiModal.extractMetadata(withNull, "payload").collect().head
    assert(m.getAs[Long]("n_bytes") == 0L && m.getAs[Int]("width") == 0)
  }
}
