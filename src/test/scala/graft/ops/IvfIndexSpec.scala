package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[IvfIndex]]: the IVF index as committed graft tables — build, probe
  * with partition pruning, incremental refresh on append, recall@10 vs the
  * brute-force oracle (r12 verdict #8). */
class IvfIndexSpec extends AnyFunSuite with SparkTestBase {

  private def root(name: String): String = {
    // under target/ — deleteOnExit can't remove non-empty dirs, so /tmp
    // would accrete one committed index per run (r13 review); sbt clean
    // owns target/'s lifetime
    val d = new java.io.File(
      s"target/ivfindex-$name-${java.util.UUID.randomUUID()}")
    d.mkdirs()
    d.getAbsolutePath
  }

  private lazy val vecs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def recallAt10(idxRoot: String, queryIds: Seq[Long], nProbe: Int,
                         corpus: org.apache.spark.sql.DataFrame): Double = {
    import spark.implicits._
    val hits = queryIds.map { qid =>
      val qv = corpus.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
      val got = IvfIndex.topK(spark, idxRoot, qv, k = 10, nProbe = nProbe)
        .select("id").as[Long].collect().toSet
      val truth = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
      (got intersect truth).size / 10.0
    }
    hits.sum / hits.size
  }

  test("build → topK: partition-pruned probe, recall@10 vs brute force") {
    val r = root("build")
    IvfIndex.build(spark, vecs, "vec_id", "embedding", r, nClusters = 8)
    // the probe must PRUNE: with nProbe=2 of 8 clusters, the posting scan
    // reads only the probed partitions' files
    import spark.implicits._
    val qv = vecs.filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val res = IvfIndex.topK(spark, r, qv, k = 10, nProbe = 2)
    val files = res.inputFiles.filter(_.contains("postings"))
    val clustersTouched = files.flatMap(
      "cluster=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(files.nonEmpty && clustersTouched.size <= 2,
      s"probe must touch ≤ nProbe partitions, got $clustersTouched")
    // recall: probing half the clusters on clusterable data
    val r10 = recallAt10(r, Seq(0L, 7L, 23L, 41L, 77L), nProbe = 4, vecs)
    assert(r10 >= 0.7, s"recall@10 $r10 below 0.7 at nProbe=4/8")
    // exhaustive probe = exact: recall 1 by construction
    assert(recallAt10(r, Seq(3L, 19L), nProbe = 8, vecs) == 1.0)
  }

  test("refresh appends only NEW vectors and they become searchable") {
    import spark.implicits._
    val r = root("refresh")
    val base = vecs.filter(col("vec_id") < 200)
    IvfIndex.build(spark, base, "vec_id", "embedding", r, nClusters = 4)
    // second refresh input overlaps the index: the 100 existing ids must
    // not duplicate, the 100 new ones must land
    val incoming = vecs.filter(col("vec_id") >= 100 && col("vec_id") < 300)
    val appended = IvfIndex.refresh(spark, incoming, "vec_id", "embedding", r)
    assert(appended == 100, s"only the new ids append, got $appended")
    val all = graft.delta.DeltaTable.forPath(spark, s"$r/postings").toDF
    assert(all.count() == 300 && all.select("id").distinct().count() == 300)
    // a fresh vector is found by an exhaustive probe (exact within probed)
    val qv = vecs.filter(col("vec_id") === 250)
      .select("embedding").as[Array[Float]].head()
    val top = IvfIndex.topK(spark, r, qv, k = 1, nProbe = 4)
      .select("id").as[Long].head()
    assert(top == 250, s"the appended vector must be its own nearest, got $top")
    // refresh of an already-indexed set is a no-op (no empty commit)
    val v0 = graft.delta.DeltaLog.forPath(spark, s"$r/postings").update().version
    assert(IvfIndex.refresh(spark, incoming, "vec_id", "embedding", r) == 0)
    assert(graft.delta.DeltaLog.forPath(spark, s"$r/postings").update().version == v0)
  }

  test("embeddingSimilarPairs guard refuses above maxRows unless overridden") {
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingSimilarPairs(vecs, "vec_id", "embedding", 95, 100,
        maxRows = Some(10L))
    }
    assert(e.getMessage.contains("O(n²)"))
    // override runs (bounded slice so the test stays fast)
    assert(Dedup.embeddingSimilarPairs(
      vecs.filter(col("vec_id") < 50), "vec_id", "embedding", 95, 100,
      maxRows = None).count() >= 0)
    // a cap the limit-probe cannot verify (≥ Int.MaxValue) is refused
    // up front instead of silently never tripping (r13 advice)
    val big = intercept[IllegalArgumentException] {
      Dedup.embeddingSimilarPairs(vecs, "vec_id", "embedding", 95, 100,
        maxRows = Some(Int.MaxValue.toLong))
    }
    assert(big.getMessage.contains("maxRows = None"))
  }
}
