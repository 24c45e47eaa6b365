package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, Similarity}

/** IVF-index scale probe (r12 verdict #8): build the committed index over
  * the full embeddings table, measure build / refresh / probe walls and
  * recall@10 vs brute force, at sf1 and sf10.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "Test/runMain graft.IvfProbeMain"
  */
object IvfProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = "/tmp/graft_ivfprobe"
    LocalPaths.deleteRecursively(root)

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = vecs.count()
    println(s"PROBE embeddings $n")

    // hold out the top decile of ids as the refresh batch (ids are NOT
    // contiguous at sf10 — replicas carry offsets — so split by quantile)
    val cut = vecs.selectExpr("percentile_approx(vec_id, 0.9)").first().getLong(0)
    val base = vecs.filter(col("vec_id") < cut)
    val incoming = vecs.filter(col("vec_id") >= cut)
    val nIncoming = incoming.count()

    timed(s"build (k=64 clusters over ${n - nIncoming} vecs)") {
      IvfIndex.build(spark, base, "vec_id", "embedding", root, nClusters = 64)
    }
    timed(s"refresh (+$nIncoming vecs, nearest-centroid append)") {
      val appended = IvfIndex.refresh(spark, incoming, "vec_id", "embedding", root)
      require(appended == nIncoming, s"refresh appended $appended != $nIncoming")
    }

    val someIds = vecs.select("vec_id").orderBy("vec_id")
      .limit(30000).as[Long].collect()
    val queryIds = Seq(someIds(1), someIds(5003), someIds(17077),
      someIds(29999)) :+ incoming.select(max("vec_id")).first().getLong(0)
    val recalls = queryIds.map { qid =>
      val qv = vecs.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
      val got = timed(s"probe q=$qid (nProbe=8/64)") {
        IvfIndex.topK(spark, root, qv, k = 10, nProbe = 8)
          .select("id").as[Long].collect().toSet
      }
      val truth = timed(s"brute force q=$qid") {
        Similarity.bruteForceTopK(vecs, "vec_id", "embedding", qid, 10)
          .select("vec_id").as[Long].collect().toSet
      }
      (got intersect truth).size / 10.0
    }
    val recall = recalls.sum / recalls.size
    println(s"PROBE recall@10 over ${queryIds.size} queries: $recall (per-query $recalls)")
    assert(recall >= 0.7, s"recall@10 $recall below 0.7 at nProbe=8/64")
    spark.stop()
  }
}
