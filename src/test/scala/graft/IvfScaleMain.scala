package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AdversarialVectors, IvfIndex, Similarity}

/** Committed-IVF lifecycle at ≥5M vectors (r15 — the r14 verdict's #4):
  * the largest prior measured point was 100k vectors; this probe runs the
  * FULL source-bound lifecycle — CDF source build, incremental refresh,
  * DML delete fold, recall/latency frontier — on the adversarial corpus
  * (overlapping Gaussians + 20% noise, the hard-recall shape) at 5M × dim
  * 32, k = 64 clusters, and asserts the probe's partition pruning holds at
  * that scale.
  *
  * Run: sbt "Test/runMain graft.IvfScaleMain" (optional arg: corpus size)
  */
object IvfScaleMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nIncr = 20000L
    val k = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = "/tmp/graft_ivfscale"
    LocalPaths.deleteRecursively(root)
    val src = s"$root/source"
    val idx = s"$root/idx"

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val corpus = AdversarialVectors.corpus(spark, n + nIncr, dim = 32, g = 16)
    println(s"PROBE adversarial corpus ${n + nIncr} vecs dim 32, k=$k")
    timed(s"source write ($n base rows, CDF)") {
      graft.delta.GraftWriter.write(
        corpus.filter(col("vec_id") < n), src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    }
    timed(s"buildFromTable ($n vecs, k=$k)") {
      IvfIndex.buildFromTable(spark, src, "vec_id", "embedding", idx,
        nClusters = k)
    }
    timed(s"append + refreshFromSource ($nIncr vecs)") {
      graft.delta.GraftWriter.write(
        corpus.filter(col("vec_id") >= n), src,
        org.apache.spark.sql.SaveMode.Append)
      IvfIndex.refreshFromSource(spark, idx)
    }
    // a takedown wave: 1000 deletes fold as tombstones in O(batch)
    timed("DML delete 1000 + refresh (tombstone fold)") {
      graft.delta.Dml.delete(spark, src,
        col("vec_id") >= 1000L && col("vec_id") < 2000L)
      IvfIndex.refreshFromSource(spark, idx)
    }

    // corpus AFTER the delete — the truth the probes are held to
    val live = corpus.filter(col("vec_id") < 1000L ||
      col("vec_id") >= 2000L).localCheckpoint(true)
    val queryIds = (0L until 20L).filter(_ % 5 != 4).take(8) ++
      Seq(4L, 9L).map(_ + n - 20)
    val queries = queryIds.map { qid =>
      qid -> live.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
    }
    val truths = timed(s"brute-force truth (${queries.size} queries)") {
      queries.map { case (qid, _) =>
        qid -> Similarity.bruteForceTopK(live, "vec_id", "embedding", qid, 10)
          .select("vec_id").as[Long].collect().toSet
      }.toMap
    }

    // pruning assertion at scale: a probed scan touches ≤ nProbe partitions
    val res = IvfIndex.topK(spark, idx, queries.head._2, k = 10, nProbe = 4)
    val touched = res.inputFiles.filter(_.contains("postings")).flatMap(
      "cluster=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    require(touched.nonEmpty && touched.size <= 4,
      s"probe must touch <= nProbe partitions at 5M, got ${touched.size}")
    println(s"PROBE pruning: nProbe=4 probe touched ${touched.size}/$k partitions")

    println("PROBE nProbe  recall@10  probe_wall_avg_s")
    Seq(1, 4, 8, 16, 64).foreach { nProbe =>
      var wall = 0.0
      val recalls = queries.map { case (qid, qv) =>
        val t = System.nanoTime()
        val got = IvfIndex.topK(spark, idx, qv, k = 10, nProbe = nProbe)
          .select("id").as[Long].collect().toSet
        wall += (System.nanoTime() - t) / 1e9
        (got intersect truths(qid)).size / 10.0
      }
      val r = recalls.sum / recalls.size
      println(f"PROBE $nProbe%6d  $r%9.3f  ${wall / queries.size}%16.3f")
      if (nProbe == k) require(r == 1.0,
        s"exhaustive probe must equal brute force over the live corpus, recall $r")
    }

    // batched serving at scale
    val t2 = System.nanoTime()
    val batched = IvfIndex.topKBatch(spark, idx, queries, k = 10, nProbe = 16)
      .select("qid", "id").as[(Long, Long)].collect()
    require(batched.length == queries.size * 10)
    println(f"PROBE topKBatch(${queries.size} queries, nProbe=16) " +
      f"${(System.nanoTime() - t2) / 1e9}%.2f s")
    spark.stop()
  }
}
