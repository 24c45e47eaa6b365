package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AdversarialVectors, IvfIndex, Similarity}

/** ANN recall/latency frontier on the ADVERSARIAL corpus (r13 verdict #4):
  * overlapping Gaussians + 20% uniform noise, where the testdata's
  * recall@10 = 1.0 at nProbe=8/64 is unattainable — measure how recall and
  * probe wall trade along nProbe = 1..k.
  *
  * Run: sbt "Test/runMain graft.IvfFrontierMain" (optional arg: corpus size)
  */
object IvfFrontierMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = "/tmp/graft_ivffrontier"
    LocalPaths.deleteRecursively(root)
    val k = 32
    val vecs = AdversarialVectors.corpus(spark, n, dim = 32, g = 16)
      .localCheckpoint(true)
    println(s"PROBE adversarial corpus $n vecs, dim 32, 16 overlapping " +
      s"gaussians + 20% noise; index k=$k clusters")
    val t0 = System.nanoTime()
    IvfIndex.build(spark, vecs, "vec_id", "embedding", root, nClusters = k)
    println(f"PROBE build ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // 20 queries: 16 mixture members + 4 noise points, fixed ids. Members
    // must dodge pmod(id,5)=4 — those ids ARE the noise under
    // AdversarialVectors (r14 review: the first cut mislabeled 4/9/14)
    val queryIds = (0L until 20L).filter(_ % 5 != 4) ++
      Seq(4L, 9L, 14L, 19L).map(_ + n - 20)
    val queries = queryIds.map { qid =>
      qid -> vecs.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
    }
    val truths = queries.map { case (qid, _) =>
      qid -> Similarity.bruteForceTopK(vecs, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
    }.toMap

    println("PROBE nProbe  recall@10  probe_wall_avg_s")
    Seq(1, 2, 4, 8, 16, 32).foreach { nProbe =>
      var wall = 0.0
      val recalls = queries.map { case (qid, qv) =>
        val t = System.nanoTime()
        val got = IvfIndex.topK(spark, root, qv, k = 10, nProbe = nProbe)
          .select("id").as[Long].collect().toSet
        wall += (System.nanoTime() - t) / 1e9
        (got intersect truths(qid)).size / 10.0
      }
      val r = recalls.sum / recalls.size
      println(f"PROBE $nProbe%6d  $r%9.3f  ${wall / queries.size}%16.3f")
      if (nProbe == k) require(r == 1.0,
        s"exhaustive probe must equal brute force, recall $r")
    }

    // batched serving: all 20 queries in ONE job vs 20 sequential probes
    Seq(4, 16).foreach { nProbe =>
      val t1 = System.nanoTime()
      queries.foreach { case (_, qv) =>
        IvfIndex.topK(spark, root, qv, k = 10, nProbe = nProbe)
          .select("id").as[Long].collect()
      }
      val single = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val batched = IvfIndex.topKBatch(spark, root, queries, k = 10,
        nProbe = nProbe).select("qid", "id").as[(Long, Long)].collect()
      val batch = (System.nanoTime() - t2) / 1e9
      require(batched.length == queries.size * 10)
      println(f"PROBE batch20 nProbe=$nProbe%-2d  single-loop $single%6.2f s  " +
        f"topKBatch $batch%6.2f s  (${single / batch}%.1f x)")
    }
    spark.stop()
  }
}
