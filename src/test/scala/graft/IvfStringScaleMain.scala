package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AdversarialVectors, IvfIndex, Similarity}

/** String-keyed committed-IVF lifecycle at ~1M vectors (r15 verdict #8):
  * q83 proves generic doc ids for the dedup index at gate scale and
  * IvfScaleMain runs the IVF lifecycle on long keys — this probe pins the
  * STRING-id IVF path (URL-shaped, zero-padded so string order matches the
  * numeric order) at volume: CDF source build, incremental refresh, DML
  * delete fold (tombstones carry string ids through the probe's anti-join
  * and compaction's MERGE), partition-pruned probes, recall vs a
  * string-keyed brute force.
  *
  * Run: sbt "Test/runMain graft.IvfStringScaleMain" (optional arg: size)
  */
object IvfStringScaleMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nIncr = 20000L
    val k = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = "/tmp/graft_ivfstrscale"
    LocalPaths.deleteRecursively(root)
    val src = s"$root/source"
    val idx = s"$root/idx"

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def sid(i: Long): String = f"vec://$i%012d"

    val corpus = AdversarialVectors.corpus(spark, n + nIncr, dim = 32, g = 16)
      .select(format_string("vec://%012d", col("vec_id")).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true) // base/incr splits + truth all read it
    println(s"PROBE adversarial corpus ${n + nIncr} STRING-id vecs dim 32, k=$k")
    timed(s"source write ($n base rows, CDF)") {
      graft.delta.GraftWriter.write(
        corpus.filter(col("vec_id") < sid(n)), src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    }
    timed(s"buildFromTable ($n string-id vecs, k=$k)") {
      IvfIndex.buildFromTable(spark, src, "vec_id", "embedding", idx,
        nClusters = k)
    }
    timed(s"append + refreshFromSource ($nIncr vecs)") {
      graft.delta.GraftWriter.write(
        corpus.filter(col("vec_id") >= sid(n)), src,
        org.apache.spark.sql.SaveMode.Append)
      IvfIndex.refreshFromSource(spark, idx)
    }
    timed("DML delete 1000 + refresh (string-id tombstone fold)") {
      graft.delta.Dml.delete(spark, src,
        col("vec_id") >= sid(1000L) && col("vec_id") < sid(2000L))
      IvfIndex.refreshFromSource(spark, idx)
    }

    val live = corpus.filter(col("vec_id") < sid(1000L) ||
      col("vec_id") >= sid(2000L)).localCheckpoint(true)
    val queryIds = ((0L until 20L).filter(_ % 5 != 4).take(8) ++
      Seq(4L, 9L).map(_ + n - 20)).map(sid)
    val queries = queryIds.map { qid =>
      qid -> live.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
    }
    val truths = timed(s"brute-force truth (${queries.size} queries)") {
      queries.map { case (qid, qv) =>
        qid -> Similarity.bruteForceTopK(live, "vec_id", "embedding", qv, 10)
          .select("vec_id").as[String].collect().toSet
      }.toMap
    }

    // pruning holds on the string-keyed layout: ≤ nProbe partitions touched
    val res = IvfIndex.topK(spark, idx, queries.head._2, k = 10, nProbe = 4)
    val touched = res.inputFiles.filter(_.contains("postings")).flatMap(
      "cluster=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    require(touched.nonEmpty && touched.size <= 4,
      s"probe must touch <= nProbe partitions, got ${touched.size}")
    println(s"PROBE pruning: nProbe=4 probe touched ${touched.size}/$k partitions")

    // deleted string ids are never served, at any probe width
    val deadProbe = IvfIndex.topK(spark, idx, queries.head._2, k = 10,
        nProbe = k)
      .filter(col("id") >= sid(1000L) && col("id") < sid(2000L)).count()
    require(deadProbe == 0, "a deleted string id must never be served")

    println("PROBE nProbe  recall@10  probe_wall_avg_s")
    Seq(1, 4, 16, 64).foreach { nProbe =>
      var wall = 0.0
      val recalls = queries.map { case (qid, qv) =>
        val t = System.nanoTime()
        val got = IvfIndex.topK(spark, idx, qv, k = 10, nProbe = nProbe)
          .select("id").as[String].collect().toSet
        wall += (System.nanoTime() - t) / 1e9
        (got intersect truths(qid)).size / 10.0
      }
      val r = recalls.sum / recalls.size
      println(f"PROBE $nProbe%6d  $r%9.3f  ${wall / queries.size}%16.3f")
      if (nProbe == k) require(r == 1.0,
        s"exhaustive probe must equal string-keyed brute force, recall $r")
    }
    spark.stop()
  }
}
