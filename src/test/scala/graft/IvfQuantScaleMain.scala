package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AdversarialVectors, IvfIndex, Similarity}

/** Quantized-IVF probe-bandwidth scale point (r16 verdict #3): build the
  * int8-quantized index over the adversarial corpus at 1M × dim 32, fold a
  * delete wave, then measure the PROBE SCAN BYTES (task input metrics —
  * actual columnar read volume, which is what a 100 TB probe pays) of the
  * float path vs the quantized path over the SAME index and probe sets,
  * plus the exact-rerank path recovering the float top-k. The nominal
  * claim is ~4× fewer vector bytes (int8 codes vs float32); the measured
  * ratio lands lower because the id/ver columns are shared overhead.
  *
  * Run: sbt "Test/runMain graft.IvfQuantScaleMain" (optional arg: corpus size)
  */
object IvfQuantScaleMain {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val k = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = "/tmp/graft_ivfquantscale"
    LocalPaths.deleteRecursively(root)
    val src = s"$root/source"
    val idx = s"$root/idx"

    val bytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytes.add(e.taskMetrics.inputMetrics.bytesRead)
    })
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // bytes settle asynchronously on the listener bus; the sleeps bound
    // the race for a MEASUREMENT main (never a correctness surface)
    def measured[A](label: String)(body: => A): (A, Long) = {
      Thread.sleep(500); bytes.reset()
      val t0 = System.nanoTime()
      val r = body
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      val b = bytes.sum()
      println(f"PROBE $label%-46s $w%8.2f s ${b / 1048576.0}%10.2f MiB read")
      (r, b)
    }

    val corpus = AdversarialVectors.corpus(spark, n, dim = 32, g = 16)
    println(s"PROBE adversarial corpus $n vecs dim 32, k=$k, quantize=int8")
    timed(s"source write ($n rows, CDF)") {
      graft.delta.GraftWriter.write(corpus, src,
        configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    }
    timed(s"buildFromTable quantized ($n vecs, k=$k)") {
      IvfIndex.buildFromTable(spark, src, "vec_id", "embedding", idx,
        nClusters = k, quantize = true)
    }
    timed("DML delete 1000 + refresh (tombstone fold)") {
      graft.delta.Dml.delete(spark, src,
        col("vec_id") >= 1000L && col("vec_id") < 2000L)
      IvfIndex.refreshFromSource(spark, idx)
    }

    val queryIds = Seq(0L, 7L, 42L, 5000L, n - 5L)
    val queries = queryIds.map { qid =>
      qid -> corpus.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
    }
    // warm both paths once (footer caches, codegen) so the measured
    // passes compare steady-state scan bytes, not one-time setup
    IvfIndex.topK(spark, idx, queries.head._2, 10, 4).collect()
    IvfIndex.topKQuantized(spark, idx, queries.head._2, 10, 4).collect()

    Seq(4, 16, 64).foreach { nProbe =>
      val (fl, fb) = measured(s"float topK x${queries.size} (nProbe=$nProbe)") {
        queries.map { case (_, qv) =>
          IvfIndex.topK(spark, idx, qv, 10, nProbe)
            .select("id").as[Long].collect().toSeq }
      }
      val (qr, qb) = measured(s"quantized topK x${queries.size} (nProbe=$nProbe)") {
        queries.map { case (_, qv) =>
          IvfIndex.topKQuantized(spark, idx, qv, 10, nProbe)
            .select("id").as[Long].collect().toSeq }
      }
      val (rr, rb) = measured(s"quantized+rerank256 x${queries.size} (nProbe=$nProbe)") {
        queries.map { case (_, qv) =>
          IvfIndex.topKQuantized(spark, idx, qv, 10, nProbe, rerank = 256)
            .select("id").as[Long].collect().toSeq }
      }
      val agree = qr.zip(fl).count { case (a, b) => a.toSet == b.toSet }
      val rrAgree = rr.zip(fl).count { case (a, b) => a == b }
      println(f"PROBE nProbe=$nProbe%2d bytes float/quant = ${fb.toDouble / math.max(qb, 1)}%5.2fx" +
        f"  top10-set agree quant=$agree/${queries.size} rerank=$rrAgree/${queries.size}")
      require(rrAgree == queries.size,
        s"rerank=256 must recover the float top-k at nProbe=$nProbe")
      if (nProbe == k) require(qb.toDouble <= fb / 2.0,
        s"exhaustive quantized probe must read well under half the float bytes ($qb vs $fb)")
    }
    spark.stop()
  }
}
