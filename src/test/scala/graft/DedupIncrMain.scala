package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupIndex

/** Standing-dedup-index scale probe (r13 verdict #2): on the SF's
  * documents table, compare the cost of a FULL recompute against the cost
  * of folding a fixed ~500-doc increment through the standing index. Run
  * across SFs, the full wall should track the corpus while the increment
  * wall tracks the batch.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "Test/runMain graft.DedupIncrMain"
  */
object DedupIncrMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      // a real 100 TB corpus spans thousands of files; at probe scale the
      // default 256 MiB target collapses every standing table to ONE file,
      // which hides the layout-pruning behavior this probe measures — 1 MiB
      // keeps the file counts representative
      .config("spark.graft.dedup.maintainTargetBytes", 1L << 20)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = "/tmp/graft_dedupincr"
    LocalPaths.deleteRecursively(root)

    def timed[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-52s $s%8.2f s")
      (r, s)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val n = docs.count()
    // two fixed ~500-doc holdout batches off the top of the id order —
    // the increment size stays CONSTANT across SFs so the walls compare
    val batchFrac = 500.0 / n
    val Seq(c1, c2) = docs.selectExpr(
        s"percentile_approx(doc_id, array(${1 - 2 * batchFrac}, ${1 - batchFrac}))")
      .first().getSeq[Long](0).toIndexedSeq
    val base = docs.filter(col("doc_id") < c1)
    val batchA = docs.filter(col("doc_id") >= c1 && col("doc_id") < c2)
    val batchB = docs.filter(col("doc_id") >= c2)
    println(s"PROBE corpus $n docs; base ${base.count()}, " +
      s"batches ${batchA.count()} + ${batchB.count()}")

    // the cost an increment AVOIDS: one full recompute over everything
    val srcFull = s"$root/src_full"
    graft.delta.GraftWriter.write(docs, srcFull,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    timed(s"FULL recompute (buildFromSource, $n docs)") {
      DedupIndex.buildFromSource(spark, srcFull, "text", "doc_id",
        s"$root/idx_full")
    }

    val src = s"$root/src"
    graft.delta.GraftWriter.write(base, src,
      configuration = Some(Map("delta.enableChangeDataFeed" -> "true")))
    timed(s"standing build (base)") {
      DedupIndex.buildFromSource(spark, src, "text", "doc_id", s"$root/idx")
    }
    graft.delta.GraftWriter.write(batchA, src, SaveMode.Append)
    val ((a1, e1), _) = timed("increment A (~500 docs)") {
      DedupIndex.refreshFromSource(spark, s"$root/idx")
    }
    graft.delta.GraftWriter.write(batchB, src, SaveMode.Append)
    val ((a2, e2), _) = timed("increment B (~500 docs)") {
      DedupIndex.refreshFromSource(spark, s"$root/idx")
    }
    println(s"PROBE increments: A=($a1 docs, $e1 edges) B=($a2 docs, $e2 edges)")

    // the equivalence that makes the walls comparable: same survivors
    val full = DedupIndex.survivors(spark, s"$root/idx_full")
      .orderBy("comp").collect().toSeq
    val incr = DedupIndex.survivors(spark, s"$root/idx")
      .orderBy("comp").collect().toSeq
    require(full == incr,
      s"incremental (${incr.size}) != full (${full.size}) survivors")
    println(s"PROBE survivors match: ${full.size} families")
    spark.stop()
  }
}
