package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IvfIndex
import graft.ops.AdversarialVectors

/** Quantized-IVF probe-bandwidth scale point (r16 verdict #3): build the
  * int8-quantized index over the adversarial corpus at 1M × dim 32, fold a
  * delete wave, then account the PROBE SCAN BYTES of the float path vs the
  * quantized path over the same index — measured from the parquet footers
  * as the total column-chunk bytes each plan's ReadSchema touches, which
  * is the IO a selective columnar reader (cluster HDFS/object store) moves
  * per probe. (Task `inputMetrics.bytesRead` is split-granular for parquet
  * and cannot see projection — verified before switching instruments.)
  * Also times both paths and checks the exact-rerank path recovers the
  * float top-k.
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

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
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

    // ---- probe scan bytes from the footers: per posting file, the
    // column-chunk bytes each plan's ReadSchema touches (leading path
    // segment names the top-level column; array columns nest below it)
    val conf = spark.sessionState.newHadoopConf()
    val postingsDir = new Path(s"$idx/postings")
    val fs = postingsDir.getFileSystem(conf)
    val it = fs.listFiles(postingsDir, true)
    var files = List.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) files ::= f.getPath
    }
    def chunkBytes(cols: Set[String]): Long = files.map { p =>
      val md = ParquetFileReader.readFooter(conf, p,
        ParquetMetadataConverter.NO_FILTER)
      md.getBlocks.asScala.map(_.getColumns.asScala
        .filter(c => cols.contains(c.getPath.toDotString.split("\\.")(0)))
        .map(_.getTotalSize).sum).sum
    }.sum
    val floatCols = Set("id", "ver", "vec")
    val quantCols = Set("id", "ver", "q8", "q8_scale")
    val fb = chunkBytes(floatCols)
    val qb = chunkBytes(quantCols)
    val vb = chunkBytes(Set("vec"))
    val cb = chunkBytes(Set("q8", "q8_scale"))
    println(f"PROBE posting files ${files.size}; exhaustive-probe column bytes:")
    println(f"PROBE   float path  (id,ver,vec)          ${fb / 1048576.0}%10.2f MiB")
    println(f"PROBE   quant path  (id,ver,q8,q8_scale)  ${qb / 1048576.0}%10.2f MiB")
    println(f"PROBE   vector columns alone: float ${vb / 1048576.0}%.2f MiB vs int8 ${cb / 1048576.0}%.2f MiB = ${vb.toDouble / cb}%.2fx")
    println(f"PROBE   probe byte reduction ${fb.toDouble / qb}%.2fx")
    require(cb.toDouble <= vb / 2.5,
      s"int8 codes must be well under half the float vector bytes ($cb vs $vb)")

    // ---- walls + ranking agreement over the live corpus
    val queryIds = Seq(0L, 7L, 42L, 5000L, n - 5L)
    val queries = queryIds.map { qid =>
      qid -> corpus.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
    }
    // warm both paths (footer caches, codegen) so the timed passes
    // compare steady state
    IvfIndex.topK(spark, idx, queries.head._2, 10, 4).collect()
    IvfIndex.topKQuantized(spark, idx, queries.head._2, 10, 4).collect()

    Seq(4, 16, 64).foreach { nProbe =>
      val fl = timed(s"float topK x${queries.size} (nProbe=$nProbe)") {
        queries.map { case (_, qv) =>
          IvfIndex.topK(spark, idx, qv, 10, nProbe)
            .select("id").as[Long].collect().toSeq }
      }
      val qr = timed(s"quantized topK x${queries.size} (nProbe=$nProbe)") {
        queries.map { case (_, qv) =>
          IvfIndex.topKQuantized(spark, idx, qv, 10, nProbe)
            .select("id").as[Long].collect().toSeq }
      }
      val rr = timed(s"quantized+rerank256 x${queries.size} (nProbe=$nProbe)") {
        queries.map { case (_, qv) =>
          IvfIndex.topKQuantized(spark, idx, qv, 10, nProbe, rerank = 256)
            .select("id").as[Long].collect().toSeq }
      }
      val agree = qr.zip(fl).count { case (a, b) => a.toSet == b.toSet }
      val rrAgree = rr.zip(fl).count { case (a, b) => a == b }
      println(s"PROBE nProbe=$nProbe top10-set agree quant=$agree/${queries.size} " +
        s"rerank=$rrAgree/${queries.size}")
      require(rrAgree == queries.size,
        s"rerank=256 must recover the float top-k at nProbe=$nProbe")
    }
    spark.stop()
  }
}
