package graft.delta

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** [[LogStoreFactory]] that injects kill -9-equivalent crashes at the
  * commit rename points: `Runtime.halt` (no shutdown hooks, no finally
  * blocks — the process is simply gone, like SIGKILL) fired with
  * configured probability immediately BEFORE or AFTER
  * `renameNoReplace`. Probabilities come from system properties so the
  * parent test controls them per forked writer:
  * `graft.storm.haltBeforeRename`, `graft.storm.haltAfterRename`. */
final class HaltingLogStoreFactory extends LogStoreFactory {
  override def create(spark: SparkSession, tablePath: Path): LogStore = {
    val inner = new HadoopLogStore(spark.sessionState.newHadoopConf())
    val pBefore = sys.props.get("graft.storm.haltBeforeRename").map(_.toDouble).getOrElse(0.0)
    val pAfter = sys.props.get("graft.storm.haltAfterRename").map(_.toDouble).getOrElse(0.0)
    val seed = sys.props.get("graft.storm.haltSeed").map(_.toLong).getOrElse(42L)
    val rnd = new java.util.Random(seed)
    new LogStore {
      override def list(dir: Path) = inner.list(dir)
      override def exists(path: Path) = inner.exists(path)
      override def fileStatus(path: Path) = inner.fileStatus(path)
      override def read(path: Path) = inner.read(path)
      override def write(path: Path, content: String) = inner.write(path, content)
      override def readBytes(path: Path) = inner.readBytes(path)
      override def writeBytes(path: Path, bytes: Array[Byte]) = inner.writeBytes(path, bytes)
      override def delete(path: Path) = inner.delete(path)
      override def mkdirs(dir: Path) = inner.mkdirs(dir)
      override def renameNoReplace(src: Path, dst: Path): Unit = {
        // only commit renames are crash targets (%020d.json destinations)
        val isCommit = dst.getName.matches("""\d{20}\.json""")
        if (isCommit && rnd.nextDouble() < pBefore) Runtime.getRuntime.halt(137)
        inner.renameNoReplace(src, dst)
        if (isCommit && rnd.nextDouble() < pAfter) Runtime.getRuntime.halt(137)
      }
    }
  }
}

/** One storm WRITER PROCESS: commits `nCommits` single-add transactions to
  * the table, acking each durably (O_SYNC append) to
  * `_storm_ack_<id>.txt` AFTER the commit returns. On restart it resumes
  * after its highest acked index, so a commit that landed but died before
  * its ack is legitimately re-committed (a re-add of the same path — the
  * log stays valid either way). Exit 0 = finished its quota.
  *
  * args: tablePath writerId nCommits
  * props: graft.storm.haltBeforeRename / haltAfterRename / haltSeed */
object ProcessStormWriter {
  def main(args: Array[String]): Unit = {
    val Array(table, writerId, nCommitsS) = args
    val nCommits = nCommitsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"storm-writer-$writerId")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config(DeltaLog.LogStoreFactoryKey, classOf[HaltingLogStoreFactory].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ackPath = Paths.get(table, s"_storm_ack_$writerId.txt")
    val acked: Set[Int] =
      if (Files.exists(ackPath))
        scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(ackPath))
          .asScala.filter(_.nonEmpty).map(_.split(",")(1).toInt).toSet
      else Set.empty
    val log = DeltaLog.forPath(spark, table)
    log.update()
    (0 until nCommits).filterNot(acked).foreach { i =>
      val v = log.startTransaction()
        .addAction(ActionCodec.fromJsonLine(
          s"""{"add":{"path":"w$writerId-$i.parquet","partitionValues":{},"size":100,"modificationTime":1,"dataChange":true}}""").get)
        .commit()
      Files.write(ackPath, s"$writerId,$i,$v\n".getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.SYNC)
    }
    spark.stop()
    sys.exit(0)
  }
}
