package graft.delta

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** One COORDINATED storm writer process (r13 verdict #5): commits
  * `nCommits` single-add transactions to a coordinated table routed
  * through a shared [[FileCommitCoordinator]], acking each durably AFTER
  * commit() returns. Crash surfaces: the parent's SIGKILL, halts at the
  * coordinator claim boundary (haltBeforeClaim/haltAfterClaim — the
  * acked-but-writer-dead shape), and halts at the backfill renames
  * ([[HaltingLogStoreFactory]] — backfill destinations are %020d.json).
  * On restart it resumes after its highest acked index; an un-acked
  * commit that DID land at the coordinator is legitimately re-committed
  * (same path re-added — the log stays valid).
  *
  * args: tablePath writerId nCommits coordDir */
object CoordinatedStormWriter {
  def main(args: Array[String]): Unit = {
    val Array(table, writerId, nCommitsS, coordDir) = args
    val nCommits = nCommitsS.toInt
    CommitCoordinatorProvider.register("storm-file",
      new FileCommitCoordinator(coordDir, backfillInterval = 3))
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"cstorm-writer-$writerId")
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
