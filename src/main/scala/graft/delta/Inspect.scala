package graft.delta

import org.apache.spark.sql.SparkSession

/** Debug CLI mirroring `delta-inspect`
  * (`rust/src/bin/delta-inspect.rs:10-68`):
  *
  * {{{
  *   sbt "runMain graft.delta.Inspect info <table-path>"
  *   sbt "runMain graft.delta.Inspect files <table-path> [--version N]"
  * }}}
  */
object Inspect {

  /** The CLI's output lines — separated from `main` so the spec can assert
    * them without forking a JVM around `sys.exit`. */
  def render(dt: DeltaTable, cmd: String): Seq[String] = cmd match {
    case "info" =>
      val st = dt.statistics
      val snap = dt.snapshot
      val base = Seq(
        s"path:    ${dt.log.tablePath}",
        s"version: ${dt.version}",
        s"schema:  ${dt.schema.simpleString}",
        s"partitions: ${dt.partitionColumns.mkString(", ")}",
        s"files: ${st.numFiles}  bytes: ${st.sizeInBytes}  rows: ${st.numRecords.getOrElse("?")}",
        s"tombstones: ${snap.tombstones.size}")
      val protocol = Seq(
        s"protocol: reader ${snap.minReaderVersion} / writer ${snap.minWriterVersion}" +
          (snap.writerFeatures.map(f => s"  features: ${f.toSeq.sorted.mkString(",")}")
            .getOrElse("")))
      val modern =
        dt.clusteringColumns.headOption.map(_ =>
          s"clusterBy: ${dt.clusteringColumns.mkString(", ")}").toSeq ++
        (if (snap.domainMetadata.nonEmpty)
          Seq(s"domains: ${snap.domainMetadata.keys.toSeq.sorted.mkString(", ")}")
        else Nil) ++
        dt.log.inCommitTimestampOf(dt.version)
          .filter(_ => TableConfig.inCommitTimestampsEnabled(TableConfig.of(snap)))
          .map(t => s"inCommitTimestamp: $t").toSeq
      base ++ protocol ++ modern
    case "files" =>
      dt.files.map(_.path)
    case other =>
      throw new IllegalArgumentException(s"unknown command: $other")
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: Inspect (info|files) <table-path> [--version N]")
      sys.exit(2)
    }
    val cmd = args(0)
    val path = args(1)
    val version: Option[Long] = args.sliding(2).collectFirst {
      case Array("--version", v) => v.toLong
    }
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val dt = version match {
        case Some(v) => DeltaTable.forPath(spark, path, v)
        case None => DeltaTable.forPath(spark, path)
      }
      try render(dt, cmd).foreach(println)
      catch { case e: IllegalArgumentException =>
        System.err.println(e.getMessage); sys.exit(2)
      }
    } finally spark.stop()
  }
}
