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
      cmd match {
        case "info" =>
          println(s"path:    $path")
          println(s"version: ${dt.version}")
          println(s"schema:  ${dt.schema.simpleString}")
          println(s"partitions: ${dt.partitionColumns.mkString(", ")}")
          val st = dt.statistics
          println(s"files: ${st.numFiles}  bytes: ${st.sizeInBytes}  rows: ${st.numRecords.getOrElse("?")}")
          println(s"tombstones: ${dt.snapshot.tombstones.size}")
        case "files" =>
          dt.files.foreach(a => println(a.path))
        case other =>
          System.err.println(s"unknown command: $other"); sys.exit(2)
      }
    } finally spark.stop()
  }
}
