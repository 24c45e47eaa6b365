package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: the fixed cost of one tiny AQE-planned query as a function
  * of (shuffle width, broadcast joins, exchanges) on this box — the
  * lifecycle refreshes run ~100 such stages per call, so the per-stage
  * floor bounds them from below. Measurement tooling only. */
object StageFloorProbeMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tiny = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .localCheckpoint(true)
    val tiny32 = tiny.repartition(32, col("id")).localCheckpoint(true)
    val tiny1 = tiny.coalesce(1).localCheckpoint(true)

    def bench(label: String, n: Int)(q: () => Unit): Unit = {
      (1 to 3).foreach(_ => q())
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => q())
      println(f"SFLOOR $label%-44s ${(System.nanoTime() - t0) / 1e6 / n}%7.1f ms")
    }

    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())

    bench("noop_action_1part", 30)(() => mat(tiny1))
    bench("noop_action_32part", 30)(() => mat(tiny32))
    bench("groupBy_from_1part", 30)(() => mat(tiny1.groupBy("id").count()))
    bench("groupBy_from_32part", 30)(() => mat(tiny32.groupBy("id").count()))
    bench("2x_groupBy_from_32part", 30)(() =>
      mat(tiny32.groupBy("v").agg(count(lit(1)).as("n"))
        .groupBy("n").count()))
    bench("bcast_join_1part", 30)(() =>
      mat(tiny1.join(broadcast(tiny1.select(col("id"))), "id")))
    bench("bcast_join_32part", 30)(() =>
      mat(tiny32.join(broadcast(tiny1.select(col("id"))), "id")))
    bench("smj_join_32part", 30)(() =>
      mat(tiny32.join(tiny32.select(col("id"), col("v").as("v2")), "id")))
    bench("localCheckpoint_1part", 30)(() => {
      val d = tiny1.select(col("id")).localCheckpoint(true)
      d.unpersist(false)
    })
    bench("localCheckpoint_32part", 30)(() => {
      val d = tiny32.select(col("id")).localCheckpoint(true)
      d.unpersist(false)
    })
    bench("limit_collect", 30)(() => { tiny32.limit(201).collect(); () })
    spark.stop()
  }
}
