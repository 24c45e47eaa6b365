package graft.delta

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic random-lifecycle driver (r12 verdict #2): given a seed,
  * runs a reproducible random sequence of table operations — appends,
  * copy-on-write and merge-on-read DML, OPTIMIZE compact / Z-ORDER,
  * explicit checkpoints, RESTORE to an earlier version, and property flips
  * (in-commit timestamps, deletion vectors) — against a graft table, while
  * maintaining a pure-Scala model of the expected contents at EVERY
  * version it commits.
  *
  * Two consumers:
  *  - `LifecycleFuzzSpec` runs many seeds and, after every step, replays
  *    the raw `_delta_log` with an INDEPENDENT mechanical reader (no graft
  *    snapshot code) and checks engine ≡ raw-log fold ≡ model;
  *  - the `q78_lifecycle_fuzz` driver gate pins one representative seed and
  *    lets DuckDB replay the log cross-engine (the q70 oracle shape).
  *
  * The generator lives in main scope so the gate and the spec execute the
  * IDENTICAL sequence for a given seed — a divergence between the two
  * consumers would itself be a bug.
  */
object LifecycleFuzz {

  /** What one run did: the op labels in order, the final expected contents,
    * and the expected contents at every version recorded after each op. */
  final case class Trace(ops: Seq[String], model: Map[Long, String],
                         history: Map[Long, Map[Long, String]])

  /** Run `nOps` seeded ops against `dir` (created; must not exist as a
    * table). `allowDv = false` keeps every delete/update copy-on-write so
    * the final contents are mechanically derivable from the log + parquet
    * alone (no DV bitmap decoding) — the shape the cross-engine gate needs.
    */
  def run(spark: SparkSession, dir: String, seed: Int, nOps: Int,
          allowDv: Boolean = true): Trace = {
    import spark.implicits._
    val rnd = new Random(seed.toLong * 1000003L + 17)
    var model = Map.empty[Long, String]
    var nextId = 0L
    def freshRows(k: Int): DataFrame = {
      val rows = (0 until k).map { _ =>
        val id = nextId; nextId += 1; (id, s"s$seed-$id")
      }
      model ++= rows
      rows.toDF("id", "v")
    }
    def table = DeltaTable.forPath(spark, dir)
    def setDv(on: Boolean): Unit =
      table.setProperties(Map(TableConfig.EnableDeletionVectors -> on.toString))

    val ops = Seq.newBuilder[String]
    GraftWriter.write(freshRows(6), dir)
    val log = DeltaLog.forPath(spark, dir)
    var history = Map(log.update().version -> model)
    var dvOn = false
    var ictOn = false

    (1 to nOps).foreach { _ =>
      rnd.nextInt(12) match {
        case 0 | 1 =>
          ops += "append"
          GraftWriter.write(freshRows(1 + rnd.nextInt(4)), dir, SaveMode.Append)
        case 2 => // copy-on-write delete
          ops += "delete-cow"
          if (dvOn) { setDv(false); dvOn = false }
          val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
          Dml.delete(spark, dir, col("id") % m === r)
          model = model.filterNot { case (id, _) => id % m == r }
        case 3 => // merge-on-read delete (or a CoW one when DVs are out)
          val m = 3 + rnd.nextInt(3); val r = rnd.nextInt(m)
          if (allowDv) {
            ops += "delete-dv"
            if (!dvOn) { setDv(true); dvOn = true }
          } else {
            ops += "delete-cow"
            if (dvOn) { setDv(false); dvOn = false }
          }
          Dml.delete(spark, dir, col("id") % m === r)
          model = model.filterNot { case (id, _) => id % m == r }
        case 4 => // copy-on-write update
          ops += "update-cow"
          if (dvOn) { setDv(false); dvOn = false }
          val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
          Dml.update(spark, dir, col("id") % m === r,
            Map("v" -> concat(col("v"), lit("u"))))
          model = model.map { case (id, v) =>
            if (id % m == r) (id, v + "u") else (id, v)
          }
        case 5 =>
          ops += "compact"
          Optimize.compact(spark, dir, targetFileBytes = 1L << 20)
        case 6 =>
          ops += "zorder"
          Optimize.zorder(spark, dir, Seq("id"), targetFileBytes = 1L << 20)
        case 7 =>
          ops += "checkpoint"
          log.checkpoint()
        case 8 => // restore to a random earlier recorded version
          val candidates = history.keys.toSeq.sorted
            .filter(_ < log.update().version)
          if (candidates.nonEmpty) {
            val target = candidates(rnd.nextInt(candidates.size))
            ops += s"restore($target)"
            table.restoreToVersion(target)
            model = history(target)
            // RESTORE rewinds the table config too: resync the flip state
            val cfg = TableConfig.of(log.update())
            dvOn = TableConfig.deletionVectorsEnabled(cfg)
            ictOn = cfg.get(TableConfig.EnableInCommitTimestamps)
              .exists(_.trim.equalsIgnoreCase("true"))
          } else {
            ops += "append"
            GraftWriter.write(freshRows(1), dir, SaveMode.Append)
          }
        case 9 => // one-way ICT flip; appends once it's on
          if (!ictOn) {
            ops += "ict-on"
            table.setProperties(
              Map(TableConfig.EnableInCommitTimestamps -> "true"))
            ictOn = true
          } else {
            ops += "append"
            GraftWriter.write(freshRows(1), dir, SaveMode.Append)
          }
        case 10 => // MERGE upsert: update a slice of existing ids, insert fresh
          ops += "merge"
          if (dvOn) { setDv(false); dvOn = false } // CoW rewrite path
          val m = 3 + rnd.nextInt(3); val r = rnd.nextInt(m)
          val updates = model.collect {
            case (id, v) if id % m == r => (id, v + "m")
          }.toSeq
          val inserts = (0 until (1 + rnd.nextInt(2))).map { _ =>
            val id = nextId; nextId += 1; (id, s"s$seed-$id")
          }
          // inserts is never empty (≥ 1 fresh row), so the merge always runs
          val src = (updates ++ inserts).toDF("id", "v")
          Merge.into(spark, dir, src, col("t.id") === col("s.id"))
            .whenMatchedUpdate(Map("v" -> col("s.v")))
            .whenNotMatchedInsertAll()
            .execute(): Unit
          model = model ++ updates ++ inserts
        case 11 => // full OVERWRITE: remove-all + fresh adds in one commit
          ops += "overwrite"
          model = Map.empty
          GraftWriter.write(freshRows(2 + rnd.nextInt(3)), dir, SaveMode.Overwrite)
      }
      history += (log.update().version -> model)
    }
    Trace(ops.result(), model, history)
  }
}
