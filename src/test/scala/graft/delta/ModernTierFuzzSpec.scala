package graft.delta

import scala.util.Random

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential fuzz of the modern-protocol tier: random
  * interleavings of appends, deletes, domain writes, property flips
  * (v2 checkpoints / ICT), and checkpoints, each step asserting
  *
  *  - COLD load (fresh DeltaLog, checkpoint restore + tail replay)
  *  ≡ INCREMENTAL state (the long-lived log's update),
  *  - both ≡ a pure-Scala model of the table contents,
  *  - and every recorded `.crc` accepted (validation runs inside every
  *    load — a replay/bookkeeping divergence fails the run).
  *
  * The CommitStormSpec discipline applied to this round's features: the
  * individual specs prove each mechanism; the fuzz proves the
  * COMPOSITIONS nobody thought to write down. */
class ModernTierFuzzSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private val Seeds = 20
  private val OpsPerSeed = 8

  test(s"$Seeds random modern-tier op sequences: cold ≡ incremental ≡ model") {
    (1 to Seeds).foreach { seed =>
      val rnd = new Random(seed * 7919)
      val dir = tempTable(s"fuzz-$seed").toString
      var model = Map.empty[Long, String]
      var nextId = 0L
      def freshRows(k: Int): Seq[(Long, String)] = {
        val rows = (0 until k).map { _ =>
          val id = nextId; nextId += 1; (id, s"s$seed-v$id")
        }
        model ++= rows
        rows
      }
      GraftWriter.write(freshRows(5).toDF("id", "v"), dir)
      val live = DeltaLog.forPath(spark, dir) // long-lived incremental log
      live.update()
      var ictOn = false
      var v2On = false
      var rtOn = false

      (1 to OpsPerSeed).foreach { step =>
        val op = rnd.nextInt(8)
        op match {
          case 0 => // append
            GraftWriter.write(freshRows(1 + rnd.nextInt(4)).toDF("id", "v"),
              dir, SaveMode.Append)
          case 1 => // predicate delete: CoW normally; under row tracking
            // keep exercising the merge-on-read path here (CoW rewrites
            // on rt tables have their own fuzz, RowTrackingFuzzSpec)
            if (rtOn) DeltaTable.forPath(spark, dir).setProperties(
              Map(TableConfig.EnableDeletionVectors -> "true"))
            val m = 2 + rnd.nextInt(3)
            val r = rnd.nextInt(m)
            Dml.delete(spark, dir, col("id") % m === r)
            model = model.filterNot { case (id, _) => id % m == r }
          case 2 => // domain write (random domain of a small pool)
            val d = s"fuzz.d${rnd.nextInt(3)}"
            DeltaTable.forPath(spark, dir).setDomainMetadata(d, s"step$step")
          case 3 => // USER domain remove, when one exists (delta.* system
            // domains refuse removal — the fence this fuzz forced into
            // existence when a random removal of delta.rowTracking reset
            // the row-id mark)
            val doms = DeltaLog.forPath(spark, dir).update()
              .domainMetadata.keys.filter(_.startsWith("fuzz.")).toSeq
            if (doms.nonEmpty)
              DeltaTable.forPath(spark, dir)
                .removeDomainMetadata(doms(rnd.nextInt(doms.size)))
          case 4 => // flip on v2 checkpoints (idempotent-ish re-set allowed)
            DeltaTable.forPath(spark, dir).setProperties(
              Map(TableConfig.CheckpointPolicy -> "v2"))
            v2On = true
          case 5 => // flip on ICT
            if (!ictOn) {
              DeltaTable.forPath(spark, dir).setProperties(
                Map(TableConfig.EnableInCommitTimestamps -> "true"))
              ictOn = true
            } else GraftWriter.write(freshRows(1).toDF("id", "v"), dir,
              SaveMode.Append)
          case 6 => // explicit checkpoint in the CURRENT policy
            DeltaLog.forPath(spark, dir).checkpoint()
          case 7 => // flip on row tracking (one-way)
            if (!rtOn) {
              DeltaTable.forPath(spark, dir).setProperties(
                Map(TableConfig.EnableRowTracking -> "true"))
              rtOn = true
            } else GraftWriter.write(freshRows(1).toDF("id", "v"), dir,
              SaveMode.Append)
        }

        // cold ≡ incremental, every step (both runs .crc validation)
        val inc = live.update()
        val cold = DeltaLog.forPath(spark, dir).update()
        assert(cold.version == inc.version, s"seed $seed step $step version")
        assert(cold.files.map(_.path).toSet == inc.files.map(_.path).toSet,
          s"seed $seed step $step files")
        assert(cold.domainMetadata == inc.domainMetadata,
          s"seed $seed step $step domains")
        assert(TableConfig.of(cold) == TableConfig.of(inc),
          s"seed $seed step $step config")
        // every post-enablement version carries its clock (read from the
        // commit file — cold snapshots restored AT a checkpoint legally
        // have no lastCommitInfo, checkpoints never carry it)
        if (ictOn)
          assert(live.inCommitTimestampOf(cold.version).isDefined,
            s"seed $seed step $step ICT missing")
      }

      // final content ≡ model, through a fresh cold table
      val got = DeltaTable.forPath(spark, dir).toDF
        .select("id", "v").as[(Long, String)].collect().toMap
      assert(got == model, s"seed $seed content diverged: " +
        s"missing=${model.keySet -- got.keySet} extra=${got.keySet -- model.keySet}")
      // row tracking (once on): every post-enablement data-changing add
      // carries disjoint id ranges under the recorded high-water mark
      if (rtOn) {
        val s = DeltaLog.forPath(spark, dir).update()
        val ranges = s.files.filter(_.baseRowId.isDefined).flatMap { a =>
          a.stats.flatMap(ActionCodec.statsFromJson).map(st =>
            (a.baseRowId.get, a.baseRowId.get + st.numRecords))
        }.sorted
        ranges.sliding(2).foreach {
          case Seq((_, e1), (s2, _)) =>
            assert(e1 <= s2, s"seed $seed row-id range collision in $ranges")
          case _ => ()
        }
        if (ranges.nonEmpty)
          assert(RowTracking.highWaterMark(s) >= ranges.map(_._2).max - 1)
      }
      // and if v2 ever turned on, the newest checkpoint really is v2
      if (v2On) {
        val cp = DeltaLog.forPath(spark, dir)
          .findLatestCheckpointForVersion(Long.MaxValue)
        cp.foreach(c => assert(c.v2FileName.isDefined ||
          c.version < DeltaLog.forPath(spark, dir).update().version))
      }
    }
  }
}
