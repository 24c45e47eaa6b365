package graft.delta

import scala.util.Random

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized fuzz of row-tracking IDENTITY across every mutation path:
  * appends, CoW DELETE/UPDATE, merge-on-read DELETE/UPDATE, MERGE,
  * OPTIMIZE compaction, Z-ORDER, checkpoints + cold loads — asserting
  * after every op that
  *
  *  - surviving rows keep their row id (stability),
  *  - ids stay globally unique and are never reused (freshness),
  *  - rows the op did not modify keep their commit version,
  *  - rows it DID modify carry exactly the op's commit version,
  *  - a cold load resolves the identical identity map.
  *
  * The individual RowTrackingSpec cases prove each mechanism; this proves
  * the compositions (e.g. DV UPDATE after compaction after CoW DELETE —
  * materialized values layered over re-allocated base ranges). */
class RowTrackingFuzzSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private val Seeds = 10
  private val OpsPerSeed = 8

  private def identityMap(dir: String): Map[Long, (Long, Long)] =
    DeltaTable.forPath(spark, dir).withRowIds
      .select(col("id"), col("_row_id"), col("_row_commit_version"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test(s"$Seeds random op sequences preserve identity invariants") {
    (1 to Seeds).foreach { seed =>
      val rnd = new Random(seed * 104729)
      val dir = tempTable(s"rtfuzz-$seed").toString
      var nextKey = 0L
      def freshRows(k: Int): Seq[(Long, String)] =
        (0 until k).map { _ => val id = nextKey; nextKey += 1; (id, s"v$id") }
      GraftWriter.write(freshRows(6).toDF("id", "v"), dir,
        configuration = Some(Map(TableConfig.EnableRowTracking -> "true")))
      var prev = identityMap(dir)
      var seenIds = prev.values.map(_._1).toSet
      var dvOn = false

      (1 to OpsPerSeed).foreach { step =>
        // (touched keys, version of the commit that modified them; -1 = none)
        val (touched, version): (Set[Long], Long) = rnd.nextInt(7) match {
          case 0 => // append
            GraftWriter.write(freshRows(1 + rnd.nextInt(3)).toDF("id", "v"),
              dir, SaveMode.Append)
            (Set.empty, -1L)
          case 1 => // delete (CoW or DV depending on the table's state)
            val m = 3 + rnd.nextInt(3); val r = rnd.nextInt(m)
            Dml.delete(spark, dir, col("id") % m === r)
            (Set.empty, -1L) // deletions checked via key disappearance
          case 2 => // update (CoW or DV)
            val m = 3 + rnd.nextInt(3); val r = rnd.nextInt(m)
            val res = Dml.update(spark, dir, col("id") % m === r,
              Map("v" -> lit(s"u$step")))
            (prev.keySet.filter(_ % m == r), res.version)
          case 3 => // merge: update every key ≡ r mod m, insert one new
            val m = 3 + rnd.nextInt(3); val r = rnd.nextInt(m)
            val ins = freshRows(1)
            val src = (prev.keySet.filter(_ % m == r).toSeq.map(k => (k, s"m$step"))
              ++ ins).toDF("id", "v")
            val res = Merge.into(spark, dir, src, col("t.id") === col("s.id"))
              .whenMatchedUpdate(Map("v" -> col("s.v")))
              .whenNotMatchedInsertAll()
              .execute()
            (prev.keySet.filter(_ % m == r), res.version)
          case 4 => // compact (moves every row, modifies none)
            Optimize.compact(spark, dir, targetFileBytes = 64 * 1024)
            (Set.empty, -1L)
          case 5 => // z-order (ditto)
            Optimize.zorder(spark, dir, Seq("v"), targetFileBytes = 64 * 1024)
            (Set.empty, -1L)
          case 6 => // flip DV mode on (re-routes later DML), or checkpoint
            if (!dvOn && rnd.nextBoolean()) {
              DeltaTable.forPath(spark, dir).setProperties(
                Map(TableConfig.EnableDeletionVectors -> "true"))
              dvOn = true
            } else DeltaLog.forPath(spark, dir).checkpoint()
            (Set.empty, -1L)
        }

        val cur = identityMap(dir)
        val ids = cur.values.map(_._1).toSeq
        assert(ids.distinct.size == ids.size,
          s"seed $seed step $step: duplicate row ids ${ids.groupBy(identity).filter(_._2.size > 1).keys}")
        cur.foreach { case (k, (rid, rcv)) =>
          prev.get(k) match {
            case Some((prid, prcv)) =>
              assert(rid == prid,
                s"seed $seed step $step: row $k id changed $prid -> $rid")
              if (touched.contains(k))
                assert(rcv == version,
                  s"seed $seed step $step: modified row $k version $rcv != commit $version")
              else
                assert(rcv == prcv,
                  s"seed $seed step $step: untouched row $k version $prcv -> $rcv")
            case None => // new row: a never-before-seen id
              assert(!seenIds.contains(rid),
                s"seed $seed step $step: new row $k REUSED id $rid")
          }
        }
        seenIds ++= cur.values.map(_._1)
        prev = cur
      }
      // cold load resolves the identical identity map
      val cold = identityMap(dir)
      assert(cold == prev, s"seed $seed: cold load diverged")
    }
  }
}
