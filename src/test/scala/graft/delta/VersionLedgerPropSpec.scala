package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized version-ledger property: a random sequence of
  * append / overwrite / delete / update / checkpoint operations, with the
  * EXPECTED table contents tracked per version in a plain Scala ledger.
  * After the sequence, EVERY historical version must read back exactly its
  * ledger entry — through JSON replay, across checkpoints (time travel to
  * versions at, before, and after each checkpoint), and on a cold log.
  * This is the end-to-end soundness property everything else (replay fold,
  * checkpoint restore, tombstone handling, DML rewrites) composes into. */
class VersionLedgerPropSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("every historical version reads back its ledger state (8 seeds x 10 ops)") {
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 2741)
      val dir = tempTable(s"ledger-$seed").toString
      var nextId = 0L
      def freshRows(n: Int): Seq[(Long, Long)] = {
        val rows = (0 until n).map(i => (nextId + i, (nextId + i) % 5))
        nextId += n
        rows
      }

      // ledger(v) = expected (id, m) set at version v
      val ledger = scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
      var current = Set.empty[(Long, Long)]

      // version 0: initial write
      val init = freshRows(20)
      GraftWriter.write(init.toDF("id", "m"), dir, SaveMode.ErrorIfExists)
      current = init.toSet
      ledger += current

      (0 until 10).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 => // append
            val rows = freshRows(1 + rnd.nextInt(10))
            GraftWriter.write(rows.toDF("id", "m"), dir, SaveMode.Append)
            current = current ++ rows
            ledger += current
          case 1 => // overwrite
            val rows = freshRows(1 + rnd.nextInt(8))
            GraftWriter.write(rows.toDF("id", "m"), dir, SaveMode.Overwrite)
            current = rows.toSet
            ledger += current
          case 2 => // delete by predicate (no-match DML commits nothing)
            val k = rnd.nextInt(5)
            val m = Dml.delete(spark, dir, col("m") === k)
            if (m.version == ledger.size) {
              current = current.filterNot(_._2 == k)
              ledger += current
            }
          case 3 => // update: move bucket k to k+10
            val k = rnd.nextInt(5)
            val m = Dml.update(spark, dir, col("m") === k, Map("m" -> lit(k + 10L)))
            if (m.version == ledger.size) {
              current = current.map { case (i, mm) => if (mm == k) (i, k + 10L) else (i, mm) }
              ledger += current
            }
          case 4 => // checkpoint (no version change)
            DeltaLog.forPath(spark, dir).checkpoint()
        }
      }

      // cold log: every version reads back its ledger entry
      val log = DeltaLog.forPath(spark, dir)
      assert(log.update().version == ledger.size - 1,
        s"seed $seed: version count ${log.update().version} != ${ledger.size - 1}")
      ledger.zipWithIndex.foreach { case (want, v) =>
        val got = DeltaTable.forPath(spark, dir, v).toDF
          .as[(Long, Long)].collect().toSet
        assert(got == want,
          s"seed $seed version $v: got ${got.size} rows, want ${want.size}; " +
          s"got-want=${(got -- want).take(5)} want-got=${(want -- got).take(5)}")
      }
    }
  }
}
