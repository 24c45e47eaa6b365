package graft.delta

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the one true log-replay kernel ([[Snapshot.replay]]).
  *
  * The invariants the whole engine leans on:
  *
  *  1. **Composability** — folding commit-by-commit equals folding the
  *     concatenation. `DeltaLog.update()`'s incremental replay, checkpoint
  *     restore + trailing commits, and `snapshotForVersion` all assume it.
  *  2. **Last-writer-wins per path** — the active entry for a path is its
  *     last add (if not later removed); the tombstone is its last remove.
  *  3. **Active/tombstone relationship** — a path is active iff its last
  *     file action is an add; re-deleting never duplicates tombstones.
  */
class ReplayPropSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { _ =>
      Iterator.continually(gen.sample).flatten.take(1).foreach(f)
    }

  private val paths = (0 until 6).map(i => s"f$i.parquet")

  private val actionGen: Gen[Action] = Gen.frequency(
    6 -> Gen.zip(Gen.oneOf(paths), Gen.chooseNum(1L, 1000L)).map { case (p, sz) =>
      AddAction(path = p, size = sz, partitionValues = Map.empty,
        modificationTime = sz, dataChange = true, stats = None, tags = None)
    },
    3 -> Gen.zip(Gen.oneOf(paths), Gen.chooseNum(1L, 1000L)).map { case (p, ts) =>
      RemoveAction(path = p, deletionTimestamp = ts, dataChange = true)
    },
    1 -> Gen.zip(Gen.oneOf("app1", "app2"), Gen.chooseNum(0L, 50L)).map {
      case (a, v) => TxnAction(a, v)
    })

  private val seqGen: Gen[List[Action]] = Gen.listOfN(30, actionGen)

  private def fold(actions: Seq[Action]): Snapshot =
    Snapshot.replay(Snapshot(), actions.iterator, 0L)

  test("composability: commit-wise fold == concatenated fold") {
    forAll(Gen.zip(seqGen, Gen.chooseNum(1, 5))) { case (actions, nSplits) =>
      val whole = fold(actions)
      val chunks = actions.grouped(math.max(1, actions.size / nSplits)).toSeq
      val stepped = chunks.zipWithIndex.foldLeft(Snapshot()) {
        case (s, (chunk, i)) => Snapshot.replay(s, chunk.iterator, i.toLong)
      }
      assert(stepped.files == whole.files)
      assert(stepped.tombstones == whole.tombstones)
      assert(stepped.appTransactionVersion == whole.appTransactionVersion)
    }
  }

  test("last-writer-wins: active = last file action is add; tombstone = last remove") {
    forAll(seqGen) { actions =>
      val snap = fold(actions)
      val fileActions = actions.collect {
        case a: AddAction => (a.path, a)
        case r: RemoveAction => (r.path, r)
      }
      val lastPerPath = fileActions.groupBy(_._1).view.mapValues(_.last._2).toMap
      val expectedActive = lastPerPath.collect { case (p, a: AddAction) => p -> a }
      assert(snap.files.map(f => f.path -> f).toMap == expectedActive)
      val lastRemove = fileActions.collect { case (p, r: RemoveAction) => (p, r) }
        .groupBy(_._1).view.mapValues(_.last._2).toMap
      assert(snap.tombstones.map(t => t.path -> t).toMap == lastRemove)
      // no duplicate tombstones, ever
      assert(snap.tombstones.map(_.path).distinct.size == snap.tombstones.size)
    }
  }

  test("checkpoint-style restore (non-adds before adds) rebuilds the same state") {
    forAll(seqGen) { actions =>
      val snap = fold(actions)
      // what Checkpoints.write emits: state dump with superseded tombstones
      // dropped; restore replays it in the order DeltaLog uses
      val activePaths = snap.files.map(_.path).toSet
      val dump: Seq[Action] =
        snap.tombstones.filterNot(t => activePaths.contains(t.path)) ++ snap.files
      val (adds, nonAdds) = dump.partition(_.isInstanceOf[AddAction])
      val restored = Snapshot.replay(Snapshot(), (nonAdds ++ adds).iterator, 0L)
      assert(restored.files == snap.files)
      // and even a WORST-CASE row order (adds first) is safe after the
      // superseded-tombstone filter
      val shuffled = Snapshot.replay(Snapshot(), (adds ++ nonAdds).iterator, 0L)
      assert(shuffled.files == snap.files)
    }
  }
}
