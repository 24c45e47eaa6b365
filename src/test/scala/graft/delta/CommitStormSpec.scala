package graft.delta

import java.io.FileNotFoundException

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized crash-storm over the non-atomic commit rename
  * ([[LockingRename]] over an S3-shaped copy+delete store): a storm of
  * writers races to append commit files while crashes are injected at BOTH
  * vulnerable points of the rename sequence — before the copy, and between
  * copy and delete — at random, across many seeds.
  *
  * A "crash" is a fatal [[Error]] thrown inside the store op: `Try` does
  * not catch fatals, so `rename` aborts WITHOUT releasing the lease —
  * exactly a process death mid-rename. The next writer must sight the
  * orphaned lease, outwait it (fake clock), take it over with the repair
  * data, replay the interrupted rename, and proceed. The fixed crash
  * shapes of ObjectStoreSeamSpec / rust/tests/repair_s3_rename_test.rs are
  * the three corners; this explores the interleavings between them.
  *
  * Log-integrity invariants checked per seed:
  *  - every ACKED commit (rename returned) is durable with its exact bytes;
  *  - no commit file is ever overwritten (first writer wins, forever);
  *  - the committed versions form a contiguous 0..max range (the delta log
  *    invariant that makes replay sound);
  *  - the storm always ends with a live log: a final clean writer commits.
  */
class CommitStormSpec extends AnyFunSuite {

  private final class FakeClock(var now: Long = 0L) extends LockClock {
    def nowMillis: Long = now
    def sleep(ms: Long): Unit = now += ms
  }

  /** In-memory byte store implementing the LogStore surface. */
  private final class MemStore extends LogStore {
    val files = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    private def key(p: Path) = p.toString
    override def list(dir: Path) = throw new UnsupportedOperationException
    override def exists(path: Path) = files.containsKey(key(path))
    override def fileStatus(path: Path) = throw new UnsupportedOperationException
    override def read(path: Path) = new String(readBytes(path), "UTF-8")
    override def write(path: Path, content: String) = writeBytes(path, content.getBytes("UTF-8"))
    override def readBytes(path: Path) = {
      val b = files.get(key(path))
      if (b == null) throw new FileNotFoundException(key(path))
      b
    }
    override def writeBytes(path: Path, bytes: Array[Byte]) = { files.put(key(path), bytes); () }
    override def renameNoReplace(src: Path, dst: Path) = throw new UnsupportedOperationException
    override def delete(path: Path) = { files.remove(key(path)); () }
    override def mkdirs(dir: Path) = ()
  }

  private final class SimulatedCrash extends Error("writer died mid-rename")

  /** Copy+delete rename with injected fatal crashes. `crashPlan` maps the
    * global op counter to a crash point: 1 = before copy, 2 = after copy
    * before delete. */
  private final class CrashyOps(store: MemStore, crashPlan: Int => Int)
      extends LockingRename.UnsafeRenameOps {
    private var opCount = 0
    override def unsafeRename(src: Path, dst: Path): Unit = {
      opCount += 1
      val crash = crashPlan(opCount)
      if (store.exists(dst)) throw new FileAlreadyExistsException(dst.toString)
      if (!store.exists(src)) throw new FileNotFoundException(src.toString)
      if (crash == 1) throw new SimulatedCrash
      store.writeBytes(dst, store.readBytes(src))
      if (crash == 2) throw new SimulatedCrash
      store.delete(src)
    }
  }

  private def commitPath(v: Long) = new Path(f"/log/$v%020d.json")

  test("crash-storm: acked commits durable, no overwrite, contiguous log (120 seeds)") {
    (1 to 120).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val clock = new FakeClock
      val store = new MemStore
      val backend = new InMemoryLockBackend
      // ~20% of renames die, split between the two crash points
      val ops = new CrashyOps(store, _ =>
        if (rnd.nextInt(10) < 2) 1 + rnd.nextInt(2) else 0)
      def newClient() = new DynamoStyleLockClient(backend, LockOptions(
        ownerName = s"w${rnd.nextInt(1 << 20)}",
        leaseDurationSecs = 2, refreshPeriodMillis = 20,
        additionalTimeToWaitMillis = 20), clock)

      val acked = scala.collection.mutable.Map[Long, String]()
      val firstContent = scala.collection.mutable.Map[Long, String]()

      def logCount: Long = {
        var n = 0L
        store.files.forEach((k, _) => if (k.startsWith("/log/")) n += 1)
        n
      }

      (0 until 30).foreach { attempt =>
        // next version = what this writer observes in the "log"
        val v = logCount
        val content = s"commit-$seed-$attempt-by-${rnd.nextInt(1000)}"
        val src = new Path(s"/stage/$seed-$attempt.tmp")
        store.write(src, content)
        try {
          LockingRename.rename(ops, newClient(), src, commitPath(v))
          acked(v) = content
        } catch {
          case _: SimulatedCrash => () // writer died; lease left orphaned
          case _: FileAlreadyExistsException => () // lost the version race
          case _: FileNotFoundException => () // repair consumed our staging
        }
        // track first-observed content per committed version and assert it
        // never changes afterwards (no overwrite, ever)
        store.files.forEach { (k, bytes) =>
          if (k.startsWith("/log/")) {
            val ver = k.stripPrefix("/log/").stripSuffix(".json").toLong
            val s = new String(bytes, "UTF-8")
            firstContent.get(ver) match {
              case Some(prev) => assert(prev == s,
                s"seed $seed: version $ver overwritten: '$prev' -> '$s'")
              case None => firstContent(ver) = s
            }
          }
        }
        clock.now += rnd.nextInt(500) // time passes between writers
      }

      // the log must still be writable after the storm: one clean final
      // commit through a fresh client (repairing whatever lease is orphaned)
      val vFinal = logCount
      val src = new Path(s"/stage/final-$seed.tmp")
      store.write(src, "final")
      val cleanOps = new LockingRename.StoreRenameOps(store)
      LockingRename.rename(cleanOps, newClient(), src, commitPath(vFinal))
      assert(store.read(commitPath(vFinal)) == "final")

      // ACKED DURABILITY: every acked commit holds its exact bytes
      acked.foreach { case (v, content) =>
        assert(store.exists(commitPath(v)), s"seed $seed: acked v$v vanished")
        assert(store.read(commitPath(v)) == content,
          s"seed $seed: acked v$v bytes differ")
      }
      // CONTIGUITY: committed versions form 0..max with no holes
      val versions = firstContent.keySet.toSeq.sorted
      assert(versions == (0L until versions.size.toLong),
        s"seed $seed: log has holes: $versions")
    }
  }
}
