package graft.delta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The DynamoDB-style lock protocol against the in-memory backend —
  * mirrors `rust/tests/dynamodb_lock_test.rs` (acquire/get/release,
  * expired-lock takeover, losing-waiter timeout) plus the interrupted-
  * rename repair of `rust/src/storage/s3/mod.rs:495-549`, all on a fake
  * clock so lease expiry is deterministic and instant. */
class LockClientSpec extends AnyFunSuite {

  /** Sleeps advance time; an optional hook fires before each advance so a
    * "concurrent" holder can act mid-poll, deterministically. */
  private final class FakeClock(var now: Long = 0L) extends LockClock {
    var sleeps: Int = 0
    var onSleep: Int => Unit = _ => ()
    def nowMillis: Long = now
    def sleep(ms: Long): Unit = { sleeps += 1; onSleep(sleeps); now += ms }
  }

  private def opts(owner: String) = LockOptions(
    ownerName = owner, leaseDurationSecs = 3,
    refreshPeriodMillis = 500, additionalTimeToWaitMillis = 500)

  test("acquire/get/release flow (dynamodb_lock_test.rs:52-83)") {
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val c = new DynamoStyleLockClient(backend, opts("worker"), clock)

    val item = c.acquireLock(Some("data"))
    assert(item.ownerName == "worker")
    assert(item.leaseDurationSecs.contains(3L))
    assert(item.data.contains("data"))
    assert(!item.isReleased && !item.acquiredExpiredLock)

    clock.now += 7 // lookup time is observation-local
    val existing = c.getLock().get
    assert(existing.recordVersionNumber == item.recordVersionNumber)
    assert(existing.lookupTimeMillis != item.lookupTimeMillis)
    assert(existing.data.contains("data"))

    assert(c.releaseLock(existing))
    assert(c.getLock().isEmpty) // release deletes the record
  }

  test("expired lock is taken over; old holder cannot release (rs:86-105)") {
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val c1 = new DynamoStyleLockClient(backend, opts("w1"), clock)
    val c2 = new DynamoStyleLockClient(backend, opts("w2"), clock)

    val l1 = c1.acquireLock(None)
    val started = clock.now
    val l2 = c2.acquireLock(None)
    // the waiter had to outlast a full lease
    assert(clock.now - started > 3000)
    assert(l2.acquiredExpiredLock)
    assert(!c1.releaseLock(l1)) // expired + taken over: RVN no longer matches
    assert(c2.releaseLock(l2))
  }

  test("takeover inherits the expired lease's data (repair context)") {
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val c1 = new DynamoStyleLockClient(backend, opts("w1"), clock)
    val c2 = new DynamoStyleLockClient(backend, opts("w2"), clock)

    c1.acquireLock(Some("crashed-rename"))
    val l2 = c2.acquireLock(Some("my-rename"))
    assert(l2.acquiredExpiredLock)
    assert(l2.data.contains("crashed-rename")) // NOT my-rename: repair first
  }

  test("a holder that keeps refreshing times the waiter out (rs:108-135 shape)") {
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val holder = new DynamoStyleLockClient(backend, opts("holder"), clock)
    val waiter = new DynamoStyleLockClient(backend, opts("waiter"), clock)

    var held = holder.acquireLock(Some("work"))
    // every other poll, the holder extends its lease (fresh RVN) — the
    // waiter's expiry clock resets, but its wait budget does not
    clock.onSleep = n => if (n % 2 == 0) held = holder.updateData(held, Some("work"))
    assert(waiter.tryAcquireLock(None).isEmpty) // timed out → retryable None
    clock.onSleep = _ => ()
    assert(holder.releaseLock(held)) // the refreshed lease is still valid
  }

  test("updateData returns a fresh RVN; a stolen lock throws") {
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val c = new DynamoStyleLockClient(backend, opts("w"), clock)
    val l0 = c.acquireLock(Some("a"))
    val l1 = c.updateData(l0, Some("b"))
    assert(l1.recordVersionNumber != l0.recordVersionNumber)
    assert(l1.data.contains("b"))
    intercept[LockStolenException] { c.updateData(l0, Some("c")) } // stale RVN
    assert(!c.releaseLock(l0)) // stale item cannot release either
    assert(c.releaseLock(l1))
  }

  test("a released (not deleted) record is acquirable immediately") {
    val backend = new InMemoryLockBackend
    backend.seed(LockRecord("gone", "rvn-0", Some(3L), isReleased = true, None))
    val clock = new FakeClock
    val c = new DynamoStyleLockClient(backend, opts("w"), clock)
    val l = c.acquireLock(Some("d"))
    assert(l.ownerName == "w" && !l.acquiredExpiredLock)
    assert(clock.sleeps == 0) // no waiting: released means free
  }

  test("a non-expirable lock never times the waiter out") {
    val backend = new InMemoryLockBackend
    backend.seed(LockRecord("pinned", "rvn-x", None, isReleased = false, None))
    val clock = new FakeClock
    val c = new DynamoStyleLockClient(backend, opts("w"), clock)
    // far beyond any budget, the waiter is still polling; then the pinned
    // holder releases and the waiter wins
    clock.onSleep = n => if (n == 50) backend.seed(
      LockRecord("pinned", "rvn-x", None, isReleased = true, None))
    val l = c.acquireLock(None)
    assert(clock.sleeps >= 50) // waited way past additionalTimeToWait + lease
    assert(l.ownerName == "w")
  }

  // ---------------------------------------------------------- rename repair

  private def fixture() = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lock-rename-")
    val store = new HadoopLogStore(new Configuration())
    val ops = new LockingRename.StoreRenameOps(store)
    (dir, store, ops)
  }
  private def p(dir: java.nio.file.Path, name: String) =
    new Path(dir.resolve(name).toString)

  test("rename under lock: happy path releases and moves the file") {
    val (dir, store, ops) = fixture()
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val c = new DynamoStyleLockClient(backend, opts("w"), clock)
    store.write(p(dir, "src.json"), "{\"x\":1}")

    LockingRename.rename(ops, c, p(dir, "src.json"), p(dir, "dst.json"))
    assert(store.read(p(dir, "dst.json")) == "{\"x\":1}")
    assert(!store.exists(p(dir, "src.json")))
    assert(backend.get().isEmpty) // released
  }

  test("repair: crash AFTER copy, before delete — AlreadyExists tolerated (mod.rs:507-530)") {
    val (dir, store, ops) = fixture()
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val crashed = new DynamoStyleLockClient(backend, opts("crashed"), clock)
    val w2 = new DynamoStyleLockClient(backend, opts("w2"), clock)

    // crashed writer: copied src->dst, then died holding the lock
    store.write(p(dir, "a-src.json"), "A")
    store.write(p(dir, "a-dst.json"), "A") // the completed copy
    crashed.acquireLock(Some(LockingRename.toJson(
      LockingRename.LockData(p(dir, "a-src.json").toString, p(dir, "a-dst.json").toString))))

    store.write(p(dir, "b-src.json"), "B")
    LockingRename.rename(ops, w2, p(dir, "b-src.json"), p(dir, "b-dst.json"))

    assert(store.read(p(dir, "a-dst.json")) == "A") // stale rename stands
    assert(store.read(p(dir, "b-dst.json")) == "B") // our rename happened
    assert(!store.exists(p(dir, "b-src.json")))
    assert(backend.get().isEmpty)
  }

  test("repair: crash BEFORE copy — the next holder completes the rename") {
    val (dir, store, ops) = fixture()
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val crashed = new DynamoStyleLockClient(backend, opts("crashed"), clock)
    val w2 = new DynamoStyleLockClient(backend, opts("w2"), clock)

    store.write(p(dir, "a-src.json"), "A") // copy never ran
    crashed.acquireLock(Some(LockingRename.toJson(
      LockingRename.LockData(p(dir, "a-src.json").toString, p(dir, "a-dst.json").toString))))

    store.write(p(dir, "b-src.json"), "B")
    LockingRename.rename(ops, w2, p(dir, "b-src.json"), p(dir, "b-dst.json"))

    assert(store.read(p(dir, "a-dst.json")) == "A") // repaired to completion
    assert(!store.exists(p(dir, "a-src.json")))
    assert(store.read(p(dir, "b-dst.json")) == "B")
    assert(backend.get().isEmpty)
  }

  test("repair: stale rename never started (source gone) — NotFound tolerated") {
    val (dir, store, ops) = fixture()
    val backend = new InMemoryLockBackend
    val clock = new FakeClock
    val crashed = new DynamoStyleLockClient(backend, opts("crashed"), clock)
    val w2 = new DynamoStyleLockClient(backend, opts("w2"), clock)

    // neither a-src nor a-dst exists
    crashed.acquireLock(Some(LockingRename.toJson(
      LockingRename.LockData(p(dir, "a-src.json").toString, p(dir, "a-dst.json").toString))))

    store.write(p(dir, "b-src.json"), "B")
    LockingRename.rename(ops, w2, p(dir, "b-src.json"), p(dir, "b-dst.json"))
    assert(store.read(p(dir, "b-dst.json")) == "B")
    assert(backend.get().isEmpty)
  }
}
