package graft.delta

import org.scalatest.funsuite.AnyFunSuite

/** Randomized model-check of the lock protocol — the executable stand-in
  * for the reference's TLA+ spec (`tlaplus/dynamodblock.tla`, which models
  * the same amazon-dynamodb-lock-client design): N simulated clients on one
  * fake clock, driven through hundreds of random schedules of
  * {acquire, refresh, release, crash, time-advance} steps, with the spec's
  * safety properties asserted after EVERY step:
  *
  *  - **Mutual exclusion**: at most one live (non-crashed, non-released)
  *    client's believed RVN matches the backend record.
  *  - **Stale fencing**: `updateData` from a client whose RVN went stale
  *    throws [[LockStolenException]] — a fenced-off holder can never
  *    silently extend.
  *  - **Refresh protection**: a takeover only succeeds after the record's
  *    RVN sat unchanged for ≥ its full lease duration on the taker's own
  *    clock — a holder that keeps refreshing within its lease is never
  *    stolen from (the TLA+ spec's core safety condition).
  *  - **Repair inheritance**: taking over a crashed holder's expired lease
  *    yields `acquiredExpiredLock = true` and inherits its `data` verbatim
  *    (the interrupted-rename repair context).
  *  - **Liveness**: after crashes, a surviving client eventually
  *    re-acquires once a full lease elapses (no deadlock).
  */
class LockProtocolModelSpec extends AnyFunSuite {

  private final class FakeClock(var now: Long = 0L) extends LockClock {
    def nowMillis: Long = now
    def sleep(ms: Long): Unit = now += ms
  }

  private val LeaseSecs = 3L

  private final class Sim(seed: Long) {
    val rnd = new scala.util.Random(seed)
    val clock = new FakeClock
    val backend = new InMemoryLockBackend

    final class Client(val name: String) {
      val client = new DynamoStyleLockClient(backend,
        LockOptions(ownerName = name, leaseDurationSecs = LeaseSecs,
          refreshPeriodMillis = 200, additionalTimeToWaitMillis = 200),
        clock)
      var held: Option[LockItem] = None // what this client BELIEVES it holds
      var crashed = false
      var lastWriteAt = -1L // fake-time of this client's last successful write
    }
    val clients = (0 until 3).map(i => new Client(s"c$i"))

    // fake-time when the current record's RVN was last written, per RVN
    var rvnWrittenAt = Map.empty[String, Long]
    private def record = backend.get()
    private def noteWrite(item: LockItem): Unit =
      rvnWrittenAt += item.recordVersionNumber -> clock.now

    def believers: Seq[Client] =
      clients.filter(c => !c.crashed && c.held.exists(h =>
        record.exists(_.recordVersionNumber == h.recordVersionNumber)))

    def step(): Unit = {
      val c = clients(rnd.nextInt(clients.size))
      rnd.nextInt(6) match {
        case 0 => // acquire attempt (only sensible when not believing)
          if (!c.crashed && c.held.isEmpty) {
            val before = record
            c.client.tryAcquireLock(Some(s"rename-by-${c.name}")) match {
              case Some(item) =>
                // REFRESH PROTECTION: a takeover of a live-RVN record is
                // only legal if that RVN sat unchanged a full lease on the
                // taker's clock (released records are free game)
                if (item.acquiredExpiredLock) {
                  val prevRvn = before.map(_.recordVersionNumber).get
                  val age = clock.now - rvnWrittenAt.getOrElse(prevRvn, Long.MaxValue)
                  assert(age >= LeaseSecs * 1000,
                    s"takeover after only ${age}ms of a ${LeaseSecs * 1000}ms lease")
                  // REPAIR INHERITANCE: the old holder's data came along
                  assert(item.data == before.flatMap(_.data),
                    "expired-lock takeover must inherit the repair data")
                }
                c.held = Some(item); c.lastWriteAt = clock.now; noteWrite(item)
              case None => ()
            }
          }
        case 1 => // refresh (extend lease / replace repair data)
          if (!c.crashed) c.held match {
            case Some(h) =>
              val stale = !record.exists(_.recordVersionNumber == h.recordVersionNumber)
              try {
                val item = c.client.updateData(h, Some(s"refresh-${c.name}"))
                assert(!stale, s"${c.name} extended a STOLEN lease") // fencing
                c.held = Some(item); c.lastWriteAt = clock.now; noteWrite(item)
              } catch {
                case _: LockStolenException =>
                  assert(stale, s"${c.name} fenced off while still current")
                  c.held = None // the client observes the fence and stands down
              }
            case None => ()
          }
        case 2 => // release
          if (!c.crashed) c.held.foreach { h =>
            c.client.releaseLock(h)
            c.held = None
          }
        case 3 => // crash while (possibly) holding: lease goes silent
          c.crashed = true
          c.held = None
        case 4 => // recover a crashed client (fresh identity state)
          c.crashed = false
        case _ => // time passes
          clock.now += 200 + rnd.nextInt(1200)
      }
      // MUTUAL EXCLUSION, checked after every step
      assert(believers.size <= 1,
        s"two live clients believe they hold the lock: ${believers.map(_.name)}")
    }
  }

  test("random schedules: exclusion, fencing, refresh protection, inheritance (200 seeds x 150 steps)") {
    (1 to 200).foreach { seed =>
      val sim = new Sim(seed)
      (0 until 150).foreach(_ => sim.step())
    }
  }

  test("liveness: a crashed holder's lease is recoverable by a survivor") {
    (1 to 50).foreach { seed =>
      val sim = new Sim(seed * 7919)
      // drive until someone holds, then crash them
      var guard = 0
      while (sim.believers.isEmpty && guard < 500) { sim.step(); guard += 1 }
      if (sim.believers.nonEmpty) {
        val holder = sim.believers.head
        holder.crashed = true; holder.held = None
        // a survivor must be able to take over within ~two leases (revive
        // one if the random schedule crashed everyone else)
        val survivor = sim.clients.find(c => !c.crashed && (c ne holder))
          .getOrElse { val c = sim.clients.find(_ ne holder).get; c.crashed = false; c }
        sim.clock.now += LeaseSecs * 1000 + 1
        val taken = survivor.client.tryAcquireLock(Some("takeover"))
          .orElse { sim.clock.now += LeaseSecs * 1000; survivor.client.tryAcquireLock(Some("takeover")) }
        assert(taken.isDefined, s"seed $seed: survivor could not take over an expired lease")
      }
    }
  }
}
