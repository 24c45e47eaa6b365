package graft.delta

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Transient-failure behavior of the wire-level AWS clients (r17 review):
  * a scripted JDK HttpServer plays an endpoint that throttles / breaks /
  * stalls in controlled ways, so the retry and timeout policy is pinned
  * deterministically — no moto needed. What the SDK clients these replace
  * do for free: bounded retry with backoff on 5xx and I/O errors
  * (re-signed per attempt), a hard per-request timeout, DynamoDB
  * 400-with-__type throttling retried at the backend layer, and a failed
  * existence probe RAISING instead of reading as "absent". */
class WireRetrySpec extends AnyFunSuite {

  /** One scripted response; `sleepMs` stalls before answering. */
  private case class Scripted(status: Int, body: String = "",
                              sleepMs: Long = 0L)

  /** Serves the queued responses in order, then 200-empty forever. */
  private def withServer(script: Scripted*)(
      f: (String, AtomicInteger) => Unit): Unit = {
    val q = new ConcurrentLinkedQueue[Scripted]()
    script.foreach(q.add)
    val hits = new AtomicInteger(0)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val s = Option(q.poll()).getOrElse(Scripted(200))
      if (s.sleepMs > 0) Thread.sleep(s.sleepMs)
      val b = s.body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/xml")
      // status with no body needs -1; HttpServer treats 0 as chunked
      ex.sendResponseHeaders(s.status, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    })
    // concurrent handlers: a stalled response must not serialize the NEXT
    // attempt's dispatch (the default executor is the single dispatcher
    // thread, which would hide retries behind the first stall)
    srv.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}", hits)
    finally srv.stop(0)
  }

  private def store(endpoint: String) =
    new S3HttpLogStore(endpoint, "us-east-1", "k", "s")

  test("5xx retries with backoff and succeeds on a later attempt") {
    withServer(Scripted(503, "<Error><Code>SlowDown</Code></Error>"),
        Scripted(500), Scripted(200, "payload")) { (ep, hits) =>
      val got = store(ep).readBytes(new Path("s3://b/key"))
      assert(new String(got, StandardCharsets.UTF_8) == "payload")
      assert(hits.get() == 3, s"expected 3 attempts, saw ${hits.get()}")
    }
  }

  test("persistent 5xx surfaces after exactly maxAttempts requests") {
    withServer(Seq.fill(10)(Scripted(503)): _*) { (ep, hits) =>
      val e = intercept[java.io.IOException](
        store(ep).readBytes(new Path("s3://b/key")))
      assert(e.getMessage.contains("503"))
      assert(hits.get() == 4, s"expected 4 attempts, saw ${hits.get()}")
    }
  }

  test("a stalled endpoint times out instead of wedging the commit thread") {
    // tight per-request timeout; every attempt stalls past it → the retry
    // loop drains and the LAST I/O error surfaces, bounded in wall time
    withServer(Seq.fill(10)(Scripted(200, "late", sleepMs = 2000L)): _*) {
      (ep, hits) =>
        val aws = new AwsSigV4Http(ep, "us-east-1", "s3", "k", "s",
          requestTimeout = java.time.Duration.ofMillis(150),
          maxAttempts = 2, backoffBaseMs = 10L)
        val t0 = System.nanoTime()
        intercept[java.io.IOException](aws.send("GET", "/b/key"))
        val elapsedMs = (System.nanoTime() - t0) / 1000000L
        assert(elapsedMs < 1500,
          s"timeout must bound the call well under the stall, took ${elapsedMs}ms")
        // the slow handlers may still be draining — wait for the count only
        val deadline = System.nanoTime() + 3000000000L
        while (hits.get() < 2 && System.nanoTime() < deadline) Thread.sleep(20)
        assert(hits.get() == 2, s"expected 2 attempts, saw ${hits.get()}")
    }
  }

  test("exists(): a failed directory-probe LIST raises, never reads absent") {
    // HEAD 404 → fallback LIST meets a persistent 500: the old code
    // returned false (silently 'absent'); it must raise
    withServer(Scripted(404) +: Seq.fill(10)(Scripted(500)): _*) {
      (ep, _) =>
        intercept[java.io.IOException](store(ep).exists(new Path("s3://b/dir")))
    }
  }

  test("existsObject(): one HEAD, no LIST fallback, 404 = false") {
    withServer(Scripted(404)) { (ep, hits) =>
      assert(!store(ep).existsObject(new Path("s3://b/key")))
      assert(hits.get() == 1, s"expected 1 request, saw ${hits.get()}")
    }
  }

  test("DynamoDB throttling (400 + __type) retries at the backend layer") {
    val throttle = Scripted(400,
      """{"__type":"com.amazonaws.dynamodb.v20120810#ProvisionedThroughputExceededException"}""")
    withServer(throttle, throttle, Scripted(200, "{}")) { (ep, hits) =>
      val b = new DynamoDbHttpLockBackend(ep, "us-east-1", "k", "s",
        "locks", "tbl")
      assert(b.putIfAbsent(LockRecord("o", "rvn1", Some(3), false, None)))
      assert(hits.get() == 3, s"expected 3 attempts, saw ${hits.get()}")
    }
  }

  test("DynamoDB conditional miss is NOT retried — it is an answer") {
    val miss = Scripted(400,
      """{"__type":"com.amazonaws.dynamodb.v20120810#ConditionalCheckFailedException"}""")
    withServer(miss) { (ep, hits) =>
      val b = new DynamoDbHttpLockBackend(ep, "us-east-1", "k", "s",
        "locks", "tbl")
      assert(!b.putIfAbsent(LockRecord("o", "rvn1", Some(3), false, None)))
      assert(hits.get() == 1, s"expected 1 request, saw ${hits.get()}")
    }
  }
}
