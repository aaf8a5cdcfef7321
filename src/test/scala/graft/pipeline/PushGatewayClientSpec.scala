package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Drives the real pushgateway HTTP client against a local gateway
  * stub: protocol shape (method, path, content-type, body), the
  * base64 segment escape, the 5×2 retry policy on transient 5xx, and
  * the full scheduler lifecycle (scheduled pushes → final push →
  * post-scrape delete) — the reference's PushGatewayServiceImpl
  * behavior end to end, minus only the real gateway host. */
class PushGatewayClientSpec extends AnyFunSuite {

  private case class Req(method: String, path: String, contentType: String,
      body: String)

  /** Local gateway stub; `failFirst` counts 500s served before
    * succeeding (per-path, for the retry case). */
  private def withServer(failFirst: Int = 0)(
      run: (String, () => Seq[Req]) => Unit): Unit = {
    val reqs = mutable.ArrayBuffer.empty[Req]
    var remainingFails = failFirst
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val (code, resp) = reqs.synchronized {
        reqs += Req(x.getRequestMethod, x.getRequestURI.toString,
          Option(x.getRequestHeaders.getFirst("Content-Type")).getOrElse(""),
          body)
        if (remainingFails > 0) { remainingFails -= 1; (500, "boom") }
        else (200, "")
      }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}",
      () => reqs.synchronized(reqs.toSeq))
    finally server.stop(0)
  }

  private val key = Map(
    "type" -> "full", "topic" -> "db.database.collection",
    "instance" -> "i-1", "correlation_id" -> "abc/123",
    "export_date" -> "2026-08-13")

  // sorted key order; correlation_id's '/' forces the base64 segment
  private val expectedPath =
    "/metrics/job/htme/correlation_id@base64/YWJjLzEyMw/" +
      "export_date/2026-08-13/instance/i-1/" +
      "topic/db.database.collection/type/full"

  test("push is a PUT of the exposition under the grouping-key path") {
    withServer() { (url, reqs) =>
      val client = new PushGatewayClient(url, "htme", sleeper = _ => ())
      client.push(key, "# TYPE x counter\nx 1\n")
      val Seq(r) = reqs()
      assert(r.method === "PUT")
      assert(r.path === expectedPath)
      assert(r.contentType.startsWith("text/plain; version=0.0.4"))
      assert(r.body === "# TYPE x counter\nx 1\n")
    }
  }

  test("delete is a DELETE on the same grouping-key path") {
    withServer() { (url, reqs) =>
      new PushGatewayClient(url, "htme", sleeper = _ => ()).delete(key)
      val Seq(r) = reqs()
      assert(r.method === "DELETE")
      assert(r.path === expectedPath)
      assert(r.body === "")
    }
  }

  test("transient 5xx responses retry under the 5x2 policy, then succeed") {
    withServer(failFirst = 2) { (url, reqs) =>
      val delays = mutable.ArrayBuffer.empty[Long]
      val client = new PushGatewayClient(url, "htme",
        sleeper = d => delays += d)
      client.push(key, "x 1\n")
      assert(reqs().size === 3, "two 500s then the successful PUT")
      assert(delays.toSeq === Seq(1000L, 2000L), "exponential 5x2 backoff")
    }
  }

  test("a persistent failure exhausts the 5 attempts and raises") {
    withServer(failFirst = 99) { (url, reqs) =>
      val client = new PushGatewayClient(url, "htme", sleeper = _ => ())
      intercept[java.io.IOException] { client.push(key, "x 1\n") }
      assert(reqs().size === 5, "maxAttempts 5, like every reference client")
    }
  }

  test("scheduler lifecycle: pushes land, final push precedes the delete") {
    withServer() { (url, reqs) =>
      val reg = new Metrics.MetricsRegistry
      reg.inc("graft_exported_records", 42)
      val client = new PushGatewayClient(url, "htme", sleeper = _ => ())
      val sched = new Metrics.PushGatewayScheduler(reg, client, key,
        pushRateMs = 20000L, initialDelayMs = 10000L,
        deleteOnFinal = true, scrapeWaitMs = 70000L, sleeper = _ => ())
      sched.pushMetrics()
      sched.pushFinalMetrics()
      val rs = reqs()
      assert(rs.size === 3)
      assert(rs.map(_.method) === Seq("PUT", "PUT", "DELETE"))
      assert(rs.forall(_.path === expectedPath))
      assert(rs(1).body.contains("graft_exported_records 42"))
    }
  }
}
