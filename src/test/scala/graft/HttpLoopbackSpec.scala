package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HttpFetcher, HttpTransport, JdkHttpTransport, OllamaClient}

/** End-to-end exercise of the PRODUCTION network stack —
  * [[JdkHttpTransport]] (real `java.net.http` sockets), [[HttpFetcher]]'s
  * retry schedule, and [[OllamaClient]]'s wire format — against a
  * loopback `com.sun.net.httpserver` on 127.0.0.1 with zero egress. The
  * scripted-fake specs (HttpSpec) pin the protocol logic; this suite
  * pins the layer below: URL/query bytes on the wire, status handling
  * over real sockets, connect/read timeouts, and the interrupt paths
  * with a REAL clock. */
class HttpLoopbackSpec extends AnyFunSuite {

  /** Start a loopback server, run `body` with its base URL, always stop. */
  private def withServer[A](routes: (String, HttpExchange => Unit)*)(body: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => try h(ex) finally ex.close())
    }
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os: OutputStream = ex.getResponseBody
      os.write(bytes); os.close()
    }
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  test("JdkHttpTransport GET: status, body, request headers and query reach the server") {
    val seenHeader = new AtomicReference[String]()
    val seenQuery = new AtomicReference[String]()
    withServer("/data" -> { ex =>
      seenHeader.set(ex.getRequestHeaders.getFirst("X-Api-Key"))
      seenQuery.set(ex.getRequestURI.getRawQuery)
      respond(ex, 200, """{"ok":true}""")
    }) { base =>
      val r = new JdkHttpTransport().get(s"$base/data?symbol=BTC%2FUSD&limit=10",
        Map("X-Api-Key" -> "k123"), Duration.ofSeconds(5))
      assert(r.status == 200 && r.body == """{"ok":true}""")
      assert(seenHeader.get() == "k123")
      assert(seenQuery.get() == "symbol=BTC%2FUSD&limit=10")
    }
  }

  test("HttpFetcher over real sockets: 5xx retries then succeeds, delays honored") {
    val hits = new AtomicInteger(0)
    val delays = Seq.newBuilder[Long]
    withServer("/flaky" -> { ex =>
      if (hits.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, "payload-ok")
    }) { base =>
      val f = new HttpFetcher(new JdkHttpTransport(), retries = 3,
        retryDelayMs = 7L, sleeper = delays += _)
      assert(f.fetch(Map("url" -> s"$base/flaky")) == "payload-ok")
      assert(hits.get() == 3)
      assert(delays.result() == Seq(7L, 7L))
    }
  }

  test("HttpFetcher fail-fast on 404: exactly one request, no sleeps") {
    val hits = new AtomicInteger(0)
    withServer("/gone" -> { ex => hits.incrementAndGet(); respond(ex, 404, "nope") }) { base =>
      val f = new HttpFetcher(new JdkHttpTransport(), retries = 3,
        retryDelayMs = 1L, sleeper = _ => fail("must not sleep on a 4xx"))
      val e = intercept[HttpTransport.HttpStatusException] {
        f.fetch(Map("url" -> s"$base/gone"))
      }
      assert(e.status == 404 && hits.get() == 1)
    }
  }

  test("HttpFetcher query building is URL-encoded and deterministic on the wire") {
    val seen = new AtomicReference[String]()
    withServer("/q" -> { ex =>
      seen.set(ex.getRequestURI.getRawQuery); respond(ex, 200, "ok")
    }) { base =>
      new HttpFetcher(new JdkHttpTransport())
        .fetch(Map("url" -> s"$base/q", "b key" -> "x&y", "a" -> "1"))
      assert(seen.get() == "a=1&b+key=x%26y")
    }
  }

  test("read timeout surfaces as retryable TransportException; retries re-send") {
    val hits = new AtomicInteger(0)
    withServer("/slow" -> { ex =>
      hits.incrementAndGet(); Thread.sleep(2000); respond(ex, 200, "late")
    }) { base =>
      val f = new HttpFetcher(new JdkHttpTransport(),
        timeout = Duration.ofMillis(150), retries = 1, retryDelayMs = 1L,
        sleeper = Thread.sleep)
      val e = intercept[HttpTransport.TransportException] {
        f.fetch(Map("url" -> s"$base/slow"))
      }
      assert(e.getCause.isInstanceOf[java.net.http.HttpTimeoutException], e.getCause)
      assert(hits.get() == 2, "one original + one retry must reach the server")
    }
  }

  test("interrupt during REAL retry delay: flag re-set, TransportException, no further requests") {
    val hits = new AtomicInteger(0)
    withServer("/down" -> { ex => hits.incrementAndGet(); respond(ex, 500, "dead") }) { base =>
      val thrown = new AtomicReference[Throwable]()
      val flagSet = new AtomicReference[java.lang.Boolean]()
      val t = new Thread(() => {
        try {
          new HttpFetcher(new JdkHttpTransport(), retries = 5,
            retryDelayMs = 60000L, sleeper = Thread.sleep) // real clock
            .fetch(Map("url" -> s"$base/down"))
        } catch {
          case e: Throwable =>
            thrown.set(e)
            flagSet.set(Thread.currentThread().isInterrupted)
        }
      })
      t.start()
      // let the first request land and the fetcher enter its retry sleep
      val deadline = System.currentTimeMillis() + 5000
      while (hits.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(10)
      Thread.sleep(100) // into the sleeper
      t.interrupt()
      t.join(5000)
      assert(!t.isAlive, "fetch thread must abort out of the retry delay")
      assert(thrown.get().isInstanceOf[HttpTransport.TransportException], thrown.get())
      assert(thrown.get().getCause.isInstanceOf[InterruptedException])
      assert(flagSet.get() == java.lang.Boolean.TRUE,
        "interrupt flag must be RE-SET for callers above")
      assert(hits.get() == 1, "no re-send after cancellation")
    }
  }

  test("OllamaClient end-to-end: wire format out, string-JSON content back") {
    val seenBody = new AtomicReference[String]()
    val seenCT = new AtomicReference[String]()
    withServer("/api/chat" -> { ex =>
      seenBody.set(readBody(ex))
      seenCT.set(ex.getRequestHeaders.getFirst("Content-Type"))
      respond(ex, 200,
        """{"model":"m","message":{"role":"assistant","content":"{\"temp\": 21.5}"}}""")
    }) { base =>
      val out = new OllamaClient(base, "m", new JdkHttpTransport())
        .completeJson("sys \"quoted\"", "user\nline2")
      assert(out == """{"temp": 21.5}""")
      assert(seenCT.get() == "application/json")
      // body must be valid JSON carrying both roles + format=json
      val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(seenBody.get())
      assert(tree.path("model").asText() == "m")
      assert(tree.path("format").asText() == "json")
      assert(tree.path("stream").asBoolean() == false)
      val msgs = tree.path("messages")
      assert(msgs.get(0).path("role").asText() == "system")
      assert(msgs.get(0).path("content").asText() == "sys \"quoted\"")
      assert(msgs.get(1).path("role").asText() == "user")
      assert(msgs.get(1).path("content").asText() == "user\nline2")
    }
  }

  test("OllamaClient: object content re-serializes; 5xx and non-JSON content are loud") {
    withServer(
      "/obj/api/chat" -> { ex =>
        respond(ex, 200, """{"message":{"content":{"a":1,"b":"x"}}}""")
      },
      "/err/api/chat" -> { ex => respond(ex, 500, "overloaded") },
      "/bad/api/chat" -> { ex =>
        respond(ex, 200, """{"message":{"content":"not json at all"}}""")
      }) { base =>
      val t = new JdkHttpTransport()
      assert(new OllamaClient(s"$base/obj", "m", t).completeJson("s", "u")
        == """{"a":1,"b":"x"}""")
      val e = intercept[HttpTransport.HttpStatusException] {
        new OllamaClient(s"$base/err", "m", t).completeJson("s", "u")
      }
      assert(e.status == 500)
      val e2 = intercept[RuntimeException] {
        new OllamaClient(s"$base/bad", "m", t).completeJson("s", "u")
      }
      assert(e2.getMessage.contains("not valid JSON"))
    }
  }

  test("connection refused (no listener) is a retryable TransportException") {
    // bind-then-close to get a port with nothing listening
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = s.getAddress.getPort
    s.stop(0)
    val delays = Seq.newBuilder[Long]
    val f = new HttpFetcher(new JdkHttpTransport(), retries = 2,
      retryDelayMs = 3L, sleeper = delays += _)
    intercept[HttpTransport.TransportException] {
      f.fetch(Map("url" -> s"http://127.0.0.1:$port/x"))
    }
    assert(delays.result() == Seq(3L, 3L), "connect failures must follow the retry schedule")
  }
}
