package graft

import java.time.Duration

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.LlmExtract
import graft.sources.{Fetcher, HttpFetcher, HttpSources, HttpTransport, OllamaClient}

/** Production network classes (java.net.http behind the Fetcher /
  * LlmClient seams) driven through scripted transports — the zero-egress
  * equivalent of the reference's own mock-mode switch. What's under
  * test: URL building + query encoding, status classification, the
  * reference's retries=3 schedule, and the Ollama chat contract
  * (weather_ollama_dag.py:54-110). */
class HttpSpec extends SparkSpec {

  /** Scripted transport: pops one outcome per call, records requests.
    * An outcome of Left(msg) throws a TransportException (connect/read
    * failure); Right(r) returns the response. */
  private final class ScriptedTransport(
      script: Seq[Either[String, HttpTransport.Response]]) extends HttpTransport {
    val requests = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    private var i = 0
    private def next(method: String, url: String, body: String): HttpTransport.Response = {
      requests += ((method, url, body))
      require(i < script.length, s"transport script exhausted after $i calls")
      val out = script(i); i += 1
      out match {
        case Left(msg) => throw new HttpTransport.TransportException(msg, null)
        case Right(r)  => r
      }
    }
    def get(url: String, headers: Map[String, String], timeout: Duration): HttpTransport.Response =
      next("GET", url, "")
    def post(url: String, body: String, headers: Map[String, String], timeout: Duration): HttpTransport.Response =
      next("POST", url, body)
  }

  private def ok(body: String) = Right(HttpTransport.Response(200, body))

  test("HttpFetcher builds the encoded query URL and returns the 2xx body") {
    val t = new ScriptedTransport(Seq(ok("""{"price": "68285.81"}""")))
    val f = new HttpFetcher(t, retries = 0, sleeper = _ => ())
    val body = f.fetch(Map("url" -> "https://h/api/v3/avgPrice",
      "symbol" -> "BTC USDT", "limit" -> "5"))
    assert(body.contains("68285.81"))
    // params sorted, URL-encoded, '?' vs '&' chosen correctly
    assert(t.requests.map(_._2) ==
      Seq("https://h/api/v3/avgPrice?limit=5&symbol=BTC+USDT"))
  }

  test("HttpFetcher retries 5xx and transport failures on the reference schedule") {
    val t = new ScriptedTransport(Seq(
      Right(HttpTransport.Response(503, "busy")),
      Left("connection reset"),
      ok("fine")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val f = new HttpFetcher(t, retries = 3, retryDelayMs = 60000L,
      sleeper = sleeps += _)
    assert(f.fetch(Map("url" -> "https://h/x")) == "fine")
    assert(t.requests.size == 3)           // first try + 2 retries
    assert(sleeps.toSeq == Seq(60000L, 60000L)) // the DAG's retry_delay=1min
  }

  test("HttpFetcher fails fast on a non-retryable 4xx (no sleeps, one request)") {
    val t = new ScriptedTransport(Seq(Right(HttpTransport.Response(404, "nope"))))
    var slept = 0
    val f = new HttpFetcher(t, retries = 3, sleeper = _ => slept += 1)
    val e = intercept[HttpTransport.HttpStatusException] {
      f.fetch(Map("url" -> "https://h/missing"))
    }
    assert(e.status == 404 && t.requests.size == 1 && slept == 0)
  }

  test("HttpFetcher throws the last failure once retries are exhausted") {
    val t = new ScriptedTransport(Seq(
      Right(HttpTransport.Response(500, "a")),
      Right(HttpTransport.Response(502, "b")),
      Right(HttpTransport.Response(503, "final"))))
    val f = new HttpFetcher(t, retries = 2, sleeper = _ => ())
    val e = intercept[HttpTransport.HttpStatusException] {
      f.fetch(Map("url" -> "https://h/x"))
    }
    assert(e.status == 503 && t.requests.size == 3)
  }

  test("HttpFetcher drives the S6 poll source end-to-end") {
    val t = new ScriptedTransport(Seq(ok("""{"mins": 5, "price": "68285.81"}""")))
    val schema = StructType(Seq(
      StructField("mins", IntegerType), StructField("price", StringType)))
    val df = HttpSources.pollJson(spark, new HttpFetcher(t, retries = 0, sleeper = _ => ()),
      Map("url" -> "https://h/avgPrice", "symbol" -> "BTCUSDT"),
      schema, java.time.Instant.parse("2026-01-01T00:00:00Z"))
    val row = df.collect().head
    assert(row.getAs[String]("price") == "68285.81")
    assert(row.getAs[Int]("mins") == 5)
  }

  test("OllamaClient posts the chat contract and validates string content") {
    val t = new ScriptedTransport(Seq(ok(
      """{"message": {"role": "assistant", "content": "{\"temp_c_current\": 12.5}"}}""")))
    val c = new OllamaClient("http://h:11434/", "tinyllama", t)
    val out = c.completeJson("sys prompt", "user \"quoted\" prompt\nline2")
    assert(out == """{"temp_c_current": 12.5}""")
    val (method, url, body) = t.requests.head
    assert(method == "POST" && url == "http://h:11434/api/chat")
    // the reference's body shape: model, messages, stream:false, format:json
    assert(body.contains(""""model": "tinyllama""""))
    assert(body.contains(""""role": "system""""))
    assert(body.contains(""""role": "user""""))
    assert(body.contains(""""stream": false"""))
    assert(body.contains(""""format": "json""""))
    // prompt escaping survived (quote + newline)
    assert(body.contains("""user \"quoted\" prompt\nline2"""))
  }

  test("OllamaClient re-serializes object content; rejects missing/invalid content") {
    val obj = new ScriptedTransport(Seq(ok(
      """{"message": {"content": {"temp_c_current": 9}}}""")))
    assert(new OllamaClient(transport = obj).completeJson("s", "u")
      == """{"temp_c_current":9}""")
    val missing = new ScriptedTransport(Seq(ok("""{"done": true}""")))
    val e1 = intercept[RuntimeException] {
      new OllamaClient(transport = missing).completeJson("s", "u")
    }
    assert(e1.getMessage.contains("Unexpected Ollama response"))
    val notJson = new ScriptedTransport(Seq(ok(
      """{"message": {"content": "plain words, not json"}}""")))
    val e2 = intercept[RuntimeException] {
      new OllamaClient(transport = notJson).completeJson("s", "u")
    }
    assert(e2.getMessage.contains("not valid JSON"))
    val http500 = new ScriptedTransport(Seq(Right(HttpTransport.Response(500, "down"))))
    intercept[HttpTransport.HttpStatusException] {
      new OllamaClient(transport = http500).completeJson("s", "u")
    }
  }

  test("OllamaClient rides the X2 mapPartitions pipeline (serializable client)") {
    // a stateless serializable transport (what an executor copy must be):
    // answers every chat with a fixed valid contract payload
    class FixedTransport extends HttpTransport {
      def get(url: String, headers: Map[String, String], timeout: Duration) =
        HttpTransport.Response(405, "")
      def post(url: String, body: String, headers: Map[String, String], timeout: Duration) =
        HttpTransport.Response(200,
          """{"message": {"content": "{\"city_label\": \"Paris\", """ +
            """\"observation_date\": \"2026-01-01\", \"temp_c_current\": 1.0, """ +
            """\"temp_c_max\": 2.0, \"temp_c_min\": 0.0, """ +
            """\"conditions_short\": \"clear\", \"precipitation_mm\": 0.0}"}}""")
    }
    import spark.implicits._
    val in = Seq((1L, "city=Paris"), (2L, "city=Lyon")).toDF("id", "prompt")
    val out = LlmExtract.extract(in, "id", "prompt",
      () => new OllamaClient(transport = new FixedTransport), LlmExtract.weatherSchema,
      LlmExtract.weatherSystemPrompt)
    assert(out.count() == 2)
    assert(out.select("city_label").distinct().as[String].collect().toSeq == Seq("Paris"))
  }

  test("production classes default to the real JDK transport (compile-level wiring)") {
    // constructing the production stack must not touch the network —
    // the lazy HttpClient only materializes on first send
    val f: Fetcher = new HttpFetcher()
    val c = new OllamaClient()
    assert(f != null && c != null)
  }
}
