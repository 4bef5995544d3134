package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.functions.LlmClient

/** Production network implementations behind the engine's two seams —
  * [[Fetcher]] (HTTP sources S6-S9/S13-S15) and
  * [[graft.functions.LlmClient]] (X2) — on `java.net.http` (JDK 11+,
  * zero extra dependencies). The zero-egress build environment drives
  * everything through an injected [[HttpTransport]]: URL building,
  * query encoding, status classification, retry/backoff and the Ollama
  * response unwrapping are fully spec'd against scripted fixtures, and
  * only the final socket hop is environment-provided.
  */
object HttpTransport {
  /** One HTTP exchange's observable result. */
  final case class Response(status: Int, body: String)

  /** Connect/read-level failure (no HTTP status was obtained) —
    * retryable, unlike a 4xx rejection. */
  final class TransportException(message: String, cause: Throwable)
    extends RuntimeException(message, cause)

  /** Server said no with a non-retryable status. */
  final class HttpStatusException(val status: Int, val url: String, body: String)
    extends RuntimeException(
      s"HTTP $status from $url: ${body.take(200)}")
}

/** Minimal blocking transport seam: production = [[JdkHttpTransport]];
  * specs inject a scripted fake. Serializable so clients built on it can
  * ride `mapPartitions` closures (the X2 execution shape). */
trait HttpTransport extends Serializable {
  def get(url: String, headers: Map[String, String],
          timeout: Duration): HttpTransport.Response
  def post(url: String, body: String, headers: Map[String, String],
           timeout: Duration): HttpTransport.Response
}

/** `java.net.http` transport. The underlying client is per-JVM lazy
  * (`@transient` — rebuilt after deserialization on an executor), with
  * redirects followed like the reference's `requests.get`. */
final class JdkHttpTransport(connectTimeout: Duration = Duration.ofSeconds(10))
    extends HttpTransport {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(connectTimeout)
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  private def send(b: HttpRequest.Builder, url: String,
                   headers: Map[String, String],
                   timeout: Duration): HttpTransport.Response = {
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.timeout(timeout).build()
    try {
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      HttpTransport.Response(resp.statusCode(), resp.body())
    } catch {
      case e: java.io.IOException =>
        throw new HttpTransport.TransportException(s"transport failure for $url", e)
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new HttpTransport.TransportException(s"interrupted during $url", e)
    }
  }

  def get(url: String, headers: Map[String, String],
          timeout: Duration): HttpTransport.Response =
    send(HttpRequest.newBuilder(URI.create(url)).GET(), url, headers, timeout)

  def post(url: String, body: String, headers: Map[String, String],
           timeout: Duration): HttpTransport.Response =
    send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)), url, headers, timeout)
}

/** Production [[Fetcher]] (ref: lecture3/12_binance_fetch_minute.py:35-51
  * — `requests.get(url, timeout=10)` + `raise_for_status()`; retry
  * policy from the DAG's `default_args` `retries=3` / `retry_delay`,
  * :93-96; the backfill loop 15_binance_backfill_last_month.py:29-55
  * drives the same fetch page by page through [[HttpSources.paginated]]).
  *
  * `params`: the `"url"` key is the base URL; every other entry becomes
  * a URL-encoded query parameter (sorted for deterministic URLs). Status
  * classification: 2xx returns the body; 408/429/5xx and transport
  * failures retry up to `retries` times with a fixed delay (the
  * reference's Airflow retry model); any other status fails fast with
  * [[HttpTransport.HttpStatusException]] — a 404 will never resolve by
  * retrying.
  *
  * `sleeper` is injectable so specs assert the retry schedule without
  * real sleeps. */
final class HttpFetcher(transport: HttpTransport = new JdkHttpTransport(),
                        timeout: Duration = Duration.ofSeconds(10),
                        retries: Int = 3,
                        retryDelayMs: Long = 60000L,
                        headers: Map[String, String] = Map.empty,
                        sleeper: Long => Unit = Thread.sleep) extends Fetcher {
  require(retries >= 0, s"retries must be >= 0, got $retries")

  private def buildUrl(params: Map[String, String]): String = {
    val base = params.getOrElse("url",
      throw new IllegalArgumentException("HttpFetcher: params must carry a 'url' key"))
    val query = (params - "url").toSeq.sortBy(_._1).map { case (k, v) =>
      val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
      s"${enc(k)}=${enc(v)}"
    }
    if (query.isEmpty) base
    else base + (if (base.contains("?")) "&" else "?") + query.mkString("&")
  }

  private def retryable(status: Int): Boolean =
    status == 408 || status == 429 || status >= 500

  def fetch(params: Map[String, String]): String = {
    val url = buildUrl(params)
    var attempt = 0
    while (true) {
      val outcome: Either[Throwable, String] =
        try {
          val r = transport.get(url, headers, timeout)
          if (r.status >= 200 && r.status < 300) Right(r.body)
          else if (retryable(r.status))
            Left(new HttpTransport.HttpStatusException(r.status, url, r.body))
          else throw new HttpTransport.HttpStatusException(r.status, url, r.body)
        } catch {
          case e: HttpTransport.TransportException => Left(e)
        }
      outcome match {
        case Right(body) => return body
        case Left(e) =>
          // a cancelled thread must abort NOW, not re-send the request
          // up to `retries` more times — the transport re-sets the
          // interrupt flag before wrapping the InterruptedException
          if (Thread.currentThread().isInterrupted ||
              e.getCause.isInstanceOf[InterruptedException]) throw e
          attempt += 1
          if (attempt > retries) throw e
          // an interrupt during the retry delay surfaces exactly like
          // one during the transport hop: flag re-set, wrapped in
          // TransportException — not a raw InterruptedException with
          // the flag cleared (callers would mis-classify the state)
          try sleeper(retryDelayMs)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw new HttpTransport.TransportException(
                s"interrupted during retry delay for $url", ie)
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Production [[graft.functions.LlmClient]] for an Ollama endpoint
  * (ref: lecture11/assignment/dags/weather_ollama_dag.py:54-110):
  * POST `{base}/api/chat` with
  * `{"model", "messages": [...], "stream": false, "format": "json"}`,
  * timeout 180 s, `raise_for_status`, then unwrap
  * `payload.message.content`. Like the reference: an empty/missing
  * content is an error; an OBJECT content is re-serialized; a STRING
  * content must itself parse as JSON (the model promised `format:
  * "json"`) and is returned verbatim. The reference puts the whole
  * instruction in one user message; this client carries the engine's
  * system prompt as a proper system message — same contract, cleaner
  * roles. No transport-level retry: the reference relies on task-level
  * retries, which [[graft.plans.Pipeline]]'s retry wrapper provides. */
final class OllamaClient(baseUrl: String = "http://127.0.0.1:11434",
                         model: String = "tinyllama",
                         transport: HttpTransport = new JdkHttpTransport(),
                         timeout: Duration = Duration.ofSeconds(180)) extends LlmClient {

  // one mapper per client (= per partition in the X2 mapPartitions
  // shape), not per row — ObjectMapper is expensive to build and
  // designed for reuse; @transient so executor copies rebuild lazily
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def completeJson(systemPrompt: String, userPrompt: String): String = {
    val url = s"${baseUrl.stripSuffix("/")}/api/chat"
    val body =
      s"""{"model": ${jsonStr(model)}, "messages": [""" +
        s"""{"role": "system", "content": ${jsonStr(systemPrompt)}}, """ +
        s"""{"role": "user", "content": ${jsonStr(userPrompt)}}], """ +
        """"stream": false, "format": "json"}"""
    val resp = transport.post(url, body,
      Map("Content-Type" -> "application/json"), timeout)
    if (resp.status < 200 || resp.status >= 300)
      throw new HttpTransport.HttpStatusException(resp.status, url, resp.body)
    // jackson-databind rides Spark's own classpath — no new dependency
    val payload =
      try mapper.readTree(resp.body)
      catch {
        case e: java.io.IOException =>
          throw new RuntimeException(s"Unexpected Ollama response (not JSON): ${resp.body.take(200)}", e)
      }
    val content = payload.path("message").path("content")
    if (content.isObject) content.toString
    else if (content.isTextual && content.asText().nonEmpty) {
      val text = content.asText()
      try { mapper.readTree(text); () }
      catch {
        case e: java.io.IOException =>
          throw new RuntimeException(
            s"Ollama content is not valid JSON despite format=json: ${text.take(200)}", e)
      }
      text
    } else
      throw new RuntimeException(s"Unexpected Ollama response: ${resp.body.take(200)}")
  }
}
