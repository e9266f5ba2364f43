package graft.io

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** REST API source + OAuth2 bearer-token fetch (reference S1/S2:
  * transform_utils.py:35–75 `Extractor`, server/server.py:70–106 token
  * endpoint). The extract runs on the DRIVER — correct at any scale because
  * the payloads are dimension feeds (suppliers/products/customers), never
  * the fact table; the fact arrives via bulk files (S3/CSV path).
  */
object Rest {

  class HttpFetchException(msg: String) extends RuntimeException(msg)
  final class HttpStatusException(val status: Int, msg: String)
      extends HttpFetchException(msg)

  private val client = HttpClient.newHttpClient()

  /** Bounded retry for transient upstream failures (5xx / IO): fixed
    * 100 ms backoff, `attempts` tries, then the last failure propagates.
    * 4xx never retries — auth and bad-request are deterministic.
    */
  private[io] def withRetry[A](attempts: Int = 3)(f: => A): A = {
    var tries = 0
    var out: Option[A] = None
    var last: Throwable = null
    while (out.isEmpty && tries < attempts) {
      try out = Some(f)
      catch {
        case e: HttpStatusException if e.status >= 500 =>
          last = e; tries += 1
          if (tries < attempts) Thread.sleep(100L)
        case e: java.io.IOException =>
          last = e; tries += 1
          if (tries < attempts) Thread.sleep(100L)
      }
    }
    out.getOrElse(throw last)
  }

  /** POST form credentials → access_token (reference
    * transform_utils.py:42–60; server issues at server/server.py:70–86).
    * The token JSON is `{"access_token": "...", "token_type": "bearer"}`.
    */
  def fetchToken(baseUrl: String, user: String, secret: String): String = {
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/token"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"username=$user&password=$secret"))
      .build()
    val resp = withRetry() {
      val r = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (r.statusCode() != 200)
        throw new HttpStatusException(r.statusCode(),
          s"token fetch failed: ${r.statusCode()}")
      r
    }
    val m = """"access_token"\s*:\s*"([^"]+)"""".r
    m.findFirstMatchIn(resp.body())
      .map(_.group(1))
      .getOrElse(throw new HttpFetchException("no access_token in response"))
  }

  /** GET `{base}/v1/{entity}`, unwrap the `data` array → one JSON object
    * string per row (reference transform_utils.py:62–75 unwraps
    * `json()["data"]`). Bearer token optional (customers endpoint requires
    * it — server/server.py:89–106).
    */
  def extract(baseUrl: String, entity: String,
              token: Option[String] = None): Seq[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$baseUrl/v1/$entity"))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = withRetry() {
      val r = client.send(b.GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (r.statusCode() != 200)
        throw new HttpStatusException(r.statusCode(),
          s"GET /v1/$entity failed: ${r.statusCode()}")
      r
    }
    splitDataArray(resp.body())
  }

  /** Paged GET as a LAZY page iterator: `?offset=N&limit=M` until a short
    * page. Each `next()` performs exactly one request, so the caller
    * controls the peak: a consumer that lands each page before pulling
    * the next holds ONE page in driver memory regardless of feed size —
    * the answer to "what happens when the customers feed is 100× larger":
    * page size stays constant, only the page count grows. Offset paging
    * preserves order, so the concatenation of pages is byte-identical to
    * the one-body extract (RestSpec asserts it).
    */
  def extractPages(baseUrl: String, entity: String,
                   token: Option[String] = None,
                   pageSize: Int = 1000): Iterator[Seq[String]] = {
    require(pageSize > 0)
    new Iterator[Seq[String]] {
      private var offset = 0
      private var lastSize = pageSize // full page ⇒ maybe more
      override def hasNext: Boolean = lastSize == pageSize
      override def next(): Seq[String] = {
        val b = HttpRequest.newBuilder(URI.create(
          s"$baseUrl/v1/$entity?offset=$offset&limit=$pageSize"))
        token.foreach(t => b.header("Authorization", s"Bearer $t"))
        val resp = withRetry() {
          val r = client.send(b.GET().build(),
            HttpResponse.BodyHandlers.ofString())
          if (r.statusCode() != 200)
            throw new HttpStatusException(r.statusCode(),
              s"GET /v1/$entity offset=$offset failed: ${r.statusCode()}")
          r
        }
        val page = splitDataArray(resp.body())
        lastSize = page.size
        offset += pageSize
        page
      }
    }
  }

  /** Whole-feed convenience over [[extractPages]] — driver peak is the
    * full feed; use the iterator + incremental landing for large feeds.
    */
  def extractPaged(baseUrl: String, entity: String,
                   token: Option[String] = None,
                   pageSize: Int = 1000): Seq[String] =
    extractPages(baseUrl, entity, token, pageSize).flatten.toSeq

  /** Splits `{"data":[{...},{...}]}` into per-object strings. Depth-based —
    * no JSON library on the classpath beyond Spark's internals, and the
    * payload objects are flat (no nested braces in values beyond strings).
    */
  private[io] def splitDataArray(body: String): Seq[String] = {
    val start = body.indexOf('[')
    val end = body.lastIndexOf(']')
    if (start < 0 || end < start) return Seq.empty
    val rows = Seq.newBuilder[String]
    var depth = 0; var objStart = -1; var inStr = false; var esc = false
    var i = start + 1
    while (i < end) {
      val c = body.charAt(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => if (depth == 0) objStart = i; depth += 1
        case '}' => depth -= 1
          if (depth == 0) { rows += body.substring(objStart, i + 1) }
        case _ => ()
      }
      i += 1
    }
    rows.result()
  }

  /** In-process fixture server standing in for the reference's FastAPI app
    * (server/server.py): serves `/token` (OAuth2 password form) and
    * `/v1/<entity>` JSON documents handed to it, requiring a bearer token
    * for entities listed in `secured` (reference secures only customers).
    * Binds an ephemeral localhost port — zero egress.
    */
  final class FixtureServer(entities: Map[String, Seq[String]],
                            secured: Set[String],
                            failFirst: Int = 0) {
    private val token = "fixture-token-0001"
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    /** Requests served per entity — lets specs assert paging behavior. */
    @volatile var requestCount: Map[String, Int] = Map.empty.withDefaultValue(0)

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    server.createContext("/token", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      if (form.contains("username=") && form.contains("password="))
        respond(ex, 200,
          s"""{"access_token":"$token","token_type":"bearer"}""")
      else respond(ex, 400, """{"error":"invalid_request"}""")
    })
    entities.keys.foreach { name =>
      server.createContext(s"/v1/$name", (ex: HttpExchange) => {
        val served = synchronized {
          requestCount += name -> (requestCount(name) + 1)
          requestCount(name)
        }
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        if (served <= failFirst) // flaky-upstream simulation for specs
          respond(ex, 503, """{"detail":"temporarily unavailable"}""")
        else if (secured(name) && !auth.contains(s"Bearer $token"))
          respond(ex, 401, """{"detail":"Not authenticated"}""")
        else {
          // optional ?offset=N&limit=M slice; no query → the full body
          val params = Option(ex.getRequestURI.getQuery).getOrElse("")
            .split('&').filter(_.contains("="))
            .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
          val docs = entities(name)
          val page = (params.get("offset").map(_.toInt),
              params.get("limit").map(_.toInt)) match {
            case (Some(off), Some(lim)) => docs.slice(off, off + lim)
            case _ => docs
          }
          respond(ex, 200, page.mkString("""{"data":[""", ",", "]}"))
        }
      })
    }
    server.start()

    def baseUrl: String =
      s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }
}
