package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.rules.RuleReport

/** Built-in REST transports for the plan engine — the reference's
  * `TnRESTWriter` (tnengine/TnWriter.scala:113-137: HTTP PUT of the
  * report JSON to `new URL(dest, key)` with JSON Accept/Content-Type
  * headers) and `TnRESTReader` (tnengine/TnReader.scala:44-73: HTTP GET
  * of `new URL(baseURL, configPath)`, non-200 → error), re-expressed on
  * the JDK's own `java.net.http` client so the library still pulls in
  * zero dependencies.
  *
  * Beyond reference parity, writes retry transient failures (connect
  * errors and 5xx) with bounded exponential backoff — a report sink
  * at the end of a multi-hour 100 TB plan run must not lose the run's
  * output to one dropped connection — while 4xx responses fail fast
  * (retrying a rejected payload can't succeed). The generic
  * [[TransportReportWriter]] / `PlanParser.parseFetched` seams remain
  * for callers with their own clients (HBase, message bus, signed
  * requests).
  */
object Http {
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** `new URL(base, path)`-style resolution (the reference's URL
    * construction): absolute `path` wins, else resolve against base. */
  def resolve(base: String, path: String): URI = {
    val b = URI.create(if (base.endsWith("/")) base else base + "/")
    b.resolve(path)
  }

  final class HttpStatusException(val status: Int, val url: String,
      val body: String)
    extends RuntimeException(s"HTTP $status from $url: ${body.take(200)}")

  private def isTransient(t: Throwable): Boolean = t match {
    case e: HttpStatusException => e.status >= 500
    case _: java.io.IOException => true
    case _ => false
  }

  private[engine] def withRetries[A](attempts: Int, backoffMs: Long)
      (op: () => A): A = {
    var left = math.max(1, attempts)
    var delay = backoffMs
    while (true) {
      try return op()
      catch {
        case t: Throwable if isTransient(t) && left > 1 =>
          left -= 1
          Thread.sleep(delay)
          delay = math.min(delay * 2, 30000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** GET `url`, expect 200, return the body. */
  def get(url: URI, timeout: Duration = Duration.ofSeconds(30)): String = {
    val req = HttpRequest.newBuilder(url)
      .timeout(timeout)
      .header("Accept", "application/json")
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new HttpStatusException(resp.statusCode(), url.toString, resp.body())
    resp.body()
  }

  /** PUT `body` to `url` as JSON, expect 2xx. */
  def put(url: URI, body: String,
      timeout: Duration = Duration.ofSeconds(30)): Unit = {
    val req = HttpRequest.newBuilder(url)
      .timeout(timeout)
      .header("Accept", "application/json")
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(body, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new HttpStatusException(resp.statusCode(), url.toString, resp.body())
  }
}

/** Ships each report as an HTTP PUT of the canonical JSON document to
  * `<dest>/<reportKey>` — reference `TnRESTWriter` parity with bounded
  * retry on transient failures. */
class RestReportWriter(dest: String, attempts: Int = 3,
    backoffMs: Long = 500L) extends ReportWriter {
  override def write(reportKey: String,
      groups: Seq[(String, Seq[RuleReport])]): Unit = {
    val body = ReportWriter.toJson(groups)
    Http.withRetries(attempts, backoffMs) { () =>
      Http.put(Http.resolve(dest, reportKey), body)
    }
  }
}

/** Reads plans (and every document they reference — externalParamsFile,
  * nested plans' params) from a REST config server — reference
  * `TnRESTReader` parity: each document path resolves against `baseUrl`
  * and is fetched with GET; non-200 fails the parse. Reads are
  * idempotent, so transient failures retry like writes. */
object RestPlanSource {
  def loader(baseUrl: String, attempts: Int = 3,
      backoffMs: Long = 500L): String => String =
    path => Http.withRetries(attempts, backoffMs) { () =>
      Http.get(Http.resolve(baseUrl, path))
    }

  def parse(baseUrl: String, planPath: String,
      variables: Map[String, String] = Map.empty): Plan =
    PlanParser.parseFetched(planPath, loader(baseUrl), variables)

  def validate(baseUrl: String, planPath: String,
      variables: Map[String, String] = Map.empty): Either[Seq[PlanParser.PlanError], Plan] =
    PlanParser.validateFetched(planPath, loader(baseUrl), variables)
}
