package graft.engine

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RuleReport

/** Drives [[RestReportWriter]] / [[RestPlanSource]] against a real local
  * HTTP server (JDK built-in) — method, URL resolution, headers, body,
  * retry-on-5xx, fail-fast-on-4xx, and the reader's fetch-everything-
  * through-the-server contract. */
class HttpTransportSpec extends AnyFunSuite {

  private def withServer(routes: (String, HttpExchange => Unit)*)
      (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => { h(ex); ex.close() })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  private val report = Seq("grp" -> Seq(RuleReport(
    query = "x > 0", description = "d", threshold = 0.1,
    fractionInvalid = 0.0, numInvalid = 0L, totalRows = 3L, failed = false,
    summaryStats = Map.empty, sampleInvalid = Seq.empty)))

  test("RestReportWriter PUTs the canonical JSON to <dest>/<key>") {
    var method = ""; var path = ""; var ctype = ""; var got = ""
    withServer("/reports/" -> { ex =>
      method = ex.getRequestMethod
      path = ex.getRequestURI.getPath
      ctype = ex.getRequestHeaders.getFirst("Content-Type")
      got = readBody(ex)
      respond(ex, 200, "ok")
    }) { base =>
      new RestReportWriter(s"$base/reports").write("runA", report)
    }
    assert(method == "PUT")
    assert(path == "/reports/runA")
    assert(ctype == "application/json")
    assert(got == ReportWriter.toJson(report))
    assert(got.contains("\"query\" : \"x > 0\""))
  }

  test("transient 5xx retries until success; count is bounded") {
    val hits = new AtomicInteger(0)
    withServer("/r/" -> { ex =>
      if (hits.incrementAndGet() < 3) respond(ex, 503, "busy")
      else respond(ex, 200, "ok")
    }) { base =>
      new RestReportWriter(s"$base/r", attempts = 3, backoffMs = 1L)
        .write("k", report)
    }
    assert(hits.get() == 3)
  }

  test("4xx fails fast without retrying") {
    val hits = new AtomicInteger(0)
    val e = intercept[Http.HttpStatusException] {
      withServer("/r/" -> { ex =>
        hits.incrementAndGet(); respond(ex, 400, "bad payload")
      }) { base =>
        new RestReportWriter(s"$base/r", attempts = 5, backoffMs = 1L)
          .write("k", report)
      }
    }
    assert(e.status == 400)
    assert(hits.get() == 1)
  }

  test("exhausted retries surface the last failure") {
    val hits = new AtomicInteger(0)
    val e = intercept[Http.HttpStatusException] {
      withServer("/r/" -> { ex =>
        hits.incrementAndGet(); respond(ex, 503, "down")
      }) { base =>
        new RestReportWriter(s"$base/r", attempts = 3, backoffMs = 1L)
          .write("k", report)
      }
    }
    assert(e.status == 503)
    assert(hits.get() == 3)
  }

  test("RestPlanSource fetches the plan AND its externalParamsFile " +
      "through the server, resolving relative refs") {
    val served = Map(
      "/configs/root.json" ->
        """{"commands": [
          |  {"command": "view",
          |   "inputs": [{"ref": "${table}", "onDisk": false}],
          |   "externalParamsFile": "view_params.json",
          |   "outputKey": "out"}
          |]}""".stripMargin,
      "/configs/view_params.json" ->
        """{"tableAliases": ["t"], "query": "SELECT 7 AS seven FROM t"}""")
    val fetched = scala.collection.mutable.ListBuffer.empty[String]
    withServer("/" -> { ex =>
      val p = ex.getRequestURI.getPath
      fetched += p
      served.get(p) match {
        case Some(doc) => respond(ex, 200, doc)
        case None      => respond(ex, 404, "not found")
      }
    }) { base =>
      val plan = RestPlanSource.parse(base, "configs/root.json",
        variables = Map("table" -> "resolved"))
      val view = plan.commands.head.asInstanceOf[ViewCommand]
      assert(view.inputs.head.ref == "resolved")
      assert(view.query == "SELECT 7 AS seven FROM t")
    }
    assert(fetched.toList ==
      List("/configs/root.json", "/configs/view_params.json"))
  }

  test("RestPlanSource.validate turns a 404 into a plan error, not a crash") {
    withServer("/" -> { ex => respond(ex, 404, "no such plan") }) { base =>
      val Left(errs) =
        RestPlanSource.validate(base, "missing.json"): @unchecked
      assert(errs.head.message.contains("404"))
    }
  }
}
