package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live-HTTP mode of the DSv2 connector against a JDK-built-in
  * (`com.sun.net.httpserver`) JIRA-shaped fixture server: the
  * startAt/maxResults paging loop, jql/fields forwarding, basic-auth,
  * fail-fast on bad endpoints, and result parity with the file
  * transport. The server records every request so the paging protocol
  * itself is asserted, not just the rows.
  */
class JiraHttpSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** (method, startAt, maxResults, jql, auth header) per request. */
  case class Req(method: String, startAt: Long, max: Int, jql: String, auth: String)

  /** JIRA-shaped fixture: accepts the reference's POST-with-JSON-body
    * form AND the query-string GET form; `getOnly` simulates a server
    * without the POST route (405) to exercise the connector's
    * fallback.
    */
  private def withServer(
      rows: Seq[String],
      requireAuth: Option[String] = None,
      getOnly: Boolean = false)(body: (String, () => Seq[Req]) => Unit): Unit = {
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[Req]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/search",
      new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val method = ex.getRequestMethod
          val bodyText = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val params: Map[String, String] =
            if (method == "POST" && bodyText.nonEmpty) {
              val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bodyText)
              Seq("startAt", "maxResults", "jql")
                .flatMap(k => Option(node.get(k)).map(k -> _.asText()))
                .toMap
            } else
              Option(ex.getRequestURI.getRawQuery)
                .getOrElse("")
                .split('&')
                .filter(_.contains("="))
                .map { kv =>
                  val Array(k, v) = kv.split("=", 2)
                  k -> java.net.URLDecoder.decode(v, "UTF-8")
                }
                .toMap
          val startAt = params.getOrElse("startAt", "0").toLong
          val max = params.getOrElse("maxResults", "50").toInt
          val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
          requests.add(Req(method, startAt, max, params.getOrElse("jql", ""), auth))
          val (code, payload) = requireAuth match {
            case Some(expected) if auth != expected => (401, """{"error":"unauthorized"}""")
            case _ if getOnly && method == "POST" =>
              (405, """{"error":"method not allowed"}""")
            case _ =>
              val slice = rows.slice(startAt.toInt, startAt.toInt + max)
              (200,
                s"""{"startAt":$startAt,"maxResults":$max,"total":${rows.length},
                   |"issues":[${slice.mkString(",")}]}""".stripMargin.replace("\n", ""))
          }
          val bytes = payload.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(code, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    server.start()
    try body(
      s"http://127.0.0.1:${server.getAddress.getPort}/search",
      () => requests.iterator().asScala.toSeq)
    finally server.stop(0)
  }

  private def read(url: String) =
    spark.read
      .format("graft.sources.JiraSearchSource")
      .option("url", url)

  test("HTTP transport returns the same rows as the file transport") {
    val path = JiraFixture.writeLines(JiraFixture.rawRows, "issues_http_parity.jsonl")
    val fromFile = spark.read
      .format("graft.sources.JiraSearchSource")
      .option("path", path)
      .load()
      .select("key", "fields.summary")
      .collect()
      .map(_.toSeq)
      .toSet
    withServer(JiraFixture.rawRows) { (url, _) =>
      val fromHttp = read(url).load().select("key", "fields.summary")
        .collect().map(_.toSeq).toSet
      assert(fromHttp == fromFile)
      assert(fromHttp.size == JiraFixture.rawRows.size)
    }
  }

  test("paging loop: pageSize=2 walks startAt 0,2,4 and total ends it; pages=2 splits the page space") {
    withServer(JiraFixture.rawRows) { (url, reqs) =>
      val n = read(url).option("pageSize", "2").load().count()
      assert(n == JiraFixture.rawRows.size)
      val data = reqs().filter(_.max == 2) // the scan's own fetches
      assert(data.map(_.startAt).sorted == Seq(0L, 2L, 4L), data)
    }
    withServer(JiraFixture.rawRows) { (url, reqs) =>
      val n = read(url).option("pageSize", "2").option("pages", "2").load().count()
      assert(n == JiraFixture.rawRows.size)
      val data = reqs().filter(_.max == 2)
      // partition 0 owns global pages 0,2,… (startAt 0,4); partition 1
      // owns pages 1,3,… (startAt 2, then 6 → empty past-total page
      // ends it) — together they cover the 3 data pages exactly once
      assert(Set(0L, 2L, 4L).subsetOf(data.map(_.startAt).toSet), data)
      // no page fetched twice
      assert(data.map(_.startAt).distinct.size == data.size, data)
    }
  }

  test("server-side pushdown forwarding: jql and fields params reach the endpoint; client re-verifies") {
    withServer(JiraFixture.rawRows) { (url, reqs) =>
      val rows = read(url)
        .load()
        .filter(col("key") === "F-3")
        .select("key")
        .collect()
        .map(_.getString(0))
        .toSet
      // the fixture server IGNORES jql (a non-conforming server) and
      // returns every row — the client-side re-check still filters
      assert(rows == Set("F-3"))
      val dataReqs = reqs().filter(_.max > 0)
      assert(dataReqs.nonEmpty)
      dataReqs.foreach { r =>
        assert(r.jql.contains("key = 'F-3'"), r.jql)
      }
    }
  }

  test("limit pushdown stops the paging loop early") {
    withServer(JiraFixture.rawRows) { (url, reqs) =>
      val n = read(url).option("pageSize", "1").load().limit(2).count()
      assert(n == 2)
      // 5 fixture rows at 1 row/page: an un-pushed limit would fetch 5
      // pages; the pushed cap stops after 2 (+ the maxResults=0 probe)
      assert(reqs().count(_.max == 1) == 2, reqs())
    }
  }

  test("reference verb: data fetches POST {jql,maxResults,startAt}; GET-only servers get the fallback") {
    // Primary form — every search request is the reference's POST with
    // the paging/pushdown parameters carried in the JSON body
    // (etl.js:97-114), which the fixture parses from the body only.
    withServer(JiraFixture.rawRows) { (url, reqs) =>
      val rows = read(url)
        .option("pageSize", "2")
        .load()
        .filter(col("key") === "F-3")
        .select("key")
        .collect()
      assert(rows.map(_.getString(0)).toSet == Set("F-3"))
      val data = reqs().filter(_.max == 2)
      assert(data.nonEmpty)
      data.foreach { r =>
        assert(r.method == "POST", r)
        assert(r.jql.contains("key = 'F-3'"), r)
      }
      assert(data.map(_.startAt).contains(0L), data)
    }
    // Fallback — a query-string-only server 405s the POST; the
    // connector retries the same parameters as GET, MEMOIZES the
    // endpoint as GET-only (otherwise every page of a long scan pays a
    // failed POST round trip), and the scan still returns every row.
    withServer(JiraFixture.rawRows, getOnly = true) { (url, reqs) =>
      val n = read(url).option("pageSize", "2").load().count()
      assert(n == JiraFixture.rawRows.size)
      val all = reqs()
      // Exactly ONE POST per endpoint per JVM: the load()-probe tries
      // the reference verb, eats the 405, and every later fetch —
      // probe retry and all data pages — goes straight to GET.
      assert(all.count(_.method == "POST") == 1, all)
      val gets = all.filter(r => r.method == "GET" && r.max == 2)
      assert(gets.map(_.startAt).sorted == Seq(0L, 2L, 4L), all)
    }
  }

  test("basic auth: reference-encoded header is sent; bad credentials fail fast at load()") {
    val good = graft.sources.JiraSearchSource.basicAuth("jira_user", "s3cret")
    // the encode contract itself (helpers.js F1): base64("user:token")
    assert(good == "Basic " + java.util.Base64.getEncoder.encodeToString(
      "jira_user:s3cret".getBytes(StandardCharsets.UTF_8)))
    withServer(JiraFixture.rawRows, requireAuth = Some(good)) { (url, _) =>
      val rows = read(url).option("user", "jira_user").option("token", "s3cret")
        .load().select("key").collect()
      assert(rows.length == JiraFixture.rawRows.size)
    }
    withServer(JiraFixture.rawRows, requireAuth = Some(good)) { (url, _) =>
      val e = intercept[IllegalArgumentException] {
        read(url).option("user", "jira_user").option("token", "wrong").load()
      }
      assert(e.getMessage.contains("401"), e.getMessage)
    }
  }

  test("fail-fast: unreachable endpoint throws at load(), before any job (X4)") {
    val e = intercept[Exception] {
      spark.read
        .format("graft.sources.JiraSearchSource")
        .option("url", "http://127.0.0.1:9/search") // port 9: discard, refused
        .load()
    }
    assert(e != null)
  }
}
