package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's one true table
  * scan: the JIRA search endpoint with a SERVER-SIDE JQL predicate,
  * `maxResults` cap, and `fields=` projection (reference etl.js:92-195,
  * etl.js:103-105, config.json:4 — SURVEY.md §2.1 S1/S2). The fixture
  * "server" is a JSON-lines file; the three pushdowns map exactly:
  *
  *  - `SupportsPushDownFilters`  → the JQL WHERE: supported predicates
  *    are evaluated INSIDE the reader against the raw JSON, so filtered
  *    rows never reach Spark (what a real REST source saves in network
  *    I/O). Unsupported predicates are returned as residuals and Spark
  *    evaluates them post-scan — never dropped.
  *  - `SupportsPushDownLimit`    → `maxResults`: the reader stops
  *    consuming the source once the cap is hit.
  *  - `SupportsPushDownRequiredColumns` → `fields=`: only requested
  *    (nested-pruned) fields are materialized into rows.
  *
  * TWO transports behind the same pushdown surface:
  *
  *  - `option("path", file)` — the JSON-lines fixture "server"
  *    (line i belongs to page i mod pages).
  *  - `option("url", http://…)` — LIVE HTTP mode against a JIRA-shaped
  *    search endpoint. Each request uses the reference's verb — a POST
  *    with JSON body `{jql, maxResults, …}` (etl.js:97-114) — extended
  *    with `startAt`/`fields` and paged per the standard JIRA search
  *    API convention (the reference itself issues ONE un-paged POST;
  *    paging is this engine's scale addition), falling back to
  *    `GET url?startAt=S&maxResults=P&jql=…&fields=…` when the server
  *    answers the POST with 404/405/501. Responses are
  *    `{"startAt","maxResults","total","issues":[…]}`, with partition
  *    p owning global pages p, p+pages, p+2·pages… The rendered `jql`
  *    and `fields` params ARE sent (a conforming server saves the
  *    network I/O — the point of pushdown on a remote source), but the
  *    pushed predicates are STILL re-applied client-side: the server
  *    is an external system, and accepted-not-residual predicates are
  *    never re-checked by Spark, so trusting a remote JQL evaluator
  *    would let a non-conforming server silently corrupt results.
  *    `option("user", u)` + `option("token", t)` add the reference's
  *    basic-auth header (helpers.js `encode`, SURVEY §2 F1);
  *    `option("pageSize", n)` sets maxResults per request (default 50,
  *    the JIRA default).
  *
  * Schema defaults to the JIRA issue shape
  * ([[JiraSearchSource.issueSchema]]); any pinned schema may be
  * supplied via `.schema(...)` (the converter is schema-driven), which
  * makes this the engine's general pushdown JSON table.
  *
  * Scale design: `pages=N` splits the scan into N input partitions;
  * each partition is an independent page-fetch loop, so the HTTP
  * backend fans out across executors exactly like the file fixture.
  */
class JiraSearchSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JiraSearchSource.issueSchema
  /** FAIL-FAST at `.load()` time (the reference's upfront credential
    * check, SURVEY.md §2 X4: validate the connection before the
    * pipeline spends work): a missing or unreadable `path` throws here
    * — during table resolution — not minutes later inside the first
    * executor task.
    */
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val p = properties.get("path")
    val u = properties.get("url")
    require(
      (p != null && p.nonEmpty) || (u != null && u.nonEmpty),
      "jira source requires option(\"path\", <json-lines file>) or option(\"url\", <search endpoint>)")
    if (u != null && u.nonEmpty) {
      // Live-HTTP fail-fast: a zero-row probe request validates
      // connectivity AND credentials during table resolution (the
      // reference's upfront check), not minutes later in a task.
      val probe = JiraSearchSource.httpSearchJson(
        u,
        startAt = 0,
        maxResults = 0,
        jqlRaw = null,
        fieldsCsv = null,
        properties.get("user"),
        properties.get("token"))
      require(
        probe != null,
        s"jira endpoint did not return a JSON body: $u")
    } else {
      require(
        new java.io.File(p).isFile,
        s"jira source path does not exist or is not a file: $p")
    }
    new JiraTable(schema)
  }
}

object JiraSearchSource {

  private def nameStruct = StructType(Seq(StructField("name", StringType)))

  /** Linked-issue payload as the search API returns it inside
    * `issuelinks[*].outwardIssue/inwardIssue` (reference etl.js:160-174).
    */
  private def linkedIssue = StructType(Seq(
    StructField("key", StringType),
    StructField("fields", StructType(Seq(
      StructField("summary", StringType),
      StructField("status", nameStruct),
      StructField("issuetype", nameStruct))))))

  /** The pinned JIRA issue schema — the 13 projected fields of
    * etl.js:127-148 plus the issuelinks array (P1/P2).
    */
  val issueSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("fields", StructType(Seq(
      StructField("summary", StringType),
      StructField("customfield_12501", nameStruct),
      StructField("reporter", nameStruct),
      StructField("project", StructType(Seq(StructField("key", StringType)))),
      StructField("created", StringType),
      StructField("resolutiondate", StringType),
      StructField("customfield_14604", DoubleType),
      StructField("customfield_14600", DoubleType),
      StructField("customfield_14607", DoubleType),
      StructField("customfield_14603", DoubleType),
      StructField("customfield_14602", DoubleType),
      StructField("customfield_14601", DoubleType),
      StructField("issuelinks", ArrayType(StructType(Seq(
        StructField("type", StructType(Seq(StructField("id", StringType)))),
        StructField("outwardIssue", linkedIssue),
        StructField("inwardIssue", linkedIssue))))))))))

  /** Resolve a (possibly dotted, nested) column path on a JSON node. */
  private[sources] def resolve(node: JsonNode, path: String): JsonNode = {
    var n = node
    path.split('.').foreach { p =>
      if (n == null || n.isNull) return null
      n = n.get(p)
    }
    n
  }

  /** Can this predicate run server-side? Conservative allow-list; a
    * predicate rejected here comes back to Spark as a residual.
    */
  private[sources] def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: In | _: IsNull | _: IsNotNull => true
    case _: GreaterThan | _: GreaterThanOrEqual | _: LessThan | _: LessThanOrEqual => true
    case _: StringStartsWith | _: StringEndsWith | _: StringContains => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  /** SQL-semantics comparison on the raw JSON value: null never
    * matches; numbers compare as doubles, everything else as strings.
    * Returns None for SQL NULL (unknown).
    */
  private def cmp(node: JsonNode, v: Any): Option[Int] = {
    if (node == null || node.isNull) return None
    v match {
      case n: Number => if (node.isNumber) Some(java.lang.Double.compare(node.asDouble, n.doubleValue)) else None
      // Compare as UTF8String (byte order = code-point order), not
      // java.lang.String (UTF-16 code-unit order): the two disagree on
      // supplementary-plane characters, and a pushed (accepted, not
      // residual) range predicate is never re-checked by Spark — a
      // mismatch here silently mis-filters rows.
      case s: String =>
        if (node.isTextual)
          Some(UTF8String.fromString(node.asText).compareTo(UTF8String.fromString(s)))
        else None
      case b: java.lang.Boolean => if (node.isBoolean) Some(java.lang.Boolean.compare(node.asBoolean, b)) else None
      case u: UTF8String => cmp(node, u.toString)
      case _ => None
    }
  }

  /** Evaluate a pushed predicate against a raw issue row (three-valued
    * logic; NULL collapses to false at the top, as a WHERE does).
    */
  private[sources] def eval(node: JsonNode, f: Filter): Option[Boolean] = f match {
    case EqualTo(a, v) => cmp(resolve(node, a), v).map(_ == 0)
    case GreaterThan(a, v) => cmp(resolve(node, a), v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(resolve(node, a), v).map(_ >= 0)
    case LessThan(a, v) => cmp(resolve(node, a), v).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(resolve(node, a), v).map(_ <= 0)
    case In(a, vs) =>
      val n = resolve(node, a)
      if (n == null || n.isNull) None else Some(vs.exists(v => cmp(n, v).contains(0)))
    case IsNull(a) => Some { val n = resolve(node, a); n == null || n.isNull }
    case IsNotNull(a) => Some { val n = resolve(node, a); n != null && !n.isNull }
    case StringStartsWith(a, v) =>
      val n = resolve(node, a); if (n == null || !n.isTextual) None else Some(n.asText.startsWith(v))
    case StringEndsWith(a, v) =>
      val n = resolve(node, a); if (n == null || !n.isTextual) None else Some(n.asText.endsWith(v))
    case StringContains(a, v) =>
      val n = resolve(node, a); if (n == null || !n.isTextual) None else Some(n.asText.contains(v))
    case And(l, r) =>
      (eval(node, l), eval(node, r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    case Or(l, r) =>
      (eval(node, l), eval(node, r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    case Not(c) => eval(node, c).map(!_)
    case _ => None
  }

  /** Schema-driven JSON → InternalRow conversion (nulls for missing or
    * mistyped leaves — the lenient read a pinned-schema JSON source
    * does; the schema, not the data, is the contract).
    */
  private[sources] def convert(node: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull) return null
    dt match {
      case st: StructType =>
        new GenericInternalRow(st.fields.map(f => convert(node.get(f.name), f.dataType)))
      case ArrayType(et, _) =>
        new GenericArrayData(node.elements.asScala.map(convert(_, et)).toArray)
      case StringType =>
        UTF8String.fromString(if (node.isTextual) node.asText else node.toString)
      case DoubleType => if (node.isNumber) java.lang.Double.valueOf(node.asDouble) else null
      case FloatType => if (node.isNumber) java.lang.Float.valueOf(node.asDouble.toFloat) else null
      case LongType => if (node.isNumber) java.lang.Long.valueOf(node.asLong) else null
      case IntegerType => if (node.isNumber) java.lang.Integer.valueOf(node.asInt) else null
      case BooleanType => if (node.isBoolean) java.lang.Boolean.valueOf(node.asBoolean) else null
      case _ => null
    }
  }

  /** The reference's `encode` (helpers.js — SURVEY §2 F1): the
    * base64 basic-auth header value for `user:token`.
    */
  def basicAuth(user: String, token: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$token".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** One HTTP request; returns (status, body text). JDK-only
    * (`HttpURLConnection`) — no client library, nothing to init per
    * row; one connection per page request, exactly the reference's
    * transport granularity.
    */
  private def httpRequest(
      fullUrl: String,
      method: String,
      jsonBody: Option[String],
      user: String,
      token: String): (Int, String) = {
    val conn = java.net.URI
      .create(fullUrl)
      .toURL
      .openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Accept", "application/json")
      if (user != null && user.nonEmpty) {
        conn.setRequestProperty("Authorization", basicAuth(user, if (token == null) "" else token))
      }
      jsonBody.foreach { b =>
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try out.write(b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (stream == null) ""
        else new String(stream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      (code, body)
    } finally conn.disconnect()
  }

  /** One search-API call. PRIMARY form is the reference's verb: a POST
    * with a JSON body carrying `jql` and `maxResults` (etl.js:97-114
    * sends exactly `{jql, maxResults}`), extended with `startAt` and
    * `fields` per the JIRA search API's POST body shape so pushdown
    * and paging ride the same request. Servers that only implement the
    * query-string convention (`GET ?startAt=…&maxResults=…`) answer
    * the POST with 404/405/501, and the call falls back to that GET
    * form — same parameters, same response contract. Any other
    * non-200 (401 bad credentials above all) throws immediately with
    * the status: a fallback there would just fail twice and mask the
    * real error.
    */
  /** Per-JVM memo of endpoints that rejected the POST form: a GET-only
    * server would otherwise pay a failed POST round trip on EVERY page
    * of the scan (the paging loop calls this once per page). Each
    * executor JVM learns the verb once; keyed by endpoint url.
    */
  private val getOnlyEndpoints =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[sources] def httpSearchJson(
      url: String,
      startAt: Long,
      maxResults: Int,
      jqlRaw: String,
      fieldsCsv: String,
      user: String,
      token: String): JsonNode = {
    val mapper = new ObjectMapper()
    def getForm(): JsonNode = {
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      val query = s"startAt=$startAt&maxResults=$maxResults" +
        (if (jqlRaw != null && jqlRaw.nonEmpty) s"&jql=${enc(jqlRaw)}" else "") +
        (if (fieldsCsv != null && fieldsCsv.nonEmpty) s"&fields=${enc(fieldsCsv)}" else "")
      val sep = if (url.contains("?")) "&" else "?"
      val (gc, gb) = httpRequest(url + sep + query, "GET", None, user, token)
      require(gc == 200, s"jira endpoint returned HTTP $gc for GET $url$sep$query")
      mapper.readTree(gb)
    }
    if (getOnlyEndpoints.contains(url)) return getForm()
    val body = mapper.createObjectNode()
    body.put("startAt", startAt)
    body.put("maxResults", maxResults)
    if (jqlRaw != null && jqlRaw.nonEmpty) body.put("jql", jqlRaw): Unit
    if (fieldsCsv != null && fieldsCsv.nonEmpty) {
      val arr = body.putArray("fields")
      fieldsCsv.split(',').foreach(arr.add)
    }
    val (pc, pb) = httpRequest(url, "POST", Some(mapper.writeValueAsString(body)), user, token)
    if (pc == 200) mapper.readTree(pb)
    else if (pc == 404 || pc == 405 || pc == 501) {
      getOnlyEndpoints.add(url)
      getForm()
    } else {
      throw new IllegalArgumentException(
        s"requirement failed: jira endpoint returned HTTP $pc for POST $url")
    }
  }

  /** JQL-ish rendering of the pushed predicates for plan display. */
  private[sources] def jql(f: Filter): String = f match {
    case EqualTo(a, v) => s"$a = '$v'"
    case GreaterThan(a, v) => s"$a > $v"
    case GreaterThanOrEqual(a, v) => s"$a >= $v"
    case LessThan(a, v) => s"$a < $v"
    case LessThanOrEqual(a, v) => s"$a <= $v"
    case In(a, vs) => s"$a in (${vs.mkString(", ")})"
    case IsNull(a) => s"$a is empty"
    case IsNotNull(a) => s"$a is not empty"
    case StringStartsWith(a, v) => s"$a ~ '$v*'"
    case StringEndsWith(a, v) => s"$a ~ '*$v'"
    case StringContains(a, v) => s"$a ~ '*$v*'"
    case And(l, r) => s"(${jql(l)} AND ${jql(r)})"
    case Or(l, r) => s"(${jql(l)} OR ${jql(r)})"
    case Not(c) => s"NOT ${jql(c)}"
    case other => other.toString
  }
}

private[sources] class JiraTable(tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = "jira_search"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JiraScanBuilder(tableSchema, options)
}

private[sources] class JiraScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {

  private val endpoint = {
    val path = options.get("path")
    val url = options.get("url")
    require(
      path != null || url != null,
      "jira source requires option(\"path\", <json-lines file>) or option(\"url\", <search endpoint>)")
    JiraEndpoint(
      path,
      url,
      options.get("user"),
      options.get("token"),
      math.max(1, options.getInt("pageSize", 50)))
  }
  private val pages = math.max(1, options.getInt("pages", 1))
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(JiraSearchSource.supported)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def pruneColumns(s: StructType): Unit = { required = s }
  override def build(): Scan = new JiraScan(endpoint, pages, required, pushed, limit)
}

/** Transport config: exactly one of `path` (fixture file) / `url`
  * (live HTTP) is non-null; `user`/`token` add basic auth in HTTP
  * mode; `pageSize` is maxResults per page request.
  */
private[sources] case class JiraEndpoint(
    path: String,
    url: String,
    user: String,
    token: String,
    pageSize: Int) {
  def isHttp: Boolean = url != null && url.nonEmpty
}

private[sources] class JiraScan(
    endpoint: JiraEndpoint,
    pages: Int,
    required: StructType,
    filters: Array[Filter],
    limit: Int)
    extends Scan
    with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val jql = filters.map(JiraSearchSource.jql).mkString(" AND ")
    val fields = required.fieldNames.mkString(",")
    val transport = if (endpoint.isHttp) s"url=${endpoint.url}" else s"path=${endpoint.path}"
    s"JiraSearchScan $transport jql=[$jql] maxResults=${if (limit >= 0) limit else "all"} fields=[$fields] pages=$pages"
  }
  override def toString: String = description()

  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages).map(p => JiraPage(p, pages): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new JiraReaderFactory(endpoint, required, filters, limit)
}

private[sources] case class JiraPage(page: Int, pages: Int) extends InputPartition

private[sources] class JiraReaderFactory(
    endpoint: JiraEndpoint,
    required: StructType,
    filters: Array[Filter],
    limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val JiraPage(page, pages) = partition.asInstanceOf[JiraPage]
    if (endpoint.isHttp)
      new HttpJiraPartitionReader(endpoint, page, pages, required, filters, limit)
    else
      new JiraPartitionReader(endpoint.path, page, pages, required, filters, limit)
  }
}

/** Reads one "page" of the fixture server: line i belongs to page
  * i % pages. The pushed JQL runs here — BEFORE a row is ever
  * materialized for Spark — and the maxResults cap stops the read
  * early, which is the whole point of limit pushdown on a remote
  * source.
  */
private[sources] class JiraPartitionReader(
    path: String,
    page: Int,
    pages: Int,
    required: StructType,
    filters: Array[Filter],
    limit: Int)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(path))
  private val it = lines.iterator()
  private var lineIdx = -1L
  private var emitted = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (it.hasNext) {
      val line = it.next()
      lineIdx += 1
      if (lineIdx % pages == page && line.nonEmpty) {
        val node = mapper.readTree(line)
        if (filters.forall(f => JiraSearchSource.eval(node, f).contains(true))) {
          current = JiraSearchSource.convert(node, required).asInstanceOf[GenericInternalRow]
          emitted += 1
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** Live-HTTP page reader — a startAt/maxResults paging loop (the
  * standard JIRA search API convention; the reference issues one
  * un-paged POST, etl.js:97-114) with partition p owning global pages
  * p, p+pages, p+2·pages… Each fetch POSTs
  * `{jql, maxResults, startAt, fields}` (GET query-string fallback for
  * servers without the POST route); the response's
  * `total` (or a short page when absent) ends the loop. Pushed
  * predicates are re-applied to every received issue — see the class
  * scaladoc for why the remote JQL evaluator is not trusted — and the
  * maxResults cap stops both the row emission AND further page
  * fetches.
  */
private[sources] class HttpJiraPartitionReader(
    endpoint: JiraEndpoint,
    page: Int,
    pages: Int,
    required: StructType,
    filters: Array[Filter],
    limit: Int)
    extends PartitionReader[InternalRow] {

  private val jqlRaw = filters.map(JiraSearchSource.jql).mkString(" AND ")
  private val fieldsCsv = required.fieldNames.mkString(",")

  private var pageIdx = page
  private var exhausted = false
  private var issues: Iterator[JsonNode] = Iterator.empty
  private var emitted = 0
  private var current: InternalRow = _

  private def fetchNextPage(): Unit = {
    val startAt = pageIdx.toLong * endpoint.pageSize
    val root = JiraSearchSource.httpSearchJson(
      endpoint.url,
      startAt,
      endpoint.pageSize,
      jqlRaw,
      fieldsCsv,
      endpoint.user,
      endpoint.token)
    val arr = root.get("issues")
    val got = if (arr == null || arr.isNull) 0 else arr.size
    issues = if (got == 0) Iterator.empty else arr.elements.asScala
    val total = root.get("total")
    exhausted =
      if (total != null && total.isNumber) startAt + got >= total.asLong
      else got < endpoint.pageSize // short page = source drained
    pageIdx += pages
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (true) {
      while (issues.hasNext) {
        val node = issues.next()
        if (filters.forall(f => JiraSearchSource.eval(node, f).contains(true))) {
          current = JiraSearchSource.convert(node, required).asInstanceOf[GenericInternalRow]
          emitted += 1
          return true
        }
      }
      if (exhausted) return false
      fetchNextPage()
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
