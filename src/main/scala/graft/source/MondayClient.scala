package graft.source

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Monday.com GraphQL connector (SURVEY.md §2.1), reference semantics:
  *
  *  - POST to api.monday.com/v2 with bearer auth + 60s timeout
  *    (`monday_etl_automated.py:172-178`)
  *  - raise when the response carries an `errors` key (`:186-188`)
  *  - bounded retry, 3 attempts, warn per failure, rethrow on the last
  *    (`:180-194`)
  *  - cursor pagination: `items_page(limit:N, cursor:…)` looped until the
  *    cursor is null or a page is empty (`etl_quick_fix.py:45-156`)
  *  - dialect probe: try query shapes in order, first that works wins
  *    (`etl_fix.py:52-154`)
  *
  * The HTTP layer is injected (`Transport`), so every behavior is testable
  * offline with canned responses; `HttpTransport` is the production
  * implementation. The connector is driver-side (one board's snapshot is
  * hundreds of rows — SURVEY §6); at true scale the same client would back a
  * DSv2 `TableProvider` with one `InputPartition` per page.
  */
trait Transport {
  /** POST the GraphQL query, return the raw response body. */
  def post(query: String): String
}

/** Production transport: java.net.http POST, bearer auth, 60s timeout. */
final class HttpTransport(apiUrl: String, token: String) extends Transport {
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(60)).build()

  override def post(query: String): String = {
    val body = new ObjectMapper().createObjectNode()
    body.put("query", query)
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(apiUrl))
      .timeout(java.time.Duration.ofSeconds(60))
      .header("Authorization", s"Bearer $token")
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body.toString))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }
}

final class MondayApiException(msg: String) extends RuntimeException(msg)

final class MondayClient(
    transport: Transport,
    maxRetries: Int = 3,
    retryDelayMs: Long = 0L) {

  private val mapper = new ObjectMapper()

  /** Number of transport calls made (observability for tests/monitoring). */
  @volatile var calls: Int = 0
  /** Attempts consumed by the most recent apiCall. */
  @volatile var lastAttempts: Int = 0

  /** One GraphQL call with bounded retry; raises on `errors` in the body. */
  def apiCall(query: String): JsonNode = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      attempt += 1
      try {
        calls += 1
        val resp = mapper.readTree(transport.post(query))
        if (resp.has("errors"))
          throw new MondayApiException(s"GraphQL errors: ${resp.get("errors")}")
        lastAttempts = attempt
        return resp
      } catch {
        case e: MondayApiException => lastAttempts = attempt; throw e // API said no: not transient
        case e: Throwable =>
          last = e
          if (attempt < maxRetries && retryDelayMs > 0) Thread.sleep(retryDelayMs)
      }
    }
    lastAttempts = attempt
    throw last
  }

  private def itemsPageOf(resp: JsonNode): JsonNode =
    resp.path("data").path("boards").path(0).path("items_page")

  /** Cursor-pagination loop: `mkQuery(None)` builds the first page's query,
    * `mkQuery(Some(cursor))` subsequent ones. Stops on null/absent cursor or
    * an empty page. Returns the raw page bodies (ready for
    * `spark.read.json(Dataset[String])`). */
  def fetchAllPages(mkQuery: Option[String] => String): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var cursor: Option[String] = None
    var done = false
    while (!done) {
      val resp = apiCall(mkQuery(cursor))
      val page = itemsPageOf(resp)
      val items = page.path("items")
      if (items.isArray && items.size() > 0) pages += resp.toString
      val next = page.path("cursor")
      if (next.isMissingNode || next.isNull || !items.isArray || items.size() == 0)
        done = true
      else cursor = Some(next.asText())
    }
    pages.result()
  }

  /** Try candidate (name, query) dialects in order; first whose call
    * succeeds wins. Returns the winning name and response. */
  def probeDialect(candidates: Seq[(String, String)]): Option[(String, JsonNode)] = {
    candidates.iterator.flatMap { case (name, q) =>
      try Some(name -> apiCall(q))
      catch { case _: Throwable => None }
    }.nextOption()
  }
}

object MondayQueries {
  /** items_page dialect with cursor (ref `etl_quick_fix.py:96-131`). The
    * cursor is a server-provided opaque token — escape it so a quote or
    * backslash in the token (or a hostile response body) can't break out of
    * the GraphQL string literal. */
  def itemsPageQuery(boardId: String, limit: Int, cursor: Option[String]): String = {
    def esc(c: String) = c.replace("\\", "\\\\").replace("\"", "\\\"")
    val cur = cursor.map(c => s""", cursor: "${esc(c)}"""").getOrElse("")
    s"""query { boards(ids: [$boardId]) { items_page(limit: $limit$cur) {
       |  cursor items { id name created_at updated_at
       |    column_values { id text value } } } } }""".stripMargin
  }

  /** The four probe dialects of `etl_fix.py:52-154`. */
  def dialectCandidates(boardId: String): Seq[(String, String)] = Seq(
    "items_page_cursor" -> itemsPageQuery(boardId, 100, None),
    "items_page_plain" ->
      s"query { boards(ids: [$boardId]) { items_page(limit: 100) { items { id name } } } }",
    "legacy_items" ->
      s"query { boards(ids: [$boardId]) { items { id name } } }",
    "complexity_metered" ->
      s"query { complexity { query before after } boards(ids: [$boardId]) { items_page(limit: 5) { items { id name } } } }")
}
