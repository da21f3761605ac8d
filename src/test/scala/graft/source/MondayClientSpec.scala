package graft.source

import org.scalatest.funsuite.AnyFunSuite

/** Connector behaviors over canned transports (SURVEY.md §2.1: src_retry,
  * src_pagination, src_dialect_probe, error-raise on GraphQL errors). */
class MondayClientSpec extends AnyFunSuite {

  private def page(cursor: Option[String], ids: Seq[Int]): String = {
    val items = ids.map(i => s"""{"id":"$i","name":"Item $i"}""").mkString(",")
    val cur = cursor.map(c => s""""$c"""").getOrElse("null")
    s"""{"data":{"boards":[{"id":"1","items_page":{"cursor":$cur,"items":[$items]}}]}}"""
  }

  test("apiCall returns parsed body on success") {
    val client = new MondayClient((_: String) => page(None, Seq(1, 2)))
    val resp = client.apiCall("query {}")
    assert(resp.path("data").path("boards").path(0).path("items_page")
      .path("items").size() == 2)
    assert(client.lastAttempts == 1)
  }

  test("apiCall retries transient failures up to 3 attempts then succeeds") {
    var n = 0
    val client = new MondayClient((_: String) => {
      n += 1
      if (n <= 2) throw new java.io.IOException(s"boom $n") else page(None, Seq(7))
    })
    val resp = client.apiCall("q")
    assert(n == 3 && client.lastAttempts == 3)
    assert(resp.path("data").path("boards").path(0).path("items_page")
      .path("items").path(0).path("id").asText() == "7")
  }

  test("apiCall rethrows after exhausting 3 attempts") {
    var n = 0
    val client = new MondayClient((_: String) => {
      n += 1; throw new java.io.IOException(s"always $n")
    })
    val e = intercept[java.io.IOException](client.apiCall("q"))
    assert(n == 3 && e.getMessage == "always 3")
  }

  test("apiCall raises immediately on GraphQL errors key (not transient)") {
    var n = 0
    val client = new MondayClient((_: String) => {
      n += 1; """{"errors":[{"message":"bad query"}]}"""
    })
    intercept[MondayApiException](client.apiCall("q"))
    assert(n == 1, "an API rejection must not be retried")
  }

  test("fetchAllPages follows cursors until null and concatenates pages") {
    val pages = Map(
      None -> page(Some("c1"), Seq(1, 2)),
      Some("c1") -> page(Some("c2"), Seq(3)),
      Some("c2") -> page(None, Seq(4, 5)))
    val client = new MondayClient((q: String) => {
      val cur = "cursor: \"(c\\d)\"".r.findFirstMatchIn(q).map(_.group(1))
      pages(cur)
    })
    val got = client.fetchAllPages(cur =>
      MondayQueries.itemsPageQuery("1", 100, cur))
    assert(got.size == 3)
    assert(client.calls == 3)
  }

  test("fetchAllPages stops on an empty page") {
    val client = new MondayClient((q: String) =>
      if (q.contains("cursor: \"")) page(Some("more"), Seq())
      else page(Some("c1"), Seq(1)))
    val got = client.fetchAllPages(cur =>
      MondayQueries.itemsPageQuery("1", 100, cur))
    assert(got.size == 1, "empty page must terminate the loop and be dropped")
  }

  test("probeDialect picks the first working dialect") {
    val client = new MondayClient((q: String) =>
      if (q.contains("items_page")) """{"errors":[{"message":"no"}]}"""
      else page(None, Seq(1)))
    val Some((name, _)) = client.probeDialect(MondayQueries.dialectCandidates("1"))
    assert(name == "legacy_items")
  }

  test("probeDialect returns None when every dialect fails") {
    val client = new MondayClient((_: String) => """{"errors":[{"message":"no"}]}""")
    assert(client.probeDialect(MondayQueries.dialectCandidates("1")).isEmpty)
  }
}
