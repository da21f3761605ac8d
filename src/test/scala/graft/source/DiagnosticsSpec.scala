package graft.source

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.flatten.Flatten

/** Staged diagnosis (etl_debug analog): gates short-circuit, stage 4 is
  * report-only. */
class DiagnosticsSpec extends AnyFunSuite {

  private def page(p: String): String =
    new String(Files.readAllBytes(
      Paths.get(s"${Flatten.fixtureRoot}/projects/$p")), "UTF-8")

  test("healthy transport: all four stages pass in gate order") {
    val p1 = page("2025-06-27_p1.json")
    val p2 = page("2025-06-27_p2.json")
    val client = new MondayClient(new Transport {
      def post(q: String): String = if (q.contains("cur-p2")) p2 else p1
    })
    val rs = new Diagnostics.Runner(client, "8113598675").run(_.nonEmpty)
    assert(rs.map(_.stage) == Diagnostics.Stages)
    assert(rs.forall(_.ok), rs.mkString("; "))
  }

  test("a failing gate short-circuits: board failure stops before subitems") {
    var calls = 0
    val client = new MondayClient(new Transport {
      def post(q: String): String = {
        calls += 1
        if (q.contains("items_page"))
          """{"errors":[{"message":"board unreachable"}]}"""
        else """{"data":{"me":{"name":"x"}}}"""
      }
    }, maxRetries = 1)
    val rs = new Diagnostics.Runner(client, "1").run(_ => fail("reload must not run"))
    assert(rs.map(_.stage) == Seq("api", "board"), s"short-circuit: $rs")
    assert(rs.head.ok && !rs.last.ok)
    assert(calls == 2, "no transport calls after the failed gate")
  }

  test("reload failure is reported but does not abort the run") {
    val p1 = page("2025-06-27_p1.json")
    val p2 = page("2025-06-27_p2.json")
    val client = new MondayClient(new Transport {
      def post(q: String): String = if (q.contains("cur-p2")) p2 else p1
    })
    val rs = new Diagnostics.Runner(client, "8113598675").run(_ => false)
    assert(rs.map(_.stage) == Diagnostics.Stages)
    assert(rs.take(3).forall(_.ok) && !rs.last.ok)
    assert(rs.last.detail.contains("reload rejected"))
  }
}
