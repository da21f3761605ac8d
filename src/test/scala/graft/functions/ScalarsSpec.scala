package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.Scalars._

/** Property tests for the reference-pinned parse semantics (SURVEY.md §2.7).
  * Evaluated through Catalyst on literal one-row frames, so what is tested
  * is the engine behavior, not a Scala reimplementation. scalacheck `Gen`
  * drives the cases directly (the scalatest bridge artifact isn't in the
  * offline cache). */
class ScalarsSpec extends SparkSpec {

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  /** Minimal forAll: 60 samples per property, fixed seed via Gen retries. */
  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(60).foreach(check)

  test("castFloatZero: parseable numerics round-trip") {
    forAll(Gen.chooseNum(-1e9, 1e9)) { (d: Double) =>
      assert(eval(castFloatZero(lit(d.toString))) == d)
    }
  }

  test("castFloatZero: unparseable and empty input defaults to 0.0, not null") {
    forAll(Gen.alphaStr) { (s: String) =>
      val in = s + "x"  // never a valid double
      assert(eval(castFloatZero(lit(in))) == 0.0)
    }
    assert(eval(castFloatZero(lit(""))) == 0.0)
    assert(eval(castFloatZero(lit(null).cast("string"))) == 0.0)
  }

  test("parseDate: valid dates parse, garbage and invalid calendar dates are null") {
    assert(eval(parseDate(lit("2025-06-23"))) == java.sql.Date.valueOf("2025-06-23"))
    assert(eval(parseDate(lit("30/06/2025"))) == null)
    assert(eval(parseDate(lit("2025-02-30"))) == null)
    assert(eval(parseDate(lit("not-a-date"))) == null)
  }

  test("splitTimeline: exactly-2-parts rule with start-gated end") {
    def tl(s: String): (Any, Any) = {
      val (a, b) = splitTimeline(lit(s))
      (eval(a), eval(b))
    }
    assert(tl("2025-01-01 - 2025-03-31") ==
      (java.sql.Date.valueOf("2025-01-01"), java.sql.Date.valueOf("2025-03-31")))
    assert(tl("TBD") == (null, null), "1 part -> both null")
    assert(tl("a - b - c") == (null, null), "3 parts -> both null")
    assert(tl("2025-01-01 - garbage") ==
      (java.sql.Date.valueOf("2025-01-01"), null), "end fails alone")
    assert(tl("garbage - 2025-03-31") == (null, null),
      "failed start aborts before end is assigned (ref :312-319)")
  }

  test("splitTimeline property: any string without ' - ' yields (null, null)") {
    forAll(Gen.alphaNumStr) { (s: String) =>
      val (a, b) = splitTimeline(lit(s))
      assert(eval(a) == null && eval(b) == null)
    }
  }

  test("linkedPulseId: reference payload shape, malformed JSON, empty list") {
    assert(eval(linkedPulseId(
      lit("""{"linkedPulseIds":[{"linkedPulseId":201}]}"""))) == "201")
    assert(eval(linkedPulseId(lit("{not json"))) == null)
    assert(eval(linkedPulseId(lit("""{"linkedPulseIds":[]}"""))) == null)
    assert(eval(linkedPulseId(lit("{}"))) == null)
  }

  test("nonEmpty: empty string becomes null so defaults apply") {
    assert(eval(nonEmpty(lit(""))) == null)
    assert(eval(nonEmpty(lit("x"))) == "x")
  }

  test("pctChange matches the reference formula with decimal rounding") {
    assert(eval(pctChange(lit(110.0), lit(100.0))) == 10.0)
    assert(eval(pctChange(lit(95.0), lit(100.0))) == -5.0)
  }

  test("parse_url semantics the fn_url_parse oracle relies on (r10)") {
    import org.apache.spark.sql.functions.expr
    val u = "https://Host3.Example.COM:8443/p2/42?utm_source=news&q=7&b=1"
    def part(e: String): String =
      spark.sql(s"SELECT $e FROM (SELECT '$u' AS url)").first().getString(0)
    // HOST excludes the port and PRESERVES case (canonicalization is a
    // separate operator's job); targeted QUERY extraction picks one key
    assert(part("parse_url(url, 'HOST')") == "Host3.Example.COM")
    assert(part("parse_url(url, 'PATH')") == "/p2/42")
    assert(part("parse_url(url, 'PROTOCOL')") == "https")
    assert(part("parse_url(url, 'QUERY', 'q')") == "7")
    assert(part("parse_url(url, 'QUERY', 'utm_source')") == "news")
  }

  test("fn_ip_cidr: parse + RFC 1918 classification replayed from the dotted string (r11)") {
    val out = graft.functions.ScalarQueries.queries("fn_ip_cidr")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val classes = out.map(_.getString(3)).toSet
    assert(classes == Set("private", "loopback", "public"),
      s"fixture must exercise all three classes, got $classes")
    out.foreach { r =>
      val o = r.getString(1).split("\\.").map(_.toLong)
      assert(o.length == 4 && o.forall(x => x >= 0 && x <= 255))
      assert(r.getLong(2) == ((o(0) << 24) | (o(1) << 16) | (o(2) << 8) | o(3)),
        s"ip_u32 for ${r.getString(1)}")
      val want =
        if (o(0) == 10 || (o(0) == 172 && o(1) >= 16 && o(1) <= 31) ||
          (o(0) == 192 && o(1) == 168)) "private"
        else if (o(0) == 127) "loopback" else "public"
      assert(r.getString(3) == want, s"class of ${r.getString(1)}")
      assert(r.getString(4) == s"${o(0)}.${o(1)}.${o(2)}.0/24")
    }
    // the 172 band must land addresses on BOTH sides of the /12 boundary
    val o172 = out.filter(_.getString(1).startsWith("172."))
      .map(_.getString(3)).toSet
    assert(o172 == Set("private", "public"),
      "172.x fixture must straddle the /12 boundary")
  }

  test("fn_useragent_parse: family/major/os replayed from the raw UA string (r11)") {
    val out = graft.functions.ScalarQueries.queries("fn_useragent_parse")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getString(2)).toSet ==
      Set("chrome", "safari", "firefox", "curl"),
      "fixture must exercise all four template families")
    out.foreach { r =>
      val ua = r.getString(1)
      val wantFam =
        if (ua.startsWith("curl/")) "curl"
        else if (ua.contains("Firefox/")) "firefox"
        else if (ua.contains("Chrome/")) "chrome"
        else "safari"
      assert(r.getString(2) == wantFam, s"family of $ua")
      val tok = wantFam match {
        case "curl" => "curl/"; case "firefox" => "Firefox/"
        case "chrome" => "Chrome/"; case _ => "Version/"
      }
      val major = ua.substring(ua.indexOf(tok) + tok.length)
        .takeWhile(_.isDigit).toInt
      assert(r.getInt(3) == major, s"major of $ua")
      val wantOs =
        if (ua.contains("Windows")) "windows"
        else if (ua.contains("Mac OS X")) "macos"
        else if (ua.contains("Linux")) "linux" else "none"
      assert(r.getString(4) == wantOs, s"os of $ua")
    }
  }
}
