package graft.report

import graft.SparkSpec

class ReportingSpec extends SparkSpec {

  test("chart data: four day-grain panels with aligned axes") {
    val series = Reporting.chartData(spark, sfDir, days = 10)
    assert(series.map(_.title) ==
      Seq("Projects", "Subitems", "Total revenue", "Avg revenue"))
    val x = series.head.x
    assert(x.nonEmpty && x == x.sorted, "x axis is ascending dates")
    assert(series.forall(s => s.x == x && s.y.length == x.length))
  }

  test("chart artifact written once per run at the given path") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_report/trend.csv"
    val series = Seq(Reporting.ChartSeries("T", Seq("2025-06-23"), Seq(1.0)))
    val path = Reporting.writeChartArtifact(series, out)
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(content == "# T\n2025-06-23,1.0\n")
  }

  test("report body carries counts, formatted revenue and signed deltas") {
    val body = Reporting.buildReport(
      Map("projects" -> 92L, "subitems" -> 805L), 2697768.06,
      Map("projects" -> 2L, "revenue" -> -5L))
    assert(body.contains("Projects:        92"))
    assert(body.contains("2,697,768.06 EUR"))
    assert(body.contains("projects: +2 vs yesterday"))
    assert(body.contains("revenue: -5 vs yesterday"))
  }

  test("email notifier delivers through the injected sender") {
    var sent: (String, String, String) = null
    val n = new Reporting.EmailNotifier(
      (to: String, subj: String, body: String) => sent = (to, subj, body),
      "ops@example.invalid")
    n.notifyRun("report-body", ok = true)
    assert(sent == ("ops@example.invalid", "Monday ETL: run OK", "report-body"))
    n.notifyRun("bad", ok = false)
    assert(sent._2 == "Monday ETL: run FAILED")
  }
}
