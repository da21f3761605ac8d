package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Driver-side report/notification utilities (SURVEY.md §2.1 sink_chart_png /
  * sink_email — out of the engine's data path by design, kept as the thin
  * presentation edge the reference has).
  *
  * The chart sink collects the ALREADY-AGGREGATED day-grain series (a few
  * hundred rows — the only collect() in the codebase is presentation, never
  * a data-path operator); rendering to PNG needs a plotting library this
  * container doesn't ship, so `ChartData` produces the exact series the
  * reference plots (`advanced_monitoring.py:270-325`: 2×2 trend panel) and
  * rendering stays behind the seam. Email mirrors
  * `monday_etl_automated.py:647-691`: a report string built from stats,
  * delivered through an injectable sender (SMTP in production, canned in
  * tests).
  */
object Reporting {

  /** One panel of the reference's 2×2 trend chart: (title, x, y) series. */
  final case class ChartSeries(title: String, x: Seq[String], y: Seq[Double])

  /** The four panels of the trend chart, from the flagship daily metrics
    * (collects day-grain aggregates only). */
  def chartData(s: SparkSession, dir: String, days: Int = 30): Seq[ChartSeries] = {
    val dm = Analytics.dailyMetrics(s, dir)
      .orderBy(col("extraction_date").desc).limit(days)
      .orderBy(col("extraction_date"))
      .select(col("extraction_date").cast("string"),
        col("total_projects").cast("double"),
        col("total_subitems").cast("double"),
        col("total_revenue"), col("avg_revenue"))
      .collect()
    val x = dm.map(_.getString(0)).toSeq
    def series(i: Int, title: String) =
      ChartSeries(title, x, dm.map(r => Option(r.get(i)).fold(0.0)(_
        .asInstanceOf[Double])).toSeq)
    Seq(series(1, "Projects"), series(2, "Subitems"),
      series(3, "Total revenue"), series(4, "Avg revenue"))
  }

  /** Render seam: a real deployment plugs a plotting backend here. The
    * default writes the series as CSV next to where the PNG would go, so
    * the artifact pipeline (path, naming, one file per run) is exercised. */
  def writeChartArtifact(series: Seq[ChartSeries], outPath: String): String = {
    val sb = new StringBuilder
    series.foreach { cs =>
      sb.append(s"# ${cs.title}\n")
      cs.x.zip(cs.y).foreach { case (d, v) => sb.append(s"$d,$v\n") }
    }
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outPath).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      sb.toString)
    outPath
  }

  /** Report body in the reference's shape (`monday_etl_automated.py:647-691`):
    * per-table counts + revenue + day-over-day deltas. */
  def buildReport(stats: Map[String, Long], totalRevenue: Double,
      diffs: Map[String, Long]): String = {
    val lines = Seq(
      "MONDAY ETL - Report",
      "===================",
      s"Projects:        ${stats.getOrElse("projects", 0L)}",
      s"Subitems:        ${stats.getOrElse("subitems", 0L)}",
      s"Personnel costs: ${stats.getOrElse("personnel_costs", 0L)}",
      s"Travel costs:    ${stats.getOrElse("travel_costs", 0L)}",
      s"Supplier costs:  ${stats.getOrElse("supplier_costs", 0L)}",
      // pinned locale: f"%,.2f" would group per the host JVM's locale
      "Total revenue:   " + String.format(java.util.Locale.US,
        "%,.2f EUR", Double.box(totalRevenue))) ++
      diffs.toSeq.sortBy(_._1).map { case (k, v) =>
        val sign = if (v >= 0) "+" else ""
        s"  $k: $sign$v vs yesterday"
      }
    lines.mkString("\n")
  }

  /** Injectable delivery seam (SMTP in production). */
  trait Sender { def send(to: String, subject: String, body: String): Unit }

  final class EmailNotifier(sender: Sender, to: String) {
    def notifyRun(report: String, ok: Boolean): Unit =
      sender.send(to,
        if (ok) "Monday ETL: run OK" else "Monday ETL: run FAILED", report)
  }
}
