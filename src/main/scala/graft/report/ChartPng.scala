package graft.report

import java.awt.{BasicStroke, Color, Font, Graphics2D}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** JDK-only PNG chart renderer for the reference's 2×2 trend panel
  * (`advanced_monitoring.py:270-325`): three line panels (one with two
  * series) and one sign-colored bar panel with a zero axis. No plotting
  * library — `BufferedImage` + `Graphics2D` + `ImageIO` render offline.
  *
  * Determinism: antialiasing stays OFF and all geometry is integer math, so
  * axis/grid/series pixels are bit-stable across runs on the same JVM; the
  * spec asserts dimensions and sampled GEOMETRY pixels, never text glyphs
  * (font rasterization is the one platform-dependent part).
  */
object ChartPng {

  sealed trait Kind
  case object LineKind extends Kind
  /** Bars colored by sign (green >= 0, red < 0) around a zero baseline. */
  case object BarKind extends Kind

  final case class Series(label: String, y: Seq[Option[Double]], color: Color)
  final case class Panel(title: String, x: Seq[String], series: Seq[Series],
      kind: Kind = LineKind)

  val Background: Color = Color.WHITE
  val AxisColor: Color = Color.BLACK
  val GridColor: Color = new Color(0xDD, 0xDD, 0xDD)
  val PosBar: Color = new Color(0x2E, 0x7D, 0x32)
  val NegBar: Color = new Color(0xC6, 0x28, 0x28)

  /** Render panels in a 2-column grid; returns `outPath`. */
  def render(title: String, panels: Seq[Panel], outPath: String,
      width: Int = 1500, height: Int = 1000): String = {
    require(panels.nonEmpty, "at least one panel")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(Background)
      g.fillRect(0, 0, width, height)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
      g.setColor(AxisColor)
      drawCentered(g, title, width / 2, 24)
      val cols = 2
      val rows = (panels.size + cols - 1) / cols
      val top = 36
      val pw = width / cols
      val ph = (height - top) / rows
      panels.zipWithIndex.foreach { case (p, i) =>
        drawPanel(g, p, (i % cols) * pw, top + (i / cols) * ph, pw, ph)
      }
    } finally g.dispose()
    val f = new java.io.File(outPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    ImageIO.write(img, "png", f)
    outPath
  }

  // ---- panel geometry -------------------------------------------------------

  private def drawPanel(g: Graphics2D, p: Panel,
      x0: Int, y0: Int, w: Int, h: Int): Unit = {
    val (ml, mr, mt, mb) = (80, 24, 30, 44)
    val px = x0 + ml
    val py = y0 + mt
    val iw = w - ml - mr // inner plot width
    val ih = h - mt - mb // inner plot height
    val n = p.x.length

    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 13))
    g.setColor(AxisColor)
    drawCentered(g, p.title, x0 + w / 2, y0 + 20)

    // y-range over all defined points; bars force the baseline into range
    val ys = p.series.flatMap(_.y.flatten)
    if (ys.isEmpty || n == 0) return
    var lo = ys.min
    var hi = ys.max
    if (p.kind == BarKind) { lo = math.min(lo, 0.0); hi = math.max(hi, 0.0) }
    if (lo == hi) { lo -= 1.0; hi += 1.0 }

    def sy(v: Double): Int =
      py + ih - 1 - math.round((v - lo) / (hi - lo) * (ih - 1)).toInt
    def sx(i: Int): Int =
      if (n == 1) px + iw / 2 else px + (i.toLong * (iw - 1) / (n - 1)).toInt

    // horizontal gridlines + y tick labels at 5 even fractions
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 10))
    (0 to 4).foreach { t =>
      val v = lo + (hi - lo) * t / 4
      val yy = sy(v)
      g.setColor(GridColor)
      g.drawLine(px, yy, px + iw - 1, yy)
      g.setColor(AxisColor)
      drawRight(g, fmt(v), px - 6, yy + 4)
    }

    // axes
    g.setColor(AxisColor)
    g.setStroke(new BasicStroke(1f))
    g.drawLine(px, py, px, py + ih - 1)                       // y axis
    g.drawLine(px, py + ih - 1, px + iw - 1, py + ih - 1)     // x axis

    // bars get one slot per category (fully inside the panel); lines map
    // endpoints to the panel edges
    def slotCenter(i: Int): Int = px + (i * iw + iw / 2) / math.max(1, n)
    def labelX(i: Int): Int = if (p.kind == BarKind) slotCenter(i) else sx(i)

    // first/last x labels (the reference rotates all of them; first/last
    // keeps the render readable without glyph-rotation rasterization)
    drawCentered(g, p.x.head, labelX(0), py + ih + 16)
    if (n > 1) drawCentered(g, p.x.last, labelX(n - 1), py + ih + 16)

    p.kind match {
      case BarKind =>
        val zero = sy(0.0)
        // slot layout: bar i spans its own 1/n column with a 1px gutter, so
        // no bar can overpaint the y-axis, a neighboring panel, or be
        // clipped at the image edge regardless of n
        p.series.foreach { s =>
          s.y.zipWithIndex.foreach {
            case (Some(v), i) =>
              g.setColor(if (v >= 0) PosBar else NegBar)
              val x0b = px + i * iw / n + 1
              val x1b = px + (i + 1) * iw / n - 1
              val bw = math.max(1, x1b - x0b)
              val yv = sy(v)
              if (v >= 0) g.fillRect(x0b, yv, bw, math.max(1, zero - yv))
              else g.fillRect(x0b, zero, bw, math.max(1, yv - zero))
            case _ => ()
          }
        }
        g.setColor(AxisColor)
        g.drawLine(px, zero, px + iw - 1, zero) // zero baseline
      case LineKind =>
        g.setStroke(new BasicStroke(2f))
        p.series.foreach { s =>
          g.setColor(s.color)
          var prev: Option[(Int, Int)] = None
          s.y.zipWithIndex.foreach {
            case (Some(v), i) =>
              val pt = (sx(i), sy(v))
              prev.foreach { case (ax, ay) => g.drawLine(ax, ay, pt._1, pt._2) }
              prev = Some(pt)
            case (None, _) => prev = None // gap, like matplotlib NaN breaks
          }
        }
        // legend swatches for multi-series panels
        if (p.series.length > 1) {
          g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
          p.series.zipWithIndex.foreach { case (s, i) =>
            val lx = px + 8
            val ly = py + 8 + i * 16
            g.setColor(s.color)
            g.fillRect(lx, ly, 12, 8)
            g.setColor(AxisColor)
            g.drawString(s.label, lx + 16, ly + 8)
          }
        }
    }
  }

  // pinned locale: f"%,.0f" would group per the host JVM's locale, breaking
  // the cross-deployment determinism the renderer promises (same rule as
  // Reporting.buildReport)
  private def fmt(v: Double): String =
    if (math.abs(v) >= 1000)
      String.format(java.util.Locale.US, "%,.0f", Double.box(v))
    else if (v == math.rint(v))
      String.format(java.util.Locale.US, "%.0f", Double.box(v))
    else String.format(java.util.Locale.US, "%.2f", Double.box(v))

  private def drawCentered(g: Graphics2D, s: String, cx: Int, y: Int): Unit =
    g.drawString(s, cx - g.getFontMetrics.stringWidth(s) / 2, y)

  private def drawRight(g: Graphics2D, s: String, rx: Int, y: Int): Unit =
    g.drawString(s, rx - g.getFontMetrics.stringWidth(s), y)
}
