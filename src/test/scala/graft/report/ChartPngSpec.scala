package graft.report

import java.awt.Color
import javax.imageio.ImageIO

import graft.SparkSpec

/** The PNG render is asserted on GEOMETRY (dimensions, axis/grid/series
  * pixels, bar signs), never on text glyphs — font rasterization is the one
  * platform-dependent part of a JDK-only renderer. */
class ChartPngSpec extends SparkSpec {

  private def rgb(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
    img.getRGB(x, y) & 0xFFFFFF

  test("trend PNG renders end-to-end from daily metrics with exact dimensions") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_chart/trend.png"
    val path = Reporting.renderTrendPng(spark, sfDir, out, days = 30)
    val img = ImageIO.read(new java.io.File(path))
    assert(img.getWidth == 1500 && img.getHeight == 1000)
    // background is white at the corners
    assert(rgb(img, 0, 0) == 0xFFFFFF && rgb(img, 1499, 999) == 0xFFFFFF)
    // four panels → four x-axis lines; sample one pixel on each panel's
    // x axis: panel inner rect = (x0+80 .. x0+750-24, y0+30 .. y0+ph-44)
    val top = 36; val pw = 750; val ph = (1000 - top) / 2
    for (r <- 0 to 1; c <- 0 to 1) {
      val x0 = c * pw; val y0 = top + r * ph
      val axisY = y0 + 30 + (ph - 30 - 44) - 1
      val mid = x0 + 80 + (pw - 80 - 24) / 2
      assert(rgb(img, mid, axisY) != 0xFFFFFF,
        s"panel ($r,$c): x-axis row at y=$axisY must be drawn")
    }
  }

  test("render is deterministic: identical bytes across two runs") {
    val tmp = sys.props("java.io.tmpdir")
    val p = ChartPng.Panel("t", Seq("a", "b", "c"), Seq(
      ChartPng.Series("s", Seq(Some(1.0), Some(3.0), Some(2.0)), Color.BLUE)))
    val f1 = ChartPng.render("T", Seq(p, p, p, p), s"$tmp/graft_chart/d1.png")
    val f2 = ChartPng.render("T", Seq(p, p, p, p), s"$tmp/graft_chart/d2.png")
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f1))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f2))
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("bar panel colors by sign around the zero baseline") {
    val tmp = sys.props("java.io.tmpdir")
    val p = ChartPng.Panel("bars", Seq("a", "b"), Seq(
      ChartPng.Series("v", Seq(Some(5.0), Some(-5.0)), Color.BLACK)),
      kind = ChartPng.BarKind)
    val path = ChartPng.render("B", Seq(p), s"$tmp/graft_chart/bars.png", 400, 300)
    val img = ImageIO.read(new java.io.File(path))
    val px = Iterator.tabulate(img.getWidth * img.getHeight) { i =>
      rgb(img, i % img.getWidth, i / img.getWidth)
    }.toSet
    val pos = (ChartPng.PosBar.getRGB & 0xFFFFFF)
    val neg = (ChartPng.NegBar.getRGB & 0xFFFFFF)
    assert(px.contains(pos), "positive bar color present")
    assert(px.contains(neg), "negative bar color present")
  }

  test("gaps (None) break the line instead of interpolating across") {
    val tmp = sys.props("java.io.tmpdir")
    // three points, middle missing: with a gap the midpoint column has no
    // blue; interpolation across would paint it
    val p = ChartPng.Panel("gap", Seq("a", "b", "c"), Seq(
      ChartPng.Series("s", Seq(Some(1.0), None, Some(1.0)), Color.BLUE)))
    val path = ChartPng.render("G", Seq(p), s"$tmp/graft_chart/gap.png", 400, 300)
    val img = ImageIO.read(new java.io.File(path))
    val blue = Color.BLUE.getRGB & 0xFFFFFF
    val found = (0 until img.getHeight).exists { y =>
      (0 until img.getWidth).exists { x =>
        rgb(img, x, y) == blue && math.abs(x - img.getWidth / 2) < 20
      }
    }
    assert(!found, "no series pixels near the missing midpoint")
  }
}
