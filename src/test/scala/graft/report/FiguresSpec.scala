package graft.report

import java.nio.file.Files

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Pixel-grain figure rendering (G6 + S10, `pipeline2.py:1023-1116`):
  * the spring layout's force-model properties and determinism, and the
  * three renderers' actual PNG output — decoded back and probed for the
  * marks the reference's figures carry (red significant points, dashed
  * blue thresholds, skyblue nodes, viridis bars). */
class FiguresSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-fig").resolve(name).toString

  private def dist(a: (Double, Double), b: (Double, Double)): Double =
    math.hypot(a._1 - b._1, a._2 - b._2)

  private def hasColor(img: java.awt.image.BufferedImage)
                      (pred: (Int, Int, Int) => Boolean): Boolean = {
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        if (pred((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff))
          return true
        x += 1
      }
      y += 1
    }
    false
  }

  test("springLayout: deterministic per seed, bounded to [-1,1]^2, " +
    "clique members land closer together than isolated nodes") {
    val nodes = Seq("a", "b", "c", "d", "e", "f")
    val clique = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0))
    val p1 = Figures.springLayout(nodes, clique, seed = 42)
    val p2 = Figures.springLayout(nodes, clique, seed = 42)
    assert(p1 == p2, "same seed must reproduce the layout exactly")
    val p3 = Figures.springLayout(nodes, clique, seed = 7)
    assert(p1 != p3, "different seed must move the layout")
    assert(p1.values.forall { case (x, y) =>
      x.abs <= 1.0 + 1e-9 && y.abs <= 1.0 + 1e-9 && !x.isNaN && !y.isNaN })
    val intra = Seq(("a", "b"), ("b", "c"), ("a", "c"))
      .map { case (u, v) => dist(p1(u), p1(v)) }
    val cross = for (u <- Seq("a", "b", "c"); v <- Seq("d", "e", "f"))
      yield dist(p1(u), p1(v))
    assert(intra.sum / intra.size < cross.sum / cross.size,
      s"attraction must pull the clique together: intra=$intra cross=$cross")
    // degenerate sizes
    assert(Figures.springLayout(Nil, Nil).isEmpty)
    assert(Figures.springLayout(Seq("solo"), Nil) ==
      Map("solo" -> ((0.0, 0.0))))
  }

  test("renderVolcano writes a decodable 1000x800 PNG with red " +
    "significant points and the blue dashed thresholds") {
    val path = tmp("volcano.png")
    val pts = Seq((2.5, 8.0, true), (-1.8, 5.0, true), (0.2, 0.5, false),
      (-0.4, 1.2, false), (3.0, Double.PositiveInfinity, true))
    Figures.renderVolcano(pts, pThreshold = 0.05, fcThreshold = 1.0, path)
    val img = ImageIO.read(new java.io.File(path))
    assert(img.getWidth == 1000 && img.getHeight == 800)
    assert(hasColor(img)((r, g, b) => r > 170 && g < 90 && b < 90),
      "no red significant points rendered")
    assert(hasColor(img)((r, g, b) => b > 150 && r < 90 && g < 140),
      "no blue threshold lines rendered")
    assert(hasColor(img)((r, g, b) => r == 255 && g == 255 && b == 255),
      "white background missing")
  }

  test("renderNetwork writes a decodable 1200x1000 PNG with skyblue " +
    "nodes and gray edges") {
    val path = tmp("network.png")
    val nodes = Seq("TP53" -> 0.9, "EGFR" -> 0.6, "BRCA1" -> 0.4,
      "KRAS" -> 0.2)
    val edges = Seq(("TP53", "EGFR", 0.85), ("EGFR", "BRCA1", 0.75),
      ("TP53", "KRAS", 0.72))
    Figures.renderNetwork(nodes, edges, path)
    val img = ImageIO.read(new java.io.File(path))
    assert(img.getWidth == 1200 && img.getHeight == 1000)
    assert(hasColor(img)((r, g, b) =>
      b > 200 && g > 170 && g < 235 && r > 100 && r < 180),
      "no skyblue nodes rendered")
  }

  test("renderBarplot writes a decodable 1200x800 PNG with the " +
    "viridis gradient") {
    val path = tmp("bars.png")
    Figures.renderBarplot(Seq("TP53" -> 0.95, "EGFR" -> 0.7,
      "BRCA1" -> 0.45, "KRAS" -> 0.2), path)
    val img = ImageIO.read(new java.io.File(path))
    assert(img.getWidth == 1200 && img.getHeight == 800)
    // viridis endpoints: dark purple (top row) and bright yellow-green
    assert(hasColor(img)((r, g, b) => r < 90 && g < 40 && b > 70),
      "viridis dark-purple end missing")
    assert(hasColor(img)((r, g, b) => r > 200 && g > 200 && b < 90),
      "viridis yellow end missing")
    // empty input still writes a blank canvas without throwing
    val p2 = tmp("bars_empty.png")
    Figures.renderBarplot(Nil, p2)
    assert(ImageIO.read(new java.io.File(p2)) != null)
  }
}
