package graft.mm

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import javax.imageio.ImageIO

/** Generator for the committed `tiny_video.avi` fixture: a structurally
  * honest MJPEG-in-AVI file — RIFF(`AVI `) with a full `hdrl` (avih +
  * strl/strh/strf) and a `movi` list of three `00dc` JPEG frames
  * (solid red, green, blue at 8×6) — built from the public RIFF/AVI
  * layout in plain byte arithmetic, frames encoded by javax.imageio.
  *
  * Run `sbt 'Test/runMain graft.mm.MjpegAviFixture'` to regenerate
  * `src/test/resources/tiny_video.avi`; MultimodalSpec decodes the
  * committed bytes (not this generator's output) so the fixture is
  * pinned independently of ImageIO encoder drift.
  */
object MjpegAviFixture {
  val W = 8
  val H = 6
  val FrameColors: Seq[(Int, Int, Int)] =
    Seq((255, 0, 0), (0, 255, 0), (0, 0, 255))

  def jpegFrame(rgb: (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val px = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
    for (y <- 0 until H; x <- 0 until W) img.setRGB(x, y, px)
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "jpg", bos), "no JPEG writer on this JDK")
    bos.toByteArray
  }

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4); s.getBytes(US_ASCII)
  }

  /** RIFF chunk: id + size + payload + pad byte if odd. */
  def chunk(id: String, payload: Array[Byte]): Array[Byte] =
    fcc(id) ++ u32le(payload.length.toLong) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  /** LIST chunk: `LIST` + size + listType + body. */
  def list(typ: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fcc(typ) ++ body)

  def build(): Array[Byte] = {
    val frames = FrameColors.map(jpegFrame)
    val maxFrame = frames.map(_.length).max
    // avih: MainAVIHeader (56 bytes) — 10 fps, 3 frames, 1 stream
    val avih = chunk("avih",
      u32le(100000L) ++ u32le(0L) ++ u32le(0L) ++ u32le(0L) ++
        u32le(frames.size.toLong) ++ u32le(0L) ++ u32le(1L) ++
        u32le(maxFrame.toLong) ++ u32le(W.toLong) ++ u32le(H.toLong) ++
        Array.fill(16)(0.toByte))
    // strh: AVIStreamHeader (56 bytes) — vids/MJPG, rate 10/scale 1
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ u32le(0L) ++ u16le(0) ++ u16le(0) ++
        u32le(0L) ++ u32le(1L) ++ u32le(10L) ++ u32le(0L) ++
        u32le(frames.size.toLong) ++ u32le(maxFrame.toLong) ++
        u32le(10000L) ++ u32le(0L) ++
        u16le(0) ++ u16le(0) ++ u16le(W) ++ u16le(H))
    // strf: BITMAPINFOHEADER (40 bytes) — 24-bit MJPG
    val strf = chunk("strf",
      u32le(40L) ++ u32le(W.toLong) ++ u32le(H.toLong) ++ u16le(1) ++
        u16le(24) ++ fcc("MJPG") ++ u32le((W * H * 3).toLong) ++
        u32le(0L) ++ u32le(0L) ++ u32le(0L) ++ u32le(0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val riffBody = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ u32le(riffBody.length.toLong) ++ riffBody
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get("src/test/resources/tiny_video.avi")
    java.nio.file.Files.write(out, build())
    println(s"wrote $out (${build().length} bytes, " +
      s"${FrameColors.size} MJPEG frames at ${W}x$H)")
  }
}
