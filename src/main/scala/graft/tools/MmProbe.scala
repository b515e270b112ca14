package graft.tools
import graft.sources.Multimodal
/** Round-18 micro-probe: per-row cost split of the mm decode path —
  * PNG synthesis vs format sniff vs ImageIO.read vs pixel fold — to decide
  * whether the double-parse in decodeFeatures is worth removing.
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val n = 15000
    val ids = (0 until n).map(_.toLong * 3) // image kind (id % 3 == 0 → image? kind cycles)
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s  (${(System.nanoTime() - t0) / 1e3 / n}%6.1f us/row)")
    }
    // warm
    (0 until 2000).foreach(i => Multimodal.pngBytes(i.toLong))
    val payloads = ids.map(Multimodal.pngBytes)
    time("pngBytes synth")(ids.foreach(Multimodal.pngBytes))
    javax.imageio.ImageIO.setUseCache(false)
    time("sniff (getImageReaders)")(payloads.foreach { p =>
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(p))
      val rs = javax.imageio.ImageIO.getImageReaders(iis)
      if (rs.hasNext) rs.next().getFormatName.toLowerCase
    })
    time("ImageIO.read")(payloads.foreach { p =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    })
    val imgs = payloads.map(p => javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
    time("per-pixel getRGB fold")(imgs.foreach { img =>
      val w = img.getWidth; val h = img.getHeight
      val acc = new Array[Float](8)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { acc((y*w+x)%8) += (img.getRGB(x,y)&0xff)/255.0f; x+=1 }; y+=1 }
    })
    time("bulk getRGB fold")(imgs.foreach { img =>
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val acc = new Array[Float](8)
      var i = 0
      while (i < px.length) { acc(i%8) += (px(i)&0xff)/255.0f; i+=1 }
    })
    time("single reader parse+fmt")(payloads.foreach { p =>
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(p))
      val rs = javax.imageio.ImageIO.getImageReaders(iis)
      if (rs.hasNext) {
        val r = rs.next(); r.setInput(iis)
        val fmt = r.getFormatName.toLowerCase
        val img = r.read(0)
        r.dispose(); iis.close()
        val _ = (fmt, img.getWidth)
      }
    })
  }
}
