package graft.tools
import graft.sources.Multimodal
/** Round-18: does javax codec registry access serialize under concurrency?
  * Decode N images / WAVs on 1 vs 32 threads; linear scaling rules locks out.
  */
object MmProbe3 {
  def main(args: Array[String]): Unit = {
    val n = 8000
    javax.imageio.ImageIO.setUseCache(false)
    val pngs = (0 until n).map(i => Multimodal.pngBytes(i.toLong * 3))
    val wavs = (0 until n).map(i => Multimodal.wavBytes(i.toLong * 3 + 1))
    def decodeImg(p: Array[Byte]): Long = {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(p))
      val rs = javax.imageio.ImageIO.getImageReaders(iis)
      val r = rs.next(); r.setInput(iis); val img = r.read(0); r.dispose(); iis.close()
      img.getWidth.toLong
    }
    def decodeWav(p: Array[Byte]): Long = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(p))
      ais.getFormat.getSampleRate.toLong + ais.getFrameLength
    }
    def bench(label: String, items: Seq[Array[Byte]], f: Array[Byte] => Long, threads: Int): Unit = {
      val t0 = System.nanoTime()
      if (threads == 1) items.foreach(f)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val chunks = items.grouped(items.size / threads + 1).toSeq
        val futs = chunks.map(c => pool.submit(new Runnable { def run(): Unit = c.foreach(f) }))
        futs.foreach(_.get()); pool.shutdown()
      }
      println(f"$label%-22s threads=$threads%2d  ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    import scala.jdk.CollectionConverters._
    val readers = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toArray
    println("SPI AudioFileReaders: " + readers.map(_.getClass.getName).mkString(", "))
    def decodeWavSpi(p: Array[Byte]): Long = {
      var i = 0
      while (i < readers.length) {
        try {
          val ais = readers(i).getAudioInputStream(new java.io.ByteArrayInputStream(p))
          return ais.getFormat.getSampleRate.toLong + ais.getFrameLength
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        i += 1
      }
      -1L
    }
    // warm
    pngs.take(500).foreach(decodeImg); wavs.take(500).foreach(decodeWav)
    wavs.take(500).foreach(decodeWavSpi)
    bench("image decode", pngs, decodeImg, 1)
    bench("image decode", pngs, decodeImg, 32)
    bench("wav decode", wavs, decodeWav, 1)
    bench("wav decode", wavs, decodeWav, 32)
    bench("wav decode spi", wavs, decodeWavSpi, 1)
    bench("wav decode spi", wavs, decodeWavSpi, 32)
    // wave-family readers only, tried in wave-first order
    val waveFirst = readers.filter(_.getClass.getName.contains("Wave")) ++
      readers.filterNot(_.getClass.getName.contains("Wave"))
    def decodeWavFirst(p: Array[Byte]): Long = {
      var i = 0
      while (i < waveFirst.length) {
        try {
          val ais = waveFirst(i).getAudioInputStream(new java.io.ByteArrayInputStream(p))
          return ais.getFormat.getSampleRate.toLong + ais.getFrameLength
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        i += 1
      }
      -1L
    }
    wavs.take(500).foreach(decodeWavFirst)
    bench("wav decode wave-first", wavs, decodeWavFirst, 1)
    bench("wav decode wave-first", wavs, decodeWavFirst, 32)
    // registry-free image path: direct MemoryCacheImageInputStream + cached
    // ImageReaderSpi list (canDecodeInput sniff), fresh reader per row
    val spis = {
      val it = javax.imageio.spi.IIORegistry.getDefaultInstance
        .getServiceProviders(classOf[javax.imageio.spi.ImageReaderSpi], true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[javax.imageio.spi.ImageReaderSpi]
      while (it.hasNext) buf += it.next()
      buf.toArray
    }
    println("ImageReaderSpis: " + spis.map(_.getClass.getSimpleName).mkString(","))
    def decodeImgSpi(p: Array[Byte]): Long = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      var i = 0
      while (i < spis.length) {
        if (spis(i).canDecodeInput(iis)) {
          val r = spis(i).createReaderInstance()
          try { r.setInput(iis); return r.read(0).getWidth.toLong }
          finally { r.dispose(); iis.close() }
        }
        i += 1
      }
      -1L
    }
    pngs.take(500).foreach(decodeImgSpi)
    bench("image decode spi", pngs, decodeImgSpi, 1)
    bench("image decode spi", pngs, decodeImgSpi, 32)
  }
}
