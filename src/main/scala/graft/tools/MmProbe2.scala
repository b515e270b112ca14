package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Round-18: attribute mm1's 32-task decode stage — rows and wall per kind,
  * synth-only vs synth+decode, on one thread.
  */
object MmProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Multimodal
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "n_chars").collect()
    println(s"docs: ${docs.length}")
    for (kind <- Seq("image", "audio", "video")) {
      val ids = docs.map(_.getLong(0)).filter(id => (id % 3) == (kind match {
        case "image" => 0; case "audio" => 1; case _ => 2 }))
      // NOTE kind = element_at(array(image,audio,video), id%3+1) → id%3==0 → image
      val t0 = System.nanoTime()
      val payloads = ids.map { id => kind match {
        case "image" => Multimodal.pngBytes(id)
        case "audio" => Multimodal.wavBytes(id)
        case _ => Multimodal.mp4Bytes(id) } }
      val t1 = System.nanoTime()
      javax.imageio.ImageIO.setUseCache(false)
      var folded = 0L
      payloads.foreach { p => kind match {
        case "image" =>
          val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(p))
          val rs = javax.imageio.ImageIO.getImageReaders(iis)
          if (rs.hasNext) { val r = rs.next(); r.setInput(iis); val img = r.read(0); r.dispose(); iis.close()
            val px = img.getRGB(0,0,img.getWidth,img.getHeight,null,0,img.getWidth)
            var i=0; while(i<px.length){folded+=px(i)&0xff;i+=1} }
        case "audio" =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(p))
          val f = ais.getFormat; folded += f.getSampleRate.toInt + ais.getFrameLength
          val bb = java.nio.ByteBuffer.wrap(p,44,p.length-44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          while (bb.remaining()>=2) folded += math.abs(bb.getShort.toInt)
        case _ =>
          Multimodal.Mp4.parse(p).foreach { info =>
            var i=0; while(i<info.mdatLen){folded+=p(info.mdatOff+i)&0xff;i+=1} }
      } }
      val t2 = System.nanoTime()
      println(f"$kind%-6s n=${ids.length}%6d  synth=${(t1-t0)/1e9}%6.3f s (${(t1-t0)/1e3/math.max(1,ids.length)}%7.1f us/row)  decode=${(t2-t1)/1e9}%6.3f s (${(t2-t1)/1e3/math.max(1,ids.length)}%7.1f us/row)  [$folded]")
    }
    spark.stop()
  }
}
