package graft.tools

/** Micro-probe for the image kernel (no Spark): encode / decode / dHash
  * per-op cost over N synthetic images, isolating javax.imageio overhead
  * from the Spark plumbing when the l10/l67 timings need explaining.
  *
  * Usage: ImgProf [n]
  */
object ImgProf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    import graft.functions.ImageOps
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      var bytes = 0L
      var i = 0L
      while (i < n) { bytes += ImageOps.neardupPng(i).length; i += 1 }
      val tEnc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      i = 0
      var px = 0L
      while (i < n) {
        val img = ImageOps.decode(ImageOps.neardupPng(i))
        px += img.getWidth * img.getHeight
        i += 1
      }
      val tEncDec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      i = 0
      var h = 0L
      while (i < n) {
        val (hi, lo) = ImageOps.dHash(ImageOps.decode(ImageOps.neardupPng(i)))
        h ^= hi ^ lo
        i += 1
      }
      val tAll = (System.nanoTime() - t0) / 1e9
      println(f"rep$rep n=$n enc=${tEnc * 1e6 / n}%.1f us/img " +
        f"enc+dec=${tEncDec * 1e6 / n}%.1f us/img " +
        f"enc+dec+hash=${tAll * 1e6 / n}%.1f us/img " +
        f"(bytes=$bytes px=$px h=$h)")
    }
    // multi-threaded arm: javax.imageio SPI lookups go through the shared
    // IIORegistry — if those serialize, executor threads stall in lock
    // convoys the single-thread numbers never show
    for (threads <- Seq(8, 32)) {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = t.toLong * n
          val end = i + n
          var acc = 0L
          while (i < end) {
            val (hi, lo) = ImageOps.dHash(ImageOps.decode(ImageOps.neardupPng(i)))
            acc ^= hi ^ lo
            i += 1
          }
          if (acc == 42L) println("") // keep acc live
        })
        th.start(); th
      }
      ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads total=${threads.toLong * n} " +
        f"wall=$dt%.2f s per-img-per-thread=${dt * 1e6 * threads / (threads.toLong * n)}%.1f us")
    }
  }
}
