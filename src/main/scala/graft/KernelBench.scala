package graft

/** Standalone micro-bench for the m11/m12 per-task kernels (no Spark):
  * synthesize, WAV-encode, decode, and run the energy / pitch kernels
  * over the same sample volume sf0.1 carries, printing per-phase
  * nanoseconds — tells which part of the 57–66 s of mapPartitions task
  * time is synthesis, codec, or detector. Diagnostic tooling only.
  */
object KernelBench {
  private val WavFrame = 256

  def main(args: Array[String]): Unit = {
    val nDocs = 5000
    val texts = (0 until nDocs).map(i => s"synthetic document text $i " * 8)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm
    run(texts.take(500), silent = true)
    run(texts.take(500), silent = true)
    run(texts, silent = false)
    // 32-thread contention probe: same volume split across threads —
    // if wall ≈ single-thread wall, the codec path serializes on a lock
    timed("encode+decode x32thr") {
      val slices = texts.grouped(math.max(1, texts.size / 32)).toSeq
      val threads = slices.map { sl =>
        val t = new Thread { override def run(): Unit =
          sl.zipWithIndex.foreach { case (text, id0) =>
            val id = id0.toLong
            val n = ((id % 4 + 1) * 512).toInt
            val cps = text.codePoints().toArray
            val samples = Array.tabulate(n) { i =>
              if ((i / WavFrame) % 3 == 0) 0.toShort
              else {
                val cp = if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff
                ((cp * 257 + i * 31) % 65536 - 32768).toShort
              }
            }
            val e = graft.ext.Multimodal.WavCodec.encodePcm(samples)
            val d = graft.ext.Multimodal.WavCodec.decodePcm(e)
            if (d.length != samples.length) sys.error("mismatch")
          }
        }
        t.start(); t
      }
      threads.foreach(_.join())
    }
    def run(ts: Seq[String], silent: Boolean): Unit = {
      def t[T](l: String)(f: => T): T =
        if (silent) f else timed(l)(f)
      val synth = t("synthesize") {
        ts.zipWithIndex.map { case (text, id0) =>
          val id = id0.toLong
          val n = ((id % 4 + 1) * 512).toInt
          val cps = text.codePoints().toArray
          val samples = Array.tabulate(n) { i =>
            if ((i / WavFrame) % 3 == 0) 0.toShort
            else {
              val cp = if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff
              ((cp * 257 + i * 31) % 65536 - 32768).toShort
            }
          }
          samples
        }
      }
      val encoded = t("encode") {
        synth.map(graft.ext.Multimodal.WavCodec.encodePcm)
      }
      val decoded = t("decode") {
        encoded.map(graft.ext.Multimodal.WavCodec.decodePcm)
      }
      t("energy kernel") {
        decoded.map { s =>
          var (sumAbs, peak, nSilent) = (0L, 0L, 0L)
          var f = 0
          while (f < s.length / WavFrame) {
            var fs = 0L
            var i = f * WavFrame
            while (i < (f + 1) * WavFrame) {
              val a = math.abs(s(i).toLong)
              fs += a
              if (a > peak) peak = a
              i += 1
            }
            if (fs < 100L * WavFrame) nSilent += 1
            sumAbs += fs
            f += 1
          }
          (sumAbs, peak, nSilent)
        }.length
      }
      t("pitch kernel") {
        decoded.map { s =>
          val nFrames = s.length / WavFrame
          var acc = 0L
          var f = 0
          while (f < nFrames) {
            val base = f * WavFrame
            var bestLag = 0L
            var bestR = Long.MinValue
            var peak = 0L
            var lag = 1
            while (lag <= 32) {
              var r = 0L
              var i = 0
              while (i < WavFrame) {
                val a = s(base + i).toLong
                val b = s(base + (i + lag) % WavFrame).toLong
                r += a * b
                if (lag == 1 && math.abs(a) > peak) peak = math.abs(a)
                i += 1
              }
              if (r > bestR) { bestR = r; bestLag = lag.toLong }
              lag += 1
            }
            acc += bestLag + peak
            f += 1
          }
          acc
        }.sum
      }
      ()
    }
  }
}
