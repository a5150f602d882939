package graft

/** Throwaway micro-bench for m11 stage costs (not a test; r13 scratch). */
object ScratchM11 {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    val nDocs = 100000
    val threads = args.headOption.map(_.toInt).getOrElse(32)
    def timed(label: String)(work: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      val ths = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = t
          while (i < nDocs) { work(i); i += threads }
        })
        th.start(); th
      }
      ths.foreach(_.join())
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($threads threads)")
    }
    // warmup
    (0 until 2000).foreach { i =>
      val wav = Multimodal.wavPcm16(Multimodal.audioSamples(i >> 1, 1 + (i % 2), 3 * (i % 2)), 8000)
      Multimodal.audioSig(Multimodal.decodeWav(wav)._2)
    }
    timed("synth only") { i =>
      Multimodal.audioSamples(i >> 1, 1 + (i % 2), 3 * (i % 2)); ()
    }
    timed("synth+encode") { i =>
      Multimodal.wavPcm16(Multimodal.audioSamples(i >> 1, 1 + (i % 2), 3 * (i % 2)), 8000); ()
    }
    timed("synth+encode+decode") { i =>
      val wav = Multimodal.wavPcm16(Multimodal.audioSamples(i >> 1, 1 + (i % 2), 3 * (i % 2)), 8000)
      Multimodal.decodeWav(wav); ()
    }
    timed("full (incl audioSig)") { i =>
      val wav = Multimodal.wavPcm16(Multimodal.audioSamples(i >> 1, 1 + (i % 2), 3 * (i % 2)), 8000)
      Multimodal.audioSig(Multimodal.decodeWav(wav)._2); ()
    }
  }
}
