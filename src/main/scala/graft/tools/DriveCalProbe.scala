package graft.tools

/** Scratch check: comparability of the 32 MB-buffer copy probe (r11
  * calibrate()) vs the old 256 MB one — both must sit beyond L3 so the
  * clean-window gbps threshold carries over. */
object DriveCalProbe {
  def main(args: Array[String]): Unit = {
    var x = 0x9E3779B97F4A7C15L
    var n = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < 200000000L) {
      var i = 0
      while (i < 1000000) {
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        i += 1
      }
      n += 1000000
    }
    if (x == 42L) println(x)
    val mops = n / ((System.nanoTime() - t0) / 1e9) / 1e6
    def copyProbe(words: Int, reps: Int): Double = {
      val src = new Array[Long](words)
      val dst = new Array[Long](words)
      val t1 = System.nanoTime()
      var r = 0
      while (r < reps) { System.arraycopy(src, 0, dst, 0, words); r += 1 }
      reps * (words * 8.0 * 2 / 1e9) / ((System.nanoTime() - t1) / 1e9)
    }
    copyProbe(4 << 20, 24) // warm the allocator/JIT
    println(f"CHECK mops=$mops%.0f gbps32MB=${copyProbe(4 << 20, 24)}%.1f gbps256MB=${copyProbe(32 << 20, 3)}%.1f")
  }
}
