package graft

/** Single-thread micro-bench for the sorted-merge Jaccard kernels
  * (r17): plain vs bounded (per-step bound check) vs a bound check
  * amortized over a stride of merge steps. The corpus mimics the m100
  * verify workload: ~204-hash sorted arrays with pairwise Jaccard
  * centered near the measured candidate mean (0.28) at t=0.6, plus a
  * qualifying slice near 0.7 so the pass path is represented.
  *
  * The stride variant's soundness is inherited: the bound only gates
  * ENTRY to further merge steps, so checking it less often merely
  * delays an exit — values of kept pairs are computed exactly either
  * way. This drill decides whether the per-step min+compare costs more
  * than the steps it saves.
  *
  * Usage: runMain graft.KernelMicro [nDocs] [pairsPerRound]
  */
object KernelMicro {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val nDocs = if (args.length > 0) args(0).toInt else 2000
    val nPairs = if (args.length > 1) args(1).toInt else 2000000
    val rnd = new java.util.Random(42)
    val k = 204
    // shared vocabulary sized so two random docs overlap at J ~ 0.28:
    // |A∩B| ≈ k²/V, J = i/(2k−i) = 0.28 → i ≈ 89 → V ≈ k²/89 ≈ 470
    val vocab = 470
    val docs = Array.fill(nDocs) {
      val s = scala.collection.mutable.SortedSet[Long]()
      while (s.size < k) s += rnd.nextInt(vocab).toLong * 0x9E3779B97F4A7C15L
      new GenericArrayData(s.toArray)
    }
    val t = 0.6
    import graft.functions.NativeEval
    def round(label: String, f: (GenericArrayData, GenericArrayData) => Double): Unit = {
      var sink = 0.0
      val r2 = new java.util.Random(7)
      val t0 = System.nanoTime()
      var p = 0
      while (p < nPairs) {
        val a = docs(r2.nextInt(nDocs)); val b = docs(r2.nextInt(nDocs))
        sink += f(a, b)
        p += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[kernelmicro] $label%-10s $sec%7.3f s  (${sec / nPairs * 1e9}%.1f ns/pair, sink=$sink%.1f)")
    }
    // JIT warm
    (1 to 2).foreach { _ =>
      round("warm-plain", (a, b) => NativeEval.arrayJaccardSortedLong(a, b))
      round("warm-bnd", (a, b) => NativeEval.arrayJaccardSortedLongBounded(a, b, t))
      round("warm-bnd4", (a, b) => NativeEval.arrayJaccardSortedLongBounded4(a, b, t))
    }
    (1 to 3).foreach { _ =>
      round("plain", (a, b) => NativeEval.arrayJaccardSortedLong(a, b))
      round("bounded", (a, b) => NativeEval.arrayJaccardSortedLongBounded(a, b, t))
      round("bounded4", (a, b) => NativeEval.arrayJaccardSortedLongBounded4(a, b, t))
    }
  }
}
