package graft.tools

import org.apache.spark.sql.catalyst.util.ArrayData

import graft.functions.{Bpe, ExprKernels}

/** Microbenchmark for the native kernels (`runMain graft.tools.KernelBench`):
  * isolates per-call cost of the exact-decimal kernels from Spark plan
  * overheads, so plan-level timings (graft.Explain) can be attributed.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val vecs = Array.fill(1000)(ArrayData.toArrayData(Array.fill(64)(rnd.nextFloat())))
    def time(label: String, reps: Int)(f: Int => Unit): Unit = {
      var i = 0
      while (i < reps) { f(i); i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < reps) { f(i); i += 1 }
      val perCall = (System.nanoTime() - t0) / 1e3 / reps
      println(f"$label%-24s $perCall%10.1f us/call")
    }
    time("decimalDot(64)", 2000)(i => ExprKernels.decimalDot(vecs(i % 1000), vecs((i + 1) % 1000)))
    // the execution-path representation: UnsafeArrayData getFloat is a
    // primitive read, where GenericArrayData (above) unboxes per element —
    // time both so kernel numbers aren't inflated by a harness artifact
    val uvecs = Array.fill(1000)(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.fill(64)(rnd.nextFloat())))
    time("decimalDot(64, unsafe)", 2000)(i => ExprKernels.decimalDot(uvecs(i % 1000), uvecs((i + 1) % 1000)))
    time("doubleDot(64, unsafe)", 20000)(i => ExprKernels.doubleDot(uvecs(i % 1000), uvecs((i + 1) % 1000)))
    time("lshBucket(8)", 1000)(i => ExprKernels.lshBucket(vecs(i % 1000), 8))
    time("lshBucket(32)", 1000)(i => ExprKernels.lshBucket(vecs(i % 1000), 32))

    // text kernels on a ~1 KB 150-token document (the documents-table shape)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val doc = org.apache.spark.unsafe.types.UTF8String.fromString(
      Array.tabulate(150)(i => words(rnd.nextInt(words.length)) + i % 17).mkString(" "))
    time("tokens(150w)", 2000)(_ => ExprKernels.tokens(doc))
    time("shingles3(150w)", 2000)(_ => ExprKernels.shingles3(doc))
    val toks = ExprKernels.tokens(doc)
    time("minHashSigs(k=8)", 500)(_ => ExprKernels.minHashSigs(ExprKernels.shingles3(doc), 8))
    time("simHash(16)", 1000)(_ => ExprKernels.simHash(toks, 16))
    time("bpeTokens(150w, cached)", 2000)(_ => Bpe.bpeTokens(doc))
  }
}
