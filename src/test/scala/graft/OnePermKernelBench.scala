package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Scratch micro-bench (main, not a test): raw kernel throughput of the
  * classic 64-permutation signature vs one-permutation hashing, by
  * document length. Run with
  * `sbt "Test/runMain graft.OnePermKernelBench"`.
  */
object OnePermKernelBench {
  def main(args: Array[String]): Unit = {
    for (nShingles <- Seq(40, 200, 1000, 5000)) {
      val arr = new GenericArrayData(
        (0 until nShingles).map(i => UTF8String.fromString(s"sh_$i a b"))
          .toArray[Any])
      // warm-up
      (1 to 50).foreach { _ =>
        graft.functions.MinHashKernel.eval(arr)
        graft.functions.OnePermKernel.eval(arr)
      }
      def time(f: => Unit, reps: Int): Double = {
        val t0 = System.nanoTime(); (1 to reps).foreach(_ => f)
        (System.nanoTime() - t0) / 1e6 / reps
      }
      val reps = math.max(20, 20000 / nShingles)
      val mh = time(graft.functions.MinHashKernel.eval(arr), reps)
      val op = time(graft.functions.OnePermKernel.eval(arr), reps)
      println(f"shingles=$nShingles%5d  minhash=$mh%8.3f ms  " +
        f"oneperm=$op%8.3f ms  speedup=${mh / op}%5.2fx")
    }
  }
}
