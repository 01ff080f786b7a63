package graft.util

/** Locale-pinned numeric formatting for machine-parsed output.
  *
  * Scala's `f"$v%.3f"` interpolator formats with the JVM default
  * locale; on a comma-decimal locale that turns JSON artifacts
  * (Bench/NearlineSoak/recall sweeps) into invalid JSON and — worse —
  * breaks the JL hyperplane SQL literals in
  * [[graft.similarity.VectorFunctions]], whose 3-decimal rendering is
  * part of the engine/oracle bit-parity contract. Every machine-read
  * number formats through here instead.
  */
object Fmt {

  /** `v` at `decimals` fraction digits, always '.'-separated. */
  def fixed(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
}
