package graft.jobs

import org.apache.spark.sql.SparkSession

/** Generic distributed summation — the Spark analog of the reference's
  * DistSum machine-allocation framework
  * (hadoop-mapreduce-examples/.../examples/pi/DistSum.java:1,
  * pi/math/Summation.java:28, pi/math/ArithmeticProgression.java):
  * Σ (2^e mod n)/n over paired arithmetic progressions (n, e) advancing
  * in lockstep, accumulated mod 1 — the building block DistBbp uses to
  * compute far-out bits of π. The reference spends ~700 LoC scheduling
  * map-side vs reduce-side summation jobs across machines and resuming
  * from previously-computed parts; here a partitioned summation IS a
  * dataset of its parts — one task per part, no shuffle, the same
  * sequential kernel — and the driver folds the ≤`parts` partial values
  * in part order (the reference's combine over sorted results,
  * Summation.java:165), so the result is independent of cluster layout
  * and retry history. [[remaining]] is the resume path
  * (Summation.remainingTerms, Summation.java:183).
  */
object DistSum {

  /** `value, value+delta, …` for [[Progression.steps]] terms — the
    * half-open mirror of ArithmeticProgression (delta may be negative;
    * `limit` is exclusive and must be `value + delta·steps`).
    */
  final case class Progression(value: Long, delta: Long, limit: Long) {
    require(delta != 0 && (limit - value) % delta == 0 && (limit - value) / delta >= 0,
      s"limit must be value + delta*k, k >= 0: $this")
    def steps: Long = (limit - value) / delta
    def skip(k: Long): Long = value + delta * k
  }

  /** Σ_{i=0}^{steps-1} (2^{e_i} mod n_i)/n_i (mod 1). */
  final case class Summation(n: Progression, e: Progression) {
    require(n.steps == e.steps, s"n and e must have the same step count: $this")
    // modPow with a negative exponent computes a modular INVERSE (or
    // throws for a non-invertible base), not the tiny real 2^e/n the
    // series means — reject the domain the kernel can't represent.
    // Progressions are monotone, so endpoint checks cover every term.
    require(e.steps == 0 ||
      (math.min(n.value, n.skip(n.steps - 1)) >= 1 &&
        math.min(e.value, e.skip(e.steps - 1)) >= 0),
      s"terms need modulus n >= 1 and exponent e >= 0 over the whole range: $this")
    def steps: Long = e.steps

    /** The sequential kernel (Summation.compute_modular,
      * Summation.java:131): per-term modular exponentiation, fractional
      * accumulation. One part of a 10^15-term summation runs this loop;
      * nothing is materialized.
      */
    def compute(): Double = {
      var s = 0.0
      var nn = n.value
      var ee = e.value
      var i = 0L
      val st = steps
      while (i < st) {
        s += BigInt(2).modPow(ee, nn).toDouble / nn.toDouble
        s -= math.floor(s)
        nn += n.delta
        ee += e.delta
        i += 1
      }
      s
    }

    /** Contiguous proportional split (Summation.partition,
      * Summation.java:217): part i covers steps [i·steps/nParts,
      * (i+1)·steps/nParts). Empty parts are dropped.
      */
    def partition(nParts: Int): Seq[Summation] = {
      require(nParts >= 1, "nParts must be >= 1")
      val st = steps
      (0 until nParts).flatMap { i =>
        val a = i * st / nParts
        val b = (i + 1) * st / nParts
        if (b > a) Some(slice(this, a, b)) else None
      }
    }
  }

  private def slice(t: Summation, a: Long, b: Long): Summation = Summation(
    Progression(t.n.skip(a), t.n.delta, t.n.skip(b)),
    Progression(t.e.skip(a), t.e.delta, t.e.skip(b)))

  /** x + y mod 1 (Modular.addMod). */
  def addMod(x: Double, y: Double): Double = {
    val s = x + y
    s - math.floor(s)
  }

  /** Distributed evaluation: one task per part, partials folded at the
    * driver in part order — a bounded `parts`-element collect, never
    * data rows. Deterministic for a fixed `parts` regardless of
    * executor count or retries.
    */
  def compute(spark: SparkSession, sum: Summation, parts: Int): Double = {
    import spark.implicits._
    val subs = sum.partition(parts).zipWithIndex
    if (subs.isEmpty) return 0.0 // zero-step summation: nothing to schedule
    val partials = spark.createDataset(subs)
      .repartition(subs.size)
      .map { case (s, i) => (i, s.compute()) }
      .collect().sortBy(_._1)
    partials.foldLeft(0.0)((acc, p) => addMod(acc, p._2))
  }

  /** The sub-summations of `total` not covered by `done` — DistSum's
    * resume-from-checkpoint path: re-running after a partial failure
    * schedules only the gaps. `done` parts must be disjoint
    * sub-summations of `total` on the same deltas.
    */
  def remaining(total: Summation, done: Seq[Summation]): Seq[Summation] = {
    def pos(s: Summation): Long = {
      require(s.n.delta == total.n.delta && s.e.delta == total.e.delta &&
        (s.e.value - total.e.value) % total.e.delta == 0,
        s"not a sub-summation of $total: $s")
      val p = (s.e.value - total.e.value) / total.e.delta
      // BOTH progressions must sit at the same step offset — an
      // e-aligned part with a shifted n would pass a one-sided check
      // and silently corrupt the resumed total
      require(s.n.value == total.n.skip(p),
        s"n-progression misaligned with e-position $p of $total: $s")
      p
    }
    val out = scala.collection.mutable.Buffer[Summation]()
    var cur = 0L
    for (d <- done.sortBy(pos)) {
      val p = pos(d)
      require(p >= cur && p + d.steps <= total.steps,
        s"done parts must be disjoint and contained: $d")
      if (p > cur) out += slice(total, cur, p)
      cur = p + d.steps
    }
    if (cur < total.steps) out += slice(total, cur, total.steps)
    out.toSeq
  }
}
