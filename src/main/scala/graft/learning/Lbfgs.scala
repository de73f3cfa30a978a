package graft.learning

/** Limited-memory BFGS, two-loop recursion (Nocedal & Wright, Algorithm
  * 7.4/7.5) — the reference trainer's default optimizer
  * (`spii::LBFGSSolver`, selected at `learning/simhashtrainer.cpp:184-186`).
  * Kept generic over an objective closure so the solver is testable on
  * classic objectives independently of the SimHash loss, and so the trainer
  * can plug in either the local or the distributed `evaluate`.
  *
  * Line-search acceptance is STRICT DECREASE with backtracking-then-
  * expansion rather than Armijo-with-slope: the SimHash training surface is
  * piecewise-flat in large regions (a bit contributes loss only when its
  * accumulator crosses zero), and the reference's own solvers accept any
  * improving step (`sgdsolver.cpp` ÷100 backoff). On smooth objectives the
  * expansion step recovers well-scaled progress (see the Rosenbrock spec).
  */
object Lbfgs {

  /** @param evals   objective evaluations consumed (the cost unit — one
    *                full pass over the training pair set each)
    * @param iters   accepted iterations
    * @param loss    final objective value */
  final case class Result(x: Array[Double], loss: Double, evals: Int,
      iters: Int)

  /** Minimize `f` (value + gradient) from `x0`.
    *
    * @param stopBelow  stop once the objective drops under this (the
    *                   trainer's `loss < 1` convergence rule,
    *                   `sgdsolver.cpp:58-63`)
    * @param onIteration callback after each accepted iteration (1-based) —
    *                   the trainer's snapshot hook */
  def minimize(f: Array[Double] => (Double, Array[Double]),
      x0: Array[Double], maxIters: Int, m: Int = 10,
      stopBelow: Double = Double.NegativeInfinity,
      firstStepScale: Double = 1.0,
      onIteration: (Int, Array[Double]) => Unit = (_, _) => ()): Result = {
    val n = x0.length
    var evals = 0
    def eval(x: Array[Double]): (Double, Array[Double]) = {
      evals += 1; f(x)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val w = x0.clone()
    var (loss, grad) = eval(w)
    val sHist = scala.collection.mutable.ArrayDeque.empty[Array[Double]]
    val yHist = scala.collection.mutable.ArrayDeque.empty[Array[Double]]
    var iter = 0
    var done = false
    while (!done && iter < maxIters && loss >= stopBelow) {
      // two-loop recursion: q ≈ H·grad from the last m curvature pairs
      val q = grad.clone()
      val k = sHist.length
      val alpha = new Array[Double](k)
      val rho = Array.tabulate(k)(i => 1.0 / dot(yHist(i), sHist(i)))
      var i = k - 1
      while (i >= 0) { // newest -> oldest
        alpha(i) = rho(i) * dot(sHist(i), q)
        var j = 0
        while (j < n) { q(j) -= alpha(i) * yHist(i)(j); j += 1 }
        i -= 1
      }
      val gamma =
        if (k > 0) dot(sHist(k - 1), yHist(k - 1)) / dot(yHist(k - 1), yHist(k - 1))
        else firstStepScale /
          math.max(grad.map(math.abs).max, Double.MinPositiveValue)
      var j = 0
      while (j < n) { q(j) *= gamma; j += 1 }
      i = 0
      while (i < k) { // oldest -> newest
        val beta = rho(i) * dot(yHist(i), q)
        var j2 = 0
        while (j2 < n) { q(j2) += (alpha(i) - beta) * sHist(i)(j2); j2 += 1 }
        i += 1
      }
      val dir = q.map(-_)
      if (!(dot(grad, dir) < 0)) { // curvature gone bad -> scaled restart
        sHist.clear(); yHist.clear()
        var j3 = 0
        while (j3 < n) { dir(j3) = -grad(j3) * gamma; j3 += 1 }
      }
      // backtracking from the unit step, then expansion while improving
      var t = 1.0
      var accepted = false
      var next: Array[Double] = null
      var nl = 0.0
      var ng: Array[Double] = null
      while (!accepted && t > 1.0e-12) {
        next = Array.tabulate(n)(j4 => w(j4) + t * dir(j4))
        val r = eval(next)
        nl = r._1; ng = r._2
        if (!nl.isNaN && nl < loss) accepted = true
        else t *= 0.5
      }
      if (accepted && t == 1.0) {
        var t2 = 2.0
        var improving = true
        while (improving && t2 <= 1024.0) {
          val cand = Array.tabulate(n)(j4 => w(j4) + t2 * dir(j4))
          val r = eval(cand)
          if (!r._1.isNaN && r._1 < nl) {
            next = cand; nl = r._1; ng = r._2; t = t2; t2 *= 2.0
          } else improving = false
        }
      }
      if (!accepted) done = true
      else {
        val s = Array.tabulate(n)(j5 => next(j5) - w(j5))
        val y = Array.tabulate(n)(j5 => ng(j5) - grad(j5))
        if (dot(s, y) > 1.0e-10) { // keep positive curvature only
          sHist.append(s); yHist.append(y)
          if (sHist.length > m) { sHist.removeHead(); yHist.removeHead(); () }
        }
        System.arraycopy(next, 0, w, 0, n)
        loss = nl; grad = ng
      }
      iter += 1
      onIteration(iter, w)
    }
    Result(w, loss, evals, iter)
  }
}
