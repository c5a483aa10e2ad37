package graft.similarity

/** One-sided Jacobi SVD for the small dense matrices OPQ training needs
  * (d×d with d ≈ 64 — microseconds on the driver). No linear-algebra
  * dependency exists in the build, and the classic one-sided Jacobi is a
  * page of code with the property that matters here: DETERMINISTIC — fixed
  * (p,q) sweep order, no pivot randomization — so [[Pq.trainOpq]] trains
  * bit-identically across runs.
  *
  * Algorithm: orthogonalize the COLUMNS of G = A·V by Jacobi plane
  * rotations (accumulating V); at convergence G's columns are U·S, so
  * `u(:,j) = g(:,j)/‖g(:,j)‖`, giving A = U·S·Vᵀ. Rotation math per
  * Golub & Van Loan §8.6 / Demmel-Veselić.
  */
private[graft] object Svd {

  /** Returns (U, V) with A = U·S·Vᵀ, both row-major d×d and both FULLY
    * orthogonal even when A is rank-deficient: a numerically-zero singular
    * value leaves its U column undetermined by the data, and those columns
    * are completed to an orthonormal basis by deterministic Gram-Schmidt
    * over the coordinate axes (lowest-index axis first). Rank-deficient
    * inputs are ROUTINE for the Procrustes caller — a corpus whose planted
    * mixing collapses directions (any singular circulant does) yields a
    * rank-deficient correlation, and the degenerate directions genuinely
    * don't matter to the objective, so ANY orthogonal completion is
    * optimal; ours is just reproducible. None only for an all-zero A.
    */
  def decompose(a: Array[Array[Double]]): Option[(Array[Array[Double]], Array[Array[Double]])] = {
    val d = a.length
    // g worked on column-major for cache-friendly column rotations
    val g = Array.tabulate(d, d)((c, r) => a(r)(c)) // g(c)(r) = column c
    val v = Array.tabulate(d, d)((c, r) => if (c == r) 1.0 else 0.0) // columns of V
    val eps = 1e-12
    var sweep = 0
    var rotated = true
    while (rotated && sweep < 60) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val gp = g(p); val gq = g(q)
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < d) {
            app += gp(i) * gp(i); aqq += gq(i) * gq(i); apq += gp(i) * gq(i)
            i += 1
          }
          if (math.abs(apq) > eps * math.sqrt(app * aqq) && apq != 0.0) {
            rotated = true
            val tau = (aqq - app) / (2.0 * apq)
            // tau == 0 (equal column norms, nonzero apq) needs the 45°
            // rotation t = 1: signum(0) = 0 would yield an identity rotation
            // that never reduces the off-diagonal, spinning to the sweep cap
            // on exactly-symmetric inputs
            val t =
              if (tau == 0.0) 1.0
              else math.signum(tau) / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            val vp = v(p); val vq = v(q)
            i = 0
            while (i < d) {
              val g1 = gp(i); val g2 = gq(i)
              gp(i) = c * g1 - s * g2; gq(i) = s * g1 + c * g2
              val v1 = vp(i); val v2 = vq(i)
              vp(i) = c * v1 - s * v2; vq(i) = s * v1 + c * v2
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // U columns = normalized G columns; a numerically-zero column (relative
    // to the largest singular value) is completed afterwards
    val norms = Array.tabulate(d) { c =>
      var acc = 0.0
      var i = 0
      while (i < d) { acc += g(c)(i) * g(c)(i); i += 1 }
      math.sqrt(acc)
    }
    val svMax = norms.max
    if (svMax < 1e-300) return None // all-zero input: no factorization to give
    val tol = 1e-12 * svMax
    val u = Array.fill(d, d)(0.0) // row-major
    val vOut = Array.fill(d, d)(0.0)
    val degenerate = scala.collection.mutable.ArrayBuffer.empty[Int]
    var c = 0
    while (c < d) {
      if (norms(c) > tol) {
        var i = 0
        while (i < d) { u(i)(c) = g(c)(i) / norms(c); i += 1 }
      } else degenerate += c
      var i = 0
      while (i < d) { vOut(i)(c) = v(c)(i); i += 1 }
      c += 1
    }
    // complete degenerate U columns: Gram-Schmidt the coordinate axes (in
    // index order — deterministic) against every column placed so far
    val placed = scala.collection.mutable.ArrayBuffer.empty[Int] ++
      (0 until d).filter(norms(_) > tol)
    degenerate.foreach { dc =>
      var axis = 0
      var done = false
      while (axis < d && !done) {
        val cand = new Array[Double](d)
        cand(axis) = 1.0
        placed.foreach { pc =>
          var dot = 0.0
          var i = 0
          while (i < d) { dot += cand(i) * u(i)(pc); i += 1 }
          i = 0
          while (i < d) { cand(i) -= dot * u(i)(pc); i += 1 }
        }
        var nrm = 0.0
        var i = 0
        while (i < d) { nrm += cand(i) * cand(i); i += 1 }
        nrm = math.sqrt(nrm)
        if (nrm > 1e-6) {
          i = 0
          while (i < d) { u(i)(dc) = cand(i) / nrm; i += 1 }
          placed += dc
          done = true
        }
        axis += 1
      }
      if (!done) return None // cannot happen for < d placed columns, but be safe
    }
    Some((u, vOut))
  }
}
