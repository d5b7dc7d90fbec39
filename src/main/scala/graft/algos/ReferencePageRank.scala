package graft.algos

import graft.PageRankConfig

/** Sequential reference-parity PageRank oracle — NOT the distributed path.
  *
  * The reference's page_rank_iteration
  * (/root/reference/crates/algos/src/page_rank.rs:124-167) hands out node
  * chunks of 16384 to worker threads and updates `scores`/`out_scores` in
  * place, so nodes read already-updated values of lower-id nodes processed
  * earlier in the SAME iteration (chunk-sequential Gauss-Seidel). For graphs
  * with <= 16384 nodes one thread claims the single chunk and the schedule
  * degenerates to a fully deterministic sequential sweep in ascending node
  * id — which is exactly what the pinned-iteration golden vectors encode
  * (crates/algos/src/lib.rs:124-138 stops at max_iterations=10, far from
  * convergence). Beyond one chunk the reference is schedule-dependent by
  * design; the meaningful cross-engine contract is the converged fixed
  * point, where this sweep and the distributed Jacobi iteration agree within
  * the 1e-6 allclose tolerance (north rule: "at convergence").
  *
  * This oracle reproduces the f32 sequential sweep for test parity: golden
  * vectors are asserted against it exactly, and the distributed PageRank is
  * asserted against it at convergence. Driver-side, small graphs only.
  */
object ReferencePageRank {

  def run(
      nodeCount: Int,
      edges: Seq[(Int, Int)],
      config: PageRankConfig = PageRankConfig())
      : (Array[Float], Int, Double) = {
    val n = nodeCount
    val d = config.dampingFactor.toFloat
    val initScore = 1.0f / n
    val baseScore = (1.0f - d) / n

    val outDeg = new Array[Int](n)
    edges.foreach { case (u, _) => outDeg(u) += 1 }
    // in-neighbor lists in edge-insertion order (CSR scatter order)
    val inNbrs = Array.fill(n)(new scala.collection.mutable.ArrayBuffer[Int])
    edges.foreach { case (u, v) => inNbrs(v) += u }

    val scores = Array.fill(n)(initScore)
    val outScores = Array.tabulate(n)(u => initScore / outDeg(u))

    var iteration = 0
    var error = 0.0
    while ({
      error = 0.0
      var u = 0
      while (u < n) {
        var incoming = 0.0f
        inNbrs(u).foreach(v => incoming += outScores(v))
        val old = scores(u)
        val next = baseScore + d * incoming
        scores(u) = next
        error += math.abs((next - old).toDouble)
        outScores(u) = next / outDeg(u)
        u += 1
      }
      iteration += 1
      error >= config.tolerance && iteration < config.maxIterations
    }) ()
    (scores, iteration, error)
  }
}
