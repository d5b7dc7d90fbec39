package graft

import graft.algos.Wcc
import graft.graph.LinkGraph
import scala.util.Random

/** Seeded-generative invariants: each property runs over several random
  * instances with fixed seeds (deterministic CI) and checks against a
  * brute-force in-memory oracle — the breadth complement to the
  * single-fixture specs (SURVEY.md §5.2-2 style, extended in round 4 to the
  * dedup pipeline and the stream-replay contract).
  */
class GenerativeSpec extends SparkSpec {

  /** Random corpus: `n` docs over a tiny vocabulary, with duplicate TEXTS
    * injected under whitespace/case noise (the normalization classes
    * Dedup.exact must collapse). doc_ids are non-contiguous to catch
    * dense-id assumptions.
    */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def sentence() =
      Seq.fill(3 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val bases = Vector.fill(math.max(2, n / 3))(sentence())
    (0 until n).map { i =>
      val base = bases(rnd.nextInt(bases.size))
      val noisy = rnd.nextInt(3) match {
        case 0 => base
        case 1 => base.toUpperCase
        case 2 => base.replace(" ", "  ") // collapses under \s+ -> " "
      }
      (i.toLong * 7 + rnd.nextInt(3), noisy) // sparse, slightly shuffled ids
    }.distinctBy(_._1)
  }

  private def normalize(text: String): String =
    text.replaceAll("\\s+", " ").toLowerCase

  test("exact dedup == brute-force min-per-normalized-text (5 seeds)") {
    val s = spark
    import s.implicits._
    for (seed <- 1L to 5L) {
      val docs = corpus(seed, 120)
      val want = {
        val byText = docs.groupBy(d => normalize(d._2))
        docs.map { case (id, t) =>
          val grp = byText(normalize(t)).map(_._1)
          (id, grp.min, grp.size.toLong)
        }.toSet
      }
      val got = graft.dedup.Dedup.exact(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("staged stream replay + recanonicalize == batch exact (5 seeds x " +
      "batch counts)") {
    val s = spark
    import s.implicits._
    for (seed <- 1L to 5L; numBatches <- Seq(2, 3, 5)) {
      val docs = corpus(seed * 31 + numBatches, 90)
      val df = docs.toDF("doc_id", "text")
      val fixed = graft.streaming.StreamingDedup
        .recanonicalize(graft.streaming.StreamingDedup
          .stagedArrivalOrder(df, numBatches))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap
      val batch = graft.dedup.Dedup.exact(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fixed.keySet == batch.keySet, s"seed=$seed b=$numBatches")
      batch.foreach { case (d, c) =>
        assert(fixed(d) == ((c, d != c)),
          s"seed=$seed b=$numBatches doc=$d: ${fixed(d)} vs canonical $c")
      }
    }
  }

  test("dupGroups invariants: min-member labels, pair containment, sizes " +
      "(3 seeds)") {
    val s = spark
    import s.implicits._
    for (seed <- 1L to 3L) {
      val docs = corpus(seed * 101, 100)
      val df = docs.toDF("doc_id", "text")
      val groups = graft.dedup.Dedup.dupGroups(df, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val byDoc = groups.map(g => g._1 -> g._2).toMap
      // output is total over the corpus
      assert(byDoc.keySet == docs.map(_._1).toSet, s"seed=$seed")
      // group id = MIN member id of its group (the Wcc/Scc label contract)
      groups.groupBy(_._2).foreach { case (gid, members) =>
        assert(members.map(_._1).min == gid, s"seed=$seed group $gid")
        // every member reports the group's size
        assert(members.forall(_._3 == members.length),
          s"seed=$seed group $gid sizes")
      }
      // every verified LSH pair must land in one group (closure soundness)
      graft.dedup.Dedup.minHashLsh(df, 0.5).collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(byDoc(a) == byDoc(b), s"seed=$seed pair ($a,$b) split")
      }
    }
  }

  test("WCC auto contraction == BFS oracle on random graphs (4 seeds)") {
    // the auto path (floor forced down) must stay exact on arbitrary
    // random structure, not just the adversarial cycle fixture
    for (seed <- 10L to 13L) {
      val rnd = new Random(seed)
      val n = 80
      val edges = Seq.fill(140)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val comp = {
        // brute-force union-find with min-id labels
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (u, v) =>
          if (u != v) {
            val (ru, rv) = (find(u.toInt), find(v.toInt))
            if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
          }
        }
        (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      }
      val got = Wcc.run(LinkGraph(edgesDF(edges)),
          WccConfig(), autoContractMinState = 1L)
        .components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == comp, s"seed=$seed")
    }
  }
}
