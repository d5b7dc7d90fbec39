package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Deterministic test/bench inputs (FIXTURES.md). Golden graphs are
  * transcribed from the reference's test corpus and re-encoded as transcript
  * tables per BASELINE.json input_hint; the random and Zipf generators are
  * seeded (42).
  */
object Fixtures {

  case class Turn(
      conv_id: String, turn_idx: Int, role: String,
      text: String, tool: String, ts: Timestamp)

  private val EPOCH = 1700000000000L

  /** Encode an edge list as a transcript table (FIXTURES.md §3): edge i=(u,v)
    * becomes conv "e-i" with turn 0 tool=a%05d(v), turn 1 tool=a%05d(u) —
    * yielding exactly edge u -> v under reply derivation. `nodeCount` anchor
    * conversations (single turn each, which emit no edges) make the actor
    * dictionary dense over 0..nodeCount-1 so actor ids equal node ids even
    * when some id never appears in an edge (node_count = max_id + 1
    * semantics, crates/builder/src/input/edgelist.rs:84-90).
    */
  def transcriptsFromEdges(
      spark: SparkSession,
      edges: Seq[(Long, Long)],
      nodeCount: Long,
      weights: Seq[Double] = Seq.empty): DataFrame = {
    import spark.implicits._
    def actor(v: Long): String = "a%05d".format(v)
    val edgeTurns = edges.zipWithIndex.flatMap { case ((u, v), i) =>
      val wTxt = if (weights.nonEmpty) s" w=${weights(i)}" else ""
      Seq(
        Turn(s"e-$i", 0, "user", s"t-$i-0", actor(v),
          new Timestamp(EPOCH + (i * 60L) * 1000L)),
        Turn(s"e-$i", 1, "assistant", s"t-$i-1$wTxt", actor(u),
          new Timestamp(EPOCH + (i * 60L + 1) * 1000L)))
    }
    val anchorTurns = (0L until nodeCount).map { v =>
      Turn(s"n-$v", 0, "user", s"anchor-$v", actor(v),
        new Timestamp(EPOCH - 1000L * (nodeCount - v)))
    }
    (edgeTurns ++ anchorTurns).toDF()
  }

  /** README PageRank graph, 13 nodes / 19 edges
    * (/root/reference/crates/algos/src/lib.rs:96-118).
    */
  val prReadme13Edges: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 1L), (4L, 0L), (4L, 1L), (5L, 4L), (5L, 1L), (5L, 6L),
    (6L, 1L), (6L, 5L), (7L, 1L), (7L, 5L), (8L, 1L), (8L, 5L), (9L, 1L),
    (9L, 5L), (10L, 1L), (10L, 5L), (11L, 5L), (12L, 5L))

  /** Golden scores after PageRankConfig(10, 1e-4, 0.85)
    * (/root/reference/crates/algos/src/lib.rs:124-138).
    */
  val prReadme13Expected: Seq[Double] = Seq(
    0.024064068, 0.3145448, 0.27890152, 0.01153846, 0.029471997,
    0.06329483, 0.029471997, 0.01153846, 0.01153846, 0.01153846,
    0.01153846, 0.01153846, 0.01153846)

  /** GDL "(a)-->()-->()<--(a),(b)-->()-->()<--(b)": two directed triangles
    * rooted at a=0 and b=3 (crates/algos/src/page_rank.rs:176-196).
    */
  val prTwoComponentsEdges: Seq[(Long, Long)] = Seq(
    (0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L))

  val prTwoComponentsExpected: Seq[Double] = Seq(
    0.024999997, 0.035624996, 0.06590624,
    0.024999997, 0.035624996, 0.06590624)

  /** (0,1),(2,3) — components [0,0,2,2] (crates/algos/src/wcc.rs:307-329). */
  val wccTwoPairsEdges: Seq[(Long, Long)] = Seq((0L, 1L), (2L, 3L))

  /** TC fixtures (crates/algos/src/triangle_count.rs:93-130), GDL expanded:
    * two disjoint triangles / two triangles sharing a / diamond. All count 2.
    */
  val tcTwoComponentsEdges: Seq[(Long, Long)] = Seq(
    (0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L))
  val tcConnectedEdges: Seq[(Long, Long)] = Seq(
    (0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L), (3L, 4L), (0L, 4L))
  val tcDiamondEdges: Seq[(Long, Long)] = Seq(
    (0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L), (2L, 3L))

  /** resources/test.el (crates/builder/tests/builder.rs:493-564). */
  val elTestEdges: Seq[(Long, Long)] = Seq(
    (0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
  val welTestWeights: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6)

  /** SSSP golden graph (crates/algos/src/sssp.rs:283-313): a..f = 0..5,
    * expected distances from 0: [0, 4, 2, 9, 5, 20].
    */
  val ssspEdges: Seq[(Long, Long)] = Seq(
    (0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 5L), (4L, 3L))
  val ssspWeights: Seq[Double] = Seq(4.0, 2.0, 5.0, 10.0, 3.0, 11.0, 4.0)
  val ssspExpected: Seq[Double] = Seq(0.0, 4.0, 2.0, 9.0, 5.0, 20.0)

  /** Seeded uniform random edge list mirroring the reference's criterion
    * generator (crates/builder/benches/common/mod.rs:89-107).
    */
  def randomEdges(nodes: Int, edges: Int, seed: Long = 42L)
      : Seq[(Long, Long)] = {
    val rng = new java.util.Random(seed)
    (0 until edges).map(_ =>
      (rng.nextInt(nodes).toLong, rng.nextInt(nodes).toLong))
  }

  /** Zipf-skewed deterministic transcript generator (FIXTURES.md §5): hub
    * actors via Zipf(s) selection — the skew the salting/partial-agg path
    * must handle.
    */
  def zipfTranscripts(
      spark: SparkSession,
      numConvs: Int,
      turnsPerConv: Int,
      numActors: Int,
      s: Double = 1.1,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    // Precompute the Zipf CDF once on the driver (numActors is small).
    val weights = (1 to numActors).map(r => 1.0 / math.pow(r, s))
    val total = weights.sum
    val cdf = weights.scanLeft(0.0)(_ + _).tail.map(_ / total).toArray
    def pick(u: Double): Int = {
      val i = java.util.Arrays.binarySearch(cdf, u)
      val idx = if (i >= 0) i else -i - 1
      math.min(idx, numActors - 1)
    }
    val roles = Array("user", "assistant", "tool")
    spark.range(numConvs.toLong).as[Long].flatMap { c =>
      // per-conversation deterministic RNG: independent of partitioning
      val rng = new java.util.Random(seed ^ (c * 0x9E3779B97F4A7C15L))
      (0 until turnsPerConv).map { t =>
        val actor = pick(rng.nextDouble())
        Turn(s"c-$c", t, roles(t % roles.length),
          s"txt-$c-$t", "a%06d".format(actor),
          new Timestamp(EPOCH + c * 3600000L + t * 1000L))
      }
    }.toDF()
  }
}
