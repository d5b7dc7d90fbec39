package graft

import graft.fixtures.Fixtures
import graft.io.{GraphCatalog, ParquetTableIO}
import graft.sources.GraphSources
import java.nio.file.Files

/** File sources (S1/S2), TableIO serialize round-trip (S5), catalog. */
class SourcesSpec extends SparkSpec {

  test("edge list text source parses test.el with CRLF and weights") {
    val dir = Files.createTempDirectory("graft-el")
    // mirror resources/test.el + CRLF tolerance (edgelist.rs:280-348)
    Files.writeString(dir.resolve("test.el"),
      "0 1\r\n0 2\n1 2\n1 3\n2 4\n3 4\n")
    val got = GraphSources.edgeList(spark, dir.resolve("test.el").toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Fixtures.elTestEdges.sorted)

    Files.writeString(dir.resolve("test.wel"),
      "0 1 0.1\n0 2 0.2\n1 2 0.3\n1 3 0.4\n2 4 0.5\n3 4 0.6\n")
    val w = GraphSources.edgeList(spark, dir.resolve("test.wel").toString)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(w((1L, 3L)) == 0.4)
  }

  test("graph500 binary source unpacks 48-bit packed edges") {
    // hand-pack two edges incl. ids above 2^32:
    // (5, 7) and (2^33+1, 2^34+2)
    val dir = Files.createTempDirectory("graft-g500")
    val edges = Seq((5L, 7L), ((1L << 33) + 1L, (1L << 34) + 2L))
    val bytes = new java.io.ByteArrayOutputStream()
    def putU32(v: Long): Unit =
      (0 until 4).foreach(i => bytes.write(((v >> (8 * i)) & 0xFF).toInt))
    edges.foreach { case (s, t) =>
      putU32(s & 0xFFFFFFFFL)
      putU32(t & 0xFFFFFFFFL)
      putU32(((t >> 32) << 16) | (s >> 32))
    }
    val p = dir.resolve("two.graph500")
    Files.write(p, bytes.toByteArray)
    val (df, nodeCount) = GraphSources.graph500(spark, p.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == edges.sorted)
    assert(nodeCount == 0L) // 2 edges / 16 = 0 (Kronecker convention)
  }

  test("graph500 writer round-trips through the reader incl. 48-bit ids") {
    val dir = Files.createTempDirectory("graft-g500w")
    val edges = Seq((5L, 7L), ((1L << 33) + 1L, (1L << 34) + 2L),
      ((1L << 47) - 1L, 0L), (7L, 5L), (5L, 7L)) // dup kept, both orders
    val df = edgesDF(edges)
    val p = dir.resolve("rt.graph500").toString
    GraphSources.writeGraph500(df, p)
    val got = GraphSources.graph500(spark, p)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == edges.sorted)
    // ids past the 48-bit packing range must refuse, not truncate
    intercept[IllegalArgumentException] {
      GraphSources.writeGraph500(edgesDF(Seq((1L << 48, 0L))),
        dir.resolve("bad.graph500").toString)
    }
  }

  test("graph500 node count reads the length through the Hadoop FS API " +
      "(scheme-qualified path, not java.io.File)") {
    // 32 edges -> node_count = 32/16 = 2 under the Kronecker convention.
    // The path is file:-scheme qualified: java.io.File("file:/...") does
    // NOT resolve (length() == 0 -> node_count 0), so this passes only
    // through FileSystem.getFileStatus — the round-5 verdict #3 fix (a
    // non-local hdfs://"/s3a:// path had the same silent-zero failure).
    val dir = Files.createTempDirectory("graft-g500fs")
    val df = edgesDF((0 until 32).map(i => (i.toLong, (i + 1).toLong)))
    val p = dir.resolve("fs.graph500").toString
    GraphSources.writeGraph500(df, p)
    assert(new java.io.File(s"file:$p").length() == 0L) // the old hazard
    val (edges, nodeCount) = GraphSources.graph500(spark, s"file:$p")
    assert(edges.count() == 32L)
    assert(nodeCount == 2L)
  }

  test("dotGraph writer round-trips nodes, edges, and label stats") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-dotw").resolve("g").toString
    val e = edgesDF(Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 2L)))
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .select(col("id"), (col("id") % 2).as("label"), col("degree"))
    GraphSources.writeDotGraph(nodes, e, dir)
    val (rn, re) = GraphSources.dotGraph(spark, dir)
    assert(rn.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq ==
      Seq((0L, 0L, 2L), (1L, 1L, 3L), (2L, 0L, 3L)))
    // duplicate e-lines survive (multigraph fidelity), weight restored 1.0
    assert(re.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq ==
      Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 2L, 1.0), (1L, 2L, 1.0)))
    // the t-header landed and matches the body
    val header = spark.read.text(dir)
      .filter(col("value").startsWith("t ")).collect()
    assert(header.map(_.getString(0)).toSeq == Seq("t 3 4"))
  }

  test("dotGraph source parses t/v/e format with label stats") {
    val dir = Files.createTempDirectory("graft-dot")
    // 5-node labeled graph in the reference's .graph format
    // (dotgraph.rs:63-218)
    Files.writeString(dir.resolve("g.graph"),
      "t 5 6\nv 0 0 2\nv 1 1 2\nv 2 1 2\nv 3 2 2\nv 4 2 2\n" +
        "e 0 1\ne 0 2\ne 1 2\ne 1 3\ne 2 4\ne 3 4\n")
    val (nodes, edges) = graft.sources.GraphSources.dotGraph(spark,
      dir.resolve("g.graph").toString)
    assert(nodes.count() == 5)
    val got = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == Fixtures.elTestEdges.sorted)
    val stats = graft.sources.GraphSources.labelStats(nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats == Map(0L -> 1L, 1L -> 2L, 2L -> 2L))
  }

  test("degree-descending relabel: dense ids ordered by (deg desc, id)") {
    val g = graft.graph.LinkGraph(edgesDF(Fixtures.elTestEdges))
    // degrees: 0->2, 1->3, 2->3, 3->2, 4->2 => order 1,2,0,3,4
    val m = g.relabelMap.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 0L, 2L -> 1L, 0L -> 2L, 3L -> 3L, 4L -> 4L))
    // relabeled graph preserves structure: same TC
    assert(graft.algos.TriangleCount.run(g.relabeledByDegree) ==
      graft.algos.TriangleCount.run(g))
  }

  test("TableIO snapshot write/read round-trip + catalog ops") {
    val root = Files.createTempDirectory("graft-tables").toString
    val io = new ParquetTableIO(root)
    val cat = new GraphCatalog(io)
    val edges = edgesDF(Fixtures.elTestEdges)
    cat.create("g1", edges)
    assert(cat.list() == Seq("g1"))
    val g = cat.graph(spark, "g1")
    assert(g.edgeCount == 6L && g.nodeCount == 5L)
    // snapshot semantics: second write flips atomically, reads see new data
    io.write("g1", edges.limit(3))
    assert(io.read(spark, "g1").count() == 3L)
    cat.remove("g1")
    assert(cat.list().isEmpty)
  }

  test("catalog graph round-trips through algorithms (serialize seed S5)") {
    val root = Files.createTempDirectory("graft-tables2").toString
    val cat = new GraphCatalog(new ParquetTableIO(root))
    cat.create("tc", edgesDF(Fixtures.tcDiamondEdges))
    assert(graft.algos.TriangleCount.run(cat.graph(spark, "tc")) == 2L)
  }
}
