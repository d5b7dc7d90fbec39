package graft

import graft.algos.Wcc
import graft.io.{GraphCatalog, ParquetTableIO}
import java.nio.file.Files

/** Incremental edge append + compaction + computed-property catalog
  * citizenship (reference: EdgeMutation::add_edge, adj_list.rs:371-404;
  * do_get property serving, server.rs:70-107).
  */
class CatalogAppendSpec extends SparkSpec {

  test("append grows a named graph across snapshots; compact preserves") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cat").toString
    val cat = new GraphCatalog(new ParquetTableIO(root))

    cat.create("g", Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"))
    assert(cat.graph(spark, "g").edgeCount == 1)

    // two appends: algorithms on the re-opened graph see the union
    cat.appendEdges("g", Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"))
    cat.appendEdges("g", Seq((3L, 4L, 1.0)).toDF("src", "dst", "weight"))
    val g = cat.graph(spark, "g")
    assert(g.edgeCount == 3)
    val comps = Wcc.run(g).components.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(2L) == 0L && comps(4L) == 3L)

    // compaction rewrites to one dir with identical content
    cat.compact(spark, "g")
    assert(cat.graph(spark, "g").edgeCount == 3)
    val dataDirs = Files.list(java.nio.file.Paths.get(root, "g")).toArray
      .map(_.toString).count(_.contains("snap-"))
    assert(dataDirs >= 3) // history retained (snapshots are immutable)
  }

  test("attrs commit atomically with write; setAttr bumps version") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cat-attr").toString
    val io = new ParquetTableIO(root)

    // attrs passed to write() land in the SAME manifest commit as the
    // data — there is no window where a reader sees the snapshot without
    // them (the daemon's unlocked LIST races transforms on exactly this)
    io.write("t", Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"),
      Map("gtype" -> "undirected", "node_count" -> "7"))
    assert(io.attr("t", "gtype").contains("undirected"))
    assert(io.attr("t", "node_count").contains("7"))

    // version() changes on EVERY committed mutation, attr mutations
    // included — a version-keyed cache of attr-derived facts (the daemon's
    // node-count cache) must see a new key after setAttr
    val v0 = io.version("t")
    io.setAttr("t", "node_count", "9")
    assert(io.version("t") > v0)
    assert(io.attr("t", "node_count").contains("9"))
    assert(io.rows("t") == 1L) // data manifest untouched by the attr bump
    assert(io.read(spark, "t").count() == 1L)

    // a full write replaces the table: attrs reset to exactly what the
    // new commit carries
    io.write("t", Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"))
    assert(io.attr("t", "node_count").isEmpty)
  }

  test("tagged appends are idempotent under micro-batch replay") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cat").toString
    val cat = new GraphCatalog(new ParquetTableIO(root))

    // first-ever increment creates the table
    cat.appendEdgesTagged("g",
      Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"), "b0")
    assert(cat.graph(spark, "g").edgeCount == 1)
    // replay of b0 (foreachBatch at-least-once) must be a no-op
    cat.appendEdgesTagged("g",
      Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"), "b0")
    assert(cat.graph(spark, "g").edgeCount == 1)
    // a new tag commits; replaying it again does not
    cat.appendEdgesTagged("g",
      Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"), "b1")
    cat.appendEdgesTagged("g",
      Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"), "b1")
    assert(cat.graph(spark, "g").edgeCount == 2)
    // untagged appends still stack freely alongside
    cat.appendEdges("g", Seq((3L, 4L, 1.0)).toDF("src", "dst", "weight"))
    assert(cat.graph(spark, "g").edgeCount == 3)

    // COMPACTION must not forget consumed tags: it rewrites the tagged
    // data dirs into one untagged dir, and a post-compaction replay of an
    // already-committed micro-batch (failure/restart straddling the
    // compaction) would otherwise append duplicate rows — the exact
    // at-least-once corruption appendTagged exists to prevent
    cat.compact(spark, "g")
    assert(cat.graph(spark, "g").edgeCount == 3)
    cat.appendEdgesTagged("g",
      Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"), "b1")
    assert(cat.graph(spark, "g").edgeCount == 3) // b1 still recognized
    cat.appendEdgesTagged("g",
      Seq((5L, 6L, 1.0)).toDF("src", "dst", "weight"), "b2")
    assert(cat.graph(spark, "g").edgeCount == 4) // new tags still commit
  }

  test("appends past a declared node universe grow it") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cat-grow").toString
    val io = new ParquetTableIO(root)
    val cat = new GraphCatalog(io)

    // a graph500-style declared universe: 4 nodes, edges among 0-1
    cat.create("g", Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"),
      Map("node_count" -> "4"))
    assert(cat.graph(spark, "g").nodeCount == 4)

    // appending an edge INSIDE the universe keeps the declared count
    cat.appendEdges("g", Seq((2L, 3L, 1.0)).toDF("src", "dst", "weight"))
    assert(cat.graph(spark, "g").nodeCount == 4)

    // an edge PAST it grows the declared count to cover the new max id —
    // the old behavior silently dropped node 9 from the dense universe
    // (degrees, PageRank's n) while its edges sat in the table
    cat.appendEdgesTagged("g",
      Seq((9L, 0L, 1.0)).toDF("src", "dst", "weight"), "t0")
    assert(cat.graph(spark, "g").nodeCount == 10)
    assert(cat.graph(spark, "g").degrees.count() == 10)
  }

  test("tag matching is exact, not suffix-based (tags may contain '-')") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cat").toString
    val cat = new GraphCatalog(new ParquetTableIO(root))

    // round-3 verdict #2: endsWith("-$tag") considered tag "b" already
    // committed once any dir carried tag "a-b" — the increment was
    // SILENTLY DROPPED (data loss). Exact matching must commit both.
    cat.appendEdgesTagged("g",
      Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"), "a-b")
    cat.appendEdgesTagged("g",
      Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"), "b")
    assert(cat.graph(spark, "g").edgeCount == 2)
    // replays of each still skip
    cat.appendEdgesTagged("g",
      Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"), "a-b")
    cat.appendEdgesTagged("g",
      Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight"), "b")
    assert(cat.graph(spark, "g").edgeCount == 2)
  }

  test("computed properties are catalog citizens (write/read/list)") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cat").toString
    val cat = new GraphCatalog(new ParquetTableIO(root))
    cat.create("g", Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"))

    val comps = Wcc.run(cat.graph(spark, "g")).components
    cat.writeProperty("g", "wcc", comps)
    assert(cat.listProperties("g") == Seq("wcc"))
    val back = cat.readProperty(spark, "g", "wcc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == Map(0L -> 0L, 1L -> 0L))
    // property tables don't pollute the graph listing
    assert(cat.list() == Seq("g"))
    cat.remove("g")
    assert(cat.list().isEmpty && cat.listProperties("g").isEmpty)
  }
}
