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
