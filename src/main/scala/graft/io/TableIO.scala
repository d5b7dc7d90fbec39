package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Named-table IO + graph catalog (SURVEY.md §2.1 S5/S7, §2.14).
  *
  * The reference serializes CSR graphs to raw binary snapshots
  * (crates/builder/src/input/binary.rs:15-38, csr.rs:247-314) and serves a
  * named in-memory catalog over Arrow Flight (crates/server/src/catalog.rs).
  * Our serialized graph IS a columnar table: Iceberg in deployment, a
  * parquet directory + `_graft_meta.json` sidecar (snapshot id, row count,
  * data-dir manifest) in this sandbox — same trait, drop-in backend
  * (SURVEY.md §7 preamble: no Iceberg runtime jar offline, so core never
  * imports org.apache.iceberg).
  */
trait TableIO {
  /** Replace the table with a fresh snapshot. `attrs` commit ATOMICALLY
    * with the data manifest — a concurrent reader never observes the new
    * snapshot without its attributes (e.g. a transform's orientation tag
    * or a graph500 declared node count).
    */
  def write(
      name: String, df: DataFrame,
      attrs: Map[String, String] = Map.empty): Unit

  /** Append rows as a new snapshot WITHOUT rewriting existing data — the
    * distributed analogue of the reference's incremental
    * EdgeMutation::add_edge path (crates/builder/src/graph/adj_list.rs:
    * 371-404, trait at lib.rs:414-456): the increment lands in its own
    * data dir and the snapshot manifest grows by one entry, exactly how an
    * Iceberg append commits a new manifest. Readers of the new snapshot see
    * old + new rows; readers mid-flight keep their snapshot.
    */
  def append(name: String, df: DataFrame): Unit

  /** Idempotent [[append]]: the tag names the increment (e.g. a streaming
    * micro-batch id), and an increment whose tag is already in the current
    * manifest is silently skipped. foreachBatch is at-least-once — after a
    * failure/restart the sink replays the last micro-batch, and a plain
    * append would commit it twice (round-2 advice on
    * StreamingIngest.sinkToCatalog).
    */
  def appendTagged(name: String, df: DataFrame, tag: String): Unit

  /** Rewrite the current snapshot's (possibly many) data dirs into one —
    * Iceberg's compaction/rewrite action. A no-op on single-dir snapshots.
    */
  def compact(spark: SparkSession, name: String): Unit

  def read(spark: SparkSession, name: String): DataFrame
  def list(): Seq[String]
  def drop(name: String): Unit
  def exists(name: String): Boolean

  /** Current snapshot id — changes on every committed mutation, so it keys
    * caches of snapshot-derived facts (e.g. the daemon's node-count cache).
    */
  def version(name: String): Long

  /** Row count of the current snapshot, straight from the manifest — no
    * scan (the reference's in-memory `edge_count()`, catalog.rs:134-142).
    */
  def rows(name: String): Long

  /** Small string attributes riding on the table (e.g. graph orientation).
    * Attributes survive appends/compaction (they describe the table, not a
    * snapshot) and are cleared by a full `write` (a replaced table is a new
    * table).
    */
  def attr(name: String, key: String): Option[String]
  def setAttr(name: String, key: String, value: String): Unit
}

/** Parquet-directory backend. Snapshot semantics: each write/append creates
  * data under a new `snap-<n>` dir and atomically flips the sidecar, whose
  * `dirs` array is the manifest of data dirs making up the current
  * snapshot — writes replace it, appends extend it. Readers always see a
  * complete snapshot; history is retained for lineage.
  */
class ParquetTableIO(root: String) extends TableIO {

  // One lock for every sidecar read-modify-write: two concurrent mutators
  // (e.g. a streaming append racing a daemon transform on the same
  // instance) would otherwise both read snapshot n and both commit n+1 —
  // the ATOMIC_MOVE prevents torn READS, not lost updates, and whichever
  // manifest lands second silently erases the other's committed rows.
  // Readers stay lock-free (they see the old or the new manifest).
  // Contract: one writer PROCESS per catalog root (same as a
  // lock-service-less Iceberg hadoop catalog); this lock makes the
  // single-process case safe.
  private val mutateLock = new Object

  private def dir(name: String) = {
    // names come off the network (the serving daemon's verbs) and are
    // embedded raw in both the filesystem path and the sidecar JSON —
    // reject separators/'..' (path traversal out of the catalog root)
    // and quotes/braces (sidecar injection) in one charset check
    require(name.matches("[A-Za-z0-9_.-]+") && name.exists(_.isLetterOrDigit),
      s"bad table name: $name")
    Paths.get(root, name)
  }
  private def metaPath(name: String) = dir(name).resolve("_graft_meta.json")

  private def commit(
      name: String, snapshot: Long, rows: Long, dirs: Seq[String],
      attrs: Map[String, String] = Map.empty,
      tags: Seq[String] = Seq.empty): Unit = {
    Files.createDirectories(dir(name))
    val dirsJson = dirs.map(d => s""""$d"""").mkString("[", ",", "]")
    // consumed appendTagged tags, persisted INDEPENDENTLY of the data-dir
    // names: compaction rewrites the dirs to one untagged snap dir, and
    // the replay-dedup contract must survive it
    val tagsJson = tags.distinct.sorted
      .map(t => s""""$t"""").mkString("[", ",", "]")
    // `attrs` is the LAST sidecar field: the ad-hoc field parser
    // (metaField) scans forward to the next ',' / '}', which is only
    // correct while every earlier field is scalar or a flat array.
    val attrsJson = attrs.toSeq.sorted
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    // Write-to-temp + ATOMIC_MOVE, never truncate-in-place (round-4
    // advice): the serving daemon runs GET/LIST fully concurrent with
    // COMPUTE's writeProperty, and a reader racing a plain writeString
    // could observe an empty or half-written sidecar. Same-directory move,
    // so the rename is atomic on every POSIX filesystem; readers see the
    // old manifest or the new one, nothing in between.
    val tmp = dir(name).resolve(s"._graft_meta.$snapshot.tmp")
    Files.writeString(tmp,
      s"""{"name":"$name","snapshot":$snapshot,"rows":$rows,""" +
        s""""dirs":$dirsJson,"tags":$tagsJson,"attrs":$attrsJson}""")
    Files.move(tmp, metaPath(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def write(
      name: String, df: DataFrame,
      attrs: Map[String, String] = Map.empty): Unit = mutateLock.synchronized {
    val snap = if (exists(name)) currentSnapshot(name) + 1 else 0L
    val dataDir = dir(name).resolve(s"snap-$snap")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val rows = df.sparkSession.read.parquet(dataDir.toString).count()
    // a replaced table is a new table: attrs AND consumed tags reset
    commit(name, snap, rows, Seq(s"snap-$snap"), attrs)
  }

  override def append(name: String, df: DataFrame): Unit =
    mutateLock.synchronized {
      if (!exists(name)) { writeLocked(name, df); return }
      val snap = currentSnapshot(name) + 1
      val dataDir = dir(name).resolve(s"snap-$snap")
      df.write.mode("overwrite").parquet(dataDir.toString)
      val newRows = df.sparkSession.read.parquet(dataDir.toString).count()
      commit(name, snap, currentRows(name) + newRows,
        currentDirs(name) :+ s"snap-$snap", currentAttrs(name),
        currentTags(name))
    }

  // first-write body shared by append's not-yet-created branch (monitors
  // are reentrant, but the early `return` inside write's synchronized
  // block makes the direct call awkward — keep the plain helper)
  private def writeLocked(name: String, df: DataFrame): Unit = {
    val dataDir = dir(name).resolve("snap-0")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val rows = df.sparkSession.read.parquet(dataDir.toString).count()
    commit(name, 0L, rows, Seq("snap-0"))
  }

  override def appendTagged(
      name: String, df: DataFrame, tag: String): Unit =
    mutateLock.synchronized {
      require(tag.matches("[A-Za-z0-9_-]+"), s"bad tag: $tag")
      // The consumed-tag set lives in the sidecar's `tags` array, so the
      // replay-dedup contract SURVIVES compaction (which rewrites the data
      // dirs to one untagged snap dir). The tag also rides the data-dir
      // name for human lineage, and legacy pre-tags sidecars are still
      // honored by parsing the tag back out of the dir name: EXACTLY what
      // follows the "snap-<n>-" prefix — a bare endsWith("-$tag") would
      // false-match tag "b" against a dir committed for tag "a-b" (tags
      // may contain '-') and silently DROP the increment (round-3 verdict
      // #2 — the failure mode is data loss).
      def dirTag(d: String): String =
        d.replaceFirst("^snap-[0-9]+-", "")
      if (!exists(name)) {
        val dataDir = dir(name).resolve(s"snap-0-$tag")
        df.write.mode("overwrite").parquet(dataDir.toString)
        val rows = df.sparkSession.read.parquet(dataDir.toString).count()
        commit(name, 0L, rows, Seq(s"snap-0-$tag"), Map.empty, Seq(tag))
      } else {
        val committed = currentTags(name).toSet ++
          currentDirs(name).collect {
            case d if d != dirTag(d) => dirTag(d)
          }
        if (!committed.contains(tag)) {
          val snap = currentSnapshot(name) + 1
          val dataDir = dir(name).resolve(s"snap-$snap-$tag")
          df.write.mode("overwrite").parquet(dataDir.toString)
          val newRows =
            df.sparkSession.read.parquet(dataDir.toString).count()
          commit(name, snap, currentRows(name) + newRows,
            currentDirs(name) :+ s"snap-$snap-$tag", currentAttrs(name),
            (committed + tag).toSeq)
        } // else: tag already committed — replayed micro-batch, skip
      }
    }

  override def compact(spark: SparkSession, name: String): Unit =
    mutateLock.synchronized {
      require(exists(name), s"table $name not found under $root")
      if (currentDirs(name).size <= 1) return
      // carry the consumed-tag set forward: the tagged data dirs are about
      // to leave the manifest, and a replayed micro-batch after compaction
      // must still be recognized as committed
      def dirTag(d: String): String = d.replaceFirst("^snap-[0-9]+-", "")
      val tags = currentTags(name).toSet ++
        currentDirs(name).collect { case d if d != dirTag(d) => dirTag(d) }
      val all = read(spark, name)
      val snap = currentSnapshot(name) + 1
      val dataDir = dir(name).resolve(s"snap-$snap")
      all.write.mode("overwrite").parquet(dataDir.toString)
      val rows = spark.read.parquet(dataDir.toString).count()
      commit(name, snap, rows, Seq(s"snap-$snap"), currentAttrs(name),
        tags.toSeq)
    }

  private def metaField(name: String, field: String): String = {
    val s = Files.readString(metaPath(name))
    val i = s.indexOf("\"" + field + "\":") + field.length + 3
    s.substring(i).takeWhile(c => c != ',' && c != '}')
  }

  private def currentSnapshot(name: String): Long =
    metaField(name, "snapshot").trim.toLong

  private def currentRows(name: String): Long =
    metaField(name, "rows").trim.toLong

  private def currentAttrs(name: String): Map[String, String] = {
    val s = Files.readString(metaPath(name))
    val i = s.indexOf("\"attrs\":{")
    if (i < 0) Map.empty // pre-attrs sidecar
    else {
      val body = s.substring(i + 9, s.indexOf("}", i))
      if (body.trim.isEmpty) Map.empty
      else body.split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") ->
          v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }
  }

  private def currentDirs(name: String): Seq[String] = {
    val s = Files.readString(metaPath(name))
    val i = s.indexOf("\"dirs\":[")
    if (i < 0) Seq(s"snap-${currentSnapshot(name)}") // pre-manifest sidecar
    else {
      val body = s.substring(i + 8, s.indexOf("]", i))
      if (body.trim.isEmpty) Seq.empty
      else body.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .toSeq
    }
  }

  /** Consumed appendTagged tags (empty on pre-tags sidecars, whose tags
    * are recovered from the data-dir names instead).
    */
  private def currentTags(name: String): Seq[String] = {
    val s = Files.readString(metaPath(name))
    val i = s.indexOf("\"tags\":[")
    if (i < 0) Seq.empty
    else {
      val body = s.substring(i + 8, s.indexOf("]", i))
      if (body.trim.isEmpty) Seq.empty
      else body.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .toSeq
    }
  }

  override def read(spark: SparkSession, name: String): DataFrame = {
    require(exists(name), s"table $name not found under $root")
    val paths = currentDirs(name).map(d => dir(name).resolve(d).toString)
    spark.read.parquet(paths: _*)
  }

  // Files.list/walk return streams backed by an OPEN directory handle —
  // close them deterministically: the serving daemon calls list() per LIST
  // request, and unclosed handles leak fds until GC gets around to them.
  override def list(): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Seq.empty
    else {
      val s = Files.list(r)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => Files.exists(p.resolve("_graft_meta.json")))
        .map(_.getFileName.toString).sorted
      finally s.close()
    }
  }

  override def drop(name: String): Unit =
    if (Files.isDirectory(dir(name))) {
      val s = Files.walk(dir(name))
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally s.close()
    }

  override def exists(name: String): Boolean = Files.exists(metaPath(name))

  override def version(name: String): Long = currentSnapshot(name)

  override def rows(name: String): Long = currentRows(name)

  override def attr(name: String, key: String): Option[String] =
    currentAttrs(name).get(key)

  override def setAttr(name: String, key: String, value: String): Unit =
    mutateLock.synchronized {
    require(key.matches("[A-Za-z0-9_-]+"), s"bad attr key: $key")
    // values live in the flat attrs object the ad-hoc parser reads up to
    // the first '}' — keep them brace/quote/comma-free
    require(value.matches("[A-Za-z0-9_. -]*"), s"bad attr value: $value")
    // Commit the merged attrs under a BUMPED snapshot id (no new data dir;
    // dirs are unchanged) — same atomic temp+move, so concurrent readers
    // see old-attrs or new-attrs manifests, never a torn one. The bump
    // keeps version()'s contract ("changes on every committed mutation"):
    // an attr like node_count changes snapshot-derived facts, and a
    // version-keyed cache (the daemon's node-count cache) must not keep
    // serving the pre-attr value.
    commit(name, currentSnapshot(name) + 1, currentRows(name),
      currentDirs(name), currentAttrs(name) + (key -> value),
      currentTags(name))
  }
}

/** Graph catalog over TableIO: the Flight server's create/list/remove/
  * compute surface (crates/server/src/server.rs:296-339) re-expressed as
  * named edge tables, plus computed-property tables as catalog citizens
  * (the reference's do_get result streaming, server.rs:70-107 /
  * catalog.rs:270-288: a computed property is retrievable BY NAME after the
  * algorithm ran, not just dumped to a directory).
  */
class GraphCatalog(io: TableIO) {
  /** Create/replace a named graph. Orientation rides on the table (the
    * reference's GraphType tag, catalog.rs:125-142); CREATE loads directed
    * unless `attrs` says otherwise (actions.rs:99-103 Orientation
    * default). All attrs — gtype, a declared node_count — commit in the
    * SAME manifest as the edge snapshot, so a concurrent reader (the
    * daemon's LIST runs unlocked against COMPUTE/transforms) never sees a
    * fresh snapshot with the attrs still missing.
    */
  def create(
      name: String, edges: DataFrame,
      attrs: Map[String, String] = Map.empty): Unit =
    io.write(name, edges, Map("gtype" -> "directed") ++ attrs)

  /** Graph orientation tag — "directed" unless a `toUndirected` transform
    * replaced the edge table (pre-attrs tables read as directed).
    */
  def graphType(name: String): String =
    io.attr(name, "gtype").getOrElse("directed")

  def setGraphType(name: String, gtype: String): Unit =
    io.setAttr(name, "gtype", gtype)

  /** Manifest-tracked edge count — no scan (catalog.rs:134-142). */
  def edgeCount(name: String): Long = io.rows(name)

  /** Snapshot id of the edge table — keys snapshot-derived caches. */
  def version(name: String): Long = io.version(name)

  /** Declare the graph's node universe explicitly — the graph500 m/16
    * convention (input/graph500.rs:63-127) and the reference's NV-backed
    * counts (csr.rs:546-574), where the node count is metadata, not
    * max-id+1 over whatever edges happen to exist. Rides the manifest
    * attrs, so every later `graph()` (and the daemon's GraphInfo lines)
    * honors it.
    */
  def setNodeCount(name: String, n: Long): Unit =
    io.setAttr(name, "node_count", n.toString)

  def explicitNodeCount(name: String): Option[Long] =
    io.attr(name, "node_count").map(_.toLong)

  /** Append an edge increment (e.g. a StreamingIngest batch) to a named
    * graph; algorithms on the next `graph()` call see the union.
    */
  def appendEdges(name: String, edges: DataFrame): Unit = {
    io.append(name, edges)
    growUniverse(name, edges)
  }

  /** Idempotent append keyed by an increment tag (streaming micro-batch
    * replay safety — see TableIO.appendTagged).
    */
  def appendEdgesTagged(name: String, edges: DataFrame, tag: String): Unit = {
    io.appendTagged(name, edges, tag)
    growUniverse(name, edges)
  }

  /** A declared node universe (graph500's m/16) must never be SMALLER than
    * the edges actually in the table: an appended edge whose id falls past
    * the declared count would otherwise be silently dropped from the dense
    * vertex universe (degrees, PageRank's n, SSSP init) — grow the declared
    * count to cover it, the same semantics as the reference's mutable
    * add_edge growing its adjacency. Only runs when an explicit count
    * exists (one cheap column-pruned max over the increment).
    */
  private def growUniverse(name: String, edges: DataFrame): Unit =
    explicitNodeCount(name).foreach { nc =>
      import org.apache.spark.sql.functions.{col, greatest, max}
      val row =
        edges.agg(max(greatest(col("src"), col("dst")).cast("long"))).first()
      if (!row.isNullAt(0) && row.getLong(0) + 1 > nc)
        io.setAttr(name, "node_count", (row.getLong(0) + 1).toString)
    }

  def compact(spark: SparkSession, name: String): Unit =
    io.compact(spark, name)

  def graph(spark: SparkSession, name: String): graft.graph.LinkGraph =
    graft.graph.LinkGraph(io.read(spark, name),
      nodeCount =
        io.attr(name, "node_count").map(_.toLong).getOrElse(-1L))

  /** Raw named-table read (non-edge schemas, e.g. streaming staging). */
  def table(spark: SparkSession, name: String): DataFrame =
    io.read(spark, name)

  private def propTable(graph: String, prop: String) = s"$graph.prop.$prop"

  /** Store an algorithm result (id -> value frame) as a named property of
    * the graph.
    */
  def writeProperty(graph: String, prop: String, df: DataFrame): Unit =
    io.write(propTable(graph, prop), df)

  def readProperty(
      spark: SparkSession, graph: String, prop: String): DataFrame =
    io.read(spark, propTable(graph, prop))

  def listProperties(graph: String): Seq[String] =
    io.list().filter(_.startsWith(s"$graph.prop."))
      .map(_.stripPrefix(s"$graph.prop."))

  def list(): Seq[String] =
    io.list().filterNot(_.contains(".prop."))

  /** Drop every computed property of `name` (without touching the edge
    * table) — CREATE over an existing graph name replaces the DATA, and
    * properties computed against the old data must not survive to be
    * served as if they described the new one.
    */
  def dropProperties(name: String): Unit =
    io.list().filter(_.startsWith(s"$name.prop.")).foreach(io.drop)

  def remove(name: String): Unit = {
    dropProperties(name)
    io.drop(name)
  }
}
