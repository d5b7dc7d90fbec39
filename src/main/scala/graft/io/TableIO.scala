package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Named-table IO + graph catalog (SURVEY.md §2.1 S5/S7, §2.14).
  *
  * The reference serializes CSR graphs to raw binary snapshots
  * (crates/builder/src/input/binary.rs:15-38, csr.rs:247-314) and serves a
  * named in-memory catalog over Arrow Flight (crates/server/src/catalog.rs).
  * Our serialized graph IS a columnar table: Iceberg in deployment, a
  * parquet directory + `_graft_meta.json` sidecar (snapshot id, row count)
  * in this sandbox — same trait, drop-in backend (SURVEY.md §7 preamble:
  * no Iceberg runtime jar offline, so core never imports org.apache.iceberg).
  */
trait TableIO {
  def write(name: String, df: DataFrame): Unit
  def read(spark: SparkSession, name: String): DataFrame
  def list(): Seq[String]
  def drop(name: String): Unit
  def exists(name: String): Boolean
}

/** Parquet-directory backend. Snapshot semantics: writes go to a new
  * `snap-<n>` subdirectory, then the sidecar flips atomically — readers
  * always see a complete snapshot, and history is retained for lineage.
  */
class ParquetTableIO(root: String) extends TableIO {

  private def dir(name: String) = Paths.get(root, name)
  private def metaPath(name: String) = dir(name).resolve("_graft_meta.json")

  override def write(name: String, df: DataFrame): Unit = {
    val currentSnap = if (exists(name)) currentSnapshot(name) + 1 else 0L
    val dataDir = dir(name).resolve(s"snap-$currentSnap")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val rows = df.sparkSession.read.parquet(dataDir.toString).count()
    Files.createDirectories(dir(name))
    Files.writeString(metaPath(name),
      s"""{"name":"$name","snapshot":$currentSnap,"rows":$rows}""")
  }

  private def currentSnapshot(name: String): Long = {
    val s = Files.readString(metaPath(name))
    val i = s.indexOf("\"snapshot\":") + 11
    s.substring(i).takeWhile(c => c.isDigit).toLong
  }

  override def read(spark: SparkSession, name: String): DataFrame = {
    require(exists(name), s"table $name not found under $root")
    val snap = currentSnapshot(name)
    spark.read.parquet(dir(name).resolve(s"snap-$snap").toString)
  }

  override def list(): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Seq.empty
    else Files.list(r).toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => Files.exists(p.resolve("_graft_meta.json")))
      .map(_.getFileName.toString).sorted
  }

  override def drop(name: String): Unit =
    if (Files.isDirectory(dir(name))) {
      Files.walk(dir(name)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }

  override def exists(name: String): Boolean = Files.exists(metaPath(name))
}

/** Graph catalog over TableIO: the Flight server's create/list/remove/
  * compute surface (crates/server/src/server.rs:296-339) re-expressed as
  * named edge tables.
  */
class GraphCatalog(io: TableIO) {
  def create(name: String, edges: DataFrame): Unit = io.write(name, edges)
  def graph(spark: SparkSession, name: String): graft.graph.LinkGraph =
    graft.graph.LinkGraph(io.read(spark, name))
  def list(): Seq[String] = io.list()
  def remove(name: String): Unit = io.drop(name)
}
