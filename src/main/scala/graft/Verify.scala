package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Consumer-side proof (round-4 verdict, next-step #5): drive the live
    // serving daemon through tools/graft_client.py — a scripted
    // create -> to_undirected -> compute (scalar tc + wcc) -> get (TSV)
    // -> getb (binary Arrow IPC) round-trip, transcribed into this
    // driver-visible log. Failures here are reported loudly but do not
    // zero the correctness dump above (the parquet results are already on
    // disk).
    try {
      import scala.sys.process._
      val quiet = ProcessLogger(_ => (), _ => ())
      if (Seq("python3", "--version").!(quiet) != 0)
        println("[client] python3 unavailable; daemon round-trip skipped")
      else {
        val root = Files.createTempDirectory("graft-verify-client")
        val cat = new graft.io.GraphCatalog(
          new graft.io.ParquetTableIO(s"$root/cat"))
        graft.sources.EventEdges.edges(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$root/edges")
        val srv = new graft.server.CatalogServer(spark, cat)
        try {
          val addr = s"127.0.0.1:${srv.boundPort}"
          def run(args: String*): Unit = {
            println(s"[client] $$ graft_client.py $addr ${args.mkString(" ")}")
            val buf = new StringBuilder
            val code = (Seq("python3", "tools/graft_client.py", addr) ++ args)
              .!(ProcessLogger(
                l => buf.append("[client] ").append(l).append('\n'),
                l => buf.append("[client!] ").append(l).append('\n')))
            print(buf)
            require(code == 0, s"client ${args.head} exited $code")
          }
          run("create", "g", s"$root/edges")
          run("list")
          run("to_undirected", "g")
          run("list")
          run("compute", "g", "triangle_count")
          run("compute", "g", "wcc")
          run("props", "g")
          run("get", "g", "wcc", "5")
          val hasPyarrow =
            Seq("python3", "-c", "import pyarrow.ipc").!(quiet) == 0
          if (hasPyarrow) run("getb", "g", "wcc", "5")
          else println("[client] pyarrow unavailable; GETB lane skipped")
          run("remove", "g")
          println("[client] daemon round-trip OK" +
            (if (hasPyarrow) " (TSV + binary Arrow GETB)" else " (TSV)"))
        } finally srv.close()
      }
    } catch {
      case e: Throwable => println(s"[client] daemon round-trip FAILED: $e")
    }
    spark.stop()
  }
}
