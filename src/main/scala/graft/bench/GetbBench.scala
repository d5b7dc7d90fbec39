package graft.bench

import graft.io.{GraphCatalog, ParquetTableIO}
import graft.server.CatalogServer
import org.apache.spark.sql.functions._

/** Serving-lane throughput fixture (round-4 verdict stretch #8): stand up a
  * live daemon over a catalog holding an N-row property (default 12M —
  * comfortably past the >= 10M bar) so the Python client can time the TSV
  * `GET` lane against the binary Arrow IPC `GETB` lane on identical rows.
  * The interesting number is rows/sec per lane (tools/getb_bench.py drives
  * both and prints it); results land in BASELINE.md.
  *
  *   runMain graft.bench.GetbBench [rows]   # prints GETB-BENCH port=...
  */
object GetbBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(12000000L)
    val root = java.nio.file.Files
      .createTempDirectory("graft-getb-bench").toString
    val spark = Scaling.session(
      math.min(8, Runtime.getRuntime.availableProcessors()))
    import spark.implicits._
    val catalog = new GraphCatalog(new ParquetTableIO(root))
    // a minimal edge table (the catalog needs the graph) + a dense
    // score-shaped property of `rows` rows — the serving lanes read only
    // the property table, so the edge table stays tiny
    catalog.create("g", Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"))
    catalog.writeProperty("g", "score",
      spark.range(rows).select($"id",
        ($"id" % 9973).cast("double").as("score")))
    val srv = new CatalogServer(spark, catalog, 0)
    println(s"GETB-BENCH port=${srv.boundPort} rows=$rows root=$root")
    Thread.currentThread().join() // serve until killed
  }
}
