package graft.bench

import org.apache.spark.sql.SparkSession

/** Plan inspector for driver queries:
  * runMain graft.bench.PlanDump <queryName> [sfDir]
  * prints the formatted physical plan of SparkEntry.queries(queryName) —
  * the artifact the "explain and iterate until it's the plan you'd want"
  * loop reads (PushedFilters, ReadSchema, WholeStageCodegen spans,
  * ReusedExchange/ReusedSubquery markers, join strategies).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // AQE rewrites the plan at runtime; run the query once so the final
    // adaptive plan (with reuse markers) is what prints
    df.count()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
