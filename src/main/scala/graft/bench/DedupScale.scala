package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Map-cost-bound dedup benchmark:
  *   runMain graft.bench.DedupScale gen <path> <nDocs>
  *   runMain graft.bench.DedupScale minhash <path>
  *
  * `gen` materializes a deterministic synthetic documents corpus (seeded
  * expression-only generation — no driver data): ~90-130 words per doc
  * over a 4k-word vocabulary, with every 10th doc a near-duplicate of its
  * predecessor (same base seed) so the LSH pipeline has real work.
  * `minhash` times Dedup.minHashLsh end-to-end at local[32] — the regime
  * where the shingle/signature materialization matters (at sf0.1 the
  * corpus is small enough that job overhead hides the redundant passes).
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val path = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "gen" =>
        val n = args(2).toLong
        // base seed: doc 10k duplicates doc 10k-1 (same text modulo the
        // whitespace noise below — near-dup, not exact-dup)
        val base = when(pmod(col("id"), lit(10)) === 0 && col("id") > 0,
          col("id") - 1).otherwise(col("id"))
        val words = (lit(90) + pmod(hash(col("base"), lit("len")), lit(40)))
        val text = aggregate(
          sequence(lit(1), words),
          lit(""),
          (acc, j) => concat(acc,
            when(j === 1, lit("")).otherwise(lit(" ")),
            concat(lit("w"),
              pmod(hash(col("base"), j, lit("tok")), lit(4000)))))
        val docs = spark.range(n).select(col("id"), base.as("base"))
          .select(col("id").as("doc_id"),
            when(pmod(col("id"), lit(10)) === 0 && col("id") > 0,
              concat(text, lit("  "))) // trailing noise: near-dup class
              .otherwise(text).as("text"))
        docs.repartition(cpus).write.mode("overwrite").parquet(path)
        println(s"""{"generated":${spark.read.parquet(path).count()}}""")
      case "minhash" =>
        val docs = spark.read.parquet(path)
        val t0 = System.nanoTime()
        val pairs = graft.dedup.Dedup.minHashLsh(docs, 0.5).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"minhash","docs":${docs.count()},""" +
          f""""pairs":$pairs,"sec":$sec%.2f}""")
      case "dupgroups" =>
        // full keep-one-per-cluster path: LSH pairs + sparse-WCC closure +
        // singleton union — the end-to-end corpus-dedup job
        val docs = spark.read.parquet(path)
        val t0 = System.nanoTime()
        val g = graft.dedup.Dedup.dupGroups(docs, 0.5)
        val (rows, dups) = {
          val r = g.agg(count(lit(1)),
            count(when(col("group_size") > 1, 1))).first()
          (r.getLong(0), r.getLong(1))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"dupgroups","docs":$rows,""" +
          f""""docs_in_dup_groups":$dups,"sec":$sec%.2f}""")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
