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
      case "gendup" =>
        // Mega-bucket stress corpus (round-5 verdict #3's scenario): 10% of
        // docs are EXACT copies of a small set of boilerplate texts —
        // `classes` identical-signature classes of ~n/(10*classes) docs
        // each — the shape where the document-level banded self-join went
        // quadratic per (band, bucket). The other 90% are INDEPENDENT
        // unique texts (per-doc base seeds): background shingling load
        // with essentially no candidate pairs of their own, so the
        // `cands` A/B isolates the mega-class cost (a mixed near-dup
        // background lives in the `gen` corpus, not here).
        val n = args(2).toLong
        val nClasses = if (args.length > 3) args(3).toInt else 10
        val isBoiler = pmod(col("id"), lit(10)) === 5
        // class index from the boilerplate ORDINAL (id mod nClasses would
        // degenerate: ids = 5 mod 10 share residues mod many nClasses)
        val base = when(isBoiler,
          pmod(((col("id") - 5) / 10).cast("long"), lit(nClasses)))
          .otherwise(col("id") + lit(1000000000L))
        val words = (lit(90) + pmod(hash(col("base"), lit("len")), lit(40)))
        val text = aggregate(
          sequence(lit(1), words),
          lit(""),
          (acc, j) => concat(acc,
            when(j === 1, lit("")).otherwise(lit(" ")),
            concat(lit("w"),
              pmod(hash(col("base"), j, lit("tok")), lit(4000)))))
        val docs = spark.range(n).select(col("id"), base.as("base"))
          .select(col("id").as("doc_id"), text.as("text"))
        docs.repartition(cpus).write.mode("overwrite").parquet(path)
        println(s"""{"generated":${spark.read.parquet(path).count()}}""")
      case "cands" =>
        // candidate-generation stage only (the self-join the guard fixes),
        // isolated from the output-proportional verification tail
        val docs = spark.read.parquet(path)
        val t0 = System.nanoTime()
        val (cand, _, _) = graft.dedup.Dedup.lshCandidates(docs, 16, 4, 3)
        val nc = cand.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"cands","docs":${docs.count()},""" +
          f""""cands":$nc,"sec":$sec%.2f}""")
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
