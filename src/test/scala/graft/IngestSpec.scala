package graft

import graft.fixtures.Fixtures
import graft.ingest.TranscriptEdges
import org.apache.spark.sql.functions._

/** Transcript ingest: edge derivation + the north-rule per-turn text
  * invariant (SURVEY.md §5.2-3).
  */
class IngestSpec extends SparkSpec {

  test("reply-edge derivation reproduces an arbitrary edge list exactly") {
    val want = Fixtures.elTestEdges
    val ts = Fixtures.transcriptsFromEdges(spark, want, 5L)
    val got = TranscriptEdges.edges(ts).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want.sorted)
  }

  test("weighted edges parse w= from text") {
    val ts = Fixtures.transcriptsFromEdges(spark,
      Fixtures.elTestEdges, 5L, Fixtures.welTestWeights)
    val got = TranscriptEdges.edges(ts).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    Fixtures.elTestEdges.zip(Fixtures.welTestWeights).foreach {
      case (e, w) => assert(got(e) == w)
    }
  }

  test("duplicate edges preserved with multiplicity") {
    val dup = Seq((0L, 1L), (0L, 1L), (1L, 0L))
    val ts = Fixtures.transcriptsFromEdges(spark, dup, 2L)
    val got = TranscriptEdges.edges(ts)
    assert(got.count() == 3L)
    assert(got.filter(col("src") === 0L && col("dst") === 1L).count() == 2L)
  }

  test("per-turn text equality under stable (conv_id, turn_idx) ordering") {
    val ts = Fixtures.zipfTranscripts(spark, 50, 6, 10)
    // round-trip: write + read back, join on key, texts equal; ordering
    // stable.
    val dir = java.nio.file.Files.createTempDirectory("graft-inv").toString
    ts.write.mode("overwrite").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    val joined = ts.as("a").join(back.as("b"),
      col("a.conv_id") === col("b.conv_id") &&
        col("a.turn_idx") === col("b.turn_idx"))
    assert(joined.filter(col("a.text") =!= col("b.text")).count() == 0L)
    assert(joined.count() == ts.count())
    val ordered = TranscriptEdges.orderedTexts(back).collect()
    val expected = ts.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(ordered.map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSeq == expected.toSeq)
  }

  test("actor dictionary is dense, sorted, deterministic") {
    val ts = Fixtures.zipfTranscripts(spark, 30, 5, 8)
    val dict = TranscriptEdges.actorDictionary(ts).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(dict.map(_._2).toSeq == dict.indices.map(_.toLong))
    assert(dict.map(_._1).toSeq == dict.map(_._1).sorted.toSeq)
  }

  test("zipf generator is partitioning-independent (deterministic)") {
    val a = Fixtures.zipfTranscripts(spark, 40, 4, 12).repartition(7)
      .collect().map(_.toString).sorted
    val b = Fixtures.zipfTranscripts(spark, 40, 4, 12).repartition(2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
