package graft

import graft.fixtures.Fixtures
import graft.ingest.TranscriptEdges
import graft.streaming.StreamingIngest
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming ingest: the edge stream over a parquet directory matches the
  * batch derivation (actor-name keyed) when all turns arrive in order.
  */
class StreamingSpec extends SparkSpec {

  test("streaming edge derivation matches batch derivation") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val ts = Fixtures.transcriptsFromEdges(spark,
      Fixtures.elTestEdges, 5L, Fixtures.welTestWeights)
    ts.write.mode("overwrite").parquet(s"$dir/in")

    val stream = StreamingIngest.readTranscriptStream(spark, s"$dir/in")
    val edges = StreamingIngest.edgeStream(stream)
    val q = edges.writeStream
      .format("memory").queryName("edge_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("edge_stream")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    val batch = TranscriptEdges.edges(ts).collect()
      .map(r => (("a%05d".format(r.getLong(0)), "a%05d".format(r.getLong(1))),
        r.getDouble(2)))
      .toMap
    assert(got == batch, s"stream=$got batch=$batch")
  }

  test("stream -> catalog append -> fold equals the batch graph") {
    import graft.io.{GraphCatalog, ParquetTableIO}
    val dir = Files.createTempDirectory("graft-stream-cat").toString
    val ts = Fixtures.transcriptsFromEdges(spark,
      Fixtures.elTestEdges, 5L, Fixtures.welTestWeights)
    // two file drops -> at least two micro-batches with maxFilesPerTrigger=1
    val (tsA, tsB) = {
      val parts = ts.randomSplit(Array(0.5, 0.5), seed = 1L)
      (parts(0), parts(1))
    }
    tsA.write.mode("overwrite").parquet(s"$dir/in/batchA")
    tsB.write.mode("overwrite").parquet(s"$dir/in/batchB")

    val cat = new GraphCatalog(new ParquetTableIO(s"$dir/cat"))
    val stream = StreamingIngest.readTranscriptStream(spark, s"$dir/in/*",
      maxFilesPerTrigger = 1)
    val q = StreamingIngest.sinkToCatalog(
      StreamingIngest.edgeStream(stream), cat, "stage", s"$dir/ckpt")
    q.processAllAvailable()
    q.stop()

    StreamingIngest.foldIntoGraph(spark, cat, "stage", "g")
    val folded = cat.graph(spark, "g")
    // same multiset of actor-name edges as the full batch derivation
    // (dense ids are assigned over the staged actors, deterministic order)
    val batch = TranscriptEdges.edges(ts)
    assert(folded.edgeCount == batch.count())
    val dict = TranscriptEdges.actorDictionary(ts).collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    val batchNamed = batch.collect()
      .map(r => (dict(r.getLong(0)), dict(r.getLong(1)), r.getDouble(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val foldedNamed = {
      val staged = cat.table(spark, "stage")
      staged.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    }
    assert(foldedNamed == batchNamed,
      s"staged=$foldedNamed batch=$batchNamed")
  }

  test("windowed edge-rate aggregation emits per-window counts") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    val ts = Fixtures.zipfTranscripts(spark, 20, 4, 5)
    ts.write.mode("overwrite").parquet(s"$dir/in")
    val stream = StreamingIngest.readTranscriptStream(spark, s"$dir/in")
    val rates = StreamingIngest.edgeRates(
      StreamingIngest.edgeStream(stream))
    val q = rates.writeStream
      .format("memory").queryName("edge_rates")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append-mode windows only emit once the watermark passes; with a
    // bounded input the final window may be withheld — assert the query ran
    // and produced a well-typed result set.
    val rows = spark.table("edge_rates")
    assert(rows.columns.toSeq ==
      Seq("window", "dst_actor", "n_edges", "w_sum"))
  }
}
