package graft

import graft.sources.EventEdges
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level (hour, minute) stitched edge derivation must be
  * row-for-row identical to the naive single hour-window lag it replaces
  * (the form the DuckDB oracle states).
  */
class EventEdgesSpec extends SparkSpec {

  private def naive(events: org.apache.spark.sql.DataFrame) = {
    val w = Window
      .partitionBy(date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("ts"), col("event_id"), col("user_id"), col("value"))
      .withColumn("prev_user", lag(col("user_id"), 1).over(w))
      .filter(col("prev_user").isNotNull)
      .select(col("user_id").as("src"), col("prev_user").as("dst"),
        (col("value") + lit(1.0)).as("weight"))
  }

  private def assertSameEdges(events: org.apache.spark.sql.DataFrame)
      : Unit = {
    val a = EventEdges.edges(events).groupBy("src", "dst", "weight")
      .count().collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    val b = naive(events).groupBy("src", "dst", "weight")
      .count().collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(a == b, s"stitched != naive: ${(a -- b).take(5)} vs " +
      s"${(b -- a).take(5)}")
  }

  test("stitched derivation == naive hour window on the sf0.001 events") {
    assertSameEdges(spark.read
      .parquet("/root/testdata/sf0.001/events.parquet"))
  }

  test("stitched derivation handles minute boundaries and empty minutes") {
    val s = spark
    import s.implicits._
    // one bursty hour: events straddling minute boundaries, a gap minute,
    // plus a second hour whose first event must NOT chain across hours
    val events = Seq(
      (1L, "2026-01-01 10:00:59", 100L, 1.0),
      (2L, "2026-01-01 10:01:00", 101L, 2.0), // first of minute -> stitched
      (3L, "2026-01-01 10:01:01", 102L, 3.0),
      (4L, "2026-01-01 10:04:30", 103L, 4.0), // gap minutes 02-03
      (5L, "2026-01-01 11:00:00", 104L, 5.0), // new hour: no predecessor
      (6L, "2026-01-01 10:00:59", 105L, 6.0)  // same ts as 1: id tie-break
    ).toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    assertSameEdges(events)
    // explicit expectation: 10:01:00's prev is the LAST 10:00 event (id 6)
    val edges = EventEdges.edges(events).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((101L, 105L)))
    assert(!edges.exists(_._1 == 104L), "cross-hour stitch must not happen")
  }
}
