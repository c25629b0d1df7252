package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("streaming agg == batch agg (exactly-once over bounded input)") {
    val streamed = Streaming.streamAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  test("windowed streaming counts == batch window agg") {
    val streamed = Streaming.windowedCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }
}
