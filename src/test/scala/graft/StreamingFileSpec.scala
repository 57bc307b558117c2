package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-source streaming over the real events data: the full
  * `readStream → transform → writeStream` surface (new files appearing in a
  * directory = the arriving stream), checked against the batch twin. */
class StreamingFileSpec extends SparkSpec {

  test("file-source stream over events matches the batch aggregation") {
    val dir = Paths.get(tmp("graft_stream_src"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // readStream needs an explicit schema; take it from a batch read of the
    // same file so it matches whatever ts encoding this testdata generation
    // carries (nanos-as-long in early rounds, µs NTZ since round 10), then
    // normalize exactly as the batch path does.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema

    val stream = Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val agg = streaming.EventsStreaming.windowedAggregates(
      stream, windowLen = "1 hour", watermark = "1 hour")

    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("file_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_out")
        .select(col("bucket"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = Tables.table(spark, sfDir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
    } finally q.stop()
  }
}
