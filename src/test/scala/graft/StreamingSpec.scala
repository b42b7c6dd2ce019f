package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Streaming/batch parity: a stream processed to completion must agree
  * with the equivalent batch query on the same data (layer-2 e2e tests,
  * SURVEY §5 — streaming is this engine's extension surface).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString + "/events"
    Tables(spark, "/root/testdata/sf0.001", "events").write.parquet(dir)
    dir
  }

  test("windowed aggregation matches the batch query") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = StreamingOps.windowedAgg(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("winagg")
      .select(col("window.start").as("start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_trunc("hour", col("ts")).as("start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got == want)
  }

  test("stateful sessionization emits exactly the closed batch sessions") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[StreamingOps.Ev]
    val q = StreamingOps.sessionize(stream, gapUs = 1800L * 1000000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions")
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    // batch truth via the sessionize query, minus each user's last
    // (still-open) session, which streaming correctly keeps in state
    val batch = SparkEntry.queries("sessionize")(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val closed = batch
      .withColumn("max_sess", max(col("sess_id")).over(w))
      .filter(col("sess_id") < col("max_sess"))
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == closed)
  }
}
