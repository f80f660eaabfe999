package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The engine must not depend on the parquet writer's physical
  * timestamp annotation: the round-8 testdata switch from
  * TIMESTAMP(NANOS) to naive TIMESTAMP(MICROS) surfaced `ts` as
  * TIMESTAMP_NTZ and broke every `unix_micros` call site. Pins the
  * Tables-level normalization that makes all queries insensitive to
  * the annotation. */
class TablesSpec extends AnyFunSuite {
  import TestSpark.spark

  test("TIMESTAMP_NTZ columns normalize to session-TZ TimestampType with identical micros") {
    val dir = Files.createTempDirectory("graft-tables").toString
    spark.sql(
      """SELECT id AS event_id,
        |  TIMESTAMP_NTZ '2024-01-02 03:04:05.678901' + make_interval(0,0,0,0,0,0,id) AS ts
        |FROM range(5)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // raw read surfaces NTZ (the round-8 shape)...
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    // ...Tables normalizes, and unix_micros analyzes + matches the
    // wall-clock value (session TZ is UTC, so the cast is annotation-only)
    val t = Tables(spark, dir, "events")
    assert(t.schema("ts").dataType == TimestampType)
    val us = t.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val base = java.time.LocalDateTime.parse("2024-01-02T03:04:05.678901")
      .toInstant(java.time.ZoneOffset.UTC)
    val expect = (0 until 5)
      .map(i => base.getEpochSecond * 1000000L + base.getNano / 1000L + i * 1000000L)
    assert(us.toSeq == expect)
  }

  test("tables without NTZ columns load unchanged") {
    val docs = Tables(spark, TestSpark.Sf, "documents")
    assert(!docs.schema.exists(_.dataType == TimestampNTZType))
    assert(docs.count() > 0)
  }
}
