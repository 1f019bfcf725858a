package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift firewall for the events loader. The driver's testdata
  * generator has shipped `events.parquet` with three different physical
  * `ts` encodings across rounds: INT64 TIMESTAMP(NANOS) (which Spark reads
  * as LongType under spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP_NTZ
  * (DuckDB's isAdjustedToUTC=false micros), and session-zoned TIMESTAMP.
  * A regeneration flipping the encoding once stranded five registry
  * queries for two rounds (r8–r9: cast(timestamp_ntz as double) fails
  * analysis). This spec pins all three encodings to one identical output
  * frame so the next drift breaks HERE, loudly, instead of in the driver's
  * correctness artifact.
  */
class TablesSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** (event_id, micros-since-epoch, value) fixture with sub-second parts so
    * truncation bugs (s vs ms vs us) can't cancel out.
    */
  private val fixture = Seq(
    (1L, 1704067200000000L, 1.5), // 2024-01-01T00:00:00Z
    (2L, 1704110445123456L, 2.5), // 2024-01-01T12:00:45.123456Z
    (3L, 1706744699999999L, 3.5)) // 2024-01-31T23:44:59.999999Z

  private def writeVariant(dir: java.io.File, tsExpr: String): String = {
    val df = fixture.toDF("event_id", "us", "value")
      .select(col("event_id"), expr(tsExpr).as("ts"), col("value"))
    df.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").getPath)
    dir.getPath
  }

  test("events loader yields identical frames for all three ts encodings") {
    val base = java.nio.file.Files.createTempDirectory("graft_ts_enc").toFile
    // (a) pre-normalized long: exactly what nanosAsLong hands the loader
    //     after reading INT64 TIMESTAMP(NANOS) — nanos in a LongType column
    val longDir = writeVariant(new java.io.File(base, "nanos"), "us * 1000")
    // (b) TIMESTAMP_NTZ micros — the current DuckDB-written testdata form
    val ntzDir = writeVariant(new java.io.File(base, "ntz"),
      "cast(timestamp_micros(us) as timestamp_ntz)")
    // (c) session-zoned TIMESTAMP — the classic Spark-written form
    val ltzDir = writeVariant(new java.io.File(base, "ltz"),
      "timestamp_micros(us)")

    val frames = Seq(longDir, ntzDir, ltzDir).map { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$d: ts must normalize to TimestampType, got ${df.schema("ts")}")
      df.select(col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    }
    assert(frames(0) == frames(1), "long-nanos vs TIMESTAMP_NTZ drift")
    assert(frames(0) == frames(2), "long-nanos vs TIMESTAMP drift")
    assert(frames(0).map(_._2) == fixture.map(_._2),
      "normalized micros must equal the source instants")

    // epoch arithmetic — the exact pattern that failed analysis on NTZ —
    // must analyze on the loader's output for every encoding
    Seq(longDir, ntzDir, ltzDir).foreach { d =>
      val secs = Tables.events(spark, d)
        .select(col("ts").cast("double").as("s")).collect().map(_.getDouble(0))
      assert(secs.length == 3 && secs.forall(_ > 1.7e9), s"$d: epoch cast")
    }
  }

  test("normalizeTs leaves already-normalized frames untouched") {
    val df = Seq((1L, "a")).toDF("id", "name")
      .withColumn("ts", current_timestamp())
    assert(Tables.normalizeTs(df).schema == df.schema)
  }

  test("normalizeTs names the missing column on renamed/dropped drift") {
    val df = Seq((1L, "a")).toDF("id", "name")
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("testdata drift") &&
      e.getMessage.contains("'ts'"), e.getMessage)
  }
}
