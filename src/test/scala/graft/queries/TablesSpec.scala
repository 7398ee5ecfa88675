package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins `Tables.normalizeTs` across the three parquet timestamp encodings
  * the round driver has shipped for `events.ts` (TIMESTAMP(NANOS) read as
  * long under nanosAsLong, `timestamp[us]` with no UTC flag read as
  * TIMESTAMP_NTZ, and plain TIMESTAMP). A regenerated corpus that lands
  * on any of these must produce identical TimestampType values — round
  * 12 lost seven event-time queries to a silent NTZ shift, and this is
  * the named canary for the next one.
  */
class TablesSpec extends SparkSpec {

  // 2021-03-04T05:06:07.123456Z and a second-boundary value, in micros.
  private val micros = Seq(1614834367123456L, 1614834368000000L)

  test("normalizeTs: nanos-as-long, TIMESTAMP_NTZ, and TIMESTAMP all land on the same TimestampType values") {
    import spark.implicits._
    val scratch = scratchDir("tables_ts")

    // plain TIMESTAMP (isAdjustedToUTC) — written under the UTC session
    micros.toDF("us").select(expr("timestamp_micros(us)").as("ts"))
      .write.parquet(s"$scratch/tz")
    // TIMESTAMP_NTZ — what `timestamp[us]` with no UTC flag reads as
    micros.toDF("us")
      .select(expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$scratch/ntz")
    // nanos-as-long — the shape the nanosAsLong legacy flag produces
    micros.map(_ * 1000L).toDF("ts").write.parquet(s"$scratch/nanos")

    val results = Seq("tz", "ntz", "nanos").map { enc =>
      val raw = spark.read.parquet(s"$scratch/$enc")
      val fixed = Tables.normalizeTs(raw)
      assert(fixed.schema("ts").dataType === TimestampType,
        s"$enc must normalize to TimestampType")
      enc -> fixed.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    }.toMap

    assert(results("ntz").headOption.nonEmpty)
    // value-preserving across every encoding, at µs precision
    results.values.foreach(v => assert(v === micros))

    // pre-conditions of the test itself: the raw reads really are the
    // three distinct encodings (otherwise this spec pins nothing)
    assert(spark.read.parquet(s"$scratch/ntz").schema("ts").dataType === TimestampNTZType)
    assert(spark.read.parquet(s"$scratch/nanos").schema("ts").dataType === LongType)
    assert(spark.read.parquet(s"$scratch/tz").schema("ts").dataType === TimestampType)
  }

  test("normalizeTs output supports event-time primitives (unix_micros, watermark typing)") {
    import spark.implicits._
    val scratch = scratchDir("tables_ts_wm")
    micros.toDF("us")
      .select(expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$scratch/ntz")
    val fixed = Tables.normalizeTs(spark.read.parquet(s"$scratch/ntz"))
    // unix_micros rejects NTZ — this is exactly what broke q_range_join
    assert(fixed.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq === micros)
    // withWatermark rejects NTZ event time; on a batch frame it is a
    // no-op but still type-checks the column
    assert(fixed.withWatermark("ts", "1 hour").count() === 2L)
  }
}
