package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp-width drift guard. The driver has shipped `events.ts` at
  * BOTH parquet widths across testdata generations — TIMESTAMP(NANOS)
  * (readable only as raw long under `nanosAsLong`) and
  * TIMESTAMP(MICROS) (a native timestamp column) — and a hard-coded
  * reader for one width breaks the entire temporal surface when the
  * other arrives. Pin the contract: [[Tables.events]] yields LongType
  * `ts_ns` with IDENTICAL epoch-nanos values for every width and
  * isAdjustedToUTC flavor, so the next regeneration is a no-op.
  *
  * Fixtures are written with parquet-mr's example API (on the Spark
  * classpath) because Spark itself cannot write TIMESTAMP(NANOS). */
class EventsTsWidthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // epoch instants in nanos; all multiples of 1000 so µs storage is
  // exact and the widths can agree bit-for-bit
  private val instantsNs =
    Seq(0L, 1700000000123456000L, 1700003600000001000L)

  /** Write `<tmpdir>/events.parquet` with (event_id int64, ts int64
    * TIMESTAMP(unit, utc)); returns the dir Tables.events reads. */
  private def writeFixture(unit: TimeUnit, utc: Boolean,
      toUnits: Long => Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("events_width")
    dir.toFile.deleteOnExit()
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(utc, unit)).named("ts")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withConf(new Configuration()).withType(schema).build()
    val groups = new SimpleGroupFactory(schema)
    instantsNs.zipWithIndex.foreach { case (v, i) =>
      writer.write(groups.newGroup()
        .append("event_id", i.toLong).append("ts", toUnits(v)))
    }
    writer.close()
    dir.toString
  }

  test("events reader normalizes every shipped timestamp width to epoch-nanos long") {
    val expected = instantsNs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val fixtures = Seq(
      ("nanos", TimeUnit.NANOS, false, identity[Long] _),
      ("nanos_utc", TimeUnit.NANOS, true, identity[Long] _),
      ("micros", TimeUnit.MICROS, false, (n: Long) => n / 1000L),
      ("micros_utc", TimeUnit.MICROS, true, (n: Long) => n / 1000L))
    fixtures.foreach { case (label, unit, utc, toUnits) =>
      val df = Tables.events(spark, writeFixture(unit, utc, toUnits))
      assert(df.schema("ts_ns").dataType == LongType,
        s"$label: ts_ns must be LongType, got ${df.schema("ts_ns").dataType}")
      // the derivation replaces ts in place — no stray ts column
      assert(!df.columns.contains("ts"), s"$label: raw ts column leaked")
      val rows = df.orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == expected, s"$label: ts_ns values drifted")
    }
  }

  test("driver testdata reads as long ts_ns in the original column slot") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts_ns").dataType == LongType)
    // in-place normalization: ts_ns sits where ts was (column 2 of the
    // driver schema event_id, ts, user_id, event_type, value, props)
    assert(df.schema.fieldNames(1) == "ts_ns")
    val mn = df.agg(org.apache.spark.sql.functions.min("ts_ns"))
      .head().getLong(0)
    assert(mn > 0 && mn % 1000L == 0,
      s"µs-origin data must be an exact nanos multiple of 1000, got $mn")
  }
}
