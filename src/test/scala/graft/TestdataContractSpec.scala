package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the driver-generated testdata surface. The driver
  * regenerates /root/testdata between rounds and has already shipped
  * one silent schema drift (events.ts alternating between parquet
  * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) — round 6 lost 13 gate
  * queries to it before [[Tables.deriveTsNs]] went adaptive). This
  * spec pins, on the LIVE sf0.001 data, exactly the invariants the
  * query pack depends on — tolerantly, so representation changes the
  * engine absorbs (int32 vs int64 keys, float vs double embeddings,
  * any supported ts width) stay green, while a drift the engine would
  * miscompute on fails here with an actionable message instead of as
  * a pile of opaque gate failures.
  */
class TestdataContractSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def fieldType(table: String, column: String): DataType = {
    val schema = Tables(spark, sf, table).schema
    val f = schema.fields.find(_.name == column)
    assert(f.isDefined,
      s"$table has no column `$column` — the pack's queries reference it; " +
        s"actual schema: ${schema.fieldNames.mkString(", ")}")
    f.get.dataType
  }

  private def assertIntegral(table: String, column: String): Unit = {
    val t = fieldType(table, column)
    assert(t == IntegerType || t == LongType,
      s"$table.$column must be an integral key (got $t)")
  }

  private def assertFractional(table: String, column: String): Unit = {
    val t = fieldType(table, column)
    assert(t == FloatType || t == DoubleType || t.isInstanceOf[DecimalType],
      s"$table.$column must be fractional (got $t)")
  }

  private def assertString(table: String, column: String): Unit = {
    val t = fieldType(table, column)
    assert(t == StringType, s"$table.$column must be a string (got $t)")
  }

  test("graph tables carry the FK structure the property graph is built from") {
    assertIntegral("region", "r_regionkey"); assertString("region", "r_name")
    assertIntegral("nation", "n_nationkey"); assertIntegral("nation", "n_regionkey")
    assertString("nation", "n_name")
    assertIntegral("customer", "c_custkey"); assertIntegral("customer", "c_nationkey")
    assertString("customer", "c_name"); assertFractional("customer", "c_acctbal")
    assertString("customer", "c_mktsegment")
    assertIntegral("supplier", "s_suppkey"); assertIntegral("supplier", "s_nationkey")
    assertString("supplier", "s_name"); assertFractional("supplier", "s_acctbal")
    assertIntegral("part", "p_partkey"); assertString("part", "p_brand")
    assertString("part", "p_type"); assertFractional("part", "p_retailprice")
    assertIntegral("orders", "o_orderkey"); assertIntegral("orders", "o_custkey")
    assertString("orders", "o_orderstatus"); assertFractional("orders", "o_totalprice")
    assertString("orders", "o_orderpriority")
    assertIntegral("lineitem", "l_orderkey"); assertIntegral("lineitem", "l_partkey")
    assertIntegral("lineitem", "l_suppkey")
    assertFractional("lineitem", "l_quantity")
    assertFractional("lineitem", "l_extendedprice")
    assertFractional("lineitem", "l_discount")
    assertString("lineitem", "l_returnflag")
  }

  test("lineitem/orders date columns are types min/max passes through to the oracle") {
    // q18 min/max and the rollup/pivot date arithmetic work for any of
    // these; a LongType here would mean a NANOS regeneration read under
    // nanosAsLong — then the engine-side normalization pattern of
    // Tables.deriveTsNs must be extended to these columns too
    for ((t, c) <- Seq(("lineitem", "l_shipdate"), ("orders", "o_orderdate"))) {
      val dt = fieldType(t, c)
      assert(dt == TimestampType || dt == TimestampNTZType || dt == DateType,
        s"$t.$c drifted to $dt — extend the adaptive-timestamp pattern " +
          "(Tables.deriveTsNs) before trusting any gate results")
    }
  }

  test("events normalizes to the LongType ts_ns engine convention on live data") {
    // EventsTsWidthSpec pins this on synthetic fixtures at every width;
    // this asserts it on whatever the driver actually shipped
    val ev = Tables.events(spark, sf)
    val f = ev.schema.fields.find(_.name == "ts_ns")
    assert(f.isDefined && f.get.dataType == LongType,
      s"Tables.events must expose LongType ts_ns; got ${ev.schema.treeString}")
    assertIntegral("events", "event_id"); assertIntegral("events", "user_id")
    assertString("events", "event_type"); assertFractional("events", "value")
    assertString("events", "props")
  }

  test("documents and embeddings carry the text/vector pipeline columns") {
    assertIntegral("documents", "doc_id"); assertString("documents", "text")
    assertString("documents", "lang"); assertString("documents", "source")
    assertIntegral("documents", "n_chars")
    assertIntegral("embeddings", "vec_id"); assertIntegral("embeddings", "label")
    val t = fieldType("embeddings", "embedding")
    t match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case other => fail(
        s"embeddings.embedding must be array<float|double> (got $other) — " +
          "the DotProduct expression and the fixed-point oracles assume it")
    }
  }

  // schema pins above guard TYPES; the similarity/dedup family also
  // leans on DATA invariants a regeneration could silently break: the
  // shingle/fingerprint paths key on non-null doc_id+text, the
  // LSH/IVF/cosine paths assume one uniform embedding dimensionality
  // (hyperplanes and centroids are sized from it) with no NaN/null
  // elements (a single NaN poisons every dot product it touches).
  // Events' silent width drift cost 13 gate queries in round 6 — these
  // columns get the same loud-failure treatment
  test("documents/embeddings data invariants the similarity family assumes") {
    val docs = Tables.documents(spark, sf)
    assert(docs.filter(col("doc_id").isNull || col("text").isNull).count() == 0,
      "documents.doc_id/text must be non-null — dedup keys on both")
    assert(docs.select("doc_id").distinct().count() == docs.count(),
      "doc_id must be unique — cluster representatives assume it")
    val emb = Tables.embeddings(spark, sf)
    assert(emb.filter(col("vec_id").isNull || col("embedding").isNull).count() == 0,
      "embeddings.vec_id/embedding must be non-null")
    assert(emb.select("vec_id").distinct().count() == emb.count(),
      "vec_id must be unique — top-k dedups on it")
    val dims = emb.select(size(col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(dims.length == 1 && dims.head > 0,
      s"embedding dim must be one positive constant (got $dims) — " +
        "hyperplane/IVF geometry is sized from it")
    assert(emb.filter(exists(col("embedding"),
        x => x.isNull || isnan(x.cast("double")))).count() == 0,
      "embedding elements must be finite non-null — NaN poisons cosine")
  }
}
