package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver-generated parquet fixtures.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed a logical type once (round 6: events.ts INT64-nanos →
  * TIMESTAMP_MICROS NTZ), which surfaced as 13 queries and 12 tests dying
  * in deep Catalyst analysis errors instead of one clear signal. This spec
  * pins the expected column names and types of all 10 input tables so the
  * NEXT silent regeneration fails HERE, with a message that says what
  * happened, before anything else runs.
  *
  * events.ts is asserted as "one of the encodings normalizeEventTs
  * handles" (long-nanos OR timestamp OR timestamp_ntz) rather than a
  * single type — the loader is deliberately adaptive across fixture
  * generations.
  */
class FixtureContractSpec extends SparkSpec {

  private val drift =
    "DRIVER FIXTURES CHANGED — update graft.Tables loaders (and this contract)"

  private def assertSchema(table: String, expected: Seq[(String, DataType)]): Unit = {
    val got = Tables.load(spark, sf0001, table).schema
      .map(f => f.name -> f.dataType)
    assert(got == expected,
      s"\n$drift\ntable=$table\n  expected: $expected\n  got:      $got")
  }

  test("region/nation/customer/supplier/part match the contract") {
    assertSchema("region", Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertSchema("customer", Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertSchema("supplier", Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertSchema("part", Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders/lineitem match the contract (date columns may be ltz or ntz)") {
    val ts = Set[DataType](TimestampType, TimestampNTZType)
    val o = Tables.orders(spark, sf0001).schema.map(f => f.name -> f.dataType)
    assert(o.map(_._1) == Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"), s"$drift orders columns: $o")
    assert(ts.contains(o(4)._2), s"$drift o_orderdate type: ${o(4)._2}")
    assert(o.map(_._2).patch(4, Nil, 1) == Seq(LongType, LongType, StringType,
      DoubleType, StringType), s"$drift orders types: $o")

    val l = Tables.lineitem(spark, sf0001).schema.map(f => f.name -> f.dataType)
    assert(l.map(_._1) == Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"), s"$drift lineitem columns: $l")
    assert(ts.contains(l(10)._2), s"$drift l_shipdate type: ${l(10)._2}")
  }

  test("events matches the contract; ts is an encoding normalizeEventTs handles") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Tables.load(spark, sf0001, "events").schema
      .map(f => f.name -> f.dataType)
    assert(raw.map(_._1) == Seq("event_id", "ts", "user_id", "event_type",
      "value", "props"), s"$drift events columns: $raw")
    val tsType = raw(1)._2
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(tsType),
      s"$drift events.ts read as $tsType — extend Tables.normalizeEventTs")
    // and the normalized form every consumer sees is micros TimestampType
    val norm = Tables.events(spark, sf0001).schema("ts").dataType
    assert(norm == TimestampType, s"$drift normalizeEventTs produced $norm")
  }

  test("documents/embeddings match the contract") {
    assertSchema("documents", Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("all 10 tables are non-empty at sf0.001") {
    Tables.all.foreach { t =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      assert(Tables.load(spark, sf0001, t).limit(1).count() == 1L,
        s"$drift table=$t is empty or unreadable")
    }
  }
}
