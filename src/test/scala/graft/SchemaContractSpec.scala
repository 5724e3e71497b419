package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Contract between the driver-generated testdata and what the engine
  * assumes AFTER `Tables.load` normalization. Round-5 lesson: a testdata
  * regeneration flipped `events.ts` from TIMESTAMP(NANOS) to
  * timestamp[us] and broke nine queries with zero targeted signal — this
  * spec turns the next physical-type drift into ONE named red test.
  * Only load-bearing (name -> logical type) pairs are pinned; extra
  * columns the driver may add later are deliberately not an error.
  */
class SchemaContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  private val contract: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_returnflag" -> StringType),
    // ts is the one NORMALIZED column: whatever the parquet physical
    // type (nanos / micros / NTZ), load must yield epoch-nanos long.
    "events" -> Map("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  for ((table, cols) <- contract) {
    test(s"$table: load-bearing column types hold after Tables.load") {
      val schema = Tables.load(spark, dir, table).schema
      for ((col, expected) <- cols) {
        val f = schema.find(_.name == col)
        assert(f.isDefined, s"$table is missing column $col")
        // ArrayType comparison ignores containsNull — element type is
        // the load-bearing part.
        (f.get.dataType, expected) match {
          case (ArrayType(a, _), ArrayType(b, _)) => assert(a == b,
            s"$table.$col element type ${a} != expected ${b}")
          case (got, exp) => assert(got == exp,
            s"$table.$col is $got, engine assumes $exp")
        }
      }
    }
  }

  test("orders/lineitem date columns resolve to a timestamp family type") {
    // Queries use date_trunc/to_date over these; either TIMESTAMP or
    // TIMESTAMP_NTZ works (both accept datetime functions) — pin the
    // family, not the flavor, so a tz-flag drift doesn't false-alarm.
    val ok: DataType => Boolean =
      t => t == TimestampType || t == TimestampNTZType || t == DateType
    assert(ok(Tables.load(spark, dir, "orders").schema("o_orderdate").dataType))
    assert(ok(Tables.load(spark, dir, "lineitem").schema("l_shipdate").dataType))
  }

  test("events.ts spans a nonzero range and is plausibly epoch-nanos") {
    import org.apache.spark.sql.functions._
    val r = Tables.load(spark, dir, "events")
      .agg(min(col("ts")), max(col("ts"))).head
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo < hi, "ts must span a range")
    // epoch-nanos for any date 2001..2100 sits in [1e18, 4.2e18); a
    // micros value left un-normalized would be ~1e15 and fail here.
    assert(lo > 1.0e18.toLong && hi < 4.2e18.toLong,
      s"ts range [$lo,$hi] is not epoch-nanos — load normalization broken?")
  }
}
