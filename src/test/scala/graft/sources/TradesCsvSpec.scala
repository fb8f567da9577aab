package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** CSV round-trip fidelity for the trade-handoff surface: typed nulls,
  * full-precision doubles, dates and booleans must all survive
  * write → read(schema) bit-exactly. */
class TradesCsvSpec extends SparkSpec {

  test("nulls, doubles, dates and booleans round-trip bit-exactly") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType),
      StructField("d", DateType),
      StructField("flag", BooleanType),
      StructField("name", StringType)))
    val rows = Seq(
      Row(1L, 0.1 + 0.2, java.sql.Date.valueOf("2024-01-12"), true, "alpha"),
      Row(2L, null, null, null, null),
      Row(3L, -1.7976931348623157e308, java.sql.Date.valueOf("1970-01-01"), false, "beta"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = s"${sys.props("java.io.tmpdir")}/graft-csv-spec"
    CsvTables.write(df, path)
    val back = CsvTables.read(spark, path, schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "CSV round trip changed values")
    // the tricky double survives at full precision, not display precision
    val got = back.where("id = 1").head().getDouble(1)
    assert(got == 0.1 + 0.2 && got != 0.3)
  }
}
