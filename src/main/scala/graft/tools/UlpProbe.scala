package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object UlpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.maxFields", "500")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val bars = graft.features.Bars.daily(graft.Tables.events(spark, d))
    val f = graft.features.Recursive.withRecursive(
      graft.features.Indicators.withHighLow(
        graft.features.Indicators.windowed(bars, Seq(3, 5, 10, 20, 50))))
    f.where(col("symbol_id") === 1398 && col("date") <= lit("2024-01-04").cast("date"))
      .select("symbol_id", "date", "close", "ohlcv_macd", "ohlcv_macd_signal", "ohlcv_macd_histogram")
      .orderBy("date")
      .collect().foreach { r =>
        def hex(i: Int) = if (r.isNullAt(i)) "null" else java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(r.getDouble(i)))
        println(s"${r.get(1)} close=${r.getDouble(2)} macd=${hex(3)} sig=${hex(4)} hist=${hex(5)} vals=${(3 to 5).map(i => if (r.isNullAt(i)) null else r.getDouble(i))}")
      }
    spark.stop()
  }
}
