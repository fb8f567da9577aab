package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time the GBT fit in isolation (the model_feature_importance
  * query's dominant cost) at a given SF dir. */
object FitTime {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "500")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"FITTIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    t("trainingFrame") { graft.ml.TradeSuccess.trainingFrame(spark, d).count() }
    t("fit+auc") { graft.ml.TradeSuccess.fitted(spark, d) }
    t("importances") { graft.ml.TradeSuccess.featureImportances(spark, d).count() }
    spark.stop()
  }
}
