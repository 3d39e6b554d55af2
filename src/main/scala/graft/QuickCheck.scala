package graft
import org.apache.spark.sql.SparkSession
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      val df = SparkEntry.queries(q)(spark, args.head)
      println(s"=== $q rows=${df.count()}")
      df.show(8, false)
    }
    spark.stop()
  }
}
