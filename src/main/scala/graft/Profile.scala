package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // warm
      val t0 = System.nanoTime(); fn(spark, dir).count(); val t1 = System.nanoTime()
      val t2 = System.nanoTime(); fn(spark, dir).count(); val t3 = System.nanoTime()
      println(f"PROFILE $name cold=${(t1-t0)/1e9}%.2f warm=${(t3-t2)/1e9}%.2f")
      if (sys.env.contains("EXPLAIN")) fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
