import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries("d08_dedup_components")
    val t0 = System.nanoTime(); fn(spark, "/root/testdata/sf0.1").count()
    val t1 = System.nanoTime(); fn(spark, "/root/testdata/sf0.1").count()
    val t2 = System.nanoTime()
    println(f"d08 pass1 ${(t1-t0)/1e9}%.2f s  pass2 ${(t2-t1)/1e9}%.2f s")
    spark.stop()
  }
}
