package graft

import org.apache.spark.sql.SparkSession

/** Quick local smoke of the flagship pipeline (the driver's t1 check):
  * prints the row count and a sample of SparkEntry.entry on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.cache()
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(5, 80)
    df.printSchema()
    spark.stop()
  }
}
