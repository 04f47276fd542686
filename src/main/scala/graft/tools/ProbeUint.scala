package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev probe: how Spark maps parquet unsigned annotations. */
object ProbeUint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/repo/fixtures/uint.parquet")
    df.printSchema()
    df.orderBy("id").show(3)
    spark.stop()
  }
}
