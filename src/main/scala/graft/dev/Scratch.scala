package graft.dev
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.Relational.queries("q_rollup")(spark, "/root/testdata/sf0.001")
    df.show(5)
    spark.stop()
  }
}
