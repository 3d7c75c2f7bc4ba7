package graft.tools
import org.apache.spark.sql.SparkSession
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = graft.SparkEntry.queries(sys.env("GRAFT_Q"))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println(plan.split("\n").filter(l => l.contains("Aggregate") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
