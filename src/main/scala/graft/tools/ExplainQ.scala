package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- args) {
      println(s"##### $q")
      println(graft.SparkEntry.queries(q)(s, dir).queryExecution.executedPlan.toString.take(6000))
    }
    s.stop()
  }
}
