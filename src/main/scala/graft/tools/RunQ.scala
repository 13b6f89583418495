package graft.tools
import org.apache.spark.sql.SparkSession
object RunQ {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("RUNQ_DIR", "/root/testdata/sf0.001")
    for (q <- args) {
      println(s"##### $q")
      graft.SparkEntry.queries(q)(s, dir).show(50, false)
    }
    s.stop()
  }
}
