package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe of the explode-heavy text queries: cold + warm timings
  * under the current fixture path (relayout on/off via env). */
object TextBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("PROBE_RELAYOUT").contains("off"))
      graft.queries.Relational.docsRelayoutEnabled = false
    val df = graft.queries.Relational.t(spark, sfDir, "documents")
    df.cache().count()
    println(s"PROBE docs partitions=${df.rdd.getNumPartitions}")
    for (round <- 1 to 3;
         q <- Seq("t_dup_spans", "t_decontaminate", "t_ngram_stats",
           "t_repetition")) {
      val t0 = System.nanoTime()
      graft.queries.TextOps.defs(q)(spark, sfDir).collect()
      println(f"PROBE $round $q ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
