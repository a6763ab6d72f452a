package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  private val defaults = Seq("q_groupby_agg", "q_count_star", "q_in_between",
    "q_minhash_signature", "q_cosine_knn", "q_sql_local_supply",
    "q_session_window", "q_ivf_search", "q_range_join")
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else defaults
    for (n <- names) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
