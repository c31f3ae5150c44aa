import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
val s2 = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
s2.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.01"
def nodes(p: SparkPlan): Seq[SparkPlan] =
  p.collect { case n => n }.flatMap {
    case q: QueryStageExec => Seq(q) ++ nodes(q.plan)
    case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.executedPlan)
    case n => Seq(n)
  }
def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
  df.collect()
  val all = nodes(df.queryExecution.executedPlan)
  println(s"Q=$name GENERATES=" + all.count(_.getClass.getSimpleName.contains("Generate")) +
    " SCANS=" + all.count(n => n.getClass.getSimpleName.contains("FileSourceScan") || n.getClass.getSimpleName.contains("BatchScan")) +
    " INMEM=" + all.count(_.getClass.getSimpleName.contains("InMemoryTableScan")) +
    " REUSED=" + all.count(_.isInstanceOf[ReusedExchangeExec]) +
    " SHUFFLES=" + all.count(_.getClass.getSimpleName == "ShuffleExchangeExec"))
}
report("q_text_logprob_build", graft.queries.TextQueries.logprobPerDocBuild(s2, d))
report("q_graph_walks", graft.SparkEntry.queries("q_graph_walks")(s2, d))
report("q_text_mixture_epochs", graft.SparkEntry.queries("q_text_mixture_epochs")(s2, d))
report("q_text_tfidf", graft.SparkEntry.queries("q_text_tfidf")(s2, d))
report("q_text_bm25", graft.SparkEntry.queries("q_text_bm25")(s2, d))
report("q_text_pmi", graft.SparkEntry.queries("q_text_pmi")(s2, d))
sys.exit(0)
