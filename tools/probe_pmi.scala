import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
val s2 = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
s2.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.01"
val df = graft.SparkEntry.queries("q_text_pmi")(s2, d)
df.collect()
def nodes(p: SparkPlan): Seq[SparkPlan] =
  p.collect { case n => n }.flatMap {
    case q: QueryStageExec => Seq(q) ++ nodes(q.plan)
    case a: AdaptiveSparkPlanExec => Seq(a) ++ nodes(a.executedPlan)
    case n => Seq(n)
  }
val all = nodes(df.queryExecution.executedPlan)
println("NODES=" + all.map(_.getClass.getSimpleName).groupBy(identity).view.mapValues(_.size).toMap.toSeq.sortBy(_._1).mkString(", "))
println("GENERATES=" + all.count(_.getClass.getSimpleName.contains("Generate")))
println("SCANS=" + all.count(n => n.getClass.getSimpleName.contains("FileSourceScan") || n.getClass.getSimpleName.contains("BatchScan")))
println("REUSED=" + all.count(_.isInstanceOf[ReusedExchangeExec]))
println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(8000))
sys.exit(0)
