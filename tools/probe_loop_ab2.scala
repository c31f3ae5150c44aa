// Round 2: in-JVM alternating A/B — AQE off and size-derived shuffle
// partitions for the iterative-loop queries + BPE trainer.
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -I tools/probe_loop_ab2.scala
import org.apache.spark.sql.SparkSession
val s2 = SparkSession.builder().getOrCreate()
s2.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.1"
graft.GraftFunctions.register(s2)

@volatile var stages = 0
@volatile var tasks = 0
@volatile var jobs = 0
s2.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    stages += 1; tasks += sc.stageInfo.numTasks
  }
  override def onJobStart(
      j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
})

def runQ(name: String): () => Long = { () =>
  val c = graft.SparkEntry.queries(name)(s2, d).count()
  graft.plans.Lineage.freeScratch(s2)
  c
}
val queries = Seq(
  "q_pagerank_cold", "q_pagerank_redistributed", "q_pagerank_incremental",
  "q_graph_components", "q_text_bpe_train")
queries.foreach(q => runQ(q)())  // warm (builds stores/memos once)

case class Sample(sec: Double, jobs: Int, stages: Int, tasks: Int)
def timed(f: () => Long): Sample = {
  jobs = 0; stages = 0; tasks = 0
  val t0 = System.nanoTime()
  f()
  val dt = (System.nanoTime() - t0) / 1e9
  Sample(dt, jobs, stages, tasks)
}

val confs = Seq(
  "default" -> Map[String, String](),
  "aqe_off" -> Map("spark.sql.adaptive.enabled" -> "false"),
  "aqe_off_sp8" -> Map("spark.sql.adaptive.enabled" -> "false",
    "spark.sql.shuffle.partitions" -> "8"),
  "aqe_off_sp2" -> Map("spark.sql.adaptive.enabled" -> "false",
    "spark.sql.shuffle.partitions" -> "2")
)
val keys = confs.flatMap(_._2.keys).distinct
def withConf(m: Map[String, String])(body: => Sample): Sample = {
  val saved = keys.map(k => k -> s2.conf.getOption(k)).toMap
  try { m.foreach { case (k, v) => s2.conf.set(k, v) }; body }
  finally saved.foreach { case (k, vo) =>
    vo.fold(s2.conf.unset(k))(v => s2.conf.set(k, v)) }
}

for (qname <- queries) {
  val body = runQ(qname)
  val acc = scala.collection.mutable.Map.empty[String, List[Sample]]
    .withDefaultValue(Nil)
  for (_ <- 1 to 3; (cn, cm) <- confs) {
    val s = withConf(cm)(timed(body))
    acc(cn) = s :: acc(cn)
  }
  for ((cn, _) <- confs) {
    val ss = acc(cn).sortBy(_.sec)
    val med = ss(ss.length / 2)
    println(f"PROBE ${qname.drop(2)}%-24s $cn%-12s median=${med.sec}%6.3f  " +
      f"min=${ss.head.sec}%6.3f  jobs=${med.jobs}%3d stages=${med.stages}%3d " +
      f"tasks=${med.tasks}%5d  all=${ss.map(x => f"${x.sec}%.2f").mkString(",")}")
  }
}
sys.exit(0)
