// In-JVM alternating A/B of AQE conf values on the iterative-loop queries.
// Alternation cancels host drift: each config's samples interleave in time.
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -I tools/probe_loop_ab.scala
import org.apache.spark.sql.SparkSession
val s2 = SparkSession.builder().getOrCreate()
s2.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.1"
graft.GraftFunctions.register(s2)

// per-job/stage witness: total tasks + stage count per timed sample
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

val g = graft.graph.GraphCatalog.tpch(s2, d)
// warm the shared graph + one untimed run of each query body
def runCold(): Long = {
  val r = graft.graph.PageRank.run(g.pages, g.edges)
  val c = r.count()
  graft.plans.Lineage.freeScratch(s2)
  c
}
def runKcore(): Long = {
  val r = graft.SparkEntry.queries("q_graph_kcore")(s2, d)
  val c = r.count()
  graft.plans.Lineage.freeScratch(s2)
  c
}
runCold(); runKcore()

case class Sample(sec: Double, jobs: Int, stages: Int, tasks: Int)
def timed(f: () => Long): Sample = {
  jobs = 0; stages = 0; tasks = 0
  val t0 = System.nanoTime()
  f()
  val dt = (System.nanoTime() - t0) / 1e9
  Sample(dt, jobs, stages, tasks)
}

val confs = Seq(
  "default"  -> Map[String, String](),
  "pf_false" -> Map("spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false"),
  "aqe_off"  -> Map("spark.sql.adaptive.enabled" -> "false")
)
val keys = confs.flatMap(_._2.keys).distinct
def withConf(m: Map[String, String])(body: => Sample): Sample = {
  val saved = keys.map(k => k -> s2.conf.getOption(k)).toMap
  try { m.foreach { case (k, v) => s2.conf.set(k, v) }; body }
  finally saved.foreach { case (k, vo) =>
    vo.fold(s2.conf.unset(k))(v => s2.conf.set(k, v)) }
}

for ((qname, body) <- Seq("pagerank_cold" -> (() => runCold()),
                          "kcore" -> (() => runKcore()))) {
  val acc = scala.collection.mutable.Map.empty[String, List[Sample]]
    .withDefaultValue(Nil)
  for (_ <- 1 to 4; (cn, cm) <- confs) {
    val s = withConf(cm)(timed(body))
    acc(cn) = s :: acc(cn)
  }
  for ((cn, _) <- confs) {
    val ss = acc(cn).sortBy(_.sec)
    val med = ss(ss.length / 2)
    println(f"PROBE $qname%-14s $cn%-9s median=${med.sec}%6.3f s  " +
      f"min=${ss.head.sec}%6.3f  jobs=${med.jobs}%3d stages=${med.stages}%3d " +
      f"tasks=${med.tasks}%5d  all=${ss.map(x => f"${x.sec}%.2f").mkString(",")}")
  }
}
sys.exit(0)
