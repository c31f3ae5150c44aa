// Probe: q_pagerank_redistributed truncation-cadence variants at sf0.1
// (VERDICT r9 item 3). r9 shape: dangling left_semi + sum, NO null-sink union
// — see the round-10 SURVEY gotcha on union-branch elimination for why the
// virtual-sink alternative was abandoned.
// Run: /opt/spark/bin/spark-shell --master local[32] --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false -I tools/probe_pr.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
spark.sparkContext.setLogLevel("ERROR")
val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.1")
val g = graft.graph.GraphCatalog.tpch(spark, dir)
val p = g.pages; val edges = g.edges; val n = g.n.toDouble
val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
val ewd = edges.join(broadcast(deg), "src").persist(StorageLevel.MEMORY_AND_DISK)
ewd.count()
val dangling = p.join(deg, p("page") === deg("src"), "left_anti")
  .select("page").persist(StorageLevel.MEMORY_AND_DISK)
dangling.count()
val zero = p.select(col("page").as("dst"), lit(0.0).as("contrib"))
val damping = 0.85; val resetProb = 0.15

// truncEvery k: eager localCheckpoint of `next` every k iters, lazy persist
// between (k=1 → eager every iteration, no lazy nesting at all)
def loop(truncEvery: Int, iters: Int = 8): (Double, Double) = {
  val t0 = System.nanoTime()
  val inter = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  var ranks = p.select(col("page"), (lit(1.0) / lit(n)).as("rank"))
  for (i <- 1 to iters) {
    val contribs = ewd.join(broadcast(ranks), ewd("src") === ranks("page"))
      .select(col("dst"), (col("rank") / col("deg")).as("contrib"))
    val mass = contribs.unionAll(zero).groupBy("dst").agg(sum("contrib").as("mass"))
    val dm = ranks.join(dangling, Seq("page"), "left_semi")
      .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
    val next = mass.crossJoin(broadcast(dm))
      .select(col("dst").as("page"),
        (lit(resetProb / n) + lit(damping) * (col("mass") + col("dmass") / lit(n))).as("rank"))
    ranks = if (i == iters) {
      val fin = next.localCheckpoint(eager = true)
      graft.plans.Lineage.registerScratch(fin)
      inter.foreach(_.unpersist(blocking = false)); fin
    } else if (i % truncEvery == 0) {
      val t = next.localCheckpoint(eager = true); graft.plans.Lineage.registerScratch(t); t
    } else {
      val c = next.persist(StorageLevel.MEMORY_AND_DISK); inter += c; c
    }
  }
  val sumRank = ranks.agg(sum("rank")).collect()(0).getDouble(0)
  val dt = (System.nanoTime() - t0) / 1e9
  graft.plans.Lineage.freeScratch(spark)
  (dt, sumRank)
}

for (te <- Seq(2, 1, 3, 4)) {
  loop(te) // warm
  val ss = Seq.fill(3)(loop(te)).sortBy(_._1)
  println(f"MYTAG trunc=$te median=${ss(1)._1}%.3f sum=${ss(1)._2}%.6f all=${ss.map(x => f"${x._1}%.3f").mkString(",")}")
}
sys.exit(0)
