// Probe 2: q_pagerank_redistributed — dangling-flag-in-aggregate variant
// vs the r10 every-iteration-checkpoint shape (both eager cadence 1).
// Flag variant: the zero keep-alive frame carries isDangling per page;
// max(dang) rides the contribution aggregate, so dmass_i = sum(rank*dang)
// over the rank vector — no per-iteration semi-join, no dangling broadcast.
// Run: SFDIR=... /opt/spark/bin/spark-shell --master local[32] --driver-memory 8g \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false -I tools/probe_pr2.scala
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
val damping = 0.85; val resetProb = 0.15

// r10 shape: semi-join dmass, eager checkpoint every iteration
def loopSemi(iters: Int = 8): (Double, Double) = {
  val t0 = System.nanoTime()
  val zero = p.select(col("page").as("dst"), lit(0.0).as("contrib"))
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
    val t = next.localCheckpoint(eager = true)
    graft.plans.Lineage.registerScratch(t)
    ranks = t
  }
  val s = ranks.agg(sum("rank")).collect()(0).getDouble(0)
  val dt = (System.nanoTime() - t0) / 1e9
  graft.plans.Lineage.freeScratch(spark)
  (dt, s)
}

// flag shape: dang column rides the aggregate; dmass = sum(rank*dang)
def loopFlag(iters: Int = 8): (Double, Double) = {
  val t0 = System.nanoTime()
  val zeroF = p.join(deg, p("page") === deg("src"), "left_outer")
    .select(p("page").as("dst"), lit(0.0).as("contrib"),
      when(deg("src").isNull, lit(1.0)).otherwise(lit(0.0)).as("dang"))
    .persist(StorageLevel.MEMORY_AND_DISK)
  zeroF.count()
  var ranks = zeroF.select(col("dst").as("page"),
    (lit(1.0) / lit(n)).as("rank"), col("dang"))
  for (i <- 1 to iters) {
    val contribs = ewd.join(broadcast(ranks), ewd("src") === ranks("page"))
      .select(col("dst"), (col("rank") / col("deg")).as("contrib"),
        lit(0.0).as("dang"))
    val mass = contribs.unionAll(zeroF).groupBy("dst")
      .agg(sum("contrib").as("mass"), max("dang").as("dang"))
    val dm = ranks.agg(sum(col("rank") * col("dang")).as("dmass"))
    val next = mass.crossJoin(broadcast(dm))
      .select(col("dst").as("page"),
        (lit(resetProb / n) + lit(damping) * (col("mass") + col("dmass") / lit(n))).as("rank"),
        col("dang"))
    val t = next.localCheckpoint(eager = true)
    graft.plans.Lineage.registerScratch(t)
    ranks = t
  }
  val s = ranks.agg(sum("rank")).collect()(0).getDouble(0)
  val dt = (System.nanoTime() - t0) / 1e9
  graft.plans.Lineage.freeScratch(spark)
  (dt, s)
}

for ((nm, f) <- Seq(("semi", () => loopSemi()), ("flag", () => loopFlag()),
    ("semi2", () => loopSemi()), ("flag2", () => loopFlag()))) {
  f() // warm
  val ss = Seq.fill(3)(f()).sortBy(_._1)
  println(f"MYTAG $nm median=${ss(1)._1}%.3f sum=${ss(1)._2}%.6f all=${ss.map(x => f"${x._1}%.3f").mkString(",")}")
}
sys.exit(0)
