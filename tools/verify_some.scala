// Ad-hoc selective verify: spark-shell --driver-class-path target/scala-2.13/classes \
//   -I tools/verify_some.scala  with env SFDIR, OUTDIR, QUERIES (comma-sep)
val sfDir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.01")
val outDir = sys.env.getOrElse("OUTDIR", "/tmp/out_some")
val names = sys.env("QUERIES").split(",").toSeq
spark.conf.set("spark.sql.session.timeZone", "UTC")
new java.io.File(outDir).mkdirs()
for (n <- names) {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(n)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
  println(f"MYTAG $n done ${(System.nanoTime()-t0)/1e9}%.2f s")
}
def q(s: String): String = "\"" + s.flatMap {
  case '"'  => "\\\""
  case '\\' => "\\\\"
  case '\n' => "\\n"
  case '\r' => "\\r"
  case '\t' => "\\t"
  case c if c < ' ' => f"\\u${c.toInt}%04x"
  case c => c.toString
} + "\""
val json = graft.SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
println("MYTAG all done")
sys.exit(0)
