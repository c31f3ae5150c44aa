package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `q_stream_drift` parity laws on the real sf0.001 events: the
  * streamed (window, type) aggregates are exact fixed-point integers
  * (so the gate result reconstructs from a BATCH aggregate restricted
  * to closed windows — order-free by construction), and the drift
  * column is the mean difference it claims to be. */
class StreamDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed windows equal the batch fixed-point aggregate behind " +
      "the watermark cutoff") {
    val got = SparkEntry.queries("q_stream_drift")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap

    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"),
        floor(col("value") * lit(1.0e6)).cast("long").as("fix"))
    val cutoff = Tables.events(spark, dir)
      .agg(max(col("ts"))).head().getTimestamp(0).getTime - 3600L * 1000
    val batch = ev
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("fix").as("sfix"))
      .filter(col("w.end").cast("long") * 1000 <= cutoff)
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n"), col("sfix"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    val st = ev.groupBy("event_type")
      .agg(sum("fix").as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    assert(got.keySet == batch.keySet && got.nonEmpty)
    batch.foreach { case (k, (n, sfix)) =>
      val (gn, wMean, drift) = got(k)
      assert(gn == n, s"$k count")
      val mean = math.floor(sfix.toDouble / n + 0.5) / 1.0e6
      assert(wMean == mean, s"$k mean $wMean vs $mean")
      val (ss, sc) = st(k._2)
      val refDrift = math.floor(
        sfix.toDouble / n - ss.toDouble / sc + 0.5) / 1.0e6
      assert(drift == refDrift, s"$k drift $drift vs $refDrift")
    }
  }
}
