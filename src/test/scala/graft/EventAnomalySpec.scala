package graft

import org.apache.spark.sql.functions.{col, date_trunc}

/** `q_events_anomaly` against an independent driver-side replay of the
  * exact-moment z-score recurrence on the real sf0.001 events. */
class EventAnomalySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("flagged buckets and z-scores match a driver-side reference") {
    val got = SparkEntry.queries("q_events_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val hourly = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .groupBy(identity).map { case ((u, h), g) => (u, h, g.length.toLong) }
      .toSeq
    val ref = hourly.groupBy(_._1).flatMap { case (u, buckets) =>
      val nb = buckets.size
      if (nb < 2) Nil
      else {
        val s1 = buckets.map(_._3).sum
        val s2 = buckets.map(b => b._3 * b._3).sum
        val m = s1.toDouble / nb
        val varr = (s2.toDouble - s1.toDouble * s1.toDouble / nb) / (nb - 1)
        if (varr <= 0) Nil
        else buckets.flatMap { case (_, h, cnt) =>
          val z = (cnt - m) / math.sqrt(varr)
          if (math.abs(z) > 2.0)
            Some((u, new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss") {
              setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
            }.format(h)) -> (cnt, z))
          else None
        }
      }
    }.toMap

    assert(got.nonEmpty, "gate must be non-vacuous at sf0.001")
    assert(got.keySet == ref.keySet,
      s"flagged set differs: extra=${got.keySet -- ref.keySet} " +
        s"missing=${ref.keySet -- got.keySet}")
    got.foreach { case (k, (cnt, z)) =>
      val (rc, rz) = ref(k)
      assert(cnt == rc, s"$k cnt")
      assert(math.abs(z - rz) < 2e-6, s"$k z=$z ref=$rz")
    }
  }
}
