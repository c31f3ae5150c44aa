package graft.functions

import graft.SparkSpec

/** [[HllAgg]]: closed-form register placement, merge = elementwise max,
  * and the q_distinct_hll estimate within the m=256 error envelope of
  * the exact distinct count. */
class HllAggSpec extends SparkSpec {

  private def h(bucket: Int, w: Long): Long = (w << 8) | bucket.toLong

  test("reduce places the leading-zero rank in the hash's low-bit bucket") {
    val a = new HllAgg(8)
    var buf = a.zero
    buf = a.reduce(buf, h(3, 1L << 51)) // bitlength 52 -> rho 1
    buf = a.reduce(buf, h(5, 1L))       // bitlength 1  -> rho 52
    buf = a.reduce(buf, h(7, 0L))       // zero window  -> rho 53
    assert(buf(3) == 1 && buf(5) == 52 && buf(7) == 53)
    assert(buf.count(_ != 0) == 3)
  }

  test("rho generalizes to non-default p (code-review r13: the window " +
      "width follows p, not a hard-wired 52)") {
    // p = 4: window is 56 bits; a full-width (bitlength-56) value has
    // rho 1 — under the old hard-wired 53 it would have been -2 and
    // silently dropped
    val a4 = new HllAgg(4)
    var b4 = a4.zero
    b4 = a4.reduce(b4, (1L << 55) << 4 | 3L)
    assert(b4(3) == 1)
    b4 = a4.reduce(b4, 5L) // zero window in bucket 5 -> 57
    assert(b4(5) == 57)
    // p = 16: window is 44 bits; bitlength 44 -> rho 1
    val a16 = new HllAgg(16)
    var b16 = a16.zero
    b16 = a16.reduce(b16, (1L << 43) << 16 | 9L)
    assert(b16(9) == 1)
  }

  test("a bucket keeps its maximum rank; merge is elementwise max") {
    val a = new HllAgg(8)
    var x = a.zero
    x = a.reduce(x, h(9, 1L << 40)) // rho 12
    x = a.reduce(x, h(9, 1L << 50)) // rho 2 -> bucket stays 12
    assert(x(9) == 12)
    var y = a.zero
    y = a.reduce(y, h(9, 1L))  // rho 52
    y = a.reduce(y, h(11, 1L << 30)) // rho 22
    val m = a.merge(x.clone(), y)
    assert(m(9) == 52 && m(11) == 22)
  }

  test("q_distinct_hll estimates stay inside the m=256 error envelope") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_distinct_hll")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = graft.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    for ((flag, est) <- got) {
      val rel = math.abs(est - exact(flag)) / exact(flag).toDouble
      // theoretical std error 1.04/sqrt(256) ~ 6.5%; 3 sigma
      assert(rel < 0.20, s"$flag: est $est vs exact ${exact(flag)}")
    }
  }

  test("the register dump is deterministic across runs") {
    val dir = "/root/testdata/sf0.001"
    def regs() = graft.SparkEntry.queries("q_distinct_hll")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(regs() == regs())
  }
}
