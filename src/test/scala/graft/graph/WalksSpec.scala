package graft.graph

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Walks.hashGreedy]] against a driver-side replay of the
  * derandomized draw, plus the totality cases the sf-data gate can't
  * reach (isolated vertices, symmetric pairs). */
class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  /** The engine's draw, replayed on plain collections. */
  private def replay(pages: Seq[String], und: Map[String, Seq[String]],
                     steps: Int): Map[String, (String, Long, String)] =
    pages.map { start =>
      var cur = start
      var moved = 0L
      val path = new StringBuilder(start)
      for (t <- 1 to steps) {
        val nbrs = und.getOrElse(cur, Nil)
        if (nbrs.nonEmpty) {
          val next = nbrs.map(n => (h32(s"$start:$t:$n"), n)).min._2
          cur = next; moved += 1; path.append(">").append(next)
        }
      }
      start -> ((cur, moved, md5hex(path.toString)))
    }.toMap

  test("walks match the replay on the sf0.001 catalog graph") {
    val dir = "/root/testdata/sf0.001"
    val g = GraphCatalog.tpch(spark, dir)
    val got = Walks.hashGreedy(g.pages, g.edges, steps = 3)
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2), r.getString(3))))
    val pages = g.pages.as[String].collect().toSeq
    val es = g.edges.as[(String, String)].collect()
    val und = (es ++ es.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val ref = replay(pages, und, 3)
    assert(got.length == ref.size && got.nonEmpty)
    got.foreach { case (s, r) => assert(r == ref(s), s"start $s") }
    // non-vacuous: walks really move and diverge
    assert(got.count(_._2._2 == 3) > got.length / 2)
  }

  test("isolated vertices freeze in place; symmetric pairs bounce") {
    val pages = Seq("a", "b", "lone").toDF("page")
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = Walks.hashGreedy(pages, edges, steps = 3)
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got("lone") == (("lone", 0L, md5hex("lone"))))
    // a↔b is each other's only neighbor: a>b>a>b, b>a>b>a
    assert(got("a") == (("b", 3L, md5hex("a>b>a>b"))))
    assert(got("b") == (("a", 3L, md5hex("b>a>b>a"))))
  }
}
