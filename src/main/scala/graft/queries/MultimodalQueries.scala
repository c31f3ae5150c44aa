package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing as a catalog query: binary payloads + typed
  * metadata through the [[Multimodal.extractFeatures]] mapPartitions
  * pipeline. The payloads are utf-8 document bytes standing in for
  * media (codecs absent — [[Multimodal.decodeMedia]] is the stub), so
  * the DuckDB oracle can recompute every feature exactly from the text
  * (documents are pure ASCII: byte == codepoint).
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_features" -> ((s, d) => {
      val feats = Multimodal.extractFeatures(Multimodal.assets(s, d))
      feats.select(col("doc_id") +: col("n_bytes") +: col("digest") +:
        (0 until 16).map(i => element_at(col("hist"), i + 1).as(f"h$i%02d")): _*)
        .orderBy(col("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_mm_features" -> {
      val histCols = (0 until 16)
        .map(i => s"len(list_filter(bk, x -> x = $i)) AS h${f"$i%02d"}")
        .mkString(",\n                ")
      s"""WITH b AS (SELECT doc_id, md5(text) AS digest,
                 len(text) AS n_bytes,
                 list_transform([substring(text, i, 1)
                                 for i in range(1, len(text) + 1)],
                   c -> unicode(c) // 16) AS bk
                FROM documents)
         SELECT doc_id, n_bytes, digest,
                $histCols
         FROM b ORDER BY doc_id"""
    }
  )
}
