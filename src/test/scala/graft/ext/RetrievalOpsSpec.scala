package graft.ext

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval (q116): hand-computed scores on a tiny corpus, the
  * query-term filter semantics, and the absent-term / no-match edges.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "join the join club"),   // tf(join)=2, dl=4
    (2L, "merge sort"),           // no query term → never appears
    (3L, "scan scan scan scan"),  // tf(scan)=4, dl=4
    (4L, "nothing relevant here")
  ).toDF("doc_id", "text")

  /** Independent closed-form recomputation with plain scala doubles. */
  private def okapi(tf: Double, dl: Double, df: Double, nDocs: Double,
                    avgdl: Double, k1: Double = 1.2,
                    b: Double = 0.75): Double = {
    val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1)
    idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl / avgdl))
  }

  test("scores match the closed form; docs without query terms are " +
      "absent; ranking is (score desc, id)") {
    val r = RetrievalOps.bm25TopK(docs, Seq("join", "scan"), "doc_id",
        "text", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1))
    // corpus: N=4, total tokens 4+2+4+3=13, avgdl=3.25
    val avgdl = 13.0 / 4
    val exp1 = BigDecimal(okapi(2, 4, 1, 4, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp3 = BigDecimal(okapi(4, 4, 1, 4, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.map(_._1).toSeq == Seq(3L, 1L), s"ranking: ${r.toSeq}")
    assert(math.abs(r.find(_._1 == 1L).get._2 - exp1) < 1e-6)
    assert(math.abs(r.find(_._1 == 3L).get._2 - exp3) < 1e-6)
  }

  test("a query term absent from the corpus contributes nothing, and an " +
      "all-absent query returns zero rows") {
    val withAbsent = RetrievalOps.bm25TopK(docs,
        Seq("join", "scan", "zzznope"), "doc_id", "text", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val without = RetrievalOps.bm25TopK(docs, Seq("join", "scan"),
        "doc_id", "text", k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(withAbsent == without)
    assert(RetrievalOps.bm25TopK(docs, Seq("zzznope"), "doc_id", "text",
      k = 10).collect().isEmpty)
  }

  test("case-insensitive query terms; k bounds the result") {
    val r = RetrievalOps.bm25TopK(docs, Seq("JOIN", "Scan"), "doc_id",
      "text", k = 1).collect()
    assert(r.length == 1 && r.head.getLong(0) == 3L)
  }
}
