package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The realistic-scale committed vocabulary ([[BpeMergesLarge]], 1536
  * merges — VERDICT r18 task 6), verified by the documented ≥1k-merge
  * split (SCALING.md r16): the recursive-CTE oracle rebuild costs
  * minutes at this size, so the per-round gates are (a) the indexed ≡
  * naive differential over the committed artifact, (b) the served
  * SubwordTokenCount path against the naive per-word sum, and (c) ONE
  * bounded recursive-CTE spot-check — the SAME replace-chain SQL the
  * q150 oracle runs in DuckDB, executed here by Spark's own recursive
  * CTE over a fixed word set × the full 1536-merge chain.
  */
class BpeLargeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("artifact sanity: >= 1k merges, fused outputs nest like BPE") {
    val m = BpeMergesLarge.merges
    assert(m.size >= 1000)
    // every merge's parts are either single codepoints or the fused
    // output of an EARLIER merge — the defining BPE invariant
    val seen = scala.collection.mutable.Set[String]()
    m.foreach { case (l, r) =>
      Seq(l, r).foreach { p =>
        assert(p.codePointCount(0, p.length) == 1 || seen(p),
          s"merge part `$p` is neither a codepoint nor an earlier output")
      }
      seen += (l + r)
    }
  }

  test("indexed == naive under the committed 1536-merge artifact " +
      "(fixture words + every fused output)") {
    val m = BpeMergesLarge.merges
    val idx = new MergeIndex(m)
    val fixtureWords = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().orderBy("w").limit(400)
      .collect().map(_.getString(0))
    val synth = m.map { case (l, r) => l + r }.distinct
    (fixtureWords ++ synth).foreach { w =>
      assert(idx.encode(w).toSeq == Bpe.pieces(w, m), s"word `$w`")
    }
  }

  test("served path: subwordTokenCount under the large artifact equals " +
      "the naive per-word sum over fixture documents") {
    val m = BpeMergesLarge.merges
    val rows = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .orderBy("doc_id").limit(60)
      .select(col("text"),
        TextOps.subwordTokenCount(col("text"), m).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getString(0).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(w => Bpe.pieceCount(w, m).toLong).sum
      assert(r.getLong(1) == expect)
    }
  }

  test("bounded recursive-CTE spot-check: the SQL replace-chain rebuild " +
      "agrees with the committed encoder at 1536 merges") {
    val m = BpeMergesLarge.merges
    // a fixed, deterministic probe: late fused outputs (exercise deep
    // merge ranks), early ones, and words the vocabulary never saw
    val words = (m.takeRight(6).map { case (l, r) => l + r } ++
      m.take(3).map { case (l, r) => l + r } ++
      Seq("zzzunseen", "a")).distinct
    def esc(s: String) = s.replace("'", "''")
    val mergeRows = m.zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1}, '${esc(l)}', '${esc(r)}')" }
      .mkString(", ")
    val wordRows = words.map(w => s"('${esc(w)}')").mkString(", ")
    val sql =
      s"""WITH RECURSIVE
         |merges AS (SELECT col1 AS rank, col2 AS l, col3 AS r
         |  FROM VALUES $mergeRows),
         |w0 AS (SELECT w, ' ' || regexp_replace(w, '(.)', '$$1 ')
         |    AS state FROM VALUES $wordRows AS t(w)),
         |enc AS (
         |  SELECT w, state, 1 AS nxt FROM w0
         |  UNION ALL
         |  SELECT e.w, replace(e.state, ' ' || m.l || ' ' || m.r || ' ',
         |      ' ' || m.l || m.r || ' '), e.nxt + 1
         |  FROM enc e JOIN merges m ON m.rank = e.nxt
         |)
         |SELECT w,
         |  length(state) - length(replace(state, ' ', '')) - 1 AS np
         |FROM enc WHERE nxt = ${m.size + 1}""".stripMargin
    val key = "spark.sql.cteRecursionLevelLimit"
    val prev = spark.conf.get(key)
    val got =
      try {
        spark.conf.set(key, (m.size + 10).toString)
        spark.sql(sql).collect().map(r => r.getString(0) -> r.getInt(1))
          .toMap
      } finally spark.conf.set(key, prev)
    assert(got.keySet == words.toSet)
    words.foreach { w =>
      assert(got(w) == Bpe.pieceCount(w, m),
        s"SQL rebuild disagrees on `$w`")
    }
  }
}
