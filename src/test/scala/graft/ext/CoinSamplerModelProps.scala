package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Spark-free model differential for the md5-coin operators behind
  * q94 (epoch reshuffle) and q95 (target domain mix) — the
  * MinHashModelProps treatment. The determinism these operators sell
  * (resumable epochs, engine-stable sampling) IS the md5-coin contract,
  * so the model recomputes shard/ord and keep decisions from the
  * documented formulas alone (MessageDigest md5, first-8-hex-chars
  * parse, IEEE division) and the properties assert exact equality on
  * generated inputs the fixture oracles can't enumerate.
  */
object CoinSamplerModelProps extends Properties("CoinSamplerDiff") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkTestSession.spark

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  // --- epochShuffle model ---------------------------------------------------

  private def modelEpoch(ids: Seq[Long], seed: Long, nShards: Int)
      : Seq[(Long, Int, Int)] = {
    val coined = ids.map { id =>
      val c = md5Hex(s"$seed:$id")
      (id, (java.lang.Long.parseLong(c.take(8), 16) % nShards).toInt, c)
    }
    coined.groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
      rows.sortBy(r => (r._3, r._1)).zipWithIndex
        .map { case ((id, _, _), i) => (id, shard, i + 1) }
    }.sortBy(_._1)
  }

  property("epochShuffle matches the Spark-free model") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0L, 100000L)).map(_.distinct),
      Gen.choose(0L, 99L),
      Gen.choose(1, 7)) { (ids, seed, nShards) =>
      import spark.implicits._
      val got = PackOps.epochShuffle(ids.toDF("doc_id"), "doc_id",
          seed, nShards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .sortBy(_._1).toSeq
      val want = modelEpoch(ids, seed, nShards)
      (got == want) :| s"got=$got want=$want seed=$seed shards=$nShards"
    }

  // --- weightedExactSample model (q141: A-ES exponential keys) --------------

  private def modelWeighted(rows: Seq[(Long, Double)], seed: Long,
                            k: Int): Seq[Long] = {
    def key(id: Long, w: Double): BigDecimal = {
      val n = java.lang.Long.parseLong(md5Hex(s"wes:$seed:$id").take(12), 16)
      BigDecimal(math.log((n + 1.0) / math.pow(16.0, 12)) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    rows.filter(_._2 > 0).sortBy { case (id, w) => (-key(id, w), id) }
      .take(k).map(_._1).sorted
  }

  property("weightedExactSample matches the Spark-free A-ES model") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 100000L),
        Gen.choose(1e-3, 1e3))).map(_.distinctBy(_._1)),
      Gen.choose(0L, 99L),
      Gen.choose(1, 30)) { (rows, seed, k) =>
      import spark.implicits._
      val got = DedupOps.weightedExactSample(rows.toDF("doc_id", "wt"),
          "doc_id", "wt", k, seed)
        .collect().map(_.getLong(0)).sorted.toSeq
      val want = modelWeighted(rows, seed, k)
      (got == want) :| s"got=$got want=$want seed=$seed k=$k"
    }

  // --- targetMixSample model ------------------------------------------------

  private def modelMix(docs: Seq[(Long, String, Long)],
                       shares: Map[String, Double], budget: Long)
      : Set[Long] = {
    val want = shares.map { case (s, t) => s -> t * budget }
    val avail = docs.groupBy(_._2)
      .map { case (s, rows) => s -> rows.map(_._3).sum.toDouble }
    docs.filter { case (id, src, _) =>
      want.get(src).exists { w =>
        val rate = math.min(1.0, w / avail(src))
        val coin = java.lang.Long.parseLong(
          md5Hex(s"mix:$id").take(8), 16).toDouble / 4294967296.0
        coin < rate
      }
    }.map(_._1).toSet
  }

  private val genMixCase = for {
    nSrc <- Gen.choose(1, 4)
    srcs = (0 until nSrc).map(i => s"s$i")
    docs <- Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 100000L)
      src <- Gen.oneOf(srcs)
      nTok <- Gen.choose(1L, 500L)
    } yield (id, src, nTok)).map(_.distinctBy(_._1))
    // target some but not necessarily all sources; shares in (0, 1]
    listed <- Gen.someOf(srcs)
    shares <- Gen.sequence[List[Double], Double](
      listed.map(_ => Gen.choose(0.05, 1.0)))
    budget <- Gen.choose(100L, 50000L)
  } yield (docs, listed.zip(shares).toMap, budget)

  property("targetMixSample matches the Spark-free model") =
    Prop.forAll(genMixCase) { case (docs, shares, budget) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "source", "n_tok")
      val got =
        if (shares.isEmpty) Set.empty[Long] // operator requires shares>0 keys
        else DedupOps.targetMixSample(df, "doc_id", "source",
            col("n_tok"), shares, budget)
          .collect().map(_.getLong(0)).toSet
      val want = modelMix(docs, shares, budget)
      (got == want) :| s"got=$got want=$want shares=$shares budget=$budget"
    }
}
