package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Independent-model differential for the PORTABLE MinHash path — the
  * foundation q27/q56/q59/q72/q85/q86/q93 all stand on, and the contract
  * the persisted signature store freezes on disk (a signature written
  * today must equal one computed by any future build). The model here is
  * plain Scala written straight from the documented algorithm (md5-prefix
  * hash into Z_p, per-coefficient min with Java Long overflow semantics,
  * rowsPerBand slices as band keys, agreement/numHashes as estimated
  * Jaccard) with NO Spark in the loop, so a drift in either side —
  * operator or model — fails the property.
  *
  * The corpus generator draws from a 12-word vocabulary so band
  * collisions and near-dup pairs actually occur, and clones batch docs
  * from corpus docs with small mutations so the dup/clean boundary is
  * exercised from both sides.
  */
object MinHashModelProps extends Properties("MinHashModelDiff") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30) // each case runs two Spark jobs

  private lazy val spark = SparkTestSession.spark

  private val P = DedupOps.MinHashPrime
  private val NumHashes = 16
  private val NumBands = 8
  private val RowsPerBand = 2
  private val K = 3
  private lazy val coeffs = DedupOps.minHashCoeffs(NumHashes)

  // --- the model, Spark-free ----------------------------------------------

  private def modelTokens(text: String): Seq[String] =
    // Spark's split(lower(text), "\\s+") — limit -1 keeps trailing empties
    text.toLowerCase.split("\\s+", -1).toSeq

  private def modelShingles(text: String): Seq[String] =
    modelTokens(text).sliding(K).filter(_.size == K)
      .map(_.mkString(" ")).toSeq.distinct

  private def md5PrefixMod(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString // first 8 hex chars
    java.lang.Long.parseLong(hex, 16) % P
  }

  private def modelSignature(text: String): Option[Seq[Long]] = {
    val xs = modelShingles(text).map(md5PrefixMod)
    if (xs.isEmpty) None // shingle-less docs drop from the operator too
    else Some(coeffs.map { case (a, b) =>
      // deliberately Long arithmetic: the operator's lit(a) * col("x")
      // wraps exactly like Java, and the model must wrap with it
      xs.map(x => (a * x + b) % P).min
    })
  }

  private def modelIngestFlags(batch: Seq[(Long, String)],
                               corpus: Seq[(Long, String)])
      : Map[Long, (Long, Boolean)] = {
    val corpusSigs = corpus.flatMap { case (id, t) =>
      modelSignature(t).map(id -> _) }
    batch.map { case (id, t) =>
      val nDups = modelSignature(t) match {
        case None => 0L
        case Some(sa) =>
          corpusSigs.count { case (_, sb) =>
            val collides = (0 until NumBands).exists(b =>
              sa.slice(b * RowsPerBand, (b + 1) * RowsPerBand) ==
                sb.slice(b * RowsPerBand, (b + 1) * RowsPerBand))
            val jaccard = BigDecimal(
                sa.zip(sb).count { case (x, y) => x == y }.toDouble /
                  NumHashes)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP)
            collides && jaccard >= BigDecimal("0.8")
          }.toLong
      }
      id -> (nDups, nDups > 0)
    }.toMap
  }

  // --- generators ----------------------------------------------------------

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 12) // includes un-shingleable lengths 0..2
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def mutate(doc: String): Gen[String] = for {
    extra <- Gen.oneOf(vocab)
    mode <- Gen.choose(0, 2)
  } yield mode match {
    case 0 => doc                        // exact clone
    case 1 => s"$doc $extra"             // append one token
    case _ => doc.toUpperCase            // case change (tokens lowercase)
  }

  private val genCase: Gen[(Seq[(Long, String)], Seq[(Long, String)])] = for {
    nCorpus <- Gen.choose(1, 6)
    corpusTexts <- Gen.listOfN(nCorpus, genDoc)
    nFresh <- Gen.choose(0, 3)
    freshTexts <- Gen.listOfN(nFresh, genDoc)
    nClones <- Gen.choose(0, 3)
    cloneSrcs <- Gen.listOfN(nClones, Gen.choose(0, nCorpus - 1))
    clones <- Gen.sequence[List[String], String](
      cloneSrcs.map(i => mutate(corpusTexts(i))))
  } yield {
    val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i + 1L, t) }
    val batch = (freshTexts ++ clones).zipWithIndex
      .map { case (t, i) => (100L + i, t) }
    (batch, corpus)
  }

  // --- properties ----------------------------------------------------------

  property("portable signatures match the Spark-free model") =
    Prop.forAll(Gen.listOfN(5, genDoc)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = DedupOps.minHashSignaturesDf(
          docs.toDF("doc_id", "text"), K, NumHashes, portable = true)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val want = docs.flatMap { case (id, t) =>
        modelSignature(t).map(s => id -> s.toList) }.toMap
      (got == want) :| s"got=$got want=$want texts=$texts"
    }

  property("incrementalNearDupFlags matches the Spark-free model") =
    Prop.forAll(genCase) { case (batch, corpus) =>
      import spark.implicits._
      val corpusSigs = DedupOps.minHashSignaturesDf(
        corpus.toDF("doc_id", "text"), K, NumHashes, portable = true)
      val got = DedupOps.incrementalNearDupFlags(
          batch.toDF("doc_id", "text"), corpusSigs,
          K, NumBands, RowsPerBand, minJaccard = 0.8)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getAs[Long]("n_dups"), r.getAs[Boolean]("dup"))).toMap
      val want = modelIngestFlags(batch, corpus)
      (got == want) :| s"got=$got want=$want batch=$batch corpus=$corpus"
    }
}
