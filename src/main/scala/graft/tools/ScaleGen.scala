package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× corpus replicator for the SCALING.md measurements:
  * every replica r of the sf0.1 `documents`/`embeddings` fixtures carries
  * the SAME intra-replica similarity structure as the original while being
  * (near-)orthogonal to every other replica — so a 10× corpus has 10× the
  * near-dup clusters of the same size distribution, NOT clusters 10× as
  * deep. That is the honest linear-scale corpus: replicating rows verbatim
  * would multiply every LSH bucket by N and force Σ(bucket²) ≈ N² growth
  * by construction, measuring the corpus, not the operator.
  *
  * - documents: replica r rotates the 15 letters that appear in NO
  *   [[graft.ext.TextOps]] stopword ([[Movable]]) by r positions. The map
  *   is a character bijection, so token/shingle sets map bijectively
  *   (intra-replica Jaccard is EXACTLY the original's), while rotated
  *   shingles hash independently of the original's (cross-replica Jaccard
  *   ≈ the all-stopword-shingle fraction, ~1%). Stopwords, whitespace,
  *   token counts and text length are untouched, so stopwordRatio /
  *   punctRatio / qualityScore — every quality-gate input — is
  *   bit-identical per replica, and q59's filter keeps exactly N× the
  *   rows.
  * - embeddings: replica r multiplies each dimension by a seeded ±1 sign
  *   pattern — an orthogonal transform, so intra-replica dot products,
  *   norms and cosines are EXACTLY the original's, while sign-bit LSH
  *   signatures against the fixed planes redistribute like fresh data and
  *   cross-replica cosines are pseudo-random (≈0, below every minSim
  *   threshold used).
  * - ids interleave (`id*n + r`): the first K·n ids of an n× corpus cover
  *   n replicas of the first K originals, so id-bounded scopes scale
  *   proportionally; replica 0 is the original row byte-for-byte.
  */
object ScaleGen {
  /** The letters of a–z absent from every TextOps stopword
    * ("the a of and to in is it for on" uses only {a,d,e,f,h,i,n,o,r,s,t}).
    * Rotating within this set can neither create nor destroy a stopword.
    */
  val Movable = "bcgjklmpquvwxyz"

  def rotation(r: Int): String = {
    val k = r % Movable.length
    Movable.substring(k) + Movable.substring(0, k)
  }

  /** Movable-letter bijection for replica r: the cyclic rotation while
    * it lasts (byte-compatible with every earlier SCALING.md corpus),
    * and a seeded Fisher–Yates permutation beyond — the rotation GROUP
    * is exhausted at 15 replicas, but ANY permutation of the movable
    * letters carries the same invariants (stopword-preserving,
    * length-preserving character bijection: intra-replica Jaccard is
    * exactly the original's, cross-replica token overlap stays at the
    * stopword floor). Seeded per replica, so regeneration is
    * bit-identical on any machine — this is what unlocks the 100×
    * corpora (r19).
    */
  def letterMap(r: Int): String =
    if (r < Movable.length) rotation(r)
    else {
      val rnd = new scala.util.Random(77000L + r)
      val arr = Movable.toCharArray
      var i = arr.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
        i -= 1
      }
      new String(arr)
    }

  /** ±1 sign pattern for replica r (r = 0 → identity). Seeded per replica,
    * so regeneration is reproducible across runs and machines.
    */
  def signs(r: Int, dim: Int): Seq[Double] =
    if (r == 0) Seq.fill(dim)(1.0)
    else {
      val rnd = new scala.util.Random(9000L + r)
      Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    }

  def replicateDocuments(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n=$n: need at least one replica")
    (0 until n).map { r =>
      // both cases map: the dedup pipeline lowercases before hashing,
      // so an uppercase movable left untouched would make its document
      // byte-identical (post-lower) across replicas — breaking the
      // no-exact-dup-crosses-replicas invariant SCALING.md rests on
      val rot = letterMap(r)
      docs.select(
        (col("doc_id") * n + r).as("doc_id"),
        (if (r == 0) col("text")
         else translate(col("text"),
           Movable + Movable.toUpperCase, rot + rot.toUpperCase)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  def replicateEmbeddings(embs: DataFrame, n: Int, dim: Int): DataFrame =
    (0 until n).map { r =>
      embs.select(
        (col("vec_id") * n + r).as("vec_id"),
        (if (r == 0) col("embedding")
         else zip_with(col("embedding"), typedLit(signs(r, dim)),
           (x, s) => (x.cast("double") * s).cast("float"))).as("embedding"),
        col("label"))
    }.reduce(_ unionAll _)

  /** Deterministic syllable word for a vocabulary index: base-20 digits
    * over consonant+vowel syllables, 2–6 syllables (4–12 chars) — words
    * with real character structure, so a BPE fit finds genuine merges.
    */
  def syllableWord(idx: Int): String = {
    val cons = "bcdfghjklmnpqrstvwxz"
    val vowels = "aeiou"
    val sb = new StringBuilder
    var v = idx
    do {
      // consonant = the base-20 digit; vowel varies with the higher
      // digits and the position so adjacent indexes differ in shape
      sb.append(cons(v % 20)).append(vowels((v / 20 + sb.length) % 5))
      v /= 20
    } while (v > 0)
    // pad short words to ≥4 chars so single-syllable heads still give
    // the fit something to merge
    while (sb.length < 4) sb.append(vowels(idx % 5))
    sb.toString
  }

  /** The LONG-DOC / WIDE-VOCAB synthetic corpus (VERDICT r15 task 7 —
    * the lexical store's claimed favorable regime, and the encode-vs-
    * vocab measurement corpus): `nDocs` documents of `wordsPerDoc`
    * words each, drawn md5-deterministically from a `vocabSize`-word
    * syllable vocabulary with a quadratic skew toward low indexes (a
    * Zipf-ish head, so memo hit rates and df distributions behave like
    * natural text: common heads, a long rare tail). No RNG anywhere —
    * regeneration is bit-identical on any machine.
    */
  def generateLongDocs(spark: SparkSession, outDir: String, nDocs: Int,
                       wordsPerDoc: Int, vocabSize: Int): Unit = {
    // idempotence keys on the PARAMETERS, not mere existence — a second
    // tool run with a different shape must regenerate, or its
    // measurement silently times the stale corpus under the new label
    val params = s"$nDocs,$wordsPerDoc,$vocabSize"
    val marker = java.nio.file.Paths.get(outDir, "_LONGDOC_PARAMS")
    val fresh = new java.io.File(s"$outDir/documents.parquet/_SUCCESS")
      .exists() && java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker).trim == params
    if (fresh) return
    val vocab = (0 until vocabSize).map(syllableWord)
    val vocabLit = typedLit(vocab)
    val words = transform(
      sequence(lit(0), lit(wordsPerDoc - 1)),
      i => {
        // u ∈ [0,1) from md5(doc:i); u² skews toward the vocabulary head
        val u = conv(substring(md5(concat(col("id").cast("string"),
          lit(":"), i.cast("string"))), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0)
        element_at(vocabLit,
          (floor(u * u * vocabSize) + 1).cast("int"))
      })
    spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        array_join(words, " ").as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(4))).as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.writeString(marker, params)
    ()
  }

  /** Writes `outDir/documents.parquet` + `outDir/embeddings.parquet` (the
    * only tables the scale suite reads). Idempotent: skips a table whose
    * _SUCCESS marker already exists, so repeated ScaleCurve runs pay
    * generation once.
    */
  def generate(spark: SparkSession, baseDir: String, outDir: String,
               n: Int): Unit = {
    def done(t: String) =
      new java.io.File(s"$outDir/$t.parquet/_SUCCESS").exists()
    if (!done("documents"))
      replicateDocuments(spark.read.parquet(s"$baseDir/documents.parquet"), n)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    if (!done("embeddings")) {
      val e = spark.read.parquet(s"$baseDir/embeddings.parquet")
      // null-filtered LIMIT-1 probe with a named error on an empty table
      // (a bare head().getInt(0) would NPE on a null first row)
      val dim = graft.ext.SimilarityOps.inferDim(e, "embedding")
      replicateEmbeddings(e, n, dim)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
  }
}
