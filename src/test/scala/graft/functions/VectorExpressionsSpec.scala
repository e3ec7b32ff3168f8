package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dotProduct matches the higher-order-function formulation exactly") {
    val df = Seq(
      (Seq(1.5f, -2f, 3f), Seq(4f, 5f, -6f)),
      (Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))).toDF("a", "b")
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)).collect().map(_.getDouble(0))
    val native = df.select(VectorFunctions.dotProduct(
      col("a").cast("array<double>"), col("b").cast("array<double>")))
      .collect().map(_.getDouble(0))
    assert(native.toSeq == hof.toSeq) // bitwise: same fold order, same casts
  }

  test("cosineSim: identity, orthogonality, zero-norm null") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(r(1).getDouble(0) == 0.0)
    assert(r(2).isNullAt(0))
  }

  test("int8QuantStats: scale, error bound, zero vector") {
    val df = Seq(
      Seq(1.0f, -0.5f, 0.25f),
      Seq(0.0f, 0.0f)).toDF("a")
    val r = df.select(VectorFunctions.int8QuantStats(col("a"))).collect()
      .map(_.getSeq[Double](0))
    val Seq(scale, maxErr, rmse) = r(0)
    assert(math.abs(scale - 1.0 / 127) < 1e-15)
    // max element maps to exactly 127 (zero error); worst case is half a
    // quantization step
    assert(maxErr <= scale / 2 + 1e-15)
    assert(math.abs(maxErr - 0.5 / 127) < 1e-12) // -0.5 sits on a half step
    assert(rmse > 0 && rmse <= maxErr)
    assert(r(1) == Seq(0.0, 0.0, 0.0)) // zero vector quantizes exactly
  }

  test("int8UnitQuantize: half-up at scale 127, clamped, null element nulls") {
    val df = Seq(Seq(1.0, -1.0, 0.5, -0.5, 0.0037, 0.0)).toDF("a")
    val q = df.select(VectorFunctions.int8UnitQuantize(col("a")))
      .head.getSeq[Byte](0)
    // 0.5·127 = 63.5 → half-up 64; −0.5·127 = −63.5 → floor(−63) = −63
    // (floor(x+0.5) half-up, matching Int8QuantStats); 0.0037·127 → 0
    assert(q == Seq[Byte](127, -127, 64, -63, 0, 0))
    // slightly-out-of-unit components (fp normalization residue) clamp
    val c = Seq(Seq(1.0000001, -1.0000001)).toDF("a")
      .select(VectorFunctions.int8UnitQuantize(col("a")))
      .head.getSeq[Byte](0)
    assert(c == Seq[Byte](127, -127))
    val withNull = Seq(Seq[java.lang.Double](0.5, null)).toDF("a")
      .select(VectorFunctions.int8UnitQuantize(col("a"))).head
    assert(withNull.isNullAt(0))
  }

  test("int8Dot: exact integer dot, min-length, codegen == interpreted") {
    val df = Seq((Seq(1.0, -1.0, 0.5), Seq(1.0, 1.0, 1.0, 9.0))).toDF("a", "b")
    def run(): Long = df.select(VectorFunctions.int8Dot(
      VectorFunctions.int8UnitQuantize(col("a")),
      VectorFunctions.int8UnitQuantize(col("b")))).head.getLong(0)
    // q_a = [127,-127,64], q_b = [127,127,127,127]; min-length 3
    val expect = 127L * 127 - 127L * 127 + 64L * 127
    assert(run() == expect)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run()
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = try run()
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(interp == gen && interp == expect)
  }

  test("tokenChunks: non-overlapping cover including the trailing partial") {
    val df = Seq(Seq("a", "b", "c", "d", "e"), Seq.empty[String]).toDF("t")
    val r = df.select(VectorFunctions.tokenChunks(col("t"), 2)).collect()
      .map(_.getSeq[String](0))
    assert(r(0) == Seq("a b", "c d", "e"))
    assert(r(1).isEmpty)
  }

  test("int8QuantStats agrees between codegen and interpreted eval") {
    val df = Seq(Seq(0.3f, -0.7f, 0.11f, 0.002f)).toDF("a")
    def run(): Seq[Double] =
      df.select(VectorFunctions.int8QuantStats(col("a"))).head.getSeq[Double](0)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run()
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = try run()
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(interp == gen) // bitwise-identical paths
  }

  test("expressions work under codegen AND interpreted eval") {
    val df = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
    def run(): Double =
      df.select(VectorFunctions.cosineSim(col("a"), col("b")))
        .collect().head.getDouble(0)
    val expected = 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(math.abs(run() - expected) < 1e-12)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try assert(math.abs(run() - expected) < 1e-12)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("SQL registration via GraftExtensions: cosine_sim callable from SQL") {
    GraftExtensions.register(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b")
      .createOrReplaceTempView("vec_pairs")
    val r = spark.sql("SELECT cosine_sim(a, b) AS s, dot_product(" +
        "CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>)) AS d FROM vec_pairs")
      .collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("SQL registration: vector_normalize, shingles, array_count_in") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vector_normalize(ARRAY(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nv,
        |  shingles(ARRAY('a', 'b', 'c'), 2) AS sh,
        |  array_count_in(ARRAY('the', 'cat', 'the'), 'the,a,of') AS c
        |""".stripMargin).collect().head
    assert(r.getSeq[Double](0) == Seq(0.6, 0.8))
    assert(r.getSeq[String](1) == Seq("a b", "b c"))
    assert(r.getInt(2) == 2)
    // non-literal k rejected with a clear message
    val e = intercept[Exception](
      spark.sql("SELECT shingles(ARRAY('a'), CAST(id AS INT)) FROM range(1)")
        .collect())
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("SQL registration: token_chunks, int8_quant_stats") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT token_chunks(ARRAY('a', 'b', 'c', 'd', 'e'), 2) AS ch,
        |  int8_quant_stats(ARRAY(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))) AS st
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a b", "c d", "e"))
    val st = r.getSeq[Double](1)
    assert(math.abs(st(0) - 1.0 / 127) < 1e-15)
  }

  test("SQL registration: int8_unit_quantize, int8_dot") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT int8_dot(int8_unit_quantize(ARRAY(1.0D, -0.5D)),
        |                int8_unit_quantize(ARRAY(1.0D, 1.0D))) AS d
        |""".stripMargin).collect().head
    assert(r.getLong(0) == 127L * 127 - 63L * 127)
  }

  test("SQL registration: redact_pii matches the TextOps Column operator") {
    GraftExtensions.register(spark)
    val txt = "mail a@b.co from 10.0.0.1 call +1-555-0199, keep v1.2.3"
    val sql = spark.sql(s"SELECT redact_pii('$txt') AS s")
      .collect().head.getString(0)
    assert(sql == "mail <EMAIL> from <IP> call <PHONE>, keep v1.2.3")
    // the SQL surface and the DataFrame operator must agree byte-for-byte
    val colApi = Seq(txt).toDF("t")
      .select(graft.ext.TextOps.redactPii(col("t"))).head.getString(0)
    assert(sql == colApi)
  }

  test("mismatched lengths use the common prefix (min length)") {
    val r = Seq((Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
      .select(VectorFunctions.dotProduct(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("null ELEMENTS: scalar kernels null the result, bands leave bits unset") {
    // array(1.0, NULL): the HOF formulations these kernels replaced
    // propagate an element null to the whole result — so must the kernels,
    // under BOTH eval paths
    val df = spark.sql(
      """SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS d,
        |  array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS f,
        |  array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)) AS d2
        |""".stripMargin)
    def run() = df.select(
        VectorFunctions.dotProduct(col("d"), col("d2")).as("dot"),
        VectorFunctions.cosineSim(col("f"), col("f")).as("cos"),
        VectorFunctions.normalize(col("f")).as("nrm"),
        VectorFunctions.int8QuantStats(col("f")).as("qs"),
        // null dot -> when(null > 0) unset in the tree this replaces
        VectorFunctions.bandSignatures(col("d"),
          Seq(Seq(1.0, 1.0), Seq(-1.0, 1.0)), 2).as("bands"))
      .collect().head
    for (mode <- Seq("NO_CODEGEN", "CODEGEN_ONLY")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val r = run()
        assert((0 to 3).forall(r.isNullAt), s"mode=$mode")
        assert(r.getSeq[Int](4) == Seq(0), s"mode=$mode")
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("shingles rejects non-positive k at construction") {
    val e = intercept[IllegalArgumentException](
      VectorFunctions.shingles(col("a"), 0))
    assert(e.getMessage.contains("positive"))
  }

  test("adcTable + adcScore are bitwise-identical to the per-pair " +
      "slice+dot+literal tree they hoist, in both execution modes") {
    // deterministic pseudo-random fixture: 8-dim vectors, m=4 subspaces
    // of dsub=2, ksub=3 codes per codebook
    val rnd = new scala.util.Random(42)
    val m = 4; val dsub = 2; val ksub = 3; val dim = m * dsub
    val cbs: Seq[Seq[Seq[Double]]] = Seq.fill(m)(
      Seq.fill(ksub)(Seq.fill(dsub)(rnd.nextDouble() * 2 - 1)))
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1),
        Seq.fill(m)(rnd.nextInt(ksub))))
    val df = vecs.toDF("id", "u", "codes")
      .select(col("id"), col("u").cast("array<double>").as("u"),
        col("codes").cast("array<int>").as("codes"))
    val cbLits = cbs.map(cb => typedLit(cb))
    val oldTree = (0 until m).map { mi =>
      VectorFunctions.dotProduct(slice(col("u"), mi * dsub + 1, dsub),
        element_at(cbLits(mi), element_at(col("codes"), mi + 1) + 1))
    }.reduce(_ + _)
    val fused = VectorFunctions.adcScore(
      VectorFunctions.adcTable(col("u"), cbs), col("codes"), ksub)
    for (mode <- Seq("NO_CODEGEN", "CODEGEN_ONLY")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val r = df.select(oldTree.as("old"), fused.as("new")).collect()
        r.foreach { row =>
          // bitwise, not approximate: same dots in the same fold order
          assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(row.getDouble(1)), s"mode=$mode")
        }
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // null code element nulls the score like the element_at tree did;
    // short probe vector zero-fills the truncated subspace identically
    val edge = spark.sql(
      s"""SELECT array(0.5D, -0.25D, 0.125D) AS shortU,
         |  array(1, CAST(NULL AS INT), 0, 2) AS nullCodes,
         |  array(0, 1, 2, 0) AS okCodes""".stripMargin)
    val er = edge.select(
      VectorFunctions.adcScore(
        VectorFunctions.adcTable(col("shortU"), cbs), col("nullCodes"), ksub),
      VectorFunctions.adcScore(
        VectorFunctions.adcTable(col("shortU"), cbs), col("okCodes"), ksub),
      (0 until m).map { mi =>
        VectorFunctions.dotProduct(slice(col("shortU"), mi * dsub + 1, dsub),
          element_at(cbLits(mi), element_at(col("okCodes"), mi + 1) + 1))
      }.reduce(_ + _)).collect().head
    assert(er.isNullAt(0))
    assert(java.lang.Double.doubleToLongBits(er.getDouble(1)) ==
      java.lang.Double.doubleToLongBits(er.getDouble(2)))
  }
}
