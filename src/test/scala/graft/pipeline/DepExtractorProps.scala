package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}

/** Property test (SURVEY.md §5 item 3): for random model-name sets planted
  * into random query shapes — join chains, UNION arms, CTE-internal joins,
  * WHERE subqueries, derived tables — the extractor finds exactly the
  * planted references. The UNION and CTE shapes are the ones the reference
  * extractor misses (src/node.rs:223,259,267 descend only into
  * SetExpr::Select).
  */
object DepExtractorProps extends Properties("DepExtractor") {

  private val models: Gen[Seq[String]] =
    Gen.pick(3, 0 to 25).map(_.map(i => s"model_$i").toSeq)

  private val shapes: Seq[Seq[String] => String] = Seq(
    ms => s"SELECT * FROM ${ms(0)} JOIN ${ms(1)} ON 1 = 1, ${ms(2)}",
    ms => s"SELECT a FROM ${ms(0)} UNION ALL SELECT a FROM ${ms(1)} " +
      s"UNION SELECT a FROM ${ms(2)}",
    ms => s"WITH c AS (SELECT * FROM ${ms(0)} JOIN ${ms(1)} ON 1 = 1) " +
      s"SELECT * FROM c, ${ms(2)}",
    ms => s"SELECT * FROM ${ms(0)} WHERE x IN (SELECT y FROM ${ms(1)}) " +
      s"AND EXISTS (SELECT 1 FROM ${ms(2)})",
    ms => s"SELECT * FROM (SELECT * FROM ${ms(0)}) t JOIN " +
      s"(SELECT * FROM ${ms(1)}) u ON 1 = 1 JOIN ${ms(2)} ON 1 = 1")

  property("finds exactly the planted refs in every query shape") =
    Prop.forAll(models, Gen.choose(0, shapes.size - 1)) { (ms, i) =>
      DepExtractor.tableRefs(shapes(i)(ms)) == ms.toSet
    }

  property("a CTE shadowing a model name is not reported as a dependency") =
    Prop.forAll(models) { ms =>
      // ms(0) is both a model name and a CTE name: the CTE binding wins.
      val sql = s"WITH ${ms(0)} AS (SELECT * FROM ${ms(1)}) " +
        s"SELECT * FROM ${ms(0)}"
      DepExtractor.tableRefs(sql) == Set(ms(1))
    }
}
