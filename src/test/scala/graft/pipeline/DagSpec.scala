package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class DagSpec extends AnyFunSuite {

  test("topoSort puts dependencies first") {
    val g = Dag.Graph(Map(
      "c" -> Set("a", "b"), "b" -> Set("a"), "a" -> Set.empty[String],
      "d" -> Set("c")))
    val order = Dag.topoSort(g)
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))
    assert(order.indexOf("c") < order.indexOf("d"))
    assert(order.toSet == Set("a", "b", "c", "d"))
  }

  test("cycle detection raises (reference stack-overflows here)") {
    val g = Dag.Graph(Map("a" -> Set("b"), "b" -> Set("a")))
    val e = intercept[GenericError](Dag.topoSort(g))
    assert(e.msg.contains("Cycle"))
  }

  test("self-cycle detected") {
    val g = Dag.Graph(Map("a" -> Set("a")))
    intercept[GenericError](Dag.topoSort(g))
  }

  test("waves respect dependencies and cover all nodes") {
    val g = Dag.Graph(Map(
      "c" -> Set("a", "b"), "b" -> Set.empty[String], "a" -> Set.empty[String]))
    val ws = Dag.waves(g)
    assert(ws.head.toSet == Set("a", "b"))
    assert(ws(1) == Seq("c"))
  }

  test("a 50k-deep linear chain sorts without stack overflow") {
    // the header claims to fix the reference's recursion blowup — the
    // iterative topoSort/detectCycle must actually survive deep chains
    val n = 50000
    val g = Dag.Graph(
      (1 until n).map(i => s"m$i" -> Set(s"m${i - 1}")).toMap +
        ("m0" -> Set.empty[String]))
    val order = Dag.topoSort(g)
    assert(order.length == n)
    assert(order.head == "m0" && order.last == s"m${n - 1}")
    // a cycle at the bottom of the same deep chain is still found
    val cyc = Dag.Graph(
      (1 until n).map(i => s"m$i" -> Set(s"m${i - 1}")).toMap +
        ("m0" -> Set(s"m${n - 1}")))
    intercept[GenericError](Dag.topoSort(cyc))
  }

  test("property: 200 random DAGs — topo order respects all edges") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(20)
      val ids = (0 until n).map(i => s"n$i")
      // edges only from lower to higher index → guaranteed acyclic
      val prevs = ids.zipWithIndex.map { case (id, i) =>
        id -> (0 until i).filter(_ => rnd.nextBoolean()).map(ids).toSet
      }.toMap
      val order = Dag.topoSort(Dag.Graph(prevs))
      assert(order.toSet == prevs.keySet)
      prevs.foreach { case (id, ps) =>
        ps.foreach(p => assert(order.indexOf(p) < order.indexOf(id)))
      }
    }
  }
}
