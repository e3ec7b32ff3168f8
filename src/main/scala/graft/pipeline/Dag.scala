package graft.pipeline

import scala.collection.mutable

/** Driver-side DAG scheduling over model nodes.
  *
  * The reference finds terminal nodes (no `nexts`) and DFS post-orders from
  * each (/root/reference/src/session.rs:157-176, 282-292). Its recursion has
  * NO cycle detection — a cyclic pipeline stack-overflows. We detect cycles
  * and fail with the cycle's members (documented behavioral improvement).
  */
object Dag {

  /** @param prevs node id → ids it depends on (must run before it) */
  final case class Graph(prevs: Map[String, Set[String]]) {
    lazy val nexts: Map[String, Set[String]] = {
      val m = mutable.Map[String, mutable.Set[String]]()
      prevs.keys.foreach(k => m.getOrElseUpdate(k, mutable.Set()))
      prevs.foreach { case (n, ps) =>
        ps.foreach(p => m.getOrElseUpdate(p, mutable.Set()) += n)
      }
      m.map { case (k, v) => k -> v.toSet }.toMap
    }
  }

  /** Topological order (dependencies first). Matches the reference's
    * traversal shape: start from terminals, DFS into prevs, post-order
    * append, dedupe. Throws GenericError on a cycle.
    */
  def topoSort(g: Graph): Seq[String] = {
    detectCycle(g).foreach { cyc =>
      throw GenericError(
        s"Cycle detected in model graph: ${cyc.mkString(" -> ")}")
    }
    val terminals = g.prevs.keys.filter(id => g.nexts.getOrElse(id, Set.empty).isEmpty)
    val seen = mutable.LinkedHashSet[String]()
    def visit(id: String): Unit = {
      if (!seen.contains(id)) {
        g.prevs.getOrElse(id, Set.empty).toSeq.sorted.foreach(visit)
        seen += id
      }
    }
    terminals.toSeq.sorted.foreach(visit)
    seen.toSeq
  }

  /** First cycle found, if any (DFS three-color). */
  def detectCycle(g: Graph): Option[Seq[String]] = {
    val color = mutable.Map[String, Int]().withDefaultValue(0) // 0 white 1 grey 2 black
    val stack = mutable.ArrayBuffer[String]()
    var found: Option[Seq[String]] = None
    def dfs(id: String): Unit = {
      if (found.isDefined) return
      color(id) match {
        case 1 =>
          val i = stack.indexOf(id)
          found = Some(stack.drop(i).toSeq :+ id)
        case 2 => ()
        case _ =>
          color(id) = 1; stack += id
          g.prevs.getOrElse(id, Set.empty).toSeq.sorted.foreach(dfs)
          if (found.isEmpty) { color(id) = 2; stack.remove(stack.length - 1) }
      }
    }
    g.prevs.keys.toSeq.sorted.foreach(id => if (color(id) == 0) dfs(id))
    found
  }

  /** Independent "waves": nodes whose deps are satisfied by prior waves.
    * The reference runs strictly sequentially; waves let the Spark scheduler
    * run independent DAG branches concurrently (thread-safe driver) while
    * preserving dependency order — the scale path for wide pipelines.
    */
  def waves(g: Graph): Seq[Seq[String]] = {
    val order = topoSort(g)
    val level = mutable.Map[String, Int]()
    order.foreach { id =>
      val ps = g.prevs.getOrElse(id, Set.empty)
      level(id) = if (ps.isEmpty) 0 else ps.map(p => level.getOrElse(p, 0)).max + 1
    }
    order.groupBy(level).toSeq.sortBy(_._1).map(_._2.toSeq)
  }
}
