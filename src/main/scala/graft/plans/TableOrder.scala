package graft.plans

import scala.collection.mutable

/** Dependency-ordered job execution.
  *
  * The reference hard-codes the ecom import order so referenced tables load
  * before referencing ones — languages before groups before products before
  * relation tables (EcomProvider.cs:819 `OrderTablesInJob`, source order
  * :825-866, destination order :868-920). We generalize to a deterministic
  * topological sort (Kahn's algorithm, lexicographic tie-break) over an
  * explicit dependency graph, with the star-schema graph built in.
  */
object TableOrder {

  /** child -> parents it depends on. */
  val StarSchemaDeps: Map[String, Set[String]] = Map(
    "region" -> Set.empty,
    "nation" -> Set("region"),
    "customer" -> Set("nation"),
    "supplier" -> Set("nation"),
    "part" -> Set.empty,
    "orders" -> Set("customer"),
    "lineitem" -> Set("orders", "part", "supplier"),
    "events" -> Set("customer"),
    "documents" -> Set.empty,
    "embeddings" -> Set("documents"))

  /** Deterministic topological order of `tables` under `deps`.
    * Throws on cycles (the reference would deadlock on a cyclic mapping).
    */
  def order(tables: Seq[String],
            deps: Map[String, Set[String]] = StarSchemaDeps): Seq[String] = {
    val wanted = tables.toSet
    val inDeg = mutable.Map(tables.map(t =>
      t -> deps.getOrElse(t, Set.empty).count(wanted)): _*)
    val ready = mutable.SortedSet[String]() ++ inDeg.collect { case (t, 0) => t }
    val out = mutable.ArrayBuffer[String]()
    while (ready.nonEmpty) {
      val t = ready.head
      ready -= t
      out += t
      for (child <- wanted if deps.getOrElse(child, Set.empty).contains(t)) {
        inDeg(child) -= 1
        if (inDeg(child) == 0) ready += child
      }
    }
    require(out.size == tables.size,
      s"cyclic dependencies among: ${wanted -- out}")
    out.toSeq
  }

  /** Longest-dependency-path depth per table (roots = 0, child =
    * 1 + max over parents). Sorting by (level, name) is itself a valid
    * deterministic topological order — and unlike Kahn's queue it is a
    * CLOSED FORM an independent engine can replay (the q_table_order
    * oracle re-derives it in DuckDB with a recursive CTE over the same
    * edge list). Throws on cycles like [[order]].
    */
  def levels(tables: Seq[String],
             deps: Map[String, Set[String]] = StarSchemaDeps): Map[String, Int] = {
    val wanted = tables.toSet
    val memo = mutable.Map[String, Int]()
    val visiting = mutable.Set[String]()
    def depth(t: String): Int = memo.getOrElseUpdate(t, {
      require(visiting.add(t), s"cyclic dependencies at $t")
      val ps = deps.getOrElse(t, Set.empty).filter(wanted)
      val d = if (ps.isEmpty) 0 else ps.map(depth).max + 1
      visiting -= t
      d
    })
    tables.map(t => t -> depth(t)).toMap
  }
}
