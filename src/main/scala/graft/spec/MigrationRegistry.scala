package graft.spec

import scala.collection.mutable

/** Driver-side registry of migration specs: group selection and
  * dependency-ordered execution, mirroring
  * `/root/reference/src/DataMigration/DataMigrationManager.php:256-326`.
  *
  * This is pure driver-side orchestration — each resolved migration becomes
  * one (or a few) Spark jobs; no Spark primitive is involved in ordering.
  */
final class MigrationRegistry {
  private val specs = mutable.LinkedHashMap.empty[String, MigrationSpec]

  def add(spec: MigrationSpec): this.type = {
    spec.extendsMigration.foreach { parent =>
      specs.get(parent).foreach { p =>
        // `extends` requires matching source/destination shape
        // (`DataMigrationManager.php:222-254`).
        if (p.sourceIds != spec.sourceIds || p.destinationIds != spec.destinationIds)
          throw new ExtendsMismatchException(
            s"${spec.name} extends $parent but id definitions differ")
      }
    }
    specs(spec.name) = spec
    this
  }

  def get(name: String): MigrationSpec =
    specs.getOrElse(name, throw new MissingMigrationException(s"unknown migration: $name"))

  def all: Seq[MigrationSpec] = specs.values.toSeq

  /** Migrations in the given groups (`DataMigrationManager.php:256-266`). */
  def byGroups(groups: Set[String]): Seq[MigrationSpec] =
    all.filter(m => groups.contains(m.group))

  /** Topologically sort the requested migrations, transitively pulling in
    * dependencies (unless `noDeps`), failing on cycles — parity with
    * `DataMigrationManager.php:271-326`. Returns (ordered specs, names that
    * were implicitly added as dependencies).
    */
  def resolveOrder(requested: Seq[String], noDeps: Boolean = false): (Seq[MigrationSpec], Set[String]) = {
    if (noDeps) return (requested.map(get), Set.empty)
    val ordered = mutable.LinkedHashSet.empty[String]
    val visiting = mutable.Set.empty[String]
    def visit(name: String, stack: List[String]): Unit = {
      if (ordered.contains(name)) return
      if (visiting.contains(name))
        throw new CircularDependencyException(
          (stack.reverse :+ name).mkString(" -> "))
      visiting += name
      get(name).depends.foreach(d => visit(d, name :: stack))
      // extensions implicitly depend on their parent's run
      get(name).extendsMigration.foreach(d => visit(d, name :: stack))
      visiting -= name
      ordered += name
    }
    requested.foreach(visit(_, Nil))
    val implicitAdds = ordered.toSet -- requested.toSet
    (ordered.toSeq.map(get), implicitAdds)
  }

  /** The resolved order grouped into dependency levels: a migration's
    * level is 1 + the max level of its dependencies (and `extends`
    * parent), so migrations within one level share no dependency path
    * and can run as concurrent Spark jobs — the DAG-branch parallelism
    * SURVEY §4 calls out as an improvement over the reference's strictly
    * serial loop.
    */
  def resolveLevels(
      requested: Seq[String], noDeps: Boolean = false): (Seq[Seq[MigrationSpec]], Set[String]) = {
    val (ordered, adds) = resolveOrder(requested, noDeps)
    val depth = mutable.Map.empty[String, Int]
    ordered.foreach { m =>
      val deps = m.depends ++ m.extendsMigration.toSeq
      depth(m.name) = deps.flatMap(depth.get).maxOption.getOrElse(-1) + 1
    }
    val levels = ordered.groupBy(m => depth(m.name)).toSeq.sortBy(_._1).map(_._2.toSeq)
    (levels, adds)
  }
}
