package graft.spec

import org.scalatest.funsuite.AnyFunSuite

class MigrationRegistrySpec extends AnyFunSuite {
  private def spec(name: String, deps: Seq[String] = Nil, ext: Option[String] = None) =
    MigrationSpec(name, source = "s", sourceDriver = "csv", destination = "d",
      destinationDriver = "csv", sourceIds = Seq(IdField("id")),
      destinationIds = Seq(IdField("id")), depends = deps, extendsMigration = ext,
      group = if (name.startsWith("g2")) "g2" else "default")

  test("topological order respects dependencies and reports implicit adds") {
    val r = new MigrationRegistry
    r.add(spec("a")).add(spec("b", Seq("a"))).add(spec("c", Seq("b", "a")))
    val (ordered, implicitAdds) = r.resolveOrder(Seq("c"))
    assert(ordered.map(_.name) == Seq("a", "b", "c"))
    assert(implicitAdds == Set("a", "b"))
  }

  test("cycle detection throws CircularDependencyException") {
    val r = new MigrationRegistry
    r.add(spec("a", Seq("c"))).add(spec("b", Seq("a"))).add(spec("c", Seq("b")))
    assertThrows[CircularDependencyException](r.resolveOrder(Seq("a")))
  }

  test("no-deps bypass keeps requested order") {
    val r = new MigrationRegistry
    r.add(spec("a")).add(spec("b", Seq("a")))
    val (ordered, adds) = r.resolveOrder(Seq("b"), noDeps = true)
    assert(ordered.map(_.name) == Seq("b") && adds.isEmpty)
  }

  test("group filter selects matching migrations") {
    val r = new MigrationRegistry
    r.add(spec("a")).add(spec("g2x"))
    assert(r.byGroups(Set("g2")).map(_.name) == Seq("g2x"))
  }

  test("extends requires matching id definitions") {
    val r = new MigrationRegistry
    r.add(spec("parent"))
    val bad = spec("child", ext = Some("parent"))
      .copy(destinationIds = Seq(IdField("other", StringId)))
    assertThrows[ExtendsMismatchException](r.add(bad))
    // extension shares the parent's mapping table key
    val ok = spec("child2", ext = Some("parent"))
    r.add(ok)
    assert(ok.mappingKey == "parent")
  }

  test("missing migration raises MissingMigrationException") {
    val r = new MigrationRegistry
    assertThrows[MissingMigrationException](r.resolveOrder(Seq("nope")))
  }
}
