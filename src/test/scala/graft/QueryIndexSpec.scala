package graft

import org.scalatest.funsuite.AnyFunSuite

/** The generated judged-query index (docs/QUERY_INDEX.md) must stay in
  * sync with the registry — SURVEY §2.10's coverage ledger at 337+ entries
  * is too large to hand-maintain, so the mapping (name → defining source
  * line → oracle kind → bench tier) is DERIVED: every `Q("name"` literal
  * is located in the query sources and cross-checked against
  * `Registry.all`. Regenerate deliberately with
  *   sbt 'set Test/javaOptions += "-Dgraft.regenQueryIndex=true"' \
  *     'testOnly graft.QueryIndexSpec'
  * (the plan-fingerprint regen discipline). */
class QueryIndexSpec extends AnyFunSuite {

  private def querySources: Seq[java.io.File] = {
    val dir = new java.io.File("src/main/scala/graft/queries")
    dir.listFiles().filter(_.getName.endsWith(".scala")).sortBy(_.getName).toSeq
  }

  /** name → "file:line" for every Q("...") literal in the query sources. */
  private def definitionSites: Map[String, String] = {
    val qPat = """Q\("([a-z0-9_]+)"""".r
    querySources.flatMap { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
      lines.zipWithIndex.flatMap { case (l, i) =>
        qPat.findAllMatchIn(l).map(m =>
          m.group(1) -> s"src/main/scala/graft/queries/${f.getName}:${i + 1}")
      }
    }.toMap
  }

  private def render: String = {
    val sites = definitionSites
    val rows = Registry.all.sortBy(_.name).map { q =>
      val oracle = if (q.sql.isDefined) "sql" else "rows-only"
      val tier =
        if (q.headline) "bench-t1" else if (q.headline2) "bench-t2" else ""
      val site = sites.getOrElse(q.name, "MISSING")
      s"| ${q.name} | $site | $oracle | $tier |"
    }
    (Seq(
      "# Judged query index (GENERATED — do not edit)",
      "",
      "Regenerate: `sbt 'set Test/javaOptions += \"-Dgraft.regenQueryIndex=true\"' 'testOnly graft.QueryIndexSpec'`",
      "",
      s"${rows.length} judged entries. Oracle `sql` = DuckDB hash-compared;",
      "`rows-only` = driver records a weaker rows>0 check (spec-verified).",
      "",
      "| name | defined at | oracle | bench |",
      "|---|---|---|---|") ++ rows).mkString("\n") + "\n"
  }

  test("every registry entry has exactly one Q(\"name\") definition site") {
    val sites = definitionSites
    val missing = Registry.all.map(_.name).filterNot(sites.contains)
    assert(missing.isEmpty, s"no source site found for: $missing")
    // and no orphaned literals that aren't registered (a disabled query
    // would silently drop out of the judged surface)
    val registered = Registry.all.map(_.name).toSet
    val orphans = sites.keySet -- registered
    assert(orphans.isEmpty, s"Q literals not in Registry.all: $orphans")
  }

  test("docs/QUERY_INDEX.md matches the registry (generated, committed)") {
    val f = new java.io.File("docs/QUERY_INDEX.md")
    val want = render
    if (sys.props.get("graft.regenQueryIndex").contains("true")) {
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath,
        want.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"regenerated ${f.getPath}")
    } else {
      assert(f.isFile, "docs/QUERY_INDEX.md missing — regenerate with the " +
        "command in the scaladoc")
      val got = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(got === want,
        "QUERY_INDEX.md is stale — regenerate with the command in the scaladoc")
    }
  }
}
