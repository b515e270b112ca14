package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards SURVEY.md §8 (the coverage matrix the auditor reads) against
  * drifting from the code: every registered query name must be cited in §8,
  * and every query must have an oracle twin. Round-9 verdict item #4.
  */
class SurveyCoverageSpec extends AnyFunSuite {

  private def section8: String = {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = survey.indexOf("## 8.")
    val end = survey.indexOf("## 9.", start)
    assert(start >= 0 && end > start, "SURVEY.md must contain §8 and §9 headers")
    survey.substring(start, end)
  }

  test("every registered query appears in SURVEY.md §8") {
    val s8 = section8
    val missing = SparkEntry.queries.keySet.filterNot(q => s8.contains(s"`$q`"))
    assert(missing.isEmpty,
      s"queries registered in SparkEntry but absent from SURVEY.md §8: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("SURVEY.md §8 cites no stale query names") {
    // any backtick-quoted token that LOOKS like a query id (prefix_digits_rest)
    // must resolve to a live registry entry — catches renames like
    // gr2_triangle_census → gr3_triangle_census going stale in the doc.
    val idLike = """`([a-z]{1,4}[0-9]{1,2}_[a-z0-9_]+)`""".r
    val cited = idLike.findAllMatchIn(section8).map(_.group(1)).toSet
    val registry = SparkEntry.queries.keySet
    // §8 legitimately cites non-query identifiers (specs, functions); only
    // flag citations that match a registered-query PREFIX family but no entry.
    val families = registry.map(_.takeWhile(_ != '_'))
    val stale = cited.filterNot(registry).filter(c => families.contains(c.takeWhile(_ != '_')))
      .filterNot(c => Set("graft", "spark").contains(c.takeWhile(_.isLetter)))
    assert(stale.isEmpty,
      s"SURVEY.md §8 cites query-like names not in the registry (stale rename?): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("SURVEY.md §8 count sentence matches the registry size") {
    // round-10 verdict nit: the prose said "187" while the registry held
    // 188 — the citation checks above can't see a stale COUNT, so pin the
    // sentence itself.
    val countRe = """\*\*(\d+) registered queries\*\*""".r
    val counts = countRe.findAllMatchIn(section8).map(_.group(1).toInt).toList
    assert(counts.nonEmpty, "SURVEY.md §8 must state '**N registered queries**'")
    assert(counts == List(SparkEntry.queries.size),
      s"SURVEY.md §8 count sentence says $counts but the registry has ${SparkEntry.queries.size} queries")
  }

  test("queries and oracleSql cover the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${(q diff o).toSeq.sorted.mkString(", ")}")
    assert((o diff q).isEmpty, s"oracles without query: ${(o diff q).toSeq.sorted.mkString(", ")}")
  }
}
