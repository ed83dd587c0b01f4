package graft

/** Driver-contract guards: wiring mistakes here would zero a round. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query; no orphans") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries missing oracles (weaker rows-only check): ${q -- o}")
  }

  test("COVERAGE.md generated query table matches SparkEntry.queries (no drift)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val begin = text.indexOf("<!-- BEGIN GENERATED QUERY TABLE")
    val end = text.indexOf("<!-- END GENERATED QUERY TABLE")
    assert(begin >= 0 && end > begin,
      "COVERAGE.md must contain the generated query table markers")
    val rows = """(?m)^\| (q\w+) \|""".r
      .findAllMatchIn(text.substring(begin, end)).map(_.group(1)).toSet
    val queries = SparkEntry.queries.keySet
    assert(rows == queries,
      s"regenerate with tools/gen_coverage.py — table missing ${queries -- rows}, stale ${rows -- queries}")
  }

  test("entry() returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run and return at least one row at smoke scale") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
