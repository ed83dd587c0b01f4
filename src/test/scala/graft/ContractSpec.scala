package graft

/** Driver-contract guards: wiring mistakes here would zero a round. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query; no orphans") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries missing oracles (weaker rows-only check): ${q -- o}")
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
