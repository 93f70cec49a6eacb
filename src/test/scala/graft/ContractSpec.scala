package graft

/** Driver-contract invariants: every registered query has an oracle
  * and vice versa — a query without an oracle silently skips the
  * correctness gate (the driver reports no_oracle, the selfcheck
  * iterates oracles), which is how coverage regressions hide. */
class ContractSpec extends SparkSpec {
  test("every query has an oracle entry and every oracle has a query") {
    val queries = Queries.all.keySet
    val oracles = Oracles.all.keySet
    assert(queries.diff(oracles).isEmpty,
      s"queries without oracle: ${queries.diff(oracles).toSeq.sorted}")
    assert(oracles.diff(queries).isEmpty,
      s"oracles without query: ${oracles.diff(queries).toSeq.sorted}")
  }

  test("oracle SQL is single-statement and non-empty") {
    Oracles.all.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.trim.stripSuffix(";").contains(";"),
        s"$name: oracle must be one statement")
    }
  }
}
