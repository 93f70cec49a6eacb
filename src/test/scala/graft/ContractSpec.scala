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

  test("oracle SQL reads only testdata tables (never a Spark-side view)") {
    // the driver's DuckDB session defines exactly these views over the
    // sf parquet; an oracle that names anything else (a Spark temp
    // view, a typo'd table) would error — or worse, silently resolve
    // against something the oracle engine happens to define. Every
    // FROM/JOIN target must be a testdata table, a CTE defined in the
    // same statement, or a parenthesized subquery.
    val testdata = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // `AS [NOT] MATERIALIZED (` is DuckDB's inlining hint (q_part_rank
    // pins its staged plan with it) — still a CTE definition
    val cte = """(?is)(?:with(?:\s+recursive)?|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s*as\s*(?:(?:not\s+)?materialized\s*)?\(""".r
    // capture comma-separated FROM lists too ("FROM r, t") — a
    // first-relation-only match would let the trailing relations
    // escape validation entirely
    val rel = """(?is)\b(?:from|join)\s+([a-z_][a-z0-9_]*(?:\s*,\s*[a-z_][a-z0-9_]*)*)""".r
    // SQL constructs that legally follow FROM/JOIN without naming a
    // stored relation: lateral subqueries and table functions
    val keywords = Set("lateral", "unnest", "values", "generate_series", "range")
    Oracles.all.foreach { case (name, sql) =>
      val ctes = cte.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val rels = rel.findAllMatchIn(sql)
        .flatMap(_.group(1).toLowerCase.split(',').map(_.trim)).toSet
      val unknown = rels.diff(testdata).diff(ctes).diff(keywords)
      assert(unknown.isEmpty,
        s"$name: oracle references non-testdata relations: ${unknown.toSeq.sorted}")
      // DuckDB-side file access would bypass the driver's view setup
      assert(!sql.toLowerCase.contains("read_parquet"),
        s"$name: oracle must use the driver-defined views, not read_parquet")
    }
  }
}
