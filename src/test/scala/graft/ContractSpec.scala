package graft

/** The driver contract itself, enforced: every declared query must carry
  * an oracle (round 1 lost three queries to silent `no_oracle` grading),
  * names must be stable and well-formed, and the flagship entry must
  * produce rows on a bare session. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are well-formed and unique") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), "qNN_snake_case naming")
    assert(names.map(_.takeWhile(_ != '_')).distinct.size == names.size,
      "query numbers must be unique")
  }

  test("oracle SQL is present and single-statement") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.trim.endsWith(";"), s"$name: trailing semicolon breaks embedding")
    }
  }

  test("entry produces rows (driver t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
