package graft

/** Driver-contract guards: every declared operator must carry an oracle,
  * and none may silently regress to an empty result (the hash gate would
  * "pass" an empty-vs-empty compare). */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("every query returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, fn) =>
      fn(spark, sf()).limit(1).count() == 0
    }
    assert(empty.isEmpty, s"empty results: ${empty.map(_._1).mkString(", ")}")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
