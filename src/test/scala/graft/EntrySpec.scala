package graft

class EntrySpec extends SparkSpec {

  test("flagship entry query returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has a distinct name and runnable fn") {
    val qs = SparkEntry.queries
    assert(qs.size >= 80)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(SparkEntry.benchNames.toSet.subsetOf(qs.keySet))
  }
}
