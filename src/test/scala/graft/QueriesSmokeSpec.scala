package graft

/** Smoke: every declared query runs at sf0.001 and the flagship returns
  * rows (the driver's t1 check). Correctness is the DuckDB oracle gate
  * (driver t2 / tools/check.py), not this suite. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with deterministic schema") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.distinct.length === df.columns.length, "duplicate column names break the oracle compare")
    }
  }
}
