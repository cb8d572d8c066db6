package graft

import org.apache.spark.sql.SparkSession

/** The library must degrade gracefully in a session built WITHOUT
  * GraftExtensions (e.g., a user's own SparkSession): native functions fall
  * back to built-in formulations, and the custom-plan builder installs its
  * strategy through the public experimental hook.
  */
class ForeignSessionSpec extends SparkSpec {

  test("cosineTopK and vector ops work in a plain session") {
    // newSession shares the SparkContext but has fresh state: no injected
    // functions, no injected planner strategies.
    val plain = spark.newSession()
    plain.conf.set("spark.sql.shuffle.partitions", "4")
    plain.conf.set("spark.sql.session.timeZone", "UTC")
    // dispatched dot falls back to the HOF form when unregistered
    val brute = queries.LlmOps.annBruteForce(plain, sfDir).collect()
    assert(brute.nonEmpty)
    // custom plan self-installs its strategy
    val custom = queries.LlmOps.annCustomTopK(plain, sfDir).collect()
    assert(custom.toSeq === brute.toSeq)
  }
}
