package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DerbyFixture, JdbcExecutor}
import graft.types.{ConnectionError, ExecutionError, MultiDbError}

/** Executor behavioral contract (CONTRACT_TESTS.md C1800-C1804) against the
  * live embedded-Derby database — any `DbExecutor` implementation must
  * satisfy these guarantees, tested directly rather than through the query
  * pipeline.
  */
class ExecutorContractSpec extends AnyFunSuite {

  private lazy val url: String =
    DerbyFixture.nationUrl(TestSpark.session, "/root/testdata/sf0.001")

  test("C1800: ping resolves for a healthy executor") {
    val ex = new JdbcExecutor(url)
    ex.ping() // must not throw
    ex.close()
  }

  test("C1801: execute returns rows as column-name maps, params bound") {
    val ex = new JdbcExecutor(url)
    try {
      // Spark's Derby writer creates case-sensitive (quoted) column names
      val rows = ex.execute(
        """SELECT "n_nationkey", "n_name" FROM nation WHERE "n_regionkey" = ? ORDER BY "n_nationkey"""",
        Seq(Integer.valueOf(0)))
      assert(rows.nonEmpty)
      assert(rows.head.keySet == Set("n_nationkey", "n_name"))
      assert(rows.map(_("n_nationkey").asInstanceOf[Number].intValue()).sorted ==
        rows.map(_("n_nationkey").asInstanceOf[Number].intValue()))
    } finally ex.close()
  }

  test("C1801b: a hostile param value is bound literally, never interpolated") {
    val ex = new JdbcExecutor(url)
    try {
      val rows = ex.execute("""SELECT "n_name" FROM nation WHERE "n_name" = ?""",
        Seq("x' OR '1'='1"))
      assert(rows.isEmpty) // injection text matches nothing as a literal
    } finally ex.close()
  }

  test("C1802: invalid SQL raises ExecutionError QUERY_FAILED") {
    val ex = new JdbcExecutor(url)
    try {
      val e = intercept[ExecutionError](
        ex.execute("SELECT * FROM __nonexistent_table_xyz__", Nil))
      assert(e.code == "QUERY_FAILED")
    } finally ex.close()
  }

  test("C1803: close resolves without error (idempotent)") {
    val ex = new JdbcExecutor(url)
    ex.close()
    ex.close() // second close must not throw
  }

  test("C1803b: closing a never-used executor never opens a connection") {
    // an unreachable URL must not matter — close() may not trigger connect
    new JdbcExecutor("jdbc:derby:/nonexistent/path/db").close()
  }

  test("C1804: ping after close raises ConnectionError or ExecutionError") {
    val ex = new JdbcExecutor(url)
    ex.close()
    val e = intercept[MultiDbError](ex.ping())
    assert(e.isInstanceOf[ConnectionError] || e.isInstanceOf[ExecutionError])
  }
}
