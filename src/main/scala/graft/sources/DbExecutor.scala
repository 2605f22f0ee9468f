package graft.sources

import java.sql.{Connection, DriverManager, SQLException}
import scala.collection.mutable.ArrayBuffer
import graft.types.{ConnectionError, ExecutionError}

/** Raw-SQL executor for one external database (reference METADATA.md:223-227:
  * `execute(sql, params)` / `ping()` / `close()`). In the Spark build the
  * query path reads sources through DataFrames (the partitioned JDBC scan in
  * [[DerbyFixture]]/[[SourceLoaders]]), so this surface exists for the
  * side-channel uses the reference gives it: startup connection validation,
  * health probes, and direct parameterized statements. Behavioral contract
  * pinned by ExecutorContractSpec (CONTRACT_TESTS.md C1800-C1804).
  */
trait DbExecutor {
  /** Run parameterized SQL; values are BOUND, never interpolated
    * (SECURITY.md layer 2). Returns rows as column-name → value maps.
    */
  def execute(sql: String, params: Seq[Any]): Seq[Map[String, Any]]

  /** Lightweight connectivity check; throws on failure. */
  def ping(): Unit

  def close(): Unit
}

/** JDBC-backed executor (embedded Derby in this container; the same class
  * drives any JDBC URL). One connection per executor — the heavy parallel
  * read path belongs to Spark's partitioned JDBC scans, not here.
  *
  * @param pingSql dialect-specific probe (`SELECT 1` for most engines;
  *                Derby has no FROM-less SELECT, so `VALUES 1`)
  */
final class JdbcExecutor(url: String, timeoutMs: Long = 30000L,
    pingSql: String = "VALUES 1") extends DbExecutor {

  @volatile private var closed = false
  private var opened: Option[Connection] = None

  /** Open-on-first-use; close() must never trigger a connection attempt. */
  private def conn: Connection = synchronized {
    if (closed)
      throw ConnectionError("CONNECTION_FAILED", Map("message" -> "executor closed"))
    opened.getOrElse {
      val c =
        try DriverManager.getConnection(url)
        catch { case e: SQLException =>
          throw ConnectionError("CONNECTION_FAILED", Map("message" -> e.getMessage))
        }
      opened = Some(c)
      c
    }
  }

  override def execute(sql: String, params: Seq[Any]): Seq[Map[String, Any]] = {
    if (closed) throw ConnectionError("CONNECTION_FAILED", Map("message" -> "executor closed"))
    try {
      val ps = conn.prepareStatement(sql)
      try {
        ps.setQueryTimeout(math.max(1, timeoutMs / 1000).toInt)
        params.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
        val rs = ps.executeQuery()
        val md = rs.getMetaData
        val names = (1 to md.getColumnCount).map(md.getColumnLabel)
        val rows = ArrayBuffer.empty[Map[String, Any]]
        while (rs.next()) rows += names.zipWithIndex
          .map { case (n, i) => n -> rs.getObject(i + 1) }.toMap
        rows.toSeq
      } finally ps.close()
    } catch {
      case e: java.sql.SQLTimeoutException =>
        throw ExecutionError("QUERY_TIMEOUT",
          Map("message" -> String.valueOf(e.getMessage)), Some(e))
      case e: SQLException =>
        throw ExecutionError("QUERY_FAILED",
          Map("message" -> String.valueOf(e.getMessage)), Some(e))
    }
  }

  override def ping(): Unit = { execute(pingSql, Nil); () }

  override def close(): Unit = synchronized {
    closed = true
    opened.foreach(c => try c.close() catch { case _: SQLException => () })
    opened = None
  }
}
