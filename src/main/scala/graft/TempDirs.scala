package graft

import java.nio.file.{Files, Path}

/** Per-JVM temp-dir factory with exit-time cleanup. Every per-JVM
  * materialization (IVF index, partitioned orders, ORC/text landings,
  * bucketed warehouse, embedded Derby) allocates through here so repeated
  * Verify/Bench/test JVMs don't accumulate parquet copies in /tmp: one
  * shutdown hook deletes everything this process created, recursively.
  * Deletion is best-effort (files are unlinked even if a component still
  * holds them open — fine on POSIX; failures are swallowed because the JVM
  * is exiting anyway).
  */
object TempDirs {

  private val created = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // Derby's own shutdown hook rewrites derby.log and can recreate a dir
      // after we delete it; shut the engine down first so deletion is final.
      // The property is set iff DerbyFixture booted a database this JVM —
      // checking it avoids loading the driver in JVMs that never used Derby.
      if (System.getProperty("derby.stream.error.file") != null)
        try java.sql.DriverManager.getConnection("jdbc:derby:;shutdown=true")
        catch { case _: Exception => () } // XJ015 == successful engine shutdown
      created.forEach { root =>
        val walk = try Files.walk(root) catch { case _: Exception => null }
        if (walk != null)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
          catch { case _: Exception => () }
          finally walk.close()
      }
    }, "graft-tempdir-cleanup"))
  }

  /** Create a fresh temp directory that will be deleted when this JVM exits. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }
}
