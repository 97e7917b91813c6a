package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{FilterFileSystem, Path}

/** ADVICE r17: one failed per-stripe release inside `withLeases` must
  * not abandon the REMAINING stripes until the staleMs usurpation
  * horizon — every release is attempted, the first release error is
  * rethrown after all attempts, and a body error stays primary with the
  * release error suppressed under it. Injection point: the fenced
  * release's `fs.delete` of the claimed grave file. */
class LeaseReleaseFailureSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def freshDir(name: String): Path = {
    val p = graft.sources.Sinks.scratchDir("lease_release_spec") + s"/$name"
    graft.sources.Sinks.clearDir(p)
    new Path(p)
  }

  /** A FileSystem whose delete throws ONCE for any path whose name
    * contains the armed substring (the release grave embeds the lease
    * name: `.{name}.release-{token}`). */
  private def failingFs(armed: java.util.concurrent.atomic.AtomicReference[String]) = {
    val raw = new Path("/tmp").getFileSystem(
      spark.sessionState.newHadoopConf())
    new FilterFileSystem(raw) {
      override def delete(p: Path, recursive: Boolean): Boolean = {
        val a = armed.get()
        if (a != null && p.getName.contains(a)) {
          armed.set(null)
          throw new java.io.IOException(s"injected release failure on $p")
        }
        super.delete(p, recursive)
      }
    }
  }

  test("a failed middle-stripe release still releases the rest; the error is rethrown") {
    val dir = freshDir("middle")
    val armed = new java.util.concurrent.atomic.AtomicReference[String](null)
    val fs = failingFs(armed)
    fs.mkdirs(dir)
    val stripes = Seq("g-AA", "g-BB", "g-CC")
      .map(n => new Path(dir, s"_WRITER_LEASE.$n"))
    armed.set("_WRITER_LEASE.g-BB.release-")
    val e = intercept[java.io.IOException] {
      graft.sources.Sinks.withLeases(fs, stripes) { () }
    }
    assert(e.getMessage.contains("injected"))
    // no stripe file remains: AA and CC were released NORMALLY despite
    // BB's failure (without the fix, CC stayed held until staleMs); BB's
    // lease file itself was renamed away by the fenced release before
    // the grave delete failed, so it is not held either
    val leftover = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_WRITER_LEASE"))
    assert(leftover.isEmpty, s"stripes left held: $leftover")
    // the proof that nothing is abandoned: an immediate re-acquisition
    // of all three succeeds without waiting out any stale horizon
    graft.sources.Sinks.withLeases(fs, stripes) { () }
    assert(!fs.listStatus(dir).exists(
      _.getPath.getName.startsWith("_WRITER_LEASE")))
  }

  test("a non-local return from the body does not swallow a release error") {
    // a `return` inside the body unwinds as a ControlThrowable built
    // with suppression DISABLED — addSuppressed on it is a silent no-op,
    // so without the carve-out the release error would vanish and the
    // op would report success while a stripe's grave file leaked
    val dir = freshDir("nonlocal")
    val armed = new java.util.concurrent.atomic.AtomicReference[String](null)
    val fs = failingFs(armed)
    fs.mkdirs(dir)
    val stripes = Seq("g-AA", "g-BB")
      .map(n => new Path(dir, s"_WRITER_LEASE.$n"))
    def opWithEarlyReturn(): Long =
      graft.sources.Sinks.withLeases(fs, stripes) { return 7L }
    // sanity: the non-local return itself works
    assert(opWithEarlyReturn() === 7L)
    armed.set("_WRITER_LEASE.g-AA.release-")
    val e = intercept[java.io.IOException] { opWithEarlyReturn() }
    assert(e.getMessage.contains("injected"),
      s"release error was swallowed by the non-local return: $e")
    // and the other stripe was still released
    assert(!fs.exists(stripes(1)))
    graft.sources.Sinks.withLeases(fs, stripes) { () }
  }

  test("a body error stays primary; the release error is suppressed under it") {
    val dir = freshDir("primary")
    val armed = new java.util.concurrent.atomic.AtomicReference[String](null)
    val fs = failingFs(armed)
    fs.mkdirs(dir)
    val stripes = Seq("g-AA", "g-BB")
      .map(n => new Path(dir, s"_WRITER_LEASE.$n"))
    armed.set("_WRITER_LEASE.g-AA.release-")
    val e = intercept[RuntimeException] {
      graft.sources.Sinks.withLeases(fs, stripes) {
        sys.error("body failure")
      }
    }
    assert(e.getMessage === "body failure")
    assert(e.getSuppressed.exists(_.getMessage.contains("injected")),
      s"release error not suppressed under the body error: " +
        s"${e.getSuppressed.toSeq}")
    // and BB was still released
    assert(!fs.exists(stripes(1)))
    graft.sources.Sinks.withLeases(fs, stripes) { () }
  }
}
