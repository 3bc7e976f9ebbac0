package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[SessionScope]]: stop hooks free the session-keyed registries
  * without any later graft call — verified end-to-end in a forked JVM
  * (stopping a SparkContext in-process would take the shared test
  * session down with it). */
class SessionScopeSpec extends AnyFunSuite {

  test("a stopped session's registry entries are dropped by the stop hook alone") {
    val java = sys.props("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.SessionStopProbe", "/root/testdata/sf0.001")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    assert(rc == 0, s"probe exit $rc:\n${out.linesIterator.toSeq.takeRight(15).mkString("\n")}")
    assert(out.contains("PROBE: clean"))
  }
}
