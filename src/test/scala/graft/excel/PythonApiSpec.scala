package graft.excel

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.jar.{JarEntry, JarOutputStream}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** R12 automation: drives python_lib/tests/test_api.py end-to-end — the
  * async wrapper resolving spark-submit + the app jar, converting a real
  * workbook through the R11 CLI, and surfacing exit-1 errors as
  * GraftToParquetError. The app jar is packaged here from the compiled
  * classes so the test needs no prior `sbt package`.
  */
class PythonApiSpec extends AnyFunSuite {

  private val repo = Paths.get(".").toAbsolutePath.normalize

  private def jarFromClasses(): Path = {
    val classes = repo.resolve("target/scala-2.13/classes")
    assume(Files.isDirectory(classes), "compiled classes missing")
    val jar = Files.createTempDirectory("pyapi").resolve("graft-test.jar")
    val jos = new JarOutputStream(new FileOutputStream(jar.toFile))
    try {
      Files.walk(classes).iterator().asScala
        .filter(Files.isRegularFile(_))
        .foreach { f =>
          val name = classes.relativize(f).toString.replace('\\', '/')
          jos.putNextEntry(new JarEntry(name))
          val in = new BufferedInputStream(new FileInputStream(f.toFile))
          try in.transferTo(jos) finally in.close()
          jos.closeEntry()
        }
    } finally jos.close()
    jar
  }

  test("python async API converts and errors per the reference contract") {
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => Files.isExecutable(Paths.get(p)))
      .orElse(sys.env.get("PATH").flatMap(_.split(':')
        .map(d => Paths.get(d, "python3"))
        .find(Files.isExecutable(_)).map(_.toString)))
    assume(python.isDefined, "python3 not on PATH")
    val sparkSubmit = Paths.get("/opt/spark/bin/spark-submit")
    assume(Files.isExecutable(sparkSubmit), "spark-submit missing")

    val jar = jarFromClasses()
    val pb = new ProcessBuilder(
      python.get, repo.resolve("python_lib/tests/test_api.py").toString)
    pb.directory(repo.resolve("python_lib").toFile)
    pb.environment().put("GRAFT_JAR", jar.toString)
    pb.environment().put("GRAFT_SPARK_SUBMIT", sparkSubmit.toString)
    // keep the subprocess Spark small; the CLI's local session reads
    // cores from SPARK_GRAFT_CPUS
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.environment().put("GRAFT_SPARK_ARGS", "--master local[4]")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    assert(rc == 0, s"python test suite failed (rc=$rc):\n$out")
    assert(out.contains("Ran 5 tests"), out)
    assert(!out.contains("skipped=2"), s"end-to-end layer was skipped:\n$out")
  }

  test("packaging build hook stages the app jar per its contract") {
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => Files.isExecutable(Paths.get(p)))
    assume(python.isDefined, "python3 not on PATH")
    val pb = new ProcessBuilder(
      python.get, repo.resolve("python_lib/tests/test_build_hook.py").toString)
    pb.directory(repo.resolve("python_lib").toFile)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    assert(rc == 0, s"build-hook tests failed (rc=$rc):\n$out")
    assert(out.contains("Ran 3 tests"), out)
  }
}
