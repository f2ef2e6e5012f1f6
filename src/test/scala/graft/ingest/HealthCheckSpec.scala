package graft.ingest

import java.nio.file.Files
import graft.SparkSpec

/** S17 startup health-check and S20 structured JSON logging. */
class HealthCheckSpec extends SparkSpec {

  test("path probe passes on a creatable root and fails on an unwritable one") {
    val ok = Files.createTempDirectory("graft-health").toString
    assert(HealthCheck.probePath(spark, s"$ok/tables").isRight)
    // a path under a plain file cannot be created
    val f = Files.createTempFile("graft-health", ".txt")
    assert(HealthCheck.probePath(spark, f.toString + "/tables").isLeft)
  }

  test("jdbc probe fails cleanly with no database present") {
    val r = HealthCheck.probeJdbc("jdbc:nosuchdb://localhost/none")
    assert(r.isLeft)
    assert(r.swap.exists(_.contains("jdbc probe failed")))
  }

  test("checkAll aggregates probe failures for a config") {
    val root = Files.createTempDirectory("graft-health2").toString
    val good = EngineConfig(
      topics = Seq(TopicConfig("t", "t", "v\tInt64\t\t")),
      tableRoot = s"$root/tables",
      deadLetterRoot = s"$root/dead",
      checkpointRoot = s"$root/ckpt")
    assert(HealthCheck.checkAll(spark, good).isEmpty)
    val bad = good.copy(jdbcUrl = Some("jdbc:nosuchdb://localhost/none"))
    assert(HealthCheck.checkAll(spark, bad).size == 1)
  }

  test("GraftLog renders the reference's JSON line contract with escaping") {
    val line = GraftLog.render(GraftLog.INFO, """say "hi"""", "desc\nline2")
    assert(line == """{"status":"Info","message":"say \"hi\"","description":"desc\nline2"}""")
  }
}
