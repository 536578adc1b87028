package graft

/** The shipped example config must stay loadable and its own tests
  * green — it is the first thing a new user runs. */
class ExampleConfigSpec extends SparkSpec {
  test("examples/graft.example.json parses and passes its own tests") {
    val path = java.nio.file.Paths.get("examples/graft.example.json")
    val streams = graft.config.ConfigFile.load(path)
    assert(streams.map(s =>
      graft.config.ConfigFile.str(s \ "name", "name")).toSet ==
      Set("index", "graphite-index", "hot-alerts", "fleet-size",
        "p95-latency", "sessions"))
    val (passed, failed) = Main.runTests(path, spark)
    assert(passed == 5 && failed == 0, s"$passed passed, $failed failed")
  }
}
