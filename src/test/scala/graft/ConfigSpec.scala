package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config precedence (reference etl.js:10-12): argv > env > file >
  * default, per key independently.
  */
class ConfigSpec extends AnyFunSuite {

  test("argv beats env beats file beats default, per key") {
    val cfg = Config(
      argv = Map("sf-dir" -> "/a"),
      env = Map("SPARK_GRAFT_SF_DIR" -> "/e", "SPARK_GRAFT_CPUS" -> "8"),
      file = Map("sf-dir" -> "/f", "cpus" -> "2", "out-dir" -> "/tmp/f"))
    assert(cfg.get("sf-dir", "SPARK_GRAFT_SF_DIR", "/d") == "/a") // argv wins
    assert(cfg.get("cpus", "SPARK_GRAFT_CPUS", "4") == "8")       // env beats file
    assert(cfg.get("out-dir", "SPARK_GRAFT_OUT_DIR", "/d") == "/tmp/f") // file beats default
    assert(cfg.get("mode", "SPARK_GRAFT_MODE", "batch") == "batch")     // default
  }

  test("parseArgv takes only --key=value tokens and splits on the first =") {
    val m = Config.parseArgv(Array("/positional", "--sf-dir=/x", "--flag", "--kv=a=b"))
    assert(m == Map("sf-dir" -> "/x", "kv" -> "a=b"))
  }

  test("missing properties file is an empty layer, present file loads") {
    assert(Config.loadFile("/nonexistent/graft.conf").isEmpty)
    val f = java.io.File.createTempFile("graft", ".conf")
    try {
      java.nio.file.Files.writeString(f.toPath, "cpus=16\nsf-dir=/from-file\n")
      val m = Config.loadFile(f.getPath)
      assert(m == Map("cpus" -> "16", "sf-dir" -> "/from-file"))
    } finally f.delete()
  }
}
