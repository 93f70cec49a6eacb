package graft

import org.apache.spark.sql.functions._
import graft.operators.{Protect, GraftConfig}
import java.nio.file.Files

class ProtectSpec extends SparkSpec {
  import spark.implicits._

  test("mask keeps first char, maskTail keeps suffix") {
    val out = Seq("Customer#42", "x", "").toDF("s")
      .select(Protect.mask($"s").as("m"), Protect.maskTail($"s", 3).as("t"))
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("C**********", "********#42"), ("x", "x"), ("", "")))
  }

  test("tokenize is deterministic and salted") {
    val t = Seq("alice", "alice", "bob").toDF("s")
      .select(Protect.tokenize($"s", "salt1").as("t")).as[String].collect()
    assert(t(0) == t(1) && t(0) != t(2) && t(0).matches("[0-9a-f]{64}"))
  }

  test("aes encrypt/decrypt round-trips in CBC and GCM") {
    val key = "0123456789abcdef"
    for (mode <- Seq("CBC", "GCM")) {
      val iv = if (mode == "CBC") Some("000102030405060708090a0b0c0d0e0f") else None
      val ok = Seq("secret data", "").toDF("s")
        .select((Protect.decrypt(Protect.encrypt($"s", key, mode, iv), key, mode) === $"s").as("ok"))
        .as[Boolean].collect()
      assert(ok.forall(identity), s"mode $mode failed")
    }
  }

  test("CBC with fixed IV is deterministic (equality-joinable ciphertext)") {
    val key = "0123456789abcdef"
    val iv = Some("000102030405060708090a0b0c0d0e0f")
    val c = Seq("same", "same").toDF("s")
      .select(hex(Protect.encrypt($"s", key, "CBC", iv)).as("c")).as[String].collect()
    assert(c(0) == c(1))
  }

  test("config layers base < env overlay < process env") {
    val dir = Files.createTempDirectory("graft_cfg").toString
    Files.write(java.nio.file.Paths.get(dir, "base.properties"),
      "paths.bronze=/b\npipeline.mode=full\n".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "prod.properties"),
      "pipeline.mode=incremental\n".getBytes)
    val cfg = GraftConfig.load(dir, "prod", Map("GRAFT_PATHS_BRONZE" -> "/override"))
    assert(cfg("paths.bronze") == "/override")
    assert(cfg("pipeline.mode") == "incremental")
    assert(GraftConfig.load(dir, "dev", Map.empty)("pipeline.mode") == "full")
    intercept[NoSuchElementException](cfg("nope"))
  }
}
