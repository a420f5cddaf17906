package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** The verify_meta.json sidecar exists to surface queries that crash
  * before their parquet lands (the round-8/9 silent-shrink failure mode)
  * — so the sidecar itself must survive ANY exception message, including
  * ones carrying unpaired UTF-16 surrogates that would make a naive
  * UTF-8 write throw and lose the report.
  */
class VerifyMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("sidecar records declared/run/written/failed and parses as strict " +
      "JSON even with hostile failure messages") {
    val out = Files.createTempDirectory("verify_meta").toString
    val ok = (s: SparkSession, _: String) => s.range(3).toDF("id")
    val boom = (_: SparkSession, _: String) => {
      // unpaired high surrogate mid-string, lone low at the end, plus a
      // tab and a real (well-formed) emoji pair that must SURVIVE
      throw new RuntimeException(
        "lone-high \uD83D mid\ttab pair 😀 lone-low \uDE00")
    } : DataFrame
    val failed = Verify.run(spark, "/unused-sf-dir", out, declared = 5,
      Seq[(String, (SparkSession, String) => DataFrame)](
        "q_ok" -> ok, "q_boom" -> boom),
      Map("q_ok" -> "SELECT 1 AS id"))
    assert(failed.keySet == Set("q_boom"))
    assert(new File(s"$out/q_ok").exists, "passing query's parquet missing")
    assert(!new File(s"$out/q_boom").isDirectory ||
      new File(s"$out/q_boom").list().isEmpty)
    // strict parse via Jackson (what a driver-side json.load would do)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new File(s"$out/verify_meta.json"))
    assert(meta.get("n_declared").asInt == 5)
    assert(meta.get("n_run").asInt == 2)
    assert(meta.get("n_written").asInt == 1)
    val msg = meta.get("failed").get("q_boom").asText
    assert(msg.contains("�"), s"lone surrogates not replaced: $msg")
    assert(msg.contains("😀"), s"well-formed pair mangled: $msg")
    assert(msg.contains("mid\ttab"), s"message content lost: $msg")
    val oracle = mapper.readTree(new File(s"$out/oracle_sql.json"))
    assert(oracle.get("q_ok").asText == "SELECT 1 AS id")
  }

  test("sanitize: pairs kept, lone surrogates replaced, truncation-split " +
      "pair repaired") {
    assert(Verify.sanitize("plain") == "plain")
    assert(Verify.sanitize("a😀b") == "a😀b")
    assert(Verify.sanitize("a\uD83Db") == "a�b")
    assert(Verify.sanitize("a\uDE00b") == "a�b")
    // take() cutting a pair in half leaves a trailing high surrogate
    assert(Verify.sanitize("ab😀".take(3)) == "ab�")
    assert(Verify.sanitize("\uDE00\uD83D") == "��")
  }
}
