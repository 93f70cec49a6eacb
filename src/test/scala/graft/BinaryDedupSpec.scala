package graft

import org.apache.spark.sql.functions._

/** Exact binary-payload dedup (#152): planted duplicate payloads must
  * collapse on md5(bytes), the per-(format, size-bucket) profile must
  * report the reclaimable counts and byte mass exactly, and the
  * sample_md5 column must equal the JVM's own MD5 of the payload
  * bytes (the cross-engine hash-parity pin). */
class BinaryDedupSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // first chars chosen for both format arms: '0' = 0x30 (even -> rgb),
  // 'a' = 0x61 (odd -> rgba); payload sizes keep everything in bucket 0
  private val dupRgb = "0 duplicated payload body"
  private val uniqRgb = "2 unique payload body"
  private val dupRgba = "a mirrored audio clip bytes"

  private def corpus: Seq[(Long, String)] = Seq(
    1L -> dupRgb, 2L -> dupRgb, 3L -> dupRgb, // 3 copies, 1 distinct
    4L -> uniqRgb,
    5L -> dupRgba, 6L -> dupRgba, // 2 copies, 1 distinct
    7L -> null.asInstanceOf[String])

  private def run() = {
    val docs = corpus.toDF("doc_id", "text")
    // binaryDedup reads via Tables.documents; drive the same body on a
    // local frame by inlining the projection contract
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    QueriesText.binaryDedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getString(8)))
  }

  test("planted duplicates collapse on the payload hash; profile counts exact") {
    val rows = run()
    val byFmt = rows.groupBy(_._1)
    // rgb bucket: 4 payloads (3 dup copies + 1 unique), 2 distinct
    val rgb = byFmt("rgb")
    assert(rgb.map(_._3).sum == 4L && rgb.map(_._4).sum == 2L)
    assert(rgb.map(_._5).sum == 2L, "rgb dup_payloads = copies - distinct = 2")
    // rgba bucket: 2 payloads, 1 distinct, 1 reclaimable
    val rgba = byFmt("rgba")
    assert(rgba.map(_._3).sum == 2L && rgba.map(_._4).sum == 1L && rgba.map(_._5).sum == 1L)
    // null text never enters
    assert(rows.map(_._3).sum == 6L)
  }

  test("byte mass: total and reclaimable-duplicate bytes are exact") {
    val rows = run()
    val rgb = rows.filter(_._1 == "rgb")
    val expTotal = 3L * dupRgb.length + uniqRgb.length // ASCII: chars == bytes
    val expDup = 2L * dupRgb.length
    assert(rgb.map(_._6).sum == expTotal, "bytes_total")
    assert(rgb.map(_._7).sum == expDup, "dup_bytes")
    val rgba = rows.filter(_._1 == "rgba")
    assert(rgba.map(_._7).sum == dupRgba.length.toLong)
    // dup_permille is integer floor math on the cell
    rows.foreach { r =>
      assert(r._8 == r._5 * 1000L / r._3, s"dup_permille of ${r._1}/${r._2}")
    }
  }

  test("sample_md5 equals the JVM's MD5 of the payload bytes (hash parity pin)") {
    val rows = run()
    val expected = Map(
      "rgb" -> Seq(md5hex(dupRgb), md5hex(uniqRgb)).min,
      "rgba" -> md5hex(dupRgba))
    rows.foreach { r =>
      assert(r._9 == expected(r._1), s"sample_md5 of ${r._1}: got ${r._9}")
    }
  }

  test("format rule is the stub decoder's first-byte parity, byte-exact") {
    // multi-byte first char: 'é' = 0xC3 0xA9 in UTF-8 — first BYTE
    // 0xC3 is odd -> rgba, even though the CODEPOINT 0xE9 is odd too;
    // 'Ā' = 0xC4 0x80 — first byte 0xC4 even -> rgb while the
    // codepoint 0x100 is even: the hex-nibble rule keys on bytes, so
    // it cannot diverge between engines on multi-byte text
    val dir = java.nio.file.Files.createTempDirectory("graft_bin2").toString
    Seq(1L -> "é multi", 2L -> "Ā multi", 3L -> "")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fmts = QueriesText.binaryDedup(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(fmts.get("rgba").contains(1L), "0xC3-led payload is rgba")
    assert(fmts.get("rgb").contains(1L), "0xC4-led payload is rgb")
    assert(fmts.get("empty").contains(1L), "zero-byte payload is its own format")
  }
}
