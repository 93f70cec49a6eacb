package graft

/** The README's operator index is a promise to users ("every query a
  * reference user runs today exists here") — pin it to the actual
  * registry so adding or renaming a query without updating the index
  * fails the build instead of silently shipping stale docs. */
class ReadmeSpec extends SparkSpec {
  test("README operator index matches the query registry exactly") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")))
    val begin = readme.indexOf("<!-- operator-index:begin -->")
    val end = readme.indexOf("<!-- operator-index:end -->")
    assert(begin >= 0 && end > begin, "README must contain the operator-index markers")
    val table = readme.substring(begin, end)
    val listed = """\| `(q_\w+)` \|""".r.findAllMatchIn(table).map(_.group(1)).toSeq
    assert(listed.size == listed.distinct.size,
      s"duplicate index rows: ${listed.diff(listed.distinct).distinct}")
    val registry = Queries.all.keySet
    assert(listed.toSet == registry,
      s"index out of sync — missing: ${registry.diff(listed.toSet).toSeq.sorted}, " +
        s"stale: ${listed.toSet.diff(registry).toSeq.sorted}")
    // The prose count drifts silently when rows are added (it sat at 85
    // for two rounds while the table grew to 103) — pin it too.
    assert(readme.contains(s"${registry.size} verified queries"),
      s"README prose must state '${registry.size} verified queries'")
  }
}
