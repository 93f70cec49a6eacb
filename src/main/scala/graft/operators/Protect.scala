package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII protection operators (reference
  * `src/main/utility/encrypt_decrypt.py` — AES-CBC over sensitive
  * strings — generalized to the three standard treatments):
  *
  *  - [[mask]]: format-preserving redaction (first char kept);
  *  - [[tokenize]]: salted SHA-256 — deterministic, joinable token;
  *  - [[encrypt]]/[[decrypt]]: reversible AES via Spark's native
  *    `aes_encrypt`/`aes_decrypt` expressions (codegen'd, no UDF,
  *    unlike the reference's driver-side PyCryptodome calls which
  *    would funnel every row through Python).
  *
  * CBC with a caller-supplied IV is deterministic (matches the
  * reference's fixed-IV behavior and allows equality joins on
  * ciphertext); pass mode="GCM" for randomized, authenticated
  * encryption when determinism isn't required.
  */
object Protect {
  /** Keep the first character, redact the rest. (Plain string ops —
    * portable to engines whose regex lacks lookaround.) */
  def mask(c: Column): Column =
    concat(substring(c, 1, 1), repeat(lit("*"), greatest(length(c) - 1, lit(0))))

  /** Redact all but the last `keep` characters. */
  def maskTail(c: Column, keep: Int): Column =
    concat(
      repeat(lit("*"), greatest(length(c) - keep, lit(0))),
      substring(c, -keep, keep)
    )

  /** Deterministic salted token (SHA-256 hex). */
  def tokenize(c: Column, salt: String): Column =
    sha2(concat(lit(salt), c), 256)

  /** AES encryption of a string column. `key` must be 16/24/32 bytes. */
  def encrypt(c: Column, key: String, mode: String = "CBC", iv: Option[String] = None): Column =
    iv match {
      case Some(v) =>
        call_function("aes_encrypt", c.cast("binary"), lit(key), lit(mode), lit("DEFAULT"), unhex(lit(v)))
      case None =>
        call_function("aes_encrypt", c.cast("binary"), lit(key), lit(mode), lit("DEFAULT"))
    }

  def decrypt(c: Column, key: String, mode: String = "CBC"): Column =
    call_function("aes_decrypt", c, lit(key), lit(mode), lit("DEFAULT")).cast("string")
}
