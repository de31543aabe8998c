package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic keyed pseudonymization — the privacy-ETL primitive for
  * sharing analyzable data without raw identifiers.
  *
  * A salted one-way digest replaces each key with a stable surrogate:
  * equal keys map to equal pseudonyms EVERYWHERE (referential integrity
  * survives — joins, group-bys, and distinct counts still work across
  * tables pseudonymized with the same salt), while the raw key never
  * appears in the output and cannot be recovered without the salt.
  * Unlike [[graft.Queries.piiRedact]]'s pattern scrubbing (which removes
  * free-text PII), this transforms JOIN KEYS, and consistency across
  * tables is the whole point.
  *
  * Shape: a pure narrow codegen'd projection (md5 over salt‖key) — zero
  * shuffle, zero state; at 100 TB it rides every scan for free. Size the
  * digest by the birthday bound n²/2N: 64 bits keep the collision
  * probability < 3·10⁻⁸ at ~10⁶ distinct keys, but at 10⁹ keys it rises
  * to ~2.7% — percent-level odds of silently merging two identities. At
  * ≥ 10⁸ distinct keys pass `bits = 128` (collision odds < 2·10⁻²¹ even
  * at 10⁹ keys); 128 bits is also the hard no-collision contract.
  */
object Privacy {

  /** Pseudonym column: lowercase hex of the leading `bits` of
    * md5(salt ‖ ':' ‖ key rendered as a string). Deterministic across
    * engines — DuckDB replays it as
    * `substr(md5(salt || ':' || CAST(k AS VARCHAR)), 1, bits/4)`.
    */
  def pseudonym(key: Column, salt: String, bits: Int = 64): Column = {
    require(bits % 4 == 0 && bits > 0 && bits <= 128,
      s"bits must be a positive multiple of 4 up to 128, got $bits")
    substring(md5(concat(lit(salt), lit(":"), key.cast("string"))
      .cast("binary")), 1, bits / 4)
  }
}
