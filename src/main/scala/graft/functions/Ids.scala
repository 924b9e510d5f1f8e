package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-id generation — the cuid role of the reference's primary keys
  * (`@default(cuid())`, `schema.prisma:17`). */
object Ids {

  /** cuid-shaped unique id: time component + per-row randomness + a
    * content fingerprint. Collision-safe in practice (64 random bits +
    * millisecond timestamp); NOT deterministic across runs — use
    * [[deterministicId]] for replay-idempotent pipelines. */
  def cuid(): Column =
    concat(
      lit("c"),
      lower(hex(unix_millis(current_timestamp()))),
      lower(hex((rand() * lit(Long.MaxValue)).cast("long"))))

  /** Deterministic id from a natural key: the replay-idempotent variant
    * the pipeline stages use (same input row → same id, so re-processing
    * collides on the unique key and is swallowed instead of duplicated). */
  def deterministicId(prefix: String, naturalKey: Column): Column =
    concat(lit(prefix), lit("_"), md5(naturalKey))
}
