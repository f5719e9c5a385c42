package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup: emit only the FIRST arrival of each content hash
  * across micro-batches — `flatMapGroupsWithState` with one boolean state
  * cell per hash. The state store is partitioned by the hash key, so the
  * operator scales with the shuffle (state per executor = its key range);
  * at 10^12-row scale the state cell is 1 bit + key, and a TTL timeout can
  * bound the store for windowed dedup (kept untimed here: exact global
  * dedup is the contract).
  *
  * This is the streaming face of [[graft.engine.Dedup.dedupExact]]: the
  * batch operator keeps min(id) per hash; the streaming operator keeps the
  * first ARRIVAL (arrival order replaces id order — documented difference,
  * inherent to unbounded input).
  */
object StreamDedup {

  final case class Keyed(key: String, id: Long, payload: String)

  /** First occurrence per key; duplicates are dropped. Append-mode safe. */
  def firstArrivalPerKey(ds: Dataset[Keyed]): Dataset[Keyed] = {
    implicit val enc = Encoders.product[Keyed]
    implicit val boolEnc = Encoders.scalaBoolean
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // hash already emitted in a previous batch
          else {
            state.update(true)
            rows.take(1) // first arrival within this batch wins; rest are dups
          }
      }
  }
}
