package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful operators (SURVEY §2.6 "Stateful custom ops") — the
  * engine's Processor-API surface. The reference's only custom processor is
  * a pass-through that captures record context
  * (`resilience/RetrieveContextTransformer.java:9-22`); the north-star scope
  * needs real keyed state beyond built-in aggregation, expressed on Spark's
  * public `flatMapGroupsWithState` API so state lives in the streaming state
  * store (checkpointed, partitioned by key — scales with the cluster, not
  * the driver).
  */
object StatefulOps {

  /** Streaming first-seen dedup: emit each key's first record, drop every
    * later one — `dropDuplicates` semantics but with explicit, inspectable
    * state and a TTL knob. With `ttlMs > 0` a key's "seen" marker expires
    * after that processing-time idle period, bounding state for unbounded
    * key spaces (the 100 TB posture: state size tracks *live* keys only).
    *
    * Works in batch too (state is trivially empty): dedups within the
    * batch, which is exactly the batch twin's meaning. State here never
    * expires — use [[firstSeenWithTtl]] for unbounded key spaces.
    */
  def firstSeen[K, V](ds: Dataset[V])(key: V => K)(
      implicit ke: Encoder[K], ve: Encoder[V]): Dataset[V] = {
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(key).flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: K, values: Iterator[V], state: GroupState[Long]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(1L)
          Iterator.single(values.next())
        }
    }
  }

  /** First-seen dedup with a state TTL (processing-time): after `ttlMs`
    * without new records for a key, its marker is dropped and the next
    * record passes again — `dropDuplicatesWithinWatermark`'s state-bounding
    * idea on the explicit-state API.
    */
  def firstSeenWithTtl[K, V](ds: Dataset[V], ttlMs: Long)(key: V => K)(
      implicit ke: Encoder[K], ve: Encoder[V]): Dataset[V] = {
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(key).flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
      (_: K, values: Iterator[V], state: GroupState[Long]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) { state.setTimeoutDuration(ttlMs); Iterator.empty }
        else {
          state.update(1L)
          state.setTimeoutDuration(ttlMs)
          Iterator.single(values.next())
        }
    }
  }
}
