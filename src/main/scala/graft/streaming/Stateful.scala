package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incoming event row for stateful per-key processing. */
case class EventIn(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Running per-key accumulator — pandas-streaming
  * `groupby_streaming(strategy="cum")` upgraded to checkpointable
  * StateStore state [P SURVEY.md §2.8]. Money is held in exact cents
  * (long) so emission order / batch boundaries never change totals.
  */
case class UserStats(user_id: Long, n_events: Long, total_cents: Long) {
  def total: Double = total_cents / 100.0
}

/** Custom keyed state via flatMapGroupsWithState — the Spark-native
  * replacement for the reference's in-process accumulator dict. State
  * lives in the per-operator StateStore (spillable, checkpointed,
  * partitioned by key hash), so it scales horizontally: each executor
  * holds only its key range's state — unlike the reference, which keeps
  * one process-wide dict.
  */
object Stateful {

  private implicit val statsEnc = Encoders.product[UserStats]
  private implicit val keyEnc = Encoders.scalaLong

  /** Emits the updated running stats for every key touched in each
    * micro-batch (OutputMode.Update). Also works on a batch Dataset
    * (single "chunk"), where it reduces to a full groupBy.
    */
  def runningUserStats(events: Dataset[EventIn]): Dataset[UserStats] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventIn], state: GroupState[UserStats]) =>
          var s = state.getOption.getOrElse(UserStats(uid, 0L, 0L))
          it.foreach { e =>
            s = UserStats(uid, s.n_events + 1, s.total_cents + math.round(e.value * 100))
          }
          state.update(s)
          Iterator.single(s)
      }
}
