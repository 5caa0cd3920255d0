package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming jump detection — the reference's W1/W2 semantics
  * (GetWeta.py:587-673 / dwwApi.js:100-107) as an incremental operator:
  * credits arrive as a stream, per-person state holds the last company
  * seen, and a row is emitted whenever a person's company changes.
  *
  * This is the SURVEY §2.9 "session-like state" tier:
  * `flatMapGroupsWithState` keyed by person, update mode. Events inside a
  * micro-batch are sorted by event time before folding, so in-order
  * arrival per person (the streaming analog of the batch ORDER BY) yields
  * exactly the batch `jumpsOnly` output.
  */
object JumpStream {

  final case class CreditEvent(personId: String, ts: Long, company: String)
  final case class JumpEvent(personId: String, ts: Long, company: String, jumpIndex: Long)
  final case class PersonState(lastCompany: String, jumps: Long)

  def detect(spark: SparkSession, credits: DataFrame): Dataset[JumpEvent] = {
    import spark.implicits._
    credits.select(col("personId"), col("ts").cast("long"), col("company"))
      .as[CreditEvent]
      .groupByKey(_.personId)
      .flatMapGroupsWithState[PersonState, JumpEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (pid, events, state: GroupState[PersonState]) =>
          var st = state.getOption.getOrElse(PersonState(null, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[JumpEvent]
          events.toSeq.sortBy(e => (e.ts, e.company)).foreach { e =>
            if (st.lastCompany == null || st.lastCompany != e.company) {
              st = PersonState(e.company, st.jumps + 1)
              out += JumpEvent(pid, e.ts, e.company, st.jumps)
            } else {
              st = PersonState(e.company, st.jumps)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
