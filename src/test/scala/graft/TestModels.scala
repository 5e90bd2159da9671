package graft

import java.sql.Timestamp

/** Top-level case classes for test Datasets (Spark encoders cannot handle
  * suite-inner classes). */
case class Ev(user_id: String, event_type: String, ts: Timestamp, event_id: String)
case class EvT(user_id: String, event_type: String, ts: Timestamp,
               event_time: Timestamp, event_id: String)
case class Asg(user_id: String, value: Boolean, assigned_at: Timestamp)
case class AsgTie(user_id: String, value: Boolean, assigned_at: Timestamp, batch_id: Long)
case class AsgSeq(user_id: String, value: Boolean, assigned_at: Timestamp, seq: Long)
