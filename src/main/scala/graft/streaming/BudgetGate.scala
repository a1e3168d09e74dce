package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ADMISSION CONTROL on a token budget — the streaming face of
  * [[graft.sample.Sampling.tokenBudgetSample]] (d31): an ingest stream
  * admits each document while its stratum's running token total is under
  * the budget, and rejects everything after the budget is crossed. The
  * batch face samples a deterministic pseudo-random PREFIX (hash order);
  * the stream, by nature, admits by ARRIVAL order — first-come,
  * first-admitted, the semantics a live ingest actually has. Both share
  * the gate: admitted iff the EXCLUSIVE cumulative weight of previously
  * seen stratum rows is under the budget (the straddling document is
  * admitted; a budget smaller than the first document still admits it).
  *
  * State is ONE long per stratum — the cumulative weight — updated by
  * `mapGroupsWithState`, so state never grows with the corpus and a
  * checkpoint restart resumes the exact count (spec-pinned). Within a
  * micro-batch the group's rows are processed in id order (micro-batch
  * iterators carry no arrival order; sorting by id makes replays of the
  * same batch split deterministic) — which means the TRANSIENT
  * per-batch buffer is the stratum's slice of the micro-batch, not one
  * long: a backfill that funnels millions of one source's rows into a
  * single trigger puts that slice on one task's heap. Size triggers
  * accordingly (`maxFilesPerTrigger`/rate limits); a catch-up over a
  * static backlog is the BATCH face's job
  * ([[graft.sample.Sampling.tokenBudgetSample]] — its two-level shard
  * device exists precisely so no reducer sees a whole stratum). Rejected rows still advance the
  * count — this cannot change any decision (they only occur once the
  * budget is crossed, and the gate is monotone) and it keeps the state
  * equal to the batch face's window sum, so stream ≡ batch whenever
  * arrival order matches the batch order (spec-pinned). At-least-once
  * redelivery double-counts like every counting face here; the upstream
  * streaming-dedup stage (keyed on the id) is the exactly-once device.
  *
  * Strata without a budget admit nothing (the batch face's inner-join
  * convention). Output one row per input document: (source, id, weight,
  * cum_before, admitted) — the decision plus its audit evidence.
  */
object BudgetGate {

  final case class Admission(
      source: String, id: Long, weight: Long, cum_before: Long,
      admitted: Boolean)

  def admitStream(
      df: DataFrame, idCol: String, weightCol: String, strataCol: String,
      budgets: Map[String, Long]): Dataset[Admission] = {
    import df.sparkSession.implicits._
    val typed = df.select(
      col(strataCol).cast("string"),
      col(idCol).cast("long"),
      col(weightCol).cast("long"))
      .as[(String, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Long, Admission](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        case (src, it, state: GroupState[Long]) =>
          val budget = budgets.getOrElse(src, 0L)
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_._2).map { case (_, id, w) =>
            val row = Admission(src, id, w, cum, cum < budget)
            cum += w
            row
          }
          state.update(cum)
          out.iterator
      }
  }
}
