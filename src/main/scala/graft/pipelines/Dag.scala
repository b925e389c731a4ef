package graft.pipelines

import scala.collection.mutable

/** Minimal declarative task-graph runner — the reference DAG's
  * orchestration semantics (`airflow/dags/tweets_and_market.py:13-18,
  * 97-104`: `start >> a >> b >> finish` dependency edges across
  * heterogeneous tasks, per-task retries, quality-check gates) as a
  * library call, generalizing [[Backfill]]'s per-day retry/gate loop to an
  * arbitrary graph.
  *
  * Semantics, matching the reference scheduler where it has an opinion:
  *   - Tasks execute in topological order; independent tasks keep their
  *     declared order (deterministic runs, reproducible outcome logs).
  *   - A task runs only when EVERY upstream succeeded; otherwise it is
  *     `Skipped` — a failed market gate blocks `finish` but never the
  *     tweets branch (the two branches are independent until the join).
  *   - A THROWN task is retried up to `retries` times (transient: missing
  *     mount, connection reset); a FALSE `gate` is deterministic — the
  *     data really is below the bar — and fails without retry, exactly
  *     like [[Backfill]]'s quality gate.
  *   - Orchestration is driver-side and O(tasks); all per-row work stays
  *     inside the Spark jobs the tasks launch. Nothing here touches
  *     executors — this is the scheduler seat, not a data path.
  *
  * Cycles and edges naming unknown tasks are rejected up front (a DAG
  * that can't run should fail at build time, not mid-graph).
  */
object Dag {

  sealed trait Status
  /** Ran and passed its gate. */
  case object Succeeded extends Status
  /** Threw on every attempt, or its gate returned false. */
  case object Failed extends Status
  /** Never ran: an upstream did not succeed. */
  case object Skipped extends Status

  /** A node: `run` does the work (side effects — files, tables, Spark
    * jobs), `gate` is the post-run quality check, `retries` bounds
    * re-attempts of THROWN runs.
    */
  final case class Task(
      id: String,
      run: () => Unit,
      retries: Int = 0,
      gate: () => Boolean = () => true)

  final case class Outcome(
      id: String, status: Status, attempts: Int, error: Option[String])

  /** Execute the graph; one [[Outcome]] per task, in execution order. */
  def run(tasks: Seq[Task], edges: Seq[(String, String)]): Seq[Outcome] = {
    val ids = tasks.map(_.id)
    require(ids.distinct == ids, s"duplicate task ids: ${ids.diff(ids.distinct).distinct}")
    val known = ids.toSet
    edges.foreach { case (a, b) =>
      require(known(a) && known(b), s"edge ($a -> $b) references an unknown task") }

    val parents = edges.groupMap(_._2)(_._1)
    // Kahn with declared-order tie-break: walk the task list repeatedly,
    // running every task whose parents are all decided. O(n²) in the
    // task count — the task count is the DAG's width, not the data's.
    val decided = mutable.LinkedHashMap.empty[String, Outcome]
    val byId = tasks.map(t => t.id -> t).toMap
    var progressed = true
    while (decided.size < tasks.size && progressed) {
      progressed = false
      for (t <- tasks if !decided.contains(t.id)) {
        val ps = parents.getOrElse(t.id, Seq.empty)
        if (ps.forall(decided.contains)) {
          progressed = true
          val blockedBy = ps.filter(p => decided(p).status != Succeeded)
          decided(t.id) =
            if (blockedBy.nonEmpty)
              Outcome(t.id, Skipped, 0,
                Some(s"upstream not successful: ${blockedBy.mkString(", ")}"))
            else execute(t)
        }
      }
    }
    if (decided.size < tasks.size)
      throw new IllegalArgumentException(
        s"cycle in DAG: ${tasks.map(_.id).filterNot(decided.contains).mkString(", ")}")
    decided.values.toSeq
  }

  private def execute(t: Task): Outcome = {
    var attempt = 0
    var thrown: Option[String] = None
    while (attempt <= t.retries) {
      attempt += 1
      try {
        t.run()
        // gate verdicts are facts about the produced data: no retry
        val out =
          if (t.gate()) Outcome(t.id, Succeeded, attempt, None)
          else Outcome(t.id, Failed, attempt, Some("quality gate failed"))
        return out
      } catch {
        case e: Exception =>
          thrown = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    Outcome(t.id, Failed, attempt, thrown)
  }
}
