package graft.operators

import java.util.concurrent.{Callable, ExecutorCompletionService, Executors}
import scala.collection.mutable

/** DAG-of-jobs runner — the data-plane equivalent of the reference's
  * Airflow orchestration (airflow/dags/sales_pipeline_dag.py:102-177:
  * task ids, dependency edges, `retries=2`, a quality-check task that
  * raises to fail the run, and a metrics-logging task).
  *
  * Spark-first framing: a "job" here is a driver-side ACTION (a write,
  * a gate, a watermark advance) over declaratively-built DataFrames.
  * The scheduler sequences actions only — every row stays inside
  * Catalyst-planned jobs, so orchestration adds zero data-plane cost
  * at any scale. Independent branches can run as concurrent Spark
  * jobs ([[runConcurrent]]); on a cluster pair that with the FAIR
  * scheduler so a small dim refresh isn't starved by a fact backfill.
  *
  * Semantics mirrored from Airflow:
  *   - per-job `retries` (re-invoke the body up to n extra times);
  *   - a failed job (after retries) fails the RUN but not unrelated
  *     branches: its transitive descendants are SKIPPED (Airflow's
  *     `upstream_failed`), everything else still runs;
  *   - reports carry attempts, wall millis, and the job's own metric
  *     (row count by convention — the reference's
  *     `log_pipeline_metrics`).
  *
  * Determinism: ready jobs dispatch in declaration order and reports
  * always return in declaration order, so a rerun of the same graph
  * produces the same report table (SURVEY §3 applies to orchestration
  * too). Cycles and unknown dependencies fail [[validate]] before any
  * job runs.
  */
final class JobGraph {
  import JobGraph._

  private final case class Node(id: String, deps: Seq[String], retries: Int, body: () => Long)
  private val nodes = mutable.LinkedHashMap.empty[String, Node]

  /** Register a job. `body` performs the action and returns its metric
    * (rows written, by convention). Declaration order is the dispatch
    * tie-break. */
  def add(id: String, deps: Seq[String] = Nil, retries: Int = 0)(body: => Long): this.type = {
    require(!nodes.contains(id), s"duplicate job id '$id'")
    require(retries >= 0, s"job '$id': retries must be >= 0")
    nodes += id -> Node(id, deps.distinct, retries, () => body)
    this
  }

  /** Fail fast on unknown deps, self-deps, or cycles — BEFORE running
    * anything (a torn half-run of a miswired graph is the failure mode
    * this guards against). */
  def validate(): Unit = {
    nodes.values.foreach { n =>
      n.deps.foreach { d =>
        require(nodes.contains(d), s"job '${n.id}' depends on unknown job '$d'")
        require(d != n.id, s"job '${n.id}' depends on itself")
      }
    }
    // Kahn's algorithm; leftovers = members of (or downstream of) a cycle.
    val indeg = mutable.Map.empty[String, Int] ++ nodes.values.map(n => n.id -> n.deps.size)
    val queue = mutable.Queue.empty[String] ++ nodes.keys.filter(indeg(_) == 0)
    var seen = 0
    while (queue.nonEmpty) {
      val id = queue.dequeue(); seen += 1
      nodes.values.foreach { n =>
        if (n.deps.contains(id)) { indeg(n.id) -= 1; if (indeg(n.id) == 0) queue += n.id }
      }
    }
    if (seen != nodes.size) {
      val stuck = nodes.keys.filter(indeg(_) > 0).mkString(", ")
      throw new IllegalStateException(s"job graph has a cycle involving: $stuck")
    }
  }

  /** Run every job sequentially in dependency order. */
  def run(): Seq[JobReport] = runConcurrent(1)

  /** Run with up to `maxParallel` jobs in flight; dependency-ready
    * jobs dispatch in declaration order. Reports return in declaration
    * order regardless of completion interleaving. */
  def runConcurrent(maxParallel: Int): Seq[JobReport] = {
    require(maxParallel >= 1, "maxParallel must be >= 1")
    validate()
    val reports = mutable.Map.empty[String, JobReport]
    val dispatched = mutable.Set.empty[String]
    val pool = Executors.newFixedThreadPool(maxParallel)
    val done = new ExecutorCompletionService[JobReport](pool)
    try {
      var inFlight = 0
      while (reports.size < nodes.size) {
        // 1. Skip (transitively) anything whose deps failed or were skipped.
        var changed = true
        while (changed) {
          changed = false
          nodes.values.foreach { n =>
            if (!reports.contains(n.id) && !dispatched.contains(n.id)) {
              val bad = n.deps.filter(d => reports.get(d).exists(r => !r.status.ok)).sorted
              if (bad.nonEmpty) {
                reports += n.id -> JobReport(n.id, Skipped(bad), attempts = 0, millis = 0L, metric = 0L)
                changed = true
              }
            }
          }
        }
        // 2. Dispatch ready jobs, declaration order, up to the cap.
        nodes.values.foreach { n =>
          if (inFlight < maxParallel && !reports.contains(n.id) && !dispatched.contains(n.id) &&
              n.deps.forall(d => reports.get(d).exists(_.status.ok))) {
            dispatched += n.id
            inFlight += 1
            done.submit(new Callable[JobReport] { def call(): JobReport = attempt(n) })
          }
        }
        // 3. Await one completion (if anything is running).
        if (inFlight > 0) {
          val r = done.take().get()
          inFlight -= 1
          reports += r.id -> r
        } else if (reports.size < nodes.size) {
          // No reports pending, nothing in flight, nothing ready:
          // unreachable after validate(), but fail loudly over hanging.
          throw new IllegalStateException(
            s"scheduler wedged with pending jobs: ${nodes.keys.filterNot(reports.contains).mkString(", ")}")
        }
      }
    } finally pool.shutdown()
    nodes.keys.toSeq.map(reports)
  }

  /** True iff every job in the last report list succeeded. */
  def allOk(reports: Seq[JobReport]): Boolean = reports.forall(_.status.ok)

  private def attempt(n: Node): JobReport = {
    val t0 = System.nanoTime()
    var tries = 0
    var out: Option[Long] = None
    var lastErr: Throwable = null
    while (out.isEmpty && tries <= n.retries) {
      tries += 1
      try out = Some(n.body())
      catch { case e: Exception => lastErr = e }
    }
    val ms = (System.nanoTime() - t0) / 1000000L
    out match {
      case Some(m) => JobReport(n.id, Succeeded, tries, ms, m)
      case None    => JobReport(n.id, Failed(lastErr), tries, ms, 0L)
    }
  }
}

object JobGraph {
  sealed trait Status { def ok: Boolean }
  case object Succeeded extends Status { val ok = true }
  final case class Failed(err: Throwable) extends Status { val ok = false }
  /** Never attempted: the listed upstream jobs failed or were skipped
    * (Airflow `upstream_failed`). */
  final case class Skipped(blockedBy: Seq[String]) extends Status { val ok = false }

  final case class JobReport(id: String, status: Status, attempts: Int, millis: Long, metric: Long)

  /** Quality gate in job form — take a [[DataQuality.run]] result and
    * throw (failing this job and skipping its descendants) when any
    * expectation is violated; mirrors the DAG's
    * `gold_data_quality_check` raising ValueError
    * (sales_pipeline_dag.py:36-57). Returns the checked table's
    * `row_count` as the job metric. */
  def gate(results: org.apache.spark.sql.DataFrame): Long = {
    val rows = results.select("check_name", "check_value").collect()
    val bad = rows.collect {
      case r if r.getString(0) != "row_count" && r.getLong(1) > 0L =>
        s"${r.getString(0)}(${r.getLong(1)})"
    }
    if (bad.nonEmpty)
      throw new IllegalStateException(s"quality gate failed: ${bad.sorted.mkString(", ")}")
    rows.collectFirst { case r if r.getString(0) == "row_count" => r.getLong(1) }.getOrElse(0L)
  }
}
