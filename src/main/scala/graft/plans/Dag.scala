package graft.plans

import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY §2 J — the orchestration component (the reference's nominal
  * domain): declare Spark jobs + dependencies as a typed DAG, execute
  * topologically with independent branches in parallel, per-job retry with
  * backoff, downstream skip on failure, and input-lineage capture.
  *
  * One shared SparkSession serves all jobs — Spark's scheduler interleaves
  * their stages; the DAG layer only sequences logical dependencies. At
  * cluster scale this is exactly how a driver-side orchestrator should look:
  * job bodies are lazy DataFrame builders, materialization happens once per
  * job, and nothing is collected to the driver.
  */
final case class Job(
    name: String,
    deps: Seq[String] = Nil,
    retries: Int = 0,
    run: (SparkSession, Map[String, DataFrame]) => DataFrame)

final case class JobRun(
    name: String,
    status: String, // ok | failed | skipped
    attempts: Int,
    inputs: Seq[String], // distinct basenames of scanned files
    error: Option[String])

final class Dag(val jobs: Seq[Job]) {
  private val byName: Map[String, Job] = jobs.map(j => j.name -> j).toMap
  require(byName.size == jobs.size, "duplicate job names")
  jobs.foreach(j => j.deps.foreach(d =>
    require(byName.contains(d), s"job ${j.name} depends on unknown job $d")))

  /** J1: deterministic topological order (Kahn, alphabetical ready queue).
    * Throws IllegalArgumentException on a cycle. */
  val topoOrder: Seq[String] = {
    val indeg = mutable.Map(jobs.map(j => j.name -> j.deps.size): _*)
    val out = jobs.flatMap(j => j.deps.map(_ -> j.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ready = mutable.SortedSet(indeg.collect { case (n, 0) => n }.toSeq: _*)
    val order = mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val n = ready.head
      ready.remove(n)
      order += n
      out.getOrElse(n, Nil).foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) ready += m
      }
    }
    require(order.size == jobs.size,
      s"dependency cycle among: ${indeg.collect { case (n, d) if d > 0 => n }.mkString(", ")}")
    order.toSeq
  }

  /** J2+J3+J4: execute the DAG. Each job materializes once (count) so
    * failures surface here; branches whose deps are all satisfied run
    * concurrently on a fixed pool. Failed jobs retry up to `retries` times
    * with linear backoff; jobs downstream of a failure are skipped. Returns
    * per-job run records (J4 lineage included) and the completed DataFrames.
    */
  def run(spark: SparkSession, parallelism: Int = 4, backoffMs: Long = 10)
      : (Map[String, DataFrame], Seq[JobRun]) = {
    val pool = Executors.newFixedThreadPool(math.max(parallelism, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val runs = new ConcurrentHashMap[String, JobRun]()
    val futures = new ConcurrentHashMap[String, Future[Option[DataFrame]]]()

    def futureFor(name: String): Future[Option[DataFrame]] =
      futures.computeIfAbsent(name, _ => {
        val job = byName(name)
        Future.sequence(job.deps.map(futureFor)).map { depResults =>
          if (depResults.exists(_.isEmpty)) {
            runs.put(name, JobRun(name, "skipped", 0, Nil, Some("upstream failure")))
            None
          } else {
            val depMap = job.deps.zip(depResults.map(_.get)).toMap
            var attempt = 0
            var result: Option[DataFrame] = None
            var lastErr: Option[String] = None
            while (result.isEmpty && attempt <= job.retries) {
              attempt += 1
              try {
                val df = job.run(spark, depMap)
                df.count() // materialize: a job is "done" when its output exists
                result = Some(df)
              } catch {
                case NonFatal(e) =>
                  lastErr = Some(e.getMessage)
                  if (attempt <= job.retries) Thread.sleep(backoffMs * attempt)
              }
            }
            result match {
              case Some(df) =>
                val inputs = df.inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1))
                  .distinct.sorted.toSeq
                runs.put(name, JobRun(name, "ok", attempt, inputs, None))
                Some(df)
              case None =>
                runs.put(name, JobRun(name, "failed", attempt, Nil, lastErr))
                None
            }
          }
        }
      })

    try {
      topoOrder.foreach(futureFor)
      Await.result(Future.sequence(topoOrder.map(futureFor)), Duration.Inf)
    } finally pool.shutdown()

    val dfs = futures.asScala.toMap.flatMap { case (n, f) =>
      f.value.get.toOption.flatten.map(n -> _)
    }
    (dfs, topoOrder.map(runs.get))
  }
}
