package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Dag, Job}

/** J1–J4: DAG validation, ordering, retry, skip. */
class DagSpec extends AnyFunSuite {
  import TestSpark._

  private def noop(name: String, deps: String*) =
    Job(name, deps.toSeq, 0, (s, _) => Tables(s, sfDir).region)

  test("cycle detection rejects the DAG at construction") {
    val e = intercept[IllegalArgumentException] {
      new Dag(Seq(Job("a", Seq("b"), 0, (s, _) => null),
        Job("b", Seq("a"), 0, (s, _) => null))).topoOrder
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("unknown dependency rejected") {
    intercept[IllegalArgumentException] {
      new Dag(Seq(Job("a", Seq("ghost"), 0, (s, _) => null)))
    }
  }

  test("topological order respects dependencies, alphabetical within a level") {
    val dag = new Dag(Seq(noop("z"), noop("a"), noop("mid", "z"), noop("end", "mid", "a")))
    assert(dag.topoOrder == Seq("a", "z", "mid", "end"))
  }

  test("independent branches complete, failure skips only its descendants") {
    val dag = new Dag(Seq(
      noop("ok_root"),
      Job("boom", Nil, 0, (_, _) => sys.error("boom")),
      noop("child_ok", "ok_root"),
      Job("child_boom", Seq("boom"), 0, (s, _) => Tables(s, sfDir).region),
      Job("grandchild_boom", Seq("child_boom"), 0, (s, _) => Tables(s, sfDir).region)
    ))
    val (_, runs) = dag.run(spark, parallelism = 3)
    val status = runs.map(r => r.name -> r.status).toMap
    assert(status("ok_root") == "ok" && status("child_ok") == "ok")
    assert(status("boom") == "failed")
    assert(status("child_boom") == "skipped" && status("grandchild_boom") == "skipped")
  }

  test("retry succeeds after transient failures and records attempts") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val dag = new Dag(Seq(Job("flaky", Nil, 3, (s, _) => {
      if (counter.incrementAndGet() < 3) sys.error("transient")
      Tables(s, sfDir).region
    })))
    val (_, runs) = dag.run(spark)
    assert(runs.head.status == "ok" && runs.head.attempts == 3)
  }

  test("lineage records the scanned fixture files") {
    val dag = new Dag(Seq(noop("scan_region")))
    val (_, runs) = dag.run(spark)
    assert(runs.head.inputs == Seq("region.parquet"))
  }
}
