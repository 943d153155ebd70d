package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Misra–Gries + exact-recount top-k: the planted long-tail fixture makes
  * the summary capacity (64) far smaller than the key universe (5,020),
  * so the eviction/decrement path actually runs — unlike the q93 gate
  * corpus, whose vocabulary fits any summary. The guarantee under test:
  * every key with global count > N/(capacity+1) survives candidate
  * generation, so the recounted top-k equals the exact top-k.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def fixture = {
    import spark.implicits._
    // 10 heavy keys (counts 910..1000), 10 medium keys (201..210, below
    // the bound — allowed to drop from the summary, never in the top-10),
    // and a 5,000-key count-2 tail. N = 21,605; at capacity 64 the MG
    // bound N/65 ≈ 332, which every heavy key clears — so the top-10 is
    // provably covered by the candidate union while ~5,000 tail keys
    // force constant eviction.
    val heavy = (1 to 10).flatMap(i => Seq.fill(900 + 10 * i)(f"h$i%02d")) ++
      (1 to 10).flatMap(i => Seq.fill(200 + i)(f"m$i%02d"))
    val tail = (1 to 5000).flatMap(i => Seq.fill(2)(f"t$i%04d"))
    (heavy ++ tail).toDF("k").repartition(8)
  }

  test("MG+recount top-k equals exact top-k when heavy keys clear the bound") {
    val df = fixture
    val n = df.count()
    val capacity = 64
    val bound = n.toDouble / (capacity + 1)
    // the 10 heaviest keys (counts 910..1000) must clear N/(cap+1)
    assert(1000 > bound && 910 > bound, s"fixture no longer clears bound $bound")
    // the universe must exceed the capacity so eviction actually runs
    assert(df.select("k").distinct().count() > capacity)

    val got = graft.operators.HeavyHitters.topK(df, "k", k = 10, capacity = capacity)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want), s"got ${got.mkString(",")}\nwant ${want.mkString(",")}")
  }

  test("exactness is self-checkable: k-th count vs N/(capacity+1)") {
    val df = fixture
    val out = graft.operators.HeavyHitters.topK(df, "k", k = 10, capacity = 64)
      .collect()
    val kth = out.last.getLong(1)
    val bound = df.count().toDouble / 65
    // the deployment contract from the scaladoc: kth > bound proves the
    // returned top-k is exact, using only this output + one count
    assert(kth > bound, s"fixture should prove its own exactness ($kth <= $bound)")
  }

  test("vocabTopK: both regimes and the HLL-probe path agree with the exact top-k") {
    val df = fixture
    val want = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def run(df2: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      df2(df).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact regime, forced by the hint (universe 5,020 < default bound)
    val exact = run(graft.operators.HeavyHitters.vocabTopK(_, "k", k = 10,
      expectedKeys = Some(5020L)))
    // MG regime, forced by shrinking the exact-regime ceiling to zero
    val mg = run(graft.operators.HeavyHitters.vocabTopK(_, "k", k = 10,
      capacity = 64, maxExactKeys = 0L, expectedKeys = Some(5020L)))
    // no hint: the HLL probe runs at call time and must land in the
    // exact regime (5,020 keys, ±2% HLL error << the 10^7 default bound)
    val probed = run(graft.operators.HeavyHitters.vocabTopK(_, "k", k = 10))
    assert(exact == want, s"exact regime: $exact")
    assert(mg == want, s"mg regime: $mg")
    assert(probed == want, s"probed: $probed")
  }

  test("per-group top-k equals exact per-group top-k on skewed group sizes") {
    import spark.implicits._
    // group A: 20× the rows of group B, both with their own heavy keys
    // over forced-eviction tails (capacity 32 vs 600/300 distinct keys)
    val gA = (1 to 5).flatMap(i => Seq.fill(2000 + 100 * i)(("A", f"a$i%02d"))) ++
      (1 to 600).flatMap(i => Seq.fill(3)(("A", f"at$i%04d")))
    val gB = (1 to 5).flatMap(i => Seq.fill(100 + 5 * i)(("B", f"b$i%02d"))) ++
      (1 to 300).flatMap(i => Seq.fill(1)(("B", f"bt$i%04d")))
    val df = (gA ++ gB).toDF("g", "k").repartition(8)

    val got = graft.operators.HeavyHitters
      .topKPerGroup(df, "g", "k", k = 3, capacity = 32)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("cnt").desc, col("k"))
    val want = df.groupBy("g", "k").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
      .orderBy(col("g"), col("cnt").desc, col("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.sameElements(want), s"got ${got.mkString(",")}\nwant ${want.mkString(",")}")
  }

  test("ties at the boundary are ordered deterministically (cnt desc, key asc)") {
    import spark.implicits._
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(5)("c") ++
      Seq.fill(3)("z")).toDF("k")
    val got = graft.operators.HeavyHitters.topK(df, "k", k = 2, capacity = 8)
      .collect().map(_.getString(0))
    assert(got.sameElements(Array("a", "b")), got.mkString(","))
  }

  test("per-group with groups >> maxMgGroups takes the exact regime and stays exact") {
    import spark.implicits._
    // 5,000 groups vs maxMgGroups 64 — the per-domain-hot-URLs shape the
    // MG regime must NOT attempt (its per-partition group map and its
    // broadcast would both scale with the group count). Each group gets
    // a distinct heavy key (count 5), a runner-up (count 3), and two
    // count-1 tail keys; k=2 must pick exactly (heavy, runner-up).
    val rows = (1 to 5000).flatMap { gi =>
      val g = f"d$gi%05d"
      Seq.fill(5)((g, s"hot-$gi")) ++ Seq.fill(3)((g, s"warm-$gi")) ++
        Seq((g, s"t1-$gi"), (g, s"t2-$gi"))
    }
    val df = rows.toDF("g", "k").repartition(8)

    val out = graft.operators.HeavyHitters
      .topKPerGroup(df, "g", "k", k = 2, capacity = 32, maxMgGroups = 64)
    // regime check: the exact path has no broadcast semi recount and no
    // per-group MG map — the plan must contain no broadcast join at all
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "exact regime must not broadcast a candidates set:\n" + plan.take(1500))

    val got = out.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("cnt").desc, col("k"))
    val want = df.groupBy("g", "k").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
      .orderBy(col("g"), col("cnt").desc, col("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == 10000 && got.sameElements(want),
      s"exact-regime mismatch: got ${got.length} rows")
  }

  test("both regimes return identical results (expectedGroups forces each)") {
    import spark.implicits._
    val rows = (1 to 8).flatMap { gi =>
      (1 to 20).flatMap(ki => Seq.fill(ki)((s"g$gi", f"k$ki%02d")))
    }
    val df = rows.toDF("g", "k").repartition(4)
    def run(hint: Long) = graft.operators.HeavyHitters
      .topKPerGroup(df, "g", "k", k = 5, capacity = 64,
        expectedGroups = Some(hint))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val mg = run(8L)            // 8 <= maxMgGroups(64) -> MG regime
    val exact = run(1000000L)   // forces the exact regime on the same data
    assert(mg.sameElements(exact),
      s"regimes disagree:\nmg    ${mg.take(8).mkString(",")}\nexact ${exact.take(8).mkString(",")}")
  }

  test("hinted construction is plan-only: vocabTopK/topKPerGroup with cardinality hints run ZERO jobs") {
    // The documented eager-probe contract, enforced: "no hint ⇒ one HLL
    // job at call time; with a hint, construction must not touch the
    // input". A listener counts job starts across both hinted builders
    // (must stay 0), then the no-hint path validates the listener by
    // actually firing its probe job.
    import spark.implicits._
    val df = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(("g" + i % 3, "k" + i)))
      .toDF("g", "k")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    def await(cond: => Boolean, ms: Long): Boolean = {
      val t0 = System.nanoTime()
      while (!cond && (System.nanoTime() - t0) < ms * 1000000L) Thread.sleep(50)
      cond
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      jobs.set(0)
      val a = graft.operators.HeavyHitters.vocabTopK(df, "k", k = 5,
        expectedKeys = Some(50L))
      val b = graft.operators.HeavyHitters.topKPerGroup(df, "g", "k", k = 5,
        expectedGroups = Some(3L))
      // the listener bus is async — give any stray job event a window to
      // land before asserting none did
      assert(!await(jobs.get() > 0, 1000),
        s"hinted construction ran ${jobs.get()} job(s)")
      assert(a.columns.nonEmpty && b.columns.nonEmpty) // frames are built
      // sanity (listener works): the no-hint path fires the HLL probe
      graft.operators.HeavyHitters.vocabTopK(df, "k", k = 5)
      assert(await(jobs.get() > 0, 10000), "no-hint probe job not observed")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("NULL keys and NULL groups are excluded, matching WHERE IS NOT NULL semantics") {
    import spark.implicits._
    val df = (Seq.fill(9)(("g1": String, null: String)) ++
      Seq.fill(4)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq.fill(7)((null: String, "a")) ++ Seq.fill(3)(("g2", "c")))
      .toDF("g", "k")

    val top = graft.operators.HeavyHitters.topK(df, "k", k = 3, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a" counts 4 (g1) + 7 (null group — still a valid key row) = 11
    assert(top.sameElements(Array(("a", 11L), ("c", 3L), ("b", 2L))),
      top.mkString(","))

    for (hint <- Seq(Some(2L), Some(1000000L))) {
      val per = graft.operators.HeavyHitters
        .topKPerGroup(df, "g", "k", k = 2, capacity = 16, expectedGroups = hint)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(per.sameElements(Array(("g1", "a", 4L), ("g1", "b", 2L), ("g2", "c", 3L))),
        s"hint=$hint: ${per.mkString(",")}")
    }
  }
}
