package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.functions.TextFunctions

/** Planted-fixture specs for the curation operators: PII
  * detection/redaction, decontamination, deterministic sampling. The
  * sf-scale end-to-end checks are the q69–q74 oracle gates.
  */
class CurationSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark: SparkSession = graft.TestSpark.spark
  import spark.implicits._

  // --- PII ---------------------------------------------------------------

  test("piiRedact replaces emails, phones, and IPs with typed tokens") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org and call +44 123-4567 from 10.1.2.3"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.co c.d@e-f.org; ip 192.168.0.1"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.piiRedact(col("t")).as("r"),
        TextFunctions.piiCounts(col("t")).as("c"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) ==
      "mail <EMAIL> and call <PHONE> from <IP>")
    assert(rows(0).getStruct(2).toSeq == Seq(1, 1, 1))
    assert(rows(1).getString(1) == "no pii here at all")
    assert(rows(1).getStruct(2).toSeq == Seq(0, 0, 0))
    assert(rows(2).getString(1) == "two mails: <EMAIL> <EMAIL>; ip <IP>")
    assert(rows(2).getStruct(2).toSeq == Seq(2, 0, 1))
  }

  test("piiRedact does not match three-part version strings as IPs") {
    // the pattern needs all four dotted octets; v1.2.3 never matches
    val r = Seq((1L, "semver v1.2.3 stays; 1.2.3.4 goes"))
      .toDF("id", "t")
      .select(TextFunctions.piiRedact(col("t"))).head().getString(0)
    assert(r == "semver v1.2.3 stays; <IP> goes")
  }

  test("pii functions are null-safe") {
    val r = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextFunctions.piiRedact(col("t")),
        TextFunctions.piiCounts(col("t"))).head()
    assert(r.isNullAt(0))
  }

  // --- Decontamination ----------------------------------------------------

  lazy val bench = Seq(
    (100L, "the capital of france is paris obviously"))
    .toDF("doc_id", "text")
  lazy val corpus = Seq(
    (1L, "we know The Capital of France is Paris and more"), // contaminated (case-folded)
    (2L, "the capital city has many attractions for tourists"),
    (3L, "completely unrelated text about query engines and shuffles"),
    (4L, "of france is")) // one 3-gram hit only
    .toDF("doc_id", "text")

  test("overlapHits counts distinct shared n-grams, case-folded") {
    val hits = Decontaminate.overlapHits(corpus, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares 'the capital of', 'capital of france', 'of france is',
    // 'france is paris' = 4; doc 4 shares 'of france is' = 1
    assert(hits == Map(1L -> 4L, 4L -> 1L))
  }

  test("decontaminate removes docs at/above minHits and keeps the rest") {
    val kept2 = Decontaminate.decontaminate(corpus, bench, "text", "doc_id",
      n = 3, minHits = 2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(2L, 3L, 4L)) // only doc 1 reaches 2 hits
    val kept1 = Decontaminate.decontaminate(corpus, bench, "text", "doc_id",
      n = 3, minHits = 1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(2L, 3L))
  }

  test("docs shorter than n words produce no n-grams and are never flagged") {
    val tiny = Seq((9L, "of france")).toDF("doc_id", "text")
    assert(Decontaminate.overlapHits(tiny, bench, "text", "doc_id", n = 3)
      .count() == 0)
    assert(Decontaminate.decontaminate(tiny, bench, "text", "doc_id", n = 3)
      .count() == 1)
  }

  test("decontaminate broadcasts the benchmark n-gram set (corpus never shuffles)") {
    val plan = Decontaminate.overlapHits(corpus, bench, "text", "doc_id", n = 3)
      .queryExecution.executedPlan
    def hasBroadcastJoin(p: SparkPlan): Boolean =
      collectWithSubqueries(p) {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty
    assert(hasBroadcastJoin(plan), plan.toString)
  }

  // --- Sampling ------------------------------------------------------------

  lazy val strat = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")

  test("hashSample is deterministic and approximately proportional") {
    val a = Sampling.hashSample(strat, "id", 64).select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(strat.repartition(7), "id", 64).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // partitioning-independent
    assert(a.size > 40 && a.size < 110, s"expected ~75 of 300, got ${a.size}")
    // monotone: a smaller numerator selects a subset
    val c = Sampling.hashSample(strat, "id", 16).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
    assert(Sampling.hashSample(strat, "id", 0).count() == 0)
    assert(Sampling.hashSample(strat, "id", 256).count() == 300)
  }

  test("stratifiedFixed takes exactly n per stratum, deterministically") {
    val s1 = Sampling.stratifiedFixed(strat, "grp", "id", 10)
    val counts = s1.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedFixed(strat.repartition(11), "grp", "id", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("stratifiedFixed returns whole stratum when smaller than n") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val out = Sampling.stratifiedFixed(tiny, "grp", "id", 5)
    assert(out.count() == 3)
  }

  // --- Packing --------------------------------------------------------------

  test("packBins assigns bins by exclusive prefix sum per shard") {
    val rows = Seq(
      ("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 10L), ("a", 4L, 100L),
      ("b", 1L, 250L), ("b", 2L, 10L))
      .toDF("shard", "ord", "w")
    val got = Packing.packBins(rows, "shard", "ord", "w", budget = 100L)
      .select($"shard", $"ord", $"bin").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // shard a: starts at 0, 60, 110, 120 → bins 0, 0, 1, 1
    assert(got(("a", 1L)) == 0L && got(("a", 2L)) == 0L)
    assert(got(("a", 3L)) == 1L && got(("a", 4L)) == 1L)
    // shard b packs independently: starts 0, 250 → bins 0, 2 (row wider
    // than the budget spills across bin ranges, like a long doc chunked
    // over training sequences)
    assert(got(("b", 1L)) == 0L && got(("b", 2L)) == 2L)
  }

  // --- Mixing ---------------------------------------------------------------

  test("upsample: integer weights replicate exactly, zero drops, default is 1") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "src")
    val out = Mixing.upsample(df, "src", "id", Map("a" -> 3.0, "b" -> 0.0))
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 6L, "c" -> 1L)) // b dropped, c default 1×
  }

  test("upsample: fractional weight keeps a deterministic ~frac share") {
    val df = (0L until 1000L).map(i => (i, "s")).toDF("id", "src")
    val n1 = Mixing.upsample(df, "src", "id", Map("s" -> 1.5)).count()
    val n2 = Mixing.upsample(df.repartition(7), "src", "id", Map("s" -> 1.5)).count()
    assert(n1 == n2)                       // pure function of (ids, weights)
    assert(n1 > 1350 && n1 < 1650, s"fractional share off: $n1") // ~1500
    // replica indices are dense 0..n_copies-1
    val reps = Mixing.upsample(df, "src", "id", Map("s" -> 2.0))
      .groupBy("id").agg(collect_list(col("replica")).as("r"))
      .select(array_sort(col("r"))).distinct().collect()
    assert(reps.length == 1 && reps(0).getSeq[Long](0) == Seq(0L, 1L))
  }

  // --- Curate (end-to-end composition) --------------------------------------

  test("curate: each stage's effect visible on a planted corpus") {
    val words20 = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words20 + " alpha", "en", "src0", 0),        // survives
      (31L, words20 + " alpha", "en", "src0", 0),       // exact dup of 1 -> dropped
      (2L, words20 + " bench mark gram one two three", "en", "src1", 0), // contaminated
      (3L, "short text", "en", "src0", 0),              // under minWords
      (4L, ("rep rep rep " * 10).trim, "en", "src0", 0) // low uniq ratio
    ).toDF("doc_id", "text", "lang", "source", "pad")
    val bench = Seq((0L, "bench mark gram one two three four"))
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, bench, "doc_id", "text", "lang", "source",
      minWords = 20, minUniqRatio = 0.25, sampleNumerator = 256,
      weights = Map("src0" -> 2.0), packBudget = 10L)
    val rows = out.select($"doc_id", $"replica", $"bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // only doc 1 survives (dedup keeps id 1 over 31; 2 contaminated with
    // >= 2 shared 3-grams; 3 too short; 4 repetitive); src0 weight 2.0
    // doubles it; sample numerator 256 keeps everything
    assert(rows.toSeq == Seq((1L, 0L), (1L, 1L)))
  }

  // --- Chunking -------------------------------------------------------------

  test("chunk: overlapping windows cover every word once beyond the overlap") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ") // 100 words
    val df = Seq((1L, text), (2L, "only three words")).toDF("id", "t")
    val chunks = Chunking.chunk(df, "id", "t", maxTokens = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    // doc 2 fits whole: exactly one chunk
    assert(chunks.count(_._1 == 2L) == 1)
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // step 30: starts 0, 30, 60 (chunk at 60 reaches word 100 -> stop)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_._4).toSeq == Seq(40, 40, 40))
    assert(d1(0)._3.startsWith("w1 ") && d1(2)._3.endsWith(" w100"))
    // consecutive chunks overlap by exactly 10 words
    val w1 = d1(0)._3.split(" "); val w2 = d1(1)._3.split(" ")
    assert(w1.takeRight(10).toSeq == w2.take(10).toSeq)
    // every word covered
    assert(d1.flatMap(_._3.split(" ")).toSet == (1 to 100).map(i => s"w$i").toSet)
  }

  // --- Winnowing ------------------------------------------------------------

  test("winnowing: shared passage guarantees a shared print; density ~2/(w+1)") {
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    val df = Seq(
      (1L, "AAAA unique prefix one " + passage),
      (2L, passage + " BBBB different suffix two"),
      (3L, "completely unrelated content with zero overlap at all here"))
      .toDF("id", "t")
    val shared = Winnowing.sharedPrints(df, "id", "t", k = 8, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1 and 2 share a 51-char passage >> w+k-1 = 11 -> guaranteed hit
    assert(shared.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 1))
    // doc 3 shares nothing with either
    assert(!shared.exists(p => p._1 == 3L || p._2 == 3L))
    // winnowing stores far fewer prints than grams (density ~2/(w+1))
    val n = Winnowing.fingerprints(df, "id", "t", 8, 4)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grams1 = ("AAAA unique prefix one " + passage).length - 7
    assert(n(1L) < grams1 * 0.8, s"no compression: ${n(1L)} of $grams1 grams kept")
  }

  // --- ShardWriter ----------------------------------------------------------

  test("writeShards: directory per shard, rows sorted within every file") {
    val rows = (0L until 400L).map(i => (s"s${i % 3}", 400L - i, i))
      .toDF("shard", "bin", "payload")
    val path = java.nio.file.Files.createTempDirectory("shards").toString
    val n = ShardWriter.writeShards(rows, path, "shard", Seq("bin"))
    assert(n == 3)
    val back = spark.read.parquet(path)
    assert(back.count() == 400)
    // every physical file is internally sorted by bin (read each file
    // alone so collect() returns rows in file order)
    val files = new java.io.File(path).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val bins = spark.read.parquet(f.getAbsolutePath)
        .select(col("bin")).collect().map(_.getLong(0)).toSeq
      assert(bins == bins.sorted, s"file $f not sorted")
    }
    // directory layout prunes: reading one shard touches one directory
    val one = spark.read.parquet(path).filter(col("shard") === "s1")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"), plan.take(800))
  }

  // --- Skew / salted join ---------------------------------------------------

  test("saltedJoin equals the unsalted join; left rows survive; bad types rejected") {
    val big = (0L until 500L).map(i => (i % 3, i)).toDF("k", "v") // hot keys 0,1,2
    val small = Seq((0L, "a"), (1L, "b"), (9L, "z")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
    val leftPlain = big.join(small, Seq("k"), "left").collect().map(_.toSeq).toSet
    val leftSalted = Skew.saltedJoin(big, small, "k", 8, "left").collect().map(_.toSeq).toSet
    assert(leftSalted == leftPlain) // k=2 rows survive with null name exactly once
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 8, "right_outer")
    }
  }

  // --- Profile --------------------------------------------------------------

  test("profile reports exact per-column null/distinct/min/max") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, null), (2L, "y"))
      .toDF("id", "s")
    val got = Profile.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((3L, 0L, 2L, "1", "2")))
    assert(got("s") == ((3L, 1L, 2L, "x", "y")))
  }

  // --- Bm25 -----------------------------------------------------------------

  test("bm25: hand-computed single-term score, multi-hit doc ranks first") {
    val df = Seq((1L, "x x"), (2L, "y")).toDF("id", "t")
    val got = Bm25.topK(df, "id", "t", Seq("x"), k = 10).collect()
    // N=2, df=1 -> idf=ln(2); tf=2, dl=2, avgdl=1.5 ->
    // ln(2)*2*2.2/(2+1.2*(0.25+0.75*2/1.5)) = 0.871
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 0.871)))
    val rank = Bm25.topK(
      Seq((1L, "x x y"), (2L, "x z z"), (3L, "w w w")).toDF("id", "t"),
      "id", "t", Seq("x", "y"), k = 10).collect().map(_.getLong(0)).toSeq
    assert(rank == Seq(1L, 2L)) // doc 3 has no query term -> absent
  }

  // --- canonical selection --------------------------------------------------

  test("canonicalPerCluster keeps the best-quality member, ties to smallest id") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L), (9L, 99L))
      .toDF("doc_id", "n_chars")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("id", "component")
    val out = Dedup.canonicalPerCluster(docs, comps, "doc_id", col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
    // doc 9 is a singleton outside the pair graph: untouched (absent)
  }

  // --- SubstringDup ---------------------------------------------------------

  test("dupSpanStats marks cross-doc shared n-grams, not unique text") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val df = Seq(
      (1L, shared + " UNIQUEONE-SUFFIX-AAAA"),
      (2L, shared + " UNIQUETWO-SUFFIX-BBBB"),
      (3L, "completely different text with nothing in common here at all"),
      (4L, "tiny")) // shorter than n -> dropped
      .toDF("id", "t")
    val out = SubstringDup.dupSpanStats(df, "id", "t", n = 16, stride = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(!out.contains(4L))
    assert(out(1L) > 0.5 && out(2L) > 0.5) // shared prefix dominates
    assert(out(3L) == 0.0)
  }

  test("dupSpanStats hashGrams variant matches the raw-gram stats") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val df = Seq(
      (1L, shared + " UNIQUEONE-SUFFIX-AAAA"),
      (2L, shared + " UNIQUETWO-SUFFIX-BBBB"),
      (3L, "completely different text with nothing in common here at all"))
      .toDF("id", "t")
    def stats(h: Boolean) =
      SubstringDup.dupSpanStats(df, "id", "t", n = 16, stride = 1, hashGrams = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats(h = true) == stats(h = false))
  }

  test("packBins is deterministic under repartitioning") {
    val rows = (0L until 200L).map(i => (s"s${i % 4}", i, 30L + i % 7))
      .toDF("shard", "ord", "w")
    val a = Packing.packBins(rows, "shard", "ord", "w", 100L)
      .select($"shard", $"ord", $"bin").collect().map(_.toSeq).toSet
    val b = Packing.packBins(rows.repartition(13), "shard", "ord", "w", 100L)
      .select($"shard", $"ord", $"bin").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
