package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Native R2 table reads: `spark.read.parquet("r2://...")` through the
  * read-only Hadoop filesystem must go through Spark's own parquet
  * source — filter pushdown, column pruning, and byte-ranged GETs all
  * verified against the in-process S3-style stub (zero egress).
  */
class R2FileSystemSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  lazy val stub = graft.queries.Connectors.stub

  private def setupLake(): Unit = {
    val nation = graft.queries.load(spark, "/root/testdata/sf0.001", "nation")
    val tmp = java.nio.file.Files.createTempDirectory("r2lake").toFile
    nation.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath + "/nation")
    new java.io.File(tmp, "nation").listFiles()
      .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
        stub.objects.put(s"tables/nation/part-$i.parquet",
          java.nio.file.Files.readAllBytes(f.toPath))
      }
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.r2.impl", "graft.sources.r2.R2FileSystem")
    hc.set("fs.r2.impl.disable.cache", "true")
    hc.set("fs.r2.endpoint", stub.base)
  }

  test("parquet over r2:// — correct rows, pushdown, ranged reads") {
    setupLake()
    stub.requests.clear()
    val df = spark.read.parquet("r2://r2-lake/tables/nation")
      .filter(col("n_regionkey") === 2)
      .select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey"))
    val got = df.collect()
    val want = graft.queries.load(spark, "/root/testdata/sf0.001", "nation")
      .filter(col("n_regionkey") === 2)
      .select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey"))
      .collect()
    assert(got.nonEmpty && got.sameElements(want))
    // the filter reached the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)]"),
      plan.take(1500))
    // object reads were byte-ranged (footer + needed column chunks), and
    // at least one was a non-zero-offset range (the footer tail read) —
    // whole-object GETs never happen
    val objReqs = stub.requests.toArray.map(_.toString)
      .filter(_.contains("/r2-lake/tables/"))
    assert(objReqs.nonEmpty && objReqs.forall(_.contains("#Range:bytes=")), objReqs.mkString("\n"))
    assert(objReqs.exists(r => "#Range:bytes=(\\d+)-".r.findFirstMatchIn(r)
      .exists(_.group(1).toLong > 0)), objReqs.mkString("\n"))
  }

  test("listing paginates across the ListObjectsV2 1,000-key cap — no silent truncation") {
    setupLake()
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path("r2://r2-lake/").getFileSystem(hc)
    val n = 2500
    (0 until n).foreach { i =>
      stub.objects.put(f"manykeys/part-$i%05d.parquet", Array[Byte](1, 2, 3))
    }
    try {
      stub.requests.clear()
      val listed = fs.listStatus(new org.apache.hadoop.fs.Path("r2://r2-lake/manykeys"))
      assert(listed.length == n, s"expected $n objects, got ${listed.length}")
      assert(listed.forall(st => !st.isDirectory && st.getLen == 3))
      // the client actually paged: >1 list request, continuation tokens used
      val listReqs = stub.requests.toArray.map(_.toString).filter(_.contains("list-type=2"))
      assert(listReqs.length >= 3, listReqs.mkString("\n"))
      assert(listReqs.count(_.contains("continuation-token=")) >= 2, listReqs.mkString("\n"))
      // and a lowered server page cap still yields the complete set
      stub.listPageCap = 100
      try {
        val relisted = fs.listStatus(new org.apache.hadoop.fs.Path("r2://r2-lake/manykeys"))
        assert(relisted.length == n, s"cap=100: expected $n, got ${relisted.length}")
      } finally stub.listPageCap = 1000
    } finally (0 until n).foreach { i =>
      stub.objects.remove(f"manykeys/part-$i%05d.parquet")
    }
  }

  test("getFileStatus stats one key with bounded max-keys=1 probes, not a subtree listing") {
    setupLake()
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path("r2://r2-lake/").getFileSystem(hc)
    stub.requests.clear()
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path("r2://r2-lake/tables/nation/part-0.parquet"))
    assert(!st.isDirectory && st.getLen > 0)
    val listReqs = stub.requests.toArray.map(_.toString).filter(_.contains("list-type=2"))
    assert(listReqs.nonEmpty && listReqs.forall(_.contains("max-keys=1")), listReqs.mkString("\n"))
    // a directory stat also stays bounded
    stub.requests.clear()
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path("r2://r2-lake/tables/nation")).isDirectory)
    val dirReqs = stub.requests.toArray.map(_.toString).filter(_.contains("list-type=2"))
    assert(dirReqs.nonEmpty && dirReqs.forall(_.contains("max-keys=1")), dirReqs.mkString("\n"))
  }

  test("directory listing, file status, and read-only enforcement") {
    setupLake()
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path("r2://r2-lake/").getFileSystem(hc)
    val root = fs.listStatus(new org.apache.hadoop.fs.Path("r2://r2-lake/tables"))
    assert(root.length == 1 && root.head.isDirectory &&
      root.head.getPath.toString.endsWith("tables/nation"))
    val files = fs.listStatus(new org.apache.hadoop.fs.Path("r2://r2-lake/tables/nation"))
    assert(files.length >= 1 && files.forall(f => !f.isDirectory && f.getLen > 0))
    assert(fs.exists(new org.apache.hadoop.fs.Path("r2://r2-lake/tables/nation/part-0.parquet")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path("r2://r2-lake/tables/nope")))
    intercept[UnsupportedOperationException] {
      fs.delete(new org.apache.hadoop.fs.Path("r2://r2-lake/tables/nation"), true)
    }
  }
}
