package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Extra (non-driver-contract) benchmark harness for optimization work —
  * guide §1: isolate the computation with a per-job breakdown so the fix
  * targets where the time actually goes, and time transformations with
  * the noop sink where a count() would let Catalyst prune the work.
  *
  * Usage:
  *   SPARK_GRAFT_ONLY=g5_pagerank_update sbt "runMain graft.BenchExtra"
  *
  * Env (same contract as Bench): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  * SPARK_GRAFT_ONLY selects queries (comma-separated; default: a small
  * heavy set). Each query runs twice (cold, warm); per-job wall times and
  * call sites are printed for the WARM run, which is what Bench's
  * min-of-2 measures.
  */
object BenchExtra {

  /** Records (jobId, submitted, completed, callSite, description). */
  private final class JobLog extends SparkListener {
    final case class J(id: Int, var t0: Long = 0L, var t1: Long = 0L,
        var site: String = "", var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val j = J(e.jobId, t0 = e.time)
      j.site = Option(e.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
      j.desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs.put(e.jobId, j)
      ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "0")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // phase decomposition for the g5 shape: edges → history → update
    if (sys.env.get("SPARK_GRAFT_G5_PHASES").contains("1")) {
      import org.apache.spark.sql.functions._
      for (pass <- 1 to 2) {
        val edges = queries.Fixture.linkEdges(spark, sfDir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tE = timeIt(edges.count())
        val b1 = edges.filter(xxhash64(col("src"), col("dst")) % 3 =!= 0)
        val b2 = edges.filter(xxhash64(col("src"), col("dst")) % 3 === 0)
        var state: graft.ops.LinkGraph.PagerankState = null
        val tH = timeIt { state = graft.ops.LinkGraph.pagerankHistory(b1, iterations = 3) }
        val tHM = timeIt(state.history.last.count())
        var upd: org.apache.spark.sql.DataFrame = null
        val tUB = timeIt { upd = graft.ops.LinkGraph.updatePagerank(state, b2) }
        val tU = timeIt(upd.count())
        edges.unpersist()
        println(f"[g5-phases pass$pass] edges=$tE%.2f historyBuild=$tH%.2f " +
          f"historyMat=$tHM%.2f updateBuild=$tUB%.2f updateExec=$tU%.2f")
      }
      spark.stop()
      return
    }

    // phase decomposition for the CC family: pair derivation vs closure
    if (sys.env.get("SPARK_GRAFT_CC_PHASES").contains("1")) {
      import org.apache.spark.sql.functions._
      val md5h = (t: org.apache.spark.sql.Column) => graft.ops.CrossHash.md5Hash60(t)
      for (pass <- 1 to 2) {
        val docs = queries.Fixture.documents(spark, sfDir)
        val lsh = graft.ops.Dedup.minhashLshCandidates(docs, "text", "doc_id")
        val mh = graft.ops.Dedup.jaccardVerify(docs, lsh.select("id_a", "id_b"), "text", "doc_id")
          .filter(col("jaccard_den") > 0 && col("jaccard_num") * 5 >= col("jaccard_den") * 4)
          .select("id_a", "id_b")
        val sh = graft.ops.Dedup.simhashCandidates(docs, "text", "doc_id",
            maxHamming = 6, numBands = 8, bits = 60, tokenHash = md5h)
          .select("id_a", "id_b")
        val pairs = mh.unionByName(sh)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tP = timeIt(pairs.count())
        var rounds = 0
        var cc: org.apache.spark.sql.DataFrame = null
        val tC = timeIt {
          val r = graft.ops.Dedup.connectedComponentsWithRounds(pairs)
          cc = r._1; rounds = r._2
        }
        val tM = timeIt(cc.count())
        pairs.unpersist()
        println(f"[cc-phases pass$pass] pairs=$tP%.2f closure=$tC%.2f " +
          f"labelsMat=$tM%.2f rounds=$rounds")
      }
      spark.stop()
      return
    }

    // phase decomposition for e3: empty write / ingest / label fold
    if (sys.env.get("SPARK_GRAFT_E3_PHASES").contains("1")) {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val md5h = (t: org.apache.spark.sql.Column) => graft.ops.CrossHash.md5Hash60(t)
      for (pass <- 1 to 2) {
        val path = s"/tmp/graft-store/e3phases_pid${ProcessHandle.current().pid()}_$pass"
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        val docs = queries.Fixture.documents(spark, sfDir)
        val sigsAll = docs.select(col("doc_id"),
          graft.ops.Dedup.simhashFromHashes(
            transform(split(lower(trim(col("text"))), "\\s+"), t => md5h(t)), 60).as("sig"))
          .persist(lvl)
        val tSig = timeIt(sigsAll.count())
        val tW0 = timeIt(graft.ops.BandStore.write(sigsAll.limit(0), "doc_id", "sig", path,
          numBands = 8, bits = 60, prefixBits = 2))
        var labels = Seq.empty[(Long, Long)].toDF("doc_id", "component_rep")
        for (k <- 0 until 2) {
          var pairs: org.apache.spark.sql.DataFrame = null
          val tI = timeIt { pairs = graft.ops.BandStore.ingest(
            sigsAll.filter(col("doc_id") % 2 === k), "doc_id", "sig", path, maxHamming = 6) }
          val tU = timeIt { labels = graft.ops.Dedup.updateComponents(labels, pairs) }
          pairs.unpersist()
          println(f"[e3-phases pass$pass] k=$k ingest=$tI%.2f update=$tU%.2f" +
            (if (k == 0) f" sig=$tSig%.2f w0=$tW0%.2f" else ""))
        }
        val tM = timeIt(labels.count())
        sigsAll.unpersist()
        println(f"[e3-phases pass$pass] labelsMat=$tM%.2f")
      }
      spark.stop()
      return
    }

    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("g5_pagerank_update", "e3_dedup_maintenance", "d15_cc_forget",
        "k7_quantile_update", "d13_cc_update"))

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // cold pass (codegen/JIT warm-up — matches Bench's untimed warm-up)
      val tCold = timeIt(fn(spark, sfDir).count())
      // warm pass with the job log attached
      val log = new JobLog
      spark.sparkContext.addSparkListener(log)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val tWarm = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(log)
      Thread.sleep(300) // let the listener bus drain
      println(f"%n=== $name cold=$tCold%.3f warm=$tWarm%.3f s, jobs=${log.jobs.size} ===")
      val js = log.jobs.values.toArray(Array.empty[log.J]).sortBy(_.id)
      var gap0 = 0L
      js.foreach { j =>
        val dur = (j.t1 - j.t0) / 1e3
        val gap = if (gap0 == 0) 0.0 else (j.t0 - gap0) / 1e3
        gap0 = j.t1
        println(f"  job ${j.id}%4d ${dur}%8.3fs gapBefore=${gap}%7.3fs ${j.site.take(70)}")
      }
    }
    spark.stop()
  }

  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
}
