package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-16 optimization instrumentation: for each bench key, how much
  * of its wall-clock is Spark-job LAUNCH COUNT (the fixed ~5-15 ms/job
  * scheduling constant at sf0.1 — BASELINE.md's standing analysis)
  * versus executor task time (real compute). A key whose wall is 60
  * jobs × constant optimizes by REMOVING ACTIONS (collapse counts,
  * fuse commits); a key dominated by task time optimizes by plan shape
  * (guide §2-3). Per key, timed on the SECOND build (warm — the bench
  * methodology is best-of-3, so the warm number is what the board
  * shows):
  *
  *   key  wall_s  jobs  stages  tasks  taskTime_s  shuffleRW_MB
  *
  * Usage: graft.tools.KeyStatsProbe <sfDir> <key1,key2,...|top:N>
  * (top:N = the N slowest keys of bench_details.json if present).
  */
object KeyStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val sel = if (args.length > 1) args(1) else "top:15"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    val keys: Seq[String] =
      if (sel.startsWith("top:")) {
        val n = sel.stripPrefix("top:").toInt
        val txt = java.nio.file.Files.readString(
          java.nio.file.Paths.get("bench_details.json"))
        // minimal extraction of the "queries" map: "k":1.234 pairs
        // each key appears in "queries" (seconds) first, then in the
        // steal/load validity maps — distinctBy keeps the seconds
        val m = "\"([a-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(txt)
          .map(g => g.group(1) -> g.group(2).toDouble).toSeq.distinctBy(_._1)
        m.filter(kv => graft.SparkEntry.queries.contains(kv._1))
          .sortBy(-_._2).take(n).map(_._1)
      } else sel.split(",").toSeq

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    // SPARK_GRAFT_PROBE_JOBLOG=1: print one line per job with its call
    // site + description — attributes a job-count-bound key's jobs to
    // the driver actions that launch them.
    val jobLog = sys.env.get("SPARK_GRAFT_PROBE_JOBLOG").contains("1")
    val logging = new AtomicInteger(0) // 1 while a timed run is active
    // stageId -> jobId so per-job task counts/time can be attributed
    // (JOBLOG prints them at job END, after its tasks have reported)
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobTasks = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
    val jobTimeMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val jobLine = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (jobLog && logging.get == 1) {
          val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          j.stageInfos.foreach(si => stageJob.put(si.stageId, j.jobId))
          jobTasks.put(j.jobId, new AtomicInteger(0))
          jobTimeMs.put(j.jobId, new AtomicLong(0L))
          jobLine.put(j.jobId,
            s"  job ${j.jobId} [${j.stageInfos.size} st] $cs | $desc")
        }
        ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        if (jobLog && jobLine.containsKey(e.jobId)) {
          val n = Option(jobTasks.get(e.jobId)).map(_.get).getOrElse(0)
          val ms = Option(jobTimeMs.get(e.jobId)).map(_.get).getOrElse(0L)
          println(f"${jobLine.remove(e.jobId)} [$n%d tasks, ${ms / 1e3}%.2f task_s]")
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          Option(stageJob.get(t.stageId)).foreach { jid =>
            Option(jobTasks.get(jid)).foreach(_.incrementAndGet())
            Option(jobTimeMs.get(jid)).foreach(_.addAndGet(m.executorRunTime))
          }
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    println(f"${"key"}%-34s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"task_s"}%8s ${"shufMB"}%7s")
    keys.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        run() // cold build: warms codegen/scratch publishes
        Thread.sleep(300) // let the listener bus drain (private API in Spark 4)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0); shufRead.set(0); shufWrite.set(0)
        logging.set(1)
        val wall = run()
        Thread.sleep(300) // let the listener bus drain (private API in Spark 4)
        logging.set(0)
        val shufMb = (shufRead.get + shufWrite.get) / 1e6
        println(f"$name%-34s $wall%8.3f ${jobs.get}%5d ${stages.get}%6d ${tasks.get}%6d ${taskTimeMs.get / 1e3}%8.2f $shufMb%7.1f")
      } catch {
        case t: Throwable =>
          println(s"$name FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
