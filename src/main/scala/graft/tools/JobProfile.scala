package graft.tools

import graft.{GraftSession, SessionHygiene, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool (optimization guide §1): per-JOB time breakdown of a registry
  * query. The lifecycle queries (x32..x70, d47..) run dozens of Spark jobs
  * per invocation — a single wall-clock number can't say which phase to
  * optimize. This attaches a listener recording every job's wall time,
  * call-site/description, task time, and shuffle bytes, runs the query
  * warm-then-measured (the Bench protocol), and prints the measured run's
  * jobs sorted by duration plus an aggregation by call site.
  * Run: sbt "runMain graft.tools.JobProfile <sfDir> <name> [name...]" */
object JobProfile {
  private case class JobRec(id: Int, start: Long, var end: Long = 0L,
                            var desc: String = "", var taskTime: Long = 0L,
                            var shufRead: Long = 0L, var shufWrite: Long = 0L,
                            var input: Long = 0L, var tasks: Int = 0)
  private val stageJob = mutable.Map.empty[Int, Int]

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.head
    println("FSIMPL " + org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI("file:///"),
        spark.sparkContext.hadoopConfiguration).getClass.getName)
    println("ISTESTING spark.testing=" + sys.props.get("spark.testing") +
      " SPARK_TESTING=" + sys.env.get("SPARK_TESTING") +
      " assertions=" + getClass.desiredAssertionStatus())
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(d => d.nonEmpty && !d.startsWith("id = "))
          .orElse(e.stageInfos.sortBy(_.stageId).lastOption.map(_.name))
          .getOrElse("")
        jobs.synchronized {
          e.stageIds.foreach(sid => stageJob(sid) = e.jobId)
          jobs(e.jobId) = JobRec(e.jobId, e.time, desc = site)
        }
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (recording) jobs.synchronized {
          stageJob.get(e.stageInfo.stageId).foreach { jid =>
            jobs.get(jid).foreach { r =>
              if (r.desc.isEmpty) r.desc = e.stageInfo.name
            }
          }
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (recording) {
        val m = e.taskMetrics
        if (m != null) jobs.synchronized {
          // exact attribution: TaskEnd carries the stageId, and JobStart
          // recorded every stage's owning job
          stageJob.get(e.stageId).flatMap(jobs.get).foreach { r =>
            r.taskTime += m.executorRunTime
            r.shufRead += m.shuffleReadMetrics.totalBytesRead
            r.shufWrite += m.shuffleWriteMetrics.bytesWritten
            r.input += m.inputMetrics.bytesRead
            r.tasks += 1
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // In-process stack sampler (guide §7.3: external jstack/jcmd attach is
    // blocked in this sandbox) — every ~8 ms, record the first
    // "interesting" frame (plus nearest graft/spark context) of every
    // thread that is RUNNABLE or inside a blocking syscall, bucketed by
    // thread family. Prints the hottest buckets after the measured run:
    // this is what attributes the total-vs-jobWall gap (driver-side
    // planning, txn-log I/O, stream machinery) that no SparkListener sees.
    val sampling = sys.env.get("GRAFT_SAMPLE").contains("1")
    val hot = mutable.Map.empty[(String, String), Int]
    val forkStacks = mutable.ArrayBuffer.empty[String]
    @volatile var sampleOn = false
    val sampler = new Thread(() => {
      val boring = Seq("Unsafe.park", "LockSupport", "Object.wait",
        "AbstractQueuedSynchronizer", "ForkJoinPool", "SelectorImpl",
        "epollWait", "PlainSocketImpl", "Net.poll", "CountDownLatch",
        "Reference.waitForReference", "ThreadPoolExecutor.getTask",
        "SynchronousQueue", "LinkedBlockingQueue.take",
        "LinkedBlockingDeque.take", "PriorityBlockingQueue.take")
      while (true) {
        if (sampleOn) {
          val all = Thread.getAllStackTraces
          all.forEach { (th, frames) =>
            if (frames.nonEmpty && th.getId != Thread.currentThread().getId) {
              val fs = frames.map(f => s"${f.getClassName}.${f.getMethodName}")
              val interesting = fs.find(f => !boring.exists(f.contains))
              val isIdle = boring.exists(fs.head.contains)
              if (!isIdle && interesting.isDefined) {
                if (interesting.get.contains("forkAndExec") &&
                    forkStacks.size < 3)
                  forkStacks.synchronized {
                    forkStacks += frames.map(_.toString).mkString("\n    ")
                  }
                val ctx = fs.find(f => f.contains("graft") ||
                  f.contains("org.apache.spark.sql.execution") ||
                  f.contains("org.apache.spark.sql.catalyst")).getOrElse("")
                val fam = th.getName.replaceAll("[0-9]+", "N")
                hot.synchronized {
                  hot((fam, interesting.get + " || " + ctx)) =
                    hot.getOrElse((fam, interesting.get + " || " + ctx), 0) + 1
                }
              }
            }
          }
        }
        Thread.sleep(8)
      }
    })
    sampler.setDaemon(true)
    if (sampling) sampler.start()
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      SessionHygiene.dropAllStorage(spark)
      jobs.synchronized(jobs.clear())
      hot.synchronized(hot.clear())
      recording = true
      sampleOn = true
      val t = once()
      sampleOn = false
      recording = false
      // let straggler listener events drain (bus is private API; a short
      // sleep is enough for a dev tool)
      Thread.sleep(300)
      SessionHygiene.dropAllStorage(spark)
      val recs = jobs.synchronized(jobs.values.toSeq)
      println(f"PROFILE $name total=$t%.2f s, ${recs.size} jobs, " +
        f"jobWall=${recs.map(r => (r.end - r.start).max(0L)).sum / 1e3}%.2f s")
      val byDesc = recs.groupBy(r => r.desc.take(90)).map { case (d, rs) =>
        (d, rs.map(r => (r.end - r.start).max(0L)).sum, rs.size,
          rs.map(_.taskTime).sum, rs.map(_.input).sum,
          rs.map(_.shufRead).sum + rs.map(_.shufWrite).sum)
      }.toSeq.sortBy(-_._2)
      byDesc.foreach { case (d, wall, n, task, in, shuf) =>
        println(f"  ${wall / 1e3}%6.2fs n=$n%-3d task=${task / 1e3}%6.1fs " +
          f"in=${in / 1e6}%6.1fMB shuf=${shuf / 1e6}%6.1fMB  $d")
      }
      println(s"  -- slowest individual jobs --")
      recs.sortBy(r => -(r.end - r.start)).take(15).foreach { r =>
        println(f"  job=${r.id}%-4d ${(r.end - r.start).max(0L) / 1e3}%6.2fs " +
          f"tasks=${r.tasks}%-4d ${r.desc.take(110)}")
      }
      if (sampling) {
        println(s"  -- busy samples by thread family (8 ms ticks) --")
        hot.synchronized(hot.toSeq).groupBy(_._1._1)
          .map { case (fam, xs) => fam -> xs.map(_._2).sum }
          .toSeq.sortBy(-_._2).take(12).foreach { case (fam, n) =>
            println(f"  $n%5d $fam")
          }
        println(s"  -- hottest sampled stacks (8 ms ticks, busy threads) --")
        val hotSeq = hot.synchronized(hot.toSeq)
        hotSeq.sortBy(-_._2).take(30).foreach {
          case ((fam, frame), n) =>
            println(f"  $n%4d [$fam] $frame")
        }
        // driver-side families get their own top list (the executor pool
        // swamps the global one)
        Seq("stream execution", "main", "dag-scheduler").foreach { want =>
          println(s"  -- top [$want] stacks --")
          hotSeq.filter(_._1._1.contains(want)).sortBy(-_._2).take(10)
            .foreach { case ((_, frame), n) => println(f"  $n%4d $frame") }
        }
        forkStacks.synchronized(forkStacks.toSeq).foreach { st =>
          println(s"  -- fork stack --\n    $st")
        }
      }
    }
    spark.stop()
  }
}
