package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transaction-log lake format — the local protocol sketch of what the
  * reference gets from Delta Lake on GCS (ref
  * process_bronze_to_silver.py:146,151-155): versioned snapshots, atomic
  * commits, snapshot-isolated readers, time travel, and vacuum — built on
  * nothing but parquet, JSON log entries, and the atomic-rename primitive
  * `Storage.Compaction` already relies on.
  *
  * Layout:
  * {{{
  *   <table>/_txn_log/v<N>.json   one entry per committed version: the list
  *                                of data files that ARE snapshot N
  *   <table>/data/v<N>-<salt>/    immutable parquet written by commit N
  * }}}
  *
  * Protocol:
  *  - WRITE: data lands in a fresh immutable dir, then the log entry is
  *    published by writing `v<N>.json.tmp-<salt>` and RENAMING it to
  *    `v<N>.json`. Rename-without-overwrite is the commit point: it either
  *    fully happens or fully doesn't, so readers never observe a torn
  *    commit.
  *  - CONCURRENCY (optimistic): two writers racing to version N both
  *    prepare data dirs; only one rename wins (HDFS/local rename onto an
  *    existing destination returns false). The loser re-reads the log and
  *    retries at N+1 — append retries preserve both writers' rows;
  *    overwrite retries preserve last-committer-wins, exactly Delta's
  *    semantics.
  *  - READERS resolve the latest `v<N>.json` ONCE and then scan only the
  *    files that entry names. Later commits add new dirs and log entries
  *    but never mutate old ones, so an in-flight reader keeps its snapshot
  *    (isolation) and any version can be re-read on demand (time travel)
  *    until `vacuum` reclaims it.
  *
  * At 100 TB the log stays tiny (one small JSON per commit — scans list
  * the log dir, not the data tree), data files are immutable so caches and
  * object-store reads stay valid, and vacuum is the only deleter.
  */
object TxnLake extends LakeFormat {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_txn_log")

  private final case class Entry(version: Long, operation: String,
                                 files: Seq[String],
                                 txn: Option[(String, Long)] = None,
                                 txns: Map[String, Long] = Map.empty)

  // Minimal JSON (no deps): {"version":N,"operation":"...","files":["a","b"]}
  // plus, for transactional streaming commits, "txnApp"/"txnBatch" — the
  // Delta `txn` action: which (application, batch) this version idempotently
  // belongs to — and "txns", the CUMULATIVE app→latest-batch map carried
  // through every commit (Delta's checkpointed SetTransaction state): the
  // replay check reads ONE entry instead of scanning the whole log.
  private def render(e: Entry): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"version":${e.version},"operation":${q(e.operation)},""" +
      s""""files":[${e.files.map(q).mkString(",")}]""" +
      e.txn.map { case (a, b) => s""","txnApp":${q(a)},"txnBatch":$b""" }
        .getOrElse("") +
      (if (e.txns.isEmpty) ""
       else s""","txns":{${e.txns.toSeq.sorted
         .map { case (a, b) => s"${q(a)}:$b" }.mkString(",")}}""") + "}"
  }

  private def parse(s: String): Entry = {
    val version = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(sys.error(s"TxnLake: malformed log entry: $s"))
    val operation = """"operation"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("unknown")
    val files = """"files"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    val txn = for {
      a <- """"txnApp"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      b <- """"txnBatch"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    } yield (a, b)
    // capture the txns object as a run of quoted-key:number pairs rather
    // than [^}]* — a '}' inside an escaped app id must not truncate the
    // map (a truncated parse would be carried forward by every later
    // commit, permanently losing replay markers)
    val txns =
      """"txns"\s*:\s*\{((?:\s*"(?:[^"\\]|\\.)*"\s*:\s*-?\d+\s*,?)*)\}""".r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val txnsMap = """"((?:[^"\\]|\\.)*)"\s*:\s*(-?\d+)""".r.findAllMatchIn(txns)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
        -> m.group(2).toLong).toMap
    Entry(version, operation, files, txn, txnsMap)
  }

  private def committedVersions(spark: SparkSession, table: String): Seq[Long] = {
    val ld = logDir(table)
    val f = fs(spark, ld)
    if (!f.exists(ld)) Seq.empty
    else f.listStatus(ld).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted.toSeq
  }

  private def readEntry(spark: SparkSession, table: String, v: Long): Entry = {
    val p = new Path(logDir(table), s"v$v.json")
    val in = fs(spark, p).open(p)
    try parse(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }

  /** Latest committed version, if any commit exists. */
  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    committedVersions(spark, table).lastOption

  /** Commit `df` as the next version. `operation` is "overwrite" (snapshot
    * replaces the table) or "append" (snapshot = previous files + new).
    * Retries on commit conflicts (another writer won the version) up to
    * `maxAttempts` times. Returns the committed version. */
  def commit(spark: SparkSession, df: DataFrame, table: String,
             operation: String, maxAttempts: Int = 10): Long =
    commitImpl(spark, df, table, operation, None, maxAttempts)
      .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped"))

  /** Idempotent transactional commit — the Delta `txn` action: commit `df`
    * ONLY IF no committed version already records (appId, batchId). Returns
    * the new version, or None when the transaction was found (the commit is
    * a no-op replay). This is what makes an at-least-once replayer — a
    * restarted Structured Streaming foreachBatch sink re-delivering its
    * last micro-batch — exactly-once at the table: the txn check and the
    * version publish share the same optimistic loop, so a racer that loses
    * the version race re-reads the log, finds the txn, and skips.
    *
    * The check reads ONE log entry: every commit carries the cumulative
    * app→latest-batch map forward (Delta's checkpointed SetTransaction
    * state), so replay detection is O(1) regardless of log length; logs
    * written before the map existed fall back to the linear scan. */
  def commitOnce(spark: SparkSession, df: DataFrame, table: String,
                 operation: String, appId: String, batchId: Long,
                 maxAttempts: Int = 10): Option[Long] =
    commitImpl(spark, df, table, operation, Some((appId, batchId)), maxAttempts)

  /** Raised (internally) when `requireBase` no longer matches the log —
    * the caller's read snapshot is stale and it must recompute. */
  private[sources] final class CommitConflict extends Exception

  private def commitImpl(spark: SparkSession, df: DataFrame, table: String,
                         operation: String, txn: Option[(String, Long)],
                         maxAttempts: Int,
                         requireBase: Option[Option[Long]] = None): Option[Long] = {
    require(operation == "overwrite" || operation == "append",
      s"TxnLake: unknown operation $operation")
    val tablePath = new Path(table)
    val f = fs(spark, tablePath)
    f.mkdirs(logDir(table))
    val salt = java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (attempt < maxAttempts) {
      // Snapshot the log ONCE per attempt; the txn check must cover exactly
      // the versions that determined `next`. Checking before (or separately
      // from) reading `next` reopens the replay race: a twin that lists the
      // log after the winner's commit would target a fresh version and
      // double-apply the batch. With check and `next` derived from the same
      // listing, any commit that lands in between makes our exclusive
      // publish at `next` FAIL, and the retry re-lists — so a replay twin
      // is always caught either by the check or by the version conflict.
      val committed = committedVersions(spark, table)
      // optimistic read-set check: the caller pinned its read at a version;
      // any commit since then means its computation is stale
      requireBase.foreach { rb =>
        if (committed.lastOption != rb) throw new CommitConflict }
      val lastEntry = committed.lastOption.map(readEntry(spark, table, _))
      // Replay check against the cumulative txn map in the LAST entry only
      // (O(1) log reads). Batch ids per app are monotone (the foreachBatch
      // contract), so seen means batchId <= recorded — Delta's exact
      // SetTransaction semantics. Entries written before the map existed
      // fall back to the full-log scan.
      val replayed = txn.exists { case (app, batch) =>
        lastEntry match {
          case Some(e) if e.txns.nonEmpty => e.txns.get(app).exists(_ >= batch)
          case Some(_) => committed.exists(v =>
            readEntry(spark, table, v).txn.contains((app, batch)))
          case None => false
        }
      }
      if (replayed) return None
      val next = committed.lastOption.map(_ + 1).getOrElse(0L)
      // 1. land the data in a fresh immutable dir (never seen by readers
      //    until the log entry that names it is published)
      val dataRel = s"data/v$next-$salt-$attempt"
      df.write.mode("overwrite").parquet(new Path(tablePath, dataRel).toString)
      val written = f.listStatus(new Path(tablePath, dataRel))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s"$dataRel/${s.getPath.getName}").sorted.toSeq
      val base = if (operation == "append")
        lastEntry.map(_.files).getOrElse(Seq.empty)
      else Seq.empty
      // carry the cumulative txn state through EVERY commit (plain commits
      // included) so the O(1) replay check above stays sound. UPGRADE
      // path: a log written before the map existed carries per-entry txn
      // markers only — fold ALL of them in the one commit that introduces
      // the map (one-time linear scan), otherwise the first new-format
      // commit would orphan every legacy marker and a legacy app's replay
      // would slip past the nonEmpty-map fast path above.
      val legacy: Map[String, Long] = lastEntry match {
        case Some(e) if e.txns.isEmpty =>
          committed.foldLeft(Map.empty[String, Long]) { (m, v) =>
            readEntry(spark, table, v).txn match {
              case Some((a, b)) if m.get(a).forall(_ < b) => m + (a -> b)
              case _ => m
            }
          }
        case _ => Map.empty
      }
      val txns = legacy ++ lastEntry.map(_.txns).getOrElse(Map.empty) ++ txn.toMap
      // 2. publish: tmp write + rename-without-overwrite IS the commit
      val entry = render(Entry(next, operation, base ++ written, txn, txns))
      val tmp = new Path(logDir(table), s"v$next.json.tmp-$salt")
      val out = f.create(tmp, false)
      try out.write(entry.getBytes("UTF-8")) finally out.close()
      val dst = new Path(logDir(table), s"v$next.json")
      if (publishExclusive(f, tmp, dst)) return Some(next)
      f.delete(tmp, false) // lost the race: discard and retry at N+1
      // under a pinned read set, losing the race IS a read conflict —
      // surface it now rather than burning the remaining attempts
      if (requireBase.isDefined) throw new CommitConflict
      attempt += 1
    }
    sys.error(s"TxnLake: gave up after $maxAttempts commit conflicts on $table")
  }

  /** Atomic publish-if-absent — the commit point. On HDFS-like stores,
    * rename-without-overwrite is atomic at the namenode. `File.renameTo`
    * on POSIX is rename(2), which silently REPLACES an existing
    * destination, so for the local scheme the exclusivity comes from
    * link(2) instead: creating a hard link fails atomically when the
    * destination exists. */
  private def publishExclusive(f: FileSystem, tmp: Path, dst: Path): Boolean =
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else !f.exists(dst) && f.rename(tmp, dst)

  /** Read a specific committed version (time travel), resolving the file
    * list from that version's log entry only — later commits are
    * invisible. */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val e = readEntry(spark, table, version)
    if (e.files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(e.files.map(r => new Path(table, r).toString): _*)
  }

  /** MERGE (upsert) at the table layer — the q41 delta-wins semantics as a
    * lake operation: rows matching on `key` are replaced by the delta,
    * unmatched delta rows insert, everything else carries over; the result
    * lands as ONE overwrite commit, so readers see either the pre-merge or
    * the post-merge snapshot, never a partial application. Requires the
    * delta to share the table's schema (names AND types). Returns the
    * committed version.
    *
    * Concurrency: merge is read-modify-write, so its snapshot read is part
    * of the transaction's read set. The publish is pinned to exactly
    * (read version + 1); if any writer commits in between, the publish is
    * refused and the merge RECOMPUTES from the fresh snapshot — the
    * concurrent commit's rows are never silently discarded (the lost
    * update Delta detects with ConcurrentModificationException; since this
    * merge always re-reads the whole table, blind recompute-and-retry is
    * always safe where Delta must sometimes fail). Throws
    * ConcurrentModificationException only after `maxAttempts` straight
    * conflicts.
    *
    * Scale: one full-outer shuffle on the merge key over (snapshot ∪
    * delta) — Delta's whole-file-rewrite MERGE costs the same; a
    * production refinement keys the rewrite to touched files only. */
  def merge(spark: SparkSession, delta: DataFrame, table: String,
            key: String, maxAttempts: Int = 10): Long =
    mergeImpl(spark, delta, table, key, maxAttempts, () => ())

  /** Test seam: `beforeCommit` runs between the snapshot read and the
    * commit attempt, letting specs interleave a concurrent writer
    * deterministically. */
  private[sources] def mergeImpl(spark: SparkSession, delta: DataFrame,
                                 table: String, key: String, maxAttempts: Int,
                                 beforeCommit: () => Unit): Long = {
    import org.apache.spark.sql.functions.{col, lit, when}
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table)
      // read the PINNED version, not latest: base and snapshot must agree
      // even if a commit lands between the two calls
      val cur = base.map(readVersion(spark, table, _))
        .getOrElse(spark.emptyDataFrame)
      val merged =
        if (cur.isEmpty) delta
        else {
          def sig(df: DataFrame) =
            df.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
          require(sig(cur) == sig(delta),
            s"TxnLake.merge: schema mismatch ${sig(cur)} vs ${sig(delta)}")
          val others = delta.columns.filterNot(_ == key)
          // presence marker, not coalesce: a delta row legitimately updating
          // a column TO null must win over the old value
          cur.as("c").join(delta.withColumn("__d", lit(true)).as("d"),
              Seq(key), "full_outer")
            .select(col(key) +: others.map(n =>
              when(col("__d"), col(s"d.$n")).otherwise(col(s"c.$n")).as(n)): _*)
        }
      beforeCommit()
      try return commitImpl(spark, merged, table, "overwrite", None,
          maxAttempts = 1, requireBase = Some(base))
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped"))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.merge: $maxAttempts consecutive concurrent commits on $table")
  }

  /** Delete data dirs referenced by NO retained version (the newest
    * `retainVersions` stay readable; older log entries remain but their
    * exclusive files are reclaimed). Returns reclaimed dir count. */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int = 1): Int = {
    val versions = committedVersions(spark, table)
    if (versions.isEmpty) return 0
    val retained = versions.takeRight(math.max(1, retainVersions))
    val live = retained.flatMap(readEntry(spark, table, _).files)
      .map(_.split("/").take(2).mkString("/")).toSet // data/vN-salt-a dirs
    val dataRoot = new Path(table, "data")
    val f = fs(spark, dataRoot)
    if (!f.exists(dataRoot)) return 0
    val dead = f.listStatus(dataRoot)
      .filter(_.isDirectory)
      .filterNot(s => live.contains(s"data/${s.getPath.getName}"))
    dead.foreach(s => f.delete(s.getPath, true))
    dead.length
  }

  // ---- LakeFormat: overwrite-snapshot semantics, like ParquetLake, but
  // with the log providing atomicity + isolation. partitionBy is accepted
  // for interface parity; the log tracks files, so pruning at this layer
  // comes from parquet row-group stats rather than dir layout.
  def write(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    commit(df.sparkSession, df, path, "overwrite")
    ()
  }

  def read(spark: SparkSession, path: String): DataFrame =
    latestVersion(spark, path) match {
      case Some(v) => readVersion(spark, path, v)
      case None => spark.emptyDataFrame
    }
}
