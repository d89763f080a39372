package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Transaction-log lake format — the local protocol sketch of what the
  * reference gets from Delta Lake on GCS (ref
  * process_bronze_to_silver.py:146,151-155): versioned snapshots, atomic
  * commits, snapshot-isolated readers, time travel, optimistic concurrency,
  * row-level DML (MERGE INTO / UPDATE WHERE / DELETE WHERE, all
  * copy-on-write and stats-scoped), OPTIMIZE (whole, predicate-scoped,
  * and bin-packing), per-file column statistics with data-skipping scans,
  * per-file Bloom sidecars with key-set skipping ([[readKeyed]]), a
  * change feed at O(changes-per-commit) ([[tableChanges]]), and vacuum —
  * built on nothing but parquet, JSON log entries, and the
  * atomic-rename primitive `Storage.Compaction` already relies on.
  *
  * Layout:
  * {{{
  *   <table>/_txn_log/v<N>.json   one DELTA entry per committed version:
  *                                the files ADDED (with per-file column
  *                                min/max stats) and the files REMOVED by
  *                                commit N — Delta's add/remove actions
  *   <table>/_txn_log/v<N>.ckpt   periodic checkpoint: the fully-resolved
  *                                file list AS OF version N, so readers
  *                                replay latest-checkpoint + tail instead
  *                                of the whole log
  *   <table>/data/v<N>-<salt>/    immutable parquet written by commit N
  * }}}
  *
  * Protocol:
  *  - WRITE: data lands in a fresh immutable dir, then the log entry is
  *    published by writing `v<N>.json.tmp-<salt>` and atomically linking it
  *    to `v<N>.json`. Publish-if-absent is the commit point: it either
  *    fully happens or fully doesn't, so readers never observe a torn
  *    commit.
  *  - CONCURRENCY (optimistic): two writers racing to version N both
  *    prepare data dirs; only one publish wins. The loser re-reads the log
  *    and retries at N+1 — append retries preserve both writers' rows;
  *    overwrite retries preserve last-committer-wins, exactly Delta's
  *    semantics.
  *  - READERS resolve a version's file list ONCE (checkpoint + tail) and
  *    then scan only those files. Later commits add new dirs and log
  *    entries but never mutate old ones, so an in-flight reader keeps its
  *    snapshot (isolation) and any version can be re-read on demand (time
  *    travel) until `vacuum` reclaims it.
  *
  * Scale: entries carry add/remove DELTAS, so commit metadata is O(changed
  * files), not O(table files) — an append to a million-file 100 TB table
  * writes a few hundred bytes; checkpoints every [[CheckpointInterval]]
  * commits keep snapshot resolution at O(interval) entry reads. Per-file
  * min/max stats ride the add action (harvested from the parquet footers
  * the write already produced — metadata-only, no data re-scan) and feed
  * [[readWhere]]'s file pruning, the Delta data-skipping capability that
  * matters most at 100 TB: a selective predicate opens only the files
  * whose stats admit it.
  */
object TxnLake extends LakeFormat {

  /** Commits between checkpoints of the resolved file list. Readers replay
    * at most this many tail entries past the newest checkpoint. */
  private[sources] val CheckpointInterval = 10

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_txn_log")

  // ---- model ----------------------------------------------------------

  /** Per-file, per-column statistics. `tag` is the comparison domain:
    * "l" (integer family, incl. date days and timestamp micros), "d"
    * (floating), "s" (UTF-8 string; compared in unsigned byte order, the
    * order parquet writes binary stats in). min/max are None when the
    * footer carried no usable bounds (all-null file, INT96, truncated or
    * foreign-typed stats) — pruning is then conservative for that column. */
  final case class ColStats(tag: String, min: Option[String],
                            max: Option[String], nullCount: Long,
                            bloom: Boolean = false)

  /** One data file of a snapshot: table-relative path, row count, and the
    * column stats harvested from its footer at commit time. `rows` is -1
    * for files inherited from pre-stats (legacy full-list) log entries.
    * `brid` is the file's BASE ROW ID (Delta row tracking): fresh rows in
    * the file expose row id `brid + row_index`, a disjoint range the
    * commit reserved from the table's cumulative row-id high-water mark;
    * -1 on files added before row tracking (their rows have no ids). */
  final case class FileMeta(path: String, rows: Long,
                            stats: Map[String, ColStats],
                            brid: Long = -1L)

  private final case class Entry(version: Long, operation: String,
                                 add: Seq[FileMeta], remove: Seq[String],
                                 legacyFiles: Option[Seq[String]],
                                 txn: Option[(String, Long)],
                                 txns: Map[String, Long],
                                 hasTxns: Boolean,
                                 schemaJson: Option[String] = None,
                                 bloomCols: Seq[String] = Seq.empty,
                                 dvs: Map[String, DvRef] = Map.empty,
                                 droppedCols: Seq[String] = Seq.empty,
                                 constraints: Map[String, String] = Map.empty,
                                 genCols: Map[String, String] = Map.empty,
                                 ts: Option[Long] = None,
                                 identityCols: Map[String, IdentitySpec] =
                                   Map.empty,
                                 dvDelta: Boolean = false,
                                 ridHwm: Long = -1L,
                                 renames: Map[String, String] = Map.empty) {
    /** The logged cumulative schema, decoded — one accessor instead of
      * the same two-line parse at every read/DML site. */
    def schemaStruct: Option[StructType] =
      schemaJson.map(DataType.fromJson(_).asInstanceOf[StructType])
  }

  /** One live deletion vector: the sidecar's table-relative path and the
    * number of row positions it masks. Since r17 a commit entry carries
    * only the masks THAT commit minted (`dvd: true` — O(commit) entry
    * size, the r16 item-4 bound) and the live map reconstructs by
    * cadence-bounded replay ([[resolveDvs]]); full-map anchors are
    * legacy/restore/clone/empty/interval entries, keyed by data-file
    * path either way, and a rewrite that removes a file drops
    * its DV from the map automatically. */
  final case class DvRef(path: String, rows: Long)

  /** One IDENTITY column's table property — Delta's `GENERATED ALWAYS AS
    * IDENTITY (START WITH start INCREMENT BY step)`: `hwm` is the last
    * value handed out (start - step before any row mints), carried
    * CUMULATIVELY on every entry and advanced by each row-minting commit
    * from the freshly-harvested file stats (no extra scan). Values are
    * unique and step-directed monotone ACROSS commits but may have gaps
    * (Delta's own documented contract): parallel write tasks reserve
    * disjoint ranges via the partition-id spacing of
    * monotonically_increasing_id, and unconsumed reservations are never
    * reissued. */
  final case class IdentitySpec(start: Long, step: Long, hwm: Long)

  /** The row-id column [[readWithRowIds]] exposes and engine rewrites
    * materialize — Delta row tracking's `_metadata.row_id`. Reserved:
    * writers may not supply it. */
  val RidCol = "__graft_rid"

  // ---- column mapping (RENAME) ----------------------------------------
  //
  // Delta's column-mapping 'name' mode, reduced to its essence: the
  // LOGGED schema, per-file stats, bloom sidecars, and parquet bytes all
  // stay keyed by the column's PHYSICAL name (its name at creation —
  // stable forever), and a cumulative entry-carried `renames` map
  // (physical → display) overlays the user-visible names at the two
  // boundaries: scans rename physical → display after the read, commits
  // translate display → physical before the write. A RENAME is therefore
  // one metadata log entry that changes NO schema json, moves NO file,
  // invalidates NO sidecar or stat, and old versions time-travel under
  // the names of their own era.

  /** display name of physical `p` under `ren` (identity when unmapped). */
  private def displayOf(ren: Map[String, String], p: String): String =
    ren.getOrElse(p, p)

  /** physical name of display `d` under `ren` (identity when unmapped).
    * Resolved with the SESSION resolver, not string equality: the
    * refusal checks that guard renamed-column access already match
    * case-insensitively (under the default resolver), so a case-variant
    * display name ('VAL' for display 'val') must translate to the
    * physical name too — an exact-match lookup here would pass the
    * guards yet skip translation, landing files (and their footer
    * stats) under the variant name and silently breaking the
    * files-carry-physical-names invariant. */
  private def physicalOf(spark: SparkSession, ren: Map[String, String],
                         d: String): String = {
    val res = resolver(spark)
    ren.collectFirst { case (p, disp) if res(disp, d) => p }.getOrElse(d)
  }

  /** Single-part attribute references of a stored SQL expression — the
    * reference domain of constraint / generated-column properties. */
  private def attrRefs(spark: SparkSession, sql: String): Seq[String] =
    spark.sessionState.sqlParser.parseExpression(sql).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.head
    }

  /** `sql` with EVERY attribute matching `from` (session resolution)
    * rewritten to `to` — parse, substitute, regenerate. This is how a
    * RENAME follows the references into stored CHECK-constraint and
    * generated-column expressions instead of refusing: the stored text
    * stays in the DISPLAY domain the user declared it in, so DESCRIBE
    * and error messages keep speaking current names. */
  private def substituteAttr(spark: SparkSession, sql: String,
                             from: String, to: String): String = {
    val res = resolver(spark)
    spark.sessionState.sqlParser.parseExpression(sql).transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.size == 1 && res(a.nameParts.head, from) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(to))
    }.sql
  }

  /** A stored (display-named) expression as a Column over a PHYSICAL
    * frame: attributes translate display → physical through `ren`, so
    * the enforcement scan — which reads the just-written files under
    * their immutable physical names — binds a renamed reference to the
    * right bytes. Identity when nothing is renamed. */
  private def exprUnder(spark: SparkSession, sql: String,
                        ren: Map[String, String])
      : org.apache.spark.sql.Column = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    if (ren.isEmpty)
      org.apache.spark.sql.graftx.ColumnBridge.column(parsed)
    else
      org.apache.spark.sql.graftx.ColumnBridge.column(parsed.transform {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts.size == 1 =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            Seq(physicalOf(spark, ren, a.nameParts.head)))
      })
  }

  /** `st` with its field names displayed through `ren`. */
  private def toDisplaySchema(st: StructType,
                              ren: Map[String, String]): StructType =
    if (ren.isEmpty) st
    else StructType(st.fields.map(f => f.copy(name = displayOf(ren, f.name))))

  /** `df` (physical names) exposed under display names. */
  private def toDisplay(df: DataFrame, ren: Map[String, String]): DataFrame =
    if (ren.isEmpty) df
    else ren.foldLeft(df) { case (d, (p, disp)) =>
      if (d.columns.contains(p)) d.withColumnRenamed(p, disp) else d }

  /** `fm` with its stats keys displayed through `ren` — the predicate
    * matcher sees display names, the stored stats stay physical. */
  private[sources] def displayMeta(ren: Map[String, String])(fm: FileMeta): FileMeta =
    if (ren.isEmpty) fm
    else fm.copy(stats = fm.stats.map { case (k, v) =>
      displayOf(ren, k) -> v })

  /** The cumulative rename map live at `version` (empty pre-feature). */
  private def renamesAt(spark: SparkSession, table: String,
                        version: Long): Map[String, String] =
    readEntry(spark, table, version).renames

  // ---- JSON (jackson tree API — ships with Spark; no extra deps) ------

  private val mapper = new ObjectMapper()

  private def statsToJson(o: ObjectNode, fm: FileMeta): Unit = {
    o.put("path", fm.path)
    o.put("rows", fm.rows)
    if (fm.brid >= 0L) o.put("brid", fm.brid)
    statsObj(o.putObject("stats"), fm.stats)
  }

  private def statsObj(st: ObjectNode, stats: Map[String, ColStats]): Unit =
    stats.toSeq.sortBy(_._1).foreach { case (cn, cs) =>
      val c = st.putObject(cn)
      c.put("t", cs.tag)
      cs.min.foreach(c.put("mn", _))
      cs.max.foreach(c.put("mx", _))
      c.put("nc", cs.nullCount)
      if (cs.bloom) c.put("bl", true)
    }

  /** Parse the checkpoint's per-file stats JSON — the executor-side
    * entry point [[SnapshotPrune]]'s distributed matcher uses (the
    * driver path parses the same JSON through [[fileFromJson]]). */
  private[sources] def parseStatsJson(s: String): Map[String, ColStats] =
    statsFromJson(mapper.readTree(s))

  /** Render a file's stats to the checkpoint/entry JSON form — the
    * distributed snapshot union re-encodes tail-entry adds with it. */
  private def statsJsonOf(fm: FileMeta): String = {
    val st = mapper.createObjectNode()
    statsObj(st, fm.stats)
    mapper.writeValueAsString(st)
  }

  private def statsFromJson(st: JsonNode): Map[String, ColStats] =
    st.properties().asScala.map { e =>
      val c = e.getValue
      e.getKey -> ColStats(c.get("t").asText(),
        Option(c.get("mn")).map(_.asText()),
        Option(c.get("mx")).map(_.asText()),
        Option(c.get("nc")).map(_.asLong()).getOrElse(-1L),
        Option(c.get("bl")).exists(_.asBoolean()))
    }.toMap

  private def fileFromJson(n: JsonNode): FileMeta = {
    val stats = Option(n.get("stats")).map(statsFromJson).getOrElse(Map.empty)
    FileMeta(n.get("path").asText(),
      Option(n.get("rows")).map(_.asLong()).getOrElse(-1L), stats,
      Option(n.get("brid")).map(_.asLong()).getOrElse(-1L))
  }

  private def render(e: Entry): String = {
    val o = mapper.createObjectNode()
    o.put("version", e.version)
    o.put("operation", e.operation)
    // IN-COMMIT timestamp (Delta's inCommitTimestamp): the instant the
    // entry was RENDERED rides inside the entry bytes, so commit
    // instants survive object-store migrations/copies that rewrite
    // file mtimes. Readers prefer it; pre-feature entries fall back to
    // the mtime.
    e.ts.foreach(o.put("ts", _))
    val add = o.putArray("add")
    e.add.foreach(fm => statsToJson(add.addObject(), fm))
    val rm = o.putArray("remove")
    e.remove.foreach(rm.add)
    e.txn.foreach { case (a, b) => o.put("txnApp", a); o.put("txnBatch", b) }
    // ALWAYS render the txns map, even empty: its presence is the format
    // marker that distinguishes a new-format entry from a legacy one, so
    // the one-time legacy fold in commitImpl runs exactly once — an
    // omitted-when-empty field would re-trigger the O(log) fold on every
    // commit of a table that never uses commitOnce
    val txns = o.putObject("txns")
    e.txns.toSeq.sorted.foreach { case (a, b) => txns.put(a, b) }
    e.schemaJson.foreach(o.put("schema", _))
    if (e.bloomCols.nonEmpty) {
      val bc = o.putArray("bloomCols")
      e.bloomCols.foreach(bc.add)
    }
    if (e.dvs.nonEmpty) {
      val dv = o.putObject("dvs")
      e.dvs.toSeq.sortBy(_._1).foreach { case (file, r) =>
        val d = dv.putObject(file)
        d.put("p", r.path)
        d.put("n", r.rows)
      }
    }
    if (e.droppedCols.nonEmpty) {
      val dc = o.putArray("droppedCols")
      e.droppedCols.foreach(dc.add)
    }
    if (e.constraints.nonEmpty) {
      val ct = o.putObject("constraints")
      e.constraints.toSeq.sortBy(_._1).foreach { case (n, x) => ct.put(n, x) }
    }
    if (e.genCols.nonEmpty) {
      val gc = o.putObject("genCols")
      e.genCols.toSeq.sortBy(_._1).foreach { case (n, x) => gc.put(n, x) }
    }
    if (e.identityCols.nonEmpty) {
      val ic = o.putObject("identityCols")
      e.identityCols.toSeq.sortBy(_._1).foreach { case (n, sp) =>
        val x = ic.putObject(n)
        x.put("s", sp.start); x.put("k", sp.step); x.put("h", sp.hwm)
      }
    }
    if (e.dvDelta) o.put("dvd", true)
    if (e.ridHwm >= 0L) o.put("rhw", e.ridHwm)
    if (e.renames.nonEmpty) {
      val rn = o.putObject("renames")
      e.renames.toSeq.sortBy(_._1).foreach { case (p, d) => rn.put(p, d) }
    }
    mapper.writeValueAsString(o)
  }

  private def parse(s: String): Entry = {
    val n = mapper.readTree(s)
    val version = Option(n.get("version")).map(_.asLong())
      .getOrElse(sys.error(s"TxnLake: malformed log entry: $s"))
    val operation = Option(n.get("operation")).map(_.asText()).getOrElse("unknown")
    val add = Option(n.get("add")).map(_.asScala.map(fileFromJson).toSeq)
      .getOrElse(Seq.empty)
    val remove = Option(n.get("remove")).map(_.asScala.map(_.asText()).toSeq)
      .getOrElse(Seq.empty)
    // entries written before the delta encoding carry the FULL snapshot
    // file list under "files"
    val legacy = Option(n.get("files")).map(_.asScala.map(_.asText()).toSeq)
    val txn = for {
      a <- Option(n.get("txnApp")).map(_.asText())
      b <- Option(n.get("txnBatch")).map(_.asLong())
    } yield (a, b)
    val txnsNode = Option(n.get("txns"))
    val txns = txnsNode.map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap).getOrElse(Map.empty)
    val schemaJson = Option(n.get("schema")).map(_.asText())
    val bloomCols = Option(n.get("bloomCols"))
      .map(_.asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val dvs = Option(n.get("dvs")).map(_.properties().asScala.map { e =>
      e.getKey -> DvRef(e.getValue.get("p").asText(),
        e.getValue.get("n").asLong())
    }.toMap).getOrElse(Map.empty[String, DvRef])
    val droppedCols = Option(n.get("droppedCols"))
      .map(_.asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val constraints = Option(n.get("constraints"))
      .map(_.properties().asScala.map(e =>
        e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[String, String])
    val genCols = Option(n.get("genCols"))
      .map(_.properties().asScala.map(e =>
        e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[String, String])
    val ts = Option(n.get("ts")).map(_.asLong())
    val identityCols = Option(n.get("identityCols"))
      .map(_.properties().asScala.map { e =>
        e.getKey -> IdentitySpec(e.getValue.get("s").asLong(),
          e.getValue.get("k").asLong(), e.getValue.get("h").asLong())
      }.toMap).getOrElse(Map.empty[String, IdentitySpec])
    val dvDelta = Option(n.get("dvd")).exists(_.asBoolean())
    val ridHwm = Option(n.get("rhw")).map(_.asLong()).getOrElse(-1L)
    val renames = Option(n.get("renames"))
      .map(_.properties().asScala.map(e =>
        e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[String, String])
    Entry(version, operation, add, remove, legacy, txn, txns, txnsNode.isDefined,
      schemaJson, bloomCols, dvs, droppedCols, constraints, genCols, ts,
      identityCols, dvDelta, ridHwm, renames)
  }

  // ---- log access -----------------------------------------------------

  private def committedVersions(spark: SparkSession, table: String): Seq[Long] = {
    val ld = logDir(table)
    val f = fs(spark, ld)
    if (!f.exists(ld)) Seq.empty
    else f.listStatus(ld).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted.toSeq
  }

  /** Test seam: log-entry reads since the last reset — lets specs pin
    * the I/O CLASS of a lifecycle (e.g. a DML attempt resolves its DV
    * map once, not once per touched file) without timing flakiness.
    * AtomicLong, not a volatile var: concurrent sessions share this
    * object, and a lost increment would make the very counter that
    * exists to avoid flaky assertions flaky itself. */
  private[sources] val logEntryReads =
    new java.util.concurrent.atomic.AtomicLong

  /** Bounded LRU over parsed log entries, keyed by path and VALIDATED
    * against the file's (modification time, length) on every hit — a
    * published entry is immutable (publish-if-absent, never rewritten),
    * but a table DIRECTORY can be wiped and re-founded at the same
    * path (tests, scratch reuse), and the status check is what keeps a
    * recreated v0 from serving its predecessor's metadata (staleness
    * would need the NEW file's mtime to equal the CACHED one — i.e. a
    * wipe-and-refound landing in the same clock millisecond as the
    * original founding — AND an identical byte length; a re-found
    * made any later than that always misses and re-reads). Chatty
    * metadata getters (tableConstraints / columnRenames / resolveDvs /
    * the per-read latest-entry resolution) drop from read+parse per
    * call to one stat RPC; [[logEntryReads]] counts PHYSICAL reads, so
    * the seam shows the memo's effect directly. 256 entries ≈ a few MB
    * ceiling: checkpoint-tail entries dominate re-reads, and eviction
    * only re-pays one read. */
  private val entryCache =
    new java.util.LinkedHashMap[String, (Long, Long, Entry)](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, Entry)]): Boolean =
        size() > 256
    }

  private def readEntry(spark: SparkSession, table: String, v: Long): Entry = {
    val p = new Path(logDir(table), s"v$v.json")
    val f = fs(spark, p)
    val st = f.getFileStatus(p)
    val key = p.toString
    entryCache.synchronized {
      val hit = entryCache.get(key)
      if (hit != null && hit._1 == st.getModificationTime
          && hit._2 == st.getLen)
        return hit._3
    }
    logEntryReads.incrementAndGet()
    val in = f.open(p)
    val e = try parse(new String(in.readAllBytes(), "UTF-8"))
      finally in.close()
    entryCache.synchronized {
      entryCache.put(key, (st.getModificationTime, st.getLen, e))
    }
    e
  }

  private def checkpointVersions(spark: SparkSession, table: String): Seq[Long] = {
    val ld = logDir(table)
    val f = fs(spark, ld)
    if (!f.exists(ld)) Seq.empty
    else f.listStatus(ld).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".ckpt") =>
        n.stripPrefix("v").stripSuffix(".ckpt").toLong }
      .sorted.toSeq
  }

  /** Checkpoints are PARQUET since round 8 — a JSON full file list is a
    * multi-hundred-MB driver parse at millions of files; a columnar
    * checkpoint compresses the (highly repetitive) path column and is the
    * format Delta uses for exactly this reason. One row per live file:
    * (path UTF8, rows INT64, stats UTF8-JSON). Legacy JSON checkpoints are
    * detected by the absent PAR1 magic and still resolve. */
  private val ckptSchema = org.apache.parquet.schema.MessageTypeParser
    .parseMessageType(
      """message graft_ckpt {
        |  required binary path (UTF8);
        |  required int64 rows;
        |  required binary stats (UTF8);
        |  optional int64 brid;
        |}""".stripMargin)

  private def readCheckpoint(spark: SparkSession, table: String,
                             v: Long): Seq[FileMeta] = {
    val p = new Path(logDir(table), s"v$v.ckpt")
    val f = fs(spark, p)
    val magic = {
      val in = f.open(p)
      try { val b = new Array[Byte](4); in.readFully(0, b); b }
      finally in.close()
    }
    if (java.util.Arrays.equals(magic, "PAR1".getBytes("US-ASCII"))) {
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), p)
        .withConf(spark.sparkContext.hadoopConfiguration)
        .build()
      try {
        val buf = Seq.newBuilder[FileMeta]
        var g = reader.read()
        while (g != null) {
          // pre-row-tracking checkpoints lack the brid field entirely;
          // post-r18 ones null it for untracked files — both read -1
          val brid =
            if (g.getType.containsField("brid")
              && g.getFieldRepetitionCount("brid") > 0)
              g.getLong("brid", 0)
            else -1L
          buf += FileMeta(g.getString("path", 0), g.getLong("rows", 0),
            statsFromJson(mapper.readTree(g.getString("stats", 0))), brid)
          g = reader.read()
        }
        buf.result()
      } finally reader.close()
    } else {
      val in = f.open(p)
      val n = try mapper.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      n.get("files").asScala.map(fileFromJson).toSeq
    }
  }

  /** Resolve the file list AS OF `version`: newest checkpoint at or below
    * it, then the tail entries' add/remove deltas — O(CheckpointInterval)
    * entry reads regardless of log length. Legacy full-list entries reset
    * the state (they ARE a snapshot). */
  private def resolveFiles(spark: SparkSession, table: String,
                           version: Long): Seq[FileMeta] = {
    val ckpt = checkpointVersions(spark, table).filter(_ <= version).lastOption
    var state: Seq[FileMeta] =
      ckpt.map(readCheckpoint(spark, table, _)).getOrElse(Seq.empty)
    var v = ckpt.map(_ + 1).getOrElse(0L)
    while (v <= version) {
      val e = readEntry(spark, table, v)
      state = e.legacyFiles match {
        case Some(files) => files.map(FileMeta(_, -1L, Map.empty))
        case None =>
          val rm = e.remove.toSet
          state.filterNot(fm => rm(fm.path)) ++ e.add
      }
      v += 1
    }
    state
  }

  // ---- ABOVE-CAP snapshot resolution (distributed file-list prune) ----

  /** Above this many live files, [[readWherePruned]] decides its kept
    * set as a DISTRIBUTED plan over the parquet checkpoint instead of
    * materializing the whole file list on the driver — the last
    * O(snapshot files) driver structure (Delta reads its checkpoint as
    * a table for the same reason). Below the cap the driver path is
    * kept: at sandbox file counts it is strictly faster (no job launch,
    * no executor round-trip). Override with
    * `graft.snapshot.distributedPruneCap`. */
  private[sources] val DefaultDistributedPruneCap = 100000

  private def distributedPruneCap(spark: SparkSession): Int =
    spark.conf.getOption("graft.snapshot.distributedPruneCap")
      .map(_.toInt).getOrElse(DefaultDistributedPruneCap)

  /** Observability seam: did the most recent [[readWherePruned]] decide
    * its kept set on the executors (above-cap checkpoint plan) or the
    * driver (below-cap resolved list)? The file-count SCALE sweep and
    * the x69 gate read it. */
  @volatile private[graft] var lastPruneDistributed: Boolean = false

  /** The snapshot AS A DATAFRAME — (path, rows, stats-JSON, brid), one
    * row per live file — plus its EXACT live-file count, computed
    * without ever materializing the file list on the driver: the parquet
    * checkpoint is read as a table (executor-resident), the tail
    * entries' removes anti-join it (broadcast — a tail is at most
    * [[CheckpointInterval]] entries, already driver-parsed in every
    * path), and the tail adds union in as a local relation. The count
    * is footer metadata + tail arithmetic, no job.
    *
    * None when the regime doesn't apply — no parquet checkpoint at or
    * below `version` (tiny log), a legacy JSON checkpoint, a legacy
    * full-list entry in the tail (pre-delta log surgery), or a
    * checkpoint row count at or below `cap` (the regime probe is this
    * one footer read — the count deliberately ignores the tail's
    * deltas: both regimes compute identical kept sets, so a tail that
    * momentarily crosses the cap simply waits for its next
    * checkpoint) — and the caller falls back to the driver path. */
  private def snapshotAsDf(spark: SparkSession, table: String,
                           version: Long, cap: Int)
      : Option[(DataFrame, Long)] = {
    val ckptV = checkpointVersions(spark, table).filter(_ <= version)
      .lastOption.getOrElse(return None)
    val ckptPath = new Path(logDir(table), s"v$ckptV.ckpt")
    val conf = spark.sparkContext.hadoopConfiguration
    val ckptRows =
      try {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(ckptPath, conf))
        try r.getRecordCount finally r.close()
      } catch { case _: Exception => return None } // legacy JSON checkpoint
    if (ckptRows <= cap) return None
    // tail deltas, driver-parsed with the SAME replay rule as
    // [[resolveFiles]] (remove-then-add per version; an add removed by
    // a later version dies in the buffer) — the tail is
    // O(CheckpointInterval) entries, never O(snapshot). The two
    // replayers are guarded against drift by the parity gates
    // (TxnLakeDistributedPruneSpec + x69 compare regimes end to end).
    val addBuf = scala.collection.mutable.LinkedHashMap.empty[String, FileMeta]
    val removedCkpt = scala.collection.mutable.Set.empty[String]
    var v = ckptV + 1
    while (v <= version) {
      val e = readEntry(spark, table, v)
      if (e.legacyFiles.isDefined) return None
      e.remove.foreach { p =>
        if (addBuf.remove(p).isEmpty) removedCkpt += p
      }
      e.add.foreach(fm => addBuf.put(fm.path, fm))
      v += 1
    }
    val total = ckptRows - removedCkpt.size + addBuf.size
    import spark.implicits._
    val ckptSchemaDf = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("stats", StringType, nullable = false),
      StructField("brid", LongType, nullable = true)))
    val base = spark.read.schema(ckptSchemaDf).parquet(ckptPath.toString)
    val minusRemoved =
      if (removedCkpt.isEmpty) base
      else base.join(
        org.apache.spark.sql.functions.broadcast(
          removedCkpt.toSeq.toDF("path")),
        Seq("path"), "left_anti")
    val withAdds =
      if (addBuf.isEmpty) minusRemoved
      else {
        val rows = addBuf.values.map(fm => org.apache.spark.sql.Row(
          fm.path, fm.rows, statsJsonOf(fm),
          if (fm.brid >= 0L) java.lang.Long.valueOf(fm.brid) else null))
        minusRemoved.unionByName(spark.createDataFrame(
          rows.toSeq.asJava, ckptSchemaDf))
      }
    Some((withAdds, total))
  }

  /** The above-cap branch of [[readWherePruned]]: the stats matcher runs
    * ON THE EXECUTORS over the snapshot-as-DataFrame and only the
    * surviving paths return to the driver. Liveness mirrors the driver
    * path's LATEST-version contract at the same O(commit dirs) cost —
    * every commit dir of the snapshot must exist (the dir set derives
    * distributedly, then probes on the driver) — and the SURVIVORS
    * additionally check file-granular through [[requireLive]]. A
    * file-granular vacuum of a non-survivor inside a live dir is the
    * one case the driver's time-travel check catches and this one
    * defers to scan time — the file was never going to be read. */
  private def readWhereDistributed(spark: SparkSession, table: String,
                                   v: Long, predicate: Column,
                                   fdf: DataFrame, total: Long)
      : (DataFrame, (Int, Int)) = {
    import spark.implicits._
    // a tail that removed EVERY checkpoint file (scorched-earth CoW
    // delete) leaves an above-cap checkpoint over an empty snapshot:
    // answer like the driver path's empty case instead of sampling a
    // file that does not exist
    if (total <= 0L) {
      lastPruneDistributed = true
      return (spark.emptyDataFrame, (0, 0))
    }
    val entry = readEntry(spark, table, v)
    val schema = entry.schemaStruct
    val ren = entry.renames
    val dirs = fdf
      .select(org.apache.spark.sql.functions
        .substring_index(org.apache.spark.sql.functions.col("path"), "/", 2)
        .as("d"))
      .distinct().as[String].collect()
    locally {
      val f = fs(spark, new Path(table))
      dirs.find(dr => !f.exists(new Path(table, dr))).foreach { dr =>
        throw new IllegalStateException(
          s"TxnLake: version $v of $table has been vacuumed " +
            s"($dr reclaimed); only versions within the retention " +
            "window at the last vacuum remain readable")
      }
    }
    val sampleAbs = new Path(table,
      fdf.select("path").as[String].head()).toString
    val pred = resolvedPredicate(spark, sampleAbs, predicate,
      schema.map(toDisplaySchema(_, ren)))
    val keptPaths = fdf.filter(SnapshotPrune.keepRow(pred, ren))
      .select("path").as[String].collect().toSeq
    val kept = keptPaths.map(FileMeta(_, -1L, Map.empty))
    requireLive(spark, table, v, kept)
    lastPruneDistributed = true
    val df =
      if (kept.isEmpty)
        toDisplay(schema match {
          case Some(st) => spark.read.schema(st).parquet(sampleAbs)
          case None => spark.read.parquet(sampleAbs)
        }, ren).where(lit(false))
      else scanFiles(spark, table, kept, schema,
          resolveDvs(spark, table, v), ren)
        .where(predicate)
    (df, (kept.size, total.toInt))
  }

  /** The resolved data files (with their commit-time column stats) of a
    * snapshot — the observability hook specs and data-skipping gates
    * assert on. Defaults to the latest version. */
  def snapshotFiles(spark: SparkSession, table: String,
                    version: Option[Long] = None): Seq[FileMeta] =
    version.orElse(latestVersion(spark, table))
      .map(resolveFiles(spark, table, _)).getOrElse(Seq.empty)

  /** Latest committed version, if any commit exists. */
  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    committedVersions(spark, table).lastOption

  /** One commit's public metadata — Delta's DESCRIBE HISTORY row:
    * operation tag, the idempotence txn the commit carried (if any), and
    * whether the operation is DATA-PRESERVING ("optimize" — layout
    * rewrites: Z-order, bin-packing compaction — changes files, never the
    * row multiset; the log's own contract). This is the classification
    * the version-coverage index trust walks (x40). */
  final case class CommitInfo(version: Long, operation: String,
                              txn: Option[(String, Long)]) {
    def dataPreserving: Boolean = operation == "optimize"
  }

  /** Metadata of one committed version — a single O(1) entry read. */
  def commitInfo(spark: SparkSession, table: String, version: Long): CommitInfo = {
    val e = readEntry(spark, table, version)
    CommitInfo(e.version, e.operation, e.txn)
  }

  /** One commit's (operation tag, added-file paths) — the rate-limit
    * planner's input: a feed consumer slicing an oversized insert hop
    * needs the hop's file list without resolving the whole snapshot.
    * O(1): a single entry read. */
  private[graft] def commitAdds(spark: SparkSession, table: String,
                                version: Long): (String, Seq[String]) = {
    val e = readEntry(spark, table, version)
    (e.operation, e.add.map(_.path))
  }

  /** Read a SLICE of a snapshot — only `paths`, under the version's
    * masks, logged schema, and display names, exactly as [[readVersion]]
    * would read them within the whole. The bounded-memory catch-up
    * primitive: a consumer splits an oversized insert hop into
    * maxFiles-sized slices and unions of slice reads equal the full
    * read (per-file masks and schema application are file-local). */
  private[graft] def readFileSlice(spark: SparkSession, table: String,
                                   version: Long,
                                   paths: Seq[String]): DataFrame = {
    val entry = readEntry(spark, table, version)
    val schema = entry.schemaStruct
    val want = paths.toSet
    val files = resolveFiles(spark, table, version)
      .filter(fm => want(fm.path))
    require(files.size == want.size,
      s"TxnLake.readFileSlice: ${want.size - files.size} of the " +
        s"requested files are not in version $version of $table")
    scanFiles(spark, table, files, schema,
      resolveDvs(spark, table, version), entry.renames)
  }

  /** The full commit history, oldest first — DESCRIBE HISTORY. O(log)
    * entry reads; incremental consumers should walk
    * [[commitInfo]] from their own persisted watermark instead. */
  def history(spark: SparkSession, table: String): Seq[CommitInfo] =
    committedVersions(spark, table).map(commitInfo(spark, table, _))

  /** Commit instant of `version` in epoch millis. New-format entries
    * carry an IN-COMMIT timestamp inside the entry bytes (Delta's
    * inCommitTimestamp) — robust against object-store migrations and
    * copies that rewrite file mtimes; entries written before the field
    * existed fall back to the log file's modification time (Delta's
    * original source of truth). Either way the entry publish IS the
    * commit, so there is no second clock to drift. */
  def commitTimestamp(spark: SparkSession, table: String,
                      version: Long): Long =
    readEntry(spark, table, version).ts.getOrElse {
      val p = new Path(logDir(table), s"v$version.json")
      fs(spark, p).getFileStatus(p).getModificationTime
    }

  /** The version a timestamp resolves to — Delta's `TIMESTAMP AS OF`:
    * the LATEST version whose (monotone-adjusted) commit timestamp is
    * <= `ts` millis; None when `ts` predates the first commit. Like
    * Delta, raw mtimes are adjusted monotone (`max(mtime, prev+1)`) so
    * a wall clock stepping backwards between commits cannot make
    * resolution ambiguous — version order always wins. O(versions)
    * driver metadata reads, the same cost Delta pays. */
  def versionAsOf(spark: SparkSession, table: String, ts: Long): Option[Long] = {
    var prev = Long.MinValue
    committedVersions(spark, table).iterator.map { v =>
      val t = math.max(commitTimestamp(spark, table, v),
        if (prev == Long.MinValue) Long.MinValue else prev + 1)
      prev = t
      (v, t)
    }.takeWhile(_._2 <= ts).map(_._1).reduceOption((_, b) => b)
  }

  /** Snapshot read as of a timestamp — `SELECT ... TIMESTAMP AS OF`.
    * Refuses (loudly, naming the earliest readable instant) a timestamp
    * before the first commit, exactly Delta's contract. */
  def readAsOf(spark: SparkSession, table: String, ts: Long): DataFrame =
    versionAsOf(spark, table, ts) match {
      case Some(v) => readVersion(spark, table, v)
      case None =>
        val first = committedVersions(spark, table).headOption
          .map(commitTimestamp(spark, table, _))
        throw new IllegalArgumentException(
          s"TxnLake.readAsOf: timestamp $ts predates the first commit of " +
            s"$table${first.map(t => s" (earliest readable: $t)").getOrElse("")}")
    }

  /** Whether every data file and DV sidecar ANY log entry references
    * still exists on disk — i.e. whether the full history (v0..latest)
    * is replayable hop by hop. A vacuumed table answers false FAST: the
    * earliest reclaimed file short-circuits the probe. O(files ever
    * referenced) driver metadata calls — meant for ONE-TIME decisions
    * (founding a replica, [[graft.streaming.TxnReplicaFeed]]), never
    * per-read checks. */
  def fullHistoryLive(spark: SparkSession, table: String): Boolean = {
    val f = fs(spark, new Path(table))
    val seen = scala.collection.mutable.Set.empty[String]
    committedVersions(spark, table).forall { v =>
      val e = readEntry(spark, table, v)
      val paths = e.add.map(_.path) ++ e.remove ++
        e.legacyFiles.getOrElse(Seq.empty) ++ e.dvs.values.map(_.path)
      paths.forall(p => !seen.add(p) || f.exists(new Path(table, p)))
    }
  }

  // ---- footer stats harvesting ----------------------------------------

  private def tagOf(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => Some("l")
    case TimestampType | TimestampNTZType => Some("l") // INT64 micros
    case FloatType | DoubleType => Some("d")
    case StringType => Some("s")
    case _ => None
  }

  /** Harvest per-column min/max/nullCount from one just-written parquet
    * file's FOOTER — metadata-only, the stats are a byproduct of the write
    * (Delta collects them in the write transaction the same way; see
    * [[harvestAll]] for the distributed form). Unsupported physical
    * encodings (INT96 timestamps, nested paths) simply yield no bounds →
    * pruning stays conservative. */
  private def harvestMeta(conf: Configuration, file: Path, rel: String,
                          schema: StructType): FileMeta = {
    val tags = schema.fields.flatMap(f => tagOf(f.dataType).map(f.name -> _)).toMap
    val tsCols = schema.fields.collect {
      case f if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        f.name
    }.toSet
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // per column: fold chunk stats across row groups; any unusable chunk
      // invalidates that column's bounds (None → conservative keep)
      var acc = Map.empty[String, ColStats]
      var bad = Set.empty[String]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        tags.get(name).filterNot(bad) match {
          case None => ()
          case Some(tag) =>
            // timestamp bounds are recorded in the file's PHYSICAL unit;
            // prune-time literals are catalyst micros. Only trust bounds
            // whose annotation says INT64 micros — a session writing
            // TIMESTAMP_MILLIS would otherwise make readWhere skip files
            // that contain matching rows (silent row loss)
            val unitOk = !tsCols(name) ||
              (c.getPrimitiveType.getLogicalTypeAnnotation match {
                case ts: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                  ts.getUnit ==
                    org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS
                case _ => false
              })
            val st = if (unitOk) c.getStatistics else null
            val usable = st != null && st.isNumNullsSet &&
              (st.hasNonNullValue || st.getNumNulls == b.getRowCount)
            if (!usable) { bad += name; acc -= name }
            else {
              val nn = st.getNumNulls
              val mm: Option[(String, String)] =
                if (!st.hasNonNullValue) None
                else try {
                  (tag, st.genericGetMin, st.genericGetMax) match {
                    case ("l", mn: java.lang.Number, mx: java.lang.Number) =>
                      Some((mn.longValue.toString, mx.longValue.toString))
                    case ("d", mn: java.lang.Number, mx: java.lang.Number) =>
                      Some((mn.doubleValue.toString, mx.doubleValue.toString))
                    case ("s", mn: org.apache.parquet.io.api.Binary,
                          mx: org.apache.parquet.io.api.Binary) =>
                      Some((mn.toStringUsingUTF8, mx.toStringUsingUTF8))
                    case _ => bad += name; None
                  }
                } catch { case _: Exception => bad += name; None }
              if (!bad(name)) {
                val prev = acc.get(name)
                val merged = prev match {
                  case None => ColStats(tag, mm.map(_._1), mm.map(_._2), nn)
                  case Some(p) =>
                    def lo(a: Option[String], b: Option[String]) = (a, b) match {
                      case (Some(x), Some(y)) =>
                        Some(if (cmpStat(tag, x, y) <= 0) x else y)
                      case _ => a.orElse(b)
                    }
                    def hi(a: Option[String], b: Option[String]) = (a, b) match {
                      case (Some(x), Some(y)) =>
                        Some(if (cmpStat(tag, x, y) >= 0) x else y)
                      case _ => a.orElse(b)
                    }
                    ColStats(tag, lo(p.min, mm.map(_._1)),
                      hi(p.max, mm.map(_._2)), p.nullCount + nn)
                }
                acc += name -> merged
              }
            }
        }
      }
      FileMeta(rel, rows, acc)
    } finally reader.close()
  }

  /** Java-serializable Hadoop Configuration carrier for shipping the
    * session's FS settings into the harvest job's closures. */
  private final class SerConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** Files at or below this count harvest inline on the driver (a Spark
    * job costs more than a handful of footer reads — the append hot path);
    * above it the footer reads run as a distributed job, so an overwrite /
    * optimize that rewrites a large table never serializes O(files) driver
    * I/O through the commit path. */
  private[sources] val DriverHarvestMax = 4

  /** Observability seam for specs: whether the most recent harvest ran as
    * a distributed job (true) or the driver inline loop (false). */
  @volatile private[sources] var lastHarvestDistributed: Boolean = false

  /** Observability seam: parallelism of the last deep-clone copy job
    * (0 = no deep clone ran) — gates that the copy is distributed, not
    * a serial driver loop. */
  @volatile private[sources] var lastCloneCopySlices: Int = 0

  /** Harvest footer stats for every committed file. Small commits loop on
    * the driver; larger ones fan the footer reads out as one Spark job —
    * per-file work is independent, so this is the executor-side stats
    * collection Delta performs inside the write transaction, recovered
    * here from the footers the write already produced. */
  private def harvestAll(spark: SparkSession, files: Seq[(String, String)],
                         schema: StructType): Seq[FileMeta] = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (files.size <= DriverHarvestMax) {
      lastHarvestDistributed = false
      files.map { case (abs, rel) => harvestMeta(conf, new Path(abs), rel, schema) }
    } else {
      lastHarvestDistributed = true
      val ser = new SerConf(conf)
      val slices = math.min(files.size,
        math.max(1, spark.sparkContext.defaultParallelism))
      graft.plans.JobLabel.labeled(spark, s"txn:harvest ${files.size} files") {
        spark.sparkContext.parallelize(files, slices)
          .map { case (abs, rel) => harvestMeta(ser.value, new Path(abs), rel, schema) }
          .collect().toSeq.sortBy(_.path)
      }
    }
  }

  /** Compare two rendered stat values within a tag's domain. Strings use
    * unsigned UTF-8 byte order — the order parquet's binary stats are
    * written in (java String.compareTo diverges above the BMP). */
  private def cmpStat(tag: String, a: String, b: String): Int = tag match {
    case "l" => java.lang.Long.compare(a.toLong, b.toLong)
    case "d" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _ =>
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      while (i < x.length && i < y.length) {
        val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(x.length, y.length)
  }

  // ---- per-file bloom sidecars (point-lookup skipping) -----------------

  /** Count of post-write data scans the last commit performed over its
    * freshly-written files — the "one read of fresh bytes per commit"
    * seam the fold below is gated by (0 = neither blooms nor checks were
    * needed; never 2 since r17: the sidecar build and the constraint
    * scan share ONE pass). */
  @volatile private[sources] var lastPostWriteScans: Int = 0

  /** The ONE post-write pass over a commit's freshly-written files:
    * builds the per-file [[BloomIndex]] sidecar bits AND evaluates every
    * CHECK-constraint / generated-column verdict in the SAME distributed
    * scan — the fresh bytes are read once per commit, not once per
    * concern (the r15 A/B pinned ~10 % of like-for-like ingest cost on
    * the sidecar re-read alone, and r16's constraint enforcement added a
    * second read on constrained tables; the r16 verdict asked for the
    * fold). Delta-sized — the cost Delta pays inside the write
    * transaction; min/max stats are free from footers, membership bits
    * and verdicts are not.
    *
    * Reads under the MERGED table schema (`readSchema`): constraint
    * expressions may reference columns this delta omits (null-fill — SQL
    * CHECK passes NULL verdicts), and the bloom value rendering is
    * unchanged because every accepted type promotion is render-stable
    * (the double hazard is refused at [[widenColumnType]]). Returns the
    * stats-flagged FileMetas plus per-check violation counts; violations
    * are counted BEFORE any sidecar is written, so a refused commit
    * leaves nothing beside the data dir its caller deletes. A file with
    * no rows (or all-null values) gets an all-zero bloom — "definitely
    * absent" for every key, which is exactly right. Sidecars land in the
    * immutable data dir BEFORE the log entry publishes, so a reader can
    * never see a flagged file without its sidecar. */
  private def postWritePass(spark: SparkSession, tablePath: Path,
                            f: FileSystem, files: Seq[FileMeta],
                            bloomCols: Seq[String], writeSchema: StructType,
                            readSchema: StructType,
                            checks: Seq[(String, org.apache.spark.sql.Column)])
      : (Seq[FileMeta], Seq[Long]) = {
    val applicable = bloomCols.filter(writeSchema.fieldNames.contains)
    if ((applicable.isEmpty && checks.isEmpty) || files.isEmpty) {
      lastPostWriteScans = 0
      return (files, checks.map(_ => 0L))
    }
    lastPostWriteScans = 1
    import org.apache.spark.sql.functions.{col, input_file_name}
    val scan = spark.read.schema(readSchema)
      .parquet(files.map(fm => new Path(tablePath, fm.path).toString): _*)
    val proj = scan.select(
      (input_file_name() +: applicable.map(c => col(c).cast("string"))) ++
        checks.map { case (_, v) => v.cast("boolean") }: _*)
    val nCols = applicable.size
    val nChecks = checks.size
    // Size each file's sidecar to ITS row count (~10 bits/key ≈ 1 % FP
    // at k=6), pow2 for the double-hash modulo, floored at the 16 KiB
    // legacy default and capped at 2 MiB: a fixed 2^17 bits saturates on
    // gram-scale index files (~190k keys/file measured at sf0.1 — FP→1,
    // every probe kept every file), which silently un-prunes exactly the
    // highest-cardinality columns the sidecars exist for. The read side
    // is length-agnostic (bits come from the sidecar's own size), so old
    // sidecars stay valid and mixed-size tables prune per file.
    val bitsByName: Map[String, Int] = files.map { fm =>
      val target = math.max(BloomIndex.DefaultBits.toLong,
        math.max(0L, fm.rows) * 10L)
      var b = BloomIndex.DefaultBits
      while (b.toLong < target && b < (1 << 24)) b <<= 1
      new Path(fm.path).getName -> b
    }.toMap
    val built = graft.plans.JobLabel.labeled(spark,
      s"txn:postwrite bloom+checks ${files.size} files") {
      proj.rdd.mapPartitions { it =>
      val acc = scala.collection.mutable.Map
        .empty[String, (Array[Array[Long]], Array[Long])]
      it.foreach { r =>
        val file = r.getString(0)
        val (bits, viol) = acc.getOrElseUpdate(file, {
          val nb = bitsByName.getOrElse(
            file.substring(file.lastIndexOf('/') + 1), BloomIndex.DefaultBits)
          (Array.fill(nCols)(BloomIndex.empty(nb)), new Array[Long](nChecks))
        })
        var i = 0
        while (i < nCols) {
          if (!r.isNullAt(i + 1)) BloomIndex.add(bits(i), r.getString(i + 1))
          i += 1
        }
        var j = 0
        while (j < nChecks) {
          val idx = 1 + nCols + j
          if (!r.isNullAt(idx) && r.getBoolean(idx)) viol(j) += 1
          j += 1
        }
      }
      acc.iterator
    }.reduceByKey { (a, b) =>
      (a._1.zip(b._1).map { case (x, y) => BloomIndex.merge(x, y) },
        a._2.zip(b._2).map { case (x, y) => x + y })
    }.collect()
        .map { case (uri, v) =>
          new Path(new java.net.URI(uri)).toUri.getPath -> v }
        .toMap
    }
    val violations = (0 until nChecks).map { j =>
      built.valuesIterator.map(_._2(j)).sum }
    // a violating commit aborts: skip the sidecar publication entirely
    if (violations.exists(_ > 0)) return (files, violations)
    val flagged = files.map { fm =>
      val abs = new Path(tablePath, fm.path)
      val bits = built.get(abs.toUri.getPath).map(_._1)
        .getOrElse(Array.fill(nCols)(BloomIndex.empty()))
      applicable.zipWithIndex.foreach { case (c, i) =>
        BloomIndex.write(f, abs, c, bits(i))
      }
      val stats = applicable.foldLeft(fm.stats) { (st, c) =>
        val cs = st.getOrElse(c,
          ColStats(tagOf(writeSchema(c).dataType).getOrElse("s"),
            None, None, -1L))
        st + (c -> cs.copy(bloom = true))
      }
      fm.copy(stats = stats)
    }
    (flagged, violations)
  }

  /** The table's declared bloom-indexed columns (cumulative — one O(1)
    * entry read), for observability and spec gates. */
  def bloomColumns(spark: SparkSession, table: String): Seq[String] =
    latestVersion(spark, table)
      .map(readEntry(spark, table, _).bloomCols).getOrElse(Seq.empty)

  /** May the file contain at least one of `keys` in `column`? Judged by
    * the file's min/max stats (typed via the stats tag) AND its Bloom
    * sidecar when the commit flagged one. Conservative: unstatted /
    * unflagged / unparsable → keep. `keys` are the values' Spark string
    * renderings (the sidecar's hash domain and the stats' storage form —
    * one rendering, two prune levels). */
  private def fileMayContainKeys(spark: SparkSession, table: String,
                                 fm: FileMeta, column: String,
                                 keys: Seq[String]): Boolean = {
    val cs = fm.stats.get(column)
    // range test for integer-family and string tags only: a float
    // column's footer bounds widen to double strings ("0.1" renders as
    // "0.10000000149011612"), so a parse-based boundary compare could
    // wrongly prune a file containing the key — the bloom level (built
    // from the SAME Spark string rendering the probe keys use) still
    // prunes those columns exactly
    val rangeHit = cs match {
      case Some(c) if c.min.isDefined && c.max.isDefined && c.tag != "d" =>
        keys.exists { k =>
          try cmpStat(c.tag, c.min.get, k) <= 0 && cmpStat(c.tag, c.max.get, k) >= 0
          catch { case _: Exception => true }
        }
      case _ => true
    }
    if (!rangeHit) return false
    if (!cs.exists(_.bloom)) return true
    BloomIndex.read(fs(spark, new Path(table)),
      new Path(table, fm.path), column) match {
      case None => true // sidecar missing → conservative keep
      case Some(bits) => keys.exists(BloomIndex.mightContain(bits, _))
    }
  }

  /** Key-set data-skipping scan — the point-lookup counterpart of
    * [[readWhere]]'s range pruning: resolve the snapshot, keep only the
    * files that MIGHT contain at least one of `keys` in `column` (per-file
    * min/max stats first, then the per-file Bloom sidecar when the table
    * declared one for the column — see `bloomCols` on [[commit]]), and
    * scan only the survivors. Returns the scan plus its (files kept,
    * files total) counters from the same single snapshot resolution.
    *
    * Purely an I/O reduction: the result is a SUPERSET of the rows whose
    * `column` equals one of the keys (bloom false positives and
    * unflagged files are conservatively kept), so the caller's own
    * equi-join/filter provides exactness. This is what turns a
    * fixed-size delta's probe of a corpus-sized table or index from
    * O(corpus files) into O(files that truly share a key): min/max
    * pruning is blind to hash-uniform keys (every file spans the full
    * range), which is exactly the column shape fingerprints, band
    * hashes, and n-gram keys have. Driver cost is O(kept-candidates ×
    * keys) bloom probes with early exit — metadata-sized, the same
    * budget any pruning planner spends. */
  def readKeyed(spark: SparkSession, table: String, column: String,
                keys: Seq[String],
                version: Option[Long] = None): (DataFrame, (Int, Int)) = {
    version.orElse(latestVersion(spark, table)) match {
      case None => (spark.emptyDataFrame, (0, 0))
      case Some(v) =>
        val files = resolveFiles(spark, table, v)
        requireLive(spark, table, v, files)
        if (files.isEmpty) return (spark.emptyDataFrame, (0, 0))
        def abs(fms: Seq[FileMeta]) =
          fms.map(fm => new Path(table, fm.path).toString)
        val entry = readEntry(spark, table, v)
        val schema = entry.schemaStruct
        val ren = entry.renames
        // the sidecars and stats are keyed by the column's PHYSICAL name
        val colPhys = physicalOf(spark, ren, column)
        def scan(paths: Seq[String]) = toDisplay(schema match {
          case Some(st) => spark.read.schema(st).parquet(paths: _*)
          case None => spark.read.parquet(paths: _*)
        }, ren)
        val kept =
          if (keys.isEmpty) Seq.empty
          else files.filter(
            fileMayContainKeys(spark, table, _, colPhys, keys))
        lastKeyedProbeDistributed = false
        val df =
          if (kept.isEmpty) scan(Seq(abs(files).head)).where(lit(false))
          else scanFiles(spark, table, kept, schema,
            resolveDvs(spark, table, v), ren)
        (df, (kept.size, files.size))
    }
  }

  /** Observability seam: did the most recent keyed scan decide its kept
    * set on the executors ([[readKeyedDistributed]]) or the driver
    * ([[readKeyed]])? The above-cap probe gates read it. */
  @volatile private[graft] var lastKeyedProbeDistributed: Boolean = false

  /** [[readKeyed]] with the MEMBERSHIP DECISION DISTRIBUTED — the
    * above-cap regime of the scan-pruned probes: `keysDf`'s first
    * column (compared in its Spark string rendering, the sidecar hash
    * domain) probes every candidate file's Bloom sidecar ON THE
    * EXECUTORS, so no key cardinality ever collects to (or broadcasts
    * from a collect on) the driver — the ceiling
    * `graft.probe.maxDriverKeys` imposes on [[readKeyed]]'s key-list
    * form simply does not apply. Shape:
    *
    *  1. the per-file sidecars load AS DATA in one tiny parallel job —
    *     O(snapshot files) 16 KiB reads, the same metadata class the
    *     snapshot resolution already holds driver-side — and broadcast
    *     to the key scan;
    *  2. each key partition walks its keys against the file blooms,
    *     keeping a per-file hit flag with EARLY EXIT once every file is
    *     hit (a blanket delta degrades to one cheap pass, not
    *     keys x files work);
    *  3. only the hit file ORDINALS — O(files that truly share a key),
    *     never O(keys) — return to the driver to select the kept set.
    *
    * Files without a flagged/readable sidecar are conservatively kept,
    * exactly like [[readKeyed]]. Purely an I/O reduction: the scan is a
    * SUPERSET of the rows whose `column` equals one of the keys, and
    * the caller's own join provides exactness — so at any delta size
    * the probe's index-side I/O tracks true key collisions, not corpus
    * size (the fix the r15/r16 verdicts asked for: a backfill-sized
    * delta no longer falls back to the O(index) full scan). */
  def readKeyedDistributed(spark: SparkSession, table: String,
                           column: String, keysDf: DataFrame,
                           version: Option[Long] = None)
      : (DataFrame, (Int, Int)) = {
    version.orElse(latestVersion(spark, table)) match {
      case None => (spark.emptyDataFrame, (0, 0))
      case Some(v) =>
        val files = resolveFiles(spark, table, v)
        requireLive(spark, table, v, files)
        if (files.isEmpty) return (spark.emptyDataFrame, (0, 0))
        val entry = readEntry(spark, table, v)
        val schema = entry.schemaStruct
        val ren = entry.renames
        val colPhys = physicalOf(spark, ren, column) // sidecars/stats are physical
        val (bloomed, unbloomed) =
          files.partition(_.stats.get(colPhys).exists(_.bloom))
        val keepPaths: Set[String] =
          if (bloomed.isEmpty) Set.empty
          else {
            val tbl = table
            val colName = colPhys
            val ser = new SerConf(spark.sparkContext.hadoopConfiguration)
            import spark.implicits._
            val keyCol = keysDf.columns.head
            val keys = keysDf
              .select(org.apache.spark.sql.functions.col(keyCol)
                .cast("string")).na.drop().as[String]
            // CHUNKED by estimated sidecar bytes (sidecars size to their
            // file's key count since r17 — up to 2 MiB each): the driver
            // holds and broadcasts at most one chunk of bits at a time,
            // so a snapshot with very many bloomed files can never
            // pressure driver memory; each chunk costs one delta-scaled
            // pass over the keys. Estimate mirrors the build-side sizing
            // formula, conservative high.
            val chunkBudget = spark.conf
              .getOption("graft.probe.maxSidecarBroadcastBytes")
              .map(_.toLong).getOrElse(256L << 20)
            def estBytes(fm: FileMeta): Long = {
              val target = math.max(BloomIndex.DefaultBits.toLong,
                math.max(0L, fm.rows) * 10L)
              var b = BloomIndex.DefaultBits
              while (b.toLong < target && b < (1 << 24)) b <<= 1
              b / 8L
            }
            val indexed = bloomed.zipWithIndex
            val chunks = scala.collection.mutable.ListBuffer
              .empty[Seq[(FileMeta, Int)]]
            var cur = scala.collection.mutable.ListBuffer
              .empty[(FileMeta, Int)]
            var curBytes = 0L
            indexed.foreach { case (fm, i) =>
              val b = estBytes(fm)
              if (cur.nonEmpty && curBytes + b > chunkBudget) {
                chunks += cur.toSeq; cur = scala.collection.mutable
                  .ListBuffer.empty[(FileMeta, Int)]; curBytes = 0L
              }
              cur += ((fm, i)); curBytes += b
            }
            if (cur.nonEmpty) chunks += cur.toSeq
            val keep = scala.collection.mutable.Set.empty[Int]
            chunks.foreach { chunk =>
              val slices = math.min(chunk.size,
                math.max(1, spark.sparkContext.defaultParallelism))
              val loaded = spark.sparkContext
                .parallelize(chunk.map { case (fm, i) => (fm.path, i) },
                  slices)
                .map { case (rel, i) =>
                  val p = new Path(tbl, rel)
                  (i, BloomIndex.read(p.getFileSystem(ser.value), p, colName))
                }.collect()
              keep ++= loaded.collect { case (i, None) => i } // conservative
              val withBits = loaded
                .collect { case (i, Some(bits)) => (i, bits) }
              if (withBits.nonEmpty) {
                val bc = spark.sparkContext.broadcast(withBits)
                val out = keys.mapPartitions { it =>
                  val arr = bc.value
                  val n = arr.length
                  val h = new Array[Boolean](n)
                  var remaining = n
                  while (it.hasNext && remaining > 0) {
                    val k = it.next()
                    var i = 0
                    while (i < n && remaining > 0) {
                      if (!h(i) && BloomIndex.mightContain(arr(i)._2, k)) {
                        h(i) = true; remaining -= 1
                      }
                      i += 1
                    }
                  }
                  Iterator.range(0, n).filter(h(_)).map(arr(_)._1)
                }.distinct().collect()
                bc.unpersist(blocking = false)
                keep ++= out
              }
            }
            bloomed.zipWithIndex
              .collect { case (fm, i) if keep(i) => fm.path }.toSet
          }
        val keepAll = keepPaths ++ unbloomed.map(_.path)
        val kept = files.filter(fm => keepAll(fm.path))
        lastKeyedProbeDistributed = true
        val df =
          if (kept.isEmpty) {
            val head = Seq(new Path(table, files.head.path).toString)
            toDisplay(schema match {
              case Some(st) => spark.read.schema(st).parquet(head: _*)
              case None => spark.read.parquet(head: _*)
            }, ren).where(lit(false))
          } else scanFiles(spark, table, kept, schema,
            resolveDvs(spark, table, v), ren)
        (df, (kept.size, files.size))
    }
  }

  // ---- commit ---------------------------------------------------------

  /** Commit `df` as the next version. `operation` is "overwrite" (snapshot
    * replaces the table) or "append" (snapshot = previous files + new).
    * Retries on commit conflicts (another writer won the version) up to
    * `maxAttempts` times. Returns the committed version.
    *
    * TRUST CONTRACT: the other operation tags ("optimize", "delete",
    * "merge", "update") are deliberately NOT accepted here — downstream
    * consumers adjudicate semantics from the tag alone ([[tableChanges]]
    * emits nothing for an "optimize" hop; the x40 version-coverage index
    * trust classifies it as row-preserving), so those tags must be
    * producible only by the engine paths that guarantee their contract
    * ([[optimize]]/[[optimizeWhere]]/[[compactSmallFiles]],
    * [[deleteWhere]], [[mergeInto]], [[updateWhere]]). An arbitrary
    * snapshot replacement tagged "optimize" through this wrapper would
    * silently vanish from the change feed and keep sibling indexes
    * trusted across a data change. */
  def commit(spark: SparkSession, df: DataFrame, table: String,
             operation: String, maxAttempts: Int = 10,
             bloomCols: Seq[String] = Seq.empty): Long = {
    requirePublicOp("commit", operation)
    commitImpl(spark, df, table, operation, None, maxAttempts,
      bloomCols = bloomCols)
      .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped"))
  }

  private def requirePublicOp(api: String, operation: String): Unit =
    require(operation == "overwrite" || operation == "append",
      s"TxnLake.$api: operation must be append or overwrite, got " +
        s"$operation — the data-preserving/DML tags are reserved for the " +
        "engine commands that guarantee their log contract")

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
                 maxAttempts: Int = 10,
                 extraTxns: Map[String, Long] = Map.empty,
                 bloomCols: Seq[String] = Seq.empty): Option[Long] = {
    requirePublicOp("commitOnce", operation)
    commitImpl(spark, df, table, operation, Some((appId, batchId)), maxAttempts,
      extraTxns = extraTxns, bloomCols = bloomCols)
  }

  /** Raised (internally) when `requireBase` no longer matches the log —
    * the caller's read snapshot is stale and it must recompute. */
  private[sources] final class CommitConflict extends Exception

  /** The session's column-name resolver (honors spark.sql.caseSensitive,
    * default case-INSENSITIVE) — every tombstone/duplicate-column guard
    * compares through it, because Spark's own analysis will bind "VC" to
    * a parquet file's "vc" bytes under the default resolution: a
    * case-sensitive guard would wave through exactly the resurrection it
    * exists to refuse. */
  private def resolver(spark: SparkSession): (String, String) => Boolean =
    spark.sessionState.conf.resolver

  /** In-commit timestamp for the next entry: wall clock clamped to
    * STRICTLY exceed the previous entry's — Delta's inCommitTimestamp
    * monotonicity, enforced at WRITE time so that
    * `readAsOf(commitTimestamp(v))` round-trips even under multi-writer
    * clock skew (read-side adjustment alone keeps resolution
    * deterministic but lets the raw exposed value point before an
    * earlier version's). */
  private def nextTs(prev: Option[Entry]): Some[Long] =
    Some(math.max(System.currentTimeMillis(),
      prev.flatMap(_.ts).map(_ + 1).getOrElse(Long.MinValue)))

  private def commitImpl(spark: SparkSession, df: DataFrame, table: String,
                         operation: String, txn: Option[(String, Long)],
                         maxAttempts: Int,
                         requireBase: Option[Option[Long]] = None,
                         removePaths: Option[Seq[String]] = None,
                         extraTxns: Map[String, Long] = Map.empty,
                         gcTxnPrefixes: Seq[String] = Seq.empty,
                         bloomCols: Seq[String] = Seq.empty,
                         newDvs: Map[String, DvRef] = Map.empty,
                         noData: Boolean = false,
                         schemaOverride: Option[StructType] = None,
                         dropBloomCols: Seq[String] = Seq.empty,
                         tombstoneCols: Seq[String] = Seq.empty,
                         newConstraints: Map[String, String] = Map.empty,
                         dropConstraintNames: Seq[String] = Seq.empty,
                         newGenCols: Map[String, String] = Map.empty,
                         dropGenColNames: Seq[String] = Seq.empty,
                         newIdentityCols: Map[String, IdentitySpec] = Map.empty,
                         dropIdentityColNames: Seq[String] = Seq.empty,
                         carryRids: Boolean = false,
                         newRenames: Map[String, String] = Map.empty,
                         dropRenames: Seq[String] = Seq.empty)
                        : Option[Long] = {
    require(operation == "overwrite" || operation == "append"
      || operation == "optimize" || operation == "delete"
      || operation == "merge" || operation == "update"
      || operation == "metadata",
      s"TxnLake: unknown operation $operation")
    require(!df.columns.exists(_.startsWith("__graft_dv_")),
      "TxnLake: __graft_dv_* column names are reserved for the " +
        "deletion-vector read path — a data column would be silently " +
        "overwritten by the masked scan")
    // only the engine's own rewrite paths (carryRids) may write the
    // materialized row-id column: a user column under that name would
    // silently pose as tracked row ids on every later read
    require(carryRids || !df.columns.contains(RidCol),
      s"TxnLake: $RidCol is reserved for row tracking — the engine " +
        "materializes it on rewrites; writers may not supply it")
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
      // (no "txns" field at all) fall back to the full-log scan.
      val replayed = txn.exists { case (app, batch) =>
        lastEntry match {
          case Some(e) if e.hasTxns => e.txns.get(app).exists(_ >= batch)
          case Some(_) => committed.exists(v =>
            readEntry(spark, table, v).txn.contains((app, batch)))
          case None => false
        }
      }
      if (replayed) return None
      val next = committed.lastOption.map(_ + 1).getOrElse(0L)
      // drop tombstones ride the entry cumulatively (like txns/schema):
      // a column dropped metadata-only still has its BYTES in old files,
      // so re-introducing the name would silently resurrect them under
      // the widened read schema — the guard below makes that loud.
      // Overwrite clears the tombstones: it removes every current file,
      // so there is nothing left to resurrect. Checked BEFORE the data
      // write (it needs only df.columns and the last entry) so a refused
      // commit pays no parquet write and orphans no data dir; compared
      // through the session RESOLVER because default-case-insensitive
      // analysis would bind a re-cased name to the old files' bytes.
      val dropped =
        (if (operation == "overwrite") Seq.empty
         else lastEntry.map(_.droppedCols).getOrElse(Seq.empty)) ++
          tombstoneCols
      // COLUMN MAPPING: the cumulative rename overlay (physical →
      // display), carried like the tombstones; overwrite retires it with
      // the files whose physical names it described
      val renamesAll =
        (((if (operation == "overwrite") Map.empty[String, String]
           else lastEntry.map(_.renames).getOrElse(Map.empty)) ++ newRenames)
          -- dropRenames)
          .filterNot { case (p, d) => p == d } // rename-back collapses
      if (!noData) {
        val res = resolver(spark)
        // tombstones are PHYSICAL names — compare the incoming display
        // names through the overlay
        val resurrect = df.columns.filter(c =>
          dropped.exists(res(_, physicalOf(spark, renamesAll, c))))
        require(resurrect.isEmpty,
          s"TxnLake: column(s) ${resurrect.mkString(", ")} were DROPPED " +
            "from this table; committing data under the same name would " +
            "resurrect the old files' bytes — use a different name, or " +
            "overwrite the table to retire the tombstone")
      }
      // GENERATED columns fill at WRITE time when the caller omits them
      // (GENERATED ALWAYS): a table property carried like the schema;
      // engine rewrites that already carry the column pass through and
      // are VALIDATED below, never silently regenerated
      val genColsAll =
        (lastEntry.map(_.genCols).getOrElse(Map.empty) ++
          newGenCols) -- dropGenColNames
      val dfGen =
        if (noData || genColsAll.isEmpty) df
        else genColsAll.toSeq.sortBy(_._1).foldLeft(df) {
          case (d, (c, x)) =>
            if (d.columns.contains(c)) d
            else d.withColumn(c, org.apache.spark.sql.functions.expr(x))
        }
      // IDENTITY columns assign at WRITE time (Delta's GENERATED ALWAYS
      // AS IDENTITY): fresh values are hwm + step*(mid+1) with mid =
      // monotonically_increasing_id() — parallel tasks reserve disjoint
      // ranges through its partition-id spacing, so assignment needs NO
      // extra pass, no shuffle, and no driver coordination; unconsumed
      // reservations become gaps, which is Delta's own documented
      // contract. Writers may not supply the column on append/overwrite
      // (ALWAYS); engine rewrites (merge/update/optimize/delete) carry
      // existing values and NULL-fill only the rows they mint (merge
      // inserts). Re-derived per attempt: a commit retry re-reads the
      // advanced hwm.
      val idColsAll =
        (lastEntry.map(_.identityCols).getOrElse(Map.empty) ++
          newIdentityCols) -- dropIdentityColNames
      val dfOut =
        if (noData || idColsAll.isEmpty) dfGen
        else idColsAll.toSeq.sortBy(_._1).foldLeft(dfGen) {
          case (d, (c, sp)) =>
            import org.apache.spark.sql.functions.{coalesce, col, lit,
              monotonically_increasing_id, raise_error, try_add,
              try_multiply, when}
            require(math.abs(sp.hwm) < (1L << 61),
              s"TxnLake: identity column $c's high-water mark ${sp.hwm} " +
                "is within range-reservation overflow distance — " +
                "re-found the table with a wider step plan")
            // overflow-CHECKED reservation: step * (partition_ordinal
            // << 33) alone can wrap Long for a large step or a high
            // partition ordinal, and non-ANSI arithmetic would wrap
            // SILENTLY — minting duplicate or direction-regressed ids
            // instead of the promised loud refusal. try_* returns NULL
            // on overflow; a NULL reservation raises per-row, aborting
            // the write job before the entry publishes.
            val reserved = try_add(lit(sp.hwm),
              try_multiply(lit(sp.step), monotonically_increasing_id() + 1))
            val next = when(reserved.isNull, raise_error(lit(
                s"TxnLake: identity column $c range reservation " +
                  s"overflowed Long (hwm=${sp.hwm}, step=${sp.step}) — " +
                  "re-found the table with a narrower step")))
              .otherwise(reserved)
            if (!d.columns.contains(c)) d.withColumn(c, next)
            else {
              require(operation != "append" && operation != "overwrite",
                s"TxnLake: column $c is GENERATED ALWAYS AS IDENTITY — " +
                  "writers may not supply it; omit the column and the " +
                  "engine assigns it")
              d.withColumn(c, coalesce(col(c), next))
            }
        }
      // translate the frame to PHYSICAL names for the write: files and
      // their footer stats are immutable, so they must carry the names
      // that never change. A column that is not any current display name
      // but matches a renamed column's retired physical name is REFUSED —
      // it would silently alias the renamed column's storage.
      val dfPhys =
        if (noData || renamesAll.isEmpty) dfOut
        else {
          val res = resolver(spark)
          dfOut.columns.foreach { c =>
            val isDisplay = renamesAll.values.exists(res(_, c))
            val retired = renamesAll.collectFirst {
              case (p, d) if res(p, c) && !res(d, c) => d }
            require(isDisplay || retired.isEmpty,
              s"TxnLake: column $c was RENAMED to ${retired.getOrElse("")}" +
                " — writing under the retired name would alias the " +
                "renamed column's storage; use the new name")
          }
          // translate with the SAME resolver the guards above used: a
          // case-variant display name passed them, so it must translate
          renamesAll.foldLeft(dfOut) { case (d, (p, disp)) =>
            d.columns.find(res(_, disp))
              .map(c => d.withColumnRenamed(c, p)).getOrElse(d) }
        }
      // 1. land the data in a fresh immutable dir (never seen by readers
      //    until the log entry that names it is published). A metadata-
      //    only commit (noData — a deletion-vector delta) writes nothing:
      //    even an empty frame would land a 0-row part file, and a DV
      //    delete's contract is that NO data file moves.
      val dataRel = s"data/v$next-$salt-$attempt"
      val added0 =
        if (noData) Seq.empty[FileMeta]
        else {
          graft.plans.JobLabel.labeled(spark, s"txn:$operation write " +
              new Path(table).getName) {
            dfPhys.write.mode("overwrite")
              .parquet(new Path(tablePath, dataRel).toString)
          }
          // add actions: one per written file, with footer-harvested stats
          // (distributed above DriverHarvestMax files — see harvestAll)
          val written = f.listStatus(new Path(tablePath, dataRel))
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName)
            .map(s => (s.getPath.toString, s"$dataRel/${s.getPath.getName}"))
            .toSeq
          // the materialized row-id column is engine plumbing, not table
          // data: its footer stats never feed user-predicate pruning, so
          // they stay out of the entry
          harvestAll(spark, written, dfPhys.schema)
            .map(fm => fm.copy(stats = fm.stats - RidCol))
        }
      // Bloom-indexed columns are a TABLE property (like the cumulative
      // schema): declared on any commit, inherited by every later one —
      // including the engine's own maintenance/DML rewrites, which would
      // otherwise silently strip the index from whatever they touch and
      // quietly un-prune every future key probe.
      // bloom declarations are stored PHYSICAL (their sidecars are named
      // for the bytes, which never rename); incoming display names map
      val allBloomCols =
        (lastEntry.map(_.bloomCols).getOrElse(Seq.empty)
          ++ bloomCols.map(physicalOf(spark, renamesAll, _)))
          .distinct
          .filterNot(dropBloomCols.map(physicalOf(spark, renamesAll, _)).contains)
      // every commit carries the CUMULATIVE table schema forward (Delta's
      // metaData action): appends merge new columns in, overwrite resets —
      // so readers resolve the snapshot schema from ONE log entry instead
      // of merging footers across the whole file list. Computed before
      // the post-write pass, which reads the fresh files under it.
      val tableSchema = schemaOverride.getOrElse(mergedSchema(
        lastEntry.flatMap(_.schemaJson)
          .map(DataType.fromJson(_).asInstanceOf[StructType]),
        // the materialized row-id column is PHYSICAL only — never part
        // of the logical table schema (plain reads must not see it)
        StructType(dfPhys.schema.fields.filterNot(_.name == RidCol)),
        operation))
      // CHECK constraints are a table property (Delta's ADD CONSTRAINT):
      // carried cumulatively, enforced on every data-bearing commit by
      // scanning ONLY the just-written delta (O(delta), under the merged
      // schema so evolution-era rows null-fill — SQL CHECK semantics:
      // NULL passes, only a FALSE verdict violates) — in the SAME
      // distributed pass that builds the bloom sidecars, so a
      // constrained + bloom-indexed table reads its fresh bytes ONCE per
      // commit. A violating commit aborts before the entry publishes,
      // with nothing visible and the unpublished data dir removed.
      // GENERATED columns validate on the same pass as the null-safe
      // invariant `c <=> expr`. Maintenance ("optimize": data-preserving
      // by the tag's own contract) and CoW DELETE (kept rows are a
      // subset of already-validated rows) cannot introduce a violating
      // row — their enforcement is skipped, so a constrained 100 TB
      // table's compaction never pays a second read of what it rewrites.
      val tableConstraints =
        (lastEntry.map(_.constraints).getOrElse(Map.empty)
          -- dropConstraintNames) ++ newConstraints
      val checks: Seq[(String, org.apache.spark.sql.Column)] = {
        import org.apache.spark.sql.functions.{coalesce, col, lit, not}
        // stored expressions are DISPLAY-named (the domain the user
        // declared them in); the enforcement scan reads physical files,
        // so renamed references translate through the overlay here
        tableConstraints.toSeq.sortBy(_._1).map { case (n, x) =>
          (s"$n (`$x`)",
            not(coalesce(exprUnder(spark, x, renamesAll), lit(true)))) } ++
          genColsAll.toSeq.sortBy(_._1).map { case (c, x) =>
            (s"generated column $c (`$x`)",
              !(col(c) <=> exprUnder(spark, x, renamesAll))) }
      }
      val enforce = checks.nonEmpty && added0.nonEmpty &&
        operation != "optimize" && operation != "delete"
      val (added, violations) = postWritePass(spark, tablePath, f, added0,
        allBloomCols, dfPhys.schema, tableSchema,
        if (enforce) checks else Seq.empty)
      if (violations.exists(_ > 0)) {
        f.delete(new Path(tablePath, dataRel), true)
        val violated = checks.zip(violations).collect {
          case ((label, _), n) if n > 0 => s"$label: $n row(s)" }
        throw new IllegalStateException(
          "TxnLake: commit violates CHECK constraint(s) — " +
            violated.mkString("; ") + "; nothing was committed")
      }
      // remove actions: append removes nothing (O(1) log reads — the
      // streaming-sink hot path never resolves the snapshot); overwrite
      // and optimize remove every current file, unless the caller scoped
      // the rewrite to an explicit subset (incremental compaction — the
      // untouched files carry over into the new snapshot verbatim)
      val removed: Seq[String] = removePaths.getOrElse {
        if (operation == "append") Seq.empty
        else committed.lastOption
          .map(resolveFiles(spark, table, _).map(_.path)).getOrElse(Seq.empty)
      }
      // carry the cumulative txn state through EVERY commit (plain commits
      // included) so the O(1) replay check above stays sound. UPGRADE
      // path: a log written before the map existed carries per-entry txn
      // markers only — fold ALL of them in the one commit that introduces
      // the map (one-time linear scan), otherwise the first new-format
      // commit would orphan every legacy marker and a legacy app's replay
      // would slip past the has-map fast path above.
      val legacy: Map[String, Long] = lastEntry match {
        case Some(e) if !e.hasTxns =>
          committed.foldLeft(Map.empty[String, Long]) { (m, v) =>
            readEntry(spark, table, v).txn match {
              case Some((a, b)) if m.get(a).forall(_ < b) => m + (a -> b)
              case _ => m
            }
          }
        case _ => Map.empty
      }
      // extraTxns are auxiliary watermarks a caller piggybacks on the same
      // atomic commit (e.g. the index-coverage markers the streaming sinks
      // record — see CurationStream.indexCovered). Monotone merge: a stale
      // caller must never regress a marker another commit already advanced.
      val prior = legacy ++ lastEntry.map(_.txns).getOrElse(Map.empty)
      val extra = extraTxns.map { case (a, b) =>
        a -> math.max(b, prior.getOrElse(a, Long.MinValue)) }
      // gcTxnPrefixes: retire auxiliary markers whose purpose this very
      // commit completes (a sliced hop's per-slice markers, dropped by
      // the hop's completion commit) — without GC they would ride every
      // later entry's cumulative map forever. Prefix-matched so a
      // cap-namespaced family (`app#v3@2`, `app#v3@5`, …) retires as
      // one; callers end prefixes with their namespace separator so
      // `app#v3@` can never swallow `app#v30@…`.
      val txns = prior.filter { case (k, _) =>
        !gcTxnPrefixes.exists(k.startsWith) } ++ extra ++ txn.toMap
      // deletion vectors: the live map is (previous live -- removed) ++
      // fresh — a removed file's DV dies with it, and this commit's
      // masks (deleteWhereDv/updateWhereDv) overlay the survivors. The
      // ENTRY stores only this commit's delta (O(commit)) unless it is
      // an anchor — empty live map (the DV-free common case), or the
      // CheckpointInterval cadence — where the full map lands so replay
      // stays bounded (see resolveDvs).
      val dvLive = (committed.lastOption
        .map(resolveDvs(spark, table, _))
        .getOrElse(Map.empty[String, DvRef]) -- removed) ++ newDvs
      val dvAnchor = dvLive.isEmpty || next % CheckpointInterval == 0
      // advance each identity hwm from the freshly-HARVESTED file stats —
      // zero extra I/O (parquet int64 footers always carry exact min/max;
      // our own harvest just read them). Monotone: a data-preserving
      // rewrite's carried values never regress the mark, and a commit
      // that minted rows must surface a stat or fail loudly (a silently
      // unadvanced hwm would reissue ids on the next commit).
      val idColsOut = idColsAll.map { case (c, sp) =>
        val vals = added.flatMap(_.stats.get(c))
          .flatMap(s => if (sp.step > 0) s.max else s.min)
          .flatMap(v => scala.util.Try(v.toLong).toOption)
        require(vals.nonEmpty || added.forall(_.rows == 0L),
          s"TxnLake: identity column $c has no harvested stats on a " +
            "row-minting commit — cannot advance the high-water mark")
        // belt to the try_*-checked reservation's suspenders: on a pure
        // engine assignment (append/overwrite — writers may not supply
        // the column), EVERY landed value is fresh, so the harvested
        // extremes must sit strictly beyond the prior mark in step
        // direction; a value on the wrong side means wrapped/duplicate
        // ids and must refuse before the mark advances past them.
        if ((operation == "append" || operation == "overwrite") &&
            added.exists(_.rows > 0L)) {
          val inner = added.flatMap(_.stats.get(c))
            .flatMap(s => if (sp.step > 0) s.min else s.max)
            .flatMap(v => scala.util.Try(v.toLong).toOption)
          require(inner.nonEmpty && (if (sp.step > 0) inner.min > sp.hwm
                                     else inner.max < sp.hwm),
            s"TxnLake: identity column $c landed values on the wrong " +
              s"side of the high-water mark ${sp.hwm} — refusing to " +
              "advance (possible reservation overflow)")
        }
        val hw =
          if (vals.isEmpty) sp.hwm
          else if (sp.step > 0) math.max(sp.hwm, vals.max)
          else math.min(sp.hwm, vals.min)
        c -> sp.copy(hwm = hw)
      }
      // ROW TRACKING (Delta's baseRowId): every added file reserves a
      // fresh contiguous base-row-id range from the table's cumulative
      // high-water mark — pure driver arithmetic over the row counts the
      // harvest already produced, zero extra I/O. Fresh rows expose
      // `brid + row_index` at read time (nothing materializes on
      // append); engine rewrites carry the ids they read as a physical
      // `__graft_rid` column, which takes precedence. The mark is
      // monotone across every commit (restore/clone merge it the same
      // way), so a row id, once handed out, is never reissued.
      val ridBase = lastEntry.map(_.ridHwm).filter(_ >= 0L).getOrElse(0L)
      var ridCursor = ridBase
      val addedRid = added.map { fm =>
        val b = ridCursor
        ridCursor += math.max(0L, fm.rows)
        fm.copy(brid = b)
      }
      // 2. publish: tmp write + atomic link IS the commit
      val entry = render(Entry(next, operation, addedRid, removed, None, txn,
        txns,
        hasTxns = true, schemaJson = Some(tableSchema.json),
        bloomCols = allBloomCols,
        dvs = if (dvAnchor) dvLive else newDvs, dvDelta = !dvAnchor,
        droppedCols = dropped.distinct, constraints = tableConstraints,
        genCols = genColsAll, ts = nextTs(lastEntry),
        identityCols = idColsOut, ridHwm = ridCursor,
        renames = renamesAll))
      val tmp = new Path(logDir(table), s"v$next.json.tmp-$salt")
      val out = f.create(tmp, false)
      try out.write(entry.getBytes("UTF-8")) finally out.close()
      val dst = new Path(logDir(table), s"v$next.json")
      if (publishExclusive(f, tmp, dst)) {
        maybeCheckpoint(spark, f, table, next)
        return Some(next)
      }
      f.delete(tmp, false) // lost the race: discard and retry at N+1
      // under a pinned read set, losing the race IS a read conflict —
      // surface it now rather than burning the remaining attempts
      if (requireBase.isDefined) throw new CommitConflict
      attempt += 1
    }
    sys.error(s"TxnLake: gave up after $maxAttempts commit conflicts on $table")
  }

  /** Write the periodic checkpoint after a successful publish. Only the
    * committer of version N writes v<N>.ckpt, so there is no race; the
    * checkpoint is derived data — a crash before it lands merely leaves
    * readers replaying a longer tail from the previous one. */
  private def maybeCheckpoint(spark: SparkSession, f: FileSystem,
                              table: String, version: Long): Unit = {
    if (version == 0 || version % CheckpointInterval != 0) return
    val state = resolveFiles(spark, table, version)
    val tmp = new Path(logDir(table), s"v$version.ckpt.tmp")
    val conf = spark.sparkContext.hadoopConfiguration
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(tmp, conf))
      .withConf(conf)
      .withType(ckptSchema)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try {
      val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(
        ckptSchema)
      state.foreach { fm =>
        val g = gf.newGroup()
        g.append("path", fm.path)
        g.append("rows", fm.rows)
        val st = mapper.createObjectNode()
        statsObj(st, fm.stats)
        g.append("stats", mapper.writeValueAsString(st))
        if (fm.brid >= 0L) g.append("brid", fm.brid)
        writer.write(g)
      }
    } finally writer.close()
    if (!publishExclusive(f, tmp, new Path(logDir(table), s"v$version.ckpt")))
      f.delete(tmp, false)
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

  // ---- read -----------------------------------------------------------

  /** Raise a clear error when a resolved snapshot references data dirs
    * [[vacuum]] has reclaimed — otherwise the read fails later, mid-scan,
    * with a bare missing-file error. O(#commit dirs) existence probes, not
    * O(files): files share their commit's dir, so the dir is the unit of
    * reclamation. */
  /** Table schema after committing `incoming` under `operation` — Delta's
    * schema-evolution rules: overwrite RESETS to the incoming schema;
    * append/optimize MERGE by name (existing column order preserved,
    * brand-new columns appended, nullability widened). A same-name type
    * change is refused — silent coercion would corrupt pruning stats and
    * every reader's expectations. */
  private def mergedSchema(prev: Option[StructType], incoming: StructType,
                           operation: String): StructType =
    prev match {
      case None => incoming
      case Some(_) if operation == "overwrite" => incoming
      case Some(p) =>
        val conflicts = incoming.fields.flatMap { f =>
          p.fields.find(_.name == f.name).collect {
            case ex if ex.dataType != f.dataType =>
              s"${f.name}: ${ex.dataType.simpleString} vs ${f.dataType.simpleString}"
          }
        }
        require(conflicts.isEmpty,
          s"TxnLake: schema merge type conflict — ${conflicts.mkString("; ")}")
        StructType(
          p.fields.map { ex =>
            incoming.fields.find(_.name == ex.name)
              .map(in => ex.copy(nullable = ex.nullable || in.nullable))
              .getOrElse(ex)
          } ++ incoming.fields.filterNot(f => p.fieldNames.contains(f.name)))
    }

  /** The cumulative table schema recorded at `version`, when the log is
    * new enough to carry one (one O(1) entry read; legacy logs → None →
    * readers fall back to footer-derived schemas). */
  def loggedSchema(spark: SparkSession, table: String,
                   version: Long): Option[StructType] =
    readEntry(spark, table, version).schemaJson
      .map(DataType.fromJson(_).asInstanceOf[StructType])

  private def requireLive(spark: SparkSession, table: String, version: Long,
                          files: Seq[FileMeta]): Unit = {
    // the LATEST version is fully live by construction (vacuum retains at
    // least one version) — keep the hot read path at O(dirs); time-travel
    // reads pay a FILE-granular check (one listing per dir, not one RPC
    // per file) because a file-granular vacuum can reclaim individual
    // files out of an otherwise-live dir
    val f = fs(spark, new Path(table))
    def reclaimed(what: String): Nothing =
      throw new IllegalStateException(
        s"TxnLake: version $version of $table has been vacuumed " +
          s"($what reclaimed); only versions within the retention " +
          "window at the last vacuum remain readable")
    val byDir = files.groupBy(_.path.split("/").take(2).mkString("/"))
    if (latestVersion(spark, table).contains(version)) {
      byDir.keys.find(dr => !f.exists(new Path(table, dr))).foreach(reclaimed)
    } else {
      byDir.foreach { case (dr, fms) =>
        val dirPath = new Path(table, dr)
        if (!f.exists(dirPath)) reclaimed(dr)
        val present = f.listStatus(dirPath)
          .filter(_.isFile).map(_.getPath.getName).toSet
        fms.find(fm => !present.contains(fm.path.split("/").last))
          .foreach(fm => reclaimed(fm.path))
      }
    }
  }

  /** Read a specific committed version (time travel), resolving the file
    * list from the log only — later commits are invisible. */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val files = resolveFiles(spark, table, version)
    requireLive(spark, table, version, files)
    // apply the LOGGED schema when present: files written before a column
    // was added lack it physically — the parquet reader fills nulls, which
    // is exactly Delta's read-time evolution semantics (and the scan skips
    // the per-file footer schema merge entirely)
    val entry = readEntry(spark, table, version)
    val schema = entry.schemaStruct
    if (files.isEmpty)
      schema.map(st => spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          toDisplaySchema(st, entry.renames)))
        .getOrElse(spark.emptyDataFrame)
    else scanFiles(spark, table, files, schema,
      resolveDvs(spark, table, version), entry.renames)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    latestVersion(spark, path) match {
      case Some(v) => readVersion(spark, path, v)
      case None => spark.emptyDataFrame
    }

  // ---- deletion vectors -------------------------------------------------

  /** Live deletion vectors AS OF a version, data-file path → [[DvRef]]. */
  def deletionVectors(spark: SparkSession, table: String,
                      version: Option[Long] = None): Map[String, DvRef] =
    version.orElse(latestVersion(spark, table))
      .map(resolveDvs(spark, table, _))
      .getOrElse(Map.empty)

  /** The LIVE deletion-vector map as of `v` — the r16 verdict's item 4
    * (the per-entry cumulative map was O(live masked files) on EVERY
    * entry of a DV-heavy log). Since r17, commit entries carry only the
    * masks THIS commit minted (`dvd: true` — O(commit) entry size) and
    * the live map reconstructs by replay from the nearest FULL anchor,
    * exactly how [[resolveFiles]] reconstructs the file list:
    *
    *  - anchors are every entry written with the full map: legacy logs
    *    (cumulative by construction), restore / compensation / clone
    *    publishes, any commit whose live map is EMPTY (the no-DV common
    *    case — so DV-free tables stay O(1) here), and every
    *    [[CheckpointInterval]]-th commit (the cadence bound, Delta's
    *    checkpoint amortization);
    *  - replay applies `(live -- entry.remove) ++ entry.dvs` forward —
    *    sound because a mask only ever changes by being minted/replaced
    *    (in `dvs`) or dying with its removed file (in `remove`).
    *
    * Cost: one entry read at an anchor, at most [[CheckpointInterval]]
    * reads otherwise — the same class as the file-list resolution every
    * read already pays. */
  private[sources] def resolveDvs(spark: SparkSession, table: String,
                                  v: Long): Map[String, DvRef] = {
    val e = readEntry(spark, table, v)
    if (!e.dvDelta) return e.dvs
    var tail = List(e)
    var a = v - 1
    var anchor: Entry = null
    while (anchor == null) {
      require(a >= 0, s"TxnLake: no full DV anchor below version $v of " +
        s"$table — corrupt log (v0 is always an anchor)")
      val ea = readEntry(spark, table, a)
      if (!ea.dvDelta) anchor = ea
      else { tail = ea :: tail; a -= 1 }
    }
    tail.foldLeft(anchor.dvs) { (live, eu) =>
      (live -- eu.remove) ++ eu.dvs }
  }

  private val DvMagic = "GDV1".getBytes("US-ASCII")

  private def writeDvFile(f: FileSystem, p: Path,
                          positions: Seq[Long]): Unit = {
    // 8 + n*8 must stay an Int: past ~200M positions the mask rivals the
    // data and the caller should have taken (or been capped into) the
    // copy-on-write plan anyway
    require(positions.length <= 200000000,
      s"TxnLake: a ${positions.length}-position deletion vector is not a " +
        "selective delete — use deleteWhere (copy-on-write)")
    val out = f.create(p, false)
    try {
      val buf = java.nio.ByteBuffer.allocate(8 + positions.length * 8)
      buf.put(DvMagic)
      buf.putInt(positions.length)
      positions.sorted.foreach(buf.putLong)
      out.write(buf.array())
    } finally out.close()
  }

  private[sources] def readDvFile(f: FileSystem, p: Path): Seq[Long] = {
    val in = f.open(p)
    try {
      val buf = java.nio.ByteBuffer.wrap(in.readAllBytes())
      val magic = new Array[Byte](4)
      buf.get(magic)
      require(java.util.Arrays.equals(magic, DvMagic),
        s"TxnLake: not a deletion vector file: $p")
      val n = buf.getInt
      (0 until n).map(_ => buf.getLong)
    } finally in.close()
  }

  /** The (data-file name, masked position) pairs of `refs` as a
    * two-column DataFrame `(__graft_dv_fn, __graft_dv_ri)`. Sidecars
    * decode DRIVER-side while the TOTAL mask count — carried in the
    * refs' metadata, so the choice costs no I/O — fits the
    * `graft.probe.maxDriverKeys` budget: the common selective-delete
    * case, a broadcast-friendly local relation. A CUMULATIVE mask set
    * past the budget (many masked files, each individually capped)
    * decodes on the EXECUTORS instead — a `binaryFile` scan over the
    * sidecars, one row per file, exploded into pairs — so no mask
    * cardinality can pressure driver memory. The executor path leans on
    * the sidecar naming contract ([[writeDvFile]] callers:
    * `<dataFileName>.dv`) to recover the join key without a path join. */
  private def dvPairsDf(spark: SparkSession, table: String,
                        refs: Seq[(String, DvRef)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, explode,
      regexp_replace, split}
    import spark.implicits._
    val cap = spark.conf.getOption("graft.probe.maxDriverKeys")
      .map(_.toLong).getOrElse(1000000L)
    val f = fs(spark, new Path(table))
    def missing(relPath: String) = new IllegalStateException(
      s"TxnLake: deletion-vector sidecar $relPath of $table is missing — " +
        "the masked version has been vacuumed")
    if (refs.map(_._2.rows).sum <= cap)
      refs.flatMap { case (name, ref) =>
        val positions =
          try readDvFile(f, new Path(table, ref.path))
          catch { case e: java.io.FileNotFoundException =>
            throw missing(ref.path).initCause(e) }
        positions.map(name -> _)
      }.toDF("__graft_dv_fn", "__graft_dv_ri")
    else {
      refs.foreach { case (name, ref) =>
        require(new Path(ref.path).getName == s"$name.dv",
          s"TxnLake: sidecar ${ref.path} breaks the <dataFile>.dv naming " +
            "contract the distributed decode path relies on")
        if (!f.exists(new Path(table, ref.path))) throw missing(ref.path)
      }
      // native decode expression (graft.expressions.DvDecode), not a UDF
      // — one eval per sidecar file, loud on a malformed payload
      spark.read.format("binaryFile")
        .load(refs.map { case (_, r) => new Path(table, r.path).toString }: _*)
        .select(
          regexp_replace(element_at(split(col("path"), "/"), -1),
            "\\.dv$", "").as("__graft_dv_fn"),
          explode(graft.expressions.LakeExpressions.dvDecode(col("content")))
            .as("__graft_dv_ri"))
    }
  }

  /** Scan `files` under `schema` with the live deletion vectors applied —
    * the MERGE-ON-READ read path: a DV'd file scans with the parquet
    * ROW-INDEX metadata column and drops its masked positions via a
    * distributed anti-join against the (file, position) pairs (no
    * In-literals, no UDF); clean files take the plain scan untouched.
    * Zero plan change when no scanned file carries a DV — the fast path
    * every DV-free table stays on. */
  private def scanFiles(spark: SparkSession, table: String,
                        files: Seq[FileMeta], schema: Option[StructType],
                        dvs: Map[String, DvRef],
                        ren: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions.col
    def scan(paths: Seq[String]) = schema match {
      case Some(st) => spark.read.schema(st).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    def abs(fms: Seq[FileMeta]) =
      fms.map(fm => new Path(table, fm.path).toString)
    val (masked, clean) = files.partition(fm => dvs.contains(fm.path))
    val cleanDf = if (clean.isEmpty) None else Some(scan(abs(clean)))
    val maskedDf = if (masked.isEmpty) None else {
      // the mask join keys on the file NAME — two masked files sharing a
      // base name (possible only through pathological log surgery, e.g.
      // a restore mixing file generations) would cross-apply masks, so a
      // collision fails loudly instead of corrupting results
      val names = masked.map(fm => new Path(fm.path).getName)
      require(names.distinct.size == names.size,
        s"TxnLake: duplicate data-file names among the masked files of " +
          s"$table — the deletion-vector join would cross-apply masks")
      val del = dvPairsDf(spark, table,
        masked.map(fm => new Path(fm.path).getName -> dvs(fm.path)))
      val base = scan(abs(masked))
        .withColumn("__graft_dv_fn", col("_metadata.file_name"))
        .withColumn("__graft_dv_ri", col("_metadata.row_index"))
      Some(base.join(del, Seq("__graft_dv_fn", "__graft_dv_ri"), "left_anti")
        .drop("__graft_dv_fn", "__graft_dv_ri"))
    }
    val out = (cleanDf, maskedDf) match {
      case (Some(c), Some(m)) => c.unionByName(m)
      case (Some(c), None) => c
      case (None, Some(m)) => m
      case (None, None) => spark.emptyDataFrame
    }
    toDisplay(out, ren)
  }

  /** [[scanFiles]] with the ROW ID materialized as [[RidCol]]: a row's
    * id is the physical `__graft_rid` column when its file carries one
    * (an engine rewrite materialized it) and `brid + row_index`
    * otherwise (a fresh row's virtual id — appends pay NOTHING at write
    * time, Delta row tracking's design). Per-file base ids join in from
    * a BROADCAST local relation keyed on the file NAME — the driver
    * already holds the file list (that is how the whole log works), so
    * no shuffle and no scan-side exchange; deletion-vector masks apply
    * AFTER id computation, on the same file-name/row-index columns, so
    * masked rows never shift their neighbours' ids. */
  private def scanFilesWithRid(spark: SparkSession, table: String,
                               files: Seq[FileMeta], schema: StructType,
                               dvs: Map[String, DvRef],
                               ren: Map[String, String] = Map.empty,
                               keepMeta: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col}
    import spark.implicits._
    require(files.forall(_.brid >= 0L),
      s"TxnLake: row tracking unavailable — ${files.count(_.brid < 0L)} " +
        s"file(s) of $table predate it (committed before row tracking; " +
        "rewrite them via OPTIMIZE after a tracked commit to backfill)")
    val names = files.map(fm => new Path(fm.path).getName)
    require(names.distinct.size == names.size,
      s"TxnLake: duplicate data-file names in $table — the row-id join " +
        "would cross-apply base ids")
    val readSchema = StructType(
      schema.fields.filterNot(_.name == RidCol) :+
        StructField(RidCol, LongType, nullable = true))
    val base = spark.read.schema(readSchema)
      .parquet(files.map(fm => new Path(table, fm.path).toString): _*)
      .withColumn("__graft_dv_fn", col("_metadata.file_name"))
      .withColumn("__graft_dv_ri", col("_metadata.row_index"))
    val brids = broadcast(
      files.map(fm => (new Path(fm.path).getName, fm.brid))
        .toDF("__graft_dv_fn", "__graft_rid_base"))
    val withRid = base.join(brids, Seq("__graft_dv_fn"))
      .withColumn(RidCol, coalesce(col(RidCol),
        col("__graft_rid_base") + col("__graft_dv_ri")))
    val maskedRefs = files.filter(fm => dvs.contains(fm.path))
      .map(fm => new Path(fm.path).getName -> dvs(fm.path))
    val out =
      if (maskedRefs.isEmpty) withRid
      else withRid.join(dvPairsDf(spark, table, maskedRefs),
        Seq("__graft_dv_fn", "__graft_dv_ri"), "left_anti")
    // keepMeta: callers that need the (file, position) coordinates — the
    // DV-hop pre-image reader — take them from HERE, because metadata
    // columns only resolve on join-free plans and this scan has the
    // base-id join in it
    val cols =
      if (keepMeta) out.drop("__graft_rid_base")
      else out.drop("__graft_dv_fn", "__graft_dv_ri", "__graft_rid_base")
    toDisplay(cols, ren)
  }

  /** The copy-on-write scan seam: rows WITH their ids materialized when
    * every scanned file tracks them (so the rewrite PRESERVES ids —
    * commit with `carryRids = true`), else the plain scan on a legacy
    * snapshot. Returns (frame, whether ids are carried). */
  private def scanForRewrite(spark: SparkSession, table: String,
                             files: Seq[FileMeta], schema: StructType,
                             dvs: Map[String, DvRef],
                             ren: Map[String, String] = Map.empty)
      : (DataFrame, Boolean) =
    if (files.isEmpty)
      (spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        toDisplaySchema(schema, ren)),
        false)
    else if (files.forall(_.brid >= 0L))
      (scanFilesWithRid(spark, table, files, schema, dvs, ren), true)
    else (scanFiles(spark, table, files, Some(schema), dvs, ren), false)

  /** Whether every live file of the snapshot tracks row ids — true for
    * any table whose files were all committed (or rewritten) after row
    * tracking landed; a table with older files answers false until a
    * whole-snapshot OPTIMIZE rewrites them under a tracked commit. */
  def rowTrackingAvailable(spark: SparkSession, table: String,
                           version: Option[Long] = None): Boolean =
    version.orElse(latestVersion(spark, table)) match {
      case None => false
      case Some(v) =>
        val files = resolveFiles(spark, table, v)
        files.forall(_.brid >= 0L) &&
          readEntry(spark, table, v).ridHwm >= 0L
    }

  /** Read a snapshot WITH row ids — the table's columns plus [[RidCol]]
    * (LongType): stable, unique, never-reissued row identifiers that
    * survive copy-on-write rewrites, DV deletes, OPTIMIZE, restore, and
    * clone (Delta row tracking's `_metadata.row_id`). Refuses loudly on
    * a table whose live files predate tracking.
    *
    * Driver-memory class: a FULL-snapshot scan inherently enumerates
    * its file paths on the driver (the parquet relation is built from
    * the path list — Delta's scans hold the same structure), so this
    * path is O(snapshot paths) by nature; the per-file base-id pairs
    * broadcast with them. The paths whose driver footprint must not
    * scale with the table are the SELECTIVE ones, and there the
    * above-cap regime ([[readWherePruned]] via [[snapshotAsDf]])
    * decides the kept set distributedly and collects only survivors. */
  def readWithRowIds(spark: SparkSession, table: String,
                     version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, table)).getOrElse(
      sys.error(s"TxnLake.readWithRowIds: no committed version in $table"))
    val files = resolveFiles(spark, table, v)
    requireLive(spark, table, v, files)
    val entry = readEntry(spark, table, v)
    val schema = subsetReadSchema(spark, table, entry.schemaStruct, files)
    if (files.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(toDisplaySchema(schema, entry.renames).fields :+
          StructField(RidCol, LongType, nullable = true)))
    else scanFilesWithRid(spark, table, files, schema,
      resolveDvs(spark, table, v), entry.renames)
  }

  // ---- data skipping --------------------------------------------------

  /** Data-skipping scan: resolve the snapshot's file list, SKIP every file
    * whose commit-time column stats prove `predicate` cannot match, and
    * hand only the survivors to the parquet scan; the predicate is then
    * re-applied row-level, so pruning is purely an I/O reduction and
    * unsupported predicate shapes are conservatively kept. This is the
    * capability that makes a selective query on a 100 TB table open
    * thousands of files instead of millions — the reference's only pruning
    * is partitionBy(year, month) (process_bronze_to_silver.py:146);
    * per-file stats prune on ANY statted column at finer grain. */
  def readWhere(spark: SparkSession, table: String, predicate: Column,
                version: Option[Long] = None): DataFrame =
    readWherePruned(spark, table, predicate, version)._1

  /** [[readWhere]] plus the (files kept, files total) skipping counters
    * from the SAME single snapshot resolution — for callers that need the
    * scan and its pruning evidence together (the x39 probe), where a
    * separate [[skippingStats]] call would resolve the log and re-run the
    * stats matcher a second time per micro-batch. */
  def readWherePruned(spark: SparkSession, table: String, predicate: Column,
                      version: Option[Long] = None): (DataFrame, (Int, Int)) = {
    version.orElse(latestVersion(spark, table)) match {
      case None => (spark.emptyDataFrame, (0, 0))
      case Some(v) =>
        lastPruneDistributed = false
        // ABOVE-CAP regime: when the checkpoint's own row count exceeds
        // the cap (one footer read — no parse), the kept set is decided
        // by a distributed plan over the checkpoint table and the driver
        // holds only the SURVIVORS — O(files that may match), never
        // O(snapshot). Identical kept-set semantics: the executors run
        // the same conservative matcher on the same stats JSON.
        snapshotAsDf(spark, table, v, distributedPruneCap(spark)) match {
          case Some((fdf, total)) =>
            return readWhereDistributed(spark, table, v, predicate,
              fdf, total)
          case None => // below cap / no ckpt / legacy — driver path
        }
        val files = resolveFiles(spark, table, v)
        requireLive(spark, table, v, files)
        if (files.isEmpty) return (spark.emptyDataFrame, (0, 0))
        def abs(fms: Seq[FileMeta]) =
          fms.map(fm => new Path(table, fm.path).toString)
        // logged schema (when present) both evolves old files and lets the
        // predicate reference columns the SAMPLE file may predate
        val entry = readEntry(spark, table, v)
        val schema = entry.schemaStruct
        val ren = entry.renames
        def scan(paths: Seq[String]) = toDisplay(schema match {
          case Some(st) => spark.read.schema(st).parquet(paths: _*)
          case None => spark.read.parquet(paths: _*)
        }, ren)
        // the predicate references DISPLAY names; the matcher sees the
        // stats through the same display overlay (displayMeta)
        val pred = resolvedPredicate(spark, abs(files).head, predicate,
          schema.map(toDisplaySchema(_, ren)))
        val kept = files.filter(fm => mayMatch(displayMeta(ren)(fm), pred))
        val df =
          if (kept.isEmpty)
            // schema-preserving empty over ONE file: a single footer read
            // suffices for the schema — building the relation over the whole
            // snapshot would be an O(table) listing for a proven-empty result
            scan(Seq(abs(files).head)).where(lit(false))
          else scanFiles(spark, table, kept, schema,
              resolveDvs(spark, table, v), ren)
            .where(predicate)
        (df, (kept.size, files.size))
    }
  }

  /** (files kept, files total) under `predicate` at a version — the
    * data-skipping observability counter specs and gates assert on. */
  def skippingStats(spark: SparkSession, table: String, predicate: Column,
                    version: Option[Long] = None): (Int, Int) = {
    val v = version.orElse(latestVersion(spark, table))
    val files = snapshotFiles(spark, table, v)
    if (files.isEmpty) return (0, 0)
    val ren = v.map(renamesAt(spark, table, _)).getOrElse(Map.empty)
    val sample = new Path(table, files.head.path).toString
    val pred = resolvedPredicate(spark, sample, predicate,
      v.flatMap(loggedSchema(spark, table, _)).map(toDisplaySchema(_, ren)))
    (files.count(fm => mayMatch(displayMeta(ren)(fm), pred)), files.size)
  }

  /** Resolve `predicate` against the table's actual schema: build a probe
    * plan over one data file (footer-only — nothing executes) and pull the
    * ANALYZED filter condition out, so the matcher sees typed catalyst
    * comparisons (with the analyzer's implicit casts) instead of the lazy
    * unresolved column graph the public Column API carries. */
  private def resolvedPredicate(spark: SparkSession, sampleFile: String,
                                predicate: Column,
                                schema: Option[StructType] = None): Expression = {
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    val probe = reader.parquet(sampleFile).where(predicate)
    probe.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.headOption.getOrElse(Literal(true, BooleanType))
  }

  /** May `e` match at least one row of the file, judged against its
    * min/max/nullCount stats? Conservative: anything unrecognized keeps
    * the file. Supports the conjunctive/disjunctive range shapes Catalyst
    * pushes — the same dialect Delta's data skipping evaluates. */
  private[sources] def mayMatch(fm: FileMeta, e: Expression): Boolean = {
    def name(x: Expression): Option[String] = x match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(a.name)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    // literals, and analyzer-inserted casts AROUND literals (type
    // coercion wraps `k >= 12` as `k >= cast(12 as bigint)`): anything
    // foldable evaluates eagerly on the driver
    def litOf(x: Expression): Option[(Any, DataType)] = x match {
      case Literal(v, t) if v != null => Some((v, t))
      case c: Cast if c.foldable =>
        try Option(c.eval(null)).map(v => (v, c.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
    // literal rendered into the column's stat domain, or None → keep
    def rendered(cs: ColStats, v: Any, t: DataType): Option[String] =
      (cs.tag, t) match {
        case ("l", ByteType) => Some(v.asInstanceOf[Byte].toLong.toString)
        case ("l", ShortType) => Some(v.asInstanceOf[Short].toLong.toString)
        case ("l", IntegerType | DateType) =>
          Some(v.asInstanceOf[Int].toLong.toString)
        case ("l", LongType | TimestampType | TimestampNTZType) =>
          Some(v.asInstanceOf[Long].toString)
        case ("d", FloatType) => Some(v.asInstanceOf[Float].toDouble.toString)
        case ("d", DoubleType) => Some(v.asInstanceOf[Double].toString)
        case ("d", IntegerType) => Some(v.asInstanceOf[Int].toDouble.toString)
        case ("d", LongType) => Some(v.asInstanceOf[Long].toDouble.toString)
        case ("s", StringType) => Some(v.toString)
        case _ => None
      }
    // compare stats bounds against the literal: Some((cmp(min, v), cmp(max, v)))
    def bounds(col: String, v: Any, t: DataType): Option[(Int, Int)] =
      for {
        cs <- fm.stats.get(col)
        mn0 <- cs.min
        mx0 <- cs.max
        lv <- rendered(cs, v, t)
      } yield {
        // ±0.0 guard: parquet-mr normalizes float bounds to min=-0.0 /
        // max=+0.0, but Double.compare orders -0.0 < 0.0, so a foreign
        // writer emitting max=-0.0 would let `d === 0.0` prune a file
        // whose -0.0 rows Spark treats as equal. Widen zero bounds before
        // comparing; IEEE `== 0.0` matches both signs.
        val mn = if (cs.tag == "d" && mn0.toDouble == 0.0) "-0.0" else mn0
        val mx = if (cs.tag == "d" && mx0.toDouble == 0.0) "0.0" else mx0
        (cmpStat(cs.tag, mn, lv), cmpStat(cs.tag, mx, lv))
      }
    def cmpTest(a: Expression, b: Expression)(attrOp: ((Int, Int)) => Boolean)(
        litOp: ((Int, Int)) => Boolean): Boolean =
      (name(a), litOf(b), name(b), litOf(a)) match {
        case (Some(c), Some((v, t)), _, _) =>
          bounds(c, v, t).forall(attrOp)
        case (_, _, Some(c), Some((v, t))) =>
          bounds(c, v, t).forall(litOp)
        case _ => true
      }
    e match {
      case And(l, r) => mayMatch(fm, l) && mayMatch(fm, r)
      case Or(l, r) => mayMatch(fm, l) || mayMatch(fm, r)
      case EqualTo(a, b) =>
        cmpTest(a, b) { case (mnC, mxC) => mnC <= 0 && mxC >= 0 } {
          case (mnC, mxC) => mnC <= 0 && mxC >= 0 }
      case GreaterThan(a, b) => // attr > v: max > v | v > attr: min < v
        cmpTest(a, b)(_._2 > 0)(_._1 < 0)
      case GreaterThanOrEqual(a, b) =>
        cmpTest(a, b)(_._2 >= 0)(_._1 <= 0)
      case LessThan(a, b) => // attr < v: min < v | v < attr: max > v
        cmpTest(a, b)(_._1 < 0)(_._2 > 0)
      case LessThanOrEqual(a, b) =>
        cmpTest(a, b)(_._1 <= 0)(_._2 >= 0)
      case In(a, list) if list.forall(litOf(_).isDefined) =>
        name(a) match {
          case Some(c) => list.exists { l =>
            val (v, t) = litOf(l).get
            bounds(c, v, t).forall { case (mnC, mxC) => mnC <= 0 && mxC >= 0 }
          }
          case None => true
        }
      case IsNull(a) =>
        name(a).flatMap(fm.stats.get) match {
          case Some(cs) if cs.nullCount >= 0 => cs.nullCount > 0
          case _ => true
        }
      case IsNotNull(a) =>
        name(a).flatMap(fm.stats.get) match {
          case Some(cs) if cs.nullCount >= 0 && fm.rows >= 0 =>
            cs.nullCount < fm.rows
          case _ => true
        }
      case Literal(b: Boolean, BooleanType) => b
      case _ => true
    }
  }

  // ---- change data feed -----------------------------------------------

  /** Change-data-feed between two committed versions — Delta's
    * `table_changes` read path as a library API: one row per changed row
    * with every table column plus `change_type` (`insert` /
    * `update_preimage` / `update_postimage` / `delete`), keyed by `key`.
    * Row identity is the key; non-key columns compare null-safely, so an
    * unchanged row emits nothing.
    *
    * Scale: ONE full-outer hash join on the key across the two snapshot
    * scans — the cost Delta pays to materialize CDF without per-commit
    * change files; classification is a per-row when-chain on the joined
    * result (a production lake adds change files to make this
    * O(changes)). */
  def changeFeed(spark: SparkSession, table: String, preVersion: Long,
                 postVersion: Long, key: String): DataFrame =
    keyedDiff(readVersion(spark, table, preVersion),
      readVersion(spark, table, postVersion), key)

  /** The CDF classification join itself — one full-outer hash join on
    * `key` between a pre and a post relation, each changed row emitted as
    * insert / delete / update pre+post-image. Shared by the snapshot-diff
    * [[changeFeed]] and the touched-files-only merge/update hops of
    * [[tableChanges]] (same classification, O(touched) input). */
  private def keyedDiff(pre: DataFrame, post: DataFrame,
                        key: String): DataFrame = {
    import org.apache.spark.sql.functions.{array, col, explode, lit, struct, when}
    val cols = post.columns.toSeq
    require(cols.contains(key), s"TxnLake.changeFeed: no column $key in $cols")
    def side(a: String, ct: String) = struct(
      cols.map(c => col(s"$a.$c").as(c)) :+ lit(ct).as("change_type"): _*)
    val changed = cols.filterNot(_ == key)
      .map(c => !(col(s"p.$c") <=> col(s"q.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    pre.as("p")
      .join(post.as("q"), col(s"p.$key") === col(s"q.$key"), "full_outer")
      .select(explode(
        when(col(s"p.$key").isNull, array(side("q", "insert")))
          .when(col(s"q.$key").isNull, array(side("p", "delete")))
          .when(changed,
            array(side("p", "update_preimage"), side("q", "update_postimage")))
          .otherwise(lit(null))).as("c"))
      .select(cols.map(c => col(s"c.$c")) :+ col("c.change_type"): _*)
  }

  /** The rows version `v`'s LIVE DV map newly masks relative to
    * `v-1` — the pre-images of a merge-on-read hop ([[deleteWhereDv]],
    * [[updateWhereDv]]) — read RAW (no masks: the masked rows
    * themselves) from exactly the touched files via `readFiles`. None
    * when `v` masks nothing new. O(touched files + fresh positions). */
  private def newlyMasked(spark: SparkSession, table: String, v: Long,
                          e: Entry,
                          readFiles: (Seq[String], Map[String, DvRef])
                            => DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.functions.col
    val prev = resolveDvs(spark, table, v - 1)
    val f = fs(spark, new Path(table))
    val fresh: Seq[(String, Long)] = e.dvs.toSeq.flatMap {
      case (p, ref) =>
        if (prev.get(p).contains(ref)) Seq.empty // sidecar unchanged
        else {
          val old = prev.get(p).map(r =>
            readDvFile(f, new Path(table, r.path)).toSet)
            .getOrElse(Set.empty[Long])
          readDvFile(f, new Path(table, ref.path))
            .filterNot(old).map(new Path(p).getName -> _)
        }
    }
    if (fresh.isEmpty) None
    else {
      import spark.implicits._
      val touched = fresh.map(_._1).toSet
      val paths = resolveFiles(spark, table, v - 1)
        .map(_.path).filter(p => touched(new Path(p).getName))
      require(paths.map(new Path(_).getName).distinct.size ==
        paths.size, s"TxnLake: duplicate data-file names among the " +
        s"DV-hop files of $table@$v — the position join would " +
        "cross-apply masks")
      // readFiles is the META-carrying reader: the frame arrives with
      // its (__graft_dv_fn, __graft_dv_ri) coordinates attached inside
      // the scan (metadata columns cannot resolve above the row-id
      // scan's join)
      val base = readFiles(paths, Map.empty)
      Some(base.join(fresh.toDF("__graft_dv_fn", "__graft_dv_ri"),
          Seq("__graft_dv_fn", "__graft_dv_ri"), "left_semi")
        .drop("__graft_dv_fn", "__graft_dv_ri"))
    }
  }

  /** Delta's `table_changes` at O(changes-per-commit) cost — the scale
    * form of [[changeFeed]], which pays one full-outer join over TWO
    * whole snapshots regardless of how little changed. This walk reads
    * each commit's OWN add/remove delta from the log instead:
    *
    *  - "append": the added files ARE the inserts — scan only them;
    *  - "optimize" (data-preserving layout rewrite): no row changes,
    *    emit nothing, read nothing;
    *  - "delete": the removed files hold kept+deleted rows and the
    *    added files hold kept — one multiset EXCEPT over the touched
    *    files yields exactly the deleted rows, O(touched);
    *  - "merge"/"update" (copy-on-write DML): removed files are the
    *    pre-image and added files the post-image of exactly the touched
    *    scope — one keyed diff over them yields the commit's inserts,
    *    deletes, and update pre/post pairs at O(touched);
    *  - "overwrite"/"restore" (snapshot replacement — the one shape
    *    whose delta is not row-attributable from the log): fall back to
    *    the [[changeFeed]] snapshot diff for that single hop, with full
    *    update pre/post-image classification.
    *
    * So a feed over a day of appends+maintenance on a 100 TB table reads
    * only the day's files, never the table. Emits every table column
    * plus `change_type` and `commit_version` (one row set per commit in
    * (fromVersion, toVersion] — per-commit granularity, like Delta: a
    * row inserted then deleted inside the range appears TWICE, which the
    * net-effect [[changeFeed]] would collapse). All hops read under
    * `toVersion`'s logged schema (older files null-fill evolved
    * columns). Requires the range's versions to still be live
    * (vacuum-retained), like any time travel. */
  def tableChanges(spark: SparkSession, table: String, fromVersion: Long,
                   toVersion: Long, key: String): DataFrame =
    tableChangesImpl(spark, table, fromVersion, toVersion, key,
      byRid = false)

  /** [[tableChanges]] keyed by STABLE ROW IDENTITY instead of a user
    * key: every hop row carries [[RidCol]], and the merge/update and
    * snapshot-diff classifications pair pre/post images by row id — so
    * the pairing is EXACT even when every user column (the merge key
    * included) changed, and a rekeying update classifies as the UPDATE
    * it is rather than a delete+insert. No user key needed — the table
    * needs none to have a change feed. Requires row tracking across the
    * whole range (refuses loudly on files that predate it). */
  def tableChangesByRowId(spark: SparkSession, table: String,
                          fromVersion: Long, toVersion: Long): DataFrame =
    tableChangesImpl(spark, table, fromVersion, toVersion, RidCol,
      byRid = true)

  private def tableChangesImpl(spark: SparkSession, table: String,
                               fromVersion: Long, toVersion: Long,
                               key: String, byRid: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(fromVersion <= toVersion,
      s"TxnLake.tableChanges: $fromVersion > $toVersion")
    val schema = loggedSchema(spark, table, toVersion)
    // ONE display overlay for the whole range — the feed's consumer
    // unions hops column-by-column, so every hop must speak the SAME
    // (latest-requested) names even when a rename landed mid-range
    val ren = renamesAt(spark, table, toVersion)
    // the row-id read needs REAL FileMetas (their base row ids); the
    // plain read only needs paths. Pre-image paths resolve against the
    // PREVIOUS snapshot, post-image adds ride the entry itself.
    def readFms(fms: Seq[FileMeta],
                dvs: Map[String, DvRef] = Map.empty,
                keepMeta: Boolean = false): DataFrame =
      if (byRid) scanFilesWithRid(spark, table, fms,
        schema.getOrElse(sys.error(
          "TxnLake.tableChangesByRowId: legacy log carries no schema")),
        dvs, ren, keepMeta)
      else {
        import org.apache.spark.sql.functions.col
        val df = scanFiles(spark, table, fms, schema, dvs, ren)
        // the plain clean scan is join-free, so metadata columns still
        // resolve here — attach the coordinates for keepMeta callers
        if (keepMeta)
          df.withColumn("__graft_dv_fn", col("_metadata.file_name"))
            .withColumn("__graft_dv_ri", col("_metadata.row_index"))
        else df
      }
    // snapshot reads under the RANGE's overlay, not the version's own:
    // readVersion/readWithRowIds apply each era's display names, and a
    // snapshot-replacement hop read under pre-rename names would union
    // mismatched columns with the other hops (or fail keyedDiff's key
    // lookup outright). Physical names are stable, so reading an old
    // version's files under toVersion's overlay is exact.
    def snapAt(v: Long): DataFrame = {
      val files = resolveFiles(spark, table, v)
      requireLive(spark, table, v, files)
      val sch = loggedSchema(spark, table, v)
      if (files.isEmpty) {
        val base = sch.map(st => spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            toDisplaySchema(st, ren)))
          .getOrElse(spark.emptyDataFrame)
        if (byRid) base.withColumn(RidCol, lit(null).cast("long"))
        else base
      }
      else if (byRid) scanFilesWithRid(spark, table, files,
        subsetReadSchema(spark, table, sch, files),
        resolveDvs(spark, table, v), ren)
      else scanFiles(spark, table, files, sch,
        resolveDvs(spark, table, v), ren)
    }
    // snapshot-replacement diff (overwrite / restore / legacy entries)
    def snapDiff(v: Long): DataFrame =
      keyedDiff(snapAt(v - 1), snapAt(v), key)
    val hops = ((fromVersion + 1) to toVersion).flatMap { v =>
      val e = readEntry(spark, table, v)
      // ONE previous-snapshot resolution per hop: both pre-image readers
      // (CoW and DV) share it — the same repeated-log-replay bound the
      // DV DML paths carry (resolveDvs once per attempt)
      lazy val prevFiles: Seq[FileMeta] =
        if (byRid) resolveFiles(spark, table, v - 1) else Seq.empty
      def metasPrev(paths: Seq[String]): Seq[FileMeta] =
        if (!byRid) paths.map(FileMeta(_, -1L, Map.empty))
        else {
          val want = paths.toSet
          prevFiles.filter(fm => want(fm.path))
        }
      // pre-image reads carry the PREVIOUS version's deletion vectors: a
      // masked row was already deleted by its own earlier hop, so a
      // rewrite that materializes it away must not re-emit it here
      def readFiles(paths: Seq[String],
                    dvs: Map[String, DvRef] = Map.empty): DataFrame =
        readFms(metasPrev(paths), dvs)
      // the DV-hop pre-image reader: coordinates attached inside the scan
      def readFilesMeta(paths: Seq[String],
                        dvs: Map[String, DvRef]): DataFrame =
        readFms(metasPrev(paths), dvs, keepMeta = true)
      e.operation match {
        // legacy full-list entries carry the SNAPSHOT, not a delta — their
        // op tag says "append" but add is empty, and shortcutting them as
        // empty appends would silently drop those commits' rows from the
        // feed; only the snapshot diff can attribute them
        case _ if e.legacyFiles.isDefined =>
          Some(snapDiff(v).withColumn("commit_version", lit(v)))
        case "optimize" => None
        case "metadata" => None // schema-only commit: no row changes
        case "append" if e.add.nonEmpty =>
          // the entry's dvs never mask a NORMAL append's own files (new
          // files are unmasked by construction — scanFiles takes the
          // clean fast path), but a shallow/deep CLONE's founding entry
          // references pre-masked files: its insert hop is files MINUS
          // masks, like every snapshot read of it
          Some(readFms(e.add, e.dvs)
            .withColumn("change_type", lit("insert"))
            .withColumn("commit_version", lit(v)))
        case "append" => None // empty append (txn-marker commit)
        case "delete" if e.remove.isEmpty =>
          // merge-on-read delete: no file moved — the hop's rows are the
          // POSITIONS this commit's DV map newly masks, read from exactly
          // the touched files (O(touched), like every other hop)
          newlyMasked(spark, table, v, e, readFilesMeta)
            .map(_.withColumn("change_type", lit("delete"))
              .withColumn("commit_version", lit(v)))
        case "delete" =>
          val removed = readFiles(e.remove,
            resolveDvs(spark, table, v - 1))
          val kept =
            if (e.add.nonEmpty) readFms(e.add)
            else removed.limit(0)
          Some(removed.exceptAll(kept)
            .withColumn("change_type", lit("delete"))
            .withColumn("commit_version", lit(v)))
        case "merge" | "update" =>
          // copy-on-write rewrite scoped to touched files: the removed
          // files are the pre-image, the added files the post-image, and
          // the keyed diff over JUST those files yields exactly the
          // commit's inserts / deletes / update pre+post pairs —
          // O(touched), never O(snapshot), with full classification
          // (carried-verbatim files appear on neither side by definition).
          // A MERGE-ON-READ update ([[updateWhereDv]]) moves no file out:
          // its pre-image is the rows the commit's DV map newly masks,
          // unioned in exactly like the DV-delete hop reads them
          val post =
            if (e.add.nonEmpty) readFms(e.add)
            else snapAt(v).limit(0)
          val cowPre =
            if (e.remove.nonEmpty) readFiles(e.remove,
              resolveDvs(spark, table, v - 1))
            else post.limit(0)
          val pre = newlyMasked(spark, table, v, e, readFilesMeta)
            .map(cowPre.unionByName(_)).getOrElse(cowPre)
          Some(keyedDiff(pre, post, key).withColumn("commit_version", lit(v)))
        case _ => // overwrite / restore: snapshot replacement — full diff
          Some(snapDiff(v).withColumn("commit_version", lit(v)))
      }
    }
    // allowMissingColumns: a fallback hop reads under ITS version's logged
    // schema, which may predate columns later hops carry — null-fill
    // rather than refuse the union (the read-time evolution semantics
    // every snapshot scan already has)
    hops.reduceOption(_.unionByName(_, allowMissingColumns = true)).getOrElse {
      val base = snapAt(toVersion).limit(0)
      val cols = base.columns.toSeq
      base.select(cols.map(col) :+ lit("").as("change_type")
        :+ lit(0L).as("commit_version"): _*).limit(0)
    }
  }

  /** Version whose commit recorded exactly (appId, batchId) — the
    * precise answer to "where did this batch's rows land?" that
    * [[lastTxn]]'s cumulative map cannot give. Newest-first scan
    * (replays ask about recent batches), BOUNDED by the cumulative
    * app→batch map each new-format entry carries: batch ids per app are
    * monotone in version order, so the first version whose map records
    * no batch ≥ `batchId` for `appId` proves no earlier version can
    * carry the marker either and the scan stops — cost is
    * O(versions since the batch landed), not O(table history), on
    * every crash-replay report. Legacy entries (no map) keep scanning:
    * there is nothing to prove absence with. */
  def txnVersion(spark: SparkSession, table: String, appId: String,
                 batchId: Long): Option[Long] = {
    val it = committedVersions(spark, table).reverseIterator
    while (it.hasNext) {
      val v = it.next()
      val e = readEntry(spark, table, v)
      if (e.txn.contains((appId, batchId))) return Some(v)
      if (e.hasTxns && e.txns.get(appId).forall(_ < batchId)) return None
    }
    None
  }

  /** Latest batch id recorded for `appId` in the table's transaction
    * state — the recovery read an at-least-once consumer performs on
    * restart to resume where it left off. O(1) log reads: the cumulative
    * app→batch map rides the last entry (legacy logs fall back to the
    * linear scan). */
  def lastTxn(spark: SparkSession, table: String, appId: String): Option[Long] = {
    val committed = committedVersions(spark, table)
    committed.lastOption.flatMap { last =>
      val e = readEntry(spark, table, last)
      if (e.hasTxns) e.txns.get(appId)
      else committed.flatMap(v => readEntry(spark, table, v).txn
        .filter(_._1 == appId).map(_._2)).maxOption
    }
  }

  // ---- merge ----------------------------------------------------------

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
    * delta). [[mergeInto]] IS the production refinement — it keys the
    * rewrite to the touched files only; this whole-snapshot form remains
    * for deltas wide enough that every file is touched anyway. */
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
          val others = delta.columns.filterNot(_ == key).toIndexedSeq
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

  /** MERGE INTO in its COPY-ON-WRITE form — the production upsert a
    * 100 TB lake runs daily, replacing [[merge]]'s whole-snapshot
    * rewrite: only the files whose commit-time stats (min/max, plus the
    * Bloom sidecar when the key column is bloom-indexed) admit at least
    * one delta key are rewritten; every other file carries into the new
    * snapshot with its physical path VERBATIM. Cost is O(touched files +
    * delta), never O(table) — on a key-clustered table a day's upsert
    * rewrites one cluster's files.
    *
    * Semantics (Delta's MERGE with matched→UPDATE SET *, not-matched→
    * INSERT *): a delta row whose `key` matches a current row replaces it
    * wholesale; unmatched delta rows insert; `key` must be unique within
    * the delta (refused loudly otherwise — Delta raises the same
    * multiple-matches error) and NULL delta keys always insert (SQL
    * equality never matches NULL). Scoping soundness: any file that
    * MIGHT contain a delta key is touched, so a key absent from every
    * touched file is absent from the table — the insert check needs only
    * the touched rows. The commit carries the "merge" tag: visible to
    * [[tableChanges]] as a touched-files keyed diff, and correctly NOT
    * data-preserving for the x40 index-trust model.
    *
    * Concurrency: read-modify-write pinned to its read version; a
    * concurrent commit forces a recompute from the fresh snapshot
    * (concurrent rows are never silently discarded), throwing
    * ConcurrentModificationException only after `maxAttempts` straight
    * conflicts. Returns the committed version. */
  def mergeInto(spark: SparkSession, delta: DataFrame, table: String,
                key: String, maxAttempts: Int = 10): Long =
    mergeIntoImpl(spark, delta, table, key, maxAttempts, () => ())

  /** Test seam: `beforeCommit` runs between the snapshot read and the
    * commit attempt (interleave a concurrent writer deterministically).
    *
    * Since the clause engine landed, this IS
    * `mergeIntoClauses(matched → UPDATE SET *, not-matched → INSERT *)`
    * — one rewrite path to audit, spec-pinned equivalent ("two-clause
    * mergeIntoClauses reproduces mergeInto exactly"). Only the
    * UPDATE-SET-star / INSERT-star contract lives here: the delta's schema must
    * match the table's exactly, duplicate keys are refused even on a
    * keys-only table, and an EMPTY delta still commits its (empty)
    * founding version — the historical behaviour callers pin. */
  private[sources] def mergeIntoImpl(spark: SparkSession, delta: DataFrame,
                                     table: String, key: String,
                                     maxAttempts: Int,
                                     beforeCommit: () => Unit): Long = {
    import org.apache.spark.sql.functions.{col, count, lit}
    require(delta.columns.contains(key),
      s"TxnLake.mergeInto: no column $key in ${delta.columns.toSeq}")
    val dupKeys = delta.filter(col(key).isNotNull).groupBy(key)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0,
      s"TxnLake.mergeInto: multiple delta rows share a $key — a matched " +
        "row would have no deterministic source (Delta's multiple-matches " +
        "error)")
    // re-run per attempt: a concurrent schema-evolving commit between
    // retries must fail this merge exactly as it would have on attempt 1
    def schemaCheck(base: Option[Long]): Unit = base.foreach { b =>
      val files = resolveFiles(spark, table, b)
      val schema = loggedSchema(spark, table, b)
      def sig(st: StructType) =
        st.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
      // the caller's delta speaks DISPLAY names — compare through the map
      val tblSchema = toDisplaySchema(schema.getOrElse(
        subsetReadSchema(spark, table, schema, files)),
        renamesAt(spark, table, b))
      require(sig(tblSchema) == sig(delta.schema),
        s"TxnLake.mergeInto: schema mismatch ${sig(tblSchema)} vs " +
          s"${sig(delta.schema)}")
    }
    val others = delta.columns.filterNot(_ == key).toIndexedSeq
    val matched =
      if (others.isEmpty) Seq.empty[MergeAction] // keys-only: nothing to SET
      else Seq(MergeUpdate(others.map(c => c -> sourceCol(c)).toMap))
    mergeIntoClausesImpl(spark, delta, table, key,
      matched = matched,
      notMatched = Seq(MergeInsert(
        delta.columns.toIndexedSeq.map(c =>
          c -> org.apache.spark.sql.functions.col(c)).toMap)),
      notMatchedBySource = Seq.empty,
      maxAttempts = maxAttempts, beforeCommit = beforeCommit,
      perAttempt = schemaCheck)
      .getOrElse {
        // historical contract: mergeInto always returns a committed
        // version. The clause engine's no-op None arises only when
        // nothing touches and nothing inserts (an empty delta, or a
        // keys-only delta whose keys all exist) — commit an EMPTY merge
        // version, never the delta itself (its rows already exist)
        commitImpl(spark, delta.limit(0), table, "merge", None, maxAttempts,
          removePaths = Some(Seq.empty))
          .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped"))
      }
  }

  // ---- clause-based MERGE ---------------------------------------------

  /** One WHEN clause of a [[mergeIntoClauses]] statement — Delta's full
    * MERGE clause surface as a library ADT. Reference conventions:
    * MATCHED and NOT-MATCHED-BY-SOURCE clause conditions and UPDATE SET
    * expressions see the TARGET row's columns by their bare names and
    * the source row's columns through [[sourceCol]] (Delta SQL's
    * `s.<col>`); NOT-MATCHED (insert) conditions and values see the
    * SOURCE row alone, bare names. A NULL condition never fires its
    * clause (SQL MERGE: only TRUE applies). */
  sealed trait MergeAction extends Serializable

  /** WHEN [NOT] MATCHED [BY SOURCE] [AND condition] THEN UPDATE SET … —
    * `set` maps target columns to new-value expressions; columns absent
    * from the map keep their current value. The merge key itself is not
    * assignable (rekeying a matched row is a delete+insert, not an
    * update — Delta refuses it too). */
  final case class MergeUpdate(set: Map[String, Column],
                               condition: Option[Column] = None)
      extends MergeAction

  /** WHEN [NOT] MATCHED [BY SOURCE] [AND condition] THEN DELETE. */
  final case class MergeDelete(condition: Option[Column] = None)
      extends MergeAction

  /** WHEN NOT MATCHED [AND condition] THEN INSERT … — `values` maps
    * target columns to expressions over the SOURCE row; target columns
    * absent from the map insert as NULL (Delta's partial INSERT). */
  final case class MergeInsert(values: Map[String, Column],
                               condition: Option[Column] = None)
      extends MergeAction

  /** The source row's column `name` inside a MATCHED / NOT-MATCHED-BY-
    * SOURCE clause condition or SET expression — Delta SQL's `s.<name>`
    * alias rendered onto the internal join frame. */
  def sourceCol(name: String): Column =
    org.apache.spark.sql.functions.col(s"$MergeSourcePrefix$name")

  private val MergeSourcePrefix = "__s_"

  /** Deterministic order for caller-supplied column SETS (a founding
    * merge's schema, evolveSchema's new columns): source column order
    * first, then the rest sorted — never Map iteration order, which
    * scrambles past 4 entries and would lay tables out positionally
    * different from their source. */
  private def orderedBySource(srcCols: Seq[String],
                              names: Set[String]): IndexedSeq[String] = {
    val inSrc = srcCols.filter(names.contains).toIndexedSeq
    inSrc ++ names.diff(inSrc.toSet).toSeq.sorted
  }

  /** MERGE INTO with Delta's FULL clause surface — the CDC-apply form of
    * [[mergeInto]] (which is exactly the two-clause
    * matched→UPDATE-SET-*, not-matched→INSERT-* special case): ordered
    * conditional WHEN MATCHED THEN UPDATE/DELETE clauses, WHEN NOT
    * MATCHED THEN INSERT clauses, and WHEN NOT MATCHED BY SOURCE THEN
    * UPDATE/DELETE clauses. This is what replaces the reference's
    * overwrite-everything refresh (process_silver_to_gold.py:149) at
    * 100 TB: a change feed with tombstones applies in one transaction as
    * `matched AND op='D' → DELETE, matched → UPDATE, not-matched AND
    * op<>'D' → INSERT`, and a replica reconciles against its
    * source-of-truth without a full rewrite via NOT MATCHED BY SOURCE.
    *
    * Semantics (Delta's): within each group the FIRST clause whose
    * condition is TRUE applies and the rest are skipped; a row no clause
    * claims carries verbatim (matched / not-matched-by-source) or is
    * ignored (not-matched source row). Every clause before the last in
    * a group must carry a condition — an earlier unconditional clause
    * would make the rest unreachable, refused loudly. Source keys must
    * be unique when MATCHED clauses exist (Delta's multiple-matches
    * error: an update would have no deterministic source row); NULL
    * source keys never match (SQL equality) and flow to the insert
    * group.
    *
    * Copy-on-write scoping, the 100 TB contract: the rewrite touches
    * the union of (a) WHEN MATCHED clauses exist, files whose
    * stats/Bloom sidecar admit at least one source key — only matched
    * clauses can change those rows, so an INSERT-ONLY merge rewrites
    * NOTHING even when source keys overlap existing files (Delta's
    * insert-only MERGE; the key-scoped files are still READ, key column
    * only, for the insert existence check, which stays sound because
    * any key absent from all of them is absent from the table) — and
    * (b) for the NOT-MATCHED-BY-SOURCE group, files whose stats admit
    * the OR of the group's conditions, because a row unmatched by the
    * source can live in ANY file: the clause conditions are the only
    * thing that scopes it. An unconditional NOT-MATCHED-BY-SOURCE clause therefore
    * rewrites the whole table — that is its semantics (every unmatched
    * row changes), the same cost Delta pays; give the clause a
    * condition to keep the merge O(touched). A condition referencing
    * [[sourceCol]] columns cannot prune files (those rows' source side
    * is all-NULL anyway) and falls back to full scope. Untouched files
    * carry into the new snapshot with their physical paths VERBATIM.
    * The key collect itself is bounded by the probe tier's
    * `graft.probe.maxDriverKeys` threshold (default 1M): a backfill or
    * bootstrap merge whose source rivals the table skips the collect
    * and takes full scope — which is what such a merge rewrites anyway
    * — so the driver term never outgrows a day's volume.
    *
    * The commit carries the "merge" tag: NOT data-preserving for the
    * x40 index-trust model, and [[tableChanges]] classifies the hop as
    * a touched-files keyed diff — inserts, deletes, and update
    * pre/post-image pairs at O(touched), tombstone deletes included.
    *
    * Returns None without committing when nothing could change (no file
    * in scope and no insert row). Concurrency: read-modify-write pinned
    * to its read version; a concurrent commit forces a recompute from
    * the fresh snapshot (never silently discarding the concurrent
    * rows), throwing ConcurrentModificationException after
    * `maxAttempts` straight conflicts.
    *
    * `txn` makes the merge an EXACTLY-ONCE transaction (the Delta
    * SetTransaction idiom [[commitOnce]] gives appends): a replayed
    * (appId, batchId) finds its marker and returns None without
    * re-applying — what lets a crashed streaming replication consumer
    * ([[graft.streaming.TxnReplicaFeed]]) replay its last version
    * safely even though a clause merge is NOT naturally idempotent
    * (re-applying an old batch after a newer one would regress rows).
    * With `txn` set, a provable no-op against an EXISTING table still
    * commits (an empty rewrite) so the marker is recorded and the
    * consumer's offset advances across maintenance hops that change no
    * rows; a founding no-op stays None (no schema to commit).
    *
    * `evolveSchema` (Delta's merge-time `autoMerge`): UPDATE SET and
    * INSERT may assign columns the target does not have yet. The commit
    * merges them into the LOG-CARRIED cumulative schema (the x36
    * machinery), so evolution composes with carry-verbatim: untouched
    * files keep their physical bytes and simply null-fill the new
    * columns under the logged read schema; rows the clauses did not
    * assign read NULL; pre-merge versions still time-travel under their
    * own (narrower) logged schema. Off (default), an unknown column is
    * refused loudly. */
  def mergeIntoClauses(spark: SparkSession, source: DataFrame, table: String,
                       key: String,
                       matched: Seq[MergeAction] = Seq.empty,
                       notMatched: Seq[MergeInsert] = Seq.empty,
                       notMatchedBySource: Seq[MergeAction] = Seq.empty,
                       maxAttempts: Int = 10,
                       txn: Option[(String, Long)] = None,
                       evolveSchema: Boolean = false,
                       gcTxnPrefixes: Seq[String] = Seq.empty): Option[Long] =
    mergeIntoClausesImpl(spark, source, table, key, matched, notMatched,
      notMatchedBySource, maxAttempts, () => (), txn,
      evolveSchema = evolveSchema, gcTxnPrefixes = gcTxnPrefixes)

  /** Test seam: `beforeCommit` runs between the snapshot read and the
    * commit attempt (interleave a concurrent writer deterministically). */
  private[sources] def mergeIntoClausesImpl(spark: SparkSession,
                                            source: DataFrame, table: String,
                                            key: String,
                                            matched: Seq[MergeAction],
                                            notMatched: Seq[MergeInsert],
                                            notMatchedBySource: Seq[MergeAction],
                                            maxAttempts: Int,
                                            beforeCommit: () => Unit,
                                            txn: Option[(String, Long)] = None,
                                            perAttempt: Option[Long] => Unit = _ => (),
                                            evolveSchema: Boolean = false,
                                            gcTxnPrefixes: Seq[String] =
                                              Seq.empty): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, when}
    require(matched.nonEmpty || notMatched.nonEmpty
      || notMatchedBySource.nonEmpty,
      "TxnLake.mergeIntoClauses: no WHEN clauses")
    require(source.columns.contains(key),
      s"TxnLake.mergeIntoClauses: no column $key in ${source.columns.toSeq}")
    def condOf(a: MergeAction): Option[Column] = a match {
      case MergeUpdate(_, c) => c
      case MergeDelete(c) => c
      case MergeInsert(_, c) => c
    }
    def checkGroup(group: String, cs: Seq[MergeAction]): Unit = {
      cs.foreach {
        case u: MergeUpdate =>
          require(!u.set.contains(key),
            s"TxnLake.mergeIntoClauses: the merge key $key is not " +
              "assignable in an UPDATE SET")
          require(u.set.nonEmpty,
            s"TxnLake.mergeIntoClauses: empty UPDATE SET in $group")
        case _: MergeInsert => require(group == "NOT MATCHED",
          s"TxnLake.mergeIntoClauses: the $group group cannot INSERT")
        case _: MergeDelete => ()
      }
      cs.map(condOf).dropRight(1).zipWithIndex.foreach { case (c, i) =>
        require(c.isDefined,
          s"TxnLake.mergeIntoClauses: clause ${i + 1} of $group has no " +
            "condition but is not last — later clauses would be unreachable")
      }
    }
    checkGroup("MATCHED", matched)
    checkGroup("NOT MATCHED", notMatched)
    checkGroup("NOT MATCHED BY SOURCE", notMatchedBySource)
    // the engine's internal tag/marker columns — a data column with one
    // of these names would be silently overwritten in the rewrite frame,
    // so collisions are refused loudly instead
    def requireNotReserved(where: String, cols: Iterable[String]): Unit =
      cols.foreach(c => require(
        c != "__act" && c != "__iact" && c != "__m" && c != RidCol
          && !c.startsWith(MergeSourcePrefix),
        s"TxnLake.mergeIntoClauses: $where column $c collides with the " +
          s"engine's reserved names " +
          s"(__act/__iact/__m/$RidCol/$MergeSourcePrefix*)"))
    requireNotReserved("source", source.columns)
    def condTrue(c: Option[Column]): Column =
      c.map(x => coalesce(x, lit(false))).getOrElse(lit(true))
    // source feeds the key collect, the rewrite join, and the insert
    // anti-join — pin it once rather than recompute the upstream thrice
    val src = org.apache.spark.sql.GraftCheckpointShim
      .dropCarriedStats(source.localCheckpoint())
    // the DML scoping planner rule — the probe tier's
    // graft.probe.maxDriverKeys threshold applied to the merge keys:
    // collect them (to stats/bloom-prune the copy-on-write scope) only
    // while the count is driver-collectable; beyond it — a backfill or
    // bootstrap merge whose source rivals the table — None means full
    // scope, which is what such a merge rewrites anyway. Never a driver
    // OOM, identical rows either way.
    //
    // Round-19 optimization (guide §1.2): the multiple-matches check and
    // the key collect used to be TWO jobs, each its own groupBy pass
    // over the source — one grouped pass now carries both the distinct
    // keys and their multiplicities. Grouping stays on the NATIVE key
    // (the dup check's exact domain — two distinct natives with one
    // string rendering must not read as a dup) and the rendering is the
    // same Spark cast the old collect used. When the limit truncates
    // (backfill-sized source, keys = None), the page we saw can't prove
    // no-dup, so the old dedicated dup job runs — the rare path keeps
    // the exact semantics at its pre-existing cost.
    val keyCap = spark.conf.getOption("graft.probe.maxDriverKeys")
      .map(_.toLong).getOrElse(1000000L)
    // clamp BEFORE the +1: a Long.MaxValue cap must mean "collect up to
    // the Int ceiling", not overflow to limit(0) and misread every
    // source row as new
    val lim = (math.min(math.max(keyCap, 0L),
      (Int.MaxValue - 2).toLong) + 1).toInt
    val grouped = src.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .select(col(key).cast("string"), col("__n"))
      .limit(lim).collect()
    val sawAllGroups = grouped.length < lim
    if (matched.nonEmpty) {
      val dup =
        if (sawAllGroups) grouped.exists(_.getLong(1) > 1)
        else src.filter(col(key).isNotNull).groupBy(key)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .limit(1).count() > 0
      require(!dup,
        s"TxnLake.mergeIntoClauses: multiple source rows share a $key — a " +
          "matched row would have no deterministic clause source (Delta's " +
          "multiple-matches error)")
    }
    val keys: Option[Seq[String]] =
      if (grouped.length > keyCap) None
      else Some(grouped.map(_.getString(0)).toSeq)
    // NOT MATCHED rows per clause, projected onto the target schema
    // (provided expressions uncast — a type mismatch is refused loudly by
    // the commit's schema merge, never silently coerced; absent columns
    // null-fill at the target type)
    // `extra` = evolveSchema columns beyond the target schema: typed by
    // whichever clause assigns them (an unassigned branch contributes
    // NULLs and the union's type coercion resolves them against the
    // assigning branch)
    def insertRows(rows: DataFrame, target: StructType,
                   extra: Seq[String]): DataFrame = {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], target)
      if (notMatched.isEmpty) empty
      else {
        val act = notMatched.zipWithIndex
          .foldRight(lit(-1): Column) { case ((c, i), rest) =>
            when(condTrue(c.condition), lit(i)).otherwise(rest) }
        val tagged = rows.withColumn("__iact", act)
        notMatched.zipWithIndex.map { case (c, i) =>
          tagged.filter(col("__iact") === i).select(
            target.fields.map { f =>
              c.values.getOrElse(f.name,
                lit(null).cast(f.dataType)).as(f.name)
            }.toIndexedSeq ++
            extra.map(n => c.values.getOrElse(n, lit(null)).as(n)): _*)
        }.reduce(_ unionByName _)
      }
    }
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table)
      // caller-contract re-validation under the CURRENT base — a retry
      // after a concurrent commit must re-check what the first attempt
      // checked (mergeInto's exact-schema contract), not trust a
      // pre-loop snapshot of it
      perAttempt(base)
      val out: Option[(DataFrame, Seq[String], Boolean)] = base match {
        case None => // founding merge: the INSERT clauses define the schema
          require(notMatched.nonEmpty,
            "TxnLake.mergeIntoClauses: a founding merge on an absent table " +
              "needs a NOT MATCHED INSERT clause")
          val keySet = notMatched.head.values.keySet
          val names = orderedBySource(src.columns.toIndexedSeq, keySet)
          notMatched.foreach(c => require(c.values.keySet == keySet,
            "TxnLake.mergeIntoClauses: all INSERT clauses must assign the " +
              "same columns on a founding merge (they define the schema)"))
          requireNotReserved("founding", names)
          val act = notMatched.zipWithIndex
            .foldRight(lit(-1): Column) { case ((c, i), rest) =>
              when(condTrue(c.condition), lit(i)).otherwise(rest) }
          val tagged = src.withColumn("__iact", act)
          val ins = notMatched.zipWithIndex.map { case (c, i) =>
            tagged.filter(col("__iact") === i)
              .select(names.map(n => c.values(n).as(n)): _*)
          }.reduce(_ unionByName _)
          // with a txn marker, even an empty FOUNDING merge must commit:
          // the marker is the consumer's offset (a replication consumer
          // bootstrapping from an empty source snapshot would otherwise
          // land nothing and re-pay the founding decision every poll —
          // the existing-table branch already has this rule). The INSERT
          // clauses still define the schema, so the empty table founds
          // typed. txn checked FIRST: the emptiness probe is a Spark job
          // whose answer the marker path ignores.
          if (txn.isDefined || !ins.isEmpty) Some((ins, Seq.empty, false))
          else None
        case Some(b) =>
          val files = resolveFiles(spark, table, b)
          requireLive(spark, table, b, files)
          val baseEntry = readEntry(spark, table, b)
          val schema = baseEntry.schemaStruct
          val ren = baseEntry.renames
          val readSchema = subsetReadSchema(spark, table, schema, files)
          // the clause surface speaks DISPLAY names; physical stays in
          // the files/stats and commitImpl translates the result back
          val displaySchema = toDisplaySchema(readSchema, ren)
          val targetCols = displaySchema.fieldNames.toIndexedSeq
          require(targetCols.contains(key),
            s"TxnLake.mergeIntoClauses: no column $key in target $targetCols")
          requireNotReserved("target", targetCols)
          (matched ++ notMatchedBySource).foreach {
            case MergeUpdate(set, _) => set.keys.foreach(k =>
              require(evolveSchema || targetCols.contains(k),
                s"TxnLake.mergeIntoClauses: SET references unknown column " +
                  s"$k (pass evolveSchema = true to add it)"))
            case _ => ()
          }
          notMatched.foreach(c => c.values.keys.foreach(k =>
            require(evolveSchema || targetCols.contains(k),
              s"TxnLake.mergeIntoClauses: INSERT references unknown " +
                s"column $k (pass evolveSchema = true to add it)")))
          // evolveSchema: columns the clauses assign beyond the target
          // schema, in deterministic order (source order, then sorted) —
          // they join the LOG-CARRIED schema at the commit, and carried
          // files null-fill them under the logged read schema
          val assigned = ((matched ++ notMatchedBySource).flatMap {
            case MergeUpdate(set, _) => set.keys
            case _ => Nil
          } ++ notMatched.flatMap(_.values.keys)).toSet
          val newCols: Seq[String] = orderedBySource(
            src.columns.toIndexedSeq, assigned.diff(targetCols.toSet))
          requireNotReserved("evolved", newCols)
          val keyTouched = keys match {
            case Some(ks) if ks.isEmpty => Seq.empty[FileMeta]
            case Some(ks) =>
              files.filter(fileMayContainKeys(spark, table, _,
                physicalOf(spark, ren, key), ks))
            case None => files // beyond the key cap: full scope
          }
          val nmbsTouched: Seq[FileMeta] =
            if (notMatchedBySource.isEmpty || files.isEmpty) Seq.empty
            else {
              val conds = notMatchedBySource.map(condOf)
              if (conds.exists(_.isEmpty)) files
              else {
                val pred = conds.flatten.reduce(_ || _)
                val sample = new Path(table, files.head.path).toString
                // a sourceCol-referencing condition cannot resolve against
                // a bare target file — conservative full scope
                try {
                  val p = resolvedPredicate(spark, sample, pred,
                    schema.map(toDisplaySchema(_, ren)))
                  files.filter(fm => mayMatch(displayMeta(ren)(fm), p))
                } catch { case _: Exception => files }
              }
            }
          // files that REWRITE: matched clauses can only change rows in
          // key-scoped files, NMBS clauses only in condition-scoped files
          // — an insert-only merge rewrites NOTHING (Delta's insert-only
          // MERGE), even when source keys overlap existing files; those
          // files are still READ (key column only) for the insert
          // existence check
          val rewriteFiles =
            ((if (matched.isEmpty) Seq.empty[FileMeta] else keyTouched)
              ++ nmbsTouched).distinctBy(_.path)
          // the insert anti-join's existence set: every file that might
          // hold a source key — sound because any key absent from all of
          // them is absent from the table
          def insertsVsExisting(): DataFrame = {
            val anti =
              if (keyTouched.isEmpty) src
              else src.join(
                scanFiles(spark, table, keyTouched, Some(readSchema),
                  resolveDvs(spark, table, b), ren).select(col(key)),
                Seq(key), "left_anti")
            insertRows(anti, displaySchema, newCols)
          }
          val inserts = insertsVsExisting()
          // with a txn marker, even a no-op must commit — the marker is
          // the consumer's offset, and a maintenance hop that changes no
          // rows still has to advance it (txn checked FIRST: the
          // emptiness probe is a Spark job whose answer the marker path
          // ignores)
          if (rewriteFiles.isEmpty && txn.isEmpty && inserts.isEmpty) None
          else {
            // an empty typed frame stands in for cur when nothing
            // rewrites: zero I/O, and the update-clause when-chains
            // still TYPE any evolved column the insert branches left as
            // NullType (an all-new-keys batch must not crash the
            // parquet write that an overlapping batch survives)
            val (cur, carry) =
              if (rewriteFiles.isEmpty)
                (spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  displaySchema), false)
              else scanForRewrite(spark, table, rewriteFiles, readSchema,
                resolveDvs(spark, table, b), ren)
            val srcRenamed = src.columns.foldLeft(src)((d, c) =>
              d.withColumnRenamed(c, MergeSourcePrefix + c))
            // without MATCHED clauses the join only needs the MARKER, so
            // it joins distinct keys — duplicate source keys (legal on an
            // insert-only/NMBS merge) must never fan out target rows
            val srcJoin =
              (if (matched.nonEmpty) srcRenamed
               else srcRenamed.select(col(MergeSourcePrefix + key)).distinct())
                .withColumn("__m", lit(true))
            val joined = cur.join(srcJoin,
              col(key) === col(MergeSourcePrefix + key), "left")
            val isM = coalesce(col("__m"), lit(false))
            def actChain(prefix: String, cs: Seq[MergeAction]): Column =
              cs.zipWithIndex.foldRight(lit("keep"): Column) {
                case ((a, i), rest) =>
                  when(condTrue(condOf(a)), lit(s"$prefix$i")).otherwise(rest)
              }
            val act = when(isM, actChain("m", matched))
              .otherwise(actChain("n", notMatchedBySource))
            val deletes =
              matched.zipWithIndex.collect {
                case (_: MergeDelete, i) => s"m$i" } ++
              notMatchedBySource.zipWithIndex.collect {
                case (_: MergeDelete, i) => s"n$i" }
            val updates: Seq[(String, Map[String, Column])] =
              matched.zipWithIndex.collect {
                case (u: MergeUpdate, i) => s"m$i" -> u.set } ++
              notMatchedBySource.zipWithIndex.collect {
                case (u: MergeUpdate, i) => s"n$i" -> u.set }
            val tagged = joined.withColumn("__act", act)
            val kept = if (deletes.isEmpty) tagged
              else tagged.filter(!col("__act").isin(deletes: _*))
            val rewritten = kept.select(targetCols.map { n =>
              updates.filter(_._2.contains(n))
                .foldRight(col(n)) { case ((tag, set), rest) =>
                  when(col("__act") === tag, set(n)).otherwise(rest)
                }.as(n)
            } ++ newCols.map { n => // evolved: unassigned rows read NULL
              updates.filter(_._2.contains(n))
                .foldRight(lit(null): Column) { case ((tag, set), rest) =>
                  when(col("__act") === tag, set(n)).otherwise(rest)
                }.as(n)
            } ++ (if (carry) Seq(col(RidCol)) else Seq.empty): _*)
            // merge-minted inserts leave the materialized id NULL: they
            // draw fresh virtual ids from the new file's base range,
            // while the carried rows' materialized ids take precedence
            val insertsRid =
              if (carry) inserts.withColumn(RidCol, lit(null).cast("long"))
              else inserts
            val out0 = rewritten.unionByName(insertsRid,
              allowMissingColumns = evolveSchema)
            // pure-insert merges keep the batch's own partitioning — a
            // repartition(1) would funnel a large insert into one file
            val out1 = if (rewriteFiles.isEmpty) out0
              else out0.repartition(rewriteFiles.size)
            Some((out1, rewriteFiles.map(_.path), carry))
          }
      }
      out match {
        case None => return None
        case Some((df, removed, carry)) =>
          beforeCommit()
          try return commitImpl(spark, df, table, "merge", txn,
              maxAttempts = 1, requireBase = Some(base),
              removePaths = Some(removed), carryRids = carry,
              gcTxnPrefixes = gcTxnPrefixes) match {
            case Some(v) => Some(v)
            case None => // replay: the (appId, batchId) marker exists
              require(txn.isDefined,
                "unreachable: txn-less commit cannot be skipped")
              None
          }
          catch { case _: CommitConflict => attempt += 1 }
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.mergeIntoClauses: $maxAttempts consecutive concurrent " +
        s"commits on $table")
  }

  // ---- optimize -------------------------------------------------------

  /** OPTIMIZE as a transaction — Delta's `OPTIMIZE [ZORDER BY]`: rewrite
    * the current snapshot into `numFiles` files (optionally Z-order
    * clustered on two dimensions via [[graft.operators.ZOrder]], or
    * range-clustered on one), committed as a data-preserving "optimize"
    * entry that removes every pre-rewrite file and adds the rewritten
    * ones. Because it goes through the log: concurrent readers keep their
    * snapshots, pre-optimize versions still time-travel, vacuum reclaims
    * the replaced files, and a concurrent commit is detected via the
    * pinned read version and triggers a recompute (Delta aborts instead;
    * recompute is always safe here because the rewrite re-reads the whole
    * snapshot). `Storage.Compaction` performs the same bin-packing OUTSIDE
    * any log — on a TxnLake table that would corrupt snapshot isolation;
    * this is the in-log form.
    *
    * Scale: one full shuffle of the snapshot (range, for clustering) — the
    * price OPTIMIZE always pays; clustering makes the rewritten files'
    * min/max stats tight, which is what turns [[readWhere]]'s pruning from
    * partition-grain to file-grain. */
  def optimize(spark: SparkSession, table: String,
               zorderBy: Seq[String] = Seq.empty, numFiles: Int = 4,
               maxAttempts: Int = 10): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table)
        .getOrElse(sys.error(s"TxnLake.optimize: no committed version in $table"))
      val files = resolveFiles(spark, table, base)
      requireLive(spark, table, base, files)
      val baseEntry = readEntry(spark, table, base)
      val schema = subsetReadSchema(spark, table,
        baseEntry.schemaStruct, files)
      // a whole-snapshot OPTIMIZE is also how a pre-tracking table
      // BACKFILLS row ids — with all-or-nothing semantics (the
      // scanForRewrite seam's contract): if EVERY file already tracks,
      // the rewrite carries ids verbatim; if ANY file predates tracking,
      // the whole snapshot rewrites untracked and every row — including
      // rows whose old files carried materialized ids — draws a fresh
      // virtual id from the new files' base ranges. Partial carry is
      // deliberately not attempted: mixing carried ids with fresh ones
      // in one rewrite would make "ids are stable from version V on" a
      // per-row property instead of a table property, and mixed-era
      // snapshots only arise from pre-r18 logs in the first place.
      val (snap, carry) = scanForRewrite(spark, table, files, schema,
        resolveDvs(spark, table, base), baseEntry.renames)
      val rewritten = clusterFor(snap, zorderBy, numFiles)
      try return commitImpl(spark, rewritten, table, "optimize", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          carryRids = carry)
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped"))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.optimize: $maxAttempts consecutive concurrent commits on $table")
  }

  /** The layout a (scoped or whole-snapshot) OPTIMIZE writes: K-dim
    * Z-order interleave for 2+ cluster keys ([[graft.operators.ZOrder]]
    * — rank-quantized, distribution-robust), a range layout for one, and
    * plain bin-packing for none. */
  private def clusterFor(snap: DataFrame, zorderBy: Seq[String],
                         numFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    zorderBy match {
      case dims if dims.size >= 2 =>
        graft.operators.ZOrder.clusterByZN(snap, dims, partitions = numFiles)
          .drop("__z")
      case Seq(x) => snap.repartitionByRange(numFiles, col(x))
      case _ => snap.repartition(numFiles)
    }
  }

  /** Predicate-scoped OPTIMIZE — Delta's `OPTIMIZE t WHERE …`: rewrite
    * ONLY the snapshot files whose commit-time stats admit `predicate`
    * (judged by the same [[readWhere]] skipping matcher, so the scope is
    * conservative — an unstatted file counts as in-scope), cluster them
    * via `zorderBy`, and carry every out-of-scope file into the new
    * snapshot with its physical path verbatim. Files are rewritten WHOLE
    * — rows are never split by the predicate — so the row multiset is
    * preserved by construction. Returns None (no commit) when fewer than
    * two files are in scope: there is nothing to co-cluster, and a no-op
    * rewrite would churn versions forever under a periodic scheduler.
    *
    * This is how OPTIMIZE operates at 100 TB: maintenance runs
    * region-by-region (yesterday's partition, one tenant, one id range)
    * as separate bounded transactions — cost O(scoped bytes), never
    * O(table) — with the optimistic log (pinned read version, recompute
    * on conflict) serializing it against concurrent ingest, exactly as
    * [[compactSmallFiles]] does for size-scoped packing. */
  def optimizeWhere(spark: SparkSession, table: String, predicate: Column,
                    zorderBy: Seq[String] = Seq.empty, numFiles: Int = 4,
                    maxAttempts: Int = 10): Option[Long] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.optimizeWhere: no committed version in $table"))
      val files = resolveFiles(spark, table, base)
      if (files.isEmpty) return None
      requireLive(spark, table, base, files)
      val entry = readEntry(spark, table, base)
      val schema = entry.schemaStruct
      val ren = entry.renames
      val sample = new Path(table, files.head.path).toString
      val pred = resolvedPredicate(spark, sample, predicate,
        schema.map(toDisplaySchema(_, ren)))
      val scoped = files.filter(fm => mayMatch(displayMeta(ren)(fm), pred))
      if (scoped.size < 2) return None
      val (snap, carry) = scanForRewrite(spark, table, scoped,
        subsetReadSchema(spark, table, schema, files),
        resolveDvs(spark, table, base), ren)
      val rewritten = clusterFor(snap, zorderBy, numFiles)
      try return Some(commitImpl(spark, rewritten, table, "optimize", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(scoped.map(_.path)), carryRids = carry)
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped")))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.optimizeWhere: $maxAttempts consecutive concurrent commits " +
        s"on $table")
  }

  /** Schema for a PARTIAL-snapshot read inside a scoped rewrite
    * ([[optimizeWhere]], [[compactSmallFiles]]): the logged schema when
    * the log carries one; on a LEGACY log (no schemaJson yet), the
    * footer-merged schema of the WHOLE snapshot — never of the subset
    * being rewritten. The scoped commit records the table's FIRST
    * schemaJson, and a subset-derived schema would silently drop any
    * column that exists only in carried-over files: every later
    * logged-schema read would then hide that column's data (column-level
    * loss). One extra footer sweep, paid only on the one legacy-upgrade
    * commit. */
  private def subsetReadSchema(spark: SparkSession, table: String,
                               logged: Option[StructType],
                               snapshot: => Seq[FileMeta]): StructType =
    logged.getOrElse(
      spark.read.option("mergeSchema", "true")
        .parquet(snapshot.map(fm => new Path(table, fm.path).toString): _*)
        .schema)

  /** Row-level DELETE — Delta's `DELETE FROM t WHERE …` in its
    * copy-on-write form: files whose commit-time stats admit the
    * predicate are REWRITTEN without the matching rows; every other file
    * carries into the new snapshot with its physical path verbatim.
    * Cost is O(touched files), never O(table) — the same stats scoping
    * [[readWhere]] and [[optimizeWhere]] use, so a delete keyed to a
    * clustered column rewrites only its cluster's files. Rows where the
    * predicate is NULL are KEPT (SQL DELETE semantics: only TRUE
    * deletes). Returns None without committing when no file's stats
    * admit the predicate (nothing to delete — no version churn under a
    * periodic retention job). Through the log: snapshot-isolated readers
    * keep their versions, the pre-delete snapshot time-travels until
    * vacuumed, the commit is pinned to its read version (concurrent
    * commits force a recompute), and the "delete" operation tag is NOT
    * data-preserving — a foreign delete correctly de-trusts the x40/x42
    * sibling indexes (their keys would over-mask rows the corpus no
    * longer has). */
  def deleteWhere(spark: SparkSession, table: String, predicate: Column,
                  maxAttempts: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.deleteWhere: no committed version in $table"))
      val files = resolveFiles(spark, table, base)
      if (files.isEmpty) return None
      requireLive(spark, table, base, files)
      val entry = readEntry(spark, table, base)
      val schema = entry.schemaStruct
      val ren = entry.renames
      val sample = new Path(table, files.head.path).toString
      val pred = resolvedPredicate(spark, sample, predicate,
        schema.map(toDisplaySchema(_, ren)))
      val touched = files.filter(fm => mayMatch(displayMeta(ren)(fm), pred))
      if (touched.isEmpty) return None
      // read UNDER the live masks: a rewritten file's deletion vector
      // dies with it, so its masked rows must not be resurrected here —
      // and WITH row ids when the files track them, so surviving rows
      // keep their identity through the rewrite
      val (scanned, carry) = scanForRewrite(spark, table, touched,
        subsetReadSchema(spark, table, schema, files),
        resolveDvs(spark, table, base), ren)
      val kept = scanned
        .where(not(coalesce(predicate, lit(false))))
        .repartition(touched.size)
      try return Some(commitImpl(spark, kept, table, "delete", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(touched.map(_.path)), carryRids = carry)
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped")))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.deleteWhere: $maxAttempts consecutive concurrent commits " +
        s"on $table")
  }

  /** Row-level DELETE in MERGE-ON-READ form — Delta's deletion vectors:
    * where [[deleteWhere]] REWRITES every touched file without the
    * matching rows (copy-on-write: a 1-row delete in a 1 GB file
    * rewrites the gigabyte), this records the matching ROW POSITIONS in
    * a tiny per-file sidecar and every snapshot read drops them at scan
    * time ([[scanFiles]] — the masked scan rides the parquet row-index
    * metadata column and a distributed anti-join). The commit touches NO
    * data file: it adds nothing, removes nothing, and only advances the
    * entry's DV delta — write cost O(matched positions), never
    * O(touched bytes). Re-deleting from a masked file UNIONS positions.
    *
    * A DV dies with its file: any copy-on-write rewrite (DML, OPTIMIZE,
    * compaction) reads the file under its mask, materializes the
    * surviving rows, and the commit's `prior -- removed` drops the
    * sidecar from the map — deleted rows can never resurrect.
    * [[purgeDeletionVectors]] is the explicit rewrite (Delta's
    * `REORG TABLE ... APPLY (PURGE)`).
    *
    * The matched-position collect rides the `graft.probe.maxDriverKeys`
    * planner rule: a delete too large to be a DV candidate (its mask
    * would rival the data) falls back to [[deleteWhere]]'s copy-on-write
    * — the right plan for a bulk delete anyway. The cap bounds the
    * CUMULATIVE per-file mask, not just one delete's hits: a file whose
    * old∪new union would exceed it takes copy-on-write too, so no
    * sequence of selective deletes can grow a sidecar past the budget
    * the scan machinery plans for. Identical rows either
    * way. SQL NULL semantics (only TRUE deletes), the "delete" tag (NOT
    * data-preserving — sibling indexes de-trust), pinned read version
    * with recompute on conflict, provable no-op → None. The hop
    * surfaces in [[tableChanges]] as exactly the newly masked rows. */
  def deleteWhereDv(spark: SparkSession, table: String, predicate: Column,
                    maxAttempts: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val cap = spark.conf.getOption("graft.probe.maxDriverKeys")
      .map(_.toLong).getOrElse(1000000L)
    val lim = (math.min(math.max(cap, 0L), (Int.MaxValue - 2).toLong) + 1).toInt
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.deleteWhereDv: no committed version in $table"))
      val files = resolveFiles(spark, table, base)
      if (files.isEmpty) return None
      requireLive(spark, table, base, files)
      val entry = readEntry(spark, table, base)
      val schema = entry.schemaStruct
      val ren = entry.renames
      val sample = new Path(table, files.head.path).toString
      val pred = resolvedPredicate(spark, sample, predicate,
        schema.map(toDisplaySchema(_, ren)))
      val touched = files.filter(fm => mayMatch(displayMeta(ren)(fm), pred))
      if (touched.isEmpty) return None
      val f = fs(spark, new Path(table))
      val byName = touched.map(fm => new Path(fm.path).getName -> fm.path)
        .toMap
      require(byName.size == touched.size,
        s"TxnLake.deleteWhereDv: duplicate data-file names in $table")
      // matching LIVE positions: scan touched with the row index, drop
      // already-masked positions (a row never double-deletes), keep TRUE
      val readSchema = subsetReadSchema(spark, table, schema, files)
      // one DV resolution per attempt: resolveDvs replays up to
      // CheckpointInterval log entries since the per-commit-delta change,
      // so calling it inside per-file loops would pay
      // O(files x CheckpointInterval) log reads on exactly the DV-heavy
      // tables this path exists for
      val dvsBase = resolveDvs(spark, table, base)
      val baseDf = toDisplay(spark.read.schema(readSchema)
        .parquet(touched.map(fm => new Path(table, fm.path).toString): _*)
        .withColumn("__graft_dv_fn", col("_metadata.file_name"))
        .withColumn("__graft_dv_ri", col("_metadata.row_index")), ren)
      val priorRefs = touched.flatMap(fm =>
        dvsBase.get(fm.path).map(new Path(fm.path).getName -> _))
      val live =
        if (priorRefs.isEmpty) baseDf
        else baseDf.join(dvPairsDf(spark, table, priorRefs),
          Seq("__graft_dv_fn", "__graft_dv_ri"), "left_anti")
      val hits = live.where(coalesce(predicate, lit(false)))
        .select(col("__graft_dv_fn"), col("__graft_dv_ri"))
        .limit(lim).collect()
      if (hits.length > cap)
        return deleteWhere(spark, table, predicate, maxAttempts)
      if (hits.isEmpty) return None
      val positions: Map[String, Seq[Long]] = hits.groupBy(_.getString(0))
        .map { case (name, rows) =>
          val rel = byName(name)
          val old = dvsBase.get(rel).map(r =>
            readDvFile(f, new Path(table, r.path))).getOrElse(Seq.empty)
          rel -> (old ++ rows.map(_.getLong(1)).toSeq).distinct
        }
      // the cap bounds the CUMULATIVE per-file mask, not just this
      // delete's hits: repeated selective deletes must not grow one
      // file's sidecar past what the scan machinery budgets for — an
      // over-cap UNION takes the copy-on-write plan instead, which also
      // retires that file's mask as a side effect
      if (positions.values.exists(_.size.toLong > cap))
        return deleteWhere(spark, table, predicate, maxAttempts)
      val salt = java.util.UUID.randomUUID().toString.take(8)
      val dvDir = new Path(table, s"_dv/$salt")
      f.mkdirs(dvDir)
      val newDvs: Map[String, DvRef] = positions.map { case (rel, all) =>
        val name = new Path(rel).getName
        writeDvFile(f, new Path(dvDir, s"$name.dv"), all)
        rel -> DvRef(s"_dv/$salt/$name.dv", all.size.toLong)
      }
      // dvs-only commit: a noData commit writes no data file, so the
      // entry advances ONLY the DV map (its delta)
      val emptyDf = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema)
      // cleanup is scoped to PRE-PUBLISH failures only: once the entry
      // is visible, deleting the salt dir would take live sidecars with
      // it (the post-publish re-verify below must never trip cleanup)
      var published: Option[Long] = None
      try published = Some(commitImpl(spark, emptyDf, table, "delete", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(Seq.empty), newDvs = newDvs, noData = true)
        .getOrElse(
          sys.error("unreachable: txn-less commit cannot be skipped")))
      catch {
        case _: CommitConflict =>
          f.delete(dvDir, true) // recompute writes a fresh salt dir
          attempt += 1
        case e: Throwable =>
          f.delete(dvDir, true) // failed commit must not orphan sidecars
          throw e
      }
      published.foreach { v =>
        // post-publish re-verify (the restore/vacuum pattern): a vacuum
        // that resolved its orphan set before our entry became visible
        // may have swept the just-written sidecars; their bytes are a
        // pure function of the positions we still hold, so recreate —
        // once the entry is published, any NEW vacuum sees them as live
        newDvs.foreach { case (rel, ref) =>
          val p = new Path(table, ref.path)
          if (!f.exists(p)) {
            f.mkdirs(p.getParent)
            writeDvFile(f, p, positions(rel))
          }
        }
        return Some(v)
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.deleteWhereDv: $maxAttempts consecutive concurrent " +
        s"commits on $table")
  }

  /** Materialize every live deletion vector away — Delta's
    * `REORG TABLE ... APPLY (PURGE)`: rewrite ONLY the masked files
    * (their surviving rows), carry every clean file verbatim, and let
    * the commit's map maintenance drop the sidecars. Data-preserving
    * ("optimize" tag — the row multiset is unchanged by construction),
    * so sibling-index trust (x40) survives a purge, exactly as it
    * survives compaction. No-op (None) when nothing is masked. */
  def purgeDeletionVectors(spark: SparkSession, table: String,
                           maxAttempts: Int = 10): Option[Long] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.purgeDeletionVectors: no committed version"))
      val files = resolveFiles(spark, table, base)
      requireLive(spark, table, base, files)
      val entry = readEntry(spark, table, base)
      val dvsBase = resolveDvs(spark, table, base) // once per attempt
      val masked = files.filter(fm => dvsBase.contains(fm.path))
      if (masked.isEmpty) return None
      val schema = entry.schemaStruct
      val (cleanScan, carry) = scanForRewrite(spark, table, masked,
        subsetReadSchema(spark, table, schema, files), dvsBase,
        entry.renames)
      val clean = cleanScan.repartition(masked.size)
      try return Some(commitImpl(spark, clean, table, "optimize", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(masked.map(_.path)), carryRids = carry)
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped")))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.purgeDeletionVectors: $maxAttempts consecutive concurrent " +
        s"commits on $table")
  }

  /** Row-level UPDATE — Delta's `UPDATE t SET … WHERE …` in its
    * copy-on-write form, the scalar-DML sibling of [[deleteWhere]] and
    * [[mergeInto]]: files whose commit-time stats admit the predicate
    * are rewritten with `set`'s expressions applied to the rows where
    * the predicate is TRUE (NULL or FALSE keeps the row verbatim — SQL
    * UPDATE semantics: only TRUE updates); every other file carries into
    * the new snapshot with its physical path VERBATIM. Cost O(touched
    * files), never O(table). `set` expressions may reference the row's
    * own columns (`Map("value" -> col("value") * 2)`); assigning a type
    * the column cannot hold is refused by the commit's schema merge
    * rather than silently coerced. Returns None without committing when
    * no file's stats admit the predicate. The "update" tag is NOT
    * data-preserving — it de-trusts sibling indexes (x40) and surfaces
    * in [[tableChanges]] as a touched-files keyed diff with full
    * update pre/post-image classification. */
  def updateWhere(spark: SparkSession, table: String, predicate: Column,
                  set: Map[String, Column],
                  maxAttempts: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    require(set.nonEmpty, "TxnLake.updateWhere: empty SET clause")
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.updateWhere: no committed version in $table"))
      val files = resolveFiles(spark, table, base)
      if (files.isEmpty) return None
      requireLive(spark, table, base, files)
      val entry = readEntry(spark, table, base)
      val schema = entry.schemaStruct
      val ren = entry.renames
      val readSchema = subsetReadSchema(spark, table, schema, files)
      val displayFields = toDisplaySchema(readSchema, ren).fieldNames
      set.keys.foreach(k => require(displayFields.contains(k),
        s"TxnLake.updateWhere: SET references unknown column $k"))
      val sample = new Path(table, files.head.path).toString
      val pred = resolvedPredicate(spark, sample, predicate,
        schema.map(toDisplaySchema(_, ren)))
      val touched = files.filter(fm => mayMatch(displayMeta(ren)(fm), pred))
      if (touched.isEmpty) return None
      val hit = coalesce(predicate, lit(false))
      // an UPDATE changes values, never identity: carried row ids ride
      // the rewrite verbatim (Delta row tracking's update semantics)
      val (scanned, carry) = scanForRewrite(spark, table, touched,
        readSchema, resolveDvs(spark, table, base), ren)
      val rewritten = scanned
        .select((displayFields.map { n =>
          set.get(n) match {
            case Some(v) => when(hit, v).otherwise(col(n)).as(n)
            case None => col(n)
          }
        }.toIndexedSeq
          ++ (if (carry) Seq(col(RidCol)) else Seq.empty)): _*)
        .repartition(touched.size)
      try return Some(commitImpl(spark, rewritten, table, "update", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(touched.map(_.path)), carryRids = carry)
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped")))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.updateWhere: $maxAttempts consecutive concurrent commits " +
        s"on $table")
  }

  /** Row-level UPDATE in MERGE-ON-READ form — the DV sibling of
    * [[updateWhere]] (Delta's deletion-vector-backed UPDATE): instead
    * of rewriting every touched file (copy-on-write: a 1-row update in
    * a 1 GB file rewrites the gigabyte), ONE commit masks the matched
    * rows' positions in per-file sidecars AND appends a small file
    * holding their post-images — write cost O(matched rows), never
    * O(touched bytes). Every snapshot read then sees exactly the
    * updated table: the masks drop the pre-images at scan time, the
    * appended file supplies the post-images.
    *
    * Shares [[deleteWhereDv]]'s whole contract: the
    * `graft.probe.maxDriverKeys` cap gates BOTH this update's matches
    * and the cumulative per-file mask union (either over cap →
    * [[updateWhere]]'s copy-on-write, the right plan for a bulk update
    * anyway — identical rows either way); SQL NULL semantics (only
    * TRUE updates); the "update" tag (NOT data-preserving — sibling
    * indexes de-trust); pinned read version with recompute on
    * conflict; provable no-op → None; masks die with any later rewrite
    * of their file ([[purgeDeletionVectors]] included). The hop
    * surfaces in [[tableChanges]] as full update pre/post-image pairs:
    * the newly masked rows are the pre-images, the appended file the
    * post-images. */
  def updateWhereDv(spark: SparkSession, table: String, predicate: Column,
                    set: Map[String, Column],
                    maxAttempts: Int = 10): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    require(set.nonEmpty, "TxnLake.updateWhereDv: empty SET clause")
    val cap = spark.conf.getOption("graft.probe.maxDriverKeys")
      .map(_.toLong).getOrElse(1000000L)
    val lim = (math.min(math.max(cap, 0L), (Int.MaxValue - 2).toLong) + 1).toInt
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.updateWhereDv: no committed version in $table"))
      val files = resolveFiles(spark, table, base)
      if (files.isEmpty) return None
      requireLive(spark, table, base, files)
      val entry = readEntry(spark, table, base)
      val schema = entry.schemaStruct
      val ren = entry.renames
      val readSchema = subsetReadSchema(spark, table, schema, files)
      val displayFields = toDisplaySchema(readSchema, ren).fieldNames
      set.keys.foreach(k => require(displayFields.contains(k),
        s"TxnLake.updateWhereDv: SET references unknown column $k"))
      val sample = new Path(table, files.head.path).toString
      val pred = resolvedPredicate(spark, sample, predicate,
        schema.map(toDisplaySchema(_, ren)))
      val touched = files.filter(fm => mayMatch(displayMeta(ren)(fm), pred))
      if (touched.isEmpty) return None
      val f = fs(spark, new Path(table))
      val byName = touched.map(fm => new Path(fm.path).getName -> fm.path)
        .toMap
      require(byName.size == touched.size,
        s"TxnLake.updateWhereDv: duplicate data-file names in $table")
      // one DV resolution per attempt (see deleteWhereDv): per-file
      // resolveDvs calls would replay the log O(files) times
      val dvsBase = resolveDvs(spark, table, base)
      // a DV update REWRITES nothing, but its appended post-images must
      // still carry the pre-images' row ids (an update never changes a
      // row's identity) — the id-resolving scan is scanFilesWithRid's,
      // with the (file, position) coordinates kept (keepMeta) for the
      // prior-mask anti-join and the fresh-position collect below; the
      // masks themselves apply HERE, not in the scan, because this path
      // needs the raw positions first
      val carryR = touched.forall(_.brid >= 0L)
      val baseDf =
        if (carryR) scanFilesWithRid(spark, table, touched, readSchema,
          Map.empty, ren, keepMeta = true)
        else toDisplay(spark.read.schema(readSchema)
          .parquet(touched.map(fm => new Path(table, fm.path).toString): _*)
          .withColumn("__graft_dv_fn", col("_metadata.file_name"))
          .withColumn("__graft_dv_ri", col("_metadata.row_index")), ren)
      val priorRefs = touched.flatMap(fm =>
        dvsBase.get(fm.path).map(new Path(fm.path).getName -> _))
      val live =
        if (priorRefs.isEmpty) baseDf
        else baseDf.join(dvPairsDf(spark, table, priorRefs),
          Seq("__graft_dv_fn", "__graft_dv_ri"), "left_anti")
      val hit = live.where(coalesce(predicate, lit(false)))
      val hits = hit.select(col("__graft_dv_fn"), col("__graft_dv_ri"))
        .limit(lim).collect()
      if (hits.length > cap)
        return updateWhere(spark, table, predicate, set, maxAttempts)
      if (hits.isEmpty) return None
      val positions: Map[String, Seq[Long]] = hits.groupBy(_.getString(0))
        .map { case (name, rows) =>
          val rel = byName(name)
          val old = dvsBase.get(rel).map(r =>
            readDvFile(f, new Path(table, r.path))).getOrElse(Seq.empty)
          rel -> (old ++ rows.map(_.getLong(1)).toSeq).distinct
        }
      if (positions.values.exists(_.size.toLong > cap))
        return updateWhere(spark, table, predicate, set, maxAttempts)
      val salt = java.util.UUID.randomUUID().toString.take(8)
      val dvDir = new Path(table, s"_dv/$salt")
      f.mkdirs(dvDir)
      val newDvs: Map[String, DvRef] = positions.map { case (rel, all) =>
        val name = new Path(rel).getName
        writeDvFile(f, new Path(dvDir, s"$name.dv"), all)
        rel -> DvRef(s"_dv/$salt/$name.dv", all.size.toLong)
      }
      // the post-images: the matched live rows with SET applied —
      // written as the commit's (small) added file, carrying the
      // pre-images' row ids so identity survives the merge-on-read hop
      val post = hit.select((displayFields.map { n =>
        set.get(n) match {
          case Some(v) => v.as(n)
          case None => col(n)
        }
      }.toIndexedSeq
        ++ (if (carryR) Seq(col(RidCol)) else Seq.empty)): _*)
        .repartition(1)
      // cleanup scoped to PRE-PUBLISH failures (see deleteWhereDv) — and
      // a CHECK-constraint refusal lands here too: the violating commit
      // aborts inside commitImpl, so its masks must not linger as
      // orphans until a vacuum
      var published: Option[Long] = None
      try published = Some(commitImpl(spark, post, table, "update", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(Seq.empty), newDvs = newDvs,
          carryRids = carryR)
        .getOrElse(
          sys.error("unreachable: txn-less commit cannot be skipped")))
      catch {
        case _: CommitConflict =>
          f.delete(dvDir, true) // recompute writes a fresh salt dir
          attempt += 1
        case e: Throwable =>
          f.delete(dvDir, true)
          throw e
      }
      published.foreach { v =>
        // post-publish re-verify (the deleteWhereDv pattern): recreate
        // any sidecar a racing vacuum swept before our entry published
        newDvs.foreach { case (rel, ref) =>
          val p = new Path(table, ref.path)
          if (!f.exists(p)) {
            f.mkdirs(p.getParent)
            writeDvFile(f, p, positions(rel))
          }
        }
        return Some(v)
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.updateWhereDv: $maxAttempts consecutive concurrent " +
        s"commits on $table")
  }

  /** On-disk byte size of every file in the snapshot, table-relative path
    * → bytes (driver-side listing, O(|files|) metadata calls — the same
    * cost any size-aware planner pays). */
  def snapshotFileSizes(spark: SparkSession, table: String,
                        version: Option[Long] = None): Seq[(String, Long)] = {
    val f = fs(spark, new Path(table))
    snapshotFiles(spark, table, version).map { fm =>
      fm.path -> f.getFileStatus(new Path(table, fm.path)).getLen
    }
  }

  /** INCREMENTAL compaction — Delta's OPTIMIZE bin-packing semantics:
    * rewrite ONLY the snapshot's files smaller than `minFileBytes` into
    * `ceil(smallBytes / targetFileBytes)` packed files, leaving every
    * already-large file in place VERBATIM (same physical path carries
    * over into the new snapshot). This is the maintenance command a
    * table under continuous streaming ingest actually runs: cost is
    * O(small files) per invocation, not O(table) — the whole-snapshot
    * [[optimize]] re-clusters, this reclaims the small-file debt a
    * micro-batch cadence accrues. No-op (returns None) below two small
    * files: packing one file into one file would churn versions forever
    * under a periodic scheduler.
    *
    * Transactionally identical to [[optimize]]: the rewrite is pinned to
    * its read version (requireBase), so a concurrent append/overwrite
    * forces a recompute from the fresh snapshot rather than resurrecting
    * the files the concurrent writer removed — and the small files are
    * re-chosen from that fresh snapshot. Reads the small files under the
    * LOGGED schema (older files null-fill evolved columns, exactly as a
    * snapshot scan would).
    *
    * `within` scopes the pack set to an explicit table-relative path set
    * (PROVENANCE scoping — "pack only the files this batch just landed",
    * the x43 streaming-maintenance shape, Delta's OPTIMIZE-WHERE-on-the-
    * new-partition analog). A size threshold alone is a heuristic that
    * misidentifies the debt the moment a new batch's file rivals the
    * packed history's size; provenance cannot. None = whole snapshot
    * (size-only, the Delta default). */
  def compactSmallFiles(spark: SparkSession, table: String,
                        minFileBytes: Long,
                        targetFileBytes: Long = 128L << 20,
                        maxAttempts: Int = 10,
                        within: Option[Set[String]] = None): Option[Long] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.compactSmallFiles: no committed version in $table"))
      // ONE snapshot resolution per attempt feeds the size listing, the
      // pack-set filter, and the legacy-schema fallback alike
      val snapFiles = resolveFiles(spark, table, base)
      val fsys = fs(spark, new Path(table))
      val sized = snapFiles.map(fm => fm.path ->
        fsys.getFileStatus(new Path(table, fm.path)).getLen)
      val small = sized.filter { case (p, bytes) =>
        bytes < minFileBytes && within.forall(_.contains(p)) }
      if (small.size < 2) return None
      val numOut = math.max(1L,
        (small.map(_._2).sum + targetFileBytes - 1) / targetFileBytes).toInt
      val entry = readEntry(spark, table, base)
      val schema = entry.schemaStruct
      val smallSet = small.map(_._1).toSet
      val (packedScan, carry) = scanForRewrite(spark, table,
        snapFiles.filter(fm => smallSet(fm.path)),
        subsetReadSchema(spark, table, schema, snapFiles),
        resolveDvs(spark, table, base), entry.renames)
      val packed = packedScan.repartition(numOut)
      try return Some(commitImpl(spark, packed, table, "optimize", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(small.map(_._1)), carryRids = carry)
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped")))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.compactSmallFiles: $maxAttempts consecutive concurrent " +
        s"commits on $table")
  }

  // ---- restore --------------------------------------------------------

  /** RESTORE the table to `toVersion` as a NEW commit — Delta's
    * `RESTORE TABLE … TO VERSION AS OF`: metadata-only. The new entry
    * re-references the target version's files verbatim (nothing is
    * rewritten, moved, or copied), removes the current snapshot's, and
    * carries the target's logged schema — so a bad deploy rolls back in
    * one log write while the entire history, including the versions being
    * rolled past, stays time-travelable. Restoring to HEAD is a no-op
    * (returns the current version, writes nothing). The target's data
    * dirs must still be live — restoring past a vacuum raises the same
    * clear error as reading it.
    *
    * Scale: O(|files|) metadata and ZERO data I/O — restoring a 100 TB
    * table costs one entry write. Vacuum afterwards treats the restore
    * commit as live, so the re-referenced old dirs survive reclamation
    * for as long as the restore is retained. */
  def restore(spark: SparkSession, table: String, toVersion: Long,
              maxAttempts: Int = 10): Long =
    restoreImpl(spark, table, toVersion, maxAttempts, () => ())

  /** RESTORE to the snapshot a TIMESTAMP resolves to — Delta's
    * `RESTORE TABLE … TO TIMESTAMP AS OF`: [[versionAsOf]] resolution
    * (monotone-adjusted publish mtimes), then the metadata-only
    * [[restore]]. Refuses a pre-history instant with the same guided
    * error as [[readAsOf]]. */
  def restoreAsOf(spark: SparkSession, table: String, ts: Long,
                  maxAttempts: Int = 10): Long =
    versionAsOf(spark, table, ts) match {
      case Some(v) => restore(spark, table, v, maxAttempts)
      case None =>
        val first = committedVersions(spark, table).headOption
          .map(commitTimestamp(spark, table, _))
        throw new IllegalArgumentException(
          s"TxnLake.restoreAsOf: timestamp $ts predates the first commit " +
            s"of $table${first.map(t => s" (earliest: $t)").getOrElse("")}")
    }

  /** Test seams: `beforePublish` runs between the liveness pre-check and
    * the entry publish (interleave a concurrent [[vacuum]] — the TOCTOU
    * the post-publish re-verify closes); `beforeCompensate` runs between
    * the failed re-verify and the compensating commit (interleave a
    * commit that CHAINS onto the failed restore — the compensation must
    * preserve it). */
  private[sources] def restoreImpl(spark: SparkSession, table: String,
                                   toVersion: Long, maxAttempts: Int,
                                   beforePublish: () => Unit,
                                   beforeCompensate: () => Unit = () => ()): Long = {
    val f = fs(spark, new Path(table))
    val salt = java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (attempt < maxAttempts) {
      val committed = committedVersions(spark, table)
      require(committed.contains(toVersion),
        s"TxnLake.restore: version $toVersion is not in $table's log")
      val target = resolveFiles(spark, table, toVersion)
      requireLive(spark, table, toVersion, target)
      // the restored snapshot's deletion-vector sidecars must be as live
      // as its data files — re-referencing a vacuumed mask would brick
      // every subsequent masked read
      def requireDvLive(dvs: Map[String, DvRef]): Unit =
        dvs.values.foreach { r =>
          if (!f.exists(new Path(table, r.path)))
            throw new IllegalStateException(
              s"TxnLake.restore: version $toVersion's deletion-vector " +
                s"sidecar ${r.path} has been vacuumed")
        }
      val lastV = committed.last
      if (lastV == toVersion) return lastV
      val lastEntry = readEntry(spark, table, lastV)
      // carry the cumulative txn state forward; a legacy log (no map yet)
      // gets the same one-time marker fold commitImpl performs
      val txns =
        if (lastEntry.hasTxns) lastEntry.txns
        else committed.foldLeft(Map.empty[String, Long]) { (m, v) =>
          readEntry(spark, table, v).txn match {
            case Some((a, b)) if m.get(a).forall(_ < b) => m + (a -> b)
            case _ => m
          }
        }
      // remove EVERYTHING current and add the full target list: delta
      // replay then can't double-count files the two snapshots share
      val currentMeta = resolveFiles(spark, table, lastV)
      val current = currentMeta.map(_.path)
      val next = lastV + 1
      val targetEntry = readEntry(spark, table, toVersion)
      val targetDvs = resolveDvs(spark, table, toVersion)
      requireDvLive(targetDvs)
      val entry = render(Entry(next, "restore", target, current, None, None,
        txns, hasTxns = true,
        schemaJson = targetEntry.schemaJson,
        // the bloom-column declaration is a table property — carry the
        // union so a restore never silently un-indexes later commits
        bloomCols = (lastEntry.bloomCols ++ targetEntry.bloomCols).distinct,
        // the restored snapshot's deletion vectors come back with it —
        // its logical rows are files MINUS masks, both or neither
        dvs = targetDvs,
        // drop tombstones restore with their schema: the target's old
        // files are back in the snapshot, so ITS tombstone set is the
        // one that guards them; constraints likewise restore with the
        // data they were validated against
        droppedCols = targetEntry.droppedCols,
        constraints = targetEntry.constraints,
        genCols = targetEntry.genCols,
        // identity properties restore with their start/step, but the hwm
        // MONOTONE-merges against the latest entry's: values handed out
        // by rolled-past commits are never reissued
        identityCols = mergeIdentityMonotone(targetEntry.identityCols,
          lastEntry.identityCols),
        // the row-id mark is monotone like the identity hwm: ids handed
        // out by rolled-past commits are never reissued after a restore
        ridHwm = math.max(targetEntry.ridHwm, lastEntry.ridHwm),
        // display names restore with their snapshot (era-correct, like
        // the schema itself)
        renames = targetEntry.renames,
        ts = nextTs(Some(lastEntry))))
      val tmp = new Path(logDir(table), s"v$next.json.tmp-$salt")
      val out = f.create(tmp, false)
      try out.write(entry.getBytes("UTF-8")) finally out.close()
      beforePublish()
      val dst = new Path(logDir(table), s"v$next.json")
      if (publishExclusive(f, tmp, dst)) {
        // Re-verify the target's files AFTER the publish: a vacuum that
        // resolved its live set between our pre-check and this publish may
        // have reclaimed them (the restore/vacuum TOCTOU). Once our entry
        // is visible, any vacuum that STARTS now treats the restore as
        // live — so the lost race must be detected here. A PUBLISHED entry
        // can never be deleted (a concurrent commit may already chain on
        // it; removing it would leave a version gap that breaks every
        // later snapshot resolution) — instead publish a COMPENSATING
        // restore back to the pre-restore snapshot through the normal
        // optimistic loop, then raise. Concurrent appends that landed on
        // the failed restore survive: the compensation removes only the
        // reclaimed target's paths. (Vacuum narrows its side of the window
        // symmetrically: it re-lists the log after computing the dead set
        // and recomputes if a commit landed — see vacuum. The residual
        // instant where both checks pass and the delete still lands is the
        // same window Delta accepts.)
        try { requireLive(spark, table, toVersion, target)
          requireDvLive(targetDvs) }
        catch {
          case e: IllegalStateException =>
            beforeCompensate()
            // remove only what the failed restore ADDED: a path shared
            // with the pre-restore snapshot is still that snapshot's —
            // removing it would vanish live rows from the log
            compensateRestore(spark, f, table, next, currentMeta,
              target.map(_.path)
                .filterNot(currentMeta.map(_.path).toSet),
              txns, lastEntry.schemaJson, maxAttempts,
              priorDvs = resolveDvs(spark, table, lastV))
            throw new IllegalStateException(
              s"TxnLake.restore: a concurrent vacuum reclaimed version " +
                s"$toVersion's files during the restore; a compensating " +
                s"commit restored the pre-restore snapshot", e)
        }
        maybeCheckpoint(spark, f, table, next)
        return next
      }
      f.delete(tmp, false) // lost the race: re-list and retry at N+1
      attempt += 1
    }
    sys.error(s"TxnLake: gave up after $maxAttempts commit conflicts on $table")
  }

  /** Publish the metadata-only commit that undoes a restore whose target
    * files a concurrent vacuum reclaimed. Computed RELATIVE to the
    * snapshot live at publish time, so commits that chained onto the
    * failed restore are preserved, not clobbered:
    *
    *  - remove only the reclaimed target paths the CURRENT snapshot still
    *    references (a chained overwrite/restore that already replaced
    *    them needs no compensation at all — return without committing);
    *  - add only the pre-restore files the current snapshot lacks (a
    *    chained append's files survive untouched);
    *  - txns merge MONOTONICALLY with the latest entry's map — a chained
    *    commit may have advanced an app's watermark past the pre-restore
    *    value, and regressing it would let a checkpoint-loss replay
    *    double-apply that batch;
    *  - the schema merges the pre-restore schema INTO the latest logged
    *    one (append rules), never regressing columns a chained commit
    *    evolved. */
  private def compensateRestore(spark: SparkSession, f: FileSystem,
                                table: String, failedVersion: Long,
                                priorSnapshot: Seq[FileMeta],
                                removePaths: Seq[String],
                                txns: Map[String, Long],
                                schemaJson: Option[String],
                                maxAttempts: Int,
                                priorDvs: Map[String, DvRef] = Map.empty): Unit = {
    val salt = java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (attempt < maxAttempts) {
      val lastV = committedVersions(spark, table).last
      val next = lastV + 1
      val lastEntry =
        if (lastV == failedVersion) None
        else Some(readEntry(spark, table, lastV))
      val current = resolveFiles(spark, table, lastV)
      val currentPaths = current.map(_.path).toSet
      val stillReferenced = removePaths.filter(currentPaths)
      // a chained snapshot replacement already superseded the failed
      // restore — nothing live references the reclaimed files
      if (stillReferenced.isEmpty && lastV != failedVersion) return
      val addBack = priorSnapshot.filterNot(fm => currentPaths(fm.path))
      val carried = lastEntry.map(_.txns).getOrElse(txns)
      val mergedTxns = (carried.keySet ++ txns.keySet).map { k =>
        k -> math.max(carried.getOrElse(k, Long.MinValue),
          txns.getOrElse(k, Long.MinValue))
      }.toMap
      val latestSchema = lastEntry.flatMap(_.schemaJson).orElse(schemaJson)
      val outSchema = (latestSchema, schemaJson) match {
        case (Some(l), Some(p)) if l != p =>
          Some(mergedSchema(
            Some(DataType.fromJson(l).asInstanceOf[StructType]),
            DataType.fromJson(p).asInstanceOf[StructType], "append").json)
        case (l, p) => l.orElse(p)
      }
      val entry = render(Entry(next, "restore", addBack, stillReferenced,
        None, None, mergedTxns, hasTxns = true, schemaJson = outSchema,
        bloomCols = readEntry(spark, table, lastV).bloomCols,
        // masks follow their files: survivors keep the current map's,
        // added-back files return with the pre-restore snapshot's
        dvs = (resolveDvs(spark, table, lastV)
          -- stillReferenced) ++
          priorDvs.filter(kv => addBack.exists(_.path == kv._1)),
        // conservative union: the compensated snapshot carries files
        // from both lineages, so both tombstone sets guard it
        droppedCols = (lastEntry.map(_.droppedCols).getOrElse(Seq.empty) ++
          readEntry(spark, table, lastV).droppedCols).distinct,
        constraints = readEntry(spark, table, lastV).constraints,
        genCols = readEntry(spark, table, lastV).genCols,
        identityCols = readEntry(spark, table, lastV).identityCols,
        ridHwm = readEntry(spark, table, lastV).ridHwm,
        renames = readEntry(spark, table, lastV).renames,
        // monotone vs the ACTUAL last entry — lastEntry is None exactly
        // when the failed restore's own entry is latest, and that entry
        // carries a ts the compensation must still exceed
        ts = nextTs(lastEntry.orElse(Some(readEntry(spark, table, lastV))))))
      val tmp = new Path(logDir(table), s"v$next.json.tmp-$salt")
      val out = f.create(tmp, false)
      try out.write(entry.getBytes("UTF-8")) finally out.close()
      if (publishExclusive(f, tmp, new Path(logDir(table), s"v$next.json"))) {
        maybeCheckpoint(spark, f, table, next)
        return
      }
      f.delete(tmp, false)
      attempt += 1
    }
    sys.error(s"TxnLake: compensating restore on $table gave up after " +
      s"$maxAttempts conflicts — manual log repair required (latest " +
      s"snapshot references vacuum-reclaimed files)")
  }

  // ---- ALTER TABLE (metadata-only schema changes) ---------------------

  /** `ALTER TABLE … ADD COLUMN` — METADATA-ONLY schema widening: one
    * log entry records the widened cumulative schema; not one data file
    * moves (adding a column to a 100 TB table costs one entry write).
    * Every existing file null-fills the new column under the logged
    * read schema — the x36 evolution machinery — and pre-ALTER versions
    * still time-travel under their own narrower schema. The new column
    * is always nullable (existing rows HAVE no value). Re-adding a
    * previously DROPPED name is refused: the old files still hold that
    * name's bytes and would silently resurrect under the widened
    * schema (the tombstone contract of [[dropColumn]]). The "metadata"
    * tag emits NOTHING in the change feed (no row changed) and is NOT
    * data-preserving for sibling-index trust — conservative by
    * construction. */
  /** Resolve a user-supplied column name to its PHYSICAL schema name:
    * the physical behind a current display name, or an unrenamed field
    * matched directly. A RETIRED physical name (its column was renamed
    * away) deliberately does NOT resolve — the display is the name now. */
  private def canonPhysical(spark: SparkSession, cur: StructType,
                            entry: Entry, name: String): Option[String] = {
    val res = resolver(spark)
    entry.renames.collectFirst { case (p, d) if res(d, name) => p }
      .orElse(cur.fieldNames.find(c =>
        res(c, name) && !entry.renames.contains(c)))
  }

  /** Does `name` collide with any CURRENT user-visible name — a display
    * name or an unrenamed physical field? (Retired physicals count too:
    * the field still exists in the physical schema, and a new column
    * under that name would alias its storage.) */
  private def collides(spark: SparkSession, cur: StructType,
                       entry: Entry, name: String): Boolean = {
    val res = resolver(spark)
    cur.fieldNames.exists(res(_, name)) ||
      entry.renames.values.exists(res(_, name))
  }

  def addColumn(spark: SparkSession, table: String, name: String,
                dataType: DataType, maxAttempts: Int = 10): Long =
    alterSchemaWith(spark, table, "addColumn", maxAttempts) { (cur, entry) =>
      val res = resolver(spark)
      require(!name.startsWith("__graft_dv_"),
        "TxnLake.addColumn: __graft_dv_* names are reserved")
      require(!collides(spark, cur, entry, name),
        s"TxnLake.addColumn: column $name already exists in $table")
      require(!entry.droppedCols.exists(res(_, name)),
        s"TxnLake.addColumn: column $name was DROPPED from $table; " +
          "re-adding the name (in any casing — resolution is " +
          "case-insensitive) would resurrect the old files' bytes — " +
          "use a different name, or overwrite the table")
      AlterSpec(StructType(cur.fields :+
        StructField(name, dataType, nullable = true)))
    }

  /** `ALTER TABLE … ADD COLUMN … GENERATED ALWAYS AS (expr)` — Delta's
    * generated columns: declared as a table property on an EMPTY table
    * (Delta allows them only at creation; requiring zero rows is the
    * same contract without a CREATE statement — historical rows can
    * never hold the value, and a later rewrite of such a row would be
    * refused by the invariant below, a trap not worth shipping). From
    * then on every row-minting commit FILLS the column when the writer
    * omits it, and VALIDATES it (null-safe `c <=> expr`) when supplied
    * — the enforcement rides the CHECK-constraint scan of the
    * just-written delta, O(delta) per commit, atomic refusal. An
    * UPDATE that changes a source column must assign the generated
    * column consistently or be refused (we validate rather than
    * silently recompute). The expression may reference only existing
    * columns; [[dropColumn]] pins them while the generated column
    * lives, and dropping the generated column itself retires the
    * property. */
  def addGeneratedColumn(spark: SparkSession, table: String, name: String,
                         dataType: DataType, expression: String,
                         maxAttempts: Int = 10): Long =
    alterSchemaWith(spark, table, "addGeneratedColumn", maxAttempts) {
      (cur, entry) =>
        val res = resolver(spark)
        require(!name.startsWith("__graft_dv_"),
          "TxnLake.addGeneratedColumn: __graft_dv_* names are reserved")
        require(!collides(spark, cur, entry, name),
          s"TxnLake.addGeneratedColumn: column $name already exists")
        require(!entry.droppedCols.exists(res(_, name)),
          s"TxnLake.addGeneratedColumn: column $name was DROPPED from " +
            s"$table — its bytes would resurrect (resolution is " +
            "case-insensitive)")
        require(read(spark, table).isEmpty,
          s"TxnLake.addGeneratedColumn: $table is not empty — generated " +
            "columns declare on an EMPTY table (the Delta at-creation " +
            "rule): existing rows could never hold the value and any " +
            "later rewrite of them would be refused by the invariant")
        val refs = attrRefs(spark, expression)
        // a column is known by its physical schema name or, when
        // renamed, its display name
        val unknown = refs.filterNot(r =>
          cur.fieldNames.exists(c =>
            res(displayOf(entry.renames, c), r) || res(c, r)))
        require(unknown.isEmpty,
          s"TxnLake.addGeneratedColumn: expression references unknown " +
            s"column(s) ${unknown.mkString(", ")}")
        // display names of renamed sources are fine (enforcement and
        // write-time fill speak display; renames rewrite the stored
        // text) — only the RETIRED physical name refuses
        val retiredRefs = refs.filter(r => entry.renames.exists {
          case (p, d) => res(p, r) && !res(d, r) })
        require(retiredRefs.isEmpty,
          s"TxnLake.addGeneratedColumn: expression references the " +
            s"RETIRED name(s) ${retiredRefs.mkString(", ")} of renamed " +
            "column(s) — use the current display name")
        AlterSpec(StructType(cur.fields :+
            StructField(name, dataType, nullable = true)),
          addGenCols = Map(name -> expression))
    }

  /** `ALTER TABLE … ADD COLUMN … GENERATED ALWAYS AS IDENTITY (START
    * WITH start INCREMENT BY step)` — Delta's identity columns, declared
    * on an EMPTY table (the same at-creation contract as
    * [[addGeneratedColumn]]: historical rows could never hold values).
    * From then on every row-minting commit ASSIGNS the column — writers
    * may not supply it on append/overwrite (ALWAYS), engine rewrites
    * carry existing values, and merge-minted inserts null-fill into
    * fresh assignments. Values are unique and step-directed monotone
    * across commits, WITH GAPS (Delta's documented contract): parallel
    * tasks reserve disjoint ranges through the partition-id spacing of
    * monotonically_increasing_id, so assignment costs no extra pass, no
    * shuffle, no driver coordination, and the high-water mark advances
    * from the commit's own harvested file stats — O(1) metadata at any
    * scale. The hwm survives restore/clone monotone (rolled-past values
    * are never reissued). */
  def addIdentityColumn(spark: SparkSession, table: String, name: String,
                        start: Long = 1L, step: Long = 1L,
                        maxAttempts: Int = 10): Long =
    alterSchemaWith(spark, table, "addIdentityColumn", maxAttempts) {
      (cur, entry) =>
        val res = resolver(spark)
        require(step != 0, "TxnLake.addIdentityColumn: step must be nonzero")
        require(!name.startsWith("__graft_dv_"),
          "TxnLake.addIdentityColumn: __graft_dv_* names are reserved")
        require(!collides(spark, cur, entry, name),
          s"TxnLake.addIdentityColumn: column $name already exists")
        require(!entry.droppedCols.exists(res(_, name)),
          s"TxnLake.addIdentityColumn: column $name was DROPPED from " +
            s"$table — its bytes would resurrect (resolution is " +
            "case-insensitive)")
        require(read(spark, table).isEmpty,
          s"TxnLake.addIdentityColumn: $table is not empty — identity " +
            "columns declare on an EMPTY table (the Delta at-creation " +
            "rule): existing rows could never hold assigned values")
        AlterSpec(StructType(cur.fields :+
            StructField(name, LongType, nullable = true)),
          addIdentity = Map(name -> IdentitySpec(start, step, start - step)))
    }

  /** The live identity-column properties of a table (name → spec) — one
    * O(1) entry read; empty when none are declared. */
  def identityColumns(spark: SparkSession, table: String)
      : Map[String, IdentitySpec] =
    latestVersion(spark, table)
      .map(readEntry(spark, table, _).identityCols).getOrElse(Map.empty)

  /** [[identityColumns]] at a historical version (time travel): the
    * specs — hwm included — exactly as that commit published them. */
  def identityColumnsAt(spark: SparkSession, table: String, version: Long)
      : Map[String, IdentitySpec] =
    readEntry(spark, table, version).identityCols

  /** Identity properties survive restore/compensation with their hwm
    * MONOTONE-merged against the latest entry's: the restored snapshot's
    * start/step return, but values handed out by rolled-past commits are
    * never reissued — strictly stronger than Delta's restore, for the
    * cost of one max per column. */
  private def mergeIdentityMonotone(target: Map[String, IdentitySpec],
                                    latest: Map[String, IdentitySpec])
      : Map[String, IdentitySpec] =
    target.map { case (c, sp) =>
      val hw = latest.get(c).map(l =>
        if (sp.step > 0) math.max(sp.hwm, l.hwm)
        else math.min(sp.hwm, l.hwm)).getOrElse(sp.hwm)
      c -> sp.copy(hwm = hw)
    }

  /** `ALTER TABLE … DROP COLUMN` — METADATA-ONLY narrowing: the logged
    * schema loses the column, every read projects it away, and not one
    * data file moves. The dropped name enters a cumulative TOMBSTONE
    * set carried on every entry: the bytes are still in the old files,
    * so any later data commit (append/merge/…) reintroducing the name
    * is refused loudly instead of silently resurrecting them — Delta
    * solves this with column-mapping physical ids; a tombstone is the
    * honest equivalent without rewriting readers. An overwrite retires
    * the tombstones (it removes every file holding the bytes). Dropping
    * a bloom-indexed column also retires its index declaration. The
    * last remaining column cannot be dropped. */
  def dropColumn(spark: SparkSession, table: String, name: String,
                 maxAttempts: Int = 10): Long =
    alterSchemaWith(spark, table, "dropColumn", maxAttempts) { (cur, entry) =>
      val res = resolver(spark)
      // canonicalize to the SCHEMA's PHYSICAL casing: the tombstone,
      // bloom drop, and gen-col retirement must record the stored name,
      // whatever casing the caller typed (resolution is
      // case-insensitive); a renamed column drops by its DISPLAY name
      val canonOpt = canonPhysical(spark, cur, entry, name)
      require(canonOpt.isDefined,
        s"TxnLake.dropColumn: no column $name in $table")
      val canon = canonOpt.get
      require(cur.fields.length > 1,
        s"TxnLake.dropColumn: cannot drop the last column of $table")
      // a live CHECK constraint or generated-column expression
      // referencing the column pins it (Delta's rule): dropping would
      // break every later commit's enforcement scan
      // stored expressions are DISPLAY-named: a renamed column pins by
      // its display name, an unrenamed one by its physical name
      val disp = displayOf(entry.renames, canon)
      def refsIt(x: String): Boolean =
        attrRefs(spark, x).exists(r => res(r, canon) || res(r, disp))
      val pinning = entry.constraints.filter(kv => refsIt(kv._2))
        .keys.toSeq ++
        entry.genCols.filter { case (g, x) =>
          !res(g, canon) && refsIt(x) }.keys.map(g =>
          s"generated column $g")
      require(pinning.isEmpty,
        s"TxnLake.dropColumn: column $canon is referenced by " +
          s"${pinning.sorted.mkString(", ")} — drop those first")
      AlterSpec(StructType(cur.fields.filterNot(_.name == canon)),
        dropBlooms = Seq(canon), tombstones = Seq(canon),
        // dropping a generated/identity column itself retires its property
        dropGenCols = if (entry.genCols.contains(canon)) Seq(canon)
          else Seq.empty,
        dropIdentity = if (entry.identityCols.contains(canon)) Seq(canon)
          else Seq.empty,
        // a dropped column's display mapping dies with it — the
        // tombstone records the PHYSICAL name, which is what guards
        // the bytes
        dropRenames = if (entry.renames.contains(canon)) Seq(canon)
          else Seq.empty)
    }

  /** The promotions [[widenColumnType]] accepts: every value of the
    * narrow type is exactly representable in the wide one AND the
    * parquet reader upcasts the old files' physical encoding natively
    * (verified: int32→int64, int32→double, float→double), so widening
    * is metadata-only with zero read ambiguity. long→double is
    * deliberately absent (lossy past 2^53), as is anything involving
    * strings or decimals. */
  private val SafeWidenings: Set[(DataType, DataType)] = Set(
    ByteType -> ShortType, ByteType -> IntegerType, ByteType -> LongType,
    ShortType -> IntegerType, ShortType -> LongType,
    IntegerType -> LongType, IntegerType -> DoubleType,
    ByteType -> DoubleType, ShortType -> DoubleType,
    FloatType -> DoubleType)

  /** `ALTER TABLE … ALTER COLUMN … TYPE` — Delta's TYPE WIDENING:
    * metadata-only promotion of a column to a wider type (one log
    * entry, zero files moved); old files' narrower physical values
    * upcast at scan time through the parquet reader's native
    * conversions. Only the lossless [[SafeWidenings]] are accepted.
    * Old files' min/max stats keep their integer tag: an integer
    * promotion still prunes them exactly, a promotion to double leaves
    * them conservatively unprunable (new files harvest double stats) —
    * never wrongly pruned either way. Widening a BLOOM-INDEXED column
    * to double is refused: the sidecars hash string renderings, and
    * "5" vs "5.0" would silently turn membership misses into wrong
    * file skips; integer-family promotions are render-stable and stay
    * allowed. Writers must supply the widened type afterwards (a
    * narrower append is refused by the schema merge, loudly — no
    * silent upcast-on-write). */
  def widenColumnType(spark: SparkSession, table: String, name: String,
                      to: DataType, maxAttempts: Int = 10): Long =
    alterSchemaWith(spark, table, "widenColumnType", maxAttempts) {
      (cur, entry) =>
        val res = resolver(spark)
        val canonOpt = canonPhysical(spark, cur, entry, name)
        require(canonOpt.isDefined,
          s"TxnLake.widenColumnType: no column $name in $table")
        val canon = canonOpt.get
        val from = cur(cur.fieldIndex(canon)).dataType
        require(SafeWidenings.contains((from, to)),
          s"TxnLake.widenColumnType: ${from.simpleString} -> " +
            s"${to.simpleString} is not a lossless widening (allowed: " +
            "byte/short/int up the integer family, int-family -> " +
            "double, float -> double)")
        require(!(entry.bloomCols.exists(res(_, canon)) && to == DoubleType),
          s"TxnLake.widenColumnType: $canon is bloom-indexed — a double " +
            "promotion changes the key rendering the sidecars hashed " +
            "(\"5\" vs \"5.0\") and would turn misses into wrong file " +
            "skips; drop the column's bloom declaration first")
        AlterSpec(StructType(cur.fields.map(f =>
          if (f.name == canon) f.copy(dataType = to) else f)))
    }

  /** `ALTER TABLE … RENAME COLUMN` — Delta's column-mapping rename:
    * metadata-only (one log entry; NO file moves, NO schema-json change,
    * NO sidecar or stat invalidation). The column keeps its PHYSICAL
    * name — its name at creation — in every file, footer stat, and
    * bloom sidecar; a cumulative (physical → display) map overlays the
    * new name at the read and write boundaries. Consequences, all
    * tested: data reads under the new name immediately (old files
    * included); writes under the RETIRED old name refuse loudly (they
    * would alias the renamed column's storage); bloom/stat skipping
    * stays live across the rename (the sidecars never knew the display
    * name); old versions time-travel under the names of their own era;
    * rename-back collapses the mapping. Pins (refused while live, the
    * [[dropColumn]] rule): identity columns, generated columns, and any
    * column referenced by a CHECK constraint or generated-column
    * expression — their SQL strings are resolved against the physical
    * frame at every commit and would silently dangle. */
  def renameColumn(spark: SparkSession, table: String, name: String,
                   newName: String, maxAttempts: Int = 10): Long =
    alterSchemaWith(spark, table, "renameColumn", maxAttempts) {
      (cur, entry) =>
        val res = resolver(spark)
        require(!newName.startsWith("__"),
          "TxnLake.renameColumn: __-prefixed names are reserved for " +
            "engine plumbing (__graft_*, merge tags)")
        val physOpt = canonPhysical(spark, cur, entry, name)
        require(physOpt.isDefined,
          s"TxnLake.renameColumn: no column $name in $table")
        val p = physOpt.get
        val curDisplay = displayOf(entry.renames, p)
        require(!res(curDisplay, newName),
          s"TxnLake.renameColumn: $name is already named $newName")
        // collision against every OTHER column's display or physical
        // name — the column's OWN physical is exempt: renaming back to
        // it collapses the mapping
        val collidesOther =
          cur.fieldNames.exists(c => res(c, newName) && !res(c, p)) ||
            entry.renames.exists { case (pp, d) =>
              res(d, newName) && !res(pp, p) }
        require(!collidesOther,
          s"TxnLake.renameColumn: column $newName already exists in " +
            s"$table (as a display or physical name)")
        require(!entry.droppedCols.exists(res(_, newName)),
          s"TxnLake.renameColumn: $newName was DROPPED from $table — " +
            "reusing the name (resolution is case-insensitive) would " +
            "confuse the tombstone that guards its bytes")
        require(!entry.identityCols.keys.exists(res(_, p)),
          s"TxnLake.renameColumn: $curDisplay is an IDENTITY column — " +
            "its assignment machinery is keyed by name; drop it first")
        require(!entry.genCols.keys.exists(res(_, p)),
          s"TxnLake.renameColumn: $curDisplay is a GENERATED column — " +
            "its expression property is keyed by name; drop it first")
        // the rename FOLLOWS the references (Delta column-mapping
        // behavior): stored CHECK-constraint and generated-column
        // expressions that name this column rewrite in the same
        // metadata commit — parse, substitute every occurrence of the
        // current display name, store the regenerated SQL — so they
        // keep enforcing under the new name instead of refusing the
        // rename (pre-r19 behavior) or silently dangling
        val rewrittenCons = entry.constraints.collect {
          case (n, x) if attrRefs(spark, x).exists(res(_, curDisplay)) =>
            n -> substituteAttr(spark, x, curDisplay, newName)
        }
        val rewrittenGens = entry.genCols.collect {
          case (g, x) if attrRefs(spark, x).exists(res(_, curDisplay)) =>
            g -> substituteAttr(spark, x, curDisplay, newName)
        }
        // schema json unchanged — the overlay IS the rename
        AlterSpec(cur, addRenames = Map(p -> newName),
          addConstraints = rewrittenCons, addGenCols = rewrittenGens)
    }

  /** The live (physical → display) rename overlay — empty when no
    * column has ever been renamed. */
  def columnRenames(spark: SparkSession, table: String): Map[String, String] =
    latestVersion(spark, table)
      .map(readEntry(spark, table, _).renames).getOrElse(Map.empty)

  /** The live CHECK constraints of a table (name → SQL expression) —
    * one O(1) entry read; empty on a table that declared none. */
  def tableConstraints(spark: SparkSession, table: String): Map[String, String] =
    latestVersion(spark, table)
      .map(readEntry(spark, table, _).constraints).getOrElse(Map.empty)

  /** `ALTER TABLE … ADD CONSTRAINT` — Delta's persistent CHECK
    * constraint: declared ONCE as a table property (a metadata-only log
    * entry), then enforced on EVERY later data-bearing commit — append,
    * overwrite, merge, update — by scanning only the just-written delta
    * before its entry publishes: a violating commit aborts with nothing
    * visible. SQL CHECK semantics (a NULL verdict passes; only FALSE
    * violates) — the complement of [[Expectations]]' DLT quarantine
    * tier, which diverts rather than refuses and treats NULL as a
    * violation. Like Delta, the EXISTING table is validated first:
    * declaring a constraint current rows already break is refused with
    * the violation count (one O(table) scan, paid once at declaration).
    * The expression is SQL text, resolved against the logged schema —
    * columns the constraint references cannot be dropped while it
    * lives. */
  def addConstraint(spark: SparkSession, table: String, name: String,
                    expression: String, maxAttempts: Int = 10): Long = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    require(name.nonEmpty && !name.exists(c => c == ',' || c == '"'),
      s"TxnLake.addConstraint: malformed constraint name '$name'")
    alterSchemaWith(spark, table, "addConstraint", maxAttempts) {
      (cur, entry) =>
        require(!entry.constraints.contains(name),
          s"TxnLake.addConstraint: constraint $name already exists on " +
            s"$table (`${entry.constraints.getOrElse(name, "")}`)")
        // the expression resolves against PHYSICAL frames at every later
        // commit's enforcement scan — referencing a RENAMED column (by
        // either name) would dangle or silently bind the wrong bytes
        locally {
          val res = resolver(spark)
          // display names of renamed columns are fine (enforcement
          // translates through the overlay, and a later rename rewrites
          // the stored text) — only the RETIRED physical name refuses,
          // since it would silently bind the renamed column's storage
          val retired = attrRefs(spark, expression).filter(r =>
            entry.renames.exists { case (p, d) => res(p, r) && !res(d, r) })
          require(retired.isEmpty,
            s"TxnLake.addConstraint: expression references the RETIRED " +
              s"name(s) ${retired.mkString(", ")} of renamed column(s) — " +
              "use the current display name")
        }
        // validate the EXISTING rows (masked snapshot) before declaring
        val bad = read(spark, table)
          .where(not(coalesce(expr(expression), lit(true)))).count()
        require(bad == 0,
          s"TxnLake.addConstraint: $bad existing row(s) of $table " +
            s"violate `$expression` — repair the data first")
        AlterSpec(cur, addConstraints = Map(name -> expression))
    }
  }

  /** `ALTER TABLE … DROP CONSTRAINT` — metadata-only retirement; later
    * commits stop enforcing it. Unknown names are refused (loudly, with
    * the live set) rather than silently no-opped. */
  def dropConstraint(spark: SparkSession, table: String, name: String,
                     maxAttempts: Int = 10): Long =
    alterSchemaWith(spark, table, "dropConstraint", maxAttempts) {
      (cur, entry) =>
        require(entry.constraints.contains(name),
          s"TxnLake.dropConstraint: no constraint $name on $table " +
            s"(live: ${entry.constraints.keys.toSeq.sorted.mkString(", ")})")
        AlterSpec(cur, dropConstraints = Seq(name))
    }

  /** Shared ALTER loop: resolve the pinned snapshot's current schema
    * (footer-merged on a legacy log — the one-time upgrade cost every
    * scoped rewrite pays), let `change` produce (new schema, bloom
    * drops, tombstones), and publish as a noData "metadata" commit with
    * recompute-on-conflict. */
  /** One ALTER's full outcome: the new schema plus every table-property
    * delta it carries into the metadata commit. */
  private final case class AlterSpec(schema: StructType,
                                     dropBlooms: Seq[String] = Seq.empty,
                                     tombstones: Seq[String] = Seq.empty,
                                     addConstraints: Map[String, String] =
                                       Map.empty,
                                     dropConstraints: Seq[String] = Seq.empty,
                                     addGenCols: Map[String, String] =
                                       Map.empty,
                                     dropGenCols: Seq[String] = Seq.empty,
                                     addIdentity: Map[String, IdentitySpec] =
                                       Map.empty,
                                     dropIdentity: Seq[String] = Seq.empty,
                                     addRenames: Map[String, String] =
                                       Map.empty,
                                     dropRenames: Seq[String] = Seq.empty)

  private def alterSchemaWith(spark: SparkSession, table: String, api: String,
                              maxAttempts: Int)
                             (change: (StructType, Entry) => AlterSpec)
      : Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, table).getOrElse(
        sys.error(s"TxnLake.$api: no committed version in $table"))
      val entry = readEntry(spark, table, base)
      val cur = subsetReadSchema(spark, table, entry.schemaStruct,
        resolveFiles(spark, table, base))
      val spec = change(cur, entry)
      val emptyDf = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], spec.schema)
      try return commitImpl(spark, emptyDf, table, "metadata", None,
          maxAttempts = 1, requireBase = Some(Some(base)),
          removePaths = Some(Seq.empty), noData = true,
          schemaOverride = Some(spec.schema),
          dropBloomCols = spec.dropBlooms,
          tombstoneCols = spec.tombstones,
          newConstraints = spec.addConstraints,
          dropConstraintNames = spec.dropConstraints,
          newGenCols = spec.addGenCols,
          dropGenColNames = spec.dropGenCols,
          newIdentityCols = spec.addIdentity,
          dropIdentityColNames = spec.dropIdentity,
          newRenames = spec.addRenames,
          dropRenames = spec.dropRenames)
        .getOrElse(sys.error("unreachable: txn-less commit cannot be skipped"))
      catch { case _: CommitConflict => attempt += 1 }
    }
    throw new java.util.ConcurrentModificationException(
      s"TxnLake.$api: $maxAttempts consecutive concurrent commits on $table")
  }

  // ---- introspection --------------------------------------------------

  /** One row of table metadata — Delta's `DESCRIBE DETAIL`, resolved
    * from the latest entry + O(|files|) driver metadata (the size
    * listing): live file count and bytes, logical row count (file
    * row-counts minus masked positions; −1 when a legacy file predates
    * row counting), mask census, and the full table-property surface
    * (schema, bloom declaration, CHECK constraints, drop tombstones). */
  final case class TableDetail(version: Long, committedAt: Long,
                               numFiles: Int, sizeBytes: Long,
                               numRows: Long, maskedRows: Long,
                               deletionVectors: Int,
                               schema: Option[StructType],
                               bloomCols: Seq[String],
                               constraints: Map[String, String],
                               droppedCols: Seq[String],
                               genCols: Map[String, String] = Map.empty,
                               identityCols: Map[String, IdentitySpec] =
                                 Map.empty,
                               renames: Map[String, String] = Map.empty,
                               rowIdHwm: Long = -1L)

  def describeDetail(spark: SparkSession, table: String): TableDetail = {
    val v = latestVersion(spark, table).getOrElse(
      sys.error(s"TxnLake.describeDetail: no committed version in $table"))
    val e = readEntry(spark, table, v)
    val files = resolveFiles(spark, table, v)
    val bytes = snapshotFileSizes(spark, table, Some(v)).map(_._2).sum
    val dvsLive = resolveDvs(spark, table, v)
    val masked = dvsLive.values.map(_.rows).sum
    val rows =
      if (files.exists(_.rows < 0)) -1L
      else files.map(_.rows).sum - masked
    TableDetail(v, commitTimestamp(spark, table, v), files.size, bytes,
      rows, masked, dvsLive.size,
      // the user-facing schema speaks DISPLAY names; the raw physical →
      // display overlay rides alongside for introspection
      e.schemaStruct.map(toDisplaySchema(_, e.renames)),
      e.bloomCols.map(displayOf(e.renames, _)),
      e.constraints, e.droppedCols, e.genCols, e.identityCols, e.renames,
      e.ridHwm)
  }

  /** What [[vacuum]] WOULD reclaim, without deleting anything —
    * Delta's `VACUUM … DRY RUN`: (parquet data files, their bytes)
    * referenced by no retained version. The same stable live-set
    * resolution vacuum itself performs (bounded re-list on concurrent
    * commits), the same file-granular dead walk, zero mutations — so
    * `vacuumDryRun(...)._1 == vacuum(...)` on a quiescent table, and a
    * retention job can report before it reclaims. */
  def vacuumDryRun(spark: SparkSession, table: String,
                   retainVersions: Int = 1): (Int, Long) = {
    var versions = committedVersions(spark, table)
    if (versions.isEmpty) return (0, 0L)
    var live = Set.empty[String]
    var attempt = 0
    var stable = false
    while (!stable) {
      if (attempt >= 10)
        throw new java.util.ConcurrentModificationException(
          s"TxnLake.vacuumDryRun: log of $table advanced on every one " +
            "of 10 live-set resolutions")
      val retained = versions.takeRight(math.max(1, retainVersions))
      live = retained.flatMap(resolveFiles(spark, table, _).map(_.path))
        .toSet ++
        retained.flatMap(v => resolveDvs(spark, table, v).values
          .map(_.path))
      val now = committedVersions(spark, table)
      if (now == versions) stable = true else versions = now
      attempt += 1
    }
    val dataRoot = new Path(table, "data")
    val f = fs(spark, dataRoot)
    if (!f.exists(dataRoot)) return (0, 0L)
    var files = 0
    var bytes = 0L
    f.listStatus(dataRoot).filter(_.isDirectory).foreach { d =>
      val dirRel = s"data/${d.getPath.getName}"
      f.listStatus(d.getPath).filter(_.isFile).foreach { s =>
        val n = s.getPath.getName
        if (n.endsWith(".parquet") && !live.contains(s"$dirRel/$n")) {
          files += 1
          bytes += s.getLen
        }
      }
    }
    (files, bytes)
  }

  // ---- clone ----------------------------------------------------------

  /** CLONE `source` (at `version`, default latest) into the brand-new
    * table `target` — Delta's `CREATE TABLE … CLONE`.
    *
    * SHALLOW (default, zero-copy): the clone's founding v0 entry
    * REFERENCES the source snapshot's data files and deletion-vector
    * sidecars by absolute path — no data I/O at any table size
    * (O(|files|) metadata, one entry write; cloning a 100 TB table
    * costs what cloning a 100 MB one does). The clone owns its log
    * from v0: commits, DML, maintenance, and vacuum on the clone never
    * touch the source's files (the clone's vacuum reclaims only under
    * ITS OWN data dir — absolute references are structurally out of its
    * reach), and source commits never appear in the clone. The one
    * CAVEAT is Delta's own: vacuum on the SOURCE knows nothing about
    * shallow clones, so reclaiming source files a clone still
    * references breaks that clone's reads — the standard shallow-clone
    * retention contract.
    *
    * DEEP (`shallow = false`): the snapshot's data files, their bloom
    * sidecars, and its DV sidecars COPY byte-for-byte into the clone's
    * own dirs (O(table) I/O, once), after which the clone is fully
    * self-contained — no source lifecycle can touch it.
    *
    * Either way the clone founds with the source's logged schema,
    * bloom-column declaration, per-file stats (no re-harvest), and
    * masks; its txn state starts EMPTY (a replica consumer founding on
    * the clone is a new app by definition). The founding entry's tag is
    * "append", so the clone's own change feed attributes v0 as the
    * snapshot's (mask-honoring) inserts. `target` must not already be a
    * table — refused loudly, never merged. */
  def cloneTable(spark: SparkSession, source: String, target: String,
                 shallow: Boolean = true,
                 version: Option[Long] = None): Long = {
    val srcV = version.orElse(latestVersion(spark, source)).getOrElse(
      sys.error(s"TxnLake.cloneTable: no committed version in $source"))
    require(committedVersions(spark, target).isEmpty,
      s"TxnLake.cloneTable: target $target is already a table — clone " +
        "founds a NEW table, it does not merge into one")
    val files = resolveFiles(spark, source, srcV)
    requireLive(spark, source, srcV, files)
    val srcEntry = readEntry(spark, source, srcV)
    val srcDvs = resolveDvs(spark, source, srcV)
    val f = fs(spark, new Path(target))
    srcDvs.values.foreach { r =>
      if (!f.exists(new Path(source, r.path)))
        throw new IllegalStateException(
          s"TxnLake.cloneTable: version $srcV's deletion-vector sidecar " +
            s"${r.path} has been vacuumed")
    }
    val salt = java.util.UUID.randomUUID().toString.take(8)
    val (add, dvs) =
      if (shallow) {
        def abs(rel: String) = new Path(source, rel).toString
        (files.map(fm => fm.copy(path = abs(fm.path))),
          srcDvs.map { case (rel, r) =>
            abs(rel) -> DvRef(abs(r.path), r.rows) })
      } else {
        val dataRel = s"data/v0-$salt"
        f.mkdirs(new Path(target, dataRel))
        val names = files.map(fm => new Path(fm.path).getName)
        require(names.distinct.size == names.size,
          s"TxnLake.cloneTable: duplicate data-file names in $source@$srcV")
        // the copy DISTRIBUTES (r16 verdict minor #3): a deep clone of a
        // large table through a serial driver loop is days, not hours —
        // per-file work (data file + its bloom sidecars + DV sidecars)
        // is independent, so it fans out as one Spark job over the file
        // list, the same shape harvestAll uses. The driver only ever
        // holds the file LIST (it already does, from resolveFiles).
        val ser = new SerConf(spark.sparkContext.hadoopConfiguration)
        val srcRoot = source
        val tgtRoot = target
        val dvRel = s"_dv/$salt"
        if (srcDvs.nonEmpty) f.mkdirs(new Path(target, dvRel))
        val copyUnits: Seq[(String, String)] =
          files.map(fm => fm.path -> s"$dataRel/${new Path(fm.path).getName}")
        val dvUnits: Seq[(String, String)] = srcDvs.values.toSeq
          .map(r => r.path -> s"$dvRel/${new Path(r.path).getName}")
        // max(1, …): a deep clone of an EMPTY table still needs a legal
        // slice count for the (empty) copy job
        val slices = math.max(1, math.min(copyUnits.size + dvUnits.size,
          math.max(1, spark.sparkContext.defaultParallelism)))
        lastCloneCopySlices = slices
        spark.sparkContext
          .parallelize(copyUnits.map(_ -> true) ++ dvUnits.map(_ -> false),
            slices)
          .foreach { case ((srcRel, dstRel), withSidecars) =>
            val conf = ser.value
            val srcP = new Path(srcRoot, srcRel)
            val fsx = srcP.getFileSystem(conf)
            org.apache.hadoop.fs.FileUtil.copy(fsx, srcP, fsx,
              new Path(tgtRoot, dstRel), false, conf)
            if (withSidecars) {
              // bloom sidecars ride their data file
              val dir = srcP.getParent
              if (fsx.exists(dir))
                fsx.listStatus(dir).map(_.getPath).filter(p =>
                  p.getName.startsWith(srcP.getName + ".bloom."))
                  .foreach { b =>
                    org.apache.hadoop.fs.FileUtil.copy(fsx, b, fsx,
                      new Path(tgtRoot,
                        s"${new Path(dstRel).getParent}/${b.getName}"),
                      false, conf)
                  }
            }
          }
        val copied = files.map(fm =>
          fm.copy(path = s"$dataRel/${new Path(fm.path).getName}"))
        val dvsCopied = srcDvs.map { case (rel, r) =>
          s"$dataRel/${new Path(rel).getName}" ->
            DvRef(s"$dvRel/${new Path(r.path).getName}", r.rows)
        }
        (copied, dvsCopied)
      }
    f.mkdirs(logDir(target))
    val entry = render(Entry(0L, "append", add, Seq.empty, None, None,
      Map.empty, hasTxns = true, schemaJson = srcEntry.schemaJson,
      bloomCols = srcEntry.bloomCols, dvs = dvs,
      droppedCols = srcEntry.droppedCols,
      constraints = srcEntry.constraints,
      genCols = srcEntry.genCols,
      identityCols = srcEntry.identityCols,
      // the clone's files carry their base row ids verbatim, so the
      // source's mark rides too — ids stay stable across a clone
      ridHwm = srcEntry.ridHwm,
      renames = srcEntry.renames,
      ts = nextTs(None)))
    val tmp = new Path(logDir(target), s"v0.json.tmp-$salt")
    val out = f.create(tmp, false)
    try out.write(entry.getBytes("UTF-8")) finally out.close()
    if (!publishExclusive(f, tmp, new Path(logDir(target), "v0.json"))) {
      f.delete(tmp, false)
      sys.error(s"TxnLake.cloneTable: a concurrent writer founded $target " +
        "first — clone refuses to merge into an existing table")
    }
    0L
  }

  // ---- vacuum ---------------------------------------------------------

  /** Delete data FILES referenced by NO retained version (the newest
    * `retainVersions` stay readable; older log entries remain but their
    * exclusive files are reclaimed), then any dir left empty. Returns the
    * reclaimed parquet-file count.
    *
    * File granularity matters since [[compactSmallFiles]]: an
    * incremental compaction can remove SOME files of a multi-file commit
    * dir, leaving a dir that is live (other files still referenced) yet
    * carries dead bytes — a dir-granular vacuum would never reclaim
    * those, a storage leak that compounds at ingest cadence. */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int = 1): Int =
    vacuumImpl(spark, table, retainVersions, () => ())

  /** Test seam: `beforeDelete` runs between the live-set resolution and
    * the re-list check, letting specs land a concurrent [[restore]]
    * deterministically (vacuum must then recompute and spare its files). */
  private[sources] def vacuumImpl(spark: SparkSession, table: String,
                                  retainVersions: Int,
                                  beforeDelete: () => Unit): Int =
    vacuumAttempt(spark, table, retainVersions, beforeDelete, budget = 10)

  private def vacuumAttempt(spark: SparkSession, table: String,
                            retainVersions: Int, beforeDelete: () => Unit,
                            budget: Int): Int = {
    var versions = committedVersions(spark, table)
    if (versions.isEmpty) return 0
    var live = Set.empty[String]
    // Resolve the retained versions' live set, then RE-LIST the log: a
    // restore (or any commit) that published while we were resolving can
    // re-reference files the stale live set would reclaim. Loop until the
    // listing is stable — each iteration is O(retained) metadata reads,
    // and BOUNDED like every other concurrency loop in this file: a table
    // committing faster than the live set can be resolved, forever, must
    // fail loudly (ConcurrentModificationException, the merge/optimize
    // convention) rather than livelock the maintenance job. The budget is
    // SHARED with the post-seam restart below — a restart with a fresh
    // budget would reopen the livelock through the restart edge. (Restore
    // closes its side with a post-publish re-verify + compensation.)
    var attempt = 0
    var stable = false
    while (!stable) {
      if (attempt >= budget)
        throw new java.util.ConcurrentModificationException(
          s"TxnLake.vacuum: log of $table advanced on every one of " +
            s"$budget live-set resolutions")
      val retained = versions.takeRight(math.max(1, retainVersions))
      live = retained.flatMap(resolveFiles(spark, table, _).map(_.path)).toSet ++
        // deletion-vector sidecars referenced by ANY retained version
        // stay live with their snapshots (time travel reads them)
        retained.flatMap(v => resolveDvs(spark, table, v).values.map(_.path))
      val now = committedVersions(spark, table)
      if (now == versions) stable = true else versions = now
      attempt += 1
    }
    beforeDelete()
    val check = committedVersions(spark, table)
    if (check != versions) {
      val remaining = budget - attempt - 1
      if (remaining <= 0)
        throw new java.util.ConcurrentModificationException(
          s"TxnLake.vacuum: log of $table advanced on every one of " +
            s"$budget live-set resolutions")
      return vacuumAttempt(spark, table, retainVersions, () => (), remaining)
    }
    val dataRoot = new Path(table, "data")
    val f = fs(spark, dataRoot)
    if (!f.exists(dataRoot)) return 0
    var reclaimed = 0
    f.listStatus(dataRoot).filter(_.isDirectory).foreach { d =>
      val dirRel = s"data/${d.getPath.getName}"
      val files = f.listStatus(d.getPath).filter(_.isFile)
      val (alive, dead) = files.partition(s =>
        live.contains(s"$dirRel/${s.getPath.getName}"))
      if (alive.isEmpty) {
        // whole dir dead: one recursive delete takes markers with it
        reclaimed += dead.count(_.getPath.getName.endsWith(".parquet"))
        f.delete(d.getPath, true)
      } else {
        dead.foreach { s =>
          val n = s.getPath.getName
          if (n.endsWith(".parquet")) {
            f.delete(s.getPath, false)
            reclaimed += 1
          } else {
            // bloom sidecars ride their data file's lifetime: reclaim one
            // whose data file is itself dead (a live file's sidecar is
            // classified "dead" here only because the live set tracks
            // data paths — leave it)
            val i = n.indexOf(".parquet.bloom.")
            if (i >= 0 &&
                !live.contains(s"$dirRel/${n.substring(0, i + 8)}"))
              f.delete(s.getPath, false)
          }
        }
      }
    }
    // deletion-vector sidecars no retained version references: the masks
    // of vacuumed history, or orphans from superseded DV deletes
    val dvRoot = new Path(table, "_dv")
    if (f.exists(dvRoot)) {
      f.listStatus(dvRoot).filter(_.isDirectory).foreach { d =>
        val dirRel = s"_dv/${d.getPath.getName}"
        val files = f.listStatus(d.getPath).filter(_.isFile)
        if (files.forall(s => !live.contains(s"$dirRel/${s.getPath.getName}")))
          f.delete(d.getPath, true)
        else files.foreach { s =>
          if (!live.contains(s"$dirRel/${s.getPath.getName}"))
            f.delete(s.getPath, false)
        }
      }
    }
    reclaimed
  }

  // ---- LakeFormat: overwrite-snapshot semantics, like ParquetLake, but
  // with the log providing atomicity + isolation. partitionBy is accepted
  // for interface parity; the log tracks files, so pruning at this layer
  // comes from per-file stats (readWhere) rather than dir layout.
  def write(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    commit(df.sparkSession, df, path, "overwrite")
    ()
  }
}

/** Executor-side kernel of [[TxnLake]]'s above-cap snapshot prune: a
  * field-free Serializable holder for the closure that judges one
  * checkpoint row (path, rows, stats-JSON, brid) against the resolved
  * predicate. Separated from [[TxnLake]] so the task closure captures
  * only the predicate and the rename overlay — never the module (whose
  * fields include non-serializable parquet schema objects); the kernel
  * reaches [[TxnLake]]'s matcher through static module access, which
  * re-resolves on the executor instead of serializing. */
private[sources] object SnapshotPrune extends Serializable {

  /** The distributed kept-set decision: the SAME conservative matcher
    * [[TxnLake.readWherePruned]]'s driver path runs — stats parsed from
    * the same JSON, keys displayed through the same overlay — so the
    * two regimes prune identically by construction. */
  def keepRow(pred: org.apache.spark.sql.catalyst.expressions.Expression,
              ren: Map[String, String])
      : org.apache.spark.sql.Row => Boolean = { r =>
    val fm = TxnLake.FileMeta(r.getString(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      TxnLake.parseStatsJson(r.getString(2)),
      if (r.isNullAt(3)) -1L else r.getLong(3))
    TxnLake.mayMatch(TxnLake.displayMeta(ren)(fm), pred)
  }
}
