package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** I26 (round 11): a DataSourceV2 `TableProvider` that makes the
  * commit-log tables first-class SQL citizens:
  *
  * {{{
  *   spark.read.format("graft").option("versionAsOf", 1).load(path)
  *   // or from pure SQL:
  *   CREATE TEMPORARY VIEW t USING graft OPTIONS (path '...', versionAsOf '1')
  * }}}
  *
  * The connector's job is exactly the lakehouse planning step: resolve
  * the requested version through the commit list (O(1) HEAD discovery
  * via the hint; one metadata fetch per read), optionally prune the
  * file list with the commit-embedded I22 stats (`skipCol`/`skipLo`/
  * `skipHi` — file-level, conservative: callers apply their predicate
  * as usual, the pruning only shrinks the scan), and hand the exact
  * file set to Spark's OWN parquet machinery — the returned table IS a
  * [[ParquetTable]], so column pruning, predicate pushdown, vectorized
  * reads and whole-stage codegen all apply unchanged. This is the
  * Spark-first shape: the connector plans, Catalyst executes.
  *
  * Options: `versionAsOf` (default HEAD); `skipCol` + `skipLo`/`skipHi`
  * (µs/long band over a stats-carrying table — requires the version to
  * have been written via `tableAppendStats`).
  *
  * A version carrying DELETION VECTORS (I25) is served MERGE-ON-READ
  * (round 12): the connector collects the version's deleted-key set at
  * planning time (broadcast-sized by the COW-fallback design — files
  * with >cowFraction deleted rows were rewritten, so the surviving DV
  * entries are bounded) and wraps Spark's parquet readers with a
  * key-set row filter. Column pruning and predicate pushdown still
  * forward to the parquet scan; the key column is read-augmented when
  * the query didn't select it and projected back out. Aggregate/limit
  * pushdown is deliberately NOT forwarded on DV versions (it would
  * bypass the row filter). DV-free versions take the raw
  * [[ParquetTable]] path unchanged — zero overhead.
  */
class GraftTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  private def resolveTable(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val path = Option(options.get("path")).getOrElse(
      sys.error("the graft source needs a path (.load(tablePath) or " +
        "OPTIONS (path '...'))"))
    GraftTables.forPath(spark, path, options)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolveTable(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    resolveTable(new CaseInsensitiveStringMap(properties))
}

/** The shared table factory: the `format("graft")` provider and the
  * [[GraftCatalog]] both resolve a commit-log path into the same
  * [[GraftTable]] (round 12). */
private[graft] object GraftTables {
  private def schemaSidecar(path: String) =
    new org.apache.hadoop.fs.Path(path, "_schema")

  /** Persist a DDL-declared schema for a not-yet-written table (the
    * catalog's CREATE TABLE): the commit log itself has no schema
    * until v0 lands, so the sidecar bridges CREATE → first INSERT. */
  private[graft] def writeSchemaSidecar(spark: SparkSession, path: String,
      schema: StructType): Unit = {
    val fs = Io.fsFor(spark, path)
    val out = fs.create(schemaSidecar(path), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  private[graft] def readSchemaSidecar(spark: SparkSession,
      path: String): Option[StructType] = {
    val fs = Io.fsFor(spark, path)
    if (!fs.exists(schemaSidecar(path))) None
    else {
      val in = fs.open(schemaSidecar(path))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(txt)
        .asInstanceOf[StructType])
    }
  }

  def forPath(spark: SparkSession, path: String,
      options: CaseInsensitiveStringMap): Table = {
    val head = Io.tableVersion(spark, path)
    if (head < 0) {
      // a created-but-never-written table serves its declared schema,
      // empty scans, and first-write (v0) appends
      val declared = readSchemaSidecar(spark, path)
      require(declared.isDefined, s"no commit-log table at $path")
      return new GraftEmptyTable(spark, path, declared.get)
    }
    val byTs = Option(options.get("timestampAsOf")).map { t =>
      val millis =
        try t.toLong
        catch {
          case _: NumberFormatException => // ISO local datetime
            java.time.LocalDateTime.parse(t.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        }
      Io.versionAtTimestamp(spark, path, millis)
    }
    require(byTs.isEmpty || !options.containsKey("versionAsOf"),
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version = byTs
      .orElse(Option(options.get("versionAsOf")).map(_.toLong))
      .getOrElse(head)
    require(version >= 0 && version <= head,
      s"version $version out of range [0, $head] at $path")
    val (dvKey, dvDirs) = Io.dvMetaResolved(spark, path, version)
    val files = Io.versionFiles(spark, path, version)
    if (files.isEmpty) {
      // an empty-SELECT atomic CTAS commits v0 with zero data files —
      // the declared schema serves from the sidecar, appends go OCC
      val declared = readSchemaSidecar(spark, path)
      require(declared.isDefined, s"version $version at $path is empty")
      return new GraftEmptyTable(spark, path, declared.get)
    }
    val pruned = Option(options.get("skipCol")) match {
      case None => files
      case Some(skipCol) =>
        val stats = Io.readStatsFile(spark, path, version)
        require(files.isEmpty ||
            stats.contains((Io.trailOf(files.head), skipCol)),
          s"no commit stats for column $skipCol at $path v$version — " +
            "skipCol needs a version written via tableAppendStats " +
            "covering that column")
        val lo = Option(options.get("skipLo")).map(_.toLong)
          .getOrElse(Long.MinValue)
        val hi = Option(options.get("skipHi")).map(_.toLong)
          .getOrElse(Long.MaxValue)
        val kept = files.filter { f =>
          val (mn, mx) = stats((Io.trailOf(f), skipCol))
          mx >= lo && mn < hi
        }
        // schema inference needs ≥1 file; an all-pruned read keeps one
        // carrier file — pruning is conservative, the caller's own
        // predicate (which skipping never replaces) yields the empty set
        if (kept.nonEmpty) kept else files.take(1)
    }
    new GraftTable(
      ParquetTable(s"graft:$path@$version", spark, options,
        pruned.toIndexedSeq, None, classOf[ParquetFileFormat]),
      spark, path, version, head,
      Option(options.get("deleteKey")),
      dvKey.filter(_ => dvDirs.nonEmpty), dvDirs)
  }
}

/** The connector's Table: reads delegate to Spark's own
  * [[ParquetTable]] scan machinery over the resolved file set, and
  * `DELETE FROM` (SQL DML) routes into the commit protocol —
  * merge-on-read via deletion vectors when the view was created with
  * a `deleteKey` option (the I25 row-unique key), copy-on-write
  * otherwise. Deletes apply to HEAD only (a pinned
  * versionAsOf/timestampAsOf view refuses). */
private[graft] class GraftTable(pt: ParquetTable, spark: SparkSession,
    path: String, version: Long, head: Long, deleteKey: Option[String],
    dvKeyCol: Option[String], dvDirs: Seq[String])
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with connector.catalog.SupportsMetadataColumns
  with connector.catalog.SupportsRowLevelOperations {

  override def name(): String = pt.name
  override def schema(): StructType = pt.schema

  /** Table metadata for `DESCRIBE TABLE EXTENDED` (round 12 s3):
    * the commit-log facts a table browser wants — served from state
    * the provider already resolved, zero extra IO. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("graft.version", version.toString)
    m.put("graft.head", head.toString)
    m.put("graft.format", "graft commit-log parquet")
    deleteKey.foreach(m.put("graft.deleteKey", _))
    if (dvDirs.nonEmpty) {
      m.put("graft.deletionVectors", dvDirs.size.toString)
      dvKeyCol.foreach(m.put("graft.dvKey", _))
    }
    m
  }

  /** `_graft_file` (round 12): each row's data file — the GROUP id of
    * the row-level COW machinery (and a provenance column any query
    * may select). Served by [[GraftFileScanBuilder]]'s row
    * augmentation; normal scans that never reference it plan
    * unchanged. */
  override def metadataColumns()
      : Array[connector.catalog.MetadataColumn] =
    Array(new connector.catalog.MetadataColumn {
      override def name(): String = RowLevel.FileCol
      override def dataType(): DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = true
      override def comment(): String =
        "table-relative data file serving this row (graft COW group)"
    })

  /** SQL UPDATE / MERGE INTO / (untranslatable-predicate) DELETE —
    * Spark's row-level-operation framework over the group-based COW
    * rewrite in [[GraftRowLevelOperation]]. HEAD only, like every
    * other mutation. UPDATE/MERGE refuse DV-carrying tables (a
    * modified row could collide with a DV-deleted key behind the
    * carried anti-join — optimizeTableDv first); DELETE composes
    * (the rewrite scan is DV-filtered via [[DvScanBuilder]] and the
    * commit carries the sidecar). */
  override def newRowLevelOperationBuilder(
      info: connector.write.RowLevelOperationInfo)
      : connector.write.RowLevelOperationBuilder = {
    require(version == head,
      s"${info.command} applies to HEAD (v$head) — this view is " +
        s"pinned to v$version via versionAsOf/timestampAsOf")
    if (info.command != connector.write.RowLevelOperation.Command.DELETE)
      require(dvDirs.isEmpty,
        s"table at $path carries deletion vectors — ${info.command} " +
          "could collide with a DV-deleted key behind the carried " +
          "anti-join; run Io.optimizeTableDv first")
    new connector.write.RowLevelOperationBuilder {
      override def build(): connector.write.RowLevelOperation =
        new GraftRowLevelOperation(spark, path, version, info.command,
          opts => baseScanBuilder(opts))
    }
  }
  // Writes (round 12) stage through the OCC commit protocol
  // (tableAppendOcc — writer-unique data dir, version claim at commit,
  // conflict retry), not a raw file sink: the WriteBuilder produces a
  // V1Write so the append is handed over as a whole DataFrame (the
  // JDBC connector's shape — DataSourceV2Strategy plans it as
  // AppendDataExecV1) instead of per-task commits that could never be
  // made atomic against the version log. BATCH_WRITE is advertised so
  // DataFrameWriter takes the DSv2 path at all; V1_BATCH_WRITE is what
  // the capability check actually consumes for a V1Write. TRUNCATE
  // (round 12, session 3) serves INSERT OVERWRITE / mode("overwrite")
  // as a REPLACE COMMIT — the next version lists only the fresh batch,
  // nothing is physically truncated, prior versions keep serving via
  // time travel (the REPLACE TABLE semantics at write-path
  // granularity).
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** Exactly-once `df.write.format("graft").mode("append")`: one OCC
    * commit per save — concurrent writers serialize through version
    * claims and the loser re-lands (the I23 discipline). Appends apply
    * to HEAD only; `mode("overwrite")` is refused (the log is
    * append-only — DELETE/RESTORE are commits, not truncations), and
    * the table must already exist (create v0 via Io.tableAppend: the
    * connector cannot infer a schema from an empty log). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      // `txnVersion` (round 12): the Delta txnAppId/txnVersion idea as
      // a writer option — a foreachBatch sink passes the micro-batch
      // id and redelivery of an already-committed batch becomes a
      // NO-OP (tableAppendIdempotent, the I19 exactly-once contract);
      // without it each save is one OCC commit.
      private val txn = Option(info.options.get("txnVersion")).map(_.toLong)
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: sources.InsertableRelation =
          new sources.InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              require(version == head,
                s"writes apply to HEAD (v$head) — this view is " +
                  s"pinned to v$version via versionAsOf/timestampAsOf")
              if (replace || overwrite) {
                // INSERT OVERWRITE / mode("overwrite"): one replace
                // commit — fresh files only, history intact
                Io.tableOverwrite(data, path)
              } else txn match {
                case Some(b) => Io.tableAppendIdempotent(data, path, b)
                case None => Io.tableAppendOcc(data, path,
                  writer = java.util.UUID.randomUUID().toString)
              }
              ()
            }
          }
      }
    }
  private def baseScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    dvKeyCol match {
      case Some(k) =>
        // one metadata-scale collect per planned scan: the version's
        // distinct deleted keys (external values — converted to
        // Catalyst form executor-side)
        val keys = spark.read.parquet(dvDirs: _*)
          .select(col("k")).distinct().collect().map(_.get(0))
        new DvScanBuilder(pt.newScanBuilder(options), k,
          pt.schema.apply(k).dataType, keys)
      case None => pt.newScanBuilder(options)
    }

  // the file-column wrapper engages only when the plan references
  // _graft_file (the row-level group-filter build side, or an explicit
  // provenance SELECT); otherwise build() hands back the delegate scan
  // untouched — normal reads plan exactly as before
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFileScanBuilderPushdown(baseScanBuilder(options),
      runtimeFilterable = false)

  private def toColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(c) => toColumn(c).map(!_)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  // Translatable predicates take the metadata-delete fast path
  // (Spark's OptimizeMetadataOnlyDeleteFromTable → deleteWhere below:
  // DV merge-on-read with a deleteKey, COW commit without). A filter
  // this surface can't express returns false and the DELETE falls
  // back to the round-12 row-level COW rewrite (RowLevelOps.scala) —
  // any predicate now works, it just pays a group rewrite instead of
  // a metadata commit.
  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(toColumn(_).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    require(version == head,
      s"DELETE applies to HEAD (v$head) — this view is pinned to " +
        s"v$version via versionAsOf/timestampAsOf")
    val pred = filters.flatMap(toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    deleteKey match {
      case Some(k) => Io.tableDeleteWhereDv(spark, path, pred, k)
      case None => Io.tableDeleteWhere(spark, path, pred)
    }
    ()
  }
}

/** Round 12: the merge-on-read planning wrapper for DV-carrying
  * versions. Delegates column pruning and (Catalyst) filter pushdown
  * to Spark's own [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder]]
  * — so the parquet scan still prunes columns, pushes predicates and
  * row-group-skips — and wraps the produced readers with an exact
  * deleted-key row filter (the executor-side form of
  * `Io.readTableVersion`'s broadcast anti-join). Aggregate, limit and
  * runtime-filter pushdown are NOT forwarded: each would let results
  * bypass the row filter (aggregates/limits) or is a pure perf hint
  * the transitional DV state can live without (DPP).
  *
  * If the query didn't select the DV key column it is READ anyway
  * (appended to the pruned schema) so the filter can key on it, then
  * projected back out before rows leave the reader — readSchema()
  * reports exactly what the query asked for.
  */
private[graft] class DvScanBuilder(delegate: ScanBuilder, keyCol: String,
    keyDt: DataType, deletedKeys: Array[Any])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters {

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val augmented =
      if (requiredSchema.fieldNames.contains(keyCol)) requiredSchema
      else StructType(requiredSchema.fields :+
        StructType(Seq.empty).add(keyCol, keyDt).fields.head)
    delegate match {
      case d: SupportsPushDownRequiredColumns => d.pruneColumns(augmented)
      case _ => ()
    }
    userSchema = Some(requiredSchema)
  }
  private var userSchema: Option[StructType] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate match {
      case d: SupportsPushDownCatalystFilters => d.pushFilters(filters)
      case _ => filters
    }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate match {
      case d: SupportsPushDownCatalystFilters => d.pushedFilters
      case _ => Array.empty
    }

  override def build(): Scan = {
    val dScan = delegate.build()
    val dSchema = dScan.readSchema()
    val keyIdx = dSchema.fieldIndex(keyCol)
    // the key col is dropped from the reported schema ONLY when the
    // query didn't ask for it (read-augmented by pruneColumns above)
    val dropKey = userSchema.exists(!_.fieldNames.contains(keyCol))
    val outSchema =
      if (dropKey)
        StructType(dSchema.fields.zipWithIndex
          .filter(_._2 != keyIdx).map(_._1))
      else dSchema
    new DvScan(dScan, outSchema, keyIdx, keyDt, deletedKeys, dropKey)
  }
}

private[graft] class DvScan(delegate: Scan, outSchema: StructType,
    keyIdx: Int, keyDt: DataType, deletedKeys: Array[Any], dropKey: Boolean)
  extends Scan with Batch {
  override def readSchema(): StructType = outSchema
  override def description(): String =
    s"${delegate.description()} (graft DV filter: ${deletedKeys.length} keys)"
  override def toBatch: Batch = this
  private lazy val dBatch = delegate.toBatch
  override def planInputPartitions(): Array[InputPartition] =
    dBatch.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    new DvReaderFactory(dBatch.createReaderFactory(), keyIdx, keyDt,
      deletedKeys,
      if (dropKey)
        delegate.readSchema().fields.zipWithIndex
          .filter(_._2 != keyIdx)
          .map { case (f, i) => (i, f.dataType, f.nullable) }
      else Array.empty)
}

/** Row-filtering wrapper: drops rows whose key is in the version's
  * deleted-key set, projecting out a read-augmented key column. Rows
  * only — columnar reads are declined so the delegate hands us
  * row-based parquet readers (the transitional DV cost OPTIMIZE
  * erases). */
private[graft] class DvReaderFactory(delegate: PartitionReaderFactory,
    keyIdx: Int, keyDt: DataType, deletedKeys: Array[Any],
    project: Array[(Int, DataType, Boolean)])
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(partition)
    // Catalyst-form key set, built once per task from the shipped
    // external values (bounded by the COW-fallback design)
    val conv = CatalystTypeConverters.createToCatalystConverter(keyDt)
    val keySet = new java.util.HashSet[Any](deletedKeys.length * 2)
    deletedKeys.foreach(k => keySet.add(conv(k)))
    val proj =
      if (project.isEmpty) null
      else UnsafeProjection.create(project.map { case (i, dt, n) =>
        BoundReference(i, dt, n): Expression
      }.toIndexedSeq)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          val k = if (r.isNullAt(keyIdx)) null else r.get(keyIdx, keyDt)
          if (k == null || !keySet.contains(k)) { cur = r; return true }
        }
        false
      }
      override def get(): InternalRow =
        if (proj == null) cur else proj(cur)
      override def close(): Unit = inner.close()
    }
  }
}

/** A created-but-never-written commit-log table (round 12, the
  * catalog's CREATE → INSERT window): serves the DDL-declared schema,
  * plans an EMPTY batch scan, and accepts the first append (which
  * lands v0 through the same OCC/txn write paths as [[GraftTable]]).
  */
private[graft] class GraftEmptyTable(spark: SparkSession, path: String,
    declared: StructType)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft:$path@empty"
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required = declared
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array.empty
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] =
              throw new IllegalStateException(
                "empty graft table planned no partitions")
          }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      private val txn = Option(info.options.get("txnVersion")).map(_.toLong)
      override def build(): Write = new V1Write {
        override def toInsertableRelation: sources.InsertableRelation =
          new sources.InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              require(!overwrite,
                s"graft table $path is append-only through the connector")
              txn match {
                case Some(b) => Io.tableAppendIdempotent(data, path, b)
                case None => Io.tableAppendOcc(data, path,
                  writer = java.util.UUID.randomUUID().toString)
              }
              ()
            }
          }
      }
    }
}

/** Atomic CTAS staging (round 12, [[GraftCatalog.stageCreate]]): the
  * SELECT's output lands under a writer-unique `data/` tag while the
  * table stays INVISIBLE (no `_commits`, no `_schema` — loadTable and
  * listTables cannot see it), and `commitStagedChanges` lands v0
  * through the same OCC version claim as every other commit. Two
  * racing `CREATE TABLE ... AS SELECT` of the same identifier thus
  * serialize at the v0 claim: exactly one wins, the loser's abort
  * removes only its own staging dir (never the winner's files). An
  * empty-SELECT CTAS commits v0 with zero data files and serves its
  * declared schema from the sidecar.
  */
private[graft] class GraftStagedTable(spark: SparkSession, path: String,
    declared: StructType, replaceOf: Option[Long] = None)
  extends StagedTable with SupportsWrite {

  private val v0 = replaceOf.map(_ + 1).getOrElse(0L)
  private val tag = s"c$v0-ctas-" + java.util.UUID.randomUUID().toString
  @volatile private var landed: Seq[String] = Seq.empty
  @volatile private var wrote = false

  override def name(): String = s"graft:$path@staged"
  override def schema(): StructType = declared
  // TRUNCATE is advertised unconditionally: Spark plans (CREATE OR)
  // REPLACE ... AS SELECT as truncate+write against the staged table,
  // and the "truncate" is simply that the staged commit lists only
  // the fresh files (a no-op for a staged CREATE, which has none)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      // RTAS arrives as truncate+write; the "truncate" is implicit in
      // the replace commit (it lists only the staged files), so the
      // builder just accepts the mode
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: sources.InsertableRelation =
          new sources.InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              landed = Io.stageLand(data, path, tag)
              wrote = true
              ()
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    require(wrote, s"atomic CTAS at $path committed before its write ran")
    // the version claim is the arbitration point (OCC); the schema
    // sidecar lands after the win so a lost race never clobbers the
    // winner's declared schema. The sidecar also serves the
    // empty-SELECT read. A REPLACE commit lists ONLY the fresh files
    // (prior versions keep serving their own lists — time travel
    // across a replace just works) and discards any DV sidecar with
    // the replaced content.
    replaceOf match {
      case None => Io.commitStaged(spark, path, landed)
      case Some(prev) =>
        require(Io.tableVersion(spark, path) == prev,
          s"REPLACE TABLE at $path lost to a concurrent commit " +
            s"(staged against v$prev) — re-run against fresh state")
        Io.commitReplaceAll(spark, path, prev + 1, landed)
    }
    GraftTables.writeSchemaSidecar(spark, path, declared)
  }

  override def abortStagedChanges(): Unit = {
    val fs = Io.fsFor(spark, path)
    try {
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/data/$tag"), true)
      val root = new org.apache.hadoop.fs.Path(path)
      // drop the table dir only if nothing else (a racing winner, an
      // older table) lives there
      val dataDir = new org.apache.hadoop.fs.Path(path, "data")
      if (fs.exists(dataDir) && fs.listStatus(dataDir).isEmpty)
        fs.delete(dataDir, false)
      if (fs.exists(root) && fs.listStatus(root).isEmpty)
        fs.delete(root, false)
    } catch { case _: Throwable => () }
  }
}
