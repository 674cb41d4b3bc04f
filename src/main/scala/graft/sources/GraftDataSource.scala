package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
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
  * A version carrying DELETION VECTORS (I25) is refused loudly: a raw
  * file scan would resurrect DV-deleted rows — read those through
  * [[Io.readTableVersionMor]] (or OPTIMIZE first).
  */
class GraftTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  private def resolveTable(options: CaseInsensitiveStringMap): GraftTable = {
    val spark = SparkSession.active
    val path = Option(options.get("path")).getOrElse(
      sys.error("the graft source needs a path (.load(tablePath) or " +
        "OPTIONS (path '...'))"))
    val head = Io.tableVersion(spark, path)
    require(head >= 0, s"no commit-log table at $path")
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
    require(Io.readDvMeta(spark, path, version)._2.isEmpty,
      s"version $version at $path carries deletion vectors — a raw " +
        "file scan would resurrect deleted rows; read it via " +
        "Io.readTableVersionMor or optimizeTableDv first")
    val files = Io.versionFiles(spark, path, version)
    require(files.nonEmpty, s"version $version at $path is empty")
    val pruned = Option(options.get("skipCol")) match {
      case None => files
      case Some(skipCol) =>
        val stats = Io.readStatsFile(spark, path, version)
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
      Option(options.get("deleteKey")))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolveTable(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    resolveTable(new CaseInsensitiveStringMap(properties))
}

/** The connector's Table: reads delegate to Spark's own
  * [[ParquetTable]] scan machinery over the resolved file set, and
  * `DELETE FROM` (SQL DML) routes into the commit protocol —
  * merge-on-read via deletion vectors when the view was created with
  * a `deleteKey` option (the I25 row-unique key), copy-on-write
  * otherwise. Deletes apply to HEAD only (a pinned
  * versionAsOf/timestampAsOf view refuses). */
private[graft] class GraftTable(pt: ParquetTable, spark: SparkSession,
    path: String, version: Long, head: Long, deleteKey: Option[String])
  extends Table with SupportsRead with SupportsDelete {

  override def name(): String = pt.name
  override def schema(): StructType = pt.schema
  // read-only + SQL DELETE: BATCH_WRITE is deliberately NOT advertised
  // (appends go through the OCC commit protocol, not a file sink)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    pt.newScanBuilder(options)

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
