package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException,
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.TableLog

/** NAMED TableLog tables — a [[TableCatalog]] over the `tablelogv2`
  * surface, so tables can be created, discovered, read, written,
  * altered and dropped through a metastore identifier instead of a
  * filesystem path (the first thing a multi-team deployment wants):
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /lake/graft
  *
  *   CREATE TABLE graft.ml.docs (id BIGINT, text STRING) USING tablelogv2
  *   INSERT INTO graft.ml.docs SELECT ...
  *   SELECT * FROM graft.ml.docs [VERSION AS OF 3]
  *   df.write.mode("append").saveAsTable("graft.ml.docs")
  *   spark.readStream.table("graft.ml.docs")            -- the version tail
  *   ALTER TABLE graft.ml.docs ADD COLUMN lang STRING   -- an evolve commit
  *   GRAFT DELETE FROM graft.ml.docs WHERE id = 7       -- maintenance by name
  * }}}
  *
  * The catalog's own metadata is a POINTER PER TABLE — one small file
  * `<warehouse>/_catalog/<ns…>/<table>` whose content is the table's
  * data directory plus a managed/external tag — because everything else
  * a metastore would record (schema, file list, row count, layout,
  * history) already lives in the TableLog manifest, versioned and
  * transactional; duplicating it here would create a second source of
  * truth that drifts. `loadTable` resolves the pointer and hands back
  * the SAME [[TableLogV2Table]] a `format("tablelogv2").load(dir)` gets,
  * so every path-face behavior (manifest-pinned snapshot reads, stats
  * pruning, ledger-fenced writes, the version-offset tail) is inherited,
  * not reimplemented — the two faces cannot drift.
  *
  * Managed vs external: `CREATE TABLE … LOCATION '<dir>'` registers an
  * existing (or empty) directory and DROP forgets the name but keeps the
  * data; without LOCATION the table lives under
  * `<warehouse>/<ns…>/<table>` and DROP removes the data too. Pointer
  * creation is create-no-overwrite, so two racing CREATEs resolve to
  * exactly one winner even across processes.
  *
  * Scale posture: one pointer read per `loadTable` (no listing), table
  * enumeration is one directory listing per namespace, and all data
  * operations inherit the TableLog commit protocol — the catalog adds
  * no coordination of its own. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs a warehouse directory: set " +
          s"spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  // ---- pointer files: `<warehouse>/_catalog/<ns…>/<table>`, content
  // "<managed|external>\n<data dir>". Each path segment is URL-encoded
  // so identifiers with exotic characters stay filesystem-safe.
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(warehouse.stripSuffix("/"), "_catalog"))(
      (p, part) => new Path(p, enc(part)))

  private def pointer(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), enc(ident.name()))

  /** The pointer's file status, None when absent — and None when the
    * path exists but is a DIRECTORY (a child namespace whose encoded
    * name collides with the asked-for table name): reporting a
    * namespace as a table would make `tableExists` lie and `loadTable`
    * die mid-read with an opaque "is a directory" IOException instead
    * of the NoSuchTableException the caller can act on. */
  private def pointerFile(ident: Identifier): Option[Path] = {
    val p = pointer(ident)
    try { if (fs.getFileStatus(p).isFile) Some(p) else None }
    catch { case _: java.io.FileNotFoundException => None }
  }

  private def readPointer(ident: Identifier): Option[(Boolean, String)] = {
    pointerFile(ident) match {
      case None => None
      case Some(p) =>
        val in = fs.open(p)
        val content =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        content.split("\n", 2) match {
          case Array(kind, dir) => Some((kind == "managed", dir))
          case _ => throw new IllegalStateException(
            s"torn catalog pointer at $p — recreate it: '$content'")
        }
    }
  }

  /** The table's data directory — the bridge the GRAFT maintenance
    * statements use to accept identifiers as well as paths. */
  def tableDir(ident: Identifier): String =
    readPointer(ident).getOrElse(throw new NoSuchTableException(ident))._2

  override def tableExists(ident: Identifier): Boolean =
    pointerFile(ident).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(
      name() +: namespace.toSeq)
    // dot-prefixed names are the CommitStore's staging siblings
    // (.tmp-<uuid> next to a pointer mid-CAS, or leaked by a crashed
    // CREATE) — never tables
    fs.listStatus(p).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .map(s => Identifier.of(namespace, dec(s.getPath.getName))).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    val m = TableLog.latest(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"catalog table ${ident} points at $dir, which has no committed " +
          "manifest — the pointer is stale or the table dir was removed"))
    new TableLogV2Table(dir, Some(m),
      TableLog.schemaOf(spark, dir, m),
      new CaseInsensitiveStringMap(Map("path" -> dir).asJava))
  }

  /** Time travel by name: `SELECT … FROM <t> VERSION AS OF n` resolves
    * through here to the same era-honest manifest `versionAsOf` pins on
    * the path face. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val v = version.trim.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"cannot time-travel $ident to version '$version': VERSION AS OF " +
          "takes the integer committed manifest number (for clock-based " +
          "travel use TIMESTAMP AS OF)"))
    pinned(ident, dir, v)
  }

  /** Time travel by clock: `SELECT … FROM <t> TIMESTAMP AS OF <ts>`.
    * Spark hands the evaluated literal here in MICROseconds; the
    * resolution (manifest-file mtime, forward-adjusted to be monotone
    * in version) and both loud edge errors are
    * [[graft.functions.TableLog.versionAt]]'s — the travel window is
    * the manifest retention window. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    pinned(ident, dir,
      TableLog.versionAt(spark, dir, math.floorDiv(timestamp, 1000L)))
  }

  private def pinned(ident: Identifier, dir: String, v: Long): Table = {
    val m = TableLog.manifestAt(spark, dir, v)
    new TableLogV2Table(dir, Some(m),
      TableLog.schemaOf(spark, dir, m),
      new CaseInsensitiveStringMap(Map("path" -> dir).asJava))
  }

  // '_'-prefixed identifier parts are reserved: the pointer tree lives
  // at <warehouse>/_catalog, and a managed table or namespace named
  // '_catalog' would land its DATA among the pointers — and dropping it
  // would recursively delete every registration in the catalog.
  // '.'-prefixed parts are reserved too: every listing (listTables,
  // the DROP NAMESPACE emptiness check, the cascade walk) skips
  // dot-prefixed entries as CommitStore staging debris, and URLEncoder
  // leaves '.' unencoded — so a backtick-quoted `.t` would CREATE but
  // never list, and a non-cascade DROP NAMESPACE would judge its
  // namespace empty and silently orphan the managed data dir
  private def requireUnreserved(parts: Seq[String], what: String): Unit =
    parts.find(p => p.startsWith("_") || p.startsWith(".")).foreach { p =>
      throw new IllegalArgumentException(
        s"$what part '$p' is reserved: names starting with '_' collide " +
          "with the catalog's own metadata tree under the warehouse, and " +
          "names starting with '.' are indistinguishable from commit " +
          "staging debris in every catalog listing")
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "tablelogv2 tables are unpartitioned — clustering is " +
        "compact(layoutBy)/trackStats territory")
    requireUnreserved(ident.namespace().toSeq :+ ident.name(), "table name")
    val provider = Option(properties.get(TableCatalog.PROP_PROVIDER))
    require(provider.forall(p =>
        p.equalsIgnoreCase("tablelogv2") || p.equalsIgnoreCase("tablelog")),
      s"catalog '${name()}' stores TableLog tables; USING " +
        s"${provider.get} is another format's territory")
    val external = Option(properties.get(TableCatalog.PROP_LOCATION))
    val dir = external.getOrElse {
      ident.namespace().foldLeft(warehouse.stripSuffix("/"))(
        (p, part) => s"$p/${enc(part)}") + s"/${enc(ident.name())}"
    }
    // the name is claimed FIRST, atomically, through the SAME
    // CommitStore CAS the manifest commits ride (hard-link publish on
    // file:, conditional create on object stores — a plain
    // create-no-overwrite on Hadoop's local FS is check-then-create,
    // and racing CREATEs all pass the check): two racing CREATEs — in
    // one JVM or across processes — resolve to one winner before
    // either touches data
    val p = pointer(ident)
    fs.mkdirs(p.getParent)
    val content = (if (external.isDefined) "external" else "managed") +
      "\n" + dir
    if (!graft.functions.CommitStore.forFs(fs).putIfAbsent(fs, p,
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      throw new TableAlreadyExistsException(ident)
    // an external LOCATION over an existing TableLog dir ADOPTS it (the
    // recorded schema must match the declared one, or the declaration
    // must be empty-schema CTAS-less adoption); a fresh dir gets an
    // empty manifest carrying the schema, so loadTable always resolves.
    // A failure past the CAS un-claims the name: a "rejected" CREATE
    // must not leave the table registered (or wedge the name so a
    // corrected retry dies on TableAlreadyExists).
    try {
      TableLog.latest(spark, dir) match {
        case Some(m) =>
          // adoption is an EXTERNAL-create privilege: a LOCATION names a
          // directory deliberately, so committed data there is the
          // point. A managed create computed its path from the
          // identifier — committed data there is leftovers (a dropTable
          // that crashed between deletes, a name reused after manual
          // cleanup), and silently adopting it would hand a "fresh"
          // table stale rows whenever the schemas happen to match.
          require(external.isDefined,
            s"CREATE TABLE $ident: the managed location $dir already " +
              "holds a committed TableLog table — a fresh managed table " +
              "must start empty. Adopt it explicitly with LOCATION " +
              s"'$dir', or remove the leftover directory first")
          val recorded = TableLog.schemaOf(spark, dir, m)
          require(schema.isEmpty || TableLog.sameSchema(recorded, schema),
            s"CREATE TABLE $ident LOCATION '$dir': the directory already " +
              s"holds a TableLog table with schema ${recorded.simpleString}, " +
              s"not the declared ${schema.simpleString} — declare no columns " +
              "to adopt it as-is")
        case None =>
          require(schema.nonEmpty,
            s"CREATE TABLE $ident: no columns declared and $dir holds no " +
              "committed TableLog table to adopt")
          TableLog.commitStagedFiles(spark, dir, Vector.empty, schema,
            runKey = s"create-${java.util.UUID.randomUUID()}", batchId = 0L)
      }
      loadTable(ident)
    } catch {
      case t: Throwable =>
        try fs.delete(p, false) catch { case s: Exception => t.addSuppressed(s) }
        throw t
    }
  }

  /** ADD COLUMN maps to [[TableLog.evolve]] (an additive, versioned
    * schema commit); DROP COLUMN to [[TableLog.dropColumn]]. Everything
    * else — renames, retypes, property churn — is loudly unsupported:
    * those are rewrites, not evolutions, exactly the path faces' rule. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "ADD COLUMN on a nested field is a type change to the parent " +
            "— files already written cannot serve it")
        // FIRST/AFTER would be silently ignored (evolve appends), and a
        // comment silently dropped (manifests record no per-column
        // metadata) — deviating from requested DDL must be loud, like
        // every other unsupported change below
        if (add.position() != null) throw new UnsupportedOperationException(
          s"ALTER TABLE $ident ADD COLUMN ${add.fieldNames().head} " +
            "FIRST/AFTER: TableLog schema evolution appends columns at " +
            "the end (files already written serve them by name) — drop " +
            "the position clause")
        if (add.comment() != null) throw new UnsupportedOperationException(
          s"ALTER TABLE $ident ADD COLUMN ${add.fieldNames().head} " +
            "COMMENT: TableLog manifests carry no per-column metadata " +
            "to store it in — drop the comment clause")
        require(add.isNullable,
          s"ADD COLUMN ${add.fieldNames().head} NOT NULL is not " +
            "satisfiable: files already written cannot serve the column, " +
            "so every pre-existing row would violate the constraint — " +
            "add it nullable")
        val m = TableLog.latest(spark, dir).get
        val recorded = TableLog.schemaOf(spark, dir, m)
        TableLog.evolve(spark, dir, StructType(recorded.fields :+
          StructField(add.fieldNames().head, add.dataType(),
            nullable = true)))
      case drop: TableChange.DeleteColumn =>
        require(drop.fieldNames().length == 1,
          "DROP COLUMN supports top-level columns only")
        TableLog.dropColumn(spark, dir, drop.fieldNames().head)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE $ident: ${other.getClass.getSimpleName} is not " +
          "supported on TableLog tables — additive ADD COLUMN and " +
          "DROP COLUMN are the schema evolutions a versioned log admits")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    readPointer(ident) match {
      case None => false
      case Some((managed, dir)) =>
        // managed data dies with the name; external data is only
        // un-registered — the path faces still read it. Data is deleted
        // BEFORE the pointer: a crash between the two then leaves a
        // stale pointer that loadTable rejects LOUDLY (and a retried
        // DROP clears), where the reverse order would leave the data
        // orphaned with no name pointing at it — invisible to any
        // cleanup forever
        if (managed) fs.delete(new Path(dir), true)
        fs.delete(pointer(ident), false)
        true
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported: readers and writers address a " +
        "TableLog table by its directory, and a rename would silently " +
        "strand their leases and checkpoints — create a new name with " +
        "CREATE TABLE … LOCATION instead, then drop the old one")

  // ---- namespaces: directories under `_catalog`. A namespace exists
  // iff its directory does; the root namespace always exists.
  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] = {
    val root = nsPath(Array.empty)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).iterator.filter(_.isDirectory)
      .map(s => Array(dec(s.getPath.getName))).toArray
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(
      name() +: namespace.toSeq)
    fs.listStatus(p).iterator.filter(_.isDirectory)
      .map(s => namespace :+ dec(s.getPath.getName)).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (namespace.nonEmpty && !fs.exists(nsPath(namespace)))
      throw new NoSuchNamespaceException(name() +: namespace.toSeq)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    requireUnreserved(namespace.toSeq, "namespace")
    val p = nsPath(namespace)
    if (fs.exists(p))
      throw new NamespaceAlreadyExistsException((name() +: namespace.toSeq).toArray)
    fs.mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) return false
    // staging debris (.tmp-*) does not make a namespace non-empty
    val entries = fs.listStatus(p)
      .filterNot(_.getPath.getName.startsWith("."))
    if (!cascade && entries.nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty — " +
          "drop its tables first, or DROP … CASCADE")
    // cascade applies DROP TABLE semantics per registration (managed
    // data dies with the name, external data survives un-registered),
    // recursing into child namespaces — NOT a bare pointer-tree delete,
    // which would orphan every managed table's data dir forever
    def dropAll(dir: Path, ns: Array[String]): Unit =
      fs.listStatus(dir).foreach { s =>
        val leaf = s.getPath.getName
        if (!leaf.startsWith(".")) {
          if (s.isDirectory) dropAll(s.getPath, ns :+ dec(leaf))
          else dropTable(Identifier.of(ns, dec(leaf)))
        }
      }
    if (cascade) dropAll(p, namespace)
    fs.delete(p, true)
    true
  }
}
