package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Schema-evolution DDL beyond append-time `mergeSchema`: ALTER TABLE
  * ADD / RENAME / DROP COLUMN as METADATA-ONLY commits (no data file is
  * touched — at 100 TB that is the entire point; a rewrite would be a
  * petabyte job for a rename).
  *
  *   - ADD COLUMNS appends nullable fields; existing files simply lack
  *     the column and read it back as NULL (provided-schema parquet
  *     semantics — same mechanism as `mergeSchema`).
  *   - RENAME / DROP require column mapping (`name` mode): parquet files
  *     keep their physical column names forever, and the mapping is the
  *     indirection that lets logical names diverge. A plain table is
  *     upgraded in the same commit (each existing field's physical name
  *     pinned to its current logical name, protocol raised to
  *     reader 2 / writer 5), exactly Delta's own upgrade path.
  *
  * Name-mapped tables stay WRITABLE: appends and DML route their
  * frames through [[DeltaLog.toPhysical]] so data (and change) files
  * hold physical column names per protocol; overwrite and mergeSchema
  * widening are rejected (they would have to mint fresh column ids for
  * a replaced schema). Constraints referencing a renamed/dropped
  * column reject the operation (a recorded CHECK would otherwise go
  * silently unenforceable), and partition columns are immovable (their
  * names live in every add's partitionValues and the directory layout).
  */
object DeltaSchema {

  private val ModeKey = "delta.columnMapping.mode"
  private val MaxIdKey = "delta.columnMapping.maxColumnId"
  private val PhysKey = "delta.columnMapping.physicalName"
  private val IdKey = "delta.columnMapping.id"

  /** ALTER TABLE … ADD COLUMNS: `ddl` is a column-list in DDL form
    * ("a INT, b STRING"). Metadata-only; new fields are nullable and
    * read as NULL from every pre-existing file. On a mapped table each
    * new field gets a fresh physical name (never reuses a dropped
    * column's bytes) and the next column id. */
  def addColumns(spark: SparkSession, tablePath: String, ddl: String): Long = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    DeltaLog.checkWritable(snap) // metadata commits are writes too
    val incoming = StructType.fromDDL(ddl)
    val existing = snap.schema.fieldNames.map(_.toLowerCase).toSet
    val dup = incoming.fieldNames.find(n => existing(n.toLowerCase))
    require(dup.isEmpty, s"column ${dup.get} already exists in $tablePath")
    val mapped = snap.columnMappingMode == "name"
    var maxId = snap.configuration.get(MaxIdKey).map(_.toLong).getOrElse(0L)
    val newFields = incoming.fields.map { f =>
      val base = f.copy(nullable = true)
      if (!mapped) base
      else {
        maxId += 1
        base.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString(PhysKey, s"col-${java.util.UUID.randomUUID()}")
          .putLong(IdKey, maxId).build())
      }
    }
    val schema = StructType(snap.schema.fields ++ newFields)
    val config =
      if (mapped) snap.configuration + (MaxIdKey -> maxId.toString)
      else snap.configuration
    DeltaWrite.commit(spark, tablePath,
      DeltaWrite.ntzUpgradeAction(snap.protocol, schema).toSeq ++
        Seq(DeltaWrite.metaDataAction(schema, snap.partitionColumns, config,
          snap.metaDataId)),
      operation = "ADD COLUMNS")
  }

  /** ALTER TABLE … RENAME COLUMN … TO …: metadata-only logical rename;
    * the field keeps its physical name (upgrading the table to name-mode
    * mapping first when needed). Field metadata (identity, mapping ids)
    * rides along untouched. */
  def renameColumn(spark: SparkSession, tablePath: String,
      from: String, to: String): Long = {
    val snap = mappedSnapshot(spark, tablePath)
    DeltaLog.checkWritable(snap)
    val f = fieldOf(snap, from)
    require(!snap.schema.fieldNames.exists(_.equalsIgnoreCase(to)),
      s"column $to already exists in $tablePath")
    guardImmovable(snap, from, "rename")
    val schema = StructType(snap.schema.fields.map { g =>
      if (g.name == f.name) g.copy(name = to) else g
    })
    DeltaWrite.commit(spark, tablePath,
      Seq(DeltaWrite.metaDataAction(schema, snap.partitionColumns,
        snap.configuration, snap.metaDataId)),
      operation = "RENAME COLUMN")
  }

  /** ALTER TABLE … DROP COLUMN: metadata-only removal — the bytes stay
    * in the files (unreferenced), history before the drop still serves
    * the column via time travel. Requires mapping for the same reason
    * rename does: without it the physical schema IS the logical one. */
  def dropColumn(spark: SparkSession, tablePath: String, name: String): Long = {
    val snap = mappedSnapshot(spark, tablePath)
    DeltaLog.checkWritable(snap)
    val f = fieldOf(snap, name)
    require(snap.schema.fields.length > 1,
      s"cannot drop the only column of $tablePath")
    guardImmovable(snap, name, "drop")
    val schema = StructType(snap.schema.fields.filterNot(_.name == f.name))
    DeltaWrite.commit(spark, tablePath,
      Seq(DeltaWrite.metaDataAction(schema, snap.partitionColumns,
        snap.configuration, snap.metaDataId)),
      operation = "DROP COLUMN")
  }

  /** Upgrade a table to name-mode column mapping (no-op when already
    * there): every existing field's physical name is pinned to its
    * current logical name, column ids are assigned ordinally, and the
    * protocol is raised to reader 2 / writer 5 in the same commit. */
  def enableColumnMapping(spark: SparkSession, tablePath: String): Long = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    DeltaLog.checkWritable(snap)
    snap.columnMappingMode match {
      case "name" => return snap.version
      case "none" =>
      case other => throw new UnsupportedOperationException(
        s"cannot upgrade from column mapping mode '$other'")
    }
    val fields = snap.schema.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putString(PhysKey, f.name).putLong(IdKey, i + 1L).build())
    }
    val config = snap.configuration +
      (ModeKey -> "name") + (MaxIdKey -> fields.length.toString)
    // FLOOR the protocol against the current one — a table already at
    // the table-features form (reader 3 / writer 7 with feature lists,
    // e.g. inCommitTimestamp or v2Checkpoint) must keep its features
    // and gain `columnMapping`, not be downgraded to a bare (2, 5).
    val proto =
      if (snap.protocol.minWriter >= 7 || snap.protocol.writerFeatures.nonEmpty)
        DeltaWrite.featureProtocolAction(snap.protocol,
          newWriterFeatures = Seq("columnMapping"),
          newReaderFeatures = Seq("columnMapping"))
      else DeltaWrite.protocolAction(
        math.max(2, snap.protocol.minReader),
        math.max(5, snap.protocol.minWriter))
    DeltaWrite.commit(spark, tablePath,
      Seq(proto,
        DeltaWrite.metaDataAction(StructType(fields), snap.partitionColumns,
          config, snap.metaDataId)),
      operation = "UPGRADE COLUMN MAPPING")
  }

  /** Snapshot with mapping guaranteed on (upgrading first if needed). */
  private def mappedSnapshot(spark: SparkSession,
      tablePath: String): DeltaLog.Snapshot = {
    enableColumnMapping(spark, tablePath)
    DeltaLog.snapshot(spark, tablePath)
  }

  private def fieldOf(snap: DeltaLog.Snapshot, name: String): StructField =
    snap.schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"no column $name in ${snap.tablePath} " +
          s"(has ${snap.schema.fieldNames.mkString(", ")})"))

  /** Partition columns and constraint-referenced columns cannot be
    * renamed or dropped: partition names live in every add entry's
    * partitionValues and the hive layout; a CHECK whose text references
    * the column would silently stop being enforceable. */
  /** ALTER TABLE … ALTER COLUMN … TYPE …: type widening (public Delta
    * protocol feature `typeWidening`), metadata-only like the other
    * ALTERs — at 100 TB the entire point is that no data file is
    * rewritten. Existing files keep their narrow physical type; the scan
    * reads every file with the snapshot's declared schema and Spark's
    * vectorized parquet reader performs the promotion (verified for the
    * full protocol-allowed set on this runtime). New files are written
    * wide by construction. The change is recorded in the field's
    * `delta.typeChanges` metadata and the protocol gains
    * `typeWidening` (reader + writer feature), so foreign engines
    * either widen the same way or refuse loudly.
    *
    * Only the protocol's widening lattice is allowed — anything else
    * (narrowing, string↔numeric, …) is rejected: it would silently
    * corrupt old files' values rather than promote them. Partition
    * columns are immovable (their serialized values live in every add
    * entry); constraint-referenced columns are guarded like rename/drop
    * (a CHECK compiled against the narrow type may change semantics). */
  def widenColumnType(spark: SparkSession, tablePath: String,
      name: String, toDdl: String): Long = {
    import org.apache.spark.sql.types._
    val snap = DeltaLog.snapshot(spark, tablePath)
    DeltaLog.checkWritable(snap)
    val f = fieldOf(snap, name)
    val to = StructType.fromDDL(s"`__w` $toDdl").head.dataType
    require(isWidening(f.dataType, to),
      s"cannot change ${f.name}: ${f.dataType.typeName} -> ${to.typeName} " +
        "is not a protocol-allowed type widening")
    guardImmovable(snap, name, "widen")
    // the change record rides in the field metadata per the feature spec
    val prior =
      if (f.metadata.contains(TypeChangesKey))
        f.metadata.getMetadataArray(TypeChangesKey) else Array.empty[Metadata]
    val entry = new MetadataBuilder()
      .putString("fromType", f.dataType.typeName)
      .putString("toType", to.typeName).build()
    val widened = f.copy(dataType = to,
      metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putMetadataArray(TypeChangesKey, prior :+ entry).build())
    val schema = StructType(snap.schema.fields.map(g =>
      if (g.name == f.name) widened else g))
    val ntzFeature =
      if (to.isInstanceOf[TimestampNTZType] &&
          !snap.protocol.readerFeatures.contains("timestampNtz"))
        Seq("timestampNtz")
      else Nil
    val proto =
      if (snap.protocol.writerFeatures.contains("typeWidening") &&
          ntzFeature.isEmpty) Nil
      else Seq(DeltaWrite.featureProtocolAction(snap.protocol,
        newWriterFeatures = "typeWidening" +: ntzFeature,
        newReaderFeatures = "typeWidening" +: ntzFeature))
    DeltaWrite.commit(spark, tablePath,
      proto :+ DeltaWrite.metaDataAction(schema, snap.partitionColumns,
        snap.configuration, snap.metaDataId),
      operation = "ALTER COLUMN TYPE")
  }

  private val TypeChangesKey = "delta.typeChanges"

  /** The protocol's widening lattice: promotions every reader can apply
    * losslessly to the narrow physical values. */
  private def isWidening(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (DateType, _: TimestampNTZType) => true
      case (d: DecimalType, e: DecimalType) =>
        (e.precision > d.precision || e.scale > d.scale) &&
          e.precision >= d.precision && e.scale >= d.scale &&
          e.precision - e.scale >= d.precision - d.scale
      case (ByteType, e: DecimalType) => e.precision - e.scale >= 3
      case (ShortType, e: DecimalType) => e.precision - e.scale >= 5
      case (IntegerType, e: DecimalType) => e.precision - e.scale >= 10
      case (LongType, e: DecimalType) => e.precision - e.scale >= 20
      case _ => false
    }
  }

  private def guardImmovable(snap: DeltaLog.Snapshot, col: String,
      op: String): Unit = {
    require(!snap.partitionColumns.exists(_.equalsIgnoreCase(col)),
      s"cannot $op partition column $col of ${snap.tablePath}")
    val re = ("(?i)\\b" + java.util.regex.Pattern.quote(col) + "\\b").r
    DeltaConstraints.checks(snap.configuration).find {
      case (_, e) => re.findFirstIn(e).isDefined
    }.foreach { case (n, e) =>
      throw new IllegalStateException(
        s"cannot $op column $col: CHECK constraint $n ($e) references it " +
          "(drop the constraint first)")
    }
    // generation expressions are stored as SQL text against CURRENT
    // names (same fragility as CHECK constraints): renaming/dropping a
    // referenced base column would leave every future append failing on
    // an unresolvable expression
    snap.schema.fields.find(f =>
      f.metadata.contains(DeltaGenerated.ExprKey) &&
        re.findFirstIn(f.metadata.getString(DeltaGenerated.ExprKey)).isDefined)
      .foreach { f =>
        throw new IllegalStateException(
          s"cannot $op column $col: generated column ${f.name} " +
            s"(${f.metadata.getString(DeltaGenerated.ExprKey)}) references " +
            "it (drop the generated column first)")
      }
  }
}
