package graft.sinks

import graft.sources.SqlDialect.checkIdentifier
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** SQL sink (reference: extensions/impl/sql/sink.go). Two paths:
  *
  *  - Append (no `rowKindField`): Spark's own JDBC writer — a
  *    DISTRIBUTED insert, one connection + rewritten batch statement
  *    per partition, versus the reference's single connection building
  *    one giant `INSERT ... VALUES (...),(...)` string per batch. The
  *    `fields` option projects columns first (shared Sink.shaped).
  *
  *  - Changelog (`rowKindField` + `keyField`, reference sink.go
  *    save()): each row carries "insert" | "update" | "delete";
  *    applied on the EXECUTORS with per-kind PreparedStatements —
  *    parameterized, so values never interpolate into SQL (the
  *    reference string-builds with manual quoting). Rows are
  *    repartitioned by key so all changes to one key apply on one
  *    connection; within a partition, statements execute in row order
  *    with JDBC batching between kind changes.
  */
final case class SqlSink(dburl: String, table: String,
                         options: Map[String, String] = Map.empty) extends Sink {
  checkIdentifier(table)

  private val rowKindField = options.get("rowKindField")
  private val keyField = options.get("keyField")
  require(rowKindField.isEmpty || keyField.nonEmpty,
    "keyField is required when rowKindField is set") // reference sink.go:147-149

  private val jdbcOpts = options.view.filterKeys(Set(
    "driver", "numpartitions", "batchsize", "isolationlevel", "user", "password")).toMap

  def writeBatch(df: DataFrame): Unit = rowKindField match {
    case None =>
      shaped(df).write.mode("append").format("jdbc")
        .option("url", dburl).options(jdbcOpts).option("dbtable", table).save()
    case Some(kindCol) =>
      val key = keyField.get
      val data = shaped(df)
      val dataCols = data.schema.fieldNames.filterNot(_ == kindCol).toSeq
      dataCols.foreach(checkIdentifier)
      checkIdentifier(kindCol)
      require(dataCols.contains(key), s"keyField $key missing from sink columns")
      val (url, tbl, driver) = (dburl, table, options.get("driver"))
      val creds = (options.get("user"), options.get("password"))
      // optional total order within a key's partition (an upstream
      // sequence column); without it, changes to one key arriving from
      // DIFFERENT upstream partitions have no defined order after the
      // hash shuffle — single-partition (streaming micro-batch) inputs
      // keep arrival order either way
      val ordered = options.get("orderField") match {
        case Some(seq0) => data.repartition(col(key))
          .sortWithinPartitions(col(key), col(seq0))
        case None => data.repartition(col(key))
      }
      val insertSql = dataCols.mkString(
        s"INSERT INTO $tbl (", ", ", ") VALUES " + dataCols.map(_ => "?").mkString("(", ", ", ")"))
      val updateSql = dataCols.filterNot(_ == key)
        .map(c => s"$c = ?").mkString(s"UPDATE $tbl SET ", ", ", s" WHERE $key = ?")
      val deleteSql = s"DELETE FROM $tbl WHERE $key = ?"
      // all changes for a key in one partition; one connection each
      ordered
        .select((kindCol +: dataCols).map(col).toIndexedSeq: _*)
        .foreachPartition { (rows: Iterator[Row]) =>
          driver.foreach(Class.forName)
          val info = new java.util.Properties()
          creds._1.foreach(info.setProperty("user", _))
          creds._2.foreach(info.setProperty("password", _))
          val conn = java.sql.DriverManager.getConnection(url, info)
          try {
            conn.setAutoCommit(false)
            val ins = conn.prepareStatement(insertSql)
            val upd = conn.prepareStatement(updateSql)
            val del = conn.prepareStatement(deleteSql)
            var pending: java.sql.PreparedStatement = null
            def flush(next: java.sql.PreparedStatement): Unit = {
              if (pending != null && (pending ne next)) pending.executeBatch()
              pending = next
            }
            rows.foreach { r =>
              val kind = Option(r.getString(0)).getOrElse("insert")
              kind match {
                // the reference accepts exactly insert|update|delete
                // (sink.go save(), ast.Rowkind*) — anything else errors
                case "insert" =>
                  flush(ins)
                  dataCols.indices.foreach(i => ins.setObject(i + 1, r.get(i + 1)))
                  ins.addBatch()
                case "update" =>
                  flush(upd)
                  val nonKey = dataCols.zipWithIndex.filterNot(_._1 == key)
                  nonKey.zipWithIndex.foreach { case ((_, ri), pi) =>
                    upd.setObject(pi + 1, r.get(ri + 1))
                  }
                  upd.setObject(nonKey.length + 1, r.get(dataCols.indexOf(key) + 1))
                  upd.addBatch()
                case "delete" =>
                  flush(del)
                  del.setObject(1, r.get(dataCols.indexOf(key) + 1))
                  del.addBatch()
                case other => // reference sink.go save(): invalid rowkind is an error
                  throw new IllegalArgumentException(s"invalid rowkind $other")
              }
            }
            flush(null)
            conn.commit()
          } finally conn.close()
        }
  }
}
