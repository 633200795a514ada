package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Export sinks matching the reference's output formats (SURVEY §2.1
  * K2/K3; reference csinsights/data/s2processor.py:209-257):
  *  - JSONL, gzip-compressed (`to_jsonl`)
  *  - flattened CSV: structs `json_normalize`d into dotted columns,
  *    tab-separated, gzip, CRLF terminators (`to_csv`)
  *
  * Both are distributed writes (one file per partition) — the reference's
  * single-stream writers re-expressed as parallel sinks.
  */
object Export {

  def toJsonlGz(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .json(path)

  /** Recursively flatten struct columns into `parent.child` top-level
    * columns (pandas json_normalize semantics, s2processor.py:240). */
  def flattened(df: DataFrame): DataFrame = {
    def fieldPaths(schema: StructType, prefix: String): Seq[(String, String)] =
      schema.fields.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => fieldPaths(s, path)
          case _ => Seq(path -> path)
        }
      }
    val cols = fieldPaths(df.schema, "").map { case (path, name) =>
      col(path.split("\\.").map(p => s"`$p`").mkString(".")).as(name)
    }
    df.select(cols: _*)
  }

  /** Tab-separated gzip CSV with CRLF line terminator — the reference's
    * exact to_csv configuration (sep="\t", compression gzip,
    * line_terminator="\r\n", s2processor.py:246-256). */
  def toCsvGz(df: DataFrame, path: String): Unit =
    flattened(df).write.mode(SaveMode.Overwrite)
      .option("sep", "\t")
      .option("header", "true")
      .option("compression", "gzip")
      .option("lineSep", "\r\n")
      .option("escape", "\"")
      .csv(path)
}
