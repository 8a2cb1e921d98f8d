package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.engine.{DatasetSpec, QueryEngine}
import graft.result.ResultJson

/**
 * CLI front (parity with the reference's frocket/cli.py):
 *
 *   runMain graft.Main register <name> <basepath> <groupIdCol> <tsCol>
 *   runMain graft.Main run <basepath> <groupIdCol> <tsCol> <queryJson|->
 *
 * `run` registers ad hoc, plans the JSON query with the engine, and prints
 * the reference-shaped JSON result. Query JSON "-" reads stdin.
 */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.toList match {
      case "register" :: name :: path :: gid :: ts :: Nil =>
        val ds = Catalog.register(spark, name, path, gid, ts)
        val cats = ds.columnAttrs.collect { case (n, a) if a.categorical => n }.toSeq.sorted
        println(s"""{"dataset": "${ds.name}", "rows": ${ds.numRows}, "groups": ${ds.numGroups}, """ +
          s""""minTimestamp": ${ds.minTimestamp}, "maxTimestamp": ${ds.maxTimestamp}, """ +
          s""""columns": ${ds.columns.size}, "unsupported": ${ds.unsupportedColumns.size}, """ +
          s""""potentialCategoricals": [${cats.map("\"" + _ + "\"").mkString(", ")}]}""")
      case "run" :: path :: gid :: ts :: q :: Nil =>
        val json =
          if (q == "-") scala.io.Source.stdin.mkString
          else if (q.startsWith("@"))
            new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(q.drop(1))))
          else q
        val df = {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.conf.set("spark.sql.session.timeZone", "UTC")
          graft.ops.Tables.tsToNanos(spark.read.parquet(path))
        }
        val engine = new QueryEngine(DatasetSpec(gid, ts))
        val plan = engine.runValidated(df, graft.query.QueryParser.parse(json))
        println(ResultJson.build(plan))
      case _ =>
        System.err.println("usage: register <name> <path> <gidCol> <tsCol> | run <path> <gidCol> <tsCol> <queryJson|->")
        sys.exit(2)
    } finally spark.stop()
  }
}
