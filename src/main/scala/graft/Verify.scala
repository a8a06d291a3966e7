package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-list of query names to run]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // the engine's session factory: same configs the library ships with
    // (AQE, UTC, nanos-as-long, GraftExtensions SQL functions, RocksDB
    // state store) so verification exercises the shipped surface
    val spark = GraftSession.create(cpus, dataDir = sfDir)
    new java.io.File(outDir).mkdirs()
    // Canonical per-query row hash (diagnostic artifact): md5 over the
    // SHIPPED parquet, columns sorted by name, cells rendered
    // deterministically, rows sorted — the same fold shape
    // tools/selfcheck.py canonicalizes with. Two Verify runs (driver
    // env vs repo env) can then be diffed on ONE file (hashes.json)
    // instead of replaying the whole grading pipeline, so a
    // driver-vs-repo correctness divergence is debuggable.
    def cell(v: Any): String = v match {
      case null => "∅"
      case d: java.lang.Double =>
        if (d.isNaN) "NaN" else if (d == 0.0) "0.0" else d.toString
      case f: java.lang.Float =>
        val d = f.toDouble
        if (d.isNaN) "NaN" else if (d == 0.0) "0.0" else d.toString
      case b: java.math.BigDecimal => b.stripTrailingZeros.toPlainString
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case s: collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
      case r: org.apache.spark.sql.Row =>
        r.toSeq.map(cell).mkString("(", ",", ")")
      case m: collection.Map[_, _] =>
        m.map { case (k, x) => cell(k) + "->" + cell(x) }
          .toSeq.sorted.mkString("{", ",", "}")
      case other => other.toString
    }
    def canonicalHash(path: String): (Long, String) = {
      val df = spark.read.parquet(path)
      val order = df.schema.fieldNames.zipWithIndex.sortBy(_._1).map(_._2)
      val rendered = df.collect()
        .map(r => order.map(i => cell(r.get(i))
          .replace("", "\\u0001")).mkString(""))
      java.util.Arrays.sort(rendered, java.util.Comparator.naturalOrder[String]())
      val md = java.security.MessageDigest.getInstance("MD5")
      rendered.foreach { s => md.update(s.getBytes("UTF-8")); md.update(10.toByte) }
      (rendered.length.toLong, md.digest().map("%02x".format(_)).mkString)
    }
    val hashes = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val (n, h) = canonicalHash(s"$outDir/$name")
        hashes(name) = s"""{"rows": $n, "md5": "$h"}"""
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(s"$outDir/hashes.json"),
      hashes.map { case (k, v) => s""""$k": $v""" }
        .mkString("{\n", ",\n", "\n}\n"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
