package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.rules.RuleReport
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Where assertion reports go (reference: tnengine/TnWriter.scala).
  * The reference offers HDFS / HBase / REST; graft ships a Hadoop-FS
  * writer (works for local paths, HDFS, and any object store with a
  * Hadoop connector — the 100 TB-cluster case) and a console writer.
  * The trait stays open for custom sinks. */
trait ReportWriter {
  def write(reportKey: String, groups: Seq[(String, Seq[RuleReport])]): Unit
}

object ReportWriter {
  private val mapper = new ObjectMapper()

  /** Render report groups as a JSON document. */
  def toJson(groups: Seq[(String, Seq[RuleReport])]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("assertionGroups")
    groups.foreach { case (key, reports) =>
      val g = arr.addObject()
      g.put("outputKey", key)
      val rs = g.putArray("assertionReports")
      reports.foreach { r =>
        val n = rs.addObject()
        n.put("query", r.query)
        n.put("description", r.description)
        n.put("threshold", r.threshold)
        n.put("fractionInvalid", r.fractionInvalid)
        n.put("numInvalid", r.numInvalid)
        n.put("totalRows", r.totalRows)
        n.put("failed", r.failed)
        val s = n.putObject("userSummaryStatistics")
        r.summaryStats.foreach { case (k, v) => s.put(k, String.valueOf(v)) }
        val samp = n.putArray("sampleInvalidData")
        r.sampleInvalid.foreach { rowMap =>
          val o = samp.addObject()
          rowMap.foreach { case (k, v) => o.put(k, v) }
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}

/** Writes `<dest>/<reportKey>.json` through the Hadoop FileSystem API. */
class FsReportWriter(spark: SparkSession, dest: String) extends ReportWriter {
  override def write(reportKey: String, groups: Seq[(String, Seq[RuleReport])]): Unit = {
    val path = new HPath(dest, s"$reportKey.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(ReportWriter.toJson(groups).getBytes("UTF-8"))
    finally out.close()
  }
}

/** Ships each report through a user-supplied transport — the
  * reference's REST/HBase writers (tnengine/TnWriter.scala:87-137,
  * `TnHBaseWriter` / `TnRESTWriter`) re-expressed as the same
  * zero-dependency pattern as [[PlanParser.parseFetched]]'s loader:
  * graft renders the canonical JSON document, the caller owns the
  * transport (an HTTP POST, an HBase put, a message-bus produce), so
  * the library pulls in no client jars. `post` receives
  * (reportKey, jsonBody) once per report. */
class TransportReportWriter(post: (String, String) => Unit) extends ReportWriter {
  override def write(reportKey: String, groups: Seq[(String, Seq[RuleReport])]): Unit =
    post(reportKey, ReportWriter.toJson(groups))
}

/** Logs the report to stdout — handy in tests and notebooks. */
class ConsoleReportWriter extends ReportWriter {
  override def write(reportKey: String, groups: Seq[(String, Seq[RuleReport])]): Unit =
    println(s"=== report $reportKey ===\n${ReportWriter.toJson(groups)}")
}
