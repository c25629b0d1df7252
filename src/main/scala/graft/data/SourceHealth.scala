package graft.data

import org.apache.spark.sql.SparkSession

import graft.index.IndexPaths

/** Per-source health surface — the control-plane record the reference
  * keeps for every registered source (HealthStatus + consecutive
  * failure count + last-checked timestamps,
  * /root/reference/packages/core/spheraform_core/models/geoserver.py:36-114).
  *
  * A probe is deliberately CHEAP: resolve the source, validate the
  * page schema, and take a metadata row count — never a content scan
  * (health checks run on a schedule; the change-probe ladder in
  * [[graft.index.Incremental]] is the content-level instrument).
  * Status ladder: `healthy` → `degraded` (1-2 consecutive failures) →
  * `unreachable` (3+), with a success resetting the counter — the
  * reference's consecutive-failure escalation.
  */
object SourceHealth {

  val UnreachableAfter = 3

  case class HealthRecord(source: String, status: String,
                          consecutiveFailures: Int, lastProbeMs: Long,
                          lastSuccessMs: Long, rows: Long,
                          message: String)

  private def recPath(stateDir: String, src: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(src.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    s"$stateDir/health_$h.json"
  }

  def read(spark: SparkSession, src: String,
           stateDir: String): Option[HealthRecord] = {
    val p = recPath(stateDir, src)
    if (!IndexPaths.exists(spark, p)) None
    else {
      val m = IndexPaths.parseFlatJson(IndexPaths.readString(spark, p))
      Some(HealthRecord(m("source"), m("status"),
        m("consecutiveFailures").toInt, m("lastProbeMs").toLong,
        m("lastSuccessMs").toLong, m("rows").toLong, m("message")))
    }
  }

  private def write(spark: SparkSession, stateDir: String,
                    r: HealthRecord): Unit = {
    // SANITIZE, don't escape: parseFlatJson understands no escape
    // sequences, so a stored \" would flip its in-quotes state and a
    // later read would crash or corrupt — permanently bricking the
    // source's health record (probe() reads before writing). The
    // record is an operator surface; lossy replacement is fine.
    def esc(s: String) =
      s.map {
        case '"' | '\\' => ' '
        case c if c < ' ' => ' '
        case c => c
      }
    IndexPaths.writeString(spark, recPath(stateDir, r.source),
      s"""{"source":"${esc(r.source)}","status":"${r.status}",""" +
        s""""consecutiveFailures":"${r.consecutiveFailures}",""" +
        s""""lastProbeMs":"${r.lastProbeMs}",""" +
        s""""lastSuccessMs":"${r.lastSuccessMs}","rows":"${r.rows}",""" +
        s""""message":"${esc(r.message)}"}""")
  }

  /** Probe `src`, update and persist its health record. `nowMs` is a
    * parameter (not wall-clock inside) so specs are deterministic.
    */
  def probe(spark: SparkSession, src: String, stateDir: String,
            nowMs: Long = System.currentTimeMillis()): HealthRecord = {
    val prev = read(spark, src, stateDir)
    val attempt: Either[String, Long] =
      try {
        // untyped resolution (no .as[PageRow]) so a wrong schema is a
        // reportable probe failure, not an analysis crash
        val ds =
          if (src.startsWith("gen:"))
            PagesGen.pages(spark, src.stripPrefix("gen:").toLong).toDF()
          else if (src.startsWith("iceberg:"))
            spark.read.format("iceberg").load(src.stripPrefix("iceberg:"))
          else spark.read.parquet(src)
        val cols = ds.schema.fieldNames.toSet
        val required = Set("url", "warc_ts", "text")
        if (!required.subsetOf(cols))
          Left(s"schema missing ${(required -- cols).mkString(",")}")
        else Right(ds.count()) // parquet: metadata count, no scan
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    val rec = attempt match {
      case Right(n) =>
        HealthRecord(src, "healthy", 0, nowMs, nowMs, n, "")
      case Left(msg) =>
        val fails = prev.map(_.consecutiveFailures).getOrElse(0) + 1
        HealthRecord(src,
          if (fails >= UnreachableAfter) "unreachable" else "degraded",
          fails, nowMs,
          prev.map(_.lastSuccessMs).getOrElse(0L),
          prev.map(_.rows).getOrElse(0L), msg)
    }
    write(spark, stateDir, rec)
    rec
  }
}
