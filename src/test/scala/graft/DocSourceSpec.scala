package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.data.{PageRow, PagesGen}

/** DocSource contract (`Main.readPages` — the input seam of SURVEY
  * §2.9). Pins the behavior of all three URI schemes so the
  * production branch cannot rot into dead code:
  *  - `gen:N` and plain parquet paths are exercised end-to-end;
  *  - `iceberg:<tbl>` cannot run here (no Iceberg runtime jar ships in
  *    this zero-egress sandbox — documented blocker), so the contract
  *    pins (a) that the branch addresses the `iceberg` data source by
  *    name and fails ONLY on its absence, and (b) the exact row schema
  *    any source must deliver, which is what the Iceberg table must
  *    match column-for-column (BASELINE.json input_hint).
  */
class DocSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("gen: URI yields deterministic synthetic pages") {
    val a = Main.readPages(spark, "gen:50").collect().sortBy(_.url)
    val b = Main.readPages(spark, "gen:50").collect().sortBy(_.url)
    assert(a.length == 50)
    assert(a.map(_.url).toSeq == b.map(_.url).toSeq)
    assert(a.map(_.text).toSeq == b.map(_.text).toSeq)
  }

  test("parquet path round-trips the page schema") {
    val dir = SparkTestSession.tmpDir("graft_docsource")
    PagesGen.pages(spark, 30L).write.mode("overwrite").parquet(dir)
    val got = Main.readPages(spark, dir)
    assert(got.count() == 30L)
    assert(got.head().url.startsWith("https://"))
  }

  test("input schema contract: (url, warc_ts, html, text, lang)") {
    // the shape every source — including the production Iceberg
    // table — must deliver, per BASELINE.json input_hint
    val enc = org.apache.spark.sql.Encoders.product[PageRow]
    val want = Seq(
      ("url", StringType), ("warc_ts", TimestampType),
      ("html", BinaryType), ("text", StringType), ("lang", StringType))
    val got = enc.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(got == want, s"PageRow schema drifted: $got")
  }

  test("iceberg: URI addresses the iceberg source; blocked only by " +
       "the missing runtime jar in this sandbox") {
    val e = intercept[Exception] {
      Main.readPages(spark, "iceberg:db.pages").collect()
    }
    val msg = e.getMessage.toLowerCase
    // Spark's 'failed to find data source' error proves the branch
    // reached format("iceberg") resolution — i.e. the code path is
    // live and the ONLY blocker is the absent runtime dependency
    assert(msg.contains("iceberg"), s"unexpected failure: $msg")
    assert(msg.contains("failed to find") || msg.contains("data source") ||
      msg.contains("provider"), s"unexpected failure mode: $msg")
  }
}
