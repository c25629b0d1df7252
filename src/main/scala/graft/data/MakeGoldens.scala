package graft.data

import java.nio.file.{Files, Paths}

import graft.functions.TextExtractor
import graft.query.ScalarOracle

/** One-shot generator for the committed golden files (FIXTURES.md §2).
  * Runs the slow scalar oracle — NOT the engine — over the canonical
  * 2000-doc synthetic corpus, so the goldens are engine-independent.
  * The engine must then match them exactly (GoldenSpec).
  *
  * usage: runMain graft.data.MakeGoldens <outDir>
  */
object MakeGoldens {

  val NumDocs = 2000L

  /** The corpus exactly as the engine ingests it: docId = url rank. */
  def corpusDocs(): Seq[(Long, String, String)] =
    (0L until NumDocs).map(i => PagesGen.row(PagesGen.DefaultSeed, i))
      .map(p => (p.url, p.text)).sortBy(_._1).zipWithIndex
      .map { case ((u, t), r) => (r.toLong, u, t) }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "src/test/resources"
    Files.createDirectories(Paths.get(outDir))
    val docs = corpusDocs()
    val urls = docs.map(d => d._1 -> d._2).toMap
    val corpus = ScalarOracle.corpus(docs.map(d => (d._1, d._3)))

    val topk = new StringBuilder("queryId\tmode\trank\tdocId\turl\tscore\n")
    QuerySet.queries().foreach { q =>
      Seq("or", "and").foreach { mode =>
        ScalarOracle.topK(corpus, q.text, 10, and = mode == "and")
          .zipWithIndex.foreach { case ((d, s), i) =>
            // Double.toString round-trips exactly — bit-exact golden
            topk.append(s"${q.queryId}\t$mode\t${i + 1}\t$d\t${urls(d)}\t$s\n")
          }
      }
    }
    Files.writeString(Paths.get(s"$outDir/topk_golden.tsv"), topk.toString)

    val md = java.security.MessageDigest.getInstance("SHA-256")
    val ext = new StringBuilder("url\tsha256_text\n")
    (0L until 500L).foreach { i =>
      val p = PagesGen.row(PagesGen.DefaultSeed, i)
      md.reset()
      // hash the GENERATOR's ground-truth text, NOT the extractor's
      // output: a golden derived from the implementation under test
      // would bake in any extractor bug present at regeneration time
      // and detect only drift from the buggy snapshot. p.text is the
      // spec value (extract(p.html) == p.text is separately asserted
      // in TokenizeExtractSpec), so this golden stays
      // implementation-independent.
      val h = md.digest(p.text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      ext.append(s"${p.url}\t$h\n")
    }
    Files.writeString(Paths.get(s"$outDir/extract_golden.tsv"), ext.toString)
    println(s"goldens written to $outDir")
  }
}
