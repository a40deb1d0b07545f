package graft.dedup

import graft.SparkSuite

/** Paragraph-grain corpus dedup (q423's operator): blank-line unit,
  * CR/LF + separator-width normalization, first-occurrence (min id,
  * min pos) keep, empty-survivor contract. */
class ParagraphDedupSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, String] =
    Dedup.paragraphDedup(rows.toDF("id", "text"), "id", "text")
      .as[(Long, String)].collect().toMap

  test("duplicate paragraphs keep only the (min id, min pos) occurrence") {
    val got = run(
      1L -> "alpha\n\nbeta\n\ngamma",
      2L -> "beta\n\ndelta",
      3L -> "alpha\n\nbeta")
    assert(got(1L) == "alpha\n\nbeta\n\ngamma")
    assert(got(2L) == "delta")
    assert(got(3L) == "")
  }

  test("within-doc duplicates collapse too; order preserved") {
    val got = run(1L -> "p\n\nq\n\np\n\nr")
    assert(got(1L) == "p\n\nq\n\nr")
  }

  test("CRLF and wide separators normalize to one blank line") {
    val got = run(
      1L -> "a\r\n\r\nb",          // CRLF blank line
      2L -> "c\n\n\n\nd",          // 3+ newlines = one boundary
      3L -> "a\n\n\nz")            // dup of 'a' via a wide separator
    assert(got(1L) == "a\n\nb")
    assert(got(2L) == "c\n\nd")
    assert(got(3L) == "z")
  }

  test("single-paragraph docs and ties resolve deterministically") {
    val got = run(2L -> "same", 1L -> "same", 3L -> "other")
    assert(got(1L) == "same")
    assert(got(2L) == "")
    assert(got(3L) == "other")
  }
}
