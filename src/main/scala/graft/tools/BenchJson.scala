package graft.tools

/** Shared bench-record access for the gate mains (round-15 ADVICE: the
  * minimal JSON pluck was triplicated across ScaleGate / SkewGate /
  * ConcurrentGate, and each copy silently truncated at the first '}'
  * after "queries" — a nested value in a future bench format would
  * shrink the time map with no signal). One pluck, with the flatness
  * and shape assumptions ASSERTED instead of assumed.
  */
object BenchJson {

  /** Newest bench_full_r*.json in the working directory. */
  def newestBenchFile(): String = {
    val fs = new java.io.File(".").listFiles()
      .filter(_.getName.matches("bench_full_r\\d+(_final)?\\.json"))
    require(fs.nonEmpty, "no bench_full_r*.json in the working dir — " +
      "run graft.Bench first or pass the path")
    fs.maxBy(_.lastModified).getPath
  }

  /** The flat {"name": seconds, ...} "queries" object of a bench
    * record. Fails fast (rather than truncating) if the object is not
    * flat, is empty, or its keys stop looking like catalog query
    * names. */
  def queryTimes(path: String): Map[String, Double] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val start = "\"queries\"\\s*:\\s*\\{".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"$path: no \"queries\" object"))
    val rest = txt.substring(start.end)
    val close = rest.indexOf('}')
    require(close >= 0, s"$path: unterminated queries object")
    val body = rest.substring(0, close)
    require(!body.contains("{"),
      s"$path: queries object is not flat — the pluck would truncate; " +
        "teach BenchJson the new format")
    val times = "\"([^\"]+)\"\\s*:\\s*([0-9.Ee+-]+)".r
      .findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    require(times.nonEmpty, s"$path: empty queries map")
    val offShape = times.keys.filterNot(_.matches("q\\d+\\w*"))
    require(offShape.isEmpty,
      s"$path: unexpected query-name shape: ${offShape.take(3).mkString(", ")}")
    times
  }
}
