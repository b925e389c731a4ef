package graft.functions

import scala.io.Source

/** A sentiment lexicon: word → integer valence (AFINN's model: negative
  * scores are negative sentiment). The reference gets sentiment from a
  * pretrained Spark NLP pipeline (`tweets.py:53`); the Spark-first
  * re-expression scores against a lexicon, and this type makes the lexicon
  * a swappable input instead of a pinned constant.
  *
  * [[Lexicon.Toy]] is the deterministic split of the synthetic corpus
  * vocabulary that the DuckDB oracle is generated from — tests and the
  * driver gate use it; production callers load AFINN/VADER-format files
  * with [[Lexicon.fromFile]] / [[Lexicon.fromResource]].
  */
final case class Lexicon(scores: Map[String, Int]) {
  /** Words with positive / negative valence, sorted for determinism. */
  lazy val positive: Seq[String] = scores.collect { case (w, s) if s > 0 => w }.toSeq.sorted
  lazy val negative: Seq[String] = scores.collect { case (w, s) if s < 0 => w }.toSeq.sorted
  def size: Int = scores.size
}

object Lexicon {

  /** The pinned toy lexicon (the synthetic vocabulary's split) — keeps
    * every existing oracle row byte-identical.
    */
  val Toy: Lexicon = Lexicon(
    (TextFunctions.positiveWords.map(_ -> 1) ++
      TextFunctions.negativeWords.map(_ -> -1)).toMap)

  /** Shared AFINN-format line parser: `token<TAB>value`, blank lines and
    * `#` comments skipped, `conv` interprets the value (Int valences
    * here, Double weights in [[SentimentModel.fromLines]] — one parser,
    * so a format fix lands in both loaders).
    */
  private[functions] def parseTokenValueLines[A](
      lines: Iterator[String])(conv: String => A): Map[String, A] = {
    val entries = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val cut = l.lastIndexOf('\t')
        require(cut > 0, s"not token<TAB>value format: '$l'")
        l.substring(0, cut) -> conv(l.substring(cut + 1).trim)
      }
      .toMap
    require(entries.nonEmpty, "empty token-value list")
    entries
  }

  /** Parse AFINN-format lines: `word<TAB>score`, one per line; blank lines
    * and `#` comments skipped. Multi-word AFINN phrases are kept verbatim
    * (they simply never match single-token lookups).
    */
  def fromLines(lines: Iterator[String]): Lexicon =
    Lexicon(parseTokenValueLines(lines)(_.toInt))

  /** Load from a filesystem path (driver-side; the lexicon is broadcast
    * from the plan, never re-read per task).
    */
  def fromFile(path: String): Lexicon = {
    val src = Source.fromFile(path, "UTF-8")
    try fromLines(src.getLines()) finally src.close()
  }

  /** Load from a classpath resource (how a packaged word list ships). */
  def fromResource(name: String): Lexicon = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    require(in != null, s"resource not found: $name")
    val src = Source.fromInputStream(in, "UTF-8")
    try fromLines(src.getLines()) finally src.close()
  }

  /** Plain word-per-line list (stopwords etc.), `#` comments skipped. */
  def wordList(lines: Iterator[String]): Seq[String] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSeq.distinct
}
