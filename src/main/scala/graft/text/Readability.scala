package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flesch readability scoring (L66): the word/sentence/syllable-ratio
  * formulas every content-quality pipeline reports, as one codegen'd
  * narrow projection — a quality-scoring companion to the
  * perplexity/gopher-rule gates, catching "grammatical but impenetrable"
  * text those miss.
  *
  * Counting conventions (documented because they ARE the contract —
  * readability formulas are only comparable under fixed counting
  * rules): words = \S+ runs; sentences = non-blank segments after
  * splitting on [.!?]+ runs, floored at 1; syllables ≈ [aeiouy]+ vowel
  * groups over the lowercased text — the standard cheap approximation
  * (true syllabification needs a dictionary; the vowel-group count is
  * within ~10% on English prose and deterministic on any engine with
  * the same regex classes). All three are exact integers, so the two
  * ratio formulas are engine-identical before their 4-dp round.
  */
object Readability {

  /** Output: (idCol, n_words, n_sentences, n_syllables,
    * flesch_ease 4-dp, fk_grade 4-dp); docs with zero words yield null
    * scores. */
  def flesch(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
    val sentences = greatest(lit(1),
      size(filter(split(col(textCol), "[.!?]+"),
        s => length(trim(s)) > 0)))
    val syllables = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0)))
    docs.select(col(idCol),
        words.cast("long").as("n_words"),
        sentences.cast("long").as("n_sentences"),
        syllables.cast("long").as("n_syllables"))
      .withColumn("flesch_ease",
        when(col("n_words") > 0,
          round(lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words")), 4)))
      .withColumn("fk_grade",
        when(col("n_words") > 0,
          round(lit(0.39) * (col("n_words").cast("double") /
              col("n_sentences")) +
            lit(11.8) * (col("n_syllables").cast("double") /
              col("n_words")) - lit(15.59), 4)))
  }
}
