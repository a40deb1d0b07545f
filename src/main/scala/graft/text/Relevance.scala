package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: TF-IDF term weighting and BM25 ranking —
  * the retrieval-side operators of a training-data pipeline (topical
  * filtering, query-based subset selection, nearest-benchmark scoring).
  *
  * Scale shape: one token explode over the corpus feeding two hash
  * aggregates (per-(doc,term) tf and per-term df, both map-side partial),
  * then a broadcast of the term-level stats back onto the postings. The
  * per-doc top-k uses a window PARTITIONED BY doc (fine-grained key, no
  * global sort); BM25's corpus scalars (N, avgdl) ride in as a broadcast
  * literal join. Nothing here materializes per-doc arrays.
  */
object Relevance {

  /** (id, term, tf) postings with per-doc length dl alongside. */
  private def postings(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document: tfidf = tf * ln(N / df), ties broken
    * by term. Output (id, term, tf, tfidf, rank), rank <= k. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val n = df.count().toDouble
    // posts feeds the doc-frequency aggregate AND the scoring join —
    // persist so the corpus is tokenized/exploded/aggregated once
    val posts = postings(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
    // rank on the ROUNDED score (q35/q49 pattern): distinct (tf, df)
    // pairs can yield mathematically equal scores (2*ln 2 vs ln 4) that
    // JVM and DuckDB libm order differently at the rank-k boundary
    val w = Window.partitionBy("id")
      .orderBy(round(col("__tfidf"), 4).desc, col("term").asc)
    val out = posts.join(broadcast(dfreq), Seq("term"))
      .withColumn("__tfidf", col("tf") * log(lit(n) / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"),
        round(col("__tfidf"), 4).as("tfidf"), col("rank"))
      .localCheckpoint()
    posts.unpersist(false)
    out
  }

  /** Okapi BM25 scores of every document against a bag of query terms;
    * returns the top-k docs (score desc, id asc).
    *
    * score(d) = sum over query terms t of
    *   ln(1 + (N - df + 0.5)/(df + 0.5)) * tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))
    */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val posts = postings(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = posts.groupBy("id").agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).first()
    if (stats.getLong(0) == 0L) {
      // empty corpus (or all-whitespace docs): no postings, avgdl null —
      // return an empty scored frame instead of NPEing on the null avg
      posts.unpersist(false)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("bm25",
            org.apache.spark.sql.types.DoubleType))))
    }
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getDouble(1)
    // distinct: a duplicated query term would multiply its posting rows
    // through the join below, doubling df (wrong idf for every doc)
    val q = queryTerms.distinct.toDF("term")
    val dfreq = posts.join(broadcast(q), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
    val scored = posts
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("id"))
      .withColumn("__s", idf * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl)))
      .groupBy("id")
      .agg(round(sum(col("__s")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("id").asc)
      .limit(k)
    val out = scored.localCheckpoint()
    posts.unpersist(false)
    out
  }

  /** ROUGE-L per (candidate, reference) pair (X281; Lin 2004) — the
    * recall-oriented generation-eval companion to [[bleuCorpus]]:
    * token-level longest common subsequence, P = LCS/|cand|,
    * R = LCS/|ref|, F = 2PR/(P+R). All three stats come from the
    * codegen'd RougeLCounts kernel (two-row-DP LCS, per-pair local) —
    * one shuffle-free scan, no cross-row state; the 100 TB cost is
    * exactly the token DP. Zero-length sides yield null scores, and
    * LCS = 0 yields F = 0 (not null) when both sides are non-empty.
    *
    * Output per pair: (idCol, lcs BIGINT, cand_len BIGINT,
    * ref_len BIGINT, precision 4dp, recall 4dp, f1 4dp). */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String): DataFrame = {
    import graft.functions.gfunctions.rouge_l_counts
    val withB = pairs.select(col(idCol),
      rouge_l_counts(col(candCol), col(refCol)).as("__b"))
    val l = col("__b").getItem(0)
    val cl = col("__b").getItem(1)
    val rl = col("__b").getItem(2)
    val p = l.cast("double") / nullif(cl.cast("double"), lit(0.0))
    val r = l.cast("double") / nullif(rl.cast("double"), lit(0.0))
    val f = when(p.isNull || r.isNull, lit(null).cast("double"))
      .when(p + r === 0.0, lit(0.0))
      .otherwise(lit(2.0) * p * r / (p + r))
    withB.select(col(idCol), l.as("lcs"), cl.as("cand_len"),
      rl.as("ref_len"), round(p, 4).as("precision"),
      round(r, 4).as("recall"), round(f, 4).as("f1"))
  }

  /** Corpus-level BLEU-4 (X277; Papineni et al. 2002) over
    * (candidate, reference) text pairs — the generation-eval score a
    * training pipeline needs once it produces model outputs: modified
    * n-gram precision with per-pair clipping (a candidate n-gram earns
    * credit at most as often as the reference contains it), geometric
    * mean over n = 1..4, and the corpus brevity penalty
    * e^(1 − r/c) for c < r. Unsmoothed: any empty precision order
    * zeroes the score (the standard corpus-BLEU convention).
    *
    * Shape: clipping is per-pair, so every statistic comes from ONE
    * codegen'd [[org.apache.spark.sql.graft.RougeLCounts sibling]]
    * BleuCounts kernel scan (clipped matches + totals for n = 1..4
    * plus both lengths) and one 10-integer aggregate — no explode, no
    * (pair, gram) shuffle anywhere. Output (one row): n_pairs,
    * p1..p4 6dp, brevity_penalty 6dp, bleu 6dp (null when a candidate
    * side has no 4-grams at all). */
  def bleuCorpus(pairs: DataFrame, idCol: String, candCol: String,
                 refCol: String): DataFrame = {
    import graft.functions.gfunctions.bleu_counts
    // clipping is PER-PAIR by definition, so the whole computation is
    // one codegen'd kernel scan (BleuCounts: clipped matches + totals
    // for n = 1..4 plus both lengths) and ONE 10-integer aggregate —
    // no explode, no (pair, gram) shuffle. The first cut of this
    // operator joined per-order gram counts and went super-linear at
    // 10x data from shuffle spill; the kernel form is flat.
    val aggCols: Seq[org.apache.spark.sql.Column] =
      (0 until 4).flatMap(i => Seq(
        sum(col("__b").getItem(2 * i)).as(s"__num${i + 1}"),
        sum(col("__b").getItem(2 * i + 1)).as(s"__den${i + 1}"))) ++
      Seq(sum(col("__b").getItem(8)).as("__c"),
        sum(col("__b").getItem(9)).as("__r"))
    val stats = pairs
      .select(bleu_counts(col(candCol), col(refCol)).as("__b"))
      .agg(count(lit(1)).as("n_pairs"), aggCols: _*)
    val joined = stats.select(col("n_pairs") +:
      ((1 to 4).map(n => (col(s"__num$n").cast("double") /
        nullif(col(s"__den$n").cast("double"), lit(0.0)))
        .as(s"__p$n")) ++ Seq(col("__c"), col("__r"))): _*)
    val bp = when(col("__c") >= col("__r"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("__r").cast("double") / col("__c")))
    val ps = (1 to 4).map(n => col(s"__p$n"))
    val allPos = ps.map(_ > 0.0).reduce(_ && _)
    val bleu = when(ps.map(_.isNull).reduce(_ || _),
        lit(null).cast("double"))
      .when(allPos, bp * exp(ps.map(log).reduce(_ + _) / 4))
      .otherwise(lit(0.0))
    joined.select(col("n_pairs") +:
      (ps.zipWithIndex.map { case (p, i) =>
        round(p, 6).as(s"p${i + 1}")
      } ++ Seq(round(bp, 6).as("brevity_penalty"),
        round(bleu, 6).as("bleu"))): _*)
  }
}
