package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sample.Sampling
import graft.text.{CorpusStats, TextAnalysis}

/** 10x scaling measurement for the training-pipeline operators added in
  * rounds 4-6 (mixture resampling, Gopher gates, token-KL, incremental
  * dedup; as-of join, banded range join, funnel, unigram perplexity,
  * semantic dedup): synthesizes a documents corpus at sf1-equivalent row count
  * (50k docs; sf0.1 ships 5k) and at 10x that, writes it to parquet so
  * every timed plan starts from a real columnar scan, and reports wall
  * seconds per operator per scale plus the scaling factor. A linear
  * operator should land near 10x (or below, when fixed session/job
  * overhead dominates the small scale); anything super-linear flags a
  * shuffle growing faster than the data. Results are recorded in
  * SCALE.md.
  *
  * Deterministic corpus: ~120-token docs drawn from a 1,000-word
  * hash-derived vocabulary with embedded stopwords (so quality gates and
  * token stats exercise realistic branches), 7 sources with skewed
  * frequencies (so mixture rates differ per stratum), and ~7.7% exact
  * duplicates (doc_id % 13 copies its neighbor's text) so dedup does
  * real work.
  */
object LlmScaleSmoke {

  private def lcg(seed: Long): Long =
    seed * 6364136223846793005L + 1442695040888963407L

  private val stopwords = Array("the", "a", "is", "and", "of")
  private val sources = Array("web", "books", "code", "wiki", "news",
    "social", "academic")

  /** Shared with the phrase-search smoke so the probe phrase is made of
    * REAL corpus tokens (a stopword anchor + a vocab word — linear-in-n
    * postings with a nonzero hit rate). */
  private lazy val vocab: Array[String] = (0 until 1000).map { i =>
    val len = 3 + (math.abs(lcg(i.toLong * 31)) % 8).toInt
    val sb = new java.lang.StringBuilder(len)
    var k = 0
    while (k < len) {
      sb.append(('a' + (math.abs(lcg(i.toLong * 1009 + k)) % 26).toInt).toChar)
      k += 1
    }
    sb.toString
  }.toArray

  /** Deterministic synthetic corpus (doc_id, source, text). */
  private def synth(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).as[Long].map { id =>
      // % 13 docs duplicate their neighbor's content: real dedup work
      val seed = if (id % 13 == 0 && id > 0) id - 1 else id
      val nTok = 80 + (math.abs(lcg(seed * 7919)) % 80).toInt
      val sb = new java.lang.StringBuilder(nTok * 7)
      var t = 0
      while (t < nTok) {
        val h = math.abs(lcg(seed * 1000003 + t))
        // every ~6th token is a stopword: Gopher stopword gate does work
        val w = if (t % 6 == 0) stopwords((h % stopwords.length).toInt)
                else vocab((h % vocab.length).toInt)
        if (t > 0) sb.append(' ')
        sb.append(w)
        t += 1
      }
      // skewed source mix: source k gets ~(k+1)/28 of the corpus
      val r = math.abs(lcg(id * 104729)) % 28
      val src = sources(math.min(6, math.sqrt(r.toDouble * 2 + 0.25).toInt))
      (id, src, sb.toString)
    }.toDF("doc_id", "source", "text")
  }

  /** Deterministic synthetic event stream (event_id, ts, user_id,
    * event_type, value): n/100 users, 30 days, skew-free uniform types. */
  private def synthEvents(spark: SparkSession, nEvents: Long): DataFrame = {
    import spark.implicits._
    val types = Array("view", "click", "signup", "purchase", "error")
    spark.range(nEvents).as[Long].map { id =>
      val h = math.abs(lcg(id * 2654435761L))
      val user = h % math.max(1L, nEvents / 100)
      val tsMicros = 1704067200000000L + // 2024-01-01 UTC
        math.abs(lcg(id * 104729 + 7)) % (30L * 86400 * 1000000)
      val tpe = types((math.abs(lcg(id * 31 + 1)) % types.length).toInt)
      (id, new java.sql.Timestamp(tsMicros / 1000), user, tpe,
        (h % 10000) / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  /** Deterministic 64-dim embeddings with planted near-dups (id % 13). */
  private def synthVecs(spark: SparkSession, nVecs: Long): DataFrame = {
    import spark.implicits._
    spark.range(nVecs).as[Long].map { id =>
      val seed = if (id % 13 == 0 && id > 0) id - 1 else id
      val base = Array.tabulate(64) { j =>
        ((math.abs(lcg(seed * 7919 + j)) % 2000) - 1000) / 1000.0
      }
      // near-dup copies get a small deterministic perturbation
      if (seed != id) base(0) += 0.01
      (id, base)
    }.toDF("vec_id", "embedding")
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(50000L)
    // optional 2nd arg: comma-separated op names — measure just those
    // (builder-local iteration; a full run measures everything)
    val onlyOps: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val weights = Map("web" -> 0.2, "books" -> 0.3, "code" -> 0.2,
      "wiki" -> 0.1, "news" -> 0.1, "social" -> 0.05, "academic" -> 0.05)

    val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    val results = Seq(base, base * 10).map { n =>
      val dirPath = Files.createTempDirectory(s"graft-llmscale-$n")
      tmpDirs += dirPath
      val dir = dirPath.toString
      synth(spark, n).write.mode("overwrite").parquet(s"$dir/docs")
      val docs = spark.read.parquet(s"$dir/docs")
      // seen set = hashes of the first half, materialized to parquet
      // OUTSIDE the timed closure — the L32 contract is "anti-join the
      // ACCUMULATED hash set", so history construction must not pollute
      // the operator's measurement
      val half = n / 2
      Dedup.exactGroups(docs.filter(col("doc_id") < half), "doc_id", "text")
        .select("content_md5")
        .write.mode("overwrite").parquet(s"$dir/seen")
      val seen = spark.read.parquet(s"$dir/seen")
      synthEvents(spark, n).write.mode("overwrite").parquet(s"$dir/events")
      val events = spark.read.parquet(s"$dir/events")
      synthVecs(spark, n / 10).write.mode("overwrite").parquet(s"$dir/vecs")
      val vecs = spark.read.parquet(s"$dir/vecs")
      // cells sized to hold expected occupancy CONSTANT across scales —
      // the documented SemDeDup usage (nLists grows with n, cell ≈ 256)
      val nLists = math.max(16, (n / 10 / 256).toInt)
      val ops: Seq[(String, () => Unit)] = Seq(
        "gopher_gates" -> (() => sink(
          TextAnalysis.gopherFilter(docs, "text")
            .select("doc_id", "gopher_keep"))),
        "token_kl" -> (() => sink(
          CorpusStats.tokenDivergence(docs, "source", "text"))),
        "mixture_sample" -> (() => sink(
          Sampling.mixtureSample(docs, "source", "doc_id", weights,
            targetRows = n / 10))),
        "incremental_dedup" -> (() => sink(
          Dedup.incrementalExactDedup(
            docs.filter(col("doc_id") >= half), "doc_id", "text", seen))),
        "asof_join" -> (() => sink(
          graft.join.AsOfJoin.asOfBackward(
            events.filter(col("event_type") =!= "purchase")
              .select("event_id", "user_id", "ts"),
            events.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"),
                col("event_id").as("purchase_id")),
            "user_id", "ts", payload = Seq("purchase_id")))),
        "range_join" -> (() => sink(
          graft.join.RangeJoin.bandedIntervalJoin(
            events.filter(col("event_type") === "purchase")
              .select(col("event_id").as("purchase_id"), col("user_id"),
                (col("ts") - expr("INTERVAL 2 HOURS")).as("w_start"),
                col("ts").as("w_end")),
            events.filter(col("event_type").isin("click", "view"))
              .select("user_id", "ts", "value"),
            "user_id", "w_start", "w_end", "ts", bandWidthSec = 7200)
            .groupBy("purchase_id").agg(count(lit(1)).as("n_prior")))),
        "funnel" -> (() => sink(
          graft.events.Funnel.funnelCounts(events, "user_id", "event_type",
            "ts", Seq("signup", "click", "purchase")))),
        "unigram_ppl" -> (() => sink(
          CorpusStats.unigramLogPerplexity(docs, "doc_id", "text"))),
        "semantic_dedup" -> (() => sink(
          graft.ann.Similarity.semanticDedup(vecs, "vec_id", "embedding",
            nLists = nLists, threshold = 0.9))),
        "markup_strip" -> (() => sink(
          TextAnalysis.stripMarkup(docs, "text")
            .select("doc_id", "text_plain"))),
        "contamination" -> (() => sink(
          graft.dedup.Decontaminate.contaminationFraction(
            docs, "doc_id", "text",
            // benchmark = a fixed 500-doc eval set regardless of scale
            // (benchmarks don't grow with the corpus)
            docs.filter(col("doc_id") < 500), "text"))),
        "span_dedup_stats" -> (() => sink(
          Dedup.duplicateSpanStats(docs, "doc_id", "text", k = 8))),
        // round-7 additions: the four new operator families whose scaling
        // behavior is least obvious from the plan alone
        "triangles" -> (() => sink(
          graft.graph.Triangles.countTriangles(
            events.select((col("user_id") % 997).as("src"),
              (pmod(col("event_id") * 2654435761L, lit(997L))).as("dst"))))),
        "interval_merge" -> (() => sink(
          graft.events.Intervals.coverageStats(
            events.select(col("user_id"),
              unix_millis(col("ts")).as("s"))
              .withColumn("e", col("s") + lit(1200000L)),
            "user_id", "s", "e"))),
        "sorted_neighborhood" -> (() => sink(
          Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
            windowSize = 3, minJaccard = 0.5, blockLen = 2))),
        "overlap_join" -> (() => sink(
          graft.join.RangeJoin.bandedOverlapJoin(
            events.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts").as("a_s"),
                (col("ts") + expr("INTERVAL 30 MINUTES")).as("a_e")),
            events.filter(col("event_type") === "click")
              .select(col("user_id"), col("ts").as("b_s"),
                (col("ts") + expr("INTERVAL 10 MINUTES")).as("b_e")),
            "user_id", "a_s", "a_e", "b_s", "b_e", bandWidthSec = 1800)
            .groupBy("user_id").agg(count(lit(1)).as("n_overlaps")))),
        // graph derived from the event stream (n/100 users, ~10 edges
        // each via consecutive-user links) — node and edge counts scale
        // with n, and the DataFrame-loop path is the one a 100-TB graph
        // takes, so it is the one measured
        "pagerank" -> (() => sink {
          val nUsers = math.max(1L, n / 100)
          val nodes = events.select(concat(lit("u"), col("user_id"))
            .as("gene")).distinct()
          val edges = events.select(
            concat(lit("u"), col("user_id")).as("src"),
            concat(lit("u"), pmod(col("user_id") * 2654435761L
              + col("event_id") % 7, lit(nUsers))).as("dst"))
          graft.graph.Centrality.pageRankDistributed(spark, nodes,
            edges, damping = 0.85, iters = 5)
        }),
        // round-7 batch-C additions
        // baskets of ~5 events each over an item universe growing with n,
        // so per-item support stays ~constant across scales — the pair
        // aggregate is then pair-mass-proportional (≈ linear)
        "basket_lift" -> (() => sink(
          graft.reco.MarketBasket.liftPairs(
            events.select((col("event_id") % lit(math.max(1L, n / 5)))
              .as("basket"),
              pmod(col("event_id") * 2654435761L, lit(math.max(2L, n / 500)))
                .as("item")),
            "basket", "item", minSupport = 50L, minPairCount = 2L))),
        // stopword anchor + vocab word: both postings lists are
        // corpus-proportional, hits ~ n·20/1000 — the linear-scan-free
        // claim is only honest if measured on linear postings
        "phrase_search" -> (() => sink(
          graft.text.PhraseSearch.containing(docs, "doc_id", "text",
            Seq(stopwords(0), vocab(0))))),
        "golden_records" -> (() => sink(
          graft.dedup.Survivorship.goldenRecords(docs, "doc_id", "text",
            windowSize = 3, minJaccard = 0.5, blockLen = 2))),
        "clustering_coeff" -> (() => sink(
          graft.graph.Triangles.clusteringCoefficient(
            events.select((col("user_id") % 997).as("src"),
              (pmod(col("event_id") * 2654435761L, lit(997L))).as("dst"))))),
        "time_weighted" -> (() => sink(
          graft.events.TimeWeighted.trapezoidalMean(
            events.select(col("user_id"), unix_millis(col("ts")).as("tsm"),
              col("value"), col("event_id")),
            "user_id", "tsm", "value", "event_id"))),
        // train/score split by parity: both halves scale with n, so the
        // model aggregates AND the broadcast-replicated scoring pass are
        // token-stream-proportional
        "naive_bayes" -> (() => sink(
          graft.ml.NaiveBayes.trainScore(
            docs.filter(col("doc_id") % 2 === 0)
              .withColumn("label", col("source")),
            docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", "label"))),
        // vector count scales with n at constant k·dim, so each round's
        // broadcast-argmin crossJoin and mean aggregate are linear
        "kmeans" -> (() => sink(
          graft.ml.KMeans.lloydStats(vecs, "vec_id", "embedding",
            k = 16, iters = 2))),
        // fixed 997 vertices, edge count scaling with n: measures the
        // DataFrame-loop path whose per-iteration shuffles are
        // edge-proportional (the shape a 100-TB graph takes)
        "hits_distributed" -> (() => sink(
          graft.graph.Centrality.hitsDistributed(spark,
            events.select(concat(lit("u"), col("user_id") % 997)
              .as("gene")).distinct(),
            events.select(
              concat(lit("u"), col("user_id") % 997).as("src"),
              concat(lit("u"), pmod(col("event_id") * 2654435761L, lit(997L)))
                .as("dst")),
            iters = 5))),
        // round-7 batch-D additions: the series/graph/geometry family.
        // SSSP and k-core run their DISTRIBUTED loops (fixed 997-vertex
        // graph, edge count scaling with n — per-round shuffles are
        // edge-proportional, the 100-TB shape; kCore is forced off the
        // driver dispatch with edgeThreshold = 1)
        "sssp_distributed" -> (() => sink(
          graft.graph.ShortestPaths.fromSourceDistributed(spark,
            events.select(concat(lit("u"), col("user_id") % 997)
              .as("gene")).distinct(),
            events.select(
              concat(lit("u"), col("user_id") % 997).as("src"),
              concat(lit("u"), pmod(col("event_id") * 2654435761L,
                lit(997L))).as("dst"),
              (col("event_id") % 7 + 1).as("w")),
            source = "u0"))),
        "kcore_distributed" -> (() => sink(
          graft.graph.KCore.kCore(spark,
            events.select((col("user_id") % 997).as("src"),
              pmod(col("event_id") * 2654435761L, lit(997L)).as("dst")),
            k = 4, edgeThreshold = 1L))),
        // constant-density plane: the point count AND the area scale
        // with n, so per-cell occupancy (the candidate knob) is scale-
        // invariant — the honest way to measure the 3x3 cell join
        "spatial_nn" -> (() => sink {
          val m = math.max(100L, math.round(math.sqrt(n.toDouble * 400)))
          val pts = events.select(col("event_id"),
            (col("user_id") * 48271L % m).as("px"),
            (pmod(col("event_id") * 2654435761L, lit(m))).as("py"))
          graft.join.SpatialJoin.nearestWithinRadius(
            pts, pts.select(col("event_id").as("rid"),
              col("px").as("qx"), col("py").as("qy")),
            "event_id", "rid", "px", "py", "qx", "qy", radius = 20.0)
        }),
        "dbscan" -> (() => sink {
          val m = math.max(100L, math.round(math.sqrt(n.toDouble * 400)))
          val pts = events.select(col("event_id"),
            (col("user_id") * 48271L % m).as("px"),
            (pmod(col("event_id") * 2654435761L, lit(m))).as("py"))
          graft.ml.Dbscan.cluster(pts, "event_id", "px", "py",
            eps = 20L, minPts = 4)
        }),
        // covariance fan-out is dim²/2 per vector at fixed dim = linear
        "pca" -> (() => sink(
          graft.ml.Pca.topComponent(vecs, "vec_id", "embedding",
            iters = 10))),
        // per-group rank windows over n/100-user groups
        "spearman" -> (() => sink(
          graft.ml.RankStats.spearman(
            events.select((col("user_id") % 64).as("g"),
              col("value").as("x"),
              unix_millis(col("ts")).cast("double").as("y")),
            "g", "x", "y"))),
        "ks_test" -> (() => sink(
          graft.de.RankStats.ksTest(
            events.select((col("user_id") % 16).as("g"),
              col("event_type"), col("value")),
            "g", "event_type", "value", a = "click", b = "view"))),
        // entity-grain collapse + three global ranks at user grain;
        // forced onto the DISTRIBUTED two-pass rank so the 100-TB path
        // is the one measured
        "rfm" -> (() => sink(
          graft.report.Rfm.segments(
            events.select(col("user_id"), col("ts"),
              col("value").as("amt")),
            "user_id", "ts", "amt", distributedThreshold = 1L))),
        // item universe scales with n so per-item support stays ~
        // constant (the basket_lift discipline); top-5 neighbor cut
        "item_neighbors" -> (() => sink(
          graft.reco.ItemSim.topNeighbors(
            events.select((col("event_id") % lit(math.max(1L, n / 5)))
              .as("basket"),
              pmod(col("event_id") * 2654435761L, lit(math.max(2L, n / 500)))
                .as("item")),
            "basket", "item", minSupport = 50L, minPairCount = 2L,
            k = 5))),
        // user count scales with n at ~constant degree → wedge volume
        // linear; hub cap exercised as the documented skew knob
        "link_jaccard" -> (() => sink {
          // thinned to ~20 edges/user so the wedge volume (Σ deg²)
          // grows linearly with the user count, not with density
          val nUsers = math.max(2L, n / 100)
          graft.graph.LinkPrediction.neighborhoodJaccard(
            events.filter(col("event_id") % 5 === 0)
              .select(col("user_id").as("src"),
                pmod(col("event_id") * 2654435761L, lit(nUsers)).as("dst")),
            minCommon = 2L, maxDegree = 500L)
        }),
        // exact-rank kernel: per-value cells + one window per group,
        // both shuffles value-distinct-bounded
        "mann_whitney" -> (() => sink(
          graft.de.Inference.mannWhitney(
            events.select((col("user_id") % 16).as("g"),
              col("event_type"), col("value")),
            "g", "event_type", "value", a = "click", b = "view"))),
        // equity windows over (key, day) buckets — bucket count is the
        // scale axis, all three windows share one partitioning
        "max_drawdown" -> (() => sink {
          val daily = events.groupBy((col("user_id") % 64).as("k"),
              date_trunc("day", col("ts")).as("d"))
            .agg(round(sum(when(col("event_type") === "purchase",
                col("value")).otherwise(-col("value"))) * 100)
              .cast("long").as("flow"))
          graft.events.Finance.maxDrawdown(daily, "k", "d", "flow")
        }),
        // blocked pair volume = blocks x C(~100,2): linear in entities
        // at constant block size (the ER blocking contract)
        "fellegi_sunter" -> (() => sink {
          val nUsers = math.max(2L, n / 100)
          val ents = events.groupBy(col("user_id"))
            .agg(sum(col("value")).as("bal"))
            .select(col("user_id"),
              (col("user_id") % math.max(1L, nUsers / 100)).as("blk"),
              col("bal"))
          graft.er.FellegiSunter.score(
            graft.er.FellegiSunter.blockedPairs(ents, "user_id", Seq("blk"))
              .withColumn("bal_close",
                abs(col("l_bal") - col("r_bal")) < 50)
              .withColumn("key_mod",
                col("l_user_id") % 10 === col("r_user_id") % 10),
            Map("bal_close" -> ((0.9, 0.1)), "key_mod" -> ((0.9, 0.1))))
        }),
        // ~5 items/basket constant → C(k,3) per basket constant →
        // triple volume linear in baskets
        "triple_rules" -> (() => sink(
          graft.reco.MarketBasket.tripleRules(
            events.select((col("event_id") % lit(math.max(1L, n / 5)))
              .as("basket"),
              pmod(col("event_id") * 2654435761L, lit(math.max(2L, n / 500)))
                .as("item")),
            "basket", "item", minItemSupport = 50L, minTripleCount = 2L))),
        // exact-integer partition scoring on the link_jaccard graph
        "modularity" -> (() => sink {
          val nUsers = math.max(2L, n / 100)
          val edges = events.filter(col("event_id") % 5 === 0)
            .select(col("user_id").as("src"),
              pmod(col("event_id") * 2654435761L, lit(nUsers)).as("dst"))
          val comm = edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node"))).distinct()
            .withColumn("community", col("node") % 32)
          graft.graph.Modularity.modularity(edges, "src", "dst",
            comm, "node", "community")
        }),
        // one row_number window + per-key count, state user-bounded
        "cdc_apply" -> (() => sink(
          graft.events.Cdc.applyLog(
            events.withColumn("op",
              when(col("event_type") === "signup", "I")
                .when(col("event_type") === "error", "D")
                .otherwise("U")),
            "user_id", "ts", "event_id", "op", Seq("value"),
            deleteOp = "D"))),
        // 3 sync rounds × (edge join + argmax window), both node-keyed;
        // vertex set grows with n at ~constant degree
        "label_prop" -> (() => sink {
          val nUsers = math.max(2L, n / 100)
          graft.graph.LabelProp.propagate(
            events.filter(col("event_id") % 5 === 0)
              .select(col("user_id").as("src"),
                pmod(col("event_id") * 2654435761L, lit(nUsers)).as("dst")),
            "src", "dst", iters = 3)
        }),
        // rare-shingle candidates keep pair volume df-bounded; the
        // synthetic corpus's every-6th-token stopwords make 3-gram
        // patterns collide at df ~ 12 at 50k docs, so the df cap must
        // sit BELOW that plateau (the duplicate pairs the op exists to
        // find have df = 2) — the documented tuning contract: cap under
        // the background-collision df, above the true-duplicate df
        "containment" -> (() => sink(
          Dedup.containmentPairs(docs, "doc_id", "text",
            shingleSize = 3, minContainment = 0.6, maxShingleDf = 4L))),
        // phrase islands + word/phrase-grain aggregates; the token
        // stream is exploded once
        "rake" -> (() => sink(
          TextAnalysis.rakeKeywords(docs, "doc_id", "text",
            stopwords.toSeq, maxPhraseLen = 3, topK = 50))),
        // two per-query windows over query-bounded candidate lists;
        // query count scales with n
        "ndcg" -> (() => sink(
          graft.ml.Ranking.ndcgAtK(
            events.select((col("user_id") % math.max(2L, n / 500))
              .as("q"), col("event_id"),
              (col("event_id") % 4).cast("double").as("rel"),
              col("value").as("s")),
            "q", "event_id", "rel", "s", k = 10))),
        // ---- round-8 batch: the q232-q283 stat tail ----
        // per-user (duration, event) reduce → value-domain-bounded
        // hazard table (dur ≤ 30 days of minutes)
        "nelson_aalen" -> (() => sink {
          val subj = events.groupBy(col("user_id"))
            .agg(((unix_micros(max(col("ts"))) -
              unix_micros(min(col("ts")))) / 60000000L).as("dur"),
              max(when(col("event_type") === "error", 1).otherwise(0))
                .as("ev"))
          graft.de.Survival.nelsonAalen(subj, "dur", "ev")
        }),
        // 32 strata of sufficient statistics → one inverse-variance
        // reduce; everything past the first aggregate is stratum-bounded
        "meta_pool" -> (() => sink {
          val isC = col("event_type") === "click"
          val isV = col("event_type") === "view"
          val strata = events.filter(isC || isV)
            .groupBy(pmod(col("user_id"), lit(32)).as("stratum"))
            .agg(avg(when(isC, col("value"))).as("mc"),
              var_samp(when(isC, col("value"))).as("vc"),
              count(when(isC, 1)).as("nc"),
              avg(when(isV, col("value"))).as("mv"),
              var_samp(when(isV, col("value"))).as("vv"),
              count(when(isV, 1)).as("nv"))
            .select(col("stratum"), (col("mc") - col("mv")).as("effect"),
              sqrt(col("vc") / col("nc") + col("vv") / col("nv")).as("se"))
          graft.de.Meta.fixedEffect(strata, "effect", "se")
        }),
        // key count grows with n (one series per user bucket), series
        // length fixed at the 30-day horizon — the linear axis is keys
        "croston" -> (() => sink {
          val series = events
            .groupBy(pmod(col("user_id"), lit(math.max(2L, n / 1000)))
              .as("k"), date_trunc("day", col("ts")).as("d"))
            .agg(count(lit(1)).as("q"))
          graft.events.Ewma.croston(series, "k", "d", "q", alpha = 0.3)
        }),
        // one per-user presence aggregate + an 8-coalition reduce
        "shapley" -> (() => sink(
          graft.events.Shapley.threeChannel(events, "user_id",
            "event_type", Seq("click", "view", "signup"), "purchase"))),
        // per-key date-span grid anti-joined against observed days;
        // grid rows = keys × 30 days, linear in keys
        "calendar_gaps" -> (() => sink {
          val daily = events
            .select(pmod(col("user_id"), lit(math.max(2L, n / 1000)))
              .as("k"), to_date(col("ts")).as("d")).distinct()
          val span = daily.groupBy(col("k"))
            .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
          val grid = span.select(col("k"),
            explode(sequence(col("lo"), col("hi"))).as("d"))
          grid.join(daily, Seq("k", "d"), "left_anti")
            .groupBy(col("k")).agg(count(lit(1)).as("n_missing"))
        }),
        // BH past the REAL 2M dispatch threshold at both scales (3M /
        // 30M p-values) — the distributed three-job rank path runs for
        // real, not just under the spec's forced-threshold parity test;
        // the frame is generated (the cost IS the range sort + scans)
        "bh_distributed" -> (() => sink {
          val ps = spark.range(n * 60).select(col("id"),
            (pmod(col("id") * 2654435761L, lit(1000000L)) / 1000000.0)
              .as("pvalue"))
          graft.de.Stats.bhAdjust(ps, "pvalue", "adj", Seq("id"))
        }),
        // exact hypergeometric tails: lnfact table ∝ max stratum size,
        // k-grid ∝ margins — both grow linearly with n
        "fisher_exact" -> (() => sink(
          graft.de.Inference.fisherExact(
            events.select(col("event_type"),
              pmod(col("event_id"), lit(2)).cast("int").as("x"),
              when(col("event_id") % 3 === 0, 1).otherwise(0).as("y")),
            "event_type", "x", "y"))),
        // event-grain sweep line: one union + one keyed window sort
        "max_concurrency" -> (() => sink {
          val iv = events.select(col("event_type"),
            unix_micros(col("ts")).as("s"),
            (unix_micros(col("ts")) +
              round(col("value")).cast("long") * 1000000L).as("e"))
          graft.events.Intervals.maxConcurrency(iv, "event_type",
            "s", "e")
        }),
        // narrow regexp_count scan over the corpus, no shuffle at all
        "script_profile" -> (() => sink(
          graft.text.TextAnalysis.scriptProfile(docs, "doc_id", "text"))),
        // distributed Orzan SCC on the user graph (driver thresholds 0)
        "scc_distributed" -> (() => sink {
          val nUsers = math.max(2L, n / 100)
          val edges = events.filter(col("event_id") % 5 === 0)
            .select(col("user_id").as("src"),
              pmod(col("event_id") * 2654435761L, lit(nUsers)).as("dst"))
          val nodes = edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node"))).distinct()
          graft.graph.Scc.components(spark, nodes, edges,
            driverNodeThreshold = 0L, driverEdgeThreshold = 0L)
        }),
        // force the DISTRIBUTED seeded-walk loop (driverThreshold 0) on
        // the user graph — the scale path the q241 driver twin dispatches
        // away from; nodes/edges grow with n
        "ppr_distributed" -> (() => sink {
          val nUsers = math.max(2L, n / 100)
          val edges = events.filter(col("event_id") % 5 === 0)
            .select(col("user_id").as("src"),
              pmod(col("event_id") * 2654435761L, lit(nUsers)).as("dst"))
          val nodes = edges.select(col("src").as("node"))
            .union(edges.select(col("dst").as("node"))).distinct()
          graft.graph.Walks.personalizedPageRank(spark, nodes, edges,
            seed = 0L, damping = 0.85, iters = 5,
            driverThreshold = 0L, edgeThreshold = 0L)
        }),
        // round-8 batch: one conditional trig aggregate at event grain
        "circadian" -> (() => sink(
          graft.events.Circadian.timeOfDayStats(events, "event_type",
            "ts"))),
        // cumulative-LLR window per type over the event grain
        "sprt" -> (() => sink(
          graft.de.Experiment.sprtBernoulli(
            events.select(col("event_type"), col("ts"), col("event_id"),
              when(col("event_id") % 3 === 0, 1).otherwise(0).as("x")),
            "event_type", Seq("ts", "event_id"), "x", 0.30, 0.36))),
        // token-grain first-seen aggregate + doc-grain cumulative fit
        "heaps_law" -> (() => sink(
          CorpusStats.heapsLaw(docs, "source", "doc_id", "text"))),
        // token-grain posexplode + two hash aggregates
        "msttr" -> (() => sink(
          CorpusStats.msttr(docs, "source", "doc_id", "text"))),
        // unit-grain aggregate + 1-row broadcast MoM prior
        "eb_shrinkage" -> (() => sink(
          graft.ml.Scorecard.ebBetaBinomial(
            events.select(col("user_id"),
              when(col("event_type") === "purchase", 1).otherwise(0)
                .as("x")),
            "user_id", "x"))),
        // value-grain split scan (cells bounded by 24 hour buckets)
        "gini_stump" -> (() => sink(
          graft.ml.Stump.giniStump(
            events.select(pmod(col("user_id"), lit(4)).cast("int")
              .as("g"),
              hour(col("ts")).cast("long").as("h"),
              when(col("event_type") === "purchase", 1).otherwise(0)
                .as("t")),
            "g", "h", "t"))),
        // keys grow with n, series length fixed (30-day horizon) —
        // the pairwise stage is per-key-bounded, linear in keys
        "theil_sen_keys" -> (() => sink {
          val daily = events
            .groupBy(pmod(col("user_id"), lit(math.max(2L, n / 1000)))
              .as("k"), to_date(col("ts")).as("d"))
            .agg(count(lit(1)).as("y"))
            .withColumn("x", datediff(col("d"), lit("2024-01-01")))
          graft.de.RobustStats.theilSen(daily, "k", "x", "y",
            maxSeriesRows = 100L)
        }),
        // full-spectrum DFT: keys × 30 × 15 working rows, linear in
        // keys at the fixed series horizon
        "spectral_entropy_keys" -> (() => sink {
          val daily = events
            .groupBy(pmod(col("user_id"), lit(math.max(2L, n / 1000)))
              .as("k"), to_date(col("ts")).as("d"))
            .agg(count(lit(1)).cast("double").as("c"))
          graft.events.Spectral.spectralEntropy(daily, "k", "d", "c")
        }),
        // ---- round-8 session-2 batch (X263-X280) ----
        // one codegen'd char pass per doc, per-source rollup
        "char_entropy" -> (() => sink {
          import graft.functions.gfunctions.char_entropy
          docs.select(col("source"),
              round(char_entropy(col("text")), 6).as("h"))
            .groupBy(col("source"))
            .agg(avg(col("h")), min(col("h")), max(col("h")))
        }),
        // bigram-type hash aggregate + type-bounded margins
        "collocations" -> (() => sink(
          CorpusStats.collocations(docs, "text", minCount = 5L,
            topK = 20))),
        // token explode → vocab-bounded freq-of-freq aggregate
        "good_turing" -> (() => sink(
          CorpusStats.goodTuring(docs, "source", "text"))),
        // four (pair, gram)-grain clip joins, each collapsing at the
        // distinct-gram grain — token-stream-proportional
        "bleu" -> (() => sink {
          val toks = graft.text.TextAnalysis.tokens(col("text"))
          val cut = greatest(lit(1),
            floor(size(toks) * 4 / 5).cast("int"))
          graft.text.Relevance.bleuCorpus(
            docs.select(col("doc_id"), col("text").as("cand"),
              array_join(slice(toks, lit(1), cut), " ").as("ref")),
            "doc_id", "cand", "ref")
        }),
        // 8 fixed Newton steps, each ONE 9-stat narrow aggregate
        "logistic" -> (() => sink(
          graft.ml.Regression.logistic2(
            events.select(
              when(col("event_type") === "purchase", 1.0)
                .otherwise(0.0).as("y"),
              (col("value") / 100).as("x1"),
              (hour(col("ts")) / lit(24.0)).as("x2")),
            "y", "x1", "x2", iters = 8))),
        // one lead window at event grain + bounded driver fixpoint
        "markov_attribution" -> (() => sink(
          graft.events.Attribution.markovRemoval(
            events.select(col("user_id"), col("ts"), col("event_id"),
              col("event_type"),
              when(col("event_type") === "purchase", 1).otherwise(0)
                .as("cv")),
            "user_id", "ts", "event_id", "event_type", "cv",
            iters = 200))),
        // keys grow with n at the fixed 30-day horizon: one lag
        // window + exact per-key percentile + broadcast tail join
        "expected_shortfall" -> (() => sink {
          val daily = events
            .groupBy(pmod(col("user_id"), lit(math.max(2L, n / 1000)))
              .as("k"), to_date(col("ts")).as("d"))
            .agg(count(lit(1)).as("q"))
          graft.events.Finance.expectedShortfall(daily, "k", "d", "q")
        }),
        // same frame: split windows + two conditional aggregates
        "mase" -> (() => sink {
          val daily = events
            .groupBy(pmod(col("user_id"), lit(math.max(2L, n / 1000)))
              .as("k"), to_date(col("ts")).as("d"))
            .agg(count(lit(1)).as("q"))
          graft.events.Backtest.maseSplit(daily, "k", "d", "q",
            season = 7)
        }),
        // one shuffle-free kernel scan (two-row-DP LCS per pair)
        "rouge_l" -> (() => sink {
          val toks = graft.text.TextAnalysis.tokens(col("text"))
          val cut = greatest(lit(1),
            floor(size(toks) * 4 / 5).cast("int"))
          graft.text.Relevance.rougeL(
            docs.select(col("doc_id"), col("text").as("cand"),
              array_join(slice(toks, lit(1), cut), " ").as("ref")),
            "doc_id", "cand", "ref")
        }),
        // one rank window over the calibration half + one aggregate
        "conformal" -> (() => sink(
          graft.ml.Conformal.splitConformal(
            events.select(col("event_id").as("id"),
              col("value").as("y"),
              (col("user_id") % 100).cast("double").as("pred"),
              pmod(col("event_id"), lit(2)).cast("int").as("cal")),
            "id", "y", "pred", "cal"))),
        // two rank windows + clamp + t-tail, all (stratum, group)-keyed
        "yuen" -> (() => sink(
          graft.de.Inference.yuenTrimmed(
            events.select((col("user_id") % 8).as("st"),
              col("event_type"), col("value")),
            "st", "event_type", "value", a = "click", b = "view"))),
        // one exact grand median + one 2xk aggregate
        "mood_median" -> (() => sink(
          graft.de.Inference.moodMedian(
            events.filter(col("value").isNotNull),
            "event_type", "value"))),
        // logistic fit (8 narrow aggregates) + ntile + bin aggregate
        "hosmer_lemeshow" -> (() => sink {
          val scored = graft.ml.Regression.logisticScore(
            events.filter(col("value").isNotNull)
              .select(col("event_id"),
                when(col("event_type") === "purchase", 1.0)
                  .otherwise(0.0).as("y"),
                (col("value") / 100).as("x1"),
                (hour(col("ts")) / lit(24.0)).as("x2")),
            "y", "x1", "x2")
          graft.ml.Calibration.hosmerLemeshow(scored, "y", "p_hat",
            "event_id")
        }),
        // one cell aggregate + three driver scans over 24 cells
        "stump_boost" -> (() => sink(
          graft.ml.Boost.stumpBoost(
            events.filter(col("value").isNotNull)
              .select(hour(col("ts")).cast("long").as("h"),
                col("value")),
            "h", "value", rounds = 3))),
        // value-cell pivot + k cumulative sums over ONE sort
        "jonckheere" -> (() => sink(
          graft.de.RankStats.jonckheereTerpstra(
            events.select((col("user_id") % 4).cast("string").as("g"),
              col("value")),
            "g", "value", Seq("0", "1", "2", "3")))),
        // doubled-midrank placements over value cells
        "brunner_munzel" -> (() => sink(
          graft.de.RankStats.brunnerMunzel(
            events.select(col("event_type"), col("value")),
            "event_type", "value", a = "click", b = "view"))),
        // vocab-bounded term counts + closed-form margins
        "keyness" -> (() => sink(
          CorpusStats.keyness(docs, "source", "text",
            target = "web", minCount = 5L, topK = 15))),
        // (part, term) cells + per-term share aggregate
        "dispersion" -> (() => sink(
          CorpusStats.dispersionDp(docs, "source", "text",
            minCount = 20L))),
        // (item, category) cells + two bounded aggregates each
        "fleiss_kappa" -> (() => sink(
          graft.de.Agreement.fleissKappa(
            events.select(floor(col("event_id") / 5).cast("long")
              .as("item"), col("event_type")),
            "item", "event_type"))),
        "krippendorff" -> (() => sink(
          graft.de.Agreement.krippendorffAlpha(
            events.select(pmod(col("event_id"),
              lit(math.max(2L, n / 3))).as("item"),
              col("event_type")),
            "item", "event_type"))),
        // md5 window + one aggregate — the composed funnel readout
        "curation_funnel" -> (() => sink {
          import graft.functions.gfunctions.md5_long
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("h")).orderBy(col("doc_id"))
          docs.select(col("source"), col("doc_id"),
              size(TextAnalysis.tokens(col("text"))).as("ntok"),
              md5_long(col("text")).as("h"))
            .withColumn("keep", row_number().over(w) === 1)
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_raw"),
              sum(when(col("keep"), 1L).otherwise(0L)).as("n_unique"),
              sum(when(col("keep"), col("ntok")).otherwise(0L))
                .as("tokens_out"))
        }),
        // subjects collapse to (time, x) cells; 8 Newton steps of one
        // bounded-duration window each
        "cox_ph" -> (() => sink {
          val subj = events.groupBy(col("user_id"))
            .agg(((unix_micros(max(col("ts"))) -
              unix_micros(min(col("ts")))) / 3600000000L).as("dur"),
              max(when(col("event_type") === "error", 1).otherwise(0))
                .as("ev"))
            .withColumn("x", pmod(col("user_id"), lit(5)) / lit(5.0))
          graft.de.Survival.coxPh(subj, "dur", "ev", "x", iters = 8)
        }),
        // ---- round-9/10-touched kernels (new smoke rows) ----
        // bottom-k via orderBy().limit(k) = TakeOrderedAndProject
        // (per-partition heaps + a k-row driver merge) over the
        // distinct-hash domain — the round-9 rewrite away from the
        // unpartitioned full-domain rank window, certified here
        "kmv_set_ops" -> (() => sink(
          graft.sketch.Sketches.kmvSetOps(
            docs.filter(col("doc_id") % 2 === 0).select(col("text")),
            docs.filter(col("doc_id") % 2 === 1).select(col("text")),
            "text", k = 256))),
        // CONTINUOUS (microsecond) durations through the timeBuckets
        // coarsening path: the (time, x) cell domain is pinned at 1000
        // buckets regardless of subject count — without it these
        // durations are all-distinct and the guard (rightly) fails
        "cox_ph_bucketed" -> (() => sink {
          val subj = events.groupBy(col("user_id"))
            .agg((unix_micros(max(col("ts"))) -
              unix_micros(min(col("ts")))).as("dur"),
              max(when(col("event_type") === "error", 1).otherwise(0))
                .as("ev"))
            .withColumn("x", pmod(col("user_id"), lit(5)) / lit(5.0))
          graft.de.Survival.coxPh(subj, "dur", "ev", "x", iters = 4,
            timeBuckets = 1000)
        }),
        // the approx_percentile MAD-probe branch forced on (the path
        // huber2 dispatches to past ExactPercentileMaxGroupRows = 4M):
        // scale estimate from the bounded-memory sketch, then the same
        // IRLS sufficient-stats passes
        "huber_approx" -> (() => sink(
          graft.ml.Regression.huber2(
            events.select(col("value").as("y"),
              (col("user_id") % 100).cast("double").as("x1"),
              (col("event_id") % 7).cast("double").as("x2")),
            "y", "x1", "x2", iters = 4, exactScale = Some(false)))),
        // one sufficient-stats aggregate + source-grain arithmetic:
        // |sources| LOO fits for the price of one pass
        "loo_influence" -> (() => sink(
          graft.ml.Influence.looSourceOls2(
            events.select(col("event_type"),
              round(col("value") * 100).as("y"),
              hour(col("ts")).as("x1"),
              (pmod(dayofweek(col("ts")) + 5, lit(7)) + 1).as("x2")),
            "event_type", "y", "x1", "x2"))),
        // anchor explode linear in tokens; eval side fixed (500 docs,
        // benchmarks don't grow with the corpus); df-capped corpus
        // anchors keep the join candidate-proportional — the planted
        // id%13 duplicates provide real verbatim runs to localize
        "verbatim_spans" -> (() => sink(
          graft.text.Overlap.verbatimSpans(
            docs, "doc_id", "text",
            docs.filter(col("doc_id") < 500)
              .select(col("doc_id").as("eval_id"), col("text")),
            "eval_id", "text", k = 8, maxAnchorDf = 20L))),
        // history = even docs' stored signatures (built OUTSIDE the
        // timed closure — the L32 "history construction is not the
        // operator" rule can't apply here since sigs are cheap, but
        // the measured shape is batch-shingle + band join + agreement)
        "incremental_minhash" -> (() => sink(
          graft.dedup.Dedup.incrementalMinHashDedup(
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
            graft.dedup.Dedup.minhashSignatures(
              docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")))),
        // hyperplane-LSH near-dup with planes following the documented
        // log(corpus) contract (q32 pins planes for its oracle; THIS
        // row is the operator's honest scale shape — expected bucket
        // occupancy held ~constant across the 10x)
        "embedding_dedup" -> (() => sink {
          val nVecs = n / 10
          val planes = math.max(4,
            (math.log(nVecs.toDouble / 256) / math.log(2)).ceil.toInt)
          graft.dedup.Dedup.embeddingDedup(vecs, "vec_id", "embedding",
            dim = 64, minCos = 0.99, tables = 4,
            planesPerTable = planes)
        }))
      val timed = ops
        .filter { case (name, _) => onlyOps.forall(_.contains(name)) }
        .map { case (name, run) =>
          run()                     // warm-up: codegen + parquet footers
          name -> (1 to 2).map(_ => time(run())).min
        }
      n -> timed
    }

    val Seq((n1, t1), (n2, t2)) = results
    val opsJson = t1.zip(t2).map { case ((name, s1), (_, s2)) =>
      f"""{"op": "$name", "sec_1x": $s1%.2f, "sec_10x": $s2%.2f, "factor": ${s2 / s1}%.2f}"""
    }.mkString(", ")
    println(s"""{"llm_scale_smoke": {"base_docs": $n1, "big_docs": $n2, "ops": [$opsJson]}}""")
    spark.stop()
    tmpDirs.foreach { p =>
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
  }
}
