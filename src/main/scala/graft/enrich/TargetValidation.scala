package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.gfunctions.is_valid_symbol

/** Target validation against offline Ensembl/OpenTargets snapshots
  * (S6/S7, J7, A13, A16, F6/F7; `pipeline2.py:829-1021`).
  *
  * The reference's N+1 synchronous HTTP loop becomes two left-outer
  * broadcast joins with identical miss semantics (zero-filled metrics,
  * `pipeline2.py:1002-1009`). The snapshot keeps the GraphQL result shape
  * (FIXTURES.md §3) so an online `mapPartitions` connector could slot in
  * without schema change.
  */
object TargetValidation {

  /** OpenTargets GraphQL response shape (`pipeline2.py:883-910`). */
  val openTargetsSchema: StructType = StructType.fromDDL(
    """ensembl_id STRING, approvedSymbol STRING, biotype STRING,
      |knownDrugs STRUCT<count: BIGINT,
      |  rows: ARRAY<STRUCT<drug: STRUCT<id: STRING, name: STRING>>>>,
      |associatedDiseases STRUCT<count: BIGINT,
      |  rows: ARRAY<STRUCT<disease: STRUCT<id: STRING, name: STRING>,
      |              score: DOUBLE>>>""".stripMargin)

  def loadOpenTargetsSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(openTargetsSchema).json(path)

  /** Online enrichment connector (the at-scale variant of the snapshot
    * join, S6/S7; the reference's N+1 synchronous HTTP loop at
    * `pipeline2.py:829-942`): per-partition BATCHED, rate-limited
    * lookups through a pluggable fetch function, returning the exact
    * [[openTargetsSchema]] frame — [[validate]] runs unchanged on a
    * snapshot or on this. Zero-egress builds and tests plug an
    * in-memory fetch; a production build plugs the GraphQL client.
    *
    * Shape at scale: one task per partition issues `ceil(rows /
    * batchSize)` calls, sleeping `minIntervalMillis` between batches —
    * the cluster-wide request rate is (parallelism x 1000 /
    * minIntervalMillis), so callers size `ids.repartition(n)` to the
    * service's quota. The fetch returns raw JSON bodies keyed by id;
    * parsing happens declaratively via from_json against the pinned
    * schema, so a response-shape drift fails analysis, not tasks.
    *
    * Miss semantics match the snapshot path exactly: an id absent from
    * the fetch result yields a null body -> null struct columns -> the
    * same zero-filled metrics [[validate]] produces for a snapshot miss
    * (`pipeline2.py:1002-1009`).
    */
  def onlineEnrich(ids: DataFrame, idCol: String,
                   fetch: Seq[String] => Map[String, String],
                   batchSize: Int = 50,
                   minIntervalMillis: Long = 0L): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = ids.sparkSession
    import spark.implicits._
    val fetched = ids.select(col(idCol).cast("string")).na.drop()
      .distinct().as[String]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val bodies = fetch(batch.toSeq)
          if (minIntervalMillis > 0) Thread.sleep(minIntervalMillis)
          batch.iterator.map(id => (id, bodies.get(id).orNull))
        }
      }.toDF("__id", "__body")
    val parsed = from_json(col("__body"), openTargetsSchema)
    fetched.select(
      col("__id").as("ensembl_id"),
      parsed.getField("approvedSymbol").as("approvedSymbol"),
      parsed.getField("biotype").as("biotype"),
      parsed.getField("knownDrugs").as("knownDrugs"),
      parsed.getField("associatedDiseases").as("associatedDiseases"))
  }

  /** (symbol, ensembl_id) csv with header. One row per symbol: real
    * Ensembl snapshots can map a symbol to several ids, and a duplicate
    * would fan out the enrichment left join into multiple final-target
    * rows per gene (the reference's dict lookup holds exactly one
    * mapping) — the minimum id wins, deterministically. */
  def loadEnsemblSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col("symbol"), col("ensembl_id"))
      .groupBy("symbol").agg(min(col("ensembl_id")).as("ensembl_id"))

  /** F7 + §2.6 top-k + J7 + A13 + A16.
    *
    * @param targetScores (gene, composite_score, ...) sorted or not — the
    *                     top-N cut re-sorts deterministically
    * @return (gene, composite_score, num_known_drugs, avg_association_score,
    *         drugability_score) sorted by drugability desc — the
    *         final_targets.csv contract
    */
  def validate(targetScores: DataFrame, ensembl: DataFrame,
               openTargets: DataFrame, topN: Int = 20): DataFrame = {
    val top = targetScores
      .filter(is_valid_symbol(col("gene")))
      .orderBy(col("composite_score").desc, col("gene"))
      .limit(topN)
      .select("gene", "composite_score")

    val withEns = top.join(
      broadcast(ensembl.select(col("symbol"), col("ensembl_id"))),
      top("gene") === col("symbol"), "left").drop("symbol")
    val joined = withEns.join(
      broadcast(openTargets), Seq("ensembl_id"), "left")

    // A13: mean disease-association score over the rows array, 0 if empty
    // (`pipeline2.py:983-985`); null scores are skipped like the reference's
    // `if row.get("score") is not None`.
    val scores = filter(
      col("associatedDiseases.rows"), r => r.getField("score").isNotNull)
    val nScores = coalesce(size(scores), lit(0))
    val avgScore = when(nScores > 0,
      aggregate(scores, lit(0.0), (acc, r) => acc + r.getField("score")) / nScores)
      .otherwise(lit(0.0))
    val nDrugs = coalesce(col("knownDrugs.count"), lit(0L))

    joined
      .withColumn("num_known_drugs", nDrugs)
      .withColumn("__avg", avgScore)
      .withColumn("avg_association_score", round(col("__avg"), 3))
      // A16: drugability from the UNrounded average, then rounded — the
      // reference's exact arithmetic order (`pipeline2.py:988-998`).
      .withColumn("drugability_score",
        round(nDrugs * 0.6 + col("__avg") * 0.4, 3))
      .select("gene", "composite_score", "num_known_drugs",
        "avg_association_score", "drugability_score")
      .orderBy(col("drugability_score").desc, col("gene"))
  }
}
