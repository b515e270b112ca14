package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full advanced semantic-search workload: every query text
  * from test_advanced_chromadb_queries.py, by category, with the reference's
  * per-category result sizes (n_results=3; edge cases use 2 —
  * test_advanced_chromadb_queries.py:79,229).
  *
  * Categories and texts (reference file:line):
  *   temperature     :62-75    (8 queries)
  *   geographic      :88-107   (11)
  *   salinity        :120-139  (11)
  *   temporal        :147-166  (11)
  *   depth           :174-193  (11)
  *   edge_case       :201-220  (11)
  *   multi_parameter :228-245  (10)
  *   negation        :253-260  (6)
  *
  * 79 queries total. The embed stage (E1, deterministic) is pinned by
  * SemanticWorkloadSpec; the ranking stage is DuckDB-oracle-checked by
  * inlining the embedded query vectors — which are pure function output —
  * as SQL literals (see [[oracleSql]]), so the cross-engine hash covers the
  * whole KNN stage over the real workload texts.
  */
object SemanticWorkload {

  /** (category, k, texts) — texts verbatim from the reference. */
  val Categories: Seq[(String, Int, Seq[String])] = Seq(
    ("temperature", 3, Seq(
      "freezing cold Antarctic waters with sub-zero temperatures",
      "tropical warm surface waters above 25 degrees",
      "thermocline temperature gradients and mixing layers",
      "deep ocean cold water masses below 2000 meters",
      "temperature inversion layers in Southern Ocean",
      "warm water intrusion into polar regions",
      "seasonal temperature variability patterns",
      "abyssal temperature anomalies near seafloor")),
    ("geographic", 3, Seq(
      "Southern Ocean circumpolar current measurements",
      "Indian Ocean tropical monsoon influenced waters",
      "Arctic Ocean seasonal ice formation zones",
      "Mediterranean Sea high salinity outflow",
      "western boundary current thermal structure",
      "Antarctic Circumpolar Current frontal zones",
      "equatorial upwelling and productivity regions",
      "coastal upwelling cold water masses",
      "high latitude polar ocean measurements",
      "remote open ocean deep water formation",
      "isolated island effects on water properties")),
    ("salinity", 3, Seq(
      "hypersaline Mediterranean water outflow",
      "low salinity freshwater influence from rivers",
      "intermediate water mass salinity maximum",
      "deep water formation high salinity regions",
      "Antarctic Bottom Water formation and properties",
      "North Atlantic Deep Water characteristics",
      "mode water formation and spreading",
      "oxygen minimum zone water properties",
      "halocline and pycnocline density gradients",
      "thermohaline circulation and overturning",
      "water mass mixing and transformation")),
    ("temporal", 3, Seq(
      "winter cooling and convective mixing events",
      "summer stratification and thermocline development",
      "spring bloom and seasonal productivity cycles",
      "monsoon season oceanographic changes",
      "El Niño Southern Oscillation ocean response",
      "decadal climate variability in ocean temperature",
      "interannual ocean temperature anomalies",
      "long-term ocean warming trends",
      "storm-induced mixing and water column changes",
      "upwelling event intensity and duration",
      "eddy formation and mesoscale circulation")),
    ("depth", 3, Seq(
      "surface mixed layer depth and properties",
      "pycnocline strength and barrier layer formation",
      "intermediate water core depth and spreading",
      "abyssal plain deep water characteristics",
      "high pressure deep ocean water properties",
      "shallow water tidal mixing influences",
      "continental shelf water mass modification",
      "deep ocean trench water column structure",
      "convective overturn and vertical mixing",
      "diapycnal mixing across density surfaces",
      "downwelling and water mass subduction")),
    ("edge_case", 2, Seq(
      "sensor malfunction and data quality issues",
      "extreme pressure measurements near instrument limits",
      "temperature sensor accuracy in cold water",
      "salinity conductivity cell fouling effects",
      "ice formation and freezing point conditions",
      "supersaturated oxygen levels from photosynthesis",
      "density compensation in warm saline water",
      "hydrothermal vent influenced water properties",
      "outlier measurements and statistical anomalies",
      "missing data gaps in time series",
      "calibration drift and instrument bias")),
    ("multi_parameter", 3, Seq(
      "high temperature high salinity Mediterranean water mass with density greater than 1027",
      "cold low salinity Antarctic surface water with temperature below 2 degrees and salinity under 34",
      "deep water formation region with convective mixing temperature 3-5 degrees salinity 34.7-35.0",
      "tropical thermocline water with strong temperature gradient salinity maximum oxygen minimum",
      "frontal zone mixing between warm saline and cold fresh water masses with sharp gradients",
      "mode water formation with uniform temperature salinity over depth range 200-800 meters",
      "upwelling region with cold nutrient-rich water high productivity low oxygen",
      "abyssal water with near-freezing temperature high pressure uniform salinity minimal variability",
      "surface water with extreme heating high evaporation salinity maximum stratification",
      "intermediate water core with salinity maximum temperature minimum spreading laterally")),
    ("negation", 3, Seq(
      "ocean water not influenced by ice formation or melting",
      "measurements without coastal or continental shelf effects",
      "water masses excluding Mediterranean or Red Sea outflow",
      "temperature profiles without thermocline or mixed layer",
      "salinity measurements excluding river discharge influence",
      "deep water not affected by surface processes"))
  )

  /** Flat (query_id, category, k, text). */
  val Queries: Seq[(Long, String, Int, String)] = {
    var id = -1L
    Categories.flatMap { case (cat, k, texts) =>
      texts.map { t => id += 1; (id, cat, k, t) }
    }
  }

  /** Embedding dim for the workload — matches the fixture vector width. */
  val Dim = 64

  /** Same tokenization as the Embed UDF (Embed.scala:50). */
  private[graft] def embedText(text: String): Array[Float] =
    Embed.embedTokens(text.toLowerCase.split("\\s+").toSeq, Dim)

  /** Query frame with the embed stage run through the real E1 UDF:
    * (query_id, category, k, qvec). Tiny (79 rows) — broadcast by topK.
    */
  def queryFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Queries.toDF("query_id", "category", "k", "query_text")
      .withColumn("qvec", Embed.embed(col("query_text"), dim = Dim).cast("array<double>"))
      .select("query_id", "category", "k", "qvec")
  }

  /** DuckDB oracle for the ranking stage. The query vectors are the
    * deterministic output of the embed stage ([[embedText]]) inlined as
    * literals — Double.toString round-trips exactly, so DuckDB parses the
    * same doubles Spark computes and the hash covers the full KNN ranking
    * over the real 79-text workload.
    */
  def oracleSql: String = {
    val values = Queries.map { case (id, cat, k, text) =>
      val vec = embedText(text).map(f => f.toDouble.toString).mkString("[", ", ", "]")
      s"($id, '$cat', $k, $vec::DOUBLE[])"
    }.mkString(",\n           ")
    s"""WITH q(query_id, category, k, qvec) AS (
           VALUES $values),
         scored AS (
           SELECT CAST(q.query_id AS BIGINT) AS query_id, q.category, q.k,
                  e.vec_id, e.label,
                  round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 6) AS sim
           FROM embeddings e, q)
         SELECT query_id, category, vec_id, label, sim, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rank
           FROM scored)
         WHERE rank <= k
         ORDER BY query_id, rank"""
  }
}
