package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recommendation-cache semantics (SURVEY §2.14;
  * `Website/market/customers/views.py:188-236`): the reference keeps one
  * cache row per household `(recommendations, alpha, rules_version)` where
  * `rules_version` is the rule table's `MAX(created_at)` (the probe gated
  * as q_max_version_probe), and recomputes a household's recommendations
  * iff the request pins alpha explicitly, the cache row is missing, the
  * cached alpha differs, or the cached rules_version is stale — then
  * upserts (`update_or_create`) the refreshed row.
  *
  * Spark-first: the reference decides per HTTP request; here the whole
  * decision + upsert is set-oriented over a batch of requests — a left
  * join against the cache, the one-row latest-version frame broadcast,
  * and an anti-join + union for the upsert. No driver-side loops; every
  * join keys on the household, so at 100 TB the cache table shuffles on
  * its key once per refresh batch. (The reference's alpha-bounds
  * fallback, `views.py:193-198`, is request parsing, not cache
  * semantics, and stays with the caller.)
  */
object RecCache {

  /** The per-request refresh decision (`views.py:203-211`).
    *
    * `requests`: (`household`, `alpha`, `alpha_explicit`) — one row per
    * household being served; `alpha_explicit` mirrors `"alpha" in
    * request.GET`, which forces recomputation even on a fresh cache.
    * `cache`: (`household`, `alpha`, `rules_version`, `payload`).
    * `latestVersion`: one row, column `latest_version` (the
    * q_max_version_probe result).
    *
    * Returns the requests with cached state attached and a `recalculate`
    * flag: `alpha_explicit OR no-cache-row OR cached-alpha ≠ requested
    * OR cached-version ≠ latest`. */
  def refreshDecisions(requests: DataFrame, cache: DataFrame,
                       latestVersion: DataFrame): DataFrame = {
    val c = cache.select(col("household"),
      col("alpha").as("cached_alpha"),
      col("rules_version").as("cached_version"),
      col("payload").as("cached_payload"))
    requests.join(c, Seq("household"), "left_outer")
      .crossJoin(broadcast(latestVersion))
      .withColumn("recalculate",
        col("alpha_explicit") || col("cached_alpha").isNull ||
          col("cached_alpha") =!= col("alpha") ||
          col("cached_version") =!= col("latest_version"))
  }

  /** The `update_or_create` step (`views.py:215-223`) over a decision
    * batch: households flagged `recalculate` get a fresh row at the
    * requested alpha and the latest rules version carrying
    * `freshPayload`; every other cache row (including households not in
    * the request batch at all) is kept untouched. Returns the refreshed
    * cache state with the same schema as `cache`. */
  def refreshedCache(cache: DataFrame, decisions: DataFrame,
                     freshPayload: Column): DataFrame =
    upsert(cache, decisions.where(col("recalculate"))
      .select(col("household"), col("alpha"),
        col("latest_version").as("rules_version"),
        freshPayload.as("payload")))

  /** [[refreshedCache]] with per-household payloads: `freshPayloads` is
    * (`household`, `payload`) — typically the recomputed recommendation
    * lists serialized to JSON; households recalculated but absent from
    * it cache an empty list, mirroring the reference's behavior when the
    * generator returns nothing for a household. */
  def refreshedCacheWith(cache: DataFrame, decisions: DataFrame,
                         freshPayloads: DataFrame): DataFrame =
    upsert(cache, decisions.where(col("recalculate"))
      .join(freshPayloads, Seq("household"), "left_outer")
      .select(col("household"), col("alpha"),
        col("latest_version").as("rules_version"),
        coalesce(col("payload"), lit("[]")).as("payload")))

  private def upsert(cache: DataFrame, fresh: DataFrame): DataFrame =
    cache
      .join(fresh.select(col("household")), Seq("household"), "left_anti")
      .select(col("household"), col("alpha"), col("rules_version"),
        col("payload"))
      .unionByName(fresh)
}
