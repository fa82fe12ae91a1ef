package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, VerifiedQuery}

/** URL canonicalization — the crawl-dedup step BEFORE content dedup: the
  * same page is fetched as `HTTPS://Host:443/p/5/?utm_source=feed#top` and
  * `https://host/p/5`, and a corpus that treats those as distinct documents
  * double-counts every re-crawled page. Canonicalize (lowercase scheme/host,
  * drop the default port, strip the fragment, remove `utm_*` tracking
  * params, trim the trailing slash) and aggregate per canonical URL.
  *
  * The synthetic corpus has no URL column, so one is PLANTED
  * deterministically from (source, doc_id) — with the messiness (scheme
  * case, host case, `:443`, trailing `/`, utm params, fragments) cycling on
  * doc_id residues, and the page identity (`doc_id % 50`) coarser than the
  * doc id so multiple raw variants genuinely collide per canonical URL. The
  * oracle replants and re-canonicalizes everything, so a wrong regex step
  * hash-fails.
  *
  * Scale shape: planting + canonicalization are per-row codegen'd scalar
  * regex/string ops; the only shuffle is the final hash-agg on the
  * canonical URL (count-distinct of raw variants partial-aggregates
  * map-side). */
object Url {

  /** Deterministic messy URL from (source, doc_id). The CANONICAL identity
    * depends only on (source, id%3 host, id%10 page, id%2 query) — period
    * 30 per source, so even the 500-doc sf0.001 corpus collapses multiple
    * docs per canonical URL — while the MESSINESS cycles on moduli (4, 5,
    * 7, 8, 9) that vary WITHIN those groups, guaranteeing genuinely
    * distinct raw spellings of the same canonical URL. */
  private[ops] def plantedUrl(source: Column, id: Column): Column = {
    val hostCore = concat(source, id % 3, lit(".example.com"))
    concat(
      when(id % 4 === 0, "HTTPS").otherwise("https"), lit("://"),
      when(id % 9 === 0, upper(hostCore)).otherwise(hostCore),
      when(id % 5 === 0, ":443").otherwise(""),
      lit("/p/"), id % 10,
      when(id % 8 === 0, "/").otherwise(""),
      when(id % 2 === 0, concat(lit("?utm_source=feed&utm_campaign=c"), id % 9, lit("&ref=1")))
        .otherwise(when(id % 11 === 0, "?ref=1").otherwise("")),
      when(id % 7 === 0, concat(lit("#sec"), id % 3)).otherwise(""))
  }

  /** Canonical form: lowercase scheme+host, no :443, no fragment, no
    * utm_* params, no trailing slash. Pure regexp_extract/replace — the
    * identical steps (with DuckDB's 'g' flag) run in the oracle. */
  private[ops] def canonical(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = regexp_replace(hostPort, ":443$", "")
    val rest = regexp_replace(noFrag, "^[A-Za-z]+://[^/?#]+", "")
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = regexp_replace(path0, "(.)/$", "$1")
    val query0 = regexp_extract(rest, "\\?(.*)$", 1)
    val query = regexp_replace(regexp_replace(query0, "utm_[a-z_]+=[^&]*&?", ""), "&$", "")
    concat(scheme, lit("://"), host, path,
      when(query === "", "").otherwise(concat(lit("?"), query)))
  }

  /** Registered query: per canonical URL the document count, the number of
    * DISTINCT raw spellings that collapsed into it, and id audit sums. */
  def urlNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", plantedUrl($"source", $"doc_id").as("url"))
      .select($"doc_id", $"url", canonical($"url").as("canonical_url"))
      .groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"url").as("n_raw_variants"),
        min($"doc_id").as("min_doc_id"),
        sum($"doc_id").as("id_sum"))
  }

  private val urlNormalizeSql =
    """WITH raw AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 4 = 0 THEN 'HTTPS' ELSE 'https' END) || '://'
      |    || (CASE WHEN doc_id % 9 = 0 THEN upper(source || (doc_id % 3) || '.example.com')
      |             ELSE source || (doc_id % 3) || '.example.com' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      |    || '/p/' || (doc_id % 10)
      |    || (CASE WHEN doc_id % 8 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=c' || (doc_id % 9) || '&ref=1'
      |             WHEN doc_id % 11 = 0 THEN '?ref=1' ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN '#sec' || (doc_id % 3) ELSE '' END) AS url
      |  FROM documents
      |), canon AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) || '://'
      |    || regexp_replace(lower(regexp_extract(nofrag, '^[A-Za-z]+://([^/?#]+)', 1)), ':443$', '')
      |    || regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '(.)/$', '\1')
      |    || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
      |  FROM (
      |    SELECT doc_id, url, nofrag,
      |      regexp_replace(nofrag, '^[A-Za-z]+://[^/?#]+', '') AS rest,
      |      regexp_replace(regexp_replace(
      |        regexp_extract(regexp_replace(nofrag, '^[A-Za-z]+://[^/?#]+', ''), '\?(.*)$', 1),
      |        'utm_[a-z_]+=[^&]*&?', '', 'g'), '&$', '') AS q
      |    FROM (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag FROM raw)
      |  )
      |)
      |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants,
      |       MIN(doc_id) AS min_doc_id, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM canon
      |GROUP BY canonical_url""".stripMargin

  /** Survivorship (golden record) over the canonical-URL clusters: when
    * re-crawls of the same page collapse under [[canonical]], ONE record
    * must survive — deterministically the longest text, ties to the
    * smallest doc_id (the MDM survivorship rule, with provenance: how many
    * records merged, which sources contributed). One row_number window
    * over the cluster key + one agg — both shuffle on the canonical URL.
    */
  def urlSurvivorship(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", length($"text").as("text_len"),
        canonical(plantedUrl($"source", $"doc_id")).as("canonical_url"))
    val ranked = docs.withColumn("rn", row_number().over(
      Window.partitionBy($"canonical_url")
        .orderBy($"text_len".desc, $"doc_id")))
    val survivors = ranked.filter($"rn" === 1)
      .select($"canonical_url", $"doc_id".as("survivor_id"),
        $"text_len".as("survivor_len"))
    val provenance = docs.groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_merged"),
        array_join(array_sort(collect_set($"source")), ",").as("sources"),
        sum($"doc_id").as("id_sum"))
    survivors.join(provenance, Seq("canonical_url"))
  }

  private val urlSurvivorshipSql =
    """WITH raw AS (
      |  SELECT doc_id, source, len(text) AS text_len,
      |    (CASE WHEN doc_id % 4 = 0 THEN 'HTTPS' ELSE 'https' END) || '://'
      |    || (CASE WHEN doc_id % 9 = 0 THEN upper(source || (doc_id % 3) || '.example.com')
      |             ELSE source || (doc_id % 3) || '.example.com' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      |    || '/p/' || (doc_id % 10)
      |    || (CASE WHEN doc_id % 8 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=c' || (doc_id % 9) || '&ref=1'
      |             WHEN doc_id % 11 = 0 THEN '?ref=1' ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN '#sec' || (doc_id % 3) ELSE '' END) AS url
      |  FROM documents
      |), canon AS (
      |  SELECT doc_id, source, text_len,
      |    lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) || '://'
      |    || regexp_replace(lower(regexp_extract(nofrag, '^[A-Za-z]+://([^/?#]+)', 1)), ':443$', '')
      |    || regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '(.)/$', '\1')
      |    || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
      |  FROM (
      |    SELECT doc_id, source, text_len, nofrag,
      |      regexp_replace(nofrag, '^[A-Za-z]+://[^/?#]+', '') AS rest,
      |      regexp_replace(regexp_replace(
      |        regexp_extract(regexp_replace(nofrag, '^[A-Za-z]+://[^/?#]+', ''), '\?(.*)$', 1),
      |        'utm_[a-z_]+=[^&]*&?', '', 'g'), '&$', '') AS q
      |    FROM (SELECT doc_id, source, text_len, regexp_replace(url, '#.*$', '') AS nofrag FROM raw)
      |  )
      |), ranked AS (
      |  SELECT doc_id, source, text_len, canonical_url,
      |         row_number() OVER (PARTITION BY canonical_url
      |                            ORDER BY text_len DESC, doc_id) AS rn
      |  FROM canon
      |)
      |SELECT c.canonical_url,
      |       MAX(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
      |       MAX(CASE WHEN rn = 1 THEN text_len END) AS survivor_len,
      |       CAST(COUNT(*) AS BIGINT) AS n_merged,
      |       string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
      |       CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM ranked c
      |GROUP BY c.canonical_url""".stripMargin

  val all: Seq[VerifiedQuery] = Seq(
    VerifiedQuery("q_url_normalize", urlNormalize, Some(urlNormalizeSql)),
    VerifiedQuery("q_url_survivorship", urlSurvivorship, Some(urlSurvivorshipSql)),
  )
}
