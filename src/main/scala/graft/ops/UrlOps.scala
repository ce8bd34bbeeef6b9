package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + blocklist filtering — the first stage of every
  * web-corpus pipeline (RefinedWeb/C4 shape), and the web-table analog of
  * the reference's id-normalization discipline (catatom2osm/catatom.py
  * cod_mun zero-padding, address.py:42-46 xlink '#' stripping: identify a
  * record by a canonical form of its messy external key before any join).
  *
  * Everything here is a pure column map — regex + array HOFs, no UDFs, no
  * shuffle — so canonicalization runs scan-shaped over 10^12 pages; only
  * the revision collapse (one groupBy on the canonical url) exchanges
  * data, and the blocklist join broadcasts (host blocklists are ~10^5
  * rows, never corpus-sized).
  *
  * Regex discipline (same contract as TextFns.EmailRe): only syntax with
  * identical semantics in Java (Spark) and RE2 (DuckDB) — character
  * classes, anchors, alternation; no backrefs, no lookaround — so every
  * transform is oracle-replayable bit-for-bit.
  */
object UrlOps {

  /** Deterministic messy-URL synthesis (the sandbox has no crawl data):
    * canonical identity comes from `page` (host + path + the one kept
    * query param), presentation noise from `noise` (scheme case, host
    * case, explicit default port, tracking params, fragment). With
    * page = noise = doc_id every URL is unique; with page = doc_id/4 each
    * canonical page appears under 4 noisy spellings — the crawl-dup shape
    * the collapse query needs. */
  def messyUrl(page: Column, noise: Column): Column = {
    val scheme = when(noise % 2 === 0, lit("https")).otherwise(lit("HTTPS"))
    val host = concat(
      when(noise % 3 === 0, lit("H")).otherwise(lit("h")),
      page % 16, lit(".Example"))
    val port = when(noise % 4 === 0, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/Doc/"), page)
    val query = concat(
      lit("?utm_source=s"), noise % 3,
      lit("&id="), page % 7,
      lit("&ref=r"), noise % 2)
    val frag = when(noise % 5 =!= 0, concat(lit("#sec"), noise % 5))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** DuckDB fragment of the same synthesis ([[messyUrl]] parity). */
  def messyUrlSql(page: String, noise: String): String =
    s"""(CASE WHEN ($noise) % 2 = 0 THEN 'https' ELSE 'HTTPS' END || '://' ||
        CASE WHEN ($noise) % 3 = 0 THEN 'H' ELSE 'h' END ||
        CAST(($page) % 16 AS VARCHAR) || '.Example' ||
        CASE WHEN ($noise) % 4 = 0 THEN ':443' ELSE '' END ||
        '/Doc/' || CAST(($page) AS VARCHAR) ||
        '?utm_source=s' || CAST(($noise) % 3 AS VARCHAR) ||
        '&id=' || CAST(($page) % 7 AS VARCHAR) ||
        '&ref=r' || CAST(($noise) % 2 AS VARCHAR) ||
        CASE WHEN ($noise) % 5 <> 0 THEN '#sec' || CAST(($noise) % 5 AS VARCHAR) ELSE '' END)"""
      .linesIterator.map(_.trim).mkString(" ")

  /** Tracking params dropped by canonicalization (utm_* and bare ref). */
  val TrackingParamRe = "^(utm_[^=]*|ref)="

  /** Canonicalize a URL: strip the fragment, lowercase scheme+host (NOT
    * the path — paths are case-sensitive), drop an explicit :443 default
    * port, and remove tracking query params while preserving the relative
    * order of the survivors. Pure narrow expressions end-to-end. */
  def normalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // authority prefix = scheme://host[:port] ; everything after is
    // case-preserved path+query
    val prefix = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]*", 0)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val canonPrefix = regexp_replace(lower(prefix), ":443$", "")
    val path = regexp_extract(rest, "^[^?]*", 0)
    val q = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(q, "&"), p => !p.rlike(TrackingParamRe))
    val qn = array_join(kept, "&")
    concat(canonPrefix, path,
      when(length(qn) > 0, concat(lit("?"), qn)).otherwise(lit("")))
  }

  /** DuckDB CTE chain replaying [[normalize]] over column `u` of relation
    * `rel` (which must also expose doc_id); yields (doc_id, url_norm). */
  def normalizeSql(rel: String): String =
    s"""n1 AS (SELECT doc_id, regexp_replace(u, '#.*$$', '') AS u FROM $rel),
        p AS (SELECT doc_id, u, regexp_extract(u, '^[A-Za-z]+://[^/?#]*') AS pre FROM n1),
        s AS (SELECT doc_id, regexp_replace(lower(pre), ':443$$', '') AS pre2,
                substr(u, length(pre) + 1) AS rest FROM p),
        r AS (SELECT doc_id, pre2, regexp_extract(rest, '^[^?]*') AS path,
                regexp_extract(rest, '\\?(.*)$$', 1) AS q FROM s),
        f AS (SELECT doc_id, pre2 || path ||
                CASE WHEN length(qn) > 0 THEN '?' || qn ELSE '' END AS url_norm
              FROM (SELECT doc_id, pre2, path,
                      array_to_string(list_filter(string_split(q, '&'),
                        x -> NOT regexp_matches(x, '$TrackingParamRe')), '&') AS qn
                    FROM r))"""
      .linesIterator.map(_.trim).mkString(" ")

  /** Hosts filtered out before any further processing (the RefinedWeb
    * blocklist stage). Kept tiny here; at corpus scale the list is ~10^5
    * rows — still broadcast territory. */
  val BlockedHosts: Seq[String] = Seq("h3.example", "h7.example", "h11.example")

  /** Host of an already-normalized URL. */
  def hostOf(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^[a-z]+://([^/:?#]*)", 1)

  /** Host of a RAW (not yet normalized) URL — equal to
    * hostOf(normalize(u)) for EVERY input string: of normalize's steps,
    * only the authority lowercasing touches characters inside the host
    * capture (fragment stripping, :443 removal and tracking-param
    * filtering all act at or after a delimiter — '/', ':', '?', '#' —
    * that the capture class excludes, and a string with no scheme yields
    * "" on both paths), so extract-then-lowercase commutes with
    * normalize-then-extract. A blocklist filter that does not otherwise
    * need the canonical url runs as ONE regex per row instead of the
    * full canonicalization chain (guide §1.2: per-task work). */
  def hostOfRaw(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z]+://([^/:?#]*)", 1))

  /** Blocklist filter + canonical-URL collapse: drop pages on blocked
    * hosts (broadcast anti join — the blocklist is the small side by
    * construction), then keep one survivor per canonical URL (groupBy on
    * url_norm with map-side-combinable min/count — the q_url_latest
    * revision-collapse shape, no window sort). The ONE corpus exchange is
    * the groupBy on the canonical key. */
  def filterAndCollapse(pages: DataFrame, idCol: String, urlNormCol: String): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val blocked = BlockedHosts.toDF("blocked_host")
    pages
      .withColumn("host", hostOf(col(urlNormCol)))
      .join(broadcast(blocked), col("host") === col("blocked_host"), "left_anti")
      .groupBy(col(urlNormCol))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_dups"))
  }

  /** Crawl-frontier politeness scheduling: assign each candidate url a
    * fetch slot so every host is fetched at most once per `delaySec`,
    * higher-priority urls first (ties broken by url for determinism at
    * any parallelism).
    *
    * Reference analog: the reference's per-municipality task sequencing
    * (app.py process_tasks ordering) lifted to the crawl frontier.
    *
    * Shape: ONE exchange on host + a per-host sort (row_number). The
    * per-host sort is not an artifact to engineer away — politeness
    * SERIALIZES a host by design, so a mega-host's frontier (the skew
    * case) is exactly the work that must be ordered; cost is bounded by
    * that host's own frontier size, never the corpus. Returns the
    * frontier + (slot, fetch_ts). */
  def politenessSchedule(frontier: DataFrame, hostCol: String,
      urlCol: String, prioCol: String, startTs: Long,
      delaySec: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol))
      .orderBy(col(prioCol).desc, col(urlCol))
    frontier
      .withColumn("slot", row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_ts", lit(startTs) + col("slot") * delaySec)
  }

  /** Windowed crawl diff: what changed between crawl window 1
    * (`ts ∈ [t0, t1]`) and window 2 (`ts ∈ (t1, t2]`) — per url, the
    * latest revision in each window and a status:
    * `new` (only in w2), `removed` (only in w1), `changed` /
    * `unchanged` (in both, by content key).
    *
    * Reference analog: the two-pass `-d` resume flow (app.py:76-97 —
    * diffing the address layer against the previously exported state);
    * generalized to crawl-over-crawl change detection.
    *
    * Scale shape: ONE exchange total. Both windows' arg-max collapse in a
    * single groupBy(url) using conditional `max(struct(ts, content))`
    * aggregates (max ignores the nulls the window predicate leaves, and
    * ts is the struct's leading field, so this IS windowed arg_max —
    * map-side combinable, unlike a window-function formulation which
    * would sort). No self-join of two snapshot tables, no second scan:
    * at 10^12 revisions the diff costs exactly one url-keyed shuffle of
    * pre-aggregated partials. Rows outside both windows drop at the scan.
    *
    * Returns (url, rev1, rev2, status); `rev1`/`rev2` are the latest
    * in-window content keys (null when absent).
    */
  def crawlDiff(snaps: DataFrame, urlCol: String, tsCol: String,
      contentCol: String, t0: Long, t1: Long, t2: Long): DataFrame = {
    val ts = col(tsCol)
    def latest(cond: Column): Column =
      max(when(cond, struct(ts.as("t"), col(contentCol).as("c"))))("c")
    snaps
      .filter(ts >= t0 && ts <= t2)
      .groupBy(col(urlCol).as("url"))
      .agg(latest(ts <= t1).as("rev1"), latest(ts > t1).as("rev2"))
      .withColumn("status",
        when(col("rev1").isNull, "new")
          .when(col("rev2").isNull, "removed")
          .when(col("rev1") === col("rev2"), "unchanged")
          .otherwise("changed"))
  }

  /** Redirect-chain resolution: given the crawl's redirect edges
    * `(src, dst)` — a FUNCTIONAL graph, at most one outgoing edge per
    * src — resolve every source to its terminal (non-redirecting) target
    * and the number of hops walked. This is the canonicalization step a
    * crawl runs before URL dedup: 301/302 chains collapse so revisions
    * of `a → b → c` all key on `c`. Reference analog: the xlink '#'
    * reference resolution of address.py:42-46 (follow an indirection to
    * the record it names), iterated to a fixpoint.
    *
    * Scale shape: POINTER DOUBLING, not per-hop walking. The state table
    * `(src, cur, hops)` self-joins on `cur = src` each round, so after k
    * rounds every src sees 2^k hops — a 10^6-long spam chain resolves in
    * 20 rounds, and each round is ONE equi-join exchange of constant-width
    * rows (same discipline as Adjacency.connectedComponents, which this
    * operator's directed cousin). Lineage is cut per round
    * (localCheckpoint) so the plan never grows; the moved-row count rides
    * that materialization as an accumulator (no per-round count action —
    * a zero is exact under task retries, a nonzero inflation only buys an
    * idempotent extra round, and the final resolved flag never reads it).
    *
    * CONTRACT: the edge set must be acyclic (real crawlers break redirect
    * loops at fetch time; a loop here would ping-pong forever). The
    * `maxIters` guard bounds the walk at 2^maxIters hops — rows still
    * pointing at a redirecting src after that carry `resolved = false`
    * so a caller can quarantine loop members instead of mis-keying them.
    */
  def resolveRedirects(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // input hygiene, cheap and loud: duplicate (src, dst) rows collapse
    // (a crawl log recording the same redirect twice is benign), but a
    // src with TWO DIFFERENT targets breaks the functional-graph contract
    // — each doubling round would join both branches and multiply state
    // rows 2^round. Refuse it instead of silently corrupting.
    val uniq = edges.select(col("src"), col("dst")).distinct()
    val multi = uniq.groupBy("src").agg(count(lit(1)).as("nout"))
      .filter(col("nout") > 1).limit(5).collect()
    require(multi.isEmpty,
      s"resolveRedirects needs a functional graph (one dst per src); " +
        s"offending srcs: ${multi.map(_.get(0)).mkString(",")}")
    val spark = edges.sparkSession
    var st = uniq.select(col("src"), col("dst").as("cur"), lit(1L).as("hops"))
      .localCheckpoint()
    var live = 1L
    var iter = 0
    while (live > 0 && iter < maxIters) {
      // the moved-count rides the checkpoint materialization as an
      // accumulator (the components-loop idiom: retries can only inflate
      // it, a zero is exact), so no separate count action per round
      val acc = spark.sparkContext.longAccumulator(s"redirects_live_$iter")
      val nxt = {
        val joined = st.as("a").join(
            st.select(col("src").as("b_src"), col("cur").as("b_cur"),
              col("hops").as("b_hops")),
            col("a.cur") === col("b_src"), "left")
          .select(col("a.src"),
            coalesce(col("b_cur"), col("a.cur")).as("cur"),
            (col("a.hops") + coalesce(col("b_hops"), lit(0L))).as("hops"),
            col("b_src").isNotNull.as("moved"))
        val outSchema = org.apache.spark.sql.types.StructType(
          joined.schema.fields.dropRight(1))
        joined.map { r =>
          if (r.getBoolean(3)) acc.add(1L)
          org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2))
        }(org.apache.spark.sql.Encoders.row(outSchema))
          .localCheckpoint()
      }
      // a row that jumped this round might still point at a redirecting
      // src; a row that did NOT jump is terminal (its cur had no entry)
      live = acc.value
      st = nxt
      iter += 1
    }
    // per-row resolution flag: exact even when maxIters cut a loop short —
    // a row is resolved iff its cur no longer redirects (anti the domain)
    val dom = st.select(col("src").as("d_src"))
    st.join(dom, col("cur") === col("d_src"), "left")
      .select(col("src"), col("cur").as("final_dst"), col("hops"),
        col("d_src").isNull.as("resolved"))
  }

  /** Robots-rule compliance: longest-prefix match of each url path
    * against per-host (prefix, allow) rules, REP semantics (RFC 9309
    * §2.2.2: the most specific — longest — matching rule wins; no match =
    * allowed). Matching is TRUE BYTE-prefix (`/priv` matches `/private`,
    * `/admin/` matches `/admin/secret`), not segment-anchored: the rule
    * table broadcasts (robots corpora are ~10^5 hosts × few rules, never
    * page-scaled), so the match is a broadcast HASH join on the host key
    * with `startsWith` refined in the join condition — per-url fan-out is
    * bounded by that host's own rule count, and the page side stays
    * scan-shaped. The winner per url is max(struct(len, allow)) — a
    * map-side-combinable argmax, NOT a per-url sort.
    *
    * `urls`: (id, host, path); `rules`: (host, prefix, allow).
    * Returns (id, host, path, matched_prefix|null, allowed). */
  def robotsFilter(urls: DataFrame, rules: DataFrame): DataFrame = {
    urls.join(broadcast(rules),
        urls("host") === rules("host") &&
          col("path").startsWith(col("prefix")),
        "left")
      .select(col("id"), urls("host"), col("path"),
        when(col("prefix").isNotNull,
          struct(length(col("prefix")).as("l"), col("allow").as("allow"),
            col("prefix").as("pfx"))).as("m"))
      .groupBy("id", "host", "path")
      .agg(max("m").as("best"))
      .select(col("id"), col("host"), col("path"),
        col("best.pfx").as("matched_prefix"),
        coalesce(col("best.allow"), lit(true)).as("allowed"))
  }
}
