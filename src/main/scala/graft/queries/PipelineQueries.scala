package graft.queries

import graft.Tables
import graft.ops.{AnnCertify, Dedup, Embeddings, Multimodal, Packing, Ranking, Sampling, Selection, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operator queries: dedup family, similarity
  * search, text analysis, multimodal plumbing. SQL-expressible ones get
  * DuckDB oracles; LSH/SimHash/stub ops register rows-only.
  */
object PipelineQueries {

  // ---- dedup ----

  /** Fuzzy value matching over the part-name dictionary: token-blocked
    * levenshtein pairs with support counts — see
    * [[graft.ops.Dedup.fuzzyBlockedPairs]].
    */
  private def dedupFuzzyParts(s: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyBlockedPairs(Tables.part(s, dir), "p_name", maxDist = 3)

  private val dedupFuzzyPartsSql =
    """WITH d AS (SELECT p_name AS name, count(*) AS support
      |           FROM part GROUP BY 1),
      |k AS (SELECT name, support,
      |             'F' || string_split(name, ' ')[1] AS bkey FROM d
      |      UNION ALL
      |      SELECT name, support,
      |             'L' || string_split(name, ' ')[-1] FROM d),
      |p AS (SELECT DISTINCT a.name AS name1, b.name AS name2,
      |             a.support AS support1, b.support AS support2
      |      FROM k a JOIN k b ON a.bkey = b.bkey AND a.name < b.name)
      |SELECT name1, name2, support1, support2,
      |       CAST(levenshtein(name1, name2) AS INT) AS dist
      |FROM p WHERE levenshtein(name1, name2) <= 3""".stripMargin

  /** The same token-blocked value matching under the unrestricted
    * Damerau–Levenshtein metric — transposition typos cost 1, and the
    * emitted (dist_dl, dist_lev) pair isolates exactly them. See
    * [[graft.ops.Dedup.damerauBlockedPairs]].
    */
  private def dedupFuzzyPartsDl(s: SparkSession, dir: String): DataFrame =
    Dedup.damerauBlockedPairs(Tables.part(s, dir), "p_name", maxDist = 3)

  private val dedupFuzzyPartsDlSql =
    """WITH d AS (SELECT p_name AS name, count(*) AS support
      |           FROM part GROUP BY 1),
      |k AS (SELECT name, support,
      |             'F' || string_split(name, ' ')[1] AS bkey FROM d
      |      UNION ALL
      |      SELECT name, support,
      |             'L' || string_split(name, ' ')[-1] FROM d),
      |p AS (SELECT DISTINCT a.name AS name1, b.name AS name2,
      |             a.support AS support1, b.support AS support2
      |      FROM k a JOIN k b ON a.bkey = b.bkey AND a.name < b.name)
      |SELECT name1, name2, support1, support2,
      |       CAST(damerau_levenshtein(name1, name2) AS INT) AS dist_dl,
      |       CAST(levenshtein(name1, name2) AS INT) AS dist_lev
      |FROM p WHERE damerau_levenshtein(name1, name2) <= 3""".stripMargin

  /** End-to-end entity resolution over the part-name dictionary:
    * token-blocked candidate pairs, scored by the native
    * [[graft.functions.JaroWinkler]] at 6dp-rounded ≥ 0.9, clustered
    * by [[graft.ops.Dedup.connectedComponents]], each name labeled
    * with its cluster's canonical (minimum) name and cluster size —
    * the block → score → cluster → canonicalize pipeline every MDM /
    * record-linkage deployment composes from exactly these stages.
    * Every stage is dictionary-bounded; the corpus is touched once by
    * the support count.
    */
  private def erNameClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.call_function
    val dict = graft.data.ScopedCaches.track(
      Tables.part(s, dir).groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("support")))
    val keyed = dict.select(col("name"), explode(array(
      concat(lit("F"), split(col("name"), " ").getItem(0)),
      concat(lit("L"), element_at(split(col("name"), " "), -1))))
      .as("bkey"))
    val k1 = keyed.toDF("name1", "bkey")
    val k2 = keyed.toDF("name2", "bkey2")
    val pairs = k1.join(k2,
        col("bkey") === col("bkey2") && col("name1") < col("name2"))
      .select("name1", "name2").distinct()
      .filter(round(call_function("jaro_winkler",
        col("name1"), col("name2")), 6) >= 0.9)
      .select(col("name1").as("id1"), col("name2").as("id2"))
    val cc = Dedup.connectedComponents(pairs,
      dict.select(col("name").as("id")))
    val sizes = cc.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
    cc.join(dict, cc("id") === dict("name"))
      .join(sizes, "cluster")
      .select(col("name"), col("support"), col("cluster").as("canonical"),
        col("cluster_size"))
  }

  private val erNameClustersSql =
    """WITH RECURSIVE d AS (SELECT p_name AS name,
      |         CAST(count(*) AS BIGINT) AS support FROM part GROUP BY 1),
      |k AS (SELECT name, 'F' || string_split(name, ' ')[1] AS bkey FROM d
      |      UNION ALL
      |      SELECT name, 'L' || string_split(name, ' ')[-1] FROM d),
      |p AS (SELECT DISTINCT a.name AS n1, b.name AS n2
      |      FROM k a JOIN k b ON a.bkey = b.bkey AND a.name < b.name),
      |pj AS (SELECT n1, n2 FROM p
      |       WHERE round(jaro_winkler_similarity(n1, n2), 6) >= 0.9),
      |edges AS (SELECT n1 AS a, n2 AS b FROM pj
      |          UNION SELECT n2 AS a, n1 AS b FROM pj),
      |reach(id, lbl) AS (
      |  SELECT name, name FROM d
      |  UNION
      |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
      |cl AS (SELECT id AS name, min(lbl) AS canonical FROM reach
      |       GROUP BY 1),
      |cs AS (SELECT canonical, CAST(count(*) AS BIGINT) AS cluster_size
      |       FROM cl GROUP BY 1)
      |SELECT cl.name, d.support, cl.canonical, cs.cluster_size
      |FROM cl JOIN d USING (name) JOIN cs USING (canonical)""".stripMargin

  /** Exact-substring (aligned w-gram run) overlap pairs over the
    * document corpus: 8-token grams, stop-grams above df 10 dropped,
    * pairs reported when the longest shared token run reaches 12 —
    * see [[graft.ops.Dedup.substringRuns]].
    */
  private def dedupSubstringRuns(s: SparkSession, dir: String): DataFrame =
    Dedup.substringRuns(Tables.documents(s, dir), "doc_id", "text",
      w = 8, minRunTokens = 12, maxDf = 10)

  private val dedupSubstringRunsSql =
    """WITH toks AS (SELECT doc_id AS id,
      |         string_split_regex(lower(trim(text)), '\s+') AS t
      |       FROM documents),
      |po AS (SELECT id, CAST(i - 1 AS INT) AS pos,
      |         array_to_string(t[i:i+7], ' ') AS gram
      |       FROM (SELECT id, t,
      |               unnest(generate_series(1, len(t) - 7)) AS i
      |             FROM toks WHERE len(t) >= 8) u),
      |stop AS (SELECT gram FROM po GROUP BY gram
      |         HAVING count(DISTINCT id) > 10),
      |live AS (SELECT po.* FROM po ANTI JOIN stop USING (gram)),
      |cand AS (SELECT a.id AS id1, b.id AS id2, a.pos AS pa,
      |                b.pos AS pb, b.pos - a.pos AS delta
      |         FROM live a JOIN live b USING (gram)
      |         WHERE a.id < b.id),
      |isl AS (SELECT id1, id2, delta,
      |          pa - row_number() OVER (PARTITION BY id1, id2, delta
      |            ORDER BY pa) AS grp
      |        FROM cand),
      |runs AS (SELECT id1, id2,
      |           CAST(count(*) + 7 AS BIGINT) AS run_tokens
      |         FROM isl GROUP BY id1, id2, delta, grp)
      |SELECT id1, id2,
      |       CAST(max(run_tokens) AS BIGINT) AS longest_run,
      |       CAST(sum(CASE WHEN run_tokens >= 12 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_runs,
      |       CAST(sum(run_tokens - 7) AS BIGINT) AS aligned_grams
      |FROM runs GROUP BY 1, 2 HAVING max(run_tokens) >= 12""".stripMargin

  /** Sorted-neighborhood blocking over the customer-name dictionary:
    * rank-window candidates + levenshtein verification — the
    * sort-adjacency complement of `dedup_fuzzy_parts`' token blocks.
    * See [[graft.ops.Dedup.sortedNeighborhoodPairs]].
    */
  private def erSortedNeighborhood(s: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(Tables.customer(s, dir), "c_name",
      window = 4, maxDist = 2)

  private val erSortedNeighborhoodSql =
    """WITH d AS (SELECT c_name AS name, CAST(count(*) AS BIGINT)
      |             AS support
      |           FROM customer GROUP BY 1),
      |r AS (SELECT name, support,
      |             row_number() OVER (ORDER BY name) AS rn FROM d)
      |SELECT a.name AS name1, b.name AS name2,
      |       a.support AS support1, b.support AS support2,
      |       CAST(b.rn - a.rn AS INT) AS rank_gap,
      |       CAST(levenshtein(a.name, b.name) AS INT) AS dist
      |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
      |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .select("fp", "keep_id", "dup_cnt")

  private val dedupExactSql =
    """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
      |       min(doc_id) AS keep_id, count(*) AS dup_cnt
      |FROM documents GROUP BY 1""".stripMargin

  /** Per-source exact-dup rate — the crawl-health report every corpus
    * pipeline tracks (a source whose dup rate jumps is re-crawling
    * itself or mirroring another). A doc is a duplicate iff it is not
    * its fingerprint group's canonical (min doc_id, corpus-WIDE — a
    * source holding only mirror copies of another source's canonical
    * counts as fully duplicated). Two aggregations, both map-side
    * combinable; no joins beyond the broadcast-sized group table.
    */
  private def dedupRateBySource(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keep = Dedup.exactGroups(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), lit(1).as("is_keep"))
    docs.select(col("doc_id"), col("source"))
      .join(keep, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_keep").isNull, 1).otherwise(0)).as("n_dups"),
        round(sum(when(col("is_keep").isNull, 1).otherwise(0))
            .cast("double") / count(lit(1)).cast("double") * 1e6)
          .cast("long").as("dup_rate_ppm"))
  }

  private val dedupRateBySourceSql =
    """WITH g AS (
      |  SELECT min(doc_id) AS keep_id
      |  FROM documents
      |  GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))))
      |SELECT d.source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN g.keep_id IS NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_dups,
      |       CAST(round(CAST(sum(CASE WHEN g.keep_id IS NULL THEN 1 ELSE 0 END)
      |               AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000.0)
      |         AS BIGINT) AS dup_rate_ppm
      |FROM documents d LEFT JOIN g ON g.keep_id = d.doc_id
      |GROUP BY d.source""".stripMargin

  /** Corpus-wide duplicate-line removal over a deterministically derived
    * multi-line form of the documents (10-token lines — the synthetic
    * corpus is single-line, and a fixed re-lining keeps the oracle a
    * pure SQL replay). Near-dup template docs share aligned 10-token
    * runs, so the dedup branch is live (~150 removed occurrences at
    * sf0.01).
    */
  private def dedupLines(s: SparkSession, dir: String): DataFrame = {
    val multi = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_join(transform(
          // guarded like dupSpanStats: sequence(1, 0) is DESCENDING [1, 0]
          // in Spark (DuckDB generate_series(1, 0) is empty), so don't let
          // the invariant ride on split() never returning an empty array
          when(size(col("toks")) >= 1,
            sequence(lit(1), ceil(size(col("toks")) / lit(10.0)).cast("int")))
            .otherwise(array()),
          j => array_join(slice(col("toks"), (j - 1) * 10 + 1, lit(10)), " ")),
          "\n").as("text"))
    Dedup.lineDedup(multi, "doc_id", "text", minLen = 8)
  }

  private val dedupLinesSql =
    """WITH b AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS toks
      |           FROM documents),
      |ml AS (SELECT doc_id,
      |         string_agg(array_to_string(
      |           list_slice(toks, (j-1)*10+1, (j-1)*10+10), ' '),
      |           chr(10) ORDER BY j) AS text
      |       FROM (SELECT doc_id, toks,
      |               unnest(generate_series(1,
      |                 CAST(ceil(length(toks)/10.0) AS INT))) AS j
      |             FROM b)
      |       GROUP BY doc_id),
      |l AS (SELECT doc_id, i, ln[i] AS line
      |      FROM (SELECT doc_id, ln,
      |              unnest(generate_series(1, length(ln))) AS i
      |            FROM (SELECT doc_id, string_split(text, chr(10)) AS ln
      |                  FROM ml))),
      |e AS (SELECT doc_id, i, line, length(trim(line)) >= 8 AS elig,
      |        md5(line) AS fp FROM l),
      |k AS (SELECT doc_id, i, line, (NOT elig) OR
      |        row_number() OVER (PARTITION BY fp ORDER BY doc_id, i) = 1
      |          AS keep
      |      FROM e)
      |SELECT doc_id,
      |  coalesce(string_agg(line, chr(10) ORDER BY i) FILTER (WHERE keep),
      |           '') AS text_dedup,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(count(*) - count(*) FILTER (WHERE keep) AS BIGINT)
      |    AS n_removed
      |FROM k GROUP BY doc_id""".stripMargin

  /** Duplicated k-token-span fraction per document (k=12) — the
    * substring-dedup signal of Lee et al. 2022, distributed as a span
    * fingerprint shuffle instead of a suffix array.
    */
  private def dedupSpanStats(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpanStats(Tables.documents(s, dir), "doc_id", "text", k = 12)

  private val dedupSpanStatsSql =
    """WITH b AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS toks
      |           FROM documents),
      |s AS (SELECT doc_id, md5(array_to_string(toks[i:i+11], ' ')) AS fp
      |      FROM (SELECT doc_id, toks,
      |              unnest(generate_series(1, length(toks) - 11)) AS i
      |            FROM b WHERE length(toks) >= 12)),
      |o AS (SELECT fp, count(*) AS occ FROM s GROUP BY 1),
      |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |        CAST(count(*) FILTER (WHERE occ >= 2) AS BIGINT) AS dup_spans
      |      FROM s JOIN o USING (fp) GROUP BY 1)
      |SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
      |  coalesce(dup_spans, 0) AS dup_spans,
      |  round(coalesce(dup_spans * 1.0 / n_spans, 0.0), 6) AS dup_frac
      |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin

  /** Lee et al. span-removal transform at k=12 over the documents table
    * (lowercased-token rebuild; first occurrence of each duplicated
    * span survives).
    */
  private def dedupSpanRemoval(s: SparkSession, dir: String): DataFrame =
    Dedup.spanDedup(Tables.documents(s, dir), "doc_id", "text", k = 12)

  private val dedupSpanRemovalSql =
    """WITH b AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS toks
      |           FROM documents),
      |s AS (SELECT doc_id, i, md5(array_to_string(toks[i:i+11], ' ')) AS fp
      |      FROM (SELECT doc_id, toks,
      |              unnest(generate_series(1, length(toks) - 11)) AS i
      |            FROM b WHERE length(toks) >= 12)),
      |d AS (SELECT doc_id, i,
      |        count(*) OVER (PARTITION BY fp) AS occ,
      |        row_number() OVER (PARTITION BY fp ORDER BY doc_id, i) AS rn
      |      FROM s),
      |dr AS (SELECT DISTINCT doc_id, i + j AS p
      |       FROM (SELECT doc_id, i, unnest(generate_series(0, 11)) AS j
      |             FROM d WHERE occ >= 2 AND rn > 1)),
      |t AS (SELECT doc_id, i AS p, toks[i] AS tok
      |      FROM (SELECT doc_id, toks,
      |              unnest(generate_series(1, length(toks))) AS i FROM b)),
      |kept AS (SELECT t.doc_id, t.p, t.tok
      |         FROM t LEFT JOIN dr ON t.doc_id = dr.doc_id AND t.p = dr.p
      |         WHERE dr.p IS NULL),
      |r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p)
      |        AS text_span_dedup, count(*) AS n_kept
      |      FROM kept GROUP BY 1)
      |SELECT b.doc_id, coalesce(text_span_dedup, '') AS text_span_dedup,
      |  CAST(length(b.toks) AS BIGINT) AS n_tokens,
      |  CAST(length(b.toks) - coalesce(n_kept, 0) AS BIGINT)
      |    AS n_removed_tokens
      |FROM b LEFT JOIN r USING (doc_id)""".stripMargin

  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
      k = 8, dfCap = 20, tau = 0.3)

  private val jaccardPairsSql =
    """WITH t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
      |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
      |       FROM (SELECT doc_id, txt,
      |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
      |             FROM t) u),
      |dfr AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 20),
      |post AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfr USING (s)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY doc_id),
      |common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
      |           FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)
      |SELECT id1, id2,
      |       round(c * 1.0 / (n1.n + n2.n - c), 6) AS jaccard
      |FROM common
      |JOIN sizes n1 ON n1.doc_id = id1
      |JOIN sizes n2 ON n2.doc_id = id2
      |WHERE round(c * 1.0 / (n1.n + n2.n - c), 6) >= 0.3""".stripMargin

  /** Asymmetric containment pairs at τ=0.5 over the same rare-shingle
    * postings as the Jaccard pass — catches a document pasted whole
    * into a larger one, where symmetric Jaccard ≈ |small|/|large| stays
    * under any usable threshold. See
    * [[graft.ops.Dedup.containmentPairs]].
    */
  private def containmentPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
      k = 8, dfCap = 20, tau = 0.5)

  private val containmentPairsSql =
    """WITH t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
      |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
      |       FROM (SELECT doc_id, txt,
      |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
      |             FROM t) u),
      |dfr AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 20),
      |post AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfr USING (s)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY doc_id),
      |common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
      |           FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)
      |SELECT id1, id2,
      |       round(c * 1.0 / n1.n, 6) AS cont1,
      |       round(c * 1.0 / n2.n, 6) AS cont2,
      |       greatest(round(c * 1.0 / n1.n, 6), round(c * 1.0 / n2.n, 6))
      |         AS containment
      |FROM common
      |JOIN sizes n1 ON n1.doc_id = id1
      |JOIN sizes n2 ON n2.doc_id = id2
      |WHERE greatest(round(c * 1.0 / n1.n, 6), round(c * 1.0 / n2.n, 6))
      |      >= 0.5""".stripMargin

  /** Multi-signal near-dup triage: the union of a cheap lexical signal
    * (pairs sharing a min-shingle fingerprint — one groupBy + a join on
    * the sketch value, never a postings×postings stage) and the
    * semantic signal (embedding cosine pairs on the same ids), each
    * pair carrying which signals fired — the review queue a production
    * dedup pipeline hands to its threshold-tuning loop. FULL OUTER on
    * the pair key: agreement is evidence, disagreement is exactly what
    * needs triage. Single-sketch equality is the cheapest candidate
    * generator and inherits its hot buckets (every doc sharing one
    * boilerplate minimum collides); a production triage feeds this
    * from the banded operators ([[Dedup.minhashLshPairs]],
    * `text_winnow_fps`) whose bucket occupancy is controlled.
    */
  private def dedupSignalTriage(s: SparkSession, dir: String): DataFrame = {
    val fp = Dedup.shinglePostings(Tables.documents(s, dir), "doc_id",
        "text", 8)
      .groupBy(col("id")).agg(min(md5(col("s"))).as("fp"))
    val lex = fp.toDF("id1", "fp").join(fp.toDF("id2", "fp"), Seq("fp"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("fp").as("lexical_fp"))
    val c = Similarity.cosinePairs(Tables.embeddings(s, dir), "vec_id",
        "embedding", tau = 0.35)
      .select(col("id1"), col("id2"), col("cosine"))
    lex.join(c, Seq("id1", "id2"), "full_outer")
      .select(col("id1"), col("id2"), col("lexical_fp"), col("cosine"),
        (col("lexical_fp").isNotNull && col("cosine").isNotNull).as("both"))
  }

  /** Scale-SHAPED twin of [[dedupSignalTriage]]: the semantic leg is
    * the BANDED-LSH cosine pairs instead of the exact all-pairs
    * baseline, so every stage of the triage is bucketed — fingerprint
    * equijoin + band-bucket self-join — and the whole signal union
    * replays in the oracle. The registered LSH params are PINNED at
    * the sf0.1 operating point (8 tables × 4 planes + 1 probe, τ=0.45)
    * because that is what makes the leg oracle-replayable; a production
    * deployment re-derives them per corpus via `lshAutoParams` (same
    * caveat as `sim_lsh_cosine_pairs_pinned` — pinned params keep
    * occupancy only at their design corpus size). The exact variant
    * above stays the adjudication baseline.
    */
  private def dedupSignalTriageLsh(s: SparkSession, dir: String): DataFrame = {
    val fp = Dedup.shinglePostings(Tables.documents(s, dir), "doc_id",
        "text", 8)
      .groupBy(col("id")).agg(min(md5(col("s"))).as("fp"))
    val lex = fp.toDF("id1", "fp").join(fp.toDF("id2", "fp"), Seq("fp"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("fp").as("lexical_fp"))
    val c = Similarity.lshCosinePairs(Tables.embeddings(s, dir), "vec_id",
        "embedding", tau = 0.45, dim = 64, numPlanes = 4, tables = 8,
        probes = 1)
      .select(col("id1"), col("id2"), col("cosine"))
    lex.join(c, Seq("id1", "id2"), "full_outer")
      .select(col("id1"), col("id2"), col("lexical_fp"), col("cosine"),
        (col("lexical_fp").isNotNull && col("cosine").isNotNull).as("both"))
  }

  /** PRODUCTION form of the LSH triage: the semantic leg auto-sizes
    * its banding from the corpus count ([[Similarity.lshAutoParams]]
    * via `numPlanes = 0`), so bucket occupancy — and with it the
    * candidate stream — stays constant as the corpus grows, where the
    * pinned twin's frozen (4-plane × 8-table) geometry super-scales
    * past its sf0.1 design point (measured 15.4× at sf1).
    *
    * HASH-GATED since round 10: the oracle composes the count-derived
    * dynamic LSH replay ([[lshAutoOracleSql]] — integer-exact b from
    * the oracle's own `count(*)`, pinned b→L CASE, splitmix64 plane
    * replay) into the same lexical∪semantic full-outer join as the
    * exact and pinned forms. Round 9 rejected this oracle on the
    * assumption that variable-(b, L) banding needs the ≤640-hyperplane
    * constant table INLINED (~200 KB of SQL); replaying the splitmix64
    * plane generator in SQL dissolved that objection — the whole
    * oracle is ~2 KB and covers every reachable geometry.
    */
  private def dedupSignalTriageLshAuto(s: SparkSession,
                                       dir: String): DataFrame = {
    val fp = Dedup.shinglePostings(Tables.documents(s, dir), "doc_id",
        "text", 8)
      .groupBy(col("id")).agg(min(md5(col("s"))).as("fp"))
    val lex = fp.toDF("id1", "fp").join(fp.toDF("id2", "fp"), Seq("fp"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("fp").as("lexical_fp"))
    val c = Similarity.lshCosinePairs(Tables.embeddings(s, dir), "vec_id",
        "embedding", tau = 0.45, dim = 64, numPlanes = 0, probes = 1)
      .select(col("id1"), col("id2"), col("cosine"))
    lex.join(c, Seq("id1", "id2"), "full_outer")
      .select(col("id1"), col("id2"), col("lexical_fp"), col("cosine"),
        (col("lexical_fp").isNotNull && col("cosine").isNotNull).as("both"))
  }

  // lazy: composes the count-derived auto-LSH replay, declared later
  private lazy val dedupSignalTriageLshAutoSql =
    s"""WITH f AS (SELECT * FROM ($minShingleFpSql) fx),
       |j AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
       |             a.min_shingle_fp AS lexical_fp
       |      FROM f a JOIN f b ON a.min_shingle_fp = b.min_shingle_fp
       |                       AND a.doc_id < b.doc_id),
       |c AS (SELECT * FROM ($embLshCosinePairsAutoSql) cx)
       |SELECT coalesce(j.id1, c.id1) AS id1,
       |       coalesce(j.id2, c.id2) AS id2,
       |       j.lexical_fp, c.cosine,
       |       j.lexical_fp IS NOT NULL AND c.cosine IS NOT NULL AS "both"
       |FROM j FULL OUTER JOIN c ON j.id1 = c.id1 AND j.id2 = c.id2""".stripMargin

  // lazy: composes embLshCosinePairsPinnedSql, declared later
  private lazy val dedupSignalTriageLshSql =
    s"""WITH f AS (SELECT * FROM ($minShingleFpSql) fx),
       |j AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
       |             a.min_shingle_fp AS lexical_fp
       |      FROM f a JOIN f b ON a.min_shingle_fp = b.min_shingle_fp
       |                       AND a.doc_id < b.doc_id),
       |c AS (SELECT * FROM ($embLshCosinePairsPinnedSql) cx)
       |SELECT coalesce(j.id1, c.id1) AS id1,
       |       coalesce(j.id2, c.id2) AS id2,
       |       j.lexical_fp, c.cosine,
       |       j.lexical_fp IS NOT NULL AND c.cosine IS NOT NULL AS "both"
       |FROM j FULL OUTER JOIN c ON j.id1 = c.id1 AND j.id2 = c.id2""".stripMargin

  // lazy: composes embCosinePairsSql, declared later in this object
  private lazy val dedupSignalTriageSql =
    s"""WITH f AS (SELECT * FROM ($minShingleFpSql) fx),
       |j AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
       |             a.min_shingle_fp AS lexical_fp
       |      FROM f a JOIN f b ON a.min_shingle_fp = b.min_shingle_fp
       |                       AND a.doc_id < b.doc_id),
       |c AS (SELECT * FROM ($embCosinePairsSql) cx)
       |SELECT coalesce(j.id1, c.id1) AS id1,
       |       coalesce(j.id2, c.id2) AS id2,
       |       j.lexical_fp, c.cosine,
       |       j.lexical_fp IS NOT NULL AND c.cosine IS NOT NULL AS "both"
       |FROM j FULL OUTER JOIN c ON j.id1 = c.id1 AND j.id2 = c.id2""".stripMargin

  /** Near-dup clusters: connected components over the Jaccard pair
    * graph, every doc labeled with its component's minimum doc id. The
    * oracle computes the same components with a recursive CTE (min label
    * over the transitive closure).
    */
  private def jaccardClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardClusters(Tables.documents(s, dir), "doc_id", "text",
      k = 8, dfCap = 20, tau = 0.3)

  private val jaccardClustersSql =
    """WITH RECURSIVE t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
      |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
      |       FROM (SELECT doc_id, txt,
      |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
      |             FROM t) u),
      |dfr AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 20),
      |post AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfr USING (s)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY doc_id),
      |common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
      |           FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2),
      |pairs AS (SELECT id1, id2 FROM common
      |          JOIN sizes n1 ON n1.doc_id = id1
      |          JOIN sizes n2 ON n2.doc_id = id2
      |          WHERE round(c * 1.0 / (n1.n + n2.n - c), 6) >= 0.3),
      |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
      |          UNION SELECT id2 AS a, id1 AS b FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id)
      |SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id""".stripMargin

  /** Near-dup cluster size distribution — the duplication profile of
    * the corpus (how many singletons, pairs, k-clusters), the
    * crawl-health companion to `dedup_rate_by_source`: a fat tail here
    * means template farms or mirror sites upstream. Two aggregations on
    * top of the gated [[Dedup.jaccardClusters]] output — both
    * map-side-combinable, the first bounded by cluster count, the
    * second by the largest cluster size, so the report costs nothing
    * beyond the clustering itself.
    */
  private def dedupClusterSizeDist(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardClusters(Tables.documents(s, dir), "doc_id", "text",
        k = 8, dfCap = 20, tau = 0.3)
      .groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** Leakage-safe split: train/val/test by NEAR-DUP CLUSTER, so a doc
    * and its near-dups never straddle a split boundary
    * ([[Dedup.clusterSafeSplit]]); same fractions as
    * `doc_split_assign`, same clustering as `dedup_jaccard_clusters`.
    * Oracle composes the recursive-CTE components with the md5 band
    * CASE on the cluster label and on the doc id.
    */
  private def dedupClusterSafeSplit(s: SparkSession, dir: String): DataFrame =
    Dedup.clusterSafeSplit(Tables.documents(s, dir), "doc_id", "text",
      splitFractions, k = 8, dfCap = 20, tau = 0.3)

  // lazy: composes splitFractions, declared later in this object
  private lazy val dedupClusterSafeSplitSql = {
    val cuts = splitFractions.init
      .scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    def caseOn(key: String) = splitFractions.init.zip(cuts).map {
      case ((name, _), cut) =>
        s"WHEN md5('split:' || CAST($key AS VARCHAR)) < " +
          s"'${Sampling.hexThreshold(cut)}' THEN '$name'"
    }.mkString("\n    ") + s"\n    ELSE '${splitFractions.last._1}'"
    s"""WITH cl AS ($jaccardClustersSql),
       |sp AS (SELECT doc_id, cluster,
       |         CASE ${caseOn("cluster")} END AS split,
       |         CASE ${caseOn("doc_id")} END AS naive_split
       |       FROM cl)
       |SELECT doc_id, cluster, split, naive_split,
       |       split != naive_split AS naive_leak
       |FROM sp""".stripMargin
  }

  private val dedupClusterSizeDistSql =
    s"""WITH cl AS ($jaccardClustersSql),
       |cs AS (SELECT cluster, count(*) AS cluster_size FROM cl GROUP BY 1)
       |SELECT cluster_size, count(*) AS n_clusters
       |FROM cs GROUP BY 1""".stripMargin

  /** Quality-aware canonical selection — the production form of "which
    * copy survives dedup": per near-dup cluster, keep the
    * highest-quality member (ties: lowest doc_id) instead of the id
    * accident. Composes the two independently gated operators
    * ([[Dedup.jaccardClusters]], [[TextAnalysis.qualityScore]]); the
    * per-cluster argmax is [[Ranking.topKPerKey]] with k=1 — one window
    * pass on the cluster key, no self-join.
    */
  private def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val clusters = Dedup.jaccardClusters(docs, "doc_id", "text")
    val scored = clusters.join(
      docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      Seq("doc_id"))
    Ranking.topKPerKey(scored, Seq("cluster"),
        Seq(col("quality").desc, col("doc_id").asc), k = 1)
      .select(col("cluster"), col("doc_id"), col("quality"))
  }

  // composes the jaccard-clusters recursive CTE verbatim (nested WITH
  // is legal in a DuckDB derived table) + the pinned quality formula
  private lazy val dedupKeepBestSql =
    s"""WITH clu AS (SELECT * FROM ($jaccardClustersSql) c),
       |qb AS (SELECT doc_id, trim(text) AS t,
       |         CAST(greatest(length(trim(text)), 1) AS DOUBLE) AS len,
       |         CAST(greatest(length(string_split_regex(lower(trim(text)),
       |                '\\s+')), 1) AS DOUBLE) AS ntoks
       |       FROM documents),
       |q AS (SELECT doc_id,
       |        round(((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g')))
       |               / len) * 0.5
       |          + (CASE WHEN length(regexp_replace(t, '\\s+', '', 'g'))
       |                  / ntoks BETWEEN 2.0 AND 12.0
       |             THEN 1.0 ELSE 0.0 END) * 0.25
       |          + (CASE WHEN length(t) BETWEEN 50 AND 100000
       |             THEN 1.0 ELSE 0.0 END) * 0.25, 6) AS quality
       |      FROM qb)
       |SELECT cluster, doc_id, quality
       |FROM (SELECT clu.cluster, clu.doc_id, q.quality,
       |        row_number() OVER (PARTITION BY clu.cluster
       |          ORDER BY q.quality DESC, clu.doc_id) AS rn
       |      FROM clu JOIN q USING (doc_id)) t
       |WHERE rn = 1""".stripMargin

  /** Bloom pre-filter over the same reference/batch split as
    * `dedup_against_reference`: the reference fingerprint set becomes
    * 65536 bits × 3 hashes, the batch probes them, and the output
    * pairs the bloom verdict with exact membership — the oracle
    * replays every bit position, so the no-false-negative property is
    * hash-gated, not just spec-asserted. m is sized for the gate
    * scales (1.8% fill at sf0.01, 18% at sf0.1); a production caller
    * sizes m from |reference|.
    */
  private def dedupBloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val fps = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val ref = fps.filter(col("doc_id") % 10 < 8).select("fp").distinct()
    val batch = fps.filter(col("doc_id") % 10 >= 8)
      .unionByName(fps.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("fp")))
    val bits = Sketches.bloomBits(ref, "fp", m = 65536, d = 3)
    Sketches.bloomProbe(batch, "fp", bits, m = 65536, d = 3)
      .join(ref.withColumn("is_ref", lit(true)), Seq("fp"), "left")
      .select(col("doc_id"), col("bloom_maybe"),
        coalesce(col("is_ref"), lit(false)).as("is_ref"))
  }

  private val dedupBloomPrefilterSql =
    """WITH fp AS (SELECT doc_id,
      |              md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |            FROM documents),
      |ref AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 < 8),
      |batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 10 >= 8
      |          UNION ALL
      |          SELECT doc_id + 10000, fp FROM fp WHERE doc_id % 50 = 0),
      |js AS (SELECT unnest(range(3)) AS j),
      |bits AS (SELECT DISTINCT
      |           CAST('0x' || substr(md5(j || ':' || fp), 1, 8) AS BIGINT) % 65536 AS pos
      |         FROM ref CROSS JOIN js),
      |probe AS (SELECT b.doc_id, b.fp, j,
      |            CAST('0x' || substr(md5(j || ':' || fp), 1, 8) AS BIGINT) % 65536 AS pos
      |          FROM batch b CROSS JOIN js),
      |hits AS (SELECT p.doc_id, count(*) AS nhit
      |         FROM probe p JOIN bits ON bits.pos = p.pos
      |         GROUP BY 1)
      |SELECT b.doc_id,
      |       coalesce(h.nhit, 0) = 3 AS bloom_maybe,
      |       r.fp IS NOT NULL AS is_ref
      |FROM batch b
      |LEFT JOIN hits h ON h.doc_id = b.doc_id
      |LEFT JOIN ref r ON r.fp = b.fp""".stripMargin

  /** Snapshot diff — dataset versioning's added/removed/changed/same
    * report between two corpus versions (here: the %10<8 "old" snapshot
    * vs a "new" one that drops %50==3 docs, rewrites the text of
    * %50==7 docs, and adds the %10>=8 docs). One full outer join on
    * the id with fingerprint comparison — at 100 TB both sides reduce
    * to (id, 16-byte fp) projections before the join, and the verdict
    * is a scan-side CASE.
    */
  private def docSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val fps = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val old = fps.filter(col("doc_id") % 10 < 8)
      .select(col("doc_id"), col("fp").as("old_fp"))
    val newer = fps
      .filter(col("doc_id") % 10 >= 8 ||
        (col("doc_id") % 10 < 8 && col("doc_id") % 50 =!= 3))
      .select(col("doc_id"),
        when(col("doc_id") % 50 === 7,
          md5(concat(lit("edited:"), col("fp")))).otherwise(col("fp"))
          .as("new_fp"))
    old.join(newer, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("same").as("verdict"))
  }

  private val docSnapshotDiffSql =
    """WITH fp AS (SELECT doc_id,
      |              md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |            FROM documents),
      |old AS (SELECT doc_id, fp AS old_fp FROM fp WHERE doc_id % 10 < 8),
      |newer AS (SELECT doc_id,
      |            CASE WHEN doc_id % 50 = 7 THEN md5('edited:' || fp)
      |                 ELSE fp END AS new_fp
      |          FROM fp
      |          WHERE doc_id % 10 >= 8
      |             OR (doc_id % 10 < 8 AND doc_id % 50 != 3))
      |SELECT coalesce(old.doc_id, newer.doc_id) AS doc_id,
      |       CASE WHEN old_fp IS NULL THEN 'added'
      |            WHEN new_fp IS NULL THEN 'removed'
      |            WHEN old_fp != new_fp THEN 'changed'
      |            ELSE 'same' END AS verdict
      |FROM old FULL OUTER JOIN newer ON old.doc_id = newer.doc_id""".stripMargin

  private def minhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
      numHashes = 32, bands = 8, k = 8, tau = 0.5)

  /** DuckDB re-derivation of the full MinHash+LSH pipeline: md5-derived
    * 31-bit shingle hashes and the `(a*x + b) mod 2^31-1` permutation
    * family are plain 64-bit arithmetic, so the oracle rebuilds exact
    * signatures from the SAME constants ([[Dedup.minhashConstants]],
    * interpolated into the SQL), bands on the raw 4-value signature
    * slices exactly as the engine does, and verifies candidates with
    * the same exact shingle Jaccard — banding, signatures, and
    * verification are all hash-gated, not just row counts.
    */
  private val minhashLshSql = {
    val vals = Dedup.minhashConstants(32).zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
    s"""WITH cs(j, a, b) AS (VALUES $vals),
       |t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
       |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
       |       FROM (SELECT doc_id, txt,
       |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
       |             FROM t) u),
       |hs AS (SELECT doc_id,
       |         CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) & 2147483647 AS x
       |       FROM sh),
       |sigs AS (SELECT doc_id, j,
       |           min((a * x + b) % ${Dedup.MinhashP}) AS sig
       |         FROM hs CROSS JOIN cs GROUP BY 1, 2),
       |bands AS (SELECT doc_id, j // 4 AS band, list(sig ORDER BY j) AS key
       |          FROM sigs GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (SELECT c.id1, c.id2, count(*) AS cnt
       |           FROM cand c
       |           JOIN sh p1 ON p1.doc_id = c.id1
       |           JOIN sh p2 ON p2.doc_id = c.id2 AND p2.s = p1.s
       |           GROUP BY 1, 2)
       |SELECT id1, id2, round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) AS jaccard
       |FROM common
       |JOIN sizes n1 ON n1.doc_id = id1
       |JOIN sizes n2 ON n2.doc_id = id2
       |WHERE round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) >= 0.5""".stripMargin
  }

  /** Incremental near-dedup of a new shard against the persisted
    * MinHash band store of the accumulated corpus — the daily shape of
    * a continuously-ingesting pipeline (`Dedup.dedupIncrementalBands`).
    * Split mirrors `dedup_against_reference`/`dedup_bloom_prefilter`:
    * the %10<8 docs are the accumulated corpus, the %10>=8 docs plus
    * re-ingested %50==0 clones (id+10000, same text → guaranteed
    * verified matches at every scale) are the shard. The store is
    * derived in-plan here (the oracle sees only the corpus tables);
    * its parquet persistence round-trip is spec-proven
    * (`OpsSpec`, "incremental dedup classifies a shard...").
    */
  private def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val ref = base.filter(col("doc_id") % 10 < 8)
    val shard = base.filter(col("doc_id") % 10 >= 8)
      .unionByName(base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val store = Dedup.minhashBandStore(ref, "doc_id", "text",
      numHashes = 32, bands = 8, k = 8)
    Dedup.dedupIncrementalBands(shard, store, ref, "doc_id", "text",
      numHashes = 32, bands = 8, k = 8, tau = 0.5)
  }

  /** Oracle: the `dedup_minhash_lsh` re-derivation run per side of the
    * split (signatures, band slices, candidate band-equijoin, exact
    * shingle-Jaccard verification), then the per-shard-doc best-match
    * fold — every stage including the store contents is hash-gated.
    */
  /** The CTE chain shared by `dedup_incremental_bands` and
    * `dedup_band_store_merge`: both sides' signatures and band slices,
    * the candidate band-equijoin, and the verified near-dup pairs.
    */
  private val dedupIncrementalCtes = {
    val vals = Dedup.minhashConstants(32).zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
    s"""cs(j, a, b) AS (VALUES $vals),
       |base AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
       |refd AS (SELECT doc_id, txt FROM base WHERE doc_id % 10 < 8),
       |shardd AS (SELECT doc_id, txt FROM base WHERE doc_id % 10 >= 8
       |           UNION ALL
       |           SELECT doc_id + 10000, txt FROM base WHERE doc_id % 50 = 0),
       |shr AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
       |        FROM (SELECT doc_id, txt,
       |                unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
       |              FROM refd) u),
       |shs AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
       |        FROM (SELECT doc_id, txt,
       |                unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
       |              FROM shardd) u),
       |hsr AS (SELECT doc_id,
       |          CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) & 2147483647 AS x
       |        FROM shr),
       |hss AS (SELECT doc_id,
       |          CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) & 2147483647 AS x
       |        FROM shs),
       |sigr AS (SELECT doc_id, j, min((a * x + b) % ${Dedup.MinhashP}) AS sig
       |         FROM hsr CROSS JOIN cs GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, j, min((a * x + b) % ${Dedup.MinhashP}) AS sig
       |         FROM hss CROSS JOIN cs GROUP BY 1, 2),
       |bandr AS (SELECT doc_id, j // 4 AS band, list(sig ORDER BY j) AS key
       |          FROM sigr GROUP BY 1, 2),
       |bands AS (SELECT doc_id, j // 4 AS band, list(sig ORDER BY j) AS key
       |          FROM sigs GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT s.doc_id AS sid, r.doc_id AS rid
       |         FROM bands s JOIN bandr r
       |           ON s.band = r.band AND s.key = r.key),
       |szr AS (SELECT doc_id, count(*) AS n FROM shr GROUP BY 1),
       |szs AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY 1),
       |common AS (SELECT c.sid, c.rid, count(*) AS cnt
       |           FROM cand c
       |           JOIN shs p1 ON p1.doc_id = c.sid
       |           JOIN shr p2 ON p2.doc_id = c.rid AND p2.s = p1.s
       |           GROUP BY 1, 2),
       |ver AS (SELECT sid, rid,
       |          round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) AS jac
       |        FROM common
       |        JOIN szs n1 ON n1.doc_id = sid
       |        JOIN szr n2 ON n2.doc_id = rid
       |        WHERE round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) >= 0.5)""".stripMargin
  }

  private val dedupIncrementalSql =
    s"""WITH $dedupIncrementalCtes,
       |best AS (SELECT sid, rid, jac,
       |           row_number() OVER (PARTITION BY sid
       |             ORDER BY jac DESC, rid) AS rn
       |         FROM ver),
       |agg AS (SELECT sid, count(*) AS nm FROM ver GROUP BY 1)
       |SELECT sd.doc_id,
       |       CAST(coalesce(agg.nm, 0) AS BIGINT) AS n_matches,
       |       CAST(b.rid AS BIGINT) AS best_ref,
       |       b.jac AS best_jaccard,
       |       CASE WHEN agg.nm IS NOT NULL THEN 'near_dup_of_reference'
       |            ELSE 'keep' END AS verdict
       |FROM shardd sd
       |LEFT JOIN agg ON agg.sid = sd.doc_id
       |LEFT JOIN (SELECT sid, rid, jac FROM best WHERE rn = 1) b
       |  ON b.sid = sd.doc_id""".stripMargin

  /** Band-store maintenance after an increment
    * ([[Dedup.bandStoreMerge]]): the kept shard docs' band rows merge
    * into the store; the query emits the merged store's per-band
    * bucket-occupancy histogram — the LSH-table health readout that
    * tells a 100 TB pipeline when band bits need widening (bucket
    * occupancy grows linearly with the corpus at fixed band width).
    * The composed form recomputes the shard signatures the classifier
    * also computed — production reuses one `minhashBandStore` frame
    * for both; here each side is independently hash-gated.
    */
  private def dedupBandStoreMerge(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val ref = base.filter(col("doc_id") % 10 < 8)
    val shard = base.filter(col("doc_id") % 10 >= 8)
      .unionByName(base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    // both band stores are consumed twice (the classifier's candidate
    // join AND the final merge) — tracked caches run each signature
    // job once instead of re-deriving md5 postings + 32-min aggregates
    val store = graft.data.ScopedCaches.track(
      Dedup.minhashBandStore(ref, "doc_id", "text",
        numHashes = 32, bands = 8, k = 8))
    val shardBands = graft.data.ScopedCaches.track(
      Dedup.minhashBandStore(shard, "doc_id", "text",
        numHashes = 32, bands = 8, k = 8))
    val verdicts = Dedup.dedupIncrementalBands(shard, store, ref,
      "doc_id", "text", numHashes = 32, bands = 8, k = 8, tau = 0.5)
    val keep = verdicts.filter(col("verdict") === "keep").select("doc_id")
    Dedup.bandStoreMerge(store, shardBands, keep)
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("band"), col("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"))
  }

  private val dedupBandStoreMergeSql =
    s"""WITH $dedupIncrementalCtes,
       |keepd AS (SELECT doc_id FROM shardd
       |          WHERE doc_id NOT IN (SELECT sid FROM ver)),
       |merged AS (SELECT band, key FROM bandr
       |           UNION ALL
       |           SELECT band, key FROM bands
       |           WHERE doc_id IN (SELECT doc_id FROM keepd)),
       |occ AS (SELECT band, key, CAST(count(*) AS BIGINT) AS bucket_size
       |        FROM merged GROUP BY 1, 2)
       |SELECT CAST(band AS INT) AS band, bucket_size,
       |       CAST(count(*) AS BIGINT) AS n_buckets
       |FROM occ GROUP BY 1, 2""".stripMargin

  private def dedupEditVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.editVerifiedPairs(Tables.documents(s, dir), "doc_id", "text",
      numHashes = 32, bands = 8, k = 8, tau = 0.3, maxDistFrac = 0.3)

  /** Oracle for the edit-distance-verified pairs: the full MinHash
    * re-derivation (same interpolated constants as `dedup_minhash_lsh`,
    * permissive tau=0.3) plus DuckDB's `levenshtein` over the same
    * lower(trim(text)) normalization — both engines run the standard
    * character DP, so the distances, and therefore the verified pair
    * SET, match exactly.
    */
  private val dedupEditVerifiedSql = {
    val vals = Dedup.minhashConstants(32).zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
    s"""WITH cs(j, a, b) AS (VALUES $vals),
       |t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
       |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
       |       FROM (SELECT doc_id, txt,
       |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
       |             FROM t) u),
       |hs AS (SELECT doc_id,
       |         CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) & 2147483647 AS x
       |       FROM sh),
       |sigs AS (SELECT doc_id, j,
       |           min((a * x + b) % ${Dedup.MinhashP}) AS sig
       |         FROM hs CROSS JOIN cs GROUP BY 1, 2),
       |bands AS (SELECT doc_id, j // 4 AS band, list(sig ORDER BY j) AS key
       |          FROM sigs GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (SELECT c.id1, c.id2, count(*) AS cnt
       |           FROM cand c
       |           JOIN sh p1 ON p1.doc_id = c.id1
       |           JOIN sh p2 ON p2.doc_id = c.id2 AND p2.s = p1.s
       |           GROUP BY 1, 2),
       |pairs AS (SELECT id1, id2,
       |            round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) AS jaccard
       |          FROM common
       |          JOIN sizes n1 ON n1.doc_id = id1
       |          JOIN sizes n2 ON n2.doc_id = id2
       |          WHERE round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) >= 0.3)
       |SELECT p.id1, p.id2, p.jaccard,
       |       CAST(levenshtein(t1.txt, t2.txt) AS INT) AS edit_dist,
       |       CAST(greatest(length(t1.txt), length(t2.txt)) AS INT) AS max_len
       |FROM pairs p
       |JOIN t t1 ON t1.doc_id = p.id1
       |JOIN t t2 ON t2.doc_id = p.id2
       |WHERE levenshtein(t1.txt, t2.txt) <=
       |      0.3::DOUBLE * greatest(length(t1.txt), length(t2.txt))""".stripMargin
  }

  private def dedupJwVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.jwVerifiedPairs(Tables.documents(s, dir), "doc_id", "text",
      numHashes = 32, bands = 8, k = 8, tau = 0.3, minSim = 0.9)

  /** Oracle for the Jaro–Winkler-verified pairs: the same MinHash
    * candidate re-derivation as `dedup_edit_verified`, verified with
    * DuckDB's `jaro_winkler_similarity` — byte-level JW with the same
    * window/prefix/boost-threshold parameterization as the native
    * [[graft.functions.JaroWinkler]] kernel, so the 6dp-rounded scores
    * (and therefore the verified pair SET) match.
    */
  private val dedupJwVerifiedSql = {
    val vals = Dedup.minhashConstants(32).zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
    s"""WITH cs(j, a, b) AS (VALUES $vals),
       |t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
       |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
       |       FROM (SELECT doc_id, txt,
       |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
       |             FROM t) u),
       |hs AS (SELECT doc_id,
       |         CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) & 2147483647 AS x
       |       FROM sh),
       |sigs AS (SELECT doc_id, j,
       |           min((a * x + b) % ${Dedup.MinhashP}) AS sig
       |         FROM hs CROSS JOIN cs GROUP BY 1, 2),
       |bands AS (SELECT doc_id, j // 4 AS band, list(sig ORDER BY j) AS key
       |          FROM sigs GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (SELECT c.id1, c.id2, count(*) AS cnt
       |           FROM cand c
       |           JOIN sh p1 ON p1.doc_id = c.id1
       |           JOIN sh p2 ON p2.doc_id = c.id2 AND p2.s = p1.s
       |           GROUP BY 1, 2),
       |pairs AS (SELECT id1, id2,
       |            round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) AS jaccard
       |          FROM common
       |          JOIN sizes n1 ON n1.doc_id = id1
       |          JOIN sizes n2 ON n2.doc_id = id2
       |          WHERE round(cnt * 1.0 / (n1.n + n2.n - cnt), 6) >= 0.3)
       |SELECT p.id1, p.id2, p.jaccard,
       |       round(jaro_winkler_similarity(t1.txt, t2.txt), 6) AS jw
       |FROM pairs p
       |JOIN t t1 ON t1.doc_id = p.id1
       |JOIN t t2 ON t2.doc_id = p.id2
       |WHERE round(jaro_winkler_similarity(t1.txt, t2.txt), 6) >= 0.9""".stripMargin
  }

  private def simhashSigs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashSignatures(Tables.documents(s, dir), "doc_id", "text")

  /** DuckDB re-derivation of the SimHash sketch: md5-derived 60-bit
    * token hashes are engine-portable, so the oracle rebuilds every
    * per-bit +-1 sum and the exact signature — the sketch itself is
    * hash-gated, not just its row count.
    */
  private val simhashSigsSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
      |  FROM documents),
      |th AS (
      |  SELECT doc_id, CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) AS h
      |  FROM toks),
      |bits AS (
      |  SELECT doc_id, b,
      |         sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
      |  FROM th, (SELECT unnest(generate_series(0, 59)) AS b) bs
      |  GROUP BY 1, 2)
      |SELECT doc_id AS id,
      |       CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
      |                     ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits GROUP BY 1""".stripMargin

  private def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxDist = 6)

  /** Pairs oracle: brute-force pairwise Hamming over the re-derived
    * signatures — independently confirms the pigeonhole chunk blocking
    * is lossless at the registered radius.
    */
  private val simhashPairsSql =
    s"""WITH sigs AS ($simhashSigsSql)
      |SELECT a.id AS id1, b.id AS id2,
      |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      |FROM sigs a JOIN sigs b ON a.id < b.id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""".stripMargin

  /** SemDeDup semantic dedup with the `label` column as the semantic
    * cluster (the corpus ships its class partition, so the blocking
    * stage is oracle-reproducible; [[graft.ops.Dedup.semanticDedupKMeans]]
    * is the self-clustering form, gated in OpsSpec). tau 0.32 sits at
    * the p99+ of the synthetic within-label cosine mass — a real
    * near-dup sweep runs at 0.9+ where duplicates are unambiguous.
    */
  private def semanticDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
      "label", tau = 0.32)

  private val semanticDedupSql =
    """WITH d AS (
      |  SELECT b.vec_id AS id, min(a.vec_id) AS dup_of
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
      |                                     b.embedding::DOUBLE[]), 6) >= 0.32
      |  GROUP BY 1)
      |SELECT e.vec_id AS id, CAST(e.label AS BIGINT) AS cluster,
      |       d.dup_of IS NULL AS kept, d.dup_of
      |FROM embeddings e LEFT JOIN d ON d.id = e.vec_id""".stripMargin

  // ---- similarity search ----

  private def embCosinePairs(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding",
      tau = 0.35)

  private val embCosinePairsSql =
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[],
      |                               b.embedding::DOUBLE[]), 6) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
      |                                   b.embedding::DOUBLE[]), 6) >= 0.35""".stripMargin

  /** Fixed-budget bounded twin of [[embCosinePairs]] — the last labeled
    * exact all-pairs baseline without a registered sampled scale form
    * (the LSH path is the production scale form; this is the
    * diagnostic one): the same exact kernel on a deterministic
    * [[graft.ops.Sampling.hashSampleBudget]] shard of ~250 vectors, so
    * the pair stage is O(250²) at ANY corpus size. Same salt as the
    * embedding-diagnostic `_sampled` twins, so all the shard-based
    * diagnostics read the same subsample. The oracle re-derives the
    * md5 threshold from its own count(*) (rate-1 corner uses the
    * all-keep sentinel on both sides).
    */
  private def embCosinePairsSampled(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairs(
      graft.ops.Sampling.hashSampleBudget(Tables.embeddings(s, dir),
        "vec_id", 250L, "shard"),
      "vec_id", "embedding", tau = 0.35)

  private val embCosinePairsSampledSql =
    """WITH sh AS (SELECT * FROM embeddings
      |  WHERE md5('shard:' || CAST(vec_id AS VARCHAR)) <
      |    (SELECT CASE WHEN cnt <= 250 THEN 'ffffffffg'
      |       ELSE printf('%08x', CAST(round(250.0 / cnt * 4294967296.0)
      |         AS BIGINT)) END
      |     FROM (SELECT count(*) AS cnt FROM embeddings)))
      |SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[],
      |                               b.embedding::DOUBLE[]), 6) AS cosine
      |FROM sh a JOIN sh b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
      |                                   b.embedding::DOUBLE[]), 6) >= 0.35""".stripMargin

  /** The scale path for the all-pairs cosine workload: LSH-bucketed
    * candidates (multi-table OR-construction) + exact verification.
    * tau sits at the top of the synthetic embeddings' cosine range
    * (max ~0.5 — the generator plants no near-dup pairs), where 8
    * tables x 4 planes + 1 probe give ~95% recall by the sign-agreement
    * geometry; a real near-dup sweep at tau>=0.8 needs far fewer
    * tables. HASH-GATED since round 10 by the count-derived dynamic
    * oracle ([[lshAutoOracleSql]]): the oracle computes the same
    * (b, L) from its own `count(*)` and replays the full
    * plane→bucket→probe→verify path, so the auto-sizing is no longer a
    * rows-only excuse. The pinned twin below stays as the
    * frozen-geometry baseline; the recall bound vs the exact baseline
    * lives in OpsSpec.
    */
  private def embLshCosinePairs(s: SparkSession, dir: String): DataFrame =
    Similarity.lshCosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding",
      tau = 0.45, dim = 64, numPlanes = 0 /* auto-size from corpus count */,
      probes = 1)

  /** Count-derived DuckDB replay of [[Similarity.lshCosinePairs]] with
    * auto-sized banding (`numPlanes = 0`, `probes = 1`, dim 64) — the
    * oracle that retires the last two count-adaptive rows-only gates.
    * Three pieces make it exact with ZERO cross-engine float risk in
    * the parameter derivation:
    *
    *  1. '''b from the oracle's own count''': `lshAutoParams` computes
    *     bits as the bit length of `ceil(n/128) - 1` (integer, not
    *     floating log2), and DuckDB's `length(bin(m - 1))` is the same
    *     bit length — the two engines CANNOT disagree at a
    *     power-of-two boundary.
    *  2. '''L from a pinned CASE table''': the b→tables map (acos/pow
    *     float math) is evaluated once in Scala
    *     ([[Similarity.lshTablesFor]]) and inlined per b ∈ [4, 20], so
    *     the float path exists on one side only.
    *  3. '''Plane signs by splitmix64 replay''': `LshKernel.planeSign`
    *     is a pure splitmix64 of (planeIdx, j); the SQL replays it in
    *     wrapping 64-bit arithmetic over HUGEINT — multiplies split
    *     into 32-bit halves (`a·c mod 2⁶⁴` =
    *     `lo(a)·c + (hi(a)·lo(c) mod 2³²)·2³² mod 2⁶⁴`), xor-shifts on
    *     BIGINT halves — verified sign-exact for all 640×64
    *     (planeIdx, j) pairs reachable under the (b ≤ 20, L ≤ 32)
    *     caps, and pair-exact vs the engine at geometries (4,8) [n=2k]
    *     and (6,20) [n=6k synthetic].
    *
    * Bucket build, Hamming-1 probe posting, bucket self-join, and
    * exact-cosine verification then mirror the proven pinned-twin SQL
    * with variable (b, L).
    */
  private def lshAutoOracleSql(tau: Double): String = {
    val k1 = BigInt("9E3779B97F4A7C15", 16)
    val k2 = BigInt("BF58476D1CE4E5B9", 16)
    val k3 = BigInt("94D049BB133111EB", 16)
    val p32 = BigInt(1) << 32
    val p64 = BigInt(1) << 64
    // wrapping 64-bit multiply of u64 x by constant c, in HUGEINT
    def wmul(x: String, c: BigInt): String =
      s"((($x) % $p32) * $c + ((($x) // $p32) * ${c % p32} % $p32) * $p32) % $p64"
    // x XOR (x >>> k) for u64 x, via BIGINT xor on 32-bit halves
    def xsh(x: String, k: Int): String = {
      val p2 = BigInt(1) << k
      s"(xor(CAST(($x) // $p32 AS BIGINT), " +
        s"CAST((($x) // $p2) // $p32 AS BIGINT))::HUGEINT * $p32 + " +
        s"xor(CAST(($x) % $p32 AS BIGINT), " +
        s"CAST((($x) // $p2) % $p32 AS BIGINT))::HUGEINT)"
    }
    val lcase = (4 to 20)
      .map(b => s"WHEN $b THEN ${Similarity.lshTablesFor(b, tau)}")
      .mkString(" ")
    val bexpr =
      "least(20, greatest(4, CAST(length(bin((count(*) + 127) // 128 - 1)) AS INT)))"
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |prm AS (SELECT $bexpr AS b,
       |          CASE $bexpr $lcase END AS L
       |        FROM v),
       |grid AS (SELECT a.pi, b.j
       |         FROM generate_series(0, 639) a(pi)
       |         CROSS JOIN generate_series(0, 63) b(j)
       |         CROSS JOIN prm WHERE a.pi < prm.b * prm.L),
       |g0 AS (SELECT pi, j,
       |        (pi::HUGEINT * $k1 + j::HUGEINT * $k2) % $p64 AS z FROM grid),
       |g1 AS (SELECT pi, j, ${xsh("z", 30)} AS x FROM g0),
       |g2 AS (SELECT pi, j, ${wmul("x", k2)} AS z FROM g1),
       |g3 AS (SELECT pi, j, ${xsh("z", 27)} AS x FROM g2),
       |sg AS (SELECT pi, j, CASE WHEN ${xsh(wmul("x", k3), 31)} % 2 = 0
       |         THEN 1.0 ELSE -1.0 END AS s FROM g3),
       |pl AS (SELECT pi // prm.b AS t, pi % prm.b AS p, list(s ORDER BY j) AS s
       |       FROM sg CROSS JOIN prm GROUP BY 1, 2),
       |proj AS (SELECT id, t, p, list_dot_product(v, s) AS pr
       |         FROM v CROSS JOIN pl),
       |own AS (SELECT id, t,
       |          sum(CASE WHEN pr >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT
       |            AS own
       |        FROM proj GROUP BY id, t),
       |posts AS (SELECT id, t, own AS bucket FROM own
       |          UNION ALL SELECT id, t, xor(own, 1::BIGINT) FROM own),
       |pairs AS (SELECT DISTINCT a.id AS id1, b.id AS id2
       |          FROM posts a JOIN posts b ON a.t = b.t AND a.bucket = b.bucket
       |            AND a.id < b.id)
       |SELECT p.id1, p.id2,
       |       round(list_cosine_similarity(va.v, vb.v), 6) AS cosine
       |FROM pairs p JOIN v va ON va.id = p.id1 JOIN v vb ON vb.id = p.id2
       |WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= $tau""".stripMargin
  }

  private lazy val embLshCosinePairsAutoSql = lshAutoOracleSql(tau = 0.45)

  /** SQL literal for hyperplane `planeIdx` of the shared
    * [[graft.functions.LshKernel]] bit stream, as a DOUBLE[] of ±1:
    * the planes are a deterministic pinned artifact (splitmix of
    * (planeIdx, j), no RNG state), so — like the pinned BPE merge
    * table — an oracle can embed them and replay sign-random-projection
    * bucketing exactly.
    */
  private def planeSqlArray(planeIdx: Int, dim: Int): String =
    (0 until dim).map(j =>
      if (graft.functions.LshKernel.planeSign(planeIdx, j) > 0) "1.0"
      else "-1.0").mkString("[", ",", "]::DOUBLE[]")

  /** Hash-gated twin of [[embLshCosinePairs]] with the OR-construction
    * pinned at 8 tables x 4 planes + 1 Hamming probe (exactly what the
    * auto-sizer picks at this corpus size, so the gated plan IS the
    * production plan). The oracle replays the whole path — plane signs,
    * per-table bucket ids, probe postings, the bucket self-join, exact
    * cosine verification — so candidate generation itself is
    * hash-checked, not just sampled for recall.
    */
  private def embLshCosinePairsPinned(s: SparkSession, dir: String): DataFrame =
    Similarity.lshCosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding",
      tau = 0.45, dim = 64, numPlanes = 4, tables = 8, probes = 1)

  private val embLshCosinePairsPinnedSql = {
    val vals = (for (t <- 0 until 8; p <- 0 until 4)
      yield s"($t,$p,${planeSqlArray(t * 4 + p, 64)})").mkString(",\n")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |pl(t, p, s) AS (VALUES
       |$vals),
       |proj AS (SELECT id, t, p, list_dot_product(v, s) AS pr
       |         FROM v CROSS JOIN pl),
       |own AS (SELECT id, t,
       |          sum(CASE WHEN pr >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT
       |            AS own
       |        FROM proj GROUP BY id, t),
       |posts AS (SELECT id, t, own AS bucket FROM own
       |          UNION ALL SELECT id, t, xor(own, 1::BIGINT) FROM own),
       |pairs AS (SELECT DISTINCT a.id AS id1, b.id AS id2
       |          FROM posts a JOIN posts b ON a.t = b.t AND a.bucket = b.bucket
       |            AND a.id < b.id)
       |SELECT p.id1, p.id2,
       |       round(list_cosine_similarity(va.v, vb.v), 6) AS cosine
       |FROM pairs p JOIN v va ON va.id = p.id1 JOIN v vb ON vb.id = p.id2
       |WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= 0.45""".stripMargin
  }

  /** JL random-projection distortion audit, 64 → 16 dims through the
    * pinned ±1 plane family at offset 4096 — see
    * [[graft.ops.Similarity.jlDistortionPairs]].
    */
  private def jlDistortion(s: SparkSession, dir: String): DataFrame =
    Similarity.jlDistortionPairs(Tables.embeddings(s, dir), "vec_id",
      "embedding", dim = 64, targetDim = 16)

  private val jlDistortionSql = {
    val vals = (0 until 16)
      .map(p => s"($p,${planeSqlArray(4096 + p, 64)})").mkString(",\n")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |pl(p, s) AS (VALUES
       |$vals),
       |prj AS (SELECT id, p, list_dot_product(v, s) AS pr
       |        FROM v CROSS JOIN pl),
       |proj AS (SELECT id, list(pr ORDER BY p) AS y FROM prj GROUP BY id),
       |b AS (SELECT v.id, v.v, proj.y FROM v JOIN proj USING (id)),
       |prs AS (SELECT a.id AS id1, c.id AS id2, a.v AS va, c.v AS vb,
       |          a.y AS ya, c.y AS yb
       |        FROM b a JOIN b c ON c.id = a.id + 1),
       |d AS (SELECT id1, id2,
       |        list_dot_product(dv, dv) AS d2o,
       |        list_dot_product(dy, dy) AS d2p
       |      FROM (SELECT id1, id2,
       |              [z[1] - z[2] for z in list_zip(va, vb)] AS dv,
       |              [z[1] - z[2] for z in list_zip(ya, yb)] AS dy
       |            FROM prs) t)
       |SELECT id1, id2, round(d2o, 6) AS d2_orig,
       |       round(d2p / 16.0, 6) AS d2_proj_scaled,
       |       CASE WHEN d2o = 0 THEN NULL
       |            ELSE round((d2p / 16.0) / d2o, 6) END AS distortion
       |FROM d""".stripMargin
  }

  private def annBrute(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)

  private val annBruteSql =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
      |             round(list_cosine_similarity(q.qv::DOUBLE[],
      |                                          e.embedding::DOUBLE[]), 6) AS cosine
      |           FROM q, embeddings e WHERE e.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |      FROM scored) t
      |WHERE rank <= 5""".stripMargin

  /** Hybrid (metadata-filtered) search: top-3 same-label neighbors for
    * 5 query vectors, exact. The label join prunes candidates before
    * any dot product — see [[Similarity.labelFilteredTopK]].
    */
  private def annSameLabel(s: SparkSession, dir: String): DataFrame =
    Similarity.labelFilteredTopK(Tables.embeddings(s, dir), "vec_id",
      "embedding", "label", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 3)

  private val annSameLabelSql =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label
      |           FROM embeddings WHERE vec_id < 5),
      |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
      |             round(list_cosine_similarity(q.qv::DOUBLE[],
      |                                          e.embedding::DOUBLE[]), 6) AS cosine
      |           FROM q JOIN embeddings e
      |             ON e.label = q.label AND e.vec_id <> q.query_id)
      |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |      FROM scored) t
      |WHERE rank <= 3""".stripMargin

  /** The filtered search at scale: the same label constraint enforced
    * inside IVF's probed-cell scan, registered in CERTIFIED form — the
    * query runs the full KMeans-adaptive pipeline and emits
    * [[graft.ops.AnnCertify]]'s deterministic invariant verdicts, which
    * the DuckDB oracle hash-gates (the training itself cannot be
    * replayed in SQL, and the oracle never sees the Spark output, so
    * the trained geometry is checked by certificate instead). OpsSpec
    * additionally pins recall vs [[annSameLabel]]'s exact result.
    */
  private val annQueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  private def annIvfSameLabel(s: SparkSession, dir: String): DataFrame =
    AnnCertify.ivfCertificate(
      Similarity.ivfParts(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryIds = annQueryIds, k = 3, numCells = 8, nProbe = 4,
        maxTrainRows = 100000, labelCol = Some("label")),
      numCells = 8, nProbe = 4)

  private val annIvfSameLabelCertSql =
    AnnCertify.ivfCertificateSql(annQueryIds, numCells = 8, nProbe = 4,
      k = 3)

  /** [[Similarity.ivfTopK]] in certified form — see [[annIvfSameLabel]]
    * for why the adaptive paths gate on invariant verdicts.
    */
  private def annIvf(s: SparkSession, dir: String): DataFrame =
    AnnCertify.ivfCertificate(
      Similarity.ivfParts(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryIds = annQueryIds, k = 5, numCells = 16, nProbe = 4,
        maxTrainRows = 100000, labelCol = None),
      numCells = 16, nProbe = 4)

  private val annIvfCertSql =
    AnnCertify.ivfCertificateSql(annQueryIds, numCells = 16, nProbe = 4,
      k = 5)

  /** Hash-gated twin of [[annIvf]]: same cell count and probe width,
    * but the coarse centroids are pinned to 16 evenly-strided corpus
    * rows instead of KMeans fits, so the oracle replays assignment,
    * probing and re-rank exactly (see [[Similarity.ivfTopKPinned]]).
    */
  private def annIvfPinned(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKPinned(Tables.embeddings(s, dir), "vec_id",
      "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5,
      centroidIds = ivfPinnedCentroids, nProbe = 4)

  /** 16 centroid row ids strided across [0, 466); the embeddings table
    * has ≥500 rows at every SF (500 at sf0.001/sf0.01, 2000 at sf0.1),
    * so every id always resolves. */
  private val ivfPinnedCentroids: Seq[Long] = (0 until 16).map(_ * 31L)

  /** Per-cell simplified silhouette of the pinned IVF coarse quantizer
    * — see [[graft.ops.Similarity.silhouetteByCell]].
    */
  private def silhouetteByCellQ(s: SparkSession, dir: String): DataFrame =
    Similarity.silhouetteByCell(Tables.embeddings(s, dir), "vec_id",
      "embedding", centroidIds = ivfPinnedCentroids)

  private val silhouetteByCellSql = {
    val cids = ivfPinnedCentroids.mkString(", ")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |c AS (SELECT id AS cid, v AS cv FROM v WHERE id IN ($cids)),
       |sc AS (SELECT v.id, c.cid,
       |         round(list_cosine_similarity(v.v, c.cv), 6) AS s
       |       FROM v CROSS JOIN c),
       |r AS (SELECT id, cid, s, row_number() OVER
       |        (PARTITION BY id ORDER BY s DESC, cid ASC) AS rn
       |      FROM sc),
       |t AS (SELECT a.id, a.cid AS cell, a.s AS s0, b.s AS s1
       |      FROM r a JOIN r b ON a.id = b.id AND a.rn = 1 AND b.rn = 2),
       |x AS (SELECT cell,
       |        CAST(round((CASE WHEN (1.0 - s0) = (1.0 - s1) THEN 0.0
       |          ELSE ((1.0 - s1) - (1.0 - s0)) / (1.0 - s1) END) * 1e6)
       |          AS BIGINT) AS si
       |      FROM t)
       |SELECT cell, CAST(count(*) AS BIGINT) AS n_points,
       |       round(CAST(sum(si) AS DOUBLE) / 1e6 / count(*), 6)
       |         AS mean_sil,
       |       CAST(min(si) AS DOUBLE) / 1e6 AS min_sil,
       |       CAST(max(si) AS DOUBLE) / 1e6 AS max_sil
       |FROM x GROUP BY 1""".stripMargin
  }

  private val annIvfPinnedSql = {
    val cids = ivfPinnedCentroids.mkString(", ")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |c AS (SELECT id AS cid, v AS cv FROM v WHERE id IN ($cids)),
       |cs AS (SELECT v.id, c.cid,
       |         round(list_cosine_similarity(v.v, c.cv), 6) AS s
       |       FROM v CROSS JOIN c),
       |assign AS (SELECT id, cid AS cell FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY id ORDER BY s DESC, cid) AS rn FROM cs) t
       |  WHERE rn = 1),
       |probes AS (SELECT id AS query_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY id ORDER BY s DESC, cid) AS rn
       |    FROM cs WHERE id < 5) t
       |  WHERE rn <= 4),
       |cand AS (SELECT p.query_id, a.id AS neighbor_id
       |         FROM probes p JOIN assign a ON a.cell = p.cell
       |         WHERE a.id <> p.query_id),
       |scored AS (SELECT ca.query_id, ca.neighbor_id,
       |             round(list_cosine_similarity(vq.v, vn.v), 6) AS cosine
       |           FROM cand ca JOIN v vq ON vq.id = ca.query_id
       |                        JOIN v vn ON vn.id = ca.neighbor_id)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  /** Recall@5 of the pinned IVF path against the exact brute-force
    * top-5, per query — the accuracy-vs-cost audit number every ANN
    * deployment is sized by, here fully hash-gated because BOTH sides
    * are deterministic replays (the production KMeans path gets the
    * same audit as an OpsSpec recall gate; this registry row keeps the
    * number under the driver's oracle, not just the test suite).
    */
  private def annRecallPinned(s: SparkSession, dir: String): DataFrame = {
    val brute = annBrute(s, dir)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = annIvfPinned(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("hit")).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        round(col("n_hits").cast("double") / lit(5.0), 6).as("recall_at5"))
  }

  private val annRecallPinnedSql =
    s"""WITH brute AS ($annBruteSql),
       |ivf AS ($annIvfPinnedSql),
       |h AS (SELECT b.query_id,
       |        CAST(count(iv.neighbor_id) AS BIGINT) AS n_hits
       |      FROM brute b LEFT JOIN ivf iv
       |        ON iv.query_id = b.query_id
       |       AND iv.neighbor_id = b.neighbor_id
       |      GROUP BY 1)
       |SELECT query_id, n_hits,
       |       round(CAST(n_hits AS DOUBLE) / 5.0, 6) AS recall_at5
       |FROM h""".stripMargin

  /** Hash-gated twin of [[annIvfSameLabel]]: the metadata-filtered IVF
    * search with pinned centroids, so the label-constrained probed-cell
    * scan replays exactly (constraint enforced INSIDE the scan, before
    * any dot product — same shape as the production path).
    */
  private def annIvfFilteredPinned(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKPinned(Tables.embeddings(s, dir), "vec_id",
      "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 3,
      centroidIds = ivfPinnedCentroids, nProbe = 4,
      labelCol = Some("label"))

  private val annIvfFilteredPinnedSql = {
    val cids = ivfPinnedCentroids.mkString(", ")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
       |           FROM embeddings),
       |c AS (SELECT id AS cid, v AS cv FROM v WHERE id IN ($cids)),
       |cs AS (SELECT v.id, c.cid,
       |         round(list_cosine_similarity(v.v, c.cv), 6) AS s
       |       FROM v CROSS JOIN c),
       |assign AS (SELECT id, cid AS cell FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY id ORDER BY s DESC, cid) AS rn FROM cs) t
       |  WHERE rn = 1),
       |probes AS (SELECT id AS query_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY id ORDER BY s DESC, cid) AS rn
       |    FROM cs WHERE id < 5) t
       |  WHERE rn <= 4),
       |cand AS (SELECT p.query_id, a.id AS neighbor_id
       |         FROM probes p JOIN assign a ON a.cell = p.cell
       |         JOIN v vn ON vn.id = a.id
       |         JOIN v vq ON vq.id = p.query_id
       |         WHERE a.id <> p.query_id AND vn.label = vq.label),
       |scored AS (SELECT ca.query_id, ca.neighbor_id,
       |             round(list_cosine_similarity(vq.v, vn.v), 6) AS cosine
       |           FROM cand ca JOIN v vq ON vq.id = ca.query_id
       |                        JOIN v vn ON vn.id = ca.neighbor_id)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM scored) t
       |WHERE rank <= 3""".stripMargin
  }

  /** Hash-gated twin of [[annIvfPq]] (IVFADC plumbing: coarse cells +
    * PQ codes + `pq_adc` scan + rerank cutoff + exact re-rank) with both
    * quantizers pinned to corpus rows — see [[Similarity.ivfPqTopKPinned]].
    */
  private def annIvfPqPinned(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopKPinned(Tables.embeddings(s, dir), "vec_id",
      "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5, dim = 64,
      centroidIds = ivfPinnedCentroids, nProbe = 4, m = 8,
      codebookIds = pqPinnedCodebook, rerank = 50)

  /** 16 codebook row ids, a different stride so the codebook is not the
    * centroid set. */
  private val pqPinnedCodebook: Seq[Long] = (0 until 16).map(_ * 29L + 7)

  /** Plain-PQ hash gate: with ONE coarse centroid every row shares the
    * single cell and the query's one probe covers the entire corpus, so
    * [[Similarity.ivfPqTopKPinned]] degenerates to exactly [[annPq]]'s
    * shape — a full-corpus ADC scan + rerank cutoff + exact re-rank —
    * with zero IVF pruning. Same operator, same kernel, same oracle
    * template at nProbe=1/numCells=1.
    */
  private def annPqPinned(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopKPinned(Tables.embeddings(s, dir), "vec_id",
      "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5, dim = 64,
      centroidIds = Seq(0L), nProbe = 1, m = 8,
      codebookIds = pqPinnedCodebook, rerank = 50)

  private val annPqPinnedSql = ivfPqPinnedSqlFor(Seq(0L), nProbe = 1)

  private val annIvfPqPinnedSql =
    ivfPqPinnedSqlFor(ivfPinnedCentroids, nProbe = 4)

  private def ivfPqPinnedSqlFor(centroidIds: Seq[Long],
                                nProbe: Int): String = {
    val cids = centroidIds.mkString(", ")
    val cbids = pqPinnedCodebook.mkString(", ")
    val adcSum = (0 until 8)
      .map(i => s"max(CASE WHEN i=$i THEN t END)").mkString("\n        + ")
    s"""WITH raw AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |             FROM embeddings),
       |v AS (SELECT id, v,
       |        [x / sqrt(list_dot_product(v, v)) for x in v] AS nv
       |      FROM raw),
       |c AS (SELECT id AS cid, v AS cv FROM v WHERE id IN ($cids)),
       |cs AS (SELECT v.id, c.cid,
       |         round(list_cosine_similarity(v.v, c.cv), 6) AS s
       |       FROM v CROSS JOIN c),
       |assign AS (SELECT id, cid AS cell FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY id ORDER BY s DESC, cid) AS rn FROM cs) t
       |  WHERE rn = 1),
       |probes AS (SELECT id AS query_id, cid AS cell FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY id ORDER BY s DESC, cid) AS rn
       |    FROM cs WHERE id < 5) t
       |  WHERE rn <= $nProbe),
       |cb AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cwid, nv
       |       FROM v WHERE id IN ($cbids)),
       |sub AS (SELECT CAST(i AS INT) AS i FROM range(8) t(i)),
       |cw AS (SELECT s.i, cb.cwid, (cb.nv)[s.i*8+1 : s.i*8+8] AS cw
       |       FROM cb CROSS JOIN sub s),
       |rowsub AS (SELECT v.id, s.i, (v.nv)[s.i*8+1 : s.i*8+8] AS sv
       |           FROM v CROSS JOIN sub s),
       |codescored AS (SELECT id, i, cwid,
       |    list_dot_product(d, d) AS s FROM (
       |    SELECT r.id, r.i, w.cwid,
       |      [z[1] - z[2] for z in list_zip(r.sv, w.cw)] AS d
       |    FROM rowsub r JOIN cw w ON w.i = r.i) t),
       |codepick AS (SELECT id, i, cwid FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY id, i ORDER BY s, cwid) AS rn
       |    FROM codescored) t WHERE rn = 1),
       |cand AS (SELECT p.query_id, a.id
       |         FROM probes p JOIN assign a ON a.cell = p.cell
       |         WHERE a.id <> p.query_id),
       |terms AS (SELECT ca.query_id, ca.id, cp.i,
       |            list_dot_product((qn.nv)[cp.i*8+1 : cp.i*8+8], w.cw) AS t
       |          FROM cand ca JOIN codepick cp ON cp.id = ca.id
       |               JOIN cw w ON w.i = cp.i AND w.cwid = cp.cwid
       |               JOIN v qn ON qn.id = ca.query_id),
       |approx AS (SELECT query_id, id,
       |    round($adcSum, 6) AS a
       |  FROM terms GROUP BY query_id, id),
       |shortlist AS (SELECT query_id, id AS neighbor_id FROM (
       |    SELECT *, row_number() OVER
       |      (PARTITION BY query_id ORDER BY a DESC, id) AS arank
       |    FROM approx) t WHERE arank <= 50),
       |scored AS (SELECT sl.query_id, sl.neighbor_id,
       |             round(list_cosine_similarity(vq.v, vn.v), 6) AS cosine
       |           FROM shortlist sl JOIN v vq ON vq.id = sl.query_id
       |                            JOIN v vn ON vn.id = sl.neighbor_id)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  /** [[Similarity.pqTopK]] in certified form — see [[annIvfSameLabel]]
    * for why the adaptive paths gate on invariant verdicts.
    */
  private def annPq(s: SparkSession, dir: String): DataFrame =
    AnnCertify.pqCertificate(
      Similarity.pqParts(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryIds = annQueryIds, k = 5, dim = 64, m = 8,
        ksub = 16, rerank = 50, maxTrainRows = 100000),
      m = 8, ksub = 16, nProbe = 0)

  private val annPqCertSql =
    AnnCertify.pqCertificateSql(annQueryIds, m = 8, ksub = 16, rerank = 50,
      k = 5)

  /** [[Similarity.ivfPqTopK]] in certified form — see
    * [[annIvfSameLabel]] for why the adaptive paths gate on invariant
    * verdicts.
    */
  private def annIvfPq(s: SparkSession, dir: String): DataFrame =
    AnnCertify.pqCertificate(
      Similarity.ivfPqParts(Tables.embeddings(s, dir), "vec_id",
        "embedding", queryIds = annQueryIds, k = 5, dim = 64, numCells = 16,
        nProbe = 4, m = 8, ksub = 16, rerank = 50, maxTrainRows = 100000),
      m = 8, ksub = 16, nProbe = 4, numCells = Some(16))

  private val annIvfPqCertSql =
    AnnCertify.ivfPqCertificateSql(annQueryIds, numCells = 16, nProbe = 4,
      m = 8, ksub = 16, rerank = 50, k = 5)

  /** Multi-probe LSH top-k. Fully hash-gated: planes are the pinned
    * [[graft.functions.LshKernel]] artifact, so the oracle replays
    * bucket assignment, the query's own + two Hamming-1 probe buckets,
    * and the in-bucket exact ranking.
    */
  private def annLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5, dim = 64, numPlanes = 4,
      probes = 2)

  private val annLshSql = {
    val vals = (0 until 4).map(p => s"($p,${planeSqlArray(p, 64)})")
      .mkString(",\n")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |pl(p, s) AS (VALUES
       |$vals),
       |own AS (SELECT id,
       |          sum(CASE WHEN list_dot_product(v, s) >= 0
       |              THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS b
       |        FROM v CROSS JOIN pl GROUP BY id),
       |qb AS (SELECT id AS query_id, b FROM own WHERE id < 5),
       |probes AS (SELECT query_id, b AS bucket FROM qb
       |           UNION ALL SELECT query_id, xor(b, 1::BIGINT) FROM qb
       |           UNION ALL SELECT query_id, xor(b, 2::BIGINT) FROM qb),
       |cand AS (SELECT DISTINCT pr.query_id, o.id AS neighbor_id
       |         FROM probes pr JOIN own o ON o.b = pr.bucket
       |         WHERE o.id <> pr.query_id),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |             round(list_cosine_similarity(vq.v, vn.v), 6) AS cosine
       |           FROM cand c JOIN v vq ON vq.id = c.query_id
       |                       JOIN v vn ON vn.id = c.neighbor_id)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  /** Rank-Biased Overlap (p=0.9) of the LSH top-5 ranking against the
    * exact brute-force top-5, per query — the top-weighted ranking-
    * agreement readout beside `sim_ann_recall_pinned`'s flat recall:
    * an ANN list that nails ranks 1–3 scores far above one that only
    * recovers rank 5. Fully hash-gated: both rankings replay in SQL,
    * the depth weights are repeated-multiplication literals (never an
    * engine pow()), and every depth term is ×10⁹-pinned before the
    * cross-depth sum. See [[graft.ops.Ranking.rankBiasedOverlap]].
    */
  private def annRboLsh(s: SparkSession, dir: String): DataFrame =
    graft.ops.Ranking.rankBiasedOverlap(annBrute(s, dir), annLsh(s, dir),
      k = 5, p = 0.9)

  private lazy val annRboLshSql = {
    val (ws, tail) = graft.ops.Ranking.rboWeights(5, 0.9)
    val vals = ws.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
    val oneMinusP = (1.0 - 0.9).toString
    s"""WITH brute AS ($annBruteSql),
       |lsh AS ($annLshSql),
       |la AS (SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS ra
       |       FROM brute WHERE rank <= 5),
       |lb AS (SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rb
       |       FROM lsh WHERE rank <= 5),
       |m AS (SELECT la.query_id, greatest(la.ra, lb.rb) AS mr
       |      FROM la JOIN lb USING (query_id, neighbor_id)),
       |qs AS (SELECT query_id FROM la UNION SELECT query_id FROM lb),
       |depths(d, w) AS (VALUES $vals),
       |xd AS (SELECT qs.query_id, depths.d, depths.w,
       |         CAST(coalesce(sum(CASE WHEN m.mr <= depths.d
       |              THEN 1 ELSE 0 END), 0) AS BIGINT) AS x
       |       FROM qs CROSS JOIN depths
       |       LEFT JOIN m ON m.query_id = qs.query_id
       |       GROUP BY 1, 2, 3),
       |pq AS (SELECT query_id,
       |         CAST(sum(CAST(round(w * CAST(x AS DOUBLE) /
       |           CAST(d AS DOUBLE) * 1000000000.0) AS BIGINT)) AS BIGINT)
       |           AS s9,
       |         max(CASE WHEN d = 5 THEN x END) AS xk
       |       FROM xd GROUP BY 1)
       |SELECT query_id,
       |       CAST(round(($oneMinusP * (CAST(s9 AS DOUBLE) / 1000000000.0)
       |         + $tail * CAST(xk AS DOUBLE) / 5) * 1000000.0) AS BIGINT)
       |         AS rbo6
       |FROM pq""".stripMargin
  }

  // ---- text analysis ----

  /** Type-token ratio per doc — see
    * [[graft.ops.TextAnalysis.typeTokenRatio]].
    */
  private def textTtr(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.typeTokenRatio(Tables.documents(s, dir), "doc_id", "text")

  private val textTtrSql =
    """SELECT doc_id,
      |  CAST(length(string_split_regex(lower(trim(text)), '\s+'))
      |    AS INT) AS n_tokens,
      |  CAST(length(list_distinct(string_split_regex(lower(trim(text)),
      |    '\s+'))) AS INT) AS n_types,
      |  round(CAST(length(list_distinct(string_split_regex(
      |      lower(trim(text)), '\s+'))) AS DOUBLE)
      |    / length(string_split_regex(lower(trim(text)), '\s+')), 6)
      |    AS ttr
      |FROM documents""".stripMargin

  /** Per-source encoding-health audit over a deterministically
    * CORRUPTED view of the corpus (the synthetic docs are pure ASCII,
    * so — like `dedup_lines`' fixed re-lining — a pinned corruption
    * keeps every detector branch live and the oracle a pure SQL
    * replay): docs with id%7=0 get the classic UTF-8-as-Latin-1
    * mojibake (e→Ã©), id%11=0 a U+FFFD replacement char per 't',
    * id%13=0 a trailing 0x01 control byte. See
    * [[graft.ops.TextAnalysis.encodingAudit]] for the detector.
    */
  private def textEncodingAudit(s: SparkSession, dir: String): DataFrame = {
    val corrupted = Tables.documents(s, dir)
      .withColumn("text", expr(
        "CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'Ã©') " +
          "ELSE text END"))
      .withColumn("text", expr(
        "CASE WHEN doc_id % 11 = 0 THEN replace(text, 't', '�') " +
          "ELSE text END"))
      .withColumn("text", expr(
        "CASE WHEN doc_id % 13 = 0 THEN concat(text, chr(1)) " +
          "ELSE text END"))
    TextAnalysis.encodingAudit(corrupted, "source", "text")
  }

  private val textEncodingAuditSql =
    """WITH c1 AS (SELECT doc_id, source,
      |              CASE WHEN doc_id % 7 = 0
      |                   THEN replace(text, 'e', 'Ã©') ELSE text END AS t
      |            FROM documents),
      |c2 AS (SELECT doc_id, source,
      |         CASE WHEN doc_id % 11 = 0
      |              THEN replace(t, 't', '�') ELSE t END AS t
      |       FROM c1),
      |c3 AS (SELECT doc_id, source,
      |         CASE WHEN doc_id % 13 = 0 THEN t || chr(1) ELSE t END AS t
      |       FROM c2),
      |d AS (SELECT source,
      |        CAST(length(t) - length(replace(t, '�', '')) AS BIGINT)
      |          AS repl,
      |        CAST((length(t) - length(replace(t, 'Ã', ''))) +
      |          (length(t) - length(replace(t, 'â€', ''))) / 2 AS BIGINT)
      |          AS moji,
      |        CAST(length(t) - length(regexp_replace(t,
      |          '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT)
      |          AS ctl
      |      FROM c3)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN repl + moji + ctl > 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS docs_flagged,
      |       CAST(sum(repl) AS BIGINT) AS repl_chars,
      |       CAST(sum(moji) AS BIGINT) AS moji_seqs,
      |       CAST(sum(ctl) AS BIGINT) AS ctrl_chars,
      |       CAST(round(CAST(sum(CASE WHEN repl + moji + ctl > 0 THEN 1
      |                ELSE 0 END) AS DOUBLE) /
      |              CAST(count(*) AS DOUBLE) * 1000000.0) AS BIGINT)
      |         AS flagged_ppm
      |FROM d GROUP BY 1""".stripMargin

  /** Gopher rule-set gate per document (Rae 2021 table A1) — the
    * published heuristic filter, each rule an exact-integer verdict.
    * See [[graft.ops.TextAnalysis.gopherRules]].
    */
  private def textGopherRules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(Tables.documents(s, dir), "doc_id", "text")

  private val textGopherRulesSql = {
    val bullet = "•"
    s"""WITH b AS (SELECT doc_id, trim(text) AS t,
       |             string_split_regex(lower(trim(text)), '\\s+') AS toks
       |           FROM documents),
       |m AS (SELECT doc_id,
       |        CAST(length(toks) AS BIGINT) AS words,
       |        CAST(length(regexp_replace(t, '\\s+', '', 'g')) AS BIGINT)
       |          AS chars,
       |        CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) +
       |          CAST((length(t) - length(replace(t, '...', ''))) / 3
       |            AS BIGINT) AS symbols,
       |        string_split(t, chr(10)) AS lines,
       |        CAST(len(list_filter(toks,
       |          x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_words,
       |        CAST(len(list_intersect(toks, ['the','and','of','to','a',
       |          'in','is','it','you','that'])) AS BIGINT) AS stops
       |      FROM b),
       |l AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
       |        CAST(len(list_filter(lines, x ->
       |          starts_with(trim(x), '-') OR starts_with(trim(x), '*')
       |          OR starts_with(trim(x), '$bullet'))) AS BIGINT) AS bullets,
       |        CAST(len(list_filter(lines, x -> ends_with(trim(x), '...')))
       |          AS BIGINT) AS ellipsis
       |      FROM m)
       |SELECT m.doc_id, words AS n_words,
       |  words >= 50 AND words <= 100000 AS r_word_count,
       |  3 * words <= chars AND chars <= 10 * words AS r_mean_word_len,
       |  10 * symbols <= words AS r_symbol_ratio,
       |  10 * bullets <= n_lines AS r_bullet_lines,
       |  10 * ellipsis <= 3 * n_lines AS r_ellipsis_lines,
       |  5 * alpha_words >= 4 * words AS r_alpha_words,
       |  stops >= 2 AS r_stopwords,
       |  (words >= 50 AND words <= 100000) AND
       |  (3 * words <= chars AND chars <= 10 * words) AND
       |  10 * symbols <= words AND 10 * bullets <= n_lines AND
       |  10 * ellipsis <= 3 * n_lines AND
       |  5 * alpha_words >= 4 * words AND stops >= 2 AS pass
       |FROM m JOIN l USING (doc_id)""".stripMargin
  }

  /** Gopher REPETITION rule set (Rae 2021 table A1's other half) over
    * the deterministically re-lined documents (10-token lines — the
    * `dedup_lines` precedent: the synthetic corpus is single-line, and
    * a fixed re-lining keeps the dup-line branch live while the oracle
    * stays a pure SQL replay). Template near-dups share aligned
    * 10-token runs and the tiny vocabulary makes duplicated k-grams
    * common; every 17th doc additionally gets its first 10 tokens
    * PREPENDED five times (the `text_encoding_audit` pinned-corruption
    * precedent) — alignment-preserving under the 10-token re-lining,
    * so those docs carry ≥5 duplicate lines and heavy dup-{5..10}-gram
    * mass at EVERY doc length, keeping all reject branches live in the
    * gate, not just in the spec fixtures.
    *
    * Empty-doc convention (pinned in BOTH tiers, round-10 ADVICE): a
    * whitespace-only document has ZERO tokens and ZERO lines. Spark's
    * `split` and DuckDB's `string_split_regex` both return `['']` for
    * the empty string, so the token stream filters length-0 strings
    * here and the oracle filters them from `tk` — without the filter
    * the parity silently depended on the fixture never containing an
    * empty doc (the compiled scan in [[TextAnalysis.gopherRepetition]]
    * already tokenizes empty text to 0 tokens).
    * See [[graft.ops.TextAnalysis.gopherRepetition]].
    */
  private def textGopherRepetition(s: SparkSession, dir: String): DataFrame = {
    val t10 = array_join(
      slice(TextAnalysis.tokens(col("text")), lit(1), lit(10)), " ")
    val multi = Tables.documents(s, dir)
      .withColumn("text", when(col("doc_id") % 17 === 0,
        concat_ws(" ", t10, t10, t10, t10, t10, col("text")))
        .otherwise(col("text")))
      .select(col("doc_id"),
        filter(TextAnalysis.tokens(col("text")),
          t => length(t) > 0).as("toks"))
      .select(col("doc_id"),
        array_join(transform(
          when(size(col("toks")) >= 1,
            sequence(lit(1), ceil(size(col("toks")) / lit(10.0)).cast("int")))
            .otherwise(array()),
          j => array_join(slice(col("toks"), (j - 1) * 10 + 1, lit(10)), " ")),
          "\n").as("text"))
    TextAnalysis.gopherRepetition(multi, "doc_id", "text")
  }

  private val textGopherRepetitionSql =
    """WITH t0 AS (SELECT doc_id,
      |              list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                          x -> len(x) > 0) AS tk
      |            FROM documents),
      |b AS (SELECT doc_id,
      |        CASE WHEN doc_id % 17 = 0
      |             THEN tk[1:10] || tk[1:10] || tk[1:10] || tk[1:10] ||
      |                  tk[1:10] || tk
      |             ELSE tk END AS toks
      |      FROM t0),
      |base AS (SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    -- coalesce: array_to_string([]) is NULL, and the pinned
      |    -- empty-doc convention is chars = 0
      |    CAST(coalesce(length(array_to_string(toks, ' ')), 0) AS BIGINT)
      |      AS chars,
      |    CAST(ceil(len(toks) / 10.0) AS BIGINT) AS n_lines
      |  FROM b),
      |lg AS (SELECT doc_id,
      |    array_to_string(list_slice(toks, (j-1)*10+1, (j-1)*10+10), ' ')
      |      AS line
      |  FROM (SELECT doc_id, toks,
      |          unnest(generate_series(1,
      |            CAST(ceil(len(toks) / 10.0) AS INT))) AS j
      |        FROM b)),
      |lc AS (SELECT doc_id, line, count(*) AS c,
      |         length(line) AS ll FROM lg GROUP BY 1, 2),
      |ls AS (SELECT doc_id,
      |    CAST(sum(c - 1) AS BIGINT) AS dup_l,
      |    CAST(sum((c - 1) * ll) AS BIGINT) AS dup_lc
      |  FROM lc GROUP BY 1),
      |g AS (SELECT doc_id, k, array_to_string(toks[i:i+k-1], ' ') AS gram
      |  FROM (SELECT doc_id, toks, k,
      |          unnest(generate_series(1, len(toks) - k + 1)) AS i
      |        FROM (SELECT doc_id, toks,
      |                unnest([2,3,4,5,6,7,8,9,10]) AS k FROM b)
      |        WHERE len(toks) >= k)),
      |gc AS (SELECT doc_id, k, gram, count(*) AS c,
      |         length(gram) AS gl FROM g GROUP BY 1, 2, 3),
      |pk AS (SELECT doc_id, k,
      |         CAST(max(c * gl) AS BIGINT) AS tc,
      |         CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * gl END), 0)
      |           AS BIGINT) AS da
      |       FROM gc GROUP BY 1, 2),
      |gs AS (SELECT doc_id,
      |    coalesce(max(CASE WHEN k = 2 THEN tc END), 0) AS top2,
      |    coalesce(max(CASE WHEN k = 3 THEN tc END), 0) AS top3,
      |    coalesce(max(CASE WHEN k = 4 THEN tc END), 0) AS top4,
      |    coalesce(max(CASE WHEN k = 5 THEN da END), 0) AS dup5,
      |    coalesce(max(CASE WHEN k = 6 THEN da END), 0) AS dup6,
      |    coalesce(max(CASE WHEN k = 7 THEN da END), 0) AS dup7,
      |    coalesce(max(CASE WHEN k = 8 THEN da END), 0) AS dup8,
      |    coalesce(max(CASE WHEN k = 9 THEN da END), 0) AS dup9,
      |    coalesce(max(CASE WHEN k = 10 THEN da END), 0) AS dup10
      |  FROM pk GROUP BY 1),
      |j AS (SELECT base.doc_id, n_words, chars, n_lines,
      |        coalesce(dup_l, 0) AS dup_l, coalesce(dup_lc, 0) AS dup_lc,
      |        coalesce(top2, 0) AS top2, coalesce(top3, 0) AS top3,
      |        coalesce(top4, 0) AS top4, coalesce(dup5, 0) AS dup5,
      |        coalesce(dup6, 0) AS dup6, coalesce(dup7, 0) AS dup7,
      |        coalesce(dup8, 0) AS dup8, coalesce(dup9, 0) AS dup9,
      |        coalesce(dup10, 0) AS dup10
      |      FROM base LEFT JOIN ls ON base.doc_id = ls.doc_id
      |                LEFT JOIN gs ON base.doc_id = gs.doc_id)
      |SELECT doc_id, n_words, chars, n_lines,
      |  CASE WHEN n_lines > 0 THEN CAST(round(CAST(dup_l AS DOUBLE) /
      |    CAST(n_lines AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS dup_line_ppm,
      |  CASE WHEN chars > 0 THEN CAST(round(CAST(dup_lc AS DOUBLE) /
      |    CAST(chars AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS dup_line_char_ppm,
      |  CASE WHEN chars > 0 THEN CAST(round(CAST(top2 AS DOUBLE) /
      |    CAST(chars AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS top2gram_char_ppm,
      |  CASE WHEN chars > 0 THEN CAST(round(CAST(top3 AS DOUBLE) /
      |    CAST(chars AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS top3gram_char_ppm,
      |  CASE WHEN chars > 0 THEN CAST(round(CAST(top4 AS DOUBLE) /
      |    CAST(chars AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS top4gram_char_ppm,
      |  CASE WHEN chars > 0 THEN CAST(round(CAST(dup5 AS DOUBLE) /
      |    CAST(chars AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS dup5gram_char_ppm,
      |  CASE WHEN chars > 0 THEN CAST(round(CAST(dup10 AS DOUBLE) /
      |    CAST(chars AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS dup10gram_char_ppm,
      |  dup_l * 10 <= n_lines * 3 AS r_dup_line,
      |  dup_lc * 5 <= chars AS r_dup_line_char,
      |  top2 * 5 <= chars AS r_top2gram,
      |  top3 * 50 <= chars * 9 AS r_top3gram,
      |  top4 * 25 <= chars * 4 AS r_top4gram,
      |  dup5 * 20 <= chars * 3 AS r_dup5gram,
      |  dup6 * 50 <= chars * 7 AS r_dup6gram,
      |  dup7 * 100 <= chars * 13 AS r_dup7gram,
      |  dup8 * 25 <= chars * 3 AS r_dup8gram,
      |  dup9 * 100 <= chars * 11 AS r_dup9gram,
      |  dup10 * 10 <= chars AS r_dup10gram,
      |  dup_l * 10 <= n_lines * 3 AND dup_lc * 5 <= chars AND
      |  top2 * 5 <= chars AND top3 * 50 <= chars * 9 AND
      |  top4 * 25 <= chars * 4 AND dup5 * 20 <= chars * 3 AND
      |  dup6 * 50 <= chars * 7 AND dup7 * 100 <= chars * 13 AND
      |  dup8 * 25 <= chars * 3 AND dup9 * 100 <= chars * 11 AND
      |  dup10 * 10 <= chars AS pass
      |FROM j""".stripMargin

  /** FineWeb-style line gate over a deterministically re-lined corpus
    * with three pinned plants keeping every branch live (the
    * `text_gopher_repetition` discipline): every 17th doc gets its
    * first 10 tokens prepended ×5 (duplicate-line mass), every 23rd doc
    * re-lines at 2 tokens instead of 10 (short lines), and every 3rd
    * doc gets '.' appended to each line (terminal punctuation — the
    * synthetic corpus has none, so WITHOUT this plant r_punct_lines
    * would fail uniformly and discriminate nothing).
    *
    * Same pinned empty-doc convention as `text_gopher_repetition`
    * (zero tokens, zero lines — length-0 strings filtered from the
    * token stream in both tiers), and the same `size >= 1` guard on
    * `sequence`: for a zero-token doc Spark's `sequence(1, 0)` yields
    * a DESCENDING `[1, 0]` — two phantom lines — not an empty array.
    * See [[graft.ops.TextAnalysis.fineWebRules]].
    */
  private def textFineWebRules(s: SparkSession, dir: String): DataFrame = {
    val t10 = array_join(
      slice(TextAnalysis.tokens(col("text")), lit(1), lit(10)), " ")
    val w = when(col("doc_id") % 23 === 0, lit(2)).otherwise(lit(10))
    val dot = when(col("doc_id") % 3 === 0, lit(".")).otherwise(lit(""))
    val multi = Tables.documents(s, dir)
      .withColumn("text", when(col("doc_id") % 17 === 0,
        concat_ws(" ", t10, t10, t10, t10, t10, col("text")))
        .otherwise(col("text")))
      .select(col("doc_id"),
        filter(TextAnalysis.tokens(col("text")),
          t => length(t) > 0).as("toks"),
        w.as("w"), dot.as("dot"))
      .select(col("doc_id"),
        array_join(transform(
          when(size(col("toks")) >= 1,
            sequence(lit(1), ceil(size(col("toks")).cast("double") /
              col("w").cast("double")).cast("int")))
            .otherwise(array()),
          j => concat(array_join(
            slice(col("toks"), (j - 1) * col("w") + 1, col("w")), " "),
            col("dot"))),
          "\n").as("text"))
    TextAnalysis.fineWebRules(multi, "doc_id", "text")
  }

  private val textFineWebRulesSql =
    """WITH t0 AS (SELECT doc_id,
      |              list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                          x -> len(x) > 0) AS tk
      |            FROM documents),
      |b AS (SELECT doc_id,
      |        CASE WHEN doc_id % 17 = 0
      |             THEN tk[1:10] || tk[1:10] || tk[1:10] || tk[1:10] ||
      |                  tk[1:10] || tk
      |             ELSE tk END AS toks,
      |        CASE WHEN doc_id % 23 = 0 THEN 2 ELSE 10 END AS w,
      |        CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END AS dot
      |      FROM t0),
      |lg AS (SELECT doc_id,
      |         array_to_string(list_slice(toks, (j-1)*w+1, (j-1)*w+w), ' ')
      |           || dot AS line
      |       FROM (SELECT doc_id, toks, w, dot,
      |               unnest(generate_series(1,
      |                 CAST(ceil(len(toks) / CAST(w AS DOUBLE)) AS INT)))
      |                 AS j
      |             FROM b)),
      |-- the batch op counts only non-empty lines; re-lined lines are
      |-- provably non-empty (>=1 non-empty token each) but the contract
      |-- is mirrored explicitly so the parity never hinges on that proof
      |lc AS (SELECT doc_id, line, count(*) AS c,
      |         length(line) AS ll FROM lg WHERE len(line) > 0
      |       GROUP BY 1, 2),
      |a AS (SELECT doc_id,
      |        CAST(sum(c) AS BIGINT) AS n_lines,
      |        CAST(sum(c * ll) AS BIGINT) AS chars,
      |        CAST(sum(CASE WHEN right(line, 1) IN ('.','!','?','"','''')
      |          THEN c ELSE 0 END) AS BIGINT) AS punct,
      |        CAST(sum(CASE WHEN ll < 30 THEN c ELSE 0 END) AS BIGINT)
      |          AS short,
      |        CAST(sum((c - 1) * ll) AS BIGINT) AS dup_lc
      |      FROM lc GROUP BY 1)
      |-- LEFT JOIN from b: a zero-token doc generates zero lines and
      |-- would otherwise vanish from the aggregate, while the batch op
      |-- emits an (all-zero, all-pass) row for it
      |SELECT b.doc_id,
      |  coalesce(n_lines, 0) AS n_lines, coalesce(chars, 0) AS chars,
      |  CASE WHEN n_lines > 0 THEN CAST(round(CAST(punct AS DOUBLE) /
      |    CAST(n_lines AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS punct_line_ppm,
      |  CASE WHEN n_lines > 0 THEN CAST(round(CAST(short AS DOUBLE) /
      |    CAST(n_lines AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS short_line_ppm,
      |  CASE WHEN chars > 0 THEN CAST(round(CAST(dup_lc AS DOUBLE) /
      |    CAST(chars AS DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END
      |    AS dup_line_char_ppm,
      |  coalesce(punct, 0) * 25 >= coalesce(n_lines, 0) * 3
      |    AS r_punct_lines,
      |  coalesce(short, 0) * 100 <= coalesce(n_lines, 0) * 67
      |    AS r_short_lines,
      |  coalesce(dup_lc, 0) * 10 <= coalesce(chars, 0)
      |    AS r_dup_line_chars,
      |  coalesce(punct, 0) * 25 >= coalesce(n_lines, 0) * 3 AND
      |  coalesce(short, 0) * 100 <= coalesce(n_lines, 0) * 67 AND
      |  coalesce(dup_lc, 0) * 10 <= coalesce(chars, 0) AS pass
      |FROM b LEFT JOIN a USING (doc_id)""".stripMargin

  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))

  private val tokenCountSql =
    """SELECT doc_id,
      |  CAST(length(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS n_tokens
      |FROM documents""".stripMargin

  /** Power-of-two length buckets with the padding waste a
    * length-sorted batcher would pay — batch-shape planning for
    * training. See [[graft.ops.TextAnalysis.lengthBuckets]] (unrolled
    * integer bucket compares — never floor(log2) across engines).
    */
  private def docLengthBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lengthBuckets(Tables.documents(s, dir), "doc_id", "text",
      maxBucket = 12)

  private val docLengthBucketsSql = {
    val maxBucket = 12
    val cases = (0 until maxBucket)
      .map(b => s"WHEN t < ${1L << (b + 1)} THEN $b")
      .mkString("\n    ")
    s"""WITH tc AS (
       |  SELECT doc_id,
       |    CAST(length(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS t
       |  FROM documents),
       |bk AS (SELECT doc_id, t,
       |         CASE $cases ELSE $maxBucket END AS bucket
       |       FROM tc WHERE t >= 1),
       |agg AS (SELECT bucket, count(*) AS n_docs,
       |          CAST(sum(t) AS BIGINT) AS sum_tokens,
       |          max(t) AS max_tokens
       |        FROM bk GROUP BY 1),
       |pt AS (SELECT bucket, n_docs, sum_tokens,
       |         greatest((1::BIGINT << (bucket + 1)) - 1, max_tokens) AS pad_to
       |       FROM agg)
       |SELECT bucket, n_docs, sum_tokens, pad_to,
       |       n_docs * pad_to - sum_tokens AS pad_waste,
       |       CAST(round((n_docs * pad_to - sum_tokens) * 1.0 /
       |             (n_docs * pad_to) * 1000000.0) AS BIGINT) AS waste_ppm
       |FROM pt""".stripMargin
  }

  /** Per-doc character-unigram entropy (bits/char) — the gibberish
    * detector; see [[graft.ops.TextAnalysis.charEntropy]]. Oracle
    * mirrors the ln/ln(2) form so both engines take the same float
    * path.
    */
  private def charEntropyQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")

  private val charEntropySql =
    """WITH b AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
      |ch AS (SELECT doc_id,
      |         unnest(list_transform(range(1, length(t) + 1),
      |                               i -> substr(t, CAST(i AS INT), 1)))
      |           AS c
      |       FROM b),
      |cnts AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
      |h AS (SELECT doc_id, sum(cnt)::DOUBLE AS n,
      |        sum(cnt * (ln(cnt) / ln(2.0))) AS s
      |      FROM cnts GROUP BY 1)
      |SELECT b.doc_id,
      |       coalesce(round((ln(h.n) / ln(2.0)) - h.s / h.n, 6), 0.0)
      |         AS char_entropy
      |FROM b LEFT JOIN h USING (doc_id)""".stripMargin

  private def quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id") +: (TextAnalysis.qualityColumns(col("text")) :+
        TextAnalysis.qualityScore(col("text")).as("quality")): _*)

  private val qualitySql = {
    val stops = TextAnalysis.stopwordProfiles.head._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    """WITH b AS (
      |  SELECT doc_id, trim(text) AS t,
      |    CAST(greatest(length(trim(text)), 1) AS DOUBLE) AS len,
      |    list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS dtoks,
      |    CAST(greatest(length(string_split_regex(lower(trim(text)), '\s+')), 1)
      |         AS DOUBLE) AS ntoks
      |  FROM documents)
      |SELECT doc_id,
      |  round((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))) / len, 6)
      |    AS alpha_ratio,
      |  round((len - length(regexp_replace(t, '[0-9]', '', 'g'))) / len, 6)
      |    AS digit_ratio,
      |  round((len - length(regexp_replace(t, '[^a-zA-Z0-9\s]', '', 'g'))) / len, 6)
      |    AS punct_ratio,
      |  round(length(list_intersect(dtoks, STOPS)) / ntoks, 6) AS stopword_ratio,
      |  round(length(regexp_replace(t, '\s+', '', 'g')) / ntoks, 6) AS avg_token_len,
      |  round(((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))) / len) * 0.5
      |    + (CASE WHEN length(regexp_replace(t, '\s+', '', 'g')) / ntoks
      |            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
      |    + (CASE WHEN length(t) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25,
      |    6) AS quality
      |FROM b""".stripMargin.replace("STOPS", stops)
  }

  private def langid(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_pred"))

  private val langidSql = {
    val scores = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"length(list_intersect(dtoks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH b AS (
       |  SELECT doc_id,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS dtoks
       |  FROM documents),
       |sc AS (SELECT doc_id, $scores FROM b)
       |SELECT doc_id, CASE $cases ELSE '${langs.last}' END AS lang_pred
       |FROM sc""".stripMargin
  }

  /** Declared-vs-detected language confusion matrix: the corpus-health
    * audit behind "trust the metadata or re-run langid?". Same
    * stopword-profile classifier as `text_langid`, grouped against the
    * declared `lang` column — one scan, one domain²-sized combinable
    * aggregate.
    */
  private def langidConfusion(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("cnt"))

  private val langidConfusionSql = {
    val scores = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"length(list_intersect(dtoks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH b AS (
       |  SELECT lang,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS dtoks
       |  FROM documents),
       |sc AS (SELECT lang, $scores FROM b),
       |p AS (SELECT lang, CASE $cases ELSE '${langs.last}' END AS lang_pred
       |      FROM sc)
       |SELECT lang, lang_pred, count(*) AS cnt FROM p GROUP BY 1, 2""".stripMargin
  }

  /** Cohen's kappa between the declared `lang` column and the
    * stopword-profile langId — the chance-corrected agreement scalar
    * on top of `text_langid_confusion` (raw agreement po flatters any
    * skewed label mix; κ = (po−pe)/(1−pe) subtracts the agreement two
    * independent annotators with these marginals would get for free).
    * All inputs are exact integer marginals of the same one-scan
    * prediction; po, pe and κ are fixed-order ratios, 6dp-pinned; the
    * degenerate pe = 1 case yields null. Scale: one scan + class-
    * domain aggregates.
    */
  private def langidKappa(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.agreementKappa(
      Tables.documents(s, dir).select(col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred")),
      "lang", "lang_pred")

  private val langidKappaSql = {
    val scores = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"length(list_intersect(dtoks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH b AS (
       |  SELECT lang,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS dtoks
       |  FROM documents),
       |sc AS (SELECT lang, $scores FROM b),
       |p AS (SELECT lang, CASE $cases ELSE '${langs.last}' END AS lang_pred
       |      FROM sc),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
       |          AS BIGINT) AS diag
       |      FROM p),
       |r AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS rc
       |      FROM p GROUP BY 1),
       |cl AS (SELECT lang_pred AS c, CAST(count(*) AS BIGINT) AS cc
       |       FROM p GROUP BY 1),
       |pn AS (SELECT CAST(coalesce(sum(rc * cc), 0) AS BIGINT) AS pe_num
       |       FROM r JOIN cl USING (c))
       |SELECT n, diag,
       |  round(CAST(diag AS DOUBLE) / n, 6) AS po,
       |  round(CAST(pe_num AS DOUBLE) / (n * n), 6) AS pe,
       |  CASE WHEN CAST(pe_num AS DOUBLE) / (n * n) = 1.0 THEN NULL
       |    ELSE round((CAST(diag AS DOUBLE) / n -
       |      CAST(pe_num AS DOUBLE) / (n * n)) /
       |      (1.0 - CAST(pe_num AS DOUBLE) / (n * n)), 6) END AS kappa
       |FROM t CROSS JOIN pn""".stripMargin
  }

  private def tokenCountBpe(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCountBpeish(col("text")).as("n_tokens"))

  /** Real merge-table BPE counts: train on a bounded deterministic
    * sample (4096 docs — the full multi-thousand-doc sample at bench
    * scale), encode the whole table in one mapPartitions pass. The
    * merge budget (4000) exceeds what this corpus can yield: the
    * synthetic documents draw from 31 distinct words, so training runs
    * to pair exhaustion at 89 merges — COMPLETE vocabulary coverage,
    * every known word a single token. The incremental trainer sustains
    * thousands of merges on richer corpora (BpeSpec trains 2000+ from
    * a generated vocabulary in-test). Rows-only gate (the merge loop
    * isn't SQL-expressible); BpeSpec hand-verifies the algorithm, pins
    * the incremental trainer to a naive reference, and pins the
    * distributed path to the driver-side encoder.
    */
  private def tokenCountBpeReal(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = graft.ops.Bpe.trainOnTable(s, docs, "doc_id", "text",
      sampleDocs = 4096, numMerges = 4000)
    graft.ops.Bpe.tokenCounts(docs, "doc_id", "text", merges)
  }

  /** Oracle for the corpus-TRAINED BPE variant: the training loop
    * itself replays in SQL. A recursive CTE carries the whole trainer
    * state in ONE row per iteration — the list of (delimited-symbol
    * word, freq) structs plus the merges so far — and each step
    * recounts adjacent pairs with list comprehensions (no aggregates,
    * which recursive terms forbid), picks argmax count with the
    * trainer's exact (count desc, pair asc) tie-break via a struct
    * sort (symbols carry a chr(2) end-sentinel, which compares below
    * all content chars, so sentineled order == clean tuple order),
    * applies the merge with the bracketed-replace trick (disjoint
    * occurrences -> one greedy pass == mergeAll), and stops when no
    * pair repeats — the trainer's saturation rule. The learned table
    * then drives the same rank-fold encode as the pinned oracle.
    * Tie-breaks and counts replay the NAIVE recount model, which
    * BpeSpec pins the incremental trainer to.
    */
  private val tokenCountBpeRealSql = {
    val pat = TextAnalysis.BpeishPattern
    s"""WITH RECURSIVE
       |samp AS (SELECT text FROM documents ORDER BY doc_id LIMIT 4096),
       |sdocw AS (SELECT unnest(regexp_extract_all(lower(text), '$pat')) AS w
       |          FROM samp),
       |wf AS (SELECT w, count(*)::BIGINT AS f FROM sdocw GROUP BY w),
       |seed AS (SELECT list({'s': chr(1) ||
       |            array_to_string(string_split(w, ''), chr(2) || chr(1)) ||
       |            chr(2), 'f': f}) AS words,
       |                CAST([] AS VARCHAR[]) AS merges, 0 AS iter
       |         FROM wf),
       |train AS (
       |  SELECT words, merges, iter FROM seed
       |  UNION ALL
       |  SELECT
       |    [{'s': replace(w.s, chr(1) || best.a || chr(1) || best.b,
       |                   chr(1) || substr(best.a, 1, length(best.a)-1) ||
       |                   best.b),
       |      'f': w.f} for w in words] AS words,
       |    list_append(merges, substr(best.a, 1, length(best.a)-1) ||
       |                chr(3) || substr(best.b, 1, length(best.b)-1)) AS merges,
       |    iter + 1
       |  FROM (
       |    SELECT words, merges, iter,
       |      CASE WHEN len(elig) = 0 THEN NULL ELSE list_sort(elig)[1] END AS best
       |    FROM (
       |      SELECT words, merges, iter,
       |        [{'nc': -CAST(list_sum([y.f for y in ap if y.k = c]) AS BIGINT),
       |           'a': string_split(c, chr(2))[1] || chr(2),
       |           'b': string_split(c, chr(2))[2] || chr(2)}
       |         for c in list_distinct([x.k for x in ap])
       |         if CAST(list_sum([y.f for y in ap if y.k = c]) AS BIGINT) >= 2]
       |          AS elig
       |      FROM (
       |        SELECT words, merges, iter,
       |          flatten([[{'k': z[1] || z[2], 'f': w.f}
       |                    for z in list_zip(string_split(w.s, chr(1))[2:],
       |                                      (string_split(w.s, chr(1))[2:])[2:])
       |                    if z[2] IS NOT NULL] for w in words]) AS ap
       |        FROM train WHERE iter < 4000
       |      ) t1
       |    ) t2
       |  ) t3
       |  WHERE best IS NOT NULL
       |),
       |fin AS (SELECT merges FROM train ORDER BY iter DESC LIMIT 1),
       |m AS (SELECT i - 1 AS r, split_part(p, chr(3), 1) AS p1,
       |             split_part(p, chr(3), 2) AS p2
       |      FROM (SELECT unnest(merges) AS p,
       |                   generate_subscripts(merges, 1) AS i FROM fin) u),
       |docw AS (SELECT doc_id,
       |           unnest(regexp_extract_all(lower(text), '$pat')) AS w
       |         FROM documents),
       |words2 AS (SELECT DISTINCT w FROM docw),
       |enc AS (
       |  SELECT w,
       |         chr(1) || array_to_string(string_split(w, ''),
       |           chr(2) || chr(1)) || chr(2) AS state,
       |         0 AS r
       |  FROM words2
       |  UNION ALL
       |  SELECT enc.w,
       |         replace(enc.state,
       |           chr(1) || m.p1 || chr(2) || chr(1) || m.p2 || chr(2),
       |           chr(1) || m.p1 || m.p2 || chr(2)),
       |         enc.r + 1
       |  FROM enc JOIN m ON m.r = enc.r),
       |fin2 AS (SELECT w, length(string_split(state, chr(1))) - 1 AS n
       |         FROM enc WHERE r = (SELECT len(merges) FROM fin)),
       |cnt AS (SELECT doc_id, sum(n) AS n FROM docw JOIN fin2 USING (w)
       |        GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(cnt.n, 0) AS INT) AS n_tokens
       |FROM documents d LEFT JOIN cnt USING (doc_id)""".stripMargin
  }

  /** BPE token counts under the PINNED vocabulary ([[graft.ops.BpeVocab]]
    * — the fixed-artifact tokenizer shape production pipelines use), and
    * the hash-gated twin of the rows-only trained variant above: with a
    * fixed merge table the whole encode loop IS SQL-expressible. The
    * oracle folds the merges in rank order over a delimited symbol
    * string with greedy left-to-right `replace` — equivalent to the
    * lowest-rank-first merge loop because a merge can only create pairs
    * containing its new symbol, so a lower-rank pair can never reappear
    * after its turn. Each symbol is bracketed by DISTINCT chr(1)/chr(2)
    * delimiters: adjacent occurrences of a space-delimited pattern share
    * the boundary space, so one greedy pass would merge only the first
    * pair of an `aaaa` run — bracketed occurrences are disjoint and one
    * pass is exactly mergeAll (BpeSpec pins both equivalences on random
    * repeat-heavy words).
    */
  private def tokenCountBpePinned(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.tokenCounts(Tables.documents(s, dir), "doc_id", "text",
      graft.ops.BpeVocab.merges)

  private val tokenCountBpePinnedSql = {
    // single quotes doubled for SQL; symbols never contain whitespace
    // or control chars (pre-token pattern), so no other escaping needed
    def esc(s: String) = s.replace("'", "''")
    val vals = graft.ops.BpeVocab.merges.zipWithIndex
      .map { case ((a, b), r) => s"($r, '${esc(a)}', '${esc(b)}')" }
      .mkString(", ")
    val n = graft.ops.BpeVocab.merges.size
    s"""WITH RECURSIVE m(r, p1, p2) AS (VALUES $vals),
       |docw AS (SELECT doc_id,
       |           unnest(regexp_extract_all(lower(text),
       |             '${TextAnalysis.BpeishPattern}')) AS w
       |         FROM documents),
       |words AS (SELECT DISTINCT w FROM docw),
       |enc AS (
       |  SELECT w,
       |         chr(1) || array_to_string(string_split(w, ''),
       |           chr(2) || chr(1)) || chr(2) AS state,
       |         0 AS r
       |  FROM words
       |  UNION ALL
       |  SELECT enc.w,
       |         replace(enc.state,
       |           chr(1) || m.p1 || chr(2) || chr(1) || m.p2 || chr(2),
       |           chr(1) || m.p1 || m.p2 || chr(2)),
       |         enc.r + 1
       |  FROM enc JOIN m ON m.r = enc.r),
       |fin AS (SELECT w, length(string_split(state, chr(1))) - 1 AS n
       |        FROM enc WHERE r = $n),
       |cnt AS (SELECT doc_id, sum(n) AS n FROM docw JOIN fin USING (w) GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(cnt.n, 0) AS INT) AS n_tokens
       |FROM documents d LEFT JOIN cnt USING (doc_id)""".stripMargin
  }

  /** Per-language tokenizer FERTILITY under the pinned vocabulary —
    * subword tokens per whitespace word, the standard tokenizer-
    * efficiency metric (a vocabulary trained on English prose pays a
    * fertility premium on other languages; this is the number that
    * quantifies it corpus-wide). One encode scan + one groupBy(lang);
    * the oracle composes the pinned encode replay with the whitespace
    * counts and the same ×10⁶-BIGINT-pinned ratio.
    */
  private def bpeFertilityByLang(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bpe = graft.ops.Bpe.tokenCounts(docs, "doc_id", "text",
      graft.ops.BpeVocab.merges)
    docs.select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_words"))
      .join(bpe, Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("subword_tokens"),
        sum(col("n_words")).as("words"),
        round(sum(col("n_tokens")).cast("double") /
          sum(col("n_words")).cast("double") * 1e6)
          .cast("long").as("fertility_ppm"))
  }

  private lazy val bpeFertilityByLangSql =
    s"""WITH bpe AS ($tokenCountBpePinnedSql),
       |ws AS (SELECT doc_id, lang,
       |         CAST(length(string_split_regex(lower(trim(text)), '\\s+')) AS INT)
       |           AS n_words
       |       FROM documents)
       |SELECT ws.lang, count(*) AS n_docs,
       |       CAST(sum(bpe.n_tokens) AS BIGINT) AS subword_tokens,
       |       CAST(sum(ws.n_words) AS BIGINT) AS words,
       |       CAST(round(CAST(sum(bpe.n_tokens) AS DOUBLE) /
       |             CAST(sum(ws.n_words) AS DOUBLE) * 1000000.0)
       |         AS BIGINT) AS fertility_ppm
       |FROM ws JOIN bpe USING (doc_id)
       |GROUP BY ws.lang""".stripMargin

  // DuckDB single-quoted strings don't process backslash escapes, so the
  // Java pattern string drops in verbatim
  private val tokenCountBpeSql =
    s"""SELECT doc_id,
       |  CAST(length(regexp_extract_all(text, '${TextAnalysis.BpeishPattern}')) AS INT)
       |    AS n_tokens
       |FROM documents""".stripMargin

  /** Rolling-hash document sketch: minimum shingle digest per document
    * (the first row of a winnowing/min-k sketch), engine-stable because
    * md5 hex compares identically everywhere.
    */
  private def minShingleFp(s: SparkSession, dir: String): DataFrame =
    Dedup.shinglePostings(Tables.documents(s, dir), "doc_id", "text", 8)
      .groupBy(col("id").as("doc_id")).agg(min(md5(col("s"))).as("min_shingle_fp"))
      .select(col("doc_id"), col("min_shingle_fp"))

  private val minShingleFpSql =
    """WITH t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
      |sh AS (SELECT doc_id, substr(txt, CAST(i AS INT), 8) AS s
      |       FROM (SELECT doc_id, txt,
      |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
      |             FROM t) u)
      |SELECT doc_id, min(md5(s)) AS min_shingle_fp
      |FROM sh GROUP BY doc_id""".stripMargin

  /** Quota selection: the 5 best-quality docs per predicted language —
    * the standard "keep top-k per group" step after scoring. Ordering is
    * fully deterministic: quality is rounded to 6dp on both engines and
    * ties break on doc_id.
    */
  private def topkQualityByLang(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    Ranking.topKPerKey(scored, Seq("lang_pred"),
      Seq(col("quality").desc, col("doc_id").asc), k = 5)
  }

  private val topkQualityByLangSql = {
    val langScores = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"length(list_intersect(dtoks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val langCases = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH b AS (
       |  SELECT doc_id, trim(text) AS t,
       |    CAST(greatest(length(trim(text)), 1) AS DOUBLE) AS len,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS dtoks,
       |    CAST(greatest(length(string_split_regex(lower(trim(text)), '\\s+')), 1)
       |         AS DOUBLE) AS ntoks
       |  FROM documents),
       |sc AS (SELECT doc_id, $langScores FROM b),
       |lang AS (SELECT doc_id, CASE $langCases ELSE '${langs.last}' END AS lang_pred
       |         FROM sc),
       |q AS (SELECT doc_id,
       |  round(((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))) / len) * 0.5
       |    + (CASE WHEN length(regexp_replace(t, '\\s+', '', 'g')) / ntoks
       |            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
       |    + (CASE WHEN length(t) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25,
       |    6) AS quality
       |  FROM b)
       |SELECT doc_id, lang_pred, quality, CAST(rank AS INT) AS rank
       |FROM (SELECT q.doc_id, lang.lang_pred, q.quality,
       |        row_number() OVER (PARTITION BY lang.lang_pred
       |                           ORDER BY q.quality DESC, q.doc_id) AS rank
       |      FROM q JOIN lang USING (doc_id)) t
       |WHERE rank <= 5""".stripMargin
  }

  /** Winnowing sketch over the documents table (k=8 chars, window=4). */
  private def winnowFps(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowingFingerprints(Tables.documents(s, dir),
      "doc_id", "text", k = 8, window = 4)

  private val winnowFpsSql =
    """WITH t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
      |sh AS (SELECT doc_id, greatest(length(txt) - 7, 1) AS ns,
      |         CAST(i AS INT) AS pos, md5(substr(txt, CAST(i AS INT), 8)) AS h
      |       FROM (SELECT doc_id, txt,
      |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
      |             FROM t) u),
      |wmin AS (SELECT doc_id, ns, pos,
      |           min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |         FROM sh)
      |SELECT DISTINCT doc_id, fp FROM wmin
      |WHERE pos <= greatest(ns - 3, 1)""".stripMargin

  private def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))

  private val fingerprintSql =
    """SELECT doc_id,
      |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin

  /** PII scrubbing: emails then IPv4s redacted, with per-kind counts.
    * Patterns are RE2-compatible so the Java-regex Spark path and the
    * DuckDB (RE2) oracle agree byte-for-byte.
    */
  private def piiRedact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id") +: TextAnalysis.redactPii(col("text")).as("redacted") +:
        TextAnalysis.piiCounts(col("text")): _*)

  private val piiRedactSql = {
    val em = TextAnalysis.EmailPattern
    val ip = TextAnalysis.Ipv4Pattern
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(text, '$em', '[EMAIL]', 'g'),
       |                 '$ip', '[IP]', 'g') AS redacted,
       |  CAST(length(regexp_extract_all(text, '$em')) AS INT) AS email_cnt,
       |  CAST(length(regexp_extract_all(
       |    regexp_replace(text, '$em', '[EMAIL]', 'g'), '$ip')) AS INT) AS ip_cnt
       |FROM documents""".stripMargin
  }

  /** Luhn-validated payment-card audit over pinned plants (the
    * synthetic corpus has no card numbers, so without plants every
    * branch would be uniformly zero and discriminate nothing — the
    * `text_encoding_audit` precedent): every 13th doc gets a VALID
    * spaced Visa test number, every 29th an INVALID dashed one
    * (checksum off by one — candidates fire, Luhn rejects), every 41st
    * a valid unseparated 15-digit Amex (second length class). See
    * [[graft.ops.TextAnalysis.piiLuhnAudit]].
    */
  private def piiLuhn(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir)
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 13 === 0, lit(" 4111 1111 1111 1111"))
          .otherwise(lit("")),
        when(col("doc_id") % 29 === 0, lit(" 4111-1111-1111-1112"))
          .otherwise(lit("")),
        when(col("doc_id") % 41 === 0, lit(" 378282246310005"))
          .otherwise(lit(""))))
    TextAnalysis.piiLuhnAudit(planted, "doc_id", "text")
  }

  private val piiLuhnSql =
    """WITH planted AS (SELECT doc_id,
      |    text || CASE WHEN doc_id % 13 = 0 THEN ' 4111 1111 1111 1111'
      |                 ELSE '' END
      |         || CASE WHEN doc_id % 29 = 0 THEN ' 4111-1111-1111-1112'
      |                 ELSE '' END
      |         || CASE WHEN doc_id % 41 = 0 THEN ' 378282246310005'
      |                 ELSE '' END AS text
      |  FROM documents),
      |cand AS (SELECT doc_id,
      |           unnest(regexp_extract_all(text,
      |             '[0-9](?:[ -]?[0-9]){12,18}')) AS c
      |         FROM planted),
      |l AS (SELECT doc_id,
      |        list_sum(list_transform(
      |          generate_series(1, length(cd)),
      |          i -> CASE WHEN i % 2 = 1
      |                 THEN CAST(substr(cd, length(cd) - i + 1, 1) AS INT)
      |                 ELSE CASE WHEN CAST(substr(cd, length(cd) - i + 1, 1)
      |                                  AS INT) * 2 > 9
      |                      THEN CAST(substr(cd, length(cd) - i + 1, 1)
      |                             AS INT) * 2 - 9
      |                      ELSE CAST(substr(cd, length(cd) - i + 1, 1)
      |                             AS INT) * 2 END END)) % 10 = 0 AS ok
      |      FROM (SELECT doc_id, regexp_replace(c, '[ -]', '', 'g') AS cd
      |            FROM cand)),
      |a AS (SELECT doc_id, CAST(count(*) AS INT) AS n_cand,
      |        CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS INT) AS n_ok
      |      FROM l GROUP BY 1)
      |SELECT p.doc_id,
      |  coalesce(n_cand, 0) AS n_card_candidates,
      |  coalesce(n_ok, 0) AS n_luhn_valid,
      |  coalesce(n_ok, 0) > 0 AS has_valid_card
      |FROM planted p LEFT JOIN a USING (doc_id)""".stripMargin

  /** IBAN mod-97 audit over pinned plants (same precedent as
    * `text_pii_luhn`): every 19th doc gets the VALID spaced GB example
    * IBAN, every 31st an invalid twin (checksum off by one), every
    * 53rd a valid French IBAN with a letter inside the BODY (the
    * letter→two-digit mapping must fire mid-number, not just in the
    * country head). See [[graft.ops.TextAnalysis.piiIbanAudit]].
    */
  private def piiIban(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir)
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 19 === 0, lit(" GB82 WEST 1234 5698 7654 32"))
          .otherwise(lit("")),
        when(col("doc_id") % 31 === 0, lit(" GB82WEST12345698765433"))
          .otherwise(lit("")),
        when(col("doc_id") % 53 === 0, lit(" FR1420041010050500013M02606"))
          .otherwise(lit(""))))
    TextAnalysis.piiIbanAudit(planted, "doc_id", "text")
  }

  private lazy val piiIbanSql = {
    val w = TextAnalysis.Mod97Weights.mkString("[", ",", "]")
    s"""WITH planted AS (SELECT doc_id,
       |    text || CASE WHEN doc_id % 19 = 0
       |                 THEN ' GB82 WEST 1234 5698 7654 32' ELSE '' END
       |         || CASE WHEN doc_id % 31 = 0
       |                 THEN ' GB82WEST12345698765433' ELSE '' END
       |         || CASE WHEN doc_id % 53 = 0
       |                 THEN ' FR1420041010050500013M02606' ELSE '' END
       |      AS text
       |  FROM documents),
       |cand AS (SELECT doc_id,
       |           unnest(regexp_extract_all(text,
       |             '[A-Z]{2}[0-9]{2}(?: ?[A-Z0-9]){11,30}')) AS c
       |         FROM planted),
       |ds AS (SELECT doc_id,
       |         list_aggregate(list_transform(
       |           generate_series(1, length(r)),
       |           i -> CASE WHEN substr(r, i, 1) BETWEEN 'A' AND 'Z'
       |                THEN CAST(ascii(substr(r, i, 1)) - 55 AS VARCHAR)
       |                ELSE substr(r, i, 1) END), 'string_agg', '') AS d
       |       FROM (SELECT doc_id,
       |               substr(s2, 5) || substr(s2, 1, 4) AS r
       |             FROM (SELECT doc_id, replace(c, ' ', '') AS s2
       |                   FROM cand) z) y),
       |l AS (SELECT doc_id,
       |        list_sum(list_transform(generate_series(1, length(d)),
       |          i -> CAST(substr(d, i, 1) AS BIGINT) *
       |               ($w)[(length(d) - i) % 96 + 1])) % 97 = 1 AS ok
       |      FROM ds),
       |a AS (SELECT doc_id, CAST(count(*) AS INT) AS n_cand,
       |        CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS INT) AS n_ok
       |      FROM l GROUP BY 1)
       |SELECT p.doc_id,
       |  coalesce(n_cand, 0) AS n_iban_candidates,
       |  coalesce(n_ok, 0) AS n_iban_valid,
       |  coalesce(n_ok, 0) > 0 AS has_valid_iban
       |FROM planted p LEFT JOIN a USING (doc_id)""".stripMargin
  }

  /** Corpus-mix rates for the stratified-sample query: throttle the
    * high-volume event types, keep every error. One map drives BOTH the
    * Spark filter and the oracle CASE, so the two can't drift.
    */
  private val stratRates = Map("view" -> 0.1, "click" -> 0.25, "error" -> 1.0)
  private val stratDefault = 0.5
  private val stratSalt = "mix1"

  private def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedHashSample(Tables.events(s, dir), "event_id",
        "event_type", stratRates, stratDefault, stratSalt)
      .select("event_id", "event_type", "user_id")

  private val stratifiedSampleSql = {
    val cases = stratRates.toSeq.sortBy(_._1).map { case (k, r) =>
      s"WHEN '$k' THEN '${Sampling.hexThreshold(r)}'"
    }.mkString("\n    ")
    s"""SELECT event_id, event_type, user_id FROM events
       |WHERE md5('$stratSalt:' || CAST(event_id AS VARCHAR)) <
       |  CASE event_type $cases
       |    ELSE '${Sampling.hexThreshold(stratDefault)}' END""".stripMargin
  }

  /** Gopher-style repetition filter signal: top-bigram fraction per doc. */
  private def repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(s, dir), "doc_id", "text")

  private val repetitionSql =
    """WITH b AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS l
      |           FROM documents),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(
      |           generate_series(1, greatest(length(l) - 1, 0)),
      |           i -> l[i] || ' ' || l[i + 1])) AS bigram
      |       FROM b),
      |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
      |agg AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac,
      |               CAST(sum(c) AS BIGINT) AS n_bigrams
      |        FROM cnt GROUP BY 1)
      |SELECT d.doc_id, coalesce(a.top_bigram_frac, 0.0) AS top_bigram_frac,
      |       coalesce(a.n_bigrams, 0) AS n_bigrams
      |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Corpus-wide top-25 word trigrams by document frequency — the
    * boilerplate/template-text detector. Each trigram counts once per
    * document; boundary ties break on the gram string so the selected
    * set replays exactly. See
    * [[graft.ops.TextAnalysis.topNgramsCorpus]].
    */
  private def topNgrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topNgramsCorpus(Tables.documents(s, dir), "doc_id", "text",
      n = 3, k = 25)

  private val topNgramsSql =
    """WITH b AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS l
      |           FROM documents),
      |tg AS (SELECT doc_id,
      |         unnest(list_transform(
      |           generate_series(1, greatest(length(l) - 2, 0)),
      |           i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS gram
      |       FROM b),
      |d AS (SELECT DISTINCT doc_id, gram FROM tg)
      |SELECT gram, count(*) AS doc_freq FROM d GROUP BY 1
      |ORDER BY doc_freq DESC, gram LIMIT 25""".stripMargin

  /** C4 line-level cleaning over a deterministically derived multi-line
    * form of the documents (the synthetic corpus is single-line and
    * punctuation-free, so — like `dedup_lines` — the query re-lines
    * each doc into 10-token lines and plants the crawl artifacts the
    * rules exist for: every 3rd line gets a terminal period, every 5th
    * a `{ad}` markup fragment, every 7th a "javascript" boilerplate
    * tail). All three C4 rules are therefore live: short/no-punct lines
    * drop, markup lines drop even when punctuated, boilerplate lines
    * drop on the marker. The planting is index arithmetic, so the whole
    * fixture and the cleanse replay in SQL. See
    * [[graft.ops.TextAnalysis.c4LineClean]].
    */
  private def textC4LineClean(s: SparkSession, dir: String): DataFrame = {
    val multi = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_join(transform(
          when(size(col("toks")) >= 1,
            sequence(lit(1), ceil(size(col("toks")) / lit(10.0)).cast("int")))
            .otherwise(array()),
          j => concat(
            array_join(slice(col("toks"), (j - 1) * 10 + 1, lit(10)), " "),
            when(j % 3 === 0, lit(".")).otherwise(lit("")),
            when(j % 5 === 0, lit(" {ad}")).otherwise(lit("")),
            when(j % 7 === 0, lit(" javascript required")).otherwise(lit("")))),
          "\n").as("text"))
    TextAnalysis.c4LineClean(multi, "doc_id", "text")
  }

  private val textC4LineCleanSql =
    """WITH b AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS toks
      |           FROM documents),
      |ml AS (SELECT doc_id,
      |         string_agg(
      |           array_to_string(
      |             list_slice(toks, (j-1)*10+1, (j-1)*10+10), ' ')
      |           || CASE WHEN j % 3 = 0 THEN '.' ELSE '' END
      |           || CASE WHEN j % 5 = 0 THEN ' {ad}' ELSE '' END
      |           || CASE WHEN j % 7 = 0 THEN ' javascript required'
      |              ELSE '' END,
      |           chr(10) ORDER BY j) AS text
      |       FROM (SELECT doc_id, toks,
      |               unnest(generate_series(1,
      |                 CAST(ceil(length(toks)/10.0) AS INT))) AS j
      |             FROM b)
      |       GROUP BY doc_id),
      |c AS (SELECT doc_id,
      |        list_transform(string_split(text, chr(10)), x -> trim(x))
      |          AS lines
      |      FROM ml),
      |k AS (SELECT doc_id, lines,
      |        list_filter(lines, t ->
      |          length(string_split_regex(t, '\s+')) >= 3
      |          AND regexp_matches(t, '[.!?"]$')
      |          AND NOT contains(t, '{')
      |          AND NOT contains(lower(t), 'lorem ipsum')
      |          AND NOT contains(lower(t), 'javascript')) AS kept
      |      FROM c)
      |SELECT doc_id, CAST(length(lines) AS INT) AS n_lines,
      |       CAST(length(kept) AS INT) AS n_kept,
      |       coalesce(array_to_string(kept, chr(10)), '') AS clean_text
      |FROM k""".stripMargin

  /** One pinned Lloyd iteration over the embeddings (the k-means
    * training step a clustering fit runs to convergence): nearest
    * pinned centroid by squared Euclidean distance, then per-cell
    * updated means, sizes, and inertia. Centroids are the same 16
    * evenly-strided corpus rows as the pinned IVF family, so the full
    * assignment → update step replays in SQL. See
    * [[graft.ops.Embeddings.kmeansUpdatePinned]].
    */
  private def embKmeansUpdate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embeddings.kmeansUpdatePinned(Tables.embeddings(s, dir),
      "vec_id", "embedding", centroidIds = ivfPinnedCentroids)

  /** Top principal component of the embedding corpus: 3 pinned power
    * iterations from the deterministic all-ones/sqrt(d) start — PCA as
    * pure joins + combinable aggregates, no driver-side vectors. See
    * [[graft.ops.Embeddings.pcaTopComponent]].
    */
  private def embPcaTop(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embeddings.pcaTopComponent(Tables.embeddings(s, dir),
      "vec_id", "embedding", iters = 3)

  private val embPcaTopSql =
    """WITH x AS (SELECT vec_id,
      |             generate_subscripts(embedding, 1) - 1 AS pos,
      |             unnest(embedding)::DOUBLE AS v
      |           FROM embeddings),
      |mu AS (SELECT pos, avg(v) AS mu FROM x GROUP BY 1),
      |c AS (SELECT x.vec_id, x.pos, x.v - mu.mu AS v FROM x JOIN mu USING (pos)),
      |dd AS (SELECT count(*)::DOUBLE AS d FROM mu),
      |nr AS (SELECT count(*)::DOUBLE AS nr FROM embeddings),
      |v0 AS (SELECT pos, 1.0 / sqrt(dd.d) AS w FROM mu CROSS JOIN dd),
      |s1 AS (SELECT c.vec_id, sum(c.v * v0.w) AS s FROM c JOIN v0 USING (pos) GROUP BY 1),
      |y1 AS (SELECT c.pos, sum(c.v * s1.s) AS y FROM c JOIN s1 USING (vec_id) GROUP BY 1),
      |n1 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y1),
      |v1 AS (SELECT pos, y / n1.nrm AS w FROM y1 CROSS JOIN n1),
      |s2 AS (SELECT c.vec_id, sum(c.v * v1.w) AS s FROM c JOIN v1 USING (pos) GROUP BY 1),
      |y2 AS (SELECT c.pos, sum(c.v * s2.s) AS y FROM c JOIN s2 USING (vec_id) GROUP BY 1),
      |n2 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y2),
      |v2 AS (SELECT pos, y / n2.nrm AS w FROM y2 CROSS JOIN n2),
      |s3 AS (SELECT c.vec_id, sum(c.v * v2.w) AS s FROM c JOIN v2 USING (pos) GROUP BY 1),
      |y3 AS (SELECT c.pos, sum(c.v * s3.s) AS y FROM c JOIN s3 USING (vec_id) GROUP BY 1),
      |n3 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y3),
      |v3 AS (SELECT pos, y / n3.nrm AS w FROM y3 CROSS JOIN n3),
      |lam AS (SELECT sum(v2.w * y3.y) AS lam FROM v2 JOIN y3 USING (pos))
      |SELECT v3.pos, round(v3.w, 6) AS loading,
      |       round(lam.lam / nr.nr, 6) AS eigval
      |FROM v3 CROSS JOIN lam CROSS JOIN nr""".stripMargin

  /** Greedy farthest-first k-center coreset over the embedding table,
    * k = 8 from the lowest vec_id — the diversity sample plus its
    * coverage-radius curve. See
    * [[graft.ops.Embeddings.kCenterCoreset]].
    */
  private def embKcenter(s: SparkSession, dir: String): DataFrame =
    Embeddings.kCenterCoreset(Tables.embeddings(s, dir), "vec_id",
      "embedding", k = 8)

  private val embKcenterSql = {
    val k = 8
    def sqd(p: String, c: String) =
      s"""round(list_sum(list_transform(
         |          generate_series(1, length($p)),
         |          i -> ($p[i] - $c[i]) * ($p[i] - $c[i]))), 6)""".stripMargin
    val rounds = (2 to k).map { r =>
      val tail =
        if (r == k) ""
        else s""",
           |d$r AS MATERIALIZED (SELECT d.vid, d.v,
           |  least(d.dmin, ${sqd("d.v", s"s$r.v")}) AS dmin
           |  FROM d${r - 1} d CROSS JOIN s$r)""".stripMargin
      s"""s$r AS (SELECT vid, v, dmin FROM d${r - 1}
         |  ORDER BY dmin DESC, vid ASC LIMIT 1)$tail""".stripMargin
    }.mkString(",\n")
    val out = (2 to k).map { r =>
      s"UNION ALL SELECT $r, vid, dmin FROM s$r"
    }.mkString("\n")
    s"""WITH v AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |s1 AS (SELECT vid, v FROM v
       |       WHERE vid = (SELECT min(vid) FROM v)),
       |d1 AS MATERIALIZED (SELECT p.vid, p.v,
       |  ${sqd("p.v", "s1.v")} AS dmin
       |  FROM v p CROSS JOIN s1),
       |$rounds
       |SELECT 1 AS sel_rank, vid AS vec_id, 0.0 AS d_at_selection
       |FROM s1
       |$out""".stripMargin
  }

  private val embKmeansUpdateSql = {
    val cids = (0 until 16).map(_ * 31L).mkString(", ")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |c AS (SELECT id AS cid, v AS cv FROM v WHERE id IN ($cids)),
       |d AS (SELECT v.id, c.cid, v.v,
       |        round(list_sum(list_transform(
       |          generate_series(1, length(v.v)),
       |          i -> (v.v[i] - c.cv[i]) * (v.v[i] - c.cv[i]))), 6) AS sd
       |      FROM v CROSS JOIN c),
       |a AS (SELECT id, cid AS cell, sd, v FROM (
       |        SELECT *, row_number() OVER
       |          (PARTITION BY id ORDER BY sd, cid) AS rn FROM d) t
       |      WHERE rn = 1),
       |cs AS (SELECT cell, count(*) AS n, round(sum(sd), 6) AS inertia
       |       FROM a GROUP BY 1),
       |m AS (SELECT cell, CAST(i - 1 AS INT) AS pos,
       |        round(avg(v[CAST(i AS INT)]), 6) AS c_new
       |      FROM (SELECT cell, v,
       |              unnest(generate_series(1, length(v))) AS i
       |            FROM a) u
       |      GROUP BY 1, 2)
       |SELECT m.cell, m.pos, cs.n, m.c_new, cs.inertia
       |FROM m JOIN cs USING (cell)""".stripMargin
  }

  /** LSH recall audit at tau 0.5: exact df-capped Jaccard pairs vs the
    * banded MinHash pipeline, blind spots counted both ways. The exact
    * side reuses `dedup_ngram_jaccard`'s oracle filtered to 0.5 (its
    * own tau is 0.3, so the subset is free); the LSH side composes
    * `dedup_minhash_lsh`'s oracle verbatim. See
    * [[graft.ops.Dedup.lshRecallAudit]].
    */
  private def lshRecallAudit(s: SparkSession, dir: String): DataFrame =
    Dedup.lshRecallAudit(Tables.documents(s, dir), "doc_id", "text",
      numHashes = 32, bands = 8, k = 8, dfCap = 20, tau = 0.5)

  private lazy val lshRecallAuditSql =
    s"""WITH ex AS (SELECT id1, id2 FROM ($jaccardPairsSql) e
       |            WHERE jaccard >= 0.5),
       |ls AS (SELECT id1, id2 FROM ($minhashLshSql) l),
       |j AS (SELECT coalesce(ex.id1, ls.id1) AS id1,
       |             ex.id1 IS NOT NULL AS in_ex,
       |             ls.id1 IS NOT NULL AS in_ls
       |      FROM ex FULL OUTER JOIN ls
       |        ON ex.id1 = ls.id1 AND ex.id2 = ls.id2)
       |SELECT CAST(count(*) FILTER (in_ex) AS BIGINT) AS n_exact,
       |       CAST(count(*) FILTER (in_ls) AS BIGINT) AS n_lsh,
       |       CAST(count(*) FILTER (in_ex AND in_ls) AS BIGINT) AS n_both,
       |       CAST(count(*) FILTER (in_ex AND NOT in_ls) AS BIGINT)
       |         AS exact_only,
       |       CAST(count(*) FILTER (in_ls AND NOT in_ex) AS BIGINT)
       |         AS lsh_only,
       |       CASE WHEN count(*) FILTER (in_ex) > 0
       |            THEN round(CAST(count(*) FILTER (in_ex AND in_ls)
       |                   AS DOUBLE) / count(*) FILTER (in_ex), 6)
       |       END AS recall_vs_exact
       |FROM j""".stripMargin

  /** Matryoshka truncation audit: recall@10 of cosine top-10 under the
    * first 8/16/32 of 64 dims vs the full vectors. The probe set is
    * FIXED-COUNT (every 50th vec_id below 2000 — ≤ 40 probes at any
    * corpus size): a fraction-of-corpus predicate would grow the probe
    * side linearly and the brute-force pair scan quadratically, when
    * the audit's statistical power needs only a constant sample. See
    * [[graft.ops.Similarity.matryoshkaRecall]].
    */
  /** Ratio-margin candidate mining (Artetxe-Schwenk) over a fixed
    * probe batch (every 100th vector below 2000 — ≤ 20 probes at any
    * corpus size): top-5 neighbors per probe ranked by cosine relative
    * to both sides' mean top-10 neighborhoods, the hub-robust
    * criterion bitext mining uses instead of a raw threshold. Margins
    * clear denominators into exact ×10⁶ integer arithmetic with one
    * final double division, so the oracle replays bit-for-bit. See
    * [[graft.ops.Similarity.marginMine]].
    */
  private def embMarginMine(s: SparkSession, dir: String): DataFrame =
    Similarity.marginMine(Tables.embeddings(s, dir), "vec_id", "embedding",
      col("vec_id") % 100 === 0 && col("vec_id") < 2000, k = 5, knn = 10)

  private val embMarginMineSql =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
      |           FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |      FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 2000),
      |s AS (SELECT q.query_id, v.id,
      |        CAST(round(list_cosine_similarity(q.qv, v.v) * 1e6)
      |          AS BIGINT) AS c6
      |      FROM v CROSS JOIN q WHERE v.id != q.query_id),
      |w AS (SELECT query_id, id, c6,
      |        row_number() OVER (PARTITION BY query_id
      |          ORDER BY c6 DESC, id) AS rq,
      |        row_number() OVER (PARTITION BY id
      |          ORDER BY c6 DESC, query_id) AS rx
      |      FROM s),
      |p AS (SELECT query_id, id, c6,
      |        CAST(sum(CASE WHEN rq <= 10 THEN c6 ELSE 0 END)
      |          OVER (PARTITION BY query_id) AS BIGINT) AS fsum,
      |        CAST(sum(CASE WHEN rq <= 10 THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY query_id) AS BIGINT) AS fk,
      |        CAST(sum(CASE WHEN rx <= 10 THEN c6 ELSE 0 END)
      |          OVER (PARTITION BY id) AS BIGINT) AS bsum,
      |        CAST(sum(CASE WHEN rx <= 10 THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY id) AS BIGINT) AS bk
      |      FROM w),
      |m AS (SELECT query_id, id, c6,
      |        round(CAST(c6 * 2 * fk * bk AS DOUBLE) /
      |              CAST(fsum * bk + bsum * fk AS DOUBLE), 6) AS margin
      |      FROM p WHERE fsum * bk + bsum * fk > 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY margin DESC, id) AS rank
      |      FROM m)
      |SELECT query_id, id AS neighbor_id,
      |       round(CAST(c6 AS DOUBLE) / 1e6, 6) AS cosine, margin,
      |       CAST(rank AS INT) AS rank
      |FROM r WHERE rank <= 5""".stripMargin

  /** Hard-negative mining audit over the knn probe batch (every 10th
    * vector below 2000 — fixed O(1) batch): nearest same-label vs
    * nearest other-label cosine and the margin; negative margin flags
    * the triplet-mining / label-noise candidates. See
    * [[graft.ops.Similarity.hardNegatives]].
    */
  private def embHardNegatives(s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables.embeddings(s, dir), "vec_id",
      "embedding", "label",
      col("vec_id") % 10 === 0 && col("vec_id") < 2000)

  private val embHardNegativesSql =
    """WITH v AS (SELECT vec_id AS id, embedding, label FROM embeddings),
      |q AS (SELECT id AS query_id, embedding AS qv, label AS qlbl
      |      FROM v WHERE id % 10 = 0 AND id < 2000),
      |sc AS (SELECT q.query_id, q.qlbl, v.id,
      |         v.label = q.qlbl AS same,
      |         round(list_cosine_similarity(q.qv::DOUBLE[],
      |           v.embedding::DOUBLE[]), 6) AS cos
      |       FROM v CROSS JOIN q WHERE v.id != q.query_id),
      |r AS (SELECT query_id, qlbl, same, id, cos,
      |        row_number() OVER (PARTITION BY query_id, same
      |                           ORDER BY cos DESC, id) AS rn
      |      FROM sc),
      |b AS (SELECT query_id, qlbl,
      |        max(CASE WHEN same AND rn = 1 THEN id END) AS pos_id,
      |        max(CASE WHEN same AND rn = 1 THEN cos END) AS pos_cos,
      |        max(CASE WHEN NOT same AND rn = 1 THEN id END) AS neg_id,
      |        max(CASE WHEN NOT same AND rn = 1 THEN cos END) AS neg_cos
      |      FROM r GROUP BY 1, 2)
      |SELECT query_id, qlbl AS label, pos_id, pos_cos, neg_id, neg_cos,
      |  round(pos_cos - neg_cos, 6) AS margin,
      |  round(pos_cos - neg_cos, 6) < 0 AS is_hard
      |FROM b""".stripMargin

  /** k-NN (k=5) majority-vote label eval over every 10th vector below
    * 2000 (fixed ≤200 eval points — the matryoshka cap argument: eval
    * power needs a constant sample, and the uncapped fraction-of-corpus
    * predicate measured 7.8× for 10× data in the r8 sf1 bench). See
    * [[graft.ops.Embeddings.knnClassifierEval]].
    */
  private def embKnnEval(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embeddings.knnClassifierEval(Tables.embeddings(s, dir),
      "vec_id", "embedding", "label",
      col("vec_id") % 10 === 0 && col("vec_id") < 2000, k = 5)

  private val embKnnEvalSql =
    """WITH v AS (SELECT vec_id AS id, embedding, label FROM embeddings),
      |q AS (SELECT id AS qid, embedding AS qv, label AS true_label
      |      FROM v WHERE id % 10 = 0 AND id < 2000),
      |sc AS (SELECT q.qid, q.true_label, v.id, v.label AS lbl,
      |         round(list_cosine_similarity(q.qv::DOUBLE[],
      |           v.embedding::DOUBLE[]), 6) AS cos
      |       FROM v CROSS JOIN q WHERE v.id != q.qid),
      |top AS (SELECT qid, true_label, lbl FROM (
      |          SELECT qid, true_label, lbl, row_number() OVER (
      |            PARTITION BY qid ORDER BY cos DESC, id) AS rn
      |          FROM sc) WHERE rn <= 5),
      |votes AS (SELECT qid, true_label, lbl, count(*) AS votes
      |          FROM top GROUP BY 1, 2, 3),
      |pred AS (SELECT true_label, lbl AS pred_label FROM (
      |           SELECT *, row_number() OVER (
      |             PARTITION BY qid ORDER BY votes DESC, lbl) AS vr
      |           FROM votes) WHERE vr = 1),
      |conf AS (SELECT true_label, pred_label, count(*) AS cnt
      |         FROM pred GROUP BY 1, 2),
      |acc AS (SELECT CAST(sum(CASE WHEN true_label = pred_label
      |                             THEN cnt ELSE 0 END) AS DOUBLE)
      |               / sum(cnt) AS acc
      |        FROM conf)
      |SELECT conf.true_label, conf.pred_label, conf.cnt,
      |       round(acc.acc, 6) AS accuracy
      |FROM conf CROSS JOIN acc""".stripMargin

  /** Two full-batch logistic-regression epochs (label 0 vs rest,
    * lr 0.1) over the embeddings — the data-parallel allreduce training
    * shape; see [[graft.ops.Embeddings.logregEpochs]]. The oracle
    * unrolls both epochs as CTEs against the same 6dp weight pins.
    */
  private def embLogreg(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embeddings.logregEpochs(Tables.embeddings(s, dir),
      "embedding", "label", posLabel = 0, lr = 0.1, epochs = 2)

  private val embLogregSql =
    """WITH e AS (SELECT embedding::DOUBLE[] AS x,
      |             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      |           FROM embeddings),
      |g1 AS (SELECT d, round(0.0 - 0.1 * avg((0.5 - y) * x[d]), 6) AS w
      |       FROM e CROSS JOIN range(1, 65) t(d) GROUP BY 1),
      |b1 AS (SELECT round(0.0 - 0.1 * avg(0.5 - y), 6) AS b FROM e),
      |w1 AS (SELECT list(w ORDER BY d) AS w FROM g1),
      |p2 AS (SELECT x, y,
      |         1.0 / (1.0 + exp(-(list_dot_product(x, w1.w) + b1.b)))
      |           AS p
      |       FROM e CROSS JOIN w1 CROSS JOIN b1),
      |g2 AS (SELECT t.d,
      |         round(g1.w - 0.1 * avg((p - y) * x[t.d]), 6) AS w
      |       FROM p2 CROSS JOIN range(1, 65) t(d)
      |       JOIN g1 ON g1.d = t.d GROUP BY t.d, g1.w),
      |b2 AS (SELECT round(b1.b - 0.1 * avg(p - y), 6) AS b
      |       FROM p2 CROSS JOIN b1 GROUP BY b1.b),
      |w2 AS (SELECT list(w ORDER BY d) AS w FROM g2),
      |m3 AS (SELECT y, list_dot_product(x, w2.w) + b2.b AS m
      |       FROM e CROSS JOIN w2 CROSS JOIN b2),
      |p3 AS (SELECT y, m, 1.0 / (1.0 + exp(-m)) AS p FROM m3),
      |met AS (SELECT
      |          round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6)
      |            AS logloss,
      |          round(CAST(sum(CASE WHEN (m >= 0) = (y = 1.0)
      |                              THEN 1 ELSE 0 END) AS DOUBLE)
      |                / count(*), 6) AS accuracy
      |        FROM p3)
      |SELECT CAST(g2.d - 1 AS INT) AS pos, g2.w AS weight,
      |       round(b2.b, 6) AS bias, met.logloss, met.accuracy
      |FROM g2 CROSS JOIN b2 CROSS JOIN met""".stripMargin

  /** MMR diversified rerank of the brute top-20 (k=8, λ=0.7/0.3) —
    * see [[graft.ops.Similarity.mmrRerank]]. The oracle replays the
    * greedy path with a recursive CTE over the identical packed
    * candidate/sim arrays and 6dp score pins. Query batch capped below
    * 2000 (fixed 20 queries — uncapped `% 100` measured 6.7× for 10×
    * data in the r8 sf1 bench; a rerank batch is O(1) in the corpus).
    */
  private def searchMmr(s: SparkSession, dir: String): DataFrame =
    Similarity.mmrRerank(Tables.embeddings(s, dir), "vec_id", "embedding",
      col("vec_id") % 100 === 0 && col("vec_id") < 2000, m = 20, k = 8,
      lambdaRel = 0.7, lambdaDiv = 0.3)

  private val searchMmrSql =
    """WITH RECURSIVE v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
      |           FROM embeddings),
      |q AS (SELECT id AS query_id, v AS qv
      |      FROM v WHERE id % 100 = 0 AND id < 2000),
      |sc AS MATERIALIZED (
      |  SELECT q.query_id, v.id,
      |         round(list_cosine_similarity(q.qv, v.v), 6) AS rel
      |  FROM v CROSS JOIN q WHERE v.id != q.query_id),
      |cand AS MATERIALIZED (
      |  SELECT query_id, id, rel FROM (
      |    SELECT query_id, id, rel, row_number() OVER (
      |      PARTITION BY query_id ORDER BY rel DESC, id) AS rn
      |    FROM sc) WHERE rn <= 20),
      |cv AS (SELECT c.query_id, c.id, v.v FROM cand c JOIN v USING (id)),
      |sims AS MATERIALIZED (
      |  SELECT a.query_id, a.id AS sa, b.id AS sb,
      |         round(list_cosine_similarity(a.v, b.v), 6) AS s
      |  FROM cv a JOIN cv b ON a.query_id = b.query_id AND a.id != b.id),
      |ca AS (SELECT query_id,
      |         list({'id': id,
      |               'rs': CAST(round(rel * 1000000.0, 0) AS BIGINT)}
      |              ORDER BY id) AS cands
      |       FROM cand GROUP BY 1),
      |sa AS (SELECT query_id,
      |         list({'a': sa, 'b': sb,
      |               'ss': CAST(round(s * 1000000.0, 0) AS BIGINT)}
      |              ORDER BY sa, sb) AS sims
      |       FROM sims GROUP BY 1),
      |h AS (
      |  SELECT ca.query_id, 0 AS step, []::BIGINT[] AS sel,
      |         []::STRUCT(id BIGINT, rnk INT, sc BIGINT)[] AS out,
      |         ca.cands,
      |         coalesce(sa.sims,
      |           []::STRUCT(a BIGINT, b BIGINT, ss BIGINT)[]) AS sims
      |  FROM ca LEFT JOIN sa USING (query_id)
      |  UNION ALL
      |  SELECT query_id, step + 1,
      |         list_concat(sel, [-best.ni]),
      |         list_concat(out,
      |           [{'id': -best.ni, 'rnk': (step + 1)::INT,
      |             'sc': best.sc}]),
      |         cands, sims
      |  FROM (
      |    SELECT *, list_max(list_transform(
      |        list_filter(cands, c -> NOT list_contains(sel, c.id)),
      |        c -> {'sc': 70 * c.rs - 30 * coalesce(
      |                list_max(list_transform(list_filter(sims,
      |                  p -> p.a = c.id AND list_contains(sel, p.b)),
      |                  p -> p.ss)), 0),
      |              'ni': -c.id})) AS best
      |    FROM h WHERE step < 8)),
      |fin AS (SELECT query_id, unnest(out) AS u FROM h WHERE step = 8)
      |SELECT query_id, u.id AS neighbor_id, u.rnk AS rank,
      |       CAST(u.sc AS DOUBLE) / 100000000.0 AS score
      |FROM fin""".stripMargin

  /** MaxSim late-interaction top-k: the 64-dim embedding read as 8
    * sub-vectors of 8 dims, score = Σ_i max_j cos(q_i, d_j) — see
    * [[graft.ops.Similarity.maxSimTopK]]. Queries: every 100th vector
    * BELOW 2000 (`embMatryoshka`'s cap pattern) — a retrieval query
    * BATCH is O(1) in the corpus, and the r8 sf1 bench measured the
    * uncapped `% 100` predicate growing the batch with the corpus into
    * n²/100 total work (159 s at sf1, 53× for 10× data). Capped, the
    * scan is linear in the corpus like every other probe query.
    */
  private def simMaxsim(s: SparkSession, dir: String): DataFrame =
    Similarity.maxSimTopK(Tables.embeddings(s, dir), "vec_id",
      "embedding", col("vec_id") % 100 === 0 && col("vec_id") < 2000,
      subDim = 8, nSub = 8, k = 10)

  private val simMaxsimSql = {
    val score = (0 until 8).map { i =>
      val (qlo, qhi) = (i * 8 + 1, i * 8 + 8)
      "greatest(" + (0 until 8).map { j =>
        val (dlo, dhi) = (j * 8 + 1, j * 8 + 8)
        s"round(list_cosine_similarity((q.qv[$qlo:$qhi])::DOUBLE[], " +
          s"(v.embedding[$dlo:$dhi])::DOUBLE[]), 6)"
      }.mkString(", ") + ")"
    }.mkString(" + ")
    s"""WITH v AS (SELECT vec_id AS id, embedding FROM embeddings),
       |q AS (SELECT id AS query_id, embedding AS qv FROM v
       |      WHERE id % 100 = 0 AND id < 2000),
       |sc AS (SELECT q.query_id, v.id AS neighbor_id,
       |         round($score, 6) AS maxsim
       |       FROM v CROSS JOIN q WHERE v.id != q.query_id),
       |r AS (SELECT query_id, neighbor_id, maxsim, row_number() OVER (
       |        PARTITION BY query_id ORDER BY maxsim DESC, neighbor_id)
       |        AS rank
       |      FROM sc)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, maxsim
       |FROM r WHERE rank <= 10""".stripMargin
  }

  private def embMatryoshka(s: SparkSession, dir: String): DataFrame =
    Similarity.matryoshkaRecall(Tables.embeddings(s, dir), "vec_id",
      "embedding", col("vec_id") % 50 === 0 && col("vec_id") < 2000,
      k = 10, dims = Seq(8, 16, 32))

  private val embMatryoshkaSql =
    """WITH v AS (SELECT vec_id AS id, embedding FROM embeddings),
      |q AS (SELECT id AS query_id, embedding AS qv FROM v
      |      WHERE id % 50 = 0 AND id < 2000),
      |sc AS (
      |  SELECT q.query_id, v.id AS nid,
      |    round(list_cosine_similarity(q.qv::DOUBLE[],
      |      v.embedding::DOUBLE[]), 6) AS sf,
      |    round(list_cosine_similarity((q.qv[1:8])::DOUBLE[],
      |      (v.embedding[1:8])::DOUBLE[]), 6) AS s8,
      |    round(list_cosine_similarity((q.qv[1:16])::DOUBLE[],
      |      (v.embedding[1:16])::DOUBLE[]), 6) AS s16,
      |    round(list_cosine_similarity((q.qv[1:32])::DOUBLE[],
      |      (v.embedding[1:32])::DOUBLE[]), 6) AS s32
      |  FROM v CROSS JOIN q WHERE v.id != q.query_id),
      |f AS (SELECT query_id, nid FROM (
      |        SELECT query_id, nid, row_number() OVER (
      |          PARTITION BY query_id ORDER BY sf DESC, nid) AS rn
      |        FROM sc) t WHERE rn <= 10),
      |u AS (
      |  SELECT 8 AS td, query_id, nid FROM (
      |    SELECT query_id, nid, row_number() OVER (
      |      PARTITION BY query_id ORDER BY s8 DESC, nid) AS rn
      |    FROM sc) t WHERE rn <= 10
      |  UNION ALL
      |  SELECT 16, query_id, nid FROM (
      |    SELECT query_id, nid, row_number() OVER (
      |      PARTITION BY query_id ORDER BY s16 DESC, nid) AS rn
      |    FROM sc) t WHERE rn <= 10
      |  UNION ALL
      |  SELECT 32, query_id, nid FROM (
      |    SELECT query_id, nid, row_number() OVER (
      |      PARTITION BY query_id ORDER BY s32 DESC, nid) AS rn
      |    FROM sc) t WHERE rn <= 10),
      |h AS (SELECT u.td, u.query_id, count(*) AS hits
      |      FROM u JOIN f ON u.query_id = f.query_id AND u.nid = f.nid
      |      GROUP BY 1, 2),
      |spine AS (SELECT CAST(d.td AS INT) AS td, q.query_id
      |          FROM (SELECT unnest([8, 16, 32]) AS td) d CROSS JOIN q)
      |SELECT spine.td AS trunc_dim,
      |       CAST(count(*) AS BIGINT) AS n_queries,
      |       round(CAST(sum(coalesce(h.hits, 0)) AS DOUBLE)
      |             / (count(*) * 10), 6) AS recall_at_k
      |FROM spine LEFT JOIN h ON h.td = spine.td
      |                      AND h.query_id = spine.query_id
      |GROUP BY 1""".stripMargin

  /** Nearest-centroid classifier eval over the label centroids:
    * confusion matrix + resubstitution accuracy. See
    * [[graft.ops.Embeddings.centroidClassifierEval]].
    */
  private def embCentroidEval(s: SparkSession, dir: String): DataFrame =
    Embeddings.centroidClassifierEval(Tables.embeddings(s, dir), "vec_id",
      "embedding", "label")

  private val embCentroidEvalSql =
    """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
      |                  label AS tl FROM embeddings),
      |cm AS (SELECT label AS cl, CAST(i - 1 AS INT) AS pos,
      |         round(avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)), 6)
      |           AS c
      |       FROM (SELECT label, embedding,
      |               unnest(generate_series(1, length(embedding))) AS i
      |             FROM embeddings) u
      |       GROUP BY 1, 2),
      |cent AS (SELECT cl, list(c ORDER BY pos) AS cv FROM cm GROUP BY 1),
      |d AS (SELECT v.id, v.tl, cent.cl,
      |        round(list_sum(list_transform(
      |          generate_series(1, length(v.v)),
      |          i -> (v.v[i] - cent.cv[i]) * (v.v[i] - cent.cv[i]))), 6)
      |          AS sd
      |      FROM v CROSS JOIN cent),
      |a AS (SELECT tl, cl AS pl FROM (
      |        SELECT tl, cl, row_number() OVER (
      |          PARTITION BY id ORDER BY sd, cl) AS rn FROM d) t
      |      WHERE rn = 1),
      |conf AS (SELECT tl AS true_label, pl AS pred_label,
      |                CAST(count(*) AS BIGINT) AS cnt
      |         FROM a GROUP BY 1, 2),
      |acc AS (SELECT CAST(sum(CASE WHEN true_label = pred_label
      |                 THEN cnt ELSE 0 END) AS DOUBLE)
      |               / CAST(sum(cnt) AS BIGINT) AS a
      |        FROM conf)
      |SELECT true_label, pred_label, cnt, round(acc.a, 6) AS accuracy
      |FROM conf CROSS JOIN acc""".stripMargin

  /** Top-40 collocations by PMI with a support floor of 5 occurrences —
    * the frequency-independent complement of `text_top_ngrams`. The PMI
    * ratio is evaluated in the same left-to-right order on both sides
    * (BIGINT product first, all later steps IEEE-double), and the oracle
    * pins `sum(bc)` back to BIGINT so the division promotes identically;
    * 6dp rounding absorbs libm log2 ulp differences. See
    * [[graft.ops.TextAnalysis.pmiCollocations]].
    */
  private def pmiColloc(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(Tables.documents(s, dir), "text",
      minCount = 5, k = 40)

  private val pmiCollocSql =
    """WITH t AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS ts
      |           FROM documents),
      |toks AS (SELECT unnest(ts) AS tok FROM t),
      |uni AS (SELECT tok, count(*) AS uc FROM toks GROUP BY 1),
      |ntok AS (SELECT count(*) AS n FROM toks),
      |bi AS (SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT) + 1] AS w2
      |       FROM (SELECT ts, unnest(generate_series(1, length(ts) - 1)) AS i
      |             FROM t WHERE length(ts) >= 2) u),
      |bg AS (SELECT w1, w2, count(*) AS bc FROM bi GROUP BY 1, 2),
      |nbi AS (SELECT CAST(sum(bc) AS BIGINT) AS nb FROM bg)
      |SELECT w1, w2, bc,
      |       round(log2(bc * ntok.n / nbi.nb * ntok.n / c1.uc / c2.uc), 6)
      |         AS pmi
      |FROM bg JOIN uni c1 ON c1.tok = bg.w1
      |JOIN uni c2 ON c2.tok = bg.w2
      |CROSS JOIN ntok CROSS JOIN nbi
      |WHERE bc >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 40""".stripMargin

  /** Per-document TF-IDF top terms (k=3), smoothed scikit-learn IDF.
    * Scores are rounded to 6dp BEFORE the window ranking on both sides
    * so Spark and DuckDB order identically; ties break on the term.
    */
  private def tfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text",
      k = 3)

  private val tfidfTopTermsSql =
    """WITH tf AS (SELECT doc_id, t AS term, count(*) AS tf
      |            FROM (SELECT doc_id,
      |                    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
      |                  FROM documents) u
      |            WHERE t <> ''
      |            GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (SELECT doc_id, term, tf,
      |             round(tf * (ln((n.n + 1) * 1.0 / (df + 1)) + 1), 6) AS score
      |           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |             ORDER BY score DESC, term ASC) AS INT) AS rank
      |           FROM scored)
      |SELECT doc_id, term, tf, score, rank FROM ranked WHERE rank <= 3""".stripMargin

  /** Corpus Zipf fit over the top-100 terms: slope/intercept of
    * ln(freq) vs ln(rank). The oracle's `regr_slope`/`regr_intercept`
    * are the same population-moment formulas; both sides round to 6dp
    * (the two engines' one-pass moment sums agree far beyond that).
    */
  private def zipfFit(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusZipfFit(Tables.documents(s, dir), "text", topV = 100)

  private val zipfFitSql =
    """WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)),
      |                            '\s+')) AS t
      |              FROM documents),
      |tf AS (SELECT t AS term, count(*) AS freq FROM toks
      |       WHERE t <> '' GROUP BY 1),
      |top AS (SELECT term, freq, row_number() OVER
      |          (ORDER BY freq DESC, term) AS rank
      |        FROM tf ORDER BY freq DESC, term LIMIT 100),
      |xy AS (SELECT ln(rank) AS x, ln(freq) AS y FROM top)
      |SELECT count(*) AS n_terms,
      |       round(regr_slope(y, x), 6) AS zipf_slope,
      |       round(regr_intercept(y, x), 6) AS zipf_intercept
      |FROM xy""".stripMargin

  /** Quality-gate threshold sweep over the lmScore deciles: docs and
    * tokens kept per candidate gate. The oracle composes the proven
    * per-doc lmScore SQL with quantile_cont thresholds (p written as
    * CAST(d AS DOUBLE)/10 to match Scala's d/10.0 bit-for-bit). See
    * [[graft.ops.TextAnalysis.qualityGateSweep]].
    */
  private def docQualitySweep(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityGateSweep(Tables.documents(s, dir), "doc_id",
      "text")

  private lazy val docQualitySweepSql =
    s"""WITH sc AS (SELECT doc_id, lm_score FROM ($lmScoreSql) z),
       |tok AS (SELECT doc_id,
       |          CAST(length(string_split_regex(lower(trim(text)),
       |            '\\s+')) AS BIGINT) AS ntok
       |        FROM documents),
       |j AS (SELECT sc.doc_id, sc.lm_score, tok.ntok
       |      FROM sc JOIN tok USING (doc_id)),
       |q AS (SELECT quantile_cont(lm_score, [${(1 to 9)
                .map(d => s"CAST($d AS DOUBLE) / 10").mkString(", ")}])
       |        AS qs
       |      FROM j),
       |thr AS (SELECT d, round(qs[d], 6) AS t
       |        FROM q CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6),
       |                                  (7), (8), (9)) dd(d)),
       |tot AS (SELECT count(*) AS nd, CAST(sum(ntok) AS BIGINT) AS nt
       |        FROM j)
       |SELECT CAST(thr.d AS INT) AS decile, thr.t AS threshold,
       |  CAST(coalesce(sum(CASE WHEN j.lm_score > thr.t THEN 1 END), 0)
       |    AS BIGINT) AS n_docs_kept,
       |  CAST(coalesce(sum(CASE WHEN j.lm_score > thr.t THEN j.ntok END),
       |    0) AS BIGINT) AS n_tokens_kept,
       |  round(CAST(coalesce(sum(CASE WHEN j.lm_score > thr.t THEN 1 END),
       |      0) AS DOUBLE) / CAST(tot.nd AS DOUBLE), 6) AS frac_docs,
       |  round(CAST(coalesce(sum(CASE WHEN j.lm_score > thr.t
       |        THEN j.ntok END), 0) AS DOUBLE) / CAST(tot.nt AS DOUBLE), 6)
       |    AS frac_tokens
       |FROM j CROSS JOIN thr CROSS JOIN tot
       |GROUP BY thr.d, thr.t, tot.nd, tot.nt""".stripMargin

  /** FIM (fill-in-the-middle) augmentation over half the corpus at
    * minChars=40, PSM rendering — the code-model training transform.
    * The oracle replays the md5 participation coin and both md5 cut
    * points. See [[graft.ops.TextAnalysis.fimSplit]].
    */
  private def fimSplitQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fimSplit(Tables.documents(s, dir), "doc_id", "text",
      rate = 0.5, minChars = 40)

  private lazy val fimSplitSql = {
    val thr = graft.ops.Sampling.hexThreshold(0.5)
    s"""WITH b AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
       |    md5('fim:' || CAST(doc_id AS VARCHAR)) < '$thr'
       |      AND length(text) >= 40 AS sel,
       |    CAST('0x' || substr(md5('fim-cut:' || CAST(doc_id AS VARCHAR)),
       |      1, 8) AS BIGINT) % greatest(length(text) - 1, 1) + 1 AS c1,
       |    CAST('0x' || substr(md5('fim-cut:' || CAST(doc_id AS VARCHAR)),
       |      9, 8) AS BIGINT) % greatest(length(text) - 1, 1) + 1 AS c2
       |  FROM documents),
       |c AS (SELECT doc_id, text, len, sel,
       |        least(c1, c2) AS lo, greatest(c1, c2) AS hi
       |      FROM b)
       |SELECT doc_id, sel AS fim_applied,
       |  CAST(CASE WHEN sel THEN lo ELSE len END AS BIGINT) AS prefix_len,
       |  CAST(CASE WHEN sel THEN hi - lo ELSE 0 END AS BIGINT)
       |    AS middle_len,
       |  CAST(CASE WHEN sel THEN len - hi ELSE 0 END AS BIGINT)
       |    AS suffix_len,
       |  CASE WHEN sel THEN '<PRE>' || substr(text, 1, CAST(lo AS INT))
       |    || '<SUF>' || substr(text, CAST(hi + 1 AS INT))
       |    || '<MID>' || substr(text, CAST(lo + 1 AS INT),
       |         CAST(hi - lo AS INT))
       |  ELSE text END AS transformed
       |FROM c""".stripMargin
  }

  /** Vocabulary coverage / OOV-rate curve at word-vocab sizes
    * {100, 300, 1000, 3000, 10000} — the tokenizer-sizing companion to
    * `text_zipf_fit`. See [[graft.ops.TextAnalysis.vocabCoverage]].
    */
  private def vocabCoverageQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(Tables.documents(s, dir), "text",
      vocabSizes = Seq(100, 300, 1000, 3000, 10000))

  private val vocabCoverageSql =
    """WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)),
      |                            '\s+')) AS t
      |              FROM documents),
      |tf AS (SELECT t AS term, count(*) AS freq FROM toks
      |       WHERE t <> '' GROUP BY 1),
      |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total_tokens FROM tf),
      |top AS (SELECT freq, row_number() OVER
      |          (ORDER BY freq DESC, term) AS rank
      |        FROM tf ORDER BY freq DESC, term LIMIT 10000),
      |cum AS (SELECT rank, CAST(sum(freq) OVER (ORDER BY rank) AS BIGINT)
      |          AS cum
      |        FROM top),
      |mx AS (SELECT max(rank) AS mr FROM cum)
      |SELECT CAST(v.v AS INT) AS vocab_size, c.cum AS covered_tokens,
      |       t.total_tokens,
      |       round(CAST(t.total_tokens - c.cum AS DOUBLE) /
      |             CAST(t.total_tokens AS DOUBLE), 6) AS oov_rate
      |FROM (VALUES (100), (300), (1000), (3000), (10000)) v(v)
      |CROSS JOIN mx CROSS JOIN tot t
      |JOIN cum c ON c.rank = least(v.v, mx.mr)""".stripMargin

  /** Hill tail-index of the token-frequency distribution, k=50 — the
    * heavy-tail exponent companion to `text_zipf_fit`. Per-term ln(f)
    * is ×10⁹-BIGINT-pinned before summing; γ̂/α̂ are single fixed-order
    * expressions mirrored verbatim in the oracle. See
    * [[graft.ops.TextAnalysis.hillTailIndex]].
    */
  private def hillTail(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hillTailIndex(Tables.documents(s, dir), "text", k = 50)

  private val hillTailSql =
    """WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)),
      |                            '\s+')) AS t
      |              FROM documents),
      |tf AS (SELECT t AS term, count(*) AS freq FROM toks
      |       WHERE t <> '' GROUP BY 1),
      |top AS (SELECT term, freq, row_number() OVER
      |          (ORDER BY freq DESC, term) AS rank
      |        FROM tf ORDER BY freq DESC, term LIMIT 51),
      |t2 AS (SELECT freq, rank,
      |         CAST(round(ln(CAST(freq AS DOUBLE)) * 1e9) AS BIGINT) AS ln9,
      |         (SELECT count(*) FROM top) AS n
      |       FROM top),
      |a AS (SELECT CAST(max(n) - 1 AS INT) AS k_used,
      |        max(CASE WHEN rank = n THEN freq END) AS f_tail,
      |        CAST(sum(CASE WHEN rank < n THEN ln9 END) AS BIGINT) AS s9,
      |        max(CASE WHEN rank = n THEN ln9 END) AS t9
      |      FROM t2)
      |SELECT k_used, CAST(f_tail AS BIGINT) AS f_tail,
      |  round(CAST(s9 - k_used * t9 AS DOUBLE) / 1e9
      |        / CAST(k_used AS DOUBLE), 6) AS hill_gamma,
      |  CASE WHEN s9 - k_used * t9 > 0
      |       THEN round(1.0 / (CAST(s9 - k_used * t9 AS DOUBLE) / 1e9
      |                         / CAST(k_used AS DOUBLE)), 6) END AS hill_alpha
      |FROM a""".stripMargin

  /** Per-source drift vs the whole corpus (base-2 JSD). The oracle
    * replays the same slice-support sum + analytic absent-mass tail;
    * per-token pair terms are non-negative, so 6dp parity is safe.
    */
  private def driftJsd(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusDriftJsd(Tables.documents(s, dir), "source", "text")

  private val driftJsdSql =
    """WITH toks AS (SELECT source, unnest(string_split_regex(
      |                lower(trim(text)), '\s+')) AS w
      |              FROM documents),
      |st AS (SELECT source, w, CAST(count(*) AS DOUBLE) AS c FROM toks
      |       WHERE w <> '' GROUP BY 1, 2),
      |tot AS (SELECT source, sum(c) AS n FROM st GROUP BY 1),
      |corp AS (SELECT w, sum(c) AS cc FROM st GROUP BY 1),
      |grand AS (SELECT sum(c) AS bign FROM st),
      |terms AS (SELECT st.source, tot.n,
      |            st.c / tot.n AS p, corp.cc / grand.bign AS q
      |          FROM st JOIN tot USING (source) JOIN corp USING (w)
      |          CROSS JOIN grand)
      |SELECT source, CAST(n AS BIGINT) AS n_tokens,
      |       round(sum(0.5 * p * log2(p / ((p + q) / 2))
      |               + 0.5 * q * log2(q / ((p + q) / 2)))
      |             + 0.5 * (1 - sum(q)), 6) AS jsd
      |FROM terms GROUP BY source, n""".stripMargin

  /** Fixed query-term bag for the retrieval queries — terms from the
    * synthetic vocabulary with distinct document frequencies.
    */
  private val bm25Terms = Seq("merge", "window", "customer")

  /** BM25 ranked retrieval: global top-10 docs for [[bm25Terms]],
    * k1=1.2 b=0.75, Lucene's always-positive IDF. Scores rounded to
    * 6dp before ranking on both sides; ties on doc_id.
    */
  private def bm25Rank(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
      bm25Terms, k = 10)

  private val bm25CtesSql =
    """toks AS (SELECT doc_id,
      |           string_split_regex(lower(trim(text)), '\s+') AS ts
      |         FROM documents),
      |dl AS (SELECT doc_id, length(ts) AS dl FROM toks),
      |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, t AS term, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(ts) AS t FROM toks) u
      |       WHERE t IN ('merge', 'window', 'customer')
      |       GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |bmscored AS (SELECT tf.doc_id,
      |               ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1) *
      |               (tf.tf * (1.2 + 1)) /
      |               (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
      |               AS s
      |             FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
      |             CROSS JOIN stats),
      |bm AS (SELECT doc_id, round(sum(s), 6) AS bm25
      |       FROM bmscored GROUP BY 1)""".stripMargin

  private val bm25RankSql =
    s"""WITH $bm25CtesSql
       |SELECT doc_id, bm25, CAST(row_number() OVER
       |         (ORDER BY bm25 DESC, doc_id) AS INT) AS rank
       |FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin

  /** Hybrid search — BM25 top-20 for [[bm25Terms]] fused with the
    * exact cosine top-20 neighbors of query vector 0 by reciprocal-rank
    * fusion ([[Ranking.rrfFuse]], c=60). Both input lists are exact and
    * deterministic, so the fused top-10 has a full DuckDB oracle — the
    * lexical+vector retrieval stack behind RAG data curation, end to
    * end. At scale the vector leg swaps to IVF/PQ; fusion is rank-only
    * so nothing else changes.
    */
  private def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = TextAnalysis.bm25TopK(Tables.documents(s, dir), "doc_id",
        "text", bm25Terms, k = 20)
      .select(col("doc_id"), col("rank"))
    val vec = Similarity.bruteForceTopK(Tables.embeddings(s, dir), "vec_id",
        "embedding", queryIds = Seq(0L), k = 20)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    Ranking.rrfFuse(Seq(lex, vec), "doc_id", "rank", k = 10)
  }

  private val hybridRrfSql =
    s"""WITH $bm25CtesSql,
       |lex AS (SELECT doc_id, row_number() OVER
       |          (ORDER BY bm25 DESC, doc_id) AS rank
       |        FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |vs AS (SELECT e.vec_id AS doc_id,
       |         round(list_cosine_similarity(q.qv::DOUBLE[],
       |                                      e.embedding::DOUBLE[]), 6)
       |           AS cosine
       |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
       |vec AS (SELECT doc_id, row_number() OVER
       |          (ORDER BY cosine DESC, doc_id) AS rank
       |        FROM vs ORDER BY cosine DESC, doc_id LIMIT 20),
       |u AS (SELECT doc_id, 1.0::DOUBLE / (60 + rank) AS c FROM lex
       |      UNION ALL
       |      SELECT doc_id, 1.0::DOUBLE / (60 + rank) AS c FROM vec),
       |fused AS (SELECT doc_id, round(sum(c), 6) AS rrf FROM u GROUP BY 1)
       |SELECT doc_id, rrf, CAST(row_number() OVER
       |         (ORDER BY rrf DESC, doc_id) AS INT) AS rank
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  /** Self-trained bigram-LM quality score (CCNet-style perplexity
    * signal), add-one smoothing, mean ln-prob per doc. The oracle
    * rebuilds the same LM from the same corpus: identical tokenization,
    * counts, smoothing, and 6dp rounding of the mean.
    */
  private def lmScoreQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(Tables.documents(s, dir), "doc_id", "text")

  private val lmScoreSql =
    """WITH t AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS ts
      |           FROM documents),
      |toks AS (SELECT doc_id, unnest(ts) AS tok FROM t),
      |uni AS (SELECT tok, count(*) AS uc FROM toks GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v FROM toks),
      |bi AS (SELECT doc_id, ts[CAST(i AS INT)] AS w1,
      |              ts[CAST(i AS INT) + 1] AS w2
      |       FROM (SELECT doc_id, ts,
      |               unnest(generate_series(1, length(ts) - 1)) AS i
      |             FROM t WHERE length(ts) >= 2) u),
      |bg AS (SELECT w1, w2, count(*) AS bc FROM bi GROUP BY 1, 2)
      |SELECT bi.doc_id, count(*) AS n_bigrams,
      |       round(avg(ln((bg.bc + 1.0) / (uni.uc + v.v))), 6) AS lm_score
      |FROM bi JOIN bg USING (w1, w2)
      |JOIN uni ON uni.tok = bi.w1
      |CROSS JOIN v
      |GROUP BY 1""".stripMargin

  /** DoReMi-style domain weights over source at softmax temperature
    * η·k = 10 (η = 2, 5 multiplicative-weights steps, collapsed
    * analytically since the proxy losses are fixed): sources whose
    * add-one LM score trails the corpus reference get upweighted. The
    * oracle composes the proven per-doc lmScore SQL, then replays the
    * exact-integer mean/excess/softmax pipeline. See
    * [[graft.ops.TextAnalysis.doremiWeights]].
    */
  private def docDoremiWeights(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.doremiWeights(Tables.documents(s, dir), "doc_id", "source",
      "text", eta = 2.0, steps = 5)

  private lazy val docDoremiWeightsSql =
    s"""WITH sc AS (SELECT doc_id,
       |              CAST(round(lm_score * 1e6) AS BIGINT) AS s6
       |            FROM ($lmScoreSql) z),
       |gg AS (SELECT d.source, count(*) AS n_docs,
       |         CAST(sum(s6) AS BIGINT) AS sum6
       |       FROM documents d JOIN sc USING (doc_id) GROUP BY 1),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
       |        CAST(sum(sum6) AS BIGINT) AS ts6 FROM gg),
       |e AS (SELECT source, n_docs, sum6,
       |        greatest(0.0, round(
       |          CAST(ts6 AS DOUBLE) / CAST(tn AS DOUBLE) / 1e6 -
       |          CAST(sum6 AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e6, 6))
       |          AS excess_loss
       |      FROM gg, t),
       |x AS (SELECT source, n_docs, sum6, excess_loss,
       |        CAST(round(
       |          ${TextAnalysis.expPinnedSql("a6")} * 1e9) AS BIGINT) AS e9
       |      FROM (SELECT *,
       |              CAST(round(10.0 * excess_loss * 1e6) AS BIGINT) AS a6
       |            FROM e) e2)
       |SELECT source, n_docs,
       |  round(CAST(sum6 AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e6, 6)
       |    AS mean_lm_score,
       |  excess_loss,
       |  round(CAST(e9 AS DOUBLE) / CAST(sum(e9) OVER () AS DOUBLE), 6)
       |    AS doremi_w
       |FROM x""".stripMargin

  /** Interpolated Kneser-Ney bigram scoring per document (D = 0.75) —
    * continuation-probability smoothing over exact corpus counts.
    * See [[graft.ops.TextAnalysis.lmScoreKneserNey]].
    */
  private def textLmKneserNey(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScoreKneserNey(Tables.documents(s, dir), "doc_id",
      "text")

  private val textLmKneserNeySql =
    """WITH t AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS ts
      |           FROM documents),
      |bi AS (SELECT doc_id, ts[CAST(i AS INT)] AS w1,
      |              ts[CAST(i AS INT) + 1] AS w2
      |       FROM (SELECT doc_id, ts,
      |               unnest(generate_series(1, length(ts) - 1)) AS i
      |             FROM t WHERE length(ts) >= 2) u),
      |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bc
      |       FROM bi GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(bc) AS BIGINT) AS cw1,
      |          CAST(count(*) AS BIGINT) AS n1f FROM bg GROUP BY 1),
      |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p
      |         FROM bg GROUP BY 1),
      |ty AS (SELECT CAST(count(*) AS BIGINT) AS types FROM bg)
      |SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(avg(ln(
      |    greatest(CAST(bc AS DOUBLE) - 0.75, 0.0) / CAST(cw1 AS DOUBLE) +
      |    (0.75 * CAST(n1f AS DOUBLE) / CAST(cw1 AS DOUBLE)) *
      |    (CAST(n1p AS DOUBLE) / CAST(types AS DOUBLE)))), 6) AS kn_score
      |FROM bi JOIN bg USING (w1, w2) JOIN ctx USING (w1)
      |     JOIN cont USING (w2)
      |CROSS JOIN ty
      |GROUP BY 1""".stripMargin

  /** Scorer-consistency audit: Cohen's kappa between the CCNet tiers
    * produced by the add-one bigram scorer and by the Kneser-Ney
    * scorer — the "is the cheap scorer good enough to tier on?"
    * question, answered on the scorers' own per-language terciles
    * (identical bucketing discipline to `text_ccnet_buckets`), then
    * [[graft.ops.TextAnalysis.agreementKappa]] over the two verdicts.
    */
  private def textCcnetKnAgreement(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val lang = docs.select(col("doc_id"), col("lang"))
    def buckets(scored: DataFrame, scoreCol: String,
                out: String): DataFrame = {
      val sl = scored.join(lang, Seq("doc_id"))
      val thr = sl.groupBy(col("lang")).agg(
        round(percentile(col(scoreCol), lit(1.0 / 3)), 6).as("t1"),
        round(percentile(col(scoreCol), lit(2.0 / 3)), 6).as("t2"))
      sl.join(broadcast(thr), Seq("lang"))
        .select(col("doc_id"),
          when(col(scoreCol) > col("t2"), lit("head"))
            .when(col(scoreCol) > col("t1"), lit("middle"))
            .otherwise(lit("tail")).as(out))
    }
    val joined = buckets(TextAnalysis.lmScore(docs, "doc_id", "text"),
      "lm_score", "b_add1")
      .join(buckets(
        TextAnalysis.lmScoreKneserNey(docs, "doc_id", "text"),
        "kn_score", "b_kn"), Seq("doc_id"))
    TextAnalysis.agreementKappa(joined, "b_add1", "b_kn")
  }

  private val textCcnetKnAgreementSql =
    """WITH t AS (SELECT doc_id, lang,
      |             string_split_regex(lower(trim(text)), '\s+') AS ts
      |           FROM documents),
      |toks AS (SELECT doc_id, unnest(ts) AS tok FROM t),
      |uni AS (SELECT tok, count(*) AS uc FROM toks GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v FROM toks),
      |bi AS (SELECT doc_id, ts[CAST(i AS INT)] AS w1,
      |              ts[CAST(i AS INT) + 1] AS w2
      |       FROM (SELECT doc_id, ts,
      |               unnest(generate_series(1, length(ts) - 1)) AS i
      |             FROM t WHERE length(ts) >= 2) u),
      |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bc
      |       FROM bi GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(bc) AS BIGINT) AS cw1,
      |          CAST(count(*) AS BIGINT) AS n1f FROM bg GROUP BY 1),
      |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p
      |         FROM bg GROUP BY 1),
      |ty AS (SELECT CAST(count(*) AS BIGINT) AS types FROM bg),
      |sa AS (SELECT bi.doc_id,
      |         round(avg(ln((bg.bc + 1.0) / (uni.uc + v.v))), 6) AS s
      |       FROM bi JOIN bg USING (w1, w2)
      |       JOIN uni ON uni.tok = bi.w1 CROSS JOIN v GROUP BY 1),
      |sk AS (SELECT bi.doc_id, round(avg(ln(
      |         greatest(CAST(bc AS DOUBLE) - 0.75, 0.0) /
      |           CAST(cw1 AS DOUBLE) +
      |         (0.75 * CAST(n1f AS DOUBLE) / CAST(cw1 AS DOUBLE)) *
      |         (CAST(n1p AS DOUBLE) / CAST(types AS DOUBLE)))), 6) AS s
      |       FROM bi JOIN bg USING (w1, w2) JOIN ctx USING (w1)
      |            JOIN cont USING (w2) CROSS JOIN ty GROUP BY 1),
      |la AS (SELECT sa.doc_id, lang, s FROM sa JOIN t USING (doc_id)),
      |lk AS (SELECT sk.doc_id, lang, s FROM sk JOIN t USING (doc_id)),
      |tha AS (SELECT lang,
      |          round(quantile_cont(s, CAST(1 AS DOUBLE) / 3), 6) AS t1,
      |          round(quantile_cont(s, CAST(2 AS DOUBLE) / 3), 6) AS t2
      |        FROM la GROUP BY 1),
      |thk AS (SELECT lang,
      |          round(quantile_cont(s, CAST(1 AS DOUBLE) / 3), 6) AS t1,
      |          round(quantile_cont(s, CAST(2 AS DOUBLE) / 3), 6) AS t2
      |        FROM lk GROUP BY 1),
      |p AS (SELECT la.doc_id,
      |        CASE WHEN la.s > tha.t2 THEN 'head'
      |             WHEN la.s > tha.t1 THEN 'middle'
      |             ELSE 'tail' END AS ba,
      |        CASE WHEN lk.s > thk.t2 THEN 'head'
      |             WHEN lk.s > thk.t1 THEN 'middle'
      |             ELSE 'tail' END AS bk
      |      FROM la JOIN tha ON la.lang = tha.lang
      |      JOIN lk ON la.doc_id = lk.doc_id
      |      JOIN thk ON lk.lang = thk.lang),
      |tt AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN ba = bk THEN 1 ELSE 0 END) AS BIGINT)
      |           AS diag
      |       FROM p),
      |r AS (SELECT ba AS c, CAST(count(*) AS BIGINT) AS rc
      |      FROM p GROUP BY 1),
      |cl AS (SELECT bk AS c, CAST(count(*) AS BIGINT) AS cc
      |       FROM p GROUP BY 1),
      |pn AS (SELECT CAST(coalesce(sum(rc * cc), 0) AS BIGINT) AS pe_num
      |       FROM r JOIN cl USING (c))
      |SELECT n, diag,
      |  round(CAST(diag AS DOUBLE) / n, 6) AS po,
      |  round(CAST(pe_num AS DOUBLE) / (n * n), 6) AS pe,
      |  CASE WHEN CAST(pe_num AS DOUBLE) / (n * n) = 1.0 THEN NULL
      |    ELSE round((CAST(diag AS DOUBLE) / n -
      |      CAST(pe_num AS DOUBLE) / (n * n)) /
      |      (1.0 - CAST(pe_num AS DOUBLE) / (n * n)), 6) END AS kappa
      |FROM tt CROSS JOIN pn""".stripMargin

  /** CCNet head/middle/tail corpus partition per language — exact
    * per-lang LM-score terciles with the strictly-greater tie rule.
    * See [[graft.ops.TextAnalysis.ccnetBuckets]].
    */
  private def textCcnetBuckets(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ccnetBuckets(Tables.documents(s, dir), "doc_id", "text",
      "lang")

  private val textCcnetBucketsSql =
    """WITH t AS (SELECT doc_id, lang,
      |             string_split_regex(lower(trim(text)), '\s+') AS ts
      |           FROM documents),
      |toks AS (SELECT doc_id, unnest(ts) AS tok FROM t),
      |uni AS (SELECT tok, count(*) AS uc FROM toks GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v FROM toks),
      |bi AS (SELECT doc_id, ts[CAST(i AS INT)] AS w1,
      |              ts[CAST(i AS INT) + 1] AS w2
      |       FROM (SELECT doc_id, ts,
      |               unnest(generate_series(1, length(ts) - 1)) AS i
      |             FROM t WHERE length(ts) >= 2) u),
      |bg AS (SELECT w1, w2, count(*) AS bc FROM bi GROUP BY 1, 2),
      |sc AS (SELECT bi.doc_id,
      |         round(avg(ln((bg.bc + 1.0) / (uni.uc + v.v))), 6)
      |           AS lm_score
      |       FROM bi JOIN bg USING (w1, w2)
      |       JOIN uni ON uni.tok = bi.w1
      |       CROSS JOIN v
      |       GROUP BY 1),
      |sl AS (SELECT sc.doc_id, lm_score, lang
      |       FROM sc JOIN t ON sc.doc_id = t.doc_id),
      |thr AS (SELECT lang,
      |          round(quantile_cont(lm_score, CAST(1 AS DOUBLE) / 3), 6)
      |            AS t1,
      |          round(quantile_cont(lm_score, CAST(2 AS DOUBLE) / 3), 6)
      |            AS t2
      |        FROM sl GROUP BY 1)
      |SELECT sl.lang, CASE WHEN lm_score > t2 THEN 'head'
      |                     WHEN lm_score > t1 THEN 'middle'
      |                     ELSE 'tail' END AS bucket,
      |       t1, t2, CAST(count(*) AS BIGINT) AS n_docs
      |FROM sl JOIN thr ON sl.lang = thr.lang
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** Incremental dedup of a new crawl batch (doc_id % 10 >= 8) against
    * the accumulated reference corpus (doc_id % 10 < 8): every batch doc
    * gets a verdict — already in the reference, duplicate within the
    * batch, or keep. The synthetic corpus has no natural duplicates, so
    * the batch additionally carries re-keyed copies of ten reference
    * docs (+10000, must come back `dup_of_reference`) and ten batch docs
    * (+20000, must come back `dup_in_batch`) — all three verdicts are
    * live. The oracle rebuilds the same split, plants, fingerprints, and
    * verdict CASE.
    */
  private def dedupAgainstRef(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 10 >= 8)
      .unionByName(docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
      .unionByName(docs.filter(col("doc_id") % 50 === 8)
        .select((col("doc_id") + 20000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    Dedup.dedupAgainstReference(batch,
      docs.filter(col("doc_id") % 10 < 8), "doc_id", "text")
  }

  private val dedupAgainstRefSql =
    """WITH fp AS (SELECT doc_id,
      |              md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |            FROM documents),
      |ref AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 < 8),
      |batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 10 >= 8
      |          UNION ALL
      |          SELECT doc_id + 10000, fp FROM fp WHERE doc_id % 50 = 0
      |          UNION ALL
      |          SELECT doc_id + 20000, fp FROM fp WHERE doc_id % 50 = 8),
      |canon AS (SELECT fp, min(doc_id) AS keep_id FROM batch GROUP BY 1)
      |SELECT b.doc_id, b.fp,
      |       CASE WHEN r.fp IS NOT NULL THEN 'dup_of_reference'
      |            WHEN b.doc_id <> k.keep_id THEN 'dup_in_batch'
      |            ELSE 'keep' END AS verdict
      |FROM batch b
      |LEFT JOIN ref r ON r.fp = b.fp
      |JOIN canon k ON k.fp = b.fp""".stripMargin

  /** Train/val/test split assignment: consecutive md5 hash bands keyed
    * on doc_id — a doc's split never migrates as the corpus grows (the
    * silent-eval-contamination failure mode of count-based splits). One
    * threshold list drives both the Spark CASE and the oracle.
    */
  private val splitFractions =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def docSplitAssign(s: SparkSession, dir: String): DataFrame =
    Sampling.splitAssign(Tables.documents(s, dir), "doc_id", splitFractions)
      .select("doc_id", "split")

  private val docSplitAssignSql = {
    val cuts = splitFractions.init
      .scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    val cases = splitFractions.init.zip(cuts).map { case ((name, _), cut) =>
      s"WHEN md5('split:' || CAST(doc_id AS VARCHAR)) < '${Sampling.hexThreshold(cut)}' THEN '$name'"
    }.mkString("\n    ")
    s"""SELECT doc_id,
       |  CASE $cases
       |    ELSE '${splitFractions.last._1}' END AS split
       |FROM documents""".stripMargin
  }

  /** Cross-split leakage audit: every TRAIN doc sharing a distinct word
    * 5-gram with the held-out TEST split, scored by the leaked fraction
    * of its grams — the "is my eval compromised by my own split?" check
    * that runs after [[docSplitAssign]] and before any training run.
    * Composes the SAME split bands and the SAME contamination operator
    * already gated above, so the audit cannot drift from either. The
    * held-out side is the broadcast side (it is the small fraction by
    * construction); only leaking docs are emitted.
    */
  private def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val split = Sampling.splitAssign(Tables.documents(s, dir), "doc_id",
      splitFractions)
    TextAnalysis.contamination(
        split.filter(col("split") === "train"),
        split.filter(col("split") === "test"),
        "doc_id", "text", n = 5)
      .filter(col("bench_hits") > 0)
      .select(col("doc_id"), col("n_grams"),
        col("bench_hits").as("test_hits"),
        col("contamination").as("leakage"))
  }

  private val splitLeakageSql = {
    val trainCut = Sampling.hexThreshold(0.8)
    val valCut = Sampling.hexThreshold(0.9)
    s"""WITH sel AS (SELECT doc_id, lower(trim(text)) AS txt,
       |              md5('split:' || CAST(doc_id AS VARCHAR)) AS h
       |             FROM documents),
       |tt AS (SELECT doc_id, string_split_regex(txt, '\\s+') AS toks
       |       FROM sel WHERE h >= '$valCut'),
       |tg AS (SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS gram
       |       FROM (SELECT toks,
       |               unnest(generate_series(1, length(toks) - 4)) AS i
       |             FROM tt WHERE length(toks) >= 5) u),
       |ct AS (SELECT doc_id, string_split_regex(txt, '\\s+') AS toks
       |       FROM sel WHERE h < '$trainCut'),
       |cg AS (SELECT DISTINCT doc_id,
       |         array_to_string(toks[i:i+4], ' ') AS gram
       |       FROM (SELECT doc_id, toks,
       |               unnest(generate_series(1, length(toks) - 4)) AS i
       |             FROM ct WHERE length(toks) >= 5) u)
       |SELECT doc_id, n_grams, test_hits,
       |       round(test_hits * 1.0 / n_grams, 6) AS leakage
       |FROM (SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |        CAST(sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END)
       |          AS BIGINT) AS test_hits
       |      FROM cg LEFT JOIN tg USING (gram)
       |      GROUP BY 1) agg
       |WHERE test_hits > 0""".stripMargin
  }

  /** Per-label embedding centroids, one row per (label, dimension) —
    * corpus analysis / nearest-class-mean building block. The explode
    * never hits the wire: the (label, pos) aggregation is map-side
    * combinable, so the single shuffle carries labels x dim partials.
    */
  private def embLabelCentroids(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embeddings.labelCentroids(Tables.embeddings(s, dir),
      "vec_id", "embedding", "label")

  private val embLabelCentroidsSql =
    """SELECT label, CAST(i - 1 AS INT) AS pos, count(*) AS n,
      |       round(avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)), 6) AS c
      |FROM (SELECT label, embedding,
      |        unnest(generate_series(1, length(embedding))) AS i
      |      FROM embeddings) u
      |GROUP BY 1, 2""".stripMargin

  /** Per-vector symmetric int8 quantization (4x embedding-store
    * compression): scale = max |x_i|, codes in [-127, 127]. Codes ride
    * as a CSV string in the gate output (the driver hash-gate has no
    * array-column precedent); the operator itself returns typed arrays.
    * Division and x127 are IEEE-double exact-rounded in both engines and
    * both round() tie-break away from zero, so codes match exactly.
    */
  private def embInt8Quantize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embeddings.quantizeInt8(Tables.embeddings(s, dir),
        "vec_id", "embedding")
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("codes"), _.cast("string")), ",")
          .as("codes_csv"))

  private val embInt8QuantizeSql =
    """SELECT vec_id, round(s, 6) AS scale,
      |       array_to_string(list_transform(embedding, x ->
      |         CASE WHEN s = 0 THEN 0
      |              ELSE CAST(round(CAST(x AS DOUBLE) / s * 127) AS INT) END),
      |         ',') AS codes_csv
      |FROM (SELECT vec_id, embedding,
      |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
      |      FROM embeddings) t""".stripMargin

  /** Int8 quantization distortion audit in dB — see
    * [[graft.ops.Embeddings.int8Snr]] for why SNR, not raw MSE, is the
    * hash-gateable form.
    */
  private def embInt8Snr(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embeddings.int8Snr(Tables.embeddings(s, dir), "vec_id",
      "embedding")

  private val embInt8SnrSql =
    """WITH t AS (SELECT vec_id, embedding,
      |    list_max(list_transform(embedding,
      |                            x -> abs(CAST(x AS DOUBLE)))) AS s
      |  FROM embeddings),
      |q AS (SELECT vec_id,
      |    list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sig,
      |    list_sum(list_transform(embedding, x ->
      |      CASE WHEN s = 0 THEN CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
      |           ELSE (CAST(x AS DOUBLE) -
      |                 round(CAST(x AS DOUBLE) / s * 127) * s / 127) *
      |                (CAST(x AS DOUBLE) -
      |                 round(CAST(x AS DOUBLE) / s * 127) * s / 127)
      |      END)) AS noise
      |  FROM t)
      |SELECT vec_id,
      |       CASE WHEN noise = 0 THEN NULL
      |            ELSE round(10 * log10(sig / noise), 6) END AS snr_db
      |FROM q""".stripMargin

  /** Composed embedding-prep pipeline: int8 quantization → exact
    * near-dup collapse at code resolution (identical codes = duplicate
    * vector at int8 precision; canonical = min vec_id) → per-label
    * centroids over the survivors, one Catalyst tree. The synthetic
    * embeddings have no natural code collisions, so the batch carries
    * re-keyed copies of every vec_id % 50 == 0 vector (+100000) — the
    * dedup stage provably drops them (row parity with the planted-free
    * centroid query). Mirrors `pipeline_e2e_prep`'s role for the
    * embedding side of the library.
    *
    * Scale shape: quantization is scan-side; the code-collapse is one
    * hash-shuffle on a 64-byte key with a map-side-combinable min; the
    * centroid aggregation ships labels x dim partials. No broadcast
    * assumptions, no driver collection.
    */
  private def embPrepPipeline(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val planted = emb.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"),
        col("label"))
    val batch = emb.select("vec_id", "embedding", "label").unionByName(planted)
    val codes = graft.ops.Embeddings.quantizeInt8(batch, "vec_id", "embedding")
      .select(col("vec_id"),
        array_join(transform(col("codes"), _.cast("string")), ",").as("ck"))
    val keep = codes.groupBy(col("ck")).agg(min(col("vec_id")).as("vec_id"))
      .select("vec_id")
    graft.ops.Embeddings.labelCentroids(
      batch.join(keep, Seq("vec_id"), "left_semi"),
      "vec_id", "embedding", "label")
  }

  private val embPrepPipelineSql =
    """WITH batch AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding, label FROM embeddings
      |  WHERE vec_id % 50 = 0),
      |q AS (SELECT vec_id, embedding, label,
      |        list_max(list_transform(embedding,
      |          x -> abs(CAST(x AS DOUBLE)))) AS s
      |      FROM batch),
      |codes AS (SELECT vec_id, embedding, label,
      |            array_to_string(list_transform(embedding, x ->
      |              CASE WHEN s = 0 THEN 0
      |                   ELSE CAST(round(CAST(x AS DOUBLE) / s * 127) AS INT)
      |              END), ',') AS ck
      |          FROM q),
      |keep AS (SELECT min(vec_id) AS vec_id FROM codes GROUP BY ck),
      |kept AS (SELECT c.label, c.embedding FROM codes c
      |         JOIN keep USING (vec_id))
      |SELECT label, CAST(i - 1 AS INT) AS pos, count(*) AS n,
      |       round(avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)), 6) AS c
      |FROM (SELECT label, embedding,
      |        unnest(generate_series(1, length(embedding))) AS i
      |      FROM kept) u
      |GROUP BY 1, 2""".stripMargin

  /** Benchmark decontamination: a deterministic 2% hash-sample of the
    * documents table stands in for the held-out benchmark set; every
    * remaining doc is scored by the fraction of its distinct word
    * 5-grams that appear anywhere in the benchmark. The oracle rebuilds
    * the same split (same md5 threshold predicate), the same n-grams,
    * and the same overlap arithmetic.
    */
  private def contaminationQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keep = Sampling.keepExpr(col("doc_id"), 0.02, "bench")
    TextAnalysis.contamination(docs.filter(!keep), docs.filter(keep),
      "doc_id", "text", n = 5)
  }

  private val contaminationSql = {
    val thr = Sampling.hexThreshold(0.02)
    s"""WITH sel AS (SELECT doc_id, lower(trim(text)) AS txt,
       |              md5('bench:' || CAST(doc_id AS VARCHAR)) < '$thr' AS is_bench
       |             FROM documents),
       |bt AS (SELECT string_split_regex(txt, '\\s+') AS toks FROM sel WHERE is_bench),
       |bg AS (SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS gram
       |       FROM (SELECT toks, unnest(generate_series(1, length(toks) - 4)) AS i
       |             FROM bt WHERE length(toks) >= 5) u),
       |ct AS (SELECT doc_id, string_split_regex(txt, '\\s+') AS toks
       |       FROM sel WHERE NOT is_bench),
       |cg AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS gram
       |       FROM (SELECT doc_id, toks, unnest(generate_series(1, length(toks) - 4)) AS i
       |             FROM ct WHERE length(toks) >= 5) u)
       |SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(sum(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS bench_hits,
       |       round(sum(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) * 1.0
       |             / count(*), 6) AS contamination
       |FROM cg LEFT JOIN bg USING (gram)
       |GROUP BY 1""".stripMargin
  }

  /** Context-length chunking: 40-token windows, stride 30 (10-token
    * overlap) — small enough that the synthetic docs produce multi-chunk
    * output.
    */
  private def chunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocs(Tables.documents(s, dir), "doc_id", "text",
      chunkTokens = 40, stride = 30)

  private val chunksSql =
    """WITH b AS (SELECT doc_id,
      |             string_split_regex(lower(trim(text)), '\s+') AS l
      |           FROM documents),
      |c AS (SELECT doc_id, l,
      |        unnest(generate_series(0,
      |          CAST(ceil(greatest(length(l) - 40, 0) / 30.0) AS INT))) AS ci
      |      FROM b)
      |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
      |  array_to_string(list_slice(l, ci * 30 + 1, ci * 30 + 40), ' ')
      |    AS chunk_text,
      |  CAST(length(list_slice(l, ci * 30 + 1, ci * 30 + 40)) AS INT)
      |    AS n_chunk_tokens
      |FROM c""".stripMargin

  /** Sequence packing: per-source contiguous packs of 512 tokens. */
  private def packs(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir).select(col("source"), col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    Packing.contiguousPack(scored, "doc_id", "n_tokens", "source", budget = 512)
  }

  private val packsSql =
    """WITH b AS (SELECT source, doc_id,
      |  CAST(length(string_split_regex(lower(trim(text)), '\s+')) AS INT)
      |    AS n_tokens
      |  FROM documents)
      |SELECT source, doc_id, n_tokens,
      |  CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |         ROWS UNBOUNDED PRECEDING) - n_tokens) * 1.0 / 512) AS BIGINT)
      |    AS pack_id
      |FROM b""".stripMargin

  /** Packing-efficiency audit of `doc_pack_assignments`' exact scheme
    * (same shard key, same budget): boundary-split docs, tail fill and
    * mean fill per shard. See [[graft.ops.Packing.packEfficiency]].
    */
  private def packEff(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir).select(col("source"),
      col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    Packing.packEfficiency(scored, "doc_id", "n_tokens", "source",
      budget = 512)
  }

  private val packEffSql =
    """WITH b AS (SELECT source, doc_id,
      |  CAST(length(string_split_regex(lower(trim(text)), '\s+')) AS INT)
      |    AS n_tokens
      |  FROM documents),
      |c AS (SELECT source, doc_id, n_tokens,
      |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM b),
      |m AS (SELECT source, count(*) AS n_docs,
      |        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |        CAST(sum(CASE WHEN n_tokens > 0 AND
      |            floor((cum - n_tokens) * 1.0 / 512) <>
      |            floor((cum - 1) * 1.0 / 512)
      |          THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
      |      FROM c GROUP BY 1)
      |SELECT source, n_docs, total_tokens,
      |  CAST(floor((total_tokens + 511) * 1.0 / 512) AS BIGINT) AS n_packs,
      |  n_boundary_docs,
      |  round(CAST(n_boundary_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
      |    AS boundary_frac,
      |  CAST(CASE WHEN total_tokens > 0 AND total_tokens % 512 = 0
      |       THEN 512 ELSE total_tokens % 512 END AS BIGINT)
      |    AS tail_fill_tokens,
      |  CASE WHEN total_tokens > 0
      |       THEN round(CAST(total_tokens AS DOUBLE) /
      |         CAST(floor((total_tokens + 511) * 1.0 / 512) * 512
      |           AS DOUBLE), 6)
      |       ELSE 0.0 END AS mean_fill
      |FROM m""".stripMargin

  /** The flagship composed pipeline — what the library exists for, as
    * ONE declarative plan: quality + language gate → PII redaction →
    * exact dedup (keep min id per normalized fingerprint) → near-dup
    * cluster dedup (keep each Jaccard component's canonical doc) →
    * context-length chunking. Every stage is the registry operator it
    * reuses, so the whole composition stays oracle-expressible; Catalyst
    * sees one tree and pipelines the scan-side stages (quality, lang,
    * redact are a single pass over the parquet scan).
    */
  private def e2ePrep(s: SparkSession, dir: String): DataFrame = {
    val filt = Tables.documents(s, dir)
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.85 &&
        TextAnalysis.langId(col("text")) === "en")
      .select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("text"))
    val exKeep = filt
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
    // the surviving doc set fans out into three consumers (cluster
    // postings, CC node list, final chunk scan); without a cache each
    // re-evaluates the regex-heavy quality/langid/redact filter stage
    // (measured 18 s -> ~7 s at sf0.1). Materialized eagerly: the
    // consumers' map stages are submitted concurrently and would race
    // to compute a lazy cache (see ScopedCaches.materialize)
    val exDocs = graft.data.ScopedCaches.materialize(
      filt.join(exKeep.select("doc_id"), Seq("doc_id"), "left_semi"))
    val keep = Dedup.jaccardClusters(exDocs, "doc_id", "text")
      .filter(col("doc_id") === col("cluster")).select("doc_id")
    val finalDocs = exDocs.join(keep, Seq("doc_id"), "left_semi")
    TextAnalysis.chunkDocs(finalDocs, "doc_id", "text",
      chunkTokens = 40, stride = 30)
  }

  private val e2ePrepSql = {
    val em = TextAnalysis.EmailPattern
    val ip = TextAnalysis.Ipv4Pattern
    val langScores = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"length(list_intersect(dtoks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val langCases = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH RECURSIVE qb AS (
       |  SELECT doc_id, text, trim(text) AS t,
       |    CAST(greatest(length(trim(text)), 1) AS DOUBLE) AS len,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS dtoks,
       |    CAST(greatest(length(string_split_regex(lower(trim(text)), '\\s+')), 1)
       |         AS DOUBLE) AS ntoks
       |  FROM documents),
       |sc AS (SELECT doc_id, $langScores FROM qb),
       |lang AS (SELECT doc_id, CASE $langCases ELSE '${langs.last}' END AS lang_pred
       |         FROM sc),
       |filt AS (SELECT qb.doc_id,
       |    regexp_replace(regexp_replace(qb.text, '$em', '[EMAIL]', 'g'),
       |                   '$ip', '[IP]', 'g') AS txt0
       |  FROM qb JOIN lang USING (doc_id)
       |  WHERE lang.lang_pred = 'en'
       |    AND round(((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))) / len) * 0.5
       |      + (CASE WHEN length(regexp_replace(t, '\\s+', '', 'g')) / ntoks
       |              BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
       |      + (CASE WHEN length(t) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25,
       |      6) >= 0.85),
       |ex AS (SELECT min(doc_id) AS doc_id FROM filt
       |       GROUP BY md5(lower(regexp_replace(trim(txt0), '\\s+', ' ', 'g')))),
       |exd AS (SELECT f.doc_id, f.txt0 FROM filt f JOIN ex USING (doc_id)),
       |jt AS (SELECT doc_id, lower(trim(txt0)) AS txt FROM exd),
       |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
       |       FROM (SELECT doc_id, txt,
       |               unnest(generate_series(1, greatest(length(txt) - 7, 1))) AS i
       |             FROM jt) u),
       |dfr AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 20),
       |post AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfr USING (s)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |           FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |pairs AS (SELECT id1, id2 FROM common
       |          JOIN sizes n1 ON n1.doc_id = id1
       |          JOIN sizes n2 ON n2.doc_id = id2
       |          WHERE round(c * 1.0 / (n1.n + n2.n - c), 6) >= 0.3),
       |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
       |          UNION SELECT id2 AS a, id1 AS b FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM exd
       |  UNION
       |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
       |clus AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
       |fin AS (SELECT e.doc_id, e.txt0 FROM exd e
       |        JOIN clus c ON c.id = e.doc_id AND c.cluster = e.doc_id),
       |cb AS (SELECT doc_id, string_split_regex(lower(trim(txt0)), '\\s+') AS l
       |       FROM fin),
       |cc AS (SELECT doc_id, l,
       |         unnest(generate_series(0,
       |           CAST(ceil(greatest(length(l) - 40, 0) / 30.0) AS INT))) AS ci
       |       FROM cb)
       |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       |  array_to_string(list_slice(l, ci * 30 + 1, ci * 30 + 40), ' ')
       |    AS chunk_text,
       |  CAST(length(list_slice(l, ci * 30 + 1, ci * 30 + 40)) AS INT)
       |    AS n_chunk_tokens
       |FROM cc""".stripMargin
  }

  /** Quality-gate calibration: the exact 20th-percentile quality
    * threshold per source and how many docs it keeps — the "drop each
    * source's bottom quintile" step, computed with Spark's exact
    * `percentile` (linear interpolation, the same definition as the
    * oracle's `quantile_cont`). Interpolation runs over 6dp-rounded
    * quality values and is itself rounded to 6dp, so cross-engine float
    * parity holds.
    */
  private def qualityGate(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val thr = q.groupBy(col("source"))
      .agg(round(percentile(col("quality"), lit(0.2)), 6).as("q20"))
    q.join(thr, Seq("source"))
      .groupBy(col("source"), col("q20"))
      .agg(count(when(col("quality") >= col("q20"), 1)).as("n_kept"),
        count(lit(1)).as("n_total"))
      .select("source", "q20", "n_kept", "n_total")
  }

  private val qualityGateSql =
    """WITH b AS (
      |  SELECT doc_id, source, trim(text) AS t,
      |    CAST(greatest(length(trim(text)), 1) AS DOUBLE) AS len,
      |    CAST(greatest(length(string_split_regex(lower(trim(text)), '\s+')), 1)
      |         AS DOUBLE) AS ntoks
      |  FROM documents),
      |q AS (SELECT doc_id, source,
      |  round(((len - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))) / len) * 0.5
      |    + (CASE WHEN length(regexp_replace(t, '\s+', '', 'g')) / ntoks
      |            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.25
      |    + (CASE WHEN length(t) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25,
      |    6) AS quality
      |  FROM b),
      |thr AS (SELECT source, round(quantile_cont(quality, 0.2), 6) AS q20
      |        FROM q GROUP BY source)
      |SELECT q.source, thr.q20,
      |       count(*) FILTER (q.quality >= thr.q20) AS n_kept,
      |       count(*) AS n_total
      |FROM q JOIN thr ON q.source = thr.source
      |GROUP BY q.source, thr.q20""".stripMargin

  /** JSONL source roundtrip — the interchange format training corpora
    * actually arrive in. Schema is explicit (inference costs a full
    * extra pass over 100 TB); text is excluded from the written subset
    * so the roundtrip exercises the reader, not JSON string-escaping
    * trivia. Aggregate must match the parquet-side truth.
    */
  private def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_jsonl_${math.abs(dir.hashCode)}"
    Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").json(tmp)
    s.read.schema("doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT")
      .json(tmp)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
  }

  private val jsonlRoundtripSql =
    """SELECT lang, source, count(*) AS cnt,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** ORC sink + source round-trip (Spark's ORC datasource is built-in,
    * like parquet): write a column subset as zlib ORC, read it back
    * with an explicit schema, aggregate — must match the parquet-side
    * truth. Completes the format surface next to CSV (`s1`), JD/.sep,
    * JSONL, and parquet.
    */
  private def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_orc_${math.abs(dir.hashCode)}"
    Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").option("compression", "zlib").orc(tmp)
    s.read.schema("doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT")
      .orc(tmp)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
  }

  private val orcRoundtripSql =
    """SELECT lang, source, count(*) AS cnt,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** Hive-style partitioned write + partition-PRUNED read: documents
    * land as `lang=<v>/` directories, and the filtered read-back must
    * touch only the matching partitions — at 100 TB, partition pruning
    * is the first and cheapest scan eliminator (the plan-level
    * `PartitionFilters` evidence is pinned by BucketingSpec). The
    * aggregate over the pruned subset must match the parquet-side
    * truth.
    */
  private def partitionedPrunedRead(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_part_${math.abs(dir.hashCode)}"
    Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("lang").isin("en", "fr"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
  }

  private val partitionedPrunedReadSql =
    """SELECT lang, source, count(*) AS cnt,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE lang IN ('en', 'fr') GROUP BY 1, 2""".stripMargin

  // ---- multimodal: real javax.imageio decode + FakeCodec fallback ----

  /** Mixed media table: even ids are REAL PNG payloads (decoded by
    * `javax.imageio`), odd ids are opaque text bytes (FakeCodec
    * fallback). Rows-only overall (PNG byte_len / fallback dims are not
    * SQL-reproducible) — the decoded image dims are oracle-checked
    * separately by `mm_decode_image_dims`.
    */
  /** The real-decode FEATURE gate: pooled 2x2 RGBA means of the planted
    * PNGs. The pixel generator is splitmix64 over (media_id, position),
    * so the oracle replays the pixels themselves — 64-bit wrapping
    * arithmetic emulated in HUGEINT via 32-bit-split multiplies — pools
    * them per cell, and casts to REAL exactly like the Scala `.toFloat`
    * (integer sums are exact on both sides, so the doubles and their
    * float32 roundings agree bitwise). A stub that doesn't actually
    * decode the PNG bytes back to the planted pixels cannot pass.
    * The FakeCodec fallback path (this container's audio/video stand-in)
    * stays rows-only, covered by mm_feature_ann_pipeline and OpsSpec
    * parity.
    */
  private def mmDecode(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaWithImages(s, Tables.documents(s, dir))
    Multimodal.extractFeatures(media).toDF()
      .filter(col("content_type") === "image/png")
      .select(col("media_id"),
        posexplode(col("features")).as(Seq("idx", "feature")))
  }

  /** `(a * c) mod 2^64` over non-negative HUGEINTs: split the constant
    * into 32-bit halves so every intermediate product fits HUGEINT. */
  private def wrapMul64(a: String, c: BigInt): String = {
    val lo = c & 0xFFFFFFFFL
    val hi = c >> 32
    s"((($a) % 4294967296) * $lo + (((($a) % 4294967296) * $hi + " +
      s"(($a) // 4294967296) * $lo) % 4294967296) * 4294967296) " +
      "% 18446744073709551616"
  }

  /** CTE chain producing `feats(media_id, idx, feature)` for the
    * planted PNGs (shared by the mm_decode_features and
    * mm_feature_ann_pipeline oracles). Starts at `imgs`, ends at
    * `feats`; splice after `WITH`.
    */
  /** Generalized planted-PNG pixel replay: `imgsSql` must produce
    * (`keys`…, w, h); `seedSql` is the per-image splitmix seed in
    * HUGEINT (the Spark generators use `media_id` for stills and
    * `media_id·1000 + frame` for video frames). Emits `feats(keys…,
    * idx, feature)`.
    */
  private def pngReplayCtes(imgsSql: String, keys: Seq[String],
                            seedSql: String): String = {
    val K = BigInt("9E3779B97F4A7C15", 16)
    val C1 = BigInt("BF58476D1CE4E5B9", 16)
    val C2 = BigInt("94D049BB133111EB", 16)
    val k = keys.mkString(", ")
    s"""imgs AS ($imgsSql),
       |px0 AS (SELECT $k, w, h, unnest(range(w * h)) AS p FROM imgs),
       |px AS (SELECT $k, w, h, p // w AS y, p % w AS x FROM px0),
       |s1 AS (SELECT $k, w, h, y, x,
       |         (($seedSql) +
       |          ${wrapMul64("CAST(y AS HUGEINT) * w + x + 1", K)})
       |           % 18446744073709551616 AS v
       |       FROM px),
       |s2 AS (SELECT *, ${wrapMul64("xor(v, v // 1073741824)", C1)} AS z1
       |       FROM s1),
       |s3 AS (SELECT *, ${wrapMul64("xor(z1, z1 // 134217728)", C2)} AS z2
       |       FROM s2),
       |s4 AS (SELECT $k, w, h, y, x,
       |         xor(z2, z2 // 2147483648) % 16777216 AS rgb
       |       FROM s3),
       |pooled AS (SELECT $k,
       |    least(y*2//h, 1)*2 + least(x*2//w, 1) AS cell,
       |    rgb // 65536 AS r, (rgb // 256) % 256 AS g, rgb % 256 AS b
       |  FROM s4),
       |agg AS (SELECT $k, cell, count(*) AS cnt, sum(r) AS sr,
       |          sum(g) AS sg, sum(b) AS sb
       |        FROM pooled GROUP BY ALL),
       |feats AS (
       |  SELECT $k, cell*4 AS idx,
       |         CAST(sr/(cnt*255.0) AS REAL) AS feature FROM agg
       |  UNION ALL SELECT $k, cell*4+1,
       |         CAST(sg/(cnt*255.0) AS REAL) FROM agg
       |  UNION ALL SELECT $k, cell*4+2,
       |         CAST(sb/(cnt*255.0) AS REAL) FROM agg
       |  UNION ALL SELECT $k, cell*4+3, CAST(1.0 AS REAL) FROM agg)"""
      .stripMargin
  }

  private lazy val pngFeatureCtes: String = pngReplayCtes(
    """SELECT doc_id AS media_id, 4 + doc_id % 13 AS w,
      |                4 + doc_id % 11 AS h
      |              FROM documents WHERE doc_id % 2 = 0""".stripMargin,
    Seq("media_id"), "CAST(media_id AS HUGEINT)")

  private val mmDecodeSql =
    s"""WITH $pngFeatureCtes
       |SELECT media_id, CAST(idx AS INT) AS idx, feature FROM feats""".stripMargin

  /** Per-image perceptual dHash (4×4 = 16 bits) over the planted PNGs
    * — the image-level near-dedup fingerprint. The oracle replays the
    * planted pixels (same splitmix CTEs as `mm_decode_features`),
    * pools EXACT integer luma sums over the (gw+1)×gh grid, and
    * derives each bit by the same cross-multiplied mean comparison —
    * so a codec that doesn't decode the actual pixels cannot produce
    * the hash. See [[graft.ops.Multimodal.imageDHashes]].
    */
  private def mmImageDhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageDHashes(
      Multimodal.mediaWithImages(s, Tables.documents(s, dir)),
      gw = 4, gh = 4).toDF()

  /** CTE chain `dh(media_id, dhash)` + `imgs`: the dHash replay over
    * the planted-PNG pixel CTEs (pngReplayCtes' `s4`) for a gw×gh bit
    * grid; shared by the hash, pair, and wide-hash dup-group oracles.
    */
  private def dhashCtesFor(imgsSql: String, seedSql: String,
                           gw: Int, gh: Int): String = {
    val px = pngReplayCtes(imgsSql, Seq("media_id"), seedSql)
    val cols = gw + 1
    s"""$px,
       |cell AS (SELECT media_id,
       |           least(y * $gh // h, ${gh - 1}) AS cy,
       |           least(x * $cols // w, $gw) AS cx,
       |           299 * (rgb // 65536) + 587 * ((rgb // 256) % 256)
       |             + 114 * (rgb % 256) AS gray
       |         FROM s4),
       |cagg AS (SELECT media_id, cy, cx, CAST(count(*) AS HUGEINT) AS cnt,
       |           CAST(sum(gray) AS HUGEINT) AS s
       |         FROM cell GROUP BY ALL),
       |grid AS (SELECT imgs.media_id, g.cy, g.cx FROM imgs
       |         CROSS JOIN (SELECT a.a AS cy, b.b AS cx FROM range($gh) a(a)
       |                     CROSS JOIN range($cols) b(b)) g),
       |cfull AS (SELECT grid.media_id, grid.cy, grid.cx,
       |            coalesce(cagg.cnt, 0) AS cnt, coalesce(cagg.s, 0) AS s
       |          FROM grid LEFT JOIN cagg USING (media_id, cy, cx)),
       |dbits AS (SELECT a.media_id, a.cy, a.cx,
       |            CASE WHEN b.s * a.cnt > a.s * b.cnt THEN 1 ELSE 0 END
       |              AS bit
       |          FROM cfull a JOIN cfull b ON b.media_id = a.media_id
       |            AND b.cy = a.cy AND b.cx = a.cx + 1
       |          WHERE a.cx < $gw),
       |dh AS (SELECT media_id,
       |         CAST(sum(CAST(bit AS BIGINT) * (1::BIGINT << (cy*$gw + cx)))
       |           AS BIGINT) AS dhash
       |       FROM dbits GROUP BY 1)""".stripMargin
  }

  private lazy val dhashCtes: String = dhashCtesFor(
    """SELECT doc_id AS media_id, 4 + doc_id % 13 AS w,
      |                4 + doc_id % 11 AS h
      |              FROM documents WHERE doc_id % 2 = 0""".stripMargin,
    "CAST(media_id AS HUGEINT)", gw = 4, gh = 4)

  private lazy val mmImageDhashSql =
    s"""WITH $dhashCtes
       |SELECT d.media_id, CAST(i.w AS INT) AS width,
       |       CAST(i.h AS INT) AS height, d.dhash
       |FROM dh d JOIN imgs i USING (media_id)""".stripMargin

  /** DataComp-style (image, caption) pair filter: real-codec dims +
    * aspect + perceptual-hash uniqueness on the image side, token count
    * + stopword-profile language on the caption side, one conjunction
    * verdict per pair. The oracle composes the already-proven planted-
    * PNG pixel/dHash replay with the langid argmax replay. See
    * [[graft.ops.Multimodal.dataCompPairFilter]].
    */
  private def mmDataCompFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Multimodal.dataCompPairFilter(
      Multimodal.mediaWithImages(s, docs), docs, "doc_id", "text",
      minDim = 8, maxAspect = 2, minCapTokens = 5, okLangs = Seq("en"))
  }

  /** Caption-side SQL replay shared by the (image, caption) and
    * (audio, caption) pair filters: whitespace token count +
    * stopword-profile language argmax over the `documents` rows
    * matching `whereSql` (empty string = all rows). Emits the CTE
    * chain `capb`/`caps`/`cap` with `cap(media_id, n_cap_tokens,
    * lang_pred)`.
    */
  private def captionSideCtes(whereSql: String): String = {
    val scores = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"length(list_intersect(dtoks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""capb AS (SELECT doc_id, text,
       |    list_distinct(string_split_regex(lower(trim(text)), '\\s+'))
       |      AS dtoks
       |  FROM documents $whereSql),
       |caps AS (SELECT doc_id, text, $scores FROM capb),
       |cap AS (SELECT doc_id AS media_id,
       |    CAST(length(string_split_regex(lower(trim(text)), '\\s+'))
       |      AS INT) AS n_cap_tokens,
       |    CASE $cases ELSE '${langs.last}' END AS lang_pred
       |  FROM caps)""".stripMargin
  }

  private lazy val mmDataCompFilterSql = {
    s"""WITH $dhashCtes,
       |dup AS (SELECT dhash, count(*) AS n FROM dh GROUP BY 1),
       |${captionSideCtes("WHERE doc_id % 2 = 0")},
       |verd AS (SELECT d.media_id, CAST(i.w AS INT) AS width,
       |    CAST(i.h AS INT) AS height, c.n_cap_tokens, c.lang_pred,
       |    least(i.w, i.h) >= 8 AS r_dims,
       |    greatest(i.w, i.h) <= 2 * least(i.w, i.h) AS r_aspect,
       |    dup.n = 1 AS r_unique_img,
       |    c.n_cap_tokens >= 5 AS r_caption_len,
       |    c.lang_pred IN ('en') AS r_caption_lang
       |  FROM dh d JOIN imgs i USING (media_id) JOIN dup USING (dhash)
       |       JOIN cap c USING (media_id))
       |SELECT *, r_dims AND r_aspect AND r_unique_img AND r_caption_len
       |    AND r_caption_lang AS keep
       |FROM verd""".stripMargin
  }

  /** CLAP-style (audio, caption) pair filter — the audio analogue of
    * `mm_datacomp_pair_filter`: clipping/silence gates over the REAL
    * WAV decode + duration window + caption token/language rules, all
    * composed from individually-oracled signals. The duration window
    * (1000..2200 samples) deliberately straddles the planted clip
    * lengths {800, 1200, 1600, 2000, 2400}, so both branches of
    * `r_duration` are live at every gate scale. Oracle replays the
    * synthetic PCM analytically (the `mm_audio_clipping_audit` CTEs)
    * and the caption side via [[captionSideCtes]].
    */
  private def mmClapFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Multimodal.clapPairFilter(Multimodal.mediaWithAudio(s, docs), docs,
      "doc_id", "text", minSamples = 1000, maxSamples = 2200,
      minCapTokens = 5, okLangs = Seq("en"))
  }

  private lazy val mmClapFilterSql =
    s"""WITH a AS (SELECT doc_id AS media_id, 800 + (doc_id % 5) * 400 AS n
       |           FROM documents),
       |smp AS (SELECT media_id, n, unnest(range(n)) AS i FROM a),
       |v AS (SELECT media_id, n,
       |        abs(((media_id * 31 + i * 7919) % 65536) - 32768) AS am
       |      FROM smp),
       |g AS (SELECT media_id,
       |        CAST(max(n) AS INT) AS n_samples,
       |        CAST(count(CASE WHEN am >= 32700 THEN 1 END) AS BIGINT)
       |          AS clip_cnt,
       |        CAST(count(CASE WHEN am <= 327 THEN 1 END) AS BIGINT)
       |          AS sil_cnt
       |      FROM v GROUP BY 1),
       |${captionSideCtes("")}
       |SELECT g.media_id, g.n_samples,
       |  CAST(round(CAST(clip_cnt AS DOUBLE) / CAST(n_samples AS DOUBLE) *
       |    1000000.0) AS BIGINT) AS clip_ppm,
       |  CAST(round(CAST(sil_cnt AS DOUBLE) / CAST(n_samples AS DOUBLE) *
       |    1000000.0) AS BIGINT) AS silence_ppm,
       |  c.n_cap_tokens, c.lang_pred,
       |  clip_cnt * 1000 <= n_samples AS r_clipping,
       |  sil_cnt * 2 <= n_samples AS r_silence,
       |  n_samples BETWEEN 1000 AND 2200 AS r_duration,
       |  c.n_cap_tokens >= 5 AS r_caption_len,
       |  c.lang_pred IN ('en') AS r_caption_lang,
       |  (clip_cnt * 1000 <= n_samples) AND (sil_cnt * 2 <= n_samples)
       |    AND (n_samples BETWEEN 1000 AND 2200)
       |    AND (c.n_cap_tokens >= 5) AND (c.lang_pred IN ('en')) AS keep
       |FROM g JOIN cap c USING (media_id)""".stripMargin

  /** Image near-dup pairs at Hamming ≤ 3 over the 16-bit dHash, found
    * by pigeonhole banding (4 bands × 4 bits — recall 1 by
    * construction), verified by exact popcount. See
    * [[graft.ops.Multimodal.dhashNearDupPairs]].
    */
  private def mmImageNearDupPairs(s: SparkSession, dir: String): DataFrame =
    Multimodal.dhashNearDupPairs(
      Multimodal.imageDHashes(
        Multimodal.mediaWithImages(s, Tables.documents(s, dir)),
        gw = 4, gh = 4).toDF(),
      bits = 16, maxDist = 3)

  private lazy val mmImageNearDupPairsSql =
    s"""WITH $dhashCtes,
       |posts AS (SELECT media_id, dhash, b.b AS band,
       |            (dhash >> CAST(b.b * 4 AS INT)) & 15 AS bv
       |          FROM dh CROSS JOIN range(4) b(b)),
       |cand AS (SELECT DISTINCT a.media_id AS id1, b.media_id AS id2,
       |            a.dhash AS h1, b.dhash AS h2
       |         FROM posts a JOIN posts b ON a.band = b.band
       |           AND a.bv = b.bv AND a.media_id < b.media_id)
       |SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(h1, h2)) <= 3""".stripMargin

  /** The 100 TB form of image dedup: a WIDE dHash (7×8 = 56 bits)
    * grouped EXACTLY — dedup_exact_groups' shape on the perceptual
    * fingerprint. The 16-bit pair query above is the gate-scale
    * near-dup baseline; its 4-bit bands hold only 16 values, so bucket
    * occupancy grows linearly with the corpus and in-bucket pairs
    * quadratically (measured 270 s at factor-100). At scale you hash
    * WIDER (multi-index hashing: 4 bands × 14 bits = 16k bucket
    * values here; real deployments use 64–256-bit pHashes) and the
    * same banding stays occupancy-bounded — exact grouping on the
    * 56-bit hash is the degenerate maxDist=0 case and needs only ONE
    * combinable groupBy, no pair stage at all. Planted twins
    * (pixels a function of doc_id % 97, fixed 12×10) keep the dup
    * branch live at every SF with `mod` groups of growing size.
    */
  private def mmImageDupGroups(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageDHashes(
      Multimodal.mediaWithPlantedTwins(s, Tables.documents(s, dir),
        mod = 97, w = 12, h = 10),
      gw = 7, gh = 8).toDF()
      .groupBy(col("dhash"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("dup_cnt"))

  private lazy val mmImageDupGroupsSql = {
    val ctes = dhashCtesFor(
      "SELECT doc_id AS media_id, 12 AS w, 10 AS h FROM documents",
      "CAST(media_id % 97 AS HUGEINT)", gw = 7, gh = 8)
    s"""WITH $ctes
       |SELECT dhash, min(media_id) AS keep_id,
       |       count(*) AS dup_cnt
       |FROM dh GROUP BY 1""".stripMargin
  }

  /** Video frame-sample gate: GMJ1 container walk + REAL `imageio`
    * decode of every 2nd frame of the planted videos — the "probe one
    * frame a second and embed it" ingestion shape; see
    * [[graft.ops.Multimodal.videoFrameFeatures]]. The oracle replays
    * each sampled frame's pixels with the seed-parameterized PNG
    * replay (seed = media_id·1000 + frame), so container framing,
    * sampling stride, and the per-frame decode are all hash-checked.
    */
  private def mmVideoFrames(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaWithVideo(s, Tables.documents(s, dir))
    Multimodal.videoFrameFeatures(media, everyN = 2).toDF()
      .select(col("media_id"), col("frame"),
        posexplode(col("features")).as(Seq("idx", "feature")))
  }

  private val mmVideoFramesSql = {
    val imgs =
      """SELECT doc_id AS media_id, CAST(f.f AS INT) AS frame,
        |       4 + doc_id % 13 AS w, 4 + doc_id % 11 AS h
        |FROM documents CROSS JOIN range(0, 4) f(f)
        |WHERE doc_id % 3 = 0 AND f.f < 2 + doc_id % 3
        |  AND f.f % 2 = 0""".stripMargin
    s"""WITH ${pngReplayCtes(imgs, Seq("media_id", "frame"),
        "CAST(media_id AS HUGEINT) * 1000 + frame")}
       |SELECT media_id, frame, CAST(idx AS INT) AS idx, feature
       |FROM feats""".stripMargin
  }

  /** The real-decode AUDIO gate: per-frame RMS + zero-crossing counts
    * of planted PCM WAVs, decoded by `javax.sound.sampled` (JDK
    * built-in — an actual RIFF/PCM codec pass, not a header sniff; see
    * [[graft.ops.Multimodal.AudioCodec]]). The sample generator is pure
    * integer arithmetic, so the oracle replays the exact samples the
    * codec must recover from the bytes: sums of squares are exact
    * BIGINTs on both sides, making the rounded RMS bit-stable. MP3/AAC
    * remain FakeCodec fallbacks (no JDK codec) — PCM WAV is the honest
    * real subset.
    */
  private def mmAudioFrames(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaWithAudio(s, Tables.documents(s, dir))
    Multimodal.audioFrameFeatures(media, frameSize = 400).toDF()
      .select(col("media_id"), col("frame"),
        round(col("rms"), 6).as("rms"), col("zcr"))
  }

  private val mmAudioFramesSql =
    """WITH a AS (SELECT doc_id AS media_id, 800 + (doc_id % 5) * 400 AS n
      |           FROM documents),
      |s AS (SELECT media_id, unnest(range(n)) AS i FROM a),
      |v AS (SELECT media_id, i,
      |        ((media_id * 31 + i * 7919) % 65536) - 32768 AS smp,
      |        i // 400 AS frame FROM s),
      |z AS (SELECT media_id, frame, smp, i % 400 AS k,
      |        lag(smp) OVER (PARTITION BY media_id ORDER BY i) AS prev
      |      FROM v)
      |SELECT media_id, CAST(frame AS INT) AS frame,
      |       round(sqrt(sum(smp * smp) / 400.0), 6) AS rms,
      |       CAST(count(CASE WHEN k > 0 AND ((prev < 0) != (smp < 0))
      |                       THEN 1 END) AS INT) AS zcr
      |FROM z GROUP BY 1, 2""".stripMargin

  /** Audio clipping/silence/level gate over the real WAV decode path —
    * the pre-transcription screen. Oracle replays the synthetic PCM
    * samples analytically (the `mm_decode_audio_frames` precedent).
    * See [[graft.ops.Multimodal.audioClippingAudit]].
    */
  private def mmAudioClipping(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioClippingAudit(
      Multimodal.mediaWithAudio(s, Tables.documents(s, dir)))

  private val mmAudioClippingSql =
    """WITH a AS (SELECT doc_id AS media_id, 800 + (doc_id % 5) * 400 AS n
      |           FROM documents),
      |s AS (SELECT media_id, n, unnest(range(n)) AS i FROM a),
      |v AS (SELECT media_id, n,
      |        abs(((media_id * 31 + i * 7919) % 65536) - 32768) AS am,
      |        ((media_id * 31 + i * 7919) % 65536) - 32768 AS smp
      |      FROM s),
      |g AS (SELECT media_id,
      |        CAST(max(n) AS INT) AS n_samples,
      |        CAST(max(am) AS INT) AS peak,
      |        CAST(count(CASE WHEN am >= 32700 THEN 1 END) AS BIGINT)
      |          AS clip_cnt,
      |        CAST(count(CASE WHEN am <= 327 THEN 1 END) AS BIGINT)
      |          AS sil_cnt,
      |        CAST(sum(smp * smp) AS BIGINT) AS ss
      |      FROM v GROUP BY 1)
      |SELECT media_id, n_samples, peak,
      |  round(sqrt(CAST(ss AS DOUBLE) / CAST(n_samples AS DOUBLE)), 6)
      |    AS rms,
      |  CASE WHEN peak > 0 THEN round(20.0 *
      |    log10(CAST(peak AS DOUBLE) / 32768.0), 6) END AS peak_dbfs,
      |  CAST(round(CAST(clip_cnt AS DOUBLE) / CAST(n_samples AS DOUBLE) *
      |    1000000.0) AS BIGINT) AS clip_ppm,
      |  CAST(round(CAST(sil_cnt AS DOUBLE) / CAST(n_samples AS DOUBLE) *
      |    1000000.0) AS BIGINT) AS silence_ppm,
      |  clip_cnt * 1000 <= n_samples AS r_clipping,
      |  sil_cnt * 2 <= n_samples AS r_silence
      |FROM g""".stripMargin

  /** Oracle for the COMPOSED multimodal pipeline: both feature paths
    * replay in SQL — planted-PNG pooled means (pixel replay, above) AND
    * the FakeCodec pseudo-features for text payloads (FNV-1a-style fold
    * over the utf8 bytes + splitmix finalizer, all in HUGEINT wrap
    * arithmetic; the synthetic corpus is pure ASCII so `ord` per char
    * equals the byte) — then the brute-force cosine top-3 re-ranks the
    * assembled vectors exactly as the Spark side does.
    */
  private val mmPipelineSql = {
    val FNV = BigInt("100000001B3", 16)
    val CB = BigInt("BF58476D1CE4E5B9", 16)
    val C2 = BigInt("94D049BB133111EB", 16)
    s"""WITH RECURSIVE $pngFeatureCtes,
       |fa0 AS (SELECT doc_id, text, length(text) AS n FROM documents
       |        WHERE doc_id % 2 = 1),
       |fnv AS (
       |  SELECT doc_id, text, n, 0 AS pos,
       |         CAST(11400714819323198485 AS HUGEINT) AS h
       |  FROM fa0
       |  UNION ALL
       |  SELECT doc_id, text, n, pos + 1,
       |         ${wrapMul64("xor(h, ord(substr(text, pos + 1, 1)))", FNV)}
       |  FROM fnv WHERE pos < n),
       |fh AS (SELECT doc_id, h FROM fnv WHERE pos = n),
       |sub16 AS (SELECT CAST(j AS HUGEINT) AS j FROM range(16) t(j)),
       |fz0 AS (SELECT doc_id, j,
       |          (h + ${wrapMul64("j", CB)}) % 18446744073709551616 AS z0
       |        FROM fh CROSS JOIN sub16),
       |fz1 AS (SELECT doc_id, j,
       |          ${wrapMul64("xor(z0, z0 // 1073741824)", CB)} AS z1
       |        FROM fz0),
       |fz2 AS (SELECT doc_id, j,
       |          ${wrapMul64("xor(z1, z1 // 134217728)", C2)} AS z2
       |        FROM fz1),
       |fakefeats AS (SELECT doc_id AS media_id, CAST(j AS INT) AS idx,
       |          CAST((z2 // 2048) / 9007199254740992.0 AS REAL) AS feature
       |        FROM fz2),
       |allfeats AS (SELECT media_id, idx, feature FROM feats
       |             UNION ALL
       |             SELECT media_id, idx, feature FROM fakefeats),
       |vecs AS (SELECT media_id,
       |           list(CAST(feature AS DOUBLE) ORDER BY idx) AS v
       |         FROM allfeats GROUP BY media_id),
       |mq AS (SELECT media_id AS query_id, v AS qv FROM vecs
       |       WHERE media_id < 3),
       |mscored AS (SELECT mq.query_id, e.media_id AS neighbor_id,
       |             round(list_cosine_similarity(mq.qv, e.v), 6) AS cosine
       |           FROM mq CROSS JOIN vecs e
       |           WHERE e.media_id <> mq.query_id)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
       |FROM (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
       |      FROM mscored) t
       |WHERE rank <= 3""".stripMargin
  }

  /** The REAL-decode gate: planted PNGs have dimensions that are a pure
    * function of media_id, so DuckDB can state the expected output of
    * the imageio decode exactly. A stub codec cannot pass this oracle.
    */
  private def mmImageDims(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaWithImages(s, Tables.documents(s, dir))
    Multimodal.extractFeatures(media).toDF()
      .filter(col("content_type") === "image/png")
      .select(col("media_id"), col("width"), col("height"), col("channels"))
  }

  private val mmImageDimsSql =
    """SELECT doc_id AS media_id,
      |       CAST(4 + doc_id % 13 AS INT) AS width,
      |       CAST(4 + doc_id % 11 AS INT) AS height,
      |       3 AS channels
      |FROM documents WHERE doc_id % 2 = 0""".stripMargin

  /** Composed multimodal pipeline: binary media -> batched decode
    * (real imageio for PNG rows, fallback for text rows) -> feature
    * vectors -> brute-force cosine top-3 over the decoded features.
    * Exercises the full media-to-similarity dataflow the engine is
    * meant for — and since round 7, fully hash-gated: both decode
    * paths replay in the oracle (see [[mmPipelineSql]]).
    */
  private def mmPipeline(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaWithImages(s, Tables.documents(s, dir))
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("features"))
    Similarity.bruteForceTopK(feats, "media_id", "features",
      queryIds = Seq(0L, 1L, 2L), k = 3)
  }

  /** Length-weighted deterministic sample of 100 docs (longer docs
    * proportionally likelier — the corpus-mixing "sample by quality
    * weight" step) via Efraimidis-Spirakis priorities on pinned
    * hashes. The oracle replays draw, priority, and the total order.
    */
  private def docWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        greatest(length(col("text")), lit(1)).cast("long").as("wt"))
    Sampling.weightedSample(docs, "doc_id", col("wt"), k = 100)
      .select(col("doc_id"), col("wt"), round(col("pri"), 6).as("pri"))
  }

  /** Kish effective sample size of the length-weighting scheme used by
    * `doc_weighted_sample` — how many equal-weight docs the weighted
    * corpus is worth. See [[graft.ops.Sampling.kishEss]].
    */
  private def docKishEss(s: SparkSession, dir: String): DataFrame =
    Sampling.kishEss(Tables.documents(s, dir),
      greatest(length(col("text")), lit(1)).cast("long"))

  private val docKishEssSql =
    """WITH w AS (SELECT CAST(greatest(length(text), 1) AS BIGINT) AS w
      |           FROM documents),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(w) AS HUGEINT) AS sw,
      |        CAST(sum(w * w) AS HUGEINT) AS sww
      |      FROM w)
      |SELECT n, CAST(sw AS BIGINT) AS sum_w,
      |  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) /
      |    CAST(sww AS DOUBLE), 6) AS ess,
      |  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) /
      |    CAST(sww AS DOUBLE) / CAST(n AS DOUBLE), 6) AS efficiency
      |FROM a""".stripMargin

  private val docWeightedSampleSql =
    """WITH w AS (
      |  SELECT doc_id, greatest(length(text), 1) AS wt,
      |    (CAST('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1.0)
      |      / 4294967296.0 AS u
      |  FROM documents)
      |SELECT doc_id, wt, round(pow(u, 1.0 / wt), 6) AS pri
      |FROM w
      |ORDER BY pow(u, 1.0 / wt) DESC, doc_id
      |LIMIT 100""".stripMargin

  /** DSIR importance-weighted selection: English docs are the target
    * slice, every doc is scored by the hashed-unigram log-likelihood
    * ratio target-vs-corpus, and the top 200 by (score desc, doc_id)
    * are flagged. The oracle replays bucket assignment (pinned md5),
    * both smoothed distributions, the per-doc sum (6dp), and the
    * selection order.
    */
  private def docDsirSelect(s: SparkSession, dir: String): DataFrame =
    Selection.dsirSelect(Tables.documents(s, dir), "doc_id", "text",
      isTarget = col("lang") === "en", k = 200, buckets = 1024)

  private val docDsirSelectSql =
    """WITH t AS (SELECT doc_id, (lang = 'en') AS is_target,
      |             string_split_regex(lower(trim(text)), '\s+') AS ts
      |           FROM documents),
      |toks0 AS (SELECT doc_id, is_target, unnest(ts) AS tok FROM t),
      |toks AS (SELECT doc_id, is_target,
      |           CAST('0x' || substr(md5('dsir:' || tok), 1, 8) AS BIGINT) % 1024 AS b
      |         FROM toks0 WHERE length(tok) > 0),
      |cells AS (SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_cnt,
      |                 count(*) AS r_cnt
      |          FROM toks GROUP BY 1),
      |tot AS (SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot FROM cells),
      |lr AS (SELECT b, ln((t_cnt + 1.0) / (t_tot + 1024)) -
      |                 ln((r_cnt + 1.0) / (r_tot + 1024)) AS lr
      |       FROM cells, tot),
      |sc AS (SELECT tk.doc_id, count(*) AS n_toks,
      |              round(sum(lr.lr), 6) AS dsir_score
      |       FROM toks tk JOIN lr USING (b) GROUP BY 1),
      |fin AS (SELECT d.doc_id, (d.lang = 'en') AS is_target,
      |                coalesce(sc.n_toks, 0) AS n_toks,
      |                coalesce(sc.dsir_score, 0.0) AS dsir_score
      |         FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)
      |SELECT doc_id, is_target, n_toks, dsir_score,
      |       row_number() OVER (ORDER BY dsir_score DESC, doc_id) <= 200
      |         AS selected
      |FROM fin""".stripMargin

  /** Corpus-stopword boilerplate pruning at df > 75%: the C4-style
    * shared-content removal, token-granular for this line-less corpus.
    * Ordering, empty-doc survival, and the corpus-global df criterion
    * are all replayed by the oracle.
    */
  /** RAKE corpus keyphrases (maxLen 3, top 25) — see
    * [[graft.ops.TextAnalysis.rakeKeyphrases]].
    */
  /** Naive Bayes language classifier train+eval — see
    * [[graft.ops.TextAnalysis.naiveBayesLangEval]]. 80/20 pinned md5
    * split, add-one smoothing, scaled-integer log scores.
    */
  /** Flesch / Flesch-Kincaid readability per document — see
    * [[graft.ops.TextAnalysis.readability]].
    */
  private def readabilityQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(Tables.documents(s, dir), "doc_id", "text")

  private val readabilitySql =
    """WITH b AS (SELECT doc_id, text,
      |             string_split_regex(lower(trim(text)), '\s+') AS toks
      |           FROM documents),
      |c AS (SELECT doc_id,
      |        CAST(len(toks) AS BIGINT) AS n_words,
      |        greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
      |          AS BIGINT)) AS n_sentences,
      |        CAST(list_sum(list_transform(toks, w ->
      |          greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))))
      |          AS BIGINT) AS n_syllables
      |      FROM b)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |       round(206.835
      |         - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
      |         AS flesch_ease,
      |       round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
      |         + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
      |         - 15.59, 6) AS fk_grade
      |FROM c""".stripMargin

  /** Heaps' law vocabulary-growth fit at 20 doc-id checkpoints — see
    * [[graft.ops.TextAnalysis.heapsLawFit]].
    */
  private def heapsLawQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heapsLawFit(Tables.documents(s, dir), "doc_id", "text",
      buckets = 20)

  private val heapsLawSql =
    """WITH base AS (SELECT doc_id AS id,
      |         string_split_regex(lower(trim(text)), '\s+') AS toks
      |       FROM documents),
      |mx AS (SELECT max(id) AS mx FROM base),
      |wb AS (SELECT id, toks,
      |         CAST(floor(id / (floor(mx / 20) + 1)) AS BIGINT) AS b
      |       FROM base CROSS JOIN mx),
      |tpb AS (SELECT b, CAST(sum(len(toks)) AS BIGINT) AS nt
      |        FROM wb GROUP BY 1),
      |fd AS (SELECT w, min(id) AS fid
      |       FROM (SELECT id, unnest(toks) AS w FROM wb) GROUP BY 1),
      |npb AS (SELECT CAST(floor(fid / (floor(mx / 20) + 1)) AS BIGINT)
      |          AS b, count(*) AS nv
      |        FROM fd CROSS JOIN mx GROUP BY 1),
      |cp0 AS (SELECT tpb.b, tpb.nt, coalesce(npb.nv, 0) AS nv
      |        FROM tpb LEFT JOIN npb USING (b)),
      |cp AS (SELECT b AS bucket,
      |         CAST(sum(nt) OVER (ORDER BY b) AS BIGINT) AS cum_tokens,
      |         CAST(sum(nv) OVER (ORDER BY b) AS BIGINT) AS cum_vocab
      |       FROM cp0),
      |cpf AS (SELECT bucket, cum_tokens, cum_vocab,
      |          CAST(round(ln(CAST(cum_tokens AS DOUBLE)) * 1e6)
      |            AS BIGINT) AS x,
      |          CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * 1e6)
      |            AS BIGINT) AS y
      |        FROM cp WHERE cum_tokens > 0 AND cum_vocab > 0),
      |mom AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |          sum(x * y) AS sxy, sum(x * x) AS sxx
      |        FROM cpf),
      |fit AS (SELECT
      |          round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |                CAST(n * sxx - sx * sx AS DOUBLE), 6) AS beta,
      |          round(exp(((CAST(sy AS DOUBLE) -
      |            (CAST(n * sxy - sx * sy AS DOUBLE) /
      |             CAST(n * sxx - sx * sx AS DOUBLE)) *
      |            CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / 1e6), 6)
      |            AS k
      |        FROM mom)
      |SELECT bucket, cum_tokens, cum_vocab, fit.beta, fit.k
      |FROM cpf CROSS JOIN fit""".stripMargin

  /** χ² discriminative terms per language, top 10 — see
    * [[graft.ops.TextAnalysis.chiSquareTerms]].
    */
  /** Neyman-allocation stratified sample of documents by source,
    * budget 100, allocation driven by n_chars spread — see
    * [[graft.ops.Sampling.neymanStratifiedSample]].
    */
  private def neymanSampleQ(s: SparkSession, dir: String): DataFrame =
    Sampling.neymanStratifiedSample(Tables.documents(s, dir), "doc_id",
      "source", "n_chars", budget = 100L)

  private val neymanSampleSql =
    """WITH st AS (SELECT source AS h, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(n_chars) AS BIGINT) AS sx,
      |         CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
      |       FROM documents GROUP BY 1),
      |s2 AS (SELECT h, n,
      |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n AS sigma
      |       FROM st),
      |s3 AS (SELECT h, n, sigma,
      |         CAST(round(CAST(n AS DOUBLE) * sigma * 1e6) AS BIGINT)
      |           AS wh
      |       FROM s2),
      |tt AS (SELECT CAST(sum(wh) AS BIGINT) AS wtot FROM s3),
      |al AS (SELECT h, n, sigma,
      |         CAST(round(100 * CAST(wh AS DOUBLE) / wtot) AS BIGINT)
      |           AS n_alloc
      |       FROM s3 CROSS JOIN tt),
      |rk AS (SELECT doc_id, source AS h, n_chars,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY md5('neyman:' || CAST(doc_id AS VARCHAR)) ASC,
      |             doc_id ASC) AS rn
      |       FROM documents),
      |sm AS (SELECT rk.h, CAST(count(*) AS BIGINT) AS n_sampled,
      |         CAST(sum(n_chars) AS BIGINT) AS ssum
      |       FROM rk JOIN al USING (h) WHERE rn <= n_alloc GROUP BY 1)
      |SELECT al.h AS source, al.n AS n_pop, round(al.sigma, 6) AS sigma,
      |       al.n_alloc, coalesce(sm.n_sampled, 0) AS n_sampled,
      |       CASE WHEN coalesce(sm.n_sampled, 0) = 0 THEN NULL
      |            ELSE round(CAST(ssum AS DOUBLE) / sm.n_sampled, 6) END
      |         AS sample_mean
      |FROM al LEFT JOIN sm USING (h)""".stripMargin

  private def chi2TermsQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chiSquareTerms(Tables.documents(s, dir), "doc_id",
      "text", "lang", topK = 10)

  private val chi2TermsSql =
    """WITH dt AS (SELECT DISTINCT id, lbl, w FROM (
      |        SELECT doc_id AS id, lang AS lbl,
      |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      |        FROM documents)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
      |pl AS (SELECT lang AS lbl, CAST(count(*) AS BIGINT) AS nl
      |       FROM documents GROUP BY 1),
      |tw AS (SELECT w, CAST(count(*) AS BIGINT) AS tw FROM dt GROUP BY 1),
      |aa AS (SELECT lbl, w, CAST(count(*) AS BIGINT) AS a
      |       FROM dt GROUP BY 1, 2),
      |cells AS (SELECT aa.lbl, aa.w, a, tw - a AS b, nl - a AS c,
      |            nn - nl - (tw - a) AS d, nn
      |          FROM aa JOIN pl USING (lbl) JOIN tw USING (w)
      |          CROSS JOIN nn),
      |sc AS (SELECT lbl AS label, w AS term, a AS n_docs_label,
      |         round(CASE WHEN CAST(a + b AS DOUBLE) * (c + d) *
      |                 (a + c) * (b + d) = 0 THEN 0.0
      |           ELSE CAST(nn AS DOUBLE) * (a * d - b * c) *
      |                (a * d - b * c) /
      |                (CAST(a + b AS DOUBLE) * (c + d) * (a + c) *
      |                 (b + d)) END, 6) AS chi2
      |       FROM cells),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY label
      |        ORDER BY chi2 DESC, term ASC) AS INT) AS rank
      |      FROM sc)
      |SELECT label, term, n_docs_label, chi2, rank
      |FROM r WHERE rank <= 10""".stripMargin

  private def nbLangConfusionQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.naiveBayesLangEval(Tables.documents(s, dir), "doc_id",
      "text", "lang", testMod = 5)

  private val nbLangConfusionSql =
    """WITH base AS (
      |  SELECT doc_id AS id, lang,
      |         string_split_regex(lower(trim(text)), '\s+') AS toks,
      |         CAST(CAST('0x' || substr(md5('nbsplit:' ||
      |           CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS INT)
      |           AS h
      |  FROM documents),
      |tt AS (SELECT lang, unnest(toks) AS w FROM base WHERE h <> 0),
      |cw AS (SELECT lang, w, count(*) AS c FROM tt GROUP BY 1, 2),
      |tl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cw GROUP BY 1),
      |vo AS (SELECT count(DISTINCT w) AS v FROM cw),
      |pr AS (SELECT lang, count(*) AS nd FROM base WHERE h <> 0
      |       GROUP BY 1),
      |nt AS (SELECT count(*) AS ndt FROM base WHERE h <> 0),
      |ls AS (SELECT tl.lang,
      |         CAST(round(ln(1.0 / CAST(t + vo.v AS DOUBLE)) * 1e6)
      |           AS BIGINT) AS dflt,
      |         CAST(round(ln(CAST(nd AS DOUBLE) / nt.ndt) * 1e6)
      |           AS BIGINT) AS prior
      |       FROM tl JOIN pr USING (lang) CROSS JOIN vo CROSS JOIN nt),
      |ll AS (SELECT cw.lang, cw.w,
      |         CAST(round(ln(CAST(c + 1 AS DOUBLE) /
      |           CAST(t + vo.v AS DOUBLE)) * 1e6) AS BIGINT) AS ll
      |       FROM cw JOIN tl USING (lang) CROSS JOIN vo),
      |dt AS (SELECT id, lang AS true_lang, unnest(toks) AS w
      |       FROM base WHERE h = 0),
      |sc AS (SELECT dt.id, dt.true_lang, ls.lang,
      |         coalesce(ll.ll, ls.dflt) AS s, ls.prior
      |       FROM dt CROSS JOIN ls
      |       LEFT JOIN ll ON ll.lang = ls.lang AND ll.w = dt.w),
      |ds AS (SELECT id, true_lang, lang,
      |         CAST(sum(s) AS BIGINT) + max(prior) AS score
      |       FROM sc GROUP BY 1, 2, 3),
      |p AS (SELECT true_lang, lang AS pred_lang,
      |        row_number() OVER (PARTITION BY id
      |          ORDER BY score DESC, lang ASC) AS rn
      |      FROM ds)
      |SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      |FROM p WHERE rn = 1 GROUP BY 1, 2""".stripMargin

  /** Per-document n-gram novelty against all earlier doc_ids — which
    * documents actually add new material. See
    * [[graft.ops.TextAnalysis.ngramNovelty]].
    */
  private def ngramNoveltyQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.ngramNovelty(Tables.documents(s, dir), "doc_id", "text")

  private val ngramNoveltySql =
    """WITH t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
      |sh AS (SELECT DISTINCT doc_id, substr(txt, CAST(i AS INT), 8) AS s
      |       FROM (SELECT doc_id, txt,
      |               unnest(generate_series(1,
      |                 greatest(length(txt) - 7, 1))) AS i
      |             FROM t) u),
      |f AS (SELECT s, min(doc_id) AS fdoc FROM sh GROUP BY 1)
      |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(CASE WHEN f.fdoc = sh.doc_id THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_novel,
      |  round(CAST(sum(CASE WHEN f.fdoc = sh.doc_id THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS novelty
      |FROM sh JOIN f USING (s) GROUP BY 1""".stripMargin

  /** Hapax / Good-Turing vocabulary profile per language: unseen-mass
    * estimate p₀ = V₁/N and the GT-adjusted hapax count — how
    * vocabulary-hungry each language slice still is (the derivative
    * companion to `text_heaps_law`'s growth fit). See
    * [[graft.ops.TextAnalysis.hapaxProfile]].
    */
  private def hapaxGtQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hapaxProfile(Tables.documents(s, dir), "doc_id",
      "text", "lang")

  private val hapaxGtSql =
    """WITH tt AS (SELECT lang,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      |  FROM documents),
      |cw AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
      |       FROM tt GROUP BY 1, 2)
      |SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS vocab,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / sum(c), 6) AS p_unseen,
      |  CASE WHEN sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0 THEN
      |    round(2.0 * sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) /
      |      sum(CASE WHEN c = 1 THEN 1 ELSE 0 END), 6) END
      |    AS gt_singleton
      |FROM cw GROUP BY 1""".stripMargin

  /** McNemar's paired test between the stopword-profile heuristic
    * langid (classifier A) and the trained Naive Bayes (classifier B)
    * on the NB's held-out bucket, both judged against the declared
    * `lang`: does the trained model beat the heuristic *on the same
    * documents*, conditioning on discordant pairs only. See
    * [[graft.ops.TextAnalysis.mcnemarPaired]].
    */
  private def mcnemarLangidNb(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nb = TextAnalysis.naiveBayesLangPredictions(docs, "doc_id",
      "text", "lang", testMod = 5)
    val heur = docs.select(col("doc_id").as("id"),
      TextAnalysis.langId(col("text")).as("pred_h"))
    TextAnalysis.mcnemarPaired(nb.join(heur, "id"),
      col("true_lang"), col("pred_h"), col("pred_lang"))
  }

  private val mcnemarLangidNbSql = {
    val scores = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"length(list_intersect(dtoks, $arr)) AS s_$l"
    }.mkString(",\n    ")
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH base AS (
       |  SELECT doc_id AS id, lang,
       |         string_split_regex(lower(trim(text)), '\\s+') AS toks,
       |         CAST(CAST('0x' || substr(md5('nbsplit:' ||
       |           CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS INT)
       |           AS h
       |  FROM documents),
       |tt AS (SELECT lang, unnest(toks) AS w FROM base WHERE h <> 0),
       |cw AS (SELECT lang, w, count(*) AS c FROM tt GROUP BY 1, 2),
       |tl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cw GROUP BY 1),
       |vo AS (SELECT count(DISTINCT w) AS v FROM cw),
       |pr AS (SELECT lang, count(*) AS nd FROM base WHERE h <> 0
       |       GROUP BY 1),
       |nt AS (SELECT count(*) AS ndt FROM base WHERE h <> 0),
       |ls AS (SELECT tl.lang,
       |         CAST(round(ln(1.0 / CAST(t + vo.v AS DOUBLE)) * 1e6)
       |           AS BIGINT) AS dflt,
       |         CAST(round(ln(CAST(nd AS DOUBLE) / nt.ndt) * 1e6)
       |           AS BIGINT) AS prior
       |       FROM tl JOIN pr USING (lang) CROSS JOIN vo CROSS JOIN nt),
       |ll AS (SELECT cw.lang, cw.w,
       |         CAST(round(ln(CAST(c + 1 AS DOUBLE) /
       |           CAST(t + vo.v AS DOUBLE)) * 1e6) AS BIGINT) AS ll
       |       FROM cw JOIN tl USING (lang) CROSS JOIN vo),
       |dt AS (SELECT id, lang AS true_lang, unnest(toks) AS w
       |       FROM base WHERE h = 0),
       |scn AS (SELECT dt.id, dt.true_lang, ls.lang,
       |         coalesce(ll.ll, ls.dflt) AS s, ls.prior
       |       FROM dt CROSS JOIN ls
       |       LEFT JOIN ll ON ll.lang = ls.lang AND ll.w = dt.w),
       |ds AS (SELECT id, true_lang, lang,
       |         CAST(sum(s) AS BIGINT) + max(prior) AS score
       |       FROM scn GROUP BY 1, 2, 3),
       |nbp AS (SELECT id, true_lang, lang AS pred_nb
       |       FROM (SELECT id, true_lang, lang,
       |               row_number() OVER (PARTITION BY id
       |                 ORDER BY score DESC, lang ASC) AS rn
       |             FROM ds) WHERE rn = 1),
       |hb AS (SELECT doc_id AS id,
       |         list_distinct(string_split_regex(lower(trim(text)),
       |           '\\s+')) AS dtoks
       |       FROM documents),
       |hsc AS (SELECT id, $scores FROM hb),
       |hp AS (SELECT id, CASE $cases ELSE '${langs.last}' END AS pred_h
       |       FROM hsc),
       |j AS (SELECT nbp.true_lang, nbp.pred_nb, hp.pred_h
       |      FROM nbp JOIN hp USING (id)),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CASE WHEN pred_h = true_lang AND
       |          pred_nb = true_lang THEN 1 ELSE 0 END) AS BIGINT)
       |          AS both_right,
       |        CAST(sum(CASE WHEN pred_h <> true_lang AND
       |          pred_nb <> true_lang THEN 1 ELSE 0 END) AS BIGINT)
       |          AS both_wrong,
       |        CAST(sum(CASE WHEN pred_h = true_lang AND
       |          pred_nb <> true_lang THEN 1 ELSE 0 END) AS BIGINT)
       |          AS a_only,
       |        CAST(sum(CASE WHEN pred_h <> true_lang AND
       |          pred_nb = true_lang THEN 1 ELSE 0 END) AS BIGINT)
       |          AS b_only
       |      FROM j)
       |SELECT n, both_right, both_wrong, a_only, b_only,
       |  CASE WHEN a_only + b_only > 0 THEN
       |    round((abs(a_only - b_only) - 1) * (abs(a_only - b_only) - 1)
       |      / CAST(a_only + b_only AS DOUBLE), 6) END AS chi2_cc
       |FROM m""".stripMargin
  }

  private def rakeKeyphrasesQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rakeKeyphrases(Tables.documents(s, dir), "doc_id",
      "text", maxLen = 3, topN = 25)

  private val rakeKeyphrasesSql =
    """WITH toks AS (
      |  SELECT doc_id, i AS pos, ts[CAST(i AS INT)] AS w
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '\s+') AS ts,
      |          unnest(generate_series(1,
      |            len(string_split_regex(lower(trim(text)), '\s+'))))
      |            AS i
      |        FROM documents)),
      |flag AS (SELECT doc_id, pos, w,
      |           CASE WHEN w IN ('the','and','of','to','a','in','is',
      |                           'it','you','that') OR w = ''
      |                THEN 1 ELSE 0 END AS brk
      |         FROM toks),
      |g AS (SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos)
      |        AS grp
      |      FROM flag),
      |ph AS (SELECT doc_id, grp, list(w ORDER BY pos) AS ws
      |       FROM g WHERE brk = 0 GROUP BY 1, 2),
      |ph2 AS (SELECT * FROM ph WHERE len(ws) BETWEEN 1 AND 3),
      |pw AS (SELECT doc_id, grp, ws, r.p AS wp,
      |         ws[CAST(r.p AS INT)] AS w
      |       FROM ph2 CROSS JOIN range(1, 4) r(p) WHERE r.p <= len(ws)),
      |st AS (SELECT w, count(*) AS freq, sum(len(ws)) AS deg
      |       FROM pw GROUP BY 1),
      |sc AS (SELECT pw.ws,
      |         list(CAST(st.deg AS DOUBLE) / st.freq ORDER BY pw.wp)
      |           AS rs
      |       FROM pw JOIN st USING (w)
      |       GROUP BY pw.doc_id, pw.grp, pw.ws),
      |ps AS (SELECT array_to_string(ws, ' ') AS phrase,
      |              list_aggregate(rs, 'sum') AS score
      |       FROM sc)
      |SELECT phrase, CAST(count(*) AS BIGINT) AS n,
      |       round(max(score), 6) AS score
      |FROM ps GROUP BY 1 ORDER BY score DESC, phrase LIMIT 25"""
      .stripMargin

  private def dropStopwords(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dropCorpusStopwords(
      Tables.documents(s, dir), "doc_id", "text", maxDfFrac = 0.75)

  private val dropStopwordsSql =
    """WITH toks AS (
      |  SELECT doc_id, i AS pos, ts[CAST(i AS INT)] AS w
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ts,
      |          unnest(generate_series(1, len(string_split(text, ' ')))) AS i
      |        FROM documents)),
      |nd AS (SELECT count(DISTINCT doc_id) AS ndocs FROM documents),
      |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |stop AS (SELECT w FROM dfreq, nd WHERE df > 0.75 * ndocs),
      |kept AS (SELECT doc_id, pos, w FROM toks
      |         WHERE w NOT IN (SELECT w FROM stop))
      |SELECT d.doc_id,
      |       coalesce(string_agg(k.w, ' ' ORDER BY k.pos), '') AS kept_text
      |FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
      |GROUP BY d.doc_id""".stripMargin

  def qs: Seq[QueryDef] = Seq(
    QueryDef("dedup_exact_groups", dedupExact, Some(dedupExactSql)),
    QueryDef("dedup_substring_runs", dedupSubstringRuns,
      Some(dedupSubstringRunsSql)),
    QueryDef("er_sorted_neighborhood", erSortedNeighborhood,
      Some(erSortedNeighborhoodSql)),
    QueryDef("er_name_clusters", erNameClusters, Some(erNameClustersSql)),
    QueryDef("dedup_fuzzy_parts_dl", dedupFuzzyPartsDl,
      Some(dedupFuzzyPartsDlSql)),
    QueryDef("dedup_fuzzy_parts", dedupFuzzyParts,
      Some(dedupFuzzyPartsSql)),
    QueryDef("dedup_rate_by_source", dedupRateBySource,
      Some(dedupRateBySourceSql)),
    QueryDef("dedup_lines", dedupLines, Some(dedupLinesSql)),
    QueryDef("dedup_span_stats", dedupSpanStats, Some(dedupSpanStatsSql)),
    QueryDef("dedup_span_removal", dedupSpanRemoval,
      Some(dedupSpanRemovalSql)),
    QueryDef("dedup_ngram_jaccard", jaccardPairs, Some(jaccardPairsSql)),
    QueryDef("dedup_containment_pairs", containmentPairs,
      Some(containmentPairsSql)),
    QueryDef("dedup_jaccard_clusters", jaccardClusters, Some(jaccardClustersSql)),
    QueryDef("dedup_cluster_safe_split", dedupClusterSafeSplit,
      Some(dedupClusterSafeSplitSql)),
    QueryDef("dedup_cluster_size_dist", dedupClusterSizeDist,
      Some(dedupClusterSizeDistSql)),
    QueryDef("dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    QueryDef("dedup_against_reference", dedupAgainstRef, Some(dedupAgainstRefSql)),
    QueryDef("dedup_bloom_prefilter", dedupBloomPrefilter,
      Some(dedupBloomPrefilterSql)),
    QueryDef("doc_snapshot_diff", docSnapshotDiff, Some(docSnapshotDiffSql)),
    QueryDef("dedup_band_store_merge", dedupBandStoreMerge,
      Some(dedupBandStoreMergeSql)),
    QueryDef("dedup_incremental_bands", dedupIncremental,
      Some(dedupIncrementalSql)),
    QueryDef("dedup_minhash_lsh", minhashLsh, Some(minhashLshSql)),
    QueryDef("dedup_lsh_recall_audit", lshRecallAudit,
      Some(lshRecallAuditSql)),
    QueryDef("dedup_jw_verified", dedupJwVerified,
      Some(dedupJwVerifiedSql)),
    QueryDef("dedup_edit_verified", dedupEditVerified,
      Some(dedupEditVerifiedSql)),
    QueryDef("dedup_simhash_sigs", simhashSigs, Some(simhashSigsSql)),
    QueryDef("dedup_simhash_pairs", simhashPairs, Some(simhashPairsSql)),
    QueryDef("dedup_semantic", semanticDedup, Some(semanticDedupSql)),
    QueryDef("dedup_signal_triage_lsh_auto", dedupSignalTriageLshAuto,
      Some(dedupSignalTriageLshAutoSql)),
    QueryDef("dedup_signal_triage_lsh", dedupSignalTriageLsh,
      Some(dedupSignalTriageLshSql)),
    QueryDef("dedup_signal_triage", dedupSignalTriage,
      Some(dedupSignalTriageSql)),
    QueryDef("sim_cosine_pairs", embCosinePairs, Some(embCosinePairsSql)),
    QueryDef("sim_cosine_pairs_sampled", embCosinePairsSampled,
      Some(embCosinePairsSampledSql)),
    QueryDef("sim_lsh_cosine_pairs", embLshCosinePairs,
      Some(embLshCosinePairsAutoSql)),
    QueryDef("sim_jl_distortion", jlDistortion, Some(jlDistortionSql)),
    QueryDef("sim_silhouette_by_cell", silhouetteByCellQ,
      Some(silhouetteByCellSql)),
    QueryDef("sim_lsh_cosine_pairs_pinned", embLshCosinePairsPinned,
      Some(embLshCosinePairsPinnedSql)),
    QueryDef("sim_ann_topk_brute", annBrute, Some(annBruteSql)),
    QueryDef("sim_ann_topk_same_label", annSameLabel, Some(annSameLabelSql)),
    QueryDef("sim_ann_topk_ivf_filtered", annIvfSameLabel,
      Some(annIvfSameLabelCertSql)),
    QueryDef("sim_ann_topk_lsh", annLsh, Some(annLshSql)),
    QueryDef("sim_ann_rbo_lsh", annRboLsh, Some(annRboLshSql)),
    QueryDef("sim_ann_topk_ivf", annIvf, Some(annIvfCertSql)),
    QueryDef("sim_ann_topk_ivf_pinned", annIvfPinned, Some(annIvfPinnedSql)),
    QueryDef("sim_ann_recall_pinned", annRecallPinned,
      Some(annRecallPinnedSql)),
    QueryDef("sim_ann_topk_ivf_filtered_pinned", annIvfFilteredPinned,
      Some(annIvfFilteredPinnedSql)),
    QueryDef("sim_ann_topk_pq", annPq, Some(annPqCertSql)),
    QueryDef("sim_ann_topk_ivfpq", annIvfPq, Some(annIvfPqCertSql)),
    QueryDef("sim_ann_topk_ivfpq_pinned", annIvfPqPinned,
      Some(annIvfPqPinnedSql)),
    QueryDef("sim_ann_topk_pq_pinned", annPqPinned, Some(annPqPinnedSql)),
    QueryDef("emb_label_centroids", embLabelCentroids,
      Some(embLabelCentroidsSql)),
    QueryDef("emb_int8_quantize", embInt8Quantize, Some(embInt8QuantizeSql)),
    QueryDef("emb_int8_snr", embInt8Snr, Some(embInt8SnrSql)),
    QueryDef("emb_kmeans_update", embKmeansUpdate, Some(embKmeansUpdateSql)),
    QueryDef("emb_kcenter_coreset", embKcenter, Some(embKcenterSql)),
    QueryDef("sim_maxsim_topk", simMaxsim, Some(simMaxsimSql)),
    QueryDef("search_mmr_rerank", searchMmr, Some(searchMmrSql)),
    QueryDef("emb_logreg_epochs", embLogreg, Some(embLogregSql)),
    QueryDef("emb_knn_classifier", embKnnEval, Some(embKnnEvalSql)),
    QueryDef("emb_margin_mine", embMarginMine, Some(embMarginMineSql)),
    QueryDef("emb_hard_negatives", embHardNegatives,
      Some(embHardNegativesSql)),
    QueryDef("emb_matryoshka_recall", embMatryoshka, Some(embMatryoshkaSql)),
    QueryDef("emb_centroid_classifier", embCentroidEval,
      Some(embCentroidEvalSql)),
    QueryDef("emb_pca_top_component", embPcaTop, Some(embPcaTopSql)),
    QueryDef("pipeline_emb_prep", embPrepPipeline, Some(embPrepPipelineSql)),
    QueryDef("text_token_count", tokenCount, Some(tokenCountSql)),
    QueryDef("text_ttr", textTtr, Some(textTtrSql)),
    QueryDef("doc_length_buckets", docLengthBuckets,
      Some(docLengthBucketsSql)),
    QueryDef("text_encoding_audit", textEncodingAudit,
      Some(textEncodingAuditSql)),
    QueryDef("text_gopher_rules", textGopherRules,
      Some(textGopherRulesSql)),
    QueryDef("text_gopher_repetition", textGopherRepetition,
      Some(textGopherRepetitionSql)),
    QueryDef("text_fineweb_rules", textFineWebRules,
      Some(textFineWebRulesSql)),
    QueryDef("text_token_count_bpe", tokenCountBpe, Some(tokenCountBpeSql)),
    QueryDef("text_token_count_bpe_real", tokenCountBpeReal,
      Some(tokenCountBpeRealSql)),
    QueryDef("text_bpe_fertility_by_lang", bpeFertilityByLang,
      Some(bpeFertilityByLangSql)),
    QueryDef("text_token_count_bpe_pinned", tokenCountBpePinned,
      Some(tokenCountBpePinnedSql)),
    QueryDef("text_min_shingle_fp", minShingleFp, Some(minShingleFpSql)),
    QueryDef("text_winnow_fps", winnowFps, Some(winnowFpsSql)),
    QueryDef("text_quality", quality, Some(qualitySql)),
    QueryDef("text_langid", langid, Some(langidSql)),
    QueryDef("text_langid_kappa", langidKappa, Some(langidKappaSql)),
    QueryDef("text_langid_confusion", langidConfusion,
      Some(langidConfusionSql)),
    QueryDef("text_char_entropy", charEntropyQ, Some(charEntropySql)),
    QueryDef("text_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("text_topk_quality_by_lang", topkQualityByLang,
      Some(topkQualityByLangSql)),
    QueryDef("text_pii_redact", piiRedact, Some(piiRedactSql)),
    QueryDef("text_pii_luhn", piiLuhn, Some(piiLuhnSql)),
    QueryDef("text_pii_iban", piiIban, Some(piiIbanSql)),
    QueryDef("text_repetition", repetition, Some(repetitionSql)),
    QueryDef("text_contamination", contaminationQ, Some(contaminationSql)),
    QueryDef("text_tfidf_top_terms", tfidfTopTerms, Some(tfidfTopTermsSql)),
    QueryDef("text_top_ngrams", topNgrams, Some(topNgramsSql)),
    QueryDef("text_c4_line_clean", textC4LineClean, Some(textC4LineCleanSql)),
    QueryDef("text_pmi_collocations", pmiColloc, Some(pmiCollocSql)),
    QueryDef("text_bm25_rank", bm25Rank, Some(bm25RankSql)),
    QueryDef("text_zipf_fit", zipfFit, Some(zipfFitSql)),
    QueryDef("text_vocab_coverage", vocabCoverageQ, Some(vocabCoverageSql)),
    QueryDef("text_fim_split", fimSplitQ, Some(fimSplitSql)),
    QueryDef("doc_quality_sweep", docQualitySweep, Some(docQualitySweepSql)),
    QueryDef("text_hill_tail", hillTail, Some(hillTailSql)),
    QueryDef("corpus_drift_jsd", driftJsd, Some(driftJsdSql)),
    QueryDef("search_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    QueryDef("text_lm_score", lmScoreQ, Some(lmScoreSql)),
    QueryDef("doc_doremi_weights", docDoremiWeights,
      Some(docDoremiWeightsSql)),
    QueryDef("text_ccnet_buckets", textCcnetBuckets,
      Some(textCcnetBucketsSql)),
    QueryDef("text_lm_kneser_ney", textLmKneserNey,
      Some(textLmKneserNeySql)),
    QueryDef("text_ccnet_kn_agreement", textCcnetKnAgreement,
      Some(textCcnetKnAgreementSql)),
    QueryDef("text_chunks", chunks, Some(chunksSql)),
    QueryDef("text_drop_stopwords", dropStopwords, Some(dropStopwordsSql)),
    QueryDef("text_nb_lang_confusion", nbLangConfusionQ,
      Some(nbLangConfusionSql)),
    QueryDef("text_mcnemar_langid_nb", mcnemarLangidNb,
      Some(mcnemarLangidNbSql)),
    QueryDef("text_hapax_gt", hapaxGtQ, Some(hapaxGtSql)),
    QueryDef("text_readability", readabilityQ, Some(readabilitySql)),
    QueryDef("text_heaps_law", heapsLawQ, Some(heapsLawSql)),
    QueryDef("text_chi2_terms", chi2TermsQ, Some(chi2TermsSql)),
    QueryDef("text_ngram_novelty", ngramNoveltyQ, Some(ngramNoveltySql)),
    QueryDef("doc_neyman_sample", neymanSampleQ, Some(neymanSampleSql)),
    QueryDef("text_rake_keyphrases", rakeKeyphrasesQ,
      Some(rakeKeyphrasesSql)),
    QueryDef("doc_pack_assignments", packs, Some(packsSql)),
    QueryDef("doc_pack_efficiency", packEff, Some(packEffSql)),
    QueryDef("pipeline_e2e_prep", e2ePrep, Some(e2ePrepSql)),
    QueryDef("s_jsonl_roundtrip", jsonlRoundtrip, Some(jsonlRoundtripSql)),
    QueryDef("s_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    QueryDef("s_partitioned_pruned_read", partitionedPrunedRead,
      Some(partitionedPrunedReadSql)),
    QueryDef("text_quality_gate", qualityGate, Some(qualityGateSql)),
    QueryDef("ev_stratified_sample", stratifiedSample,
      Some(stratifiedSampleSql)),
    QueryDef("doc_split_assign", docSplitAssign, Some(docSplitAssignSql)),
    QueryDef("split_leakage_check", splitLeakage, Some(splitLeakageSql)),
    QueryDef("doc_kish_ess", docKishEss, Some(docKishEssSql)),
    QueryDef("doc_weighted_sample", docWeightedSample,
      Some(docWeightedSampleSql)),
    QueryDef("doc_dsir_select", docDsirSelect, Some(docDsirSelectSql)),
    QueryDef("mm_decode_features", mmDecode, Some(mmDecodeSql)),
    QueryDef("mm_video_frame_sample", mmVideoFrames,
      Some(mmVideoFramesSql)),
    QueryDef("mm_decode_image_dims", mmImageDims, Some(mmImageDimsSql)),
    QueryDef("mm_decode_audio_frames", mmAudioFrames, Some(mmAudioFramesSql)),
    QueryDef("mm_audio_clipping_audit", mmAudioClipping,
      Some(mmAudioClippingSql)),
    QueryDef("mm_image_dhash", mmImageDhash, Some(mmImageDhashSql)),
    QueryDef("mm_image_neardup_pairs", mmImageNearDupPairs,
      Some(mmImageNearDupPairsSql)),
    QueryDef("mm_image_dup_groups", mmImageDupGroups,
      Some(mmImageDupGroupsSql)),
    QueryDef("mm_feature_ann_pipeline", mmPipeline, Some(mmPipelineSql)),
    QueryDef("mm_datacomp_pair_filter", mmDataCompFilter,
      Some(mmDataCompFilterSql)),
    QueryDef("mm_clap_pair_filter", mmClapFilter, Some(mmClapFilterSql)),
  )
}
