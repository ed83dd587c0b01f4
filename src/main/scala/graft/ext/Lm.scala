package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical language-model operators over `documents`: the n-gram-LM
  * half of a quality-filtering pipeline (the KenLM-perplexity stage of
  * CCNet-style curation, re-expressed with integer fixed-point
  * probabilities) plus association-measure collocation mining (the
  * PMI-style step behind phrase vocabularies and tokenizer merge rules).
  *
  * Same portability contract as [[TextAnalysis]]/[[Curation]]: every
  * score is integer arithmetic (probabilities in ppm, lifts in e6
  * fixed-point), so the DuckDB oracle agrees bit for bit — each
  * per-occurrence term is floored to an integer BEFORE the per-doc sum,
  * making the sum order-free where a float log-prob sum would depend on
  * reduction order.
  *
  * Scale shape: both operators are built from the corpus bigram relation
  * (one generator projection over the token arrays — linear fan-out) and
  * its two marginal aggregates. The model side of every join is an
  * AGGREGATED relation (|vocab| or |vocab|² rows, power-law-small next
  * to the corpus), joined back on the key the aggregate just shuffled
  * on; at 100 TB the bigram-model join is the canonical co-partitioned
  * inverted-index shape (same family as q16/q61), and a trimmed model
  * (count floor) becomes broadcastable.
  */
object Lm {

  /** Additive-smoothing numerator offset (add-1 / Laplace). */
  val SmoothAdd = 1L

  /** (doc_id, w1, gram) — one row per adjacent-bigram OCCURRENCE.
    * `gram` keeps the two tokens joined so the model join has one key;
    * `w1` carries the left-context key for the unigram-marginal join. */
  private def bigramStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, concat_ws(' ', toks[i], toks[i + 1]) AS gram))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.gram").as("gram"))

  private val duckBigrams =
    """SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
      |               unnest(generate_series(1, len(string_split(text, ' ')) - 1)) AS i
      |        FROM documents
      |        WHERE len(string_split(text, ' ')) >= 2)""".stripMargin

  // --------------------------------------------------------- bigram LM
  /** Per-document add-1-smoothed bigram-LM likelihood score — the
    * quality-filter signal ("how much does this doc look like the
    * corpus?") that a KenLM perplexity bucket provides in production
    * pipelines, in integer form:
    *
    *   p_ppm(w1 w2)  = (1e6 * (c(w1 w2) + 1)) div (c(w1) + V)
    *   lm_ppm(doc)   = sum over the doc's bigram occurrences of p_ppm,
    *                   div n_bigrams
    *
    * where c(w1 w2)/c(w1) are corpus occurrence counts, V = |vocab|
    * (distinct tokens). Flooring each occurrence's probability to ppm
    * BEFORE summing keeps the whole computation in BIGINT — no float
    * ever reaches the compare, and the per-doc sum is order-independent
    * (a log-prob double sum would not be).
    *
    * Plan: the bigram stream joins the bigram-count aggregate on `gram`
    * (the key it was just shuffled on — co-partitioned, no extra
    * exchange) and the unigram-count aggregate on `w1`; V rides in as a
    * broadcast 1-row cross join. The model relations are |vocab|-sized;
    * at production scale the trimmed model broadcasts and the whole
    * score is a map-side projection over the corpus. */
  def bigramLmScores(docs: DataFrame): DataFrame = {
    val grams = bigramStream(docs)
    val bigramCounts = grams.groupBy("gram").agg(count(lit(1)).as("c12"))
    val unigramCounts = docs
      .select(explode(split(col("text"), " ")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocabSize = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    grams
      .join(bigramCounts, "gram")
      .join(unigramCounts, "w1")
      .crossJoin(broadcast(vocabSize))
      .select(col("doc_id"),
        expr(s"(1000000 * (c12 + $SmoothAdd)) div (c1 + v)").as("p_ppm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           expr("sum(p_ppm) div count(1)").as("lm_ppm"))
      .orderBy("doc_id")
  }

  val bigramLmScoresSql: String =
    s"""WITH g AS ($duckBigrams),
       |bc AS (SELECT gram, COUNT(*) AS c12 FROM g GROUP BY gram),
       |uc AS (SELECT w1, COUNT(*) AS c1 FROM
       |         (SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
       |       GROUP BY w1),
       |v AS (SELECT COUNT(DISTINCT t) AS v FROM
       |        (SELECT unnest(string_split(text, ' ')) AS t FROM documents))
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM((1000000 * (c12 + $SmoothAdd)) // (c1 + v)) // COUNT(*) AS BIGINT) AS lm_ppm
       |FROM g JOIN bc USING (gram) JOIN uc USING (w1) CROSS JOIN v
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ collocations
  val CollocMinCount = 10 // bigram occurrence floor (rare pairs are noise)
  val CollocTopK = 50
  /** Largest bigram-occurrence total whose worst-case lift numerator
    * (1e6·N·c12, c12 ≤ N) still fits a BIGINT. */
  val CollocMaxN = 3000000L

  /** Collocation mining: the corpus's top bigrams by LIFT — the
    * integer-exact stand-in for PMI (PMI = log2(lift), monotone, so the
    * ranking is identical and the log adds nothing but float risk):
    *
    *   lift_e6(w1 w2) = (1e6 * N * c(w1 w2)) div (cL(w1) * cR(w2))
    *
    * with N = total bigram occurrences and cL/cR the left/right
    * marginals OF THE BIGRAM RELATION (so the unigram masses sum to N
    * exactly and the independence baseline is well-formed). A count
    * floor keeps one-off pairs (lift explodes as counts shrink) out of
    * the report — the standard PMI min-count guard.
    *
    * Plan: bigram aggregate + two marginal aggregates of it (tiny —
    * |vocab| rows), joined back model-side only; the corpus is scanned
    * once. Top-K plans as TakeOrderedAndProject under the count floor.
    * Overflow headroom: the e6 numerator is 1e6·N·c12 ≤ 1e6·N², so
    * BIGINT holds to N ≈ 3e6 bigrams per exact run; past that the floor
    * and the e6 scale shift to sampled counts (the CMS q57 path). The
    * bound is ENFORCED (raise_error past [[CollocMaxN]]), never silently
    * wrapped — the q16/q32 packGuard discipline. */
  def collocations(docs: DataFrame, maxN: Long = CollocMaxN): DataFrame = {
    val grams = bigramStream(docs)
      .select(col("w1"), col("gram"),
        expr("substring(gram, length(w1) + 2)").as("w2"))
    val bc = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val left = bc.groupBy("w1").agg(sum(col("c12")).as("cl"))
    val right = bc.groupBy("w2").agg(sum(col("c12")).as("cr"))
    val total = bc.agg(
      when(sum(col("c12")) > maxN,
        raise_error(concat(
          lit(s"collocations: corpus bigram total exceeds the exact-lift BIGINT bound $maxN "),
          lit("(switch to sampled counts, the q57 CMS path): "),
          sum(col("c12")).cast("string"))))
        .otherwise(sum(col("c12"))).as("n"))
    bc.filter(col("c12") >= CollocMinCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"),
        expr("(1000000 * n * c12) div (cl * cr)").as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("w1"), col("w2"))
      .limit(CollocTopK)
  }

  val collocationsSql: String =
    s"""WITH g AS ($duckBigrams),
       |bc AS (SELECT w1, gram[len(w1) + 2:] AS w2, COUNT(*) AS c12
       |       FROM g GROUP BY 1, 2),
       |l AS (SELECT w1, SUM(c12) AS cl FROM bc GROUP BY w1),
       |r AS (SELECT w2, SUM(c12) AS cr FROM bc GROUP BY w2),
       |t AS (SELECT SUM(c12) AS n FROM bc)
       |SELECT w1, w2, c12, CAST((1000000 * n * c12) // (cl * cr) AS BIGINT) AS lift_e6
       |FROM bc JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t
       |WHERE c12 >= $CollocMinCount
       |ORDER BY lift_e6 DESC, w1, w2
       |LIMIT $CollocTopK""".stripMargin

  // ---------------------------------------------------- source drift
  /** Per-source unigram-distribution drift vs the whole corpus — the
    * mixture-monitoring op that tells a 100 TB pipeline "source X
    * changed under you" (crawl snapshot shifted, a scraper broke, a
    * new template flooded in):
    *
    *   diff_bp(s, t)  = (1e4 * o(s,t)) div S(s)  -  (1e4 * c(t)) div T
    *   drift_l2e8(s)  = sum over the CORPUS vocabulary of diff_bp²
    *
    * (o = token count within the source, S = source token mass, c/T =
    * corpus-wide.) The frequency ratios are floored to basis points
    * BEFORE squaring, so everything stays BIGINT and both engines agree
    * exactly; tokens a source never emits still contribute their
    * corpus-frequency term (the vocab × sources grid is built
    * explicitly — an inner join on observed pairs would silently drop
    * exactly the drift signal, the absent tokens).
    *
    * Shape: two token aggregates (per-source and corpus-wide), a
    * broadcast of the AGGREGATED vocabulary onto the |sources| spine,
    * and one left join of observed (source, token) counts — every
    * relation past the first aggregate is vocabulary-sized, never
    * corpus-sized. At 100 TB the vocab broadcast becomes the trimmed
    * top-K vocabulary (the tail's diff_bp floors to zero anyway at
    * e4 resolution). */
  def sourceDrift(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val bySrc = toks.groupBy("source", "token").agg(count(lit(1)).as("o"))
    val srcMass = bySrc.groupBy("source").agg(sum(col("o")).as("s_mass"))
    val corpus = bySrc.groupBy("token").agg(sum(col("o")).as("c"))
    val tMass = corpus.agg(sum(col("c")).as("t_mass"))
    srcMass.crossJoin(broadcast(corpus.crossJoin(tMass)))
      .join(bySrc, Seq("source", "token"), "left")
      .select(col("source"), col("s_mass"),
        (expr("(10000 * coalesce(o, 0)) div s_mass") -
          expr("(10000 * c) div t_mass")).as("d"))
      .groupBy("source")
      .agg(min(col("s_mass")).as("n_tokens"),
           sum(col("d") * col("d")).as("drift_l2e8"))
      .orderBy("source")
  }

  val sourceDriftSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |o AS (SELECT source, token, COUNT(*) AS o FROM toks
      |      WHERE length(token) > 0 GROUP BY source, token),
      |sm AS (SELECT source, SUM(o) AS s_mass FROM o GROUP BY source),
      |c AS (SELECT token, SUM(o) AS c FROM o GROUP BY token),
      |t AS (SELECT SUM(c) AS t_mass FROM c),
      |grid AS (SELECT sm.source, sm.s_mass, c.token, c.c, t.t_mass
      |         FROM sm CROSS JOIN c CROSS JOIN t),
      |d AS (SELECT grid.source, grid.s_mass,
      |        (10000 * COALESCE(o.o, 0)) // grid.s_mass
      |          - (10000 * grid.c) // grid.t_mass AS d
      |      FROM grid LEFT JOIN o
      |        ON grid.source = o.source AND grid.token = o.token)
      |SELECT source, CAST(MIN(s_mass) AS BIGINT) AS n_tokens,
      |  CAST(SUM(d * d) AS BIGINT) AS drift_l2e8
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_bigram_lm" -> ((s, d) => bigramLmScores(Tables.documents(s, d))),
    "q67_collocations" -> ((s, d) => collocations(Tables.documents(s, d))),
    "q71_source_drift" -> ((s, d) => sourceDrift(Tables.documents(s, d))))

  val oracles: Map[String, String] = Map(
    "q66_bigram_lm" -> bigramLmScoresSql,
    "q67_collocations" -> collocationsSql,
    "q71_source_drift" -> sourceDriftSql)
}
