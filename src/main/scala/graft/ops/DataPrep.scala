package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data preparation operators beyond the SURVEY §2.11 core —
  * the screening/planning steps a 100 TB corpus pipeline runs between
  * dedup (L1/L2) and packing (L5i):
  *
  *  - l5j_repetition: Gopher-style within-document repetition signals
  *    (distinct-token ratio, top-token fraction, duplicate-bigram
  *    fraction). Two hash-aggs keyed on doc_id — embarrassingly parallel,
  *    no cross-document state.
  *  - l10_contamination: benchmark-contamination screen — word 5-gram
  *    overlap of every training doc against a held-out eval set. The
  *    eval side is tiny by construction (benchmarks are ~1e3..1e6 docs),
  *    so its distinct-gram set broadcasts and the corpus side streams
  *    one pass; per-doc hash-agg, no corpus self-join.
  *  - l11_split: deterministic content-hash train/val/test split
  *    (md5-prefix bucket), the reproducible-split idiom — a pure per-row
  *    expression, then one small agg; rerunnable on any subset with
  *    identical assignment.
  *  - l12_domain_mix: domain-mixture plan — per-source token shares and
  *    the sampling rate that equalizes the mixture under a uniform
  *    target budget. Two tiny aggs + a broadcast scalar.
  *  - a15_approx_top_k: Spark 4's approx_top_k sketch aggregate in its
  *    exact regime (maxItemsTracked ≥ |domain|) so the DuckDB group-by
  *    oracle hash-matches; the sketch path (partial/merge across
  *    partitions) is still what executes.
  */
object DataPrep {

  /** Codegen tokenizer shared by the doc-level ops: posexplode(split) +
    * relational empty-filter (no interpreted lambda), position kept for
    * window-ordered n-gram building.
    */
  private def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(lower(col("text")), " +")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
      .where(col("tok") =!= "")

  val queries: Map[String, Q] = Map(

    // L5j: repetition signals (the Gopher/C4 quality-filter family).
    // All ratios are integer-count divisions → exact doubles both engines.
    "l5j_repetition" -> ((s, d) => {
      val t = tokens(s, d)
      val tokStats = t.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_toks"), count(lit(1)).as("n_distinct"),
             max(col("c")).as("max_tok"))
      val w = Window.partitionBy("doc_id").orderBy("p")
      val bg = t.select(col("doc_id"),
          concat_ws(" ", col("tok"), lead("tok", 1).over(w)).as("g"),
          lead("tok", 1).over(w).as("t1"))
        .where(col("t1").isNotNull)
      val bgStats = bg.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bg"), count_distinct(col("g")).as("n_bg_d"))
      val dupF = (col("n_bg") - col("n_bg_d")) / col("n_bg")
      tokStats.join(bgStats, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          round(col("n_distinct") / col("n_toks"), 6).as("distinct_ratio"),
          round(col("max_tok") / col("n_toks"), 6).as("top_tok_frac"),
          coalesce(round(dupF, 6), lit(0.0)).as("dup_bigram_frac"),
          (col("max_tok") / col("n_toks") > 0.2 ||
            coalesce(dupF, lit(0.0)) > 0.4).as("repetitive"))
    }),

    // L10: benchmark contamination — docs sharing word 5-grams with the
    // held-out eval set (doc_id % 97 == 0 stands in for the benchmark).
    // distinct per-doc grams → LEFT broadcast-join against the eval gram
    // set → per-doc hit fraction.
    "l10_contamination" -> ((s, d) => {
      val w = Window.partitionBy("doc_id").orderBy("p")
      val g5 = tokens(s, d).select(col("doc_id"),
          concat_ws(" ", col("tok"), lead("tok", 1).over(w),
            lead("tok", 2).over(w), lead("tok", 3).over(w),
            lead("tok", 4).over(w)).as("g"),
          lead("tok", 4).over(w).as("t4"))
        .where(col("t4").isNotNull) // full 5-grams only
        .select(col("doc_id"), col("g")).distinct()
      val bench = g5.filter(col("doc_id") % 97 === 0)
        .select(col("g")).distinct().withColumn("hit", lit(1))
      g5.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
             sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          round(col("n_hit") / col("n_grams"), 6).as("contam_frac"),
          (col("n_hit") / col("n_grams") > 0.5).as("contaminated"))
    }),

    // L5k: PII scrubbing — the redaction pass (emails, North-American
    // phone shapes, IPv4) every public-corpus pipeline runs before
    // training. Pure per-row regexp_replace chain: codegen'd, no
    // shuffle, streams the corpus once at any scale. The corpus text is
    // synthetic and PII-free, so a deterministic contact line is
    // appended to every 7th doc FIRST — the redaction is then observed
    // doing real work (counts pinned per doc, scrubbed text hashed; the
    // regexes are RE2-safe so both engines execute them identically).
    "l5k_pii_scrub" -> ((s, d) => {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val seeded = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com or 555-867-5309")))
        .otherwise(col("text"))
      val scrubbed = regexp_replace(
        regexp_replace(seeded, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(seeded, lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(seeded, lit(phoneRe), lit(0))).as("n_phones"),
        md5(scrubbed).as("scrubbed_md5"))
    }),

    // L13: stratified downsampling — EXECUTES a domain-mixture plan like
    // l12's: per-stratum keep-rates applied with the md5-bucket idiom
    // (deterministic, subset-stable, identical in both engines) instead
    // of sampleBy's seed-dependent Bernoulli draw, which no two engines
    // (or two Spark runs over different partitionings) reproduce. Per-row
    // expression + one small agg: no shuffle beyond the final rollup.
    "l13_stratified_sample" -> ((s, d) => {
      val bucket = conv(substring(md5(col("text")), 1, 4), 16, 10)
        .cast("long") % 1000
      val rate = when(col("lang") === "en", 250)   // downsample the head
        .when(col("lang") === "de", 500)
        .otherwise(1000)                           // keep the tail whole
      val kept = (bucket < rate).cast("int")
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
             sum(kept).cast("long").as("n_kept"),
             min(when(kept === 1, col("doc_id"))).as("min_kept_doc"),
             sum(when(kept === 1, col("n_chars"))).cast("long")
               .as("kept_chars"))
    }),

    // L11: deterministic content-hash split — bucket = first 16 bits of
    // md5(text) mod 100 → 80/10/10. Identical assignment in both engines
    // (and across reruns/subsets — the property that matters in prod).
    "l11_split" -> ((s, d) => {
      val h = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 100
      val sp = when(h < 80, "train").when(h < 90, "val").otherwise("test")
      Tables.documents(s, d)
        .groupBy(col("lang"), sp.as("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
             min(col("doc_id")).as("min_doc_id"))
    }),

    // L12: domain-mixture plan — per-source char share and the sampling
    // rate that moves the mixture to a uniform per-source budget
    // (total/20). The only non-scan work is two 20-row aggs.
    "l12_domain_mix" -> ((s, d) => {
      val per = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      val tot = per.agg(sum(col("n_chars")).as("total_chars"))
      val rate = least(lit(1.0), (col("total_chars") / lit(20.0)) / col("n_chars"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_chars"),
          round(col("n_chars") / col("total_chars"), 6).as("share"),
          round(rate, 6).as("sample_rate"),
          floor(rate * col("n_chars")).cast("long").as("expected_chars"))
    }),

    // L5l: unigram-LM perplexity filter — the CCNet-style quality score:
    // train a unigram model ON the corpus (token freq / total), score
    // each doc by its mean token log-probability and perplexity, flag
    // the tails. Scale shape: the vocab is bounded by a deterministic
    // top-50k selection (TakeOrderedAndProject — freq desc, tok asc; a
    // global row_number window would funnel the vocab through one
    // reducer) and BROADCAST to the scoring join, so the corpus token
    // stream is joined map-side and aggregated per doc with partial
    // aggs: no corpus shuffle beyond the per-doc rollup. Determinism:
    // per-token ln() is rounded to 6dp (collapses libm last-ulp
    // differences between engines, the lloydCodebook convention), then
    // summed exactly as DECIMAL(28,6); OOV tokens get the rounded
    // ln(0.5/total) floor.
    "l5l_unigram_logprob" -> ((s, d) => {
      val t = tokens(s, d).select(col("doc_id"), col("tok"))
      val tot = t.agg(count(lit(1)).as("total"))
      val vocab = t.groupBy("tok").agg(count(lit(1)).as("freq"))
        .crossJoin(broadcast(tot))
        .orderBy(col("freq").desc, col("tok").asc).limit(50000)
        .select(col("tok"),
          round(log(col("freq").cast("double") / col("total")), 6).as("logp"))
      val oov = tot.select(round(log(lit(0.5) / col("total")), 6).as("oov_lp"))
      t.join(broadcast(vocab), Seq("tok"), "left")
        .crossJoin(broadcast(oov))
        .select(col("doc_id"), coalesce(col("logp"), col("oov_lp")).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
             (sum(col("lp").cast("decimal(28,6)")).cast("double") /
               count(lit(1))).as("avg0"))
        .select(col("doc_id"), col("n_toks"),
          round(col("avg0"), 6).as("avg_logp"),
          round(exp(-col("avg0")), 4).as("ppl"))
    }),

    // L14: deterministic training-order shuffle — every epoch's example
    // order must be random-looking yet reproducible byte-for-byte across
    // reruns/engines (resume-from-step, loss-curve comparison). Standard
    // idiom: order by md5(salt || key) — a keyed hash, not rand(), so
    // the permutation is a pure function of (salt, corpus). The head
    // slice is TakeOrderedAndProject (map-side top-k, no global sort —
    // the full-epoch order would be the o1 range-exchange shape); the
    // position column is a window over the already-bounded 100 rows, not
    // the corpus.
    "l14_epoch_shuffle" -> ((s, d) => {
      val h = md5(concat(lit("epoch7|"), col("doc_id").cast("string")))
      val head = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), h.as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id")).limit(100)
      val w = Window.orderBy(col("shuffle_key"), col("doc_id"))
      head.withColumn("shuffle_pos", row_number().over(w))
    }),

    // L19: corpus DRIFT monitor — population-stability-index between two
    // corpus snapshots (standing %3≠0 vs arriving %3=0, the l16/l18
    // split reused as "yesterday vs today") per feature: lang share,
    // source share, and 50-char length bands. PSI = Σ_buckets
    // (pA−pB)·ln(pA/pB) with +1 Laplace smoothing over the UNION bucket
    // set (unsmoothed, a bucket absent on one side divides by zero —
    // and absent-on-one-side buckets are exactly what drift looks
    // like). Float policy (§7.3): shares are fixed integer-division
    // trees; ln() is rounded to 6dp per bucket (the l5l libm
    // convention) and the per-bucket contribution to 9dp, then summed
    // as DECIMAL(28,9) — order-insensitive, bit-identical both engines.
    // Scale: one grouped pass per feature over a side-tagged scan
    // (bucket counts are the shuffle; buckets ≤ domain size), PSI is
    // arithmetic on the ≤|buckets|-row rollup. The 0.2 threshold is the
    // standard industry red line.
    "l19_drift_monitor" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("side", when(col("doc_id") % 3 === 0, "b").otherwise("a"))
      def psi(bucket: org.apache.spark.sql.Column, feature: String) = {
        val counts = docs.groupBy(bucket.as("bucket"))
          .agg(count(when(col("side") === "a", 1)).as("ca"),
            count(when(col("side") === "b", 1)).as("cb"))
        val totals = counts.agg(sum(col("ca")).as("ta"),
          sum(col("cb")).as("tb"), count(lit(1)).as("k"))
        counts.crossJoin(broadcast(totals))
          .select(((col("ca") + 1).cast("double") /
              (col("ta") + col("k")).cast("double")).as("pa"),
            ((col("cb") + 1).cast("double") /
              (col("tb") + col("k")).cast("double")).as("pb"),
            col("k"))
          .select(round((col("pa") - col("pb")) *
              round(log(col("pa") / col("pb")), 6), 9)
            .cast("decimal(28,9)").as("c"), col("k"))
          .agg(max(col("k")).as("n_buckets"),
            sum(col("c")).cast("double").as("psi_raw"))
          .select(lit(feature).as("feature"), col("n_buckets"),
            round(col("psi_raw"), 6).as("psi"),
            (col("psi_raw") > 0.2).as("drifted"))
      }
      psi(col("lang"), "lang")
        .unionByName(psi(col("source"), "source"))
        .unionByName(psi(floor(col("n_chars") / 50).cast("long").cast("string"),
          "len_band"))
    }),

    // A15: approx_top_k (Spark 4 frequent-items sketch). maxItemsTracked
    // (1000) ≥ |o_orderpriority domain| (5) ⇒ counts are exact, so the
    // exact GROUP BY oracle matches while the partial/merge sketch path
    // is what actually executes. Output re-sorted: item order inside the
    // sketch result is not contractual.
    "a15_approx_top_k" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(expr("approx_top_k(o_orderpriority, 5, 1000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("item").asc))
  )

  /** One feature's PSI CTE block for the l19 oracle — generated so the
    * three features cannot drift from each other or from the Spark
    * arithmetic (same smoothing, same rounding ladder). */
  private def psiSqlBlock(bucketExpr: String, tag: String): String =
    s"""f_$tag AS (
       |  SELECT $bucketExpr AS bucket,
       |    COUNT(CASE WHEN side = 'a' THEN 1 END) AS ca,
       |    COUNT(CASE WHEN side = 'b' THEN 1 END) AS cb
       |  FROM docs GROUP BY 1),
       |t_$tag AS (
       |  SELECT SUM(ca) AS ta, SUM(cb) AS tb, COUNT(*) AS k FROM f_$tag),
       |p_$tag AS (
       |  SELECT MAX(k) AS n_buckets,
       |    CAST(SUM(CAST(round(
       |      (CAST(ca + 1 AS DOUBLE) / CAST(ta + k AS DOUBLE)
       |        - CAST(cb + 1 AS DOUBLE) / CAST(tb + k AS DOUBLE))
       |      * round(ln((CAST(ca + 1 AS DOUBLE) / CAST(ta + k AS DOUBLE))
       |          / (CAST(cb + 1 AS DOUBLE) / CAST(tb + k AS DOUBLE))), 6),
       |      9) AS DECIMAL(28,9))) AS DOUBLE) AS psi_raw
       |  FROM f_$tag CROSS JOIN t_$tag)""".stripMargin

  val oracle: Map[String, String] = Map(
    "l19_drift_monitor" ->
      s"""WITH docs AS (
         |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'b' ELSE 'a' END AS side,
         |    lang, source, n_chars
         |  FROM documents),
         |${psiSqlBlock("lang", "lang")},
         |${psiSqlBlock("source", "source")},
         |${psiSqlBlock("CAST(n_chars // 50 AS VARCHAR)", "len")}
         |SELECT 'lang' AS feature, n_buckets, round(psi_raw, 6) AS psi,
         |  psi_raw > 0.2 AS drifted FROM p_lang
         |UNION ALL
         |SELECT 'source', n_buckets, round(psi_raw, 6), psi_raw > 0.2
         |FROM p_source
         |UNION ALL
         |SELECT 'len_band', n_buckets, round(psi_raw, 6), psi_raw > 0.2
         |FROM p_len""".stripMargin,

    "l5j_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), ' +'), x -> x <> '') AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
        |ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
        |       COUNT(*) AS n_distinct, MAX(c) AS max_tok FROM tc GROUP BY doc_id),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks), 1)),
        |       i -> concat_ws(' ', toks[CAST(i AS INTEGER)],
        |                      toks[CAST(i AS INTEGER) + 1]))) AS g
        |       FROM t),
        |bs AS (SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT g) AS n_bg_d
        |       FROM bg GROUP BY doc_id)
        |SELECT ts.doc_id AS doc_id, n_toks,
        |  round(CAST(n_distinct AS DOUBLE) / n_toks, 6) AS distinct_ratio,
        |  round(CAST(max_tok AS DOUBLE) / n_toks, 6) AS top_tok_frac,
        |  COALESCE(round(CAST(n_bg - n_bg_d AS DOUBLE) / n_bg, 6), 0.0)
        |    AS dup_bigram_frac,
        |  (CAST(max_tok AS DOUBLE) / n_toks > 0.2 OR
        |   COALESCE(CAST(n_bg - n_bg_d AS DOUBLE) / n_bg, 0.0) > 0.4) AS repetitive
        |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id""".stripMargin,

    "l10_contamination" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), ' +'), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |        range(1, greatest(len(toks) - 3, 1)),
        |        i -> concat_ws(' ', toks[CAST(i AS INTEGER)],
        |             toks[CAST(i AS INTEGER) + 1], toks[CAST(i AS INTEGER) + 2],
        |             toks[CAST(i AS INTEGER) + 3], toks[CAST(i AS INTEGER) + 4]))))
        |        AS g
        |      FROM t),
        |bench AS (SELECT DISTINCT g AS bg FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN bg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  round(CAST(SUM(CASE WHEN bg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS contam_frac,
        |  (CAST(SUM(CASE WHEN bg IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |   / COUNT(*) > 0.5) AS contaminated
        |FROM g LEFT JOIN bench ON g.g = bench.bg
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id""".stripMargin,

    "l5k_pii_scrub" ->
      """WITH seeded AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |           || '@example.com or 555-867-5309'
        |      ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(t,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
        |  md5(regexp_replace(regexp_replace(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
        |FROM seeded""".stripMargin,

    "l13_stratified_sample" ->
      """WITH t AS (
        |  SELECT lang, n_chars, doc_id,
        |    (CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 1000 <
        |     CASE WHEN lang = 'en' THEN 250
        |          WHEN lang = 'de' THEN 500 ELSE 1000 END) AS keep
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  MIN(CASE WHEN keep THEN doc_id END) AS min_kept_doc,
        |  CAST(SUM(CASE WHEN keep THEN n_chars END) AS BIGINT) AS kept_chars
        |FROM t GROUP BY lang""".stripMargin,

    "l11_split" ->
      """WITH t AS (
        |  SELECT lang, n_chars, doc_id,
        |    CASE WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 < 80
        |           THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 < 90
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT lang, split, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc_id
        |FROM t GROUP BY lang, split""".stripMargin,

    "l12_domain_mix" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM per)
        |SELECT source, n_docs, n_chars,
        |  round(CAST(n_chars AS DOUBLE) / total_chars, 6) AS share,
        |  round(least(1.0, (total_chars / 20.0) / n_chars), 6) AS sample_rate,
        |  CAST(floor(least(1.0, (total_chars / 20.0) / n_chars) * n_chars) AS BIGINT)
        |    AS expected_chars
        |FROM per CROSS JOIN tot""".stripMargin,

    "a15_approx_top_k" ->
      """SELECT o_orderpriority AS item, COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY cnt DESC, item ASC""".stripMargin,

    "l14_epoch_shuffle" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang,
        |    md5('epoch7|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, lang, shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS INTEGER)
        |    AS shuffle_pos
        |FROM keyed
        |QUALIFY shuffle_pos <= 100""".stripMargin,

    "l5l_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), ' +'),
        |           x -> x <> '')) AS tok
        |  FROM documents),
        |n AS (SELECT COUNT(*) AS total FROM tok),
        |vocab AS (
        |  SELECT tok,
        |    round(ln(CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM n)), 6)
        |      AS logp
        |  FROM tok GROUP BY tok
        |  ORDER BY COUNT(*) DESC, tok ASC LIMIT 50000),
        |scored AS (
        |  SELECT doc_id,
        |    COALESCE(logp, (SELECT round(ln(0.5 / total), 6) FROM n)) AS lp
        |  FROM tok LEFT JOIN vocab USING (tok))
        |SELECT doc_id, COUNT(*) AS n_toks,
        |  round(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_logp,
        |  round(exp(-(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))), 4)
        |    AS ppl
        |FROM scored GROUP BY doc_id""".stripMargin
  )
}
