package graft.ops

import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.8): string, date/time, math,
  * array (incl. higher-order), map, JSON, hash/binary, null-handling.
  * One query per family, each exercising several functions — all built-in
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd; no UDFs in hot
  * paths, SURVEY §2.12 X1 rule).
  *
  * Dialect pairs used in the oracle SQL (SURVEY §7.3 dialect map):
  * split↔string_split, size↔len, transform↔list_transform,
  * aggregate↔list_sum∘list_transform∘list_zip, get_json_object↔json_extract_string,
  * sha2(·,256)↔sha256, dayofweek↔dayofweek+1, date_trunc returns DATE in
  * DuckDB (cast back), ceil/floor return DOUBLE in DuckDB (cast to BIGINT).
  */
object Functions {

  val queries: Map[String, Q] = Map(

    // F1: string family over documents.text (ASCII, space-separated words).
    "f1_string" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).as("n_len"),
        upper(substring(col("text"), 1, 10)).as("head_up"),
        concat_ws("::", col("lang"), col("source")).as("tag"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        regexp_replace(substring(col("text"), 1, 50), "[aeiou]", "").as("devowel"),
        instr(col("text"), "join").as("join_pos"),
        col("text").like("%merge%").as("has_merge"),
        regexp_extract(col("text"), "(join|merge|scan)", 1).as("first_op"),
        levenshtein(col("lang"), lit("en")).as("lang_dist"),
        reverse(col("lang")).as("gnal"),
        repeat(col("lang"), 3).as("lang3"),
        translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
        size(split(col("text"), " ")).as("n_tokens"))),

    // F1b: regex family — extract_all, count-via-len, split_part, rlike.
    // The extracted-match array is CSV-serialized at the output boundary.
    "f1b_regex" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        array_join(regexp_extract_all(col("text"), lit("(join|scan|merge)"), lit(1)), ",")
          .as("ops_found"),
        size(regexp_extract_all(col("text"), lit("(join|scan|merge)"), lit(1))).as("n_ops"),
        split_part(col("text"), lit(" "), lit(1)).as("first_word"),
        split_part(col("text"), lit(" "), lit(3)).as("third_word"),
        col("text").rlike("(fast|slow) (key|row)").as("has_pattern"))),

    // F1c: more string family — ascii/char, printf-style formatting,
    // left/right, contains/startsWith/endsWith predicates.
    "f1c_string_extra" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        ascii(col("lang")).as("lang_ascii"),
        expr("char(ascii(lang) + 1)").as("next_char"),
        format_string("%s:%05d", col("lang"), col("doc_id")).as("tag_fmt"),
        expr("left(text, 8)").as("head8"),
        expr("right(text, 6)").as("tail6"),
        col("text").contains("data").as("has_data"),
        col("text").startsWith("the").as("starts_the"),
        col("text").endsWith("s").as("ends_s"))),

    // F2: date/time family over orders dates + events timestamps.
    "f2_datetime" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        // DATE-typed results are cast to string/timestamp at the boundary —
        // DATE cells round-trip differently through pandas (SURVEY §7.3).
        last_day(col("o_orderdate")).cast("string").as("month_end"),
        add_months(col("o_orderdate"), 3).cast("string").as("plus3mo"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"),
        col("o_orderdate").cast("timestamp").cast("long").as("epoch_sec"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .cast("string").as("mstart_date"))),

    // F2b: sub-day datetime family over event timestamps (µs precision).
    "f2b_time_of_day" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        hour(col("ts")).as("hh"),
        minute(col("ts")).as("mi"),
        second(col("ts")).as("ss"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm").as("minute_str"),
        timestamp_seconds(col("ts").cast("long")).as("ts_floor_sec"),
        (col("ts").cast("long") % 86400).as("sec_of_day"))),

    // F3: math family. sqrt is IEEE-exact; exp/ln/log10/pow rounded (libm
    // vs StrictMath can differ in the last ulp).
    "f3_math" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        ceil(col("l_quantity") / 10).as("qty_ceil"),
        floor(col("l_quantity") / 10).as("qty_floor"),
        round(sqrt(col("l_extendedprice")), 8).as("price_sqrt"),
        round(exp(col("l_discount")), 8).as("disc_exp"),
        round(log(col("l_extendedprice")), 8).as("price_ln"),
        round(log10(col("l_extendedprice")), 8).as("price_log10"),
        round(pow(col("l_tax"), 2), 10).as("tax_sq"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        signum(col("l_extendedprice") - lit(30000)).as("price_sign"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_quantity"), col("l_discount") * 100).as("l"))),

    // F4: array + higher-order family over embeddings (the LLM-pipeline
    // vector type). Fold order in `aggregate` is array order — same
    // sequential order as DuckDB's list_sum, and cast to double first.
    // Float arrays are serialized via floor(v·2^30) int64 fixed-point (an
    // exact mapping for float32 — 24-bit mantissa · 2^30 < 2^53), then CSV:
    // decimal-cast of raw floats tie-breaks differently across engines.
    "f4_array_higher_order" -> ((s, d) => {
      val emb = col("embedding")
      val dbl = transform(emb, x => x.cast("double"))
      val fp = (c: org.apache.spark.sql.Column) =>
        floor(c.cast("double") * lit(1073741824d)).cast("long").cast("string")
      Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        size(emb).as("dim"),
        element_at(emb, 1).as("e1"),
        array_join(transform(slice(emb, 1, 4), fp), ",").as("head4"),
        round(aggregate(dbl, lit(0d), (acc, x) => acc + x * x), 6).as("norm_sq"),
        round(aggregate(dbl, lit(0d), (acc, x) => acc + x), 6).as("vec_sum"),
        exists(dbl, _ > 0.9).as("has_big"),
        forall(dbl, _ > -1d).as("all_gt_neg1"),
        size(filter(dbl, _ > 0d)).as("n_pos"),
        array_join(transform(sort_array(slice(emb, 1, 4), asc = false), fp), ",")
          .as("head4_desc"),
        array_join(transform(sequence(lit(1), col("label") + 1), _.cast("string")), ",")
          .as("label_seq"))
    }),

    // F5: map family — built via map_from_arrays, keys/values emitted as
    // CSV strings at the boundary (map/array cells compare awkwardly;
    // SURVEY §7.3). Values go through decimal(18,6) — the double→decimal
    // cast is engine-consistent (proven by p6_cast), unlike float→decimal.
    "f5_map" -> ((s, d) => {
      val m = map_from_arrays(
        array(lit("qty"), lit("price")),
        array(col("l_quantity"), col("l_extendedprice")))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          array_join(map_keys(m), ",").as("ks"),
          array_join(transform(map_values(m),
            _.cast("decimal(18,6)").cast("string")), ",").as("vs"),
          element_at(m, "qty").as("qty_back"),
          size(map_concat(m, map(lit("tax"), col("l_tax")))).as("n_entries"))
    }),

    // F6: JSON family over events.props (shape {"k": <int>}).
    "f6_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_int"),
        (from_json(col("props"), lit("k INT")).getField("k") * 2).as("k_doubled"),
        to_json(struct(col("user_id").as("u"), col("event_type").as("t"))).as("packed"))),

    // F9: VARIANT semi-structured path (Spark 4) — parse once into the
    // binary variant encoding, then typed variant_get extraction. Same
    // oracle semantics as the string-JSON route in F6, but the scan-side
    // representation is the shredded binary form a 100 TB semi-structured
    // column should use (parse once, extract many, no per-access reparse).
    "f9_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), expr("parse_json(props)").as("v"))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          (expr("variant_get(v, '$.k', 'int')") * 2).as("k_doubled"))),

    // F11: ANSI-safe try_* arithmetic — this engine runs ANSI mode ON
    // (1/0, OOB element_at, and bad casts all THROW), so try_divide/
    // try_mod/try_element_at/try_cast are the user-facing way to get
    // NULL-on-error. DuckDB's plain operators already return NULL for
    // /0, %0, OOB list index, and try_cast — exact twins.
    // F12: URL functions — the web-corpus prep family (host routing,
    // domain-level dedup/quality rollups, tracking-param stripping all
    // key off these). Spark side is the NATIVE parse_url (PROTOCOL /
    // HOST / PATH / QUERY-with-key / REF); the oracle re-derives each
    // part with anchored regexes from the portable subset (l5m rule:
    // identical semantics under Java regex and RE2), and NULLIF('')
    // aligns RE2's empty-string no-match with parse_url's NULL. The
    // URLs are constructed deterministically from corpus columns
    // (source/lang/doc_id) with query/fragment presence varied by
    // doc_id residues so every branch (param present/absent, fragment
    // present/absent, multi-param) is exercised on real rows.
    "f12_url" -> ((s, d) => {
      val url = concat(
        lit("https://"), col("source"), lit(".example.com/"), col("lang"),
        lit("/doc-"), col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0,
          concat(lit("?ref=feed&page="), (col("doc_id") % 7).cast("string")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("?page="), (col("doc_id") % 7).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit("#sec-"), (col("doc_id") % 4).cast("string")))
          .otherwise(lit("")))
      Tables.documents(s, d).select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'PROTOCOL')").as("scheme"),
          expr("parse_url(url, 'HOST')").as("host"),
          regexp_extract(expr("parse_url(url, 'HOST')"),
            "([a-z0-9-]+\\.[a-z]+)$", 1).as("reg_domain"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'page')").as("page"),
          expr("parse_url(url, 'REF')").as("fragment"))
    }),

    "f11_try_arith" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(CAST(l_quantity AS BIGINT), CAST(l_linenumber - 1 AS BIGINT))")
          .as("qty_per_prev"),
        expr("try_mod(CAST(l_quantity AS BIGINT), CAST(l_linenumber - 1 AS BIGINT))")
          .as("qty_mod_prev"),
        expr("try_element_at(array(l_returnflag, l_linestatus), l_linenumber)")
          .as("flag_at"),
        expr("try_cast(l_returnflag AS INT)").as("rf_int"))),

    // F10: ordered string aggregation — Spark 4 listagg WITHIN GROUP;
    // DuckDB's string_agg(... ORDER BY) is the exact twin. Names are
    // unique within a segment, so the explicit ordering pins the output
    // byte-for-byte in both engines.
    "f10_listagg" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .groupBy("c_mktsegment")
        .agg(expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)")
               .as("names"),
             count(lit(1)).as("n"))),

    // F7: hash/binary family — md5/sha256/base64 agree across engines;
    // input capped at 40 chars so no MIME line-wrap ambiguity for base64.
    "f7_hash" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        md5(col("text")).as("text_md5"),
        sha2(col("text"), 256).as("text_sha256"),
        base64(substring(col("text"), 1, 40).cast("binary")).as("head_b64"),
        length(col("text").cast("binary")).as("n_bytes"))),

    // F7b: Spark-native hashes (xxhash64, murmur3, crc32) — raw values
    // have no DuckDB twin (seeds/algorithms differ), so the SCORED output
    // is engine-portable *properties* of the hashes: injectivity over the
    // corpus (distinct-count of each hash = distinct-count of text;
    // verified collision-free at sf0.001/0.01/0.1 — deterministic data,
    // so no flake) plus known-answer constants for a fixed input, which
    // the oracle pins as literals. The hash functions themselves execute
    // inside the distinct aggregates; raw per-row values are pinned in
    // ScalaTest (OperatorSuite).
    // NOTE on the injectivity columns: the oracle pins n_<hash> ==
    // n_texts, which for the 32-bit hashes (murmur3, crc32) is a
    // birthday-bounded claim, not a law — collision odds are ~n²/2³³
    // (≈3e-5 at the sf0.01 gate's 500 distinct texts, ≈3e-3 at sf0.1,
    // both verified green; ~50% by n≈77k). The scored corpus scales are
    // fixed by the driver; a future corpus beyond ~10⁴ distinct texts
    // should drop the 32-bit columns rather than weaken the equality.
    "f7b_native_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .agg(countDistinct(col("text")).as("n_texts"),
             countDistinct(xxhash64(col("text"))).as("n_xx64"),
             countDistinct(hash(col("text"))).as("n_murmur3"),
             countDistinct(crc32(col("text").cast("binary"))).as("n_crc32"))
        .select(col("n_texts"), col("n_xx64"), col("n_murmur3"), col("n_crc32"),
          xxhash64(lit("graft")).as("kat_xx64"),
          hash(lit("graft")).as("kat_murmur3"),
          crc32(lit("graft").cast("binary")).as("kat_crc32"))),

    // F8: null handling — nulls manufactured via nullif, then repaired.
    "f8_null" -> ((s, d) => {
      val v = nullif(col("value"), lit(0d))
      Tables.events(s, d).select(
        col("event_id"),
        coalesce(v, lit(-1d)).as("v_or_neg1"),
        isnull(nullif(col("event_type"), lit("error"))).as("is_error"),
        nvl(nullif(col("event_type"), lit("view")), lit("nonview")).as("type_nvl"),
        when(col("value") > 100, col("value")).otherwise(lit(null)).cast("double").as("big_or_null"))
    })
  )

  val oracle: Map[String, String] = Map(
    "f12_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/' || lang || '/doc-' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0
        |           THEN '?ref=feed&page=' || CAST(doc_id % 7 AS VARCHAR)
        |         WHEN doc_id % 3 = 1
        |           THEN '?page=' || CAST(doc_id % 7 AS VARCHAR)
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |           THEN '#sec-' || CAST(doc_id % 4 AS VARCHAR)
        |         ELSE '' END AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
        |    '([a-z0-9-]+\.[a-z]+)$', 1) AS reg_domain,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  NULLIF(regexp_extract(url, '[?&]page=([0-9]+)', 1), '') AS page,
        |  NULLIF(regexp_extract(url, '#(.*)$', 1), '') AS fragment
        |FROM u""".stripMargin,

    "f1_string" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_len,
        |  upper(substr(text, 1, 10)) AS head_up,
        |  concat_ws('::', lang, source) AS tag,
        |  lpad(lang, 5, '_') AS lang_pad,
        |  regexp_replace(substr(text, 1, 50), '[aeiou]', '', 'g') AS devowel,
        |  CAST(instr(text, 'join') AS INTEGER) AS join_pos,
        |  text LIKE '%merge%' AS has_merge,
        |  COALESCE(regexp_extract(text, '(join|merge|scan)', 1), '') AS first_op,
        |  CAST(levenshtein(lang, 'en') AS INTEGER) AS lang_dist,
        |  reverse(lang) AS gnal,
        |  repeat(lang, 3) AS lang3,
        |  translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        |FROM documents""".stripMargin,

    "f1c_string_extra" ->
      """SELECT doc_id,
        |  CAST(ascii(lang) AS INTEGER) AS lang_ascii,
        |  chr(ascii(lang) + 1) AS next_char,
        |  printf('%s:%05d', lang, doc_id) AS tag_fmt,
        |  left(text, 8) AS head8,
        |  right(text, 6) AS tail6,
        |  contains(text, 'data') AS has_data,
        |  starts_with(text, 'the') AS starts_the,
        |  text LIKE '%s' AS ends_s
        |FROM documents""".stripMargin,

    "f2_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3mo,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec,
        |  CAST(make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS VARCHAR) AS mstart_date
        |FROM orders""".stripMargin,

    "f1b_regex" ->
      """SELECT doc_id,
        |  COALESCE(array_to_string(regexp_extract_all(text, '(join|scan|merge)', 1), ','), '') AS ops_found,
        |  CAST(len(regexp_extract_all(text, '(join|scan|merge)', 1)) AS INTEGER) AS n_ops,
        |  split_part(text, ' ', 1) AS first_word,
        |  split_part(text, ' ', 3) AS third_word,
        |  regexp_matches(text, '(fast|slow) (key|row)') AS has_pattern
        |FROM documents""".stripMargin,

    "f2b_time_of_day" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_id,
        |  CAST(hour(ts) AS INTEGER) AS hh,
        |  CAST(minute(ts) AS INTEGER) AS mi,
        |  CAST(second(ts) AS INTEGER) AS ss,
        |  strftime(ts, '%Y-%m-%d %H:%M') AS minute_str,
        |  CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS ts_floor_sec,
        |  CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS sec_of_day
        |FROM ev""".stripMargin,

    "f3_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 1) AS price_r1,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_quantity / 10) AS BIGINT) AS qty_floor,
        |  round(sqrt(l_extendedprice), 8) AS price_sqrt,
        |  round(exp(l_discount), 8) AS disc_exp,
        |  round(ln(l_extendedprice), 8) AS price_ln,
        |  round(log10(l_extendedprice), 8) AS price_log10,
        |  round(pow(l_tax, 2), 10) AS tax_sq,
        |  ((l_orderkey % 7) + 7) % 7 AS key_mod7,
        |  CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS price_sign,
        |  greatest(l_quantity, l_discount * 100) AS g,
        |  least(l_quantity, l_discount * 100) AS l
        |FROM lineitem""".stripMargin,

    "f4_array_higher_order" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS e1,
        |  array_to_string(list_transform(embedding[1:4],
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1073741824) AS BIGINT)), ',') AS head4,
        |  round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6) AS norm_sq,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS vec_sum,
        |  len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.9)) > 0 AS has_big,
        |  len(list_filter(CAST(embedding AS DOUBLE[]), x -> NOT (x > -1.0))) = 0 AS all_gt_neg1,
        |  CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.0)) AS INTEGER) AS n_pos,
        |  array_to_string(list_transform(list_sort(embedding[1:4], 'DESC'),
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1073741824) AS BIGINT)), ',') AS head4_desc,
        |  array_to_string(range(1, label + 2), ',') AS label_seq
        |FROM embeddings""".stripMargin,

    "f5_map" ->
      """SELECT l_orderkey, l_linenumber,
        |  'qty,price' AS ks,
        |  CAST(CAST(l_quantity AS DECIMAL(18,6)) AS VARCHAR) || ',' ||
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS VARCHAR) AS vs,
        |  l_quantity AS qty_back,
        |  3 AS n_entries
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

    "f6_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
        |  to_json({'u': user_id, 't': event_type})::VARCHAR AS packed
        |FROM events""".stripMargin,

    "f9_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled
        |FROM events""".stripMargin,

    "f11_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS BIGINT) / (l_linenumber - 1) AS qty_per_prev,
        |  CAST(l_quantity AS BIGINT) % (l_linenumber - 1) AS qty_mod_prev,
        |  list_extract([l_returnflag, l_linestatus], l_linenumber) AS flag_at,
        |  try_cast(l_returnflag AS INTEGER) AS rf_int
        |FROM lineitem""".stripMargin,

    "f10_listagg" ->
      """SELECT c_mktsegment,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  COUNT(*) AS n
        |FROM customer WHERE c_acctbal > 9000
        |GROUP BY c_mktsegment""".stripMargin,

    // Injectivity counts: every native-hash distinct-count equals the
    // distinct text count (collision-free on this corpus — verified at
    // sf0.001/0.01/0.1; data is deterministic so this cannot flake).
    // KAT literals = Spark's xxhash64(seed 42)/murmur3(seed 42)/crc32 of
    // the fixed string "graft", computed once and pinned.
    "f7b_native_hash" ->
      """SELECT count(DISTINCT text) AS n_texts,
        |  count(DISTINCT text) AS n_xx64,
        |  count(DISTINCT text) AS n_murmur3,
        |  count(DISTINCT text) AS n_crc32,
        |  CAST(-4815631219266125053 AS BIGINT) AS kat_xx64,
        |  CAST(-1930494102 AS INTEGER) AS kat_murmur3,
        |  CAST(31255620 AS BIGINT) AS kat_crc32
        |FROM documents""".stripMargin,

    "f7_hash" ->
      """SELECT doc_id,
        |  md5(text) AS text_md5,
        |  sha256(text) AS text_sha256,
        |  base64(CAST(substr(text, 1, 40) AS BLOB)) AS head_b64,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes
        |FROM documents""".stripMargin,

    "f8_null" ->
      """SELECT event_id,
        |  COALESCE(NULLIF(value, 0.0), -1.0) AS v_or_neg1,
        |  NULLIF(event_type, 'error') IS NULL AS is_error,
        |  COALESCE(NULLIF(event_type, 'view'), 'nonview') AS type_nvl,
        |  CASE WHEN value > 100 THEN value END AS big_or_null
        |FROM events""".stripMargin
  )
}
