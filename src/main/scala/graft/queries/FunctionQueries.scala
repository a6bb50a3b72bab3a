package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's scalar function library exercised per family — math,
  * trig, bit/transform, string, regex, datetime, hashing, JSON, array,
  * object, encode, misc, multi-row (unnest). Reference:
  * /root/reference/internal/binder/function/funcs_{math,str,datetime,
  * misc,obj,array,trans,srf}.go and docs/en_US/sqls/functions/.
  *
  * All functions run inside whole-stage codegen (org.apache.spark.sql.
  * functions only — no UDFs). Computed integer outputs are cast to long
  * on both engines so result schemas match exactly; transcendental
  * outputs are rounded to 6 dp (libm ulp differences).
  */
object FunctionQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)
  private def r6(c: Column) = round(c, 6)

  val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_math" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        abs(-col("p_size")).as("abs_v"),
        ceil(col("p_retailprice")).as("ceil_v"),
        floor(col("p_retailprice")).as("floor_v"),
        r6(sqrt(col("p_retailprice"))).as("sqrt_v"),
        r6(exp(col("p_size") / 100.0)).as("exp_v"),
        r6(log(col("p_retailprice"))).as("ln_v"),
        r6(log10(col("p_retailprice"))).as("log10_v"),
        pow(col("p_size"), 2).cast("long").as("pow_v"),
        (col("p_size") % 7).as("mod_v"),
        signum(col("p_retailprice") - 1000).cast("int").as("sign_v"),
        conv(col("p_size").cast("string"), 10, 2).as("conv_v"))),

    "q_fn_trig" -> ((s, d) => {
      val x = col("p_size") / 100.0
      t(s, d, "part").select(
        col("p_partkey"),
        r6(sin(x)).as("sin_v"), r6(cos(x)).as("cos_v"), r6(tan(x)).as("tan_v"),
        r6(asin(x)).as("asin_v"), r6(acos(x)).as("acos_v"), r6(atan(x)).as("atan_v"),
        r6(atan2(col("p_size").cast("double"), lit(7.0))).as("atan2_v"),
        r6(sinh(x)).as("sinh_v"), r6(cosh(x)).as("cosh_v"), r6(tanh(x)).as("tanh_v"),
        r6(lit(1.0) / tan(x)).as("cot_v"),
        r6(radians(col("p_size"))).as("rad_v"),
        r6(degrees(x)).as("deg_v"),
        r6(lit(math.Pi)).as("pi_v"),
        r6(lit(math.E)).as("e_v"))
    }),

    "q_fn_bits" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_size").bitwiseAND(lit(12)).as("band_v"),
        col("p_size").bitwiseOR(lit(3)).as("bor_v"),
        col("p_size").bitwiseXOR(lit(21)).as("bxor_v"),
        bitwise_not(col("p_size")).as("bnot_v"),
        hex(col("p_size").cast("long")).as("dec2hex_v"),
        // hex2dec validated as a round-trip over varied values
        conv(hex(col("p_size").cast("long")), 16, 10).cast("long").as("hex2dec_v"),
        chr(lit(65) + col("p_size") % 26).as("chr_v"),
        (floor(col("p_retailprice") * 1.337 * 100) / 100).as("trunc_v"))),

    "q_fn_string" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("concat_v"),
        length(col("c_name")).cast("long").as("len_v"),
        lower(col("c_name")).as("lower_v"),
        upper(col("c_mktsegment")).as("upper_v"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trim_v"),
        ltrim(concat(lit("  "), col("c_mktsegment"))).as("ltrim_v"),
        rtrim(concat(col("c_mktsegment"), lit("  "))).as("rtrim_v"),
        lpad(col("c_mktsegment"), 12, "*").as("lpad_v"),
        rpad(col("c_mktsegment"), 12, "#").as("rpad_v"),
        reverse(col("c_mktsegment")).as("rev_v"))),

    "q_fn_string2" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        substring(col("p_name"), 3, 5).as("sub_v"),
        instr(col("p_name"), "a").cast("long").as("idx_v"),
        col("p_name").startsWith("red").as("sw_v"),
        col("p_name").endsWith("t").as("ew_v"),
        octet_length(col("p_name")).cast("long").as("nb_v"),
        // coalesce to '' aligns with split_part's out-of-range behavior
        coalesce(element_at(split(col("p_name"), " "), 2), lit("")).as("split_v"))),

    "q_fn_regex" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_name").rlike("[aeiou]{2}").as("m_v"),
        regexp_replace(col("p_name"), "[aeiou]", "#").as("r_v"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("s_v"),
        format_string("%05d-%s", col("p_partkey"), col("p_brand")).as("fmt_v"))),

    "q_fn_datetime" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y_v"),
        month(col("o_orderdate")).cast("long").as("mo_v"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy_v"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_v"),
        dayofyear(col("o_orderdate")).cast("long").as("doy_v"),
        quarter(col("o_orderdate")).cast("long").as("q_v"))),

    "q_fn_datetime2" -> ((s, d) => {
      graft.functions.GraftFunctions.registerAll(s) // date_calc
      t(s, d, "events").select(
        col("event_id"),
        expr("date_calc(ts, '1h30m')").as("date_calc_v"),
        expr("date_calc(ts, '-20m')").as("date_calc_neg_v"),
        hour(col("ts")).cast("long").as("hr_v"),
        minute(col("ts")).cast("long").as("mi_v"),
        second(col("ts")).cast("long").as("se_v"),
        (unix_micros(col("ts")) % 1000000L).as("us_v"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("dd_v"),
        (col("ts") + expr("INTERVAL 3 HOURS")).cast("long").as("calc_v"),
        last_day(col("ts").cast("date")).as("lastday_v"),
        date_format(col("ts"), "MMMM").as("mn_v"),
        date_format(col("ts"), "EEEE").as("dn_v"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("fmt_time_v"),
        col("ts").cast("long").as("to_sec_v"),
        date_format(timestamp_seconds(lit(1700000000L) + col("event_id")),
          "yyyy-MM-dd HH:mm:ss").as("from_unix_v"),
        date_add(lit("1970-01-01").cast("date"),
          (col("event_id") % 20000).cast("int")).as("from_days_v"),
        // convert_tz with a fixed-offset zone (deterministic across
        // engines; IANA-zone DST behavior covered in FunctionsSpec)
        date_format(convert_timezone(lit("UTC"), lit("+08:00"), col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("convert_tz_v"))
    }),

    "q_fn_hash" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("md5_v"),
        sha2(col("text").cast("binary"), 256).as("sha256_v"))),

    // sha1/sha384/sha512/crc32 — DuckDB lacks them; rows-only + golden
    // vectors in FunctionsSpec.
    "q_fn_hash2" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        sha1(col("text").cast("binary")).as("sha1_v"),
        sha2(col("text").cast("binary"), 384).as("sha384_v"),
        sha2(col("text").cast("binary"), 512).as("sha512_v"),
        crc32(col("text").cast("binary")).as("crc32_v"))),

    // geohash plugin pack (extensions/functions/geohash) — DuckDB has
    // no geohash; rows-only + golden, with public Niemeyer test
    // vectors pinned in GeoSpec. Deterministic lat/lng grid derived
    // from nation keys spans both hemispheres.
    "q_fn_geohash" -> ((s, d) => {
      import graft.functions.GeoFunctions._
      val n = t(s, d, "nation").select(
        col("n_nationkey"),
        (col("n_nationkey") * lit(6.7) - lit(83.0)).as("lat"),
        (col("n_nationkey") * lit(13.3) - lit(165.0)).as("lng"))
      // Struct/array outputs go through to_json: the driver's pandas
      // comparator can't hash nested dicts/lists (same convention as
      // q_fn_array below).
      n.select(
        col("n_nationkey"),
        geohash_encode(col("lat"), col("lng")).as("gh_v"),
        geohash_encode_int(col("lat"), col("lng")).as("ghi_v"),
        to_json(geohash_decode(geohash_encode(col("lat"), col("lng")))).as("dec_v"),
        to_json(geohash_decode_int(geohash_encode_int(col("lat"), col("lng")))).as("deci_v"),
        to_json(geohash_bbox(geohash_encode(col("lat"), col("lng")))).as("bbox_v"),
        to_json(geohash_bbox_int(geohash_encode_int(col("lat"), col("lng")))).as("bboxi_v"),
        geohash_neighbor(geohash_encode(col("lat"), col("lng")), lit("North")).as("nb_v"),
        geohash_neighbor_int(geohash_encode_int(col("lat"), col("lng")), lit("South")).as("nbi_v"),
        to_json(geohash_neighbors(geohash_encode(col("lat"), col("lng")))).as("nbs_v"),
        to_json(geohash_neighbors_int(geohash_encode_int(col("lat"), col("lng")))).as("nbsi_v"))
    }),

    // to_json / parse_json (Spark 4 VARIANT) / json_path_query_first /
    // json_path_exists — real key-presence semantics via json_object_keys
    // (distinguishes a missing key from a null-valued one), probing a key
    // that EXISTS and one that doesn't. Reference funcs_misc.go:148,527,538.
    "q_fn_json" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        to_json(struct(col("event_id").as("eid"), col("event_type").as("et"))).as("tj_v"),
        get_json_object(col("props"), "$.k").as("jq_first_v"),
        variant_get(parse_json(col("props")), "$.k", "int").as("parsed_k_v"),
        array_contains(json_object_keys(col("props")), "k").as("jexists_v"),
        array_contains(json_object_keys(col("props")), "zzz").as("jexists_neg_v"))),

    // Array-typed outputs are to_json-serialized: the driver's pandas
    // comparator can't hash nested arrays, and both engines print the
    // same JSON for integer lists.
    "q_fn_array" -> ((s, d) => {
      val arr = array(col("p_size"), col("p_size") * 2, lit(7))
      t(s, d, "part").select(
        col("p_partkey"),
        size(arr).cast("long").as("card_v"),
        element_at(arr, 2).as("elem_v"),
        array_position(arr, 7).as("pos_v"),
        array_contains(arr, 14).as("contains_v"),
        array_max(arr).as("max_v"),
        array_min(arr).as("min_v"),
        to_json(sort_array(arr)).as("sort_v"),
        to_json(sort_array(array_distinct(array(col("p_size") % 5, lit(3), col("p_size") % 5))))
          .as("distinct_v"),
        to_json(array_remove(arr, 7)).as("remove_v"),
        // array_last_position(arr, x) = size+1 - position of x in reverse
        (when(array_position(reverse(arr), col("p_size") * 2) > 0,
          size(arr) + 1 - array_position(reverse(arr), col("p_size") * 2))
          .otherwise(0)).cast("long").as("last_pos_v"))
    }),

    "q_fn_array2" -> ((s, d) => {
      val arr = array(col("p_size"), col("p_size") * 2, lit(7))
      t(s, d, "part").select(
        col("p_partkey"),
        to_json(sort_array(array_union(arr, array(lit(1), lit(2))))).as("union_v"),
        to_json(sort_array(array_intersect(arr, array(lit(7), col("p_size"))))).as("inter_v"),
        to_json(sort_array(array_except(arr, array(lit(7))))).as("except_v"),
        arrays_overlap(arr, array(lit(14), lit(99))).as("hasany_v"),
        to_json(flatten(array(arr, array(lit(9))))).as("flat_v"),
        array_join(split(col("p_name"), " "), "_").as("join_v"),
        to_json(transform(arr, x => x + 1)).as("map_v"),
        to_json(concat(arr, array(lit(0)))).as("concat_v"),
        to_json(sequence(lit(1), lit(1) + col("p_size") % 5)).as("seq_v"),
        to_json(array_repeat(col("p_size"), 3)).as("repeat_v"))
    }),

    // Object (map) functions — reference funcs_obj.go: keys, values,
    // object_construct, object_concat, object_pick, erase, zip, items,
    // obj_to_kvpair_array. Map outputs serialized via to_json.
    "q_fn_object" -> ((s, d) => {
      val m = map(lit("a"), round(col("value"), 2), lit("b"), round(col("value") * 2, 2))
      val m2 = map(lit("b"), lit(0.5), lit("c"), lit(1.5))
      t(s, d, "events").select(
        col("event_id"),
        to_json(map_keys(m)).as("keys_v"),
        to_json(map_values(m)).as("values_v"),
        element_at(m, "a").as("get_v"),
        size(m).cast("long").as("size_v"),
        // object_construct drops null-valued entries (funcs_obj.go:191)
        to_json(map_filter(
          map(lit("a"), round(col("value"), 2),
              lit("n"), when(col("event_id") % 2 === 0, round(col("value"), 2))),
          (_, v) => v.isNotNull)).as("construct_v"),
        // object_concat: right side wins on key conflict (funcs_obj.go:120)
        to_json(map_concat(map_filter(m, (k, _) => k =!= "b"), m2)).as("concat_v"),
        // erase(obj, 'a')
        to_json(map_filter(m, (k, _) => k =!= "a")).as("erase_v"),
        // object_pick(obj, 'a')
        to_json(map_filter(m, (k, _) => k === "a")).as("pick_v"),
        // zip(keys[], vals[]) → object
        to_json(map_from_arrays(array(lit("x"), lit("y")),
          array(round(col("value"), 2), lit(9.5)))).as("zip_v"),
        // items(obj) → [[k,v]...]; obj_to_kvpair_array → [{key,value}...]
        to_json(map_entries(m)).as("items_v"))
    }),

    "q_fn_encode" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        base64(col("source").cast("binary")).as("b64_v"),
        decode(unbase64(base64(col("source").cast("binary"))), "UTF-8").as("roundtrip_v"))),

    "q_fn_misc" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg_v"),
        nullif(col("c_acctbal"), lit(0.0)).isNull.as("zero_bal_v"),
        isnull(nullif(col("c_mktsegment"), col("c_mktsegment"))).as("isnull_v"),
        // nanvl: sqrt of a negative balance is NaN → fall back to -1
        round(nanvl(sqrt(col("c_acctbal")), lit(-1.0)), 6).as("nanvl_v"))),

    "q_unnest" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        explode(split(col("p_name"), " ")).as("tok")))
  )

  val oracle: Map[String, String] = Map(
    "q_fn_math" ->
      """SELECT p_partkey, abs(-p_size) AS abs_v,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_v,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_v,
        |  round(sqrt(p_retailprice),6) AS sqrt_v,
        |  round(exp(p_size/100.0),6) AS exp_v,
        |  round(ln(p_retailprice),6) AS ln_v,
        |  round(log10(p_retailprice),6) AS log10_v,
        |  CAST(p_size*p_size AS BIGINT) AS pow_v,
        |  p_size%7 AS mod_v,
        |  CAST(sign(p_retailprice-1000) AS INT) AS sign_v,
        |  bin(p_size) AS conv_v
        |FROM part""".stripMargin,
    "q_fn_trig" ->
      """SELECT p_partkey,
        |  round(sin(p_size/100.0),6) AS sin_v, round(cos(p_size/100.0),6) AS cos_v,
        |  round(tan(p_size/100.0),6) AS tan_v, round(asin(p_size/100.0),6) AS asin_v,
        |  round(acos(p_size/100.0),6) AS acos_v, round(atan(p_size/100.0),6) AS atan_v,
        |  round(atan2(CAST(p_size AS DOUBLE), 7.0),6) AS atan2_v,
        |  round((exp(p_size/100.0)-exp(-p_size/100.0))/2,6) AS sinh_v,
        |  round((exp(p_size/100.0)+exp(-p_size/100.0))/2,6) AS cosh_v,
        |  round((exp(2*p_size/100.0)-1)/(exp(2*p_size/100.0)+1),6) AS tanh_v,
        |  round(1.0/tan(p_size/100.0),6) AS cot_v,
        |  round(radians(p_size),6) AS rad_v,
        |  round(degrees(p_size/100.0),6) AS deg_v,
        |  round(pi(),6) AS pi_v, round(exp(1),6) AS e_v
        |FROM part""".stripMargin,
    "q_fn_bits" ->
      """SELECT p_partkey,
        |  p_size & 12 AS band_v, p_size | 3 AS bor_v, xor(p_size, 21) AS bxor_v,
        |  ~p_size AS bnot_v,
        |  to_hex(CAST(p_size AS BIGINT)) AS dec2hex_v,
        |  CAST(p_size AS BIGINT) AS hex2dec_v,
        |  chr(65 + p_size % 26) AS chr_v,
        |  floor(p_retailprice * 1.337 * 100) / 100 AS trunc_v
        |FROM part""".stripMargin,
    "q_fn_string" ->
      """SELECT c_custkey,
        |  c_name || '-' || c_mktsegment AS concat_v,
        |  CAST(length(c_name) AS BIGINT) AS len_v,
        |  lower(c_name) AS lower_v, upper(c_mktsegment) AS upper_v,
        |  trim('  ' || c_mktsegment || '  ') AS trim_v,
        |  ltrim('  ' || c_mktsegment) AS ltrim_v,
        |  rtrim(c_mktsegment || '  ') AS rtrim_v,
        |  lpad(c_mktsegment, 12, '*') AS lpad_v,
        |  rpad(c_mktsegment, 12, '#') AS rpad_v,
        |  reverse(c_mktsegment) AS rev_v
        |FROM customer""".stripMargin,
    "q_fn_string2" ->
      """SELECT p_partkey,
        |  substring(p_name, 3, 5) AS sub_v,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS idx_v,
        |  starts_with(p_name, 'red') AS sw_v,
        |  ends_with(p_name, 't') AS ew_v,
        |  CAST(strlen(p_name) AS BIGINT) AS nb_v,
        |  split_part(p_name, ' ', 2) AS split_v
        |FROM part""".stripMargin,
    "q_fn_regex" ->
      """SELECT p_partkey,
        |  regexp_matches(p_name, '[aeiou]{2}') AS m_v,
        |  regexp_replace(p_name, '[aeiou]', '#', 'g') AS r_v,
        |  regexp_extract(p_name, '[a-z]+') AS s_v,
        |  printf('%05d-%s', p_partkey, p_brand) AS fmt_v
        |FROM part""".stripMargin,
    "q_fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y_v,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo_v,
        |  CAST(day(o_orderdate) AS BIGINT) AS dy_v,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_v,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy_v,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q_v
        |FROM orders""".stripMargin,
    "q_fn_datetime2" ->
      """SELECT event_id,
        |  strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS date_calc_v,
        |  strftime(ts - INTERVAL 20 MINUTE, '%Y-%m-%d %H:%M:%S') AS date_calc_neg_v,
        |  CAST(hour(ts) AS BIGINT) AS hr_v,
        |  CAST(minute(ts) AS BIGINT) AS mi_v,
        |  CAST(CAST(floor(epoch(ts)) AS BIGINT) % 60 AS BIGINT) AS se_v,
        |  epoch_us(ts) % 1000000 AS us_v,
        |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS dd_v,
        |  CAST(floor(epoch(ts + INTERVAL 3 HOUR)) AS BIGINT) AS calc_v,
        |  last_day(CAST(ts AS DATE)) AS lastday_v,
        |  monthname(ts) AS mn_v,
        |  dayname(ts) AS dn_v,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS fmt_time_v,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS to_sec_v,
        |  strftime(TIMESTAMP '1970-01-01' + (1700000000 + event_id) * INTERVAL 1 SECOND,
        |           '%Y-%m-%d %H:%M:%S') AS from_unix_v,
        |  DATE '1970-01-01' + CAST(event_id % 20000 AS INT) AS from_days_v,
        |  strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS convert_tz_v
        |FROM events""".stripMargin,
    "q_fn_hash" ->
      """SELECT doc_id, md5(text) AS md5_v, sha256(text) AS sha256_v
        |FROM documents""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  CAST(to_json(struct_pack(eid := event_id, et := event_type)) AS VARCHAR) AS tj_v,
        |  json_extract_string(props, '$.k') AS jq_first_v,
        |  CAST(json_extract(props, '$.k') AS INT) AS parsed_k_v,
        |  list_contains(json_keys(props), 'k') AS jexists_v,
        |  list_contains(json_keys(props), 'zzz') AS jexists_neg_v
        |FROM events""".stripMargin,
    "q_fn_array" ->
      """SELECT p_partkey,
        |  CAST(len([p_size, p_size*2, 7]) AS BIGINT) AS card_v,
        |  ([p_size, p_size*2, 7])[2] AS elem_v,
        |  CAST(coalesce(list_position([p_size, p_size*2, 7], 7), 0) AS BIGINT) AS pos_v,
        |  list_contains([p_size, p_size*2, 7], 14) AS contains_v,
        |  list_max([p_size, p_size*2, 7]) AS max_v,
        |  list_min([p_size, p_size*2, 7]) AS min_v,
        |  CAST(to_json(list_sort([p_size, p_size*2, 7])) AS VARCHAR) AS sort_v,
        |  CAST(to_json(list_sort(list_distinct([p_size%5, 3, p_size%5]))) AS VARCHAR) AS distinct_v,
        |  CAST(to_json(list_filter([p_size, p_size*2, 7], x -> x != 7)) AS VARCHAR) AS remove_v,
        |  CAST(CASE WHEN list_position(list_reverse([p_size, p_size*2, 7]), p_size*2) IS NOT NULL
        |    THEN len([p_size, p_size*2, 7]) + 1
        |         - list_position(list_reverse([p_size, p_size*2, 7]), p_size*2)
        |    ELSE 0 END AS BIGINT) AS last_pos_v
        |FROM part""".stripMargin,
    "q_fn_array2" ->
      """SELECT p_partkey,
        |  CAST(to_json(list_sort(list_distinct(list_concat([p_size, p_size*2, 7], [1, 2])))) AS VARCHAR) AS union_v,
        |  CAST(to_json(list_sort(list_distinct(list_filter([p_size, p_size*2, 7],
        |    x -> list_contains([7, p_size], x))))) AS VARCHAR) AS inter_v,
        |  CAST(to_json(list_sort(list_distinct(list_filter([p_size, p_size*2, 7], x -> x != 7)))) AS VARCHAR) AS except_v,
        |  list_has_any([p_size, p_size*2, 7], [14, 99]) AS hasany_v,
        |  CAST(to_json(flatten([[p_size, p_size*2, 7], [9]])) AS VARCHAR) AS flat_v,
        |  array_to_string(string_split(p_name, ' '), '_') AS join_v,
        |  CAST(to_json(list_transform([p_size, p_size*2, 7], x -> x + 1)) AS VARCHAR) AS map_v,
        |  CAST(to_json(list_concat([p_size, p_size*2, 7], [0])) AS VARCHAR) AS concat_v,
        |  CAST(to_json(range(1, 2 + p_size % 5)) AS VARCHAR) AS seq_v,
        |  CAST(to_json([p_size, p_size, p_size]) AS VARCHAR) AS repeat_v
        |FROM part""".stripMargin,
    "q_fn_object" ->
      """SELECT event_id,
        |  CAST(to_json(map_keys(map(['a','b'], [round(value,2), round(value*2,2)]))) AS VARCHAR) AS keys_v,
        |  CAST(to_json(map_values(map(['a','b'], [round(value,2), round(value*2,2)]))) AS VARCHAR) AS values_v,
        |  round(value,2) AS get_v,
        |  CAST(2 AS BIGINT) AS size_v,
        |  CAST(CASE WHEN event_id % 2 = 0
        |    THEN to_json(map(['a','n'], [round(value,2), round(value,2)]))
        |    ELSE to_json(map(['a'], [round(value,2)])) END AS VARCHAR) AS construct_v,
        |  CAST(to_json(map(['a','b','c'], [round(value,2), 0.5, 1.5])) AS VARCHAR) AS concat_v,
        |  CAST(to_json(map(['b'], [round(value*2,2)])) AS VARCHAR) AS erase_v,
        |  CAST(to_json(map(['a'], [round(value,2)])) AS VARCHAR) AS pick_v,
        |  CAST(to_json(map(['x','y'], [round(value,2), 9.5])) AS VARCHAR) AS zip_v,
        |  CAST(to_json([struct_pack(key := 'a', value := round(value,2)),
        |                struct_pack(key := 'b', value := round(value*2,2))]) AS VARCHAR) AS items_v
        |FROM events""".stripMargin,
    "q_fn_encode" ->
      """SELECT doc_id,
        |  to_base64(encode(source)) AS b64_v,
        |  decode(from_base64(to_base64(encode(source)))) AS roundtrip_v
        |FROM documents""".stripMargin,
    "q_fn_misc" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_v,
        |  (nullif(c_acctbal, 0.0) IS NULL) AS zero_bal_v,
        |  (nullif(c_mktsegment, c_mktsegment) IS NULL) AS isnull_v,
        |  round(CASE WHEN c_acctbal < 0 THEN -1.0 ELSE sqrt(c_acctbal) END, 6) AS nanvl_v
        |FROM customer""".stripMargin,
    "q_unnest" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok FROM part""".stripMargin
  )
}
