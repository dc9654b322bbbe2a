package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** §2.7 scalar function families (+ `explode` from §2.2 — a Catalyst
  * Generator). All built-in `sql.functions` — codegen'd, no UDFs. Math
  * sticks to correctly-rounded ops (sqrt/abs/round/floor); libm
  * functions (log/exp) are excluded from oracles because engines may
  * differ in the last ulp.
  */
object FunctionQueries extends QueryGroup {

  def queries: Seq[GQuery] = Seq(

    GQuery("explode",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .filter($"doc_id" < 50)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
          .select($"doc_id", $"pos".cast("long").as("pos"), $"token")
          .orderBy($"doc_id", $"pos")
      },
      Some("""SELECT doc_id,
                generate_subscripts(str_split(text, ' '), 1) - 1 AS pos,
                unnest(str_split(text, ' ')) AS token
              FROM documents WHERE doc_id < 50
              ORDER BY doc_id, pos""")),

    GQuery("fn_string",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "part")
          .select($"p_partkey",
            lower($"p_name").as("lname"),
            upper($"p_brand").as("ubrand"),
            substring($"p_name", 1, 5).as("pfx"),
            regexp_replace($"p_name", "a", "@").as("repl"),
            length($"p_name").cast("long").as("len"),
            $"p_name".contains("er").as("has_er"),
            $"p_type".startsWith("PRO").as("is_promo"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
                substr(p_name, 1, 5) AS pfx, replace(p_name, 'a', '@') AS repl,
                length(p_name) AS len,
                p_name LIKE '%er%' AS has_er,
                starts_with(p_type, 'PRO') AS is_promo
              FROM part ORDER BY p_partkey""")),

    // Regex family: extraction/matching with dialect-neutral patterns.
    GQuery("fn_regex",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .filter($"o_orderkey" < 1000)
          .select($"o_orderkey",
            regexp_extract($"o_orderpriority", "([0-9]+)", 1).as("prio_digit"),
            $"o_orderpriority".rlike("URGENT|HIGH").as("is_hot"),
            regexp_replace($"o_orderpriority", "[0-9]-", "").as("prio_name"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
                regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_digit,
                regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_hot,
                regexp_replace(o_orderpriority, '[0-9]-', '') AS prio_name
              FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""")),

    GQuery("fn_date",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .filter($"event_id" < 1000)
          .select($"event_id",
            year($"ts").cast("long").as("y"),
            month($"ts").cast("long").as("mo"),
            dayofmonth($"ts").cast("long").as("d"),
            hour($"ts").cast("long").as("h"),
            (dayofweek($"ts") - 1).cast("long").as("dow"),
            unix_millis(date_trunc("hour", $"ts")).as("hour_bucket_ms"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, year(ts) AS y, month(ts) AS mo, day(ts) AS d,
                hour(ts) AS h, dayofweek(ts) AS dow,
                epoch_ms(date_trunc('hour', ts)) AS hour_bucket_ms
              FROM events WHERE event_id < 1000 ORDER BY event_id""")),

    GQuery("fn_math",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .filter($"o_orderkey" < 1000)
          .select($"o_orderkey",
            abs($"o_totalprice" - 250000.0).as("dist"),
            round($"o_totalprice", -2).as("rounded"),
            sqrt($"o_totalprice").as("root"),
            floor($"o_totalprice" / 1000.0).cast("long").as("kbucket"),
            ceil($"o_totalprice" / 1000.0).cast("long").as("kceil"),
            ($"o_orderkey" % 7).as("m7"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, abs(o_totalprice - 250000.0) AS dist,
                round(o_totalprice, -2) AS rounded, sqrt(o_totalprice) AS root,
                CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS kbucket,
                CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS kceil,
                o_orderkey % 7 AS m7
              FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""")),

    GQuery("fn_array",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "embeddings")
          .filter($"vec_id" < 100)
          .select($"vec_id",
            size($"embedding").cast("long").as("dim"),
            element_at($"embedding", 1).cast("double").as("first_e"),
            element_at($"embedding", size($"embedding")).cast("double").as("last_e"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id, len(embedding) AS dim,
                CAST(embedding[1] AS DOUBLE) AS first_e,
                CAST(embedding[len(embedding)] AS DOUBLE) AS last_e
              FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""")),

    // JSON-in-string props: typed struct extraction + aggregate.
    GQuery("fn_json",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), count($"k").as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Nested-JSON flattening (reference: enumerate_json_items /
    // read_json nested records → flat columns): build a nested record,
    // parse with an explicit struct schema, star-expand.
    GQuery("fn_json_nested",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .filter($"event_id" < 1000)
          .withColumn("doc", to_json(struct(
            $"event_id",
            struct($"user_id", $"event_type").as("who"),
            struct(get_json_object($"props", "$.k").cast("long").as("k")).as("payload"))))
          .withColumn("parsed", from_json($"doc", StructType.fromDDL(
            "event_id BIGINT, who STRUCT<user_id: BIGINT, event_type: STRING>, payload STRUCT<k: BIGINT>")))
          .select($"parsed.event_id".as("event_id"),
            $"parsed.who.user_id".as("user_id"),
            $"parsed.who.event_type".as("event_type"),
            $"parsed.payload.k".as("k"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, event_type,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events WHERE event_id < 1000 ORDER BY event_id""")),

    // Map-typed view of the same JSON (dict-valued columns).
    GQuery("fn_map",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .filter($"event_id" < 1000)
          .withColumn("m", from_json($"props", MapType(StringType, LongType)))
          .select($"event_id",
            map_keys($"m")(0).as("first_key"),
            element_at($"m", "k").as("k_value"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, 'k' AS first_key,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
              FROM events WHERE event_id < 1000 ORDER BY event_id"""))
  )
}
