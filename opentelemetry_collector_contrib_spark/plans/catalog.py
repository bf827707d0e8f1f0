"""Query catalog: one entry per implemented operator, each with a DuckDB
ANSI-SQL oracle over the same parquet tables.

This is the correctness contract consumed by ``__spark_entry__.py``: the
driver runs each Spark query AND its oracle at sf=0.01 and compares
row-count + schema + order-insensitive value hashes. Column names/aliases
are kept identical on both sides; double aggregations go through
decimal(18,2) so sums are exact (float addition order differs between
engines); hashes use md5/sha256 (identical hex in both engines).

Queries deliberately exercise the operator stages from SURVEY.md §2 —
parsers, transformers, processors, connectors, dedup family, text analysis,
similarity — over the driver-provided tables (events/documents/embeddings/
TPC-H star schema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.severity import severity_number_col, severity_text_col
from ..operators import connectors, dedup, parsers, processors, transformers

HEX = "0123456789abcdef"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _t_par(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan for CPU-bound per-row queries, parallelism-guaranteed.

    The driver's tables are one parquet file with one row group per table
    (even 1M-row events at sf1), and a single row group is unsplittable —
    the scan and every narrow stage above it run as ONE task regardless of
    cores (measured: the whole syslog row on one of 32 cores). The
    optimization-guide remedy for an unsplittable input is to repartition
    right after the read; done ADAPTIVELY: only when the scan yields fewer
    splits than the session's parallelism (at real scale a table has
    >= cores splits and no exchange is added). The shuffle moves only the
    scanned columns — a few MB here — and AQE leaves explicit
    repartition(n) counts alone."""
    df = _t(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    n = _scan_splits(spark, sf_dir, name, df)
    return df.repartition(par) if n < par else df


def _scan_splits(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> int:
    """Estimated byte-range split count for the table's scan.

    Local filesystem: pure ``os.stat`` arithmetic — Spark packs files into
    splits of ``maxPartitionBytes``, so per-file ``ceil(size/maxPB)`` summed
    reproduces the byte-split count for the single-file driver tables with
    zero driver work (the previous ``df.rdd.getNumPartitions()`` probe paid
    a full plan translation per query — ~0.1-1.1 s of driver time each,
    2-4 s across the 50-query sweep). Non-local paths (hdfs://, s3://)
    fall back to the rdd probe.
    """
    import math

    try:
        max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    except (TypeError, ValueError):
        max_pb = 134217728
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return max(1, math.ceil(os.path.getsize(path) / max_pb))
        if os.path.isdir(path):
            sizes = [
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            ]
            if sizes:
                return sum(max(1, math.ceil(s / max_pb)) for s in sizes)
    except OSError:
        pass
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return spark.sparkContext.defaultParallelism


# --------------------------------------------------------------------- parse

def q_regex_parser(spark, sf_dir):
    """stanza regex_parser (operator/parser/regex/parser.go:16-67): named
    groups over documents.text, row-level."""
    df = _t(spark, sf_dir, "documents")
    df = parsers.regex_parser(df, r"^(?P<w1>\w+) (?P<w2>\w+)", parse_from="text")
    return df.select(
        "doc_id",
        F.col("w1").alias("w1"),
        F.col("w2").alias("w2"),
        F.col("_parse_error").alias("parse_error"),
    )


SQL_REGEX_PARSER = r"""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '^(\w+) (\w+)') THEN regexp_extract(text, '^(\w+) (\w+)', 1) END AS w1,
       CASE WHEN regexp_matches(text, '^(\w+) (\w+)') THEN regexp_extract(text, '^(\w+) (\w+)', 2) END AS w2,
       NOT regexp_matches(text, '^(\w+) (\w+)') AS parse_error
FROM documents
"""


def q_json_parser(spark, sf_dir):
    """stanza json_parser (operator/parser/jsonparser/parser.go:29):
    events.props JSON → typed field."""
    df = _t_par(spark, sf_dir, "events")
    df = parsers.json_parser(df, "k int", parse_from="props", parse_to="j")
    return df.select("event_id", F.col("j.k").alias("k_int"))


SQL_JSON_PARSER = """
SELECT event_id, CAST(json_extract_string(props, 'k') AS INT) AS k_int FROM events
"""


def q_keyvalue_parser(spark, sf_dir):
    """stanza key_value_parser (operator/parser/keyvalue/parser.go:27):
    str_to_map round-trip over a synthesized k=v line."""
    df = _t_par(spark, sf_dir, "events").withColumn(
        "kv", F.format_string("type=%s user=%d", F.col("event_type"), F.col("user_id"))
    )
    df = parsers.keyvalue_parser(df, parse_from="kv", out="m")
    return df.select(
        "event_id",
        F.element_at("m", "type").alias("type_parsed"),
        F.element_at("m", "user").cast("bigint").alias("user_parsed"),
    )


SQL_KEYVALUE_PARSER = """
SELECT event_id, event_type AS type_parsed, user_id AS user_parsed FROM events
"""


def q_severity_parser(spark, sf_dir):
    """stanza severity_parser (helper/severity_builder.go:18-80) over
    event_type tokens ('error' is the only mapped alias here)."""
    df = _t(spark, sf_dir, "events")
    df = parsers.severity_parser(df, parse_from="event_type")
    return df.select("event_id", "severity_number", "severity_text")


SQL_SEVERITY_PARSER = """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 17 ELSE 0 END AS severity_number,
       CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'DEFAULT' END AS severity_text
FROM events
"""


def q_time_parser(spark, sf_dir):
    """stanza time_parser (helper/time.go:74-123): format → strptime parse
    round-trip, returned as epoch micros."""
    df = _t_par(spark, sf_dir, "events").withColumn(
        "ts_str", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )
    df = parsers.time_parser(df, "ts_str", "t2", "%Y-%m-%dT%H:%M:%S.%f")
    return df.select("event_id", F.unix_micros("t2").alias("epoch_us"))


SQL_TIME_PARSER = """
SELECT event_id, epoch_us(ts) AS epoch_us FROM events
"""


# ------------------------------------------------------------- transform/ottl

def q_transform_set_where(spark, sf_dir):
    """transformprocessor statement: set(tag, Upper(event_type)) where
    value > 100 (OTTL set editor + where condition)."""
    df = _t(spark, sf_dir, "events")
    df = df.withColumn(
        "tag", F.when(F.col("value") > 100, F.upper("event_type")).otherwise(F.lit(None))
    )
    return df.select("event_id", "tag")


SQL_TRANSFORM_SET_WHERE = """
SELECT event_id, CASE WHEN value > 100 THEN upper(event_type) END AS tag FROM events
"""


def q_filter_processor(spark, sf_dir):
    """filterprocessor (logs.go:98-162): drop where ANY condition matches."""
    df = _t(spark, sf_dir, "events")
    kept, _ = processors.filter_processor(
        df, [F.col("event_type") == "click", F.col("value") < 10]
    )
    return kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


SQL_FILTER_PROCESSOR = """
SELECT event_type, count(*) AS n FROM events
WHERE NOT (event_type = 'click' OR value < 10)
GROUP BY event_type
"""


def q_attributes_hash(spark, sf_dir):
    """attributesprocessor hash action (attraction.go:116-144, SHA-256)."""
    df = _t(spark, sf_dir, "customer").select("c_custkey", F.col("c_name").alias("c_hash"))
    df = processors.attributes_actions(df, [{"action": "hash", "key": "c_hash"}])
    return df.select("c_custkey", "c_hash")


SQL_ATTRIBUTES_HASH = """
SELECT c_custkey, sha256(c_name) AS c_hash FROM customer
"""


def q_probabilistic_sampler(spark, sf_dir):
    """probabilisticsampler (logsprocessor.go:39-117): deterministic
    hash-based keep decision — md5-prefix arithmetic expressible in both
    engines (the production operator uses xxhash64; this query proves the
    consistent-decision property with a portable hash)."""
    df = _t(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    v = (F.instr(F.lit(HEX), F.substring(h, 1, 1)) - 1) * 16 + (
        F.instr(F.lit(HEX), F.substring(h, 2, 1)) - 1
    )
    return df.filter(v < 64).select("event_id")  # 25% consistent sample


SQL_PROBABILISTIC_SAMPLER = """
SELECT event_id FROM events
WHERE (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) * 16
    + (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1) < 64
"""


def q_unroll_explode(spark, sf_dir):
    """unrollprocessor (processor.go:31-71): explode a slice field.

    _t_par (r6): the full-text split runs before the explode, and the
    single-row-group documents file would run it as one task (measured
    1.46s -> 1.20s at the 10x sweep)."""
    df = _t_par(spark, sf_dir, "documents")
    words = F.slice(F.split(F.col("text"), r"\s+"), 1, 5)
    df = df.withColumn("word", words)
    df = processors.unroll(df, "word")
    return df.select("doc_id", "word")


SQL_UNROLL_EXPLODE = r"""
SELECT doc_id, unnest(list_slice(string_split_regex(text, '\s+'), 1, 5)) AS word
FROM documents
"""


# ------------------------------------------------------------------- routing

def q_router_first_match(spark, sf_dir):
    """routingconnector move semantics (logs.go:64-173): ordered when-chain,
    first match wins, leftovers → default."""
    df = _t(spark, sf_dir, "events")
    routed = connectors.routed_frame(
        df,
        [
            connectors.Route("sink_errors", F.col("event_type") == "error"),
            connectors.Route("sink_big", F.col("value") > 150),
            connectors.Route("sink_signup", F.col("event_type") == "signup"),
        ],
    )
    return routed.select("event_id", "route_id")


SQL_ROUTER_FIRST_MATCH = """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 'sink_errors'
            WHEN value > 150 THEN 'sink_big'
            WHEN event_type = 'signup' THEN 'sink_signup'
            ELSE 'default' END AS route_id
FROM events
"""


def q_count_sum_connectors(spark, sf_dir):
    """countconnector (counter.go:39-127: OR'd conditions + dimension attrs
    → per-dimension counts) AND sumconnector (config.go:32-34: sum numeric
    attr per dims) over the same dimension key, joined into one frame (the
    two connectors share the grouping shape; one row covers both — r5 merge
    to stay inside the driver's 50-row window). Sum runs in exact decimal;
    the compared column is bigint cents (decimal stringification differs
    across engines, integers don't)."""
    df = _t(spark, sf_dir, "events")
    counts = connectors.count_connector(
        df,
        [
            connectors.CountMetric(
                name="event.count",
                conditions=[F.col("value") >= 100, F.col("event_type") == "error"],
                dimensions=["event_type"],
            )
        ],
    )["event.count"].select("event_type", F.col("count").alias("n"))
    sums = connectors.sum_connector(
        df.withColumn("value_dec", F.col("value").cast("decimal(18,2)")),
        "value_dec", ["event_type"], name="total",
    ).select("event_type", (F.col("total") * 100).cast("bigint").alias("total_cents"))
    return counts.join(sums, "event_type", "outer")


SQL_COUNT_SUM_CONNECTORS = """
SELECT event_type, c.n, s.total_cents
FROM (SELECT event_type, count(*) AS n FROM events
      WHERE value >= 100 OR event_type = 'error' GROUP BY event_type) c
FULL OUTER JOIN
     (SELECT event_type, CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
      FROM events GROUP BY event_type) s
USING (event_type)
"""


# ---------------------------------------------------------------- aggregates

def q_logdedup_window(spark, sf_dir):
    """logdedupprocessor (processor.go:163-301): tumbling-interval dedup with
    count + first/last observed timestamps."""
    # parquet TIMESTAMP_NTZ → TIMESTAMP (session TZ is pinned UTC, so the
    # wall-time interpretation matches DuckDB's naive epoch())
    df = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    out = dedup.log_dedup(df, ["user_id", "event_type"], ts_col="ts", interval="10 minutes")
    return out.select(
        F.unix_timestamp("window_start").alias("win_start"),
        "user_id",
        "event_type",
        "log_count",
        F.unix_micros("first_observed_timestamp").alias("first_us"),
        F.unix_micros("last_observed_timestamp").alias("last_us"),
    )


SQL_LOGDEDUP_WINDOW = """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
       user_id, event_type,
       count(*) AS log_count,
       min(epoch_us(ts)) AS first_us,
       max(epoch_us(ts)) AS last_us
FROM events GROUP BY 1, 2, 3
"""


def q_recombine_sessionize(spark, sf_dir):
    """stanza recombine (recombine/config.go:40-62): is_first_entry
    sessionization, ordered merge of the combine field."""
    df = _t(spark, sf_dir, "events")
    out = transformers.recombine(
        df,
        is_first_entry=F.col("event_type") == "signup",
        source_col="user_id",
        order_col="event_id",
        combine_field="event_type",
        combine_with=",",
        max_batch_size=1_000_000,
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("body"),
        F.col("event_id").alias("first_event"),
        F.col("recombined_n").alias("n_events"),
    )


SQL_RECOMBINE_SESSIONIZE = """
WITH s AS (
  SELECT user_id, event_id, event_type,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY event_id) AS session_id
  FROM events
)
SELECT user_id,
       string_agg(event_type, ',' ORDER BY event_id) AS body,
       min(event_id) AS first_event,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id
"""


# -------------------------------------------------------------------- enrich

def q_enrich_broadcast_chain(spark, sf_dir):
    """k8sattributes-style chained broadcast lookups
    (k8sattributesprocessor/processor.go:182-285): fact → supplier → nation
    → region, then per-region accounting."""
    from ..operators.enrich import broadcast_lookup

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name", "n_regionkey"
    )
    reg = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name"
    )
    df = broadcast_lookup(li, sup, "l_suppkey")
    df = broadcast_lookup(df, nat, "s_nationkey")
    df = broadcast_lookup(df, reg, "n_regionkey")
    return df.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("revenue"),
    )


SQL_ENRICH_BROADCAST_CHAIN = """
SELECT r_name, count(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
FROM lineitem
LEFT JOIN supplier ON l_suppkey = s_suppkey
LEFT JOIN nation ON s_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_tpch_q1_pricing(spark, sf_dir):
    """Hash-agg accounting (countconnector/batch accounting analog): TPC-H
    Q1-shaped pricing summary with decimal exactness."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(dec("l_quantity")) * 100).cast("bigint").alias("sum_qty_cents"),
            (F.sum(dec("l_extendedprice")) * 100).cast("bigint").alias("sum_base_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------- metric algebra

def q_cumulative_to_delta(spark, sf_dir):
    """cumulativetodelta + deltatocumulative in ONE row (processor.go:93-116
    / 188-200): per-series value-lag delta AND the per-user running sum —
    both operators exercised, joined on the unique event_id (merged r4 to
    free a catalog slot for the training-data operators)."""
    from ..operators import metrics

    df = _t(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,2)")
    )
    delta = metrics.cumulative_to_delta(df, ["user_id", "event_type"], "event_id", "value")
    cum = metrics.delta_to_cumulative(df, ["user_id"], "event_id", "value")
    return delta.select(
        "event_id", "user_id", "event_type",
        (F.col("delta") * 100).cast("bigint").alias("delta_cents"),
    ).join(
        cum.select(
            "event_id",
            (F.col("cumulative") * 100).cast("bigint").alias("cumulative_cents"),
        ),
        "event_id",
    )


SQL_CUMULATIVE_TO_DELTA = """
WITH s AS (
  SELECT event_id, user_id, event_type, CAST(value AS DECIMAL(18,2)) AS value,
         lag(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS prev,
         SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id
                                                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
)
SELECT event_id, user_id, event_type,
       CAST((value - prev) * 100 AS BIGINT) AS delta_cents,
       CAST(cum * 100 AS BIGINT) AS cumulative_cents
FROM s WHERE prev IS NOT NULL
"""


def q_interval_last(spark, sf_dir):
    """intervalprocessor (processor.go:47-121): last point per series per
    tumbling interval."""
    from ..operators import metrics

    df = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    out = metrics.interval_last(df, ["event_type"], "ts", "value", "1 hour")
    return out.select(
        F.unix_timestamp("window_start").alias("win_start"),
        "event_type",
        (F.col("last_value").cast("decimal(18,2)") * 100).cast("bigint").alias("last_cents"),
        "points_merged",
    )


SQL_INTERVAL_LAST = """
WITH s AS (
  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start, event_type, value, ts,
         row_number() OVER (PARTITION BY floor(epoch(ts) / 3600), event_type ORDER BY ts DESC) AS rn,
         count(*) OVER (PARTITION BY floor(epoch(ts) / 3600), event_type) AS points_merged
  FROM events
)
SELECT win_start, event_type,
       CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_cents, points_merged
FROM s WHERE rn = 1
"""


# ------------------------------------------------------- training-data dedup

def q_exact_dedup(spark, sf_dir):
    """Exact dedup + fingerprint + canonical-URL dedup key in one row.

    Content branch: hash-groupBy on md5(text) plus the whitespace-normalized
    prefix fingerprint (rolling-hash analog, portable across engines). URL
    branch (r4, folds canonicalize_url into a driver row): every doc gets a
    deterministic messy crawl URL — uppercase scheme/host, https default
    port, fragment, utm param, unsorted query — and the grouping counts docs
    per CANONICAL url, proving the full normalization chain (lowering, port
    strip, param strip+sort, slash trim). One unioned frame keyed by `kind`;
    the oracle constructs the expected canonical string independently."""
    df = _t_par(spark, sf_dir, "documents")
    norm = F.substring(F.lower(F.regexp_replace("text", r"\s+", " ")), 1, 128)
    content = (
        df.groupBy(
            F.md5("text").alias("dedup_key"), F.md5(norm).alias("fingerprint")
        )
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .withColumn("kind", F.lit("content"))
    )
    url = F.format_string(
        "HTTPS://Crawl.%s.COM:443/en/p%d/?utm_source=feed&b=2&a=1#frag",
        F.col("source"), (F.col("doc_id") % 3).cast("int"),
    )
    urls = (
        df.withColumn("_u", dedup.canonicalize_url(url))
        .groupBy(F.col("_u").alias("dedup_key"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .withColumn("fingerprint", F.lit(""))
        .withColumn("kind", F.lit("url"))
    )
    return content.unionByName(urls)


SQL_EXACT_DEDUP = r"""
SELECT md5(text) AS dedup_key,
       md5(substr(lower(regexp_replace(text, '\s+', ' ', 'g')), 1, 128)) AS fingerprint,
       min(doc_id) AS keep_id, count(*) AS n_copies, 'content' AS kind
FROM documents GROUP BY 1, 2
UNION ALL
SELECT printf('https://crawl.%s.com/en/p%d?a=1&b=2', lower(source), CAST(doc_id % 3 AS INT)) AS dedup_key,
       '' AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies, 'url' AS kind
FROM documents GROUP BY 1
"""


def q_line_dedup(spark, sf_dir):
    """line_dedup (C4/RefinedWeb boilerplate-line removal pass): documents
    re-lined into 3-word lines (the synthetic corpus's small vocabulary makes
    3-word lines repeat across docs, like boilerplate does), lines occurring
    in MORE than 2 distinct docs dropped, docs rebuilt in original order —
    all-boilerplate docs come back empty rather than vanishing."""
    df = _t_par(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"(\S+ \S+ \S+) ", "$1\n").alias("text"),
    )
    out = dedup.line_dedup(df, max_line_df=2)
    return out.select("doc_id", "text", "n_lines_kept")


SQL_LINE_DEDUP = r"""
WITH lined AS (
  SELECT doc_id,
         string_split(regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g'), chr(10)) AS l
  FROM documents
),
ln AS (SELECT doc_id, unnest(l) AS line, unnest(range(1, len(l)+1)) AS pos FROM lined),
hot AS (
  SELECT line FROM ln WHERE length(line) >= 1
  GROUP BY line HAVING count(DISTINCT doc_id) > 2
),
kept AS (SELECT * FROM ln ANTI JOIN hot USING (line)),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_lines_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(r.text, '') AS text,
       coalesce(r.n_lines_kept, 0) AS n_lines_kept
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""


def q_benchmark_contamination(spark, sf_dir):
    """benchmark_contamination (GPT-3-style n-gram decontamination, Brown et
    al. 2020 appendix C): benchmark = the first 12 words of every 17th doc;
    per-train-doc fraction of word 8-grams present anywhere in the benchmark
    gram set. The oracle recomputes with gram STRINGS — hash-set membership
    is string-set membership modulo negligible 64-bit collisions."""
    df = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )  # shingle HOFs are CPU-bound; the single small parquet file = one task
    bench = df.filter(F.col("doc_id") % 17 == 0).select(
        F.regexp_extract(F.lower("text"), r"^(\S+(?: \S+){11})", 1).alias("text")
    )
    out = dedup.benchmark_contamination(df, bench, n=8, min_overlap=0.1)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_hit").cast("bigint").alias("n_hit"),
        F.round("overlap", 4).alias("overlap"),
        "contaminated",
    )


SQL_BENCHMARK_CONTAMINATION = r"""
WITH words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
tg AS (SELECT doc_id, unnest(rs) AS i, w
       FROM (SELECT doc_id, w, range(1, greatest(len(w)-7, 1)+1) AS rs FROM words)),
grams AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram FROM tg GROUP BY 1, 2),
bench AS (SELECT regexp_extract(lower(text), '^(\S+(?: \S+){11})', 1) AS btext
          FROM documents WHERE doc_id % 17 = 0),
bw AS (SELECT string_split_regex(btext, '\s+') AS w FROM bench),
btg AS (SELECT unnest(rs) AS i, w
        FROM (SELECT w, range(1, greatest(len(w)-7, 1)+1) AS rs FROM bw)),
bgrams AS (SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram FROM btg),
ng AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
h AS (SELECT g.doc_id, count(*) AS n_hit FROM grams g JOIN bgrams b USING (gram) GROUP BY 1)
SELECT ng.doc_id, ng.n_grams, coalesce(h.n_hit, 0) AS n_hit,
       round(coalesce(h.n_hit, 0) / greatest(ng.n_grams, 1), 4) AS overlap,
       (coalesce(h.n_hit, 0) / greatest(ng.n_grams, 1)) >= 0.1 AS contaminated
FROM ng LEFT JOIN h USING (doc_id)
"""


def q_log_template_mining(spark, sf_dir):
    """drainprocessor analog (README.md:4-36): mask variable parts → template
    → count. Deterministic masking instead of online Drain clustering."""
    from ..operators.templates import mine_templates

    df = _t_par(spark, sf_dir, "events").withColumn(
        "line",
        F.format_string(
            'user=%s type=%s took %sms ip=10.0.%s.%s "req done"',
            F.col("user_id"), F.col("event_type"),
            (F.col("event_id") % 997).cast("int"),
            (F.col("user_id") % 256).cast("int"), (F.col("event_id") % 256).cast("int"),
        ),
    )
    out = mine_templates(df, "line")
    return out.select("template", "n", "example")


SQL_LOG_TEMPLATE_MINING = r"""
WITH lines AS (
  SELECT printf('user=%d type=%s took %dms ip=10.0.%d.%d "req done"',
                user_id, event_type, CAST(event_id % 997 AS INT),
                user_id % 256, event_id % 256) AS line
  FROM events
), masked AS (
  SELECT line,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(line, '"[^"]*"', '<STR>', 'g'),
               '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             '\b[0-9a-fA-F]{8,}\b', '<HEX>', 'g'),
           '\d+(?:\.\d+)?', '<NUM>', 'g') AS template
  FROM lines
)
SELECT template, count(*) AS n, min(line) AS example
FROM masked GROUP BY template
"""


def q_group_by_trace(spark, sf_dir):
    """groupbytrace analog: assemble per-user 'traces' with span counts and
    bounds (span list itself is rows-only checked via span_count)."""
    from ..operators.templates import group_by_trace

    df = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    out = group_by_trace(df, "user_id", "ts")
    return out.select(
        "user_id", "span_count",
        F.unix_micros("trace_start").alias("start_us"),
        F.unix_micros("trace_end").alias("end_us"),
    )


SQL_GROUP_BY_TRACE = """
SELECT user_id, count(*) AS span_count,
       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
FROM events GROUP BY user_id
"""


def q_tail_sampling(spark, sf_dir):
    """tailsampling policy set with combinators: string_attribute OR
    and(numeric_attribute, span_count) OR ottl_condition, minus a drop
    policy (drop overrides Sampled, processor.go:307). All deterministic so
    the oracle holds; probabilistic/rate_limiting are pytest-covered."""
    from ..operators.templates import tail_sampling

    df = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    kept = tail_sampling(
        df,
        [
            {"type": "string_attribute", "key": "event_type", "values": ["error"]},
            {
                "type": "and",
                "policies": [
                    {"type": "numeric_attribute", "key": "value", "min": 190.0},
                    {"type": "span_count", "min_spans": 2},
                ],
            },
            {"type": "ottl_condition", "conditions": ['event_type == "signup"']},
            {
                "type": "drop",
                "policies": [{"type": "numeric_attribute", "key": "value", "min": 199.9}],
            },
        ],
        trace_col="user_id",
        ts_col="ts",
    )
    return kept.select("event_id", "user_id")


SQL_TAIL_SAMPLING = """
SELECT event_id, user_id FROM events
WHERE user_id IN (
  SELECT user_id FROM events
  GROUP BY user_id
  HAVING (max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1
          OR (max(CASE WHEN value >= 190.0 THEN 1 ELSE 0 END) = 1 AND count(*) >= 2)
          OR max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) = 1)
     AND max(CASE WHEN value >= 199.9 THEN 1 ELSE 0 END) = 0
)
"""


# ----------------------------------------------- extended parser/processor set

def q_csv_parser(spark, sf_dir):
    """stanza csv_parser (operator/parser/csv/parser.go:78): static header
    list over a synthesized CSV line, parsed with from_csv.

    Plain ``_t`` scan (r6): lineitem is the one driver table large enough to
    span multiple row groups (6M rows → 6 splits at sf1), and from_csv is
    cheap per row — repartitioning 6M rows cost more than the extra
    parallelism bought back (measured 1.33s vs 1.66s at the 10× sweep)."""
    df = _t(spark, sf_dir, "lineitem").withColumn(
        "line",
        F.format_string("%s,%s,%s", F.col("l_orderkey"), F.col("l_returnflag"), F.col("l_linestatus")),
    )
    df = parsers.csv_parser(df, ["okey", "rflag", "smode"], parse_from="line")
    return df.select(
        F.col("okey").cast("bigint").alias("okey"),
        "rflag", "smode",
        F.col("l_linenumber").alias("lineno"),
    )


SQL_CSV_PARSER = """
WITH lines AS (
  SELECT printf('%d,%s,%s', l_orderkey, l_returnflag, l_linestatus) AS line,
         l_linenumber FROM lineitem
)
SELECT CAST(str_split(line, ',')[1] AS BIGINT) AS okey,
       str_split(line, ',')[2] AS rflag,
       str_split(line, ',')[3] AS smode,
       l_linenumber AS lineno
FROM lines
"""


def q_uri_parser(spark, sf_dir):
    """stanza uri_parser (operator/parser/uri/parser.go:26): parse_url per
    component over a synthesized URL."""
    df = _t_par(spark, sf_dir, "events").withColumn(
        "url",
        F.format_string(
            "https://%s.example.com:8443/api/v%s/items?uid=%s",
            F.col("event_type"), (F.col("user_id") % 3).cast("int"), F.col("user_id"),
        ),
    )
    df = parsers.uri_parser(df, "url")
    return df.select(
        "event_id",
        F.col("uri_scheme").alias("scheme"),
        F.col("uri_host").alias("host"),
        F.col("uri_path").alias("path"),
        F.col("uri_query").alias("query"),
    )


SQL_URI_PARSER = """
WITH u AS (
  SELECT event_id,
         printf('https://%s.example.com:8443/api/v%d/items?uid=%d',
                event_type, user_id % 3, user_id) AS url
  FROM events
)
SELECT event_id,
       regexp_extract(url, '^(\\w+)://', 1) AS scheme,
       regexp_extract(url, '^\\w+://([^:/?]+)', 1) AS host,
       regexp_extract(url, '^\\w+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query
FROM u
"""


def q_syslog_parser(spark, sf_dir):
    """syslog_parser, BOTH protocols in one two-branch query
    (operator/parser/syslog/parser.go:115, config.go:22-23):

    - RFC5424: PRI → severity/facility, header fields, ISO timestamp.
    - RFC3164: PRI, BSD timestamp (space-padded day, year-less →
      current-year anchor), hostname/appname/pid/message.

    Both branches parse the same events table and union on a normalized
    schema (proto, ids, severity/facility, header fields, formatted ts)."""
    # --- RFC5424 branch (with STRUCTURED-DATA: two SD elements per line,
    # parsed into the nested map and surfaced as flat compared columns)
    pri = F.when(F.col("event_type") == "error", 11).otherwise(14)
    df = _t_par(spark, sf_dir, "events").withColumn(
        "body",
        F.format_string(
            '<%s>1 %s host-%s app-%s %s ID47 [ex@32473 eid="%s" src="%s"][meta seq="%s"] boom %s',
            pri,
            F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            (F.col("user_id") % 5).cast("int"),
            F.col("event_type"), F.col("event_id"),
            F.col("event_id"), F.col("event_type"), F.col("user_id"),
            F.col("event_id"),
        ),
    )
    df = parsers.syslog_parser(df, "body", protocol="rfc5424")
    sd = F.col("structured_data")
    a = df.select(
        F.lit("rfc5424").alias("proto"),
        "event_id", "severity_number", "facility", "hostname", "appname",
        F.lit(None).cast("bigint").alias("pid"),
        F.col("message").alias("message"),
        F.unix_micros("timestamp").cast("string").alias("ts_str"),
        F.element_at(F.element_at(sd, "ex@32473"), "eid").alias("sd_eid"),
        F.element_at(F.element_at(sd, "ex@32473"), "src").alias("sd_src"),
        F.element_at(F.element_at(sd, "meta"), "seq").alias("sd_seq"),
    )

    # --- RFC3164 branch
    pri3 = F.when(F.col("event_type") == "error", 35).otherwise(165)
    df3 = _t_par(spark, sf_dir, "events").withColumn(
        "body",
        F.format_string(
            "<%s>%s host-%s app%s[%s]: msg %s",
            pri3,
            F.date_format(F.col("ts"), "MMM d HH:mm:ss"),  # non-padded day
            (F.col("user_id") % 5).cast("int"),
            (F.col("event_id") % 3).cast("int"), F.col("user_id"), F.col("event_id"),
        ),
    )
    # single-digit days render "Jan 7" in the fixture; RFC3164 writes "Jan  7"
    df3 = df3.withColumn(
        "body", F.regexp_replace("body", r"(\w{3}) (\d) ", r"$1  $2 ")
    )
    df3 = parsers.syslog_parser(df3, "body", protocol="rfc3164")
    b = df3.select(
        F.lit("rfc3164").alias("proto"),
        "event_id", "severity_number", "facility", "hostname", "appname",
        F.col("pid").cast("bigint").alias("pid"),
        F.col("message").alias("message"),
        F.date_format("timestamp", "MM-dd HH:mm:ss").alias("ts_str"),
        F.lit(None).cast("string").alias("sd_eid"),
        F.lit(None).cast("string").alias("sd_src"),
        F.lit(None).cast("string").alias("sd_seq"),
    )
    return a.unionByName(b)


SQL_SYSLOG_PARSER = """
WITH lines AS (
  SELECT event_id,
         printf('<%d>1 %s host-%d app-%s %d ID47 [ex@32473 eid="%d" src="%s"][meta seq="%d"] boom %d',
                CASE WHEN event_type = 'error' THEN 11 ELSE 14 END,
                strftime(ts, '%Y-%m-%dT%H:%M:%SZ'),
                user_id % 5, event_type, event_id,
                event_id, event_type, user_id, event_id) AS body
  FROM events
), p AS (
  SELECT event_id, body,
         CAST(regexp_extract(body, '^<(\\d{1,3})>', 1) AS INT) AS pri,
         regexp_extract(body, '^<\\d+>\\d (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) (-|(?:\\[.*?\\])+) ?(.*)$',
                        ['ts','hostname','appname','procid','msgid','structured','message']) AS g
  FROM lines
)
SELECT 'rfc5424' AS proto,
       event_id,
       CASE pri % 8 WHEN 0 THEN 23 WHEN 1 THEN 22 WHEN 2 THEN 21 WHEN 3 THEN 17
                    WHEN 4 THEN 13 WHEN 5 THEN 10 WHEN 6 THEN 9 WHEN 7 THEN 5 END AS severity_number,
       pri // 8 AS facility,
       g.hostname AS hostname, g.appname AS appname,
       CAST(NULL AS BIGINT) AS pid,
       g.message AS message,
       CAST(epoch_us(strptime(g.ts, '%Y-%m-%dT%H:%M:%SZ')) AS VARCHAR) AS ts_str,
       regexp_extract(g.structured, 'eid="([^"]*)"', 1) AS sd_eid,
       regexp_extract(g.structured, 'src="([^"]*)"', 1) AS sd_src,
       regexp_extract(g.structured, 'seq="([^"]*)"', 1) AS sd_seq
FROM p
UNION ALL
SELECT 'rfc3164' AS proto,
       event_id,
       CASE WHEN event_type = 'error' THEN 17 ELSE 10 END AS severity_number,
       CASE WHEN event_type = 'error' THEN 4 ELSE 20 END AS facility,
       printf('host-%d', user_id % 5) AS hostname,
       printf('app%d', event_id % 3) AS appname,
       user_id AS pid,
       printf('msg %d', event_id) AS message,
       strftime(ts, '%m-%d %H:%M:%S') AS ts_str,
       CAST(NULL AS VARCHAR) AS sd_eid,
       CAST(NULL AS VARCHAR) AS sd_src,
       CAST(NULL AS VARCHAR) AS sd_seq
FROM events
"""


def q_container_parser(spark, sf_dir):
    """container parser auto-detect (operator/parser/container/parser.go:31-43):
    docker-JSON vs containerd lines in one column."""
    docker_line = F.format_string(
        '{"log":"m %s","stream":"stdout","time":"2024-01-01T00:00:00Z"}', F.col("event_id")
    )
    cri_line = F.format_string("2024-01-01T00:00:00Z stderr F m %s", F.col("event_id"))
    df = _t_par(spark, sf_dir, "events").withColumn(
        "body", F.when(F.col("event_id") % 2 == 0, docker_line).otherwise(cri_line)
    )
    df = parsers.container_parser(df, "body")
    return df.select("event_id", "container_format", "log", "stream", "container_time")


SQL_CONTAINER_PARSER = """
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN 'docker' ELSE 'containerd' END AS container_format,
       printf('m %d', event_id) AS log,
       CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
       '2024-01-01T00:00:00Z' AS container_time
FROM events
"""


def q_trace_parser(spark, sf_dir):
    """trace_parser (operator/helper/trace.go): hex → binary ids; checked via
    byte length + lowercase hex round-trip."""
    df = _t(spark, sf_dir, "documents").withColumn(
        "trace_id_hex", F.md5(F.col("doc_id").cast("string").cast("binary"))
    )
    df = parsers.trace_parser(df, "trace_id_hex")
    return df.select(
        "doc_id",
        F.length("trace_id").alias("id_bytes"),
        F.lower(F.hex("trace_id")).alias("roundtrip"),
    )


SQL_TRACE_PARSER = """
SELECT doc_id,
       octet_length(unhex(md5(CAST(doc_id AS VARCHAR)))) AS id_bytes,
       lower(hex(unhex(md5(CAST(doc_id AS VARCHAR))))) AS roundtrip
FROM documents
"""


def q_geoip_enrich(spark, sf_dir):
    """geoip range enrich (processor/geoipprocessor): broadcast non-equi join
    of ip-int against interval dim — fact side never shuffles."""
    from ..operators import enrich

    base = 10 * 16777216  # 10.0.0.0
    ranges = spark.createDataFrame(
        [
            (base, base + 64 * 65536 - 1, "us-east"),
            (base + 64 * 65536, base + 128 * 65536 - 1, "eu-west"),
            (base + 128 * 65536, base + 256 * 65536 - 1, "ap-south"),
        ],
        "ip_lo long, ip_hi long, geo string",
    )
    df = _t(spark, sf_dir, "events").withColumn(
        "ip",
        F.format_string(
            "10.%s.0.%s",
            (F.col("user_id") % 256).cast("int"), (F.col("event_id") % 256).cast("int"),
        ),
    )
    out = enrich.geoip_range_lookup(df, "ip", ranges)
    return out.select("event_id", "ip", "geo")


SQL_GEOIP_ENRICH = """
WITH f AS (
  SELECT event_id,
         printf('10.%d.0.%d', user_id % 256, event_id % 256) AS ip,
         10 * 16777216 + (user_id % 256) * 65536 + (event_id % 256) AS ip_int
  FROM events
), r AS (
  SELECT * FROM (VALUES
    (CAST(10*16777216 AS BIGINT), CAST(10*16777216 + 64*65536 - 1 AS BIGINT), 'us-east'),
    (CAST(10*16777216 + 64*65536 AS BIGINT), CAST(10*16777216 + 128*65536 - 1 AS BIGINT), 'eu-west'),
    (CAST(10*16777216 + 128*65536 AS BIGINT), CAST(10*16777216 + 256*65536 - 1 AS BIGINT), 'ap-south')
  ) AS t(ip_lo, ip_hi, geo)
)
SELECT f.event_id, f.ip, r.geo
FROM f LEFT JOIN r ON f.ip_int BETWEEN r.ip_lo AND r.ip_hi
"""


def q_delta_to_rate(spark, sf_dir):
    """deltatorateprocessor: delta value / seconds since previous point per
    series (lag window)."""
    from ..operators import metrics

    df = _t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    out = metrics.delta_to_rate(df, ["user_id"], "ts", "value")
    return out.select("event_id", "user_id", F.round("rate_per_s", 6).alias("rate_per_s"))


SQL_DELTA_TO_RATE = """
WITH d AS (
  SELECT event_id, user_id, value,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS dt_us
  FROM events
)
SELECT event_id, user_id, round(value / (dt_us / 1000000.0), 6) AS rate_per_s
FROM d WHERE dt_us IS NOT NULL AND dt_us > 0
"""


def q_grok_parser(spark, sf_dir):
    """ExtractGrokPatterns (pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:
    18-120): grok → named-group regex at plan time, typed captures."""
    from ..functions.grok import grok_parser

    df = _t_par(spark, sf_dir, "events").withColumn(
        "body",
        F.format_string(
            "10.0.%s.%s GET /api/%s 200 %s",
            (F.col("user_id") % 256).cast("int"), (F.col("event_id") % 256).cast("int"),
            F.col("event_type"), F.col("event_id"),
        ),
    )
    df = grok_parser(
        df, "%{IPV4:client_ip} %{WORD:method} %{URIPATH:path} %{INT:status:int} %{INT:bytes:int}"
    )
    return df.select("event_id", "client_ip", "method", "path", "status", "bytes")


SQL_GROK_PARSER = """
SELECT event_id,
       printf('10.0.%d.%d', user_id % 256, event_id % 256) AS client_ip,
       'GET' AS method,
       printf('/api/%s', event_type) AS path,
       CAST(200 AS BIGINT) AS status,
       CAST(event_id AS BIGINT) AS bytes
FROM events
"""


def q_ottl_map_editors(spark, sf_dir):
    """OTTL map editors keep_keys + truncate_all + set-where
    (func_keep_keys.go, func_truncate_all.go, func_set.go) compiled to
    Column expressions by the OTTL frontend."""
    from ..functions.ottl import transform_processor

    df = _t_par(spark, sf_dir, "events").withColumn(
        "attributes",
        F.create_map(
            F.lit("etype"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
            F.lit("drop_me"), F.lit("zzz"),
        ),
    ).withColumn("severity_number", F.when(F.col("event_type") == "error", 17).otherwise(9))
    df = transform_processor(
        df,
        [
            'keep_keys(attributes, ["etype", "uid"])',
            "truncate_all(attributes, 4)",
            'set(attributes["alert"], "yes") where severity_number >= 17',
        ],
    )
    return df.select(
        "event_id",
        F.element_at("attributes", "etype").alias("etype_attr"),
        F.element_at("attributes", "uid").alias("uid_attr"),
        F.element_at("attributes", "drop_me").alias("dropped"),
        F.element_at("attributes", "alert").alias("alert"),
    )


SQL_OTTL_MAP_EDITORS = """
SELECT event_id,
       substr(event_type, 1, 4) AS etype_attr,
       substr(CAST(user_id AS VARCHAR), 1, 4) AS uid_attr,
       CAST(NULL AS VARCHAR) AS dropped,
       CASE WHEN event_type = 'error' THEN 'yes' END AS alert
FROM events
"""


def q_ottl_xml(spark, sf_dir):
    """OTTL XML converter family (func_parse_simplified_xml.go,
    func_remove_xml.go, func_get_xml.go, func_convert_attributes_to_
    elements_xml.go) over a synthesized XML body column; the DuckDB oracle
    reconstructs the expected strings from the underlying columns."""
    from ..functions.ottl import transform_processor

    # Python-UDF-bound stage with NO shuffle anywhere: a single small
    # parquet file would otherwise run the whole job as ONE task regardless
    # of cores. One explicit exchange buys full parallelism for the
    # per-document rewrites (the shuffle is ~2 columns × |events|, trivial
    # next to 4 XML parses/row).
    df = (
        _t(spark, sf_dir, "events")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn(
            "body",
            F.format_string(
                '<Log id="%s"><Type>%s</Type><Msg>m %s</Msg></Log>',
                F.col("user_id"), F.col("event_type"), F.col("event_id"),
            ),
        )
    )
    df = transform_processor(
        df,
        [
            "set(simplified, ParseSimplifiedXML(body))",
            'set(no_msg, RemoveXML(body, "/Log/Msg"))',
            'set(type_xml, GetXML(body, "/Log/Type"))',
            "set(attr_elems, ConvertAttributesToElementsXML(body))",
        ],
    )
    return df.select("event_id", "simplified", "no_msg", "type_xml", "attr_elems")


SQL_OTTL_XML = """
SELECT event_id,
       printf('{"Log":{"Type":"%s","Msg":"m %d"}}', event_type, event_id) AS simplified,
       printf('<Log id="%d"><Type>%s</Type></Log>', user_id, event_type) AS no_msg,
       printf('<Type>%s</Type>', event_type) AS type_xml,
       printf('<Log><Type>%s</Type><Msg>m %d</Msg><id>%d</id></Log>',
              event_type, event_id, user_id) AS attr_elems
FROM events
"""


def q_span_metrics(spark, sf_dir):
    """spanmetrics connector, BOTH histogram modes in one query
    (connector/spanmetricsconnector/config.go:43-141):

    - explicit buckets: calls count + per-bucket duration counts;
    - exponential (``histogram.exponential``): OTel base-2 buckets at
      scale=2 (bucket_idx = ceil(log2(v)*4)-1), summarized per span as
      bucket count / max index / total so the full expo output is verified.

    Joined on span_name (5 groups — broadcast-sized on both sides)."""
    df = _t(spark, sf_dir, "events").withColumn("span_name", F.col("event_type"))
    explicit = connectors.span_metrics(
        df, ["span_name"], "value", explicit_buckets=[50, 100, 200]
    )
    expo = (
        connectors.span_metrics_exponential(df, ["span_name"], "value", scale=2)
        .groupBy("span_name")
        .agg(
            F.count(F.lit(1)).alias("expo_n_buckets"),
            F.max("bucket_idx").alias("expo_max_idx"),
            F.sum("bucket_count").alias("expo_total"),
        )
    )
    return explicit.join(expo, "span_name")


SQL_SPAN_METRICS = """
WITH expo AS (
  SELECT span_name, count(*) AS expo_n_buckets,
         max(bucket_idx) AS expo_max_idx,
         CAST(sum(bucket_count) AS BIGINT) AS expo_total
  FROM (
    SELECT event_type AS span_name,
           CAST(ceil(log2(value) * 4) - 1 AS BIGINT) AS bucket_idx,
           count(*) AS bucket_count
    FROM events WHERE value > 0
    GROUP BY 1, 2
  ) GROUP BY span_name
)
SELECT e.span_name AS span_name,
       count(*) AS calls,
       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS duration_sum_cents,
       CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS le_50,
       CAST(sum(CASE WHEN value > 50 AND value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS le_100,
       CAST(sum(CASE WHEN value > 100 AND value <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS le_200,
       CAST(sum(CASE WHEN value > 200 THEN 1 ELSE 0 END) AS BIGINT) AS le_inf,
       any_value(x.expo_n_buckets) AS expo_n_buckets,
       any_value(x.expo_max_idx) AS expo_max_idx,
       any_value(x.expo_total) AS expo_total
FROM (SELECT event_type AS span_name, value FROM events) e
JOIN expo x ON e.span_name = x.span_name
GROUP BY e.span_name
"""



def q_metric_start_time(spark, sf_dir):
    """metricstarttimeprocessor true_reset_point: per-series start timestamp
    re-anchored at counter resets (value < previous)."""
    from ..operators import metrics

    df = _t(spark, sf_dir, "events")
    out = metrics.metric_start_time(df, ["user_id"], "event_id", "value")
    return out.select("event_id", "user_id", F.col("start_timestamp").alias("start_ts"))


SQL_METRIC_START_TIME = """
WITH s AS (
  SELECT event_id, user_id, value,
         CASE WHEN value < lag(value) OVER (PARTITION BY user_id ORDER BY event_id)
              THEN 1 ELSE 0 END AS reset
  FROM events
), e AS (
  SELECT event_id, user_id,
         SUM(reset) OVER (PARTITION BY user_id ORDER BY event_id) AS epoch
  FROM s
)
SELECT event_id, user_id,
       MIN(event_id) OVER (PARTITION BY user_id, epoch) AS start_ts
FROM e
"""


def q_redaction_summary(spark, sf_dir):
    """redaction processor (processor/redactionprocessor/processor.go:189-233):
    allowed-key filter + blocked-value masking, PLUS the summary attributes
    (processor.go:416-437, names :584-589) at summary=debug — the redacted
    map contents and the redaction.redacted/masked .keys/.count bookkeeping
    verified in one query."""
    df = _t_par(spark, sf_dir, "events").withColumn(
        "attributes",
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string"),
            F.lit("token"), F.concat(F.lit("tok-"), F.col("event_id")),
            F.lit("note"), F.col("event_type"),
        ),
    )
    df = processors.redaction(
        df, allowed_keys=["user", "token"],
        blocked_values=[r"^tok-\d*[02468]$"], summary="debug",
    )
    a = F.col("attributes")
    return df.select(
        "event_id",
        F.element_at(a, "user").alias("user_attr"),
        F.element_at(a, "token").alias("token_attr"),
        F.element_at(a, "note").alias("note_attr"),
        F.element_at(a, "redaction.redacted.keys").alias("red_keys"),
        F.element_at(a, "redaction.redacted.count").alias("red_count"),
        F.element_at(a, "redaction.masked.keys").alias("masked_keys"),
        F.element_at(a, "redaction.masked.count").alias("masked_count"),
    )


SQL_REDACTION_SUMMARY = """
SELECT event_id,
       CAST(user_id AS VARCHAR) AS user_attr,
       CASE WHEN event_id % 2 = 0 THEN '****' ELSE 'tok-' || event_id END AS token_attr,
       CAST(NULL AS VARCHAR) AS note_attr,
       'note' AS red_keys, '1' AS red_count,
       CASE WHEN event_id % 2 = 0 THEN 'token' END AS masked_keys,
       CASE WHEN event_id % 2 = 0 THEN '1' END AS masked_count
FROM events
"""


def q_attributes_resource_detect(spark, sf_dir):
    """attributesprocessor extract action (attraction.go:116-144) chained
    with resourcedetectionprocessor: regex named groups → new attribute
    columns + convert + upsert, then the driver-side detected resource
    merged into every row as constant columns (override=false keeps
    pre-existing values — the event_id%10 rows keep 'pre-set-host')."""
    from ..operators import enrich

    df = (
        _t_par(spark, sf_dir, "events")
        .withColumn(
            "path", F.format_string("/api/%s/%s", F.col("event_type"), F.col("event_id"))
        )
        .withColumn("host_name", F.when(F.col("event_id") % 10 == 0, "pre-set-host"))
    )
    df = processors.attributes_actions(
        df,
        [
            {"action": "extract", "key": "path",
             "pattern": r"/api/(?P<svc>\w+)/(?P<req_id>\d+)"},
            {"action": "convert", "key": "req_id", "converted_type": "bigint"},
            {"action": "upsert", "key": "env", "value": "prod"},
        ],
    )
    df = enrich.resource_detection(
        df, {"cloud_provider": "aws", "cloud_region": "us-east-1", "host_name": "detected-host"}
    )
    return df.select(
        "event_id", "svc", "req_id", "env",
        "cloud_provider", "cloud_region", "host_name",
    )


SQL_ATTRIBUTES_RESOURCE_DETECT = """
SELECT event_id, event_type AS svc, event_id AS req_id, 'prod' AS env,
       'aws' AS cloud_provider, 'us-east-1' AS cloud_region,
       CASE WHEN event_id % 10 = 0 THEN 'pre-set-host' ELSE 'detected-host' END AS host_name
FROM events
"""


def q_metrics_transform(spark, sf_dir):
    """metricstransformprocessor (rename + aggregate-across-labels, README
    operations table) AND metricsgenerationprocessor (calculate rule) on the
    events 'metric' stream, joined per metric_name."""
    from ..operators import metrics

    df = (
        _t(spark, sf_dir, "events")
        .withColumn("metric_name", F.concat(F.lit("evt."), F.col("event_type")))
        .withColumn("value", F.col("value").cast("decimal(18,2)"))  # exact agg
    )
    out = metrics.metrics_transform(
        df,
        rename={"evt.error": "evt.failure"},
        aggregate_across=["metric_name"],
        agg_type="sum",
    )
    t = out.select(
        "metric_name",
        (F.col("value") * 100).cast("bigint").alias("value_cents"),
        "points_merged",
    )

    # metricsgenerationprocessor calculate rule: utilization = value /
    # (user_id+1) per point (divide with zero-guard). IEEE754 division is
    # exactly rounded, so the > 1.0 comparison is engine-portable; the
    # per-metric over-capacity count verifies every generated point.
    g = (
        _t(spark, sf_dir, "events")
        .withColumn("metric_name", F.concat(F.lit("evt."), F.col("event_type")))
        .withColumn("capacity", (F.col("user_id") + 1).cast("double"))
    )
    g = metrics.metrics_generation(g, "utilization", "value", "capacity", "divide")
    g = metrics.metrics_transform(g, rename={"evt.error": "evt.failure"})  # rename-only path
    g2 = g.groupBy("metric_name").agg(
        F.count(F.when(F.col("utilization") > 1.0, 1)).alias("n_over_capacity")
    )
    return t.join(g2, "metric_name")


SQL_METRICS_TRANSFORM = """
SELECT CASE WHEN event_type = 'error' THEN 'evt.failure'
            ELSE 'evt.' || event_type END AS metric_name,
       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents,
       count(*) AS points_merged,
       count(CASE WHEN value / CAST(user_id + 1 AS DOUBLE) > 1.0 THEN 1 END) AS n_over_capacity
FROM events GROUP BY 1
"""


def q_load_balancing(spark, sf_dir):
    """Pipeline fan-in (unionByName of two routed streams — the collector's
    N-pipelines→one-consumer edge; folded in from the r4 fan_in_union row)
    feeding the loadbalancingexporter's consistent bucket assignment:
    md5-derived endpoint per routing key, counts per (origin, endpoint)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").withColumn("origin", F.lit("p_err"))
    b = ev.filter(F.col("value") >= 150).withColumn("origin", F.lit("p_big"))
    out = connectors.load_balancing_bucket(connectors.fan_in(a, b), "user_id", 5)
    return out.groupBy("origin", "endpoint").agg(F.count(F.lit(1)).alias("n"))


SQL_LOAD_BALANCING = """
SELECT origin,
       CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS INT) AS endpoint,
       count(*) AS n
FROM (
  SELECT 'p_err' AS origin, user_id FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT 'p_big' AS origin, user_id FROM events WHERE value >= 150
) GROUP BY 1, 2
"""


# ------------------------------------------------------------- text analysis

def q_text_quality(spark, sf_dir):
    """Quality scoring in one row (r4: extended with the Gopher rule family
    and the top-2-gram repetition measure): token counts, punctuation/alpha
    ratios, Gopher signals (mean word length, symbol ratio, alpha-word
    fraction, stopword hits, combined verdict — Rae et al. 2021 table A1)
    and the most-frequent-2-gram coverage fraction (repetition filter).
    The oracle recomputes everything from strings in DuckDB."""
    from ..operators import quality

    df = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )  # regex/HOF-bound; the single small parquet file = one task
    words = F.split(F.col("text"), r"\s+")
    base = df.select(
        "doc_id", "text",
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).alias("re_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[.,!?;]"), 0)).alias("n_punct"),
        F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).alias("n_alpha"),
        F.length("text").alias("n_chars_seen"),
    )
    g = quality.gopher_quality_signals(base)
    rep = quality.top_ngram_fraction(df, n=2).select(
        "doc_id", "top_ngram_count", "top_ngram_frac"
    )
    return g.join(rep, "doc_id").select(
        "doc_id",
        F.col("n_words").alias("ws_tokens"),
        "re_tokens", "n_punct", "n_alpha", "n_chars_seen",
        "mean_word_len", "symbol_word_ratio", "frac_alpha_words",
        "n_stop_words", "gopher_pass",
        F.col("top_ngram_count").cast("bigint").alias("top_ngram_count"),
        "top_ngram_frac",
    )


SQL_TEXT_QUALITY = r"""
WITH words AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents
),
base AS (
  SELECT doc_id, text, w, len(w) AS n_words,
         list_sum(list_transform(w, x -> length(x))) AS total_chars,
         len(regexp_extract_all(text, '#|\.\.\.|…')) AS symbols,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
         (CASE WHEN ' ' || lower(text) || ' ' LIKE '% the %' THEN 1 ELSE 0 END
        + CASE WHEN ' ' || lower(text) || ' ' LIKE '% be %' THEN 1 ELSE 0 END
        + CASE WHEN ' ' || lower(text) || ' ' LIKE '% to %' THEN 1 ELSE 0 END
        + CASE WHEN ' ' || lower(text) || ' ' LIKE '% of %' THEN 1 ELSE 0 END
        + CASE WHEN ' ' || lower(text) || ' ' LIKE '% and %' THEN 1 ELSE 0 END
        + CASE WHEN ' ' || lower(text) || ' ' LIKE '% that %' THEN 1 ELSE 0 END
        + CASE WHEN ' ' || lower(text) || ' ' LIKE '% have %' THEN 1 ELSE 0 END
        + CASE WHEN ' ' || lower(text) || ' ' LIKE '% with %' THEN 1 ELSE 0 END) AS n_stop
  FROM words
),
t2 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(lw), 2)),
                               i -> lw[i] || coalesce(' ' || lw[i+1], ''))) AS g
  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS lw FROM documents)
),
top2 AS (
  SELECT doc_id, max(c) AS top_ngram_count
  FROM (SELECT doc_id, g, count(*) AS c FROM t2 GROUP BY 1, 2) GROUP BY 1
)
SELECT b.doc_id,
       b.n_words AS ws_tokens,
       len(regexp_extract_all(b.text, '\w+|[^\w\s]')) AS re_tokens,
       len(regexp_extract_all(b.text, '[.,!?;]')) AS n_punct,
       length(regexp_replace(b.text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       length(b.text) AS n_chars_seen,
       round(b.total_chars / greatest(b.n_words, 1), 4) AS mean_word_len,
       round(b.symbols / greatest(b.n_words, 1), 4) AS symbol_word_ratio,
       round(b.alpha_words / greatest(b.n_words, 1), 4) AS frac_alpha_words,
       b.n_stop AS n_stop_words,
       (b.n_words BETWEEN 50 AND 100000
        AND round(b.total_chars / greatest(b.n_words, 1), 4) BETWEEN 3 AND 10
        AND round(b.symbols / greatest(b.n_words, 1), 4) < 0.1
        AND round(b.alpha_words / greatest(b.n_words, 1), 4) >= 0.8
        AND b.n_stop >= 2) AS gopher_pass,
       t.top_ngram_count,
       round(least(t.top_ngram_count * 2.0 / greatest(b.n_words, 1), 1.0), 4) AS top_ngram_frac
FROM base b JOIN top2 t USING (doc_id)
"""


#: planted multilingual docs for the lang_id row — the synthetic documents
#: table's text is English-vocab regardless of its `lang` label, so real
#: classification is exercised on these (recall pinned in pytest).
LANG_ID_PLANTS = [
    (1000001, "le chat est dans la maison et il regarde les oiseaux du jardin", "fr"),
    (1000002, "la porte de la cuisine est ouverte pour les invités qui arrivent", "fr"),
    (1000003, "der hund ist in dem haus und die katze schläft auf dem sofa", "de"),
    (1000004, "die kinder spielen nicht mit dem ball auf der straße", "de"),
    (1000005, "el perro está en la casa y los gatos duermen en el jardín", "es"),
    (1000006, "las ventanas de la casa se abren por la mañana para el sol", "es"),
    (1000007, "il cane è nella casa e i gatti dormono sul divano", "it"),
    (1000008, "gli studenti sono arrivati con il treno del mattino per la lezione", "it"),
    (1000009, "the dog is in the house and the cats sleep on the sofa", "en"),
    (1000010, "it was a long day for the people waiting in the station", "en"),
]


def q_lang_id(spark, sf_dir):
    """Stopword-profile language classifier over en/fr/de/es/it
    (operators/quality.py lang_id): per-language hit counts → argmax with a
    deterministic tie order, ``und`` when nothing hits. Runs over documents
    UNION planted fr/de/es/it/en docs (LANG_ID_PLANTS) and returns the
    (true lang, predicted lang) contingency counts; planted-doc recall is
    additionally pinned exact in tests/test_quality_training.py. Replaces
    the r4 english-stopword-density row, which could not distinguish
    languages at all."""
    from ..operators import quality

    df = _t_par(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    planted = spark.createDataFrame(LANG_ID_PLANTS, "doc_id long, text string, lang string")
    both = df.unionByName(planted)
    return (
        quality.lang_id_frame(both, "text", "lang_pred")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _sql_lang_id() -> str:
    from ..operators.quality import LANG_ORDER, LANG_STOPWORDS

    plants = ",\n    ".join(
        "({}, '{}', '{}')".format(i, t.replace("'", "''"), lang)
        for i, t, lang in LANG_ID_PLANTS
    )
    score_cols = ",\n         ".join(
        "len(list_filter(w, x -> list_contains({}, x))) AS s_{}".format(
            "[" + ", ".join(f"'{s}'" for s in LANG_STOPWORDS[lang]) + "]", lang
        )
        for lang in LANG_ORDER
    )
    total = " + ".join(f"s_{lang}" for lang in LANG_ORDER)
    cases = []
    for lang in LANG_ORDER:
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{o}" for o in LANG_ORDER if o != lang
        ]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_chain = "CASE WHEN " + total + " = 0 THEN 'und' " + " ".join(cases) + " ELSE 'und' END"
    return rf"""
WITH allv AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {plants}) t(doc_id, text, lang)
),
words AS (
  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS w FROM allv
),
scored AS (
  SELECT doc_id, lang,
         {score_cols}
  FROM words
)
SELECT lang, {case_chain} AS lang_pred, count(*) AS n_docs
FROM scored GROUP BY 1, 2
"""


SQL_LANG_ID = _sql_lang_id()


# ------------------------------------------------------- training-batch prep

def q_sequence_packing(spark, sf_dir):
    """Greedy fixed-length sequence packing (operators/training.py
    pack_sequences — the LLM pretraining batch shape). Tokens derive
    deterministically from documents (token i = length of word i); the row
    runs single-partition so the greedy layout is a pure function of the
    doc_id order, which makes the full output SQL-computable: greedy
    packing with chunking over a sorted stream is exactly "cut the
    concatenated token stream every L tokens", so the oracle rebuilds each
    sequence's doc coverage, real-token count, pad and token checksum from
    cumulative offsets. Multi-partition scale behavior (no shuffle, one
    padded tail per partition) is property-tested in
    tests/test_scale_properties.py."""
    from ..operators import training

    # _t_par: tokenization fans out over the cores; the repartition(1) below
    # then feeds pack_sequences, whose sortWithinPartitions(doc_id) makes the
    # greedy layout independent of the incoming partitioning/order
    df = _t_par(spark, sf_dir, "documents")
    toks = df.select(
        "doc_id",
        F.transform(
            F.split(F.col("text"), r"\s+"), lambda w: F.length(w).cast("int")
        ).alias("tokens"),
    )
    packed = training.pack_sequences(toks.repartition(1), seq_len=128)
    return packed.select(
        "seq_id",
        # pipe-joined, not the raw array: the driver's value-hash comparator
        # stringifies scalar cells only
        F.concat_ws("|", "doc_ids").alias("doc_ids"),
        "n_real_tokens",
        "n_pad",
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, b: a + b).alias("tok_sum"),
    )


SQL_SEQUENCE_PACKING = r"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '\s+'),
                        w -> CAST(length(w) AS INT)) AS tokens
  FROM documents
),
docs AS (
  SELECT doc_id, tokens,
         COALESCE(SUM(len(tokens)) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0
  FROM toks
),
pos AS (
  SELECT doc_id,
         off0 + unnest(range(1, len(tokens) + 1)) - 1 AS gpos,
         unnest(tokens) AS tok
  FROM docs
),
grouped AS (
  SELECT gpos // 128 AS k, doc_id, count(*) AS c, SUM(tok) AS ts
  FROM pos GROUP BY 1, 2
),
seqs AS (
  SELECT k, CAST(SUM(c) AS INT) AS n_real_tokens, CAST(SUM(ts) AS BIGINT) AS tok_sum,
         string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id) AS doc_ids
  FROM grouped GROUP BY k
)
SELECT '0-' || CAST(k AS VARCHAR) AS seq_id, doc_ids, n_real_tokens,
       CAST(CASE WHEN n_real_tokens < 128 THEN 128 - n_real_tokens ELSE 0 END AS INT) AS n_pad,
       tok_sum
FROM seqs
"""

#: token_mix row config — shared by the Spark query and the oracle builder
_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_MIX_BUDGET = 3000
_MIX_SEED = 42


def q_token_mix(spark, sf_dir):
    """Domain-weighted token-budget mix (operators/training.py
    stratified_token_mix) in CONTENT-KEYED deterministic mode
    (id_col="doc_id"): selection is mix40(w40(doc_id) ^ salt) <
    fraction·2^40 over the engine-portable hash, so the sampled set is a
    pure function of the data — reproducible across partitionings, cluster
    sizes and engines, which is what lets this row carry an exact DuckDB
    oracle (Spark's rand(seed) is partition-dependent, so the sampleBy mode
    can only ever get a tolerance check). Output: per-source doc and token
    totals of the mix."""
    from ..operators import training

    df = _t(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.col("text"), r"\s+"))
    )
    mixed = training.stratified_token_mix(
        df, dict(_MIX_WEIGHTS), _MIX_BUDGET, seed=_MIX_SEED, id_col="doc_id"
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens"),
    )


def _sql_token_mix() -> str:
    """The oracle recomputes the per-source fractions with the SAME IEEE
    double operation order the Python driver code uses (w/total_w, ·budget,
    /have, min 1.0, ·2^40, floor) — identical doubles, identical integer
    thresholds, identical selected set."""
    from ..functions import portable_hash as ph

    total_w = sum(_MIX_WEIGHTS.values())  # same summation order as training.py
    salt = ph.salt40(f"mix:{_MIX_SEED}")
    weights_rows = ", ".join(
        f"('{s}', {w!r})" for s, w in _MIX_WEIGHTS.items()
    )
    srcs = ", ".join(f"'{s}'" for s in _MIX_WEIGHTS)
    key = ph.mix40_sql(f"xor({ph.w40_sql('CAST(doc_id AS VARCHAR)')}, {salt})")
    return rf"""
WITH tok AS (
  SELECT doc_id, source, len(string_split_regex(text, '\s+')) AS n_tok
  FROM documents WHERE source IN ({srcs})
),
have AS (SELECT source, SUM(n_tok) AS have FROM tok GROUP BY source),
thr AS (
  SELECT have.source,
         CAST(floor(least(1.0, ({_MIX_BUDGET} * (w.w / {total_w!r})) / have.have)
                    * 1099511627776.0) AS BIGINT) AS thr
  FROM have JOIN (VALUES {weights_rows}) w(source, w) ON w.source = have.source
),
sampled AS (
  SELECT tok.source, tok.n_tok
  FROM tok JOIN thr ON thr.source = tok.source
  WHERE {key} < thr.thr
)
SELECT source, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM sampled GROUP BY source
"""


SQL_TOKEN_MIX = _sql_token_mix()


# ---------------------------------------------------------------- similarity

def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 query vector (ANN baseline).

    F.zip_with/F.aggregate keep the arithmetic JVM-side; floats widen to
    double exactly so both engines agree to ~1e-15 (rounded to 4)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qcol = F.array(*[F.lit(float(v)) for v in q])
    vec = F.transform("embedding", lambda x: x.cast("double"))
    scored = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", _cosine(vec, qcol).alias("cos_raw")
    )
    return (
        scored.orderBy(F.desc("cos_raw"), "vec_id")
        .limit(20)
        .select("vec_id", F.round("cos_raw", 4).alias("cos_sim"))
    )


SQL_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])), 4) AS cos_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])) DESC, vec_id
LIMIT 20
"""


# ---------------------------------------------- LSH rows (portable-hash oracles)

def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs, each pair annotated with BOTH
    docs' SimHash signatures and their Hamming distance (simhash merged into
    this row in r4). Runs in ``hash_fn="portable"`` mode (r5): the word /
    shingle / signature / band hashes come from the engine-portable 40-bit
    md5+mix40 family (functions/portable_hash.py), so the DuckDB oracle
    reproduces signatures, bucket membership, Jaccard estimates, and simhash
    bits EXACTLY — closing the last no_oracle correctness rows. Production
    default stays xxhash64 (JVM intrinsic); both modes share the identical
    plan shape (slim banded self-join, hot-bucket cap, verify-by-id-join)
    and are cross-checked in tests/test_dedup_similarity.py."""
    df = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )  # signature HOFs are CPU-bound; a single small file = one task
    # ONE tokenize+hash scan feeds everything: shingle hashes (-> minhash
    # signature) AND the word-hash array (-> 40-bit simhash vote) come out
    # of the same projection, and the (id, sig, sh) feature table is
    # persisted by lsh_pairs_from_signatures before its 3 downstream uses —
    # the r4 form re-ran the md5 word hashing ~4x (banding, two verify
    # sides, plus a separate simhash scan): measured 6.1s -> ~3s at sf0.1.
    # r6: the whole feature step (word md5 → shingle fold → signature minima
    # → simhash vote) runs as ONE flat-vectorized Arrow pass — the r5 chain
    # evaluated an interpreted polyfold/mix40 HOF per shingle position and a
    # 40-lambda vote per word (measured ~4.5 s of the row's 6.9 s at sf1).
    # Tokenization stays in the JVM (split/lower semantics unchanged);
    # the numpy math is bit-identical to the Column/SQL form the oracle pins
    # (equality pinned in tests/test_dedup_similarity.py).
    words = F.split(F.lower(F.col("text")), r"\s+")
    base = df.select(
        F.col("doc_id").alias("id"), words.alias("_w")
    ).withColumn(
        "_ss", dedup.portable_minhash_features_udf(k=5, num_hashes=32)(F.col("_w"))
    ).select("id", F.col("_ss.sig").alias("sig"), F.col("_ss.sh").alias("sh"))
    # r6: the simhash columns ride the verify id-joins inside
    # lsh_pairs_from_signatures (``carry``) instead of two additional
    # per-side joins here — same rows, two fewer joins. The select pins the
    # historical column order (join-key-first from the old two-join form).
    pairs = dedup.lsh_pairs_from_signatures(
        base, num_hashes=32, bands=8, jaccard_threshold=0.5, hash_fn="portable",
        carry={"sh": ("simhash_a", "simhash_b")},
    )
    return pairs.select(
        "id_b", "id_a", "jaccard_est", "simhash_a", "simhash_b",
        F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
        .cast("long")
        .alias("simhash_hamming"),
    )


def _sql_minhash_lsh() -> str:
    """DuckDB oracle mirroring q_minhash_lsh's portable-hash pipeline
    stage-for-stage (word w40 → shingle mix40(polyfold) → per-function
    mix40(h^salt) min → band mix40(polyfold) → capped bucket join →
    signature-agreement Jaccard ≥ 0.5 → 40-bit simhash + Hamming)."""
    from ..functions import portable_hash as ph
    from ..operators.dedup import minhash_salts

    k, nh, bands, maxb = 5, 32, 8, 200
    rpb = nh // bands
    shingle = ph.mix40_sql(ph.polyfold40_sql(f"wh[i+1:i+{k}]"))
    sig_exprs = ",\n         ".join(
        f"list_min(list_transform(shs, h -> (h * {a} + {b}) & {ph.MASK40}))"
        for a, b in minhash_salts(nh)
    )
    band_hash = ph.mix40_sql(ph.polyfold40_sql(f"sig[band*{rpb}+1 : band*{rpb}+{rpb}]"))
    simhash40 = (
        "list_reduce(list_concat([0::BIGINT], list_transform(range(0, 40), i -> "
        "CASE WHEN 2 * list_sum(list_transform(wh, h -> (h >> i) & 1)) > len(wh) "
        "THEN (1::BIGINT << i) ELSE 0::BIGINT END)), (a, b) -> a | b)"
    )
    return rf"""
WITH words AS (
  SELECT doc_id,
         list_transform(string_split_regex(lower(text), '\s+'),
                        w -> {ph.w40_sql('w')}) AS wh
  FROM documents
),
sh AS (
  SELECT doc_id, wh,
         list_distinct(list_transform(range(0, greatest(len(wh) - {k}, 0) + 1),
                                      i -> {shingle})) AS shs
  FROM words
),
sig AS (
  SELECT doc_id,
         [{sig_exprs}] AS sig,
         {simhash40} AS sh40
  FROM sh
),
banded AS (
  SELECT doc_id, band, {band_hash} AS bh
  FROM sig, (SELECT unnest(range(0, {bands})) AS band)
),
ok AS (SELECT band, bh FROM banded GROUP BY 1, 2 HAVING count(*) <= {maxb}),
bk AS (SELECT banded.* FROM banded JOIN ok USING (band, bh)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
est AS (
  SELECT id_a, id_b,
         list_sum(list_transform(range(1, {nh} + 1),
                  i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / {nh}.0 AS je,
         sa.sh40 AS simhash_a, sb.sh40 AS simhash_b
  FROM pairs
  JOIN sig sa ON sa.doc_id = id_a
  JOIN sig sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, round(je, 4) AS jaccard_est, simhash_a, simhash_b,
       CAST(bit_count(xor(simhash_a, simhash_b)) AS BIGINT) AS simhash_hamming
FROM est WHERE je >= 0.5
"""


SQL_MINHASH_LSH = _sql_minhash_lsh()



def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate NN (FAISS-style coarse quantizer): k-means lists +
    probe. Full probe (n_probe == n_centroids) is provably exact, so the
    brute-force DuckDB oracle holds while the query exercises the whole IVF
    machinery (bounded-sample training, centroid assignment UDF, list
    pruning). Partial-probe recall is pytest-verified."""
    from ..operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = similarity.ivf_topk(
        emb.filter(F.col("vec_id") != 0), list(q), k=20, n_centroids=8, n_probe=8
    )
    return out.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


SQL_ANN_IVF_TOPK = SQL_COSINE_TOPK


def q_ann_lsh_topk(spark, sf_dir):
    """Approximate NN: hyperplane-LSH bucket probe then exact cosine on
    candidates. Runs the DETERMINISTIC portable variant (r5): Rademacher ±1
    hyperplanes from portable_hash.rademacher and floor-quantized integer
    dot products make bucket membership bit-for-bit reproducible in the
    DuckDB oracle (integer sums are order-independent and exact in every
    engine). The numpy/BLAS ``lsh_topk`` stays the wide-signature throughput
    path; its recall vs brute force is pytest-verified in
    tests/test_dedup_similarity.py."""
    from ..operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = similarity.lsh_topk_deterministic(
        emb.filter(F.col("vec_id") != 0), list(q), k=20, bits=12, bands=4
    )
    return out.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


def _sql_ann_lsh_topk() -> str:
    """DuckDB oracle for q_ann_lsh_topk: identical Rademacher planes (same
    literals), identical floor-quantized integer dots, identical band
    compare, then exact cosine on the probed bucket members."""
    from ..functions import portable_hash as ph

    dim, bits, bands, scale = 64, 12, 4, 1_000_000
    planes = [ph.rademacher(f"annlsh:p{p}", dim) for p in range(bits)]
    sig_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> vq[i] * ({planes[p]}::BIGINT[])[i])) > 0 "
        f"THEN {1 << p}::BIGINT ELSE 0::BIGINT END)"
        for p in range(bits)
    )
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    band_conds = " OR ".join(
        f"((sig >> {b * band_bits}) & {mask}) = ((qsig >> {b * band_bits}) & {mask})"
        for b in range(bands)
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS vq
  FROM embeddings
),
sig AS (SELECT vec_id, embedding, ({sig_terms}) AS sig FROM base),
qs AS (SELECT embedding AS qe, sig AS qsig FROM sig WHERE vec_id = 0),
cand AS (
  SELECT vec_id, embedding, qe
  FROM sig, qs
  WHERE vec_id <> 0 AND ({band_conds})
)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST(qe AS DOUBLE[])), 4) AS cos_sim
FROM cand
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])) DESC,
         vec_id
LIMIT 20
"""


SQL_ANN_LSH_TOPK = _sql_ann_lsh_topk()


def q_embedding_dedup_pairs(spark, sf_dir):
    """Embedding near-duplicate pairs via LSH band join + cosine verify.

    The synthetic embeddings have no natural pairs above ~0.52 cosine, so the
    query plants deterministic exact duplicates (every 10th vector, id+10^6)
    — the dedup target the operator must recover. Identical vectors share
    every LSH band, so recall is exactly 1.0 and the brute-force DuckDB
    oracle matches the banded-join + Arrow-cosine-verify pipeline."""
    from ..operators import similarity

    # r6: no repartition — the frame is capped at ~1.1k vectors at every sf
    # (fixed-size workload), so a 32-way exchange only added stage latency;
    # the signature UDF on 1.1k rows is trivial in one task.
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    dup = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    both = emb.unionByName(dup)
    return similarity.all_pairs_above(both, threshold=0.95, bits=60, bands=4)


SQL_EMBEDDING_DEDUP_PAIRS = """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
     du AS (SELECT vec_id + 1000000 AS vec_id, embedding FROM e WHERE vec_id % 10 = 0),
     allv AS (SELECT * FROM e UNION ALL SELECT * FROM du)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
FROM allv a JOIN allv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.95
"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (AllPairs prefix-filtered
    candidate generation; r4: gained a REAL oracle — the brute-force DuckDB
    self-join on gram STRINGS finishes in <1 s at the driver's sf0.01, and
    hash-set Jaccard equals string-set Jaccard modulo negligible 64-bit
    collisions). The prefix filter's exactness is separately property-tested
    against brute force in tests/test_dedup_similarity.py."""
    df = (
        _t(spark, sf_dir, "documents")
        .limit(1500)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return dedup.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.4)


SQL_NGRAM_JACCARD = r"""
WITH words AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
tg AS (SELECT doc_id, unnest(rs) AS i, w
       FROM (SELECT doc_id, w, range(1, greatest(len(w)-2, 1)+1) AS rs FROM words)),
grams AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram FROM tg GROUP BY 1, 2),
sz AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE (inter / (sa.sz + sb.sz - inter)) >= 0.4
"""


QUERIES = {
    "regex_parser": q_regex_parser,
    "json_parser": q_json_parser,
    "keyvalue_parser": q_keyvalue_parser,
    "severity_parser": q_severity_parser,
    "time_parser": q_time_parser,
    "transform_set_where": q_transform_set_where,
    "filter_processor": q_filter_processor,
    "attributes_hash": q_attributes_hash,
    "probabilistic_sampler": q_probabilistic_sampler,
    "unroll_explode": q_unroll_explode,
    "router_first_match": q_router_first_match,
    "count_sum_connectors": q_count_sum_connectors,
    "logdedup_window": q_logdedup_window,
    "recombine_sessionize": q_recombine_sessionize,
    "enrich_broadcast_chain": q_enrich_broadcast_chain,
    "tpch_q1_pricing": q_tpch_q1_pricing,
    "cumulative_to_delta": q_cumulative_to_delta,
    "line_dedup": q_line_dedup,
    "interval_last": q_interval_last,
    "log_template_mining": q_log_template_mining,
    "group_by_trace": q_group_by_trace,
    "tail_sampling": q_tail_sampling,
    "csv_parser": q_csv_parser,
    "uri_parser": q_uri_parser,
    "syslog_parser": q_syslog_parser,
    "container_parser": q_container_parser,
    "trace_parser": q_trace_parser,
    "geoip_enrich": q_geoip_enrich,
    "delta_to_rate": q_delta_to_rate,
    "grok_parser": q_grok_parser,
    "ottl_map_editors": q_ottl_map_editors,
    "ottl_xml": q_ottl_xml,
    "span_metrics": q_span_metrics,
    "metric_start_time": q_metric_start_time,
    "redaction_summary": q_redaction_summary,
    "attributes_resource_detect": q_attributes_resource_detect,
    "metrics_transform": q_metrics_transform,
    "load_balancing": q_load_balancing,
    "exact_dedup": q_exact_dedup,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "sequence_packing": q_sequence_packing,
    "token_mix": q_token_mix,
    "cosine_topk": q_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_dedup_pairs": q_embedding_dedup_pairs,
    "minhash_lsh": q_minhash_lsh,
    "benchmark_contamination": q_benchmark_contamination,
    "ngram_jaccard": q_ngram_jaccard,
    "ann_lsh_topk": q_ann_lsh_topk,
}

ORACLES = {
    "regex_parser": SQL_REGEX_PARSER,
    "json_parser": SQL_JSON_PARSER,
    "keyvalue_parser": SQL_KEYVALUE_PARSER,
    "severity_parser": SQL_SEVERITY_PARSER,
    "time_parser": SQL_TIME_PARSER,
    "transform_set_where": SQL_TRANSFORM_SET_WHERE,
    "filter_processor": SQL_FILTER_PROCESSOR,
    "attributes_hash": SQL_ATTRIBUTES_HASH,
    "probabilistic_sampler": SQL_PROBABILISTIC_SAMPLER,
    "unroll_explode": SQL_UNROLL_EXPLODE,
    "router_first_match": SQL_ROUTER_FIRST_MATCH,
    "count_sum_connectors": SQL_COUNT_SUM_CONNECTORS,
    "logdedup_window": SQL_LOGDEDUP_WINDOW,
    "recombine_sessionize": SQL_RECOMBINE_SESSIONIZE,
    "enrich_broadcast_chain": SQL_ENRICH_BROADCAST_CHAIN,
    "tpch_q1_pricing": SQL_TPCH_Q1_PRICING,
    "cumulative_to_delta": SQL_CUMULATIVE_TO_DELTA,
    "line_dedup": SQL_LINE_DEDUP,
    "interval_last": SQL_INTERVAL_LAST,
    "log_template_mining": SQL_LOG_TEMPLATE_MINING,
    "group_by_trace": SQL_GROUP_BY_TRACE,
    "tail_sampling": SQL_TAIL_SAMPLING,
    "csv_parser": SQL_CSV_PARSER,
    "uri_parser": SQL_URI_PARSER,
    "syslog_parser": SQL_SYSLOG_PARSER,
    "container_parser": SQL_CONTAINER_PARSER,
    "trace_parser": SQL_TRACE_PARSER,
    "geoip_enrich": SQL_GEOIP_ENRICH,
    "delta_to_rate": SQL_DELTA_TO_RATE,
    "grok_parser": SQL_GROK_PARSER,
    "ottl_map_editors": SQL_OTTL_MAP_EDITORS,
    "ottl_xml": SQL_OTTL_XML,
    "span_metrics": SQL_SPAN_METRICS,
    "metric_start_time": SQL_METRIC_START_TIME,
    "redaction_summary": SQL_REDACTION_SUMMARY,
    "attributes_resource_detect": SQL_ATTRIBUTES_RESOURCE_DETECT,
    "metrics_transform": SQL_METRICS_TRANSFORM,
    "load_balancing": SQL_LOAD_BALANCING,
    "exact_dedup": SQL_EXACT_DEDUP,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "token_mix": SQL_TOKEN_MIX,
    "cosine_topk": SQL_COSINE_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "embedding_dedup_pairs": SQL_EMBEDDING_DEDUP_PAIRS,
    "benchmark_contamination": SQL_BENCHMARK_CONTAMINATION,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    # r5: minhash_lsh / ann_lsh_topk gained oracles by running in the
    # engine-portable 40-bit hash mode (functions/portable_hash.py) that
    # DuckDB SQL reproduces bit-for-bit; xxhash64 stays the production
    # default behind the hash_fn knob.
    "minhash_lsh": SQL_MINHASH_LSH,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
}
