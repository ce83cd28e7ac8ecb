"""Graph-query layer (SURVEY.md §0 / M5): the reference's documented
Cypher query surface (`oak_curriculum_graph_documentation.md` §5-6,
lines 934-1275) re-expressed as DataFrame queries over the materialized
node/edge tables.

Each Cypher MATCH pattern maps to chained equi-joins over
``resolved`` edge slices; Cypher aggregation clauses map to
``groupBy().agg()``; ``count{(uv)-[:HAS_LESSON]->(:Lesson)}`` subqueries
map to pre-aggregated edge counts joined back in. Small node dimensions
broadcast automatically (session broadcast threshold).

The DuckDB oracles re-derive every answer straight from the document
pivot — a DIFFERENT derivation path than Spark's (documents → graph
tables → join queries), so a hash match checks the whole
construction+query stack, not just the last join.

Deviation noted per the doc: Pattern 6's ``avg(size(...))`` averages
over *paths* in Cypher (a lesson matched via two paths counts twice);
both engines here average over distinct lessons — the well-defined
variant (kg53 docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import r4
from .kg import _KV_SQL, _wide, _wide_sql


def _edges(gb, config_key: str, s: str, o: str) -> DataFrame:
    """One edge slice with caller-chosen column names — slices of the
    same resolved DataFrame self-join, so every slice gets fresh,
    unambiguous column lineage via alias()."""
    return (
        gb.resolved.alias(f"e_{config_key}_{s}_{o}")
        .filter(F.col("config_key") == config_key)
        .select(F.col("subj").alias(s), F.col("obj").alias(o))
    )


# --------------------------------------------------------------------------
# kg50 — Examples 3+4 (doc :989-1016): subject → offering → unit →
# unitvariant → lesson, 4-hop traversal with predicate + ORDER BY + LIMIT
# --------------------------------------------------------------------------


def kg50_lessons_of_subject(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    subj_uo = _edges(gb, "subject_has_offering", "subject", "uo").filter(
        F.col("subject") == "maths"
    )
    uo_unit = _edges(gb, "offering_has_unit", "uo", "unit")
    unit_uv = _edges(gb, "unit_has_unitvariant", "unit", "uv")
    uv_lesson = _edges(gb, "unitvariant_has_lesson", "uv", "lesson")
    lessons = gb.nodes["Lesson"].select(
        F.col("id").alias("lesson"),
        F.col("pupilLessonOutcome").alias("outcome"),
    )
    out = (
        subj_uo.join(uo_unit, on="uo")
        .join(unit_uv, on="unit")
        .join(uv_lesson, on="uv")
        .select("unit", "uv", "lesson")
        .distinct()
        .join(lessons, on="lesson")
    )
    return out.orderBy("lesson", "uv", "unit").limit(50).select(
        "unit", "uv", "lesson", "outcome"
    )


KG50_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_subject_slug", "unit_slug", "unitvariant_id", "lesson_slug", "lesson_pupil_lesson_outcome"], "primary")},
paths AS (
  SELECT DISTINCT unit_slug AS unit, unitvariant_id AS uv,
         lesson_slug AS lesson
  FROM wide
  WHERE is_legacy = 'False' AND programme_subject_slug = 'maths'
),
outcome AS (
  SELECT lesson_slug AS lesson,
         arg_min(COALESCE(lesson_pupil_lesson_outcome, chr(0)), row_seq) AS o
  FROM wide WHERE is_legacy = 'False' AND lesson_slug IS NOT NULL
  GROUP BY lesson_slug
)
SELECT p.unit, p.uv, p.lesson, NULLIF(o.o, chr(0)) AS outcome
FROM paths p JOIN outcome o ON p.lesson = o.lesson
ORDER BY p.lesson, p.uv, p.unit
LIMIT 50
"""


# --------------------------------------------------------------------------
# kg51 — Pattern 1 (doc :1090-1103): year's curriculum per subject —
# count(DISTINCT unit) + collect(DISTINCT ...)[0..3] sample
# --------------------------------------------------------------------------


def kg51_year_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    year_uo = _edges(gb, "year_has_offering", "year", "uo")
    subj_uo = _edges(gb, "subject_has_offering", "subject", "uo")
    uo_unit = _edges(gb, "offering_has_unit", "uo", "unit")
    triple = (
        year_uo.join(subj_uo, on="uo")
        .join(uo_unit, on="uo")
        .select("year", "subject", "unit")
        .distinct()
    )
    return triple.groupBy("year", "subject").agg(
        F.countDistinct("unit").alias("unit_count"),
        F.array_join(
            F.slice(F.array_sort(F.collect_set("unit")), 1, 3), "|"
        ).alias("sample_units"),
    )


KG51_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_year_slug", "programme_subject_slug", "unit_slug"], "primary")},
triple AS (
  SELECT DISTINCT programme_year_slug AS year,
         programme_subject_slug AS subject, unit_slug AS unit
  FROM wide WHERE is_legacy = 'False'
)
SELECT year, subject,
       CAST(count(DISTINCT unit) AS BIGINT) AS unit_count,
       array_to_string(list_slice(list_sort(list(DISTINCT unit)), 1, 3), '|')
         AS sample_units
FROM triple GROUP BY year, subject
"""


# --------------------------------------------------------------------------
# kg52 — Pattern 4 (doc :1155-1170): exam-board comparison with a
# count{(uv)-[:HAS_LESSON]->(:Lesson)} subquery per variant
# --------------------------------------------------------------------------


def kg52_examboard_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    eb_prog = _edges(gb, "examboard_has_programme", "examboard", "prog")
    prog_uv = _edges(gb, "programme_has_unitvariant", "prog", "uv")
    lesson_counts = (
        _edges(gb, "unitvariant_has_lesson", "uv", "lesson")
        .groupBy("uv")
        .agg(F.count("*").alias("lesson_count"))
    )
    return (
        eb_prog.join(prog_uv, on="prog")
        .select("examboard", "uv")
        .distinct()
        .join(lesson_counts, on="uv", how="left")
        .select(
            "examboard",
            "uv",
            F.coalesce("lesson_count", F.lit(0)).alias("lesson_count"),
        )
    )


KG52_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_examboard_slug", "programme_slug_by_year", "unitvariant_id", "lesson_slug"], "primary")},
base AS (SELECT * FROM wide WHERE is_legacy = 'False'),
eb_uv AS (
  SELECT DISTINCT programme_examboard_slug AS examboard,
         unitvariant_id AS uv
  FROM base WHERE programme_examboard_slug IS NOT NULL
),
lc AS (
  SELECT unitvariant_id AS uv,
         CAST(count(DISTINCT lesson_slug) AS BIGINT) AS lesson_count
  FROM base GROUP BY unitvariant_id
)
SELECT e.examboard, e.uv, COALESCE(lc.lesson_count, 0) AS lesson_count
FROM eb_uv e LEFT JOIN lc ON e.uv = lc.uv
"""


# --------------------------------------------------------------------------
# kg53 — Pattern 6 (doc :1195-1210): curriculum coverage — units,
# lessons, avg(size(keyLearningPoints)) per subject (distinct-lesson avg)
# --------------------------------------------------------------------------


def kg53_coverage_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    subj_uo = _edges(gb, "subject_has_offering", "subject", "uo")
    uo_unit = _edges(gb, "offering_has_unit", "uo", "unit")
    unit_uv = _edges(gb, "unit_has_unitvariant", "unit", "uv")
    uv_lesson = _edges(gb, "unitvariant_has_lesson", "uv", "lesson")
    klp = gb.nodes["Lesson"].select(
        F.col("id").alias("lesson"),
        F.size("keyLearningPoints").alias("klp_n"),
    )
    paths = (
        subj_uo.join(uo_unit, on="uo")
        .join(unit_uv, on="unit")
        .join(uv_lesson, on="uv")
        .select("subject", "unit", "lesson")
        .distinct()
    )
    per_lesson = paths.select("subject", "unit", "lesson").join(klp, on="lesson")
    return per_lesson.groupBy("subject").agg(
        F.countDistinct("unit").alias("units"),
        F.countDistinct("lesson").alias("lessons"),
        r4(F.avg(F.col("klp_n"))).alias("avg_klp"),
    )


KG53_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_subject_slug", "unit_slug", "lesson_slug", "lesson_key_learning_points"], "primary")},
base AS (SELECT * FROM wide WHERE is_legacy = 'False'),
klp AS (
  SELECT lesson_slug AS lesson,
         CAST(len(json_transform(arg_min(lesson_key_learning_points, row_seq),
                                 '["JSON"]')) AS INT) AS klp_n
  FROM base WHERE lesson_slug IS NOT NULL GROUP BY lesson_slug
),
paths AS (
  SELECT DISTINCT programme_subject_slug AS subject, unit_slug AS unit,
         lesson_slug AS lesson
  FROM base
)
SELECT p.subject,
       CAST(count(DISTINCT p.unit) AS BIGINT) AS units,
       CAST(count(DISTINCT p.lesson) AS BIGINT) AS lessons,
       round(avg(k.klp_n), 4) AS avg_klp
FROM paths p JOIN klp k ON p.lesson = k.lesson
GROUP BY p.subject
"""


# --------------------------------------------------------------------------
# kg54 — Pattern 7 (doc :1216-1230): content gaps — grouped count with a
# post-aggregation HAVING predicate
# --------------------------------------------------------------------------


def kg54_content_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    year_uo = _edges(gb, "year_has_offering", "year", "uo")
    subj_uo = _edges(gb, "subject_has_offering", "subject", "uo")
    uo_unit = _edges(gb, "offering_has_unit", "uo", "unit")
    triple = (
        year_uo.join(subj_uo, on="uo")
        .join(uo_unit, on="uo")
        .select("year", "subject", "unit")
        .distinct()
    )
    return (
        triple.groupBy("year", "subject")
        .agg(F.countDistinct("unit").alias("unit_count"))
        .filter(F.col("unit_count") < 5)
    )


KG54_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_year_slug", "programme_subject_slug", "unit_slug"], "primary")},
triple AS (
  SELECT DISTINCT programme_year_slug AS year,
         programme_subject_slug AS subject, unit_slug AS unit
  FROM wide WHERE is_legacy = 'False'
)
SELECT year, subject, CAST(count(DISTINCT unit) AS BIGINT) AS unit_count
FROM triple GROUP BY year, subject HAVING count(DISTINCT unit) < 5
"""


# --------------------------------------------------------------------------
# kg55 — Pattern 8 (doc :1236-1252): lesson complexity —
# size() arithmetic over three list properties of the Lesson node
# --------------------------------------------------------------------------


def kg55_lesson_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    lessons = gb.nodes["Lesson"]
    kw = F.coalesce(F.size("keywords"), F.lit(0))
    klp = F.coalesce(F.size("keyLearningPoints"), F.lit(0))
    mis = F.coalesce(F.size("misconceptionsMistakes"), F.lit(0))
    return lessons.select(
        F.col("id").alias("lesson"),
        kw.alias("kw_n"),
        klp.alias("klp_n"),
        mis.alias("mis_n"),
        (kw + klp + mis).alias("complexity"),
    )


KG55_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "lesson_slug", "lesson_keywords", "lesson_key_learning_points", "lesson_misconceptions_and_common_mistakes"], "primary")},
base AS (SELECT * FROM wide WHERE is_legacy = 'False'),
props AS (
  SELECT lesson_slug AS lesson,
         arg_min(COALESCE(lesson_keywords, chr(0)), row_seq) AS kw,
         arg_min(COALESCE(lesson_key_learning_points, chr(0)), row_seq) AS klp,
         arg_min(COALESCE(lesson_misconceptions_and_common_mistakes, chr(0)),
                 row_seq) AS mis
  FROM base WHERE lesson_slug IS NOT NULL GROUP BY lesson_slug
),
sizes AS (
  SELECT lesson,
         CASE WHEN kw = chr(0) THEN 0 ELSE CAST(len(json_transform(
           CASE WHEN kw LIKE '[''%' THEN replace(kw, chr(39), chr(34)) ELSE kw END,
           '["JSON"]')) AS INT) END AS kw_n,
         CASE WHEN klp = chr(0) THEN 0 ELSE
           CAST(len(json_transform(klp, '["JSON"]')) AS INT) END AS klp_n,
         CASE WHEN mis = chr(0) THEN 0 ELSE
           CAST(len(json_transform(mis, '["JSON"]')) AS INT) END AS mis_n
  FROM props
)
SELECT lesson, kw_n, klp_n, mis_n,
       (kw_n + klp_n + mis_n) AS complexity
FROM sizes
"""


# --------------------------------------------------------------------------
# kg56 — Example 6 (doc :1046-1056): list-property predicate —
# any(keyword IN lesson.keywords WHERE keyword CONTAINS 'x') + slice
# --------------------------------------------------------------------------


def kg56_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    lessons = gb.nodes["Lesson"]
    return (
        lessons.filter(
            F.exists(F.col("keywords"), lambda k: k.contains("kw-english"))
        )
        .select(
            F.col("id").alias("lesson"),
            F.array_join(F.slice("keywords", 1, 2), "|").alias("sample_keywords"),
        )
    )


KG56_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "lesson_slug", "lesson_keywords"], "primary")},
props AS (
  SELECT lesson_slug AS lesson,
         arg_min(COALESCE(lesson_keywords, chr(0)), row_seq) AS kw
  FROM wide WHERE is_legacy = 'False' AND lesson_slug IS NOT NULL
  GROUP BY lesson_slug
),
parsed AS (
  SELECT lesson,
         json_transform(
           CASE WHEN kw LIKE '[''%' THEN replace(kw, chr(39), chr(34)) ELSE kw END,
           '["VARCHAR"]') AS kws
  FROM props WHERE kw <> chr(0)
)
SELECT lesson,
       array_to_string(list_slice(kws, 1, 2), '|') AS sample_keywords
FROM parsed
WHERE len(list_filter(kws, k -> k LIKE '%kw-english%')) > 0
"""


# --------------------------------------------------------------------------
# kg57 — Example 2 (doc :964-985): the subject directory — every Subject
# node's title/description/parent, with displayOrder as the sort key
# --------------------------------------------------------------------------


def _strip_quotes_sql(x: str) -> str:
    """DuckDB twin of the engine's surrounding-quote strip
    (pyoracle._strip_quotes / schema_mapper string clean)."""
    return (
        f"CASE WHEN length({x}) >= 2 AND substr({x},1,1) = substr({x},-1,1) "
        f"AND substr({x},1,1) IN (chr(39), chr(34)) "
        f"THEN substr({x}, 2, length({x})-2) ELSE {x} END"
    )


def _unescape_sql(x: str) -> str:
    """DuckDB twin of the ``\\uXXXX`` unescape (pyoracle._unescape) via
    the JSON string decoder, guarded to strings whose backslashes are
    ALL well-formed ``\\uXXXX`` escapes and that carry no double quote —
    exactly the shapes the curriculum value space produces (docgen
    §7.4); mixed-escape strings fall through unchanged."""
    cond = (
        f"contains({x}, '\\u') AND NOT contains({x}, '\"') "
        f"AND regexp_matches({x}, '^(\\\\u[0-9a-fA-F]{{4}}|[^\\\\])*$')"
    )
    return (
        f"CASE WHEN {cond} THEN "
        f"coalesce(json_extract_string('\"' || {x} || '\"', '$'), {x}) "
        f"ELSE {x} END"
    )


def _clean_str_sql(x: str) -> str:
    """strip-quotes → unescape, the string clean_typed twin."""
    return _unescape_sql(f"({_strip_quotes_sql(x)})")


def kg57_subject_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    return gb.nodes["Subject"].select(
        F.col("subjectTitle").alias("subject"),
        F.col("subjectDescription").alias("description"),
        F.col("subjectParentTitle").alias("parent_subject"),
        F.col("displayOrder").alias("display_order"),
    )


KG57_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_subject_slug", "programme_subject",
            "programme_subject_description", "programme_subject_parent",
            "programme_subject_display_order"], "primary")},
firstseen AS (
  SELECT NULLIF(arg_min(COALESCE(programme_subject, chr(0)), row_seq), chr(0))
           AS subject,
         NULLIF(arg_min(COALESCE(programme_subject_description, chr(0)),
                        row_seq), chr(0)) AS description,
         NULLIF(arg_min(COALESCE(programme_subject_parent, chr(0)), row_seq),
                chr(0)) AS parent_subject,
         CAST(CAST(NULLIF(arg_min(COALESCE(programme_subject_display_order,
                                           chr(0)), row_seq), chr(0))
              AS DOUBLE) AS BIGINT) AS display_order
  FROM wide
  WHERE is_legacy = 'False' AND programme_subject_slug IS NOT NULL
    AND trim(programme_subject_slug) <> ''
    AND lower(trim(programme_subject_slug)) NOT IN ('nan', 'null', 'none')
  GROUP BY programme_subject_slug
)
SELECT {_clean_str_sql('subject')} AS subject,
       {_clean_str_sql('description')} AS description,
       {_clean_str_sql('parent_subject')} AS parent_subject,
       display_order
FROM firstseen
"""


# --------------------------------------------------------------------------
# kg58 — Example 5 (doc :1020-1044): years of a key stage —
# (ks)-[:HAS_YEAR]->(year) with the Year node's title/description
# --------------------------------------------------------------------------


def kg58_keystage_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    ks_year = _edges(gb, "keystage_has_year", "ks", "year").filter(
        F.col("ks") == "ks4"
    )
    years = gb.nodes["Year"].select(
        F.col("id").alias("year"),
        F.col("yearTitle").alias("year_title"),
        F.col("yearDescription").alias("year_description"),
    )
    return ks_year.join(years, on="year").select(
        "year", "year_title", "year_description"
    )


KG58_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_keystage_slug", "programme_year_slug",
            "programme_year", "programme_year_description"], "primary")},
edge AS (
  SELECT DISTINCT programme_year_slug AS year
  FROM wide
  WHERE is_legacy = 'False' AND programme_keystage_slug = 'ks4'
    AND programme_year_slug IS NOT NULL AND trim(programme_year_slug) <> ''
),
props AS (
  SELECT programme_year_slug AS year,
         arg_min(COALESCE(programme_year, chr(0)), row_seq) AS t,
         arg_min(COALESCE(programme_year_description, chr(0)), row_seq) AS d
  FROM wide
  WHERE is_legacy = 'False' AND programme_year_slug IS NOT NULL
    AND trim(programme_year_slug) <> ''
    AND lower(trim(programme_year_slug)) NOT IN ('nan', 'null', 'none')
  GROUP BY programme_year_slug
)
SELECT e.year, NULLIF(p.t, chr(0)) AS year_title,
       NULLIF(p.d, chr(0)) AS year_description
FROM edge e JOIN props p USING (year)
"""


# --------------------------------------------------------------------------
# kg59 — Pattern 2 (doc :1110-1131): navigate the unit hierarchy —
# subject → offering → unit → variant → lesson with a unit predicate,
# count(lesson) + collect(...)[0..3] per variant, and the variant's
# optionTitle node property joined back in. (The doc's sample collects
# lesson titles; ids are collected here — same clause shape, and the
# title property surface is covered by kg63.)
# --------------------------------------------------------------------------


def kg59_unit_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    subj_uo = _edges(gb, "subject_has_offering", "subject", "uo").filter(
        F.col("subject") == "maths"
    )
    uo_unit = _edges(gb, "offering_has_unit", "uo", "unit").filter(
        F.col("unit").startswith("unit-maths-00")
    )
    unit_uv = _edges(gb, "unit_has_unitvariant", "unit", "uv")
    uv_lesson = _edges(gb, "unitvariant_has_lesson", "uv", "lesson")
    variants = gb.nodes["Unitvariant"].select(
        F.col("id").alias("uv"), F.col("optionTitle").alias("variant_option")
    )
    paths = (
        subj_uo.join(uo_unit, on="uo")
        .join(unit_uv, on="unit")
        .join(uv_lesson, on="uv")
        .select("subject", "unit", "uv", "lesson")
        .distinct()
    )
    return (
        paths.groupBy("subject", "unit", "uv")
        .agg(
            F.countDistinct("lesson").alias("lesson_count"),
            F.array_join(
                F.slice(F.array_sort(F.collect_set("lesson")), 1, 3), "|"
            ).alias("sample_lessons"),
        )
        .join(variants, on="uv", how="left")
        .select(
            "subject", "unit", "uv", "variant_option",
            "lesson_count", "sample_lessons",
        )
    )


KG59_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "programme_subject_slug", "unit_slug", "unitvariant_id", "lesson_slug", "programme_optionality"], "primary")},
base AS (SELECT * FROM wide WHERE is_legacy = 'False'),
paths AS (
  SELECT DISTINCT programme_subject_slug AS subject, unit_slug AS unit,
         unitvariant_id AS uv, lesson_slug AS lesson
  FROM base
  WHERE programme_subject_slug = 'maths' AND unit_slug LIKE 'unit-maths-00%'
),
vopt AS (
  SELECT unitvariant_id AS uv,
         NULLIF(arg_min(COALESCE(programme_optionality, chr(0)), row_seq),
                chr(0)) AS variant_option
  FROM base WHERE unitvariant_id IS NOT NULL
  GROUP BY unitvariant_id
),
agg AS (
  SELECT subject, unit, uv,
         CAST(count(DISTINCT lesson) AS BIGINT) AS lesson_count,
         array_to_string(list_slice(list_sort(list(DISTINCT lesson)), 1, 3),
                         '|') AS sample_lessons
  FROM paths GROUP BY subject, unit, uv
)
SELECT a.subject, a.unit, a.uv, v.variant_option, a.lesson_count,
       a.sample_lessons
FROM agg a LEFT JOIN vopt v ON a.uv = v.uv
"""


# --------------------------------------------------------------------------
# kg60 — Pattern 3 (doc :1133-1149): prerequisites for a unit — the
# Unit node's list-typed priorKnowledge plus whyThisWhyNow rationale
# --------------------------------------------------------------------------


def kg60_unit_prerequisites(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    return gb.nodes["Unit"].select(
        F.col("id").alias("unit"),
        F.col("unitTitle").alias("unit_title"),
        F.array_join(F.col("priorKnowledge"), "|").alias("prerequisites"),
        F.col("whyThisWhyNow").alias("rationale"),
    )


KG60_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "unit_slug", "unit_title", "unit_prior_knowledge_requirements", "unit_why_this_why_now"], "primary")},
props AS (
  SELECT unit_slug AS unit,
         NULLIF(arg_min(COALESCE(unit_title, chr(0)), row_seq), chr(0)) AS t,
         arg_min(COALESCE(unit_prior_knowledge_requirements, chr(0)),
                 row_seq) AS pk,
         NULLIF(arg_min(COALESCE(unit_why_this_why_now, chr(0)), row_seq),
                chr(0)) AS why
  FROM wide
  WHERE is_legacy = 'False' AND unit_slug IS NOT NULL
    AND trim(unit_slug) <> ''
    AND lower(trim(unit_slug)) NOT IN ('nan', 'null', 'none')
  GROUP BY unit_slug
)
SELECT unit,
       {_clean_str_sql('t')} AS unit_title,
       CASE WHEN pk = chr(0) THEN NULL
            -- empty markers ('', '[]', '{{}}') are omitted properties
            -- (reference _is_empty_value, schema_mapper.py:573-592)
            WHEN trim(pk) = '' OR regexp_matches(trim(pk),
                 '^(\\[[ \t\n\r]*\\]|\\{{[ \t\n\r]*\\}})$') THEN NULL
            WHEN pk NOT LIKE '[%' THEN pk
            ELSE array_to_string(list_filter(
                   json_transform(pk, '["VARCHAR"]'), x -> x <> ''), '|')
       END AS prerequisites,
       why AS rationale
FROM props
"""


# --------------------------------------------------------------------------
# kg61 — Pattern 5 (doc :1173-1190): thematic connections — threads
# whose title matches a substring, with their distinct related units
# (unit ids collected; title predicate on the Thread node property),
# ORDER BY unitCount DESC LIMIT 5 with a deterministic id tie-break
# --------------------------------------------------------------------------


def kg61_thematic_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    unit_thread = _edges(gb, "unit_has_thread", "unit", "thread")
    titles = (
        gb.nodes["Thread"]
        .select(F.col("id").alias("thread"), F.col("threadTitle").alias("theme"))
        .filter(F.col("theme").contains("1"))
    )
    return (
        unit_thread.join(titles, on="thread")
        .groupBy("thread", "theme")
        .agg(
            F.array_join(F.array_sort(F.collect_set("unit")), "|").alias(
                "related_units"
            ),
            F.countDistinct("unit").alias("unit_count"),
        )
        .orderBy(F.desc("unit_count"), "thread")
        .limit(5)
    )


#: the supplementary-side CTE chain shared by the thread-edge oracles —
#: (unit, thread) pairs that survive the composite join, with per-pair
#: thread title (titles are functionally dependent on the slug)
_THREAD_PAIRS_SQL = """
prim_x AS (
  SELECT unit_slug,
         unnest(CASE WHEN programme_slug_by_year LIKE '[%'
                     THEN json_transform(programme_slug_by_year, '["VARCHAR"]')
                     ELSE [programme_slug_by_year] END) AS psby
  FROM wide WHERE is_legacy = 'False'
),
supw AS (
  SELECT doc_id,
         MAX(CASE WHEN k = 'unit_slug' THEN v END) AS unit_slug,
         MAX(CASE WHEN k = 'programme_slug_by_year' THEN v END) AS psby_raw,
         MAX(CASE WHEN k = 'threads' THEN v END) AS threads
  FROM kv GROUP BY doc_id
  HAVING MAX(CASE WHEN k = '_mv' THEN v END) = 'supplementary'
),
sup_x AS (
  SELECT COALESCE(NULLIF(regexp_extract(unit_slug, '^(.+)-[0-9]+$', 1), ''),
                  unit_slug) AS unit_slug,
         unnest(CASE WHEN psby_raw LIKE '[%'
                     THEN json_transform(psby_raw, '["VARCHAR"]')
                     ELSE [psby_raw] END) AS psby,
         threads
  FROM supw
),
matched AS (
  SELECT DISTINCT p.unit_slug AS unit, s.threads AS threads
  FROM sup_x s JOIN prim_x p ON s.unit_slug = p.unit_slug AND s.psby = p.psby
  WHERE s.threads IS NOT NULL AND s.threads LIKE '[%' AND s.threads <> '[]'
),
items AS (
  SELECT unit, unnest(json_transform(replace(threads, chr(39), chr(34)),
    '[{"thread_slug":"VARCHAR","thread_id":"BIGINT","thread_title":"VARCHAR"}]'))
    AS it
  FROM matched
),
pairs AS (
  SELECT DISTINCT unit, it.thread_slug AS thread, it.thread_title AS title
  FROM items
  WHERE it.thread_slug IS NOT NULL AND trim(it.thread_slug) <> ''
)
"""


KG61_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "unit_slug", "programme_slug_by_year"], "primary")},
{_THREAD_PAIRS_SQL}
SELECT thread, title AS theme,
       array_to_string(list_sort(list(DISTINCT unit)), '|') AS related_units,
       CAST(count(DISTINCT unit) AS BIGINT) AS unit_count
FROM pairs WHERE title LIKE '%1%'
GROUP BY thread, title
ORDER BY unit_count DESC, thread
LIMIT 5
"""


# --------------------------------------------------------------------------
# kg62 — Pattern 9 (doc :1257-1275): cross-curricular opportunities —
# threads spanning >1 subject via thread ← unit ← offering ← subject,
# WITH collect(DISTINCT subject) + size() filter, top-10 by span
# --------------------------------------------------------------------------


def kg62_cross_curricular(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    unit_thread = _edges(gb, "unit_has_thread", "unit", "thread")
    uo_unit = _edges(gb, "offering_has_unit", "uo", "unit")
    subj_uo = _edges(gb, "subject_has_offering", "subject", "uo")
    triple = (
        unit_thread.join(uo_unit, on="unit")
        .join(subj_uo, on="uo")
        .select("thread", "subject")
        .distinct()
    )
    return (
        triple.groupBy("thread")
        .agg(
            F.array_join(F.array_sort(F.collect_set("subject")), "|").alias(
                "subjects"
            ),
            F.countDistinct("subject").alias("subject_count"),
        )
        .filter(F.col("subject_count") > 1)
        .orderBy(F.desc("subject_count"), "thread")
        .limit(10)
    )


KG62_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "unit_slug", "programme_slug_by_year", "programme_subject_slug"], "primary")},
{_THREAD_PAIRS_SQL},
us AS (
  SELECT DISTINCT unit_slug AS unit, programme_subject_slug AS subject
  FROM wide WHERE is_legacy = 'False'
),
ts AS (
  SELECT DISTINCT p.thread, u.subject
  FROM pairs p JOIN us u ON p.unit = u.unit
)
SELECT thread,
       array_to_string(list_sort(list(DISTINCT subject)), '|') AS subjects,
       CAST(count(DISTINCT subject) AS BIGINT) AS subject_count
FROM ts GROUP BY thread HAVING count(DISTINCT subject) > 1
ORDER BY subject_count DESC, thread
LIMIT 10
"""


# --------------------------------------------------------------------------
# kg63 — Example 7 (doc :1069-1085): complete lesson details — the
# Lesson node's full property surface (title with quote-strip/unescape
# clean, outcome, keywords list, and the three object-list sizes) for a
# deterministic slug subset standing in for the doc's pinned slug
# --------------------------------------------------------------------------


def kg63_lesson_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    return (
        gb.nodes["Lesson"]
        .filter(F.col("id").endswith("00"))
        .select(
            F.col("id").alias("lesson"),
            F.col("lessonTitle").alias("title"),
            F.col("pupilLessonOutcome").alias("outcome"),
            F.array_join(F.col("keywords"), "|").alias("keywords"),
            F.coalesce(F.size("keyLearningPoints"), F.lit(0)).alias("klp_n"),
            F.coalesce(F.size("misconceptionsMistakes"), F.lit(0)).alias(
                "mis_n"
            ),
            F.coalesce(F.size("equipmentResources"), F.lit(0)).alias(
                "equip_n"
            ),
        )
    )


KG63_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "lesson_slug", "lesson_title", "lesson_pupil_lesson_outcome", "lesson_keywords", "lesson_key_learning_points", "lesson_misconceptions_and_common_mistakes", "lesson_equipment_and_resources"], "primary")},
props AS (
  SELECT lesson_slug AS lesson,
         NULLIF(arg_min(COALESCE(lesson_title, chr(0)), row_seq), chr(0)) AS t,
         NULLIF(arg_min(COALESCE(lesson_pupil_lesson_outcome, chr(0)),
                        row_seq), chr(0)) AS o,
         arg_min(COALESCE(lesson_keywords, chr(0)), row_seq) AS kw,
         arg_min(COALESCE(lesson_key_learning_points, chr(0)), row_seq) AS klp,
         arg_min(COALESCE(lesson_misconceptions_and_common_mistakes, chr(0)),
                 row_seq) AS mis,
         arg_min(COALESCE(lesson_equipment_and_resources, chr(0)), row_seq)
           AS eq
  FROM wide
  WHERE is_legacy = 'False' AND lesson_slug IS NOT NULL
    AND trim(lesson_slug) <> ''
    AND lower(trim(lesson_slug)) NOT IN ('nan', 'null', 'none')
  GROUP BY lesson_slug
)
SELECT lesson,
       {_clean_str_sql('t')} AS title,
       o AS outcome,
       CASE WHEN kw = chr(0) THEN NULL
            ELSE array_to_string(list_filter(json_transform(
                   CASE WHEN kw LIKE '[''%' THEN replace(kw, chr(39), chr(34))
                        ELSE kw END, '["VARCHAR"]'), x -> x <> ''), '|')
       END AS keywords,
       CASE WHEN klp = chr(0) THEN 0
            ELSE CAST(len(json_transform(klp, '["JSON"]')) AS INT) END AS klp_n,
       CASE WHEN mis = chr(0) THEN 0
            ELSE CAST(len(json_transform(mis, '["JSON"]')) AS INT) END AS mis_n,
       CASE WHEN eq = chr(0) THEN 0
            ELSE CAST(len(json_transform(eq, '["JSON"]')) AS INT) END AS equip_n
FROM props WHERE lesson LIKE '%00'
"""


QUERIES = {
    "kg50_lessons_of_subject": kg50_lessons_of_subject,
    "kg51_year_curriculum": kg51_year_curriculum,
    "kg52_examboard_comparison": kg52_examboard_comparison,
    "kg53_coverage_analysis": kg53_coverage_analysis,
    "kg54_content_gaps": kg54_content_gaps,
    "kg55_lesson_complexity": kg55_lesson_complexity,
    "kg56_keyword_search": kg56_keyword_search,
    "kg57_subject_directory": kg57_subject_directory,
    "kg58_keystage_years": kg58_keystage_years,
    "kg59_unit_hierarchy": kg59_unit_hierarchy,
    "kg60_unit_prerequisites": kg60_unit_prerequisites,
    "kg61_thematic_connections": kg61_thematic_connections,
    "kg62_cross_curricular": kg62_cross_curricular,
    "kg63_lesson_details": kg63_lesson_details,
}

ORACLES = {
    "kg50_lessons_of_subject": KG50_SQL,
    "kg51_year_curriculum": KG51_SQL,
    "kg52_examboard_comparison": KG52_SQL,
    "kg53_coverage_analysis": KG53_SQL,
    "kg54_content_gaps": KG54_SQL,
    "kg55_lesson_complexity": KG55_SQL,
    "kg56_keyword_search": KG56_SQL,
    "kg57_subject_directory": KG57_SQL,
    "kg58_keystage_years": KG58_SQL,
    "kg59_unit_hierarchy": KG59_SQL,
    "kg60_unit_prerequisites": KG60_SQL,
    "kg61_thematic_connections": KG61_SQL,
    "kg62_cross_curricular": KG62_SQL,
    "kg63_lesson_details": KG63_SQL,
}
