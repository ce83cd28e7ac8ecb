"""Deterministic synthetic corpus: curriculum records → interleaved documents.

Per ``BASELINE.json.input_hint`` the engine's only external input is a table

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Each document encodes one curriculum record — a row of the reference's
consolidated wide table (`hasura_extractor.py:249-258`) — as an ordered
span sequence (FIXTURES.md §1): ``kind='field'`` spans carry
``"<name>=<value>"``; ``kind='json'`` spans carry JSON payload fields;
``kind='text'`` spans carry prose fields; ``kind='media'`` spans carry an
``asset://`` ref in ``media_ref``. Primary-MV records and supplementary-MV
records (the join side, config `...alpha.json:128-133`) live in the same
table, discriminated by a leading ``_mv=primary|supplementary`` field span.

Everything is seeded (seed=42) and pure-Python so the golden oracle
(`oracle/pyoracle.py`) can replay the reference's mapping semantics over
the *same* records and pin the Spark pipeline to exact triple equality.

The synthetic universe bakes in every edge case from FIXTURES.md §7:
``-<digits>`` slug suffixes, multi-element ``programme_slug_by_year``
arrays, py-literal single-quoted arrays, ``\\uXXXX`` escapes, surrounding
quotes, empty markers, first-seen ID collisions, ``"104.0"``-style ints,
null optionality, ``is_legacy`` filter rows, empty/malformed threads.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from ..config.curriculum_schema import (
    MEDIA_SPAN_COLUMNS,
    PRIMARY_COLUMNS,
    SUPPLEMENTARY_COLUMNS,
    JSON_SPAN_COLUMNS,
    TEXT_SPAN_COLUMNS,
)

SEED = 42

SUBJECTS = [
    ("maths", "Maths", 1),
    ("english", "English", 2),
    ("science", "Science", 3),
    ("history", "History", 4),
    ("geography", "Geography", 5),
    ("spanish", "Espa\\u00f1ol", 6),  # exercises \uXXXX unescape (FIXTURES §7.4)
    ("music", "'Music'", 7),  # exercises surrounding-quote strip (§7.5)
    ("computing", "Computing", 8),
]
PHASES = [("primary", "Primary", 1), ("secondary", "Secondary", 2)]
KEYSTAGES = [
    ("ks1", "Key Stage 1", 1, "primary"),
    ("ks2", "Key Stage 2", 2, "primary"),
    ("ks3", "Key Stage 3", 3, "secondary"),
    ("ks4", "Key Stage 4", 4, "secondary"),
]
YEARS = [
    ("year-1", "Year 1", 1, "ks1"),
    ("year-2", "Year 2", 2, "ks1"),
    ("year-3", "Year 3", 3, "ks2"),
    ("year-4", "Year 4", 4, "ks2"),
    ("year-5", "Year 5", 5, "ks2"),
    ("year-6", "Year 6", 6, "ks2"),
    ("year-7", "Year 7", 7, "ks3"),
    ("year-8", "Year 8", 8, "ks3"),
    ("year-9", "Year 9", 9, "ks3"),
    ("year-10", "Year 10", 10, "ks4"),
    ("year-11", "Year 11", 11, "ks4"),
]
TIERS = [("foundation", "Foundation", 1), ("higher", "Higher", 2)]
EXAMBOARDS = [
    ("aqa", "AQA", 1),
    ("edexcel", "Edexcel", 2),
    ("ocr", "OCR", 3),
    ("wjec", "WJEC", 4),
    ("eduqas", "Eduqas", 5),
]


@dataclass
class Universe:
    """The deterministic synthetic curriculum world."""

    primary: list[dict[str, Any]] = field(default_factory=list)
    supplementary: list[dict[str, Any]] = field(default_factory=list)
    n_docs: int = 0
    seed: int = SEED


def _mk_threads(rng: random.Random, unit_i: int, n_threads_pool: int) -> str | None:
    """Threads JSON / py-literal payload for a supplementary row.

    Mix of dialects + malformed items, per schema_mapper.py:680-717.
    """
    roll = rng.random()
    if roll < 0.10:
        return None  # null threads → skipped (pd.isna, :676)
    if roll < 0.18:
        return "[]"  # empty array → no nodes, and empty-marker semantics
    k = rng.randint(1, 3)
    items = []
    for j in range(k):
        t = (unit_i * 7 + j * 13) % n_threads_pool
        item = {
            "thread_slug": f"thread-{t:03d}",
            "thread_id": t + 1,
            "thread_title": f"Thread {t:03d} title",
        }
        if rng.random() < 0.06:
            item.pop("thread_slug")  # id_key missing → item skipped (:707-711)
        items.append(item)
    if rng.random() < 0.30:
        # py-literal single-quote dialect → ast.literal_eval path (:686-687)
        return repr(items)
    import json

    return json.dumps(items)


def make_universe(n_docs: int, seed: int = SEED) -> Universe:
    """Build ``n_docs`` primary records + the supplementary join side."""
    rng = random.Random(seed)
    uni = Universe(n_docs=n_docs, seed=seed)

    n_units = max(6, n_docs // 12)
    n_threads_pool = max(5, n_units // 3)

    # --- units ---------------------------------------------------------
    units = []
    for i in range(n_units):
        subj = SUBJECTS[i % len(SUBJECTS)]
        year = YEARS[i % len(YEARS)]
        ks_slug = year[3]
        ks = next(k for k in KEYSTAGES if k[0] == ks_slug)
        phase = next(p for p in PHASES if p[0] == ks[3])
        tier = TIERS[i % 3] if (ks_slug == "ks4" and i % 3 < 2) else None
        board = EXAMBOARDS[i % 7] if (ks_slug == "ks4" and i % 7 < 5) else None
        psby = f"{subj[0]}-{phase[0]}-{ks[0]}-{year[0]}"
        if tier:
            psby += f"-{tier[0]}"
        if board:
            psby += f"-{board[0]}"
        units.append(
            {
                "i": i,
                "slug": f"unit-{subj[0]}-{i:04d}",
                "subject": subj,
                "year": year,
                "ks": ks,
                "phase": phase,
                "tier": tier,
                "board": board,
                "psby": psby,
            }
        )

    # --- primary (lesson-level) records ---------------------------------
    for d in range(n_docs):
        u = units[d % n_units]
        subj, year, ks, phase, tier, board = (
            u["subject"],
            u["year"],
            u["ks"],
            u["phase"],
            u["tier"],
            u["board"],
        )
        uv_id = 1000 + u["i"] * 4 + (d // n_units) % 3
        lesson_i = d
        # ~2% duplicate lesson slugs with DIFFERENT titles → first-seen-wins
        # dedup is observable (schema_mapper.py:172-176; FIXTURES §7.7)
        if d % 50 == 49:
            lesson_i = d - 1
        lesson_slug = f"lesson-{lesson_i:06d}"

        kw = [f"kw-{subj[0]}-{j}" for j in range((d % 3) + 1)]
        klp = [
            {"keyLearningPoint": f"Point {j} of {lesson_slug}"}
            for j in range((d % 2) + 1)
        ]
        title = f"Lesson {lesson_i:06d} on {u['slug']}"
        if d % 37 == 0:
            title = f"'{title}'"  # surrounding quotes (§7.5)
        if d % 41 == 0:
            title = f"Caf\\u00e9 {title}"  # \uXXXX escape (§7.4)

        psby_val: Any = u["psby"]
        if d % 11 == 0:
            # multi-element array → explode before join (HISTORY.md:714)
            psby_val = [u["psby"], f"{u['psby']}-alt"]

        rec: dict[str, Any] = {
            "is_legacy": (d % 10 == 7),  # filtered out (config filters)
            "lesson_slug": lesson_slug,
            "lesson_title": title,
            "lesson_id": 90000 + lesson_i,
            "lesson_pupil_lesson_outcome": (
                f"Pupils can explain {u['slug']} idea {d % 7}."
            ),
            "lesson_key_learning_points": __import__("json").dumps(klp),
            "lesson_keywords": (
                repr(kw) if d % 13 == 0 else __import__("json").dumps(kw)
            ),
            "lesson_lesson_outline": __import__("json").dumps(
                [{"lessonOutline": f"Outline {d % 5}"}]
            ),
            "lesson_quiz_id_starter": (
                None if d % 6 == 5 else float(70000 + d)
            ),
            "lesson_quiz_id_exit": (None if d % 7 == 6 else float(80000 + d)),
            "lesson_content_guidance": "[]" if d % 4 else None,
            "lesson_content_guidance_details": None,
            "lesson_misconceptions_and_common_mistakes": __import__("json").dumps(
                [{"misconception": f"Misconception {d % 9}", "response": "Because."}]
            ),
            "lesson_equipment_and_resources": (
                None if d % 5 else __import__("json").dumps([{"equipment": "Ruler"}])
            ),
            "lesson_teacher_tips": __import__("json").dumps(
                [{"teacherTip": f"Tip {d % 11}"}]
            ),
            "lesson_video_id": f"asset://doc-{d:07d}/0",
            "lesson_asset_id_slidedeck": (
                None if d % 3 else f"asset://doc-{d:07d}/1"
            ),
            "order_in_unit": float((d % 20) + 1),
            "unit_slug": u["slug"],
            "unit_id": 5000 + u["i"],
            "unit_title": f"Unit {u['i']:04d} of {subj[1]}",
            "unit_description": (
                f"A unit about {subj[1]} for {year[1]}. Builds on thread-"
                f"{(u['i'] * 7) % n_threads_pool:03d}."
            ),
            "unit_why_this_why_now": (
                None if d % 8 else f"Because {subj[0]} matters in {year[0]}."
            ),
            "unit_prior_knowledge_requirements": (
                "{}" if d % 19 == 3 else __import__("json").dumps(
                    [f"Knows {subj[0]} basics", ""]  # empty element filtered
                )
            ),
            "unit_subjectcategories": repr([subj[1]]),  # py-literal dialect
            "null_unitvariant_id": None if d % 2 else float(uv_id + 500),
            "unitvariant_id": uv_id,
            "programme_slug": f"{subj[0]}-{phase[0]}-{ks[0]}",
            "programme_slug_by_year": psby_val,
            "programme_optionality": ("Core" if u["i"] % 4 == 0 else None),
            "programme_subject": subj[1],
            "programme_subject_slug": subj[0],
            "programme_subject_id": float(subj[2]),
            "programme_subject_description": f"The study of {subj[1]}.",
            "programme_subject_display_order": float(subj[2]),
            "programme_subject_parent": None if subj[2] % 2 else "Core subjects",
            "programme_subject_parent_id": None if subj[2] % 2 else 100.0,
            "programme_phase": phase[1],
            "programme_phase_slug": phase[0],
            "programme_phase_id": float(phase[2]),
            "programme_phase_description": f"{phase[1]} phase.",
            "programme_phase_display_order": float(phase[2]),
            "programme_keystage": ks[1],
            "programme_keystage_slug": ks[0],
            "programme_keystage_id": float(ks[2]),
            "programme_keystage_description": f"{ks[1]} description.",
            "programme_keystage_display_order": float(ks[2]),
            "programme_year": year[1],
            "programme_year_slug": year[0],
            "programme_year_id": float(year[2]),
            "programme_year_description": f"{year[1]} description.",
            "programme_year_display_order": float(year[2]),
            "programme_tier": tier[1] if tier else None,
            "programme_tier_slug": tier[0] if tier else None,
            "programme_tier_id": float(tier[2]) if tier else None,
            "programme_tier_description": f"{tier[1]} tier." if tier else None,
            "programme_tier_display_order": float(tier[2]) if tier else None,
            "programme_examboard": board[1] if board else None,
            "programme_examboard_slug": board[0] if board else None,
            "programme_examboard_id": float(board[2]) if board else None,
            "programme_examboard_description": (
                f"{board[1]} board." if board else None
            ),
            "programme_examboard_display_order": (
                float(board[2]) if board else None
            ),
        }
        uni.primary.append(rec)

    # --- supplementary (unit-level) records ------------------------------
    # One row per (unit, psby); ~70% coverage so the left join leaves nulls
    # (FIXTURES §3). unit_slug sometimes carries a -<digits> variant suffix
    # that the join normalizes away (hasura_extractor.py:186-208).
    srng = random.Random(seed + 1)
    for u in units:
        if srng.random() < 0.30:
            continue
        slug = u["slug"]
        if srng.random() < 0.25:
            slug = f"{slug}-{1000 + u['i']}"  # suffix to strip (§7.1)
        psby_val = u["psby"]
        if srng.random() < 0.20:
            psby_val = [u["psby"], f"{u['psby']}-alt"]
        uni.supplementary.append(
            {
                "unit_slug": slug,
                "programme_slug_by_year": psby_val,
                "unit_order": float((u["i"] % 30) + 1),
                "threads": _mk_threads(srng, u["i"], n_threads_pool),
            }
        )

    return uni


# --------------------------------------------------------------------------
# record → span encoding
# --------------------------------------------------------------------------


def render_value(v: Any) -> str:
    """Canonical string form of a record value — the same text the value
    would have in the consolidated CSV (hasura_extractor.py:249-258):
    ints bare, floats with their trailing ``.0``, bools ``True/False``."""
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, float):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, list):
        import json

        return json.dumps(v)
    return str(v)


def record_to_spans(
    rec: dict[str, Any], columns: tuple[str, ...], mv: str
) -> list[dict[str, Any]]:
    """Encode one record as an ordered span list (FIXTURES.md §1).

    Span order is the fixed column order; offsets are dense from 0. The
    per-row invariant everything downstream must preserve is
    span-sequence equality on (kind, text, media_ref, rank(offset)).
    """
    spans = [{"kind": "field", "text": f"_mv={mv}", "media_ref": "", "offset": 0}]
    off = 1
    for c in columns:
        v = rec.get(c)
        if v is None:
            continue
        if c in MEDIA_SPAN_COLUMNS:
            spans.append(
                {"kind": "media", "text": f"{c}=", "media_ref": str(v), "offset": off}
            )
        elif c in TEXT_SPAN_COLUMNS:
            spans.append(
                {
                    "kind": "text",
                    "text": f"{c}={render_value(v)}",
                    "media_ref": "",
                    "offset": off,
                }
            )
        elif c in JSON_SPAN_COLUMNS:
            spans.append(
                {
                    "kind": "json",
                    "text": f"{c}={render_value(v)}",
                    "media_ref": "",
                    "offset": off,
                }
            )
        else:
            spans.append(
                {
                    "kind": "field",
                    "text": f"{c}={render_value(v)}",
                    "media_ref": "",
                    "offset": off,
                }
            )
        off += 1
    return spans


SPANS_ARROW_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

DOCS_ARROW_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", SPANS_ARROW_TYPE)]
)


def universe_to_arrow(uni: Universe) -> pa.Table:
    """Encode the whole universe as one interleaved documents table.

    ``doc_id`` embeds the extraction order (``doc-%07d`` / ``sup-%07d``)
    — the reference's input-order-dependent dedup semantics
    (schema_mapper.py:86,172-176) are anchored to this total order.
    """
    doc_ids: list[str] = []
    spans_col: list[list[dict[str, Any]]] = []
    for i, rec in enumerate(uni.primary):
        doc_ids.append(f"doc-{i:07d}")
        spans_col.append(record_to_spans(rec, PRIMARY_COLUMNS, "primary"))
    for i, rec in enumerate(uni.supplementary):
        doc_ids.append(f"sup-{i:07d}")
        spans_col.append(record_to_spans(rec, SUPPLEMENTARY_COLUMNS, "supplementary"))
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), pa.array(spans_col, SPANS_ARROW_TYPE)],
        schema=DOCS_ARROW_SCHEMA,
    )


def write_documents(path: str, n_docs: int, seed: int = SEED) -> Universe:
    """Generate and write the documents parquet; returns the universe so
    callers (tests, oracle) can replay the same records."""
    uni = make_universe(n_docs, seed)
    tbl = universe_to_arrow(uni)
    pq.write_table(tbl, path, row_group_size=8192)
    return uni


def ensure_documents(cache_dir: str, n_docs: int, seed: int = SEED) -> str:
    """Idempotent cached generation keyed by (n_docs, seed)."""
    import os

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"documents_n{n_docs}_s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        uni = make_universe(n_docs, seed)
        pq.write_table(universe_to_arrow(uni), tmp, row_group_size=8192)
        os.replace(tmp, path)
    return path
