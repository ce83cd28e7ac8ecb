"""The curriculum graph-mapping contract, as declarative Python data.

This re-expresses the reference's production config
(`config/oak_curriculum_schema_v0.1.0-alpha.json` in /root/reference):
13 node labels (:161-610) and 12 relationship configs → 8 Neo4j types
(:612-786), plus the join strategy (:135-154) and filters (:155-157).
The JSON dialect is identical so a user's existing config file loads
unchanged via :func:`load_config_json`; the embedded copy below is the
production contract our tests pin against.

A mapping config compiles to a DataFrame plan in
``operators/mapper.py`` — config-as-program, same as the reference
(README.md:10, config_manager.py:22-77).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

# --------------------------------------------------------------------------
# node mappings (config/...alpha.json:161-610)
# --------------------------------------------------------------------------

NODES: dict[str, dict[str, Any]] = {
    "Schemaversion": {
        "id_field": {
            "hasura_col": "",
            "type": "string",
            "property_name": "schemaVersion",
            "synthetic_value": "v0.1.0-alpha",
        },
        "properties": {
            "schemaDescription": {
                "hasura_col": "",
                "type": "string",
                "synthetic_value": "Schema design and experimentation.",
            },
            "isActive": {"hasura_col": "", "type": "boolean", "synthetic_value": True},
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Subject": {
        "id_field": {
            "hasura_col": "programme_subject_slug",
            "type": "string",
            "property_name": "subjectSlug",
        },
        "properties": {
            "subjectTitle": {"hasura_col": "programme_subject", "type": "string"},
            "displayOrder": {
                "hasura_col": "programme_subject_display_order",
                "type": "int",
            },
            "subjectId": {"hasura_col": "programme_subject_id", "type": "int"},
            "subjectDescription": {
                "hasura_col": "programme_subject_description",
                "type": "string",
            },
            "subjectParentTitle": {
                "hasura_col": "programme_subject_parent",
                "type": "string",
            },
            "subjectParentId": {
                "hasura_col": "programme_subject_parent_id",
                "type": "int",
            },
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Phase": {
        "id_field": {
            "hasura_col": "programme_phase_slug",
            "type": "string",
            "property_name": "phaseSlug",
        },
        "properties": {
            "phaseTitle": {"hasura_col": "programme_phase", "type": "string"},
            "phaseDescription": {
                "hasura_col": "programme_phase_description",
                "type": "string",
            },
            "phaseId": {"hasura_col": "programme_phase_id", "type": "int"},
            "displayOrder": {
                "hasura_col": "programme_phase_display_order",
                "type": "int",
            },
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Keystage": {
        "id_field": {
            "hasura_col": "programme_keystage_slug",
            "type": "string",
            "property_name": "keyStageSlug",
        },
        "properties": {
            "keyStageTitle": {"hasura_col": "programme_keystage", "type": "string"},
            "keyStageDescription": {
                "hasura_col": "programme_keystage_description",
                "type": "string",
            },
            "keyStageId": {"hasura_col": "programme_keystage_id", "type": "int"},
            "displayOrder": {
                "hasura_col": "programme_keystage_display_order",
                "type": "int",
            },
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Year": {
        "id_field": {
            "hasura_col": "programme_year_slug",
            "type": "string",
            "property_name": "yearSlug",
        },
        "properties": {
            "yearTitle": {"hasura_col": "programme_year", "type": "string"},
            "yearDescription": {
                "hasura_col": "programme_year_description",
                "type": "string",
            },
            "yearId": {"hasura_col": "programme_year_id", "type": "int"},
            "displayOrder": {
                "hasura_col": "programme_year_display_order",
                "type": "int",
            },
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Unit": {
        "id_field": {
            "hasura_col": "unit_slug",
            "type": "string",
            "property_name": "unitSlug",
        },
        "properties": {
            "unitId": {"hasura_col": "unit_id", "type": "int"},
            "unitTitle": {"hasura_col": "unit_title", "type": "string"},
            "unitDescription": {"hasura_col": "unit_description", "type": "string"},
            "priorKnowledge": {
                "hasura_col": "unit_prior_knowledge_requirements",
                "type": "list",
            },
            "whyThisWhyNow": {"hasura_col": "unit_why_this_why_now", "type": "string"},
            "subjectCategory": {"hasura_col": "unit_subjectcategories", "type": "list"},
            "nullUnitVariantId": {"hasura_col": "null_unitvariant_id", "type": "int"},
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Unitoffering": {
        "id_field": {
            "hasura_col": "",
            "type": "string",
            "property_name": "unitOfferingSlug",
            "synthetic_value": "{programme_year_slug}-{programme_subject_slug}",
        },
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Programme": {
        "id_field": {
            "hasura_col": "programme_slug_by_year",
            "type": "string",
            "property_name": "programmeSlug",
        },
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Tier": {
        "id_field": {
            "hasura_col": "programme_tier_slug",
            "type": "string",
            "property_name": "tierSlug",
        },
        "properties": {
            "tierTitle": {"hasura_col": "programme_tier", "type": "string"},
            "tierId": {"hasura_col": "programme_tier_id", "type": "int"},
            "tierDescription": {
                "hasura_col": "programme_tier_description",
                "type": "string",
            },
            "displayOrder": {
                "hasura_col": "programme_tier_display_order",
                "type": "int",
            },
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Examboard": {
        "id_field": {
            "hasura_col": "programme_examboard_slug",
            "type": "string",
            "property_name": "examBoardSlug",
        },
        "properties": {
            "examBoardTitle": {"hasura_col": "programme_examboard", "type": "string"},
            "examBoardId": {"hasura_col": "programme_examboard_id", "type": "int"},
            "examBoardDescription": {
                "hasura_col": "programme_examboard_description",
                "type": "string",
            },
            "displayOrder": {
                "hasura_col": "programme_examboard_display_order",
                "type": "int",
            },
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Unitvariant": {
        "id_field": {
            "hasura_col": "unitvariant_id",
            "type": "int",
            "property_name": "unitVariantId",
        },
        "properties": {
            "optionTitle": {"hasura_col": "programme_optionality", "type": "string"},
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Lesson": {
        "id_field": {
            "hasura_col": "lesson_slug",
            "type": "string",
            "property_name": "lessonSlug",
        },
        "properties": {
            "lessonTitle": {"hasura_col": "lesson_title", "type": "string"},
            "lessonId": {"hasura_col": "lesson_id", "type": "int"},
            "pupilLessonOutcome": {
                "hasura_col": "lesson_pupil_lesson_outcome",
                "type": "string",
            },
            "keyLearningPoints": {
                "hasura_col": "lesson_key_learning_points",
                "type": "list",
            },
            "keywords": {"hasura_col": "lesson_keywords", "type": "list"},
            "lessonOutline": {"hasura_col": "lesson_lesson_outline", "type": "list"},
            "quizStarterId": {"hasura_col": "lesson_quiz_id_starter", "type": "int"},
            "quizExitId": {"hasura_col": "lesson_quiz_id_exit", "type": "int"},
            "contentGuidance": {
                "hasura_col": "lesson_content_guidance",
                "type": "list",
            },
            "contentGuidanceDetails": {
                "hasura_col": "lesson_content_guidance_details",
                "type": "list",
            },
            "misconceptionsMistakes": {
                "hasura_col": "lesson_misconceptions_and_common_mistakes",
                "type": "list",
            },
            "equipmentResources": {
                "hasura_col": "lesson_equipment_and_resources",
                "type": "list",
            },
            "teacherTips": {"hasura_col": "lesson_teacher_tips", "type": "list"},
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "Thread": {
        "id_field": {
            "hasura_col": "threads",
            "type": "string",
            "expand_list": True,
            "property_name": "thread_slug",
        },
        "properties": {
            "threadId": {"hasura_col": "thread_id", "type": "int"},
            "threadTitle": {"hasura_col": "thread_title", "type": "string"},
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
}

# --------------------------------------------------------------------------
# relationship mappings (config/...alpha.json:612-786)
# --------------------------------------------------------------------------

RELATIONSHIPS: dict[str, dict[str, Any]] = {
    "phase_has_keystage": {
        "relationship_type": "HAS_KEY_STAGE",
        "start_node_type": "Phase",
        "start_csv_field": "programme_phase_slug",
        "end_node_type": "Keystage",
        "end_csv_field": "programme_keystage_slug",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "keystage_has_year": {
        "relationship_type": "HAS_YEAR",
        "start_node_type": "Keystage",
        "start_csv_field": "programme_keystage_slug",
        "end_node_type": "Year",
        "end_csv_field": "programme_year_slug",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "subject_has_offering": {
        "relationship_type": "HAS_UNIT_OFFERING",
        "start_node_type": "Subject",
        "start_csv_field": "programme_subject_slug",
        "end_node_type": "Unitoffering",
        "end_csv_field": "unitOfferingSlug",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "year_has_offering": {
        "relationship_type": "HAS_UNIT_OFFERING",
        "start_node_type": "Year",
        "start_csv_field": "programme_year_slug",
        "end_node_type": "Unitoffering",
        "end_csv_field": "unitOfferingSlug",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "offering_has_programme": {
        "relationship_type": "HAS_PROGRAMME",
        "start_node_type": "Unitoffering",
        "start_csv_field": "unitOfferingSlug",
        "end_node_type": "Programme",
        "end_csv_field": "programme_slug_by_year",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "examboard_has_programme": {
        "relationship_type": "HAS_PROGRAMME",
        "start_node_type": "Examboard",
        "start_csv_field": "programme_examboard_slug",
        "end_node_type": "Programme",
        "end_csv_field": "programme_slug_by_year",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "tier_has_programme": {
        "relationship_type": "HAS_PROGRAMME",
        "start_node_type": "Tier",
        "start_csv_field": "programme_tier_slug",
        "end_node_type": "Programme",
        "end_csv_field": "programme_slug_by_year",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "offering_has_unit": {
        "relationship_type": "HAS_UNIT",
        "start_node_type": "Unitoffering",
        "start_csv_field": "unitOfferingSlug",
        "end_node_type": "Unit",
        "end_csv_field": "unit_slug",
        "properties": {
            "unitOrder": {"hasura_col": "unit_order", "type": "int"},
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "unit_has_unitvariant": {
        "relationship_type": "HAS_UNITVARIANT",
        "start_node_type": "Unit",
        "start_csv_field": "unit_slug",
        "end_node_type": "Unitvariant",
        "end_csv_field": "unitvariant_id",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "programme_has_unitvariant": {
        "relationship_type": "HAS_UNITVARIANT",
        "start_node_type": "Programme",
        "start_csv_field": "programme_slug_by_year",
        "end_node_type": "Unitvariant",
        "end_csv_field": "unitvariant_id",
        "properties": {
            "unitVariantOrder": {"hasura_col": "unit_order", "type": "int"},
            "isOptional": {
                "hasura_col": "programme_optionality",
                "type": "boolean",
                "computed": "is_not_null",
            },
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "unitvariant_has_lesson": {
        "relationship_type": "HAS_LESSON",
        "start_node_type": "Unitvariant",
        "start_csv_field": "unitvariant_id",
        "end_node_type": "Lesson",
        "end_csv_field": "lesson_slug",
        "properties": {
            "lessonOrder": {"hasura_col": "order_in_unit", "type": "int"},
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
    "unit_has_thread": {
        "relationship_type": "HAS_THREAD",
        "start_node_type": "Unit",
        "start_csv_field": "unit_slug",
        "end_node_type": "Thread",
        "end_csv_field": "threads",
        "properties": {
            "lastUpdated": {"hasura_col": "current_timestamp", "type": "datetime"},
        },
    },
}

# --------------------------------------------------------------------------
# join strategy + filters (config/...alpha.json:135-157)
# --------------------------------------------------------------------------

JOIN_STRATEGY: dict[str, Any] = {
    "type": "multi_source_join",
    "primary_mv": "primary",
    "joins": [
        {
            "mv": "supplementary",
            "join_type": "left",
            "on": {
                "left_key": ["unit_slug", "programme_slug_by_year"],
                "right_key": ["unit_slug", "programme_slug_by_year"],
            },
        }
    ],
}

FILTERS: dict[str, Any] = {"is_legacy": False}

# --------------------------------------------------------------------------
# wide-table column dtypes
# --------------------------------------------------------------------------
# The reference materializes the consolidated table through a CSV
# round-trip (hasura_extractor.py:249-258 → data_cleaner.py:40-48), so a
# column's pandas dtype — and therefore its str() rendering when used as
# a relationship endpoint (schema_mapper.py:315,320) — is determined by
# content: all-numeric columns parse as int64/float64, everything else is
# object (string, with NaN → "nan" after the cleaner's astype(str),
# data_cleaner.py:88-89). We pin that dtype assignment explicitly so both
# the Spark plan and the pure-Python oracle agree.

LONG_COLUMNS = frozenset(
    {
        # never-null numeric columns → pandas int64 → str() has no ".0"
        "unitvariant_id",
        "lesson_id",
        "unit_id",
    }
)
DOUBLE_COLUMNS = frozenset(
    {
        # nullable numeric columns → pandas float64 → str() renders "X.0"
        "null_unitvariant_id",
        "order_in_unit",
        "lesson_quiz_id_starter",
        "lesson_quiz_id_exit",
        "unit_order",
        "programme_subject_id",
        "programme_subject_display_order",
        "programme_subject_parent_id",
        "programme_phase_id",
        "programme_phase_display_order",
        "programme_keystage_id",
        "programme_keystage_display_order",
        "programme_year_id",
        "programme_year_display_order",
        "programme_tier_id",
        "programme_tier_display_order",
        "programme_examboard_id",
        "programme_examboard_display_order",
    }
)
BOOL_COLUMNS = frozenset({"is_legacy"})

#: every other wide-table column is a string ("object") column


def column_dtype(name: str) -> str:
    if name in LONG_COLUMNS:
        return "long"
    if name in DOUBLE_COLUMNS:
        return "double"
    if name in BOOL_COLUMNS:
        return "boolean"
    return "string"


#: canonical wide-table column order (field-span emission order in the
#: synthetic documents; subset of the reference's ~110 columns that the
#: mapping contract touches, FIXTURES.md §2)
PRIMARY_COLUMNS: tuple[str, ...] = (
    "is_legacy",
    "lesson_slug",
    "lesson_title",
    "lesson_id",
    "lesson_pupil_lesson_outcome",
    "lesson_key_learning_points",
    "lesson_keywords",
    "lesson_lesson_outline",
    "lesson_quiz_id_starter",
    "lesson_quiz_id_exit",
    "lesson_content_guidance",
    "lesson_content_guidance_details",
    "lesson_misconceptions_and_common_mistakes",
    "lesson_equipment_and_resources",
    "lesson_teacher_tips",
    "lesson_video_id",
    "lesson_asset_id_slidedeck",
    "order_in_unit",
    "unit_slug",
    "unit_id",
    "unit_title",
    "unit_description",
    "unit_why_this_why_now",
    "unit_prior_knowledge_requirements",
    "unit_subjectcategories",
    "null_unitvariant_id",
    "unitvariant_id",
    "programme_slug",
    "programme_slug_by_year",
    "programme_optionality",
    "programme_subject",
    "programme_subject_slug",
    "programme_subject_id",
    "programme_subject_description",
    "programme_subject_display_order",
    "programme_subject_parent",
    "programme_subject_parent_id",
    "programme_phase",
    "programme_phase_slug",
    "programme_phase_id",
    "programme_phase_description",
    "programme_phase_display_order",
    "programme_keystage",
    "programme_keystage_slug",
    "programme_keystage_id",
    "programme_keystage_description",
    "programme_keystage_display_order",
    "programme_year",
    "programme_year_slug",
    "programme_year_id",
    "programme_year_description",
    "programme_year_display_order",
    "programme_tier",
    "programme_tier_slug",
    "programme_tier_id",
    "programme_tier_description",
    "programme_tier_display_order",
    "programme_examboard",
    "programme_examboard_slug",
    "programme_examboard_id",
    "programme_examboard_description",
    "programme_examboard_display_order",
)

SUPPLEMENTARY_COLUMNS: tuple[str, ...] = (
    "unit_slug",
    "programme_slug_by_year",
    "unit_order",
    "threads",
)

#: prose columns are emitted as kind='text' spans; JSON payload columns as
#: kind='json'; everything else as kind='field' (FIXTURES.md §1)
TEXT_SPAN_COLUMNS = frozenset(
    {"unit_description", "unit_why_this_why_now", "lesson_pupil_lesson_outcome"}
)
JSON_SPAN_COLUMNS = frozenset(
    {
        "lesson_key_learning_points",
        "lesson_keywords",
        "lesson_lesson_outline",
        "lesson_content_guidance",
        "lesson_content_guidance_details",
        "lesson_misconceptions_and_common_mistakes",
        "lesson_equipment_and_resources",
        "lesson_teacher_tips",
        "unit_prior_knowledge_requirements",
        "unit_subjectcategories",
        "threads",
    }
)
#: media-bearing columns: value goes into media_ref, not text
MEDIA_SPAN_COLUMNS = frozenset({"lesson_video_id", "lesson_asset_id_slidedeck"})


_ENV_RE = re.compile(r"\$\{([^}]+)\}")


def _substitute_env(obj: Any) -> Any:
    """``${VAR}`` substitution in config strings (config_manager.py:161-183)."""
    if isinstance(obj, str):
        return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(0)), obj)
    if isinstance(obj, dict):
        return {k: _substitute_env(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute_env(v) for v in obj]
    return obj


def load_config_json(path: str) -> dict[str, Any]:
    """Load a reference-dialect JSON config (config_manager.py:22-132):
    env-var substitution applied; ``schema_mapping.nodes/relationships``,
    ``join_strategy`` and ``filters`` keys validated present."""
    with open(path) as f:
        cfg = json.load(f)
    cfg = _substitute_env(cfg)
    sm = cfg.get("schema_mapping", {})
    if "nodes" not in sm:
        raise ValueError("config missing schema_mapping.nodes")
    return cfg
