"""Metadata validation engine.

Semantics match the reference rules engine
(/root/reference/metacat/util/validation.py:3-203):

- per-key definitions: type (int/float/text/boolean/dict/list/int[]/
  float[]/text[]/boolean[]/any), values enum, min/max, pattern,
  required
- restricted mode: keys absent from the definitions are errors
- a "values" enum SUPERSEDES pattern/min/max (they live in its else
  branch in the reference)
- enum/range checks are skipped for boolean/list/dict/any-typed keys
- pattern uses anchored match (re.match), not search
- bool is NOT acceptable where int is required (python bool is an int
  subclass; the reference accepts it — we keep that quirk for parity)
"""

from __future__ import annotations

import re

_SCALAR_CHECKS = {
    "int": lambda v: isinstance(v, int),
    "float": lambda v: isinstance(v, float),
    "text": lambda v: isinstance(v, str),
    "boolean": lambda v: isinstance(v, bool),
    "dict": lambda v: isinstance(v, dict),
    "list": lambda v: isinstance(v, list),
}

_ELEM_CHECKS = {
    "int[]": lambda x: isinstance(x, int),
    "float[]": lambda x: isinstance(x, float),
    "text[]": lambda x: isinstance(x, str),
    "boolean[]": lambda x: isinstance(x, bool),
}


def validate_metadata(definitions: dict, restricted: bool,
                      metadata: dict) -> list[tuple[str, str]]:
    """Returns [(key, error), ...]; empty = valid."""
    definitions = definitions or {}
    metadata = metadata or {}
    errors: list[tuple[str, str]] = []

    for name, value in metadata.items():
        definition = definitions.get(name)
        if definition is None:
            if restricted:
                errors.append((name,
                               "parameter not allowed in restricted "
                               "category"))
            continue

        typ = definition.get("type")
        if typ == "any":
            continue
        type_mismatch = False
        if typ in _SCALAR_CHECKS:
            if not _SCALAR_CHECKS[typ](value):
                errors.append((name, f"{typ} value required instead of "
                                     f"{value!r}"))
                type_mismatch = True
        elif typ in _ELEM_CHECKS:
            if not isinstance(value, list) or not all(
                    _ELEM_CHECKS[typ](x) for x in value):
                errors.append((name, f"list of {typ[:-2]} required "
                                     f"instead of {value!r}"))
                type_mismatch = True

        if type_mismatch or typ in ("boolean", "boolean[]", "list",
                                    "dict", "any"):
            continue

        vals = value if isinstance(value, list) else [value]
        if "values" in definition:
            allowed = definition["values"]
            if not all(x in allowed for x in vals):
                errors.append((name, f"value {value!r} is not allowed"))
            continue  # enum supersedes pattern/min/max
        if "pattern" in definition and typ in ("text", "text[]"):
            r = re.compile(definition["pattern"])
            if not all(isinstance(x, str) and r.match(x) is not None
                       for x in vals):
                errors.append((name, f"value {value!r} does not match "
                                     f"the pattern "
                                     f"{definition['pattern']!r}"))
        if "min" in definition and not all(
                x >= definition["min"] for x in vals):
            errors.append((name, f"value {value!r} out of range "
                                 f"(min:{definition['min']})"))
        if "max" in definition and not all(
                x <= definition["max"] for x in vals):
            errors.append((name, f"value {value!r} out of range "
                                 f"(max:{definition['max']})"))

    for dname, definition in definitions.items():
        if definition.get("required") and dname not in metadata:
            errors.append((dname, "required parameter is missing"))
    return errors


def category_of(key: str) -> str:
    """Top-level keys must be dotted category.name paths
    (docs/concepts.rst:45-53)."""
    if "." not in key:
        raise ValueError(f"metadata key {key!r} must be a dotted "
                         f"category.name path")
    return key.rsplit(".", 1)[0]


# Default parameter-category rows for the fixture schema, in the shape
# of the reference's parameter_categories table (schema.sql:162-176:
# path PK, restricted, definitions jsonb, owner/description/creator).
# The catalog materializes these as a DataFrame; DML loads whatever
# table the catalog carries — a deployment defines its own rows.
DEFAULT_CATEGORIES = {
    "core": {
        "restricted": False,
        "definitions": {
            "core.run": {"type": "int", "min": 0, "required": True},
            "core.x": {"type": "float", "min": 0.0, "max": 20.0},
            "core.data_type": {"type": "text",
                               "values": ["mc", "data", "calibration"]},
            "core.version": {"type": "text", "pattern": r"^\d+\.\d+$"},
            "core.runs": {"type": "int[]", "min": 0},
            "core.good": {"type": "boolean"},
            "core.timestamp": {"type": "float"},
        },
    },
    "data": {
        "restricted": True,
        "definitions": {
            "data.trigger_bits": {"type": "dict"},
            "data.sequence": {"type": "int[]"},
        },
    },
}


def category_rows(categories: dict | None = None) -> list[tuple]:
    """(path, restricted, definitions_json, owner_user, description,
    creator) rows for building a parameter_categories DataFrame."""
    import json
    cats = DEFAULT_CATEGORIES if categories is None else categories
    return [(path, spec.get("restricted", False),
             json.dumps(spec.get("definitions", {})),
             "admin", f"category {path}", "admin")
            for path, spec in sorted(cats.items())]


CATEGORY_COLUMNS = ["path", "restricted", "definitions", "owner_user",
                    "description", "creator"]
