"""Metadata schema registry.

The reference stores free-form JSONB per file and serves predicates from
GIN indexes (/root/reference/metacat/db/schema.sql:68-75). Spark has no
GIN equivalent; the scale-correct substitute is **typed shredded columns**
for the hot metadata keys (predicates stay JVM-side, push into the
columnar scan, and benefit from min/max skipping), plus one JSON string
column (`metadata`) for schema-on-read access to anything unshredded and
for `with_meta` output.

`MetaSchema` maps a dotted MQL key (e.g. ``core.run``) to its shredded
column and logical type. Keys not in the map fall back to
``get_json_object`` over the JSON column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class MetaKey:
    key: str          # dotted MQL name
    column: str       # shredded column name
    mtype: str        # 'int','float','str','bool','int[]','str[]','map<str,int>'

    @property
    def is_array(self) -> bool:
        return self.mtype.endswith("[]")

    @property
    def is_map(self) -> bool:
        return self.mtype.startswith("map<")

    @property
    def element_type(self) -> Optional[str]:
        if self.is_array:
            return self.mtype[:-2]
        if self.is_map:
            return self.mtype[self.mtype.index(",") + 1:-1]
        return None


class MetaSchema:
    def __init__(self, keys: list[MetaKey], json_column: str = "metadata"):
        self.by_key = {k.key: k for k in keys}
        self.json_column = json_column

    def get(self, key: str) -> Optional[MetaKey]:
        return self.by_key.get(key)

    def keys(self):
        return list(self.by_key)


# --- files metadata (fixture adapter; see FIXTURES.md key distribution) ---
FILE_META = MetaSchema([
    MetaKey("core.run", "m_core_run", "int"),
    MetaKey("core.x", "m_core_x", "float"),
    MetaKey("core.data_type", "m_core_data_type", "str"),
    MetaKey("core.version", "m_core_version", "str"),
    MetaKey("core.timestamp", "m_core_timestamp", "float"),
    MetaKey("core.good", "m_core_good", "bool"),
    MetaKey("core.runs", "m_core_runs", "int[]"),
    MetaKey("detector.modules", "m_detector_modules", "str[]"),
    MetaKey("data.trigger_bits", "m_data_trigger_bits", "map<str,int>"),
    MetaKey("data.sequence", "m_data_sequence", "int[]"),
    MetaKey("beam.status", "m_beam_status", "str"),
    MetaKey("prod.comment", "m_prod_comment", "str"),
])

DATASET_META = MetaSchema([
    MetaKey("data.type", "m_data_type", "str"),
    MetaKey("detector.id", "m_detector_id", "str"),
    MetaKey("math.pi", "m_math_pi", "float"),
])

QUERY_META = MetaSchema([
    MetaKey("file.quality", "m_file_quality", "int"),
    MetaKey("file.type", "m_file_type", "str"),
])

# file attribute whitelist (reference: metacat/common/attributes.py:1-9)
FILE_ATTRIBUTES = {
    "id": "str", "namespace": "str", "name": "str", "creator": "str",
    "size": "int", "retired": "bool", "retired_by": "str",
    "updated_by": "str", "created_timestamp": "timestamp",
    "updated_timestamp": "timestamp", "retired_timestamp": "timestamp",
}

DATASET_ATTRIBUTES = {
    "namespace": "str", "name": "str", "frozen": "bool",
    "monotonic": "bool", "creator": "str", "description": "str",
    "created_timestamp": "timestamp",
}

QUERY_ATTRIBUTES = {
    "namespace": "str", "name": "str", "creator": "str",
    "description": "str", "source": "str",
}
