"""Change-event schema registry (SURVEY.md §7 step 6).

The reference absorbs source-schema drift implicitly (pandas infers the
CSV, the fixed ORM schema is the contract; partridge_helper.py:43-45
papers over the NaN-int hole). This engine makes the contract explicit:
each ``schema_ver`` maps to a StructType, and a version bump drives
``LakeTable.evolve_schema`` BEFORE the first batch carrying that
version merges — the late-added ``tool`` column and the role-enum
widening from the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import CHANGE_EVENTS_SCHEMA, CHANGE_EVENTS_V1_SCHEMA

REGISTRY: dict[int, T.StructType] = {
    1: CHANGE_EVENTS_V1_SCHEMA,
    2: CHANGE_EVENTS_SCHEMA,
}

# user-table columns contributed by each schema version (beyond v1)
VERSION_ADDED_USER_FIELDS: dict[int, list[T.StructField]] = {
    2: [T.StructField("tool", T.StringType(), True)],
}

# closed enum per version; v2 widens (role-widening evolution case)
ROLE_DOMAIN: dict[int, tuple[str, ...]] = {
    1: ("user", "assistant"),
    2: ("user", "assistant", "system", "tool"),
}


def schema_for(version: int) -> T.StructType:
    try:
        return REGISTRY[version]
    except KeyError:
        raise ValueError(f"unknown change-event schema_ver {version}") from None


def align_batch(batch: DataFrame, to_version: int | None = None) -> DataFrame:
    """Align a mixed- or old-version batch to the newest (or given)
    envelope: missing columns become typed nulls, column order fixed.
    The batch-side half of evolution; the table-side half is
    ``ensure_table_evolved``."""
    target = schema_for(to_version or max(REGISTRY))
    out = batch
    for field in target.fields:
        if field.name not in out.columns:
            out = out.withColumn(field.name, F.lit(None).cast(field.dataType))
    return out.select([f.name for f in target.fields])


def ensure_table_evolved(table, batch: DataFrame) -> list[int]:
    """Inspect the batch's schema_ver range and drive the table's DDL
    forward for any version whose added columns the table lacks yet.
    Cheap: max(schema_ver) is an aggregate over one small column.
    Returns the versions applied."""
    vmax = batch.agg(F.max("schema_ver").alias("v")).collect()[0]["v"]
    if vmax is None:
        return []
    applied = []
    have = {f.name for f in table.stored_schema().fields}
    for ver in sorted(VERSION_ADDED_USER_FIELDS):
        if ver <= vmax:
            missing = [
                f for f in VERSION_ADDED_USER_FIELDS[ver] if f.name not in have
            ]
            if missing:
                table.evolve_schema(missing)
                applied.append(ver)
    return applied


def validate_roles(batch: DataFrame) -> DataFrame:
    """Counted-anomaly check (the reference counts parse failures and
    continues, load_stops_to_db.py:12-18): rows whose role falls outside
    their version's domain get flagged, not dropped."""
    checks = [
        ((F.col("schema_ver") == v) & F.col("role").isNotNull() & ~F.col("role").isin(*dom))
        for v, dom in ROLE_DOMAIN.items()
    ]
    bad = checks[0]
    for c in checks[1:]:
        bad = bad | c
    return batch.withColumn("_role_out_of_domain", bad)
