"""Schema registry — the Glue-crawler stand-in.

The reference delegates schema discovery/evolution to an AWS Glue Crawler
invoked out-of-band (``workflow_definition.json:94-142``, ``README.md:14,32``)
— an AWS-managed black box that infers schemas from landed files and registers
them in a catalog. The engine's native equivalent:

- ``discover``: infer a schema by reading a sample of the dataset (what the
  crawler does), returning a ``StructType``
- ``register`` / ``load``: persist schemas as versioned JSON documents under a
  registry directory (the catalog); each registration appends a new version
  when the schema changed, so evolution is tracked
- ``merge``: reconcile a newly discovered schema with the registered one
  (crawler "schema evolution": new nullable fields append; type conflicts are
  errors unless ``widen`` resolves them — int→long→double, any→string)
- enforcement: feed ``load()`` into ``read_source(schema=...)`` so production
  reads skip inference entirely (at 100 TB, JSON/CSV inference is a full extra
  pass over the data; an enforced registry schema makes the read single-pass
  and stable).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    AtomicType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# widening lattice for evolution conflicts (crawler-style resolution)
_WIDEN_ORDER = ["int", "bigint", "double", "string"]


class SchemaConflictError(ValueError):
    pass


class SchemaRegistry:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- storage -----------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def register(self, name: str, schema: StructType) -> int:
        """Store ``schema`` as the latest version for ``name``; returns the
        version number. No-op (same version) if unchanged."""
        doc = {"versions": []}
        if os.path.exists(self._path(name)):
            with open(self._path(name)) as f:
                doc = json.load(f)
        if doc["versions"] and doc["versions"][-1]["schema"] == schema.jsonValue():
            return len(doc["versions"])
        doc["versions"].append({"schema": schema.jsonValue(), "registered_at": int(time.time())})
        with open(self._path(name), "w") as f:
            json.dump(doc, f, indent=1)
        return len(doc["versions"])

    def load(self, name: str, version: int | None = None) -> StructType:
        with open(self._path(name)) as f:
            doc = json.load(f)
        versions = doc["versions"]
        idx = (version - 1) if version is not None else -1
        return StructType.fromJson(versions[idx]["schema"])

    def versions(self, name: str) -> int:
        if not os.path.exists(self._path(name)):
            return 0
        with open(self._path(name)) as f:
            return len(json.load(f)["versions"])

    # -- discovery (the crawl) --------------------------------------------
    def discover(self, spark: SparkSession, path: str, data_format: str = "json", sample_files: int | None = None) -> StructType:
        """Infer a schema from the dataset (crawler behavior). JSON/CSV incur
        an inference pass — which is exactly why production reads should use
        the registered schema instead."""
        from universal_aws_data_pipeline_spark.sources.files import read_source

        return read_source(spark, path, data_format).schema

    def crawl(
        self, spark: SparkSession, name: str, path: str, data_format: str = "json", mode: str = "error"
    ) -> StructType:
        """Discover + merge with the registered schema + register. Returns the
        effective (possibly widened) schema — one call ≈ one crawler run.
        ``mode="rescue"`` routes irreconcilable type conflicts to a rescued-data
        column instead of raising (see ``merge_schemas``)."""
        discovered = self.discover(spark, path, data_format)
        if self.versions(name):
            merged = merge_schemas(self.load(name), discovered, mode=mode)
        else:
            merged = discovered
        self.register(name, merged)
        return merged


def _widen(a: DataType, b: DataType) -> DataType:
    if a == b:
        return a
    names = {"integer": "int", "long": "bigint"}
    sa = names.get(a.typeName(), a.simpleString())
    sb = names.get(b.typeName(), b.simpleString())
    if sa in _WIDEN_ORDER and sb in _WIDEN_ORDER:
        widened = _WIDEN_ORDER[max(_WIDEN_ORDER.index(sa), _WIDEN_ORDER.index(sb))]
        return {"int": IntegerType(), "bigint": LongType(), "double": DoubleType(), "string": StringType()}[widened]
    if isinstance(a, AtomicType) and isinstance(b, AtomicType):
        return StringType()  # any atomic conflict widens to string (crawler-style)
    raise SchemaConflictError(f"cannot reconcile {a.simpleString()} with {b.simpleString()}")


RESCUE_COL = "_rescued_data"


def merge_schemas(base: StructType, new: StructType, mode: str = "error") -> StructType:
    """Crawler-style evolution: keep base field order, widen type conflicts,
    append new fields as nullable, keep base-only fields (late data may still
    carry them).

    ``mode``: what to do with IRRECONCILABLE conflicts (nothing in the widen
    lattice covers them, e.g. struct vs atomic, array vs struct):

    - ``"error"`` (default): raise ``SchemaConflictError`` — the crawler-run
      fails loudly and a human decides.
    - ``"rescue"``: the merged field keeps the BASE type (registered readers
      stay valid) and the schema gains a ``_rescued_data map<string,string>``
      column; ``read_with_rescue`` then captures the non-conforming raw
      values there instead of silently nulling them.
    """
    if mode not in ("error", "rescue"):
        raise ValueError(f"unknown merge mode {mode!r}")
    rescued = False

    def _resolve(a: DataType, b: DataType) -> DataType:
        nonlocal rescued
        try:
            return _widen(a, b)
        except SchemaConflictError:
            if mode == "rescue":
                rescued = True
                return a  # keep the registered type; rescue column catches strays
            raise

    by_name = {f.name: f for f in new.fields}
    fields: list[StructField] = []
    for f in base.fields:
        if f.name in by_name:
            n = by_name.pop(f.name)
            if isinstance(f.dataType, StructType) and isinstance(n.dataType, StructType):
                merged: DataType = merge_schemas(f.dataType, n.dataType, mode=mode)
            elif isinstance(f.dataType, ArrayType) and isinstance(n.dataType, ArrayType):
                inner_b, inner_n = f.dataType.elementType, n.dataType.elementType
                if isinstance(inner_b, StructType) and isinstance(inner_n, StructType):
                    merged = ArrayType(merge_schemas(inner_b, inner_n, mode=mode))
                else:
                    merged = ArrayType(_resolve(inner_b, inner_n))
            else:
                merged = _resolve(f.dataType, n.dataType)
            fields.append(StructField(f.name, merged, nullable=True))
        else:
            fields.append(StructField(f.name, f.dataType, nullable=True))
    for n in new.fields:
        if n.name in by_name:  # preserve new-field order
            fields.append(StructField(n.name, n.dataType, nullable=True))
    if rescued and RESCUE_COL not in {f.name for f in fields}:
        from pyspark.sql.types import MapType

        fields.append(StructField(RESCUE_COL, MapType(StringType(), StringType()), nullable=True))
    return StructType(fields)


def read_with_rescue(spark: SparkSession, path: str, data_format: str, schema: StructType):
    """Enforced-schema read that CAPTURES non-conforming atomic values in
    ``_rescued_data`` instead of silently nulling them (the quarantine half of
    ``mode="rescue"``).

    Mechanics: read every top-level atomic field as string (no inference
    pass), then cast to the target type; where the cast fails but the raw
    value exists, the (field → raw) entry lands in the rescue map. All
    map-only column expressions — pushdown-friendly, zero Python UDFs."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.sources.files import read_source

    target_fields = [f for f in schema.fields if f.name != RESCUE_COL]
    raw_schema = StructType(
        [
            StructField(f.name, StringType() if isinstance(f.dataType, AtomicType) else f.dataType, nullable=True)
            for f in target_fields
        ]
    )
    raw = read_source(spark, path, data_format, schema=raw_schema)
    cols = []
    names, strays = [], []
    for f in target_fields:
        if isinstance(f.dataType, AtomicType) and not isinstance(f.dataType, StringType):
            # try_cast, not cast: under ANSI mode (Spark 4 default) a plain
            # cast THROWS on malformed input — quarantine needs NULL + capture
            casted = F.col(f.name).try_cast(f.dataType)
            cols.append(casted.alias(f.name))
            names.append(F.lit(f.name))
            strays.append(F.when(casted.isNull() & F.col(f.name).isNotNull(), F.col(f.name)))
        else:
            cols.append(F.col(f.name))
    if strays:
        rescue = F.map_filter(
            F.map_from_arrays(F.array(*names), F.array(*strays)), lambda _k, v: v.isNotNull()
        )
        cols.append(F.when(F.size(F.map_keys(rescue)) > 0, rescue).alias(RESCUE_COL))
    return raw.select(*cols)
