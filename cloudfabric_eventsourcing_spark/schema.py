"""Projection document schema — capability-flagged columns mapped onto Spark
StructType.

Behavioral spec (reference, read-only):
  - ProjectionDocumentSchema (SchemaName + Properties, exactly one key):
      CloudFabric.Projections/ProjectionDocumentSchema.cs:3-28
  - ProjectionDocumentPropertySchema (TypeCode scalars + capability flags +
      one-level nesting): ProjectionDocumentPropertySchema.cs:8-45
  - physical type mapping (Postgres): PostgresqlProjectionRepository.cs:944-989
  - schema-version hash -> index name suffix:
      ProjectionDocumentSchemaFactory.cs:22-49, ProjectionRepository.cs:258-260

Spark mapping (SURVEY.md §1.3): scalars map to native Spark types
(Guid -> StringType canonical lowercase uuid, Decimal -> DecimalType(38,6),
DateTime -> TimestampType UTC); nested objects -> StructType; nested arrays ->
ArrayType; capability flags ride in StructField.metadata.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import types
from typing import Optional

from pyspark.sql import types as T

# scalar type tokens (mirror .NET TypeCode names used by the reference)
INT32 = "Int32"
INT64 = "Int64"
SINGLE = "Single"
DOUBLE = "Double"
DECIMAL = "Decimal"
BOOLEAN = "Boolean"
STRING = "String"
DATETIME = "DateTime"
GUID = "Guid"  # reference: TypeCode.Object + ObjectTypeHint=Guid
OBJECT = "Object"  # nested object
ARRAY = "Array"  # nested array

_SPARK_TYPES = {
    INT32: T.IntegerType(),
    INT64: T.LongType(),
    SINGLE: T.FloatType(),
    DOUBLE: T.DoubleType(),
    DECIMAL: T.DecimalType(38, 6),
    BOOLEAN: T.BooleanType(),
    STRING: T.StringType(),
    DATETIME: T.TimestampType(),
    GUID: T.StringType(),
}

FLAG_NAMES = (
    "is_key",
    "is_searchable",
    "is_retrievable",
    "is_filterable",
    "is_sortable",
    "is_facetable",
)


@dataclasses.dataclass
class PropertySchema:
    """One projection document property (ProjectionDocumentPropertySchema.cs:8-45)."""

    name: str
    type: str  # one of the scalar tokens, OBJECT, or ARRAY
    is_key: bool = False
    is_searchable: bool = False
    is_retrievable: bool = True
    is_filterable: bool = False
    is_sortable: bool = False
    is_facetable: bool = False
    facetable_ranges: list = dataclasses.field(default_factory=list)
    # search-tuning surface retained for API parity
    # (ProjectionDocumentPropertySchema.cs:20-32); carried in StructField
    # metadata. The baseline engine's substring search ignores boost /
    # analyzers / synonyms (the Postgres backend the baseline follows does
    # too — SURVEY.md §7 deliberate divergences); suggestions flag marks
    # columns for prefix-search composition.
    use_for_suggestions: bool = False
    searchable_boost: float = 1.0
    synonym_maps: list = dataclasses.field(default_factory=list)
    analyzer: Optional[str] = None
    search_analyzer: Optional[str] = None
    index_analyzer: Optional[str] = None
    array_element_type: Optional[str] = None  # for ARRAY of scalars
    # for OBJECT, or ARRAY of objects:
    nested_properties: list["PropertySchema"] = dataclasses.field(default_factory=list)

    def spark_type(self) -> T.DataType:
        if self.type == OBJECT:
            return T.StructType([p.spark_field() for p in self.nested_properties])
        if self.type == ARRAY:
            if self.nested_properties:
                elem = T.StructType([p.spark_field() for p in self.nested_properties])
            elif self.array_element_type:
                elem = _SPARK_TYPES[self.array_element_type]
            else:
                raise ValueError(
                    f"array property {self.name!r} needs array_element_type "
                    "or nested_properties"
                )
            return T.ArrayType(elem)
        try:
            return _SPARK_TYPES[self.type]
        except KeyError:
            raise ValueError(f"unknown property type {self.type!r}") from None

    def spark_field(self) -> T.StructField:
        meta = {flag: getattr(self, flag) for flag in FLAG_NAMES}
        meta["cf_type"] = self.type
        if self.facetable_ranges:
            meta["facetable_ranges"] = list(self.facetable_ranges)
        if self.use_for_suggestions:
            meta["use_for_suggestions"] = True
        if self.searchable_boost != 1.0:
            meta["searchable_boost"] = self.searchable_boost
        if self.analyzer:
            meta["analyzer"] = self.analyzer
        if self.search_analyzer:
            meta["search_analyzer"] = self.search_analyzer
        if self.index_analyzer:
            meta["index_analyzer"] = self.index_analyzer
        nullable = not self.is_key
        return T.StructField(self.name, self.spark_type(), nullable, metadata=meta)


@dataclasses.dataclass
class ProjectionSchema:
    """Named document schema; exactly one key property
    (ProjectionDocumentSchema.cs:3-28)."""

    schema_name: str
    properties: list[PropertySchema]

    def __post_init__(self):
        keys = [p for p in self.properties if p.is_key]
        if len(keys) != 1:
            raise ValueError(
                f"schema {self.schema_name!r} must declare exactly one key "
                f"property, found {len(keys)}"
            )

    @property
    def key_name(self) -> str:
        return next(p.name for p in self.properties if p.is_key)

    def property(self, name: str) -> Optional[PropertySchema]:
        return next((p for p in self.properties if p.name == name), None)

    def to_struct_type(self) -> T.StructType:
        return T.StructType([p.spark_field() for p in self.properties])

    # -- schema-version hash (C5) -----------------------------------------
    def properties_hash(self) -> str:
        """Stable 8-hex-digit fingerprint of the property set; the
        counterpart of the reference's xxHash32 schema hash used to suffix
        index names (ProjectionDocumentSchemaFactory.cs:22-49). Algorithm
        differs (sha256-derived) — hashes are opaque name components, only
        stability matters."""
        canonical = json.dumps(_canonical(self.properties), sort_keys=True)
        return hashlib.sha256(canonical.encode()).hexdigest()[:8]

    def index_name(self) -> str:
        """`{schema_name}_{hash}` lowercased (ProjectionRepository.cs:258-260)."""
        return f"{self.schema_name}_{self.properties_hash()}".lower()

    def searchable_paths(self) -> list[str]:
        """Dotted paths of all searchable string columns, including one level
        into nested objects/arrays (used by full-text search, F13)."""
        out: list[str] = []
        for p in self.properties:
            if p.type in (OBJECT, ARRAY):
                for n in p.nested_properties:
                    if n.is_searchable and n.type == STRING:
                        out.append(f"{p.name}.{n.name}")
            elif p.is_searchable and p.type == STRING:
                out.append(p.name)
        return out

    def searchable_path_analyzers(
        self,
    ) -> list[tuple[str, Optional[str], Optional[str]]]:
        """searchable_paths() with each path's resolved
        (search_analyzer, index_analyzer) pair.  ES resolution order
        (ProjectionDocumentPropertySchema.cs:20-32, applied at
        ElasticSearchProjectionIndexer.cs:181-203): the query side uses
        SearchAnalyzer ?? Analyzer, the stored side IndexAnalyzer ??
        Analyzer.  None = no per-property override — callers fall back
        to the query-level analyzer option, then "whitespace"."""

        def resolved(p: PropertySchema) -> tuple[Optional[str], Optional[str]]:
            return (
                p.search_analyzer or p.analyzer,
                p.index_analyzer or p.analyzer,
            )

        out: list[tuple[str, Optional[str], Optional[str]]] = []
        for p in self.properties:
            if p.type in (OBJECT, ARRAY):
                for n in p.nested_properties:
                    if n.is_searchable and n.type == STRING:
                        out.append((f"{p.name}.{n.name}", *resolved(n)))
            elif p.is_searchable and p.type == STRING:
                out.append((p.name, *resolved(p)))
        return out

    def searchable_path_synonym_maps(self) -> list[tuple[str, list]]:
        """searchable_paths() with each path's declared synonym-map
        NAMES (`SynonymMaps` — ProjectionDocumentPropertySchema.cs:23);
        contents live in the engine-side registry
        (queries/synonyms.py), never on the query wire."""
        out: list[tuple[str, list]] = []
        for p in self.properties:
            if p.type in (OBJECT, ARRAY):
                for n in p.nested_properties:
                    if n.is_searchable and n.type == STRING:
                        out.append((f"{p.name}.{n.name}", list(n.synonym_maps)))
            elif p.is_searchable and p.type == STRING:
                out.append((p.name, list(p.synonym_maps)))
        return out

    def searchable_synonym_map_names(self) -> list[str]:
        """Union of all searchable properties' declared map names, in
        first-declaration order (the schema-wide view term-centric
        search modes use)."""
        names: list[str] = []
        for _, ns in self.searchable_path_synonym_maps():
            names.extend(n for n in ns if n not in names)
        return names

    def searchable_path_boosts(self) -> list[tuple[str, float]]:
        """searchable_paths() with each path's `searchable_boost` — the
        per-field relevance weight the reference's ES backend applies in
        its query (ElasticSearchQueryFactory.cs:11-129; boost declared at
        ProjectionDocumentPropertySchema.cs:20-32)."""
        out: list[tuple[str, float]] = []
        for p in self.properties:
            if p.type in (OBJECT, ARRAY):
                for n in p.nested_properties:
                    if n.is_searchable and n.type == STRING:
                        out.append((f"{p.name}.{n.name}", n.searchable_boost))
            elif p.is_searchable and p.type == STRING:
                out.append((p.name, p.searchable_boost))
        return out


def _canonical(props: list[PropertySchema]) -> list:
    return [
        {
            "name": p.name,
            "type": p.type,
            "elem": p.array_element_type,
            "nested": _canonical(p.nested_properties),
        }
        for p in props
    ]


def create_table_ddl(
    schema: ProjectionSchema,
    table_format: str = "parquet",
    location: Optional[str] = None,
    partition_by: str = "PartitionKey",
) -> str:
    """CREATE TABLE DDL from a projection schema (S11 — the counterpart of
    ConstructCreateTableCommandText, PostgresqlProjectionRepository.cs:927-989
    and the ES index builder ElasticSearchProjectionIndexer.cs:46-271).

    The key property maps to a NOT NULL column; capability flags live in
    column comments (Spark has no secondary indexes — filterable/searchable
    columns are candidates for Z-ORDER/liquid clustering on Delta)."""
    cols = []
    names = {p.name for p in schema.properties}
    for p in schema.properties:
        spark_t = p.spark_field().dataType.simpleString()
        nullability = " NOT NULL" if p.is_key else ""
        flags = [f for f in ("is_key", "is_searchable", "is_filterable", "is_sortable", "is_facetable") if getattr(p, f)]
        comment = f" COMMENT '{','.join(flags)}'" if flags else ""
        cols.append(f"  `{p.name}` {spark_t}{nullability}{comment}")
    ddl = (
        f"CREATE TABLE IF NOT EXISTS `{schema.index_name()}` (\n"
        + ",\n".join(cols)
        + f"\n) USING {table_format}"
    )
    if partition_by and partition_by in names:
        ddl += f"\nPARTITIONED BY (`{partition_by}`)"
    if location:
        ddl += f"\nLOCATION '{location}'"
    return ddl


def schema_from_struct(name: str, st: T.StructType, key: str) -> ProjectionSchema:
    """Build a ProjectionSchema from an existing Spark StructType (dynamic
    schema mode — DynamicProjectionSchemaTests.cs:212-237). Capability flags
    default to filterable+sortable for scalars."""
    props = []
    for field in st.fields:
        props.append(_prop_from_field(field, is_key=(field.name == key)))
    return ProjectionSchema(name, props)


_FROM_SPARK = {
    T.IntegerType(): INT32,
    T.LongType(): INT64,
    T.FloatType(): SINGLE,
    T.DoubleType(): DOUBLE,
    T.BooleanType(): BOOLEAN,
    T.StringType(): STRING,
    T.TimestampType(): DATETIME,
}


def _prop_from_field(field: T.StructField, is_key: bool = False) -> PropertySchema:
    dt = field.dataType
    if isinstance(dt, T.StructType):
        return PropertySchema(
            field.name,
            OBJECT,
            nested_properties=[_prop_from_field(f) for f in dt.fields],
        )
    if isinstance(dt, T.ArrayType):
        if isinstance(dt.elementType, T.StructType):
            return PropertySchema(
                field.name,
                ARRAY,
                is_filterable=True,
                nested_properties=[_prop_from_field(f) for f in dt.elementType.fields],
            )
        elem = _FROM_SPARK.get(dt.elementType, STRING)
        return PropertySchema(
            field.name, ARRAY, is_filterable=True, array_element_type=elem
        )
    if isinstance(dt, T.DecimalType):
        token = DECIMAL
    else:
        token = _FROM_SPARK.get(dt, STRING)
    return PropertySchema(
        field.name, token, is_key=is_key, is_filterable=True, is_sortable=True
    )


def prop(**kwargs) -> "dataclasses.Field":
    """Dataclass field marker for `schema_from_dataclass` — the Pythonic
    spelling of the reference's [ProjectionDocumentProperty(...)]
    attribute (ProjectionDocumentPropertyAttribute.cs:3-24).  kwargs are
    the PropertySchema capability/search-tuning names (is_key,
    is_searchable, searchable_boost, analyzer, synonym_maps, ...).

        @dataclasses.dataclass
        class OrderDoc:
            id: uuid.UUID = prop(is_key=True)
            name: str = prop(is_searchable=True, searchable_boost=2.0)
            internal_note: str = ""     # no prop() -> NOT projected

    A `default=` / `default_factory=` kwarg passes through to the
    underlying dataclasses.field."""
    field_kwargs = {}
    for k in ("default", "default_factory"):
        if k in kwargs:
            field_kwargs[k] = kwargs.pop(k)
    if not field_kwargs:
        field_kwargs["default"] = None
    return dataclasses.field(metadata={"projection": kwargs}, **field_kwargs)


_PY_SCALARS: dict = {}


def _py_type_token(tp) -> str:
    """Python annotation -> reference TypeCode token
    (ProjectionDocumentAttribute.GetPropertyTypeCode: CLR type -> TypeCode;
    Python ints are arbitrary-precision, so int -> Int64)."""
    global _PY_SCALARS
    if not _PY_SCALARS:
        import datetime as _dt
        import decimal as _dec
        import uuid as _uuid

        _PY_SCALARS = {
            int: INT64,
            float: DOUBLE,
            bool: BOOLEAN,
            str: STRING,
            _dt.datetime: DATETIME,
            _dec.Decimal: DECIMAL,
            _uuid.UUID: GUID,
        }
    return _PY_SCALARS.get(tp)


def schema_from_dataclass(cls, schema_name: Optional[str] = None) -> ProjectionSchema:
    """Build a ProjectionSchema from an annotated dataclass — the Pythonic
    mirror of `ProjectionDocumentSchemaFactory.FromTypeWithAttributes<T>()`
    (ProjectionDocumentSchemaFactory.cs:9-20).

    Reference semantics preserved:
      - only fields carrying the `prop(...)` marker participate; unmarked
        fields are skipped (the factory only collects decorated
        properties — GetAllProjectionProperties,
        ProjectionDocumentAttribute.cs:58-98 — which also subsumes the
        reference's never-used IgnorePropertyAttribute);
      - schema name defaults to the class name;
      - nested dataclasses recurse (IsNestedObject), `list[Nested]`
        recurses per element type (IsNestedArray), `list[scalar]` maps to
        a scalar array;
      - `Optional[X]` unwraps to X (reference nullability lives outside
        the type code).
    The result is an ordinary ProjectionSchema: `index_name` /
    `properties_hash` / repositories / translators all apply."""
    return ProjectionSchema(
        schema_name or cls.__name__, _props_from_dataclass(cls)
    )


def _props_from_dataclass(cls) -> list:
    """prop()-marked dataclass fields -> PropertySchema list (shared by
    the top-level schema and nested objects/arrays, which — as in the
    reference's nested dictionaries — carry no key property)."""
    import typing

    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls!r} is not a dataclass")
    hints = typing.get_type_hints(cls)
    props: list[PropertySchema] = []
    for f in dataclasses.fields(cls):
        marker = f.metadata.get("projection")
        if marker is None:
            continue
        tp = hints.get(f.name, f.type)
        origin = typing.get_origin(tp)
        # Optional[X] and the PEP 604 spelling X | None both unwrap
        if origin is typing.Union or isinstance(tp, types.UnionType):
            args = [a for a in typing.get_args(tp) if a is not type(None)]
            if len(args) == 1:
                tp = args[0]
                origin = typing.get_origin(tp)
        kwargs = dict(marker)
        if origin in (list, tuple):
            (elem,) = typing.get_args(tp)[:1] or (str,)
            if dataclasses.is_dataclass(elem):
                nested = _props_from_dataclass(elem)
                props.append(
                    PropertySchema(f.name, ARRAY,
                                   nested_properties=nested, **kwargs)
                )
            else:
                token = _py_type_token(elem)
                if token is None:
                    raise ValueError(
                        f"{cls.__name__}.{f.name}: unsupported array "
                        f"element type {elem!r}"
                    )
                props.append(
                    PropertySchema(f.name, ARRAY,
                                   array_element_type=token, **kwargs)
                )
        elif dataclasses.is_dataclass(tp):
            nested = _props_from_dataclass(tp)
            props.append(
                PropertySchema(f.name, OBJECT,
                               nested_properties=nested, **kwargs)
            )
        else:
            token = _py_type_token(tp)
            if token is None:
                raise ValueError(
                    f"{cls.__name__}.{f.name}: unsupported type {tp!r}"
                )
            props.append(PropertySchema(f.name, token, **kwargs))
    return props
