"""Scalar dictGet* family over a named-dictionary catalog.

Reference: src/Functions/FunctionsExternalDictionaries.cpp (dictGet,
dictGetOrDefault, dictGetOrNull, dictHas, typed dictGet<Type> +
OrDefault variants registered in registerFunctionsExternalDictionaries),
hierarchy functions in src/Functions/FunctionsExternalDictionaries.h
(dictGetHierarchy / dictGetChildren / dictGetDescendants / dictIsIn).

ClickHouse dictionaries are in-RAM on every server by contract
(src/Dictionaries/ — flat/hashed/cache layouts); the scalar function form
is a hash probe against that resident table. The Spark-idiomatic analogue
for the *scalar* form is a literal `create_map` lookup: the map is baked
into the plan (broadcast-equivalent, whole-stage codegen, zero shuffle).
For dimension tables too large to inline, `sources.dictionaries.Dictionary`
provides the broadcast-join form — same cost model, join shape.

A size guard (default 100k entries) keeps the literal plan bounded; beyond
it, callers are pointed at the join form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col

_DICTS: dict[str, "_LoadedDict"] = {}

_MAX_INLINE = 100_000

# CH hierarchy depth bound for the expression-side ancestor walk; ClickHouse
# walks until the root (parent == 0); real hierarchies (regions, categories)
# are shallow. Documented limit, raise if you nest deeper.
_HIER_DEPTH = 16


class _LoadedDict:
    def __init__(self, name: str, rows: list[dict], key: str, parent_attr: str | None):
        self.name = name
        self.key = key
        self.parent_attr = parent_attr
        self.by_key: dict[object, dict] = {r[key]: r for r in rows}

    def attr_map(self, attr: str) -> dict[object, object]:
        return {k: r.get(attr) for k, r in self.by_key.items() if r.get(attr) is not None}


def register_dictionary(
    name: str,
    source: DataFrame,
    key: str,
    parent_attr: str | None = None,
    max_rows: int = _MAX_INLINE,
) -> None:
    """CREATE DICTIONARY analogue: collect a small dimension to the driver
    so dictGet* can inline it as a literal map (the scalar-probe shape).

    ClickHouse loads the whole dictionary into RAM on every node
    (src/Dictionaries/HashedDictionary.h); this is the same contract. The
    guard refuses > max_rows — use sources.dictionaries.Dictionary (broadcast
    join) for big dims.
    """
    rows = source.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"dictionary {name!r} exceeds {max_rows} rows; use "
            "sources.dictionaries.Dictionary (broadcast join) instead"
        )
    _DICTS[name] = _LoadedDict(name, [r.asDict() for r in rows], key, parent_attr)


def drop_dictionary(name: str) -> None:
    _DICTS.pop(name, None)


def _resolve(name) -> _LoadedDict:
    # Accept 'dict' or 'db.dict' (ClickHouse qualifies; we flatten).
    key = str(name)
    if key not in _DICTS and "." in key:
        key = key.split(".", 1)[1]
    if key not in _DICTS:
        raise KeyError(f"unknown dictionary {name!r}; register_dictionary() first")
    return _DICTS[key]


def _literal_map(mapping: dict[object, object]) -> Column | None:
    if not mapping:
        return None
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def _lookup(dict_name, attr, key_expr) -> Column:
    d = _resolve(dict_name)
    m = _literal_map(d.attr_map(str(attr)))
    if m is None:
        return F.lit(None)
    return m[col(key_expr)]


@chfn("dictGetOrNull")
def dictGetOrNull(dict_name, attr, key_expr) -> Column:
    """dictGetOrNull('dict', 'attr', key): NULL when the key is absent."""
    return _lookup(dict_name, attr, key_expr)


@chfn("dictGet")
def dictGet(dict_name, attr, key_expr) -> Column:
    """dictGet('dict', 'attr', key): absent keys yield the attribute's
    type-default (0 / '' / epoch), matching non-nullable CH attributes."""
    v = _lookup(dict_name, attr, key_expr)
    d = _resolve(dict_name)
    sample = next(iter(d.attr_map(str(attr)).values()), None)
    return F.coalesce(v, F.lit(_type_default(sample)))


@chfn("dictGetOrDefault")
def dictGetOrDefault(dict_name, attr, key_expr, default) -> Column:
    v = _lookup(dict_name, attr, key_expr)
    return F.coalesce(v, col(default) if isinstance(default, Column) else F.lit(default))


@chfn("dictHas")
def dictHas(dict_name, key_expr) -> Column:
    d = _resolve(dict_name)
    keys = list(d.by_key)
    if not keys:
        return F.lit(False).cast("int")
    return col(key_expr).isin(keys).cast("int")


def _type_default(sample):
    import datetime

    if isinstance(sample, bool):
        return False
    if isinstance(sample, int):
        return 0
    if isinstance(sample, float):
        return 0.0
    if isinstance(sample, datetime.datetime):
        return datetime.datetime(1970, 1, 1)
    if isinstance(sample, datetime.date):
        return datetime.date(1970, 1, 1)
    if isinstance(sample, (bytes, bytearray)):
        return b""
    return ""


# --- typed getters --------------------------------------------------------
# ClickHouse registers one function per attribute type plus an OrDefault
# twin (FunctionsExternalDictionaries.cpp registerFunction<...> sites).
# Each is the untyped probe + the target cast + that type's default.

_TYPED: dict[str, tuple[str, object]] = {
    "String": ("string", ""),
    "UInt8": ("int", 0),
    "UInt16": ("int", 0),
    "UInt32": ("long", 0),
    "UInt64": ("long", 0),
    "Int8": ("tinyint", 0),
    "Int16": ("smallint", 0),
    "Int32": ("int", 0),
    "Int64": ("long", 0),
    "Float32": ("float", 0.0),
    "Float64": ("double", 0.0),
    "Date": ("date", "1970-01-01"),
    "DateTime": ("timestamp", "1970-01-01 00:00:00"),
    "UUID": ("string", "00000000-0000-0000-0000-000000000000"),
    "IPv4": ("long", 0),
    "IPv6": ("string", "::"),
}


def _make_typed(tname: str, spark_type: str, default):
    def getter(dict_name, attr, key_expr) -> Column:
        v = _lookup(dict_name, attr, key_expr).cast(spark_type)
        return F.coalesce(v, F.lit(default).cast(spark_type))

    def getter_or_default(dict_name, attr, key_expr, dflt) -> Column:
        v = _lookup(dict_name, attr, key_expr).cast(spark_type)
        dc = dflt if isinstance(dflt, Column) else F.lit(dflt)
        return F.coalesce(v, dc.cast(spark_type))

    getter.__name__ = f"dictGet{tname}"
    getter.__doc__ = f"dictGet{tname}('dict','attr',key) → {spark_type}."
    getter_or_default.__name__ = f"dictGet{tname}OrDefault"
    chfn(f"dictGet{tname}")(getter)
    chfn(f"dictGet{tname}OrDefault")(getter_or_default)
    return getter, getter_or_default


for _t, (_st, _d) in _TYPED.items():
    _g, _gd = _make_typed(_t, _st, _d)
    globals()[_g.__name__] = _g
    globals()[_gd.__name__] = _gd


# --- hierarchy ------------------------------------------------------------


def _parent_map(d: _LoadedDict) -> dict[object, object]:
    if not d.parent_attr:
        raise ValueError(f"dictionary {d.name!r} registered without parent_attr")
    return d.attr_map(d.parent_attr)


@chfn("dictGetHierarchy")
def dictGetHierarchy(dict_name, key_expr) -> Column:
    """dictGetHierarchy('dict', key) → array of key + ancestors up to the
    root (parent = 0/NULL terminates), bounded at 16 levels (expression-side
    walk; mirrors the in-RAM parent-pointer chase of HierarchyDictionariesUtils.h)."""
    d = _resolve(dict_name)
    pm = _literal_map(_parent_map(d))
    cur = col(key_expr)
    steps = [cur]
    for _ in range(_HIER_DEPTH - 1):
        cur = pm[cur] if pm is not None else F.lit(None)
        steps.append(cur)
    arr = F.array(*steps)
    return F.filter(arr, lambda x: x.isNotNull() & (x != F.lit(0)))


@chfn("dictIsIn")
def dictIsIn(dict_name, child_expr, ancestor_expr) -> Column:
    """dictIsIn('dict', child, ancestor): ancestor ∈ hierarchy(child)."""
    return F.array_contains(dictGetHierarchy(dict_name, child_expr), col(ancestor_expr)).cast(
        "int"
    )


@chfn("dictGetChildren")
def dictGetChildren(dict_name, key_expr) -> Column:
    """Immediate children: driver-side inversion of the parent map into a
    key → array-of-children literal map."""
    d = _resolve(dict_name)
    children: dict[object, list] = {}
    for k, p in _parent_map(d).items():
        children.setdefault(p, []).append(k)
    if not children:
        return F.array().cast("array<long>")
    pairs: list[Column] = []
    for p, kids in children.items():
        pairs.append(F.lit(p))
        pairs.append(F.array(*[F.lit(k) for k in sorted(kids, key=str)]))
    m = F.create_map(*pairs)
    return F.coalesce(m[col(key_expr)], F.array().cast("array<long>"))


@chfn("dictGetDescendants")
def dictGetDescendants(dict_name, key_expr, level=0) -> Column:
    """All descendants (level=0) or exactly `level` generations down —
    BFS over the driver-resident parent map, emitted as a literal map."""
    d = _resolve(dict_name)
    children: dict[object, list] = {}
    for k, p in _parent_map(d).items():
        children.setdefault(p, []).append(k)
    lvl = int(level) if not isinstance(level, Column) else 0
    desc: dict[object, list] = {}
    for start in d.by_key:
        out: list = []
        frontier = [start]
        depth = 0
        while frontier and (lvl == 0 or depth < lvl):
            frontier = [c for node in frontier for c in children.get(node, [])]
            depth += 1
            if lvl == 0:
                out.extend(frontier)
            elif depth == lvl:
                out = list(frontier)
        desc[start] = out
    pairs: list[Column] = []
    for k, v in desc.items():
        pairs.append(F.lit(k))
        pairs.append(F.array(*[F.lit(x) for x in sorted(v, key=str)]) if v else F.array().cast("array<long>"))
    if not pairs:
        return F.array().cast("array<long>")
    m = F.create_map(*pairs)
    return F.coalesce(m[col(key_expr)], F.array().cast("array<long>"))
