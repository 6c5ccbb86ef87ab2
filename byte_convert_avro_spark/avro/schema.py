"""Avro schema parsing — public Avro specification, "Schema Declaration".

Produces a small tree of :class:`AvroSchema` nodes.  Supports the full
generic surface the reference handles via ``GenericDatumReader``
(AvroTransform.java:241): primitives, records, enums, arrays, maps, unions,
fixed, named-type references, aliases, defaults, and logical-type
annotations (carried through untouched — the reference uses the *generic*
datum reader with no logical-type conversions, so we decode raw base types).
"""

from __future__ import annotations

import json
from typing import Any

PRIMITIVES = frozenset(
    {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}
)

# Attributes that are structural (consumed by the parser); everything else
# (logicalType, precision, scale, doc, ...) is carried in `extras` so the
# canonical string round-trips the way Avro's Schema.toString() does.
_STRUCTURAL = {
    "type", "name", "namespace", "fields", "symbols", "items", "values",
    "size", "default", "aliases", "order",
}


class AvroSchema:
    """One node of a parsed Avro schema.

    kind ∈ {primitive, record, enum, array, map, union, fixed, ref}
    """

    __slots__ = (
        "kind", "name", "namespace", "fields", "symbols", "items",
        "values", "size", "extras", "aliases", "_fullname",
    )

    def __init__(self, kind: str, **kw: Any) -> None:
        self.kind = kind
        self.name = kw.get("name")
        self.namespace = kw.get("namespace")
        self.fields = kw.get("fields")      # list[Field] for records
        self.symbols = kw.get("symbols")    # list[str] for enums
        self.items = kw.get("items")        # AvroSchema for arrays
        self.values = kw.get("values")      # AvroSchema for maps
        self.size = kw.get("size")          # int for fixed
        self.extras = kw.get("extras") or {}
        self.aliases = kw.get("aliases")
        self._fullname = None

    @property
    def fullname(self) -> str:
        if self._fullname is None:
            if self.namespace and "." not in (self.name or ""):
                self._fullname = f"{self.namespace}.{self.name}"
            else:
                self._fullname = self.name or self.kind
        return self._fullname

    # -- union branch label, per the Avro JSON-encoding spec ---------------
    @property
    def union_label(self) -> str:
        if self.kind == "primitive":
            return self.name  # type: ignore[return-value]
        if self.kind in ("record", "enum", "fixed"):
            return self.fullname
        return self.kind  # "array" / "map"

    # -- canonical-ish JSON (mimics org.apache.avro.Schema#toString) -------
    def to_json_obj(self, *, _seen: set[str] | None = None) -> Any:
        seen = _seen if _seen is not None else set()
        k = self.kind
        if k == "primitive":
            return self.name
        if k == "ref":
            return self.name
        if k == "union":
            return [b.to_json_obj(_seen=seen) for b in self.fields]  # type: ignore[union-attr]
        if k == "array":
            return {"type": "array", "items": self.items.to_json_obj(_seen=seen), **self.extras}
        if k == "map":
            return {"type": "map", "values": self.values.to_json_obj(_seen=seen), **self.extras}
        # named types
        if self.fullname in seen:
            return self.fullname
        seen.add(self.fullname)
        out: dict[str, Any] = {"type": k, "name": self.name}
        if self.namespace:
            out["namespace"] = self.namespace
        if k == "record":
            flds = []
            for f in self.fields:  # type: ignore[union-attr]
                fo: dict[str, Any] = {"name": f.name, "type": f.type.to_json_obj(_seen=seen)}
                if f.has_default:
                    fo["default"] = f.default
                if f.aliases:
                    fo["aliases"] = f.aliases
                fo.update(f.extras)
                flds.append(fo)
            out["fields"] = flds
        elif k == "enum":
            out["symbols"] = self.symbols
        elif k == "fixed":
            out["size"] = self.size
        if self.aliases:
            out["aliases"] = self.aliases
        out.update(self.extras)
        return out

    def canonical_str(self) -> str:
        """Compact JSON string, key order matching Avro's Schema.toString()
        (used for the envelope's ``originSchema`` — the reference emits
        ``schema.toString()``; golden pin TransformTest.java:508)."""
        return json.dumps(self.to_json_obj(), separators=(",", ":"), ensure_ascii=False)


class Field:
    __slots__ = ("name", "type", "default", "has_default", "aliases", "extras")

    def __init__(self, name: str, type_: AvroSchema, default: Any = None,
                 has_default: bool = False, aliases: list[str] | None = None,
                 extras: dict | None = None) -> None:
        self.name = name
        self.type = type_
        self.default = default
        self.has_default = has_default
        self.aliases = aliases
        self.extras = extras or {}


def parse_schema(schema: str | dict | list) -> AvroSchema:
    """Parse a schema given as JSON text or already-loaded JSON."""
    if isinstance(schema, (str, bytes)):
        s = schema.strip()
        # Bare primitive name without quotes is accepted by some registries.
        if s and not s.startswith(("{", "[", '"')):
            obj: Any = s
        else:
            obj = json.loads(s)
    else:
        obj = schema
    names: dict[str, AvroSchema] = {}
    parsed = _parse(obj, None, names)
    _resolve_refs(parsed, names, set())
    return parsed


def _parse(obj: Any, namespace: str | None, names: dict[str, AvroSchema]) -> AvroSchema:
    if isinstance(obj, str):
        if obj in PRIMITIVES:
            return AvroSchema("primitive", name=obj)
        full = obj if "." in obj else (f"{namespace}.{obj}" if namespace else obj)
        if full in names:
            return names[full]
        if obj in names:
            return names[obj]
        return AvroSchema("ref", name=obj, namespace=namespace)
    if isinstance(obj, list):
        branches = [_parse(b, namespace, names) for b in obj]
        u = AvroSchema("union")
        u.fields = branches  # reuse slot for branches
        return u
    if not isinstance(obj, dict):
        raise ValueError(f"unparseable Avro schema fragment: {obj!r}")

    t = obj.get("type")
    extras = {k: v for k, v in obj.items() if k not in _STRUCTURAL}
    if isinstance(t, (dict, list)):
        # e.g. {"type": {"type": "array", ...}} wrapper
        inner = _parse(t, namespace, names)
        inner.extras.update(extras)
        return inner
    if t in PRIMITIVES:
        return AvroSchema("primitive", name=t, extras=extras)
    if t == "array":
        return AvroSchema("array", items=_parse(obj["items"], namespace, names), extras=extras)
    if t == "map":
        return AvroSchema("map", values=_parse(obj["values"], namespace, names), extras=extras)
    if t in ("record", "error", "enum", "fixed"):
        name = obj["name"]
        ns = obj.get("namespace", namespace if "." not in name else None)
        if t == "enum" and "default" in obj:
            # enum-level default is semantic (schema-resolution fallback
            # symbol) and part of Schema.toString() — keep it, unlike
            # field-level defaults which live on Field
            extras = {**extras, "default": obj["default"]}
        node = AvroSchema(
            "record" if t == "error" else t,
            name=name, namespace=ns,
            symbols=obj.get("symbols"), size=obj.get("size"),
            aliases=obj.get("aliases"), extras=extras,
        )
        names[node.fullname] = node
        names.setdefault(node.name, node)
        if node.kind == "record":
            node.fields = [
                Field(
                    f["name"],
                    _parse(f["type"], ns, names),
                    default=f.get("default"),
                    has_default="default" in f,
                    aliases=f.get("aliases"),
                    extras={k: v for k, v in f.items() if k not in _STRUCTURAL},
                )
                for f in obj["fields"]
            ]
        return node
    raise ValueError(f"unknown Avro type: {t!r}")


def _resolve_refs(node: AvroSchema, names: dict[str, AvroSchema], seen: set[int]) -> None:
    if id(node) in seen:
        return
    seen.add(id(node))
    if node.kind == "record":
        for f in node.fields or []:
            f.type = _deref(f.type, names)
            _resolve_refs(f.type, names, seen)
    elif node.kind == "union":
        node.fields = [_deref(b, names) for b in node.fields or []]
        for b in node.fields:
            _resolve_refs(b, names, seen)
    elif node.kind == "array":
        node.items = _deref(node.items, names)
        _resolve_refs(node.items, names, seen)
    elif node.kind == "map":
        node.values = _deref(node.values, names)
        _resolve_refs(node.values, names, seen)


def _deref(node: AvroSchema, names: dict[str, AvroSchema]) -> AvroSchema:
    if node.kind != "ref":
        return node
    full = node.name if "." in (node.name or "") else (
        f"{node.namespace}.{node.name}" if node.namespace else node.name
    )
    target = names.get(full) or names.get(node.name or "")
    if target is None:
        raise ValueError(f"unresolved Avro named-type reference: {node.name!r}")
    return target
