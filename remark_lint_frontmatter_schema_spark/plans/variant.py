"""Spark-4 ``VariantType``-native helpers for the constraint compiler.

The engine's original semi-structured path binds JSON text to a declared
shape up front (``from_json`` to ``map<string,string>`` — SURVEY §2.1 S2)
and therefore inherits that shape's coercions: every value becomes a
string, so ``type: "number"`` on the JSON string ``"10"`` cannot be told
apart from the JSON number ``10``. Spark 4's ``VariantType`` keeps the
original JSON type of every value in an open binary encoding, which lets
the compiler enforce *exact Ajv/JSON-Schema type semantics* on
schema-free columns (the reference validates parsed YAML/JSON values
directly, so Ajv sees true JSON types — ``/root/reference/index.ts:322``;
this module restores that fidelity at table scale).

Design (consumed by ``plans/compiler.py``):

* **Per-row type tags.** ``schema_of_variant`` returns the value's own
  type per row (``STRING`` / ``BIGINT`` / ``DECIMAL(p,s)`` / ``DOUBLE`` /
  ``BOOLEAN`` / ``VOID`` / ``OBJECT<...>`` / ``ARRAY<...>``); the
  ``is_*`` predicates below turn those tags into JSON-Schema type tests.
  All pure JVM Catalyst expressions — no Python in the row path.
* **Null vs missing, exactly.** A missing path yields SQL ``NULL``
  (absent — value keywords are vacuous, ``required`` fires); a JSON
  ``null`` yields a present variant with tag ``VOID`` (``required`` is
  satisfied, ``type: "number"`` fires) — the distinction the
  ``map<string,string>`` path could not represent.
* **View rebinding.** Variant *object* nodes cast to a
  ``map<string,variant>`` view and variant *array* nodes to an
  ``array<variant>`` view (``try_variant_get`` with a complex target
  type); the compiler then reuses its existing, tested MapType/ArrayType
  keyword machinery — required / additionalProperties /
  patternProperties / propertyNames / items / contains — with variant
  children recursing back through this module. A non-object (non-array)
  value casts to NULL, which is exactly JSON Schema's "object/array
  keywords are vacuous on other types".

Scale: every helper is a scalar Catalyst expression over the variant
binary — evaluated where the row already is, no shuffle, no UDF; a
validation projection over a variant column stays a single map-only
stage like the typed-column path (plan-asserted in
``tests/test_variant.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # Spark >= 4.0
    from pyspark.sql.types import VariantType

    HAVE_VARIANT = True
except ImportError:  # pragma: no cover - pyspark 3.x fallback
    VariantType = None
    HAVE_VARIANT = False


def is_variant(dtype) -> bool:
    """True when ``dtype`` is Spark's VariantType (False on pyspark 3.x)."""
    return HAVE_VARIANT and isinstance(dtype, VariantType)


# ---------------------------------------------------------------------------
# per-row JSON type tags
# ---------------------------------------------------------------------------

# integral tags parse_json can emit plus the ones a cast-constructed
# variant column may carry (e.g. int32 column cast to variant)
_INT_TAGS = ("TINYINT", "SMALLINT", "INT", "BIGINT")
_FLOAT_TAGS = ("FLOAT", "DOUBLE")


def tag(col: Column) -> Column:
    """The value's own type tag, per row (``schema_of_variant``)."""
    return F.schema_of_variant(col)


# Every predicate takes an optional precomputed tag/view column. Variant
# expressions are CodegenFallback (the whole projection interprets), so a
# ruleset with k keyword checks would otherwise walk the variant binary
# O(k) times per row; the compiler stages tag/string/double ONCE in a
# lower projection (CompiledRuleset.staged) and passes the staged
# attributes here — measured 3x on the driver's variant query.

def is_string(col: Column, t: Column | None = None) -> Column:
    t = tag(col) if t is None else t
    return t == "STRING"


def is_boolean(col: Column, t: Column | None = None) -> Column:
    t = tag(col) if t is None else t
    return t == "BOOLEAN"


def is_object(col: Column, t: Column | None = None) -> Column:
    t = tag(col) if t is None else t
    return t.startswith("OBJECT")


def is_array(col: Column, t: Column | None = None) -> Column:
    t = tag(col) if t is None else t
    return t.startswith("ARRAY")


def is_json_null(col: Column, t: Column | None = None) -> Column:
    """JSON ``null`` — present, tag VOID (distinct from SQL NULL = missing)."""
    if t is not None:
        return t == "VOID"
    return F.is_variant_null(col)


def is_numeric(col: Column, t: Column | None = None) -> Column:
    """JSON number: ints tag as BIGINT/DECIMAL(p,0), decimals as
    DECIMAL(p,s), scientific notation as DOUBLE."""
    t = tag(col) if t is None else t
    return (t.isin(*_INT_TAGS, *_FLOAT_TAGS)) | t.startswith("DECIMAL")


def is_integer(col: Column, t: Column | None = None,
               d: Column | None = None) -> Column:
    """JSON Schema integer: any number with zero fractional part (6.0 and
    1e3 are integers). ``parse_json`` normalizes trailing zeros (``6.00``
    tags DECIMAL(1,0)) but scientific notation lands as DOUBLE, so the
    uniform test is floor-equality on the double view (documented
    precision caveat above 2^53, same as Ajv's JS-number semantics)."""
    d = as_double(col) if d is None else d
    return is_numeric(col, t) & (d == F.floor(d))


# ---------------------------------------------------------------------------
# typed views
# ---------------------------------------------------------------------------

def as_double(col: Column) -> Column:
    """Numeric view (NULL when not castable). Coercing — ALWAYS pair with
    ``is_numeric``: variant casts follow SQL rules, so ``"10"`` and
    ``true`` would cast silently (10.0 / 1.0) and break JSON typing."""
    return F.try_variant_get(col, "$", "double")


def as_string(col: Column) -> Column:
    """String view: bare value for scalars, JSON text for object/array —
    also the ``actual`` rendering for violation rows."""
    return F.try_variant_get(col, "$", "string")


def as_array(col: Column) -> Column:
    """``array<variant>`` view; NULL for non-arrays (array keywords are
    then vacuous, matching JSON Schema)."""
    return F.try_variant_get(col, "$", "array<variant>")


def as_object(col: Column) -> Column:
    """``map<string,variant>`` view; NULL for non-objects. A JSON-null
    field stays a PRESENT map entry (VOID variant value), so
    ``map_contains_key`` gives Ajv's ``required`` semantics exactly."""
    return F.try_variant_get(col, "$", "map<string,variant>")


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def child(col: Column, prop: str) -> Column:
    """One property step as a variant (missing -> SQL NULL)."""
    if _IDENT.match(prop):
        path = f"$.{prop}"
    else:  # bracket form for keys with dots/spaces/quotes
        path = "$['" + prop.replace("\\", "\\\\").replace("'", "\\'") + "']"
    return F.try_variant_get(col, path, "variant")


# ---------------------------------------------------------------------------
# JSON-value equality (enum / const)
# ---------------------------------------------------------------------------

def value_eq(col: Column, v, *, t: Column | None = None,
             s: Column | None = None, d: Column | None = None) \
        -> Column | None:
    """Typed equality of a variant against a Python JSON literal.

    Variant has no Catalyst ordering (``=`` on variant is an analysis
    error), so equality goes through the tag guard + typed view per
    literal class. Returns None for composite literals (object/array
    enum members) — the caller records those as ``unknown`` rather than
    guessing a canonical form (JSON object equality is key-order
    insensitive; a serialized compare would not be)."""
    sv = as_string(col) if s is None else s
    dv = as_double(col) if d is None else d
    if isinstance(v, bool):  # before int: bool is an int subclass
        return is_boolean(col, t) & (sv == ("true" if v else "false"))
    if isinstance(v, (int, float)):
        return is_numeric(col, t) & (dv == float(v))
    if isinstance(v, str):
        return is_string(col, t) & (sv == v)
    if v is None:
        return is_json_null(col, t)
    return None


def type_ok(col: Column, name: str, *, t: Column | None = None,
            d: Column | None = None) -> Column | None:
    """JSON-Schema ``type`` test on a variant value; None for names the
    spec does not define (shape-walk rejects those upstream)."""
    if name == "string":
        return is_string(col, t)
    if name == "number":
        return is_numeric(col, t)
    if name == "integer":
        return is_integer(col, t, d)
    if name == "boolean":
        return is_boolean(col, t)
    if name == "object":
        return is_object(col, t)
    if name == "array":
        return is_array(col, t)
    if name == "null":
        return is_json_null(col, t)
    return None
