"""Oracle output-TYPE conformance — driver-parity lint (round-11 #1/#3).

Round 10's one real finding: three driver ``hash_match`` failures
(``markov_absorption_conversion``, ``ddsketch_price_quantiles``,
``haar_wavelet_topk``) were value-identical between engines but typed
differently — DuckDB ``sum()`` over BIGINT returns HUGEINT (int128),
and the driver's fetch path renders int128 differently from Spark's
int64 (``999061`` vs ``999061.0``), breaking the value hash while
rows/schema matched.  The builder's own ``scripts/check_correctness.py``
normalized values before hashing and could not see the class.

This module closes that inversion: it classifies the FINAL projection
types of a Spark plan (``DataFrame.schema`` — lazily compiled, never
executed) against its DuckDB oracle relation (``con.sql(sql).types`` —
bound, never executed) and reports divergences in two severities:

* ``hard`` — classes the driver's comparator is known (r10/r11) or
  expected to break on: any HUGEINT/UHUGEINT in the oracle output,
  DECIMAL anywhere in a final projection on EITHER side (r12
  hardening — the five r11 window failures were both-side
  DECIMAL(38,0): DuckDB's pandas fetch renders decimals as float64
  while Spark emits decimal.Decimal, so the driver hash breaks on
  render even at equal values), or an outright class mismatch
  (string vs int, list element class drift, ...).
* ``soft`` — divergences ten rounds of driver history prove tolerated:
  integer width (Spark INT vs DuckDB BIGINT — ``token_stats`` passed 10
  consecutive windows), FLOAT-vs-DOUBLE width.

Used by ``tests/test_oracle_types.py`` (catalog-wide hard-fail lint)
and ``scripts/check_correctness.py`` (the local driver stand-in now
fails a query on hard type divergence even when normalized values
match — mirroring the channel it stands in for).
"""

from __future__ import annotations

from pyspark.sql import types as T

# canonical class tree: tuples, head first.
#   ("int", "bigint")        — integer, width in [1]
#   ("float", "double")      — binary float, width in [1]
#   ("decimal", p, s)        — exact decimal
#   ("str",) ("bool",) ("date",) ("timestamp",) ("binary",)
#   ("hugeint",)             — DuckDB-only, always a hard finding
#   ("list", elem)           — element class in [1]
#   ("struct", ((name, cls), ...))
#   ("opaque", "<name>")     — anything unrecognized

_SPARK_INT_WIDTH = {
    T.ByteType: "tinyint",
    T.ShortType: "smallint",
    T.IntegerType: "integer",
    T.LongType: "bigint",
}


def spark_class(dt: T.DataType) -> tuple:
    for cls, width in _SPARK_INT_WIDTH.items():
        if isinstance(dt, cls):
            return ("int", width)
    if isinstance(dt, T.FloatType):
        return ("float", "float")
    if isinstance(dt, T.DoubleType):
        return ("float", "double")
    if isinstance(dt, T.DecimalType):
        return ("decimal", dt.precision, dt.scale)
    if isinstance(dt, T.StringType):
        return ("str",)
    if isinstance(dt, T.BooleanType):
        return ("bool",)
    if isinstance(dt, T.DateType):
        return ("date",)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return ("timestamp",)
    if isinstance(dt, T.BinaryType):
        return ("binary",)
    if isinstance(dt, T.ArrayType):
        return ("list", spark_class(dt.elementType))
    if isinstance(dt, T.StructType):
        return (
            "struct",
            tuple((f.name, spark_class(f.dataType)) for f in dt.fields),
        )
    return ("opaque", dt.simpleString())


_DUCK_INT = {
    "tinyint",
    "smallint",
    "integer",
    "bigint",
    "utinyint",
    "usmallint",
    "uinteger",
    "ubigint",
}


def duck_class(t) -> tuple:
    tid = t.id
    if tid in ("hugeint", "uhugeint"):
        return ("hugeint",)
    if tid in _DUCK_INT:
        return ("int", tid)
    if tid in ("float", "double"):
        return ("float", tid)
    if tid == "decimal":
        # str(DECIMAL(38,0)) — parse precision/scale from the render
        inner = str(t)[str(t).index("(") + 1 : -1]
        p, s = (int(x) for x in inner.split(","))
        return ("decimal", p, s)
    if tid == "varchar":
        return ("str",)
    if tid == "boolean":
        return ("bool",)
    if tid == "date":
        return ("date",)
    if tid.startswith("timestamp"):
        return ("timestamp",)
    if tid == "blob":
        return ("binary",)
    if tid == "list":
        return ("list", duck_class(t.children[0][1]))
    if tid == "struct":
        return ("struct", tuple((n, duck_class(c)) for n, c in t.children))
    return ("opaque", str(t))


def _fmt(cls: tuple) -> str:
    head = cls[0]
    if head in ("int", "float"):
        return cls[1]
    if head == "decimal":
        return f"decimal({cls[1]},{cls[2]})"
    if head == "list":
        return f"list<{_fmt(cls[1])}>"
    if head == "struct":
        return "struct<" + ",".join(f"{n}:{_fmt(c)}" for n, c in cls[1]) + ">"
    if head == "opaque":
        return cls[1]
    return head


def _compare(scls: tuple, dcls: tuple, path: str) -> list[tuple[str, str]]:
    issues: list[tuple[str, str]] = []
    if dcls[0] == "hugeint":
        issues.append(
            (
                "hard",
                f"{path}: oracle HUGEINT vs spark {_fmt(scls)} — the "
                "driver renders int128 differently from int64 (r10 class)",
            )
        )
        return issues
    # r12 hardening (r11 VERDICT #1): DECIMAL in a FINAL projection on
    # EITHER side is driver-render-unsafe, full stop.  DuckDB's pandas
    # fetch converts every decimal to float64 while Spark emits
    # decimal.Decimal objects; the driver's value hash then breaks on
    # render ("247" vs "247.0" for scale 0, "1.50" vs "1.5" on
    # trailing-zero cents) even when the values are identical — the
    # exact mechanism behind the five r11 DECIMAL(38,0) hash failures.
    # Final projections must emit BIGINT / DOUBLE / STRING instead
    # (keep decimal arithmetic INTERNAL; cast once at the end).
    if scls[0] == "decimal" or dcls[0] == "decimal":
        issues.append(
            (
                "hard",
                f"{path}: decimal in final projection — oracle "
                f"{_fmt(dcls)} vs spark {_fmt(scls)}; the driver "
                "renders decimals differently per engine (r11 class). "
                "Emit BIGINT (if it provably fits), DOUBLE (if "
                "value-exact), or a canonical digit string",
            )
        )
        return issues
    if scls[0] != dcls[0]:
        if {scls[0], dcls[0]} == {"decimal", "float"}:
            issues.append(
                (
                    "hard",
                    f"{path}: oracle {_fmt(dcls)} vs spark {_fmt(scls)} — "
                    "decimal-vs-binary-float output class",
                )
            )
        else:
            issues.append(
                (
                    "hard",
                    f"{path}: output class mismatch — oracle {_fmt(dcls)} "
                    f"vs spark {_fmt(scls)}",
                )
            )
        return issues
    head = scls[0]
    if head in ("int", "float") and scls[1] != dcls[1]:
        issues.append(
            ("soft", f"{path}: width — oracle {_fmt(dcls)} vs spark {_fmt(scls)}")
        )
    elif head == "list":
        issues.extend(_compare(scls[1], dcls[1], path + "[]"))
    elif head == "struct":
        dmap = dict(dcls[1])
        for name, sub in scls[1]:
            if name in dmap:
                issues.extend(_compare(sub, dmap[name], f"{path}.{name}"))
            else:
                issues.append(
                    ("hard", f"{path}.{name}: struct field missing in oracle")
                )
        for name in dmap:
            if name not in dict(scls[1]):
                issues.append(
                    ("hard", f"{path}.{name}: struct field missing in spark")
                )
    return issues


def divergences(
    spark_schema: T.StructType, duck_cols: list[str], duck_types: list
) -> tuple[list[str], list[str]]:
    """Compare a Spark output schema with a DuckDB relation's columns and
    types (both unexecuted).  Returns ``(hard, soft)`` divergence lists;
    an empty ``hard`` list means the pair is driver-type-conformant."""
    smap = {f.name: spark_class(f.dataType) for f in spark_schema.fields}
    hard: list[str] = []
    soft: list[str] = []
    seen = set()
    for col, dtyp in zip(duck_cols, duck_types):
        seen.add(col)
        if col not in smap:
            hard.append(f"{col}: column present only in the oracle")
            continue
        for severity, msg in _compare(smap[col], duck_class(dtyp), col):
            (hard if severity == "hard" else soft).append(msg)
    for col in smap:
        if col not in seen:
            hard.append(f"{col}: column present only in spark")
    return hard, soft
