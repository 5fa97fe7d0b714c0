"""Declarative predicate expressions → vectorized Arrow kernels.

This is the engine's instruction set: the analog of the Blaze compiler's
keyword→instruction mapping
(``/root/reference/vendor/blaze/src/compiler/default_compiler.cc:57-640``)
and the 103-opcode evaluator
(``/root/reference/vendor/blaze/src/evaluator/include/sourcemeta/blaze/evaluator_instruction.h:22-123``)
re-expressed columnar: every predicate spec (a JSON-serializable dict)
compiles once — on the driver or in an actor's ``__init__`` — to a
function ``pa.Table -> np.ndarray[bool]`` built from pyarrow.compute
kernels. Logical combinators are boolean column algebra (no
short-circuit needed in columnar form; see SURVEY.md §2.2).

Null semantics (fixed, mirrored by the test oracle): any comparison,
regex, format or membership test on a null value is **False** (the
value does not satisfy the predicate); use ``is_null`` / ``not_null``
to test nullness explicitly. This mirrors JSON Schema's behavior where
a type assertion fails on a missing/mismatched value.

Reference instruction families covered here:
  - AssertionEqual / AssertionEqualsAny(+StringHash)  -> eq / is_in
  - AssertionGreater(Equal)/Less(Equal), *Bounded      -> gt/ge/lt/le/between
  - AssertionRegex                                     -> regex
  - AssertionStringSizeLess/Greater, *StringBounded    -> utf8_len
  - AssertionStringType (21 formats)                   -> format
  - AssertionType / TypeStrict (int/real duality)      -> type
  - AssertionDivisible                                 -> divisible
  - AssertionDefines / required                        -> not_null (struct fields are columns)
  - LogicalAnd/Or/Not/Xor/Condition                    -> and/or/not/one_of/if
  - AssertionFail / true schema                        -> const
"""

from __future__ import annotations

import math
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.functions.formats import check_format

Kernel = Callable[[pa.Table], np.ndarray]


def _col(table: pa.Table, name: str) -> pa.Array:
    arr = table.column(name)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _to_bool(mask: pa.Array | pa.ChunkedArray) -> np.ndarray:
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return mask.fill_null(False).to_numpy(zero_copy_only=False)


def _int_fits(v: int, typ: pa.DataType) -> bool:
    """Whether integer ``v`` is representable in Arrow integer type ``typ``."""
    bits = typ.bit_width
    if pa.types.is_unsigned_integer(typ):
        return 0 <= v < (1 << bits)
    return -(1 << (bits - 1)) <= v < (1 << (bits - 1))


def _cmp(op: str) -> Callable[..., Any]:
    return {
        "eq": pc.equal, "ne": pc.not_equal,
        "gt": pc.greater, "ge": pc.greater_equal,
        "lt": pc.less, "le": pc.less_equal,
    }[op]


def compile_predicate(spec: dict[str, Any]) -> Kernel:
    """Compile a predicate spec to a vectorized kernel.

    Compilation happens once per plan per actor; the returned closure is
    the per-batch hot path and does no spec interpretation.
    """
    op = spec["op"]

    if op == "const":
        value = bool(spec["value"])
        return lambda t: np.full(len(t), value, dtype=bool)

    if op in ("and", "or"):
        kernels = [compile_predicate(s) for s in spec["args"]]
        combine = np.logical_and if op == "and" else np.logical_or
        def k_logic(t: pa.Table) -> np.ndarray:
            out = kernels[0](t)
            for k in kernels[1:]:
                out = combine(out, k(t))
            return out
        return k_logic

    if op == "not":
        inner = compile_predicate(spec["arg"])
        return lambda t: ~inner(t)

    if op == "one_of":  # oneOf: exactly one branch true
        kernels = [compile_predicate(s) for s in spec["args"]]
        def k_one(t: pa.Table) -> np.ndarray:
            counts = np.zeros(len(t), dtype=np.int32)
            for k in kernels:
                counts += k(t)
            return counts == 1
        return k_one

    if op == "if":  # if/then/else — masked application
        cond = compile_predicate(spec["cond"])
        then = compile_predicate(spec["then"]) if "then" in spec else None
        els = compile_predicate(spec["else"]) if "else" in spec else None
        def k_if(t: pa.Table) -> np.ndarray:
            c = cond(t)
            out = np.ones(len(t), dtype=bool)
            if then is not None:
                out &= ~c | then(t)
            if els is not None:
                out &= c | els(t)
            return out
        return k_if

    field = spec["field"]

    if op == "is_null":
        return lambda t: _to_bool(pc.is_null(_col(t, field)))
    if op == "not_null":
        return lambda t: _to_bool(pc.is_valid(_col(t, field)))

    if op in ("eq", "ne", "gt", "ge", "lt", "le"):
        value, fn = spec["value"], _cmp(op)
        return lambda t: _to_bool(fn(_col(t, field), value))

    if op == "between":  # fused bounded compare (AssertionTypeIntegerBounded et al.)
        lo, hi = spec.get("min"), spec.get("max")
        def k_between(t: pa.Table) -> np.ndarray:
            arr = _col(t, field)
            mask = pc.is_valid(arr)
            if lo is not None:
                mask = pc.and_(mask, pc.greater_equal(arr, lo))
            if hi is not None:
                mask = pc.and_(mask, pc.less_equal(arr, hi))
            return _to_bool(mask)
        return k_between

    if op == "is_in":
        if not spec["values"]:
            # empty enum: nothing matches (a null-typed pa.array([])
            # would crash pc.is_in against a typed column)
            return lambda t: np.zeros(len(t), dtype=bool)
        vals = spec["values"]
        if all(isinstance(v, (int, float)) and not isinstance(v, bool)
               for v in vals):
            # Numeric sets dispatch on the COLUMN type at kernel time.
            # Float columns use an equality chain (Arrow set lookup is
            # bitwise: an int64 value-set misses a float column, and
            # -0.0 misses 0.0, while JSON equality is numeric). Integer
            # columns must stay EXACT: casting to float would silently
            # round values outside ±2^53 (and pc.equal(int64, double)
            # promotes the column, raising ArrowInvalid on huge ints),
            # so they use pc.is_in over an integer value-set. Boolean
            # and non-numeric columns never equal a JSON number.
            int_vals = sorted({
                int(v) for v in vals
                if isinstance(v, int) or float(v).is_integer()
            })
            # a double equals integer v only when v is exactly
            # representable as a double; drop the rest from the chain
            float_vals = sorted({
                float(v) for v in vals
                if not isinstance(v, int) or int(float(v)) == v
            })

            def k_in_num(t: pa.Table, _iv=int_vals, _fv=float_vals):
                col = _col(t, field)
                typ = col.type
                if pa.types.is_integer(typ):
                    fits = [v for v in _iv
                            if _int_fits(v, typ)]
                    if not fits:
                        return np.zeros(len(t), dtype=bool)
                    return _to_bool(pc.is_in(
                        col, value_set=pa.array(fits, type=typ)))
                if pa.types.is_floating(typ):
                    acc = None
                    for v in _fv:
                        hit = pc.equal(col, v)
                        acc = hit if acc is None else pc.or_(acc, hit)
                    if acc is None:
                        return np.zeros(len(t), dtype=bool)
                    return _to_bool(acc)
                # bool / string / list / … — a JSON number equals none
                return np.zeros(len(t), dtype=bool)
            return k_in_num
        values = pa.array(vals)
        return lambda t: _to_bool(pc.is_in(_col(t, field), value_set=values))

    if op == "regex":  # anchored full match, RE2 semantics
        pattern = rf"^({spec['pattern']})$"
        return lambda t: _to_bool(pc.match_substring_regex(_col(t, field), pattern))

    if op == "regex_search":  # unanchored search — JSON Schema `pattern`
        pattern = spec["pattern"]
        return lambda t: _to_bool(pc.match_substring_regex(_col(t, field), pattern))

    if op == "starts_with":
        prefix = spec["value"]
        return lambda t: _to_bool(pc.starts_with(_col(t, field), prefix))
    if op == "ends_with":
        suffix = spec["value"]
        return lambda t: _to_bool(pc.ends_with(_col(t, field), suffix))
    if op == "contains":
        sub = spec["value"]
        return lambda t: _to_bool(pc.match_substring(_col(t, field), sub))

    if op == "utf8_len":  # unicode code points, like the reference's core/unicode
        lo, hi = spec.get("min"), spec.get("max")
        def k_len(t: pa.Table) -> np.ndarray:
            n = pc.utf8_length(_col(t, field))
            mask = pc.is_valid(n)
            if lo is not None:
                mask = pc.and_(mask, pc.greater_equal(n, lo))
            if hi is not None:
                mask = pc.and_(mask, pc.less_equal(n, hi))
            return _to_bool(mask)
        return k_len

    if op == "format":
        fmt = spec["format"]
        return lambda t: check_format(_col(t, field), fmt)

    if op == "divisible":  # multipleOf with float tolerance
        by = spec["by"]
        def k_div(t: pa.Table) -> np.ndarray:
            vals = _col(t, field).to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(invalid="ignore"):
                q = vals / by
                ok = np.isclose(q, np.round(q), rtol=0.0, atol=1e-9)
            ok[~np.isfinite(vals)] = False  # nan AND ±inf never divisible
            return ok
        return k_div

    if op == "type":
        return _compile_type(field, spec["type"], strict=spec.get("strict", False))

    raise ValueError(f"unknown predicate op: {op!r}")


def _compile_type(field: str, want: str, strict: bool) -> Kernel:
    """JSON type assertion with the Integer/Real duality.

    The reference keeps Integer (int64) distinct from Real (double)
    (``/root/reference/vendor/core/src/core/json/include/sourcemeta/core/json_value.h:69-83``)
    and, in modern dialects, ``type: "integer"`` matches reals with zero
    fraction (loose mode); ``strict=True`` requires the exact storage
    type (AssertionTypeStrict). Arrow column types are static, so most of
    this resolves at compile time; the per-value part is nullness and the
    zero-fraction check on float columns.
    """
    def k_type(t: pa.Table) -> np.ndarray:
        arr = _col(t, field)
        typ = arr.type
        valid = _to_bool(pc.is_valid(arr))
        if want == "null":
            return ~valid
        if want == "string":
            return valid if pa.types.is_string(typ) or pa.types.is_large_string(typ) \
                else np.zeros(len(arr), dtype=bool)
        if want == "boolean":
            return valid if pa.types.is_boolean(typ) else np.zeros(len(arr), dtype=bool)
        if want == "integer":
            if pa.types.is_integer(typ):
                return valid
            if pa.types.is_floating(typ) and not strict:
                vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
                with np.errstate(invalid="ignore"):
                    whole = np.floor(vals) == vals
                whole[~np.isfinite(vals)] = False
                return valid & whole
            return np.zeros(len(arr), dtype=bool)
        if want == "number":
            return valid if pa.types.is_integer(typ) or pa.types.is_floating(typ) \
                else np.zeros(len(arr), dtype=bool)
        if want == "array":
            return valid if pa.types.is_list(typ) or pa.types.is_large_list(typ) \
                else np.zeros(len(arr), dtype=bool)
        if want == "object":
            return valid if pa.types.is_struct(typ) or pa.types.is_map(typ) \
                else np.zeros(len(arr), dtype=bool)
        raise ValueError(f"unknown type assertion: {want!r}")
    return k_type


def evaluate_predicate_python(spec: dict[str, Any], row: dict[str, Any]) -> bool:
    """Reference (slow-path) evaluation of a predicate on one Python row.

    Used by the test oracle and by the driver-side ``metaschema`` verb to
    self-check compiled kernels — an independent implementation, kept
    deliberately simple. Must agree with `compile_predicate` on every
    input (property-tested).
    """
    import re as _re

    op = spec["op"]
    if op == "const":
        return bool(spec["value"])
    if op == "and":
        return all(evaluate_predicate_python(s, row) for s in spec["args"])
    if op == "or":
        return any(evaluate_predicate_python(s, row) for s in spec["args"])
    if op == "not":
        return not evaluate_predicate_python(spec["arg"], row)
    if op == "one_of":
        return sum(evaluate_predicate_python(s, row) for s in spec["args"]) == 1
    if op == "if":
        c = evaluate_predicate_python(spec["cond"], row)
        if c:
            return evaluate_predicate_python(spec["then"], row) if "then" in spec else True
        return evaluate_predicate_python(spec["else"], row) if "else" in spec else True

    v = row.get(spec["field"])
    if op == "is_null":
        return v is None
    if op == "not_null":
        return v is not None
    if op == "type" and spec["type"] == "null":
        # must precede the None guard: type:'null' VALIDATES null values
        # (matches the compiled kernel's `~valid` semantics)
        return v is None
    if v is None:
        return False
    if op == "eq":
        return v == spec["value"]
    if op == "ne":
        return v != spec["value"]
    if op == "gt":
        return v > spec["value"]
    if op == "ge":
        return v >= spec["value"]
    if op == "lt":
        return v < spec["value"]
    if op == "le":
        return v <= spec["value"]
    if op == "between":
        lo, hi = spec.get("min"), spec.get("max")
        return (lo is None or v >= lo) and (hi is None or v <= hi)
    if op == "is_in":
        # Arrow's is_in is type-strict: a boolean never matches an
        # integer value set (Python's `in` would say False in [0] is
        # True — JSON semantics side with Arrow here)
        return any(isinstance(v, bool) == isinstance(x, bool) and v == x
                   for x in spec["values"])
    if op == "regex":
        return _re.fullmatch(spec["pattern"], v) is not None
    if op == "regex_search":
        return _re.search(spec["pattern"], v) is not None
    if op == "starts_with":
        return isinstance(v, str) and v.startswith(spec["value"])
    if op == "ends_with":
        return isinstance(v, str) and v.endswith(spec["value"])
    if op == "contains":
        return isinstance(v, str) and spec["value"] in v
    if op == "utf8_len":
        lo, hi = spec.get("min"), spec.get("max")
        n = len(v)
        return (lo is None or n >= lo) and (hi is None or n <= hi)
    if op == "format":
        from jsonschema_ray.functions.formats import check_format_value
        return check_format_value(v, spec["format"])
    if op == "divisible":
        q = v / spec["by"]
        if not math.isfinite(q):
            return False
        return math.isclose(q, round(q), rel_tol=0.0, abs_tol=1e-9)
    if op == "type":
        want, strict = spec["type"], spec.get("strict", False)
        if want == "string":
            return isinstance(v, str)
        if want == "boolean":
            return isinstance(v, bool)
        if want == "integer":
            if isinstance(v, bool):
                return False
            if isinstance(v, int):
                return True
            return (not strict) and isinstance(v, float) and float(v).is_integer()
        if want == "number":
            return isinstance(v, (int, float)) and not isinstance(v, bool)
        if want == "array":
            return isinstance(v, list)
        if want == "object":
            return isinstance(v, dict)
        return False
    raise ValueError(f"unknown predicate op: {op!r}")
