"""Deprecated (old-style) filter -> expression rewriter.

Parity target: /root/reference/src/Mapbox/OldStyleConvert.hs (41 LoC).
Pure JSON->JSON pre-pass; the engine never executes legacy forms directly.

Rewrites (one per op):
- ``["has", k]`` -> ``["has", k]``; ``["!has", k]`` -> ``["!", ["has", k]]``
- ``[op, k, v]`` for ``== != > >= < <=`` -> ``[op, ["string"|"number", GET], v]``
  where the typed wrapper follows the literal's JSON type and
  GET = ``["geometry-type"]`` for ``$type``, ``["id"]`` for ``$id``,
  ``["get", k]`` otherwise.
- ``["all"/"any", f...]`` -> same op, args recursed.
- ``["none", f...]`` -> ``["all", ["!", f]...]``.
- ``["in", k, v...]`` -> ``["match", ["string", GET, ""], [v...], true, false]``;
  ``["!in", ...]`` swaps the true/false outputs.
"""

from __future__ import annotations

from typing import Any


class LegacyConvertError(ValueError):
    pass


def _run_get(key: str) -> Any:
    if key == "$type":
        return ["geometry-type"]
    if key == "$id":
        return ["id"]
    return ["get", key]


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


_CMP_OPS = ("==", "!=", ">", ">=", "<", "<=")


def convert_legacy_filter(v: Any) -> Any:
    """Old-style filter JSON -> new-style expression JSON."""
    if not isinstance(v, list) or not v or not isinstance(v[0], str):
        raise LegacyConvertError(f"Parse error: {v!r}")
    fname, *args = v
    if fname == "has" and len(args) == 1 and isinstance(args[0], str):
        return ["has", args[0]]
    if fname == "!has" and len(args) == 1 and isinstance(args[0], str):
        return ["!", ["has", args[0]]]
    if fname in _CMP_OPS and len(args) == 2 and isinstance(args[0], str):
        key, val = args
        if isinstance(val, str):
            return [fname, ["string", _run_get(key)], val]
        if _is_number(val):
            return [fname, ["number", _run_get(key)], val]
    if fname in ("all", "any"):
        return [fname] + [convert_legacy_filter(a) for a in args]
    if fname == "none":
        return ["all"] + [["!", convert_legacy_filter(a)] for a in args]
    if fname in ("in", "!in") and args and isinstance(args[0], str):
        key, *vals = args
        keep = fname == "in"
        return [
            "match",
            ["string", _run_get(key), ""],
            vals,
            keep,
            not keep,
        ]
    raise LegacyConvertError(f"Unknown func or params: {fname!r}, {args!r}")


def convert_style_document(style_json: dict) -> dict:
    """The reference's ``convert`` command (runConversion,
    app/Main.hs:578-588): rewrite every ``layers[].filter`` from the legacy
    syntax to expressions, leaving the rest of the document untouched.
    Layers without a filter pass through (the lens traversal only touches
    existing keys)."""
    import copy

    out = copy.deepcopy(style_json)
    for layer in out.get("layers", []):
        if isinstance(layer, dict) and "filter" in layer:
            layer["filter"] = convert_legacy_filter(layer["filter"])
    return out
