"""Safe raster-algebra expression evaluator — the engine's gdal_calc
(osgeo_utils/gdal_calc.py): arbitrary numpy arithmetic over lettered
band inputs, e.g. ``(A - B) / (A + B)`` or
``where(A > 128, A, minimum(B, 64))``.

Parsed with :mod:`ast` against a strict whitelist (no ``eval``): binary
arithmetic, comparisons, boolean ops (``&``/``|``/``~``), numeric
literals, the band letters, and a fixed numpy function table. Anything
else — attributes, subscripts, calls outside the table, names outside
the bindings — raises ``ValueError`` at parse time.
"""

from __future__ import annotations

import ast
import operator

import numpy as np

_BINOPS = {
    ast.Add: operator.add, ast.Sub: operator.sub, ast.Mult: operator.mul,
    ast.Div: operator.truediv, ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod, ast.Pow: operator.pow,
    ast.BitAnd: operator.and_, ast.BitOr: operator.or_,
    ast.BitXor: operator.xor,
}
_UNARY = {ast.USub: operator.neg, ast.UAdd: operator.pos,
          ast.Invert: operator.invert}
_CMP = {ast.Gt: operator.gt, ast.GtE: operator.ge,
        ast.Lt: operator.lt, ast.LtE: operator.le,
        ast.Eq: operator.eq, ast.NotEq: operator.ne}
_FUNCS = {
    "sqrt": np.sqrt, "log10": np.log10, "log": np.log, "exp": np.exp,
    "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
    "where": np.where, "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "floor": np.floor, "ceil": np.ceil, "round": np.round,
    "clip": np.clip, "power": np.power, "mean": lambda *a: np.mean(a, axis=0),
}


def _eval_node(node, bindings):
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, bindings)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)):
            return node.value
        raise ValueError(f"literal {node.value!r} not allowed")
    if isinstance(node, ast.Name):
        if node.id in bindings:
            return bindings[node.id]
        raise ValueError(f"unknown name {node.id!r}")
    if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
        return _BINOPS[type(node.op)](
            _eval_node(node.left, bindings), _eval_node(node.right, bindings))
    if isinstance(node, ast.UnaryOp) and type(node.op) in _UNARY:
        return _UNARY[type(node.op)](_eval_node(node.operand, bindings))
    if isinstance(node, ast.Compare) and len(node.ops) == 1 \
            and type(node.ops[0]) in _CMP:
        return _CMP[type(node.ops[0])](
            _eval_node(node.left, bindings),
            _eval_node(node.comparators[0], bindings))
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) \
            and node.func.id in _FUNCS and not node.keywords:
        return _FUNCS[node.func.id](
            *[_eval_node(a, bindings) for a in node.args])
    raise ValueError(f"disallowed expression node {type(node).__name__}")


def calc_eval(expr: str, bindings: dict) -> np.ndarray:
    """Evaluate ``expr`` over the named numpy arrays in ``bindings``."""
    tree = ast.parse(expr, mode="eval")
    return np.asarray(_eval_node(tree, bindings), dtype=np.float64)
