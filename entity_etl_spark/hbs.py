"""Handlebars-dialect template compiler (reference templates.js:15-40,
templates/*.hbs) — byte-faithful O6-O9.

The reference renders each entity through a Handlebars template. The
declarative spec grammar in :mod:`mapping` covers the same semantics
field-by-field; THIS module instead compiles the reference's actual
template dialect — so a migrating user can point the engine at their
existing ``.hbs`` files unmodified. Supported constructs (everything the
reference's shipped templates use):

- ``{{expr}}`` — mustache reference, HTML-ESCAPED exactly like
  Handlebars' ``escapeExpression`` (& < > " ' ` = become entities);
- ``{{{expr}}}`` — triple-stache raw reference (no escaping);
- ``{{#with expr}}…{{else}}…{{/with}}`` — fallback block with JS
  truthiness: null/missing, ``""``, numeric ``0``, and ``false`` are all
  falsy (templates/awsEc2.hbs:8); ``.`` / ``this`` inside the block is the
  subject;
- literal text (incl. newlines) passes through byte-for-byte.

``expr`` resolution mirrors the reference render context
(``{entity, env}`` — templates.js:38-39): ``entity.foo`` reads column
``foo``; ``env.FOO`` is interpolated from the process environment at
compile time; bare ``foo`` reads column ``foo``.

``{{#each}}`` (used only by templates/targetBody.hbs for request-body
assembly) is intentionally rejected: batch assembly is a distributed
groupBy (:func:`batch.assemble_bodies`), not a per-row expression.

Everything compiles to built-in Column expressions (concat / when /
replace) — JVM-side, codegen'd, no UDF.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Handlebars escapeExpression table (handlebars utils.js); '&' first so the
# entity replacements themselves are not re-escaped.
_HTML_ESCAPES = [
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#x27;"),
    ("`", "&#x60;"),
    ("=", "&#x3D;"),
]

_TOKEN = re.compile(
    r"\{\{\{\s*(?P<raw>[^{}]+?)\s*\}\}\}"
    r"|\{\{#with\s+(?P<with>[^{}]+?)\s*\}\}"
    r"|\{\{\s*else\s*\}\}"
    r"|\{\{/with\s*\}\}"
    r"|\{\{#each\b[^{}]*\}\}"
    r"|\{\{\s*(?P<esc>[^#/{}][^{}]*?)\s*\}\}"
)


def escape_html(col: Column) -> Column:
    """Handlebars escapeExpression as a Column transform."""
    for s, r in _HTML_ESCAPES:
        col = F.replace(col, F.lit(s), F.lit(r))
    return col


@dataclass
class _WithNode:
    subject: str
    then_parts: list = field(default_factory=list)
    else_parts: list = field(default_factory=list)
    in_else: bool = False


def _parse(template: str) -> list:
    """Parse to a flat part list: ("lit", s) | ("ref", expr, escaped) |
    _WithNode. #with blocks do not nest in the reference dialect."""
    parts: list = []
    stack: list[_WithNode] = []

    def emit(part) -> None:
        if stack:
            node = stack[-1]
            (node.else_parts if node.in_else else node.then_parts).append(part)
        else:
            parts.append(part)

    pos = 0
    for m in _TOKEN.finditer(template):
        if m.start() > pos:
            emit(("lit", template[pos : m.start()]))
        pos = m.end()
        tok = m.group(0)
        if m.group("raw") is not None:
            emit(("ref", m.group("raw"), False))
        elif m.group("with") is not None:
            node = _WithNode(subject=m.group("with"))
            emit(node)
            stack.append(node)
        elif tok.startswith("{{#each"):
            raise ValueError(
                "{{#each}} is a batch-assembly construct; use "
                "batch.assemble_bodies for request bodies"
            )
        elif "else" in tok and m.group("esc") is None:
            if not stack:
                raise ValueError("{{else}} outside {{#with}}")
            stack[-1].in_else = True
        elif tok.startswith("{{/with"):
            if not stack:
                raise ValueError("{{/with}} without {{#with}}")
            stack.pop()
        else:
            emit(("ref", m.group("esc"), True))
    if stack:
        raise ValueError("unterminated {{#with}}")
    if pos < len(template):
        parts.append(("lit", template[pos:]))
    return parts


def _resolve(expr: str, dtypes: dict, subject: str | None):
    """Resolve a mustache expr to (Column-or-None, dtype-or-None).

    Returns (None, None) for a reference to a column absent from the
    schema — Handlebars renders undefined as ""."""
    expr = expr.strip()
    if expr in (".", "this"):
        if subject is None:
            raise ValueError("'.' outside a {{#with}} block")
        expr = subject
    if expr.startswith("env."):
        return F.lit(os.environ.get(expr[4:], "")), "string"
    if expr.startswith("entity."):
        expr = expr[len("entity.") :]
    if expr not in dtypes:
        return None, None
    return F.col(expr), dtypes[expr]


def _truthy(col: Column, dtype: str) -> Column:
    """Handlebars/JS truthiness by column type: null, "", 0, false falsy."""
    cond = col.isNotNull()
    if dtype == "string":
        cond = cond & (col != "")
    elif dtype == "boolean":
        cond = cond & col
    elif dtype.startswith("array"):
        cond = cond & (F.size(col) > 0)
    elif dtype not in ("date", "timestamp") and not dtype.startswith("struct"):
        cond = cond & (col != 0)  # numeric: JS 0 is falsy
    return cond


def _render_ref(expr: str, escaped: bool, dtypes: dict, subject: str | None) -> Column:
    col, dtype = _resolve(expr, dtypes, subject)
    if col is None:
        return F.lit("")
    s = F.coalesce(col.cast("string"), F.lit(""))
    return escape_html(s) if escaped and dtype == "string" else s


def _compile_parts(parts: list, dtypes: dict, subject: str | None) -> Column:
    cols: list[Column] = []
    for part in parts:
        if isinstance(part, _WithNode):
            sub_col, sub_dtype = _resolve(part.subject, dtypes, subject)
            then_c = _compile_parts(part.then_parts, dtypes, part.subject)
            else_c = _compile_parts(part.else_parts, dtypes, subject)
            if sub_col is None:  # missing subject: always the else branch
                cols.append(else_c)
            else:
                cols.append(
                    F.when(_truthy(sub_col, sub_dtype), then_c).otherwise(else_c)
                )
        elif part[0] == "lit":
            cols.append(F.lit(part[1]))
        else:
            cols.append(_render_ref(part[1], part[2], dtypes, subject))
    if not cols:
        return F.lit("")
    return F.concat(*cols)


def compile_hbs(template: str, df: DataFrame) -> Column:
    """Compile a Handlebars template to one string Column over ``df``."""
    return _compile_parts(_parse(template), dict(df.dtypes), None)


def render_hbs(df: DataFrame, template: str, out_col: str = "rendered") -> DataFrame:
    """Render ``template`` per row (reference renderTemplate,
    templates.js:37-40), appending the result as ``out_col``."""
    return df.withColumn(out_col, compile_hbs(template, df))
