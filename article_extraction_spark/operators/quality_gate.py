"""Row-level data-quality expectations with quarantine (round 7).

The write-side validation a curation pipeline runs before anything
enters a training table (the Deequ / Delta Live Tables "expectations"
pattern, public): a rule set is a dict of named boolean expressions;
every row is annotated with the array of rule names it VIOLATES (a NULL
verdict counts as a violation — an unevaluable rule must not pass), and
``quarantine`` splits the input into (good, bad) so failing rows land in
a review table instead of silently vanishing or poisoning the corpus.

Scale shape: one projection — every rule evaluates inside whole-stage
codegen in a single pass, no shuffle, no UDF; the split is two filters
over the same annotated plan. Rules are ordinary Spark SQL expressions,
so predicate semantics (3-valued logic, casts) match the engine the
data will be read with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_rows", "quarantine"]

VIOLATIONS_COL = "_violations"


def _rule_cols(rules: dict[str, "Column | str"]) -> list[Column]:
    if not rules:
        raise ValueError("validate_rows needs at least one rule")
    out = []
    for name, cond in sorted(rules.items()):  # deterministic array order
        c = F.expr(cond) if isinstance(cond, str) else cond
        # NULL verdict = violation: when(cond, NULL) keeps only TRUE clean
        out.append(F.when(c, F.lit(None).cast("string")).otherwise(F.lit(name)))
    return out


def validate_rows(df: DataFrame, rules: dict[str, "Column | str"]) -> DataFrame:
    """Annotate every row with ``_violations``: the (name-sorted) array
    of rules the row fails. Empty array = clean row. Rules may be
    Columns or SQL strings; a rule evaluating to NULL fails the row."""
    return df.withColumn(
        VIOLATIONS_COL, F.array_compact(F.array(*_rule_cols(rules)))
    )


def quarantine(
    df: DataFrame, rules: dict[str, "Column | str"]
) -> tuple[DataFrame, DataFrame]:
    """Split into ``(good, bad)``: good rows (all rules pass, original
    columns) and bad rows (original columns + ``_violations``). Two
    filters over one annotated single-pass projection — materialize or
    persist upstream if both sides are consumed."""
    annotated = validate_rows(df, rules)
    good = annotated.where(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = annotated.where(F.size(VIOLATIONS_COL) > 0)
    return good, bad
