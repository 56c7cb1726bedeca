"""Dataset card: the corpus-level statistics table a curation pipeline
publishes next to every dataset drop (the "datasheets for datasets" /
data-card practice — Gebru et al. 2021, and the stats blocks of public
corpus cards like C4/ROOTS/Dolma).

``corpus_card`` computes one LONG-format table (section, key, value) so
the card is a single unioned DataFrame — appendable to a ManifestTable,
diffable across drops with ``table_diff``, and value-oracled row by row:

  * ``count_by_<dim>``  — document counts per dimension (lang, source, …)
  * ``chars``           — total / avg(micros) / p50(micros) / max length
  * ``tokens``          — total and distinct alnum tokens (the shared
                          vocabulary definition every text operator uses)
  * ``dupes``           — exact-duplicate groups / docs-in-groups via the
                          normalized fingerprint
  * ``empty``           — empty/whitespace-only document count

All aggregates are native (map-side partials, one shuffle per section);
ratios and means are floored micros so the card is integer-exact across
engines. Sections union by name — at 100 TB each section is an
independent scan-level aggregate over the same cached corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sec(df: DataFrame, section: str) -> DataFrame:
    return df.select(
        F.lit(section).alias("section"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("long").alias("value"),
    )


def corpus_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """(section, key, value) card rows for the corpus; see module doc."""
    from .functions.textnorm import alnum_tokens_col

    sections = []
    for d in dims:
        if d in docs.columns:
            # group by the RAW column, coalesce only the display key
            # (review r5: grouping by the coalesced sentinel would merge
            # NULL with a literal '<null>' value — the oracle groups raw)
            sections.append(
                _sec(
                    docs.groupBy(F.col(d))
                    .agg(F.count(F.lit(1)).alias("value"))
                    .select(F.coalesce(F.col(d), F.lit("<null>")).alias("key"), "value"),
                    f"count_by_{d}",
                )
            )

    lens = docs.select(F.length(F.coalesce(text_col, F.lit(""))).alias("n"))
    sections.append(
        _sec(
            lens.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n").alias("total"),
                F.floor(F.avg("n") * 1e6).alias("avg_micro"),
                F.floor(F.percentile("n", F.lit(0.5)) * 1e6).alias("p50_micro"),
                F.max("n").alias("max"),
            ).unpivot([], ["n_docs", "total", "avg_micro", "p50_micro", "max"], "key", "value"),
            "chars",
        )
    )

    toks = docs.select(F.explode(alnum_tokens_col(F.col(text_col))).alias("t"))
    sections.append(
        _sec(
            toks.agg(
                F.count(F.lit(1)).alias("total"),
                F.count_distinct("t").alias("distinct"),
            ).unpivot([], ["total", "distinct"], "key", "value"),
            "tokens",
        )
    )

    fp = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.coalesce(text_col, F.lit(""))), r"[^a-z0-9]+", " "),
                r"\s+",
                " ",
            )
        )
    )
    groups = (
        docs.select(fp.alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    sections.append(
        _sec(
            groups.agg(
                F.count(F.lit(1)).alias("dup_groups"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("docs_in_dup_groups"),
            ).unpivot([], ["dup_groups", "docs_in_dup_groups"], "key", "value"),
            "dupes",
        )
    )

    sections.append(
        _sec(
            docs.agg(
                F.sum(
                    (F.length(F.trim(F.coalesce(text_col, F.lit("")))) == 0).cast("long")
                ).alias("empty_docs")
            ).unpivot([], ["empty_docs"], "key", "value"),
            "empty",
        )
    )

    out = sections[0]
    for s in sections[1:]:
        out = out.unionByName(s)
    return out
