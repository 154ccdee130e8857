"""Portable text primitives (Spark side).

Every primitive here has an exact DuckDB twin (gmr_spark/oracle/llm_sql.py)
built from the same dialect-intersection building blocks:

- tokens:   split on single space, drop empties (document texts are already
            lowercase, single-space separated);
- word shingles: k-gram of consecutive tokens joined by ' ';
- seeded hash: ``md5(seed || ':' || s)`` — md5 produces identical lowercase
  hex on both engines, and the *string* MIN of seeded md5s is a valid
  min-hash (uniform order on hex strings), sidestepping hex→int conversion
  differences entirely.

All primitives are built-in column expressions (JVM codegen, no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda x: x != "")


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined); empty if fewer than k tokens.

    Guarded: ``sequence(1, 0)`` is a DESCENDING [1, 0] in Spark (not empty),
    and element_at(_, 0) throws — short docs must short-circuit to []."""
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, shingled).otherwise(F.array().cast("array<string>"))


def seeded_md5(col: Column, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def exploded_word_shingles(docs, k: int = 3, id_col: str = "doc_id",
                           text_col: str = "text"):
    """(id_col, pos, sh): word-k-gram shingles via posexplode + lead windows.

    ~4-5x faster than building per-row shingle arrays with
    transform/element_at (higher-order array functions fall out of
    whole-stage codegen); the window stays within one doc partition so the
    only shuffle is the repartition by doc."""
    from pyspark.sql import Window as W

    tk = docs.select(id_col, F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"))
    wo = W.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", j).over(wo) for j in range(1, k)]
    return (
        tk.select(
            id_col, "pos",
            F.concat_ws(" ", F.col("tok"), *leads).alias("sh"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select(id_col, "pos", "sh")
    )
