"""The curation pipeline composed end-to-end: exact dedup → near-dup
removal → quality filter (Gopher + CCNet-style LM) → sequence packing —
the chain a training-data job actually runs, as one callable over the
sf_dir contract. Proven at 2M documents with planted truth at every
stage in scripts/scale_r12.py / SCALE.md r12 (exactly the planted exact
copies, ≥99.9% of the planted near-dup pairs, and exactly the planted
junk + LM-outlier docs retired, packing cross-checked per language).

Composition contract (round-11 verdict item 5):
- stage 1, exact dedup: keep the lowest doc_id per distinct text
  (:func:`dedup_exact`'s keep rule);
- stage 2, near-dup: :func:`dedup_survivors`'s keep rule (the memoized
  MinHash-LSH → verify → connected-components chain — shared with every
  other dedup operator in the session, so this pipeline adds no second
  chain build). NOTE the composition order: this pipeline intersects
  survivors computed on the ORIGINAL corpus with the exact-dedup keepers,
  while the staged 2M-doc proof (scripts/scale_r12.py) runs near-dup
  removal on the exact-deduped corpus. The two are value-identical by a
  keep-min-id/identical-signature argument (round-12 ADVICE item 3):
  (a) exact copies have identical shingle sets, hence identical MinHash
  signatures and identical Jaccard to every other doc, so removing a
  copy never disconnects a component — its keeper carries the same
  edges; (b) a component's min-id member is necessarily the min id of
  its own exact-text group (it is the min over the whole component,
  which contains that group), so the full-corpus component head is
  always an exact-dedup keeper; therefore survivors(original) ∩ keepers
  == survivors(exact-deduped corpus), both rules keeping the component's
  global min id. Pinned by the staged test's exact-copy-inside-a-
  near-dup-cluster fixture (tests/test_llm_ops.py);
- stage 3, quality: Gopher ``passes`` (per-doc statistics, so computing
  them on the corpus and filtering afterwards is value-identical to
  computing on the survivors) AND ``mean_inv_freq`` ≤ ``lm_factor`` ×
  the corpus average — with the LM statistics computed on the DEDUPED
  corpus (:func:`unigram_lm_frame` on the survivor frame: CCNet trains
  its LM on the cleaned corpus, so dedup must come first);
- stage 4, packing: :func:`packing_frame` on the surviving frame —
  packing is order-dependent (running sums), so it must see exactly the
  surviving docs, never filter-after-pack.

Scale shape: stages 1–3 are semi-joins of narrow id frames against the
corpus scan (broadcast-gated inside dedup_survivors); the LM average
rides a 1-row broadcast cross join (the ``unigram_lm_frame`` ``tot``
pattern — never a global window over per-doc rows, which would
single-partition an SF-linear frame at 100 TB). The LM-stats subtree is
evaluated once per consumer (average + filter); a 100 TB run
materializes stage boundaries to storage instead — exactly what the
2M-doc proof does (scripts/scale_r12.py writes each stage's survivor
corpus as parquet; see SCALE.md r12 for the measured stage walls).

DECLARED since round 13: the composed DuckDB twin (oracle/llm_sql.py
``CURATION``) chains the stage twins in this module's own composition —
exact-dedup keepers ∩ full-corpus near-dup survivors → Gopher ``passes``
→ LM cutoff with statistics on the deduped corpus → the packing window
over the survivor set. Cross-engine determinism of the LM cutoff: both
sides compare the 6dp-rounded ``mean_inv_freq`` against the 6dp-ROUNDED
cutoff ``ROUND(lm_factor × avg, 6)``, so the comparison is between
1e-6-quantized doubles — an engine-order difference in the float
average's last ulp cannot flip a document unless the true cutoff sits
exactly on a rounding tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmr_spark.operators.dedup import dedup_exact, dedup_survivors
from gmr_spark.operators.sampling import packing_frame
from gmr_spark.operators.text_analysis import gopher_quality, unigram_lm_frame
from gmr_spark.sources.tables import load_tables


# The declared query's LM cutoff multiple — a module constant so the
# composed DuckDB twin (oracle/llm_sql.py CURATION) interpolates the SAME
# value by construction (round-13 review).
CURATION_LM_FACTOR = 2.0


def curation_pipeline(spark: SparkSession, sf_dir: str, *,
                      lm_factor: float = CURATION_LM_FACTOR) -> DataFrame:
    """(lang, doc_id, n_words, pack_id, pack_offset): pack assignments for
    the curated corpus — the docs surviving exact dedup, near-dup removal,
    the Gopher repetition rules, and the ``lm_factor``×avg LM cutoff. See
    the module docstring for the composition contract and scale shape."""
    docs = load_tables(spark, sf_dir)["documents"]
    keepers = dedup_exact(spark, sf_dir).select(
        F.col("keep_id").alias("doc_id"))
    survivor_ids = dedup_survivors(spark, sf_dir).select("doc_id")
    deduped = (
        docs.join(keepers, "doc_id", "left_semi")
        .join(survivor_ids, "doc_id", "left_semi")
    )
    good = gopher_quality(spark, sf_dir).filter("passes").select("doc_id")
    lm = unigram_lm_frame(deduped.select("doc_id", "text"))
    avg = lm.agg(F.avg("mean_inv_freq").alias("corpus_avg_mif"))
    calm = (
        lm.crossJoin(F.broadcast(avg))
        # the cutoff is ROUND(·,6) so both engines compare 1e-6-quantized
        # doubles (see the module docstring's determinism note)
        .filter(F.col("mean_inv_freq")
                <= F.round(F.lit(float(lm_factor))
                           * F.col("corpus_avg_mif"), 6))
        .select("doc_id")
    )
    curated = (
        deduped.join(good, "doc_id", "left_semi")
        .join(calm, "doc_id", "left_semi")
    )
    return packing_frame(curated)
