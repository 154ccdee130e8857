"""DuckDB twins for the LLM-data-pipeline operators (dedup / similarity /
text analysis / multimodal plumbing).

Shared portable primitives (see gmr_spark/functions/text.py):
tokens = list_filter(string_split(text,' '), x -> x <> ''); word 3-gram
shingles via list comprehension; seeded md5 string-min for minhash. The
SimHash twin expands md5 nibbles in pure SQL to prove the Spark pandas_udf's
arithmetic. DuckDB-only dialect (MATERIALIZED, list comprehensions, lambdas).

Tunable thresholds are interpolated FROM the operator modules' constants
(Gopher gates, the curation LM factor, PACK_CAPACITY) so a Spark-side
threshold change cannot silently leave a twin on old values — the twins
stay independent DERIVATIONS of the semantics, not independent copies of
the tunables (round-13 review).
"""

from gmr_spark.operators.curation import CURATION_LM_FACTOR
from gmr_spark.operators.sampling import (
    N_SHARDS,
    PACK_CAPACITY,
    SPLIT_SEED,
    VAL_BUCKETS,
)
from gmr_spark.operators.text_analysis import (
    GOPHER_DUP_2GRAM_MAX,
    GOPHER_MIN_WORDS,
    GOPHER_TOP_WORD_MAX,
    OOV_VOCAB_SIZE,
)

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

_SHINGLED = f"""
toks AS MATERIALIZED (
    SELECT doc_id, {_TOKS} AS t FROM documents
),
shingled AS MATERIALIZED (
    SELECT DISTINCT doc_id,
           unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                   for i in generate_series(1, len(t) - 2)]) AS sh
    FROM toks
    WHERE len(t) >= 3
)"""

DEDUP_EXACT = """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""

_SIGS = """
sigs AS MATERIALIZED (
    SELECT doc_id,
           MIN(md5('0:' || sh)) AS m0, MIN(md5('1:' || sh)) AS m1,
           MIN(md5('2:' || sh)) AS m2, MIN(md5('3:' || sh)) AS m3,
           MIN(md5('4:' || sh)) AS m4, MIN(md5('5:' || sh)) AS m5,
           MIN(md5('6:' || sh)) AS m6, MIN(md5('7:' || sh)) AS m7
    FROM shingled GROUP BY doc_id
),
bands AS MATERIALIZED (
    SELECT doc_id, 0 AS band_idx, md5(m0 || m1) AS band_val FROM sigs
    UNION ALL SELECT doc_id, 1, md5(m2 || m3) FROM sigs
    UNION ALL SELECT doc_id, 2, md5(m4 || m5) FROM sigs
    UNION ALL SELECT doc_id, 3, md5(m6 || m7) FROM sigs
),
pairs AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
),
sizes AS MATERIALIZED (
    SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id
)"""

DEDUP_MINHASH = f"""
WITH {_SHINGLED.strip()},
{_SIGS.strip()},
inter AS MATERIALIZED (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
    FROM pairs p
    JOIN shingled sa ON sa.doc_id = p.doc_a
    JOIN shingled sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
    GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.n_common AS DOUBLE)
             / CAST(za.n_sh + zb.n_sh - i.n_common AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE ROUND(CAST(i.n_common AS DOUBLE)
            / CAST(za.n_sh + zb.n_sh - i.n_common AS DOUBLE), 6) >= 0.1
"""

NGRAM_JACCARD = f"""
WITH {_SHINGLED.strip()},
-- stop-shingle cutoff (mirrors dedup.ngram_jaccard_pairs max_df_frac=0.10):
-- shingles in >10% of docs are dropped before the self-join
kept AS MATERIALIZED (
    SELECT s.doc_id, s.sh
    FROM shingled s
    JOIN (SELECT sh, COUNT(*) AS df FROM shingled GROUP BY sh) d ON d.sh = s.sh
    WHERE d.df <= 0.10 * (SELECT COUNT(*) FROM documents)
),
sizes AS MATERIALIZED (
    SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
),
inter AS MATERIALIZED (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 20
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.n_common AS DOUBLE)
             / CAST(za.n_sh + zb.n_sh - i.n_common AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
"""

# SimHash: bit i (0..31) of int(md5(token)[:8], 16); nibble p (1..8, MSB
# first) holds bits 31-4(p-1) .. 28-4(p-1), so bit i lives in nibble
# 8 - i//4 at in-nibble position i%4.
DEDUP_SIMHASH = """
WITH tok AS MATERIALIZED (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
    FROM documents
),
th AS MATERIALIZED (
    SELECT doc_id, substr(md5(tok), 1, 8) AS h8 FROM tok
),
bits AS MATERIALIZED (
    SELECT doc_id, i.i,
           CAST(floor((strpos('0123456789abcdef',
                              substr(h8, 8 - CAST(i.i // 4 AS INTEGER), 1)) - 1)
                      / POWER(2, i.i % 4)) AS BIGINT) % 2 AS bit
    FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i) i
),
acc AS MATERIALIZED (
    SELECT doc_id, i, SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS s
    FROM bits GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, i) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM acc GROUP BY doc_id
"""

_EMB = """
emb AS MATERIALIZED (
    SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS vec
    FROM embeddings
),
expl AS MATERIALIZED (
    SELECT id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val FROM emb
),
norms AS MATERIALIZED (
    SELECT id, sqrt(SUM(val * val)) AS nrm FROM expl GROUP BY id
)"""

COSINE_TOPK = f"""
WITH {_EMB.strip()},
dots AS MATERIALIZED (
    SELECT q.id AS query_id, v.id AS neighbor_id, SUM(q.val * v.val) AS dot
    FROM expl q JOIN expl v ON q.pos = v.pos
    WHERE q.id < 5 AND v.id <> q.id
    GROUP BY q.id, v.id
),
sims AS MATERIALIZED (
    SELECT d.query_id, d.neighbor_id,
           ROUND(d.dot / (nq.nrm * nv.nrm), 6) AS sim
    FROM dots d
    JOIN norms nq ON nq.id = d.query_id
    JOIN norms nv ON nv.id = d.neighbor_id
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS rnk
    FROM sims
) t WHERE rnk <= 10
"""

ANN_SIGN_LSH = f"""
WITH {_EMB.strip()},
buckets AS MATERIALIZED (
    SELECT id,
           CAST(SUM(CASE WHEN val > 0 THEN CAST(POWER(2, pos - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM expl WHERE pos <= 16 GROUP BY id
),
-- hot-bucket cap (mirrors similarity.split_oversized_buckets, cap=256):
-- buckets over the cap are split into ceil(cnt/cap) sub-buckets by id % n
bsub AS MATERIALIZED (
    SELECT b.id, b.bucket, b.id % c.n_sub AS sub
    FROM buckets b
    JOIN (SELECT bucket, CAST(CEIL(COUNT(*) / 256.0) AS BIGINT) AS n_sub
          FROM buckets GROUP BY bucket) c USING (bucket)
),
cand AS MATERIALIZED (
    SELECT a.id AS query_id, b.id AS neighbor_id
    FROM bsub a JOIN bsub b
      ON a.bucket = b.bucket AND a.sub = b.sub AND a.id <> b.id
),
dots AS MATERIALIZED (
    SELECT c.query_id, c.neighbor_id, SUM(q.val * v.val) AS dot
    FROM cand c
    JOIN expl q ON q.id = c.query_id
    JOIN expl v ON v.id = c.neighbor_id AND v.pos = q.pos
    GROUP BY c.query_id, c.neighbor_id
),
sims AS MATERIALIZED (
    SELECT d.query_id, d.neighbor_id,
           ROUND(d.dot / (nq.nrm * nv.nrm), 6) AS sim
    FROM dots d
    JOIN norms nq ON nq.id = d.query_id
    JOIN norms nv ON nv.id = d.neighbor_id
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS rnk
    FROM sims
) t WHERE rnk <= 3
"""

def _rh_planes_values() -> str:
    """VALUES list (tbl, bit, pos, coef) rendered from the SAME plane matrix
    the Spark side projects with (operators.similarity.rh_planes; row
    t*RH_N_BITS+i = bit i of table t) — repr() keeps the shortest
    round-trip decimal, which DuckDB parses back to the identical double,
    so the two engines share the constants bit for bit."""
    from gmr_spark.operators.similarity import RH_N_BITS, rh_planes

    return ", ".join(
        f"({row_idx // RH_N_BITS},{row_idx % RH_N_BITS},{pos},{coef!r})"
        for row_idx, row in enumerate(rh_planes())
        for pos, coef in enumerate(row, start=1)
    )


from gmr_spark.operators.similarity import RH_N_BITS as _RH_N_BITS  # noqa: E402

ANN_RH_LSH = f"""
WITH {_EMB.strip()},
planes AS MATERIALIZED (
    SELECT CAST(c1 AS INTEGER) AS tbl, CAST(c2 AS INTEGER) AS bit,
           CAST(c3 AS BIGINT) AS pos, CAST(c4 AS DOUBLE) AS coef
    FROM (VALUES {_rh_planes_values()}) p(c1, c2, c3, c4)
),
-- bit i of table t's bucket = sign of (vec . plane_(t,i)); dots ROUND(.,6)
-- before the sign test, mirroring similarity.rh_bucket; global bucket id is
-- table-qualified (tbl * 2^RH_N_BITS + local), mirroring rh_buckets_array
pdots AS MATERIALIZED (
    SELECT x.id, p.tbl, p.bit, ROUND(SUM(x.val * p.coef), 6) AS dot
    FROM expl x JOIN planes p ON x.pos = p.pos
    GROUP BY x.id, p.tbl, p.bit
),
buckets AS MATERIALIZED (
    SELECT id,
           CAST(tbl * {1 << _RH_N_BITS} + SUM(CASE WHEN dot > 0 THEN CAST(POWER(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM pdots GROUP BY id, tbl
),
-- hot-bucket cap (mirrors similarity.split_oversized_buckets, cap=256)
bsub AS MATERIALIZED (
    SELECT b.id, b.bucket, b.id % c.n_sub AS sub
    FROM buckets b
    JOIN (SELECT bucket, CAST(CEIL(COUNT(*) / 256.0) AS BIGINT) AS n_sub
          FROM buckets GROUP BY bucket) c USING (bucket)
),
-- candidate = same bucket in ANY table, deduped (the OR-amplification)
cand AS MATERIALIZED (
    SELECT DISTINCT a.id AS query_id, b.id AS neighbor_id
    FROM bsub a JOIN bsub b
      ON a.bucket = b.bucket AND a.sub = b.sub AND a.id <> b.id
),
dots AS MATERIALIZED (
    SELECT c.query_id, c.neighbor_id, SUM(q.val * v.val) AS dot
    FROM cand c
    JOIN expl q ON q.id = c.query_id
    JOIN expl v ON v.id = c.neighbor_id AND v.pos = q.pos
    GROUP BY c.query_id, c.neighbor_id
),
sims AS MATERIALIZED (
    SELECT d.query_id, d.neighbor_id,
           ROUND(d.dot / (nq.nrm * nv.nrm), 6) AS sim
    FROM dots d
    JOIN norms nq ON nq.id = d.query_id
    JOIN norms nv ON nv.id = d.neighbor_id
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS rnk
    FROM sims
) t WHERE rnk <= 3
"""


DEDUP_EMBEDDING = f"""
WITH {_EMB.strip()},
buckets AS MATERIALIZED (
    SELECT id,
           CAST(SUM(CASE WHEN val > 0 THEN CAST(POWER(2, pos - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM expl WHERE pos <= 8 GROUP BY id
),
-- hot-bucket cap (mirrors similarity.split_oversized_buckets, cap=256)
bsub AS MATERIALIZED (
    SELECT b.id, b.bucket, b.id % c.n_sub AS sub
    FROM buckets b
    JOIN (SELECT bucket, CAST(CEIL(COUNT(*) / 256.0) AS BIGINT) AS n_sub
          FROM buckets GROUP BY bucket) c USING (bucket)
),
cand AS MATERIALIZED (
    SELECT a.id AS vec_a, b.id AS vec_b
    FROM bsub a JOIN bsub b
      ON a.bucket = b.bucket AND a.sub = b.sub AND a.id < b.id
),
dots AS MATERIALIZED (
    SELECT c.vec_a, c.vec_b, SUM(q.val * v.val) AS dot
    FROM cand c
    JOIN expl q ON q.id = c.vec_a
    JOIN expl v ON v.id = c.vec_b AND v.pos = q.pos
    GROUP BY c.vec_a, c.vec_b
)
SELECT d.vec_a, d.vec_b,
       ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
FROM dots d
JOIN norms na ON na.id = d.vec_a
JOIN norms nb ON nb.id = d.vec_b
WHERE ROUND(d.dot / (na.nrm * nb.nrm), 6) >= 0.2
"""

ANN_IVF = f"""
WITH {_EMB.strip()},
seeds AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cell, vec
    FROM emb ORDER BY id LIMIT 8
),
cexpl AS MATERIALIZED (
    SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val FROM seeds
),
cdist AS MATERIALIZED (
    SELECT x.id, c.cell, ROUND(SUM((x.val - c.val) * (x.val - c.val)), 6) AS d2
    FROM expl x JOIN cexpl c ON x.pos = c.pos
    GROUP BY x.id, c.cell
),
ranked AS MATERIALIZED (
    SELECT id, cell, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
    FROM cdist
),
indexed AS MATERIALIZED (SELECT id AS neighbor_id, cell FROM ranked WHERE rn = 1),
probes AS MATERIALIZED (SELECT id AS query_id, cell FROM ranked WHERE rn <= 2),
cand AS MATERIALIZED (
    SELECT p.query_id, i.neighbor_id
    FROM probes p JOIN indexed i ON i.cell = p.cell AND i.neighbor_id <> p.query_id
),
dots AS MATERIALIZED (
    SELECT c.query_id, c.neighbor_id, SUM(q.val * v.val) AS dot
    FROM cand c
    JOIN expl q ON q.id = c.query_id
    JOIN expl v ON v.id = c.neighbor_id AND v.pos = q.pos
    GROUP BY c.query_id, c.neighbor_id
),
sims AS MATERIALIZED (
    SELECT d.query_id, d.neighbor_id,
           ROUND(d.dot / (nq.nrm * nv.nrm), 6) AS sim
    FROM dots d
    JOIN norms nq ON nq.id = d.query_id
    JOIN norms nv ON nv.id = d.neighbor_id
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS rnk
    FROM sims
) t WHERE rnk <= 3
"""

# IVF-PQ twin (similarity.ann_ivf_pq): same seed-cell coarse quantizer as
# ANN_IVF; the PQ codebook is DERIVED FROM THE TABLE (sub-vector j of the 16
# lowest-id vectors = code c of subspace j), so both engines share it without
# a literal matrix. `subd` is the shared kernel: per-(vector, subspace, code)
# squared distance ROUND(·,6) — the encode argmin reads it per INDEXED vector
# and the ADC lookup reads it per QUERY, mirroring _pq_subdists feeding both
# make_pq_codes_udf and make_pq_lut_udf. Shortlist 12 by (adc, neighbor_id),
# exact-cosine re-rank, top 3.
ANN_IVF_PQ = f"""
WITH {_EMB.strip()},
seeds AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cell, vec
    FROM emb ORDER BY id LIMIT 8
),
cexpl AS MATERIALIZED (
    SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val FROM seeds
),
cdist AS MATERIALIZED (
    SELECT x.id, c.cell, ROUND(SUM((x.val - c.val) * (x.val - c.val)), 6) AS d2
    FROM expl x JOIN cexpl c ON x.pos = c.pos
    GROUP BY x.id, c.cell
),
ranked AS MATERIALIZED (
    SELECT id, cell, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
    FROM cdist
),
indexed AS MATERIALIZED (SELECT id AS neighbor_id, cell FROM ranked WHERE rn = 1),
probes AS MATERIALIZED (SELECT id AS query_id, cell FROM ranked WHERE rn <= 2),
cbseed AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS code, vec
    FROM emb ORDER BY id LIMIT 16
),
cb AS MATERIALIZED (
    SELECT code, CAST((pos - 1) // 8 AS INTEGER) AS sub,
           CAST((pos - 1) % 8 AS INTEGER) AS dim, val
    FROM (SELECT code, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val
          FROM cbseed) t
),
vsub AS MATERIALIZED (
    SELECT id, CAST((pos - 1) // 8 AS INTEGER) AS sub,
           CAST((pos - 1) % 8 AS INTEGER) AS dim, val
    FROM expl
),
subd AS MATERIALIZED (
    SELECT x.id, x.sub, c.code,
           ROUND(SUM((x.val - c.val) * (x.val - c.val)), 6) AS d2
    FROM vsub x JOIN cb c ON c.sub = x.sub AND c.dim = x.dim
    GROUP BY x.id, x.sub, c.code
),
codes AS MATERIALIZED (
    SELECT id, sub, code FROM (
        SELECT id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn
        FROM subd
    ) t WHERE rn = 1
),
cand AS MATERIALIZED (
    SELECT p.query_id, i.neighbor_id
    FROM probes p JOIN indexed i ON i.cell = p.cell AND i.neighbor_id <> p.query_id
),
adc AS MATERIALIZED (
    SELECT c.query_id, c.neighbor_id, ROUND(SUM(l.d2), 6) AS adc
    FROM cand c
    JOIN codes k ON k.id = c.neighbor_id
    JOIN subd l ON l.id = c.query_id AND l.sub = k.sub AND l.code = k.code
    GROUP BY c.query_id, c.neighbor_id
),
short AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc, neighbor_id) AS srn
        FROM adc
    ) t WHERE srn <= 12
),
dots AS MATERIALIZED (
    SELECT s.query_id, s.neighbor_id, SUM(q.val * v.val) AS dot
    FROM short s
    JOIN expl q ON q.id = s.query_id
    JOIN expl v ON v.id = s.neighbor_id AND v.pos = q.pos
    GROUP BY s.query_id, s.neighbor_id
),
sims AS MATERIALIZED (
    SELECT d.query_id, d.neighbor_id,
           ROUND(d.dot / (nq.nrm * nv.nrm), 6) AS sim
    FROM dots d
    JOIN norms nq ON nq.id = d.query_id
    JOIN norms nv ON nv.id = d.neighbor_id
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS rnk
    FROM sims
) t WHERE rnk <= 3
"""

# Recall@3 of every ANN path vs the exact top-3 on the 5-query set: the
# component queries are reused verbatim as subqueries (a DuckDB subquery may
# carry its own WITH), so this oracle can never drift from the per-method
# oracles it audits. Denominator = n_queries * k = 15.
ANN_RECALL_AT_K = f"""
WITH truth AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM ({COSINE_TOPK}) t WHERE rnk <= 3
),
lsh AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM ({ANN_SIGN_LSH}) t WHERE query_id < 5
),
rh AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM ({ANN_RH_LSH}) t WHERE query_id < 5
),
ivf AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM ({ANN_IVF}) t WHERE query_id < 5
),
ivf_pq AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM ({ANN_IVF_PQ}) t WHERE query_id < 5
)
SELECT method, hits, ROUND(hits / 15.0, 6) AS recall
FROM (
    SELECT 'ivf' AS method, CAST(COUNT(*) AS BIGINT) AS hits
    FROM truth JOIN ivf USING (query_id, neighbor_id)
    UNION ALL
    SELECT 'ivf_pq' AS method, CAST(COUNT(*) AS BIGINT) AS hits
    FROM truth JOIN ivf_pq USING (query_id, neighbor_id)
    UNION ALL
    SELECT 'rh_lsh' AS method, CAST(COUNT(*) AS BIGINT) AS hits
    FROM truth JOIN rh USING (query_id, neighbor_id)
    UNION ALL
    SELECT 'sign_lsh' AS method, CAST(COUNT(*) AS BIGINT) AS hits
    FROM truth JOIN lsh USING (query_id, neighbor_id)
) m
"""

_PROFILES_SQL = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}


def _hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(t, x -> x IN ({lst})))"


LANG_ID = f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, lang, {_TOKS} AS t FROM documents
),
scored AS MATERIALIZED (
    SELECT doc_id, lang,
           {", ".join(f"CAST({_hits(w)} AS INTEGER) AS s_{lang}" for lang, w in sorted(_PROFILES_SQL.items()))}
    FROM toks
)
SELECT doc_id, lang AS lang_actual,
       CASE {" ".join(f"WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = s_{lang} THEN '{lang}'" for lang in sorted(_PROFILES_SQL))} END AS lang_pred,
       GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS score
FROM scored
"""

def _multilingual_values() -> str:
    """VALUES list rendered from the SAME fixture rows the Spark side builds
    (operators.text_analysis.multilingual_fixture_rows)."""
    from gmr_spark.operators.text_analysis import multilingual_fixture_rows

    return ", ".join(
        f"({doc_id}, '{lang}', '{text}')"
        for doc_id, lang, text in multilingual_fixture_rows()
    )


LANG_ID_MULTILINGUAL = f"""
WITH docs AS MATERIALIZED (
    SELECT CAST(c1 AS BIGINT) AS doc_id, c2 AS lang, c3 AS text
    FROM (VALUES {_multilingual_values()}) v(c1, c2, c3)
),
toks AS MATERIALIZED (
    SELECT doc_id, lang, {_TOKS} AS t FROM docs
),
scored AS MATERIALIZED (
    SELECT doc_id, lang,
           {", ".join(f"CAST({_hits(w)} AS INTEGER) AS s_{lang}" for lang, w in sorted(_PROFILES_SQL.items()))}
    FROM toks
)
SELECT doc_id, lang AS lang_actual,
       CASE {" ".join(f"WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = s_{lang} THEN '{lang}'" for lang in sorted(_PROFILES_SQL))} END AS lang_pred,
       GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS score
FROM scored
"""

def _bm25_values() -> str:
    """(query_id, token) VALUES rendered from the SAME fixture the Spark
    side builds (operators.text_analysis.BM25_QUERIES)."""
    from gmr_spark.operators.text_analysis import BM25_QUERIES

    return ", ".join(
        f"({qid}, '{tok}')"
        for qid, text in BM25_QUERIES
        for tok in dict.fromkeys(text.split())
    )


def _bm25_sql() -> str:
    """Twin of operators.text_analysis.bm25_topk. Constants are rendered
    via repr() so both engines parse identical doubles; idf is the rational
    (no-log) variant for cross-engine bit-parity (see the Spark docstring)."""
    from gmr_spark.operators.text_analysis import BM25_B, BM25_K1, BM25_TOP_K

    k1, b, k1p1 = repr(BM25_K1), repr(BM25_B), repr(BM25_K1 + 1.0)
    one_minus_b = repr(1.0 - BM25_B)
    return f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
dl AS MATERIALIZED (
    SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
),
stats AS MATERIALIZED (
    SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
qt(query_id, token) AS (VALUES {_bm25_values()}),
tf0 AS MATERIALIZED (
    SELECT t.token, t.doc_id, COUNT(*) AS tf
    FROM toks t JOIN (SELECT DISTINCT token FROM qt) q USING (token)
    GROUP BY t.token, t.doc_id
),
dfreq AS MATERIALIZED (
    SELECT token, COUNT(*) AS df FROM tf0 GROUP BY token
),
scored AS MATERIALIZED (
    SELECT q.query_id, t.doc_id,
           ROUND(SUM(
               ((CAST(s.n_docs - d.df AS DOUBLE) + 0.5e0)
                / (CAST(d.df AS DOUBLE) + 0.5e0))
               * (CAST(t.tf AS DOUBLE) * {k1p1}::DOUBLE)
                 / (CAST(t.tf AS DOUBLE)
                    + {k1}::DOUBLE * ({one_minus_b}::DOUBLE
                       + {b}::DOUBLE * CAST(l.dl AS DOUBLE) / s.avgdl))
           ), 6) AS score
    FROM tf0 t
    JOIN qt q USING (token)
    JOIN dfreq d USING (token)
    JOIN dl l ON l.doc_id = t.doc_id
    CROSS JOIN stats s
    GROUP BY q.query_id, t.doc_id
)
SELECT query_id, doc_id, score, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS rnk
    FROM scored
) t WHERE rnk <= {BM25_TOP_K}
"""


BM25_TOPK = _bm25_sql()


QUALITY_SCORE = f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, {_TOKS} AS t FROM documents
),
feat AS MATERIALIZED (
    SELECT doc_id,
           len(t) AS n_tok,
           list_reduce(list_transform(t, x -> length(x)), (a, b) -> a + b) AS tok_chars,
           len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS stop_hits
    FROM toks
)
SELECT doc_id,
       CAST(n_tok AS INTEGER) AS n_tokens,
       ROUND(CAST(tok_chars AS DOUBLE) / NULLIF(CAST(n_tok AS DOUBLE), 0), 6) AS avg_token_len,
       ROUND(CAST(stop_hits AS DOUBLE) / NULLIF(CAST(n_tok AS DOUBLE), 0), 6) AS stop_ratio,
       ROUND(
           LEAST(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.5
           + ROUND(CAST(stop_hits AS DOUBLE) / NULLIF(CAST(n_tok AS DOUBLE), 0), 6) * 0.3
           + LEAST(ROUND(CAST(tok_chars AS DOUBLE) / NULLIF(CAST(n_tok AS DOUBLE), 0), 6) / 10.0, 1.0) * 0.2,
       6) AS score
FROM feat
"""

TOKEN_STATS = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_ish,
       CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS INTEGER) AS n_chars_alpha
FROM documents
"""

TERM_FREQUENCIES = f"""
WITH tok AS MATERIALIZED (
    SELECT doc_id, unnest({_TOKS}) AS token FROM documents
)
SELECT token, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM tok GROUP BY token
HAVING COUNT(*) >= 10
"""

# Twin of text_analysis.unigram_lm_score: corpus-unigram inverse-frequency
# scoring (rational-form CCNet LM filter). t/C(w) is a single IEEE division
# on both engines; the per-doc sum rounds at 6 dp like every float
# aggregate in this module.
UNIGRAM_LM_SCORE = f"""
WITH words AS MATERIALIZED (
    SELECT doc_id, unnest({_TOKS}) AS w FROM documents
),
cnt AS MATERIALIZED (
    SELECT w, COUNT(*) AS c FROM words GROUP BY w
),
tot AS MATERIALIZED (
    SELECT SUM(c) AS t FROM cnt
),
dtc AS MATERIALIZED (
    SELECT doc_id, w, COUNT(*) AS cdw FROM words GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(cdw) AS BIGINT) AS n_tokens,
       ROUND(SUM(cdw * (CAST(t AS DOUBLE) / c)) / SUM(cdw), 6)
           AS mean_inv_freq,
       ROUND(MAX(CAST(t AS DOUBLE) / c), 6) AS max_inv_freq
FROM dtc JOIN cnt USING (w) CROSS JOIN tot
GROUP BY doc_id
"""

# Twin of text_analysis.oov_rate: per-doc out-of-vocabulary rate against
# the corpus top-V vocabulary. The vocabulary ranking (count DESC, token
# ASC) is a total order, so the top-V boundary is tie-free on both
# engines; V is interpolated from the operator's OOV_VOCAB_SIZE.
OOV_RATE = f"""
WITH words AS MATERIALIZED (
    SELECT doc_id, unnest({_TOKS}) AS w FROM documents
),
cnt AS MATERIALIZED (
    SELECT w, COUNT(*) AS c FROM words GROUP BY w
),
vocab AS MATERIALIZED (
    SELECT w FROM cnt ORDER BY c DESC, w LIMIT {OOV_VOCAB_SIZE}
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM words LEFT JOIN vocab v ON words.w = v.w
GROUP BY doc_id
"""


# Twin of text_analysis.dsir_select (DSIR, Xie et al. 2023): hashed-bigram
# bucket = int(md5(bigram)[:2], 16) (0..255 — identical md5 hex on both
# engines, DuckDB's '0x'-cast vs Spark's conv(,16,10)); smoothed rational
# importance ratio with the SAME parenthesization as the Spark side; score
# = count-weighted arithmetic mean, ROUND(.,6); top-100 ties break doc_id.
DSIR_SELECT = f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, lang, {_TOKS} AS t FROM documents
),
big AS MATERIALIZED (
    SELECT doc_id, lang,
           CAST('0x' || substr(md5(unnest(
               [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t) - 1)]
           )), 1, 2) AS INTEGER) AS b
    FROM toks WHERE len(t) >= 2
),
dbc AS MATERIALIZED (
    SELECT doc_id, b, COUNT(*) AS c FROM big GROUP BY doc_id, b
),
rc AS MATERIALIZED (
    SELECT b, COUNT(*) AS cr FROM big GROUP BY b
),
tc AS MATERIALIZED (
    SELECT b, COUNT(*) AS ct FROM big WHERE lang = 'en' GROUP BY b
),
tot AS MATERIALIZED (
    SELECT CAST(SUM(greatest(len(t) - 1, 0)) AS DOUBLE) AS tr,
           CAST(SUM(CASE WHEN lang = 'en' THEN greatest(len(t) - 1, 0)
                         ELSE 0 END) AS DOUBLE) AS tt
    FROM toks
),
ratio AS MATERIALIZED (
    SELECT rc.b,
           ((COALESCE(tc.ct, 0) + 1.0) / (rc.cr + 1.0))
           * ((tot.tr + 256.0) / (tot.tt + 256.0)) AS r
    FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tot
),
scored AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_feats,
           ROUND(SUM(c * r) / SUM(c), 6) AS score
    FROM dbc JOIN ratio ON ratio.b = dbc.b
    GROUP BY doc_id
)
SELECT doc_id, n_feats, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
FROM scored
ORDER BY score DESC, doc_id
LIMIT 100
"""

TFIDF_TOP_TERMS = f"""
WITH tok AS MATERIALIZED (
    SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
tf AS MATERIALIZED (
    SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS MATERIALIZED (
    SELECT token, COUNT(*) AS df FROM tf GROUP BY token
)
SELECT doc_id, token, tf, df, score
FROM (
    SELECT t.doc_id, t.token, t.tf, d.df,
           CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS score,
           ROW_NUMBER() OVER (
               PARTITION BY t.doc_id
               ORDER BY CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE) DESC, t.token
           ) AS rn
    FROM tf t JOIN df d ON d.token = t.token
) r WHERE rn <= 5
"""

DOC_FINGERPRINTS = f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, {_TOKS} AS t FROM documents
),
positioned AS MATERIALIZED (
    SELECT doc_id,
           md5(unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in generate_series(1, len(t) - 2)])) AS h,
           unnest(generate_series(1, len(t) - 2)) AS pos
    FROM toks WHERE len(t) >= 3
)
SELECT DISTINCT doc_id,
       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
FROM positioned
"""

# header byte via ascii(first char): identical to the raw first byte because
# the corpus is pure ASCII (the Spark side reads payload[0] directly).
TOKENIZE_UDTF = f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, {_TOKS} AS t FROM documents
)
SELECT doc_id,
       CAST(generate_subscripts(t, 1) - 1 AS INTEGER) AS pos,
       unnest(t) AS token
FROM toks
"""

# Twin of the REAL PPM decode (multimodal.multimodal_decode): the Spark side
# parses synthesized "P6\n{w} {h}\n255\n" + raw-RGB payloads byte-by-byte;
# this side recomputes every decoded field from the synthesis closed forms
# (w=(id*7)%64+1, h=(id*13)%48+1, pixel k = (id+k)%256, header = 9 bytes +
# the dims' digits). sum_r = Σ_j (id + 3j) % 256 over red positions j<w*h —
# exact BIGINT on both engines.
MULTIMODAL_DECODE = """
WITH d AS MATERIALIZED (
    SELECT doc_id,
           (doc_id * 7) % 64 + 1 AS w,
           (doc_id * 13) % 48 + 1 AS h
    FROM documents
),
px AS MATERIALIZED (
    SELECT doc_id, SUM((doc_id + 3 * j.j) % 256) AS sum_r
    FROM d, LATERAL (SELECT unnest(generate_series(0, d.w * d.h - 1)) AS j) j
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(9 + length(CAST(d.w AS VARCHAR)) + length(CAST(d.h AS VARCHAR))
            + d.w * d.h * 3 AS INTEGER) AS n_bytes,
       CAST(80 AS INTEGER) AS header_byte,
       CAST(d.w AS INTEGER) AS width,
       CAST(d.h AS INTEGER) AS height,
       CAST(px.sum_r AS BIGINT) AS sum_r
FROM d JOIN px USING (doc_id)
"""

MULTIMODAL_RESIZE = """
WITH dims AS MATERIALIZED (
    SELECT doc_id,
           CAST((octet_length(encode(text)) * 7) % 640 + 1 AS BIGINT) AS w,
           CAST((octet_length(encode(text)) * 13) % 480 + 1 AS BIGINT) AS h
    FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS in_width,
       CAST(h AS INTEGER) AS in_height,
       CAST(CASE WHEN w <= 256 AND h <= 256 THEN w
                 WHEN w >= h THEN 256
                 ELSE GREATEST(1, (w * 256) // h) END AS INTEGER) AS out_width,
       CAST(CASE WHEN w <= 256 AND h <= 256 THEN h
                 WHEN w >= h THEN GREATEST(1, (h * 256) // w)
                 ELSE 256 END AS INTEGER) AS out_height
FROM dims
"""

MULTIMODAL_FRAME_SAMPLE = """
WITH f AS MATERIALIZED (
    SELECT doc_id, octet_length(encode(text)) // 64 AS n_frames
    FROM documents
)
SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 10)) AS BIGINT) AS frame_idx
FROM f WHERE n_frames > 0
"""

# Twin of the REAL WAV decode (multimodal.multimodal_audio): the Spark side
# walks actual RIFF chunks and sums |int16 sample| over the PCM plane; this
# side recomputes every field from the synthesis closed forms (channels =
# id%2+1, rate = 8000*(id%3+1), frames = (id*11)%500+1, sample k =
# ((id*31+7k)%4096)-2048; container = 60 header/metadata bytes + 2 bytes
# per interleaved sample). sum_abs is an exact BIGINT on both engines.
MULTIMODAL_AUDIO = """
WITH d AS MATERIALIZED (
    SELECT doc_id,
           doc_id % 2 + 1 AS n_channels,
           8000 * (doc_id % 3 + 1) AS sample_rate,
           (doc_id * 11) % 500 + 1 AS n_frames
    FROM documents
),
pcm AS MATERIALIZED (
    SELECT doc_id,
           SUM(ABS((doc_id * 31 + 7 * k.k) % 4096 - 2048)) AS sum_abs
    FROM d, LATERAL (SELECT unnest(generate_series(
                         0, d.n_frames * d.n_channels - 1)) AS k) k
    GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(60 + 2 * d.n_frames * d.n_channels AS INTEGER) AS n_bytes,
       CAST(d.n_channels AS INTEGER) AS n_channels,
       CAST(d.sample_rate AS INTEGER) AS sample_rate,
       CAST(16 AS INTEGER) AS bits_per_sample,
       CAST(d.n_frames AS BIGINT) AS n_frames,
       CAST(d.n_frames * 1000 // d.sample_rate AS BIGINT) AS duration_ms,
       CAST(pcm.sum_abs AS BIGINT) AS sum_abs
FROM d JOIN pcm USING (doc_id)
"""

MULTIMODAL_FEATURES = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
       ROUND((octet_length(encode(text)) - (length(text) - length(replace(text, ' ', ''))))
             / CAST((length(text) - length(replace(text, ' ', ''))) + 1 AS DOUBLE), 6) AS avg_token_len
FROM documents
"""


_DUP_CTES = f"""
WITH RECURSIVE {_SHINGLED.strip()},
{_SIGS.strip()},
inter AS MATERIALIZED (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
    FROM pairs p
    JOIN shingled sa ON sa.doc_id = p.doc_a
    JOIN shingled sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
    GROUP BY p.doc_a, p.doc_b
),
verified AS MATERIALIZED (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE ROUND(CAST(i.n_common AS DOUBLE)
                / CAST(za.n_sh + zb.n_sh - i.n_common AS DOUBLE), 6) >= 0.1
),
sym AS MATERIALIZED (
    SELECT doc_a AS a, doc_b AS b FROM verified
    UNION ALL SELECT doc_b, doc_a FROM verified
),
reach(doc, peer) AS (
    SELECT DISTINCT a, a FROM sym
    UNION
    SELECT r.doc, s.b FROM reach r JOIN sym s ON s.a = r.peer
),
comp AS (
    SELECT doc AS doc_id, MIN(peer) AS cluster_id FROM reach GROUP BY doc
)"""

DUP_CLUSTERS = _DUP_CTES + """
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
"""

DEDUP_SURVIVORS = _DUP_CTES + """
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
"""

# Twin of sampling.leakage_safe_split (staged r14 declared-query promotion;
# parity pinned NOW by test_leakage_split_twin_parity): split decision per
# dup CLUSTER — rep = COALESCE(component label, own id), bucket = first 4
# hex digits of the seeded md5 of the REPRESENTATIVE's text (the
# dsir_select '0x' hex-cast pattern), val iff bucket < VAL_BUCKETS.
LEAKAGE_SPLIT = _DUP_CTES + f""",
base AS (
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS rep_id
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT b.doc_id, b.rep_id,
       CAST('0x' || substr(md5('{SPLIT_SEED}' || r.text), 1, 4)
            AS BIGINT) AS bucket,
       CASE WHEN CAST('0x' || substr(md5('{SPLIT_SEED}' || r.text), 1, 4)
                      AS BIGINT) < {VAL_BUCKETS}
            THEN 'val' ELSE 'train' END AS split
FROM base b JOIN documents r ON r.doc_id = b.rep_id
"""

# Twin of sampling.epoch_shards at the epoch-0 / N_SHARDS defaults (same
# r14 staging): shard = epoch-seeded content-md5 mod N, seq = ROW_NUMBER
# over (shard, hash order, doc_id tiebreak).
EPOCH_SHARDS = f"""
WITH keyed AS (
    SELECT doc_id,
           CAST('0x' || substr(md5('epoch:0:' || text), 1, 8)
                AS BIGINT) AS h
    FROM documents
)
SELECT doc_id,
       CAST(h % {N_SHARDS} AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS seq
FROM keyed
"""

STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source
FROM documents
WHERE substr(md5(text), 1, 2) < CASE WHEN lang = 'en' THEN '10' ELSE '80' END
"""

DOC_CHUNKING = """
WITH offs AS (
    SELECT doc_id, text,
           unnest(generate_series(0,
               CASE WHEN length(text) <= 200 THEN 0
                    ELSE (length(text) - 51) // 150 END)) AS i
    FROM documents
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
       substr(text, CAST(i * 150 + 1 AS INTEGER), 200) AS chunk,
       CAST(length(substr(text, CAST(i * 150 + 1 AS INTEGER), 200)) AS INTEGER)
           AS chunk_len
FROM offs
"""

PII_SCRUB = """
SELECT event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_redactions
FROM events
"""


GOPHER_QUALITY = f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, {_TOKS} AS t FROM documents
),
words AS MATERIALIZED (
    SELECT doc_id, unnest(t) AS w FROM toks
),
wc AS (
    SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
),
word_stats AS (
    SELECT doc_id, SUM(c) AS n_words, MAX(c) AS top_c,
           SUM(length(w) * c) AS char_sum
    FROM wc GROUP BY doc_id
),
grams AS MATERIALIZED (
    SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                           for i in generate_series(1, len(t) - 1)]) AS sh
    FROM toks WHERE len(t) >= 2
),
gram_stats AS (
    SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT sh) AS n_distinct_grams
    FROM grams GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(w.n_words AS BIGINT) AS n_words,
       ROUND(CAST(w.top_c AS DOUBLE) / w.n_words, 6) AS top_word_frac,
       COALESCE(ROUND(1.0 - CAST(g.n_distinct_grams AS DOUBLE) / g.n_grams, 6),
                0.0) AS dup_2gram_frac,
       ROUND(CAST(w.char_sum AS DOUBLE) / w.n_words, 6) AS mean_word_len,
       (w.n_words >= {GOPHER_MIN_WORDS}
        AND ROUND(CAST(w.top_c AS DOUBLE) / w.n_words, 6)
            <= {GOPHER_TOP_WORD_MAX}
        AND COALESCE(ROUND(1.0 - CAST(g.n_distinct_grams AS DOUBLE)
                           / g.n_grams, 6), 0.0)
            <= {GOPHER_DUP_2GRAM_MAX}) AS passes
FROM word_stats w LEFT JOIN gram_stats g ON w.doc_id = g.doc_id
"""

CONTAMINATION_CHECK = f"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, {_TOKS} AS t FROM documents
),
sh5 AS MATERIALIZED (
    SELECT DISTINCT doc_id,
           unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                   || ' ' || t[i+4]
                   for i in generate_series(1, len(t) - 4)]) AS sh
    FROM toks WHERE len(t) >= 5
),
bench_ids AS (SELECT doc_id FROM documents WHERE source = 'src0'),
bench_sh AS MATERIALIZED (
    SELECT DISTINCT sh FROM sh5 WHERE doc_id IN (SELECT doc_id FROM bench_ids)
),
hits AS (
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
    FROM sh5 s LEFT JOIN bench_sh b ON s.sh = b.sh
    WHERE s.doc_id NOT IN (SELECT doc_id FROM bench_ids)
    GROUP BY s.doc_id
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       ROUND(CAST(n_overlap AS DOUBLE) / n_shingles, 6) AS overlap_frac,
       ROUND(CAST(n_overlap AS DOUBLE) / n_shingles, 6) >= 0.05 AS contaminated
FROM hits
"""

TOKEN_LENGTH_HISTOGRAM = f"""
WITH toks AS (
    SELECT len({_TOKS}) AS nw FROM documents
)
SELECT CAST(length(bin(nw)) - 1 AS INTEGER) AS bucket,
       CAST(1 << (length(bin(nw)) - 1) AS BIGINT) AS lo,
       COUNT(*) AS n_docs,
       ROUND(AVG(CAST(nw AS DOUBLE)), 6) AS avg_words
FROM toks
WHERE nw > 0
GROUP BY 1, 2
"""


SEQUENCE_PACKING = f"""
WITH sized AS (
    SELECT lang, doc_id,
           LEAST(len({_TOKS}), {PACK_CAPACITY}) AS n_words
    FROM documents
),
c AS (
    SELECT lang, doc_id, n_words,
           COALESCE(SUM(n_words) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM sized
)
SELECT lang, doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(cb // {PACK_CAPACITY} AS BIGINT) AS pack_id,
       CAST(cb % {PACK_CAPACITY} AS BIGINT) AS pack_offset
FROM c
"""


TEMPERATURE_MIX_SAMPLE = """
WITH counts AS MATERIALIZED (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
thr AS MATERIALIZED (
    -- 1/sqrt(n), NOT pow(n,-0.5): sqrt and division are correctly-rounded
    -- IEEE ops on both engines; pow is only ~1-ulp and could flip the FLOOR
    SELECT source,
           CAST(FLOOR(1.0 / SQRT(CAST(n AS DOUBLE))
                      / (SELECT MAX(1.0 / SQRT(CAST(n AS DOUBLE))) FROM counts)
                      * 256) AS BIGINT) AS thr
    FROM counts
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN thr t ON d.source = t.source
WHERE (strpos('0123456789abcdef', substr(md5(d.text), 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(md5(d.text), 2, 1)) - 1) < t.thr
"""


# Composed twin of operators/curation.curation_pipeline (the round-12
# flagship's declared-query promotion): chains the stage twins in the
# PIPELINE'S OWN composition — exact-dedup keepers (DEDUP_EXACT's
# MIN(doc_id) keep rule) intersected with the full-corpus near-dup
# survivors (the shared _DUP_CTES chain — same composition as the Spark
# side; the keep-min-id/identical-signature equivalence with the staged
# proof is documented in operators/curation.py), then GOPHER_QUALITY's
# `passes` predicate (per-doc statistics, corpus-computed —
# value-identical on survivors), then the CCNet LM cutoff with unigram
# statistics computed on the DEDUPED corpus (UNIGRAM_LM_SCORE's rational
# inverse-frequency over the survivor words), then SEQUENCE_PACKING's
# window SQL over the curated set. Cross-engine determinism of the
# cutoff: mean_inv_freq is ROUND(·,6) and the cutoff is
# ROUND(lm_factor × AVG(·), 6) on BOTH engines, so the filter compares
# 1e-6-quantized doubles (see the curation module docstring). Thresholds
# (Gopher gates, CURATION_LM_FACTOR, PACK_CAPACITY) are interpolated
# from the operator modules' constants — see the module docstring.
CURATION = _DUP_CTES + f""",
keepx AS MATERIALIZED (
    SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
dd AS MATERIALIZED (
    SELECT t.doc_id, t.t FROM toks t
    JOIN keepx USING (doc_id)
    WHERE t.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
),
gwords AS MATERIALIZED (
    SELECT doc_id, unnest(t) AS w FROM toks
),
gwc AS (
    SELECT doc_id, w, COUNT(*) AS c FROM gwords GROUP BY doc_id, w
),
gws AS (
    SELECT doc_id, SUM(c) AS n_words, MAX(c) AS top_c FROM gwc GROUP BY doc_id
),
ggrams AS MATERIALIZED (
    SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                           for i in generate_series(1, len(t) - 1)]) AS g2
    FROM toks WHERE len(t) >= 2
),
ggs AS (
    SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g2) AS nd
    FROM ggrams GROUP BY doc_id
),
good AS MATERIALIZED (
    SELECT w.doc_id
    FROM gws w LEFT JOIN ggs g ON w.doc_id = g.doc_id
    WHERE w.n_words >= {GOPHER_MIN_WORDS}
      AND ROUND(CAST(w.top_c AS DOUBLE) / w.n_words, 6)
          <= {GOPHER_TOP_WORD_MAX}
      AND COALESCE(ROUND(1.0 - CAST(g.nd AS DOUBLE) / g.n_grams, 6), 0.0)
          <= {GOPHER_DUP_2GRAM_MAX}
),
lw AS MATERIALIZED (
    SELECT doc_id, unnest(t) AS w FROM dd
),
lcnt AS MATERIALIZED (
    SELECT w, COUNT(*) AS c FROM lw GROUP BY w
),
ltot AS (
    SELECT SUM(c) AS tt FROM lcnt
),
ldtc AS (
    SELECT doc_id, w, COUNT(*) AS cdw FROM lw GROUP BY doc_id, w
),
lm AS MATERIALIZED (
    SELECT doc_id,
           ROUND(SUM(cdw * (CAST(tt AS DOUBLE) / c)) / SUM(cdw), 6) AS mif
    FROM ldtc JOIN lcnt USING (w) CROSS JOIN ltot
    GROUP BY doc_id
),
calm AS MATERIALIZED (
    SELECT doc_id FROM lm
    WHERE mif <= (SELECT ROUND({CURATION_LM_FACTOR} * AVG(mif), 6) FROM lm)
),
sized AS (
    SELECT d.lang, c.doc_id, LEAST(len(c.t), {PACK_CAPACITY}) AS n_words
    FROM dd c
    JOIN good USING (doc_id)
    JOIN calm USING (doc_id)
    JOIN documents d USING (doc_id)
),
cumul AS (
    SELECT lang, doc_id, n_words,
           COALESCE(SUM(n_words) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM sized
)
SELECT lang, doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(cb // {PACK_CAPACITY} AS BIGINT) AS pack_id,
       CAST(cb % {PACK_CAPACITY} AS BIGINT) AS pack_offset
FROM cumul
"""


DEDUP_CONTAINMENT = f"""
WITH {_SHINGLED.strip()},
{_SIGS.strip()},
inter AS MATERIALIZED (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
    FROM pairs p
    JOIN shingled sa ON sa.doc_id = p.doc_a
    JOIN shingled sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
    GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.n_common AS DOUBLE)
             / CAST(LEAST(za.n_sh, zb.n_sh) AS DOUBLE), 6) AS containment
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE ROUND(CAST(i.n_common AS DOUBLE)
            / CAST(LEAST(za.n_sh, zb.n_sh) AS DOUBLE), 6) >= 0.5
"""


# Twin of operators.dedup.dedup_substring (window = SUBSTR_WINDOW = 8):
# md5-keyed 8-word sliding windows; a position is duplicated when its key
# appears in >= 2 distinct documents. array_to_string(t[i:i+7], ' ') is the
# same space-join as Spark's concat_ws over the lead window; md5 hex matches
# across engines.
DEDUP_SUBSTRING = """
WITH toks AS MATERIALIZED (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
wins AS MATERIALIZED (
    SELECT doc_id,
           unnest([md5(array_to_string(t[i:i+7], ' '))
                   for i in generate_series(1, len(t) - 7)]) AS h
    FROM toks WHERE len(t) >= 8
),
shared AS MATERIALIZED (
    SELECT h, COUNT(DISTINCT doc_id) AS nd
    FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS MATERIALIZED (
    SELECT doc_id, COUNT(*) AS n_windows FROM wins GROUP BY doc_id
),
dup AS MATERIALIZED (
    SELECT w.doc_id, COUNT(*) AS n_dup_windows, MAX(s.nd) AS max_docs_sharing
    FROM wins w JOIN shared s ON s.h = w.h
    GROUP BY w.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_windows, 0) AS n_windows,
       COALESCE(u.n_dup_windows, 0) AS n_dup_windows,
       CASE WHEN COALESCE(p.n_windows, 0) > 0
            THEN ROUND(CAST(COALESCE(u.n_dup_windows, 0) AS DOUBLE)
                       / p.n_windows, 6)
            ELSE 0.0 END AS dup_frac,
       COALESCE(u.max_docs_sharing, 0) AS max_docs_sharing,
       COALESCE(u.n_dup_windows, 0) = 0 AS keep
FROM documents d
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
LEFT JOIN dup u ON u.doc_id = d.doc_id
"""
