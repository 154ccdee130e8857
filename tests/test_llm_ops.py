"""Behavioral tests for the LLM-pipeline operators on planted fixtures
(the synthetic corpus has no true near-duplicates, so the oracle parity test
alone would not prove detection works)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gmr_spark.operators.dedup import (
    _doc_shingles,
    lsh_candidate_pairs,
    make_simhash32_udf,
    minhash_signatures,
)

DOC = ("the quick brown fox jumps over the lazy dog and then runs far away "
       "into the deep dark forest to find some food for its hungry cubs")
NEAR = DOC.replace("brown", "red")  # one-token edit -> high jaccard
FAR = ("completely different content about spark shuffles and catalyst "
       "optimizer rules that shares nothing with the fox story at all here")


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, NEAR), (3, FAR)], "doc_id long, text string"
    )


def test_minhash_lsh_detects_planted_near_dup(spark):
    shingled = _doc_shingles(_docs(spark))
    pairs = lsh_candidate_pairs(minhash_signatures(shingled)).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found


def test_simhash_near_dup_small_hamming(spark):
    simhash32 = make_simhash32_udf()
    df = _docs(spark).select("doc_id", simhash32(F.col("text")).alias("h"))
    h = {r.doc_id: r.h for r in df.collect()}
    ham_near = bin(h[1] ^ h[2]).count("1")
    ham_far = bin(h[1] ^ h[3]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 8
    # identical text -> identical signature, deterministic across runs
    again = {r.doc_id: r.h for r in _docs(spark).select(
        "doc_id", simhash32(F.col("text")).alias("h")).collect()}
    assert again == h


def test_cosine_topk_matches_numpy_bruteforce(spark):
    import numpy as np

    from gmr_spark.operators.similarity import cosine_topk

    top = cosine_topk(spark, "/root/testdata/sf0.001", n_queries=3, k=5)
    rows = top.collect()
    assert len(rows) == 15

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    for q in (0, 1, 2):
        qi = int(np.where(ids == q)[0][0])
        order = sorted(
            ((round(sims[qi, j], 6), -int(ids[j])) for j in range(len(ids)) if ids[j] != q),
            key=lambda t: (-t[0], -t[1]),
        )
        expected = [(-neg, sim) for sim, neg in order[:5]]
        got = sorted([(r.neighbor_id, r.sim) for r in rows if r.query_id == q])
        assert sorted(expected) == got


def test_cosine_topk_arrow_matches_expression_path(spark):
    """cosine_topk_arrow (the GEMM scale path, round-10) shares
    cosine_topk's declared contract and oracle — the two physical plans
    must produce identical rows on the oracle corpus, including rank and
    the 6 dp sims (fold-order drift is absorbed by the shared ROUND
    contract), and the per-batch top-k must be exact (each batch emits a
    prefix of the global (sim DESC, neighbor_id ASC) order, so the merge
    window cannot lose a global winner)."""
    from gmr_spark.operators.similarity import cosine_topk, cosine_topk_arrow

    from tests.conftest import SF_ORACLE

    got = sorted(map(tuple, cosine_topk_arrow(spark, SF_ORACLE).collect()))
    want = sorted(map(tuple, cosine_topk(spark, SF_ORACLE).collect()))
    assert len(got) == 50  # 5 queries x k=10
    assert got == want

    # plan pin: the candidate stage is Arrow (MapInPandas), never
    # row-at-a-time Python
    df = cosine_topk_arrow(spark, SF_ORACLE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_topk_gemm_kernel_excludes_self_on_tiny_corpus(spark):
    """Edge pin for the round-10 review fix: on a corpus with fewer than
    k non-self vectors the GEMM kernel used to emit self rows with a
    sentinel sim that could surface in the final top-k. Self rows must be
    DROPPED (never ranked), every emitted row must be a real neighbor,
    and rounding must be half-away-from-zero (the Spark/DuckDB ROUND)."""
    import numpy as np
    from pyspark.sql import Window as W

    from gmr_spark.operators.similarity import make_topk_gemm_fn

    # 4 vectors, k=10 > 3 non-self candidates per query
    vecs = [(i, [float(i == j) + 0.5 for j in range(4)]) for i in range(4)]
    base = spark.createDataFrame(vecs, "id long, v array<double>")
    cand = base.mapInPandas(
        make_topk_gemm_fn(vecs[:2], 10),
        "query_id bigint, neighbor_id bigint, sim double")
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    out = (cand.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= 10).collect())
    assert len(out) == 6  # 2 queries x 3 non-self neighbors, never self
    assert all(r.neighbor_id != r.query_id for r in out)
    assert all(r.sim > -2.0 for r in out)
    # half-away-from-zero on each emitted sim: re-derive with numpy
    m = np.array([v for _, v in vecs])
    n = np.linalg.norm(m, axis=1)
    for r in out:
        raw = float(m[r.query_id] @ m[r.neighbor_id]
                    / (n[r.query_id] * n[r.neighbor_id]))
        want = np.sign(raw) * np.floor(abs(raw) * 1e6 + 0.5) / 1e6
        assert r.sim == want, (r, raw)


def test_topk_gemm_empty_query_set_yields_nothing(spark):
    """Edge pin: an empty query set must produce an empty result (the JVM
    twin's broadcast join against zero query rows is empty), not an
    np.concatenate crash inside the task."""
    from gmr_spark.operators.similarity import make_topk_gemm_fn

    base = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(4)], "id long, v array<double>")
    out = base.mapInPandas(
        make_topk_gemm_fn([], 3),
        "query_id bigint, neighbor_id bigint, sim double")
    assert out.count() == 0


def test_topk_gemm_chunked_equals_unchunked():
    """Round-10 verdict item 5: the GEMM kernel chunks the QUERY axis to a
    fixed per-task memory budget. Per-chunk top-k over the same global key
    must be BIT-identical to the unchunked kernel — pinned on a tie-bearing
    corpus (exact duplicate vectors, so 6 dp sims tie and the id tiebreak
    decides) with a chunk budget forcing one query per GEMM. Pure kernel
    test: pandas batches in, pandas frames out, no Spark session."""
    import numpy as np
    import pandas as pd

    from gmr_spark.operators.similarity import make_topk_gemm_fn

    rng = np.random.RandomState(7)
    base = rng.rand(8, 16)
    # 40 vectors in 8 duplicate-groups of 5 -> every sim ties within a group
    vecs = [(i, list(base[i % 8])) for i in range(40)]
    q_rows = vecs[:7]
    pdf = pd.DataFrame({"id": [i for i, _ in vecs],
                        "v": [np.array(v) for _, v in vecs]})
    # chunk_bytes=1 -> q_chunk = max(1, 0) = one query per GEMM
    unchunked = pd.concat(list(make_topk_gemm_fn(q_rows, 5)([pdf])))
    chunked = pd.concat(list(make_topk_gemm_fn(q_rows, 5, chunk_bytes=1)([pdf])))
    pd.testing.assert_frame_equal(
        unchunked.reset_index(drop=True), chunked.reset_index(drop=True))
    # the tie-bearing construction actually exercised ties: duplicate sims
    assert unchunked.groupby("query_id")["sim"].nunique().max() < 5


def test_topk_gemm_zero_norm_fails_loudly_like_jvm_path(spark):
    """Round-10 ADVICE item 1: on a zero-norm vector the two 'identical
    contract' exact paths must not silently diverge. Under Spark 4's
    default ANSI mode the JVM ``cosine_topk`` expression fails LOUDLY
    (0/0 is DIVIDE_BY_ZERO, not NaN) — so the GEMM kernel raises an
    equally loud error, corpus-side per batch and query-side at factory
    time, instead of letting np.lexsort park a silent NaN last."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    from gmr_spark.operators.similarity import _dot, _norm, make_topk_gemm_fn

    vecs = [(i, [float(i == j) + 0.25 for j in range(4)]) for i in range(6)]
    vecs.append((6, [0.0, 0.0, 0.0, 0.0]))  # the degenerate row
    base = spark.createDataFrame(vecs, "id long, v array<double>")
    q_rows = vecs[:2]

    # the JVM expression twin of cosine_topk fails loudly under ANSI
    queries = spark.createDataFrame(q_rows, "query_id long, q array<double>")
    jvm = (
        base.join(F.broadcast(queries))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id", F.col("id").alias("neighbor_id"),
            F.round(_dot(F.col("q"), F.col("v"))
                    / (_norm(F.col("q")) * _norm(F.col("v"))), 6).alias("sim"))
    )
    with pytest.raises((ArithmeticException, Py4JJavaError),
                       match="DIVIDE_BY_ZERO"):
        jvm.collect()

    # ...so the Arrow kernel must too (corpus side, raised in the task)
    cand = base.mapInPandas(
        make_topk_gemm_fn(q_rows, 3),
        "query_id bigint, neighbor_id bigint, sim double")
    with pytest.raises(Exception, match="zero-norm"):
        cand.collect()

    # query side: validated eagerly on the driver, before any job runs
    with pytest.raises(ValueError, match="zero-norm query"):
        make_topk_gemm_fn([(6, [0.0, 0.0, 0.0, 0.0])], 3)

    # and on the clean corpus the two paths still agree row-for-row
    clean = [(i, v) for i, v in vecs if i != 6]
    base_c = spark.createDataFrame(clean, "id long, v array<double>")
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    queries_c = spark.createDataFrame(q_rows, "query_id long, q array<double>")
    jvm_rows = sorted(map(tuple, (
        base_c.join(F.broadcast(queries_c))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id", F.col("id").alias("neighbor_id"),
            F.round(_dot(F.col("q"), F.col("v"))
                    / (_norm(F.col("q")) * _norm(F.col("v"))), 6).alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3).collect())))
    arrow_rows = sorted(map(tuple, (
        base_c.mapInPandas(make_topk_gemm_fn(q_rows, 3),
                           "query_id bigint, neighbor_id bigint, sim double")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3).collect())))
    assert jvm_rows == arrow_rows and len(jvm_rows) == 6


def test_multimodal_decode_real_ppm(spark):
    """The decode stage parses REAL P6 PPM bytes: header dims and the
    red-channel pixel sum must match an independent Python decode of the
    same synthesized payload (round-4 verdict item 7)."""
    from gmr_spark.operators.multimodal import (
        decode_image, multimodal_decode, ppm_payload)

    out = multimodal_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    for r in out[:5]:
        payload = ppm_payload(r.doc_id)
        w, h, rgb = decode_image(payload)
        assert (r.width, r.height) == (w, h)
        assert r.n_bytes == len(payload)
        assert r.header_byte == ord("P")
        assert r.sum_r == sum(rgb[0::3])


def test_multimodal_decode_scans_binary_files_and_matches_synth(spark):
    """round-5 verdict item 3: the declared decode query must enter through
    the source a real image corpus uses — spark.read.format('binaryFile')
    over on-disk .ppm files — and stay result-identical to the scan-free
    synthesized twin. Pins the binaryFile scan in the executed plan."""
    from gmr_spark.operators.multimodal import (
        multimodal_decode, multimodal_decode_synth)

    df = multimodal_decode(spark, "/root/testdata/sf0.001")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "binaryFile" in plan, plan.splitlines()[:20]
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple,
                      multimodal_decode_synth(spark, "/root/testdata/sf0.001")
                      .collect()))
    assert got == want and len(got) == 500


def test_multimodal_audio_files_scans_binary_and_matches_synth(spark):
    """The audio sibling of the image binaryFile path: the file-backed
    variant must enter through spark.read.format('binaryFile') over on-disk
    .wav files and stay result-identical to the synthesized twin."""
    from gmr_spark.operators.multimodal import (
        multimodal_audio, multimodal_audio_files)

    df = multimodal_audio_files(spark, "/root/testdata/sf0.001")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "binaryFile" in plan, plan.splitlines()[:20]
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple,
                      multimodal_audio(spark, "/root/testdata/sf0.001")
                      .collect()))
    assert got == want and len(got) == 500


def test_multimodal_pack_decodes_identically_from_parquet_shards(spark):
    """The round-8 pack hop: binaryFile dir -> parquet binary-column shards
    -> decode. The packed plan must scan PARQUET (no binaryFile node — that
    per-object cost is paid once in the build, not per pass) and its rows
    must be identical to the file-backed and synthesized variants. A second
    call must serve the committed shards (marker short-circuit)."""
    import os

    from gmr_spark.operators.multimodal import (
        _ensure_packed_payloads,
        _make_wav_payload_batches,
        multimodal_audio,
        multimodal_pack,
    )

    sf = "/root/testdata/sf0.001"
    df = multimodal_pack(spark, sf)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "binaryFile" not in plan, plan.splitlines()[:20]
    assert "parquet" in plan.lower()
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, multimodal_audio(spark, sf).collect()))
    assert got == want and len(got) == 500

    packed_dir = _ensure_packed_payloads(spark, sf, "wav",
                                         _make_wav_payload_batches)
    marker = os.path.join(packed_dir, "_FINGERPRINT")
    mtime = os.stat(marker).st_mtime_ns
    again = _ensure_packed_payloads(spark, sf, "wav",
                                    _make_wav_payload_batches)
    assert again == packed_dir
    assert os.stat(marker).st_mtime_ns == mtime, "pack hop rebuilt needlessly"


def test_multimodal_ppm_files_rebuild_on_fingerprint_change(tmp_path, spark):
    """A rewritten corpus must rebuild the on-disk payloads (marker records
    the fingerprint), and a matching marker short-circuits the write."""
    import os

    from gmr_spark.operators import multimodal as M

    d1 = M._ensure_ppm_files(spark, "/root/testdata/sf0.001")
    assert os.path.exists(os.path.join(d1, "_FINGERPRINT"))
    n = len([f for f in os.listdir(d1) if f.endswith(".ppm")])
    assert n == 500
    # second call: marker hit, same dir back
    mtime = os.path.getmtime(os.path.join(d1, "1.ppm"))
    assert M._ensure_ppm_files(spark, "/root/testdata/sf0.001") == d1
    assert os.path.getmtime(os.path.join(d1, "1.ppm")) == mtime


def test_multimodal_worker_closures_match_module_functions():
    """Drift guard (round-5 ADVICE): the synthesis/decode formulas exist as
    module-level functions AND inlined worker closures (shipped by value —
    workers can't import the package). Run both closures directly over the
    full dimension grid — doc_id 0..191 covers every reachable (w, h) pair,
    since w depends on id mod 64, h on id mod 48, lcm = 192 — and assert
    byte/field equality with decode_image(ppm_payload(id))."""
    import pandas as pd

    from gmr_spark.operators.multimodal import (
        _make_decode_batches, _make_ppm_payload_batches, decode_image,
        ppm_payload)

    ids = pd.DataFrame({"doc_id": range(192)})
    (pay,) = list(_make_ppm_payload_batches()([ids]))
    for i, payload in zip(pay["doc_id"], pay["payload"]):
        assert bytes(payload) == ppm_payload(int(i))
    (dec,) = list(_make_decode_batches()([pay]))
    for row in dec.itertuples():
        payload = ppm_payload(int(row.doc_id))
        w, h, rgb = decode_image(payload)
        assert (row.width, row.height) == (w, h)
        assert row.n_bytes == len(payload)
        assert row.sum_r == sum(rgb[0::3])


def test_decode_image_unsupported_codec_branch():
    import pytest as _pytest

    from gmr_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    # comment-bearing header parses like any spec-conforming reader's
    w, h, rgb = decode_image(b"P6\n# cam 3\n2 1\n255\n" + bytes(6))
    assert (w, h, len(rgb)) == (2, 1, 6)


def test_decode_audio_real_riff_parsing():
    """The audio decoder is a REAL RIFF/WAVE chunk walker: it must skip the
    planted LIST metadata chunk, honor the odd-size pad byte, and land on
    the unsupported-codec branch for non-RIFF containers and non-PCM-16
    encodings (mirror of the image decoder's guarantees)."""
    import struct

    import pytest as _pytest

    from gmr_spark.operators.multimodal import decode_audio, wav_payload

    # synthesized payload round-trips: closed-form fields recovered by parse
    for doc_id in (0, 1, 2, 3, 4, 5, 17):
        ch, rate, frames, sum_abs = decode_audio(wav_payload(doc_id))
        assert ch == doc_id % 2 + 1
        assert rate == 8000 * (doc_id % 3 + 1)
        assert frames == (doc_id * 11) % 500 + 1
        want = sum(abs((doc_id * 31 + 7 * k) % 4096 - 2048)
                   for k in range(frames * ch))
        assert sum_abs == want

    # hand-crafted WAV with an ODD-size unknown chunk before data: a walker
    # that forgets RIFF's pad byte misreads everything after it
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pcm = struct.pack("<3h", 100, -200, 300)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"junk" + struct.pack("<I", 3) + b"xy z"  # 3 bytes + pad
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_audio(wav) == (1, 8000, 3, 600)

    with _pytest.raises(NotImplementedError):
        decode_audio(b"OggS" + bytes(20))  # non-RIFF container
    # IEEE-float WAV (format 3) -> unsupported-codec branch
    f32 = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + f32
            + b"data" + struct.pack("<I", 4) + bytes(4))
    with _pytest.raises(NotImplementedError):
        decode_audio(b"RIFF" + struct.pack("<I", len(body)) + body)
    # truncated data chunk -> loud ValueError, not a silent short read
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 100) + bytes(10))
    with _pytest.raises(ValueError):
        decode_audio(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_multimodal_audio_closures_match_module_functions():
    """Drift guard (same discipline as the image pair): the WAV synthesis/
    decode formulas exist as module functions AND inlined worker closures.
    doc_id 0..5 covers the full (channels, rate) grid (periods 2 and 3,
    lcm 6); 0..59 adds frame-count variety. Assert byte/field equality with
    decode_audio(wav_payload(id))."""
    import pandas as pd

    from gmr_spark.operators.multimodal import (
        _make_audio_decode_batches, _make_wav_payload_batches, decode_audio,
        wav_payload)

    ids = pd.DataFrame({"doc_id": range(60)})
    (pay,) = list(_make_wav_payload_batches()([ids]))
    for i, payload in zip(pay["doc_id"], pay["payload"]):
        assert bytes(payload) == wav_payload(int(i))
    (dec,) = list(_make_audio_decode_batches()([pay]))
    for row in dec.itertuples():
        payload = wav_payload(int(row.doc_id))
        ch, rate, frames, sum_abs = decode_audio(payload)
        assert (row.n_channels, row.sample_rate) == (ch, rate)
        assert (row.n_frames, row.sum_abs) == (frames, sum_abs)
        assert row.n_bytes == len(payload)
        assert row.bits_per_sample == 16
        assert row.duration_ms == frames * 1000 // rate


def test_unigram_lm_score_ranks_rarity(spark):
    """CCNet-style LM filter on a planted corpus: the doc holding the
    corpus's single rarest token must carry the highest mean and max
    inverse frequency; a doc of only the most common token scores the
    floor (T / C(common))."""
    from gmr_spark.operators.text_analysis import unigram_lm_frame

    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common rareword"),
            (3, "common common"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_lm_frame(docs).collect()}
    # T = 10, C(common) = 9, C(rareword) = 1
    assert out[1].n_tokens == 4 and out[3].n_tokens == 2
    floor = round(10 / 9, 6)
    assert out[1].mean_inv_freq == floor == out[1].max_inv_freq
    assert out[3].mean_inv_freq == floor
    assert out[2].max_inv_freq == 10.0  # the rare token spike
    assert out[2].mean_inv_freq == round((3 * (10 / 9) + 10.0) / 4, 6)
    assert out[2].mean_inv_freq > out[1].mean_inv_freq


def test_winnowing_shares_fingerprints_on_overlap(spark):
    from gmr_spark.operators.text_analysis import doc_fingerprints

    # monkeypatch-free: write planted docs to a temp view is not possible via
    # sf_dir, so test the primitive chain directly
    from gmr_spark.functions.text import tokens, word_shingles
    from pyspark.sql import Window as W

    docs = _docs(spark)
    sh = docs.select(
        "doc_id", F.posexplode(word_shingles(tokens(F.col("text")))).alias("pos", "sh")
    ).select("doc_id", "pos", F.md5("sh").alias("h"))
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    fps = sh.select("doc_id", F.min("h").over(w).alias("fp")).distinct()
    by_doc = {d: {r.fp for r in fps.filter(F.col("doc_id") == d).collect()} for d in (1, 2, 3)}
    overlap_near = len(by_doc[1] & by_doc[2])
    overlap_far = len(by_doc[1] & by_doc[3])
    assert overlap_near > 0 and overlap_far == 0


def test_word_shingles_short_and_empty_docs(spark):
    # regression: sequence(1, 0) is DESCENDING in Spark; short docs must
    # yield [] instead of element_at(_, 0) errors
    from pyspark.sql import functions as F

    from gmr_spark.functions.text import tokens, word_shingles

    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "x y z"), (4, "one")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.sh for r in df.select(
        "doc_id", word_shingles(tokens(F.col("text"))).alias("sh")).collect()}
    assert got[1] == [] and got[2] == [] and got[4] == []
    assert got[3] == ["x y z"]


SF001 = "/root/testdata/sf0.001"


def test_sequence_packing_invariants(spark):
    """pack_offset < capacity always; within a language, packs are
    contiguous from 0 and offsets advance by the previous doc's (truncated)
    length; no doc exceeds capacity."""
    from gmr_spark.operators.sampling import PACK_CAPACITY, sequence_packing

    rows = sequence_packing(spark, SF001).orderBy("lang", "doc_id").collect()
    assert rows
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert rs[0].pack_id == 0 and rs[0].pack_offset == 0
        cum = 0
        for r in rs:
            assert 0 < r.n_words <= PACK_CAPACITY
            assert 0 <= r.pack_offset < PACK_CAPACITY
            assert r.pack_id == cum // PACK_CAPACITY
            assert r.pack_offset == cum % PACK_CAPACITY
            cum += r.n_words
        assert {r.pack_id for r in rs} == set(range(rs[-1].pack_id + 1)), \
            f"{lang}: pack ids must be contiguous"


def test_contamination_excludes_benchmark_docs(spark):
    """Benchmark-source docs never appear in the scan output, and any doc
    sharing no 5-gram with the benchmark slice scores 0."""
    from gmr_spark.operators.text_analysis import (
        CONTAM_BENCH_SOURCE, contamination_check)
    from gmr_spark.sources.tables import load_tables
    from pyspark.sql import functions as F

    out = contamination_check(spark, SF001)
    docs = load_tables(spark, SF001)["documents"]
    bench = {r.doc_id for r in
             docs.filter(F.col("source") == CONTAM_BENCH_SOURCE)
             .select("doc_id").collect()}
    got = out.collect()
    assert got and bench
    assert not ({r.doc_id for r in got} & bench)
    for r in got:
        assert 0 <= r.n_overlap <= r.n_shingles
        assert r.contaminated == (round(r.n_overlap / r.n_shingles, 6) >= 0.05)


def test_dedup_survivors_keep_rule(spark):
    """survivors = all docs minus (cluster members that are not their
    cluster's min-id representative); every cluster keeps exactly one."""
    from gmr_spark.operators.dedup import dedup_survivors, dup_clusters
    from gmr_spark.sources.tables import load_tables

    clusters = dup_clusters(spark, SF001).collect()
    survivors = {r.doc_id for r in dedup_survivors(spark, SF001).collect()}
    n_docs = load_tables(spark, SF001)["documents"].count()
    retired = {r.doc_id for r in clusters if r.doc_id != r.cluster_id}
    assert survivors == (
        {r.doc_id for r in clusters if r.doc_id == r.cluster_id}
        | (set(range(n_docs)) - {r.doc_id for r in clusters})
    )
    assert len(survivors) == n_docs - len(retired)


def test_temperature_mix_flattens_skewed_sources(spark, tmp_path):
    """On a 9:1 source skew with T=2: w = n^-0.5 gives the small source
    rate 1.0 (keeps everything) and the big source rate sqrt(1/9) ≈ 1/3 —
    the flattening contract. Membership is content-hash-deterministic, so
    the kept fraction concentrates tightly around the rate."""
    import os

    from pyspark.sql import functions as F

    from gmr_spark.operators.sampling import temperature_mix_sample

    scratch = str(tmp_path / "skewed")
    os.makedirs(scratch)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                   f"{scratch}/{t}.parquet")
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body number "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.when(F.col("id") % 10 == 0, "small").otherwise("big").alias("source"),
        F.lit(20).alias("n_chars"),
    )
    docs.write.parquet(f"{scratch}/documents.parquet")

    kept = temperature_mix_sample(spark, scratch).groupBy("source").count()
    got = {r.source: r["count"] for r in kept.collect()}
    assert got["small"] == 1_000  # rate 1.0: the tail source keeps all
    # big: rate = (9000^-0.5)/(1000^-0.5) = 1/3 -> thr floor(256/3)=85;
    # hash buckets are uniform, so kept ≈ 9000 * 85/256 = 2988 ± noise
    assert 2700 <= got["big"] <= 3300, got


def test_rh_lsh_recall_beats_axis_aligned(spark):
    """Round-3 verdict item 6 done-criterion: the seeded random-hyperplane
    multi-table LSH must recall at least as much of the exact top-3 as the
    axis-aligned single-table variant (whose measured recall on this corpus
    is 0 — single 16-bit tables cannot collide ~70° neighbors), and
    strictly more than nothing."""
    from gmr_spark.operators.similarity import ann_recall_at_k

    from tests.conftest import SF_ORACLE

    rows = {r.method: r.recall for r in ann_recall_at_k(spark, SF_ORACLE).collect()}
    assert set(rows) == {"ivf", "ivf_pq", "rh_lsh", "sign_lsh"}
    assert rows["rh_lsh"] >= rows["sign_lsh"]
    assert rows["rh_lsh"] >= 0.2
    # EMPIRICAL pin on the fixed oracle corpus (round-9 ADVICE item 2):
    # ivf_pq shortlists within the same probed-cell candidate set ivf
    # re-ranks exactly, and on THIS corpus the shortlist never promotes a
    # neighbor past ivf's top-3 — but that is not a structural bound
    # (re-ranking a subset can in principle reorder the top-k), so if a
    # param/corpus change trips this, re-measure rather than assume a bug
    assert rows["ivf_pq"] <= rows["ivf"]
    assert rows["ivf_pq"] >= 0.2


def test_pq_encode_seed_identity():
    """PQ kernel invariants (no Spark needed): every codebook seed encodes
    to its own code (self sub-distance is exactly 0 in every subspace), so
    ADC(seed, seed) == 0 — the argmin/LUT kernel is shared, this pins both."""
    import numpy as np
    import pandas as pd

    from gmr_spark.operators.similarity import (
        PQ_DSUB, PQ_KS, PQ_M, _pq_subdists)

    rng = np.random.RandomState(7)
    seeds = rng.rand(PQ_KS, PQ_M * PQ_DSUB) * 2 - 1
    codebook = [
        [[float(seeds[c, j * PQ_DSUB + d]) for d in range(PQ_DSUB)]
         for c in range(PQ_KS)]
        for j in range(PQ_M)
    ]
    d2 = _pq_subdists(codebook)(pd.Series(list(seeds)))
    assert d2.shape == (PQ_KS, PQ_M, PQ_KS)
    codes = d2.argmin(axis=2)
    assert (codes == np.arange(PQ_KS)[:, None]).all()
    self_d = d2[np.arange(PQ_KS), :, np.arange(PQ_KS)]
    assert (self_d == 0.0).all()


def test_pq_codebook_training_reduces_quantization_error(spark):
    """Per-subspace Lloyd (train_pq_codebook, round-9 verdict item 2):
    (a) each training round must not increase the mean quantization error
    (Lloyd monotonicity, up to the 9 dp centroid rounding), and on this
    corpus the first round improves it strictly and substantially;
    (b) the trained codebook matches a driver-side numpy Lloyd run exactly
    (same argmin tie rule, same 9 dp mean rounding) — the distributed
    partial-sum pass is an implementation of Lloyd, not an approximation;
    (c) ann_ivf_pq(train_iters=1) keeps the declared output contract
    (schema + per-query row bound)."""
    import numpy as np
    from pyspark.sql import functions as F

    from gmr_spark.operators.similarity import (
        PQ_DSUB, PQ_KS, PQ_M, _pq_subdists, _vec, ann_ivf_pq, pq_mse,
        train_pq_codebook)
    from gmr_spark.sources.tables import load_tables

    from tests.conftest import SF_ORACLE

    emb = load_tables(spark, SF_ORACLE)["embeddings"]
    df = emb.select(F.col("vec_id").alias("id"), _vec().alias("v"))
    seed_rows = df.orderBy("id").limit(PQ_KS).collect()
    seeded = [
        [[float(r.v[j * PQ_DSUB + d]) for d in range(PQ_DSUB)]
         for r in seed_rows]
        for j in range(PQ_M)
    ]

    mse0 = pq_mse(df, seeded)
    t1 = train_pq_codebook(df, seeded, iters=1)
    mse1 = pq_mse(df, t1)
    t2 = train_pq_codebook(df, seeded, iters=2)
    mse2 = pq_mse(df, t2)
    assert mse1 <= mse0 * 0.8, (mse0, mse1)   # first round: a real drop
    assert mse2 <= mse1 + 1e-9, (mse1, mse2)  # monotone (mod 9 dp rounding)

    # (b) exact agreement with a driver-side numpy Lloyd iteration
    mat = np.vstack([r.v for r in df.orderBy("id").collect()])
    want = [[list(c) for c in sub] for sub in seeded]
    codes = _pq_subdists(want)(
        __import__("pandas").Series(list(mat))).argmin(axis=2)
    sub = mat.reshape(len(mat), PQ_M, PQ_DSUB)
    for m in range(PQ_M):
        for c in range(PQ_KS):
            mask = codes[:, m] == c
            if mask.any():
                want[m][c] = [round(float(x), 9)
                              for x in sub[mask, m, :].mean(axis=0)]
    assert t1 == want

    # (c) trained variant keeps the output contract
    out = ann_ivf_pq(spark, SF_ORACLE, train_iters=1)
    assert out.columns == ["query_id", "neighbor_id", "sim", "rnk"]
    per_q = out.groupBy("query_id").count().agg(F.max("count")).first()[0]
    assert per_q <= 3


def test_ann_ivf_pq_plan_is_bucketed_and_arrow(spark):
    """Plan pins for the compressed-index path: candidates come from the
    cell equi-join (no cartesian / nested-loop anywhere), all Python in the
    plan is Arrow-vectorized — encode + LUT as ArrowEvalPython, ADC as the
    cogrouped FlatMapCoGroupsInPandas transport (measured faster than the
    LUT-join expression at both scales, SCALE.md r9) — never
    row-at-a-time."""
    from gmr_spark.operators.similarity import ann_ivf_pq

    from tests.conftest import SF_ORACLE

    df = ann_ivf_pq(spark, SF_ORACLE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "ArrowEvalPython" in plan          # encode + LUT are Arrow
    assert "FlatMapCoGroupsInPandas" in plan  # cogrouped ADC transport
    assert "BatchEvalPython" not in plan      # no row-at-a-time Python


def _celltrain_toy_dir(spark, tmp_path) -> str:
    """Planted 80-vector corpus where the SEEDED coarse quantizer is bad on
    both measured legs: two well-separated clusters (pairs (2t, 2t+1) sit
    ~0.001 apart inside their pair, so the partner is every vector's true
    NN), but the two lowest-id vectors — the seeds — are BOTH in cluster 0,
    placed asymmetrically so seed 0 also captures all of cluster 1 (hot
    cell) while cluster-0 pairs split ~50/50 across the two seeds (partner
    misses). Lloyd recovers the true centers: same-cell rate -> 1.0,
    max/mean -> 1.0. Only embeddings.parquet is planted; the other tables
    symlink sf0.001 (the scale_llm.build_corpus pattern)."""
    import os

    import numpy as np

    dim, n = 64, 80
    centers = np.zeros((2, dim))
    centers[0, 0] = 4.0
    centers[1, 1] = 4.0
    e1 = np.eye(dim)[1]
    rows = []
    for i in range(n):
        pair = i // 2
        cluster = pair % 2
        sub = centers[cluster] + \
            0.1 * np.random.RandomState(100 + pair).rand(dim)
        if cluster == 0:
            # pin the pair's sub-center ON the seed0/seed1 mid-plane
            # (dim 1 = 0.05, see the seeds below) and split the members
            # ±0.002 across it — every cluster-0 pair deterministically
            # straddles the seeded Voronoi boundary while the partner
            # (0.004 away) stays each member's true NN by a 50x margin
            sub[1] = 0.05
        # alternate which member sits on the + side per cluster-0 pair so
        # the id-residue training sample (sample_mod=2: even ids) covers
        # BOTH sides — else one seeded cell goes empty in the sample and
        # Lloyd degenerates to k=1
        sign = 1.0 if ((i % 2) + (pair // 2)) % 2 == 0 else -1.0
        v = sub + 0.002 * sign * e1
        rows.append((i, [float(x) for x in v]))
    # the two seeds: cluster-0 members pushed ±0.5 along dim 1. They differ
    # ONLY in dim 1, so every cell assignment is decided by dim 1 alone:
    # all of cluster 1 (dim1 ~ 4) goes to seed 0 (the hot cell), and each
    # pinned cluster-0 pair splits across the 0.05 mid-plane
    base0 = centers[0] + 0.05
    rows[0] = (0, [float(x) for x in base0 + 0.5 * e1])
    rows[1] = (1, [float(x) for x in base0 - 0.5 * e1])
    toy = tmp_path / "celltrain"
    toy.mkdir()
    spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .coalesce(1).write.parquet(str(toy / "embeddings.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                   str(toy / f"{t}.parquet"))
    return str(toy)


def test_train_ivf_cells_improves_both_legs_through_api(spark, tmp_path):
    """Round-10 verdict item 3: trained coarse cells must be reachable
    through the library API (train_ivf_cells / _ivf_index_probes
    centroids= / ann_ivf_pq cell_train_iters=), reproducing both legs the
    scale probe measured (scripts/scale_r10.py:run_celltrain, SCALE.md):
    planted-partner same-cell rate AND max/mean cell balance improve."""
    from gmr_spark.operators.similarity import (
        _ivf_index_probes, _vec, train_ivf_cells)
    from gmr_spark.sources.tables import load_tables

    toy = _celltrain_toy_dir(spark, tmp_path)
    emb = load_tables(spark, toy)["embeddings"]
    df = emb.select(F.col("vec_id").alias("id"), _vec().alias("v"))

    def legs(centroids):
        indexed, _ = _ivf_index_probes(df, k_cells=2, nprobe=1,
                                       centroids=centroids)
        cells = {r.neighbor_id: r.cell for r in indexed.collect()}
        pairs = [(cells[2 * t], cells[2 * t + 1]) for t in range(40)]
        same = sum(a == b for a, b in pairs) / len(pairs)
        sizes = [sum(1 for c in cells.values() if c == k)
                 for k in sorted(set(cells.values()))]
        return same, max(sizes) / (sum(sizes) / len(sizes))

    seeded_same, seeded_bal = legs(None)
    trained = train_ivf_cells(df, k_cells=2, iters=3, sample_mod=2)
    trained_same, trained_bal = legs(trained)
    # the planted construction actually stresses the seeds...
    assert seeded_same < 0.9 and seeded_bal > 1.2, (seeded_same, seeded_bal)
    # ...and training recovers both legs (the scale probe's two metrics)
    assert trained_same > seeded_same and trained_same == 1.0
    assert trained_bal < seeded_bal and trained_bal == 1.0


def test_ivf_arrow_assign_matches_expression_path(spark):
    """The Arrow coarse-assign twin (make_cell_rank_fn / assign="arrow")
    must agree with the expression path on BOTH outputs — nearest cell per
    vector and the nprobe probe set per query — on the oracle table (the
    kmeans._assign vs _assign_arrow contract: the GEMM identity is not
    bit-identical pre-round, so declared queries keep "expr" and the
    agreement is pinned here). Also pins the Arrow plan and the
    interpreter-bound rationale's fix being value-neutral end-to-end:
    ann_ivf_pq(cell_assign="arrow") returns the declared rows."""
    from gmr_spark.operators.similarity import (
        _ivf_index_probes, _vec, ann_ivf_pq)
    from gmr_spark.sources.tables import load_tables

    from tests.conftest import SF_ORACLE

    emb = load_tables(spark, SF_ORACLE)["embeddings"]
    df = emb.select(F.col("vec_id").alias("id"), _vec().alias("v"))
    for kc, npb in ((8, 2), (16, 3)):
        ie, pe = _ivf_index_probes(df, k_cells=kc, nprobe=npb)
        ia, pa = _ivf_index_probes(df, k_cells=kc, nprobe=npb,
                                   assign="arrow")
        assert sorted(map(tuple, ie.select("neighbor_id", "cell").collect())) \
            == sorted(map(tuple, ia.select("neighbor_id", "cell").collect()))
        assert sorted(map(tuple, pe.select("query_id", "cell").collect())) \
            == sorted(map(tuple, pa.select("query_id", "cell").collect()))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = ia._jdf.queryExecution().explainString(mode)
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    got = sorted(map(tuple,
                     ann_ivf_pq(spark, SF_ORACLE,
                                cell_assign="arrow").collect()))
    want = sorted(map(tuple, ann_ivf_pq(spark, SF_ORACLE).collect()))
    assert got == want and len(got) == 1500


def test_train_ivf_cells_degenerate_sample_keeps_seeds(spark):
    """Edge pin: a sample_mod past the id range leaves the Lloyd pass with
    zero rows — the trainer must return the seed centroids instead of
    feeding an empty codebook back into the assign kernel."""
    from gmr_spark.operators.similarity import train_ivf_cells

    base = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 7)],
        "id long, v array<double>")  # no id % 1000 == 0 -> empty sample
    cents = train_ivf_cells(base, k_cells=2, iters=2, sample_mod=1000)
    assert [c for c, _ in cents] == [0, 1]
    assert [v for _, v in cents] == [[1.0, 1.0], [2.0, 1.0]]  # the seeds


def test_ann_ivf_pq_cell_train_iters_recovers_partner_recall(spark, tmp_path):
    """The public production config (cell_train_iters>0): on the planted
    corpus the seeded quantizer splits ~half the cluster-0 pairs across a
    Voronoi boundary, so at nprobe=1 those partners are unreachable; with
    trained cells every pair lands in one cell and partner recall@1
    recovers. Declared defaults (cell_train_iters=0) keep the seeded,
    oracle-derivable quantizer — pinned by the driver's hash-green row."""
    from gmr_spark.operators.similarity import ann_ivf_pq

    toy = _celltrain_toy_dir(spark, tmp_path)

    def partner_hits(**kw):
        out = ann_ivf_pq(spark, toy, k_cells=2, nprobe=1, topk=1,
                         shortlist=4, **kw).collect()
        return sum(r.neighbor_id == (r.query_id ^ 1) for r in out
                   if r.rnk == 1)

    seeded = partner_hits()
    trained = partner_hits(cell_train_iters=3, cell_sample_mod=2)
    assert seeded < 70, seeded          # the seeds genuinely lose partners
    assert trained > seeded
    # ~all 80 queries recover at topk=1 (ids 0/1 — the planted seeds, 1.0
    # apart — are the two structural misses whose true NN isn't the partner)
    assert trained >= 74, trained


def test_pq_training_pass_plan_is_arrow_with_partial_agg(spark):
    """Plan pins for the codebook-training pass (round-10): the per-
    iteration stats job must be one Arrow MapInPandas pass feeding a
    HASH aggregate with a partial (map-side) phase — each task combines
    its own 1,024 partial rows before the exchange, so the shuffle is
    metadata-class at any corpus size — and no row-at-a-time Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from gmr_spark.operators.similarity import _vec
    from gmr_spark.sources.tables import load_tables

    from tests.conftest import SF_ORACLE

    emb = load_tables(spark, SF_ORACLE)["embeddings"]
    df = emb.select(F.col("vec_id").alias("id"), _vec().alias("v"))

    # the per-iteration stats frame train_pq_codebook builds, with a
    # schema-only body (the pin is about the PLAN shape, not the values)
    def partials(batches):
        yield pd.DataFrame({"m": np.array([], dtype="int32"),
                            "code": np.array([], dtype="int32"),
                            "dim": np.array([], dtype="int32"),
                            "s": np.array([], dtype="float64"),
                            "cnt": np.array([], dtype="int64")})

    stats = (
        df.mapInPandas(partials,
                       "m int, code int, dim int, s double, cnt long")
        .groupBy("m", "code", "dim")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = stats._jdf.queryExecution().explainString(mode)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    # partial (map-side) hash aggregation before the exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_lang_id_multilingual_predicts_every_language(spark):
    """The embedded fixture makes lang-id predictions non-degenerate: every
    language is predicted, and each doc's argmax is its own language."""
    from gmr_spark.operators.text_analysis import lang_id_multilingual

    rows = lang_id_multilingual(spark, "unused").collect()
    assert len(rows) == 25
    assert all(r.lang_pred == r.lang_actual for r in rows)
    assert len({r.lang_pred for r in rows}) == 5


def test_semdedup_retires_planted_semantic_dup(spark):
    from gmr_spark.operators.dedup import semdedup_frame

    # 12 well-separated base vectors + one near-copy of vector 3 (small
    # perturbation -> cosine ~0.9996). k=3 clusters, threshold 0.9: the copy
    # (higher id) must be retired, the original (lower id) kept.
    # v_i = e_{i%4} + e_{4+(i//4)}: any two distinct base vectors share at
    # most one axis -> cosine <= 0.5, far under the 0.9 threshold
    base = [[0.0] * 8 for _ in range(12)]
    for i in range(12):
        base[i][i % 4] = 1.0
        base[i][4 + (i // 4)] = 1.0
    dup = list(base[3])
    dup[0] += 0.02
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((99, [float(x) for x in dup]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup_frame(emb, k=3, iters=2, threshold=0.9).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == 13
    assert not by_id[99].keep and by_id[99].n_dup_earlier >= 1
    assert by_id[99].max_sim_earlier > 0.99
    assert by_id[3].keep  # the lower-id original survives
    # same cluster, or the retire rule could never have seen the pair
    assert by_id[99].cluster == by_id[3].cluster
    # everything else is far from its earlier cluster peers
    assert all(r.keep for r in out if r.vec_id != 99)


def test_bm25_ranking_properties(spark):
    from gmr_spark.operators.text_analysis import (
        BM25_QUERIES, BM25_TOP_K, bm25_topk,
    )

    out = bm25_topk(spark, "/root/testdata/sf0.001").collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    # every embedded query matched documents and returned a full top-k
    assert set(by_q) == {qid for qid, _ in BM25_QUERIES}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, BM25_TOP_K + 1))
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
    # (no idf-discrimination assertion on the synthetic corpus: its closed
    # 31-word vocabulary puts every term in nearly every doc, df ~ N across
    # the board — the planted-corpus test below proves idf discounting)


def test_bm25_idf_discounts_common_terms(spark):
    from gmr_spark.operators.text_analysis import bm25_frame

    # 20 docs all containing 'common'; exactly one also contains 'rare'.
    # Single-term queries: the rare term's top hit must outscore the common
    # term's (identical tf and dl profiles; only df differs).
    rows = [(i, "common filler words here") for i in range(19)]
    rows.append((19, "rare filler words here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_frame(
        docs, spark=spark, queries=((0, "common"), (1, "rare")), top_k=3
    ).collect()
    best = {}
    for r in out:
        best[r.query_id] = max(best.get(r.query_id, 0.0), r.score)
    assert best[1] > best[0] * 5  # rational idf: (N-df+.5)/(df+.5) swamps tf
    # the rare query matches exactly one doc
    assert sum(1 for r in out if r.query_id == 1) == 1


def test_dsir_ranks_target_resembling_docs_first(spark):
    """DSIR importance selection: documents whose hashed-bigram distribution
    matches the target slice (lang='en') must outrank documents drawn from
    the raw-only distribution — on a planted corpus where the target slice
    uses a disjoint vocabulary so the separation is unambiguous."""
    from gmr_spark.operators.text_analysis import dsir_frame

    # target slice: 10 'en' docs over vocabulary A; raw background: 20 'xx'
    # docs over vocabulary B; probes: 2 unlabeled 'xx' docs, one written in
    # vocabulary A (target-like), one in vocabulary B (raw-typical)
    va = "alpha beta gamma delta epsilon zeta"
    vb = "one two three four five six"
    rows = [(i, "en", f"{va} {va}") for i in range(10)]
    rows += [(10 + i, "xx", f"{vb} {vb}") for i in range(20)]
    rows.append((30, "xx", f"{va} {va}"))   # target-like probe
    rows.append((31, "xx", f"{vb} {vb}"))   # raw-typical probe
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r for r in dsir_frame(docs, k=32).collect()}
    assert out[30].score > out[31].score
    # every vocabulary-A doc outranks every vocabulary-B doc
    worst_a = min(out[i].rnk for i in list(range(10)) + [30])
    assert max(out[i].rnk for i in list(range(10)) + [30]) < min(
        out[i].rnk for i in list(range(10, 30)) + [31])
    assert worst_a >= 1
    # scores are the smoothed rational ratios: vocabulary-A docs all share
    # one bigram profile, so their scores are identical
    a_scores = {out[i].score for i in list(range(10)) + [30]}
    assert len(a_scores) == 1


def test_semdedup_arrow_engine_matches_expr(spark):
    """The Arrow/BLAS scale path and the Catalyst expression path agree
    exactly on the sf0.001 embeddings (and the GEMM k-means assign agrees
    with the per-centroid expression assign) — pinning that the 100 TB
    engine computes the SAME dedup decisions, not merely similar ones."""
    from gmr_spark.algorithms.kmeans import kmeans
    from gmr_spark.operators.dedup import semdedup_frame
    from gmr_spark.sources.tables import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    a_expr = {(r.id, r.cluster) for r in kmeans(emb, k=8, iters=2).collect()}
    a_arr = {(r.id, r.cluster)
             for r in kmeans(emb, k=8, iters=2, assign="arrow").collect()}
    assert a_expr == a_arr

    def canon(df):
        return {
            (r.vec_id, r.cluster,
             None if r.max_sim_earlier is None else round(r.max_sim_earlier, 6),
             r.n_dup_earlier, r.keep)
            for r in df.collect()
        }

    expr = canon(semdedup_frame(emb, k=8, iters=2, threshold=0.3))
    arrow = canon(semdedup_frame(emb, k=8, iters=2, threshold=0.3,
                                 engine="arrow"))
    assert expr == arrow


def test_dedup_substring_flags_planted_passage(spark):
    """A verbatim 8-word passage pasted into two otherwise-disjoint
    documents must mark exactly the windows covering it in both docs
    (Lee et al. ExactSubstr semantics); unrelated docs stay clean, short
    docs (< window words) get the 0-sentinel row."""
    from gmr_spark.operators.dedup import dedup_substring_frame

    passage = "the quick brown fox jumps over the lazy"  # 8 words
    a_words = [f"a{i}" for i in range(10)]
    b_words = [f"b{i}" for i in range(6)]
    rows = [
        (1, " ".join(a_words[:5] + passage.split() + a_words[5:])),  # 18 w
        (2, " ".join(b_words + passage.split())),                    # 14 w
        (3, "completely unrelated text with enough words to window well"),
        (4, "too short"),                                            # 2 w
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_substring_frame(docs, window=8).collect()}
    assert len(out) == 4
    # doc 1: 11 windows (18-8+1), exactly 1 (the passage itself) duplicated
    assert out[1].n_windows == 11 and out[1].n_dup_windows == 1
    assert not out[1].keep and out[1].max_docs_sharing == 2
    assert abs(out[1].dup_frac - round(1 / 11, 6)) < 1e-9
    # doc 2: 7 windows, the passage is its last window
    assert out[2].n_windows == 7 and out[2].n_dup_windows == 1
    assert not out[2].keep
    # doc 3: windows exist, none shared
    assert out[3].n_windows == 2 and out[3].n_dup_windows == 0 and out[3].keep
    # doc 4: below the window length -> sentinel zeros, kept
    assert out[4].n_windows == 0 and out[4].max_docs_sharing == 0 and out[4].keep


def test_payload_file_cache_detects_missing_files(spark):
    """The binaryFile landing-zone cache must validate the FILES, not just
    its marker: deleting a payload (the /tmp-reaper scenario) makes the
    next ensure-call rebuild the directory instead of serving a silently
    truncated corpus to the binaryFile scan."""
    import os

    from gmr_spark.operators.multimodal import _ensure_ppm_files

    d = _ensure_ppm_files(spark, SF001)
    files = sorted(f for f in os.listdir(d) if f.endswith(".ppm"))
    victim = os.path.join(d, files[0])
    os.unlink(victim)
    d2 = _ensure_ppm_files(spark, SF001)
    assert d2 == d and os.path.exists(victim), \
        "reaped payload file not detected/rebuilt"


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_frame_path_checkpoints_release_when_looped(spark):
    """Round-6 verdict item 3: the *_frame entry points checkpointed per
    call with no release, so a caller looping them over synthetic frames
    accumulated blocks until ContextCleaner caught up. Now memoized under
    the source frame's semantic hash: looped calls on the same frame add
    ZERO new persisted RDDs after the first, and clear_dedup_memo()
    releases what the loop pinned."""
    from gmr_spark.operators.dedup import (
        clear_dedup_memo,
        dedup_substring_frame,
        semdedup_frame,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "alpha beta gamma delta epsilon zeta eta theta lambda mu")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [float(i % 4 == j) for j in range(4)]) for i in range(6)],
        "vec_id long, embedding array<float>")

    dedup_substring_frame(docs, window=8).collect()
    semdedup_frame(emb, k=2, iters=1, threshold=0.9).collect()
    after_first = _n_persistent_rdds(spark)
    for _ in range(3):
        dedup_substring_frame(docs, window=8).collect()
        semdedup_frame(emb, k=2, iters=1, threshold=0.9).collect()
    # one-sided on purpose: the property is NO GROWTH across looped calls.
    # The count is session-global and ContextCleaner unpersists other
    # tests' dead blocks asynchronously, so an equality check flakes when
    # the cleaner fires mid-loop (observed under a concurrent full-suite
    # run); a DECREASE is the cleaner's business, never this operator's.
    assert _n_persistent_rdds(spark) <= after_first, \
        "looped *_frame calls accumulated persisted checkpoint blocks"
    # a semantically DIFFERENT frame must not be served the memoized result
    docs2 = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    out2 = dedup_substring_frame(docs2, window=8).collect()
    assert len(out2) == 1 and out2[0].n_dup_windows == 0
    before_clear = _n_persistent_rdds(spark)
    clear_dedup_memo()
    assert _n_persistent_rdds(spark) < before_clear, \
        "clear_dedup_memo released nothing"


def test_frame_memo_sees_file_rewrites(spark, tmp_path):
    """Round-7 ADVICE: Catalyst plan semantics cannot see a rewrite of the
    files BEHIND a plan — spark.read.parquet(p) is the same plan before and
    after p's files change — so the frame memo must fold a data fingerprint
    (file list + size/mtime) into its key. Rewriting the parquet at the same
    path and re-calling the frame op must serve fresh results, not the
    memoized generation."""
    import os
    import time

    from gmr_spark.operators.dedup import clear_dedup_memo, dedup_substring_frame

    p = str(tmp_path / "docs")
    dup = "alpha beta gamma delta epsilon zeta eta theta " * 3
    spark.createDataFrame(
        [(1, dup), (2, dup)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    try:
        first = dedup_substring_frame(spark.read.parquet(p), window=8).collect()
        assert {r.doc_id for r in first} == {1, 2}
        assert all(r.n_dup_windows > 0 for r in first)

        # rewrite IN PLACE with different content; bump mtimes defensively
        # (same-second rewrites on coarse-mtime filesystems)
        spark.createDataFrame(
            [(7, "one two three four five six seven eight nine ten")],
            "doc_id long, text string",
        ).coalesce(1).write.mode("overwrite").parquet(p)
        now = time.time() + 2
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now, now))

        again = dedup_substring_frame(spark.read.parquet(p), window=8).collect()
        assert {r.doc_id for r in again} == {7}, \
            "frame memo served a stale generation after the file rewrite"
        assert again[0].n_dup_windows == 0
        # and the superseded generation's dict references were dropped
        # (reference-drop eviction: one live generation per (kind, plan))
        from gmr_spark.operators.dedup import _CKPT_MEMO
        gens = [k for k in _CKPT_MEMO if "substr_wins_frame" in str(k)]
        assert len(gens) == 1, gens
    finally:
        clear_dedup_memo()


def test_frame_memo_fingerprint_classifier(spark, tmp_path, monkeypatch):
    """_file_fingerprint's three-way contract: None for in-memory plans
    (safe to memoize unconditionally), a stable token for local file plans
    (changes when bytes change), and the skip sentinel when the listing is
    too large to stat per call."""
    from gmr_spark.operators import dedup as D

    mem = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert D._file_fingerprint(mem) is None

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "doc_id long, text string") \
        .coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    tok = D._file_fingerprint(df)
    assert isinstance(tok, str) and D._file_fingerprint(df) == tok

    monkeypatch.setattr(D, "_FINGERPRINT_MAX_FILES", 0)
    assert D._file_fingerprint(df) is D._UNFINGERPRINTABLE


def test_pq_adc_cogrouped_matches_expr_path(spark):
    """The cogrouped ADC transport (LUT shipped once per query group) must
    produce exactly the scores of the JVM expression path (LUT joined per
    pair) — same pre-rounded LUT entries, same half-away-from-zero sum
    rounding — on the full sf0.001 candidate set."""
    from pyspark.sql import functions as F

    from gmr_spark.operators.similarity import (
        PQ_DSUB, PQ_KS, PQ_M, _ivf_index_probes, _vec, make_pq_codes_udf,
        make_pq_lut_udf, pq_adc_cogrouped, pq_adc_expr)
    from gmr_spark.sources.tables import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    base = emb.select(F.col("vec_id").alias("id"), _vec().alias("v"))
    seed_rows = base.orderBy("id").limit(PQ_KS).collect()
    codebook = [
        [[float(r.v[j * PQ_DSUB + d]) for d in range(PQ_DSUB)]
         for r in seed_rows]
        for j in range(PQ_M)
    ]
    indexed, probes = _ivf_index_probes(base, k_cells=8, nprobe=2)
    enc = indexed.select(
        "neighbor_id", "cell",
        make_pq_codes_udf(codebook)(F.col("nv")).alias("codes"))
    luts = base.select(F.col("id").alias("query_id"),
                       make_pq_lut_udf(codebook)(F.col("v")).alias("lut"))
    cand = (probes.select("query_id", "cell").join(enc, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id")))

    expr_scores = (cand.join(luts, "query_id")
                   .select("query_id", "neighbor_id",
                           pq_adc_expr(F.col("lut"), F.col("codes"))
                           .alias("adc")))
    cog_scores = pq_adc_cogrouped(
        cand.select("query_id", "neighbor_id", "codes"), luts)

    got = sorted(map(tuple, cog_scores.collect()))
    want = sorted(map(tuple, expr_scores.collect()))
    assert len(got) > 1000
    assert got == want


def test_pq_adc_cogrouped_handles_candidateless_queries(spark):
    """A query with a LUT but zero candidates (empty cell after the
    self-filter) must contribute no rows — the empty-group branch returns a
    typed empty frame instead of breaking the Arrow schema."""
    from pyspark.sql import functions as F

    from gmr_spark.operators.similarity import PQ_KS, PQ_M, pq_adc_cogrouped

    lut = [float(i % 7) for i in range(PQ_M * PQ_KS)]
    luts = spark.createDataFrame(
        [(1, lut), (2, lut)], "query_id long, lut array<double>")
    cand = spark.createDataFrame(
        [(1, 10, [0] * PQ_M)],
        "query_id long, neighbor_id long, codes array<int>")
    out = pq_adc_cogrouped(cand, luts).collect()
    assert len(out) == 1 and out[0].query_id == 1
    # adc = sum over 8 subspaces of lut[j*16 + 0] = sum of lut[0,16,32,...]
    want = round(sum(lut[j * PQ_KS] for j in range(PQ_M)), 6)
    assert out[0].adc == want


def test_pq_adc_cogrouped_rejects_missing_or_duplicate_lut(spark):
    """Round-9 ADVICE item 3: pq_adc_cogrouped is exported as a general
    transport, so a caller-side join mistake — a candidate group with NO
    LUT row, or with duplicated LUT rows — must fail loudly instead of
    silently dropping (or iloc[0]-guessing) that query's scores."""
    import pytest
    from pyspark.errors import PythonException

    from gmr_spark.operators.similarity import PQ_KS, PQ_M, pq_adc_cogrouped

    lut = [float(i % 7) for i in range(PQ_M * PQ_KS)]
    cand = spark.createDataFrame(
        [(1, 10, [0] * PQ_M)],
        "query_id long, neighbor_id long, codes array<int>")
    # (a) candidates but no LUT for query 1
    no_lut = spark.createDataFrame(
        [(2, lut)], "query_id long, lut array<double>")
    with pytest.raises(PythonException, match="pq_adc_cogrouped"):
        pq_adc_cogrouped(cand, no_lut).collect()
    # (b) duplicated LUT rows for query 1
    dup_lut = spark.createDataFrame(
        [(1, lut), (1, lut)], "query_id long, lut array<double>")
    with pytest.raises(PythonException, match="pq_adc_cogrouped"):
        pq_adc_cogrouped(cand, dup_lut).collect()


def test_ivf_assign_rejects_unknown_string(spark):
    """Round-11 ADVICE item 1: any assign/cell_assign value outside
    {"expr", "arrow"} must raise, not silently fall through to the
    expression path — at production cell counts that silent fallback is
    the interpreter-bound 227s-vs-3s path, i.e. a ~75x degradation a typo
    like "Arrow" or "gemm" would trigger with no signal."""
    import pytest

    from gmr_spark.operators.similarity import _vec, ann_ivf, ann_ivf_pq
    from gmr_spark.sources.tables import load_tables

    from tests.conftest import SF_ORACLE

    # the message names the parameter the CALLER typed (cell_assign, not
    # the helper's internal name — round-12 ADVICE item 4)
    with pytest.raises(ValueError, match="cell_assign='Arrow'"):
        ann_ivf(spark, SF_ORACLE, cell_assign="Arrow")
    with pytest.raises(ValueError, match="cell_assign='gemm'"):
        ann_ivf_pq(spark, SF_ORACLE, cell_assign="gemm")
    # the casing that IS declared still works end-to-end (guard is exact)
    emb = load_tables(spark, SF_ORACLE)["embeddings"]
    df = emb.select(F.col("vec_id").alias("id"), _vec().alias("v"))
    from gmr_spark.operators.similarity import _ivf_index_probes

    indexed, _ = _ivf_index_probes(df, k_cells=2, nprobe=1, assign="arrow")
    assert indexed.count() == df.count()


def test_kmeans_assign_rejects_unknown_string(spark):
    """Round-12 self-review carry-over: kmeans() had the same silent
    fallback _validate_assign closed for the IVF family — a typo like
    "Arrow" fell through to the expression path. Now it fails fast at
    entry (before the eager checkpoint / seed collect), with the kmeans
    parameter's own name in the message."""
    from gmr_spark.algorithms.kmeans import kmeans
    from gmr_spark.sources.tables import load_tables

    from tests.conftest import SF_ORACLE

    emb = load_tables(spark, SF_ORACLE)["embeddings"]
    with pytest.raises(ValueError, match="assign='Arrow'"):
        kmeans(emb, assign="Arrow")
    with pytest.raises(ValueError, match="assign='gemm'"):
        kmeans(emb, k=2, iters=1, assign="gemm")


def test_make_cell_rank_fn_rejects_empty_centroids():
    """Round-11 ADVICE item 3: an empty centroid list must fail at factory
    time (driver-side, clear message), not as a ZeroDivisionError in the
    row-chunk sizing inside an executor task."""
    import pytest

    from gmr_spark.operators.similarity import make_cell_rank_fn

    with pytest.raises(ValueError, match="empty centroid list"):
        make_cell_rank_fn([], nprobe=1)


def test_ann_recall_production_at_least_seeded(spark):
    """Round-11 verdict "What's missing" item 2: the production ann_ivf_pq
    configuration (trained codebook x trained cells x Arrow assign — the
    exact config bench.py times as ann_ivf_pq_celltrained) is
    recall-guarded on the BENCH corpus: its recall@3 vs the
    cosine_topk_arrow exact truth must be at least the seeded
    ann_ivf_pq's there (the seeded config is guarded by ann_recall_at_k).

    Pinned at the bench sf_dir (sf0.1) deliberately: the 5-query/k=3
    denominator is only 15, and on the SMALLER unstructured tables the
    deterministic comparison lands the other way (measured r12: sf0.001
    prod 0.133 < seeded 0.4; sf0.01 prod 0.4 < seeded 0.533; sf0.1 prod
    0.533 > seeded 0.4) — training 8 cells from a 1-in-10 sample of a few
    hundred random vectors is noise, not the production regime. The
    guard's job is the config bench.py actually times, on the corpus it
    times it on; the structural trained-beats-seeded claim is pinned on
    the planted fixture in
    test_ann_ivf_pq_cell_train_iters_recovers_partner_recall."""
    from gmr_spark.operators.similarity import (
        _recall_row, ann_ivf_pq, ann_recall_production, cosine_topk_arrow)

    # pinned literally, NOT via $SPARK_GRAFT_SF_DIR: pointing the bench env
    # at a smaller corpus (a documented dry-run workflow) would make this
    # test fail for corpus-size reasons, not regressions (round-12 review).
    # Hosts without the driver-generated bench corpus SKIP instead of
    # erroring inside Spark (round-12 ADVICE item 1) — the pin is about
    # which corpus is meaningful, not about requiring every environment
    # to carry it.
    sf_bench = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_bench):
        pytest.skip(f"bench corpus {sf_bench} absent on this host")
    rows = ann_recall_production(spark, sf_bench).collect()
    assert [r.method for r in rows] == ["ivf_pq_production"]
    prod = rows[0]
    truth = (
        cosine_topk_arrow(spark, sf_bench, n_queries=5, k=10)
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id")
    )
    seeded = _recall_row(truth, ann_ivf_pq(spark, sf_bench),
                         method="ivf_pq", n_queries=5, k=3).collect()[0]
    assert prod.recall >= seeded.recall, (prod.recall, seeded.recall)
    assert 0.0 <= prod.recall <= 1.0
    assert prod.hits == round(prod.recall * 15)


def test_curation_pipeline_stages_compose(spark, tmp_path):
    """Behavioral twin of the 2M-doc composed curation pipeline
    (scripts/scale_r12.py run_pipeline, round-11 verdict item 5) on a
    planted toy corpus, so the stage semantics ride the per-round test
    gate, not only the scale script: exact dedup retires the verbatim
    copy (keeping the lower id), the MinHash chain retires the planted
    near-dup's higher member, the Gopher rule retires the repetition-spam
    doc, and packing_frame packs exactly the survivors with the
    independent per-lang max(pack_id) cross-check. Stage boundaries are
    MATERIALIZED parquet dirs exactly like the scale run (each stage
    reads the previous stage's output — no re-derivation)."""
    import os

    from gmr_spark.operators.dedup import (
        clear_dedup_memo, dedup_exact, dedup_survivors)
    from gmr_spark.operators.sampling import PACK_CAPACITY, packing_frame
    from gmr_spark.operators.text_analysis import (
        gopher_quality, unigram_lm_score)

    def write_stage(docs_rows_or_df, name):
        d = tmp_path / name
        d.mkdir()
        df = (spark.createDataFrame(
            docs_rows_or_df,
            "doc_id long, text string, lang string, source string, "
            "n_chars long")
            if isinstance(docs_rows_or_df, list) else docs_rows_or_df)
        df.coalesce(1).write.parquet(str(d / "documents.parquet"))
        from gmr_spark.sources.tables import TABLES

        for t in (t for t in TABLES if t != "documents"):
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       str(d / f"{t}.parquet"))
        return str(d)

    # 40 base docs of 40 unique words each; doc 1 = near-dup of doc 0
    # (differs only in the last word -> shingle-Jaccard 36/40 = 0.9, far
    # above the 0.1 verify gate and band-collision-certain at 8 hashes /
    # 4 bands); doc 100 = VERBATIM copy of doc 2 (exact dup, higher id);
    # doc 101 = VERBATIM copy of doc 0, i.e. an exact copy whose text is
    # ALSO a member of the {0, 1} near-dup cluster (round-12 ADVICE
    # item 3 — pins the keep-min-id/identical-signature equivalence
    # between the staged chain here and curation_pipeline's
    # survivors-on-original ∩ keepers composition, see the curation
    # module docstring); doc 39 = repetition spam (top_word_frac
    # 5/20 = 0.25 > 0.2)
    def words(i):
        return [f"w{i}x{j}" for j in range(40)]

    rows = []
    for i in range(40):
        t = " ".join(words(i))
        rows.append((i, t, "en", "src0", len(t)))
    near = " ".join(words(0)[:-1] + ["zzz"])
    rows[1] = (1, near, "en", "src0", len(near))
    junk = "a a a a a " + " ".join(f"b39x{j}" for j in range(15))
    rows[39] = (39, junk, "en", "src0", len(junk))
    rows.append((100, rows[2][1], "en", "src0", rows[2][4]))  # exact copy
    rows.append((101, rows[0][1], "en", "src0", rows[0][4]))  # copy in cluster
    stage0 = write_stage(rows, "stage0")

    # stage 1: exact dedup
    groups = dedup_exact(spark, stage0)
    dupes = {(r.keep_id, r.n_copies) for r in
             groups.filter(F.col("n_copies") > 1).collect()}
    assert dupes == {(2, 2), (0, 2)}  # both planted copies, originals kept
    keepers = groups.select(F.col("keep_id").alias("doc_id"))
    s1 = (spark.read.parquet(f"{stage0}/documents.parquet")
          .join(keepers, "doc_id", "left_semi"))
    assert s1.count() == 40
    stage1 = write_stage(s1, "stage1")

    # the COMPOSED order (curation_pipeline's): near-dup survivors on the
    # ORIGINAL corpus, intersected with the exact keepers. On the full
    # corpus the near-dup component is {0, 1, 101} (0-101 verbatim, 0-1
    # J=0.9) with head MIN=0, and {2, 100} with head 2 — the component
    # head is always an exact keeper (it is the min id of its own text
    # group), so the intersection must equal the staged chain below.
    try:
        composed_ids = ({r.doc_id for r in
                         dedup_survivors(spark, stage0).collect()}
                        & {r.doc_id for r in keepers.collect()})
    finally:
        clear_dedup_memo()

    # stage 2: near-dup removal on the stage-1 corpus
    try:
        s2_ids = {r.doc_id for r in
                  dedup_survivors(spark, stage1).collect()}
    finally:
        clear_dedup_memo()
    assert 0 in s2_ids and 1 not in s2_ids  # higher pair member retired
    assert 101 not in s2_ids and 100 not in s2_ids
    assert len(s2_ids) == 39
    # keep-min-id/identical-signature equivalence (round-12 ADVICE item 3)
    assert composed_ids == s2_ids
    s2 = (spark.read.parquet(f"{stage1}/documents.parquet")
          .filter(F.col("doc_id").isin(*s2_ids)))
    stage2 = write_stage(s2, "stage2")

    # stage 3: Gopher + LM filter on the stage-2 corpus
    good = {r.doc_id for r in gopher_quality(spark, stage2)
            .filter("passes").select("doc_id").collect()}
    assert 39 not in good and len(good) == 38  # junk fails, others pass
    lm = unigram_lm_score(spark, stage2)
    avg = lm.agg(F.avg("mean_inv_freq")).first()[0]
    calm = {r.doc_id for r in
            lm.filter(F.col("mean_inv_freq") <= 2.0 * avg)
            .select("doc_id").collect()}
    s3 = s2.filter(F.col("doc_id").isin(*sorted(good & calm)))
    n_s3 = s3.count()
    assert n_s3 == len(good & calm) == 38

    # stage 4: packing over the SURVIVOR frame + independent cross-check
    packed = packing_frame(s3).collect()
    assert len(packed) == n_s3
    assert all(r.pack_offset < PACK_CAPACITY for r in packed)
    sizes = sorted((r.doc_id, r.n_words) for r in packed)
    cum = 0
    expect = {}
    for doc_id, nw in sizes:  # packing orders by doc_id within the lang
        expect[doc_id] = cum // PACK_CAPACITY
        cum += nw
    assert {r.doc_id: r.pack_id for r in packed} == expect


def test_curation_pipeline_operator(spark):
    """The composed curation_pipeline callable (declared query "curation"
    since round 13): packs exactly the docs that survive all four stages
    — cross-checked against the stages computed independently from the
    same public operators — with valid pack arithmetic. (The stage
    SEMANTICS are pinned on planted fixtures in
    test_curation_pipeline_stages_compose and at 2M docs in
    scripts/scale_r12.py; this pins the composition.)"""
    from gmr_spark.operators.curation import curation_pipeline
    from gmr_spark.operators.dedup import (
        clear_dedup_memo, dedup_exact, dedup_survivors)
    from gmr_spark.operators.sampling import PACK_CAPACITY
    from gmr_spark.operators.text_analysis import (
        gopher_quality, unigram_lm_frame)
    from gmr_spark.sources.tables import load_tables

    from tests.conftest import SF_ORACLE

    try:
        out = curation_pipeline(spark, SF_ORACLE).collect()
        docs = load_tables(spark, SF_ORACLE)["documents"]
        keep = {r.keep_id for r in dedup_exact(spark, SF_ORACLE).collect()}
        surv = {r.doc_id for r in
                dedup_survivors(spark, SF_ORACLE).collect()}
        good = {r.doc_id for r in gopher_quality(spark, SF_ORACLE)
                .filter("passes").select("doc_id").collect()}
        deduped = docs.filter(
            F.col("doc_id").isin(*sorted(keep & surv)))
        lm = unigram_lm_frame(deduped.select("doc_id", "text")).collect()
    finally:
        clear_dedup_memo()
    import math

    avg = sum(r.mean_inv_freq for r in lm) / len(lm)
    # mirror the pipeline's ROUND(2*avg, 6) cutoff with HALF-AWAY rounding
    # (Spark/DuckDB ROUND semantics; Python round() is half-to-even —
    # mif is always positive so floor(x*1e6 + 0.5) is half-away here)
    cutoff = math.floor(2.0 * avg * 1e6 + 0.5) / 1e6
    calm = {r.doc_id for r in lm if r.mean_inv_freq <= cutoff}
    expected = (keep & surv & good & calm)
    assert {r.doc_id for r in out} == expected
    assert all(r.pack_offset < PACK_CAPACITY for r in out)
    assert set(out[0].asDict()) == {"lang", "doc_id", "n_words",
                                    "pack_id", "pack_offset"}


def test_oov_rate_planted_vocabulary_boundary(spark):
    """oov_rate on a planted corpus: with vocab_size=2 the two frequent
    words are in-vocabulary and the rare words are OOV — per-doc counts
    and the 6dp rate come out exactly; the deterministic (count DESC,
    token ASC) tie-break picks the lexicographically smaller word at the
    boundary."""
    from gmr_spark.operators.text_analysis import oov_rate_frame

    docs = spark.createDataFrame(
        [
            (1, "aa aa aa bb bb xx"),     # 3+2 in-vocab, 1 OOV
            (2, "aa bb bb yy yy zz"),     # 1+2 in-vocab, 3 OOV
            (3, "qq rr ss tt"),           # all OOV
            (4, ""),                      # empty: absent from output
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            oov_rate_frame(docs, vocab_size=2).collect()}
    # corpus counts: aa=4, bb=4, yy=2, xx/zz/qq/rr/ss/tt=1 -> vocab {aa,bb}
    assert set(rows) == {1, 2, 3}  # empty doc 4 produces no token rows
    assert (rows[1].n_tokens, rows[1].n_oov) == (6, 1)
    assert (rows[2].n_tokens, rows[2].n_oov) == (6, 3)
    assert (rows[3].n_tokens, rows[3].n_oov) == (4, 4)
    assert rows[2].oov_rate == 0.5 and rows[3].oov_rate == 1.0
    # tie at the boundary: with vocab_size=3 the count-2 group {yy} enters
    # before any count-1 word; with vocab_size=4, 'qq' (lexicographically
    # first among count-1) wins the tie deterministically
    r4 = {r.doc_id: r for r in
          oov_rate_frame(docs, vocab_size=4).collect()}
    assert (r4[3].n_tokens, r4[3].n_oov) == (4, 3)  # qq now in-vocab


def test_oov_rate_plan_is_broadcast_topv(spark):
    """Plan pin for oov_rate: the vocabulary must reach the token stream
    as TakeOrderedAndProject (top-V of the count frame, never a global
    Sort of token rows) + a broadcast join; no cartesian, no Python."""
    import re as _re

    from tests.conftest import SF_ORACLE

    from gmr_spark.operators.text_analysis import oov_rate

    df = oov_rate(spark, SF_ORACLE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    # exactly one explode of the corpus (vocab + flags share the subtree
    # via the two-consumer plan; Catalyst replays it, so allow <= 2)
    assert len(_re.findall(r"\(\d+\) Generate", p)) <= 2


def test_leakage_safe_split_planted_clusters(spark, tmp_path):
    """leakage_safe_split on a planted corpus: every near-dup cluster —
    including an exact copy whose text is also in a near-dup cluster —
    lands on ONE side of the train/val boundary (split is keyed off the
    cluster representative's text), singletons ride their own content
    hash, and the seeded bucket matches the hashlib derivation the r14
    DuckDB twin will use ('0x' || substr(md5('split:' || rep_text),1,4))."""
    import hashlib

    from gmr_spark.operators.dedup import clear_dedup_memo
    from gmr_spark.operators.sampling import (
        SPLIT_SEED, VAL_BUCKETS, leakage_safe_split)
    from gmr_spark.sources.tables import TABLES

    scratch = str(tmp_path / "corpus")
    os.makedirs(scratch)
    for t in (t for t in TABLES if t != "documents"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                   f"{scratch}/{t}.parquet")

    def words(i):
        return [f"w{i}x{j}" for j in range(40)]

    rows = []
    for i in range(2_000):
        t = " ".join(words(i))
        rows.append((i, t, "en", "src0", len(t)))
    # near-dup pair {0, 1}: one-word edit, shingle J = 36/40 = 0.9
    near = " ".join(words(0)[:-1] + ["zzz"])
    rows[1] = (1, near, "en", "src0", len(near))
    # exact copy pair {2, 3000}; copy-inside-cluster {0, 1, 3001}
    rows.append((3000, rows[2][1], "en", "src0", rows[2][4]))
    rows.append((3001, rows[0][1], "en", "src0", rows[0][4]))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(2).write.parquet(f"{scratch}/documents.parquet")

    try:
        got = {r.doc_id: r for r in
               leakage_safe_split(spark, scratch).collect()}
    finally:
        clear_dedup_memo()
    assert len(got) == 2_002

    # cluster semantics: {0, 1, 3001} one component with rep 0 (min id),
    # {2, 3000} with rep 2 — each cluster entirely on one side
    assert {got[i].rep_id for i in (0, 1, 3001)} == {0}
    assert len({got[i].split for i in (0, 1, 3001)}) == 1
    assert {got[i].rep_id for i in (2, 3000)} == {2}
    assert got[2].split == got[3000].split
    # singletons: rep = self
    assert got[5].rep_id == 5 and got[1999].rep_id == 1999

    # the seeded bucket is exactly the hashlib/DuckDB derivation, keyed
    # off the REPRESENTATIVE's text (doc 1 hashes doc 0's text, not near)
    def bucket_of(text):
        return int(hashlib.md5(
            (SPLIT_SEED + text).encode()).hexdigest()[:4], 16)

    for i, text in ((0, rows[0][1]), (1, rows[0][1]), (5, rows[5][1]),
                    (1999, rows[1999][1])):
        b = bucket_of(text)
        assert got[i].bucket == b, (i, got[i].bucket, b)
        assert got[i].split == ("val" if b < VAL_BUCKETS else "train")

    # fraction sanity on the ~2k content-hash deals: 10% ± wide band
    n_val = sum(1 for r in got.values() if r.split == "val")
    assert 0.05 * len(got) <= n_val <= 0.15 * len(got), n_val


def test_leakage_safe_split_plan(spark):
    """Plan pin for leakage_safe_split: cluster-sized joins only — no
    cartesian product, no Python eval in the split computation (the rep
    text fetch and the seeded bucket are pure JVM expressions)."""
    from tests.conftest import SF_ORACLE

    from gmr_spark.operators.dedup import clear_dedup_memo
    from gmr_spark.operators.sampling import leakage_safe_split

    try:
        df = leakage_safe_split(spark, SF_ORACLE)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
        p = df._jdf.queryExecution().explainString(mode)
    finally:
        clear_dedup_memo()
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_epoch_shards_deterministic_permutation(spark):
    """epoch_shards: the assignment is a deterministic function of
    (text, epoch) — two runs identical, the hashlib/DuckDB hex-cast
    derivation reproduces (shard, order key), seq is contiguous 1..|shard|
    per shard, shards are balanced, and epoch 1 deals a DIFFERENT
    permutation than epoch 0."""
    import hashlib

    from tests.conftest import SF_ORACLE

    from gmr_spark.operators.sampling import epoch_shards
    from gmr_spark.sources.tables import load_tables

    got = epoch_shards(spark, SF_ORACLE, n_shards=8).collect()
    again = epoch_shards(spark, SF_ORACLE, n_shards=8).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))

    texts = {r.doc_id: r.text for r in
             load_tables(spark, SF_ORACLE)["documents"].collect()}
    n = len(texts)
    assert len(got) == n

    # hashlib twin: shard = h % 8, within-shard order by (h, doc_id)
    def h_of(doc_id, epoch=0):
        return int(hashlib.md5(
            (f"epoch:{epoch}:" + texts[doc_id]).encode()).hexdigest()[:8], 16)

    by_shard = {}
    for r in got:
        assert r.shard == h_of(r.doc_id) % 8, r
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.seq)
        assert [r.seq for r in rows] == list(range(1, len(rows) + 1))
        keys = [(h_of(r.doc_id), r.doc_id) for r in rows]
        assert keys == sorted(keys), f"shard {shard} not in hash order"
        # balance: binomial around n/8 (±5 sigma)
        assert abs(len(rows) - n / 8) <= 5 * (n * 7 / 64) ** 0.5

    # a new epoch re-deals: at least one doc moves shard or seq
    e1 = {r.doc_id: (r.shard, r.seq)
          for r in epoch_shards(spark, SF_ORACLE, n_shards=8, epoch=1).collect()}
    e0 = {r.doc_id: (r.shard, r.seq) for r in got}
    assert e1 != e0

    with pytest.raises(ValueError):
        epoch_shards(spark, SF_ORACLE, n_shards=0)


def test_epoch_shards_plan_single_window(spark):
    """Plan pin for epoch_shards: one per-shard window over pure JVM
    expressions — no join, no cartesian, no Python eval."""
    from tests.conftest import SF_ORACLE

    from gmr_spark.operators.sampling import epoch_shards

    df = epoch_shards(spark, SF_ORACLE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert "Window" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "Join" not in p


def test_leakage_split_twin_parity(spark, duck):
    """Driver-faithful parity for the STAGED r14 promotion: the
    leakage_safe_split operator vs its composed DuckDB twin
    (LSQL.LEAKAGE_SPLIT — DUP_CLUSTERS recursive-CTE closure + the seeded
    hex-cast bucket) on the oracle corpus, exact compare."""
    from tests.conftest import SF_ORACLE
    from tests.oracle_check import compare

    from gmr_spark.operators.dedup import clear_dedup_memo
    from gmr_spark.operators.sampling import leakage_safe_split
    from gmr_spark.oracle import llm_sql as LSQL

    try:
        compare(leakage_safe_split(spark, SF_ORACLE), duck,
                LSQL.LEAKAGE_SPLIT)
    finally:
        clear_dedup_memo()


def test_epoch_shards_twin_parity(spark, duck):
    """epoch_shards vs LSQL.EPOCH_SHARDS at the epoch-0 / N_SHARDS
    defaults — exact compare (same r14 staging)."""
    from tests.conftest import SF_ORACLE
    from tests.oracle_check import compare

    from gmr_spark.operators.sampling import epoch_shards
    from gmr_spark.oracle import llm_sql as LSQL

    compare(epoch_shards(spark, SF_ORACLE), duck, LSQL.EPOCH_SHARDS)
