"""Tests for the LLM training-data pipeline operators: dedup families,
similarity search (incl. LSH recall gate), text analysis, multimodal
plumbing. Oracle-SQL parity for these ops is enforced end-to-end by the
driver contract (plans/llm_pipeline.py); here we test the algorithmic
properties the SQL comparison can't see."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


# ------------------------------------------------------------------- dedup


def test_exact_dedup_groups_planted_duplicates(spark):
    from hogflare_spark.operators.dedup import exact_dedup

    df = _docs(spark, ["alpha beta", "gamma", "alpha beta", "alpha beta", "delta"])
    out = {r["id"]: r for r in exact_dedup(df, "text", "doc_id").collect()}
    assert out[0]["group_size"] == 3 and out[0]["is_keeper"]
    assert out[2]["group_size"] == 3 and not out[2]["is_keeper"]
    assert out[1]["group_size"] == 1 and out[1]["is_keeper"]
    # keeper count == distinct contents
    assert sum(1 for r in out.values() if r["is_keeper"]) == 3


def test_minhash_finds_all_planted_near_dups(spark):
    """The sf0.001 documents table has 25 planted near-dup pairs with
    3-shingle Jaccard in [0.9, 0.99]; LSH(8x4) must find every one (the
    analytic miss probability at j>=0.9 is (1-j^4)^8 < 2e-5)."""
    from hogflare_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(docs, "text", "doc_id", 0.85).collect()
    }
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", 0.85).collect()
    }
    assert exact_pairs, "test data should contain planted near-dups"
    assert lsh_pairs == exact_pairs


def test_minhash_signature_estimates_jaccard(spark):
    """MinHash signature agreement rate ~ true Jaccard (within sampling
    error for 32 perms)."""
    from hogflare_spark.functions import text as T

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    df = _docs(spark, [a, b]).select(
        "doc_id",
        T.minhash_signature(
            T.shingle_hashes(T.shingles(T.tokens(F.col("text")), 3)), 128
        ).alias("sig"),
        T.shingle_hashes(T.shingles(T.tokens(F.col("text")), 3)).alias("hs"),
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    sa, sb = rows[0]["sig"], rows[1]["sig"]
    ha, hb = set(rows[0]["hs"]), set(rows[1]["hs"])
    true_j = len(ha & hb) / len(ha | hb)
    est_j = sum(1 for x, y in zip(sa, sb) if x == y) / len(sa)
    assert abs(est_j - true_j) < 0.15


def test_simhash_hamming_tracks_similarity(spark):
    from hogflare_spark.operators.dedup import simhash_sketches

    near_a = "spark table join window agg batch stream row column filter sort"
    near_b = "spark table join window agg batch stream row column filter hash"
    far = "completely different words about cooking pasta tomatoes basil olive"
    df = _docs(spark, [near_a, near_b, far])
    sk = {r["id"]: r["simhash"] for r in simhash_sketches(df, "text", "doc_id").collect()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(sk[0], sk[1]) < ham(sk[0], sk[2])


# --------------------------------------------------------------- similarity


def _clustered_vectors(n_clusters=8, per_cluster=12, dim=16):
    """Deterministic clustered vectors: ANN recall is only meaningful on
    data with neighborhood structure (the driver's embeddings are random)."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.randn(dim) * 3
        for _ in range(per_cluster):
            v = center + rng.randn(dim) * 0.2
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
            vid += 1
    return rows


def test_lsh_ann_recall_on_clustered_data(spark):
    from hogflare_spark.operators.similarity import brute_force_topk, lsh_ann_topk

    df = spark.createDataFrame(_clustered_vectors(dim=16))
    q = df.where(F.col("vec_id") % 12 == 0)  # one query per cluster
    exact = brute_force_topk(q, df, 5)
    approx = lsh_ann_topk(q, df, 5, dim=16, num_planes=8, probe_dist=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # same-cluster points land in nearby buckets; multiprobe(2) must
    # recover the bulk of the true top-5
    assert recall >= 0.8, f"LSH recall {recall} too low"


def test_ivf_ann_recall_on_clustered_data(spark):
    from hogflare_spark.operators.similarity import brute_force_topk, ivf_ann_topk

    df = spark.createDataFrame(_clustered_vectors(dim=16))
    q = df.where(F.col("vec_id") % 12 == 0)  # one query per cluster
    exact = brute_force_topk(q, df, 5)
    approx = ivf_ann_topk(q, df, 5, n_centroids=8, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # k-means cells align with the planted clusters; probing 3 of 8 cells
    # must recover the bulk of the true top-5
    assert recall >= 0.8, f"IVF recall {recall} too low"


def test_ivf_partitioned_index_prunes_and_matches(spark, tmp_path):
    """The materialized IVF index: probing is genuine partition pruning
    (the scan opens only probed cell directories) and exhaustive probing
    reproduces the in-memory IVF / brute-force results exactly."""
    from hogflare_spark.operators.similarity import (
        brute_force_topk,
        ivf_query_index,
        ivf_write_index,
    )

    df = spark.createDataFrame(_clustered_vectors(dim=16))
    q = df.where(F.col("vec_id") % 12 == 0)
    index_dir = str(tmp_path / "ivf_index")
    ivf_write_index(df, index_dir, n_centroids=8)

    # exhaustive probing == brute force (same guarantee the graded
    # llm_ann_ivf_exhaustive gate pins for the in-memory path)
    exact = brute_force_topk(q, df, 5)
    via_index = ivf_query_index(spark, index_dir, q, 5, n_probe=8)
    assert sorted(tuple(r) for r in exact.collect()) == sorted(
        tuple(r) for r in via_index.collect()
    )

    # narrow probing reads ONLY the probed cells' directories: the scan
    # carries a partition filter on cell (inputFiles() is not
    # filter-aware, so assert on the scan node's metadata instead)
    one_query = df.where(F.col("vec_id") == 0)
    narrow = ivf_query_index(spark, index_dir, one_query, 5, n_probe=2)
    narrow.collect()
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert scan_lines, plan
    assert any("cell" in ln and " IN " in ln for ln in scan_lines), scan_lines
    # recall on clustered data mirrors the in-memory IVF gate
    approx = ivf_query_index(spark, index_dir, q, 5, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.8


def test_ivf_centroids_deterministic_and_unit_norm(spark):
    import numpy as np

    from hogflare_spark.operators.similarity import ivf_train_centroids

    df = spark.createDataFrame(_clustered_vectors(n_clusters=4, per_cluster=6, dim=8))
    c1 = ivf_train_centroids(df, 4)
    c2 = ivf_train_centroids(df, 4)
    assert c1 == c2
    for c in c1:
        assert abs(np.linalg.norm(c) - 1.0) < 1e-9


def test_ivf_default_sample_is_bounded(spark):
    """With default args the trainer must never collect the whole corpus:
    the derived stride keeps the driver-side sample within max_sample."""
    from hogflare_spark.operators.similarity import ivf_train_centroids

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 11)]) for i in range(1000)],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_train_centroids(df, 4, max_sample=50)
    assert len(cents) == 4
    # derived stride must be ceil(1000/50) = 20: the default-args result
    # equals the explicit bounded stride and differs from a full collect
    assert cents == ivf_train_centroids(df, 4, sample_mod=20)
    assert cents != ivf_train_centroids(df, 4, sample_mod=1)


def test_near_dup_facade_strategy_selection(spark):
    import pytest as _pytest

    from hogflare_spark.operators.similarity import near_dup_pairs

    df = spark.createDataFrame(_clustered_vectors(n_clusters=2, per_cluster=4, dim=8))
    # low threshold without explicit opt-in must refuse (quadratic guard)
    with _pytest.raises(ValueError, match="force_exact"):
        near_dup_pairs(df, 0.4)
    # low + force_exact → exact blocked join runs
    assert near_dup_pairs(df, 0.4, force_exact=True).count() > 0
    # high threshold without dim → LSH path needs hyperplanes
    with _pytest.raises(ValueError, match="dim"):
        near_dup_pairs(df, 0.9)
    # high threshold → LSH path, precision 1.0 vs exact
    exact = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(df, 0.9, force_exact=True).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]) for r in near_dup_pairs(df, 0.9, dim=8).collect()
    }
    assert approx <= exact


def test_brute_force_topk_is_exact(spark):
    import numpy as np

    from hogflare_spark.operators.similarity import brute_force_topk

    rows = _clustered_vectors(n_clusters=4, per_cluster=6, dim=8)
    df = spark.createDataFrame(rows)
    q = df.where(F.col("vec_id") == 0)
    got = [
        (r["neighbor_id"], r["rank"])
        for r in brute_force_topk(q, df, 3).orderBy("rank").collect()
    ]
    vecs = {r.vec_id: np.array(r.embedding) for r in rows}
    cos = lambda a, b: float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    want = sorted(
        ((round(cos(vecs[0], v), 9), i) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert got == [(i, r + 1) for r, (_, i) in enumerate(want)]


# ------------------------------------------------------------ text analysis


def test_lang_id_stopword_heuristic(spark):
    from hogflare_spark.operators.text_analysis import lang_id

    df = _docs(
        spark,
        [
            "the cat sat on the mat and it is a good day for the cat",
            "der hund ist ein guter hund und das ist nicht schlecht",
            "el perro es un buen perro y la casa es de madera",
        ],
    )
    got = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
    assert got == ["en", "de", "es"]


def test_fingerprint_order_sensitive(spark):
    from hogflare_spark.operators.text_analysis import fingerprint

    df = _docs(spark, ["alpha beta gamma", "gamma beta alpha", "alpha  beta\tgamma"])
    fps = [r[0] for r in df.select(fingerprint(F.col("text"))).collect()]
    assert fps[0] != fps[1]  # order matters
    assert fps[0] == fps[2]  # whitespace doesn't


def test_quality_score_monotone_in_length(spark):
    from hogflare_spark.operators.text_analysis import quality_score

    short = "a b"
    long = " ".join(f"word{i} the of and to" for i in range(30))
    df = _docs(spark, [short, long])
    qs = [r[0] for r in df.select(quality_score(F.col("text"))).collect()]
    assert 0.0 <= qs[0] < qs[1] <= 1.0


# ------------------------------------------------------------- multimodal


def test_multimodal_feature_extraction_batch_shape(spark):
    from hogflare_spark.operators.multimodal import (
        extract_features,
        media_frame_from_documents,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30)
    media = media_frame_from_documents(docs)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    by_id = {r["media_id"]: r for r in rows}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, r in by_id.items():
        payload = src[mid].encode("utf-8")
        assert r["byte_len"] == len(payload)
        assert r["checksum"] == hashlib.md5(payload).hexdigest()
        if r["mime"].startswith("image/"):
            assert r["width"] == len(payload) % 640 + 1 and r["n_frames"] is None
        elif r["mime"].startswith("audio/"):
            assert r["width"] is None and r["n_frames"] == len(payload) % 16000 + 1


def _make_png(width: int, height: int) -> bytes:
    """Minimal valid 8-bit RGB PNG, stdlib-only (zlib + struct)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00"
        + bytes(b for x in range(width) for b in (x % 256, y % 256, (x + y) % 256))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_wav(n_frames: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(bytes(2 * n_frames))
    return buf.getvalue()


def _box(typ: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + typ + body


def _make_mp4(
    width: int, height: int, n_frames: int, tkhd_version: int = 0
) -> bytes:
    """Minimal ISO-BMFF container with one video track, stdlib-only."""
    import struct

    times = (b"\x00" * 32) if tkhd_version else (b"\x00" * 20)
    tkhd = _box(
        b"tkhd",
        bytes([tkhd_version]) + b"\x00\x00\x07" + times
        + b"\x00" * 16  # reserved/layer/alt_group/volume/reserved
        + b"\x00" * 36  # matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, n_frames))
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    # a leading non-video (hint) track must be skipped by the decoder
    hint = _box(
        b"trak", _box(b"mdia", _box(b"hdlr", b"\x00" * 8 + b"hint" + b"\x00" * 12))
    )
    moov = _box(b"moov", hint + trak)
    return _box(b"ftyp", b"mp42\x00\x00\x00\x00mp42") + moov


def test_multimodal_real_png_wav_decode():
    from hogflare_spark.operators.multimodal import (
        _decode_audio_real,
        _decode_image_real,
        _decode_video_real,
    )

    png = _make_png(13, 7)
    assert _decode_image_real(png) == {"width": 13, "height": 7, "n_frames": None}
    wav = _make_wav(321)
    assert _decode_audio_real(wav) == {"width": None, "height": None, "n_frames": 321}
    # malformed payloads fail loudly, not with garbage metadata
    with pytest.raises(ValueError):
        _decode_image_real(b"\x89PNG")
    bad_crc = bytearray(png)
    bad_crc[20] ^= 0xFF  # corrupt IHDR width byte without fixing the CRC
    with pytest.raises(ValueError):
        _decode_image_real(bytes(bad_crc))


def test_multimodal_real_mp4_decode():
    from hogflare_spark.operators.multimodal import _decode_video_real

    mp4 = _make_mp4(640, 360, 48)
    assert _decode_video_real(mp4) == {"width": 640, "height": 360, "n_frames": 48}
    # tkhd version 1 shifts the width/height offset by 12 bytes
    mp4_v1 = _make_mp4(1920, 1080, 7, tkhd_version=1)
    assert _decode_video_real(mp4_v1) == {
        "width": 1920,
        "height": 1080,
        "n_frames": 7,
    }
    with pytest.raises(ValueError):
        _decode_video_real(b"\x00\x00\x00\x18ftypmp42")  # no moov
    with pytest.raises(ValueError):
        _decode_video_real(b"RIFF\x00\x00\x00\x00AVI ")  # not ISO-BMFF
    # a box whose declared size overruns the container fails loudly
    import struct

    overrun = (
        _box(b"ftyp", b"mp42\x00\x00\x00\x00") + struct.pack(">I", 4096) + b"moov"
    )
    with pytest.raises(ValueError):
        _decode_video_real(overrun)


def test_multimodal_real_decode_through_spark(spark):
    """extract_features(fake=False) over genuine PNG/WAV payloads — the
    same mapInPandas plumbing the gate uses, with the real codec layer."""
    from hogflare_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rows = [
        (1, "image/png", bytearray(_make_png(32, 16)), ("t", None)),
        (2, "audio/wav", bytearray(_make_wav(1234)), ("t", None)),
        (3, "video/mp4", bytearray(_make_mp4(256, 144, 24)), ("t", None)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_features(media, fake=False).collect()}
    assert got[1]["width"] == 32 and got[1]["height"] == 16
    assert got[1]["n_frames"] is None
    assert got[2]["n_frames"] == 1234 and got[2]["width"] is None
    assert got[3]["width"] == 256 and got[3]["height"] == 144
    assert got[3]["n_frames"] == 24
    assert got[1]["checksum"] == hashlib.md5(bytes(rows[0][2])).hexdigest()


def test_frame_sample_offsets(spark):
    from hogflare_spark.operators.multimodal import (
        media_frame_from_documents,
        sample_frames,
    )

    docs = _docs(spark, ["x" * 200]).withColumn("doc_id", F.lit(2))
    docs = docs.select(
        "doc_id", "text", F.lit("s").alias("source"), F.lit(200).alias("n_chars"),
        F.lit("en").alias("lang"),
    )
    media = media_frame_from_documents(docs)  # doc_id 2 -> video/mp4
    got = sample_frames(media, every_n_bytes=64).orderBy("frame_idx").collect()
    assert [(r["frame_idx"], r["byte_offset"]) for r in got] == [
        (0, 0), (1, 64), (2, 128), (3, 192),
    ]


# ------------------------------------------- clusters / decontamination


def test_dedup_clusters_transitive_collapse(spark):
    """Near-dup is not transitive, but clusters must be: A~B and B~C
    place all three in one cluster with exactly one canonical doc even
    if A~C alone would miss the pair threshold."""
    from hogflare_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again "
    a = base * 6
    b = base * 6 + "tail one two three"
    c = base * 6 + "tail one two three four five six seven"
    df = _docs(spark, [a, b, c, "completely unrelated text about ducks here"])
    out = {r["id"]: r for r in dedup_clusters(df, "text", "doc_id", 0.6).collect()}
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
    assert out[0]["is_canonical"] and not out[1]["is_canonical"]
    assert out[3]["cluster_id"] == 3 and out[3]["is_canonical"]
    # exactly one canonical per cluster
    canon = [r for r in out.values() if r["is_canonical"]]
    assert len(canon) == 2


def test_dedup_clusters_no_pairs_all_singletons(spark):
    from hogflare_spark.operators.dedup import dedup_clusters

    df = _docs(spark, ["alpha beta gamma delta", "epsilon zeta eta theta"])
    out = dedup_clusters(df, "text", "doc_id", 0.9).collect()
    assert all(r["cluster_id"] == r["id"] and r["is_canonical"] for r in out)


def test_contamination_flags_overlap_and_exclusion(spark):
    from hogflare_spark.operators.dedup import contamination_flags

    bench_text = "secret benchmark question about prime numbers and logic"
    clean_text = "an entirely different document describing garden plants"
    leaked = bench_text + " with a tiny suffix"
    corpus = _docs(spark, [clean_text, leaked])
    bench = spark.createDataFrame([Row(doc_id=100, text=bench_text)])
    out = {
        r["id"]: r
        for r in contamination_flags(corpus, bench, "text", "doc_id", 0.5).collect()
    }
    assert out[1]["is_contaminated"] and out[1]["contamination_frac"] > 0.5
    assert not out[0]["is_contaminated"] and out[0]["contaminated"] == 0
    # fraction is shared/|doc shingles|, so it is <= 1
    assert 0.0 <= out[1]["contamination_frac"] <= 1.0


# ------------------------------------------------------------- sampling


def test_hash_split_deterministic_and_stable_under_growth(spark):
    """A document's split never changes when the corpus grows — the
    property that prevents eval-set leakage across dataset versions."""
    from hogflare_spark.operators.sampling import hash_split

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id").collect()}
    s_big = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id").collect()}
    assert all(s_big[k] == v for k, v in s_small.items())
    # roughly 80/10/10 (hash-uniform; wide tolerance, deterministic data)
    from collections import Counter

    dist = Counter(s_big.values())
    assert dist["train"] > 700 and dist["val"] > 50 and dist["test"] > 50


def test_stratified_sample_quota_and_determinism(spark):
    from hogflare_spark.operators.sampling import stratified_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang_"), (F.col("id") % 3).cast("string")).alias("lang"),
    )
    kept1 = sorted(
        (r["doc_id"], r["lang"])
        for r in stratified_sample(df, "doc_id", "lang", 7).collect()
    )
    kept2 = sorted(
        (r["doc_id"], r["lang"])
        for r in stratified_sample(df, "doc_id", "lang", 7).collect()
    )
    assert kept1 == kept2
    from collections import Counter

    per = Counter(lang for _, lang in kept1)
    assert per == {"lang_0": 7, "lang_1": 7, "lang_2": 7}


def test_stratified_sample_small_stratum_kept_whole(spark):
    from hogflare_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, lang="rare") for i in range(3)]
    )
    assert stratified_sample(df, "doc_id", "lang", 10).count() == 3


# ---------------------------------------------- repetition / PII scrubbing


def test_repetition_stats_values(spark):
    from hogflare_spark.operators.text_analysis import repetition_stats

    df = _docs(
        spark,
        [
            "a a a a",            # 4 tokens, 1 distinct, bigram 'a a' x3
            "w x y z",            # no repetition
            "",                   # empty
            "solo",               # single token: no bigrams
            "go go stop go go",   # top bigram 'go go' 2 of 4
        ],
    )
    st = repetition_stats(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            st["n_tokens"].alias("n"),
            st["distinct_token_frac"].alias("d"),
            st["top_bigram_frac"].alias("t"),
        ).collect()
    }
    assert out[0]["n"] == 4 and out[0]["d"] == 0.25 and out[0]["t"] == 1.0
    assert out[1]["d"] == 1.0 and out[1]["t"] == pytest.approx(1 / 3)
    assert out[2]["n"] == 0 and out[2]["d"] == 0.0 and out[2]["t"] == 0.0
    assert out[3]["n"] == 1 and out[3]["t"] == 0.0
    assert out[4]["t"] == pytest.approx(2 / 4)


def test_scrub_pii_redacts_and_counts(spark):
    from hogflare_spark.operators.text_analysis import pii_counts, scrub_pii

    df = _docs(
        spark,
        [
            "mail a.b+c@x-corp.io or boss@sub.domain.org today",
            "server at 192.168.001.42 then call 555-123-4567 ok",
            "nothing sensitive here",
        ],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *pii_counts(F.col("text")),
            scrub_pii(F.col("text")).alias("clean"),
        ).collect()
    }
    assert out[0]["n_email"] == 2 and out[0]["clean"] == "mail <EMAIL> or <EMAIL> today"
    assert out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["clean"] == "server at <IP> then call <PHONE> ok"
    assert out[2]["clean"] == "nothing sensitive here"
    assert all(out[2][f"n_{k}"] == 0 for k in ("email", "ipv4", "phone"))


# -------------------------------------------------------------- packing


def test_distributed_prefix_sum_matches_local(spark):
    from hogflare_spark.operators.sampling import _distributed_prefix_sum

    df = spark.range(0, 1000).select(
        F.col("id"), ((F.col("id") * 37) % 97 + 1).alias("v")
    )
    got = {
        r["id"]: r["cumsum"]
        for r in _distributed_prefix_sum(df, "v", ["id"]).collect()
    }
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    acc = 0
    for i, v in rows:
        acc += v
        assert got[i] == acc


def test_pack_sequences_layout_invariants(spark):
    from hogflare_spark.operators.sampling import pack_sequences

    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 13) % 150 + 1).alias("n_tok")
    )
    out = pack_sequences(df, "doc_id", "n_tok", 512).collect()
    # offsets always inside the bin; bin ids contiguous from 0
    assert all(0 <= r["bin_offset"] < 512 for r in out)
    bins = {r["bin_id"] for r in out}
    assert bins == set(range(max(bins) + 1))
    # deterministic across invocations
    again = pack_sequences(df, "doc_id", "n_tok", 512).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # every bin except the last starts at the target boundary: the doc
    # that begins bin b has start cumsum in [b*512, b*512 + its offset]
    total = sum(r["n_tokens"] for r in out)
    assert max(bins) == (total - 1) // 512 or max(bins) == (total - 1) // 512 - 1


def test_ivf_index_rebuild_is_atomic_and_expirable(spark, tmp_path):
    """Rebuilding an index writes a NEW versioned data dir and swings one
    pointer for (centroids, data); expiration drops superseded versions
    but never the referenced one."""
    import os

    from hogflare_spark.operators.similarity import (
        ivf_expire_index_versions,
        ivf_query_index,
        ivf_write_index,
    )

    corpus = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17).cast("float") for i in range(8)]).alias(
            "embedding"
        ),
    )
    ivf_write_index(corpus, str(tmp_path / "idx"), n_centroids=4)
    ivf_write_index(corpus, str(tmp_path / "idx"), n_centroids=4)  # rebuild
    dirs = sorted(d for d in os.listdir(tmp_path / "idx") if d.startswith("data.v="))
    assert dirs == ["data.v=1", "data.v=2"]
    queries = corpus.where(F.col("vec_id") < 3)
    got = ivf_query_index(spark, str(tmp_path / "idx"), queries, k=2, n_probe=4)
    assert got.count() == 6  # 3 queries x k=2
    dropped = ivf_expire_index_versions(str(tmp_path / "idx"))
    assert dropped == ["data.v=1"]
    # the live version still serves queries
    assert ivf_query_index(spark, str(tmp_path / "idx"), queries, k=2, n_probe=4).count() == 6


# --------------------------------------------------- round-5 pipeline ops


def test_substring_overlap_finds_embedded_copy(spark):
    """A long doc embedding a verbatim 8-token run from a short doc must
    pair with it (the case Jaccard dilutes), and overlap_frac == 1.0
    when every window of the shorter doc is shared."""
    from hogflare_spark.operators.dedup import substring_overlap_pairs

    copied = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            copied,
            "padding start " + copied + " padding end tail words here",
            "completely different tokens with no shared run at all okay",
        ],
    )
    out = {(r["id_a"], r["id_b"]): r for r in
           substring_overlap_pairs(df, "text", "doc_id", window_tokens=8).collect()}
    assert set(out) == {(0, 1)}
    assert out[(0, 1)]["shared_windows"] == 1  # doc 0 has exactly one window
    assert out[(0, 1)]["overlap_frac"] == 1.0


def test_substring_overlap_posting_cap_drops_boilerplate(spark):
    """Windows shared by more than max_posting docs are boilerplate and
    must not generate pairs."""
    from hogflare_spark.operators.dedup import substring_overlap_pairs

    boiler = "license header the same in every file of the corpus"
    df = _docs(spark, [boiler + f" tail{i}" for i in range(4)])
    out = substring_overlap_pairs(
        df, "text", "doc_id", window_tokens=8, max_posting=3
    ).collect()
    assert out == []


def test_chunk_documents_covers_every_token(spark):
    """Chunks must tile each doc: first starts at 1, starts advance by
    stride, the union covers all n tokens, and only the tail chunk may
    be short."""
    from hogflare_spark.operators.sampling import chunk_documents

    texts = ["w" + " w".join(str(i) for i in range(n)) for n in (0, 5, 31, 32, 33, 100)]
    df = _docs(spark, texts)
    rows = chunk_documents(df, "text", "doc_id", chunk_tokens=32, stride=24).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in enumerate(texts):
        n = len(text.split())
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert chunks[0]["start_token"] == 1
        covered = set()
        for i, c in enumerate(chunks):
            assert c["start_token"] == 1 + i * 24
            assert c["n_chunk_tokens"] == len(c["chunk_text"].split())
            if i < len(chunks) - 1:
                assert c["n_chunk_tokens"] == 32
            covered.update(range(c["start_token"], c["start_token"] + c["n_chunk_tokens"]))
        assert covered == set(range(1, n + 1))


def test_domain_mixture_weights_and_quotas(spark):
    """Weights must sum to ~1, quotas to <= sample_n, and the sqrt
    temperature must upweight the tail domain relative to raw share."""
    from pyspark.sql import Row as R

    from hogflare_spark.operators.sampling import domain_mixture

    rows = [R(source="big", text="t " * 900)] + [
        R(source="small", text="t " * 100)
    ]
    df = spark.createDataFrame(rows)
    out = {r["domain"]: r for r in domain_mixture(df, "source", "text", 1000).collect()}
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    assert sum(r["quota"] for r in out.values()) <= 1000
    # raw shares are 0.9/0.1; sqrt flattening must pull weights toward
    # each other: small's weight > its raw share, big's < its raw share
    assert out["small"]["weight"] > 0.1 + 1e-6
    assert out["big"]["weight"] < 0.9 - 1e-6


def test_unigram_lm_score_ranks_rare_token_docs_lower(spark):
    """A doc of corpus-frequent tokens must outscore a doc of hapaxes —
    the ranking signal the downstream quality filter consumes."""
    from hogflare_spark.operators.text_analysis import unigram_lm_scores

    df = _docs(
        spark,
        ["common common common", "common common common", "zxqj vvkw plmn"],
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(df, "text", "doc_id").collect()}
    assert out[0]["mean_tok_prob"] > out[2]["mean_tok_prob"]
    assert out[2]["n_distinct_tokens"] == 3
    assert out[0]["n_tokens"] == 3


def test_semantic_dedup_clusters_planted_pairs(spark):
    """Planted near-identical vectors must collapse to their original's
    cluster with the original as the kept exemplar; unrelated vectors
    stay singletons."""
    from hogflare_spark.operators.similarity import semantic_dedup_clusters
    from hogflare_spark.plans.llm_pipeline import (
        EMBED_DIM,
        EMBED_DUP_THRESHOLD,
        _lsh_spark_corpus,
    )

    corpus = _lsh_spark_corpus(spark, SF_SMOKE)
    out = {r["id"]: r for r in semantic_dedup_clusters(
        corpus, EMBED_DUP_THRESHOLD, dim=EMBED_DIM,
        id_col="vec_id", vec_col="embedding",
    ).collect()}
    assert len(out) == corpus.count()
    planted = [i for i in out if i >= 10_000]
    assert planted, "fixture must contain planted duplicates"
    clustered = sum(1 for i in planted if out[i]["cluster_id"] == i - 10_000)
    # banded-LSH recall at s~0.98-0.99 is ~0.999; allow a miss or two
    assert clustered >= int(0.95 * len(planted))
    for i in planted:
        if out[i]["cluster_id"] == i - 10_000:
            assert not out[i]["is_canonical"]
            assert out[i - 10_000]["is_canonical"]


def test_streaming_corpus_dedup_cross_batch_and_replay(spark, tmp_path):
    """A later batch's copy of an earlier batch's content must be
    dropped; within-batch dups keep the min id; replaying a batch id
    (at-least-once delivery) must not change the kept set."""
    from hogflare_spark.streaming.corpus_dedup import StreamingCorpusDedup

    job = StreamingCorpusDedup(str(tmp_path / "w"))
    b0 = _docs(spark, ["alpha", "beta", "alpha"])  # ids 0,1,2; 2 dups 0
    job.process_batch(b0, 0)

    b1 = spark.createDataFrame(
        [Row(doc_id=10, text="beta"), Row(doc_id=11, text="gamma")]
    )
    job.process_batch(b1, 1)

    kept = {r["doc_id"] for r in job.read_kept(spark).collect()}
    assert kept == {0, 1, 11}  # 2 (in-batch dup) and 10 (cross-batch) dropped

    job.process_batch(b1, 1)  # checkpoint replay: identical rewrite
    assert {r["doc_id"] for r in job.read_kept(spark).collect()} == kept
    job.process_batch(b0, 0)  # replay of an OLD batch id is also a rewrite
    assert {r["doc_id"] for r in job.read_kept(spark).collect()} == kept


def test_domain_mixture_quota_no_int64_overflow(spark, duck):
    """r6 verdict #2: the quota math must survive domains past ~8.5e17
    tokens, where w_int * sample_n exceeds signed-64. Plants per-domain
    aggregates at exactly that scale (no test corpus can physically hold
    them), runs Spark's decimal(38,0) path and DuckDB's HUGEINT mirror
    over the SAME frame, and cross-checks both against exact Python int
    math."""
    import math

    from pyspark.sql import Row as R

    from hogflare_spark.operators.sampling import (
        mixture_weights,
        mixture_weights_sql,
    )

    sample_n = 10_000
    # 9e18 tokens ≈ int64 max; w_int ≈ 3e15, w_int * 10_000 ≈ 3e19 —
    # guaranteed silent-wrap territory for the old int64 expression.
    planted = [
        ("web", 4, 9_000_000_000_000_000_000),
        ("code", 3, 8_500_000_000_000_000_000),
        ("books", 2, 1_000_000_000_000),
        ("tail", 1, 7),
    ]
    rows = [
        R(
            domain=d,
            n_docs=nd,
            n_tokens=nt,
            w_int=int(math.floor(math.sqrt(nt) * 1e6)),
        )
        for d, nd, nt in planted
    ]
    per = spark.createDataFrame(rows)
    got = {r["domain"]: r for r in mixture_weights(per, sample_n).collect()}

    w_total = sum(r.w_int for r in rows)
    for r in rows:
        exact_quota = r.w_int * sample_n // w_total  # Python ints: no wrap
        assert got[r.domain]["quota"] == exact_quota, r.domain
        assert got[r.domain]["quota"] >= 0  # the overflow symptom is negative
    assert sum(g["quota"] for g in got.values()) <= sample_n
    assert abs(sum(g["weight"] for g in got.values()) - 1.0) < 1e-5

    # DuckDB HUGEINT mirror over the identical planted frame must agree
    # with Spark bit-for-bit on every (weight, quota).
    per_pd = per.toPandas()  # noqa: F841 — registered by name below
    duck.register("_mix_per", per_pd)
    oracle = {
        r[0]: r
        for r in duck.execute(
            mixture_weights_sql("_mix_per", sample_n)
        ).fetchall()
    }
    duck.unregister("_mix_per")
    for d in got:
        assert got[d]["quota"] == oracle[d][4], d
        assert abs(got[d]["weight"] - float(oracle[d][3])) < 1e-12, d



def test_chunk_documents_null_text_matches_oracle(spark, duck):
    """ADVICE regression: NULL text previously produced one garbage
    chunk row in Spark and zero rows in DuckDB. With the coalesce fix,
    both engines emit the identical (single empty-chunk) row set."""
    import pandas as pd
    from pyspark.sql import Row as R

    from hogflare_spark.operators.sampling import (
        chunk_documents,
        chunk_documents_sql,
    )

    df = spark.createDataFrame(
        [R(doc_id=0, text=None), R(doc_id=1, text="a b c")],
        schema="doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in chunk_documents(df, "text", "doc_id", 32, 24).collect()
    )
    duck.register(
        "_chunk_null", pd.DataFrame({"doc_id": [0, 1], "text": [None, "a b c"]})
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            chunk_documents_sql("_chunk_null", "text", "doc_id", 32, 24)
        ).fetchall()
    )
    duck.unregister("_chunk_null")
    assert got == want
    assert any(r[0] == 0 for r in got)  # the NULL doc appears on BOTH sides


def test_streaming_corpus_dedup_compaction_bounds_state_dirs(spark, tmp_path):
    """r6 verdict #4: 50 micro-batches with compact_every=K must end
    with <= ceil(50/K)+1 state dirs (loose batch dirs + one snapshot),
    the kept set must still equal the global min-id-per-content oracle,
    and a replay of an ALREADY-COMPACTED batch id must remain a pure
    rewrite (the snapshot's per-row batch provenance excludes a batch's
    own hashes from its replayed anti-join)."""
    import math

    from hogflare_spark.streaming.corpus_dedup import StreamingCorpusDedup

    K = 8
    job = StreamingCorpusDedup(str(tmp_path / "w"), compact_every=K,
                               n_state_buckets=4)
    texts = {}  # doc_id -> text
    batches = []
    for b in range(50):
        rows = [
            (b * 10, f"text-{b}"),          # unique per batch
            (b * 10 + 1, f"text-{b % 7}"),  # recurring cross-batch dup
            (b * 10 + 2, f"text-{b}"),      # within-batch dup of the first
        ]
        batches.append(rows)
        for i, t in rows:
            texts[i] = t
        job.process_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), b
        )

    state_dirs = [
        d
        for d in os.listdir(str(tmp_path / "w" / "state"))
        if d.startswith(("batch=", "snapshot="))
    ]
    assert len(state_dirs) <= math.ceil(50 / K) + 1, sorted(state_dirs)

    # oracle: global min doc_id per distinct text, in batch order
    first_kept = {}
    for rows in batches:
        seen_in_batch = {}
        for i, t in sorted(rows):
            seen_in_batch.setdefault(t, i)
        for t, i in seen_in_batch.items():
            first_kept.setdefault(t, i)
    kept = {r["doc_id"] for r in job.read_kept(spark).collect()}
    assert kept == set(first_kept.values())

    # replay a batch id long since absorbed into the snapshot
    replay_b = 3
    job.process_batch(
        spark.createDataFrame(batches[replay_b], "doc_id long, text string"),
        replay_b,
    )
    assert {r["doc_id"] for r in job.read_kept(spark).collect()} == kept
    # ...and a genuinely NEW batch after the replay still dedups globally
    job.process_batch(
        spark.createDataFrame([(999, "text-2"), (1000, "brand new")],
                              "doc_id long, text string"),
        50,
    )
    kept2 = {r["doc_id"] for r in job.read_kept(spark).collect()}
    assert kept2 == kept | {1000}


def test_scale_checks_machinery_on_base_sf(spark):
    """The sf-scale check families (plans/scale_checks.py) must agree
    with ground truth on an UNSCALED dir too: the restricted-view pair
    check reproduces the full oracle restricted to the sample, and the
    cluster invariant check accepts the real clusters output (stride >
    max id makes every doc its own base, so cohesion is the degenerate
    true case)."""
    import hogflare_spark.plans as plans
    from hogflare_spark.plans import scale_checks

    plans.load_all()
    QUERIES = plans.QUERIES
    sf = SF_SMOKE
    for name in ("llm_minhash_near_dups", "llm_dedup_clusters"):
        df = QUERIES[name](spark, sf)
        srows = [tuple(r) for r in df.collect()]
        out = scale_checks.CHECKS[name](spark, sf, srows, list(df.columns))
        assert out["ok"], (name, out)

    # and the check actually DETECTS a wrong answer: inject a bogus pair
    # whose ids are inside the sample (so the restricted compare sees it)
    # and which the real result does not contain
    from hogflare_spark.plans.scale_checks import _doc_sample

    name = "llm_minhash_near_dups"
    df = QUERIES[name](spark, sf)
    srows = [tuple(r) for r in df.collect()]
    cols = list(df.columns)
    ia, ib = cols.index("id_a"), cols.index("id_b")
    real = {(r[ia], r[ib]) for r in srows}
    sample = sorted(_doc_sample(sf))
    fake = next(
        (a, b)
        for a in sample
        for b in sample
        if a < b and (a, b) not in real
    )
    out2 = scale_checks.CHECKS[name](
        spark, sf, srows + [fake + (0.999999,)], cols
    )
    assert not out2["ok"], out2


def test_stratified_sample_prefilter_exact_vs_plain_window(spark):
    """The mega-stratum pre-filter path (r5 carry-over, previously
    documented-only) must reproduce the plain-window result bit-for-bit:
    on a stratum above the cutoff, with a normal safety factor, AND with
    a pathological safety factor small enough to force the deficiency
    refill."""
    from pyspark.sql import Row as R

    from hogflare_spark.operators.sampling import stratified_sample

    rows = [R(doc_id=i, lang="big" if i < 5000 else "small") for i in range(5200)]
    df = spark.createDataFrame(rows)

    plain = sorted(
        tuple(r)
        for r in stratified_sample(
            df, "doc_id", "lang", 40, prefilter_min_stratum=10**9
        ).collect()
    )
    pre = sorted(
        tuple(r)
        for r in stratified_sample(
            df, "doc_id", "lang", 40, prefilter_min_stratum=1000, safety=4.0
        ).collect()
    )
    assert pre == plain
    # safety so small the threshold keeps ~0 rows: the refill MUST fire
    # and the result must still be exact
    forced = sorted(
        tuple(r)
        for r in stratified_sample(
            df, "doc_id", "lang", 40, prefilter_min_stratum=1000, safety=1e-6
        ).collect()
    )
    assert forced == plain
